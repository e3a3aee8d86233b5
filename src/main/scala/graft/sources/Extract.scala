package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.schema.Schemas
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** S1: one authenticated REST GET returning the raw JSON body
  * (`export.py:111-115`). Implementations must be serializable or built
  * per-partition via [[ApiFactory]]; tests inject a fixture-backed fake.
  */
trait NessusApi extends Serializable {
  def get(path: String): String
}

/** Builds one API client per executor partition (connection reuse; the
  * reference instead opened a ThreadPool per host, `export.py:182-183`).
  */
trait ApiFactory extends Serializable {
  def create(): NessusApi
}

/** S2-S7 endpoint paths (`export.py:42-51`). */
object Endpoints {
  val Folders = "/folders"
  val Scans = "/scans"
  def scan(scanId: Long) = s"/scans/$scanId"
  def scanRun(scanId: Long, historyId: Long) = s"/scans/$scanId?history_id=$historyId"
  def hostVulns(scanId: Long, hostId: Long, historyId: Long) =
    s"/scans/$scanId/hosts/$hostId?history_id=$historyId"
  def pluginOutput(scanId: Long, hostId: Long, pluginId: Long, historyId: Long) =
    s"/scans/$scanId/hosts/$hostId/plugins/$pluginId?history_id=$historyId"
}

/** S9: the 9 required config params, fail-fast on any missing
  * (`export.py:16-39`). Minimal INI subset: `key = value` lines, `[section]`
  * headers ignored, `#`/`;` comments.
  */
final case class NessusConfig(
    accessKey: String,
    secretKey: String,
    url: String,
    deploymentId: String,
    s3AccessKey: String,
    s3SecretKey: String,
    s3Bucket: String,
    s3Region: String,
    s3Endpoint: String)

object NessusConfig {
  val RequiredKeys: Seq[String] = Seq(
    "access_key", "secret_key", "url", "deployment_id",
    "s3_access_key", "s3_secret_key", "s3_bucket", "s3_region", "s3_endpoint")

  def parseIni(text: String): Map[String, String] =
    text.linesIterator
      .map(_.trim)
      .filterNot(l => l.isEmpty || l.startsWith("[") || l.startsWith("#") || l.startsWith(";"))
      .flatMap { l =>
        l.split("=", 2) match {
          case Array(k, v) => Some(k.trim -> v.trim)
          case _ => None
        }
      }
      .toMap

  /** Fail-fast: every missing key is named (the reference prints and exits,
    * `export.py:36-39`).
    */
  def apply(ini: String): NessusConfig = {
    val kv = parseIni(ini)
    val missing = RequiredKeys.filterNot(kv.contains)
    require(missing.isEmpty, s"missing required config keys: ${missing.mkString(", ")}")
    NessusConfig(
      kv("access_key"), kv("secret_key"), kv("url"), kv("deployment_id"),
      kv("s3_access_key"), kv("s3_secret_key"), kv("s3_bucket"), kv("s3_region"),
      kv("s3_endpoint"))
  }
}

/** The extraction pipeline, Spark-side: the reference's nested REST loops
  * (J7, `export.py:223-237`) become a distributed dependent fetch — the
  * (scan_id, history_id) work-list is computed relationally, then each
  * partition fetches its runs with one client instance, assembling the raw
  * bundle structurally (no field munging — formatting is
  * [[graft.etl.FormatDocs]], a declarative Spark stage).
  */
object Extract {

  /** Parse the GET /scans response into a scan work-list. */
  def scanList(spark: SparkSession, scansJson: String): DataFrame = {
    import spark.implicits._
    spark
      .createDataset(Seq(scansJson))
      .select(from_json(col("value"), Schemas.scanDoc).as("d"))
      .select(explode(col("d.scans")).as("s"))
      .select(
        col("s.id").as("scan_id"),
        col("s.folder_id").as("folder_id"),
        col("s.type").as("type"),
        col("s.name").as("name"))
  }

  /** S4 + F1/F3/W5: fetch each scan's detail, keep completed runs modified
    * on/after the watermark. The scan list is small (dimension-sized); the
    * fetch distributes one scan per task row.
    */
  def newRuns(
      spark: SparkSession,
      scans: DataFrame,
      factory: ApiFactory,
      watermark: java.sql.Date): DataFrame =
    newRuns(spark, scans, factory, lit(watermark))

  /** Column-watermark variant: F2's fixed lookback passes
    * `date_sub(current_date(), 30)` here (export_last_month.py:208).
    */
  def newRuns(
      spark: SparkSession,
      scans: DataFrame,
      factory: ApiFactory,
      watermark: org.apache.spark.sql.Column): DataFrame = {
    import spark.implicits._
    // The request's scan_id is carried through the fetch structurally: the
    // live scan-detail response has no top-level scan_id field (the
    // reference threads scan['id'] from its request loop, export.py
    // update_scans), so parsing it back out of the body would yield null
    // for every row against the real API.
    val detailJson = scans
      .select(col("scan_id"))
      .as[Long]
      .mapPartitions { ids =>
        val api = factory.create()
        ids.map(id => (id, api.get(Endpoints.scan(id))))
      }
      .toDF("scan_id", "body")
    detailJson
      .select(col("scan_id"), from_json(col("body"), Schemas.historyDoc).as("d"))
      .filter(col("d.history").isNotNull) // F3 null-history guard
      .select(col("scan_id"), explode(col("d.history")).as("h"))
      .select(
        col("scan_id"),
        col("h.history_id").as("history_id"),
        col("h.status").as("status"),
        col("h.last_modification_date").as("last_modification_date"))
      .transform(df =>
        graft.etl.Incremental.newCompletedRuns(df, watermark))
      .select("scan_id", "history_id")
  }

  /** S5-S7: fetch each run's summary + per-host details + per-vuln plugin
    * outputs, and assemble the raw bundle JSON. One API client per
    * partition; runs distribute across the cluster (the reference ran this
    * single-threaded per box with a thread pool only over vulns).
    */
  def fetchRawRunDocs(runs: Dataset[(Long, Long)], factory: ApiFactory): DataFrame = {
    val spark = runs.sparkSession
    import spark.implicits._
    val json = runs.mapPartitions { it =>
      val api = factory.create()
      val mapper = new ObjectMapper()
      it.map { case (scanId, historyId) =>
        assembleRawDoc(api, mapper, scanId, historyId)
      }
    }
    json
      .select(from_json(col("value"), Schemas.rawScanRunDoc).as("d"))
      .select("d.*")
  }

  /** One run's raw bundle: structural assembly only (field selection and
    * shaping happen in FormatDocs).
    */
  private[sources] def assembleRawDoc(
      api: NessusApi,
      mapper: ObjectMapper,
      scanId: Long,
      historyId: Long): String = {
    val summary = mapper.readTree(api.get(Endpoints.scanRun(scanId, historyId)))
    val doc = mapper.createObjectNode()
    doc.put("scan_id", scanId)
    doc.put("history_id", historyId)
    doc.set[ObjectNode]("info", summary.path("info").deepCopy[ObjectNode]())
    val hostsOut = doc.putArray("hosts")
    summary.path("hosts").forEach { h =>
      val hostId = h.path("host_id").asLong()
      val detail = mapper.readTree(api.get(Endpoints.hostVulns(scanId, hostId, historyId)))
      val hostOut = hostsOut.addObject()
      hostOut.put("host_id", hostId)
      hostOut.set[ObjectNode]("info", detail.path("info").deepCopy[ObjectNode]())
      hostOut.set[ArrayNode]("vulnerabilities", detail.path("vulnerabilities").deepCopy[ArrayNode]())
      val poOut = hostOut.putArray("plugin_outputs")
      detail.path("vulnerabilities").forEach { v =>
        val pluginId = v.path("plugin_id").asLong()
        val po = mapper.readTree(
          api.get(Endpoints.pluginOutput(scanId, hostId, pluginId, historyId)))
        val poNode = poOut.addObject()
        poNode.put("plugin_id", pluginId)
        poNode.set[ObjectNode]("info", po.path("info").deepCopy[ObjectNode]())
        poNode.set[ArrayNode]("outputs", po.path("outputs").deepCopy[ArrayNode]())
      }
    }
    mapper.writeValueAsString(doc)
  }
}
