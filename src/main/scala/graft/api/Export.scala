package graft.api

import graft.etl.{FormatDocs, Incremental}
import graft.io.LandingZone
import graft.schema.Schemas
import graft.sources.{ApiFactory, Endpoints, Extract}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's two runnable entry points, assembled end-to-end on Spark:
  *
  *  - [[Export.incremental]] = `export.py` main: watermark discovered from
  *    already-landed partitions (max valid date segment per deployment,
  *    epoch default — export.py:75-87), snapshots written only when new
  *    runs exist (K3).
  *  - [[Export.lastMonth]] = `export_last_month.py` main: fixed 30-day
  *    lookback (`date_sub(current_date(), 30)`,
  *    export_last_month.py:208) and snapshots written unconditionally
  *    (export_last_month.py:122-124,229 — Q10 `snapshotAlways`).
  *
  * Both share one pipeline: GET /scans → scan work-list → distributed
  * scan-detail fetch filtered to completed runs past the watermark →
  * distributed raw-bundle fetch → FormatDocs → date-partitioned landing
  * write, plus folder/scan snapshot landing. Landing layout is
  * `root/{file_type}/deployment_id=X/ingest_date=Y`, mirroring the
  * reference's `{deployment_id}/{YYYYMMDD}/{file_type}.json` keys.
  */
object Export {

  /** What a run did: how many scan runs landed, and whether the
    * folder/scan snapshots were (re)written.
    */
  final case class Result(runsLanded: Long, snapshotsWritten: Boolean)

  val ScanRunsDir = "scan_runs"
  val FoldersDir = "folders"
  val ScansDir = "scan"

  /** `export.py` mode: incremental from the landed watermark. */
  def incremental(
      spark: SparkSession,
      factory: ApiFactory,
      deploymentId: String,
      root: String,
      legacySeverity: Boolean = false): Result = {
    val wm = Incremental
      .watermarks(LandingZone.listKeys(spark, root))
      .filter(col("deployment") === deploymentId)
      .select("watermark")
      .collect()
      .headOption
      .map(_.getDate(0))
      .getOrElse(java.sql.Date.valueOf("1970-01-01")) // A2 epoch default
    run(spark, factory, deploymentId, root, lit(wm), snapshotAlways = false, legacySeverity)
  }

  /** `export_last_month.py` mode: fixed 30-day lookback, snapshots always. */
  def lastMonth(
      spark: SparkSession,
      factory: ApiFactory,
      deploymentId: String,
      root: String,
      legacySeverity: Boolean = false): Result =
    run(
      spark, factory, deploymentId, root,
      date_sub(current_date(), 30), // F2
      snapshotAlways = true, // Q10
      legacySeverity)

  private def run(
      spark: SparkSession,
      factory: ApiFactory,
      deploymentId: String,
      root: String,
      watermark: Column,
      snapshotAlways: Boolean,
      legacySeverity: Boolean): Result = {
    import spark.implicits._
    // Single dimension-sized GETs happen driver-side (like the reference's
    // top-of-main calls); the per-scan and per-run fetches distribute.
    val api = factory.create()
    val scansJson = api.get(Endpoints.Scans)
    val foldersJson = api.get(Endpoints.Folders)

    val scans = Extract.scanList(spark, scansJson)
    // The work-list is dimension-sized (one row per completed new run);
    // materialize it once so the heavy per-run fetch doesn't re-issue the
    // scan-detail GETs, and spread the runs across tasks.
    val runPairs = Extract
      .newRuns(spark, scans, factory, watermark)
      .as[(Long, Long)]
      .collect()
      .toSeq
    if (runPairs.nonEmpty) {
      val runsDs = spark
        .createDataset(runPairs)
        .repartition(math.min(runPairs.size, spark.sparkContext.defaultParallelism))
      val docs = FormatDocs(Extract.fetchRawRunDocs(runsDs, factory), legacySeverity)
      LandingZone.write(LandingZone.stamped(docs, deploymentId), s"$root/$ScanRunsDir")
    }

    val runsDf = runPairs.toDF("scan_id", "history_id")
    def snap(json: String, field: String, dir: String): Boolean =
      LandingZone.writeSnapshots(
        LandingZone.stamped(
          spark
            .createDataset(Seq(json))
            .select(from_json(col("value"), Schemas.scanDoc).as("d"))
            .select(col(s"d.$field").as(field)),
          deploymentId),
        runsDf,
        s"$root/$dir",
        snapshotAlways)
    val wroteFolders = snap(foldersJson, "folders", FoldersDir)
    val wroteScans = snap(scansJson, "scans", ScansDir)
    Result(runPairs.size.toLong, wroteFolders && wroteScans)
  }
}
