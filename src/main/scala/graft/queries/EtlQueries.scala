package graft.queries

import graft.etl.{Docs, Incremental, Normalize, NessusSynth}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checked queries for the ETL operator family: the generic severity
  * pivot (A1), watermark discovery (S8/A2/F8), the incremental
  * filter+dedup pipeline (F1/W4/W5), and the document-normalization explode
  * chains (P1-P5) — each exercised against the DuckDB oracle via a
  * round-trip: warehouse → nested scan-run docs ([[graft.etl.Docs]]) →
  * [[graft.etl.Normalize]] → flat rows that must equal the direct flat
  * derivation.
  */
object EtlQueries {

  /** events with `ts` normalized to epoch seconds, tolerant of the
    * fixture's physical timestamp encoding ([[graft.io.EventTime]]).
    */
  private def events(s: SparkSession, dir: String) = {
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.withColumn("ts_secs", graft.io.EventTime.tsSecs(raw))
  }

  private def lineitemVulns(s: SparkSession, dir: String) =
    s.read
      .parquet(s"$dir/lineitem.parquet")
      .select(
        col("l_orderkey").cast("long").as("scan_run_id"),
        (col("l_partkey") % 5).cast("long").as("severity"),
        col("l_linenumber").cast("long").as("cnt"))

  /** events reshaped as scan-run history entries (F1's input shape). */
  private def history(s: SparkSession, dir: String) =
    events(s, dir).select(
      col("event_id").cast("long").as("event_id"),
      col("user_id").cast("long").as("user_id"),
      when(col("event_type") === "purchase", lit("completed"))
        .otherwise(col("event_type"))
        .as("status"),
      col("ts_secs").as("last_modification_date"),
      col("value"))

  /** S3-style landed keys derived from events; deployment 3 yields only
    * malformed date segments (C12 empty-default path), and every 7th event
    * injects a malformed segment everywhere else (F8).
    */
  private def landedKeys(s: SparkSession, dir: String) =
    events(s, dir).select(
      concat(
        lit("dep"),
        (col("user_id") % 5).cast("string"),
        lit("/"),
        when(
          col("user_id") % 5 === 3 || col("event_id") % 7 === 0,
          col("event_type"))
          .otherwise(date_format(timestamp_seconds(col("ts_secs")), "yyyyMMdd")),
        lit("/scan.json")).as("key"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "severity_pivot" -> { (s, dir) =>
      NessusSynth.severityPivot(lineitemVulns(s, dir), Seq("scan_run_id"), col("cnt"))
    },
    "severity_pivot_legacy" -> { (s, dir) =>
      NessusSynth.severityPivot(
        lineitemVulns(s, dir),
        Seq("scan_run_id"),
        col("cnt"),
        legacy = true)
    },
    "watermark" -> { (s, dir) => Incremental.watermarks(landedKeys(s, dir)) },
    "incremental_select" -> { (s, dir) =>
      Incremental
        .dedupLatest(
          Incremental.newCompletedRuns(history(s, dir), to_date(lit("2024-01-08"))),
          Seq("user_id"),
          Seq(col("last_modification_date").desc, col("event_id").desc))
        .select("user_id", "event_id", "last_modification_date", "value")
    },
    "etl_normalize_scan_run" -> { (s, dir) =>
      Normalize
        .scanRun(Docs.cached(s, dir))
        .select(
          "scan_run_id", "scan_id", "scan_start", "scan_end", "host_count",
          "critical_count", "high_count", "medium_count", "low_count", "info_count")
    },
    "etl_normalize_host" -> { (s, dir) => Normalize.host(Docs.cached(s, dir)) },
    "etl_normalize_host_vuln" -> { (s, dir) =>
      Normalize
        .hostVuln(Docs.cached(s, dir))
        .groupBy("scan_run_id", "nessus_host_id")
        .agg(count(lit(1)).cast("long").as("n_vulns"))
    },
    "etl_normalize_vuln_output" -> { (s, dir) =>
      Normalize
        .vulnOutput(Docs.cached(s, dir))
        .select("scan_run_id", "nessus_host_id", "plugin_id", "port", "output")
    },
    "etl_normalize_plugin" -> { (s, dir) => Normalize.plugin(Docs.cached(s, dir)) }
  )

  private def sevSql(src: String, legacyInfo: Boolean) = {
    def b(sev: Int, name: String) =
      s"CAST(SUM(CASE WHEN l_partkey % 5 = $sev THEN $src ELSE 0 END) AS BIGINT) AS $name"
    val info =
      if (legacyInfo) "CAST(0 AS BIGINT) AS info_count" else b(0, "info_count")
    s"""SELECT CAST(l_orderkey AS BIGINT) AS scan_run_id,
       |  ${b(4, "critical_count")}, ${b(3, "high_count")},
       |  ${b(2, "medium_count")}, ${b(1, "low_count")}, $info
       |FROM lineitem GROUP BY 1""".stripMargin
  }

  private val historySql =
    """SELECT CAST(event_id AS BIGINT) AS event_id, CAST(user_id AS BIGINT) AS user_id,
      |       CASE WHEN event_type = 'purchase' THEN 'completed' ELSE event_type END AS status,
      |       epoch_us(ts) // 1000000 AS last_modification_date, value
      |FROM events""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "severity_pivot" -> sevSql("l_linenumber", legacyInfo = false),
    "severity_pivot_legacy" -> sevSql("l_linenumber", legacyInfo = true),
    "watermark" ->
      """WITH keys AS (
        |  SELECT 'dep' || CAST(user_id % 5 AS VARCHAR) || '/' ||
        |         CASE WHEN user_id % 5 = 3 OR event_id % 7 = 0 THEN event_type
        |              ELSE strftime(ts, '%Y%m%d') END || '/scan.json' AS key
        |  FROM events),
        |parts AS (
        |  SELECT string_split(key, '/')[1] AS deployment,
        |         string_split(key, '/')[2] AS seg
        |  FROM keys)
        |SELECT deployment,
        |       COALESCE(MAX(CASE WHEN regexp_full_match(seg, '^[0-9]{8}$') THEN strptime(seg, '%Y%m%d')::DATE END),
        |                DATE '1970-01-01') AS watermark
        |FROM parts GROUP BY deployment""".stripMargin,
    "incremental_select" ->
      s"""WITH hist AS ($historySql),
         |f AS (
         |  SELECT * FROM hist
         |  WHERE status = 'completed'
         |    AND CAST(make_timestamp(last_modification_date * 1000000) AS DATE) >= DATE '2024-01-08'),
         |d AS (
         |  SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY user_id ORDER BY last_modification_date DESC, event_id DESC) AS rn
         |  FROM f)
         |SELECT user_id, event_id, last_modification_date, value FROM d WHERE rn = 1""".stripMargin,
    "etl_normalize_scan_run" ->
      s"""${graft.etl.NessusSynthSql.withCtes()}
         |SELECT scan_run_id, scan_id, scan_start, scan_end, host_count,
         |       critical_count, high_count, medium_count, low_count, info_count
         |FROM scan_run
         |WHERE scan_run_id IN (SELECT DISTINCT scan_run_id FROM li)
         |  AND scan_run_id % 10 = 3""".stripMargin,
    "etl_normalize_host" ->
      s"""${graft.etl.NessusSynthSql.withCtes()}
         |SELECT nessus_host_id, scan_run_id, scan_id, host_ip, host_fqdn,
         |       host_start, host_end, os, critical_count, high_count,
         |       medium_count, low_count, info_count, host_id
         |FROM host WHERE scan_run_id % 10 = 3""".stripMargin,
    "etl_normalize_host_vuln" ->
      s"""${graft.etl.NessusSynthSql.withCtes()}
         |SELECT scan_run_id, nessus_host_id,
         |       CAST(COUNT(DISTINCT plugin_id) AS BIGINT) AS n_vulns
         |FROM li WHERE scan_run_id % 10 = 3 GROUP BY 1, 2""".stripMargin,
    "etl_normalize_vuln_output" ->
      s"""${graft.etl.NessusSynthSql.withCtes()}
         |SELECT DISTINCT scan_run_id, nessus_host_id, plugin_id,
         |       CAST(line_no AS VARCHAR) || ' / tcp' AS port,
         |       'output-' || CAST(plugin_id AS VARCHAR) AS output
         |FROM li WHERE scan_run_id % 10 = 3""".stripMargin,
    "etl_normalize_plugin" ->
      s"""${graft.etl.NessusSynthSql.withCtes()}
         |SELECT * FROM plugin
         |WHERE plugin_id IN (SELECT DISTINCT plugin_id FROM li WHERE scan_run_id % 10 = 3)""".stripMargin
  )
}
