package graft.queries

import graft.etl.NessusWarehouse
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's 4 stored procedures (reference `queries/` SQL files) as
  * declarative Spark plans. The cursor + temp-table machinery of the folder
  * variants (`get_folder_results.sql:57-78`, `get_folder_stats.sql:38-54`)
  * collapses into a single window over all scans in the folder — one shuffle
  * for the window, broadcast joins for the dimension tables (SURVEY §3.3).
  *
  * Column orders are the load-bearing NATURAL-JOIN orders (SURVEY Q7),
  * pinned from the temp-table declarations: 14 columns
  * (`get_folder_stats.sql:20-36`) and 32 columns
  * (`get_folder_results.sql:21-55`).
  *
  * Tie-breaking: the reference's `ORDER BY scan_start DESC LIMIT 1 OFFSET n`
  * is nondeterministic on ties (SURVEY Q6); we add `scan_run_id DESC` — a
  * documented deviation required for oracle-testability.
  */
object ScanQueries {

  /** `get_folder_stats.sql:20-36` temp-table order. */
  val statsCols: Seq[String] = Seq(
    "scan_id", "scan_run_id", "scan_start", "scan_end", "targets", "host_count",
    "critical_count", "high_count", "medium_count", "low_count", "info_count",
    "folder_id", "type", "name")

  /** `get_folder_results.sql:21-55` temp-table order. */
  val resultsCols: Seq[String] = Seq(
    "host_vuln_id", "plugin_id", "nessus_host_id", "scan_run_id", "host_id",
    "scan_id", "host_ip", "host_fqdn", "host_start", "host_end", "os",
    "critical_count", "high_count", "medium_count", "low_count", "info_count",
    "severity", "name", "family", "synopsis", "description", "solution",
    "cvss_base_score", "cvss3_base_score", "cvss_vector", "cvss3_vector",
    "ref", "pub_date", "mod_date", "vuln_output_id", "port", "output")

  /** T1: the (offset+1)-th most-recent run per scan — one window, one shuffle
    * partitioned by scan_id. A scan with ≤ offset runs contributes nothing
    * (matches `LIMIT 1 OFFSET n` yielding no row).
    */
  def nthLatestRun(scanRun: DataFrame, offset: Int): DataFrame =
    scanRun
      .withColumn(
        "rn",
        row_number().over(
          Window.partitionBy("scan_id").orderBy(desc("scan_start"), desc("scan_run_id"))))
      .filter(col("rn") === offset + 1)
      .drop("rn")

  /** `scan_run NATURAL JOIN scan` (J4) restricted to the selected runs,
    * emitted in the 14-column stats order.
    */
  private def statsJoin(w: NessusWarehouse, runs: DataFrame): DataFrame =
    runs
      .join(w.scan, Seq("scan_id"))
      .select(statsCols.map(col): _*)

  /** `host ⋈ host_vuln ⋈ plugin ⋈ vuln_output` (J1-J3) restricted to the
    * selected runs, emitted in the 32-column results order. `plugin` and the
    * tiny run-id set broadcast; the fact-fact `host_vuln ⋈ vuln_output` join
    * shuffles on host_vuln_id at scale.
    */
  private def resultsJoin(w: NessusWarehouse, runIds: DataFrame): DataFrame =
    w.host
      .join(runIds.select("scan_run_id"), Seq("scan_run_id"), "left_semi")
      .join(w.hostVuln, Seq("nessus_host_id", "scan_run_id"))
      .join(broadcast(w.plugin), Seq("plugin_id"))
      .join(w.vulnOutput, Seq("host_vuln_id"))
      .select(resultsCols.map(col): _*)

  /** `CALL get_scan_stats(sid, offset)` — `get_scan_stats.sql:11-16`. */
  def scanStats(w: NessusWarehouse, sid: Long, offset: Int): DataFrame =
    statsJoin(w, nthLatestRun(w.scanRun.filter(col("scan_id") === sid), offset))

  /** `CALL get_folder_stats(fid, offset)` — `get_folder_stats.sql`. */
  def folderStats(w: NessusWarehouse, fid: Long, offset: Int): DataFrame = {
    val scansInFolder = w.scan.filter(col("folder_id") === fid).select("scan_id")
    val runs = w.scanRun.join(broadcast(scansInFolder), Seq("scan_id"), "left_semi")
    statsJoin(w, nthLatestRun(runs, offset))
  }

  /** `CALL get_scan_results(sid, offset)` — `get_scan_results.sql:11-21`. */
  def scanResults(w: NessusWarehouse, sid: Long, offset: Int): DataFrame =
    resultsJoin(w, nthLatestRun(w.scanRun.filter(col("scan_id") === sid), offset))

  /** `CALL get_folder_results(fid, pid, offset)` — `get_folder_results.sql`.
    * F5: `pid` is optional; when present the final result is filtered to that
    * plugin (pushed below the joins by Catalyst).
    */
  def folderResults(
      w: NessusWarehouse,
      fid: Long,
      pid: Option[Long],
      offset: Int): DataFrame = {
    val scansInFolder = w.scan.filter(col("folder_id") === fid).select("scan_id")
    val runs = w.scanRun.join(broadcast(scansInFolder), Seq("scan_id"), "left_semi")
    val joined = resultsJoin(w, nthLatestRun(runs, offset))
    pid.fold(joined)(p => joined.filter(col("plugin_id") === p))
  }

  /** Cross-client rollup over `scaner_deployments` (reference
    * README.md:16-20): per client, how many deployments reported, how many
    * runs landed, and the summed severity counts. `scanRun` must carry a
    * `deployment_uuid` column (landed docs do — Normalize.scanRun keeps the
    * partition's deployment_id). The deployments table is operator-sized,
    * so it broadcasts; the fact side shuffles once on client_id with
    * map-side partial aggregation.
    */
  def clientResults(scanRun: DataFrame, deployments: DataFrame): DataFrame =
    scanRun
      .join(broadcast(deployments), Seq("deployment_uuid"))
      .groupBy("client_id")
      .agg(
        countDistinct("deployment_uuid").cast("long").as("n_deployments"),
        count(lit(1)).cast("long").as("n_runs"),
        sum("critical_count").cast("long").as("critical_count"),
        sum("high_count").cast("long").as("high_count"),
        sum("medium_count").cast("long").as("medium_count"),
        sum("low_count").cast("long").as("low_count"),
        sum("info_count").cast("long").as("info_count"))
}
