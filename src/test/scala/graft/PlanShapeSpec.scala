package graft

import graft.etl.NessusSynth
import graft.queries.ScanQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan regression tests: the properties that make these queries
  * survive a 100 TB scale-up (SURVEY §4.2) — filters reaching the parquet
  * scan, dimensions broadcasting, the Nth-run window pruning map-side via
  * WindowGroupLimit, and no single-partition global windows anywhere.
  */
class PlanShapeSpec extends SparkSpec {
  lazy val w = NessusSynth(spark, sf)

  private def plan(df: DataFrame): String = {
    df.count() // let AQE finalize
    df.queryExecution.executedPlan.toString
  }

  test("scan_results: scan_id filter is pushed to the parquet scan") {
    val p = plan(ScanQueries.scanResults(w, 7, 0))
    assert(p.contains("PushedFilters: [EqualTo(scan_id,7)]"), p.take(2000))
  }

  test("scan_results: all three dimension joins broadcast; run-id set broadcasts semi") {
    val p = plan(ScanQueries.scanResults(w, 7, 0))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(2000))
    assert(!p.contains("SortMergeJoin"), "fact-dim joins must not sort-merge at this size")
  }

  test("nth-latest window prunes map-side (WindowGroupLimit) and never runs on a single partition") {
    val p = plan(ScanQueries.folderStats(w, 1, 0))
    assert(p.contains("WindowGroupLimit"), p.take(2000))
    assert(
      !p.contains("SinglePartition"),
      "global-window single-partition exchange would bottleneck at scale")
  }

  test("stats column pruning: scan_run parquet scan reads only needed columns") {
    val df = ScanQueries.scanStats(w, 7, 0)
    df.count()
    // the window input scan needs only (scan_run_id, scan_id, scan_start) +
    // the stats payload; host/vuln tables must not be read at all
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("/host"), "stats query must not scan the host table")
    assert(!p.contains("/vuln_output"), "stats query must not scan vuln_output")
  }
}
