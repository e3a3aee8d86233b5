package graft

import graft.etl.NessusSynth
import graft.queries.ScanQueries
import org.apache.spark.sql.functions._

class ScanQueriesSpec extends SparkSpec {
  lazy val w = NessusSynth(spark, sf)

  test("scanStats emits the 14-column stats order (Q7)") {
    val df = ScanQueries.scanStats(w, sid = 7, offset = 0)
    assert(df.columns.toSeq == ScanQueries.statsCols)
    assert(df.count() == 1)
  }

  test("scanResults emits the 32-column results order (Q7)") {
    val df = ScanQueries.scanResults(w, sid = 7, offset = 0)
    assert(df.columns.toSeq == ScanQueries.resultsCols)
  }

  test("nthLatestRun: offset beyond history yields empty (T1)") {
    val df = ScanQueries.scanStats(w, sid = 7, offset = 100000)
    assert(df.count() == 0)
  }

  test("nthLatestRun picks strictly the (offset+1)-th by scan_start desc, scan_run_id desc") {
    val runs = w.scanRun.filter(col("scan_id") === 7)
    val top2 = runs
      .orderBy(desc("scan_start"), desc("scan_run_id"))
      .limit(2)
      .select("scan_run_id")
      .collect()
      .map(_.getLong(0))
    val got0 = ScanQueries
      .nthLatestRun(runs, 0).select("scan_run_id").collect().map(_.getLong(0))
    val got1 = ScanQueries
      .nthLatestRun(runs, 1).select("scan_run_id").collect().map(_.getLong(0))
    assert(got0.toSeq == Seq(top2(0)))
    assert(got1.toSeq == Seq(top2(1)))
  }

  test("folderStats = one row per scan in folder that has >offset runs") {
    val df = ScanQueries.folderStats(w, fid = 1, offset = 0)
    val scansInFolder = w.scan.filter(col("folder_id") === 1).count()
    assert(df.count() == scansInFolder) // every scan has runs at sf0.001
    assert(df.select("scan_id").distinct().count() == scansInFolder)
  }

  test("folderResults(pid) filters to that plugin only (F5)") {
    val all = ScanQueries.folderResults(w, fid = 1, pid = None, offset = 0)
    val pids = all.select("plugin_id").distinct().collect().map(_.getLong(0))
    if (pids.nonEmpty) {
      val one = ScanQueries.folderResults(w, fid = 1, pid = Some(pids.head), offset = 0)
      assert(one.select("plugin_id").distinct().collect().map(_.getLong(0)).toSeq == Seq(pids.head))
    }
  }

  test("severity counts: run-level = sum of host-level within run (Q1 fixed invariant)") {
    val hostSum = w.host
      .groupBy("scan_run_id")
      .agg(
        sum("critical_count").as("c"), sum("high_count").as("h"),
        sum("medium_count").as("m"), sum("low_count").as("l"),
        sum("info_count").as("i"))
    val mismatches = w.scanRun
      .join(hostSum, Seq("scan_run_id"))
      .filter(
        col("critical_count") =!= col("c") || col("high_count") =!= col("h") ||
          col("medium_count") =!= col("m") || col("low_count") =!= col("l") ||
          col("info_count") =!= col("i"))
      .count()
    assert(mismatches == 0)
  }

  test("legacy severity mode (Q1): info_count always 0") {
    import graft.etl.NessusSynth.severityPivot
    val hvSev = w.hostVuln.join(w.plugin.select("plugin_id", "severity"), Seq("plugin_id"))
    val legacy = severityPivot(hvSev, Seq("scan_run_id"), legacy = true)
    assert(legacy.filter(col("info_count") =!= 0).count() == 0)
    val fixed = severityPivot(hvSev, Seq("scan_run_id"))
    assert(fixed.filter(col("info_count") > 0).count() > 0)
  }
}
