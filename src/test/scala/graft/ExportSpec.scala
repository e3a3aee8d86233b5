package graft

import graft.api.Export
import graft.io.LandingZone
import graft.sources.Endpoints

/** The two assembled entry points end-to-end against the fake API:
  * incremental (export.py) and lastMonth (export_last_month.py), including
  * the behaviors that differ — watermark source and snapshot gating.
  */
class ExportSpec extends SparkSpec {

  private def epoch(daysAgo: Int): Long =
    System.currentTimeMillis() / 1000L - daysAgo * 86400L

  /** worldFixture with live-relative dates: run 10 finished 5 days ago,
    * run 9 finished 100 days ago (completed but outside any 30-day window),
    * run 11 still running. Run 9's bundle is a zero-host run so the fetch
    * fixtures stay small.
    */
  private lazy val world: Map[String, String] =
    new ExtractSpec().worldFixture ++ Map(
      Endpoints.Folders -> """{"folders": [{"id": 100, "type": "custom", "name": "f"}]}""",
      Endpoints.scan(1) ->
        s"""{"history": [
           |  {"history_id": 10, "status": "completed", "last_modification_date": ${epoch(5)}},
           |  {"history_id": 9,  "status": "completed", "last_modification_date": ${epoch(100)}},
           |  {"history_id": 11, "status": "running",   "last_modification_date": ${epoch(1)}}]}""".stripMargin,
      Endpoints.scanRun(1, 9) ->
        """{"info": {"scan_start": 1, "scan_end": 2, "hostcount": 0}, "hosts": []}""")

  private def tempRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_export_").toString

  test("incremental: epoch watermark on first run, landed watermark gates the second") {
    val root = tempRoot()
    val factory = FakeFactory(world)
    // first run: empty landing → watermark 1970-01-01 → both completed runs
    val first = Export.incremental(spark, factory, "dep-1", root)
    assert(first == Export.Result(2L, snapshotsWritten = true))
    val docs = LandingZone.readScanRunDocs(spark, s"$root/${Export.ScanRunsDir}")
    assert(docs.count() == 2)
    assert(
      docs.select("history_id").collect().map(_.getLong(0)).toSet == Set(9L, 10L))
    // second run: watermark is now today's landed partition, both runs
    // pre-date it → nothing new, and snapshots are NOT rewritten (K3)
    val second = Export.incremental(spark, factory, "dep-1", root)
    assert(second == Export.Result(0L, snapshotsWritten = false))
    assert(docs.count() == 2)
  }

  test("lastMonth: fixed 30-day lookback excludes the 100-day-old run (F2)") {
    val root = tempRoot()
    val result = Export.lastMonth(spark, FakeFactory(world), "dep-1", root)
    assert(result == Export.Result(1L, snapshotsWritten = true))
    val docs = LandingZone.readScanRunDocs(spark, s"$root/${Export.ScanRunsDir}")
    assert(docs.select("history_id").collect().map(_.getLong(0)).toSeq == Seq(10L))
  }

  test("lastMonth: snapshots written even with zero new runs (Q10 snapshotAlways)") {
    val root = tempRoot()
    val staleWorld = world + (Endpoints.scan(1) ->
      s"""{"history": [
         |  {"history_id": 9, "status": "completed", "last_modification_date": ${epoch(100)}}]}""".stripMargin)
    val result = Export.lastMonth(spark, FakeFactory(staleWorld), "dep-1", root)
    assert(result == Export.Result(0L, snapshotsWritten = true))
    // snapshot partitions landed; no scan-run docs directory at all
    assert(LandingZone.listKeys(spark, root).collect().map(_.getString(0)).toSet ==
      Set(
        s"dep-1/${today()}/${Export.FoldersDir}.json",
        s"dep-1/${today()}/${Export.ScansDir}.json"))
    // and the incremental mode would NOT have written them:
    val root2 = tempRoot()
    val inc = Export.incremental(spark, FakeFactory(staleWorld), "dep-1", root2)
    // (watermark 1970 picks up run 9 — so land it; rerun is the no-op case)
    assert(inc.runsLanded == 1L)
    val inc2 = Export.incremental(spark, FakeFactory(staleWorld), "dep-1", root2)
    assert(inc2 == Export.Result(0L, snapshotsWritten = false))
  }

  private def today(): String =
    java.time.LocalDate.now().format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
}
