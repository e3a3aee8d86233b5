package graft

import graft.etl.Incremental
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {

  test("watermarks: max valid 8-digit segment per deployment; malformed ignored (F8)") {
    val s = spark
    import s.implicits._
    val keys = Seq(
      "dep1/20240105/scan.json",
      "dep1/20240212/folder.json",
      "dep1/notadate/scan.json", // non-digit
      "dep1/2024021/scan.json", // 7 digits
      "dep1/202402123/scan.json", // 9 digits
      "dep2/junk/scan.json" // deployment with no valid dates → epoch default
    ).toDF("key")
    val wm = Incremental.watermarks(keys).collect()
      .map(r => r.getString(0) -> r.getDate(1).toString).toMap
    assert(wm("dep1") == "2024-02-12")
    assert(wm("dep2") == "1970-01-01") // C12 empty default
  }

  test("newCompletedRuns: completed + date(last_mod) >= watermark, `>=` not `>` (W4)") {
    val s = spark
    import s.implicits._
    // 2024-01-08 00:00:00 UTC = 1704672000
    val hist = Seq(
      (1L, "completed", 1704672000L), // exactly watermark day → kept (>=)
      (2L, "completed", 1704671999L), // day before → dropped
      (3L, "running", 1704758400L), // wrong status → dropped (W5)
      (4L, "completed", 1704758400L) // after → kept
    ).toDF("id", "status", "last_modification_date")
    val got = Incremental
      .newCompletedRuns(hist, to_date(lit("2024-01-08")))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L))
  }

  test("dedupLatest keeps exactly the newest row per key") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 20L, "c"), (2L, 5L, "d")
    ).toDF("k", "ts", "v")
    val got = Incremental
      .dedupLatest(df, Seq("k"), Seq(col("ts").desc, col("v").desc))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(1L -> "c", 2L -> "d"))
  }
}
