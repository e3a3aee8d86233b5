package graft

import graft.io.EventTime
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** [[graft.io.EventTime]]: one normalizer, every physical encoding the
  * events fixture has ever shipped with. The three derivations must agree
  * across encodings of the same instant — that is the whole contract.
  */
class EventTimeSpec extends SparkSpec {

  // 2024-01-05 12:34:56.789012 UTC
  private val instantUs = 1704458096789012L

  test("legacy long-nanos and TIMESTAMP_NTZ micros normalize to the same epoch values") {
    val s = spark
    import s.implicits._
    val asNanos = Seq(instantUs * 1000L).toDF("ts")
    // micros → NTZ wall-clock via a literal cast chain (session tz is UTC)
    val asNtz = Seq(instantUs)
      .toDF("us")
      .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))

    for (df <- Seq(asNanos, asNtz)) {
      val row = df
        .select(
          EventTime.tsUs(df).as("us"),
          EventTime.tsSecs(df).as("secs"),
          EventTime.tsTimestamp(df).cast("long").as("t_secs"))
        .collect()
        .head
      assert(row.getAs[Long]("us") == instantUs, df.schema("ts").dataType.toString)
      assert(row.getAs[Long]("secs") == instantUs / 1000000L)
      assert(row.getAs[Long]("t_secs") == instantUs / 1000000L)
    }
  }

  test("TIMESTAMP (with zone) normalizes identically to NTZ under the UTC session") {
    val s = spark
    import s.implicits._
    val df = Seq(instantUs).toDF("us").select(timestamp_micros(col("us")).as("ts"))
    assert(df.select(EventTime.tsUs(df)).collect().head.getLong(0) == instantUs)
  }

  test("derived columns are integer types (no double rounding in epoch arithmetic)") {
    val s = spark
    import s.implicits._
    val df = Seq(instantUs * 1000L).toDF("ts")
    val out = df.select(EventTime.tsUs(df).as("us"), EventTime.tsSecs(df).as("secs"))
    assert(out.schema("us").dataType == LongType)
    assert(out.schema("secs").dataType == LongType)
  }

  test("an unsupported physical type fails fast with a named error") {
    val s = spark
    import s.implicits._
    val df = Seq("2024-01-01").toDF("ts")
    val e = intercept[IllegalArgumentException](df.select(EventTime.tsUs(df)))
    assert(e.getMessage.contains("unsupported event-time physical type"))
  }

  test("the live fixture reads through the normalizer: positive 2024-range seconds") {
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val r = raw
      .select(min(EventTime.tsSecs(raw)).as("lo"), max(EventTime.tsSecs(raw)).as("hi"))
      .collect()
      .head
    // sanity envelope: the fixture's event window is a bounded range of
    // real 2020s dates whatever the physical encoding
    assert(r.getAs[Long]("lo") > 1500000000L && r.getAs[Long]("hi") < 2000000000L)
  }
}
