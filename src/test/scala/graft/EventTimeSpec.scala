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

  test("registry events queries are encoding-invariant: nanos-long and NTZ fixtures agree end-to-end") {
    val s = spark
    import s.implicits._
    // the same 400 events, written under both physical encodings the
    // fixture has historically shipped with
    val rows = (1L to 400L).map { i =>
      val us = 1704067200000000L + i * 137000000L // ~2.3-min spacing from 2024-01-01
      (i, us, i % 23, Seq("click", "view", "purchase", "error", "signup")(((i % 5)).toInt),
        (i % 97).toDouble, s"""{"k": ${i % 13}}""")
    }
    def dirFor(kind: String): String = {
      val d = java.nio.file.Files.createTempDirectory(s"evt_$kind").toString
      val base = rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      val df = kind match {
        case "nanos" => base.select(col("event_id"), (col("us") * 1000L).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        case "ntz" => base.select(col("event_id"),
          timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
      }
      df.coalesce(1).write.parquet(s"$d/tmp_out")
      // the registry reads <dir>/events.parquet as a single path
      val part = new java.io.File(s"$d/tmp_out").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$d/events.parquet"))
      d
    }
    val (nanosDir, ntzDir) = (dirFor("nanos"), dirFor("ntz"))
    for (q <- Seq("events_pivot", "events_retention", "events_window_agg", "scd2_intervals")) {
      val a = graft.queries.RelQueries.queries.getOrElse(
        q, graft.queries.OpsQueries.queries(q))(spark, nanosDir).collect().map(_.toString).sorted
      val b = graft.queries.RelQueries.queries.getOrElse(
        q, graft.queries.OpsQueries.queries(q))(spark, ntzDir).collect().map(_.toString).sorted
      assert(a.sameElements(b), s"$q differs across encodings")
      assert(a.nonEmpty, s"$q produced no rows")
    }
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
