package graft

import graft.streaming.{Evt, EventsStream}
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  test("streaming windowed counts (AvailableNow + watermark) match batch aggregation") {
    val streaming = EventsStream.windowedCounts(EventsStream.source(spark, sf))
    val got = EventsStream
      .runToMemory(spark, streaming, "win_counts")
      .agg(sum("n"))
      .collect()
      .head
      .getLong(0)
    val batch = spark.read.parquet(s"$sf/events.parquet").count()
    // append mode withholds only windows not yet finalized by the watermark;
    // with AvailableNow over a bounded file the final watermark passes all
    // but the trailing window(s)
    assert(got > batch / 2 && got <= batch)
  }

  test("flatMapGroupsWithState sessionization splits on gaps") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      Evt(1L, 1000L), Evt(1L, 1500L), Evt(1L, 4000L), // gap 2500 > 1800 → 2 sessions
      Evt(2L, 100L)
    ).toDS()
    val sessions = EventsStream.sessionize(ev, gapSecs = 1800).collect()
    // batch mode emits only CLOSED sessions (state cannot persist): user 1's
    // first session closes when the gap appears
    assert(sessions.length == 1)
    assert(sessions.head == graft.streaming.Session(1L, 1000L, 1500L, 2))
  }

  test("batch sessionization closes open sessions and matches the state-based split") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      Evt(1L, 1000L), Evt(1L, 1500L), Evt(1L, 4000L),
      Evt(2L, 100L)
    ).toDS()
    val sessions = EventsStream
      .sessionizeBatch(ev, gapSecs = 1800)
      .collect()
      .map(r =>
        (r.getAs[Long]("user_id"), r.getAs[Long]("session_start"),
          r.getAs[Long]("session_end"), r.getAs[Int]("n_events")))
      .toSet
    assert(sessions == Set((1L, 1000L, 1500L, 2), (1L, 4000L, 4000L, 1), (2L, 100L, 100L, 1)))
  }
}
