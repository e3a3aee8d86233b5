package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

case class Evt(user_id: Long, ts_secs: Long)
case class SessionState(start: Long, last: Long, n: Int)
case class Session(user_id: Long, session_start: Long, session_end: Long, n_events: Int)

/** Structured-Streaming incarnation of the engine's incremental semantics
  * (SURVEY §2.9): the reference's daily cron batch maps to a file-source
  * stream with `Trigger.AvailableNow` (W1), its watermark to an event-time
  * watermark (W2/W3), and its tumbling daily partition to a tumbling window
  * (W7). Plus custom session state via flatMapGroupsWithState — the
  * operator shape for anything the built-in windows can't express.
  */
object EventsStream {

  /** events.parquet as a streaming source (ts arrives as nanos long under
    * nanosAsLong; normalized to a timestamp column `t`).
    */
  def source(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    spark.readStream
      .schema(schema)
      // file source needs a directory basePath; glob-filter to the one table
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        col("value"),
        timestamp_seconds(expr("ts div 1000000000")).as("t"))
  }

  /** Hourly tumbling-window counts with a 1-hour watermark — late rows
    * beyond the watermark are dropped, finalized windows emit exactly once
    * (append mode).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("t", "1 hour")
      .groupBy(window(col("t"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"),
        col("n"))

  /** Run a streaming DataFrame to a memory sink with AvailableNow (process
    * everything currently in the source, then stop) and return the sink
    * contents.
    */
  def runToMemory(
      spark: SparkSession,
      streaming: DataFrame,
      name: String,
      mode: OutputMode = OutputMode.Append): DataFrame = {
    val q = streaming.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Gap-based sessionization: events of a user belong to one session while
    * consecutive gaps are <= gapSecs. Closed sessions are emitted; the open
    * session is carried in [[GroupState]] across micro-batches (and emitted
    * as open=closed at end of input in batch mode, where state never
    * persists).
    */
  def sessionize(events: Dataset[Evt], gapSecs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append,
        GroupStateTimeout.NoTimeout) { (uid, rows, state: GroupState[SessionState]) =>
        val sorted = rows.toSeq.sortBy(e => (e.ts_secs))
        var cur = state.getOption
        val closed = Seq.newBuilder[Session]
        sorted.foreach { e =>
          cur match {
            case Some(s) if e.ts_secs - s.last <= gapSecs =>
              cur = Some(s.copy(last = e.ts_secs, n = s.n + 1))
            case Some(s) =>
              closed += Session(uid, s.start, s.last, s.n)
              cur = Some(SessionState(e.ts_secs, e.ts_secs, 1))
            case None =>
              cur = Some(SessionState(e.ts_secs, e.ts_secs, 1))
          }
        }
        cur.foreach(state.update)
        closed.result().iterator
      }
  }

  /** Batch-mode sessionization including the still-open trailing session per
    * user (state does not persist across invocations in batch).
    */
  def sessionizeBatch(events: Dataset[Evt], gapSecs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts_secs")
    events
      .toDF()
      .withColumn("prev", lag("ts_secs", 1).over(w))
      .withColumn(
        "new_session",
        when(col("prev").isNull || col("ts_secs") - col("prev") > gapSecs, 1L).otherwise(0L))
      .withColumn("session_no", sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_no")
      .agg(
        min("ts_secs").as("session_start"),
        max("ts_secs").as("session_end"),
        count(lit(1)).cast("int").as("n_events"))
      .drop("session_no")
  }
}
