package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

case class Evt(user_id: Long, ts_secs: Long)
case class SessionState(start: Long, last: Long, n: Int)

/** Lifetime late-drop accounting for LONG-RUNNING streaming queries —
  * [[EventsStream.lateDropCount]] without the `recentProgress` retention
  * bound: register once (`spark.streams.addListener(acc)`), and every
  * progress event folds its per-operator
  * `numRowsDroppedByWatermark` into a per-run total as batches complete,
  * so a month-old query's cumulative data loss is still one exact number
  * (`acc.total(q.runId)`). Keyed by runId (a restart is a new
  * accounting epoch — drops before the restart belong to the old run's
  * ledger); memory is one counter per run that ever dropped a row.
  */
class LateDropAccumulator extends org.apache.spark.sql.streaming.StreamingQueryListener {
  import org.apache.spark.sql.streaming.StreamingQueryListener._
  private val totals = new java.util.concurrent.ConcurrentHashMap[java.util.UUID, java.lang.Long]()

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val d = event.progress.stateOperators.iterator.map(_.numRowsDroppedByWatermark).sum
    if (d != 0L)
      totals.merge(event.progress.runId, java.lang.Long.valueOf(d),
        (a, b) => java.lang.Long.valueOf(a.longValue + b.longValue))
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  /** Cumulative watermark-dropped rows for one query run (0 when the run
    * never dropped — or was never seen by this listener).
    */
  def total(runId: java.util.UUID): Long =
    Option(totals.get(runId)).map(_.longValue).getOrElse(0L)
}

/** Per-user state: the open session fragments, disjoint and sorted by
  * start. Size is bounded by the number of sessions IN FLIGHT (batch time
  * span / gap), never by event count — a hot user (bot traffic) with
  * millions of events in a micro-batch still holds only its handful of
  * fragments.
  */
case class OpenSessions(frags: Seq[SessionState])
case class Session(user_id: Long, session_start: Long, session_end: Long, n_events: Int)
case class TokCount(key: String, token: String, est: Long)
case class KeyDistinct(key: String, n_kept: Long, est_distinct: Long)
case class ValEvt(user_id: Long, v: Long)
case class UserTotals(user_id: Long, n_events: Long, total_value: Long)
case class TypedEvt(user_id: Long, ts_us: Long, event_id: Long, event_type: String)
case class Transition(user_id: Long, from_type: String, to_type: String, ts_us: Long)

/** Per-user running totals on the `transformWithState` arbitrary-state API
  * (Spark 4's successor to flatMapGroupsWithState): one `ValueState` cell
  * per user, updated per micro-batch, current totals emitted in Update
  * mode. The API's value over the old one at scale: typed named state
  * cells with per-cell TTL (`TTLConfig`) — bounding state lifetime
  * declaratively instead of hand-rolled timeout bookkeeping. `ttlMs` > 0
  * turns that knob on here too (the [[TransitionsProcessor]] bound: state
  * sized by users ACTIVE within the TTL, not every user_id ever seen) —
  * with the semantic caveat documented honestly: a TTL'd TOTAL forgets.
  * An expired user's next event restarts the count from zero, so the
  * output is "totals over activity windows no further than the TTL
  * apart", not lifetime totals. Grain that matters forever belongs in a
  * persisted rollup ([[graft.ops.Rollup.ingestAggBatch]]); the TTL is for
  * live dashboards where an idle user's cell is pure rent.
  */
class RunningTotalsProcessor(ttlMs: Long = 0L)
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, ValEvt, UserTotals] {
  import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
  @transient private var totals: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Long)](
      "totals",
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong),
      if (ttlMs > 0) TTLConfig(java.time.Duration.ofMillis(ttlMs)) else TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[ValEvt],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserTotals] = {
    var (n, tot) = if (totals.exists()) totals.get() else (0L, 0L)
    rows.foreach { e => n += 1; tot += e.v }
    totals.update((n, tot))
    Iterator.single(UserTotals(key, n, tot))
  }
}

/** The streaming face of [[graft.ops.Funnel.transitions]]: the batch
  * operator's lag-1 window CANNOT see across micro-batch boundaries (a
  * user's last event of batch N chains to their first of batch N+1), so
  * the cross-batch edge lives in one `ValueState` cell per user — the
  * user's latest (ts, event_id, type). Each micro-batch sorts the user's
  * rows, chains from the stored last event, and emits every transition
  * exactly once. State is ONE tuple per user — and with `ttlMs` > 0 the
  * cell carries a per-cell TTL (`TTLConfig`, the API's declarative state
  * bound): a user idle past the TTL has the cell evicted, so the store is
  * bounded by ACTIVE users, not by every user_id ever seen (at 100×
  * user cardinality an unbounded store only grows). Expiry semantics are
  * the honest ones: an expired user's next event opens a fresh chain —
  * no transition is emitted from the stale last event, exactly as if the
  * user had never been seen. Beyond the TTL the stored event is stale
  * CONTEXT, not a neighbor; chaining a month-old "view" into today's
  * "click" would be a transition no bounded-lateness batch job over the
  * same events would produce.
  */
class TransitionsProcessor(ttlMs: Long = 0L)
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, TypedEvt, Transition] {
  import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}
  @transient private var last: ValueState[(Long, Long, String)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    last = getHandle.getValueState[(Long, Long, String)](
      "last",
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING),
      if (ttlMs > 0) TTLConfig(java.time.Duration.ofMillis(ttlMs)) else TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[TypedEvt],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[Transition] = {
    val stored: Option[(Long, Long, String)] = if (last.exists()) Some(last.get()) else None
    // Late-data policy: an event at or before the stored last (ts, id) is
    // DROPPED — emitting it would chain time-backward (a transition the
    // batch operator over the same events could never produce) and
    // regressing the state would corrupt every later batch's chaining.
    // The watermark move, applied to transition state.
    val sorted = rows.toSeq
      .filter(e =>
        stored.forall { case (ts, id, _) =>
          e.ts_us > ts || (e.ts_us == ts && e.event_id > id)
        })
      .sortBy(e => (e.ts_us, e.event_id))
    var prevType: Option[String] = stored.map(_._3)
    val out = Seq.newBuilder[Transition]
    sorted.foreach { e =>
      prevType.foreach(t => out += Transition(key, t, e.event_type, e.ts_us))
      prevType = Some(e.event_type)
    }
    sorted.lastOption.foreach(e => last.update((e.ts_us, e.event_id, e.event_type)))
    out.result().iterator
  }
}

/** Structured-Streaming incarnation of the engine's incremental semantics
  * (SURVEY §2.9): the reference's daily cron batch maps to a file-source
  * stream with `Trigger.AvailableNow` (W1), its watermark to an event-time
  * watermark (W2/W3), and its tumbling daily partition to a tumbling window
  * (W7). Plus custom session state via flatMapGroupsWithState — the
  * operator shape for anything the built-in windows can't express.
  */
object EventsStream {

  /** events.parquet as a streaming source, `ts` normalized to a
    * second-truncated timestamp column `t` regardless of the fixture's
    * physical encoding — the inferred batch schema drives
    * [[graft.io.EventTime]]'s branch, so the stream survives an upstream
    * producer switching between int64-nanos and TIMESTAMP(MICROS).
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
        graft.io.EventTime.tExpr(col("ts"), schema("ts").dataType).as("t"))
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

  /** Rows dropped PAST the watermark over a streaming query's reported
    * progress — the OBSERVABLE face of [[windowedCounts]]/[[slidingCounts]]/
    * [[sessionCounts]]/[[purchaseAttribution]]'s drop contract ("late rows beyond the
    * watermark are dropped"): the house no-silent-caps rule says a drop
    * must be measurable, not assumed, and the engine already accounts for
    * it per stateful operator (`stateOperators[].numRowsDroppedByWatermark`
    * in every `StreamingQueryProgress`) — this sums that, so data loss is
    * a number a dashboard alarms on instead of a docstring clause. Reads
    * `recentProgress`, which retains the last
    * `spark.sql.streaming.numRecentProgressUpdates` batches (default 100) —
    * exact for bounded runs (`Trigger.AvailableNow`, tests, backfills);
    * a long-running query wants the listener-based
    * [[LateDropAccumulator]], which survives retention.
    *
    * Two accounting facts a caller must know (both pinned by the
    * `events_stream_late_drops` oracle row): (1) the count's GRAIN is the
    * stateful operator's input — for windowed aggregations that sits
    * after the per-batch partial aggregate, so drops count late
    * (window, key) GROUPS per batch, a lower bound on raw late rows;
    * (2) Spark filters late events with the PREVIOUS micro-batch's
    * watermark (the two-value tracker — eviction uses the current one),
    * so rows arriving in the first batch after the watermark-advancing
    * one are still accepted; only from the next batch (or a restart,
    * which seeds both values from the checkpoint) do they count as drops.
    */
  def lateDropCount(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.iterator
      .flatMap(_.stateOperators.iterator)
      .map(_.numRowsDroppedByWatermark)
      .sum

  /** Sliding (hopping) window counts on the stream: 1-hour windows every
    * `slide`, so each event contributes to size/slide windows. Same
    * watermark/append semantics as [[windowedCounts]]; the batch mirror is
    * the oracle-checked `events_hopping_agg` query.
    */
  def slidingCounts(events: DataFrame, slide: String = "30 minutes"): DataFrame =
    events
      .withWatermark("t", "1 hour")
      .groupBy(window(col("t"), "1 hour", slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"),
        col("n"))

  /** Stream-stream interval join — purchase attribution in flight: every
    * purchase pairs with the same user's clicks from the preceding
    * `horizon`. Both sides carry watermarks and the join condition bounds
    * event time in BOTH directions, so Spark can size the state store
    * exactly (a click is droppable once the watermark passes click_t +
    * horizon; a purchase once its own watermark passes) — the canonical
    * bounded-state stream-stream join. Without the time bound the state
    * would grow forever; this is the streaming analogue of
    * [[graft.ops.Relational.asOfJoin]]'s batch shape.
    */
  def purchaseAttribution(events: DataFrame, horizon: String = "1 hour"): DataFrame = {
    val clicks = events
      .filter(col("event_type") === "click")
      .select(
        col("user_id"),
        col("t").as("click_t"),
        col("event_id").as("click_id"),
        col("value").as("click_value"))
      .withWatermark("click_t", horizon)
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("t").as("purchase_t"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_t", horizon)
    purchases
      .as("p")
      .join(
        clicks.as("c"),
        expr(s"""
          p.user_id = c.user_id AND
          c.click_t <= p.purchase_t AND
          c.click_t >= p.purchase_t - INTERVAL '$horizon'
        """))
      .select(
        col("p.user_id").as("user_id"),
        col("purchase_id"),
        col("purchase_t"),
        col("click_id"),
        col("click_value"))
  }

  /** Stream-static enrichment join: each micro-batch hash-joins against
    * the static dimension; Spark re-plans the static side per batch, and
    * a small dimension broadcasts — no stream-side shuffle, no state. The
    * canonical "attach user/deployment metadata on ingest" shape.
    */
  def enriched(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Exactly-once landing sink: each micro-batch lands under its own
    * `batch_id=<n>` directory with overwrite semantics, so a retried batch
    * (same checkpointed id) rewrites its directory instead of duplicating —
    * idempotence comes from the deterministic (batchId -> path) mapping
    * plus the checkpoint, the standard foreachBatch exactly-once recipe
    * for file sinks that need layouts the built-in file sink can't write.
    */
  def landingSink(
      stream: DataFrame,
      root: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write
          .mode(org.apache.spark.sql.SaveMode.Overwrite)
          .json(s"$root/batch_id=$batchId")
        ()
      }
      .start()

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

  /** Merge one event into the sorted disjoint fragment set. Session
    * membership is the transitive closure of "gap <= gapSecs", which is
    * order-independent — so streaming the iterator one event at a time
    * yields exactly what sort-then-fold would, WITHOUT materializing the
    * group (the old `rows.toSeq.sortBy` buffered a whole user per batch;
    * a hot user would OOM the task).
    */
  private[streaming] def merge(
      frags: scala.collection.mutable.ArrayBuffer[SessionState],
      ts: Long,
      gapSecs: Long): Unit = {
    // first fragment starting after ts; pred is the one before it
    val idx = frags.indexWhere(_.start > ts) match {
      case -1 => frags.size
      case i => i
    }
    val joinsPred = idx > 0 && ts - frags(idx - 1).last <= gapSecs
    val joinsSucc = idx < frags.size && frags(idx).start - ts <= gapSecs
    (joinsPred, joinsSucc) match {
      case (true, true) => // event bridges two fragments: coalesce
        val p = frags(idx - 1)
        val s = frags(idx)
        frags(idx - 1) = SessionState(p.start, math.max(p.last, s.last), p.n + s.n + 1)
        frags.remove(idx)
      case (true, false) =>
        val p = frags(idx - 1)
        frags(idx - 1) = p.copy(last = math.max(p.last, ts), n = p.n + 1)
      case (false, true) =>
        val s = frags(idx)
        frags(idx) = s.copy(start = ts, n = s.n + 1)
      case (false, false) =>
        frags.insert(idx, SessionState(ts, ts, 1))
    }
  }

  /** Gap-based sessionization: events of a user belong to one session while
    * consecutive gaps are <= gapSecs. At the end of each micro-batch every
    * fragment except the newest is emitted closed (the same cross-batch
    * ordering assumption the reference's daily batches make); the newest is
    * carried in [[GroupState]]. Out-of-order arrivals WITHIN a batch land in
    * their correct session via fragment merging; a cross-batch straggler
    * older than (open session start - gap) becomes its own session rather
    * than buffering unbounded history.
    *
    * Late-data accounting: this face carries NO watermark (NoTimeout, no
    * `withWatermark`), so nothing is ever watermark-dropped and
    * [[lateDropCount]] honestly reads 0 — stragglers are KEPT under the
    * own-session policy above, spec-pinned against the same hours-late
    * row that [[sessionCounts]]'s watermark counts as a drop. The price
    * of keep-everything is per-user state only the fragment bound
    * limits; a pipeline wanting bounded lateness uses [[sessionCounts]],
    * where the drop IS a number.
    */
  def sessionize(events: Dataset[Evt], gapSecs: Long): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSessions, Session](
        OutputMode.Append,
        GroupStateTimeout.NoTimeout) { (uid, rows, state: GroupState[OpenSessions]) =>
        val frags = scala.collection.mutable.ArrayBuffer.empty[SessionState]
        state.getOption.foreach(_.frags.foreach(frags += _))
        rows.foreach(e => merge(frags, e.ts_secs, gapSecs))
        if (frags.isEmpty) Iterator.empty
        else {
          // disjoint + sorted by start → the last fragment has the max
          // `last`; it alone may still grow
          val open = frags.remove(frags.size - 1)
          state.update(OpenSessions(Seq(open)))
          frags.iterator.map(f => Session(uid, f.start, f.last, f.n))
        }
      }
  }

  /** Streaming gap sessionization via the BUILT-IN session windows
    * (Spark 3.2+ native session_window state): per (user, merged window)
    * event counts, emitted in Append mode once the watermark passes a
    * session's end. This is the compose-built-ins-first face of
    * [[sessionize]] — engine-managed merging state, bounded by the
    * watermark horizon; the custom flatMapGroupsWithState variant remains
    * for semantics the built-in can't express (fragment-level emission,
    * custom straggler policy). Rows later than the horizon are dropped
    * by the session store's input filter and COUNTED — the engine
    * reports them in `numRowsDroppedByWatermark` exactly as for tumbling
    * windows, so [[lateDropCount]] covers this face too (spec-pinned).
    */
  def sessionCounts(
      events: DataFrame,
      gap: String = "30 minutes",
      horizon: String = "1 hour"): DataFrame =
    events
      .withWatermark("t", horizon)
      .groupBy(col("user_id"), session_window(col("t"), gap).as("w"))
      .agg(count(lit(1)).cast("long").as("n_events"))
      .select(
        col("user_id"),
        col("w.start").cast("long").as("session_start"),
        col("w.end").cast("long").as("session_end"),
        col("n_events"))

  /** [[RunningTotalsProcessor]] wired over a stream: per-user running
    * event count + value total via `transformWithState`. `ttlMs` > 0
    * bounds state per cell (TTL needs the processing-time TimeMode —
    * same operational notes as [[transitionStream]]: real trigger
    * interval, poll the sink, never `processAllAvailable`); remember a
    * TTL'd total FORGETS idle users — see the processor doc.
    */
  def runningTotals(events: Dataset[ValEvt], ttlMs: Long = 0L): Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new RunningTotalsProcessor(ttlMs),
        if (ttlMs > 0) org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
        else org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** [[TransitionsProcessor]] wired over a stream: per-user event-type
    * transitions with the cross-batch edge carried in `ValueState`.
    * `ttlMs` > 0 bounds state lifetime per cell (TTL requires the
    * processing-time TimeMode); 0 keeps the unbounded-store behavior for
    * bounded-cardinality keys. Operational note: in processing-time mode
    * the engine schedules a no-data micro-batch per trigger to service
    * TTL even when sources are idle — run a TTL'd stream with a real
    * trigger interval (not the as-fast-as-possible default), and don't
    * wait on `processAllAvailable` (it never sees the idle signal those
    * batches suppress; poll the sink or the query progress instead).
    */
  def transitionStream(events: Dataset[TypedEvt], ttlMs: Long = 0L): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new TransitionsProcessor(ttlMs),
        if (ttlMs > 0) org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
        else org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  /** Streaming per-key heavy hitters: the Misra-Gries sketch
    * ([[graft.functions.MisraGries]], the batch `udaf`'s reduce step
    * verbatim) carried as [[GroupState]] — k entries per key FOREVER,
    * regardless of stream length, so this never needs a watermark to bound
    * state (the sketch IS the bound). Each micro-batch re-emits the key's
    * current summary (Update-mode semantics): the "trending tokens per
    * channel" feed over an unbounded stream, with the same one-sided
    * guarantee as the batch operator — a token can be undercounted, never
    * missed once it is truly frequent.
    */
  def heavyHitterStream(toks: Dataset[(String, String)], k: Int = 8): Dataset[TokCount] = {
    val spark = toks.sparkSession
    import spark.implicits._
    val mg = new graft.functions.MisraGries(k)
    toks
      .groupByKey(_._1)
      .flatMapGroupsWithState[Map[String, Long], TokCount](
        OutputMode.Update,
        GroupStateTimeout.NoTimeout) { (key, rows, state: GroupState[Map[String, Long]]) =>
        var buf = state.getOption.getOrElse(Map.empty[String, Long])
        rows.foreach(r => buf = mg.reduce(buf, r._2))
        state.update(buf)
        mg.finish(buf).iterator.map { case (t, c) => TokCount(key, t, c) }
      }
  }

  /** Streaming per-key distinct-count sketch: the KMV state machine as
    * `flatMapGroupsWithState` — per key, the state is the k smallest
    * 56-bit md5 hashes seen so far (k longs FOREVER, no watermark needed:
    * the sketch IS the bound, exactly like [[heavyHitterStream]]), and
    * every update emits the same estimate rule as
    * [[graft.ops.Stats.kmvEstimate]]: exact below k, `(k-1)·2⁵⁶ div h_k`
    * at k. The hash matches [[graft.ops.Stats.kmvSketch]] bit-for-bit
    * (first 14 md5 hex digits), so the live stream estimate equals the
    * batch sketch over the same prefix — the equivalence the spec pins.
    * Contrast with [[graft.streaming.SketchIngest.kmvIngest]], which
    * persists batch-keyed sketches for AUDIT and cross-stream merge;
    * this face answers "distinct users right now" from the state store
    * with no storage round-trip.
    */
  def distinctSketchStream(rows: Dataset[(String, String)], k: Int = 64): Dataset[KeyDistinct] = {
    val spark = rows.sparkSession
    import spark.implicits._
    require(k >= 2 && k <= 128, s"k must be in [2, 128], got $k")
    rows
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Int, Seq[Long]), KeyDistinct](
        OutputMode.Update,
        GroupStateTimeout.NoTimeout) { (key, it, state: GroupState[(Int, Seq[Long])]) =>
        // the state pins its k (the ingestKmvBatch params contract): a
        // restart with a different k would otherwise read a saturated
        // k=64 state as "below the new k=128, hence exact" — silent
        // garbage for every saturated key
        val (k0, prev) = state.getOption.getOrElse((k, Nil))
        if (k0 != k)
          throw new IllegalStateException(
            s"distinctSketchStream checkpoint for '$key' was built with k=$k0, restarted with k=$k")
        var set = scala.collection.immutable.TreeSet.empty[Long] ++ prev
        it.foreach { case (_, v) =>
          val hex = java.security.MessageDigest
            .getInstance("MD5")
            .digest(v.getBytes("UTF-8"))
            .map("%02x".format(_))
            .mkString
          set += java.lang.Long.parseLong(hex.substring(0, 14), 16)
          if (set.size > k) set -= set.last
        }
        state.update((k, set.toSeq))
        val nKept = set.size.toLong
        val est = if (nKept < k) nKept else (k - 1).toLong * (1L << 56) / set.last
        Iterator.single(KeyDistinct(key, nKept, est))
      }
  }

  /** Streaming exact-dedup: first occurrence of each key wins, duplicates in
    * later micro-batches are dropped. Built on the engine-native
    * `dropDuplicatesWithinWatermark` rather than custom state — the state
    * store keeps one entry per key only until the watermark passes it, so
    * state is bounded by the dedup horizon, not by stream length (an
    * unbounded `dropDuplicates` on a 100 TB/day stream is a slow OOM).
    */
  def dedupeStream(events: DataFrame, keyCol: String, horizon: String = "1 hour"): DataFrame =
    events
      .withWatermark("t", horizon)
      .dropDuplicatesWithinWatermark(keyCol)

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
