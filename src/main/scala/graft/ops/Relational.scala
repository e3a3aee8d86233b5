package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators Spark's built-in join strategies don't provide
  * directly: as-of join (most-recent-prior match) and interval range join.
  *
  * Both are deliberately NOT expressed as inequality joins: Spark plans a
  * non-equi join as BroadcastNestedLoopJoin (O(left x right) comparisons
  * per partition), which is fatal at scale even when one side fits in
  * memory. Instead:
  *
  *   - as-of = union + running `last(..., ignoreNulls)` window: ONE shuffle
  *     on the join key, a per-key sort, zero comparisons beyond the sort —
  *     the same access pattern a dedicated as-of physical operator (e.g. a
  *     time-series engine's ASOF JOIN) performs.
  *   - range join = bucketize time into interval-length buckets; an
  *     interval then overlaps at most 2 buckets, so it explodes to exactly
  *     those bucket keys and the join becomes a broadcast EQUI-join on
  *     bucket plus a residual range filter. The big probe side is never
  *     shuffled at all.
  */
object Relational {

  /** As-of join: for every left row, attach `payloadCols` from the latest
    * right row with the same `keyCol` and `right.tsCol <= left.tsCol`.
    *
    * Mechanics: tag right rows side=0 and left rows side=1, union by name
    * (left-only / payload columns null-filled on the other side), then for
    * each payload column take `last(payload, ignoreNulls = true)` over
    * `PARTITION BY key ORDER BY ts, side, ord ROWS UNBOUNDED PRECEDING`.
    * Ordering side=0 before side=1 at equal `ts` makes the match
    * prior-OR-EQUAL; `ordCol` (a unique id present on both sides) breaks
    * remaining ties deterministically, which keeps the result
    * oracle-hashable.
    *
    * Scale: one hash exchange on `keyCol` + per-partition sort — the
    * minimum any ordered-per-key operator can do. A pathologically hot key
    * serializes within its task like any per-key ordered computation;
    * [[asOfJoinBucketed]] is the mitigation — same results, per-key
    * serial work bounded by the time-bucket width.
    *
    * `left` keeps all its columns; `right` must contain `keyCol`, `tsCol`,
    * `ordCol` and `payloadCols`, and `payloadCols` must not collide with
    * left's columns.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      ordCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val overlap = payloadCols.toSet.intersect(left.columns.toSet)
    require(overlap.isEmpty, s"payload columns collide with left side: $overlap")
    val l = left.withColumn("__side", lit(1))
    val r = right
      .select((Seq(keyCol, tsCol, ordCol) ++ payloadCols).map(col): _*)
      .withColumn("__side", lit(0))
    val w = Window
      .partitionBy(keyCol)
      .orderBy(col(tsCol), col("__side"), col(ordCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = payloadCols.foldLeft(l.unionByName(r, allowMissingColumns = true)) {
      case (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    attached
      .filter(col("__side") === 1)
      .select((left.columns.toSeq ++ payloadCols).map(col): _*)
  }

  /** [[asOfJoin]] with a staleness bound (the pandas/polars `tolerance`
    * knob): a payload column matches only when its source right row lies
    * within `toleranceUnits` of the left row's time — an older match is
    * null, exactly as if that right row did not exist. Per-column
    * semantics mirror [[asOfJoin]]: each column independently takes its
    * latest non-null value, so each column AGES independently too. Same
    * union+window shape — the per-column window state is
    * `last(struct(ts, value))` instead of `last(value)`, still one
    * shuffle on the key and no join operator.
    */
  def asOfJoinTolerance(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      ordCol: String,
      payloadCols: Seq[String],
      toleranceUnits: Long): DataFrame = {
    require(toleranceUnits >= 0, s"toleranceUnits must be non-negative (got $toleranceUnits)")
    val overlap = payloadCols.toSet.intersect(left.columns.toSet)
    require(overlap.isEmpty, s"payload columns collide with left side: $overlap")
    val l = left.withColumn("__side", lit(1))
    val r = right
      .select((Seq(keyCol, tsCol, ordCol) ++ payloadCols).map(col): _*)
      .withColumn("__side", lit(0))
    val w = Window
      .partitionBy(keyCol)
      .orderBy(col(tsCol), col("__side"), col(ordCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = payloadCols.foldLeft(l.unionByName(r, allowMissingColumns = true)) {
      case (df, c) =>
        df.withColumn(
          s"__s_$c",
          last(
            when(col(c).isNotNull, struct(col(tsCol).as("t"), col(c).as("v"))),
            ignoreNulls = true).over(w))
    }
    attached
      .filter(col("__side") === 1)
      .select(
        (left.columns.toSeq.map(col) ++
          payloadCols.map(c =>
            when(
              col(s"__s_$c").getField("t") >= col(tsCol) - toleranceUnits,
              col(s"__s_$c").getField("v")).as(c))): _*)
  }

  /** Forward as-of join: for each left row, the EARLIEST right row at or
    * after it — the mirror of [[asOfJoin]] (polars `join_asof(strategy =
    * "forward")` semantics): "the next heartbeat after each incident",
    * "the next deploy after each alert". Same tagged-union single-window
    * shape, reflected: per payload column the FIRST non-null over the
    * following frame, with left rows sorting BEFORE right rows at equal
    * ts so an exactly-simultaneous right row matches (at-or-after
    * inclusive). One shuffle on the key, no join, no row explosion —
    * the same 100 TB posture as the backward variant.
    */
  def asOfJoinForward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      ordCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val overlap = payloadCols.toSet.intersect(left.columns.toSet)
    require(overlap.isEmpty, s"payload columns collide with left side: $overlap")
    val l = left.withColumn("__side", lit(0))
    val r = right
      .select((Seq(keyCol, tsCol, ordCol) ++ payloadCols).map(col): _*)
      .withColumn("__side", lit(1))
    val w = Window
      .partitionBy(keyCol)
      .orderBy(col(tsCol), col("__side"), col(ordCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val attached = payloadCols.foldLeft(l.unionByName(r, allowMissingColumns = true)) {
      case (df, c) => df.withColumn(c, first(col(c), ignoreNulls = true).over(w))
    }
    attached
      .filter(col("__side") === 0)
      .select((left.columns.toSeq ++ payloadCols).map(col): _*)
  }

  /** [[asOfJoin]] with bounded per-key serial work: identical results,
    * but the ordered window runs per (key, time-bucket) instead of per
    * key, so a hot key's billion rows split across `ts div bucketUnits`
    * buckets instead of serializing in one task.
    *
    * Matches that cross a bucket boundary are restored by a CARRY-IN
    * stage computed at bucket granularity, never over raw rows: per
    * (key, bucket, payload column) the bucket-final value is one
    * `max(struct(ts, ord, c))` aggregation (map-side partials absorb the
    * hot key), and the running "latest earlier-bucket value" is a window
    * over that aggregated table — O(active buckets) rows per key, not
    * O(postings). Right-side states enter that window shifted one bucket
    * forward (`bucket + 1`), which makes the carry strictly-earlier-bucket
    * by construction; the within-bucket window handles everything else.
    * Each left row then takes its within-bucket match, falling back per
    * column to the carry-in — exactly [[asOfJoin]]'s per-column
    * last-non-null semantics, verified row-identical in RelationalSpec.
    *
    * Choose `bucketUnits` ≫ the median right-event spacing (so most rows
    * match within their bucket) and ≪ a task's comfortable sort size for
    * the hottest key.
    */
  def asOfJoinBucketed(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      ordCol: String,
      payloadCols: Seq[String],
      bucketUnits: Long): DataFrame = {
    require(bucketUnits > 0, s"bucketUnits must be positive (got $bucketUnits)")
    val overlap = payloadCols.toSet.intersect(left.columns.toSet)
    require(overlap.isEmpty, s"payload columns collide with left side: $overlap")
    val bkt = expr(s"$tsCol div $bucketUnits")
    val lb = left.withColumn("__bkt", bkt).withColumn("__side", lit(1))
    val rb = right
      .select((Seq(keyCol, tsCol, ordCol) ++ payloadCols).map(col): _*)
      .withColumn("__bkt", bkt)
      .withColumn("__side", lit(0))

    // per-(key, bucket) final value of each payload column: the value from
    // the latest (ts, ord) right row where that column is non-null
    val finals = rb
      .groupBy(col(keyCol), col("__bkt"))
      .agg(
        payloadCols.map(c =>
          max(when(col(c).isNotNull, struct(col(tsCol), col(ordCol), col(c))))
            .as(s"__f_$c")).head,
        payloadCols.tail.map(c =>
          max(when(col(c).isNotNull, struct(col(tsCol), col(ordCol), col(c))))
            .as(s"__f_$c")): _*)
      .select(
        col(keyCol) +: col("__bkt") +:
          payloadCols.map(c => col(s"__f_$c").getField(c).as(s"__fin_$c")): _*)

    // carry-in per left (key, bucket): running last non-null bucket-final
    // over STRICTLY earlier buckets (right states ride in at bucket + 1)
    val leftBkts = lb.select(col(keyCol), col("__bkt")).distinct()
    val carrySrc = leftBkts
      .withColumn("__sb", col("__bkt"))
      .withColumn("__cside", lit(1))
      .unionByName(
        finals.withColumn("__sb", col("__bkt") + 1).withColumn("__cside", lit(0)),
        allowMissingColumns = true)
    val cw = Window
      .partitionBy(keyCol)
      .orderBy(col("__sb"), col("__cside"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry = payloadCols
      .foldLeft(carrySrc) { case (df, c) =>
        df.withColumn(s"__carry_$c", last(col(s"__fin_$c"), ignoreNulls = true).over(cw))
      }
      .filter(col("__cside") === 1)
      .select(
        col(keyCol) +: col("__bkt") +: payloadCols.map(c => col(s"__carry_$c")): _*)

    // within-bucket as-of (the asOfJoin mechanics, partitioned one level
    // finer), then per-column fallback to the carry-in
    val w = Window
      .partitionBy(col(keyCol), col("__bkt"))
      .orderBy(col(tsCol), col("__side"), col(ordCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = payloadCols.foldLeft(lb.unionByName(rb, allowMissingColumns = true)) {
      case (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    attached
      .filter(col("__side") === 1)
      .join(carry, Seq(keyCol, "__bkt"), "left")
      .select(
        (left.columns.toSeq.map(col) ++
          payloadCols.map(c => coalesce(col(c), col(s"__carry_$c")).as(c))): _*)
  }

  /** [[asOfJoinForward]] with a staleness bound — completes the as-of
    * matrix (backward/forward × plain/bucketed/tolerance): a forward
    * match farther than `toleranceUnits` ahead of the left row nulls
    * out, each payload column aging independently. Window state is
    * `first(struct(ts, value))` over the following frame.
    */
  def asOfJoinForwardTolerance(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      ordCol: String,
      payloadCols: Seq[String],
      toleranceUnits: Long): DataFrame = {
    require(toleranceUnits >= 0, s"toleranceUnits must be non-negative (got $toleranceUnits)")
    val overlap = payloadCols.toSet.intersect(left.columns.toSet)
    require(overlap.isEmpty, s"payload columns collide with left side: $overlap")
    val l = left.withColumn("__side", lit(0))
    val r = right
      .select((Seq(keyCol, tsCol, ordCol) ++ payloadCols).map(col): _*)
      .withColumn("__side", lit(1))
    val w = Window
      .partitionBy(keyCol)
      .orderBy(col(tsCol), col("__side"), col(ordCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val attached = payloadCols.foldLeft(l.unionByName(r, allowMissingColumns = true)) {
      case (df, c) =>
        df.withColumn(
          s"__s_$c",
          first(
            when(col(c).isNotNull, struct(col(tsCol).as("t"), col(c).as("v"))),
            ignoreNulls = true).over(w))
    }
    attached
      .filter(col("__side") === 0)
      .select(
        (left.columns.toSeq.map(col) ++
          payloadCols.map(c =>
            when(
              col(s"__s_$c").getField("t") <= col(tsCol) + toleranceUnits,
              col(s"__s_$c").getField("v")).as(c))): _*)
  }

  /** Nearest as-of join — the third direction of the pandas/polars matrix
    * (`merge_asof(direction='nearest')`): for every left row, the right
    * row with the same key minimizing |right.ts − left.ts|, looking BOTH
    * ways. Distance ties go to the EARLIER (backward) match; remaining
    * ties break through the window ordering's `ordCol`, so the result is
    * deterministic and oracle-hashable.
    *
    * Mechanics: ONE tagged union and ONE sort — per payload column the
    * backward candidate is `last(struct(ts, v)) ignore nulls` over the
    * preceding frame and the forward candidate `first(struct(ts, v))`
    * over the following frame of the SAME (ts, side, ord) sort. Right
    * rows sort before left rows at equal ts, so an exactly-simultaneous
    * right row is the BACKWARD candidate at distance 0 — which always
    * wins, preserving the inclusive at-or-equal contract (the following
    * frame therefore never needs equal-ts rows). Each column picks its
    * closer candidate independently — the same per-column aging
    * semantics as the tolerance variants. `toleranceUnits` (optional)
    * nulls a candidate farther than the bound BEFORE the comparison, so
    * a one-sided out-of-tolerance match falls back to the other side.
    *
    * Scale: identical posture to [[asOfJoin]] — one hash exchange on the
    * key plus one per-key sort; both window frames ride the same
    * Exchange/Sort pair, no join operator, no row explosion.
    */
  def asOfJoinNearest(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      ordCol: String,
      payloadCols: Seq[String],
      toleranceUnits: Option[Long] = None): DataFrame = {
    toleranceUnits.foreach(t =>
      require(t >= 0, s"toleranceUnits must be non-negative (got $t)"))
    val overlap = payloadCols.toSet.intersect(left.columns.toSet)
    require(overlap.isEmpty, s"payload columns collide with left side: $overlap")
    val l = left.withColumn("__side", lit(1))
    val r = right
      .select((Seq(keyCol, tsCol, ordCol) ++ payloadCols).map(col): _*)
      .withColumn("__side", lit(0))
    val ord = Window
      .partitionBy(keyCol)
      .orderBy(col(tsCol), col("__side"), col(ordCol))
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val attached = payloadCols.foldLeft(l.unionByName(r, allowMissingColumns = true)) {
      case (df, c) =>
        val st = when(col(c).isNotNull, struct(col(tsCol).as("t"), col(c).as("v")))
        df.withColumn(s"__b_$c", last(st, ignoreNulls = true).over(wb))
          .withColumn(s"__f_$c", first(st, ignoreNulls = true).over(wf))
    }
    attached
      .filter(col("__side") === 1)
      .select(
        (left.columns.toSeq.map(col) ++ payloadCols.map { c =>
          val b = toleranceUnits.fold(col(s"__b_$c"))(t =>
            when(col(s"__b_$c").getField("t") >= col(tsCol) - t, col(s"__b_$c")))
          val f = toleranceUnits.fold(col(s"__f_$c"))(t =>
            when(col(s"__f_$c").getField("t") <= col(tsCol) + t, col(s"__f_$c")))
          when(
            b.isNotNull && f.isNotNull,
            when(
              col(tsCol) - b.getField("t") <= f.getField("t") - col(tsCol),
              b.getField("v")).otherwise(f.getField("v")))
            .otherwise(coalesce(b.getField("v"), f.getField("v")))
            .as(c)
        }): _*)
  }

  /** [[asOfJoinForward]] with bounded per-key serial work — the mirror of
    * [[asOfJoinBucketed]]: the ordered window runs per (key, time-bucket),
    * and matches that cross a bucket boundary are restored by a
    * CARRY-BACK stage computed at bucket granularity, never over raw
    * rows. Per (key, bucket, payload column) the bucket-FIRST value is
    * one `min(struct(ts, ord, c))` aggregation (map-side partials absorb
    * the hot key); right-side states enter the carry window shifted one
    * bucket BACK (`bucket - 1`), making the carry strictly-later-bucket
    * by construction, and each left bucket takes the first non-null over
    * the FOLLOWING frame. Row-identical to [[asOfJoinForward]] at every
    * bucket width (RelationalSpec sweep).
    */
  def asOfJoinForwardBucketed(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      ordCol: String,
      payloadCols: Seq[String],
      bucketUnits: Long): DataFrame = {
    require(bucketUnits > 0, s"bucketUnits must be positive (got $bucketUnits)")
    val overlap = payloadCols.toSet.intersect(left.columns.toSet)
    require(overlap.isEmpty, s"payload columns collide with left side: $overlap")
    val bkt = expr(s"$tsCol div $bucketUnits")
    val lb = left.withColumn("__bkt", bkt).withColumn("__side", lit(0))
    val rb = right
      .select((Seq(keyCol, tsCol, ordCol) ++ payloadCols).map(col): _*)
      .withColumn("__bkt", bkt)
      .withColumn("__side", lit(1))

    // per-(key, bucket) FIRST value of each payload column: the value from
    // the earliest (ts, ord) right row where that column is non-null
    val firsts = rb
      .groupBy(col(keyCol), col("__bkt"))
      .agg(
        payloadCols.map(c =>
          min(when(col(c).isNotNull, struct(col(tsCol), col(ordCol), col(c))))
            .as(s"__f_$c")).head,
        payloadCols.tail.map(c =>
          min(when(col(c).isNotNull, struct(col(tsCol), col(ordCol), col(c))))
            .as(s"__f_$c")): _*)
      .select(
        col(keyCol) +: col("__bkt") +:
          payloadCols.map(c => col(s"__f_$c").getField(c).as(s"__fin_$c")): _*)

    // carry-back per left (key, bucket): first non-null bucket-first over
    // STRICTLY later buckets (right states ride in at bucket - 1, sorting
    // AFTER left rows at the same slot so only later-bucket state is seen)
    val leftBkts = lb.select(col(keyCol), col("__bkt")).distinct()
    val carrySrc = leftBkts
      .withColumn("__sb", col("__bkt"))
      .withColumn("__cside", lit(0))
      .unionByName(
        firsts.withColumn("__sb", col("__bkt") - 1).withColumn("__cside", lit(1)),
        allowMissingColumns = true)
    val cw = Window
      .partitionBy(keyCol)
      .orderBy(col("__sb"), col("__cside"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carry = payloadCols
      .foldLeft(carrySrc) { case (df, c) =>
        df.withColumn(s"__carry_$c", first(col(s"__fin_$c"), ignoreNulls = true).over(cw))
      }
      .filter(col("__cside") === 0)
      .select(
        col(keyCol) +: col("__bkt") +: payloadCols.map(c => col(s"__carry_$c")): _*)

    // within-bucket forward as-of (the asOfJoinForward mechanics, one
    // level finer), then per-column fallback to the carry-back
    val w = Window
      .partitionBy(col(keyCol), col("__bkt"))
      .orderBy(col(tsCol), col("__side"), col(ordCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val attached = payloadCols.foldLeft(lb.unionByName(rb, allowMissingColumns = true)) {
      case (df, c) => df.withColumn(c, first(col(c), ignoreNulls = true).over(w))
    }
    attached
      .filter(col("__side") === 0)
      .join(carry, Seq(keyCol, "__bkt"), "left")
      .select(
        (left.columns.toSeq.map(col) ++
          payloadCols.map(c => coalesce(col(c), col(s"__carry_$c")).as(c))): _*)
  }

  /** [[asOfJoinNearest]] with bounded per-key serial work — completing
    * the bucketed column of the direction matrix. Composes the two
    * bucketed passes rather than re-deriving their carry machinery: each
    * payload column rides as a `(t, v)` struct (null when the value is
    * null, preserving the per-column non-null contract), the BACKWARD
    * candidate comes from [[asOfJoinBucketed]] and the FORWARD candidate
    * from [[asOfJoinForwardBucketed]], and the nearest pick (optional
    * per-side tolerance, |Δt| comparison, ties to the earlier/backward
    * row) is the same final expression as the plain nearest. Two bucketed
    * window programs instead of one global-window pass — the 100 TB
    * trade the whole bucketed family makes. Row-identical to
    * [[asOfJoinNearest]] at every bucket width (RelationalSpec sweep).
    */
  def asOfJoinNearestBucketed(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      ordCol: String,
      payloadCols: Seq[String],
      bucketUnits: Long,
      toleranceUnits: Option[Long] = None): DataFrame = {
    require(bucketUnits > 0, s"bucketUnits must be positive (got $bucketUnits)")
    toleranceUnits.foreach(t =>
      require(t >= 0, s"toleranceUnits must be non-negative (got $t)"))
    val overlap = payloadCols.toSet.intersect(left.columns.toSet)
    require(overlap.isEmpty, s"payload columns collide with left side: $overlap")
    val base = right.select((Seq(keyCol, tsCol, ordCol) ++ payloadCols).map(col): _*)
    def structSide(prefix: String): DataFrame =
      payloadCols
        .foldLeft(base) { case (df, c) =>
          df.withColumn(
            s"$prefix$c",
            when(col(c).isNotNull, struct(col(tsCol).as("t"), col(c).as("v"))))
        }
        .select((Seq(keyCol, tsCol, ordCol) ++ payloadCols.map(c => s"$prefix$c")).map(col): _*)
    val bwd = asOfJoinBucketed(
      left, structSide("__b_"), keyCol, tsCol, ordCol,
      payloadCols.map(c => s"__b_$c"), bucketUnits)
    val both = asOfJoinForwardBucketed(
      bwd, structSide("__f_"), keyCol, tsCol, ordCol,
      payloadCols.map(c => s"__f_$c"), bucketUnits)
    both.select(
      (left.columns.toSeq.map(col) ++ payloadCols.map { c =>
        val b = toleranceUnits.fold(col(s"__b_$c"))(t =>
          when(col(s"__b_$c").getField("t") >= col(tsCol) - t, col(s"__b_$c")))
        val f = toleranceUnits.fold(col(s"__f_$c"))(t =>
          when(col(s"__f_$c").getField("t") <= col(tsCol) + t, col(s"__f_$c")))
        when(
          b.isNotNull && f.isNotNull,
          when(
            col(tsCol) - b.getField("t") <= f.getField("t") - col(tsCol),
            b.getField("v")).otherwise(f.getField("v")))
          .otherwise(coalesce(b.getField("v"), f.getField("v")))
          .as(c)
      }): _*)
  }

  /** Sliding-window join-aggregate: for every left row, aggregate the
    * right rows with the same `keyCol` whose `tsCol` lies in the closed
    * window `[left.ts - spanUnits, left.ts]` — "clicks in the hour before
    * each purchase", "bytes crawled in the 5 minutes before each alert".
    * Appends `w_cnt` (matching right rows), `w_sum` (sum of `valueCol`,
    * exact via decimal(14,2) accumulation, null when no match — the
    * LEFT-JOIN-GROUP-BY convention) and `w_max` (max of `valueCol`, null
    * when no match).
    *
    * The naive phrasing is an inequality join (`r.ts BETWEEN l.ts - span
    * AND l.ts`) + group-by — Spark plans that as a BroadcastNestedLoopJoin
    * and then re-shuffles the exploded pairs, both fatal at scale. This is
    * instead the tagged-union shape of [[asOfJoin]] with a VALUE-RANGE
    * window: union right rows (value tagged) with left rows (value null),
    * then aggregate over `PARTITION BY key ORDER BY ts RANGE BETWEEN span
    * PRECEDING AND CURRENT ROW` and keep only left rows. ONE shuffle on
    * the key, no join operator, no pair explosion — each matched right row
    * is touched once per frame it participates in, never materialized as a
    * pair row. A value-range frame is position-independent, so left and
    * right rows at identical `ts` need no side tiebreak: the frame is
    * defined by the timestamp value alone (right rows at exactly
    * `left.ts` are included; `left.ts - spanUnits` is included too).
    *
    * `tsCol` must be a numeric (epoch) column present on both sides;
    * `valueCol` must exist on the right and not collide with left. NULL
    * keys/timestamps follow equi-join semantics: a right row with a null
    * key or null ts matches nothing (dropped before the union — a bare
    * window would lump all null-key rows into one partition and make
    * null "equal" null, diverging from the SQL join the operator
    * replaces); a left row with a null key or ts gets the no-match
    * aggregates (0 / null / null).
    */
  def windowAggJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      spanUnits: Long): DataFrame =
    windowAggTail(
      left, right, keyCol, tsCol, valueCol, spanUnits,
      Window
        .partitionBy(keyCol)
        .orderBy(col(tsCol).cast("long"))
        .rangeBetween(-spanUnits, 0))

  /** Shared machinery of [[windowAggJoin]] and [[windowAggJoinBucketed]]:
    * guards, the tagged union (right rows value-tagged and null-key/ts
    * filtered, left rows riding along), the three aggregates over the
    * given value-range window, and the left-only output projection.
    */
  private def windowAggTail(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      spanUnits: Long,
      w: org.apache.spark.sql.expressions.WindowSpec,
      rightExtra: DataFrame => DataFrame = identity,
      leftExtra: DataFrame => DataFrame = identity): DataFrame = {
    require(spanUnits >= 0, s"spanUnits must be non-negative (got $spanUnits)")
    require(
      !left.columns.contains(valueCol),
      s"value column '$valueCol' collides with left side")
    val aggCols = Seq("w_cnt", "w_sum", "w_max")
    val collide = aggCols.toSet.intersect(left.columns.toSet)
    require(collide.isEmpty, s"left side already has output columns: $collide")
    // the reserved internal columns must fail fast too: a left input
    // already carrying __v would have its values silently counted into
    // every frame (unionByName would keep them non-null on the left rows)
    val reserved = Seq("__v", "__side", "__bucket")
    val resL = reserved.toSet.intersect(left.columns.toSet)
    require(resL.isEmpty, s"left side carries reserved internal columns: $resL")
    val resR = reserved.toSet.intersect(right.columns.toSet)
    require(resR.isEmpty, s"right side carries reserved internal columns: $resR")
    val l = leftExtra(left.withColumn("__side", lit(1)))
    val r = rightExtra(
      right
        .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
        .select(
          col(keyCol),
          col(tsCol),
          col(valueCol).cast("decimal(14,2)").as("__v"))
        .withColumn("__side", lit(0)))
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("w_cnt", count(col("__v")).over(w))
      .withColumn("w_sum", sum(col("__v")).over(w).cast("double"))
      .withColumn("w_max", max(col("__v")).over(w).cast("double"))
      .filter(col("__side") === 1)
      .select((left.columns.toSeq ++ aggCols).map(col): _*)
  }

  /** [[windowAggJoin]] with the hot-key mitigation of the bucketed as-of
    * family: identical results, but the window partitions on `(key,
    * time-bucket)` instead of the bare key, so a pathologically hot key's
    * serial window work is bounded by its densest `2 x bucketUnits` of
    * events rather than its whole history. Right rows explode x2 (their
    * own bucket and the next — with `bucketUnits >= spanUnits` a frame
    * reaches back at most one bucket, so every probe finds each
    * qualifying right row exactly once in its own partition; a right copy
    * can never double-count, the two copies land in different
    * partitions). The explode is stateless; still ONE shuffle, now on
    * (key, bucket).
    */
  def windowAggJoinBucketed(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      spanUnits: Long,
      bucketUnits: Long): DataFrame = {
    require(
      bucketUnits >= math.max(spanUnits, 1L),
      s"bucketUnits ($bucketUnits) must be >= spanUnits ($spanUnits): a frame may reach back only one bucket")
    val bucket = expr(s"cast($tsCol as bigint) div ${bucketUnits}L")
    windowAggTail(
      left, right, keyCol, tsCol, valueCol, spanUnits,
      Window
        .partitionBy(col(keyCol), col("__bucket"))
        .orderBy(col(tsCol).cast("long"))
        .rangeBetween(-spanUnits, 0),
      rightExtra = _.withColumn("__bucket", explode(array(bucket, bucket + 1L))),
      leftExtra = _.withColumn("__bucket", bucket))
  }

  /** Interval range join: pair every probe row whose `tsCol` falls inside
    * an interval `[startCol, startCol + lengthUnits)` with that interval.
    *
    * Because every interval has the SAME length, bucketizing time by that
    * length means an interval touches at most 2 buckets: `start div L` and
    * `start div L + 1`. The interval side explodes to those two bucket
    * keys (2x a small table), the probe side computes its single bucket
    * key as a stateless projection, and the pairing is a broadcast
    * hash equi-join on bucket with the exact range as a residual filter —
    * no shuffle of the probe side, no nested-loop comparisons. An
    * (interval, probe) pair can match on only one bucket key (the probe's
    * own bucket), so no dedup step is needed.
    *
    * Variable-length intervals generalize by bucketizing at the MAXIMUM
    * length (still <= 2 buckets per interval); sparse/huge intervals would
    * switch to exploding the probe side instead — not needed here.
    *
    * Returns probe columns + interval columns, one row per containment.
    */
  /** SQL folding the first 8 hex digits of an md5 column into a
    * non-negative BIGINT in [0, 2³²) — the deterministic, engine-portable
    * uniform draw shared by [[graft.ops.Corpus.negativeSample]] and
    * [[graft.ops.Stats.poissonBootstrap]]. Each digit is long-typed
    * BEFORE the fold: the 8-digit value tops out at 2³²−1, past 31-bit
    * int arithmetic.
    */
  private[ops] def md5Fold8Sql(hexCol: String): String =
    (1 to 8)
      .map(i => s"CAST(locate(substring($hexCol, $i, 1), '0123456789abcdef') - 1 AS BIGINT)")
      .reduce((a, b) => s"($a * 16 + $b)")

  /** Exact global ranking WITHOUT a single-partition window. A global
    * `row_number() over (order by ...)` forces every row through one
    * partition — the pattern SCALE.md forbids. Instead:
    *
    *   1. `repartitionByRange` on the sort columns (one shuffle, bounds
    *      from Spark's range sampler) + a per-partition sort, materialized
    *      once via `localCheckpoint` so the two consumers below don't
    *      re-shuffle;
    *   2. per-partition row counts (a |partitions|-row aggregate) → the
    *      driver computes each partition's global rank offset;
    *   3. a narrow `mapPartitions` adds `offset + local position` — no
    *      second shuffle, no exchange at all past the range partitioning.
    *
    * `sortCols` MUST be a total order (include a unique tiebreaker):
    * ranks within a run of equal sort keys would otherwise depend on
    * physical placement. Partition bounds from the sampler vary run to
    * run, but offsets are computed from the actual counts, so the rank
    * assignment is exact and deterministic regardless of where the
    * boundaries land.
    *
    * Appends `rankCol` (1-based, long). The output keeps the range
    * partitioning (ordered by rank across partitions).
    */
  def globalRank(
      df: DataFrame,
      sortCols: Seq[Column],
      rankCol: String = "rank",
      parts: Int = 0): DataFrame =
    globalRankWithTotal(df, sortCols, rankCol, parts)._1

  /** Shared prefix-scan core under [[globalRank]] (weight ≡ 1) and
    * [[globalCumSum]] (arbitrary long weights): range-shuffle on the sort
    * columns + per-partition sort, per-partition weight totals (a
    * |partitions|-row aggregate) prefix-scanned into offsets on the
    * driver, then a narrow mapPartitions emitting `offset + running local
    * sum`. Returns the scanned frame (input columns + `outCol`) and the
    * grand total.
    *
    * The partition id is materialized as a COLUMN during the checkpoint
    * job, not read from TaskContext at use time: a downstream coalesce
    * (e.g. `.coalesce(1).write`) fuses many checkpoint partitions into
    * one task, where TaskContext.getPartitionId() would be 0 for all of
    * them and every offset would collapse to zero. Rows carry their own
    * pid, so the scan survives any later narrow re-packing.
    */
  private def prefixScan(
      df: DataFrame,
      sortCols: Seq[Column],
      weightCol: String,
      outCol: String,
      parts: Int): (DataFrame, Long) = {
    val spark = df.sparkSession
    val n = if (parts > 0) parts else spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val sums = ranged
      .groupBy(col("__pid"))
      .agg(sum(col(weightCol)).as("s"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val offsets: Map[Int, Long] = {
      val maxPid = if (sums.isEmpty) -1 else sums.keys.max
      (0 to maxPid)
        .scanLeft(0 -> 0L) { case ((_, acc), pid) =>
          pid -> (acc + sums.getOrElse(pid - 1, 0L))
        }
        .toMap
    }
    val wIdx = df.schema.fieldIndex(weightCol)
    val outSchema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+
        org.apache.spark.sql.types.StructField(outCol, org.apache.spark.sql.types.LongType, false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    // Each checkpoint partition holds exactly one __pid as one contiguous
    // run, so resetting the accumulator on pid change is correct both when
    // this runs one-task-per-partition and when partitions are fused.
    val scanned = ranged.mapPartitions { it =>
      var cur = Int.MinValue
      var acc = 0L
      it.map { row =>
        val pid = row.getInt(row.length - 1)
        if (pid != cur) { cur = pid; acc = offsets.getOrElse(pid, 0L) }
        acc += row.getLong(wIdx)
        org.apache.spark.sql.Row.fromSeq(row.toSeq.dropRight(1) :+ acc)
      }
    }(enc)
    (scanned, sums.values.sum)
  }

  private def globalRankWithTotal(
      df: DataFrame,
      sortCols: Seq[Column],
      rankCol: String,
      parts: Int): (DataFrame, Long) = {
    // rank IS the prefix sum of a unit weight
    val (ranked, total) = prefixScan(df.withColumn("__one", lit(1L)), sortCols, "__one", rankCol, parts)
    (ranked.drop("__one"), total)
  }

  /** Exact NTILE(n) on top of [[globalRank]] — SQL semantics (the first
    * `total mod n` buckets get the extra row), integer arithmetic only, so
    * the result hash-matches `NTILE(n) OVER (ORDER BY ...)` while scaling
    * as a range shuffle instead of a single-partition sort.
    */
  def globalNtile(
      df: DataFrame,
      sortCols: Seq[Column],
      n: Int,
      tileCol: String = "ntile",
      parts: Int = 0): DataFrame = {
    require(n > 0, s"ntile bucket count must be positive (got $n)")
    val (ranked, total) = globalRankWithTotal(df, sortCols, "__grank", parts)
    val q = total / n
    val rem = total % n
    val rank = col("__grank")
    val tile =
      when(rank <= rem * (q + 1), (rank - 1) / (q + 1))
        .otherwise(lit(rem) + (rank - rem * (q + 1) - 1) / math.max(q, 1L))
    ranked
      .withColumn(tileCol, (tile + 1).cast("int"))
      .drop("__grank")
  }

  /** Exact global running (prefix-inclusive) sum of a long `weightCol`
    * over a total order — the cumulative-weight primitive under
    * systematic/PPS sampling ([[Corpus.samplePps]]), token-budget cuts,
    * and quota lines. A naive `sum(w) OVER (ORDER BY ...)` forces every
    * row through ONE partition; this is the [[globalRank]] shape instead:
    * range-shuffle on the sort columns, per-partition weight totals (a
    * |partitions|-row aggregate) prefix-scanned on the driver, then a
    * narrow mapPartitions adds `partition offset + running local sum`.
    * One exchange total, no single-partition stage.
    *
    * `sortCols` MUST be a total order (unique tiebreaker), or the prefix
    * sum at equal keys depends on physical placement. `weightCol` must be
    * a non-null long column (clamp/coalesce upstream). Appends `cumCol`
    * (inclusive of the current row). Same coalesce-safety trick as
    * [[globalRank]]: rows carry their own materialized `__pid`, so later
    * narrow re-packing (e.g. `.coalesce(1).write`) cannot collapse the
    * offsets.
    */
  def globalCumSum(
      df: DataFrame,
      sortCols: Seq[Column],
      weightCol: String,
      cumCol: String = "cum",
      parts: Int = 0): DataFrame =
    prefixScan(df, sortCols, weightCol, cumCol, parts)._1

  def rangeJoinBucketed(
      probe: DataFrame,
      intervals: DataFrame,
      tsCol: String,
      startCol: String,
      lengthUnits: Long): DataFrame = {
    val exploded = intervals.withColumn(
      "__bucket",
      explode(
        array(
          expr(s"$startCol div $lengthUnits"),
          expr(s"$startCol div $lengthUnits") + 1L)))
    probe
      .withColumn("__bucket", expr(s"$tsCol div $lengthUnits"))
      .join(
        broadcast(exploded),
        Seq("__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(startCol) + lit(lengthUnits))
      .drop("__bucket")
  }

  /** [[rangeJoinBucketed]] generalized to VARIABLE-length intervals
    * `[startCol, endCol)`, with bucket widths STRATIFIED by interval
    * length class so one pathological long-lived interval cannot coarsen
    * the bucket grid for the whole join (bucketizing everything at the
    * global max length would inflate every probe's candidate set by the
    * outlier's width — correct but quadratically wasteful under skewed
    * interval lengths).
    *
    * Each interval lands in the power-of-two length class just covering
    * it (stratum `s` = ceil(log2(len)), width `2^s`), computed with
    * integer bit arithmetic (`length(bin(len-1))`) — no FP log whose
    * boundary rounding could under-size a width and silently DROP
    * matches. Within its stratum an interval still spans at most two
    * buckets, so it explodes to exactly those two (stratum, bucket)
    * keys. The probe side computes one bucket key PER OCCUPIED STRATUM
    * (the distinct strata are one bounded aggregate — at most 63 classes,
    * usually 2-5 — collected once at plan time so the widths are plan
    * literals), and the pairing is a broadcast hash equi-join on
    * (stratum, bucket) with the exact range as a residual filter.
    *
    * Scale posture: the interval side doubles and broadcasts; the probe
    * side fans out ×|occupied strata| as a STATELESS projection and
    * never shuffles. An (interval, probe) pair can match only in the
    * interval's own stratum at the probe's own bucket, so no dedup step.
    * Degenerate intervals (`end <= start`) clamp to length-1 class and
    * match nothing through the residual filter, mirroring the half-open
    * contract.
    */
  def rangeJoinIntervals(
      probe: DataFrame,
      intervals: DataFrame,
      tsCol: String,
      startCol: String,
      endCol: String,
      strata: Option[Seq[Int]] = None): DataFrame = {
    // normalize a supplied grid: duplicate entries (e.g. the natural
    // strataA ++ strataB composition) would emit two identical probe keys
    // per class and silently double every match in it
    val grid = strata.map(_.distinct.sorted).getOrElse(occupiedStrata(intervals, startCol, endCol))
    keyedByStrata(probe, tsCol, grid)
      .join(
        broadcast(explodedByStratum(intervals, startCol, endCol, strata.map(_ => grid))),
        Seq("__stratum", "__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__stratum", "__bucket")
  }

  /** The distinct power-of-two interval length classes of `intervals` —
    * the plan-time input [[rangeJoinIntervals]]/[[rangeJoinOverlap]]
    * compute per call (ONE bounded column-pruned scan, ≤63 rows).
    * Compute it once and pass it via their `strata` parameter when
    * composing several interval joins over the same (or a superset)
    * interval table: composition then triggers NO eager job — plan
    * construction stays lazy. A supplied grid need not match the
    * interval table's own classes exactly: each interval lands in the
    * smallest supplied class covering it (a coarser grid is correct,
    * just less selective), and a class above the grid's maximum fails
    * fast at execution rather than silently dropping matches.
    */
  def intervalStrata(intervals: DataFrame, startCol: String, endCol: String): Seq[Int] =
    occupiedStrata(intervals, startCol, endCol)

  /** Power-of-two length class of `[startCol, endCol)`: ceil(log2(len))
    * via bit length (`length(bin(len-1))` — no FP log whose boundary
    * rounding could under-size a width and silently DROP matches); len=1
    * (and degenerate `end <= start`) clamps to class 0, and the class is
    * capped at 62 so the width `2^s` stays a positive long.
    */
  private def lenStratum(startCol: String, endCol: String): Column = {
    val len = greatest((col(endCol) - col(startCol)).cast("long"), lit(1L))
    least(when(len <= 1L, lit(0)).otherwise(length(bin(len - 1))), lit(62)).cast("int")
  }

  /** The distinct length classes an interval table occupies — a bounded
    * aggregate (at most 63 rows, usually 2-5) over the two interval
    * columns only, collected once at plan time so the widths become plan
    * literals. Empty input yields class 0 so downstream explodes stay
    * well-formed.
    */
  private def occupiedStrata(df: DataFrame, startCol: String, endCol: String): Seq[Int] = {
    val s = df
      .select(lenStratum(startCol, endCol).as("__s"))
      .distinct()
      .collect()
      .map(_.getInt(0))
      .toSeq
      .sorted
    if (s.isEmpty) Seq(0) else s
  }

  /** Interval side of a stratified bucket equi-join: each interval tagged
    * with a length class and exploded to the <= 2 buckets of that class's
    * grid which its span can intersect. With `grid` supplied (the cached-
    * strata path), the class is the SMALLEST grid class covering the
    * interval — any class >= the interval's own is a correct (coarser)
    * grid, because an interval of length <= 2^s spans at most two
    * width-2^s buckets; a length class above the grid maximum
    * fails fast per row instead of silently dropping matches.
    */
  private def explodedByStratum(
      df: DataFrame,
      startCol: String,
      endCol: String,
      grid: Option[Seq[Int]] = None): DataFrame = {
    val own = lenStratum(startCol, endCol)
    val stratum = grid match {
      case None => own
      case Some(gs) =>
        gs.sorted.foldRight(
          raise_error(concat(
            lit(s"interval length class "),
            own.cast("string"),
            lit(s" exceeds the supplied strata grid max ${gs.max}"))).cast("int")) {
          (s, tail) => when(own <= s, lit(s)).otherwise(tail)
        }
    }
    df.withColumn("__stratum", stratum)
      .withColumn(
        "__bucket",
        explode(
          array(
            expr(s"cast($startCol as bigint) div cast(pow(2.0d, __stratum) as bigint)"),
            expr(s"cast($startCol as bigint) div cast(pow(2.0d, __stratum) as bigint)") + 1L)))
  }

  /** Point side of a stratified bucket equi-join: one (stratum, bucket)
    * key per occupied stratum, as a STATELESS projection — the table
    * fans out x|strata| but is never shuffled.
    */
  private def keyedByStrata(df: DataFrame, tsCol: String, strata: Seq[Int]): DataFrame =
    df.withColumn(
      "__sk",
      explode(array(strata.map { s =>
        val w = 1L << s
        struct(
          lit(s).as("__stratum"),
          expr(s"cast($tsCol as bigint) div ${w}L").as("__bucket"))
      }: _*)))
      .select(
        df.columns.toSeq.map(col) :+
          col("__sk.__stratum").as("__stratum") :+
          col("__sk.__bucket").as("__bucket"): _*)

  /** Interval-OVERLAP join: pair every left interval `[lStart, lEnd)`
    * with every right interval `[rStart, rEnd)` that intersects it —
    * sessions x maintenance windows, coverage spans x incident windows.
    * Empty intervals (`end <= start`) overlap nothing. `right` is the
    * small side (both halves broadcast right-derived tables); columns
    * must be disjoint across the two inputs.
    *
    * Spark plans the naive phrasing (`ls < re AND rs < le`) as a
    * BroadcastNestedLoopJoin — O(|left| x |right|) comparisons. Instead,
    * two intervals overlap iff the LATER-starting one's start point lies
    * inside the other, so the join decomposes into two point-in-interval
    * halves, each the stratified bucket equi-join of
    * [[rangeJoinIntervals]]:
    *
    *   (a) right starts at-or-inside left (`rs in [ls, le)`): left
    *       explodes x2 in its own length class (stateless, never
    *       shuffled); right's start gets one bucket key per occupied
    *       left class and is broadcast.
    *   (b) left starts STRICTLY inside right (`ls in (rs, re)`): the
    *       mirror, with right exploded x2 and broadcast, left fanning
    *       out one key per occupied right class.
    *
    * The strict bound in (b) makes the halves disjoint (`ls == rs` pairs
    * surface only in (a)), and within each half a pair can meet on only
    * one (stratum, bucket) key, so the union needs no dedup. Left's
    * occupied length classes come from one column-pruned bounded
    * aggregate over its two interval columns — the same plan-time
    * collect discipline as [[rangeJoinIntervals]], paid here on the big
    * side because the class set (not the data) is what crosses to the
    * driver.
    */
  def rangeJoinOverlap(
      left: DataFrame,
      right: DataFrame,
      lStartCol: String,
      lEndCol: String,
      rStartCol: String,
      rEndCol: String,
      lStrata: Option[Seq[Int]] = None,
      rStrata: Option[Seq[Int]] = None): DataFrame =
    overlapHalves(left, right, lStartCol, lEndCol, rStartCol, rEndCol, lStrata, rStrata, broadcast)

  /** [[rangeJoinOverlap]] for TWO LARGE interval tables — identical
    * output (same two-half start-point decomposition, same disjointness
    * proof), but the pairing is a SHUFFLED hash equi-join on the
    * (stratum, bucket) keys with no broadcast requirement on either
    * side: coverage-spans × coverage-spans, sessions × sessions. Each
    * half shuffles both inputs once on its key set (the ×2 interval
    * explode and the ×|strata| point fan-out are stateless projections,
    * as ever); per-bucket work is bounded by the stratified grid exactly
    * as in the broadcast face, so a hot bucket is a data-skew question
    * (one time window dense on BOTH sides), not a plan hazard. Pass
    * cached [[intervalStrata]] to compose lazily.
    */
  def rangeJoinOverlapBig(
      left: DataFrame,
      right: DataFrame,
      lStartCol: String,
      lEndCol: String,
      rStartCol: String,
      rEndCol: String,
      lStrata: Option[Seq[Int]] = None,
      rStrata: Option[Seq[Int]] = None): DataFrame =
    overlapHalves(left, right, lStartCol, lEndCol, rStartCol, rEndCol, lStrata, rStrata, identity)

  /** The two disjoint point-in-interval halves shared by
    * [[rangeJoinOverlap]] (which `wrap`s the right-derived side of each
    * half in `broadcast`) and [[rangeJoinOverlapBig]] (`wrap` =
    * identity: both sides shuffle).
    */
  private def overlapHalves(
      left: DataFrame,
      right: DataFrame,
      lStartCol: String,
      lEndCol: String,
      rStartCol: String,
      rEndCol: String,
      lStrata: Option[Seq[Int]],
      rStrata: Option[Seq[Int]],
      wrap: DataFrame => DataFrame): DataFrame = {
    val collide = left.columns.toSet.intersect(right.columns.toSet)
    require(collide.isEmpty, s"left/right columns collide: $collide")
    val outCols = (left.columns.toSeq ++ right.columns.toSeq).map(col)
    val nonEmpty = col(lStartCol) < col(lEndCol) && col(rStartCol) < col(rEndCol)
    // normalize supplied grids: a duplicate class would key each probe
    // row twice in that class and double its matches
    val rGrid = rStrata.map(_.distinct.sorted).getOrElse(occupiedStrata(right, rStartCol, rEndCol))
    val lGrid = lStrata.map(_.distinct.sorted).getOrElse(occupiedStrata(left, lStartCol, lEndCol))
    val startsInside = keyedByStrata(left, lStartCol, rGrid)
      .join(
        wrap(explodedByStratum(right, rStartCol, rEndCol, rStrata.map(_ => rGrid))),
        Seq("__stratum", "__bucket"))
      .filter(nonEmpty && col(lStartCol) > col(rStartCol) && col(lStartCol) < col(rEndCol))
      .select(outCols: _*)
    val startCovered = explodedByStratum(left, lStartCol, lEndCol, lStrata.map(_ => lGrid))
      .join(
        wrap(keyedByStrata(right, rStartCol, lGrid)),
        Seq("__stratum", "__bucket"))
      .filter(nonEmpty && col(rStartCol) >= col(lStartCol) && col(rStartCol) < col(lEndCol))
      .select(outCols: _*)
    startsInside.unionByName(startCovered)
  }

  /** Per-key interval coalescing: merge overlapping/abutting CLOSED
    * intervals `[start, end]` into their connected spans — maintenance
    * windows, incident windows, coverage maps, the interval complement of
    * gap-filling. Two intervals of the same key merge when the later one
    * starts at or before the running maximum end seen so far (so chains
    * A-B-C collapse even when A and C never touch directly). Degenerate
    * inputs with `end < start` clamp to the point `[start, start]`.
    *
    * Returns one row per merged span: key, start, end, `n_merged` (input
    * intervals absorbed). Deterministic regardless of tie order: rows
    * sort by (start, end), and identical rows always land in the same
    * span, so min/max/count are order-free.
    *
    * Scale shape: one exchange on the key, then two window passes over
    * the SAME sort (running max-end to flag chain starts, running sum to
    * number the chains — Spark reuses the exchange and sort for both),
    * then a hash aggregation onto (key, chain). Chain merging is
    * inherently per-key sequential — a chain may thread through every
    * interval of the key, so unlike [[asOfJoinBucketed]] there is no
    * bucketed variant that bounds per-task work without a CC-style
    * iterative loop; the contract is the sessionize one: per-key interval
    * counts are bounded (a user's sessions, a host's incidents), keys are
    * many and uniform.
    */
  def coalesceIntervals(
      intervals: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(col(startCol), col("__end"))
    intervals
      .withColumn("__end", greatest(col(endCol), col(startCol)))
      .withColumn(
        "__prev_max_end",
        max(col("__end")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn(
        "__chain",
        sum(
          when(col("__prev_max_end").isNull || col(startCol) > col("__prev_max_end"), 1L)
            .otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__chain"))
      .agg(
        min(col(startCol)).as(startCol),
        max(col("__end")).as(endCol),
        count(lit(1)).cast("long").as("n_merged"))
      .drop("__chain")
  }

  /** Per-key gaps BETWEEN coalesced spans — the interval complement of
    * [[coalesceIntervals]] within each key's active range: silence
    * windows between sessions, downtime between maintenance windows,
    * coverage holes between crawl sweeps. One row per gap, with its
    * bounds and length; keys whose intervals merge into one span (or
    * that have a single interval) produce no rows. Gap lengths are
    * strictly positive by construction: coalescing merged every
    * overlapping/abutting pair, so consecutive spans are separated.
    *
    * Scale shape: [[coalesceIntervals]]' plan plus one `lead` window
    * over the MERGED spans. The span aggregate hashes on (key, chain),
    * so the window pays one more exchange — but over the merged spans
    * (≤ input rows, typically far fewer), never the raw interval table.
    */
  def intervalGaps(
      intervals: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(col(startCol))
    coalesceIntervals(intervals, keyCol, startCol, endCol)
      .withColumn("__next_start", lead(col(startCol), 1).over(w))
      .filter(col("__next_start").isNotNull)
      .select(
        col(keyCol),
        col(endCol).as("gap_start"),
        col("__next_start").as("gap_end"),
        (col("__next_start") - col(endCol)).as("gap_len"))
  }

  /** Peak concurrency per key — the sweep-line classic ("how many
    * sessions/transfers/locks were open at once, and when"): each
    * interval `[s, e)` contributes a +1 delta at `s` and a −1 at `e`,
    * the running sum per key is the live count, and the answer is its
    * maximum with the EARLIEST timestamp attaining it. Half-open
    * semantics: at equal timestamps the −1 sorts first, so an interval
    * ending exactly when another starts never counts as overlap (the
    * [[coalesceIntervals]] abutting rule inverted). Empty/inverted
    * intervals (`e <= s`) drop. Exact integers throughout. Output:
    * `(key, n_intervals, peak, peak_ts)`.
    *
    * Scale shape: one union (2 rows per interval) + ONE per-key running
    * window + a struct-argmax aggregate. The window sorts each key's
    * full delta stream serially — [[maxConcurrencyBucketed]] bounds
    * that by bucket width for hot keys.
    */
  def maxConcurrency(
      intervals: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String): DataFrame = {
    val iv = intervals
      .filter(col(keyCol).isNotNull && col(startCol).isNotNull && col(endCol).isNotNull)
      .select(
        col(keyCol).as("__k"),
        col(startCol).cast("long").as("__s"),
        col(endCol).cast("long").as("__e"))
      .filter(col("__e") > col("__s"))
    val deltas = iv
      .select(col("__k"), col("__s").as("__t"), lit(1L).as("__d"))
      .unionAll(iv.select(col("__k"), col("__e").as("__t"), lit(-1L).as("__d")))
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__d"))
    deltas
      .withColumn(
        "__run",
        sum(col("__d")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("__k").as(keyCol))
      .agg(
        expr("count(1) div 2").cast("long").as("n_intervals"),
        max(struct(col("__run"), (-col("__t")).as("nt"))).as("__best"))
      .select(
        col(keyCol),
        col("n_intervals"),
        col("__best.__run").cast("long").as("peak"),
        (-col("__best.nt")).cast("long").as("peak_ts"))
  }

  /** [[maxConcurrency]] with hot-key serial work bounded by bucket
    * width — the [[timeWeightedAvgBucketed]] discipline applied to the
    * sweep line: deltas prefix-sum WITHIN (key, `t div bucketUs`) only,
    * and each bucket adds the running total of all earlier buckets'
    * delta sums, computed by one lead-free cumsum window over the
    * (key, bucket)-grain aggregate (never raw rows). Byte-identical
    * results (the spec pins equality); a key with a billion deltas
    * costs max(deltas in one bucket) serial, not a billion.
    */
  def maxConcurrencyBucketed(
      intervals: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs >= 1, s"bucketUs must be >= 1, got $bucketUs")
    val iv = intervals
      .filter(col(keyCol).isNotNull && col(startCol).isNotNull && col(endCol).isNotNull)
      .select(
        col(keyCol).as("__k"),
        col(startCol).cast("long").as("__s"),
        col(endCol).cast("long").as("__e"))
      .filter(col("__e") > col("__s"))
    val deltas = iv
      .select(col("__k"), col("__s").as("__t"), lit(1L).as("__d"))
      .unionAll(iv.select(col("__k"), col("__e").as("__t"), lit(-1L).as("__d")))
      .withColumn("__b", expr(s"__t div ${bucketUs}L"))
      .localCheckpoint() // consumers: in-bucket prefix + bucket offsets
    val wb = Window.partitionBy("__k", "__b").orderBy(col("__t"), col("__d"))
    val offsets = deltas
      .groupBy("__k", "__b")
      .agg(sum(col("__d")).as("__bd"))
      .withColumn(
        "__off",
        coalesce(
          sum(col("__bd")).over(
            Window.partitionBy("__k").orderBy(col("__b"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__k", "__b", "__off")
    deltas
      .withColumn(
        "__lrun",
        sum(col("__d")).over(wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(offsets, Seq("__k", "__b"))
      .withColumn("__run", col("__off") + col("__lrun"))
      .groupBy(col("__k").as(keyCol))
      .agg(
        expr("count(1) div 2").cast("long").as("n_intervals"),
        max(struct(col("__run"), (-col("__t")).as("nt"))).as("__best"))
      .select(
        col(keyCol),
        col("n_intervals"),
        col("__best.__run").cast("long").as("peak"),
        (-col("__best.nt")).cast("long").as("peak_ts"))
  }

  /** Time-weighted average per key over an irregularly-sampled STEP
    * series (gauges, prices, config values — anything that HOLDS between
    * observations): each sample weighs `value · (next_ts − ts)`, so a
    * gauge that sat at 9 for an hour and spiked to 100 for a second
    * reads ~9, where a plain mean would read the row count's opinion.
    * The last sample per key holds until `endTs` when given (the audit
    * horizon), else it is weightless (no known holding interval — the
    * honest default). Exact integers end-to-end: milli values × μs
    * durations summed in decimal(38,0), `twap_milli = Σ(v·dur) div
    * Σ(dur)`, null when no sample holds for a positive duration.
    * Output: `(key, n, ts_first, ts_last, held_us, twap_milli)`.
    *
    * Scale shape: ONE per-key lead window + one map-side-combinable
    * aggregate. The window sorts each key's full series serially — the
    * [[asOfJoin]] hot-key caveat; keys with very long series should take
    * [[timeWeightedAvgBucketed]], which bounds serial work by bucket
    * width at the price of one extra (key, bucket)-grain window.
    */
  def timeWeightedAvg(
      samples: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      endTs: Option[Long] = None): DataFrame = {
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__v"))
    samples
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(
        col(keyCol).as("__k"),
        col(tsCol).cast("long").as("__t"),
        round(col(valueCol).cast("double") * 1000, 0).cast("long").as("__v"))
      .withColumn("__next", coalesce(lead(col("__t"), 1).over(w), endTs.map(lit).getOrElse(lit(null))))
      .withColumn("__dur", greatest(col("__next") - col("__t"), lit(0L)))
      .groupBy(col("__k").as(keyCol))
      .agg(
        count(lit(1)).cast("long").as("n"),
        min(col("__t")).as("ts_first"),
        max(col("__t")).as("ts_last"),
        coalesce(sum(col("__dur")), lit(0L)).cast("long").as("held_us"),
        sum(expr("CAST(__v AS DECIMAL(38,0)) * __dur")).as("__wsum"))
      .withColumn(
        "twap_milli",
        expr("CAST(CASE WHEN held_us > 0 THEN __wsum div held_us END AS BIGINT)"))
      .drop("__wsum")
  }

  /** [[timeWeightedAvg]] with hot-key serial work bounded by bucket
    * width — the [[asOfJoinBucketed]] discipline applied to the TWAP
    * window. Samples sort within (key, `ts div bucketUs`) only; the
    * cross-bucket holding interval of each bucket's LAST sample closes
    * against the key's next non-empty bucket via one lead window over
    * the (key, bucket)-grain firsts table (aggregate grain, never raw
    * rows). Same output and exact arithmetic as the plain face —
    * byte-identical results (the spec pins equality), different
    * worst-case: a key with a billion samples costs max(samples in one
    * bucket) serial, not a billion.
    */
  def timeWeightedAvgBucketed(
      samples: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      bucketUs: Long,
      endTs: Option[Long] = None): DataFrame = {
    require(bucketUs >= 1, s"bucketUs must be >= 1, got $bucketUs")
    val base = samples
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(
        col(keyCol).as("__k"),
        col(tsCol).cast("long").as("__t"),
        round(col(valueCol).cast("double") * 1000, 0).cast("long").as("__v"))
      .withColumn("__b", expr(s"__t div ${bucketUs}L"))
      .localCheckpoint() // consumers: in-bucket window + bucket firsts
    val wb = Window.partitionBy("__k", "__b").orderBy(col("__t"), col("__v"))
    // first sample ts per non-empty (key, bucket); lead over BUCKET order
    // = the ts the bucket's last sample holds until
    val firsts = base
      .groupBy("__k", "__b")
      .agg(min(col("__t")).as("__bfirst"))
      .withColumn(
        "__carry",
        lead(col("__bfirst"), 1).over(Window.partitionBy("__k").orderBy(col("__b"))))
      .drop("__bfirst")
    base
      .withColumn("__lead", lead(col("__t"), 1).over(wb))
      .join(firsts, Seq("__k", "__b"))
      .withColumn(
        "__next",
        coalesce(col("__lead"), col("__carry"), endTs.map(lit).getOrElse(lit(null))))
      .withColumn("__dur", greatest(col("__next") - col("__t"), lit(0L)))
      .groupBy(col("__k").as(keyCol))
      .agg(
        count(lit(1)).cast("long").as("n"),
        min(col("__t")).as("ts_first"),
        max(col("__t")).as("ts_last"),
        coalesce(sum(col("__dur")), lit(0L)).cast("long").as("held_us"),
        sum(expr("CAST(__v AS DECIMAL(38,0)) * __dur")).as("__wsum"))
      .withColumn(
        "twap_milli",
        expr("CAST(CASE WHEN held_us > 0 THEN __wsum div held_us END AS BIGINT)"))
      .drop("__wsum")
  }

  /** Batch MERGE / CDC-apply: apply a change feed onto a snapshot and
    * return the post-merge snapshot (the semantics of SQL `MERGE INTO` /
    * a Delta-style upsert, expressed as one declarative plan).
    *
    * `changes` carries the target's full column set plus `seqCol` (change
    * order, e.g. a log offset) and `opCol` ('I'nsert / 'U'psert /
    * 'D'elete). Per key the LATEST change wins (max `seqCol`; ties broken
    * by the op byte then the payload, so the result is deterministic even
    * on a malformed feed with duplicate sequence numbers). A winning D
    * removes the key; a winning I/U replaces the full row (or inserts it
    * when the key is absent). Keys without changes pass through untouched.
    *
    * Scale shape: the change feed collapses to one row per key with a
    * single aggregation — `max(struct(seq, op, payload…))` partial-
    * aggregates map-side, so a hot key's million-row change history
    * reduces inside each map task before the shuffle (this is why it is
    * an agg, not a row_number window, which would move every change of
    * the hot key to one reducer). The apply is then a single full-outer
    * equi-join on the key: snapshot and reduced feed shuffle once each on
    * the same key (co-partitioned), and at typical CDC rates (feed ≪
    * snapshot) AQE turns it into a broadcast join of the reduced feed.
    * Nothing is ever re-read or recomputed: one pass over each input.
    *
    * PRECONDITION: `target` must be unique per key (the usual snapshot
    * contract). Duplicate target keys are NOT collapsed — each copy fans
    * out through the full-outer join and is overwritten with the same
    * winning change, so the duplicates survive into the output. Run
    * [[graft.ops.Checks.audit]]-style uniqueness validation upstream if
    * the snapshot's provenance is untrusted.
    */
  def mergeApply(
      target: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      seqCol: String = "seq",
      opCol: String = "op"): DataFrame = {
    val payloadCols = target.columns.toSeq.filterNot(keyCols.contains)
    val latest = changes
      .groupBy(keyCols.map(col): _*)
      .agg(
        max(struct((seqCol +: opCol +: payloadCols).map(col): _*)).as("__c"))
      .select(
        keyCols.map(col) ++
          Seq(col(s"__c.$opCol").as("__op")) ++
          payloadCols.map(c => col(s"__c.$c").as(s"__n_$c")): _*)
    target
      .join(latest, keyCols, "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(
        keyCols.map(col) ++ payloadCols.map(c =>
          when(col("__op").isNotNull, col(s"__n_$c")).otherwise(col(c)).as(c)): _*)
  }

  /** Slowly-Changing-Dimension TYPE 2 apply — [[mergeApply]]'s
    * history-keeping sibling, the warehouse pattern every dimension load
    * eventually needs: instead of overwriting an updated row, CLOSE the
    * open version (`valid_to_us` = the change timestamp) and open a new
    * one, so every fact can join the attribute values that were true AT
    * ITS OWN TIME (via [[asOfJoin]] on `valid_from_us`).
    *
    * Input: `history` rows carry `attrCols` plus `valid_from_us` /
    * `valid_to_us` (null = the key's open version; closed rows pass
    * through untouched); `changes` carry `attrCols` plus `tsCol`.
    * Per key, the open version and the key's changes form one timeline
    * ordered by (ts, change-after-existing); consecutive entries whose
    * attributes are equal (null-safe struct compare) COLLAPSE — a
    * re-crawled unchanged row must not cut a version — and each surviving
    * entry becomes a version valid `[its ts, next entry's ts)`, the last
    * one open (`is_current`). Multiple changes to one key in one batch
    * chain correctly in timestamp order (ties broken existing-first, then
    * by attribute struct — deterministic, so the result is
    * oracle-hashable); brand-new keys open their first version.
    * Zero-width versions (`valid_from_us == valid_to_us` — a change
    * landing at exactly the open version's timestamp, or two same-ts
    * changes) are DROPPED: the later entry replaces the head, which is
    * the correction semantics a same-instant rewrite means. A change
    * STRICTLY earlier than the open version's `valid_from_us` prepends a
    * version covering `[its ts, open valid_from)` — late-arriving
    * corrections surface rather than silently vanishing — with the
    * documented caveat that closed history is never edited, so a
    * prepended span can overlap an already-closed version; reconciling
    * closed history is a rebuild, not an apply. Null change timestamps
    * and null `valid_from_us` on OPEN history rows both REFUSE in-plan
    * (`assert_true`): a null would sort engine-dependently (Spark
    * nulls-first vs DuckDB nulls-last) and become a version with an
    * unusable `valid_from_us`.
    *
    * Scale shape: both windows partition by the dimension KEY over that
    * key's open version + this batch's changes — a handful of rows per
    * key, never fact-table volume; closed history is a pass-through
    * union. The dimension is typically orders smaller than the facts; the
    * facts never enter this operator.
    */
  def scd2Apply(
      history: DataFrame,
      changes: DataFrame,
      keyCol: String,
      attrCols: Seq[String],
      tsCol: String = "ts_us"): DataFrame = {
    require(attrCols.nonEmpty, "scd2Apply needs at least one attribute column")
    val attrs = struct(attrCols.map(col): _*)
    val closed = history
      .filter(col("valid_to_us").isNotNull)
      .select(
        col(keyCol) +: attrCols.map(col) :+
          col("valid_from_us").cast("long").as("valid_from_us") :+
          col("valid_to_us").cast("long").as("valid_to_us") :+
          lit(false).as("is_current"): _*)
    val open = history
      .filter(col("valid_to_us").isNull)
      // same guard as the batch side: a null valid_from_us on an open
      // row would enter the window sort (Spark nulls-first, DuckDB
      // nulls-last — engine-divergent chaining) and emit a version with
      // an unusable valid_from_us
      .filter(expr(
        "assert_true(valid_from_us IS NOT NULL, " +
          "'scd2Apply: open history row with null valid_from_us') IS NULL"))
      .select(
        col(keyCol).as("__k"),
        attrs.as("__a"),
        col("valid_from_us").cast("long").as("__ts"),
        lit(0L).as("__src"))
    val batch = changes
      .filter(expr(
        s"assert_true($tsCol IS NOT NULL, " +
          "'scd2Apply: null change timestamp — a null would become the key''s earliest version') " +
          "IS NULL"))
      .select(
        col(keyCol).as("__k"),
        attrs.as("__a"),
        col(tsCol).cast("long").as("__ts"),
        lit(1L).as("__src"))
    val w = Window.partitionBy("__k").orderBy(col("__ts"), col("__src"), col("__a"))
    val surviving = open
      .unionByName(batch)
      .withColumn("__prev", lag("__a", 1).over(w))
      // null-safe struct compare: a no-op change collapses into the
      // version it repeats; the first entry (prev null) always survives
      .filter(col("__prev").isNull || !(col("__a") <=> col("__prev")))
    val w2 = Window.partitionBy("__k").orderBy(col("__ts"), col("__src"), col("__a"))
    surviving
      .withColumn("__to", lead("__ts", 1).over(w2))
      // a same-instant successor replaced this entry's head entirely: a
      // zero-width version is dead weight for every interval consumer
      .filter(col("__to").isNull || col("__to") =!= col("__ts"))
      .select(
        col("__k").as(keyCol) +:
          attrCols.map(c => col(s"__a.$c").as(c)) :+
          col("__ts").as("valid_from_us") :+
          col("__to").as("valid_to_us") :+
          col("__to").isNull.as("is_current"): _*)
      .unionByName(closed)
  }

  /** Gaps-and-islands: merge a key's overlapping-or-near-adjacent
    * half-open intervals `[start, end)` into coverage ISLANDS — the
    * uptime/session-stitching primitive ("how long was the user actually
    * active", "which windows had continuous coverage"): intervals whose
    * start is within `gapUnits` of the running maximum end so far join
    * the current island; a larger gap opens a new one. `gapUnits = 0`
    * merges touching intervals (`[1,5)+[5,9)` → `[1,9)` — half-open
    * adjacency IS continuity); positive values tolerate small holes
    * (session stitching), in which case `island_units = end − start` may
    * exceed the summed interval lengths, also reported as
    * `sum_interval_units` so the caller can read the tolerated slack.
    * Empty and negative intervals (`end <= start`) are dropped — a
    * zero-width interval covers nothing (the half-open convention every
    * interval operator here shares). Output one row per island:
    * (key, island_start, island_end, n_intervals, island_units,
    * sum_interval_units).
    *
    * Scale shape: the classic running-max island detection — windows
    * partition by KEY over that key's INTERVAL rows (session grain,
    * orders below raw events); islands then form by one
    * map-side-combinable aggregate. No self-join, no interval
    * cross-product.
    */
  def mergeIntervals(
      intervals: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String,
      gapUnits: Long = 0L): DataFrame = {
    require(gapUnits >= 0L, s"gapUnits must be >= 0, got $gapUnits")
    val base = intervals
      .filter(col(keyCol).isNotNull && col(startCol).isNotNull && col(endCol).isNotNull)
      .select(
        col(keyCol).as("k"),
        col(startCol).cast("long").as("s"),
        col(endCol).cast("long").as("e"))
      .filter(col("e") > col("s"))
    val w = Window.partitionBy("k").orderBy(col("s"), col("e"))
    base
      .withColumn(
        "__pmax",
        max("e").over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn(
        "__new",
        when(col("__pmax").isNull || col("s") > col("__pmax") + gapUnits, 1L).otherwise(0L))
      .withColumn("__island", sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("k"), col("__island"))
      .agg(
        min("s").as("island_start"),
        max("e").as("island_end"),
        count(lit(1)).cast("long").as("n_intervals"),
        sum(col("e") - col("s")).cast("long").as("sum_interval_units"))
      .select(
        col("k").as(keyCol),
        col("island_start"),
        col("island_end"),
        col("n_intervals"),
        (col("island_end") - col("island_start")).as("island_units"),
        col("sum_interval_units"))
  }

  /** SCD2 POINT-IN-TIME join — the query every [[scd2Apply]] consumer
    * writes next: each fact row joined to the dimension VERSION that was
    * true at the fact's own time, `valid_from_us <= ts < valid_to_us`
    * (open version = no upper bound). Implemented as the bucketed
    * backward as-of join on `valid_from_us` ([[asOfJoinBucketed]]'s
    * per-(key, bucket) partitioning — no whole-key window at fact-table
    * volume) plus the validity cut: a fact landing in a COVERAGE GAP
    * (after a closed version's end, before the next start) or before the
    * key's first version gets NULL attributes, never a stale carry-over.
    * The matched version rides as ONE struct payload — per-column as-of
    * carry would let a null attribute silently inherit an OLDER
    * version's value, which is exactly the bug SCD2 exists to prevent.
    * Boundary semantics: `ts == valid_from_us` reads the NEW version;
    * `ts == valid_to_us` reads the next (half-open intervals, the
    * [[scd2Apply]] contract). Assumes non-overlapping version intervals
    * per key (what scd2Apply emits, modulo its documented
    * late-prepend caveat); among several valid candidates the latest
    * `valid_from_us` wins. Null fact timestamps match nothing (NULL
    * attributes). Dimension rows with null `valid_from_us` refuse
    * in-plan, as in [[scd2Apply]].
    *
    * Scale shape: inherits [[asOfJoinBucketed]] — per-(key, time-bucket)
    * windows over facts + versions, carry-in from a |key·bucket|-sized
    * aggregate, no fact-table-wide per-key window and no interval
    * cross-product; the dimension is orders smaller than the facts and
    * only its (key, ts)-bucketed slices meet them.
    */
  def scd2AsOf(
      facts: DataFrame,
      dim: DataFrame,
      keyCol: String,
      tsCol: String,
      attrCols: Seq[String],
      bucketUnits: Long = 86400000000L): DataFrame = {
    require(attrCols.nonEmpty, "scd2AsOf needs at least one attribute column")
    val overlap = attrCols.toSet.intersect(facts.columns.toSet)
    require(overlap.isEmpty, s"attribute columns collide with the fact side: $overlap")
    val ver = dim
      // a null-key version can never equi-match a fact; dropping it here
      // also keeps the as-of window's NULL partition version-free, so a
      // null-key FACT reads null attributes like the interval join would
      // (window partitioning would otherwise match NULL to NULL — the
      // documented window-vs-join null trap)
      .filter(col(keyCol).isNotNull)
      .filter(expr(
        "assert_true(valid_from_us IS NOT NULL, " +
          "'scd2AsOf: dimension version with null valid_from_us') IS NULL"))
      .select(
        col(keyCol),
        col("valid_from_us").cast("long").as(tsCol),
        col("valid_from_us").cast("long").as("__ord"),
        struct(
          attrCols.map(col) :+ col("valid_to_us").cast("long").as("__vt"): _*).as("__ver"))
    val joined =
      asOfJoinBucketed(facts, ver, keyCol, tsCol, "__ord", Seq("__ver"), bucketUnits)
    val live = col("__ver").isNotNull &&
      (col("__ver").getField("__vt").isNull || col(tsCol) < col("__ver").getField("__vt"))
    joined.select(
      facts.columns.toSeq.map(col) ++
        attrCols.map(c => when(live, col("__ver").getField(c)).as(c)): _*)
  }
}
