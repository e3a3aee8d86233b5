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
    * serializes within its task like any per-key ordered computation; for
    * time-ordered data the standard mitigation is pre-bucketing by coarse
    * time range and as-of joining within (bucket, key) with a carry-in row
    * per bucket boundary.
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
}
