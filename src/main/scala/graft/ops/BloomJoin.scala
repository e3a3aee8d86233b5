package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim
import org.apache.spark.sql.types.BinaryType

/** Bloom-prefiltered semi join — the manual form of Spark's runtime
  * row-level filtering (`InjectRuntimeFilter`), for when BOTH join sides
  * are too large to broadcast as a hash relation but the build side's
  * key set still fits a few-MB bloom sketch.
  *
  * A shuffled semi join moves every probe-side row to the exchange even
  * though most can never match. Prefiltering the probe side with a bloom
  * filter over the build keys drops non-matching rows MAP-SIDE, before
  * the shuffle — at 100 TB that is the difference between shuffling the
  * full fact table and shuffling only the (say) 2 % that survives. Bloom
  * false positives are removed by the exact join that follows, so the
  * result is row-identical to the plain semi join and the oracle mirrors
  * it as a plain `IN` subquery.
  *
  * Build = Spark's own `BloomFilterAggregate` over `xxhash64(key)` (a
  * partial-then-final aggregation: one sketch per partition, OR-merged —
  * no row movement); probe = the codegen'd `BloomFilterMightContain` with
  * the serialized sketch as a binary literal, which deserializes once per
  * task, not per row. Both are the exact expressions Spark's adaptive
  * runtime filter plants; building them explicitly makes the pattern
  * available where AQE declines (non-equi plans, pre-shuffled inputs,
  * cross-job reuse of a saved sketch).
  */
object BloomJoin {

  /** Serialized bloom sketch over `xxhash64(keyCol)` of `keys`. Driver
    * holds only the final few-MB sketch, never the key set.
    */
  def buildFilter(keys: DataFrame, keyCol: String, expectedItems: Long = 1000000L): Array[Byte] = {
    val agg = new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
      shim.expression(xxhash64(col(keyCol))),
      expectedItems)
    keys
      .select(shim.column(agg.toAggregateExpression()).as("bf"))
      .head()
      .getAs[Array[Byte]](0)
  }

  /** Membership probe against a serialized sketch (codegen'd; sketch
    * deserialized lazily once per task).
    */
  def mightContain(filterBytes: Array[Byte], key: Column): Column =
    shim.column(
      BloomFilterMightContain(
        Literal(filterBytes, BinaryType),
        shim.expression(xxhash64(key))))

  /** Semi join of `probe` against `build`'s key set with the bloom
    * prefilter on the probe side. Row-identical to
    * `probe SEMI JOIN build ON probeKey = buildKey`.
    */
  def semiJoinBloom(
      probe: DataFrame,
      build: DataFrame,
      probeKey: String,
      buildKey: String,
      expectedItems: Long = 1000000L): DataFrame = {
    val bf = buildFilter(build, buildKey, expectedItems)
    probe
      .filter(mightContain(bf, col(probeKey)))
      .join(
        build.select(col(buildKey).as(probeKey)),
        Seq(probeKey),
        "left_semi")
  }
}
