package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-mitigation for hot-key shuffles.
  *
  * AQE's skew-join splitting covers sort-merge joins whose skew is visible
  * at runtime, but two cases still need manual salting at 100 TB: (a)
  * shuffle HASH joins and aggregations, which AQE does not split, and (b)
  * skew so extreme that one key exceeds a single executor's memory even
  * after AQE's partition-size splitting. Salting trades `saltFactor`-way
  * duplication of the (small, but not broadcastable) build side for an
  * even re-spread of the hot probe keys.
  */
object Skew {

  /** Salted inner equi-join: the probe side derives a deterministic salt in
    * `[0, saltFactor)` from a high-cardinality column (a row id — NOT the
    * join key, whose whole problem is low entropy), and the build side is
    * replicated once per salt value, so the join key becomes (key, salt)
    * and a hot key's rows spread across `saltFactor` partitions.
    *
    * Equivalent to `probe.join(build, key)` row-for-row — salting is pure
    * execution strategy. Build-side growth is `saltFactor` x |build|: pick
    * saltFactor ~ (hot-key rows / target partition rows), keeping the
    * replicated build side well under shuffle-partition size.
    */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      disambig: String,
      saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val salted = probe.withColumn("__salt", pmod(hash(col(disambig)), lit(saltFactor)))
    val replicated = build.withColumn(
      "__salt",
      explode(array((0 until saltFactor).map(lit(_)): _*)))
    salted
      .join(replicated.hint("shuffle_hash"), Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Drop every row whose key group exceeds `maxCount` — the hot-key cap
    * used by all pair-generating inverted indexes (SimHash/aHash bands,
    * n-gram and winnowing postings).
    *
    * Deliberately an aggregate + anti-join, NOT `count() OVER (PARTITION
    * BY key)`: a window count must co-locate EVERY posting of a hot key on
    * one reducer before the filter can drop it — the degenerate key the
    * cap exists for (empty-doc simhash 0, boilerplate shingles) is exactly
    * the one that would overwhelm that reducer, and AQE's skew handling
    * does not split window exchanges. The agg path absorbs the hot key in
    * map-side partial counts.
    *
    * The join is an ANTI against the HOT keys rather than a semi against
    * the cold ones: hot keys number at most |rows|/maxCount and in
    * practice a handful (that rarity is why capping is acceptable at
    * all), so AQE's runtime sizing turns the anti-join into a broadcast
    * and the big posting table never shuffles for the cap — a semi-join
    * against the (≈all-keys-sized) cold set would shuffle both sides.
    * Costs one extra scan of `df` versus the window (callers materialize
    * the exploded input once when that scan is expensive).
    */
  def capHotKeys(df: DataFrame, keys: Seq[String], maxCount: Long): DataFrame = {
    val hot = df
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__kn"))
      .filter(col("__kn") > maxCount)
      .select(keys.map(k => col(k).as(s"__hot_$k")): _*)
    // null-SAFE equality: groupBy treats NULL as a real group, and a
    // null-key flood is a classic hot key — a plain equi anti-join would
    // never match it and let every null-key posting through uncapped
    val cond = keys.map(k => col(k) <=> col(s"__hot_$k")).reduce(_ && _)
    df.join(hot, cond, "left_anti")
  }
}
