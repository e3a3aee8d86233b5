package graft

import graft.ops.BloomJoin
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {

  test("mightContain has no false negatives over the inserted key set") {
    val s = spark
    import s.implicits._
    val keys = (0L until 2000L).map(_ * 7).toDF("k")
    val bf = BloomJoin.buildFilter(keys, "k", expectedItems = 2000L)
    val probed = keys
      .select(col("k"), BloomJoin.mightContain(bf, col("k")).as("hit"))
      .collect()
    assert(probed.forall(_.getBoolean(1)), "bloom filters must never reject an inserted key")
    // and it does reject most non-members (sanity that it's not all-true)
    val misses = (1L until 2000L).map(_ * 7 + 3).toDF("k")
      .select(BloomJoin.mightContain(bf, col("k")).as("hit"))
      .filter(!col("hit"))
      .count()
    assert(misses > 1500, s"only $misses of 1999 non-members rejected")
  }

  test("semiJoinBloom is row-identical to the exact semi join on real tables") {
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    val smallParts = spark.read.parquet(s"$sf/part.parquet").filter(col("p_size") === 1)
    val viaBloom = BloomJoin
      .semiJoinBloom(lineitem, smallParts, "l_partkey", "p_partkey", expectedItems = 10000L)
      .select(
        col("l_orderkey").cast("long"),
        col("l_partkey").cast("long"),
        col("l_linenumber").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val exact = lineitem
      .join(
        smallParts.select(col("p_partkey").as("l_partkey")),
        Seq("l_partkey"),
        "left_semi")
      .select(
        col("l_orderkey").cast("long"),
        col("l_partkey").cast("long"),
        col("l_linenumber").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(exact.nonEmpty)
    assert(viaBloom == exact)
  }

  test("plan shape: might_contain filters the probe side below the join") {
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    val smallParts = spark.read.parquet(s"$sf/part.parquet").filter(col("p_size") === 1)
    val df = BloomJoin.semiJoinBloom(lineitem, smallParts, "l_partkey", "p_partkey")
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), p.take(2000))
    // the bloom probe must be a Filter on the scan side, not post-join
    val filterIdx = p.indexOf("might_contain")
    val joinIdx = p.indexOf("Join")
    assert(joinIdx >= 0 && filterIdx > joinIdx, "probe filter should sit under the join in the tree")
  }
}
