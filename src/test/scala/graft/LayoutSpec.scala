package graft

import graft.io.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("interleaveBits places column i's bit j at position j*nCols+i") {
    val s = spark
    import s.implicits._
    val row = Seq((3L, 5L)).toDF("a", "b")
    // a=0b011 -> bits 0,1 at even positions 0,2 ; b=0b101 -> bits 0,2 at odd positions 1,5
    val z = row
      .select(Layout.interleaveBits(Seq(col("a"), col("b")), 4).as("z"))
      .head()
      .getLong(0)
    assert(z == ((1L << 0) | (1L << 2) | (1L << 1) | (1L << 5)), s"got $z")
  }

  test("zBucketStats: hand cells on a 1-bit grid; split-count validation") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1.0, 10.0), (2.0, 10.0), // q-bucket 0, p-bucket 0 -> z 0
      (9.0, 10.0), // q 1, p 0 -> z 1
      (1.0, 99.0), // q 0, p 1 -> z 2
      (9.0, 99.0) // q 1, p 1 -> z 3
    ).toDF("q", "p")
    val got = Layout
      .zBucketStats(df, Seq("q" -> Array(5.0), "p" -> Array(50.0)), bitsPerCol = 1)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got.keySet === Set(0L, 1L, 2L, 3L))
    assert(got(0L) === ((2L, 1.0, 2.0))) // cell 0: two rows, q range [1, 2]
    assert(got(1L) === ((1L, 9.0, 9.0)))
    val e = intercept[IllegalArgumentException](
      Layout.zBucketStats(df, Seq("q" -> Array(5.0)), bitsPerCol = 2))
    assert(e.getMessage.contains("split points"))
  }

  test("bucketedWrite: same-bucket tables join with NO exchange on either side") {
    val s = spark
    import s.implicits._
    val left = (1L to 2000L).map(i => (i % 200, i)).toDF("k", "l_val")
    val right = (1L to 1000L).map(i => (i % 200, i * 10)).toDF("k", "r_val")
    Layout.bucketedWrite(left, "bk_left", "k", nBuckets = 8)
    Layout.bucketedWrite(right, "bk_right", "k", nBuckets = 8)
    try {
      // force a non-broadcast join so co-location is what avoids the
      // shuffle — on a conf-isolated clone so the broadcast-off window
      // never leaks into concurrently-running suites' plans (the catalog
      // is shared state, so the clone sees the bucketed tables)
      SparkSpec.withIsolatedConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") { s2 =>
        val joined = s2.table("bk_left").join(s2.table("bk_right"), "k")
        joined.count()
        val p = joined.queryExecution.executedPlan.toString
        assert(p.contains("SortMergeJoin"), p.take(1200))
        assert(
          !p.contains("Exchange hashpartitioning"),
          "bucketed join must be exchange-free:\n" + p.take(1500))
        // and an aggregation on the bucket key is exchange-free too
        val agg = s2.table("bk_left").groupBy("k").agg(sum("l_val"))
        agg.count()
        val pa = agg.queryExecution.executedPlan.toString
        assert(
          !pa.contains("Exchange hashpartitioning"),
          "bucketed aggregation must be exchange-free:\n" + pa.take(1500))
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS bk_left")
      spark.sql("DROP TABLE IF EXISTS bk_right")
    }
  }

  test("zOrderWrite: per-file min/max spans shrink on BOTH clustered columns") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey").cast("double").as("ck"), col("o_totalprice").as("tp"))
    val out = java.nio.file.Files.createTempDirectory("zorder").toString
    Layout.zOrderWrite(orders, Seq("ck", "tp"), out, targetFiles = 16)
    val g = orders.agg(
      (max("ck") - min("ck")).as("ckspan"),
      (max("tp") - min("tp")).as("tpspan")).head()
    val (gCk, gTp) = (g.getDouble(0), g.getDouble(1))
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length > 4, s"expected several files, got ${files.length}")
    val spans = files.map { f =>
      val d = spark.read.parquet(f.getAbsolutePath)
      val r = d.agg(
        (max("ck") - min("ck")).as("ckspan"),
        (max("tp") - min("tp")).as("tpspan")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val avgCk = spans.map(_._1).sum / spans.length
    val avgTp = spans.map(_._2).sum / spans.length
    // 16 z-range files over 4-bit buckets give each dimension ~2 effective
    // bits of locality (ideal span/4; boundary overlap erodes some) — a
    // plain unclustered write would cover ~100% of both on every file
    assert(avgCk < 0.6 * gCk, s"custkey span $avgCk vs global $gCk")
    assert(avgTp < 0.6 * gTp, s"totalprice span $avgTp vs global $gTp")
    // round-trip row fidelity
    assert(spark.read.parquet(out).count() == orders.count())
  }
}
