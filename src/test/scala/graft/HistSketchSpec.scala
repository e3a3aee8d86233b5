package graft

import graft.ops.Stats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-grid histogram sketch: bucket math at the clamp edges, merge
  * linearity (the law the oracle leans on), quantile bracketing vs the
  * exact order statistic, grid-mismatch fail-fast, and the batch store
  * lifecycle.
  */
class HistSketchSpec extends SparkSpec {

  private def df(rows: Seq[(String, Double)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("g", "v")
  }

  test("bucket math: interior values, clamp below lo and above hi") {
    // grid [0, 8000) milli, 8 buckets -> width 1000 milli = 1.0 units
    val sk = Stats
      .histSketch(
        df(Seq("a" -> -5.0, "a" -> 0.0, "a" -> 0.999, "a" -> 1.0, "a" -> 6.5, "a" -> 7.999, "a" -> 99.0)),
        "g",
        "v",
        loMilli = 0L,
        hiMilli = 8000L,
        bins = 8)
      .collect()
      .map(r => r.getLong(1) -> r.getLong(2))
      .toMap
    // -5.0 clamps into bucket 0; 0.0 and 0.999 are bucket 0; 1.0 starts
    // bucket 1; 6.5 is bucket 6; 7.999 is the last interior value of
    // bucket 7; 99.0 clamps into bucket 7
    assert(sk === Map(0L -> 3L, 1L -> 1L, 6L -> 1L, 7L -> 2L))
  }

  test("merge linearity: per-shard sketches summed == whole-input sketch") {
    val rows = (1 to 500).map(i => (if (i % 3 == 0) "x" else "y", (i % 97) * 1.37))
    val full = df(rows)
    val sk = Stats.histSketch(full, "g", "v")
    val halves = Seq(
      Stats.histSketch(df(rows.zipWithIndex.filter(_._2 % 2 == 0).map(_._1)), "g", "v"),
      Stats.histSketch(df(rows.zipWithIndex.filter(_._2 % 2 == 1).map(_._1)), "g", "v"))
    val a = sk.orderBy("grp", "bucket").collect().toSeq
    val b = Stats.histMerge(halves).orderBy("grp", "bucket").collect().toSeq
    assert(a === b)
  }

  test("quantiles bracket the exact order statistic within one bucket") {
    val rows = (1 to 1000).map(i => ("a", i * 0.5)) // values 0.5 .. 500.0
    val out = Stats
      .histQuantiles(Stats.histSketch(df(rows), "g", "v"), "g", Seq(250, 500, 900, 1000))
      .collect()
      .map(r => r.getAs[Long]("q_milli") -> ((r.getAs[Long]("lo_milli"), r.getAs[Long]("hi_milli"))))
      .toMap
    assert(out.size === 4)
    for ((q, (lo, hi)) <- out) {
      // exact q-quantile of 1..1000 scaled by 0.5: value ceil(q*1000/1000)*0.5
      val exactMilli = math.ceil(q * 1000 / 1000.0).toLong * 500
      assert(lo <= exactMilli && exactMilli < hi, s"q=$q: $exactMilli not in [$lo, $hi)")
      assert(hi - lo === 4000L) // one 4-unit bucket of the default grid
    }
  }

  test("fitHistGrid: tightest covering grid, nothing clamps; drifted refit fails fast on merge") {
    val rows = Seq("a" -> 2.5, "a" -> 7.0, "b" -> 3.25)
    val (lo, hi) = Stats.fitHistGrid(df(rows), "v")
    assert((lo, hi) === ((2500L, 7001L)))
    // every value interior: total count equals input, min/max land in the
    // first/last buckets rather than clamping from outside
    val sk = Stats.histSketch(df(rows), "g", "v", lo, hi, bins = 8)
    assert(sk.agg(sum("cnt")).head().getLong(0) === 3L)
    // a batch whose data drifted refits a DIFFERENT grid — merging it
    // with the original sketch must refuse, not mix bucket widths
    val drifted = df(Seq("a" -> 50.0, "b" -> -3.0))
    val (lo2, hi2) = Stats.fitHistGrid(drifted, "v")
    assert((lo2, hi2) !== ((lo, hi)))
    val err = intercept[IllegalArgumentException](
      Stats.histMerge(
        Seq(sk, Stats.histSketch(drifted, "g", "v", lo2, hi2, bins = 8)),
        lo,
        hi,
        bins = 8))
    assert(err.getMessage.contains("grid"))
    // empty input cannot fit a grid
    val none = intercept[IllegalArgumentException](
      Stats.fitHistGrid(df(Seq.empty[(String, Double)]), "v"))
    assert(none.getMessage.contains("no non-null"))
  }

  test("per-group grids: each group spans its own domain; quantiles bracket exactly") {
    // group ranges differ by 100x: a shared grid would starve "narrow"
    val rows = (1 to 100).map(i => ("narrow", i * 0.01)) ++
      (1 to 100).map(i => ("wide", i * 1.0))
    val sk = Stats.histSketchPerGroup(df(rows), "g", "v", bins = 10)
    val grids = sk.select("grp", "lo_milli", "hi_milli").distinct().collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(grids("narrow") === ((10L, 1001L)))
    assert(grids("wide") === ((1000L, 100001L)))
    val out = Stats.histQuantilesPerGroup(sk, "g", Seq(500), bins = 10).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("lo_milli"), r.getAs[Long]("hi_milli"))))
      .toMap
    // the exact median (0.50 / 50.0 milli 500 / 50000) sits inside each
    // group's OWN bucket bounds — one-bucket-width bracketing per group
    assert(out("narrow")._1 <= 500L && 500L < out("narrow")._2, out("narrow").toString)
    assert(out("wide")._1 <= 50000L && 50000L < out("wide")._2, out("wide").toString)
    // narrow's bucket width is ~99 milli, not the 9900 a shared grid forces
    assert(out("narrow")._2 - out("narrow")._1 <= 100L)
  }

  test("per-group merge: same grids sum; a drifted group refuses at serve time") {
    val rows = (1 to 60).map(i => ("a", (i % 20) * 1.0 + 1.0))
    val sk1 = Stats.histSketchPerGroup(df(rows), "g", "v", bins = 8)
    val sk2 = Stats.histSketchPerGroup(df(rows), "g", "v", bins = 8)
    // identical data -> identical derived grids -> counters add
    val merged = Stats.histMergePerGroup(Seq(sk1, sk2))
    val doubled = merged.select("bucket", "cnt").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val single = sk1.select("bucket", "cnt").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(doubled === single.view.mapValues(_ * 2).toMap)
    // a batch whose group domain drifted derives a different grid: the
    // serve-time assert_true trips when the merged result is consumed
    val drifted = Stats.histSketchPerGroup(df(rows.map { case (g, v) => (g, v * 3) }), "g", "v", bins = 8)
    val err = intercept[Exception](
      Stats.histQuantilesPerGroup(Stats.histMergePerGroup(Seq(sk1, drifted)), "g", Seq(500), bins = 8)
        .collect())
    assert(err.getMessage.toLowerCase.contains("drift"), err.getMessage)
  }

  test("grid mismatch fails fast on merge and on quantile read") {
    val a = Stats.histSketch(df(Seq("a" -> 1.0)), "g", "v", bins = 256)
    val b = Stats.histSketch(df(Seq("a" -> 1.0)), "g", "v", bins = 128)
    val e1 = intercept[IllegalArgumentException](Stats.histMerge(Seq(a, b), bins = 256))
    assert(e1.getMessage.contains("grid"))
    val e2 = intercept[IllegalArgumentException](
      Stats.histQuantiles(b, "g", Seq(500), bins = 256))
    assert(e2.getMessage.contains("grid"))
  }

  test("store lifecycle: batch rollup == one-pass; batch 0 replaces a stale store") {
    val dir = java.nio.file.Files.createTempDirectory("hist").toString
    val rows1 = (1 to 300).map(i => ("a", i * 1.1))
    val rows2 = (1 to 300).map(i => ("a", (300 + i) * 1.1))
    // stale store from a "previous run"
    Stats.ingestHistBatch(df(Seq("a" -> 999.0)), dir, 0L, "g", "v")
    // new run: batch 0 claims, batch 1 appends
    Stats.ingestHistBatch(df(rows1), dir, 0L, "g", "v")
    Stats.ingestHistBatch(df(rows2), dir, 1L, "g", "v")
    val got = Stats
      .readHistQuantiles(spark, dir, "g", Seq(500, 990))
      .orderBy("q_milli")
      .collect()
      .toSeq
    val want = Stats
      .histQuantiles(Stats.histSketch(df(rows1 ++ rows2), "g", "v"), "g", Seq(500, 990))
      .orderBy("q_milli")
      .collect()
      .toSeq
    assert(got === want)
    // the stale 999.0 batch is gone: n reflects only the new run's rows
    assert(got.head.getAs[Long]("n") === 600L)
    // grid mismatch on a later batch fails fast
    val e = intercept[IllegalArgumentException](
      Stats.ingestHistBatch(df(Seq("a" -> 1.0)), dir, 2L, "g", "v", bins = 128))
    assert(e.getMessage.contains("grid"))
  }

  test("histIngest streaming face: rollup == one-pass, retry idempotent") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("histstream").toString
    def add(rows: Seq[(String, Double)]): Unit =
      rows.toDF("event_type", "value").write.mode("append").parquet(s"$dir/in")
    def run(): Unit =
      graft.streaming.SketchIngest
        .histIngest(
          spark.readStream.schema("event_type STRING, value DOUBLE").parquet(s"$dir/in"),
          s"$dir/store",
          s"$dir/cp",
          "event_type",
          "value")
        .awaitTermination()
    val b1 = (1 to 200).map(i => ("a", i * 2.0))
    val b2 = (1 to 200).map(i => ("a", 400.0 + i * 2.0))
    add(b1); run()
    add(b2); run()
    val got = Stats
      .readHistQuantiles(spark, s"$dir/store", "event_type", Seq(500, 900))
      .orderBy("q_milli").collect().toSeq
    val want = Stats
      .histQuantiles(
        Stats.histSketch((b1 ++ b2).toDF("event_type", "value"), "event_type", "value"),
        "event_type",
        Seq(500, 900))
      .orderBy("q_milli").collect().toSeq
    assert(got === want)
    // per-batch state is bins-bounded
    val perBatch = spark.read.parquet(s"$dir/store/sketch")
      .groupBy("batch_id", "grp").count().collect()
    assert(perBatch.nonEmpty && perBatch.forall(_.getAs[Long]("count") <= 256))
  }

  test("hllIngest streaming face: MAX rollup == one-pass sketch, register-bounded state") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hllstream").toString
    def add(rows: Seq[(String, String)]): Unit =
      rows.toDF("event_type", "uid").write.mode("append").parquet(s"$dir/in")
    def run(): Unit =
      graft.streaming.SketchIngest
        .hllIngest(
          spark.readStream.schema("event_type STRING, uid STRING").parquet(s"$dir/in"),
          s"$dir/store", s"$dir/cp", "event_type", "uid")
        .awaitTermination()
    val b1 = (1 to 500).map(i => ("a", s"u${i % 300}"))
    val b2 = (1 to 500).map(i => ("a", s"u${200 + (i % 300)}")) // overlaps b1
    add(b1); run()
    add(b2); run()
    val got = Stats.readHllEstimate(spark, s"$dir/store", "event_type").collect().toSeq
    val want = Stats
      .hllEstimate(Stats.hllSketch((b1 ++ b2).toDF("event_type", "uid"), "event_type", "uid"), "event_type")
      .collect().toSeq
    assert(got === want, "batch MAX-rollup must equal the one-pass whole-stream sketch")
    // per-batch state is register-bounded
    val perBatch = spark.read.parquet(s"$dir/store/sketch")
      .groupBy("batch_id", "grp").count().collect()
    assert(perBatch.nonEmpty && perBatch.forall(_.getAs[Long]("count") <= 256))
    // a no-new-data rerun changes nothing
    run()
    assert(Stats.readHllEstimate(spark, s"$dir/store", "event_type").collect().toSeq === got)
  }

  test("hllSlidingEstimate: window merge == hllMerge of the covered days; window=1 is per-day") {
    val s = spark
    import s.implicits._
    val day0 = (1 to 400).map(i => ("t", 0L, s"u$i"))
    val day1 = (301 to 700).map(i => ("t", 1L, s"u$i")) // 300 overlap, 300 new
    val df = (day0 ++ day1).toDF("g", "d", "u")
    def estOf(sk: org.apache.spark.sql.DataFrame): Double =
      graft.ops.Stats.hllEstimate(sk, "g").head().getAs[Double]("est")
    val sliding = graft.ops.Stats.hllSlidingEstimate(df, "g", "d", "u", window = 2)
      .collect().map(r => r.getLong(1) -> r.getAs[Double]("est")).toMap
    // day 1's 2-day window == the merged two-day sketch, EXACTLY (max law)
    val merged = estOf(graft.ops.Stats.hllMerge(Seq(
      graft.ops.Stats.hllSketch(df.filter(col("d") === 0L), "g", "u"),
      graft.ops.Stats.hllSketch(df.filter(col("d") === 1L), "g", "u"))))
    assert(sliding(1L) === merged)
    // day 0's window covers only itself
    assert(sliding(0L) === estOf(graft.ops.Stats.hllSketch(df.filter(col("d") === 0L), "g", "u")))
    // window=1: every day independent
    val w1 = graft.ops.Stats.hllSlidingEstimate(df, "g", "d", "u", window = 1)
      .collect().map(r => r.getLong(1) -> r.getAs[Double]("est")).toMap
    assert(w1(1L) === estOf(graft.ops.Stats.hllSketch(df.filter(col("d") === 1L), "g", "u")))
    // a calendar GAP ages out: u-only day 0, then day 9 — day 9's 2-window
    // must not see day 0's registers (range frame, not row frame)
    val gap = (day0 ++ (1 to 5).map(i => ("t", 9L, s"z$i"))).toDF("g", "d", "u")
    val g9 = graft.ops.Stats.hllSlidingEstimate(gap, "g", "d", "u", window = 2)
      .collect().map(r => r.getLong(1) -> r.getAs[Double]("est")).toMap
    assert(g9(9L) === estOf(graft.ops.Stats.hllSketch(gap.filter(col("d") === 9L), "g", "u")),
      s"day 9 must only see itself, got ${g9(9L)}")
  }

  test("rankNormalize: mid-rank percentiles, ties share one ppm, bounds") {
    val s = spark
    import s.implicits._
    // g: values 1, 2, 2, 4 -> mid-ranks 1, 2.5, 2.5, 4 of n=4
    val rows = Seq(("g", 1.0), ("g", 2.0), ("g", 2.0), ("g", 4.0)).toDF("k", "v")
    val got = Stats.rankNormalize(rows, "k", "v")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq.sorted
    // ppm = 1e6*(2*cum_lt + cnt + 1) div (2n):
    // v=1000: (0+1+1)*1e6 div 8 = 250000; v=2000: (2+2+1)*1e6 div 8 = 625000
    // v=4000: (6+1+1)*1e6 div 8 = 1000000
    assert(got === Seq(
      (1000L, 250000L), (2000L, 625000L), (2000L, 625000L), (4000L, 1000000L)))
  }
}
