package graft

import graft.ops.Rollup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental rollup store: partial-state math, the merge law, lossless
  * level re-aggregation, and the batch store lifecycle.
  */
class RollupSpec extends SparkSpec {

  private def df(rows: Seq[(String, Long, java.lang.Double)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("g", "d", "v")
  }

  private val fixture: Seq[(String, Long, java.lang.Double)] = Seq(
    ("a", 1L, 1.25), ("a", 1L, 2.5), ("a", 2L, -3.0),
    ("b", 1L, 0.0015), ("b", 1L, null), ("b", 2L, 10.0))

  test("aggState: milli-exact partials, nulls dropped") {
    val st = Rollup
      .aggState(df(fixture), Seq("g", "d"), "v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(st(("a", 1L)) === ((2L, 3750L, 1250L, 2500L)))
    assert(st(("a", 2L)) === ((1L, -3000L, -3000L, -3000L)))
    assert(st(("b", 1L)) === ((1L, 2L, 2L, 2L))) // 0.0015 -> 2 milli (half-up), null dropped
    assert(st(("b", 2L)) === ((1L, 10000L, 10000L, 10000L)))
  }

  test("merge law: shard states merged == state of the union") {
    val rows = (1 to 400).map(i => (s"g${i % 3}", (i % 5).toLong, java.lang.Double.valueOf(i * 0.37)))
    val full = Rollup.aggState(df(rows), Seq("g", "d"), "v").orderBy("g", "d").collect().toSeq
    val merged = Rollup
      .mergeStates(
        (0 until 4).map(p => Rollup.aggState(df(rows.filter(_._2 % 4 == p)), Seq("g", "d"), "v")),
        Seq("g", "d"))
      .orderBy("g", "d")
      .collect()
      .toSeq
    assert(merged === full)
  }

  test("serve at a coarser level == direct aggregate at that level") {
    val rows = (1 to 300).map(i => (s"g${i % 4}", (i % 7).toLong, java.lang.Double.valueOf(i * 1.11)))
    val state = Rollup.aggState(df(rows), Seq("g", "d"), "v")
    val servedByG = Rollup.serve(state, Seq("g")).orderBy("g").collect().toSeq
    val directByG = Rollup
      .serve(Rollup.aggState(df(rows), Seq("g"), "v"), Seq("g"))
      .orderBy("g")
      .collect()
      .toSeq
    assert(servedByG === directByG)
    // grand total
    val total = Rollup.serve(state, Seq.empty).collect().head
    assert(total.getAs[Long]("n") === 300L)
  }

  test("serveLevels: tagged union of levels; non-subset level fails fast") {
    val state = Rollup.aggState(df(fixture), Seq("g", "d"), "v")
    val out = Rollup
      .serveLevels(state, Seq("g", "d"), Seq(Seq("g"), Seq.empty))
      .collect()
    assert(out.count(_.getString(0) == "g") === 2)
    assert(out.count(_.getString(0) == "total") === 1)
    val tot = out.find(_.getString(0) == "total").get
    assert(tot.getAs[Long]("n") === 5L)
    assert(tot.getAs[String]("g") === null)
    val e = intercept[IllegalArgumentException](
      Rollup.serveLevels(state, Seq("g", "d"), Seq(Seq("nope"))))
    assert(e.getMessage.contains("subset"))
  }

  test("store lifecycle: rollup == one-pass; stale reclaim; spec pinned") {
    val dir = java.nio.file.Files.createTempDirectory("rollup").toString
    val rows = (1 to 500).map(i => (s"g${i % 3}", (i % 4).toLong, java.lang.Double.valueOf(i * 0.77)))
    // stale store from a previous run
    Rollup.ingestAggBatch(df(Seq(("zzz", 9L, 1.0))), dir, 0L, Seq("g", "d"), "v")
    (0 until 3).foreach { b =>
      Rollup.ingestAggBatch(df(rows.filter(_._2 % 3 == b)), dir, b.toLong, Seq("g", "d"), "v")
    }
    val got = Rollup
      .serve(Rollup.readState(spark, dir, Seq("g", "d")), Seq("g", "d"))
      .orderBy("g", "d")
      .collect()
      .toSeq
    val want = Rollup
      .serve(Rollup.aggState(df(rows), Seq("g", "d"), "v"), Seq("g", "d"))
      .orderBy("g", "d")
      .collect()
      .toSeq
    assert(got === want)
    assert(!got.exists(_.getString(0) == "zzz")) // stale batch reclaimed
    val e = intercept[IllegalArgumentException](
      Rollup.ingestAggBatch(df(fixture), dir, 3L, Seq("g"), "v"))
    assert(e.getMessage.contains("maintains"))
  }

  test("aggIngest streaming face: store == one-pass over both batches") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rollupstream").toString
    def add(rows: Seq[(String, Double)]): Unit =
      rows.toDF("event_type", "value").write.mode("append").parquet(s"$dir/in")
    def run(): Unit =
      graft.streaming.RollupIngest
        .aggIngest(
          spark.readStream.schema("event_type STRING, value DOUBLE").parquet(s"$dir/in"),
          s"$dir/store",
          s"$dir/cp",
          Seq("event_type"),
          "value")
        .awaitTermination()
    val b1 = (1 to 100).map(i => ("a", i * 1.0))
    val b2 = (1 to 50).map(i => ("b", i * 2.0))
    add(b1); run()
    add(b2); run()
    val got = Rollup
      .serve(Rollup.readState(spark, s"$dir/store", Seq("event_type")), Seq("event_type"))
      .orderBy("event_type")
      .collect()
      .toSeq
    val want = Rollup
      .serve(
        Rollup.aggState((b1 ++ b2).toDF("event_type", "value"), Seq("event_type"), "value"),
        Seq("event_type"))
      .orderBy("event_type")
      .collect()
      .toSeq
    assert(got === want)
  }

  test("periodOverPeriod: hand-computed deltas, null (not zero) without a comparison period") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      ("a", 1L, 100L), ("a", 2L, 150L), ("a", 3L, 120L), ("b", 1L, 10L)).toDF("k", "ts", "n")
    val got = graft.ops.Rollup.periodOverPeriod(rows, "k", "ts", "n", seasonLag = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((Option(r.get(3)), Option(r.get(4)), Option(r.get(5)), Option(r.get(6)))))
      .toMap
    assert(got(("a", 1L)) === ((None, None, None, None)), "first period has no comparisons")
    // milli measures: 100000, 150000, 120000; (150-100)*1e6 div 100 = 500000
    assert(got(("a", 2L)) === ((Some(100000L), Some(500000L), None, None)))
    // (120-150)*1e6 div 150 = -200000; season: (120-100)*1e6 div 100 = 200000
    assert(got(("a", 3L)) === ((Some(150000L), Some(-200000L), Some(100000L), Some(200000L))))
    assert(got(("b", 1L)) === ((None, None, None, None)), "keys never see each other")
  }

  test("cumulativeDistinct: first-seen counting, recurring ids never re-count, zero-new rows") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      ("a", 1L, "u1"), ("a", 1L, "u2"), ("a", 1L, "u1"), // u1 twice in p1
      ("a", 2L, "u1"),                                   // recurring only: zero new
      ("a", 3L, "u3"), ("a", 3L, "u2"),                  // one genuinely new
      ("b", 5L, "u1")) // groups independent: u1 is new again in b
      .toDF("g", "p", "u")
    val got = graft.ops.Rollup.cumulativeDistinct(rows, "g", "p", "u")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(("a", 1L)) === ((2L, 2L)))
    assert(got(("a", 2L)) === ((0L, 2L)), "a recurring-only period is a zero-new ROW, not a gap")
    assert(got(("a", 3L)) === ((1L, 3L)))
    assert(got(("b", 5L)) === ((1L, 1L)), "first-seen is per group")
  }

  test("cumulative-distinct store: readback == batch operator; retry exactly-once; stale reclaim") {
    val s = spark
    import s.implicits._
    def cdf(rows: Seq[(String, Long, String)]) = rows.toDF("g", "p", "u")
    val dir = java.nio.file.Files.createTempDirectory("cumdist").toString
    // stale store from a previous run: batch 0 must reclaim it
    graft.ops.Rollup.ingestCumulativeDistinctBatch(
      cdf(Seq(("zzz", 1L, "old"))), dir, 0L, "g", "p", "u")
    val b0 = Seq(("a", 1L, "u1"), ("a", 1L, "u2"), ("b", 1L, "u1"))
    val b1 = Seq(("a", 2L, "u1"), ("a", 2L, "u3")) // u1 recurs: must not re-land
    val b2 = Seq(("a", 3L, "u2"), ("b", 3L, "u9")) // a@3 is a zero-new observed period
    graft.ops.Rollup.ingestCumulativeDistinctBatch(cdf(b0), dir, 0L, "g", "p", "u")
    graft.ops.Rollup.ingestCumulativeDistinctBatch(cdf(b1), dir, 1L, "g", "p", "u")
    graft.ops.Rollup.ingestCumulativeDistinctBatch(cdf(b2), dir, 2L, "g", "p", "u")
    def read() = graft.ops.Rollup.readCumulativeDistinct(spark, dir, "g")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val want = graft.ops.Rollup.cumulativeDistinct(cdf(b0 ++ b1 ++ b2), "g", "p", "u")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val got = read()
    assert(got === want, s"readback must equal the batch operator on the union: $got vs $want")
    assert(!got.keySet.exists(_._1 == "zzz"), "batch 0 reclaims the stale store")
    assert(got(("a", 3L)) === ((0L, 3L)), "a zero-new observed period is a row, not a gap")
    // exactly-once under checkpoint retry: re-running batch 2 (same id)
    // probes only strictly-earlier generations and overwrites itself
    graft.ops.Rollup.ingestCumulativeDistinctBatch(cdf(b2), dir, 2L, "g", "p", "u")
    assert(read() === want, "a retried batch must not double-count or drop itself")
    // spec pin: a different column triple refuses
    val e = intercept[IllegalArgumentException](
      graft.ops.Rollup.ingestCumulativeDistinctBatch(cdf(b2), dir, 3L, "g", "u", "p"))
    assert(e.getMessage.contains("maintains"))
    // an idle stream (only empty batches) reads back a correctly-TYPED
    // empty frame: empty generations land with the real column schema
    val dir2 = java.nio.file.Files.createTempDirectory("cumdistidle").toString
    val longKeyed = Seq.empty[(Long, Long, String)].toDF("g", "p", "u")
    graft.ops.Rollup.ingestCumulativeDistinctBatch(longKeyed, dir2, 0L, "g", "p", "u")
    val idle = graft.ops.Rollup.readCumulativeDistinct(spark, dir2, "g")
    assert(idle.isEmpty)
    assert(idle.schema("g").dataType === org.apache.spark.sql.types.LongType,
      s"idle readback must carry the ingested group type, got ${idle.schema}")
  }

  test("cumulativeDistinctIngest streaming face: readback == batch operator over both batches") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cumdiststream").toString
    def add(rows: Seq[(String, Long, String)]): Unit =
      rows.toDF("g", "p", "u").write.mode("append").parquet(s"$dir/in")
    def run(): Unit =
      graft.streaming.SketchIngest
        .cumulativeDistinctIngest(
          spark.readStream.schema("g STRING, p LONG, u STRING").parquet(s"$dir/in"),
          s"$dir/store",
          s"$dir/cp",
          "g", "p", "u")
        .awaitTermination()
    val b1 = Seq(("a", 1L, "u1"), ("a", 1L, "u2"))
    val b2 = Seq(("a", 2L, "u1"), ("a", 2L, "u3"), ("b", 2L, "u1"))
    add(b1); run()
    add(b2); run()
    val got = graft.ops.Rollup.readCumulativeDistinct(spark, s"$dir/store", "g")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val want = graft.ops.Rollup.cumulativeDistinct((b1 ++ b2).toDF("g", "p", "u"), "g", "p", "u")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === want)
  }

  test("cumulative distinct late-event reconcile: out-of-order batches still equal the batch operator") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cumdistlate").toString
    // ARRIVAL order deliberately violates event-time order:
    //  batch 0: u1 first lands at period 3 (its true first is 1 — late)
    //  batch 1: u1 recurs at period 1 (earlier -> correction row),
    //           u2 lands fresh at 2
    //  batch 2: u1 recurs at period 2 (later than the reconciled 1 ->
    //           lands nothing), u3 fresh at 1
    val b0 = Seq(("a", 3L, "u1"), ("b", 3L, "u9"))
    val b1 = Seq(("a", 1L, "u1"), ("a", 2L, "u2"))
    val b2 = Seq(("a", 2L, "u1"), ("a", 1L, "u3"))
    graft.ops.Rollup.ingestCumulativeDistinctBatch(b0.toDF("g", "p", "u"), dir, 0L, "g", "p", "u")
    graft.ops.Rollup.ingestCumulativeDistinctBatch(b1.toDF("g", "p", "u"), dir, 1L, "g", "p", "u")
    graft.ops.Rollup.ingestCumulativeDistinctBatch(b2.toDF("g", "p", "u"), dir, 2L, "g", "p", "u")
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val got = toMap(graft.ops.Rollup.readCumulativeDistinct(spark, dir, "g"))
    val want = toMap(
      graft.ops.Rollup.cumulativeDistinct((b0 ++ b1 ++ b2).toDF("g", "p", "u"), "g", "p", "u"))
    assert(got === want)
    // the state converged: u1 counts once, at its TRUE first period 1
    assert(got(("a", 1L))._1 === 2L, "u1's correction + u3 both count at period 1")
    assert(got(("a", 3L))._1 === 0L, "u1 no longer counts at its arrival period")
    // exactly-once under retry: re-running the late batch (same batch id)
    // overwrites its own dir and changes nothing
    graft.ops.Rollup.ingestCumulativeDistinctBatch(b1.toDF("g", "p", "u"), dir, 1L, "g", "p", "u")
    assert(toMap(graft.ops.Rollup.readCumulativeDistinct(spark, dir, "g")) === want)
  }

  test("periodOverPeriod: fractional measures are milli-scaled, not floored") {
    val s = spark
    import s.implicits._
    // averaged measure 1.25 -> 1250 milli; a long-cast would have floored to 1
    val rows = Seq(("a", 1L, 1.25), ("a", 2L, 2.5)).toDF("k", "ts", "v")
    val got = graft.ops.Rollup.periodOverPeriod(rows, "k", "ts", "v", seasonLag = 2)
      .orderBy("ts")
      .collect()
    assert(got(0).getLong(2) === 1250L)
    // (2500-1250)*1e6 div 1250 = exactly +100%
    assert(got(1).getLong(2) === 2500L && got(1).getLong(4) === 1000000L)
  }
}
