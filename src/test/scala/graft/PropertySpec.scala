package graft

import graft.etl.{Incremental, NessusSynth}
import graft.queries.ScanQueries
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5.2#3). Spark-facing properties run
  * few, large cases (one Spark job per case is the cost model — many tiny
  * cases would be all overhead). Raw ScalaCheck generators with fixed
  * seeds (the scalatest bridge isn't in the offline cache); deterministic
  * by construction.
  */
class PropertySpec extends SparkSpec {

  private def cases[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  lazy val w = NessusSynth(spark, sf)

  test("folder_results(f, None, o) == union of scan_results(s, o) over scans in f") {
    for (offset <- Seq(0, 1)) {
      val viaFolder = ScanQueries.folderResults(w, 1, None, offset)
      val scanIds = w.scan
        .filter(col("folder_id") === 1)
        .select("scan_id").collect().map(_.getLong(0))
      val viaUnion = scanIds
        .map(sid => ScanQueries.scanResults(w, sid, offset))
        .reduce(_ unionAll _)
      assert(viaFolder.exceptAll(viaUnion).count() == 0)
      assert(viaUnion.exceptAll(viaFolder).count() == 0)
    }
  }

  test("dedupLatest is idempotent and never increases multiplicity") {
    val s = spark
    import s.implicits._
    val gen = Gen.listOfN(
      200,
      for {
        k <- Gen.chooseNum(1L, 20L)
        ts <- Gen.chooseNum(0L, 50L)
        v <- Gen.chooseNum(0L, 1000L)
      } yield (k, ts, v))
    cases(gen, 3).foreach { rows =>
      val df = rows.toDF("k", "ts", "v")
      val once = Incremental.dedupLatest(df, Seq("k"), Seq(col("ts").desc, col("v").desc))
      val twice = Incremental.dedupLatest(once, Seq("k"), Seq(col("ts").desc, col("v").desc))
      assert(once.count() == rows.map(_._1).distinct.size)
      assert(twice.exceptAll(once).count() == 0 && once.exceptAll(twice).count() == 0)
    }
  }

  test("watermark is monotone: adding keys never moves it backwards") {
    val s = spark
    import s.implicits._
    val keyGen = for {
      dep <- Gen.oneOf("depA", "depB")
      day <- Gen.chooseNum(1, 28)
      ok <- Gen.frequency(4 -> true, 1 -> false)
    } yield
      if (ok) f"$dep/202401$day%02d/scan.json"
      else s"$dep/junk$day/scan.json"
    cases(Gen.zip(Gen.listOfN(30, keyGen), Gen.listOfN(10, keyGen)), 3).foreach {
      case (base, extra) =>
        def wm(keys: Seq[String]) =
          Incremental
            .watermarks(keys.toDF("key"))
            .collect()
            .map(r => r.getString(0) -> r.getDate(1)).toMap
        val before = wm(base)
        val after = wm(base ++ extra)
        before.foreach { case (dep, d) =>
          assert(!after(dep).before(d), s"watermark for $dep went backwards")
        }
    }
  }

  test("asOfJoinBucketed == asOfJoin on random keyed events for every bucket width") {
    val s = spark
    import s.implicits._
    import graft.ops.Relational
    // random left rows, right rows with OPTIONAL (nullable) payloads,
    // clustered ts values so equal-ts ties and empty buckets both occur
    val gen = for {
      lefts <- Gen.listOfN(
        60,
        for {
          k <- Gen.chooseNum(1L, 5L)
          ts <- Gen.chooseNum(0L, 120L)
        } yield (k, ts))
      rights <- Gen.listOfN(
        40,
        for {
          k <- Gen.chooseNum(1L, 5L)
          ts <- Gen.chooseNum(0L, 120L)
          pv <- Gen.option(Gen.chooseNum(1L, 99L))
        } yield (k, ts, pv))
    } yield (lefts, rights)
    cases(gen, 2).foreach { case (lefts, rights) =>
      val l = lefts.zipWithIndex
        .map { case ((k, ts), i) => (1000L + i, k, ts) }
        .toDF("event_id", "user_id", "ts_us")
      val r = rights.zipWithIndex
        .map { case ((k, ts, pv), i) => (i.toLong, k, ts, pv) }
        .toDF("event_id", "user_id", "ts_us", "q_val")
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("event_id", "q_val")
        .collect()
        .map(row => (row.getLong(0), Option(row.get(1))))
        .toSet
      val plain = rows(Relational.asOfJoin(l, r, "user_id", "ts_us", "event_id", Seq("q_val")))
      for (w <- Seq(1L, 13L, 50L, 1000L)) {
        val bucketed = rows(
          Relational.asOfJoinBucketed(l, r, "user_id", "ts_us", "event_id", Seq("q_val"), w))
        assert(bucketed == plain, s"bucketUnits=$w diverged from asOfJoin")
      }
    }
  }

  test("asOfJoinForwardBucketed == asOfJoinForward on random keyed events for every bucket width") {
    val s = spark
    import s.implicits._
    import graft.ops.Relational
    val gen = for {
      lefts <- Gen.listOfN(
        60,
        for {
          k <- Gen.chooseNum(1L, 5L)
          ts <- Gen.chooseNum(0L, 120L)
        } yield (k, ts))
      rights <- Gen.listOfN(
        40,
        for {
          k <- Gen.chooseNum(1L, 5L)
          ts <- Gen.chooseNum(0L, 120L)
          pv <- Gen.option(Gen.chooseNum(1L, 99L))
        } yield (k, ts, pv))
    } yield (lefts, rights)
    cases(gen, 2).foreach { case (lefts, rights) =>
      val l = lefts.zipWithIndex
        .map { case ((k, ts), i) => (1000L + i, k, ts) }
        .toDF("event_id", "user_id", "ts_us")
      val r = rights.zipWithIndex
        .map { case ((k, ts, pv), i) => (i.toLong, k, ts, pv) }
        .toDF("event_id", "user_id", "ts_us", "q_val")
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("event_id", "q_val")
        .collect()
        .map(row => (row.getLong(0), Option(row.get(1))))
        .toSet
      val plain = rows(
        Relational.asOfJoinForward(l, r, "user_id", "ts_us", "event_id", Seq("q_val")))
      for (w <- Seq(1L, 13L, 50L, 1000L)) {
        val bucketed = rows(
          Relational.asOfJoinForwardBucketed(
            l, r, "user_id", "ts_us", "event_id", Seq("q_val"), w))
        assert(bucketed == plain, s"bucketUnits=$w diverged from asOfJoinForward")
      }
    }
  }

  test("severity pivot: bucket sums always total the non-null input counts (fixed mode)") {
    val s = spark
    import s.implicits._
    val gen = Gen.listOfN(
      300,
      for {
        key <- Gen.chooseNum(1L, 10L)
        sev <- Gen.chooseNum(0L, 4L)
        cnt <- Gen.chooseNum(0L, 9L)
      } yield (key, sev, cnt))
    cases(gen, 3).foreach { rows =>
      val df = rows.toDF("k", "severity", "cnt")
      val piv = NessusSynth.severityPivot(df, Seq("k"), col("cnt"))
      val total = piv
        .select(
          (col("critical_count") + col("high_count") + col("medium_count") +
            col("low_count") + col("info_count")).as("t"))
        .agg(sum("t")).collect().head.getLong(0)
      assert(total == rows.map(_._3).sum)
    }
  }

  test("sampleQuota takes exactly min(n, |group|) per group on random group shapes") {
    val s = spark
    import s.implicits._
    val gen = Gen.listOfN(
      300,
      for {
        id <- Gen.chooseNum(0L, 100000L)
        g <- Gen.oneOf("a", "b", "c", "d")
      } yield (id, g))
    cases(gen, 3).foreach { rows =>
      val docs = rows.distinctBy(_._1).toDF("doc_id", "source")
      val sizes = rows.distinctBy(_._1).groupBy(_._2).view.mapValues(_.size).toMap
      val taken = graft.ops.Corpus.sampleQuota(docs, n = 20).collect()
        .groupBy(_.getAs[String]("source")).view.mapValues(_.length).toMap
      sizes.foreach { case (g, sz) =>
        assert(taken.getOrElse(g, 0) == math.min(20, sz), s"group $g size $sz")
      }
      // determinism: same input, same selection
      val again = graft.ops.Corpus.sampleQuota(docs, n = 20).collect()
        .map(_.getAs[Long]("doc_id")).toSet
      val first = graft.ops.Corpus.sampleQuota(docs, n = 20).collect()
        .map(_.getAs[Long]("doc_id")).toSet
      assert(again == first)
    }
  }

  test("takeTokenBudget: covers the budget, straddler is load-bearing, subsets grow with budget") {
    val s = spark
    import s.implicits._
    val gen = Gen.listOfN(
      250,
      for {
        id <- Gen.chooseNum(0L, 100000L)
        w <- Gen.chooseNum(0L, 400L)
      } yield (id, w))
    cases(gen, 3).foreach { rows =>
      val docs = rows.distinctBy(_._1).toDF("doc_id", "n_chars")
      val total = rows.distinctBy(_._1).map(_._2).sum
      for (budget <- Seq(1L, total / 7 + 1, total / 2 + 1)) {
        val kept = graft.ops.Corpus.takeTokenBudget(docs, budget).collect()
          .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("weight"), r.getAs[Long]("cum")))
        val keptW = kept.map(_._2).sum
        // budgets bound from below: the kept set weighs at least the
        // budget (or is the whole corpus when the budget exceeds it)
        assert(keptW >= math.min(budget, total), s"budget $budget underdelivered: $keptW")
        // the straddler is load-bearing: dropping the LAST doc in cut
        // order falls under budget — nothing beyond the straddler is kept
        val lastW = kept.maxBy(_._3)._2
        assert(keptW - lastW < budget, s"budget $budget kept a doc beyond the straddler")
        // monotone in budget: a smaller budget's subset is contained in
        // a larger one's (same hash order, longer walk)
        val larger = graft.ops.Corpus.takeTokenBudget(docs, budget + total / 5 + 1).collect()
          .map(_.getAs[Long]("doc_id")).toSet
        assert(kept.map(_._1).toSet.subsetOf(larger), s"budget $budget subset not monotone")
      }
    }
  }

  test("clusterSafeSplit: corpus growth never moves an existing singleton's split") {
    val s = spark
    import s.implicits._
    val base = (1L to 80L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((5L, 40L), (40L, 71L)).toDF("doc_a", "doc_b")
    val before = graft.ops.Corpus.clusterSafeSplit(base, pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    // grow the corpus by 40 new docs and one new pair among the NEW docs
    val grown = base.unionAll((81L to 120L).map(i => (i, s"doc $i")).toDF("doc_id", "text"))
    val grownPairs = pairs.unionAll(Seq((90L, 110L)).toDF("doc_a", "doc_b"))
    val after = graft.ops.Corpus.clusterSafeSplit(grown, grownPairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    (1L to 80L).foreach { i =>
      assert(after(i) == before(i), s"doc $i moved ${before(i)} -> ${after(i)} on corpus growth")
    }
  }

  test("balancedShards: ranks are a permutation, every doc lands on exactly one shard") {
    val s = spark
    import s.implicits._
    val gen = Gen.listOfN(
      250,
      for {
        id <- Gen.chooseNum(0L, 100000L)
        n <- Gen.chooseNum(0, 80)
      } yield (id, n))
    cases(gen, 3).foreach { rows =>
      val docs = rows.distinctBy(_._1)
        .map { case (id, n) => (id, (1 to n).map(j => s"w$j").mkString(" ")) }
        .toDF("doc_id", "text")
      val nDocs = rows.distinctBy(_._1).size
      val out = graft.ops.Corpus.balancedShards(docs, nShards = 5).collect()
      assert(out.length == nDocs)
      assert(out.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to nDocs).toSeq)
      assert(out.map(_.getAs[Long]("doc_id")).distinct.length == nDocs)
      assert(out.forall(r => r.getAs[Long]("shard") >= 0 && r.getAs[Long]("shard") < 5))
    }
  }

  test("containmentDrops ⊆ chunkOverlapPairs: every drop is witnessed by a pair with its container") {
    val s = spark
    import s.implicits._
    // deterministic corpus with planted clones and prefix republishes
    val docs = (1L to 30L).map { i =>
      val n = 40 + (i * 13 % 50)
      (i, (1L to n).map(j => s"t${i % 7}x$j").mkString(" "))
    }.toDF("doc_id", "text")
    val pairs = graft.ops.TextAnalysis.chunkOverlapPairs(docs, minShared = 1).collect()
      .map(r => Set(r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val drops = graft.ops.TextAnalysis.containmentDrops(docs, minContainMilli = 1).collect()
    assert(drops.nonEmpty, "the i%7 token families must produce shared chunks")
    drops.foreach { r =>
      val pair = Set(r.getAs[Long]("doc_id"), r.getAs[Long]("container"))
      assert(pairs.contains(pair), s"drop $pair has no witnessing overlap pair")
    }
  }

  test("bpeTokenCount is monotone non-increasing in the merge-list prefix") {
    val s2 = SparkSpec.spark
    import s2.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).limit(120)
    val merges = graft.ops.TextAnalysis.bpeMerges(docs, nMerges = 4).collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2)))
      .toSeq
    def counts(k: Int): Map[Long, Long] = graft.ops.TextAnalysis
      .bpeTokenCount(docs, merges.take(k))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byK = (0 to merges.length).map(counts)
    // k=0: every word counts its codepoints + </w>; each further merge can
    // only collapse symbols, never add them — per doc, monotonically
    byK.sliding(2).foreach { case Seq(a, b) =>
      assert(a.keySet == b.keySet, "the doc set must not change with merges")
      a.keySet.foreach { id =>
        assert(b(id) <= a(id), s"doc $id grew from ${a(id)} to ${b(id)} tokens after a merge")
      }
    }
    assert(byK.last.values.sum < byK.head.values.sum, "4 merges must save at least one token")
  }

  test("rangeJoinOverlap is symmetric: swapping sides yields the same pair set (both faces)") {
    val s2 = SparkSpec.spark
    import s2.implicits._
    val rnd = new scala.util.Random(41)
    def mk(n: Int, idBase: Long) = (0 until n).map { i =>
      val st = rnd.nextInt(400).toLong
      val len = if (i % 19 == 0) 0L else (rnd.nextInt(30) + 1).toLong
      (idBase + i, st, st + len)
    }
    val a = mk(90, 1000L).toDF("a_id", "as_", "ae")
    val b = mk(60, 2000L).toDF("b_id", "bs", "be")
    def pairs(df: org.apache.spark.sql.DataFrame, l: String, r: String) =
      df.select(l, r).collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val ab = pairs(graft.ops.Relational.rangeJoinOverlap(a, b, "as_", "ae", "bs", "be"), "a_id", "b_id")
    val ba = pairs(graft.ops.Relational.rangeJoinOverlap(b, a, "bs", "be", "as_", "ae"), "a_id", "b_id")
    assert(ab == ba, "overlap must be symmetric in its inputs")
    val big = pairs(graft.ops.Relational.rangeJoinOverlapBig(a, b, "as_", "ae", "bs", "be"), "a_id", "b_id")
    assert(big == ab, "the shuffle face must agree with the broadcast face")
  }
}
