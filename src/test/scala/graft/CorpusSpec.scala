package graft

import graft.ops.{Corpus, Dedup}
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {

  test("clusterPairs: transitive groups collapse to min-id components") {
    val s = spark
    import s.implicits._
    // components: {1,2,3} (chain), {10,11}, and 5 appears in no pair
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = Dedup.clusterPairs(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("clusterPairs converges past the propagation radius of one iteration") {
    val s = spark
    import s.implicits._
    // a path graph 1-2-3-4-5-6: min label must travel 5 hops
    val pairs = (1L to 5L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.clusterPairs(pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == (1L to 6L).toSet)
  }

  test("clusterPairs star contraction: a long chain converges in O(log n) rounds, not O(n)") {
    val s = spark
    import s.implicits._
    // a 128-node path: flooding needs ~127 rounds (one per hop); the
    // large-star/small-star pair must land within the log bound. The
    // small-graph fast path is DISABLED here so the distributed rounds
    // are what this test exercises.
    val n = 128L
    SparkSpec.withIsolatedConf("spark.graft.cc.localEdgeCutoff" -> "0") { s2 =>
      import s2.implicits._
      val pairs = (1L until n).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      val (stars, rounds) = Dedup.ccStarContraction(
        pairs.select(col("doc_a").as("u"), col("doc_b").as("v")))
      assert(rounds >= 1, "cutoff 0 must force the distributed contraction")
      assert(rounds <= 14, s"chain-of-$n took $rounds rounds (log2(n)=7)")
      val lbl = stars.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert((2L to n).forall(lbl(_) == 1L), "every non-root points at the component min")
      assert(!lbl.contains(1L), "the root carries no child edge")
    }
  }

  test("ccStarContraction small-graph fast path ≡ distributed contraction") {
    val s = spark
    import s.implicits._
    // random multigraphs with self-loops and duplicates: the single-task
    // union-find (default cutoff) and the distributed star contraction
    // (cutoff 0) must return the same converged star edges — canonical
    // component-minimum labels are algorithm-independent, and this pins it
    for (seed <- Seq(3, 11, 42)) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(400)((rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
      val local = Dedup.ccStarContraction(edges.toDF("u", "v"))._1.collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val dist = SparkSpec.withIsolatedConf("spark.graft.cc.localEdgeCutoff" -> "0") { s2 =>
        import s2.implicits._
        Dedup.ccStarContraction(edges.toDF("u", "v"))._1.collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      assert(local == dist, s"seed $seed: local and distributed stars differ")
    }
  }

  test("ccLabelsOfEdges ≡ clusterPairs on pre-normalized random edge sets, both kernels") {
    val s = spark
    import s.implicits._
    // the graph-store mutators' pre-normalized entry must return the
    // exact clusterPairs rows (one per node, comp = component min) —
    // on the union-find fast path AND the distributed contraction
    for (seed <- Seq(2, 19)) {
      val rnd = new scala.util.Random(seed)
      val raw = Seq.fill(300)((rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
        .filter(p => p._1 != p._2)
      def labels(sess: org.apache.spark.sql.SparkSession): Map[Long, Long] = {
        import sess.implicits._
        val und = raw.toDF("a", "b")
          .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
          .distinct()
          .localCheckpoint()
        Dedup.ccLabelsOfEdges(und).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      val want = Dedup.clusterPairs(raw.toDF("doc_a", "doc_b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labels(s) === want, s"seed $seed: fast-path labels differ from clusterPairs")
      val dist = SparkSpec.withIsolatedConf("spark.graft.cc.localEdgeCutoff" -> "0")(labels)
      assert(dist === want, s"seed $seed: distributed labels differ from clusterPairs")
    }
  }

  test("clusterPairs equals union-find on random graphs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val edges = Seq
      .fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(p => p._1 != p._2)
    val got = Dedup.clusterPairs(edges.toDF("doc_a", "doc_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: path-compressed union-find with min-id representatives
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val want = parent.keys.map(x => x -> find(x)).toMap
    assert(got == want, s"diff: ${(got.toSet diff want.toSet) ++ (want.toSet diff got.toSet)}")
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString

  test("paragraphDedup: global first occurrence survives, later copies are dups") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta\nshared footer\nunique one"),
      (2L, "gamma delta\nshared footer\nunique two"),
      (3L, "shared footer"),
      (4L, "echo foxtrot\necho foxtrot")).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(docs).collect()
      .map(r =>
        r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_paras"), r.getAs[Long]("n_dup"), r.getAs[String]("clean_md5"))))
      .toMap
    assert(got(1L) == ((3L, 0L, md5Hex("alpha beta\nshared footer\nunique one"))))
    assert(got(2L) == ((3L, 1L, md5Hex("gamma delta\nunique two"))))
    // doc 3 is pure boilerplate: everything it has occurred earlier
    assert(got(3L) == ((1L, 1L, md5Hex(""))))
    // intra-doc repetition: the second copy is a dup of the first
    assert(got(4L) == ((2L, 1L, md5Hex("echo foxtrot"))))
  }

  test("paragraphDedup normalizes whitespace/case before fingerprinting") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "Shared   Footer"),
      (2L, "shared footer")).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dup"))
      .toMap
    assert(got == Map(1L -> 0L, 2L -> 1L))
  }

  test("semanticDedup prunes within-cluster near-identical vectors, keeps min id") {
    val s = spark
    import s.implicits._
    def v(xs: Float*): Seq[Float] = xs
    val e1 = v(1f, 0f, 0f, 0f)
    val e2 = v(0f, 1f, 0f, 0f)
    val embs = Seq(
      (0L, e1), // seed centroid 0
      (1L, e2), // seed centroid 1
      (5L, v(0.8f, 0.6f, 0f, 0f)), // cluster 0 (cos .8 to the seed: kept)
      (6L, v(0.8f, 0.6f, 0f, 0f)), // identical to 5 -> pruned
      (7L, v(0.5f, 0.85f, 0f, 0f)) // cluster 1, unique (cos .86 to the seed)
    ).toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(embs, nCentroids = 2).collect()
      .map(r =>
        r.getAs[Long]("vec_id") -> ((r.getAs[Long]("centroid_id"), r.getAs[Long]("kept"))))
      .toMap
    assert(got(5L)._1 == 0L && got(6L)._1 == 0L && got(7L)._1 == 1L)
    assert(got(5L)._2 == 1L && got(6L)._2 == 0L && got(7L)._2 == 1L)
    assert(got(0L)._2 == 1L && got(1L)._2 == 1L)
  }

  test("sampleQuota matches the naive per-group ROW_NUMBER selection") {
    val s = spark
    import s.implicits._
    val docs = (0L until 45L)
      .map(i => (i, if (i < 30) "big" else if (i < 40) "mid" else "tiny"))
      .toDF("doc_id", "source")
    val got = Corpus.sampleQuota(docs, n = 10).collect()
    val bySrc = got.groupBy(_.getAs[String]("source")).view.mapValues(_.length).toMap
    // exact quota where the group is big enough, everything where it isn't
    assert(bySrc == Map("big" -> 10, "mid" -> 10, "tiny" -> 5))
    // equivalence with the naive ordering: top-n by (bucket, md5 salt, id)
    import org.apache.spark.sql.expressions.Window
    val naive = docs
      .withColumn(
        "bucket",
        (expr("locate(substring(md5(cast(doc_id as string)), 1, 1), '0123456789abcdef')") - 1) * 16 +
          expr("locate(substring(md5(cast(doc_id as string)), 2, 1), '0123456789abcdef')") - 1)
      .withColumn(
        "rk",
        row_number().over(
          Window
            .partitionBy("source")
            .orderBy(
              col("bucket"),
              md5(concat(lit("samp:"), col("doc_id").cast("string"))),
              col("doc_id"))))
      .filter(col("rk") <= 10)
      .select("doc_id")
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(got.map(_.getAs[Long]("doc_id")).toSet == naive)
  }

  test("keepBestRepresentatives keeps the argmax-score member per cluster") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, 10L), (2L, 30L), (3L, 30L), // cluster {1,2,3}: 2 and 3 tie at 30 -> 2 wins
      (10L, 5L), (11L, 50L), // cluster {10,11}: 11 wins
      (99L, 1L) // unclustered: always kept
    ).toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val kept = Dedup.keepBestRepresentatives(docs, pairs, col("score"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(2L, 11L, 99L))
  }

  test("shuffleOrder: reproducible permutation, identical to the naive global window") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = (0L until 300L).toDF("doc_id")
    val got = Corpus.shuffleOrder(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shuffle_pos")).toMap
    assert(got.values.toSeq.sorted == (1L to 300L), "positions must be a permutation")
    val naive = docs
      .withColumn(
        "p",
        row_number()
          .over(Window.orderBy(
            md5(concat(lit("shuf:"), col("doc_id").cast("string"))),
            col("doc_id")))
          .cast("long"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("p"))
      .toMap
    assert(got == naive)
  }

  test("negativeSample: deterministic uniform draws, collision drop, invariants") {
    val s = spark
    import s.implicits._
    val corpus = (0L until 50L).toDF("doc_id")
    val pairs = Seq((1L, 3L), (2L, 7L), (9L, 40L)).toDF("query_id", "pos_id")
    val a = Corpus.negativeSample(pairs, corpus, k = 3).collect()
    val b = Corpus.negativeSample(pairs, corpus, k = 3).collect()
    assert(a.toSet === b.toSet, "two runs must agree byte for byte")
    val byPair = a.groupBy(r => (r.getLong(0), r.getLong(1)))
    assert(byPair.keySet === Set((1L, 3L), (2L, 7L), (9L, 40L)))
    a.foreach { r =>
      val (q, p, j, n) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n >= 0L && n < 50L, "negative must come from the corpus")
      assert(n !== p, "never the row's own positive")
      assert(n !== q, "never the query itself")
      assert(j >= 1L && j <= 3L)
    }
    assert(byPair.values.forall(_.length <= 3), "k is a ceiling")
    // 2-doc corpus where every draw hits the query or the positive:
    // all draws drop, honestly short instead of redrawn
    val tiny = Seq(5L, 6L).toDF("doc_id")
    val collide = Seq((5L, 6L)).toDF("query_id", "pos_id")
    assert(Corpus.negativeSample(collide, tiny, k = 4).count() === 0L)
  }

  test("paragraphDedupText is idempotent on its own output") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta\nshared footer\nunique one"),
      (2L, "gamma delta\nshared footer\nunique two"),
      (4L, "echo foxtrot\necho foxtrot")).toDF("doc_id", "text")
    val first = Dedup.paragraphDedupText(docs)
      .select(col("doc_id"), col("clean_text").as("text"))
    val second = Dedup.paragraphDedupText(first).collect()
      .map(r =>
        r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_dup"), r.getAs[String]("clean_text"))))
      .toMap
    val firstMap = first.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(second.keySet == firstMap.keySet)
    second.foreach { case (id, (nDup, text)) =>
      assert(nDup == 0L, s"doc $id still had dups on the second pass")
      assert(text == firstMap(id))
    }
  }

  test("splitAssign: deterministic, total, and respects cutoffs") {
    val s = spark
    import s.implicits._
    val docs = (0L until 512L).toDF("doc_id")
    val a = Corpus.splitAssign(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bucket"), r.getAs[String]("split")))
    assert(a.length == 512)
    assert(a.forall { case (_, b, _) => b >= 0 && b <= 255 })
    assert(a.forall {
      case (_, b, sp) =>
        sp == (if (b < 179) "train" else if (b < 217) "val" else "test")
    })
    // stable under re-evaluation (pure function of the id)
    val again = Corpus.splitAssign(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bucket"), r.getAs[String]("split")))
    assert(a.sortBy(_._1).sameElements(again.sortBy(_._1)))
    // bucket really is the first md5 byte
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected42 = (md.digest("42".getBytes("UTF-8"))(0) & 0xff).toLong
    assert(a.find(_._1 == 42L).get._2 == expected42)
  }

  test("keepRepresentatives drops exactly the non-min members of each cluster") {
    val s = spark
    import s.implicits._
    val docs = (1L to 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val kept = Dedup.keepRepresentatives(docs, pairs).collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 4L, 5L)) // 2,3 fold into 1; 6 into 5; 4 untouched
  }

  test("sampleStratified keeps all non-en docs and the sub-cutoff en buckets") {
    val s = spark
    import s.implicits._
    // "the and of is" scores en; "der die und ist" scores de
    val docs = (0L until 64L)
      .map(i => (i, if (i % 2 == 0) "the and of is" else "der die und ist"))
      .toDF("doc_id", "text")
    val kept = Corpus.sampleStratified(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang_pred"), r.getAs[Long]("bucket")))
    // every kept en doc has bucket < 128; every de doc survives
    assert(kept.filter(_._2 == "en").forall(_._3 < 128))
    assert(kept.count(_._2 == "de") == 32)
    // the split bucket and the sample bucket agree (same hash construction)
    val buckets = Corpus.splitAssign(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bucket")).toMap
    assert(kept.forall { case (id, _, b) => buckets(id) == b })
  }

  test("samplePps: selection matches the hand-walked cumulative grid; invariants hold") {
    val s = spark
    import s.implicits._
    // weights chosen so the fixture exercises: always-selected (w >= step),
    // never-selected (w = 0), negative clamp, and grid-boundary docs
    val docs = Seq(
      (1L, 120L), (2L, 0L), (3L, 340L), (4L, 75L), (5L, -9L),
      (6L, 500L), (7L, 33L), (8L, 260L), (9L, 18L), (10L, 44L)
    ).toDF("doc_id", "n_chars")
    val step = 100L
    val phase = 37L
    // hand-walk the same (md5(id), id) order with the same integer rule
    val walked = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L)
      .map(id => (id, math.max(Seq(120L, 0L, 340L, 75L, -9L, 500L, 33L, 260L, 18L, 44L)(id.toInt - 1), 0L)))
      .sortBy { case (id, _) => (md5Hex(id.toString), id) }
    val expect = walked
      .scanLeft((0L, 0L, 0L)) { case ((_, _, acc), (id, w)) => (id, w, acc + w) }
      .drop(1)
      .filter { case (_, w, cum) => (cum + phase) / step > (cum - w + phase) / step }
      .map { case (id, w, cum) => (id, w, cum) }
      .toSet
    val got = Corpus.samplePps(docs, step = step, phase = phase)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == expect)
    // invariants: every w >= step doc is selected (its interval spans a
    // full grid period), zero-weight and negative-clamped docs never are
    // (empty interval). A doc spanning several grid points still appears
    // exactly once, so |sample| <= |grid points swept|.
    val byId = got.map(t => t._1 -> t._2).toMap
    assert(byId.contains(1L) && byId.contains(3L) && byId.contains(6L) && byId.contains(8L))
    assert(!byId.contains(2L) && !byId.contains(5L))
    val totalW = walked.map(_._2).sum
    assert(got.size <= ((totalW + phase) / step - phase / step))
  }

  test("piiRedact counts and scrubs emails, IPs, phone patterns") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "reach me at alice.smith+x@corp.example.org or 192.168.1.7, tel 555-0199"),
      (2L, "no pii here, just 3.14 and v1.2.3 strings")
    ).toDF("doc_id", "text")
    val got = Corpus.piiRedact(docs).collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[Long]("n_emails") == 1)
    assert(got(1L).getAs[Long]("n_ips") == 1)
    assert(got(1L).getAs[Long]("n_phones") == 1)
    assert(got(2L).getAs[Long]("n_emails") == 0)
    assert(got(2L).getAs[Long]("n_ips") == 0) // 1.2.3 is not 4 octets
    assert(got(2L).getAs[Long]("n_phones") == 0)
    // the scrubbed text no longer matches any pattern
    val clean = docs
      .select(col("doc_id"), Corpus.redacted(col("text")).as("text"))
    val rescan = Corpus.piiRedact(clean).agg(
      sum("n_emails").as("e"), sum("n_ips").as("i"), sum("n_phones").as("p")).collect().head
    assert(rescan.getLong(0) == 0 && rescan.getLong(1) == 0 && rescan.getLong(2) == 0)
    assert(got(1L).getAs[String]("clean_md5") != got(2L).getAs[String]("clean_md5"))
  }

  test("qualityGate keeps exactly the docs at or above their source's median score") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val kept = Corpus.qualityGate(docs).collect()
    assert(kept.nonEmpty)
    // every kept row satisfies its own threshold column
    assert(kept.forall(r => r.getAs[Long]("q_i") >= r.getAs[Long]("q_threshold")))
    // nearest-rank p50 keeps at least half of each source, never all of a
    // source with score spread, and agrees with a driver-side recompute
    val scored = graft.ops.TextAnalysis
      .quality(docs)
      .select(col("doc_id"), round(col("quality_score") * 10000, 0).cast("long").as("q_i"))
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("q_i"), r.getAs[String]("source")))
    val bySource = scored.groupBy(_._3)
    val expected = bySource.toSeq.flatMap { case (_, rows) =>
      val sorted = rows.map(_._2).sorted
      val tot = sorted.length
      val thr = sorted.find(v => (sorted.count(_ <= v)) * 100 >= tot * 50).get
      rows.filter(_._2 >= thr).map(_._1).toSeq
    }.toSet
    assert(kept.map(_.getAs[Long]("doc_id")).toSet == expected)
  }

  test("mixtureSample: per-source keep rates follow the token budget; keeps = bucket<rate") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val budget = 10000L
    val kept = Corpus.mixtureSample(docs, budget).collect()
    assert(kept.nonEmpty)
    assert(kept.forall(r => r.getAs[Long]("bucket") < r.getAs[Long]("rate_256")))
    // recompute rates on the driver and check they match what was applied
    val tok = graft.ops.TextAnalysis.tokenStats(docs)
      .select(col("doc_id"), col("n_tokens"))
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens")))
    val totals = tok.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val share = budget / totals.size
    val expRates = totals.map { case (s, t) => s -> math.min(256L, share * 256 / t) }
    val gotRates = kept.map(r => r.getAs[String]("source") -> r.getAs[Long]("rate_256")).toMap
    gotRates.foreach { case (s, r) => assert(r == expRates(s), s"source $s") }
    // a rate under 256 actually drops docs for that source
    val partial = expRates.filter(_._2 < 256).keySet
    if (partial.nonEmpty) {
      val perSourceTotal = tok.groupBy(_._1).view.mapValues(_.size).toMap
      val perSourceKept = kept.groupBy(_.getAs[String]("source")).view.mapValues(_.size).toMap
      assert(partial.exists(s => perSourceKept.getOrElse(s, 0) < perSourceTotal(s)))
    }
  }

  test("mixtureSampleSqrt: hand-computed sqrt-damped rates; tail up-weighted vs equal share") {
    val s = spark
    import s.implicits._
    def doc(n: Int) = Seq.fill(n)("w").mkString(" ")
    // source A: 4 docs x 100 tokens = 400; source B: 2 docs x 100 = 200.
    // Ids chosen so each source has at least one low-md5-bucket doc that
    // survives its computed rate (27 -> bucket 2, 6 -> bucket 22).
    val docs = (Seq(27L, 33L, 1L, 2L).map(i => (i, "A", doc(100))) ++
      Seq((6L, "B", doc(100)), (5L, "B", doc(100)))).toDF("doc_id", "source", "text")
    val rates = Corpus.mixtureSampleSqrt(docs, budgetTokens = 300L)
      .select("source", "rate_256").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // w_A = floor(sqrt(400)) = 20, w_B = floor(sqrt(200)) = 14, wsum = 34
    // share_A = 300*20/34 = 176 -> rate 176*256/400 = 112
    // share_B = 300*14/34 = 123 -> rate 123*256/200 = 157
    // (kept rows exist for both sources at these rates, so distinct() sees both)
    assert(rates == Map("A" -> 112L, "B" -> 157L))
    // the sqrt temperature narrows the big/small rate gap vs equal share
    // (equal: A=96, B=192 — ratio 2.0; sqrt: 112 vs 157 — ratio 1.4)
    assert(rates("B").toDouble / rates("A") < 192.0 / 96.0)
  }

  test("crossMinHashLsh finds planted near-dups across corpora, not unrelated docs") {
    val s = spark
    import s.implicits._
    val base = (1 to 30).map(i => s"token$i").mkString(" ")
    val nearDup = (1 to 28).map(i => s"token$i").mkString(" ") + " other words"
    val unrelated = (100 to 130).map(i => s"word$i").mkString(" ")
    val corpus = Seq((1L, base), (2L, unrelated)).toDF("doc_id", "text")
    val probe = Seq((10L, nearDup), (11L, "completely different text about nothing")).toDF("doc_id", "text")
    val got = Dedup.crossMinHashLsh(probe, corpus).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("corpus_id"), r.getAs[Double]("jaccard")))
    assert(got.map(p => (p._1, p._2)).toSet == Set((10L, 1L)))
    assert(got.head._3 >= 0.8 && got.head._3 < 1.0)
  }

  test("probeLshIndex over a persisted index equals crossMinHashLsh on the same corpus") {
    val s = spark
    import s.implicits._
    val base = (1 to 30).map(i => s"token$i").mkString(" ")
    val nearDup = (1 to 28).map(i => s"token$i").mkString(" ") + " other words"
    val unrelated = (100 to 130).map(i => s"word$i").mkString(" ")
    val corpus = Seq((1L, base), (2L, unrelated), (3L, base + " extra tail here")).toDF("doc_id", "text")
    val probe = Seq((10L, nearDup), (11L, "completely different text about nothing")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    Dedup.writeLshIndex(corpus, dir)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("corpus_id"), r.getAs[Double]("jaccard")))
      .toSet
    val direct = rows(Dedup.crossMinHashLsh(probe, corpus))
    val probed = rows(Dedup.probeLshIndex(spark, dir, probe))
    assert(probed == direct)
    assert(probed.map(p => (p._1, p._2)).contains((10L, 1L)))
    // a second batch probes the SAME index without rebuilding it
    val probe2 = Seq((20L, base + " re crawl")).toDF("doc_id", "text")
    val probed2 = rows(Dedup.probeLshIndex(spark, dir, probe2))
    // the re-crawl matches both near-identical corpus docs, nothing else
    assert(probed2.map(p => (p._1, p._2)) == Set((20L, 1L), (20L, 3L)))
    // grow the index with the second batch: a third probe now sees it,
    // and the grown index equals a from-scratch cross over the union
    Dedup.appendLshIndex(probe2, dir)
    val probe3 = Seq((30L, base + " third crawl")).toDF("doc_id", "text")
    val probed3 = rows(Dedup.probeLshIndex(spark, dir, probe3))
    val fromScratch = rows(
      Dedup.crossMinHashLsh(probe3, corpus.unionByName(probe2)))
    assert(probed3 == fromScratch)
    assert(probed3.map(p => p._2).contains(20L), "grown index must surface the appended doc")
    // mismatched hash parameters are refused, not silently mis-probed
    intercept[IllegalArgumentException](
      Dedup.probeLshIndex(spark, dir, probe3, numHashes = 16))
    intercept[IllegalArgumentException](
      Dedup.appendLshIndex(probe3, dir, shingle = 5))
    // GDPR-delete a corpus doc: tombstoned ids stop matching immediately,
    // compaction drops them physically and the probe is unchanged
    graft.ops.Similarity.deleteFromIndex(Seq(1L).toDF("doc_id"), dir, idCol = "doc_id")
    val afterDel = rows(Dedup.probeLshIndex(spark, dir, probe))
    assert(!afterDel.exists(_._2 == 1L), "tombstoned corpus doc still matched")
    Dedup.compactLshIndex(spark, dir)
    assert(rows(Dedup.probeLshIndex(spark, dir, probe)) == afterDel,
      "probe-after-compact must equal probe-before")
    assert(spark.read.parquet(s"$dir/bands").filter(col("id") === 1L).count() == 0L)
    assert(spark.read.parquet(s"$dir/shingles").filter(col("id") === 1L).count() == 0L)
  }

  test("assignClusters labels a batch against the frozen snapshot; clusterMergeAudit reports bridges") {
    val s = spark
    import s.implicits._
    def toks(a: Int, b: Int) = (a to b).map(i => s"t$i").mkString(" ")
    // A and B are crawl fragments at shingle-Jaccard ~0.69: below the 0.8
    // bar, so the snapshot holds them as separate singletons. C~D are a
    // planted near-dup clique (cluster 3). E is unrelated.
    val base = (1 to 30).map(i => s"token$i").mkString(" ")
    val history = Seq(
      (1L, toks(1, 85)),
      (2L, toks(16, 100)),
      (3L, base),
      (4L, base + " extra tail here"),
      (5L, (200 to 230).map(i => s"word$i").mkString(" "))).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("incclu").toString
    Dedup.writeLshIndex(history, s"$dir/lsh")
    Dedup.writeClusterMap(history, s"$dir/map")
    // the batch: a full re-crawl M bridging A and B, a copy N of C, an
    // unrelated P, and a batch-internal dup pair Q~R
    val fresh = (300 to 340).map(i => s"new$i").mkString(" ")
    val batch = Seq(
      (10L, toks(9, 92)),
      (11L, base),
      (12L, (400 to 440).map(i => s"none$i").mkString(" ")),
      (13L, fresh),
      (14L, fresh + " tiny tail")).toDF("doc_id", "text")
    val assigned = Dedup.assignClusters(spark, s"$dir/lsh", s"$dir/map", batch)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"))).toSet
    // M joins min(A, B) = 1; N joins C's cluster 3; P has no partner (no
    // row — its own singleton); Q/R form a fresh batch-local cluster 13
    assert(assigned == Set((10L, 1L), (11L, 3L), (13L, 13L), (14L, 13L)))
    // the audit reports exactly the bridged old cluster: B's singleton
    // merged into A's; C's clique label did not move
    val audit = Dedup.clusterMergeAudit(spark, s"$dir/lsh", s"$dir/map", batch)
      .collect().map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("merged_into"))).toSet
    assert(audit == Set((2L, 1L)))
    // a bridge-free batch audits clean — the persisted map is still exact
    val clean = Seq((20L, base + " re crawl")).toDF("doc_id", "text")
    assert(Dedup.clusterMergeAudit(spark, s"$dir/lsh", s"$dir/map", clean).isEmpty)
    // incremental assignment ≡ full rebuild restricted to the batch: the
    // from-scratch cluster map over history ∪ batch gives every assigned
    // batch doc the SAME label
    val full = Dedup.clusterPairs(Dedup.minHashLsh(history.unionByName(batch)))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"))).toMap
    assigned.foreach { case (id, c) =>
      assert(full(id) == c, s"doc $id: incremental $c vs rebuild ${full(id)}")
    }
  }

  test("curriculumOrder: score progression dominates, salt reshuffles only within ties") {
    val s = spark
    import s.implicits._
    val good = "informative article body with many varied meaningful content words here"
    val docs = Seq(
      (1L, good + " alpha"), (2L, good + " beta"), (3L, good + " gamma"), // equal-ish length/quality
      (4L, "the the the of of"), // stopword soup -> low score
      (5L, good + " " + good) // longest -> highest score
    ).toDF("doc_id", "text")
    val score = org.apache.spark.sql.functions.round(
      graft.ops.TextAnalysis.qualityScore(col("text")) * 10000, 0).cast("long")
    def ranked(salt: String) = Corpus.curriculumOrder(docs, score, salt).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val a = ranked("curr")
    // ranks are a permutation of 1..n and score never increases with rank
    assert(a.map(_._3).sorted.toSeq == (1L to 5L))
    val byRank = a.sortBy(_._3).map(_._2)
    assert(byRank.zip(byRank.tail).forall { case (x, y) => x >= y })
    assert(a.sortBy(_._3).last._1 == 4L, "stopword soup trains last")
    // a different salt permutes only within equal scores
    val b = ranked("other-salt")
    assert(a.map(t => (t._1, t._2)).toSet == b.map(t => (t._1, t._2)).toSet)
    val scoreOfRank = (r: Array[(Long, Long, Long)]) => r.sortBy(_._3).map(_._2).toSeq
    assert(scoreOfRank(a) == scoreOfRank(b), "score progression is salt-invariant")
  }

  test("incrementalNew drops re-crawled content, keeps genuinely new docs, min-id within batch") {
    val s = spark
    import s.implicits._
    val seen = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "Alpha  beta   GAMMA"), // normalizes to a seen fingerprint -> dropped
      (11L, "zeta eta theta"), // new -> kept
      (12L, "zeta eta theta"), // in-batch dup of 11 -> collapsed to min id
      (13L, "iota kappa") // new -> kept
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalNew(batch, seen).collect()
      .map(r => r.getAs[Long]("doc_id")).sorted.toSeq
    assert(got == Seq(11L, 13L))
  }

  test("tokenDrift: hand-computed ppm ratios; new/gone/shifted all surface") {
    val s = SparkSpec.spark
    import s.implicits._
    // prev totals 7: x4 y1 z2; cur totals 7: x1 y4 w2
    val prev = Seq((1L, "x x x x y"), (2L, "z z")).toDF("doc_id", "text")
    val cur = Seq((1L, "x y y y y"), (2L, "w w")).toDF("doc_id", "text")
    val got = graft.ops.Corpus.tokenDrift(prev, cur, minCount = 1).collect()
      .map(r =>
        r.getAs[String]("token") -> ((
          r.getAs[Long]("prev_tf"), r.getAs[Long]("cur_tf"),
          r.getAs[Long]("prev_ppm"), r.getAs[Long]("cur_ppm"),
          r.getAs[String]("status"), r.getAs[Long]("drift_milli"))))
      .toMap
    assert(got("x") == ((4L, 1L, 571428L, 142857L, "shifted", 250L)))
    assert(got("y") == ((1L, 4L, 142857L, 571428L, "shifted", 4000L)))
    assert(got("z") == ((2L, 0L, 285714L, 0L, "gone", -1L)))
    assert(got("w") == ((0L, 2L, 0L, 285714L, "new", -1L)))
    assert(got.size == 4)
  }

  test("importanceScore: target-exclusive bigrams outscore the rest; short docs score 0") {
    val s = spark
    import s.implicits._
    // target docs repeat one bigram ("aa bb"), off-target docs another
    // ("cc dd"); doc 5 shares the target's bigram without the label and
    // doc 6 is too short to have any bigram at all
    val docs = Seq(
      (1L, "aa bb aa bb aa", "en"),
      (2L, "aa bb aa bb aa", "en"),
      (3L, "cc dd cc dd cc", "fr"),
      (4L, "cc dd cc dd cc", "fr"),
      (5L, "aa bb aa bb aa", "fr"),
      (6L, "solo", "en")).toDF("doc_id", "text", "lang")
    // keepMilli = 700: the target bigram's smoothed milli-ratio here is
    // 1000·5·276 div (7·264) = 746, the off-target one's 209
    val got = Corpus
      .importanceScore(docs, isTarget = col("lang") === "en", keepMilli = 700L)
      .collect()
      .map(r =>
        r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_grams"), r.getAs[Long]("score_milli"), r.getAs[Boolean]("keep"))))
      .toMap
    assert(got.size == 6)
    // identical text => identical score, label notwithstanding (pass 2 is
    // content-only; the label only shapes the histogram)
    assert(got(1L) == got(2L) && got(1L)._2 == got(5L)._2)
    assert(got(3L) == got(4L))
    // the target-exclusive bigram carries a higher milli-ratio than the
    // off-target-exclusive one
    assert(got(1L)._2 > got(3L)._2)
    assert(got(1L)._3 && !got(3L)._3)
    // no bigrams => score 0, not a divide-by-zero null
    assert(got(6L) == ((0L, 0L, false)))
  }
}
