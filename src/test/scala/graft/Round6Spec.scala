package graft

import graft.ops.{Corpus, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Specs for the round-6 training-pipeline additions: RAG chunking,
  * corpus-level boilerplate removal, the linear hashed-feature quality
  * classifier, the data-card rollup, product quantization (codes + ADC
  * top-k), and the pairwise-free embedding-diversity audit.
  */
class Round6Spec extends SparkSpec {

  private def md5Hex(s: String): String =
    java.security.MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString

  // ---- chunkTokens ----

  test("chunkTokens: windows overlap by window - stride and keep the tail") {
    val s = spark
    import s.implicits._
    val text = (1 to 40).map(i => s"t$i").mkString(" ")
    val got = TextAnalysis
      .chunkTokens(Seq((1L, text)).toDF("doc_id", "text"), window = 32, stride = 24)
      .orderBy("chunk_id")
      .collect()
    assert(got.length == 2)
    val c0 = got(0)
    assert(c0.getAs[Long]("tok_start") == 1L && c0.getAs[Long]("tok_end") == 32L)
    assert(c0.getAs[Long]("n_tokens") == 32L)
    assert(c0.getAs[String]("chunk_text") == (1 to 32).map(i => s"t$i").mkString(" "))
    val c1 = got(1)
    assert(c1.getAs[Long]("tok_start") == 25L && c1.getAs[Long]("tok_end") == 40L)
    assert(c1.getAs[Long]("n_tokens") == 16L)
    assert(c1.getAs[String]("chunk_text") == (25 to 40).map(i => s"t$i").mkString(" "))
    assert(c1.getAs[String]("chunk_md5") == md5Hex(c1.getAs[String]("chunk_text")))
  }

  test("chunkTokens: a doc shorter than one window is a single partial chunk; empty docs vanish") {
    val s = spark
    import s.implicits._
    val got = TextAnalysis
      .chunkTokens(Seq((1L, "a b c"), (2L, "   ")).toDF("doc_id", "text"))
      .collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("doc_id") == 1L)
    assert(got(0).getAs[Long]("n_tokens") == 3L)
    assert(got(0).getAs[String]("chunk_text") == "a b c")
  }

  // ---- boilerplateLines ----

  test("boilerplateLines: lines in more than maxDocs docs are dropped, order preserved") {
    val s = spark
    import s.implicits._
    // "shared footer" is in all 3 docs (df=3 > maxDocs=2) -> dropped
    val docs = Seq(
      (1L, "alpha one\nshared footer\nbravo one"),
      (2L, "alpha two\nshared footer"),
      (3L, "shared footer\ncharlie three")).toDF("doc_id", "text")
    val got = TextAnalysis
      .boilerplateLines(docs, maxDocs = 2)
      .orderBy("doc_id")
      .collect()
    assert(got.map(_.getAs[Long]("n_lines")).toSeq == Seq(3L, 2L, 2L))
    assert(got.map(_.getAs[Long]("n_kept")).toSeq == Seq(2L, 1L, 1L))
    assert(got(0).getAs[String]("kept_md5") == md5Hex("alpha one\nbravo one"))
    assert(got(2).getAs[String]("kept_md5") == md5Hex("charlie three"))
  }

  test("boilerplateLines: a doc of only boilerplate keeps zero lines (md5 of empty)") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "only footer"),
      (2L, "only footer"),
      (3L, "only footer\nreal content")).toDF("doc_id", "text")
    val got = TextAnalysis
      .boilerplateLines(docs, maxDocs = 2)
      .orderBy("doc_id")
      .collect()
    assert(got(0).getAs[Long]("n_kept") == 0L)
    assert(got(0).getAs[String]("kept_md5") == md5Hex(""))
    assert(got(2).getAs[String]("kept_md5") == md5Hex("real content"))
  }

  // ---- linearScore ----

  test("linearScore: deterministic, repartition-stable, and sign-consistent with keep") {
    val s = spark
    val docs = s.read.parquet(s"$sf/documents.parquet").limit(50)
    val a = TextAnalysis.linearScore(docs).orderBy("doc_id").collect()
    val b = TextAnalysis.linearScore(docs.repartition(7)).orderBy("doc_id").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    a.foreach { r =>
      assert(r.getAs[Boolean]("keep") == (r.getAs[Long]("score_milli") > 0L))
    }
    assert(a.map(_.getAs[Long]("score_milli")).distinct.length > 1, "scores must spread")
  }

  test("linearScore: score is the weighted bucket-count sum (one-token doc)") {
    val s = spark
    import s.implicits._
    // one token repeated 3 times -> score = 3 * w(bucket), n_tokens = 3
    val got = TextAnalysis
      .linearScore(Seq((1L, "zap zap zap")).toDF("doc_id", "text"))
      .collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("n_tokens") == 3L)
    val single = TextAnalysis
      .linearScore(Seq((1L, "zap")).toDF("doc_id", "text"))
      .collect()(0)
      .getAs[Long]("score_milli")
    assert(got(0).getAs[Long]("score_milli") == 3L * single)
  }

  // ---- datacard ----

  test("datacard: ALL row is the exact sum of the per-source rows") {
    val s = spark
    val docs = s.read.parquet(s"$sf/documents.parquet")
    val rows = Corpus.datacard(docs).collect()
    val (all, per) = rows.partition(_.getAs[String]("source") == "ALL")
    assert(all.length == 1 && per.nonEmpty)
    for (c <- Seq("n_docs", "n_tokens", "n_chars", "n_kept"))
      assert(all(0).getAs[Long](c) == per.map(_.getAs[Long](c)).sum, s"column $c")
    assert(all(0).getAs[Long]("q_tenk_min") == per.map(_.getAs[Long]("q_tenk_min")).min)
    assert(all(0).getAs[Long]("q_tenk_max") == per.map(_.getAs[Long]("q_tenk_max")).max)
    per.foreach(r => assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs")))
  }

  test("datacard: NULL-source group stays NULL-labeled, distinct from the ALL total") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma", "web", "en"),
      (2L, "delta epsilon", "web", "en"),
      (3L, "orphan row text", null.asInstanceOf[String], "en"))
      .toDF("doc_id", "text", "source", "lang")
    val rows = Corpus.datacard(docs).collect()
    val labels = rows.map(_.getAs[String]("source"))
    assert(labels.count(_ == "ALL") == 1, s"exactly one total row: ${labels.toSeq}")
    assert(labels.count(_ == null) == 1, s"NULL source keeps its own row: ${labels.toSeq}")
    val all = rows.find(_.getAs[String]("source") == "ALL").get
    assert(all.getAs[Long]("n_docs") == 3L) // the total still counts the NULL-source doc
    val nul = rows.find(_.getAs[String]("source") == null).get
    assert(nul.getAs[Long]("n_docs") == 1L)
  }

  // ---- embedding standardization ----

  test("dimStats / standardizeMilli: hand-computed stats, z-scores, and constant-dim clamp") {
    val s = spark
    import s.implicits._
    // pos 0: values 1,2,3 → milli sum 6000, sq 14e6, mean 2000,
    //   var = (3*14e6 - 6000²)/9 = 666666.67 milli² → std = floor(816.49) = 816
    // pos 1: constant 0 → std 0 (clamped to 1 in the z-score)
    val embs = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(2.0f, 0.0f)),
      (3L, Seq(3.0f, 0.0f))).toDF("vec_id", "embedding")
    val st = graft.ops.Similarity.dimStats(embs).orderBy("pos").collect()
    assert(st.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, 3L, 2000L, 816L), (1L, 3L, 0L, 0L)))
    val z = graft.ops.Similarity.standardizeMilli(embs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // z = floor((xm - 2000)*1000 / 816): -1000000/816 → -1226 (floor, not trunc)
    assert(z(1L) == Seq(-1226L, 0L), s"got ${z(1L)}")
    assert(z(2L) == Seq(0L, 0L))
    assert(z(3L) == Seq(1225L, 0L))
    // standardized corpus re-fit: every dimension now has mean 0 (z is
    // integer milli, so the re-fit mean must sit within one milli of 0)
    val zdf = graft.ops.Similarity.standardizeMilli(embs)
      .select(col("vec_id"), transform(col("z_milli"), x => (x.cast("double") / 1000.0).cast("float")).as("embedding"))
    val refit = graft.ops.Similarity.dimStats(zdf).orderBy("pos").collect()
    assert(refit.forall(r => math.abs(r.getLong(2)) <= 1), "re-fit mean_milli within one milli of 0")
  }

  // ---- product quantization ----

  test("pqCodes: m rows per vector, codes within the codebook, seeds quantize to themselves") {
    val s = spark
    val embs = s.read.parquet(s"$sf/embeddings.parquet")
    val n = embs.count()
    val codes = Similarity.pqCodes(embs)
    assert(codes.count() == n * 4)
    val rng = codes.agg(min("code"), max("code"), min("qdist")).collect()(0)
    assert(rng.getLong(0) >= 0L && rng.getLong(1) <= 7L && rng.getLong(2) >= 0L)
    // a seed vector's subvectors ARE centroids -> its qdist is 0 everywhere
    val seedResidual = codes.filter(col("vec_id") < 8).agg(max("qdist")).collect()(0).getLong(0)
    assert(seedResidual == 0L)
  }

  test("pqTopK: an exact duplicate of a seed query ranks first at ADC distance 0") {
    val s = spark
    val embs = s.read.parquet(s"$sf/embeddings.parquet")
    val dup = embs
      .filter(col("vec_id") === 0)
      .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"), col("label"))
    val got = Similarity
      .pqTopK(embs.filter(col("vec_id") === 0), embs.unionByName(dup), k = 3)
      .orderBy("rank")
      .collect()
    assert(got.length == 3)
    assert(got(0).getAs[Long]("neighbor_id") == 1000000L)
    assert(got(0).getAs[Long]("adc_dist") == 0L)
    assert(got.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
  }

  // ---- diversity ----

  test("diversity: identical vectors read ~1000 milli, orthogonal vectors read ~0") {
    val s = spark
    import s.implicits._
    val same = (1 to 4).map(i => (i.toLong, 0L, Array(1.0f, 0f, 0f, 0f)))
    val orth = Seq(
      (10L, 1L, Array(1.0f, 0f, 0f, 0f)),
      (11L, 1L, Array(0f, 1.0f, 0f, 0f)),
      (12L, 1L, Array(0f, 0f, 1.0f, 0f)),
      (13L, 1L, Array(0f, 0f, 0f, 1.0f)))
    val df = (same ++ orth).toDF("vec_id", "label", "embedding")
    val got = Similarity
      .diversity(df)
      .collect()
      .map(r => r.getAs[Long]("label") -> (r.getAs[Long]("n"), r.getAs[Long]("cos_avg_milli")))
      .toMap
    assert(got(0L)._1 == 4L && got(0L)._2 == 1000L)
    assert(got(1L)._1 == 4L && got(1L)._2 == 0L)
  }

  test("l2sq_long native expression matches the HOF fold exactly (incl. degenerate inputs)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Array(1L, 2L, 3L), Array(4L, 6L, 3L)),       // 9 + 16 = 25
      (Array(0L, 0L), Array(0L, 0L)),               // 0
      (Array(-5L, 1000L), Array(5L, -1000L)),       // 100 + 4000000
      (Array(7L), Array(7L, 99L))                   // length mismatch -> truncate
    ).toDF("a", "b")
    val got = df
      .select(
        graft.functions.functions.l2sq_long(col("a"), col("b")).as("native"),
        aggregate(
          zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
          lit(0L),
          (acc, x) => acc + x).as("hof"))
      .collect()
    got.take(3).foreach(r => assert(r.getAs[Long]("native") == r.getAs[Long]("hof"), r.toString))
    assert(got(0).getAs[Long]("native") == 25L)
    assert(got(3).getAs[Long]("native") == 0L, "length mismatch truncates to the shorter vector")
    val nulls = Seq((Option.empty[Array[Long]], Some(Array(1L)))).toDF("a", "b")
    assert(
      nulls
        .select(graft.functions.functions.l2sq_long(col("a"), col("b")).as("d"))
        .collect()(0)
        .isNullAt(0))
  }

  // ---- chunk-overlap containment dedup ----

  test("chunkOverlapPairs: full clones share all chunks, a prefix republish shares two") {
    val s = spark
    import s.implicits._
    val base = (1 to 64).map(i => s"w$i").mkString(" ")
    val prefix = (1 to 56).map(i => s"w$i").mkString(" ") + " zz tail one two three four five"
    val docs = Seq(
      (1L, base),
      (2L, base),                                   // full clone: chunks 0,1,2 shared
      (3L, prefix),                                 // shares chunks 0 (1-32) and 1 (25-56)
      (4L, (100 to 160).map(i => s"q$i").mkString(" "))).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.chunkOverlapPairs(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Long]("n_shared"))
      .toMap
    assert(got == Map((1L, 2L) -> 3L, (1L, 3L) -> 2L, (2L, 3L) -> 2L))
  }

  test("containmentDrops: clone drops at 1000 milli, prefix republish at 666, tie keeps the earlier id") {
    val s = spark
    import s.implicits._
    val base = (1 to 64).map(i => s"w$i").mkString(" ")
    val prefix = (1 to 56).map(i => s"w$i").mkString(" ") + " zz tail one two three four five"
    val docs = Seq(
      (1L, base),                                   // original — survives
      (2L, base),                                   // full clone: 3/3 chunks → 1000 milli, tie → larger id drops
      (3L, prefix),                                 // 3 chunks, shares 2 → 666 milli
      (4L, (100 to 160).map(i => s"q$i").mkString(" "))).toDF("doc_id", "text")
    val at600 = graft.ops.TextAnalysis.containmentDrops(docs, minContainMilli = 600).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("container"), r.getAs[Long]("contain_milli"), r.getAs[Long]("n_shared"))))
      .toMap
    // doc 3 is contained in both 1 and 2 at equal (milli, shared) — best
    // container tiebreak picks the smaller container id
    assert(at600 == Map(2L -> ((1L, 1000L, 3L)), 3L -> ((1L, 666L, 2L))))
    // default 800-milli threshold: only the full clone drops
    val at800 = graft.ops.TextAnalysis.containmentDrops(docs).collect().map(_.getAs[Long]("doc_id"))
    assert(at800.toSeq == Seq(2L))
  }

  test("containmentDrops: boilerplate-only overlap never reaches the threshold (capped numerator, uncapped denominator)") {
    val s = spark
    import s.implicits._
    val boiler = (1 to 32).map(i => s"b$i").mkString(" ")
    // 5 docs of pure boilerplate: the fingerprint is capped at 3 postings,
    // so no pairs survive and nothing is dropped
    val docs = (1L to 5L).map(i => (i, boiler)).toDF("doc_id", "text")
    assert(
      graft.ops.TextAnalysis
        .containmentDrops(docs, minContainMilli = 1, maxPostings = 3)
        .count() == 0)
  }

  test("chunkOverlapPairs: a boilerplate chunk past the posting cap generates no pairs") {
    val s = spark
    import s.implicits._
    val boiler = (1 to 32).map(i => s"b$i").mkString(" ")
    val docs = (1L to 5L).map(i => (i, boiler)).toDF("doc_id", "text")
    assert(
      graft.ops.TextAnalysis.chunkOverlapPairs(docs, minShared = 1, maxPostings = 3).count() == 0,
      "5 postings of one fingerprint exceed maxPostings=3 and must be capped")
  }

  // ---- leakage-safe splitting ----

  test("clusterSafeSplit: a dup cluster lands in one split; singletons match splitAssign exactly") {
    val s = spark
    import s.implicits._
    val docs = (1L to 40L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    // two clusters: {3, 17, 29} (transitive via 17) and {8, 21}
    val pairs = Seq((3L, 17L), (17L, 29L), (8L, 21L)).toDF("doc_a", "doc_b")
    val got = graft.ops.Corpus.clusterSafeSplit(docs, pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("rep"), r.getAs[String]("split"))))
      .toMap
    assert(got.size == 40)
    assert(Set(3L, 17L, 29L).map(got(_)._1) == Set(3L), "cluster rep must be the min id")
    assert(Set(3L, 17L, 29L).map(got(_)._2).size == 1, "one split for the whole cluster")
    assert(Set(8L, 21L).map(got(_)._2).size == 1)
    val plain = graft.ops.Corpus.splitAssign(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split"))
      .toMap
    val clustered = Set(3L, 17L, 29L, 8L, 21L)
    (1L to 40L).filterNot(clustered).foreach { i =>
      assert(got(i)._2 == plain(i), s"singleton $i must keep its splitAssign split")
    }
    // the clusters' splits equal the hash split of their representative
    assert(got(17L)._2 == plain(3L))
    assert(got(21L)._2 == plain(8L))
  }

  test("splitLeakage: reports only cross-boundary near-dups, labeled with the eval split") {
    val s = spark
    import s.implicits._
    // 60 planted identical pairs (i, i+1000): each pair leaks iff the two
    // ids hash to opposite sides of the train boundary
    val base = (1L to 60L).flatMap { i =>
      val t = s"alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima $i"
      Seq((i, t), (i + 1000L, t))
    }.toDF("doc_id", "text")
    val splits = graft.ops.Corpus.splitAssign(base).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split"))
      .toMap
    val rows = graft.ops.Corpus.splitLeakage(base).collect()
    assert(rows.nonEmpty, "60 planted pairs must produce at least one straddling near-dup")
    rows.foreach { r =>
      val ev = r.getAs[Long]("eval_doc")
      val tr = r.getAs[Long]("train_doc")
      assert(splits(tr) == "train", s"train_doc $tr must be in train")
      assert(splits(ev) != "train", s"eval_doc $ev must not be in train")
      assert(r.getAs[String]("split") == splits(ev))
      assert(r.getAs[Double]("jaccard") >= 0.8)
    }
  }

  // ---- join-cardinality pre-flight ----

  test("joinCardinality: predicts the real equi-join output exactly; null keys excluded") {
    val s = spark
    import s.implicits._
    val left = Seq(
      Some("a"), Some("a"), Some("a"), Some("b"), None, None
    ).map(k => (k, 1)).toDF("k", "x").select(col("k"), col("x"))
    val right = Seq(Some("a"), Some("a"), Some("c"), Some("c"), Some("c"), None)
      .map(k => (k, 1)).toDF("k", "y").select(col("k"), col("y"))
    val rep = graft.ops.Checks.joinCardinality(left, right, "k").collect()
    assert(rep.map(r => (r.getAs[String]("key"), r.getAs[Long]("n_out"))).toSeq ==
      Seq(("a", 6L)), "only keys present on BOTH sides contribute")
    assert(rep.head.getAs[Long]("total_out") == 6L)
    assert(rep.head.getAs[Long]("share_ppm") == 1000000L)
    val real = left.join(right, Seq("k")).count()
    assert(real == rep.head.getAs[Long]("total_out"), "prediction must equal the actual join")
  }

  test("joinCardinality: total covers ALL keys even when topK truncates the report") {
    val s = spark
    import s.implicits._
    val left = (1 to 50).flatMap(i => Seq.fill(i % 5 + 1)(s"k$i")).map((_, 1)).toDF("k", "x")
    val right = (1 to 50).flatMap(i => Seq.fill(i % 3 + 1)(s"k$i")).map((_, 1)).toDF("k", "y")
    val rep = graft.ops.Checks.joinCardinality(left, right, "k", topK = 3).collect()
    assert(rep.length == 3)
    val real = left.join(right, Seq("k")).count()
    assert(rep.head.getAs[Long]("total_out") == real,
      "total_out must be the full-join cardinality, not the top-3 sum")
  }

  // ---- chunk index lifecycle ----

  test("chunk index: write, probe flags clones against history, append makes the batch visible") {
    val s = spark
    import s.implicits._
    val path = java.nio.file.Files.createTempDirectory("chunkidx").toString
    def mk(rows: (Long, String)*) = rows.toDF("doc_id", "text")
    val t1 = (1 to 64).map(i => s"a$i").mkString(" ")
    val t2 = (1 to 64).map(i => s"b$i").mkString(" ")
    val t3 = (1 to 64).map(i => s"c$i").mkString(" ")
    graft.ops.TextAnalysis.writeChunkIndex(mk((1L, t1), (2L, t2)), path)
    // batch 2: a clone of doc 1 and a fresh doc
    val hits2 = graft.ops.TextAnalysis
      .probeChunkIndex(s, path, mk((101L, t1), (102L, t3)))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("container"), r.getAs[Long]("contain_milli"))))
      .toMap
    assert(hits2 == Map(101L -> ((1L, 1000L))), "clone flagged, fresh doc clean")
    graft.ops.TextAnalysis.appendChunkIndex(mk((101L, t1), (102L, t3)), path)
    // batch 3: a clone of the APPENDED doc 102 — proves the append is live
    val hits3 = graft.ops.TextAnalysis
      .probeChunkIndex(s, path, mk((201L, t3)))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("container"))
      .toMap
    assert(hits3 == Map(201L -> 102L))
    // re-probing an appended batch never self-matches: doc 101's best
    // container is the original doc 1 (smaller id tiebreak), not itself
    val re = graft.ops.TextAnalysis.probeChunkIndex(s, path, mk((101L, t1))).collect()
    assert(re.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("container"))).toSeq ==
      Seq((101L, 1L)))
    // parameter drift fails fast instead of silently reporting no overlap
    intercept[IllegalArgumentException] {
      graft.ops.TextAnalysis.probeChunkIndex(s, path, mk((301L, t1)), window = 16, stride = 8)
    }
    // GDPR-delete container 1: the clone's best container immediately
    // falls back to the surviving copy 101; compaction drops doc 1's
    // postings physically and the probe is unchanged
    graft.ops.Similarity.deleteFromIndex(Seq(1L).toDF("doc_id"), path, idCol = "doc_id")
    val afterDel = graft.ops.TextAnalysis.probeChunkIndex(s, path, mk((401L, t1))).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("container"))).toSeq
    assert(afterDel == Seq((401L, 101L)), "tombstoned container still matched")
    graft.ops.TextAnalysis.compactChunkIndex(s, path)
    val afterCompact = graft.ops.TextAnalysis.probeChunkIndex(s, path, mk((401L, t1))).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("container"))).toSeq
    assert(afterCompact == afterDel, "probe-after-compact must equal probe-before")
    assert(s.read.parquet(s"$path/postings").filter(col("doc_id") === 1L).count() == 0L)
    // a full rebuild clears stale tombstones: doc 1 is probeable again
    graft.ops.TextAnalysis.writeChunkIndex(mk((1L, t1), (2L, t2)), path)
    val rebuilt = graft.ops.TextAnalysis.probeChunkIndex(s, path, mk((501L, t1))).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("container"))).toSeq
    assert(rebuilt == Seq((501L, 1L)), "rebuild must forget old tombstones")
  }

  // ---- embedding cell drift ----

  test("cellDrift: population shift measured in the prev-snapshot frame") {
    val s = spark
    import s.implicits._
    val a = Array(1f, 0f, 0f, 0f)
    val b = Array(0f, 1f, 0f, 0f)
    // prev: centroids 0 (a-ish) and 1 (b-ish); cell0 = {0, 2, 3}, cell1 = {1}
    val prev = Seq((0L, a), (1L, b), (2L, a), (3L, Array(0.9f, 0.1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    // cur: two more b-side vectors -> cells even out at 3/3
    val cur = prev.unionAll(
      Seq((10L, b), (11L, Array(0.1f, 0.9f, 0f, 0f))).toDF("vec_id", "embedding"))
    val got = graft.ops.Similarity.cellDrift(prev, cur, nCentroids = 2).collect()
      .map(r => r.getAs[Long]("centroid_id") ->
        ((r.getAs[Long]("n_prev"), r.getAs[Long]("n_cur"), r.getAs[Long]("drift_milli"))))
      .toMap
    // cell0: 750000 ppm -> 500000 ppm = 666 milli; cell1: 250000 -> 500000 = 2000
    assert(got == Map(0L -> ((3L, 3L, 666L)), 1L -> ((1L, 3L, 2000L))))
  }

  // ---- blocklist filtering ----

  test("blocklistHits: token-aligned unigram + phrase matches, no substring hits") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick scan runs a slow scan twice slow scan"),
      (2L, "scanner scans scanning"),      // substrings only — must NOT hit "scan"
      (3L, "Slow   SCAN with odd spacing"), // normalization: case + whitespace
      (4L, "slow and scan apart"),          // tokens present but not adjacent
      (5L, "")).toDF("doc_id", "text")
    val got = graft.ops.Corpus.blocklistHits(docs, Seq("scan", "slow scan")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term")) -> r.getAs[Long]("n_hits"))
      .toMap
    assert(got == Map(
      (1L, "scan") -> 3L, (1L, "slow scan") -> 2L,
      (3L, "scan") -> 1L, (3L, "slow scan") -> 1L,
      (4L, "scan") -> 1L))
    val kept = graft.ops.Corpus.blocklistFilter(docs, Seq("slow scan")).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(2L, 4L, 5L))
    // duplicate dictionary entries (and case variants of the same term)
    // collapse after normalization — hit counts must not double
    val dup = graft.ops.Corpus.blocklistHits(docs, Seq("scan", "SCAN", "scan")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hits")).toMap
    assert(dup == Map(1L -> 3L, 3L -> 1L, 4L -> 1L))
  }

  // ---- fluency gate ----

  test("fluencyGate: drops each source's most-surprising tail, keeps per-source thresholds independent") {
    val s = spark
    import s.implicits._
    // source A: 8 fluent docs (repetitive, predictable bigrams) + 2 where
    // the common prefix "the" continues into never-repeated tokens (the
    // pattern the MLE score punishes: c1 large, c2 = 1); source B: all
    // such salad, so B's threshold is high and B keeps docs A would have
    // dropped under a global cut
    val fluent = (1 to 20).map(_ => "the cat sat on the mat").mkString(" ")
    def salad(seed: Long) = (0 to 11).map(j => s"the z${seed}x$j").mkString(" ")
    val docs = (
      (1L to 8L).map(i => (i, fluent, "A")) ++
        Seq((9L, salad(9), "A"), (10L, salad(10), "A")) ++
        (11L to 16L).map(i => (i, salad(i), "B"))
    ).toDF("doc_id", "text", "source")
    val kept = graft.ops.Corpus.fluencyGate(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("lm_milli"))
      .toMap
    assert((1L to 8L).forall(kept.contains), "fluent A docs must pass")
    assert(!kept.contains(9L) && !kept.contains(10L), "A's salad tail must be dropped")
    assert((11L to 16L).forall(kept.contains),
      "B competes only with itself — all-salad source keeps its p75 mass")
    val scores = graft.ops.TextAnalysis.bigramRarity(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("lm_milli"))
      .toMap
    assert(scores(9L) > scores(1L), "salad must score worse (higher) than fluent text")
  }

  // ---- token-balanced sharding ----

  test("balancedShards: snake dealing — exact hand assignment and near-equal token totals") {
    val s = spark
    import s.implicits._
    // token counts 10, 9, ..., 1 (doc_id i has 11 - i tokens)
    val docs = (1L to 10L)
      .map(i => (i, (1L to (11 - i)).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text")
    val got = graft.ops.Corpus.balancedShards(docs, nShards = 4).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("rank"), r.getAs[Long]("shard"))))
      .toMap
    // ranks follow (tokens desc, id asc): doc 1 = rank 1 ... doc 10 = rank 10
    // round 0 deals 0,1,2,3; round 1 reverses to 3,2,1,0; round 2 starts 0,1
    val expected = Map(
      1L -> ((1L, 0L)), 2L -> ((2L, 1L)), 3L -> ((3L, 2L)), 4L -> ((4L, 3L)),
      5L -> ((5L, 3L)), 6L -> ((6L, 2L)), 7L -> ((7L, 1L)), 8L -> ((8L, 0L)),
      9L -> ((9L, 0L)), 10L -> ((10L, 1L)))
    assert(got == expected)
    // token totals: 15, 14, 13, 13 — spread bounded by one round's spread
    val totals = graft.ops.Corpus.balancedShards(docs, nShards = 4).collect()
      .groupBy(_.getAs[Long]("shard"))
      .view.mapValues(_.map(_.getAs[Long]("n_tokens")).sum).toMap
    assert(totals == Map(0L -> 15L, 1L -> 14L, 2L -> 13L, 3L -> 13L))
  }

  test("balancedShards: heavy-tailed corpus — shard totals stay within the longest doc's tokens") {
    val s = spark
    import s.implicits._
    // deterministic heavy tail: doc i has (i * 37 % 199) + 1 tokens
    val docs = (1L to 300L)
      .map(i => (i, (1L to (i * 37 % 199 + 1)).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = graft.ops.Corpus.balancedShards(docs, nShards = 8).collect()
    val totals = rows.groupBy(_.getAs[Long]("shard")).map { case (_, rs) =>
      rs.map(_.getAs[Long]("n_tokens")).sum
    }
    val maxDoc = rows.map(_.getAs[Long]("n_tokens")).max
    assert(totals.size == 8)
    assert(totals.max - totals.min <= maxDoc,
      s"spread ${totals.max - totals.min} exceeds the longest doc ($maxDoc tokens)")
  }

  // ---- triangle counting ----

  test("triangleCounts: hand graph — one triangle, a pendant edge, a detached pair") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val got = graft.ops.Graph.triangleCounts(edges).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("n_tri")).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCounts: K4 gives every node 3 triangles; direction and duplicate edges are ignored") {
    val s = spark
    import s.implicits._
    val nodes = Seq(1L, 2L, 3L, 4L)
    val clique = for (a <- nodes; b <- nodes if a != b) yield (a, b) // both directions + dups
    val got = graft.ops.Graph.triangleCounts(clique.toDF("src", "dst")).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("n_tri")).toMap
    assert(got == nodes.map(_ -> 3L).toMap)
  }

  // ---- URL canonicalization dedup ----

  test("urlCanonicalGroups: tracking-query, fragment, and trailing-slash variants collapse") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "see https://Site.example/Page/ and more"),
      (2L, "see https://site.example/page?utm_source=x#top"),
      (3L, "see https://site.example/page#frag plus https://other.example/x"),
      (4L, "see https://site.example/page https://site.example/page")).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.urlCanonicalGroups(docs).collect()
      .map(r => r.getAs[String]("canon_url") ->
        ((r.getAs[Long]("n_urls"), r.getAs[Long]("n_docs"), r.getAs[Long]("rep_doc")))).toMap
    assert(got("https://site.example/page") == ((5L, 4L, 1L)))
    assert(got("https://other.example/x") == ((1L, 1L, 3L)))
    assert(got.size == 2)
  }

  test("diversity: groups of one vector are excluded (pairwise mean undefined)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, 0L, Array(1.0f, 0f)),
      (2L, 0L, Array(1.0f, 0f)),
      (3L, 9L, Array(0f, 1.0f))).toDF("vec_id", "label", "embedding")
    val labels = Similarity.diversity(df).collect().map(_.getAs[Long]("label")).toSet
    assert(labels == Set(0L))
  }
}
