package graft

import graft.api.Pipeline
import graft.ops.{Corpus, Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** End-to-end corpus-preparation facade: the composed pipeline must agree
  * stage-by-stage with the individual operators it wires.
  */
class PipelineSpec extends SparkSpec {

  private lazy val docs = SparkSpec.spark.read.parquet(s"$sf/documents.parquet")
  private lazy val prepared = new Pipeline().prepare(docs).cache()

  test("prepare emits one row per surviving doc with lang, quality, split, chunk") {
    val n = prepared.count()
    assert(n > 0 && n <= docs.count())
    assert(
      prepared.columns.toSet ==
        Set("doc_id", "quality_score", "lang_pred", "split", "shard", "chunk", "n_tokens"))
    assert(prepared.select("doc_id").distinct().count() == n, "one row per doc")
  }

  test("survivors = quality/lang filter ∩ dedup keep-list") {
    val kept = new Pipeline().filtered(docs).select("doc_id")
    val reps = Dedup.keepRepresentatives(docs, Dedup.minHashLsh(docs))
    val expected = kept.join(reps, "doc_id").count()
    assert(prepared.count() == expected)
  }

  test("split assignment matches Corpus.splitAssign on every surviving doc") {
    val mismatch = prepared
      .join(Corpus.splitAssign(docs).withColumnRenamed("split", "expected"), "doc_id")
      .filter(col("split") =!= col("expected"))
      .count()
    assert(mismatch == 0)
  }

  test("chunk assignment is the packGreedy layout over the SURVIVING corpus") {
    // per-(shard, chunk) doc counts from the per-doc manifest must equal
    // packGreedy's per-chunk occupancy over the same surviving docs
    val survivors = docs.join(prepared.select("doc_id"), "doc_id")
    val fromOp = Corpus.packGreedy(survivors, ctxTokens = 2048)
      .select("shard", "chunk", "n_docs")
    val fromManifest = prepared.groupBy("shard", "chunk")
      .agg(count(lit(1)).cast("long").as("m"))
    val diff = fromOp.join(fromManifest, Seq("shard", "chunk"), "full")
      .filter(col("n_docs").isNull || col("m").isNull || col("n_docs") =!= col("m"))
      .count()
    assert(diff == 0)
  }

  test("mixed corpus: per-modality near-dup drops, one manifest, modality rows in the datacard") {
    val base = docs.filter(col("doc_id") < 40)
    val imgs = graft.etl.MediaSynth.mediaTable(base, "image/bmp", graft.etl.MediaSynth.docBmp)
    val wavs = graft.etl.MediaSynth.mediaTable(base, "audio/wav", graft.etl.MediaSynth.docWav)
    // plant an exact re-upload of image 1 and clip 2 under fresh ids —
    // the perceptual hashes pair them at hamming 0 and the keep rule must
    // drop the re-upload, keep the original
    def reupload(m: org.apache.spark.sql.DataFrame, id: Long) = m
      .filter(col("doc_id") === id)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("kind"), col("n_bytes"), col("media"))
    val media = imgs.unionByName(reupload(imgs, 1L)).unionByName(wavs).unionByName(reupload(wavs, 2L))
    val p = new Pipeline()
    val kept = p.mediaKeep(media).cache()
    // the re-uploads carry the highest ids of their (exact-copy) clusters,
    // so the min-id keep rule can never select them — regardless of any
    // natural near-dup pairs among the generated fixtures
    assert(kept.filter(col("doc_id") === 1000001L).count() == 0L, "image re-upload must drop")
    assert(kept.filter(col("doc_id") === 1000002L).count() == 0L, "audio re-upload must drop")
    assert(kept.columns.toSet == Set("doc_id", "kind", "n_bytes", "media"))
    // mixed manifest: text rows keep their prepare() columns, media rows
    // carry their modality and the SAME hash-split rule on their ids
    val manifest = p.prepareMixed(docs, media)
    assert(manifest.filter(col("modality") === "text").count() == prepared.count())
    val mediaRows = manifest.filter(col("modality") =!= "text")
    assert(mediaRows.count() == kept.count())
    val badSplit = mediaRows
      .join(Corpus.splitAssign(kept).withColumnRenamed("split", "expected"), "doc_id")
      .filter(col("split") =!= col("expected"))
      .count()
    assert(badSplit == 0L)
    // datacard: one row per modality in the text card's schema, with the
    // drop visible as n_docs - n_kept
    val card = p.datacardMixed(docs, media)
      .filter(col("source").startsWith("media:"))
      .collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"))))
      .toMap
    assert(card.keySet == Set("media:image/bmp", "media:audio/wav"))
    // at least the planted re-upload dropped per modality (natural
    // near-dups among the generated fixtures may drop more)
    val (imgTotal, imgKept) = card("media:image/bmp")
    assert(imgTotal == 41L && imgKept <= 40L && imgKept >= 1L,
      s"image card: total $imgTotal, kept $imgKept")
    val (wavTotal, wavKept) = card("media:audio/wav")
    assert(wavTotal == 41L && wavKept <= 40L && wavKept >= 1L,
      s"audio card: total $wavTotal, kept $wavKept")
  }

  test("blocklist knob ≡ preparing the manually pre-filtered corpus") {
    val hits = Corpus.blocklistHits(docs, Seq("dup"))
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(hits.nonEmpty, "fixture must contain the blocked term")
    val viaKnob = new Pipeline(blocklist = Seq("dup")).prepare(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaPrefilter = new Pipeline()
      .prepare(Corpus.blocklistFilter(docs, Seq("dup")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaKnob == viaPrefilter, "the knob must act exactly like pre-filtering the corpus")
    assert(viaKnob.nonEmpty && viaKnob.intersect(hits).isEmpty, "no blocked doc may survive")
  }

  test("clusterSafeSplits knob: every survivor's split is the cluster-safe assignment") {
    val out = new Pipeline(clusterSafeSplits = true).prepare(docs)
    val expected = Corpus
      .clusterSafeSplit(docs, Dedup.minHashLsh(docs))
      .withColumnRenamed("split", "expected")
      .select("doc_id", "expected")
    val mismatch = out.join(expected, "doc_id")
      .filter(col("split") =!= col("expected"))
      .count()
    assert(mismatch == 0)
    assert(out.count() > 0)
  }

  test("optional adaptive-gate and mixture stages intersect the baseline survivors") {
    val base = prepared.select("doc_id").collect().map(_.getLong(0)).toSet
    val gatedIds = graft.ops.Corpus.qualityGate(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val mixedIds = graft.ops.Corpus.mixtureSample(docs, 10000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val withStages = new Pipeline(
      adaptiveQualityPct = Some(50),
      mixtureBudgetTokens = Some(10000L))
      .prepare(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(withStages == (base & gatedIds & mixedIds))
    assert(withStages.size < base.size, "optional stages should actually drop docs here")
  }

  test("importanceTarget knob: survivors = baseline ∩ the operator's keep set") {
    val base = prepared.select("doc_id").collect().map(_.getLong(0)).toSet
    val keepIds = Corpus
      .importanceScore(docs, isTarget = col("lang") === "en", keepMilli = 1000L)
      .filter(col("keep"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val withStage = new Pipeline(importanceTarget = Some(col("lang") === "en"))
      .prepare(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(withStage == (base & keepIds))
    assert(withStage.size < base.size, "the importance gate should actually drop docs here")
  }

  test("tokenBudgetChars knob: manifest covers the budget and is the operator's cut of the survivors") {
    val budget = 30000L
    val budgeted = new Pipeline(tokenBudgetChars = Some(budget)).prepare(docs)
    val ids = budgeted.select("doc_id").collect().map(_.getLong(0)).toSet
    val baseIds = prepared.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(baseIds), "the budget cut only removes docs, never adds")
    assert(ids.size < baseIds.size, "the budget should actually cut at this fixture size")
    // agrees with takeTokenBudget over exactly the un-budgeted survivors
    val expected = graft.ops.Corpus
      .takeTokenBudget(
        docs.join(prepared.select("doc_id"), "doc_id")
          .select(col("doc_id"), length(col("text")).cast("long").as("n_chars")),
        budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == expected)
    // budgets bound from below: kept chars reach the budget
    val keptChars = docs.join(budgeted.select("doc_id"), "doc_id")
      .agg(sum(length(col("text")))).collect().head.getLong(0)
    assert(keptChars >= budget, s"kept $keptChars chars < budget $budget")
  }

  test("curriculum: manifest rows unchanged, ranks a permutation ordered best-quality-first") {
    val cur = new Pipeline().curriculum(docs).cache()
    try {
      assert(cur.select("doc_id").collect().map(_.getLong(0)).toSet ==
        prepared.select("doc_id").collect().map(_.getLong(0)).toSet)
      val rows = cur.select("curriculum_rank", "quality_score").collect()
        .map(r => r.getAs[Long]("curriculum_rank") -> r.getAs[Double]("quality_score"))
      val n = rows.length.toLong
      assert(rows.map(_._1).sorted.toSeq == (1L to n), "ranks are a dense permutation")
      // integerized quality never increases as rank walks the curriculum
      val byRank = rows.sortBy(_._1).map(t => math.round(t._2 * 10000))
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a >= b, s"quality rose along the curriculum: $a -> $b")
        case _ =>
      }
    } finally cur.unpersist()
  }

  test("datacard: audits exactly the prepared survivors, ALL row equals their totals") {
    val card = new Pipeline().datacard(docs)
    val all = card.filter(col("source") === "ALL").collect()
    assert(all.length == 1)
    val survivors = docs.join(prepared.select("doc_id"), "doc_id")
    assert(all.head.getAs[Long]("n_docs") == survivors.count())
    assert(
      all.head.getAs[Long]("n_chars") ==
        survivors.agg(sum(length(col("text")))).collect().head.getLong(0))
  }

  test("observed: stage metrics collected in the same action, no extra job") {
    val (df, obs) = Pipeline.observed(
      new Pipeline().filtered(docs),
      "filter_stage")
    val n = df.count()
    val got = obs.get
    assert(got("n_rows") == n)
  }

  test("text-rewrite pre-stages: downstream stages see cleaned, paragraph-deduped text") {
    val s = SparkSpec.spark
    import s.implicits._
    val footer = "the shared footer line appears in every single document right here today."
    val fixture = Seq(
      (1L, "the quick brown fox number one jumps over that lazy dog today.\n" + footer),
      (2L, "the quick cat naps number two under that warm sun roof today.\n" + footer),
      (3L, "the small bird sings number three near that old oak tree today.\njunk { line."))
      .toDF("doc_id", "text")
    val got = new Pipeline(lineClean = true, dropDupParagraphs = true)
      .prepare(fixture)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens"))
      .toMap
    // doc 1 keeps its line + the footer's first occurrence (12 + 12 tokens);
    // doc 2 loses the dup footer; doc 3 loses the junk line to the line rules
    assert(got == Map(1L -> 24L, 2L -> 12L, 3L -> 12L))
  }

  test("exciseDupSpans knob: mid-paragraph duplicated runs are stripped, untouched docs pass through") {
    val s = SparkSpec.spark
    import s.implicits._
    val header = "licensed under the apache license version two point zero see notice" // 11 tokens
    val fixture = Seq(
      (1L, s"$header body of document one continues with its own words"),
      (2L, s"$header body of document two continues with very different phrasing"),
      (3L, "a wholly original document sharing no five gram run with others"))
      .toDF("doc_id", "text")
    val got = new Pipeline(exciseDupSpans = true)
      .cleaned(fixture)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L), "no doc may vanish from the corpus")
    // the span runs through "body of document" (shared by both docs via
    // grams bridging out of the header) and stops where the texts diverge
    assert(got(1L) == "one continues with its own words")
    assert(got(2L) == "two continues with very different phrasing")
    assert(got(3L) == "a wholly original document sharing no five gram run with others")
  }

  test("cleaned: a doc with zero non-empty paragraphs flows through with empty text") {
    val s = SparkSpec.spark
    import s.implicits._
    val fixture = Seq(
      (1L, "the quick brown fox number one jumps over that lazy dog today."),
      (2L, "   \n\t\n"), // whitespace-only: paragraphDedupText emits no row for it
      (3L, "junk { line.")) // lineClean empties it entirely
      .toDF("doc_id", "text")
    val got = new Pipeline(lineClean = true, dropDupParagraphs = true)
      .cleaned(fixture)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L), "no doc may vanish from the corpus")
    assert(got(2L) == "" && got(3L) == "")
    assert(got(1L).nonEmpty)
  }

  test("prepareMixedIncremental: media history drops via the index, text via the snapshot artifacts") {
    val s = SparkSpec.spark
    import s.implicits._
    val p = new Pipeline()
    val dir = java.nio.file.Files.createTempDirectory("mixinc").toString
    // frozen artifacts: text LSH index + fingerprint store, media fp index
    Dedup.writeLshIndex(docs, dir + "/lsh")
    val seen = docs.select(TextAnalysis.fingerprint(col("text")).as("fingerprint"))
    val histMedia = graft.etl.MediaSynth.mediaTable(
      docs.filter(col("doc_id") < 40), "image/bmp", graft.etl.MediaSynth.docBmp)
    graft.ops.Multimodal.writeMediaIndex(histMedia, dir + "/media")
    // media batch: a re-upload of history image 1 (must drop via the
    // index) and a fresh image content (id 90000011 -> unseen bytes)
    def img(newId: Long, contentId: Long) = {
      val b = graft.etl.MediaSynth.docBmp(contentId)
      Seq((newId, "image/bmp", b.length.toLong, b)).toDF("doc_id", "kind", "n_bytes", "media")
    }
    val mediaBatch = img(90000010L, 1L).unionByName(img(90000011L, 90000011L))
    val fresh = "the quick brown fox jumped over the lazy dog and then " +
      "the cat sat on the mat while the children played in the garden all day."
    val batch = Seq((90000003L, fresh)).toDF("doc_id", "text")
    val got = p.prepareMixedIncremental(batch, seen, dir + "/lsh", mediaBatch, dir + "/media")
    val mediaIds = got.filter(col("modality") =!= "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!mediaIds.contains(90000010L), "history re-upload must drop via the media index")
    assert(mediaIds.contains(90000011L), "fresh media must land")
    assert(got.filter(col("modality") === "text" && col("doc_id") === 90000003L).count() == 1L)
    // media rows carry the stable hash split
    val splitGot = got.filter(col("doc_id") === 90000011L).select("split").head().getString(0)
    val splitWant = Corpus.splitAssign(Seq((90000011L, "")).toDF("doc_id", "text"))
      .select("split").head().getString(0)
    assert(splitGot == splitWant)
    // an absent media index degrades to the in-batch keep-list
    val noIdx = p.mediaKeepIncremental(mediaBatch, dir + "/nosuch")
    assert(noIdx.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(90000010L, 90000011L))
  }

  test("prepareIncremental: batch maintenance against the frozen snapshot artifacts") {
    val s = SparkSpec.spark
    import s.implicits._
    val p = new Pipeline()
    // snapshot artifacts: persisted LSH index + the fingerprint store
    val dir = java.nio.file.Files.createTempDirectory("incprep").toString
    Dedup.writeLshIndex(docs, dir)
    val seen = docs.select(TextAnalysis.fingerprint(col("text")).as("fingerprint"))
    // the batch: an exact re-crawl (dropped by the fingerprint store), a
    // near-dup of history (dropped by the index probe), an in-batch dup
    // pair (min id kept), and a fresh well-formed English doc
    val src = docs.orderBy("doc_id").limit(2).collect()
    val fresh = "the quick brown fox jumped over the lazy dog and then " +
      "the cat sat on the mat while the children played in the garden all day."
    val batch = Seq(
      (90000001L, src(0).getAs[String]("text")),
      (90000002L, src(1).getAs[String]("text") + " tail"),
      (90000003L, fresh),
      (90000004L, fresh),
      (90000005L, fresh + " twist end")).toDF("doc_id", "text")
    val got = p.prepareIncremental(batch, seen, dir)
    // column-compatible with a full prepare run
    assert(got.columns.toSet == prepared.columns.toSet)
    val ids = got.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(90000001L), "exact re-crawl must be dropped by the fingerprint store")
    assert(!ids.contains(90000002L), "near-dup of history must be dropped by the index probe")
    assert(!ids.contains(90000004L), "in-batch exact dup must collapse to the min id")
    assert(!ids.contains(90000005L), "in-batch near-dup must collapse to the representative")
    // the fresh doc is kept iff it passes the same gate as a full run
    val freshKept = p.filtered(Seq((90000003L, fresh)).toDF("doc_id", "text")).count() == 1
    assert(ids.contains(90000003L) == freshKept)
    assert(freshKept, "fixture fresh doc should pass the default gate")
    // split agrees with the stable hash rule
    val splitGot = got.filter(col("doc_id") === 90000003L).select("split").head().getString(0)
    val splitWant = Corpus.splitAssign(Seq((90000003L, fresh)).toDF("doc_id", "text"))
      .select("split").head().getString(0)
    assert(splitGot == splitWant)
  }

  test("prepareIncremental setJoinPath: the exact stage catches LSH banding misses end-to-end") {
    val s = SparkSpec.spark
    import s.implicits._
    val p = new Pipeline()
    val baseText = "the quick brown fox jumps over the lazy dog while the children " +
      "play in the garden and the birds sing in the trees near the old stone bridge today"
    val history = Seq((1L, baseText)).toDF("doc_id", "text")
    val lshDir = java.nio.file.Files.createTempDirectory("incplsh").toString
    val sjDir = java.nio.file.Files.createTempDirectory("incpsj").toString
    Dedup.writeLshIndex(history, lshDir)
    Dedup.writeSetJoinIndex(history, sjDir)
    // 200 single-word variants: every one is a >= 0.8-Jaccard exact
    // near-dup of history, and each pair of variants differs in TWO words
    // (below the threshold, so no in-batch collapse muddies the probe)
    val toks = baseText.split(" ")
    val variants = (0 until 200).map { i =>
      (1000L + i, toks.updated(i % toks.length, s"variant$i").mkString(" "))
    }
    val vdf = variants.toDF("doc_id", "text")
    val exactHits = Dedup.probeSetJoinIndex(s, sjDir, vdf)
      .select("doc_b").collect().map(_.getLong(0)).toSet
    // the deterministic md5 banding MISSES some of these pairs — the
    // false negatives the lossless prefix filter exists to catch
    val lshKept = Dedup.nearDupSurvivors(vdf, lshDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val misses = lshKept.intersect(exactHits)
    assert(misses.nonEmpty,
      s"fixture premise: banding should miss at least one 0.8-Jaccard pair (kept ${lshKept.size})")
    // end-to-end: a missed near-dup sails through the facade WITHOUT the
    // exact stage and is dropped WITH it — agreement with probeSetJoinIndex
    val missedId = misses.min
    val batch = vdf.filter(col("doc_id") === missedId)
    val seen = history.select(TextAnalysis.fingerprint(col("text")).as("fingerprint"))
    val without = p.prepareIncremental(batch, seen, lshDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(without.contains(missedId), "without the exact stage the miss survives (by design)")
    val withExact = p.prepareIncremental(batch, seen, lshDir, setJoinPath = Some(sjDir))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!withExact.contains(missedId), "the opt-in exact stage must drop every index hit")
    // and the stage composes exactly as documented: facade == manual
    // exactDupSurvivors over the LSH survivors
    val manual = Dedup
      .exactDupSurvivors(Dedup.nearDupSurvivors(p.cleaned(batch), lshDir), sjDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(withExact.subsetOf(manual), s"facade kept $withExact beyond the manual stage $manual")
  }

  test("prepareIncremental tokenEditPath: the ed-1 re-crawl invisible to Jaccard still drops") {
    val s = SparkSpec.spark
    import s.implicits._
    val p = new Pipeline(minQuality = 0.0)
    // SHORT doc: one substituted word rewrites 3 of its 8 interior
    // shingles, so the re-crawl sits near Jaccard 0.45 — below the
    // 0.8-grade banding's reach — while staying at token edit distance 1,
    // the signature index's home turf
    val baseText = "the cat sat on the mat near the old door"
    val history = Seq((1L, baseText)).toDF("doc_id", "text")
    val lshDir = java.nio.file.Files.createTempDirectory("incplsh2").toString
    val teDir = java.nio.file.Files.createTempDirectory("incpte").toString
    Dedup.writeLshIndex(history, lshDir)
    Dedup.writeTokenEditIndex(history, teDir)
    val recrawl = (1000L, baseText.split(" ").updated(5, "carpet").mkString(" "))
    val freshDoc = (1001L, "a completely different sentence about query planning and shuffles")
    val batch = Seq(recrawl, freshDoc).toDF("doc_id", "text")
    val seen = history.select(TextAnalysis.fingerprint(col("text")).as("fingerprint"))
    val without = p.prepareIncremental(batch, seen, lshDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(without === Set(1000L, 1001L),
      s"fixture premise: the banding stage must miss the ed-1 re-crawl, got $without")
    val withTe = p.prepareIncremental(batch, seen, lshDir, tokenEditPath = Some(teDir))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(withTe === Set(1001L),
      s"the token-edit stage must drop the re-crawl and keep the fresh doc, got $withTe")
    // agreement with the manual stage composition, the documented contract
    val manual = Dedup
      .tokenEditSurvivors(Dedup.nearDupSurvivors(p.cleaned(batch), lshDir), teDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(withTe.subsetOf(manual), s"facade kept $withTe beyond the manual stage $manual")
    assert(manual === Set(1001L), s"manual stage must agree with probeTokenEditIndex: $manual")
  }

  test("prepareVectors: audit → conditional debias → semantic prune → live IVF index") {
    val s = SparkSpec.spark
    val e = s.read.parquet(s"$sf/embeddings.parquet").select("vec_id", "embedding")
    // planted exact copies: the semantic prune must drop the higher ids
    val copies = e.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val corpus = e.unionByName(copies)
    val dir = java.nio.file.Files.createTempDirectory("vecprep").toString

    // threshold above any real anisotropy: no debias, copies pruned
    val kept = new Pipeline()
      .prepareVectors(corpus, s"$dir/plain", debiasAbovePpm = 2000000L)
      .cache()
    assert(kept.select("debiased").head().getBoolean(0) == false)
    assert(kept.select("anisotropy_ppm").head().getLong(0) > 0L)
    val keptIds = kept.collect().map(_.getAs[Long]("vec_id")).toSet
    assert(copies.collect().map(_.getLong(0)).forall(id => !keptIds.contains(id)),
      "planted copies must be pruned (their originals have smaller ids)")
    // the index is live: a probe returns ranked neighbors from the survivors
    val probe = graft.ops.Similarity
      .probeIvfIndex(s, s"$dir/plain", e.filter(col("vec_id") < 2), k = 3)
    assert(probe.count() > 0)
    assert(probe.join(kept.select("vec_id").withColumnRenamed("vec_id", "neighbor_id"),
      Seq("neighbor_id"), "left_anti").count() == 0,
      "every probed neighbor must be a surviving vector")

    // threshold 0: debias always engages and the output is the corrected space
    val deb = new Pipeline().prepareVectors(corpus, s"$dir/deb", debiasAbovePpm = 0L)
    assert(deb.select("debiased").head().getBoolean(0) == true)
    val want = graft.ops.Similarity.debiasedVectors(corpus).count()
    assert(deb.count() <= want)
  }
}
