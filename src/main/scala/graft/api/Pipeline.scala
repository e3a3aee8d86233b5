package graft.api

import graft.ops.{Corpus, Dedup, Multimodal, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** User-facing facade for the training-data side of the engine: the
  * standard corpus-preparation pipeline (quality filter → language ID →
  * near-dup removal → train/val/test split → sequence packing) as one
  * composed, lazily-planned DataFrame program.
  *
  * Each stage is the library operator documented in `OPERATORS.md`; this
  * class only wires them. Everything stays declarative — one Spark job
  * graph, no driver-side materialization between stages — so Catalyst
  * prunes columns across stage boundaries and AQE sizes the shuffles of
  * the whole composition, exactly as it would for a hand-written query.
  *
  * Scale shape: the per-row stages (quality, langid, split) are
  * zero-shuffle column programs; the only wide stages are minhash-LSH
  * candidate generation (banded equi-join, hot-bucket-capped) and the
  * per-shard packing window. The keep-list anti-join broadcasts when the
  * drop-list is small — the common case for near-dup rates.
  */
final class Pipeline(
    minQuality: Double = 0.1,
    keepLangs: Seq[String] = Seq("en", "de", "es", "fr", "zh"),
    ctxTokens: Int = 2048,
    adaptiveQualityPct: Option[Int] = None,
    mixtureBudgetTokens: Option[Long] = None,
    lineClean: Boolean = false,
    dropDupParagraphs: Boolean = false,
    exciseDupSpans: Boolean = false,
    blocklist: Seq[String] = Nil,
    clusterSafeSplits: Boolean = false,
    tokenBudgetChars: Option[Long] = None,
    importanceTarget: Option[org.apache.spark.sql.Column] = None,
    importanceKeepMilli: Long = 1000L) {

  /** The text-rewriting pre-stages, applied before any scoring so every
    * downstream stage (quality, langid, dedup, packing) sees the text a
    * trainer would actually consume:
    *
    *  - `lineClean` drops C4-rejected lines ([[TextAnalysis.cleanedText]])
    *    — a zero-shuffle column rewrite;
    *  - `dropDupParagraphs` removes cross-corpus repeated paragraphs
    *    ([[Dedup.paragraphDedupText]]) — one fingerprint aggregation, the
    *    per-doc rebuild joining back on doc_id;
    *  - `exciseDupSpans` removes cross-corpus duplicated token RUNS that
    *    don't align to paragraph boundaries ([[TextAnalysis
    *    .stripDupSpans]] — license headers, quoted boilerplate mid-
    *    paragraph); NOTE the excision rewrite is tokenizer-normalizing
    *    (lowercase, single spaces), so enable it only when downstream
    *    consumers accept normalized text.
    */
  def cleaned(docs: DataFrame): DataFrame = {
    val afterLines =
      if (lineClean)
        docs.withColumn("text", TextAnalysis.cleanedText(col("text")))
      else docs
    val afterParas =
      if (dropDupParagraphs)
        // Left join: paragraphDedupText emits no row for docs whose text has
        // zero non-empty paragraphs (whitespace-only, or emptied by
        // lineClean) — those must flow through with empty text, not vanish.
        afterLines
          .drop("text")
          .join(
            Dedup
              .paragraphDedupText(afterLines)
              .select(col("doc_id"), col("clean_text")),
            Seq("doc_id"),
            "left")
          .withColumn("text", coalesce(col("clean_text"), lit("")))
          .drop("clean_text")
      else afterLines
    if (exciseDupSpans)
      // stripDupSpans returns the whole corpus (untouched docs included),
      // so this join is 1:1; left + coalesce for the same empty-doc safety
      afterParas
        .drop("text")
        .join(
          TextAnalysis
            .stripDupSpans(afterParas)
            .select(col("doc_id"), col("clean_text")),
          Seq("doc_id"),
          "left")
        .withColumn("text", coalesce(col("clean_text"), lit("")))
        .drop("clean_text")
    else afterParas
  }

  /** Doc ids passing the quality floor and the language allow-list, with
    * their predicted language and score attached.
    */
  def filtered(docs: DataFrame): DataFrame = {
    val q = TextAnalysis
      .quality(docs)
      .select(col("doc_id"), col("quality_score"))
    val l = TextAnalysis
      .langId(docs)
      .select(col("doc_id"), col("lang_pred"))
    q.join(l, "doc_id")
      .filter(col("quality_score") >= minQuality && col("lang_pred").isin(keepLangs: _*))
  }

  /** The full preparation run: returns the surviving docs with language,
    * quality, split, and pack-chunk assignment — the manifest a trainer
    * consumes. Optional stages (off by default, enabled by constructor
    * knobs):
    *
    *  - `adaptiveQualityPct = Some(p)` additionally gates each doc on its
    *    SOURCE's p-th quality percentile ([[Corpus.qualityGate]]) — the
    *    absolute `minQuality` floor catches garbage, the adaptive gate
    *    keeps each source's better half as the mix drifts;
    *  - `importanceTarget = Some(pred)` gates on DSIR-style importance:
    *    only docs whose hashed-bigram features score at least
    *    `importanceKeepMilli` against the target slice's distribution
    *    survive ([[Corpus.importanceScore]]);
    *  - `mixtureBudgetTokens = Some(b)` downsamples the survivors to a
    *    token budget split across sources ([[Corpus.mixtureSample]]);
    *  - `blocklist` (non-empty) drops documents containing any listed
    *    term/phrase ([[Corpus.blocklistFilter]]'s inverted broadcast
    *    semi-join) BEFORE scoring — blocked docs must not influence
    *    quality quantiles or the dedup keep-list;
    *  - `clusterSafeSplits = true` swaps [[Corpus.splitAssign]] for
    *    [[Corpus.clusterSafeSplitFromClusters]] fed the SAME connected-
    *    component labels the dedup keep-list uses — the split respects
    *    exactly the near-dup structure the pipeline already discovered,
    *    at no extra candidate-generation or clustering cost. (Post-dedup survivors are cluster
    *    representatives, so today both rules agree on survivors; the
    *    cluster-safe rule stays correct if the keep-list is relaxed to
    *    keep several members per cluster.)
    */
  def prepare(docs: DataFrame): DataFrame = {
    val base0 = cleaned(docs)
    val base =
      if (blocklist.isEmpty) base0 else Corpus.blocklistFilter(base0, blocklist)
    val kept = filtered(base)
    val gated = adaptiveQualityPct match {
      case None => kept
      case Some(p) =>
        kept.join(Corpus.qualityGate(base, p).select("doc_id"), "doc_id")
    }
    // `importanceTarget = Some(pred)` additionally gates on DSIR-style
    // importance ([[Corpus.importanceScore]]): docs whose hashed-bigram
    // features look at least `importanceKeepMilli`-typical of the target
    // slice survive. NOTE: composing this stage runs the bounded 256-cell
    // histogram job eagerly (the operator's documented two-pass shape).
    val weighted = importanceTarget match {
      case None => gated
      case Some(pred) =>
        gated.join(
          Corpus
            .importanceScore(base, pred, importanceKeepMilli)
            .filter(col("keep"))
            .select("doc_id"),
          "doc_id")
    }
    val mixed = mixtureBudgetTokens match {
      case None => weighted
      case Some(b) =>
        weighted.join(Corpus.mixtureSample(base, b).select("doc_id"), "doc_id")
    }
    // The CC label job (iterative, materialized per round) runs ONCE even
    // when both the keep-list and the cluster-safe split consume it.
    val clusters = Dedup.clusterPairs(Dedup.minHashLsh(base))
    val dedupedAll = Dedup
      .keepFromClusters(base, clusters)
      .join(mixed, "doc_id") // inner: quality+lang+mixture AND dedup keep-list
    // `tokenBudgetChars = Some(b)` cuts the FINAL survivor set to a
    // reproducible ~b-char subset ([[Corpus.takeTokenBudget]], straddler
    // kept so the manifest weighs >= b) — applied after dedup so the
    // budget buys surviving training data, not about-to-drop duplicates;
    // the packing layout below then sees only the budgeted docs.
    val deduped = tokenBudgetChars match {
      case None => dedupedAll
      case Some(b) =>
        dedupedAll.join(
          Corpus
            .takeTokenBudget(
              base
                .join(dedupedAll.select("doc_id"), "doc_id")
                .select(col("doc_id"), length(col("text")).cast("long").as("n_chars")),
              b)
            .select("doc_id"),
          "doc_id")
    }
    val split =
      (if (clusterSafeSplits) Corpus.clusterSafeSplitFromClusters(base, clusters)
       else Corpus.splitAssign(base))
        .select(col("doc_id"), col("split"))
    val layout = Corpus.packLayout(
      base.join(deduped.select("doc_id"), "doc_id"),
      ctxTokens)
    deduped
      .join(split, "doc_id")
      .join(layout, "doc_id")
  }

  /** Batch MAINTENANCE of a prepared corpus: run ONE new crawl batch
    * against the frozen snapshot artifacts instead of re-running
    * [[prepare]] over history — the facade face of the incremental
    * machinery. Stages, in order:
    *
    *  1. the same rewrite pre-stages as [[prepare]] (`lineClean`,
    *     paragraph dedup, blocklist);
    *  2. exact dedup: in-batch fingerprint collapse to the min id, then a
    *     left-anti join against `seenFingerprints` — the append-only
    *     fingerprint artifact of previous rounds (never history text);
    *  3. near-dup dedup: in-batch representatives + a probe of the
    *     persisted LSH index at `lshPath`
    *     ([[graft.ops.Dedup.nearDupSurvivors]]) — history is never
    *     re-shingled;
    *  4. OPT-IN exact near-dup dedup (`setJoinPath = Some(p)`): the LSH
    *     survivors additionally probe the persisted set-join prefix index
    *     ([[graft.ops.Dedup.exactDupSurvivors]]) — the lossless filter,
    *     so the facade's near-dup stage upgrades from probabilistic
    *     recall to ZERO FALSE NEGATIVES at the index's Jaccard
    *     threshold (the banding stage stays first: it is cheaper and
    *     shrinks what the exact probe must verify);
    *  5. OPT-IN exact token-edit dedup (`tokenEditPath = Some(p)`): the
    *     survivors additionally probe the persisted signature index
    *     ([[graft.ops.Dedup.tokenEditSurvivors]]) — the re-crawled
    *     one-word-changed page, which Jaccard at 0.8 already catches but
    *     a LOWER set-join threshold would not, gets its own exact
    *     guarantee (every ed≤1 pair, by the pigeonhole theorem);
    *  6. the same quality/language gate, hash-split rule (stable under
    *     corpus growth by construction), and per-batch packing layout as
    *     [[prepare]], so the returned manifest rows are column-compatible
    *     with a full run's.
    *
    * The caller lands the survivors, appends their fingerprints, and
    * grows the indexes ([[graft.ops.Dedup.appendLshIndex]] +
    * [[graft.ops.Dedup.appendSetJoinIndex]] +
    * [[graft.ops.Dedup.appendTokenEditIndex]];
    * [[graft.streaming.CorpusIngest.nearDedupIngest]] automates the LSH
    * loop); [[graft.ops.Dedup.clusterMergeAudit]] and
    * [[graft.ops.Dedup.setJoinDriftAudit]] are the matching rebuild
    * signals. At 100 TB a round costs |batch| scoring + one fingerprint
    * anti-join + one index probe per enabled index.
    */
  def prepareIncremental(
      batch: DataFrame,
      seenFingerprints: DataFrame,
      lshPath: String,
      setJoinPath: Option[String] = None,
      setJoinThresholdMilli: Int = 800,
      tokenEditPath: Option[String] = None): DataFrame = {
    val base0 = cleaned(batch)
    val base =
      if (blocklist.isEmpty) base0 else Corpus.blocklistFilter(base0, blocklist)
    val exactNew = base
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(min("doc_id").as("doc_id"))
      .join(
        seenFingerprints.select(col("fingerprint")).distinct(),
        Seq("fingerprint"),
        "left_anti")
      .select("doc_id")
    val fresh = base.join(exactNew, "doc_id")
    val lshSurvivors = Dedup.nearDupSurvivors(fresh, lshPath)
    val setSurvivors = setJoinPath match {
      case None => lshSurvivors
      case Some(p) => Dedup.exactDupSurvivors(lshSurvivors, p, setJoinThresholdMilli)
    }
    val survivors = tokenEditPath match {
      case None => setSurvivors
      case Some(p) => Dedup.tokenEditSurvivors(setSurvivors, p)
    }
    val gate = filtered(survivors)
    val split = Corpus.splitAssign(survivors).select(col("doc_id"), col("split"))
    val layout = Corpus.packLayout(
      survivors.join(gate.select("doc_id"), "doc_id"),
      ctxTokens)
    gate.join(split, "doc_id").join(layout, "doc_id")
  }

  /** [[prepare]] plus a global training order: best-quality-first with a
    * salted hash shuffle within score ties ([[Corpus.curriculumOrder]]
    * over the surviving manifest's own quality scores, integerized to
    * ten-thousandths) — `curriculum_rank` is the order a data loader
    * streams the manifest in. Same range-shuffle rank machinery as every
    * global ordering in the repo; no single-partition window.
    */
  def curriculum(docs: DataFrame): DataFrame = {
    val manifest = prepare(docs)
    manifest.join(
      Corpus
        .curriculumOrder(
          manifest,
          round(col("quality_score") * 10000, 0).cast("long"))
        .select("doc_id", "curriculum_rank"),
      "doc_id")
  }

  /** The audit face of the run: [[Corpus.datacard]] over exactly the docs
    * [[prepare]] keeps (text as the trainer would see it, i.e. after the
    * rewrite pre-stages) — per-source and ALL-corpus doc/token/char/lang
    * counts, quality distribution, and gate pass-rate. Publish next to
    * the manifest; requires the corpus's `source` and `lang` columns.
    */
  def datacard(docs: DataFrame): DataFrame =
    Corpus.datacard(
      cleaned(docs).join(prepare(docs).select("doc_id"), Seq("doc_id"), "left_semi"))

  /** Embedding-side preparation — the vector twin of [[prepare]], run
    * before any retrieval/dedup index goes live:
    *
    *  1. anisotropy audit ([[graft.ops.Similarity.pcaTopDirection]]);
    *  2. all-but-the-top debias when the top component carries ≥
    *     `debiasAbovePpm` of the variance (the audit acting on itself —
    *     below the threshold the vectors pass through untouched);
    *  3. SemDeDup semantic near-dup prune over the (possibly corrected)
    *     space ([[graft.ops.Dedup.semanticDedup]] keep rule);
    *  4. persisted IVF index built over the survivors at `indexPath`
    *     ([[graft.ops.Similarity.writeIvfIndex]] — the probe-many
    *     artifact every later batch appends to).
    *
    * Returns the surviving vectors annotated with `anisotropy_ppm` and
    * `debiased` so the decision is recorded in the output, not lost in a
    * log line. The audit itself is one dimension-bounded driver collect;
    * every per-vector stage is the documented operator unchanged.
    */
  def prepareVectors(
      embs: DataFrame,
      indexPath: String,
      debiasAbovePpm: Long = 300000L,
      dedupThreshold: Double = 0.99,
      nCentroids: Int = 16,
      dim: Int = 64,
      iters: Int = 12): DataFrame = {
    import graft.ops.Similarity
    // fail fast on a dim mismatch: the PCA family filters to `dim`-wide
    // vectors, so a wrong dim would "audit" an empty set (ppm 0) and
    // confidently index an uncorrected corpus
    require(
      embs.filter(size(col("embedding")) === dim).limit(1).count() == 1,
      s"prepareVectors: corpus has no $dim-dim 'embedding' vectors — wrong dim?")
    val fit = Similarity.fitTopDirection(embs, iters, dim) // ONE covariance pass for audit + debias
    val ppm = fit._2
    val debias = ppm >= debiasAbovePpm
    val vecs =
      if (debias) Similarity.debiasedVectors(embs, iters, dim, fit = Some(fit._1))
      else embs.select(col("vec_id"), col("embedding"))
    val kept = vecs
      .join(
        Dedup
          .semanticDedup(vecs, nCentroids, dedupThreshold)
          .filter(col("kept") === 1L)
          .select("vec_id"),
        Seq("vec_id"),
        "left_semi")
    Similarity.writeIvfIndex(kept, indexPath, nCentroids)
    kept
      .withColumn("anisotropy_ppm", lit(ppm))
      .withColumn("debiased", lit(debias))
  }

  /** Media-side near-dup keep-list — the multimodal face of the dedup
    * stage over an [[graft.ops.Multimodal.asMedia]]-shaped table
    * (`doc_id, kind, n_bytes, media`): per modality the cheap perceptual
    * hash (aHash for image kinds, waveform fingerprint for audio,
    * per-frame aHash aggregated to clip level for video), banded
    * Hamming pairs with hot-bucket caps, connected components, keep the
    * min-id representative. Kinds without a hasher pass through
    * untouched. Returns the surviving media rows with all columns.
    *
    * Scale shape: hashing is one partition-parallel decode pass per
    * modality and the raw bytes never shuffle (hash tables are a few
    * longs per item); pairing is the banded equi-join; the drop is a
    * left-anti join against the (small) cluster labels — the same
    * posture as the text keep-list.
    */
  def mediaKeep(media: DataFrame): DataFrame =
    mediaKeepWithFps(media, Multimodal.mediaFingerprints(media))

  /** [[mediaKeep]] over an ALREADY-computed image/audio fingerprint table
    * ([[graft.ops.Multimodal.mediaFingerprints]] schema) — the decode
    * pass is the dominant per-round cost, so a caller that also probes
    * history ([[mediaKeepIncremental]]) hashes ONCE and reuses the table
    * for both stages. Video still hashes here (clip-level frame hashes
    * are not in the fingerprint table).
    */
  private def mediaKeepWithFps(media: DataFrame, fps: DataFrame): DataFrame = {
    def dropDups(rows: DataFrame, pairs: DataFrame, a: String = "doc_a", b: String = "doc_b") =
      rows.join(
        Dedup
          .clusterPairs(pairs, a, b)
          .filter(col("cluster_id") =!= col("doc_id"))
          .select("doc_id"),
        Seq("doc_id"),
        "left_anti")
    val images = media.filter(col("kind").startsWith("image/"))
    val audio = media.filter(col("kind").startsWith("audio/"))
    val video = media.filter(col("kind").startsWith("video/"))
    val other = media.filter(
      !col("kind").startsWith("image/") && !col("kind").startsWith("audio/") &&
        !col("kind").startsWith("video/"))
    dropDups(images, Dedup.aHashPairs(fps.filter(col("medium") === "image")))
      .unionByName(dropDups(audio, Dedup.aHashPairs(fps.filter(col("medium") === "audio"))))
      .unionByName(
        dropDups(
          video,
          Dedup.clipPairs(Multimodal.frameAHashes(video)),
          a = "clip_a",
          b = "clip_b"))
      .unionByName(other)
  }

  /** Mixed-corpus manifest: [[prepare]]'s per-doc text rows (modality
    * "text") plus one row per surviving media item (modality = its kind)
    * with the SAME deterministic hash-split rule applied to its doc id —
    * a mixed text+image+audio+video corpus flows through ONE facade into
    * one train/val/test-ready manifest. Text-only columns (quality,
    * language, packing) are null on media rows.
    */
  /** [[mediaKeep]] with HISTORY: the batch's in-batch collapse first
    * (every modality, including video), then survivors that near-match a
    * persisted media fingerprint index
    * ([[graft.ops.Multimodal.writeMediaIndex]] / the streaming ingest's
    * store) are dropped too — probe-only, like
    * [[graft.ops.Dedup.nearDupSurvivors]]: growing the index stays the
    * ingest faces' job, so a facade probe can never half-write history.
    * Drops are (doc_id, medium)-keyed; an absent index degrades to the
    * in-batch keep-list. Video and other non-fingerprinted kinds see no
    * history check (the index holds image/audio fingerprints only).
    */
  def mediaKeepIncremental(
      mediaBatch: DataFrame,
      mediaIdxPath: String,
      maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    val spark = mediaBatch.sparkSession
    // hash ONCE: the same fingerprint table feeds the in-batch collapse
    // and the history probe — the decode pass never runs twice
    val fps = Multimodal.mediaFingerprints(mediaBatch).localCheckpoint()
    val kept = mediaKeepWithFps(mediaBatch, fps)
    if (!Multimodal.mediaIndexExists(spark, mediaIdxPath)) return kept
    val keptKeys = kept
      .select(col("doc_id"), Multimodal.mediumOf(col("kind")).as("medium"))
      .distinct()
    val histDrops = Multimodal
      .probeMediaFps(
        spark,
        mediaIdxPath,
        fps.join(keptKeys, Seq("doc_id", "medium"), "left_semi"),
        maxHamming,
        maxBucket)
      .select("doc_id", "medium")
      .distinct()
    kept
      .withColumn("medium", Multimodal.mediumOf(col("kind")))
      .join(histDrops, Seq("doc_id", "medium"), "left_anti")
      .drop("medium")
  }

  /** The mixed-corpus batch-maintenance face: [[prepareIncremental]]'s
    * text manifest (modality "text") plus [[mediaKeepIncremental]]'s
    * surviving media rows under the SAME deterministic hash-split rule —
    * one round of the mixed pipeline against frozen snapshot artifacts
    * (text fingerprint store + LSH index, media fingerprint index),
    * history never re-read as text or re-decoded as bytes.
    */
  def prepareMixedIncremental(
      docsBatch: DataFrame,
      seenFingerprints: DataFrame,
      lshPath: String,
      mediaBatch: DataFrame,
      mediaIdxPath: String): DataFrame =
    mixedManifest(
      prepareIncremental(docsBatch, seenFingerprints, lshPath),
      mediaKeepIncremental(mediaBatch, mediaIdxPath))

  def prepareMixed(docs: DataFrame, media: DataFrame): DataFrame =
    mixedManifest(prepare(docs), mediaKeep(media))

  /** The one mixed-manifest shape both faces emit: text rows tagged
    * modality "text", surviving media rows tagged by kind, with the
    * split assigned on DISTINCT media ids (the same doc id may carry
    * several modalities — its image and its audio — which must all land
    * in the same split without fanning the join out).
    */
  private def mixedManifest(textManifest: DataFrame, keptMedia: DataFrame): DataFrame =
    textManifest
      .withColumn("modality", lit("text"))
      .unionByName(
        keptMedia
          .select(col("doc_id"), col("kind").as("modality"))
          .join(
            Corpus
              .splitAssign(keptMedia.select("doc_id").distinct())
              .select("doc_id", "split"),
            Seq("doc_id")),
        allowMissingColumns = true)

  /** Mixed-corpus audit card: [[datacard]]'s per-source text rows plus
    * one row per media modality in the SAME schema — `source` =
    * `media:<kind>`, `n_docs` the modality's total items, `n_chars` its
    * total bytes, `n_kept` its near-dup survivors ([[mediaKeep]]);
    * token/lang/quality columns are zero (media carries no text stats).
    * Publish one card for the whole mixed corpus.
    */
  def datacardMixed(docs: DataFrame, media: DataFrame): DataFrame = {
    val kept = mediaKeep(media)
      .groupBy("kind")
      .agg(count(lit(1)).cast("long").as("n_kept"))
    val m = media
      .groupBy("kind")
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum("n_bytes").cast("long").as("n_chars"))
      .join(kept, Seq("kind"), "left")
      .select(
        concat(lit("media:"), col("kind")).as("source"),
        col("n_docs"),
        lit(0L).as("n_tokens"),
        col("n_chars"),
        lit(0L).as("n_langs"),
        lit(0L).as("q_tenk_min"),
        lit(0L).as("q_tenk_max"),
        lit(0L).as("q_tenk_avg"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
    datacard(docs).unionByName(m)
  }
}

object Pipeline {

  /** One-pass stage metrics via Spark's `Observation` API: attach named
    * aggregates to a stage's frame and they are collected DURING the next
    * action — no second job, no extra scan of a 100 TB corpus just to
    * count what a filter kept. Usage:
    * `val (df, obs) = Pipeline.observed(stage, "quality")`; run the
    * action; read `obs.get("n_rows")` / `obs.get("n_tokens")`.
    */
  def observed(
      df: DataFrame,
      name: String,
      tokenCol: Option[String] = None): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    val metrics = count(lit(1)).as("n_rows") +:
      tokenCol.toSeq.map(c => sum(col(c)).as("n_tokens"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
