package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-management operators for training-data pipelines: deterministic
  * train/val/test assignment and PII redaction. Both are pure per-row
  * column expressions — no shuffle, no state, embarrassingly parallel at
  * any scale — and both are engine-portable (md5 / strpos / RE2-safe
  * regexes), so the DuckDB oracle mirrors them exactly.
  */
object Corpus {

  /** Deterministic hash split: bucket = first two hex digits of
    * md5(doc_id) in 0..255, assigned train/val/test by fixed cutoffs
    * (default 179/217 ≈ 70/15/15). Hash-based assignment is the
    * standard trick that keeps the split stable under corpus growth and
    * reshuffling — a doc's split never depends on what else is in the
    * corpus, so incremental ingests cannot leak val/test docs into train.
    */
  /** Bucket 0..255 = first md5 byte of the stringified id (hex-digit
    * positions, portable to any engine with md5 + strpos).
    */
  private def md5Bucket(idCol: String): Column = {
    val hexpos = (i: Int) =>
      expr(s"locate(substring(md5(cast($idCol as string)), $i, 1), '0123456789abcdef')") - 1
    (hexpos(1) * 16 + hexpos(2)).cast("long")
  }

  def splitAssign(
      docs: DataFrame,
      idCol: String = "doc_id",
      trainCut: Int = 179,
      valCut: Int = 217): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"))
      .withColumn("bucket", md5Bucket("doc_id"))
      .withColumn(
        "split",
        when(col("bucket") < trainCut, "train")
          .when(col("bucket") < valCut, "val")
          .otherwise("test"))

  /** Cluster-safe split: [[splitAssign]]'s hash rule applied to the
    * near-dup CLUSTER representative instead of the raw doc id, so an
    * entire connected component of near-duplicates lands in one split.
    * Plain per-doc hash splitting sprays a dup cluster across
    * train/val/test — the classic self-contamination bug where the eval
    * set contains near-copies of training docs by construction. `pairs`
    * is any near-dup pair report (minhash LSH, simhash, chunk overlap);
    * docs in no pair are their own singleton cluster, so their
    * assignment is IDENTICAL to [[splitAssign]]'s — adopting cluster-safe
    * splitting re-assigns only clustered docs.
    *
    * Scale shape: the CC label table covers only docs that appear in a
    * pair — a small fraction of a deduplicated corpus — so the left join
    * back is broadcastable (AQE picks that up from the label table's
    * runtime size); everything else is the same shuffle-free projection
    * as [[splitAssign]].
    */
  def clusterSafeSplit(
      docs: DataFrame,
      pairs: DataFrame,
      trainCut: Int = 179,
      valCut: Int = 217,
      idCol: String = "doc_id"): DataFrame =
    clusterSafeSplitFromClusters(docs, Dedup.clusterPairs(pairs), trainCut, valCut, idCol)

  /** [[clusterSafeSplit]] over precomputed [[graft.ops.Dedup.clusterPairs]]
    * labels — the form [[graft.api.Pipeline]] uses so the iterative CC job
    * runs once for both the dedup keep-list and the split.
    */
  def clusterSafeSplitFromClusters(
      docs: DataFrame,
      clusters: DataFrame,
      trainCut: Int = 179,
      valCut: Int = 217,
      idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("bucket", md5Bucket("rep"))
      .withColumn(
        "split",
        when(col("bucket") < trainCut, "train")
          .when(col("bucket") < valCut, "val")
          .otherwise("test"))
      .select("doc_id", "rep", "bucket", "split")

  /** Eval-leakage audit: near-duplicate pairs that STRADDLE the
    * [[splitAssign]] boundary — a val/test doc whose near-copy sits in
    * train. This is the report that quantifies the damage
    * [[clusterSafeSplit]] prevents, and the audit to run when the split
    * rule is already frozen (published benchmark, historical split) so
    * re-assignment is off the table and the leaked docs must be dropped
    * instead. One row per (eval doc, train doc) near-dup pair with the
    * verified Jaccard and the eval side's split label.
    *
    * Scale shape: delegates to [[Dedup.crossMinHashLsh]] with train as
    * the (big) corpus side — banded equi-join with the hot-bucket cap,
    * never all-pairs; the split filters are shuffle-free projections of
    * the corpus scan.
    */
  def splitLeakage(
      docs: DataFrame,
      trainCut: Int = 179,
      valCut: Int = 217,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val d = docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
    val sp = splitAssign(d, trainCut = trainCut, valCut = valCut).select("doc_id", "split")
    val dd = d.join(sp, "doc_id")
    Dedup
      .crossMinHashLsh(
        dd.filter(col("split") =!= "train").select("doc_id", "text"),
        dd.filter(col("split") === "train").select("doc_id", "text"))
      .select(col("probe_id").as("eval_doc"), col("corpus_id").as("train_doc"), col("jaccard"))
      .join(sp.select(col("doc_id").as("eval_doc"), col("split")), "eval_doc")
      .select("eval_doc", "split", "train_doc", "jaccard")
  }

  /** Token-balanced shard assignment for training/inference fan-out:
    * shards balanced by TOTAL TOKENS, not document count — the metric
    * that actually bounds a worker's wall-clock when doc lengths are
    * heavy-tailed (a doc-count-balanced shard with the corpus's longest
    * docs finishes last; everyone waits). Docs are ranked globally by
    * (n_tokens desc, id asc) and dealt to shards in SNAKE order: rank r
    * lands at position (r-1) mod S of round (r-1) div S, with odd
    * rounds dealt in reverse — so each round's heaviest docs go to the
    * shards the previous round loaded lightest, and shard totals stay
    * within one round's token spread of each other (deterministically;
    * greedy least-loaded would track running totals, which serializes).
    *
    * Scale shape: the rank comes from [[Relational.globalRank]] — range
    * partition + per-partition offsets, never a single-partition window
    * — and the snake arithmetic is a row-local projection on top.
    */
  def balancedShards(
      docs: DataFrame,
      nShards: Int = 8,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val t = docs.select(
      col(idCol).cast("long").as("doc_id"),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"))
    Relational
      .globalRank(t, Seq(col("n_tokens").desc, col("doc_id").asc), "rank")
      .withColumn("__r0", col("rank") - 1L)
      .withColumn(
        "shard",
        when(
          pmod(expr(s"__r0 div $nShards"), lit(2L)) === 0L,
          pmod(col("__r0"), lit(nShards.toLong)))
          .otherwise(lit(nShards - 1L) - pmod(col("__r0"), lit(nShards.toLong)))
          .cast("long"))
      .select("doc_id", "n_tokens", "rank", "shard")
  }

  /** Stratified downsampling: per-language keep-rates expressed as bucket
    * cutoffs out of 256 (e.g. "en" -> 128 keeps ~half the English docs,
    * everything else default 256 = keep all). Rebalancing a web-scale
    * corpus away from its dominant language is the canonical use. Same
    * hash-bucket construction as [[splitAssign]], so sampling is
    * deterministic, stratum-stable under corpus growth, and composes with
    * the split (a doc's bucket is the same in both).
    */
  def sampleStratified(
      docs: DataFrame,
      cutoffs: Map[String, Int] = Map("en" -> 128),
      defaultCutoff: Int = 256,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val lang = TextAnalysis
      .langId(docs, textCol, idCol)
      .select(col(idCol).cast("long").as("doc_id"), col("lang_pred"))
    val cutoff = cutoffs.foldLeft(lit(defaultCutoff): Column) {
      case (acc, (l, c)) => when(col("lang_pred") === l, lit(c)).otherwise(acc)
    }
    lang
      .withColumn("bucket", md5Bucket("doc_id"))
      .filter(col("bucket") < cutoff)
      .select("doc_id", "lang_pred", "bucket")
  }

  /** Systematic probability-proportional-to-size (PPS) sampling: walk the
    * corpus in a deterministic hash order and select one document per
    * `step` units of cumulative weight — a document of weight `w` is
    * selected iff a multiple of `step` lands in its cumulative-weight
    * interval `(cum - w, cum]`, so selection probability is ~`w/step`
    * (documents with `w >= step` are always selected, exactly once).
    * Sampling proportional to token/char count is how mixture weights are
    * realized over heterogeneous-length corpora: per-DOCUMENT uniform
    * sampling over-represents short docs in token space.
    *
    * All arithmetic is integer (weights clamp to >= 0; zero-weight docs
    * have an empty interval and are never selected), and the walk order is
    * (md5(id), id) — decorrelated from ingest order, a total order, and
    * the same hash family as [[splitAssign]] — so the sample is
    * reproducible and hash-stable across engines. `phase` in [0, step)
    * shifts the selection grid: disjoint phases give (near-)disjoint
    * samples from one pass.
    *
    * Scale shape: the cumulative weight comes from
    * [[Relational.globalCumSum]] (range shuffle + driver prefix offsets —
    * never a single-partition window); the selection test is a stateless
    * per-row filter on top. One exchange total.
    */
  def samplePps(
      docs: DataFrame,
      step: Long,
      phase: Long = 0,
      weightCol: String = "n_chars",
      idCol: String = "doc_id"): DataFrame = {
    require(step > 0, s"step must be positive, got $step")
    require(phase >= 0 && phase < step, s"phase must be in [0, step), got $phase")
    val base = docs.select(
      col(idCol).cast("long").as("doc_id"),
      greatest(coalesce(col(weightCol).cast("long"), lit(0L)), lit(0L)).as("weight"),
      md5(col(idCol).cast("string")).as("__h"))
    Relational
      .globalCumSum(base, Seq(col("__h"), col("doc_id")), "weight", "cum")
      .filter(
        expr(s"(cum + $phase) div $step") > expr(s"(cum - weight + $phase) div $step"))
      .select("doc_id", "weight", "cum")
  }

  /** Deterministic token-budget cut: walk the corpus in the same
    * (md5(id), id) hash order as [[samplePps]] and keep documents until
    * the cumulative weight reaches `budget` — "give me a reproducible
    * N-token subset" without a random sample's size variance. The
    * boundary document (the one whose interval straddles the budget) is
    * KEPT, so the subset weighs at least `budget` (standard cut
    * semantics: budgets bound from below, truncating the straddler would
    * under-deliver). Growing the corpus only re-shuffles the hash order,
    * so re-cuts stay representative; disjoint budgets do NOT give
    * disjoint subsets (use [[samplePps]] phases for that).
    *
    * Scale shape: identical to [[samplePps]] — one range exchange via
    * [[Relational.globalCumSum]], then a stateless filter.
    */
  def takeTokenBudget(
      docs: DataFrame,
      budget: Long,
      weightCol: String = "n_chars",
      idCol: String = "doc_id"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val base = docs.select(
      col(idCol).cast("long").as("doc_id"),
      greatest(coalesce(col(weightCol).cast("long"), lit(0L)), lit(0L)).as("weight"),
      md5(col(idCol).cast("string")).as("__h"))
    Relational
      .globalCumSum(base, Seq(col("__h"), col("doc_id")), "weight", "cum")
      .filter(col("cum") - col("weight") < budget)
      .select("doc_id", "weight", "cum")
  }

  /** Quality gate with a per-source adaptive threshold: keep documents
    * whose integerized quality score (score x 10000, rounded) is at or
    * above their source's p`pct` quantile of the same score. Absolute
    * thresholds decay as the corpus mix shifts; a per-source quantile gate
    * makes each source compete only with itself — the standard fix when
    * one crawl's "good" is another's median.
    *
    * Scale shape: the score is a stateless per-row projection;
    * [[Stats.quantilesByGroup]] compacts it to a (source, score) histogram
    * (score domain is 0..10000, so the histogram is tiny regardless of
    * corpus size) in the only full-data shuffle; the thresholds table
    * (|sources| rows) broadcast-joins back, so the gate itself is
    * map-side. The score projection IS evaluated twice (quantile pass +
    * gate pass) — deliberate: recomputing a stateless expression beats
    * materializing a corpus-sized intermediate; swap in `.persist()` only
    * when executor memory at the target scale allows it.
    */
  def qualityGate(
      docs: DataFrame,
      pct: Int = 50,
      textCol: String = "text",
      idCol: String = "doc_id",
      srcCol: String = "source"): DataFrame = {
    val scored = docs.select(
      col(idCol).cast("long").as("doc_id"),
      col(srcCol).as("source"),
      round(TextAnalysis.qualityScore(col(textCol)) * 10000, 0).cast("long").as("q_i"))
    val th = Stats
      .quantilesByGroup(scored, "source", "q_i", Seq(pct))
      .select(col("source"), col(s"p$pct").as("q_threshold"))
    scored
      .join(broadcast(th), Seq("source"))
      .filter(col("q_i") >= col("q_threshold"))
      .select("doc_id", "source", "q_i", "q_threshold")
  }

  /** Fluency gate — the CCNet perplexity-filter shape with the
    * oracle-stable [[TextAnalysis.bigramRarity]] score standing in for
    * the KenLM model: keep documents whose per-bigram LM score
    * (`lm_milli`, low = fluent, high = incoherent token salad) is at or
    * below their source's p`pct` quantile of the same score. Per-source
    * relative thresholds are the CCNet insight: an absolute perplexity
    * cut tuned on one crawl guts another whose register differs —
    * each source competes only with itself (same stance as
    * [[qualityGate]]). Docs with fewer than 2 tokens have no bigrams,
    * no score, and are dropped (ungateable, matching the scorer).
    *
    * Caveat inherited from unsmoothed MLE: a bigram whose prefix occurs
    * NOWHERE else scores c1/c2 = 1 ("perfectly predictable"), so salad
    * made of globally-unique tokens passes — the score punishes rare
    * continuations of COMMON prefixes, not never-seen vocabulary. Pair
    * with [[TextAnalysis.qualityScore]]/langId gates (which catch
    * unknown-vocabulary spam) rather than relying on this gate alone.
    *
    * Scale shape: the score pass is [[TextAnalysis.bigramRarity]]'s
    * three uniform shuffles; the threshold table is |sources| rows from
    * the exact-quantile histogram machinery and broadcast-joins back —
    * the two-pass compact-then-filter discipline of the other gates.
    */
  def fluencyGate(
      docs: DataFrame,
      pct: Int = 75,
      textCol: String = "text",
      idCol: String = "doc_id",
      srcCol: String = "source"): DataFrame = {
    // Materialized: `scored` (the LM-chain tail — two model aggregations
    // + the tf⋈c2⋈c1 join — plus the source join) feeds BOTH the quantile
    // pass and the gate join below; without the checkpoint the whole
    // chain executes twice (the winnowReusePairs/curriculumOrder
    // two-consumers discipline).
    val scored = TextAnalysis
      .bigramRarity(docs, textCol, idCol)
      .join(
        docs.select(col(idCol).cast("long").as("doc_id"), col(srcCol).as("source")),
        "doc_id")
      .localCheckpoint()
    val th = Stats
      .quantilesByGroup(scored, "source", "lm_milli", Seq(pct))
      .select(col("source"), col(s"p$pct").as("lm_threshold"))
    scored
      .join(broadcast(th), Seq("source"))
      .filter(col("lm_milli") <= col("lm_threshold"))
      .select("doc_id", "source", "lm_milli", "lm_threshold")
  }

  /** Blocklist hit report: which documents contain which blocked terms
    * (single tokens or multi-token phrases, matched on token boundaries
    * after the standard lowercase/whitespace normalization). The scale
    * move is the INVERTED formulation: naive `contains(text, term)`
    * scans every document once per term — O(|dict| · corpus bytes) and
    * unindexable — while exploding each doc into n-grams of exactly the
    * phrase lengths present in the dictionary turns matching into a
    * broadcast hash semi-join: one narrow pass per distinct phrase
    * length, terms on the build side, no shuffle of the corpus at all.
    * Token-aligned semantics (not substring: "scan" does not hit
    * "scanner") — the right contract for safety/topic word lists.
    *
    * Returns (doc_id, term, n_hits), one row per doc × matched term.
    */
  def blocklistHits(
      docs: DataFrame,
      terms: Seq[String],
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // distinct AFTER normalization: "Scan" and "scan" are the same term,
    // and a duplicated dictionary entry must not double n_hits.
    // Locale.ROOT matches Spark's locale-insensitive lower() — the default
    // locale would break terms containing 'I' under tr-TR (dotless ı).
    val norm = terms
      .map(_.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
      .distinct
    require(norm.nonEmpty, "blocklist must contain at least one non-empty term")
    val byLen = norm.groupBy(_.length)
    val tk = docs.select(
      col(idCol).cast("long").as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("__tk"))
    val hitsByLen = byLen.toSeq.sortBy(_._1).map { case (len, ts) =>
      val grams =
        if (len == 1) col("__tk")
        else
          when(
            size(col("__tk")) >= len,
            transform(
              sequence(lit(1), size(col("__tk")) - (len - 1)),
              i => concat_ws(" ", slice(col("__tk"), i, lit(len)))))
            .otherwise(array().cast("array<string>"))
      tk.select(col("doc_id"), explode(grams).as("gram"))
        .join(broadcast(ts.map(_.mkString(" ")).toDF("term")), col("gram") === col("term"))
        .groupBy("doc_id", "term")
        .agg(count(lit(1)).cast("long").as("n_hits"))
    }
    hitsByLen.reduce(_.unionAll(_))
  }

  /** The corpus with every blocklisted document removed: one left-anti
    * join against the (hit-doc-sized) distinct id set from
    * [[blocklistHits]] — the same drop-list shape as
    * `Dedup.keepRepresentatives`.
    */
  def blocklistFilter(
      docs: DataFrame,
      terms: Seq[String],
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.join(
      blocklistHits(docs, terms, textCol, idCol)
        .select(col("doc_id").as(idCol))
        .distinct(),
      Seq(idCol),
      "left_anti")

  /** Token-budget mixture sampling: split `budgetTokens` equally across
    * sources, turn each source's share into a keep rate out of 256
    * (`min(256, share * 256 div sourceTokens)`), and keep a doc iff its
    * md5 bucket falls under its source's rate — the "rebalance the mixture
    * to a token budget" step of assembling a training run from
    * heterogeneous crawls. Hash-based keeps are deterministic and
    * stratum-stable: a doc's fate never depends on what else arrived, so
    * re-runs and incremental ingests agree.
    *
    * Scale shape: per-source token totals are one agg shuffle of
    * |sources| keys, collected to the driver (the mixture table IS
    * driver-sized) so the rate arithmetic never re-evaluates the
    * tokenization lineage — rates rejoin as a broadcast literal and the
    * keep filter is map-side. The corpus is tokenized exactly twice
    * (totals pass + keep pass) and never shuffled.
    */
  def mixtureSample(
      docs: DataFrame,
      budgetTokens: Long,
      textCol: String = "text",
      idCol: String = "doc_id",
      srcCol: String = "source"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counted = docs.select(
      col(idCol).cast("long").as("doc_id"),
      col(srcCol).as("source"),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"))
    val totals = counted
      .groupBy("source")
      .agg(sum("n_tokens").as("t_src"))
      .collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("t_src"))
    val share = budgetTokens / totals.length
    val rates = totals.toSeq
      .map { case (s, t) => (s, math.min(256L, share * 256 / t)) }
      .toDF("source", "rate_256")
    counted
      .withColumn("bucket", md5Bucket("doc_id"))
      .join(broadcast(rates), Seq("source"))
      .filter(col("bucket") < col("rate_256"))
      .select("doc_id", "source", "n_tokens", "bucket", "rate_256")
  }

  /** Temperature-rebalanced mixture sampling (α = 0.5, the standard
    * multilingual "sqrt temperature"): like [[mixtureSample]] but the
    * token budget splits across sources proportionally to √tokens instead
    * of equally — big crawls are damped, small sources up-weighted, the
    * compromise between natural proportions (α=1, big sources drown the
    * tail) and uniform (α=0, tiny sources oversample to noise).
    *
    * Determinism discipline: the per-source weight is `floor(sqrt(t))` —
    * IEEE sqrt is correctly rounded, so floor(sqrt) of an exact-in-double
    * integer is bit-identical in every engine — and everything after it
    * (weight sum, share, rate) is integer arithmetic, so no
    * summation-order hazard. Same scale shape as [[mixtureSample]]:
    * driver-sized totals, broadcast rates, map-side keep filter.
    */
  def mixtureSampleSqrt(
      docs: DataFrame,
      budgetTokens: Long,
      textCol: String = "text",
      idCol: String = "doc_id",
      srcCol: String = "source"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counted = docs.select(
      col(idCol).cast("long").as("doc_id"),
      col(srcCol).as("source"),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"))
    val totals = counted
      .groupBy("source")
      .agg(sum("n_tokens").as("t_src"))
      .collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("t_src"))
    val weights = totals.map { case (s, t) =>
      (s, t, math.floor(math.sqrt(t.toDouble)).toLong)
    }
    val wSum = math.max(weights.map(_._3).sum, 1L)
    // BigInt for the budget*weight product: budget and weight are each
    // driver-scale longs whose product can pass Long.MaxValue
    val rates = weights.toSeq
      .map { case (s, t, w) =>
        val share = (BigInt(budgetTokens) * BigInt(w) / BigInt(wSum)).toLong
        (s, math.min(256L, share * 256 / math.max(t, 1L)))
      }
      .toDF("source", "rate_256")
    counted
      .withColumn("bucket", md5Bucket("doc_id"))
      .join(broadcast(rates), Seq("source"))
      .filter(col("bucket") < col("rate_256"))
      .select("doc_id", "source", "n_tokens", "bucket", "rate_256")
  }

  /** Exact per-group quota sample: `n` documents from every group (source),
    * chosen deterministically by hash order — the "cap every crawl at N
    * docs" curation step, where rate-based sampling ([[sampleStratified]],
    * [[mixtureSample]]) can't promise an exact count.
    *
    * Selection rule: order each group by (md5 bucket, md5("samp:"+id), id)
    * and take the first `n`. Naively that is a per-group global sort — a
    * skew bomb when one source dominates the corpus. Instead: (1) one agg
    * shuffle builds the (group, bucket) histogram — ≤ 256·|groups| rows,
    * collected driver-side like [[mixtureSample]]'s totals; (2) the driver
    * turns it into per-group cutoffs (every doc in a bucket below the
    * cutoff is taken outright; the boundary bucket owes the remainder);
    * (3) the only window runs over boundary-bucket rows — ~1/256 of the
    * largest group, not the group itself. Result is identical to the naive
    * per-group ROW_NUMBER (which is what the oracle runs).
    */
  def sampleQuota(
      docs: DataFrame,
      n: Int = 25,
      groupCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    require(n > 0, s"quota must be positive (got $n)")
    val spark = docs.sparkSession
    import spark.implicits._
    val withB = docs.select(
      col(idCol).cast("long").as("doc_id"),
      col(groupCol).as("grp"),
      md5Bucket("doc_id").as("bucket"))
    val hist = withB
      .groupBy("grp", "bucket")
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("bucket"), r.getAs[Long]("c")))
    val cutoffs = hist
      .groupBy(_._1)
      .map { case (g, rows) =>
        val byBucket = rows.sortBy(_._2)
        var cum = 0L
        var cut = 256L
        var owed = 0L
        byBucket.foreach { case (_, b, c) =>
          if (cum < n) {
            if (cum + c >= n) { cut = b; owed = n - cum }
            cum += c
          }
        }
        // fewer than n docs in the group: keep everything (cut stays 256)
        (g, cut, owed)
      }
      .toSeq
      .toDF("grp", "cut_bucket", "owed")
    val joined = withB.join(broadcast(cutoffs), Seq("grp"))
    val below = joined.filter(col("bucket") < col("cut_bucket"))
    val boundary = joined
      .filter(col("bucket") === col("cut_bucket"))
      .withColumn(
        "r",
        row_number().over(
          Window
            .partitionBy("grp")
            .orderBy(md5(concat(lit("samp:"), col("doc_id").cast("string"))), col("doc_id"))))
      .filter(col("r") <= col("owed"))
      .drop("r")
    below
      .unionAll(boundary)
      .select(col("doc_id"), col("grp").as(groupCol), col("bucket"))
  }

  /** ASCII-safe PII patterns (identical semantics under Java regex and
    * DuckDB's RE2: no backrefs, no lookaround, \b and \d are ASCII).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** Redacted text: emails, then IPv4s, then phone-like digit runs, each
    * replaced with a typed token. Chained in a fixed order so the result
    * is deterministic (and oracle-mirrorable) even where patterns abut.
    */
  def redacted(text: Column): Column =
    regexp_replace(
      regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), Ipv4Re, "<IP>"),
      PhoneRe,
      "<PHONE>")

  /** Deterministic global training order: every doc's position in a
    * reproducible pseudo-random permutation of the corpus (rank over a
    * salted md5 of the id). Data-order shuffling is a training-quality
    * requirement (curriculum accidents from crawl order are real), and
    * hash-rank shuffling makes the epoch order reproducible across runs
    * and cluster sizes. The rank is the engine's distributed exact rank
    * ([[graft.ops.Relational.globalRank]]: range shuffle + partition
    * offsets) — never a single-partition window.
    */
  def shuffleOrder(docs: DataFrame, idCol: String = "doc_id", salt: String = "shuf"): DataFrame =
    Relational
      .globalRank(
        docs.select(
          col(idCol).cast("long").as("doc_id"),
          md5(concat(lit(s"$salt:"), col(idCol).cast("string"))).as("__key")),
        Seq(col("__key"), col("doc_id")),
        rankCol = "shuffle_pos")
      .select(col("doc_id"), col("shuffle_pos"))

  /** Deterministic negative sampling for contrastive pairs: every
    * (query, positive) row gets `k` pseudo-random negatives drawn
    * uniformly from the candidate corpus — the in-batch-negatives
    * alternative a contrastive-embedding pipeline needs when batches
    * are assembled distributed. Fully reproducible across runs and
    * cluster sizes (the [[shuffleOrder]] promise): candidates take a
    * salted-md5 ring position via [[graft.ops.Relational.globalRank]]
    * (range shuffle + offsets, never a single-partition window), and
    * probe j of query q lands at `fold8(md5(salt:p:q:j)) mod n` — an
    * 8-hex-digit integer fold, so the draw is uniform to a mod bias of
    * n/2³² (extend the fold before sampling corpora past ~10⁸ docs).
    * A draw that hits the row's own positive (or the query id itself)
    * is DROPPED, not redrawn — k is a target, short rows signal the
    * collision honestly (expected loss ≤ 2k/n pairs; redraw chains
    * would make each row's sample depend on corpus size). Output:
    * `(query_id, pos_id, j, neg_id)`.
    *
    * Scale shape: one distinct + globalRank over the candidate ids, a
    * bounded 1-row count (the modulus itself), then ONE equi-join of
    * |pairs|·k probe rows against the ranked ring — no windows over
    * data grain, no per-query corpus pass.
    */
  def negativeSample(
      pairs: DataFrame,
      corpus: DataFrame,
      k: Int = 4,
      queryCol: String = "query_id",
      posCol: String = "pos_id",
      idCol: String = "doc_id",
      salt: String = "neg"): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    val ranked = Relational
      .globalRank(
        corpus.select(col(idCol).cast("long").as("__nid")).distinct()
          .withColumn("__key", md5(concat(lit(s"$salt:c:"), col("__nid").cast("string")))),
        Seq(col("__key"), col("__nid")),
        rankCol = "__pos")
      .select(col("__nid"), (col("__pos") - 1).cast("long").as("__idx"))
      .localCheckpoint() // consumers: the modulus count and the probe join
    val n = ranked.count()
    require(n > 0, "negativeSample: candidate corpus is empty")
    val digits = Relational.md5Fold8Sql("__h")
    pairs
      .select(col(queryCol).cast("long").as("query_id"), col(posCol).cast("long").as("pos_id"))
      .withColumn("j", explode(array((1 to k).map(j => lit(j.toLong)): _*)))
      .withColumn(
        "__h",
        md5(concat(
          lit(s"$salt:p:"), col("query_id").cast("string"), lit(":"), col("j").cast("string"))))
      .withColumn("__idx", expr(s"CAST($digits AS BIGINT) % ${n}L"))
      .join(ranked, Seq("__idx"))
      .filter(col("__nid") =!= col("pos_id") && col("__nid") =!= col("query_id"))
      .select(col("query_id"), col("pos_id"), col("j"), col("__nid").as("neg_id"))
  }

  /** Corpus snapshot diff — the change-data-capture audit between two
    * corpus versions: every doc id present in either snapshot is classified
    * `added` (new id), `removed` (gone), `changed` (same id, different
    * content fingerprint), or `unchanged`. This is what an incremental
    * re-crawl reports before committing, and the complement of
    * [[graft.ops.Dedup.incrementalNew]] (which dedups by CONTENT across
    * ids; this diffs by ID across versions).
    *
    * Scale shape: each side collapses to (id, fingerprint) — a narrow
    * projection that prunes the text column at the scan — and the single
    * shuffle is a full-outer equi-join on uniformly distributed ids. No
    * text moves through the join.
    */
  def snapshotDiff(
      prev: DataFrame,
      cur: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val a = prev.select(
      col(idCol).cast("long").as("doc_id"),
      TextAnalysis.fingerprint(col(textCol)).as("fp_prev"))
    val b = cur.select(
      col(idCol).cast("long").as("doc_id"),
      TextAnalysis.fingerprint(col(textCol)).as("fp_cur"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(
        col("doc_id"),
        when(col("fp_prev").isNull, "added")
          .when(col("fp_cur").isNull, "removed")
          .when(col("fp_prev") === col("fp_cur"), "unchanged")
          .otherwise("changed")
          .as("status"))
  }

  /** Token-distribution drift between two corpus snapshots — the
    * distribution-shift monitor a continuously-ingesting training
    * pipeline watches ([[snapshotDiff]] answers "which docs changed";
    * this answers "did the LANGUAGE change": crawl pollution, a new spam
    * template, a scraper regression all show up as drifted tokens long
    * before eval metrics move).
    *
    * Per token above `minCount` (in either snapshot): frequency in parts
    * per million of each snapshot and the ratio `drift_milli =
    * (cur_ppm * 1000) div prev_ppm` — all integer, so hash-stable.
    * Tokens absent from one side report status 'new'/'gone' with
    * drift_milli = -1 (also used when prev_ppm rounds to 0); 'shifted'
    * rows are kept only when the ratio leaves the OPEN band (500, 2000) —
    * the boundary values 500 and 2000 themselves are reported (filter
    * keeps `<= 500` and `>= 2000`) — so the report is the exceptional
    * tail, not the vocabulary.
    *
    * Scale shape: one explode + hash agg per snapshot (uniform token
    * keys, map-side partials absorb hot tokens), each tf table
    * materialized once (it feeds its total and the join); totals are two
    * driver-sized scalars riding in as literals; the full-outer join is
    * equi-keyed on the token. Nothing pairwise, nothing floating-point.
    */
  def tokenDrift(
      prev: DataFrame,
      cur: DataFrame,
      minCount: Long = 5,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    def tf(df: DataFrame) = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).cast("long").as("tf"))
      .localCheckpoint()
    val p = tf(prev)
    val c = tf(cur)
    // max(total, 1): an empty/zero-token snapshot yields a NULL sum (and a
    // 0 divisor would null every ppm) — clamp so it reports all-new/gone
    def total(df: DataFrame): Long =
      math.max(df.agg(coalesce(sum("tf"), lit(0L))).first().getLong(0), 1L)
    val pTot = total(p)
    val cTot = total(c)
    p.withColumnRenamed("tf", "prev_tf")
      .join(c.withColumnRenamed("tf", "cur_tf"), Seq("token"), "full_outer")
      .select(
        col("token"),
        coalesce(col("prev_tf"), lit(0L)).as("prev_tf"),
        coalesce(col("cur_tf"), lit(0L)).as("cur_tf"))
      .filter(greatest(col("prev_tf"), col("cur_tf")) >= minCount)
      .withColumn("prev_ppm", expr(s"(prev_tf * 1000000) div $pTot"))
      .withColumn("cur_ppm", expr(s"(cur_tf * 1000000) div $cTot"))
      .withColumn(
        "status",
        when(col("prev_tf") === 0, "new")
          .when(col("cur_tf") === 0, "gone")
          .otherwise("shifted"))
      .withColumn(
        "drift_milli",
        when(col("status") === "shifted" && col("prev_ppm") >= 1, expr("(cur_ppm * 1000) div prev_ppm"))
          .otherwise(lit(-1L))
          .cast("long"))
      .filter(
        col("status") =!= "shifted" ||
          col("drift_milli") === -1 ||
          col("drift_milli") >= 2000 || col("drift_milli") <= 500)
  }

  /** Deterministic curriculum ordering: rank the corpus best-score-first
    * for staged training, with a salted-md5 shuffle WITHIN equal scores so
    * same-difficulty docs don't train in ingest order (the curriculum
    * cousin of [[shuffleOrder]]; re-ranking with a new salt reshuffles
    * ties without moving the difficulty progression). `score` must be a
    * deterministic integer expression — e.g. the integerized quality
    * score — for the order to be reproducible and oracle-hashable.
    *
    * Ranking rides [[graft.ops.Relational.globalRank]]: one range
    * exchange + per-partition offsets, never a single-partition
    * row_number window. The scored projection is materialized first —
    * the range partitioner's sampling pass plus the sort would otherwise
    * each re-evaluate the score expression's lineage (typically the
    * tokenize-and-filter quality HOFs, the expensive part).
    */
  def curriculumOrder(
      docs: DataFrame,
      score: Column,
      salt: String = "curr",
      idCol: String = "doc_id"): DataFrame =
    Relational.globalRank(
      docs.select(col(idCol), score.cast("long").as("score_i")).localCheckpoint(),
      Seq(
        col("score_i").desc,
        md5(concat(col(idCol).cast("string"), lit(salt))).asc,
        col(idCol).asc),
      rankCol = "curriculum_rank")

  /** Per-source language-mixture audit: document counts and integer
    * parts-per-million shares per (source, predicted language) — the
    * crawl-health dashboard row that catches a scraper regression or a
    * mislabeled source long before eval metrics move (the language-axis
    * sibling of [[tokenDrift]]'s vocabulary axis).
    *
    * Scale shape: [[graft.ops.TextAnalysis.langId]] scores are per-row
    * column expressions (the source column rides through, no join back);
    * the count is one hash aggregation over |sources|·|langs| keys with
    * map-side partials; the per-source totals table is |sources| rows and
    * broadcasts into the share join. Integer ppm (`n * 1000000 div
    * total`) keeps the report hash-stable.
    */
  def langMixture(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      srcCol: String = "source"): DataFrame = {
    val counts = TextAnalysis
      .langId(docs, textCol, idCol, keepCols = Seq(srcCol))
      .groupBy(col(srcCol), col("lang_pred"))
      .agg(count(lit(1)).cast("long").as("n_docs"))
    val totals = counts.groupBy(col(srcCol)).agg(sum("n_docs").cast("long").as("__tot"))
    counts
      .join(broadcast(totals), Seq(srcCol))
      .select(
        col(srcCol),
        col("lang_pred"),
        col("n_docs"),
        expr("n_docs * 1000000 div __tot").cast("long").as("share_ppm"))
  }

  /** Sequence-length bucket audit: assign every document to the smallest
    * power-of-two-ish context bucket that fits it (docs beyond the largest
    * bucket truncate into it) and report per-bucket document counts, real
    * vs padded token totals, and the padding-waste fraction — the number a
    * training pipeline watches when deciding between length-bucketed
    * batching and sequence packing ([[packGreedy]]).
    *
    * One narrow projection + one hash aggregation over |buckets| keys
    * (partial aggregation collapses everything map-side); the token count
    * is projected to a named column before the bucket CASE references it,
    * per the repo's interpreted-HOF recompute rule.
    */
  def lengthBuckets(
      docs: DataFrame,
      buckets: Seq[Int] = Seq(16, 32, 64, 128, 256, 512),
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(buckets.nonEmpty && buckets == buckets.sorted, "buckets must be ascending")
    val toks = docs.select(
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"))
    val bucketExpr = buckets.init.foldRight(lit(buckets.last.toLong): Column) { (b, acc) =>
      when(col("n_tokens") <= b, lit(b.toLong)).otherwise(acc)
    }
    toks
      .select(col("n_tokens"), bucketExpr.as("bucket"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(least(col("n_tokens"), col("bucket"))).cast("long").as("sum_tokens"))
      .select(
        col("bucket"),
        col("n_docs"),
        col("sum_tokens"),
        (col("bucket") * col("n_docs")).cast("long").as("padded_tokens"),
        round(
          lit(1.0) - col("sum_tokens").cast("double") / (col("bucket") * col("n_docs")),
          4).as("waste_frac"))
  }

  /** Train/test n-gram contamination audit — the standard "is my benchmark
    * leaking into the training set" check (PaLM/GPT-3 style, word-n-gram
    * overlap). For every TEST doc: how many of its distinct word n-grams
    * also occur anywhere in the TRAIN split.
    *
    * Execution shape: tokenize -> explode n-grams -> DISTINCT (doc, gram,
    * split) -> the distinct TRAIN gram set left-joins onto the test grams
    * -> per-doc aggregate. The train-side mark is an aggregate + join, NOT
    * `max() OVER (PARTITION BY gram)`: a boilerplate 5-gram shared by
    * millions of train docs is exactly the key a per-gram window would
    * co-locate on one reducer, while the distinct-aggregate absorbs it in
    * map-side partials and the gram-keyed join is AQE-skew-splittable.
    * Docs shorter than n tokens produce no grams and drop out (mirrored
    * in the oracle).
    *
    * The token array is projected to a named column before the n-gram
    * lambda (see [[TextAnalysis.ngrams]]'s interpreted-HOF caveat).
    */
  def contaminationNgrams(
      docs: DataFrame,
      n: Int = 5,
      textCol: String = "text",
      idCol: String = "doc_id",
      trainCut: Int = 179,
      valCut: Int = 217): DataFrame = {
    // split is a pure hash expression on the id — computed inline, NOT via a
    // join back to splitAssign (a by-id join would shuffle the full corpus
    // for information each row already determines)
    val withSplit = docs
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__text"))
      .withColumn("bucket", md5Bucket("doc_id"))
      .withColumn(
        "split",
        when(col("bucket") < trainCut, "train")
          .when(col("bucket") < valCut, "val")
          .otherwise("test"))
    val grams = withSplit
      .filter(col("split").isin("train", "test"))
      .select(col("doc_id"), col("split"), TextAnalysis.tokens(col("__text")).as("__tk"))
      .select(col("doc_id"), col("split"), explode(TextAnalysis.ngrams(col("__tk"), n)).as("gram"))
      .distinct()
    // grams is materialized once: the train-distinct branch and the test
    // filter would otherwise each rerun the tokenize + explode + distinct
    val g = grams.localCheckpoint()
    val trainGrams = g
      .filter(col("split") === "train")
      .select("gram")
      .distinct()
      .withColumn("__in_train", lit(1))
    g.filter(col("split") === "test")
      .join(trainGrams, Seq("gram"), "left")
      .withColumn("__in_train", coalesce(col("__in_train"), lit(0)))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("long").as("n_grams"),
        sum("__in_train").cast("long").as("n_contaminated"))
      .withColumn(
        "contamination",
        round(col("n_contaminated").cast("double") / col("n_grams"), 4))
  }

  /** Greedy sequence packing — the concat-and-split batching used to fill
    * fixed-size context windows for LLM training: documents are laid
    * end-to-end in a deterministic order and cut every `ctxTokens` tokens;
    * a doc belongs to the chunk where it STARTS.
    *
    * A single global layout would serialize on one partition, so packing
    * is shard-local: docs are grouped into shards of `shardSize`
    * consecutive ids and each shard packs independently (the running
    * token-offset window partitions by shard). That is exactly how
    * production packers scale — perfect global packing is not worth a
    * global sort, and shard-local packing wastes at most one partial
    * chunk per shard. Returns per-chunk occupancy (n_docs, n_tokens),
    * the quantity a pipeline monitors for padding waste.
    */
  /** Per-doc packing layout: (doc_id, shard, chunk, n_tokens) under the
    * shard-local running-offset rule — the per-doc face [[packGreedy]]
    * aggregates and the manifest face `api.Pipeline` joins.
    */
  def packLayout(
      docs: DataFrame,
      ctxTokens: Int = 2048,
      shardSize: Int = 256,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(
      col(idCol).cast("long").as("doc_id"),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"))
    val w = Window
      .partitionBy("shard")
      .orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks
      .withColumn("shard", expr(s"doc_id div $shardSize"))
      .withColumn("cum", sum("n_tokens").over(w))
      .select(
        col("doc_id"),
        col("shard"),
        expr(s"(cum - n_tokens) div $ctxTokens").as("chunk"),
        col("n_tokens"))
  }

  def packGreedy(
      docs: DataFrame,
      ctxTokens: Int = 2048,
      shardSize: Int = 256,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    packLayout(docs, ctxTokens, shardSize, textCol, idCol)
      .groupBy("shard", "chunk")
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum("n_tokens").cast("long").as("n_tokens"))

  /** Per-doc PII audit + redaction digest: match counts per category on the
    * ORIGINAL text, and md5 of the redacted text (the digest keeps the
    * oracle comparison compact — asserting the full redacted string would
    * work too, it is deterministic).
    */
  def piiRedact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      regexp_count(col(textCol), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col(textCol), lit(Ipv4Re)).cast("long").as("n_ips"),
      regexp_count(col(textCol), lit(PhoneRe)).cast("long").as("n_phones"),
      md5(redacted(col(textCol))).as("clean_md5"))

  /** Data-card rollup: the per-source summary table published alongside a
    * training corpus (docs, tokens, chars, language spread, quality
    * distribution, gate pass-rate), plus an `ALL` grand-total row from the
    * same pass via `rollup` — identified by `grouping()`, not by a NULL
    * key, so a NULL-source group keeps its NULL label instead of
    * masquerading as the total. Quality is carried as the integer ten-thousandths
    * of [[graft.ops.TextAnalysis.qualityScore]] (`q_tenk_*`), so every cell
    * is exact and oracle-hashable; `n_kept` counts docs at or above
    * `keepTenk` (default 0.5).
    *
    * Scale shape: one narrow projection computes the per-doc signals, then
    * a single hash aggregation over `rollup(source)` — Spark expands the
    * rollup map-side, so the grand total costs no extra pass; sources are
    * few, so the reduce side is trivially small. `n_langs` partial-
    * aggregates as (source, lang) pairs before the distinct count.
    */
  /** Corpus content manifest: one row per group (source / shard / split)
    * with doc, token and char totals plus an order-independent 56-bit
    * content signature — `sum(md5₅₆(doc_id:md5(text))) mod 2⁵⁶`. Two
    * corpus copies agree on a group iff every (id, text) pair agrees, so
    * replicas, migrations and snapshot versions compare by shipping
    * |groups| rows instead of re-reading either corpus (the aggregate
    * complement of [[snapshotDiff]], which pinpoints per-doc changes once
    * a manifest row disagrees). Including the id binds content to
    * identity: a re-keyed doc changes the signature even when its text
    * survives. Commutative-sum combining makes the signature independent
    * of row order and partitioning — the property parquet layout cannot
    * be trusted for.
    *
    * Scale shape: pure per-row projections (two md5s, a token-array
    * `size` — no explode) into one |groups|-key map-side-combinable
    * aggregate; the 56-bit hash sum accumulates exactly in decimal(38,0)
    * before the final mod, so no overflow at any corpus size.
    */
  def manifest(
      docs: DataFrame,
      groupCol: String = "source",
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val sig = conv(
      substring(
        md5(concat(col(idCol).cast("string"), lit(":"), md5(coalesce(col(textCol), lit(""))))),
        1,
        14),
      16,
      10).cast("long")
    docs
      .select(
        col(groupCol).as("grp"),
        sig.as("__sig"),
        coalesce(size(graft.ops.TextAnalysis.tokens(col(textCol))), lit(0)).cast("long").as("__nt"),
        coalesce(length(col(textCol)), lit(0L)).cast("long").as("__nc"))
      .groupBy("grp")
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum("__nt").cast("long").as("n_tokens"),
        sum("__nc").cast("long").as("n_chars"),
        sum(col("__sig").cast("decimal(38,0)")).as("__s"))
      .select(
        col("grp").as(groupCol),
        col("n_docs"),
        col("n_tokens"),
        col("n_chars"),
        expr("CAST(__s % 72057594037927936 AS BIGINT)").as("content_sig"))
  }

  def datacard(
      docs: DataFrame,
      keepTenk: Long = 5000L,
      textCol: String = "text",
      srcCol: String = "source",
      langCol: String = "lang"): DataFrame = {
    val qTenk = round(TextAnalysis.qualityScore(col(textCol)) * 10000, 0).cast("long")
    docs
      .select(
        col(srcCol).as("source"),
        col(langCol).as("lang"),
        length(col(textCol)).cast("long").as("n_chars"),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"),
        qTenk.as("q_tenk"))
      // rollup(col(...)), not rollup("source"): the String overload routes
      // through Dataset.col, whose dataset-id metadata trips Spark's
      // ambiguous-self-join detection when the input descends from a
      // semi-join of a frame against itself (Pipeline.datacard's shape)
      .rollup(col("source"))
      .agg(
        // grouping() marks the rollup total row, so a NULL-source group (or
        // a source literally named "ALL") stays distinguishable from it
        grouping(col("source")).as("__is_total"),
        count(lit(1)).cast("long").as("n_docs"),
        sum("n_tokens").cast("long").as("n_tokens"),
        sum("n_chars").cast("long").as("n_chars"),
        countDistinct(col("lang")).cast("long").as("n_langs"),
        min("q_tenk").cast("long").as("q_tenk_min"),
        max("q_tenk").cast("long").as("q_tenk_max"),
        sum("q_tenk").cast("long").as("q_tenk_sum"),
        sum(when(col("q_tenk") >= keepTenk, 1L).otherwise(0L)).cast("long").as("n_kept"))
      .select(
        when(col("__is_total") === 1, lit("ALL")).otherwise(col("source")).as("source"),
        col("n_docs"), col("n_tokens"), col("n_chars"), col("n_langs"),
        col("q_tenk_min"), col("q_tenk_max"),
        // integer division: exact and engine-portable (no double rounding)
        expr("q_tenk_sum div n_docs").cast("long").as("q_tenk_avg"),
        col("n_kept"))
  }

  /** Hashed-n-gram bucket in 0..255: first two hex digits of md5(gram),
    * via base-16 `conv` (portable — the DuckDB oracle mirrors it with
    * strpos arithmetic over the same md5 hex).
    */
  private def gramBucket(g: Column): Column =
    conv(substring(md5(g), 1, 2), 16, 10).cast("long")

  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): estimate target-vs-corpus
    * distributions over hashed word-bigram features, then score each doc by
    * how target-like its features are. The published method weights by the
    * log-likelihood ratio; this variant keeps each feature's weight as an
    * exact integer milli-RATIO (the repo-wide `*_milli div` discipline —
    * `lift_milli`/`idf_milli` drop the log the same way), so the score is a
    * deterministic BIGINT that hash-matches across engines: per feature
    * bucket b, `ratio_milli(b) = (1000·(p_b+1)·(q_tot+256)) div
    * ((q_b+1)·(p_tot+256))` (add-one smoothing over 256 buckets; ≈1000 for
    * corpus-typical features, higher for target-heavy ones), and per doc
    * `score_milli = (Σ_gram ratio_milli) div n_grams`. `keep` marks docs at
    * or above `keepMilli` — deterministic threshold selection in place of
    * the paper's Gumbel resampling, so the output is reproducible and the
    * selected set is stable under corpus growth.
    *
    * Scale shape: pass 1 folds the whole corpus into a 256-cell histogram
    * (map-side-combinable aggregate — each executor emits ≤256 rows) that
    * is collected (bounded, like `occupiedStrata`) and turned into a
    * 256-entry literal map; pass 2 is a SHUFFLE-FREE projection — tokens,
    * grams, and the ratio lookup are all per-row array expressions, so
    * scoring 100 TB is embarrassingly parallel with zero joins. NOTE: the
    * histogram pass is an eager driver action at composition time, and the
    * driver ratio arithmetic holds to ~9.2e18: at corpus sizes where
    * 1000·p_cnt·q_tot approaches Long.MaxValue (~10^7 target grams ×
    * 10^8 total), downscale both histograms by a common factor first —
    * the ratio is scale-invariant.
    */
  def importanceScore(
      docs: DataFrame,
      isTarget: Column,
      keepMilli: Long = 1000L,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val nBuckets = 256
    val base = docs
      .select(
        col(idCol).cast("long").as("doc_id"),
        isTarget.as("is_target"),
        TextAnalysis.tokens(col(textCol)).as("tk"))
      .withColumn("grams", TextAnalysis.ngrams(col("tk"), 2))
    // explode_outer, not explode: grams is non-null by construction, and
    // the plain explode's InferFiltersFromGenerate filter re-evaluates the
    // whole gram-construction chain per row in a non-codegen Filter
    // (measured 11.6 s vs 0.4 s for this pass at sf0.1 — the
    // embedding_project lesson); the _outer variant suppresses the rule,
    // and its one extra null row per gram-less doc is filtered on the
    // GENERATED attribute, which costs nothing.
    val hist = base
      .select(col("is_target"), explode_outer(col("grams")).as("g"))
      .filter(col("g").isNotNull)
      .select(col("is_target"), gramBucket(col("g")).as("bucket"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).cast("long").as("q_cnt"),
        sum(when(col("is_target"), 1L).otherwise(0L)).cast("long").as("p_cnt"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val qTot = hist.valuesIterator.map(_._1).sum
    val pTot = hist.valuesIterator.map(_._2).sum
    // all 256 buckets get a smoothed ratio, so the lookup is never null.
    // An ARRAY literal indexed by bucket, not a map: element_at on a map
    // literal is a linear key scan per lookup (256 comparisons per gram —
    // measured 13 s at sf0.1); array indexing is O(1) (1.9 s).
    val ratios: Seq[Long] = (0L until nBuckets.toLong).map { b =>
      val (q, p) = hist.getOrElse(b, (0L, 0L))
      1000L * (p + 1) * (qTot + nBuckets) / ((q + 1) * (pTot + nBuckets))
    }
    val rm = typedLit(ratios)
    base
      .withColumn("n_grams", size(col("grams")).cast("long"))
      .withColumn(
        "ratio_sum",
        aggregate(
          col("grams"),
          lit(0L),
          (acc, g) => acc + element_at(rm, (gramBucket(g) + 1).cast("int"))))
      .select(
        col("doc_id"),
        col("n_grams"),
        when(col("n_grams") === 0, 0L)
          .otherwise(expr("ratio_sum div n_grams"))
          .cast("long")
          .as("score_milli"))
      .withColumn("keep", col("score_milli") >= keepMilli)
  }
}
