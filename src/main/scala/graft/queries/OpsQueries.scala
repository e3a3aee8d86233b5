package graft.queries

import graft.io.EventTime
import graft.ops.{Corpus, Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checked queries for the training-data-pipeline extension
  * operators (SURVEY §7.4): dedup (exact, MinHash-LSH, SimHash, n-gram
  * Jaccard, embedding-cosine), similarity search (brute-force and sign-LSH
  * top-k), text analysis (quality, language-ID, token stats), multimodal
  * plumbing, and a tumbling-window event aggregation.
  *
  * The corpus has planted *near*-dups but no exact dups and no high-cosine
  * embedding pairs, so the exact/embedding variants run on a corpus with
  * deterministically planted duplicates (mirrored in the oracle SQL).
  */
object OpsQueries {

  private def docs(s: SparkSession, dir: String) =
    s.read.parquet(s"$dir/documents.parquet")

  private def embs(s: SparkSession, dir: String) =
    s.read.parquet(s"$dir/embeddings.parquet")

  // fixture media tables (asMedia contract) feeding the decoupled
  // multimodal faces; the faces themselves never see MediaSynth
  private def bmpMedia(s: SparkSession, dir: String) =
    graft.etl.MediaSynth.mediaTable(docs(s, dir), "image/bmp", graft.etl.MediaSynth.docBmp)

  private def wavMedia(s: SparkSession, dir: String) =
    graft.etl.MediaSynth.mediaTable(docs(s, dir), "audio/wav", graft.etl.MediaSynth.docWav)

  private def videoMedia(s: SparkSession, dir: String) =
    graft.etl.MediaSynth.mediaTable(docs(s, dir), "video/gvid", graft.etl.MediaSynth.docVideo)

  /** documents ∪ re-inserted copies of every 10th doc (planted exact dups). */
  private def dupDocs(s: SparkSession, dir: String) = {
    val d = docs(s, dir).select("doc_id", "text")
    d.unionAll(
      d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
  }

  /** documents re-chunked into newline-separated 12-token lines with
    * planted structure (mirrored exactly by `linedSql`): every line whose
    * (doc_id + line index) ≡ 0 mod 3 gains terminal punctuation; four
    * boilerplate lines are appended to every doc (a javascript notice, a
    * braced footer, a too-short line, a clean shared newsletter line) and
    * a fifth to every 4th doc. Gives the line/paragraph operators real
    * per-line variety and guaranteed cross-doc duplicate paragraphs.
    */
  private def linedDocs(s: SparkSession, dir: String) = {
    import graft.ops.TextAnalysis
    docs(s, dir)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))
      .select(
        col("doc_id"),
        concat_ws(
          "\n",
          concat(
            transform(
              sequence(lit(0), expr("(greatest(size(tk), 1) - 1) div 12")),
              i =>
                concat(
                  concat_ws(" ", slice(col("tk"), i * 12 + 1, lit(12))),
                  when((col("doc_id") + i) % 3 === 0, lit(".")).otherwise(lit("")))),
            array(
              lit("please enable javascript to view this page."),
              lit("all rights reserved { footer }."),
              lit("ok."),
              lit("subscribe to the newsletter for updates today.")),
            when(col("doc_id") % 4 === 1, array(lit("follow us on social media.")))
              .otherwise(array().cast("array<string>")))).as("text"))
  }

  /** documents with planted URLs (mirrored in the `text_url_domains`
    * oracle): one per doc on a doc_id-keyed domain, a shared mirror link on
    * every 3rd doc, an /about link on every 5th.
    */
  private def urlDocs(s: SparkSession, dir: String) =
    docs(s, dir).select(
      col("doc_id"),
      concat(
        col("text"),
        lit(" see https://site"), (col("doc_id") % 7).cast("string"),
        lit(".example/p/"), col("doc_id").cast("string"),
        when(col("doc_id") % 3 === 0, lit(" and http://mirror.example/download"))
          .otherwise(lit("")),
        when(
          col("doc_id") % 5 === 0,
          concat(
            lit(" https://site"),
            (col("doc_id") % 7).cast("string"),
            lit(".example/about"))).otherwise(lit(""))).as("text"))

  /** [[urlDocs]] plus canonicalization-variant links (mirrored in the
    * `dedup_url` oracle): every 4th-mod-2 doc repeats its own URL with a
    * utm tracking query + fragment; every 10th repeats its /about link
    * with a trailing slash. Canonical dedup must collapse each variant
    * into its base URL's group.
    */
  private def urlDupDocs(s: SparkSession, dir: String) =
    urlDocs(s, dir).select(
      col("doc_id"),
      concat(
        col("text"),
        when(
          col("doc_id") % 4 === 2,
          concat(
            lit(" https://site"), (col("doc_id") % 7).cast("string"),
            lit(".example/p/"), col("doc_id").cast("string"),
            lit("?utm_source=feed#frag"))).otherwise(lit("")),
        when(
          col("doc_id") % 10 === 0,
          concat(
            lit(" https://site"), (col("doc_id") % 7).cast("string"),
            lit(".example/about/"))).otherwise(lit(""))).as("text"))

  /** embeddings ∪ exact copies of every 20th vector (planted dup vectors). */
  private def dupEmbs(s: SparkSession, dir: String) = {
    val e = embs(s, dir).select("vec_id", "embedding")
    e.unionAll(
      e.filter(col("vec_id") % 20 === 0)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding")))
  }

  /** Per-(JVM, corpus dir) persisted cluster-map cache: the first CC-family
    * query against a corpus builds and persists the map
    * ([[graft.ops.Dedup.writeClusterMap]] — MinHash → LSH → connected
    * components, the expensive iterative job); every later consumer
    * (keep, keep-best, cluster-safe split, the map query itself) probes
    * the parquet artifact. Per-process scratch path so concurrent
    * processes never collide; keyed by dir so sf0.01 verify and sf0.1
    * bench runs in one JVM stay separate.
    */
  private val clusterMapDirs = scala.collection.concurrent.TrieMap[String, String]()

  private def clusterMapPath(s: SparkSession, dir: String): String =
    clusterMapDirs.getOrElseUpdate(
      dir, {
        val p = s"${sys.props("java.io.tmpdir")}/graft_cluster_map_" +
          s"${ProcessHandle.current().pid()}_${math.abs(dir.hashCode.toLong)}"
        Dedup.writeClusterMap(docs(s, dir), p)
        p
      })

  private def clusterMap(s: SparkSession, dir: String): DataFrame =
    Dedup.readClusterMap(s, clusterMapPath(s, dir))

  /** Per-(JVM, corpus dir) PCA fit cache: the three PCA-family queries
    * (audit, debias, debiased rank) share ONE covariance collect + power
    * iteration per corpus, the build-once discipline of
    * [[clusterMapPath]] applied to a driver-sized fit.
    */
  private val pcaFits = scala.collection.concurrent.TrieMap[String, (Seq[Long], Long)]()

  private def pcaFit(s: SparkSession, dir: String): (Seq[Long], Long) =
    pcaFits.getOrElseUpdate(dir, Similarity.fitTopDirection(embs(s, dir)))

  /** Persisted LSH index over the corpus snapshot, built once per dir —
    * the history side of the incremental-clustering queries (probed, never
    * re-shingled), same build-once scratch discipline as [[clusterMapPath]].
    */
  private val lshIndexDirs = scala.collection.concurrent.TrieMap[String, String]()

  private def lshIndexPath(s: SparkSession, dir: String): String =
    lshIndexDirs.getOrElseUpdate(
      dir, {
        val p = s"${sys.props("java.io.tmpdir")}/graft_lsh_index_" +
          s"${ProcessHandle.current().pid()}_${math.abs(dir.hashCode.toLong)}"
        Dedup.writeLshIndex(docs(s, dir), p)
        p
      })

  /** The incremental-clustering batch: a re-crawl round of near-identical
    * copies — every `doc_id % 11 = 7` doc re-lands under id +7,000,000, and
    * half of those (`% 22 = 7`) land a SECOND copy under +8,000,000, so the
    * batch has both batch↔history and batch↔batch near-dup pairs. Mirrored
    * verbatim in the `dedup_clusters_incremental` oracle SQL.
    */
  private def incBatch(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    d.filter(col("doc_id") % 11 === 7)
      .select((col("doc_id") + 7000000L).as("doc_id"), col("text"))
      .unionAll(
        d.filter(col("doc_id") % 22 === 7)
          .select((col("doc_id") + 8000000L).as("doc_id"), col("text")))
  }

  /** The cluster-MERGE fixture: history that holds two crawl FRAGMENTS of
    * every `doc_id % 31 = 11` seed — an 85%-of-words prefix (id +600,000)
    * and an 85% suffix (id +650,000), shingle-Jaccard ≈0.7 to each other
    * (below the 0.8 near-dup bar, so they land in DIFFERENT clusters) but
    * ≈0.85 to the full text — with the seed itself withheld. The batch
    * ([[bridgeBatch]]) then re-crawls the FULL seed (+7,000,000): ≥0.8 to
    * both fragments, so it bridges their clusters and
    * `dedup_cluster_merge_audit` has real merges to report. Tokenization
    * is exactly [[graft.ops.TextAnalysis.tokens]] so the rebuilt text
    * re-tokenizes identically; mirrored verbatim in the oracle CTEs.
    */
  private def bridgeHistory(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val seeds = d
      .filter(col("doc_id") % 31 === 11)
      .select(col("doc_id"), graft.ops.TextAnalysis.tokens(col("text")).as("tk"))
    val pref = seeds.select(
      (col("doc_id") + 600000L).as("doc_id"),
      expr("concat_ws(' ', slice(tk, 1, (17 * size(tk)) div 20))").as("text"))
    val suf = seeds.select(
      (col("doc_id") + 650000L).as("doc_id"),
      expr(
        "concat_ws(' ', slice(tk, (3 * size(tk)) div 20 + 1, " +
          "size(tk) - (3 * size(tk)) div 20))").as("text"))
    d.filter(col("doc_id") % 31 =!= 11).unionAll(pref).unionAll(suf)
  }

  private def bridgeBatch(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .filter(col("doc_id") % 31 === 11)
      .select((col("doc_id") + 7000000L).as("doc_id"), col("text"))

  /** Persisted LSH index + cluster map over [[bridgeHistory]], built once
    * per dir — the frozen snapshot the merge-audit query probes.
    */
  private val bridgeDirs = scala.collection.concurrent.TrieMap[String, String]()

  private def bridgePaths(s: SparkSession, dir: String): (String, String) = {
    val base = bridgeDirs.getOrElseUpdate(
      dir, {
        val p = s"${sys.props("java.io.tmpdir")}/graft_bridge_" +
          s"${ProcessHandle.current().pid()}_${math.abs(dir.hashCode.toLong)}"
        val h = bridgeHistory(s, dir).localCheckpoint()
        Dedup.writeLshIndex(h, s"$p/lsh")
        Dedup.writeClusterMap(h, s"$p/map")
        p
      })
    (s"$base/lsh", s"$base/map")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> { (s, dir) => Dedup.exactGroups(dupDocs(s, dir)) },
    // Down-weight-don't-drop dedup over the planted-duplicate corpus:
    // original + copy each get weight_milli = 500; singletons 1000.
    "dedup_soft_weights" -> { (s, dir) => Dedup.softDedupWeights(dupDocs(s, dir)) },
    "dedup_prefix" -> { (s, dir) => Dedup.prefixGroups(docs(s, dir)) },
    "dedup_minhash_lsh" -> { (s, dir) => Dedup.minHashLsh(docs(s, dir)) },
    "dedup_edit_verify" -> { (s, dir) =>
      Dedup.verifyEditDistance(Dedup.minHashLsh(docs(s, dir)), docs(s, dir))
    },
    "dedup_simhash" -> { (s, dir) => Dedup.simHash(docs(s, dir)) },
    "dedup_ngram_jaccard" -> { (s, dir) => Dedup.ngramJaccard(docs(s, dir)) },
    // exact trigram-set Jaccard pairs via df-ordered prefix filtering —
    // the oracle is an independent brute-force all-pairs mirror, so this
    // row also re-proves the prefix filter's losslessness per run
    "dedup_setjoin_exact" -> { (s, dir) => Dedup.setSimilarityJoin(docs(s, dir)) },
    // exact token-edit-distance<=1 pairs via the deletion-neighborhood
    // equi-join; brute-force oracle again re-proves completeness per run
    "dedup_token_edit" -> { (s, dir) => Dedup.tokenEditJoin(docs(s, dir)) },
    // incremental exact set-sim: build the prefix index over the corpus,
    // exercise the append/tombstone/compact lifecycle with decoys, then
    // probe a re-crawl batch — must equal the batch join over the union
    // restricted to pairs touching the batch (brute-force oracle)
    "dedup_setjoin_incremental" -> { (s, dir) =>
      val p = s"${sys.props("java.io.tmpdir")}/graft_setjoin_idx_${ProcessHandle.current().pid()}"
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val batch = d
        .filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        .unionAll(
          d.filter(col("doc_id") % 10 === 5)
            .select(
              (col("doc_id") + 2000000L).as("doc_id"),
              concat(col("text"), lit(" fresh crawl "), col("doc_id").cast("string"))
                .as("text")))
      Dedup.writeSetJoinIndex(d, p)
      val decoys = batch
        .filter(col("doc_id") >= 2000000L)
        .select((col("doc_id") + 7000000L).as("doc_id"), col("text"))
      Dedup.appendSetJoinIndex(decoys, p)
      graft.ops.Similarity.deleteFromIndex(decoys.select("doc_id"), p, idCol = "doc_id")
      Dedup.compactSetJoinIndex(s, p)
      Dedup.probeSetJoinIndex(s, p, batch)
    },
    // staleness audit of the frozen df order: the index freezes its order
    // over the clean corpus, then every batch doc arrives carrying a shared
    // phrase the build never saw — df 0 under the frozen order, so it sorts
    // into EVERY batch prefix and quadratically inflates candidates; the
    // fresh order files it last. inflation_ppm is the rebuild signal.
    "dedup_setjoin_drift" -> { (s, dir) =>
      val p = s"${sys.props("java.io.tmpdir")}/graft_setjoin_drift_${ProcessHandle.current().pid()}"
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      Dedup.writeSetJoinIndex(d, p)
      val drifted = d
        .filter(col("doc_id") % 3 === 0)
        .select(
          col("doc_id"),
          concat(col("text"), lit(" breaking news update breaking news update")).as("text"))
      Dedup.setJoinDriftAudit(s, p, drifted)
    },
    // the audit ACTED ON: same planted-drift fixture, threshold below the
    // measured inflation, so the conditional face measures, decides,
    // REBUILDS the frozen order from the live stored digests, and returns
    // the decision row — the whole unattended loop in one driver-checked
    // query (store ≡ clean rebuild is pinned by SetJoinSpec)
    "dedup_setjoin_rebuild" -> { (s, dir) =>
      val p = s"${sys.props("java.io.tmpdir")}/graft_setjoin_rb_${ProcessHandle.current().pid()}"
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      Dedup.writeSetJoinIndex(d, p)
      val drifted = d
        .filter(col("doc_id") % 3 === 0)
        .select(
          col("doc_id"),
          concat(col("text"), lit(" breaking news update breaking news update")).as("text"))
      Dedup.rebuildSetJoinIfDrifted(s, p, drifted, thresholdPpm = 1500000L)
    },
    // incremental exact token-edit: same lifecycle over the signature
    // index — probe pairs must equal the union batch join's batch slice
    "dedup_token_edit_incremental" -> { (s, dir) =>
      val p = s"${sys.props("java.io.tmpdir")}/graft_tokedit_idx_${ProcessHandle.current().pid()}"
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val batch = d
        .filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        .unionAll(
          d.filter(col("doc_id") % 10 === 5)
            .select(
              (col("doc_id") + 2000000L).as("doc_id"),
              concat(col("text"), lit(" zz")).as("text")))
      Dedup.writeTokenEditIndex(d, p)
      val decoys = batch
        .filter(col("doc_id") >= 2000000L)
        .select((col("doc_id") + 7000000L).as("doc_id"), col("text"))
      Dedup.appendTokenEditIndex(decoys, p)
      graft.ops.Similarity.deleteFromIndex(decoys.select("doc_id"), p, idCol = "doc_id")
      Dedup.compactTokenEditIndex(s, p)
      Dedup.probeTokenEditIndex(s, p, batch)
    },
    "dedup_embedding_cosine" -> { (s, dir) =>
      Dedup.embeddingCosine(dupEmbs(s, dir))
    },
    // embedding face of benchmark decontamination: a planted "benchmark"
    // (every 17th corpus vector, re-keyed) must flag exactly its sources
    // plus any 0.99-cosine paraphrase neighbors sharing the sign bucket
    "contamination_semantic" -> { (s, dir) =>
      val e = embs(s, dir).select("vec_id", "embedding")
      val bench = e
        .filter(col("vec_id") % 17 === 0)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
      Similarity.semanticContamination(e, bench)
    },
    // The CC family (clusters/keep/keep_best/cluster-safe split) probes
    // ONE shared persisted cluster map per corpus instead of re-running
    // shingle → minhash → LSH → iterative CC per query — the
    // build-once/probe-many discipline of the LSH/IVF/PQ indexes applied
    // to the labels themselves. Results are contract-identical (the map
    // IS clusterPairs' output), so every oracle is unchanged.
    "dedup_clusters" -> { (s, dir) => clusterMap(s, dir) },
    // Honest lifecycle face: rebuilds + persists + reads back its OWN map
    // every invocation (fresh scratch write), so the build cost stays
    // visible in the bench — same reasoning as similarity_topk_ivf_persisted.
    "dedup_clusters_persisted" -> { (s, dir) =>
      val p = s"${sys.props("java.io.tmpdir")}/graft_cluster_map_own_${ProcessHandle.current().pid()}"
      Dedup.writeClusterMap(docs(s, dir), p)
      Dedup.readClusterMap(s, p)
    },
    // a re-crawl batch labeled against the FROZEN snapshot (persisted LSH
    // index + persisted cluster map) — no global MinHash/CC re-run
    "dedup_clusters_incremental" -> { (s, dir) =>
      Dedup.assignClusters(s, lshIndexPath(s, dir), clusterMapPath(s, dir), incBatch(s, dir))
    },
    // the rebuild signal: old clusters the batch bridged — the history
    // holds prefix/suffix crawl fragments of each seed (separate
    // clusters), the batch re-crawls the full seed and merges them
    "dedup_cluster_merge_audit" -> { (s, dir) =>
      val (lsh, map) = bridgePaths(s, dir)
      Dedup.clusterMergeAudit(s, lsh, map, bridgeBatch(s, dir))
    },
    // benchmark-vs-train decontamination by NEAR-dup: every 5th doc plays
    // the benchmark (re-id'd, removed from the corpus side); hits are its
    // planted near-dup partners still in the corpus
    "dedup_cross_corpus" -> { (s, dir) =>
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      Dedup.crossMinHashLsh(
        d.filter(col("doc_id") % 5 === 2)
          .select((col("doc_id") + 5000000).as("doc_id"), col("text")),
        d.filter(col("doc_id") % 5 =!= 2))
    },
    "dedup_simhash_pairs" -> { (s, dir) => Dedup.simHashPairs(dupDocs(s, dir)) },
    "corpus_length_buckets" -> { (s, dir) => Corpus.lengthBuckets(docs(s, dir)) },
    "dedup_paragraph" -> { (s, dir) => Dedup.paragraphDedup(linedDocs(s, dir)) },
    "dedup_semantic" -> { (s, dir) => Dedup.semanticDedup(dupEmbs(s, dir)) },
    "text_clean_lines" -> { (s, dir) => TextAnalysis.cleanLines(linedDocs(s, dir)) },
    "text_url_domains" -> { (s, dir) => TextAnalysis.urlDomains(urlDocs(s, dir)) },
    "corpus_sample_quota" -> { (s, dir) => Corpus.sampleQuota(docs(s, dir), n = 10) },
    "corpus_shuffle_order" -> { (s, dir) => Corpus.shuffleOrder(docs(s, dir)) },
    // contrastive negatives: 4 deterministic uniform draws from the md5
    // ring per (query, positive) pair; own-positive/self collisions drop
    "corpus_negative_sample" -> { (s, dir) =>
      val d = docs(s, dir)
      val pairs = d.filter(col("doc_id") < 16)
        .select(
          col("doc_id").cast("long").as("query_id"),
          expr("CAST((doc_id * 7 + 13) % 500 AS BIGINT)").as("pos_id"))
      Corpus.negativeSample(pairs, d, k = 4)
    },
    "corpus_split" -> { (s, dir) => Corpus.splitAssign(docs(s, dir)) },
    "corpus_sample" -> { (s, dir) => Corpus.sampleStratified(docs(s, dir)) },
    "corpus_quality_gate" -> { (s, dir) => Corpus.qualityGate(docs(s, dir)) },
    "corpus_mixture" -> { (s, dir) =>
      Corpus.mixtureSample(docs(s, dir), budgetTokens = 10000L)
    },
    "corpus_mixture_sqrt" -> { (s, dir) =>
      Corpus.mixtureSampleSqrt(docs(s, dir), budgetTokens = 10000L)
    },
    // re-crawl ingest: a batch of half re-fetched (identical text, new id)
    // and half genuinely new docs, deduplicated against the full history
    // by content fingerprint — only the new half survives
    "dedup_incremental" -> { (s, dir) =>
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val batch = d
        .filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
        .unionAll(
          d.filter(col("doc_id") % 10 === 5)
            .select(
              (col("doc_id") + 2000000).as("doc_id"),
              concat(
                col("text"),
                lit(" fresh crawl "),
                col("doc_id").cast("string")).as("text")))
      Dedup.incrementalNew(batch, d)
    },
    "dedup_keep" -> { (s, dir) =>
      Dedup.keepFromClusters(docs(s, dir), clusterMap(s, dir))
    },
    // corpus version fingerprint: order-independent 56-bit content
    // signature + totals per source — replicas/migrations compare by
    // shipping |sources| rows, never re-reading either corpus
    "corpus_manifest" -> { (s, dir) => Corpus.manifest(docs(s, dir)) },
    // the datacard every dedup proposal gets asked for first: per-source
    // duplicate doc/token mass from the shared persisted cluster map
    "dedup_savings" -> { (s, dir) =>
      Dedup.dedupSavings(docs(s, dir), clusterMap(s, dir))
    },
    "dedup_keep_best" -> { (s, dir) =>
      Dedup.keepBestFromClusters(
        docs(s, dir),
        clusterMap(s, dir),
        round(TextAnalysis.qualityScore(col("text")) * 10000, 0).cast("long"))
    },
    "text_pii_redact" -> { (s, dir) =>
      Corpus.piiRedact(
        docs(s, dir).select(
          col("doc_id"),
          concat(
            col("text"),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com from 10.0."), (col("doc_id") % 256).cast("string"),
            lit(".77 or call 555-0142")).as("text")))
    },
    "similarity_topk" -> { (s, dir) =>
      val e = embs(s, dir)
      Similarity.bruteForceTopK(e.filter(col("vec_id") < 8), e, k = 5)
    },
    // hybrid retrieval: a dense ranking (exact cosine top-10) and a
    // lexical ranking (distinct-token overlap top-10, doc_id==vec_id id
    // space) fused by reciprocal rank — rank-only, so the two scores
    // never need calibrating; integer ppm fused score
    "search_rrf_hybrid" -> { (s, dir) =>
      val e = embs(s, dir)
      val dense = Similarity
        .bruteForceTopK(e.filter(col("vec_id") < 8), e, k = 10)
        .select(lit("dense").as("source"), col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
      val tok = docs(s, dir)
        .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .distinct()
      val lex0 = tok
        .filter(col("doc_id") < 8)
        .withColumnRenamed("doc_id", "query_id")
        .join(tok, Seq("tok"))
        .filter(col("doc_id") =!= col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(count(lit(1)).cast("long").as("ov"))
      val lex = lex0
        .withColumn(
          "rank",
          row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("query_id")
              .orderBy(col("ov").desc, col("doc_id").asc)))
        .filter(col("rank") <= 10)
        .select(lit("lex").as("source"), col("query_id"), col("doc_id"), col("rank"))
      Similarity.rrfFuse(dense.unionAll(lex), k = 5)
    },
    // simplified silhouette over the flat 8-cell quantizer: low mean =
    // blurry cell boundaries, the retrain smell cell POPULATIONS miss
    "ann_silhouette" -> { (s, dir) =>
      Similarity.silhouetteAudit(embs(s, dir), nCentroids = 8)
    },
    // rank-biased overlap of the pruned IVF-flat ranking against exact
    // brute force at k=10, p=0.9 — do the two RANKERS agree, no truth
    // set needed (the head-to-head complement of the recall audit)
    "ann_rbo_audit" -> { (s, dir) =>
      val e = embs(s, dir)
      val q = e.filter(col("vec_id") < 8)
      Similarity.rankOverlapAudit(
        Similarity.ivfFlatTopK(q, e, k = 10),
        Similarity.bruteForceTopK(q, e, k = 10),
        k = 10)
    },
    "similarity_topk_lsh" -> { (s, dir) =>
      val e = embs(s, dir)
      Similarity.signLshTopK(e.filter(col("vec_id") < 8), e, k = 5)
    },
    // diversity-aware rerank: greedy MMR over the brute-force pool,
    // integer micro-scores so the unrolled DuckDB closure hash-matches
    "similarity_topk_mmr" -> { (s, dir) =>
      val e = embs(s, dir)
      Similarity.mmrTopK(e.filter(col("vec_id") < 8), e, k = 5, pool = 15)
    },
    // project → sign-bucket the JL space → pool (integer JL-space cosine,
    // own-bucket equi-join — a real ANN, not an all-pairs) → exact rerank
    "similarity_topk_projected" -> { (s, dir) =>
      val e = embs(s, dir)
      Similarity.projectedTopK(e.filter(col("vec_id") < 8), e, k = 5, pool = 15, bits = 4)
    },
    // full k-means IVF: the Lloyd loop is integer-milli-stabilized
    // (Similarity.ivfCentroids), so all 3 iterations unroll into the
    // DuckDB oracle and the operator is hash-checked end-to-end
    "similarity_topk_ivf" -> { (s, dir) =>
      val e = embs(s, dir)
      Similarity.ivfTopK(e.filter(col("vec_id") < 8), e, k = 5)
    },
    // flat (seed-vector) coarse quantizer: same assign→probe→rerank shape
    // as ivfTopK but deterministic end-to-end → full hash check
    "similarity_topk_ivf_flat" -> { (s, dir) =>
      val e = embs(s, dir)
      Similarity.ivfFlatTopK(e.filter(col("vec_id") < 8), e, k = 5)
    },
    // embedding anisotropy audit: top principal direction via 12 exact
    // integer power iterations over the scaled covariance (driver math is
    // BigInt; the oracle unrolls the same steps in HUGEINT to the bit)
    "embedding_pca_top" -> { (s, dir) =>
      Similarity.pcaTopDirection(embs(s, dir), fit = Some(pcaFit(s, dir)))
    },
    // all-but-the-top (Mu & Viswanath 2018): dominant direction removed
    // from every vector in exact integer milli — zero-shuffle projection
    // with the driver-computed direction folded into codegen
    "embedding_debias_abtt" -> { (s, dir) =>
      Similarity.removeTopComponent(embs(s, dir), fit = Some(pcaFit(s, dir)._1))
    },
    // the composition the audit motivates: exact top-k in the DEBIASED
    // space (integer dots over the ABTT vectors) — "did removal change
    // the neighbors" as a hash-checked query
    "similarity_topk_debiased" -> { (s, dir) =>
      Similarity.debiasedTopK(embs(s, dir), col("vec_id") < 8, k = 5, fit = Some(pcaFit(s, dir)._1))
    },
    // the SCALE face of the debiased space: sign-LSH buckets over the
    // first 4 ABTT milli coordinates, Hamming<=1 multi-probe, exact
    // integer rerank within candidates — ranking in the corrected space
    // without the per-probe corpus scan the exact baseline pays
    "similarity_topk_debiased_ann" -> { (s, dir) =>
      Similarity.debiasedAnnTopK(
        embs(s, dir), col("vec_id") < 8, k = 5, bits = 4, fit = Some(pcaFit(s, dir)._1))
    },
    // label-centroid affinity matrix: cosine between per-label mean
    // embeddings (sum direction — scale-invariant, so no division to
    // mirror), the mixture-design / confusability diagnostic
    "embedding_group_affinity" -> { (s, dir) =>
      Similarity.groupAffinity(embs(s, dir))
    },
    // hard negatives for contrastive training: most-similar DIFFERENT-label
    // candidates from the probed cells (ivf_flat's deterministic shape with
    // the label riding every stage — no join-back, hash-checked end-to-end)
    "similarity_hard_negatives" -> { (s, dir) =>
      val e = embs(s, dir)
      Similarity.hardNegatives(e.filter(col("vec_id") < 8), e, k = 5)
    },
    // full lifecycle face of the k-means IVF: build the persisted index
    // (centroids + partitioned cells + params) in a scratch dir, then
    // probe it — must hash-match similarity_topk_ivf's oracle exactly,
    // proving probe-from-disk ≡ in-memory. The build cost rides in the
    // timed query on purpose: build-once/probe-many is the 100 TB story,
    // and hiding the build would overstate the probe.
    "similarity_topk_ivf_persisted" -> { (s, dir) =>
      val e = embs(s, dir)
      // per-PROCESS scratch path, overwrite semantics: repeated
      // invocations in one JVM (bench reps, plan sweeps) rewrite one
      // index instead of leaking a temp dir per call, while concurrent
      // processes (parallel CI, multi-user hosts) never collide
      val idx = s"${sys.props("java.io.tmpdir")}/graft_ivf_idx_${ProcessHandle.current().pid()}"
      Similarity.writeIvfIndex(e, idx)
      Similarity.probeIvfIndex(s, idx, e.filter(col("vec_id") < 8), k = 5)
    },
    "embedding_quantize" -> { (s, dir) => Similarity.quantizeInt8(embs(s, dir)) },
    // JL random projection, exploded (arrays don't hash-compare). The
    // OUTER explode is deliberate: proj_milli is a non-null 16-element
    // array by construction, so outer ≡ inner — but the inner generator
    // would make InferFiltersFromGenerate push a size()/isnotnull filter
    // whose pushdown substitutes the ENTIRE projection chain into a
    // non-codegen Filter, re-evaluating it per row (measured ~2x the
    // whole query; the chunker's round-8 lesson, generator edition).
    "embedding_project" -> { (s, dir) =>
      Similarity
        .projectMilli(embs(s, dir))
        .select(col("vec_id"), posexplode_outer(col("proj_milli")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"), col("col").as("p_milli"))
    },
    "embedding_dim_stats" -> { (s, dir) => Similarity.dimStats(embs(s, dir)) },
    // exploded face of the zero-shuffle vector transform (arrays don't
    // hash-compare; one row per (vec_id, pos) does)
    "embedding_standardize" -> { (s, dir) =>
      Similarity
        .standardizeMilli(embs(s, dir))
        .select(col("vec_id"), posexplode(col("z_milli")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"), col("col").as("z_milli"))
    },
    "embedding_cell_balance" -> { (s, dir) => Similarity.cellBalance(embs(s, dir)) },
    "corpus_lang_mix" -> { (s, dir) => Corpus.langMixture(docs(s, dir)) },
    // best-quality-first training order, salted shuffle within ties
    "corpus_curriculum" -> { (s, dir) =>
      Corpus.curriculumOrder(
        docs(s, dir),
        round(TextAnalysis.qualityScore(col("text")) * 10000, 0).cast("long"))
    },
    "text_quality" -> { (s, dir) => TextAnalysis.quality(docs(s, dir)) },
    "text_rarity" -> { (s, dir) => TextAnalysis.unigramRarity(docs(s, dir)) },
    "text_lm_bigram" -> { (s, dir) => TextAnalysis.bigramRarity(docs(s, dir)) },
    // stupid-backoff trigram LM vs a REFERENCE slice (src0-src4 train the
    // counts, everyone is scored): per-tier coverage + integer micro score
    "text_lm_backoff" -> { (s, dir) =>
      val d = docs(s, dir)
      TextAnalysis.trigramBackoff(
        d,
        d.filter(col("source").isin("src0", "src1", "src2", "src3", "src4")))
    },
    "text_winnow" -> { (s, dir) => TextAnalysis.winnowFingerprints(docs(s, dir)) },
    "text_reuse_pairs" -> { (s, dir) => TextAnalysis.winnowReusePairs(docs(s, dir)) },
    "text_collocations" -> { (s, dir) => TextAnalysis.collocations(docs(s, dir)) },
    // RAKE keyphrases: stopword-delimited candidate runs, integer
    // degree-div-freq word scores, phrase = sum of members, top-5/doc
    "text_keyphrases" -> { (s, dir) => TextAnalysis.keyphrases(docs(s, dir)) },
    // Flesch reading-ease over the lined corpus (the one with sentence
    // punctuation): exact integer milli, vowel-group syllables
    "text_readability" -> { (s, dir) => TextAnalysis.readability(linedDocs(s, dir)) },
    "text_hash_vectors" -> { (s, dir) => TextAnalysis.hashingVectors(docs(s, dir)) },
    // BPE tokenizer induction: 3 learn rounds unrolled into the oracle
    // (pair-count aggregate → arg-max → ·-delimited replace, like the
    // Lloyd loop — every round is engine-portable by construction)
    "text_bpe_merges" -> { (s, dir) => TextAnalysis.bpeMerges(docs(s, dir), nMerges = 3) },
    // the batched learner at batch = 2: 4 merges in 2 aggregate rounds,
    // greedy symbol-disjoint picks per round — the shape that makes
    // 10^3-merge tokenizer induction nMerges/batch jobs, not nMerges
    "text_bpe_merges_batched" -> { (s, dir) =>
      TextAnalysis.bpeMergesBatched(docs(s, dir), nMerges = 4, batch = 2)
    },
    // the learned merges APPLIED: per-doc BPE token counts (the honest
    // tokens-per-doc measure once a tokenizer exists; whitespace-proxy
    // counting stays text_tokens). The 3-row merge list is a plan literal.
    "text_bpe_tokens" -> { (s, dir) =>
      val d = docs(s, dir)
      val m = TextAnalysis.bpeMerges(d, nMerges = 3).collect()
        .map(r => (r.getString(1), r.getString(2)))
        .toSeq
      TextAnalysis.bpeTokenCount(d, m)
    },
    // Token-distribution drift with all three statuses planted: qqdrift
    // appears only in cur (new), qqgone only in prev (gone), qqshift 8x in
    // prev vs 1x in cur (shifted far below the 500-milli band edge).
    "corpus_token_drift" -> { (s, dir) =>
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val prev = d.select(
        col("doc_id"),
        concat(
          col("text"),
          when(col("doc_id") % 6 === 0, lit(" qqshift qqshift qqshift qqshift qqshift qqshift qqshift qqshift"))
            .otherwise(lit("")),
          when(col("doc_id") % 5 === 0, lit(" qqgone qqgone")).otherwise(lit(""))).as("text"))
      val cur = d
        .filter(col("doc_id") % 10 =!= 3)
        .select(
          col("doc_id"),
          concat(
            col("text"),
            when(col("doc_id") % 4 === 0, lit(" qqdrift qqdrift qqdrift")).otherwise(lit("")),
            when(col("doc_id") % 6 === 0, lit(" qqshift")).otherwise(lit(""))).as("text"))
      Corpus.tokenDrift(prev, cur)
    },
    // snapshot B: every 10th-mod-3 doc removed, every 7th-mod-2 edited,
    // every 8th re-ingested under a fresh id (mirrored in the oracle)
    "corpus_snapshot_diff" -> { (s, dir) =>
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val cur = d
        .filter(col("doc_id") % 10 =!= 3)
        .select(
          col("doc_id"),
          when(col("doc_id") % 7 === 2, concat(col("text"), lit(" edited v2")))
            .otherwise(col("text"))
            .as("text"))
        .unionAll(
          d.filter(col("doc_id") % 8 === 0)
            .select((col("doc_id") + 9000000).as("doc_id"), col("text")))
      Corpus.snapshotDiff(d, cur)
    },
    "text_search" -> { (s, dir) =>
      TextAnalysis.searchTopK(docs(s, dir), Seq("window", "merge", "scan"), k = 20)
    },
    // the PERSISTED search lifecycle: tokenize once into token-hash
    // bucketed postings, grow with a decoy batch through the staged
    // commit, tombstone the decoys, compact — the served query (whose
    // scan prunes to the query terms' buckets) must then be bit-identical
    // to tokenizing the corpus per query, so both faces share one oracle
    "text_search_persisted" -> { (s, dir) =>
      val d = docs(s, dir)
      val idx = s"${sys.props("java.io.tmpdir")}/graft_textidx_${ProcessHandle.current().pid()}"
      TextAnalysis.writeTextIndex(d, idx)
      val decoys = d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
      TextAnalysis.appendTextIndex(decoys, idx)
      TextAnalysis.deleteFromTextIndex(decoys.select("doc_id"), idx)
      TextAnalysis.compactTextIndex(s, idx)
      TextAnalysis.searchTextIndex(s, idx, Seq("window", "merge", "scan"), k = 20)
    },
    // the STREAMED index: three ingest generations with overlapping
    // resends (each batch re-sends part of the previous — the dedupe must
    // land every doc exactly once), then a mid-stream fold, then the same
    // served query — bit-identical to tokenize-per-query over the full
    // corpus, one oracle for all three faces
    "text_search_streamed" -> { (s, dir) =>
      val d = docs(s, dir)
      val idx = s"${sys.props("java.io.tmpdir")}/graft_textstream_${ProcessHandle.current().pid()}"
      TextAnalysis.ingestTextBatch(d.filter(col("doc_id") % 3 === 0), idx, 0L)
      TextAnalysis.ingestTextBatch(d.filter(col("doc_id") % 3 <= 1), idx, 1L)
      TextAnalysis.compactTextIndex(s, idx)
      TextAnalysis.ingestTextBatch(d, idx, 2L)
      TextAnalysis.searchTextIndex(s, idx, Seq("window", "merge", "scan"), k = 20)
    },
    // TIME-TRAVEL over the streamed index's generations: the same query
    // served as of generation 1 — generation 2's documents must be
    // invisible, INCLUDING in idf's N (historical doc count), so the
    // oracle scores over the doc_id%3<=1 prefix corpus only
    "text_search_asof" -> { (s, dir) =>
      val d = docs(s, dir)
      val idx = s"${sys.props("java.io.tmpdir")}/graft_textasof_${ProcessHandle.current().pid()}"
      TextAnalysis.ingestTextBatch(d.filter(col("doc_id") % 3 === 0), idx, 0L)
      TextAnalysis.ingestTextBatch(d.filter(col("doc_id") % 3 === 1), idx, 1L)
      TextAnalysis.ingestTextBatch(d, idx, 2L)
      TextAnalysis.searchTextIndexAsOf(s, idx, Seq("window", "merge", "scan"), 1L, k = 20)
    },
    // exact phrase occurrences per doc from positional postings of the
    // phrase's own terms — no positional self-join chain, one
    // distinct-slot aggregate over (doc, rebased position)
    "text_phrase_search" -> { (s, dir) =>
      TextAnalysis.phraseSearch(docs(s, dir), Seq("table", "scan"))
    },
    "text_repetition" -> { (s, dir) => TextAnalysis.repetition(docs(s, dir)) },
    "text_top_terms" -> { (s, dir) => TextAnalysis.topTerms(docs(s, dir)) },
    "text_langid" -> { (s, dir) => TextAnalysis.langId(docs(s, dir)) },
    // per-class precision/recall/F1 of the marker-token language ID
    // against the lang tag — zh has no latin markers, so its rows fall to
    // the declaration-order tie ('en') and show up as en false positives
    "text_langid_report" -> { (s, dir) =>
      graft.ops.Checks.classificationReport(
        TextAnalysis.langId(docs(s, dir), keepCols = Seq("lang")),
        truthCol = "lang",
        predCol = "lang_pred")
    },
    // the SAME report served from the streaming confusion-cell store:
    // three batches delivered out of order fold to the one-pass answer
    // (cell additivity), so this shares text_langid_report's oracle
    "text_langid_report_streamed" -> { (s, dir) =>
      val root =
        s"${sys.props("java.io.tmpdir")}/graft_confusion_${ProcessHandle.current().pid()}"
      val scored = TextAnalysis.langId(docs(s, dir), keepCols = Seq("lang"))
      graft.ops.Checks.ingestConfusionBatch(
        scored.filter(col("doc_id") % 3 === 1), root, 0L, "lang", "lang_pred")
      graft.ops.Checks.ingestConfusionBatch(
        scored.filter(col("doc_id") % 3 === 0), root, 1L, "lang", "lang_pred")
      graft.ops.Checks.ingestConfusionBatch(
        scored.filter(col("doc_id") % 3 === 2), root, 2L, "lang", "lang_pred")
      graft.ops.Checks.readClassificationReport(s, root)
    },
    "text_script" -> { (s, dir) => TextAnalysis.scriptProfile(docs(s, dir)) },
    "text_tokens" -> { (s, dir) => TextAnalysis.tokenStats(docs(s, dir)) },
    "events_window_agg" -> { (s, dir) =>
      val raw = s.read.parquet(s"$dir/events.parquet")
      raw
        .select(
          EventTime.tsTimestamp(raw).as("t"),
          col("event_type"),
          col("value"))
        .groupBy(window(col("t"), "1 hour").as("w"), col("event_type"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          sum(col("value").cast("decimal(14,2)")).as("sv"))
        .select(
          unix_micros(col("w.start")).as("window_start_us"),
          col("event_type"),
          col("n"),
          col("sv").cast("double").as("sum_value"))
    },
    "multimodal_features" -> { (s, dir) =>
      Multimodal
        .extractFeatures(s, Multimodal.asMedia(docs(s, dir), "text", "text/plain"))
        .toDF()
        .select("doc_id", "kind", "n_bytes", "media_md5")
    },
    "multimodal_decode_bmp" -> { (s, dir) =>
      Multimodal.bmpFeatures(bmpMedia(s, dir))
    },
    "multimodal_decode_wav" -> { (s, dir) =>
      Multimodal.wavFeatures(wavMedia(s, dir))
    },
    // the audio-quality gate: clipping / silence / DC-offset shares per
    // clip, exact integer arithmetic over the decoded PCM16 samples
    "multimodal_wav_quality" -> { (s, dir) =>
      Multimodal.wavQuality(wavMedia(s, dir))
    },
    "multimodal_ahash" -> { (s, dir) =>
      Multimodal.bmpAHashes(bmpMedia(s, dir))
    },
    // every 25th image re-ingested under a fresh id (hash copied, so the
    // planted pair is exact: hamming 0) — mirrored in the oracle
    "multimodal_ahash_pairs" -> { (s, dir) =>
      val base = Multimodal.bmpAHashes(bmpMedia(s, dir))
      val dupped = base.unionAll(
        base
          .filter(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("hash_hi"), col("hash_lo")))
      Dedup.aHashPairs(dupped)
    },
    "multimodal_wav_zc" -> { (s, dir) => Multimodal.wavZc(wavMedia(s, dir)) },
    "multimodal_wav_fp" -> { (s, dir) => Multimodal.wavFingerprints(wavMedia(s, dir)) },
    // audio near-dup: every 25th clip re-ingested under a fresh id (an
    // exact re-upload — fingerprint copied); Hamming-banded pairs over the
    // 64-bit waveform fingerprints, the same machinery as the image hashes
    "multimodal_wav_pairs" -> { (s, dir) =>
      val base = Multimodal.wavFingerprints(wavMedia(s, dir))
      val dupped = base.unionAll(
        base
          .filter(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("hash_hi"), col("hash_lo")))
      Dedup.aHashPairs(dupped)
    },
    "multimodal_resize_bmp" -> { (s, dir) =>
      Multimodal.bmpResized(bmpMedia(s, dir), tw = 2, th = 2)
    },
    "multimodal_frame_sample" -> { (s, dir) =>
      Multimodal.frameSamples(videoMedia(s, dir), every = 2)
    },
    "multimodal_scene_cuts" -> { (s, dir) =>
      Multimodal.sceneCuts(videoMedia(s, dir))
    },
    // every 25th clip re-ingested under a fresh id (frame hashes copied:
    // an exact re-upload) — clip-level dedup over keyframe hashes. The
    // hash table is materialized ONCE before the union: both branches
    // read it, and re-deriving it means re-running the frame decode —
    // the same once-per-ingest materialization a production re-ingest
    // union needs at scale.
    "multimodal_clip_pairs" -> { (s, dir) =>
      val base = Multimodal.frameAHashes(videoMedia(s, dir), every = 2).localCheckpoint()
      val dupped = base.unionAll(
        base
          .filter(col("doc_id") % 25 === 0)
          .select(
            (col("doc_id") + 1000000).as("doc_id"),
            col("frame_id"), col("hash_hi"), col("hash_lo")))
      Dedup.clipPairs(dupped)
    },
    // persisted media fingerprint index, FULL lifecycle in the timed
    // query: build over the image+audio corpus, append decoy items,
    // tombstone + compact them away, then probe a batch of re-uploads
    // (every 25th item under fresh ids). Each re-upload must match its
    // original at hamming 0 (plus any natural near-dups within 3); a
    // leaked decoy (+7M match ids) breaks the hash.
    "media_index_probe" -> { (s, dir) =>
      val idx = s"${sys.props("java.io.tmpdir")}/graft_media_idx_${ProcessHandle.current().pid()}"
      val history = bmpMedia(s, dir).unionByName(wavMedia(s, dir))
      Multimodal.writeMediaIndex(history, idx)
      val decoys = history
        .filter(col("doc_id") % 7 === 3)
        .select((col("doc_id") + 7000000).as("doc_id"), col("kind"), col("n_bytes"), col("media"))
      Multimodal.appendMediaIndex(decoys, idx)
      graft.ops.Similarity.deleteFromIndex(decoys.select("doc_id"), idx, idCol = "doc_id")
      Multimodal.compactMediaIndex(s, idx)
      val batch = history
        .filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("kind"), col("n_bytes"), col("media"))
      Multimodal.probeMediaIndex(s, idx, batch)
    },
    // the built-in session_window face of sessionization: gap-merged
    // windows computed declaratively (split at gap >= 30 min — the
    // overlap rule; the custom stateful sessionize splits at gap > 30 min)
    "events_session_window" -> { (s, dir) =>
      val raw = s.read.parquet(s"$dir/events.parquet")
      raw
        .select(
          col("user_id").cast("long").as("user_id"),
          EventTime.tsTimestamp(raw).as("t"))
        .groupBy(col("user_id"), session_window(col("t"), "30 minutes").as("w"))
        .agg(count(lit(1)).cast("long").as("n_events"))
        .select(
          col("user_id"),
          col("w.start").cast("long").as("session_start"),
          col("w.end").cast("long").as("session_end"),
          col("n_events"))
    },
    "sessionize" -> { (s, dir) =>
      import s.implicits._
      val raw = s.read.parquet(s"$dir/events.parquet")
      val ev = raw
        .select(
          col("user_id").cast("long").as("user_id"),
          EventTime.tsSecs(raw).as("ts_secs"))
        .as[graft.streaming.Evt]
      graft.streaming.EventsStream.sessionizeBatch(ev, gapSecs = 1800)
    },
    "text_chunk" -> { (s, dir) => TextAnalysis.chunkTokens(docs(s, dir)) },
    "text_chunks_cdc" -> { (s, dir) => TextAnalysis.chunkContentDefined(docs(s, dir)) },
    "text_boilerplate" -> { (s, dir) =>
      TextAnalysis.boilerplateLines(linedDocs(s, dir), maxDocs = 20)
    },
    "text_quality_classifier" -> { (s, dir) => TextAnalysis.linearScore(docs(s, dir)) },
    // reliability diagram of "stopword density as P(english)" against the
    // actual lang tag: the score is an exact trunc-div milli ratio (so the
    // bin edge never rides a float), 10 equal bins, conf-vs-accuracy gap
    // Cramer's V^2 between the lang tag and the source id: does source
    // determine language — effect size, not just a chi^2 that grows
    // with n; exact per-cell rational milli terms
    "stats_cramers_v" -> { (s, dir) =>
      graft.ops.Stats.cramersV2(docs(s, dir), "lang", "source")
    },
    "quality_calibration" -> { (s, dir) =>
      val tk = TextAnalysis.tokens(col("text"))
      val sm = expr(
        s"(1000 * size(filter(__tk, t -> t IN (${TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")})))) " +
          "div greatest(size(__tk), 1)")
      val scored = docs(s, dir)
        .withColumn("__tk", tk)
        .select(
          (sm.cast("double") / 1000.0).as("score"),
          (col("lang") === "en").as("label"))
      graft.ops.Stats.calibrationBins(scored, "score", "label", nBins = 10)
    },
    "corpus_datacard" -> { (s, dir) => Corpus.datacard(docs(s, dir)) },
    "embedding_pq" -> { (s, dir) => Similarity.pqCodes(embs(s, dir)) },
    "similarity_topk_pq" -> { (s, dir) =>
      val e = embs(s, dir)
      Similarity.pqTopK(e.filter(col("vec_id") < 8), e, k = 5)
    },
    // lifecycle face of PQ: persisted codebook + code table probed from
    // disk, hash-equal to similarity_topk_pq (same oracle); see the IVF
    // twin above for why the build is inside the timed query
    "similarity_topk_pq_persisted" -> { (s, dir) =>
      val e = embs(s, dir)
      // per-process scratch path + overwrite — see similarity_topk_ivf_persisted
      val idx = s"${sys.props("java.io.tmpdir")}/graft_pq_idx_${ProcessHandle.current().pid()}"
      Similarity.writePqIndex(e, idx)
      Similarity.probePqIndex(s, idx, e.filter(col("vec_id") < 8), k = 5)
    },
    // FULL lifecycle: build → append noise vectors → tombstone-delete
    // exactly those → compact → probe. The compacted store must be
    // byte-for-byte indistinguishable to the probe from a clean build, so
    // this row shares similarity_topk_ivf's oracle — any leak of appended
    // rows (delete ignored), lost base rows (compaction dropped live
    // data), or stale tombstones shows up as a hash mismatch. Build +
    // maintenance ride in the timed query, as with the persisted faces.
    "similarity_topk_ivf_compacted" -> { (s, dir) =>
      val e = embs(s, dir)
      val idx = s"${sys.props("java.io.tmpdir")}/graft_ivf_cidx_${ProcessHandle.current().pid()}"
      Similarity.writeIvfIndex(e, idx)
      val extra = e
        .filter(col("vec_id") % 20 === 0)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
      Similarity.appendIvfIndex(extra, idx)
      Similarity.deleteFromIndex(extra.select("vec_id"), idx)
      Similarity.compactIvfIndex(s, idx)
      Similarity.probeIvfIndex(s, idx, e.filter(col("vec_id") < 8), k = 5)
    },
    // the COMPOSED coarse-cells + compressed-codes index (FAISS's IVFADC
    // shape, residual-free): full lifecycle in the timed query — build,
    // append decoys, tombstone, compact, probe. A probe touches
    // nProbe/nCentroids of the corpus AND reads m bytes per candidate.
    "similarity_topk_ivfpq" -> { (s, dir) =>
      val e = embs(s, dir)
      val idx = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_idx_${ProcessHandle.current().pid()}"
      Similarity.writeIvfPqIndex(e, idx)
      val extra = e
        .filter(col("vec_id") % 20 === 0)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
      Similarity.appendIvfPqIndex(extra, idx)
      Similarity.deleteFromIndex(extra.select("vec_id"), idx)
      Similarity.compactIvfPqIndex(s, idx)
      Similarity.probeIvfPqIndex(s, idx, e.filter(col("vec_id") < 8), k = 5)
    },
    // RETRAIN lifecycle, acting on the drift signal: build the quantizer
    // over a PARTIAL corpus (a deliberately stale quantizer), append the
    // rest plus decoys under the frozen centroids, tombstone the decoys,
    // then retrainIvfIndex — which retrains k-means from the live
    // tombstone-subtracted CELL content (never re-reading the corpus) and
    // re-assigns in one tmp-and-swap. The live set is exactly the full
    // corpus, so the probe must hash-equal a clean build-from-scratch
    // (similarity_topk_ivf's oracle): a leaked decoy, a lost appended
    // vector, or a quantizer trained on stale content breaks the hash.
    "similarity_topk_ivf_retrained" -> { (s, dir) =>
      val e = embs(s, dir)
      val idx = s"${sys.props("java.io.tmpdir")}/graft_ivf_ridx_${ProcessHandle.current().pid()}"
      Similarity.writeIvfIndex(e.filter(col("vec_id") % 3 =!= 2), idx)
      Similarity.appendIvfIndex(e.filter(col("vec_id") % 3 === 2), idx)
      val decoys = e
        .filter(col("vec_id") % 5 === 1)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
      Similarity.appendIvfIndex(decoys, idx)
      Similarity.deleteFromIndex(decoys.select("vec_id"), idx)
      Similarity.retrainIvfIndex(s, idx)
      Similarity.probeIvfIndex(s, idx, e.filter(col("vec_id") < 8), k = 5)
    },
    // the compressed-domain retrain: PQ codes are lossy, so the codebook
    // retrains from the supplied full-precision corpus restricted to the
    // index's live id set (decoys tombstoned away) — probe must
    // hash-equal a clean writePqIndex over the full corpus
    "similarity_topk_pq_retrained" -> { (s, dir) =>
      val e = embs(s, dir)
      val idx = s"${sys.props("java.io.tmpdir")}/graft_pq_ridx_${ProcessHandle.current().pid()}"
      Similarity.writePqIndex(e.filter(col("vec_id") % 3 =!= 2), idx)
      Similarity.appendPqIndex(e.filter(col("vec_id") % 3 === 2), idx)
      val decoys = e
        .filter(col("vec_id") % 5 === 1)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
      Similarity.appendPqIndex(decoys, idx)
      Similarity.deleteFromIndex(decoys.select("vec_id"), idx)
      Similarity.retrainPqIndex(s, idx, e)
      Similarity.probePqIndex(s, idx, e.filter(col("vec_id") < 8), k = 5)
    },
    // composed-index retrain: stale coarse+PQ quantizers (trained on 2/3
    // of the corpus), the rest + decoys appended frozen, decoys
    // tombstoned, then retrainIvfPqIndex rebuilds BOTH quantizers from
    // the live id set — the probe must hash-equal the clean build
    "similarity_topk_ivfpq_retrained" -> { (s, dir) =>
      val e = embs(s, dir).select(col("vec_id"), col("embedding"))
      val idx = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_ridx_${ProcessHandle.current().pid()}"
      Similarity.writeIvfPqIndex(e.filter(col("vec_id") % 3 =!= 2), idx)
      Similarity.appendIvfPqIndex(e.filter(col("vec_id") % 3 === 2), idx)
      val decoys = e
        .filter(col("vec_id") % 5 === 1)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
      Similarity.appendIvfPqIndex(decoys, idx)
      Similarity.deleteFromIndex(decoys.select("vec_id"), idx)
      Similarity.retrainIvfPqIndex(s, idx, e)
      Similarity.probeIvfPqIndex(s, idx, e.filter(col("vec_id") < 8), k = 5)
    },
    // the compressed-domain twin of similarity_topk_ivf_compacted
    "similarity_topk_pq_compacted" -> { (s, dir) =>
      val e = embs(s, dir)
      val idx = s"${sys.props("java.io.tmpdir")}/graft_pq_cidx_${ProcessHandle.current().pid()}"
      Similarity.writePqIndex(e, idx)
      val extra = e
        .filter(col("vec_id") % 20 === 0)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
      Similarity.appendPqIndex(extra, idx)
      Similarity.deleteFromIndex(extra.select("vec_id"), idx)
      Similarity.compactPqIndex(s, idx)
      Similarity.probePqIndex(s, idx, e.filter(col("vec_id") < 8), k = 5)
    },
    // Streaming-ingest census + drift audit, oracle-checked end to end:
    // three ingest batches (batch 0 trains the k-means quantizer over the
    // full corpus; batches 1-2 re-ingest planted slices under fresh ids)
    // land batch-keyed cell dirs, then the audit reports per-cell live
    // counts, contributing-generation counts, and the drift of a probe
    // slice against the frozen quantizer — the "compact yet? retrain
    // yet?" dashboard row, driver-verified.
    "ann_index_audit" -> { (s, dir) =>
      val e = embs(s, dir).select(col("vec_id"), col("embedding"))
      val idx = s"${sys.props("java.io.tmpdir")}/graft_ivf_ingest_${ProcessHandle.current().pid()}"
      Similarity.ingestIvfBatch(e, idx, 0L)
      Similarity.ingestIvfBatch(
        e.filter(col("vec_id") % 7 === 1)
          .select((col("vec_id") + 1000000).as("vec_id"), col("embedding")),
        idx, 1L)
      Similarity.ingestIvfBatch(
        e.filter(col("vec_id") % 5 === 0)
          .select((col("vec_id") + 2000000).as("vec_id"), col("embedding")),
        idx, 2L)
      Similarity.annIndexAudit(s, idx, e.filter(col("vec_id") % 10 === 3))
    },
    // the drift signal ACTED ON: a planted distribution collapse (every
    // batch vector lands on one constant direction → one cell) pushes the
    // total-variation score over the threshold at every scale, so the
    // conditional face measures, decides, and RETRAINS the quantizer from
    // live content, returning the decision row — the unattended retrain
    // loop end to end (store ≡ clean build is pinned by OpsSpec)
    "ann_retrain_if_drifted" -> { (s, dir) =>
      val e = embs(s, dir).select(col("vec_id"), col("embedding"))
      val idx = s"${sys.props("java.io.tmpdir")}/graft_ivf_rbd_${ProcessHandle.current().pid()}"
      Similarity.writeIvfIndex(e, idx)
      val e1 = array((0 until 64).map(i => lit(if (i == 0) 1.0f else 0.0f)): _*)
      val drifted = e
        .filter(col("vec_id") % 10 === 3)
        .select(col("vec_id"), e1.as("embedding"))
      Similarity.retrainIvfIfDrifted(s, idx, drifted, thresholdMilli = 300L)
    },
    // the CODEBOOK's drift loop (the index whose recall decays silently):
    // a planted norm shift (every batch vector scaled 3x — an upstream
    // encoder changed its scale) inflates the batch's reconstruction
    // error far past the stored training baseline at every sf, so the
    // conditional face measures, decides, and retrains the codebook from
    // the full-precision corpus, returning the decision row (store ≡
    // clean build pinned by OpsSpec)
    "ann_pq_retrain_if_drifted" -> { (s, dir) =>
      val e = embs(s, dir).select(col("vec_id"), col("embedding"))
      val idx = s"${sys.props("java.io.tmpdir")}/graft_pq_rbd_${ProcessHandle.current().pid()}"
      Similarity.writePqIndex(e, idx)
      val drifted = e
        .filter(col("vec_id") % 10 === 3)
        .select(
          col("vec_id"),
          transform(col("embedding"), x => x * lit(3.0f)).as("embedding"))
      Similarity.retrainPqIfDrifted(s, idx, drifted, e)
    },
    // the COMPOSED store's codebook-drift loop: same global codebook,
    // same 3x norm-shift fixture, but the action retrains BOTH
    // quantizers through retrainIvfPqIndex (store ≡ clean build pinned
    // by OpsSpec); the decision row is identical to the flat-PQ face by
    // construction, and the shared oracle asserts exactly that
    "ann_ivfpq_retrain_if_drifted" -> { (s, dir) =>
      val e = embs(s, dir).select(col("vec_id"), col("embedding"))
      val idx = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_rbd_${ProcessHandle.current().pid()}"
      Similarity.writeIvfPqIndex(e, idx)
      val drifted = e
        .filter(col("vec_id") % 10 === 3)
        .select(
          col("vec_id"),
          transform(col("embedding"), x => x * lit(3.0f)).as("embedding"))
      Similarity.retrainIvfPqIfDrifted(s, idx, drifted, e)
    },
    // measured recall@k at the configured nProbe — the quality dial next
    // to ann_index_audit's freshness dial: build the persisted k-means
    // IVF index, probe a bounded deterministic query sample (vec_id < 8)
    // at nProbe=4, and score it against exact brute force over the
    // index's live content. Both sides are deterministic (integer-milli
    // Lloyd + rounded cosine), so per-query recall is hash-checked.
    "ann_recall_audit" -> { (s, dir) =>
      val e = embs(s, dir)
      val idx = s"${sys.props("java.io.tmpdir")}/graft_ivf_recall_${ProcessHandle.current().pid()}"
      Similarity.writeIvfIndex(e, idx)
      Similarity.ivfRecallAudit(s, idx, e.filter(col("vec_id") < 8), k = 5, nProbe = 4)
    },
    // the recall dial CLOSED-LOOP: autoTuneNProbe picks the minimal
    // nProbe meeting a 950-milli recall target on a fresh store AND on a
    // deliberately stale one (quantizer trained on coordinate-rotated
    // vectors, the real corpus appended frozen, rotated content
    // tombstoned) — the stale store must need MORE cells probed for the
    // same target, its search WARM-STARTED from the fresh store's answer
    // (the operational loop: yesterday's knob seeds today's), and each
    // row echoes what the recall costs (candidates_scored, the pairs the
    // chosen probe exact-scores); the oracle derives minima and costs by
    // scanning every p in 1..16 (equivalent to the operator's
    // hint-seeded ladder + binary search by recall monotonicity)
    "ann_autotune_nprobe" -> { (s, dir) =>
      val e = embs(s, dir).select(col("vec_id"), col("embedding"))
      val qs = e.filter(col("vec_id") < 8)
      val pid = ProcessHandle.current().pid()
      val fresh = s"${sys.props("java.io.tmpdir")}/graft_tune_f_$pid"
      val stale = s"${sys.props("java.io.tmpdir")}/graft_tune_s_$pid"
      Similarity.writeIvfIndex(e, fresh)
      val rot = e.select(
        (col("vec_id") + 1000000L).as("vec_id"),
        expr("concat(slice(embedding, 2, 63), slice(embedding, 1, 1))").as("embedding"))
      // the stale store via the train/add split: quantizer trained on
      // the rotated vectors, cells holding the REAL corpus — the same
      // final state the old build+append+tombstone construction reached,
      // minus the wasted writes (that lifecycle is pinned by the
      // similarity_topk_ivf_* rows and the writeIvfIndexTrained spec)
      Similarity.writeIvfIndexTrained(e, rot, stale)
      // both stores' LIVE set is exactly e, so the exact ground truth is
      // shared — one |sample|×|corpus| scan, not one per store
      val exact = Similarity.bruteForceTopK(qs, e, k = 5).localCheckpoint()
      val freshRow = Similarity.autoTuneNProbe(s, fresh, qs, k = 5, exactTopK = Some(exact))
      // the tuner's output is a 1-row LOCAL relation (the search already
      // ran), so this hint read costs no job — bounded by contract
      val hint = freshRow.select("n_probe").head().getLong(0).toInt
      freshRow.withColumn("store", lit("fresh"))
        .unionAll(
          Similarity.autoTuneNProbe(s, stale, qs, k = 5, nProbeHint = hint,
            exactTopK = Some(exact))
            .withColumn("store", lit("stale")))
        .select(
          "store", "n_centroids", "n_probe", "recall_milli",
          "target_milli", "n_queries", "exhaustive", "candidates_scored")
    },
    // the BUILD-TIME knob closed: three real IVF builds (4/8/16
    // centroids), each nProbe-tuned to the same 950-milli target against
    // ONE shared exact baseline (warm-started rung to rung), and the
    // chosen rung is the cheapest probe meeting the SLO (min
    // candidates_scored, ties to the coarser build) — the full
    // trade-off table is returned. Every rung TRAINS on the bounded
    // vec_id%3!=0 sample and assigns the full corpus (the
    // writeIvfIndexTrained split — at 100 TB the ladder must not pay
    // |ladder| full-corpus Lloyd runs); the oracle re-derives every rung
    // by running its Lloyd chain over the SAME sample, assigning the
    // full corpus, and scanning p in 1..nc
    "ann_autotune_build" -> { (s, dir) =>
      val e = embs(s, dir).select(col("vec_id"), col("embedding"))
      val qs = e.filter(col("vec_id") < 8)
      val work = s"${sys.props("java.io.tmpdir")}/graft_tune_build_${ProcessHandle.current().pid()}"
      Similarity.autoTuneIvfBuild(
        s, work, e, qs, k = 5,
        trainSet = Some(e.filter(col("vec_id") % 3 =!= 0)))
    },
    // the PQ face of the recall dial: the compressed-domain ADC probe
    // scored against exact brute force over the same corpus — what the
    // 16x memory cut actually costs in recall, per query, hash-checked
    "ann_recall_audit_pq" -> { (s, dir) =>
      val e = embs(s, dir)
      val idx = s"${sys.props("java.io.tmpdir")}/graft_pq_recall_${ProcessHandle.current().pid()}"
      Similarity.writePqIndex(e, idx)
      Similarity.annRecallAudit(
        Similarity.probePqIndex(s, idx, e.filter(col("vec_id") < 8), k = 5),
        Similarity.bruteForceTopK(e.filter(col("vec_id") < 8), e, k = 5),
        k = 5)
    },
    // the ORDER-AWARE quality dial recall ignores: MRR + NDCG@5 of the
    // IVF probe against the exact top-5 as binary relevance — two probes
    // with equal recall can still rank the best neighbor first vs last;
    // position weights are driver-pinned integers, so the whole metric
    // hash-checks
    "ann_ranking_audit" -> { (s, dir) =>
      val e = embs(s, dir)
      val idx = s"${sys.props("java.io.tmpdir")}/graft_ivf_rank_${ProcessHandle.current().pid()}"
      Similarity.writeIvfIndex(e, idx)
      Similarity.rankingAudit(
        Similarity.probeIvfIndex(s, idx, e.filter(col("vec_id") < 8), k = 5),
        Similarity.bruteForceTopK(e.filter(col("vec_id") < 8), e, k = 5)
          .select("query_id", "neighbor_id"),
        k = 5)
    },
    // the COMPOSED recall dial: cell pruning AND coded distances stacked —
    // the number an IVFADC deployment actually ships (<= either stage's
    // recall alone). Ground truth is exact brute force over the
    // full-precision corpus restricted to the index's live ids, through
    // the same comparator; per-query recall hash-checked end to end.
    "ann_recall_audit_ivfpq" -> { (s, dir) =>
      val e = embs(s, dir)
      val idx = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_recall_${ProcessHandle.current().pid()}"
      Similarity.writeIvfPqIndex(e, idx)
      Similarity.ivfPqRecallAudit(s, idx, e, e.filter(col("vec_id") < 8), k = 5, nProbe = 4)
    },
    "embedding_diversity" -> { (s, dir) => Similarity.diversity(embs(s, dir)) },
    "dedup_url" -> { (s, dir) => TextAnalysis.urlCanonicalGroups(urlDupDocs(s, dir)) },
    // containment fixture: every 10th doc fully re-inserted (all chunks
    // shared) and every 7th-mod-3 doc re-published as its first-56-token
    // prefix + a fresh tail (shares the first two chunk windows when the
    // source is long enough) — mirrored in the oracle
    "dedup_chunk_overlap" -> { (s, dir) =>
      TextAnalysis.chunkOverlapPairs(containCorpus(s, dir))
    },
    // span-level exact-substring dedup over the containment corpus: the
    // planted full clones light up whole-doc spans, the 56-token prefix
    // republishes light up the shared prefix in source and copy
    "text_dup_spans" -> { (s, dir) =>
      TextAnalysis.dupSpans(containCorpus(s, dir))
    },
    // the action over the spans: every doc rewritten with its duplicated
    // runs excised (full corpus back, n_removed = 0 for untouched docs)
    "text_strip_dup_spans" -> { (s, dir) =>
      TextAnalysis.stripDupSpans(containCorpus(s, dir))
    },
    // span-level eval decontamination: every 5th doc plays the benchmark;
    // planted leaks are 30-token benchmark prefixes republished into the
    // corpus under fresh ids — their spans (plus any natural phrase
    // overlap) must surface
    "contamination_spans" -> { (s, dir) =>
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val bench = d.filter(col("doc_id") % 5 === 2)
      val leaks = d
        .filter(col("doc_id") % 10 === 2)
        .select(
          (col("doc_id") + 3000000L).as("doc_id"),
          concat(
            concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 1, 30)),
            lit(" leak tail "),
            col("doc_id").cast("string")).as("text"))
      TextAnalysis.crossDupSpans(d.filter(col("doc_id") % 5 =!= 2).unionAll(leaks), bench)
    },
    // the ACTION over contamination_spans: the same corpus back with its
    // benchmark-leaked spans excised (targeted decontamination — the doc
    // survives, the leak does not)
    "contamination_strip" -> { (s, dir) =>
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val bench = d.filter(col("doc_id") % 5 === 2)
      val leaks = d
        .filter(col("doc_id") % 10 === 2)
        .select(
          (col("doc_id") + 3000000L).as("doc_id"),
          concat(
            concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 1, 30)),
            lit(" leak tail "),
            col("doc_id").cast("string")).as("text"))
      TextAnalysis.stripContamination(d.filter(col("doc_id") % 5 =!= 2).unionAll(leaks), bench)
    },
    // incremental span dedup, FULL index lifecycle in the timed query:
    // build the gram index over history, append decoy docs that would
    // wrongly mark every fresh-tail batch doc whole, tombstone + compact
    // them away, then probe. The result must equal dupSpans over
    // history UNION batch restricted to batch rows (the probe contract) —
    // a leaked decoy or lost history posting breaks the hash.
    "text_dup_spans_incremental" -> { (s, dir) =>
      val p = s"${sys.props("java.io.tmpdir")}/graft_gram_idx_${ProcessHandle.current().pid()}"
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val batch = d
        .filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        .unionAll(
          d.filter(col("doc_id") % 10 === 5)
            .select(
              (col("doc_id") + 2000000L).as("doc_id"),
              concat(col("text"), lit(" fresh crawl "), col("doc_id").cast("string"))
                .as("text")))
      TextAnalysis.writeGramIndex(d, p)
      val decoys = batch
        .filter(col("doc_id") >= 2000000L)
        .select((col("doc_id") + 7000000L).as("doc_id"), col("text"))
      TextAnalysis.appendGramIndex(decoys, p)
      graft.ops.Similarity.deleteFromIndex(decoys.select("doc_id"), p, idCol = "doc_id")
      TextAnalysis.compactGramIndex(s, p)
      TextAnalysis.probeDupSpans(s, p, batch)
    },
    // threshold 600 so both planted kinds act: full clones (1000 milli)
    // and 3-chunk prefix republishes sharing 2 chunks (666 milli)
    "dedup_containment" -> { (s, dir) =>
      TextAnalysis.containmentDrops(containCorpus(s, dir), minContainMilli = 600)
    },
    "corpus_split_cluster_safe" -> { (s, dir) =>
      Corpus.clusterSafeSplitFromClusters(docs(s, dir), clusterMap(s, dir))
    },
    "corpus_split_leakage" -> { (s, dir) => Corpus.splitLeakage(docs(s, dir)) },
    "corpus_balanced_shards" -> { (s, dir) => Corpus.balancedShards(docs(s, dir)) },
    "text_fluency_gate" -> { (s, dir) => Corpus.fluencyGate(docs(s, dir)) },
    // one unigram term + one bigram phrase exercises both length classes
    "corpus_blocklist" -> { (s, dir) =>
      Corpus.blocklistHits(docs(s, dir), Seq("dup", "slow scan"))
    },
    // drift fixture: cur drops every 10th-mod-3 vector and re-inserts
    // every 7th-mod-1 under new ids — mirrored in the oracle
    "embedding_cell_drift" -> { (s, dir) =>
      val e = embs(s, dir).select(col("vec_id"), col("embedding"))
      val cur = e
        .filter(col("vec_id") % 10 =!= 3)
        .unionAll(
          e.filter(col("vec_id") % 7 === 1)
            .select((col("vec_id") + 1000000).as("vec_id"), col("embedding")))
      Similarity.cellDrift(e, cur)
    }
  )

  /** Planted partial-overlap corpus shared by the chunk-dedup queries:
    * the documents table plus full clones (doc_id + 1e6) of every 10th
    * doc and prefix republishes (doc_id + 2e6, first 56 tokens + fresh
    * tail) of every 7th-mod-3 doc.
    */
  private def containCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val pre = d
      .filter(col("doc_id") % 7 === 3)
      .select(
        (col("doc_id") + 2000000).as("doc_id"),
        concat(
          concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 1, 56)),
          lit(" zz tail "),
          col("doc_id").cast("string")).as("text"))
    d.unionAll(
      d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      .unionAll(pre)
  }

  // ---- oracle SQL ----

  /** (id, tok) distinct token sets + per-doc token lists, as CTEs. */
  private val tokCtes =
    """tokraw AS (
      |  SELECT doc_id AS id, unnest(string_split_regex(lower(text), '\s+')) AS tok
      |  FROM documents),
      |tok AS (SELECT DISTINCT id, tok FROM tokraw WHERE tok <> ''),
      |tks AS (
      |  SELECT doc_id, text,
      |         list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS tk
      |  FROM documents)""".stripMargin

  private val stopList = TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")

  /** Shared by `embedding_pq` / `similarity_topk_pq`: milli-int vectors,
    * the 8-seed 4-subspace PQ codebook, subvectors, and all (vector,
    * centroid) squared-L2 distances — mirrors [[graft.ops.Similarity.pqCodes]].
    */
  /** One unrolled BPE learn round K: weighted adjacent-pair counts over
    * the round-(K-1) vocabulary, the deterministic arg-max (count desc,
    * pair asc), and the delimiter-safe replace producing round K's
    * vocabulary. Mirrors TextAnalysis.bpeMerges exactly, including the
    * shared-delimiter non-overlap semantics of replace().
    */
  private def bpeRoundCte(k: Int): String = {
    val prev = s"s${k - 1}"
    s"""p$k AS (
       |  SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
       |    SELECT freq,
       |           unnest(list_transform(range(1, len(sy)), j -> sy[j] || ' ' || sy[j+1])) AS pair
       |    FROM (SELECT freq, list_filter(string_split(s, '·'), x -> x <> '') AS sy
       |          FROM $prev) t) u
       |  GROUP BY 1),
       |m$k AS (SELECT pair, cnt FROM p$k ORDER BY cnt DESC, pair LIMIT 1),
       |s$k AS (
       |  SELECT freq, replace(s,
       |    '·' || (SELECT split_part(pair, ' ', 1) FROM m$k) || '·' ||
       |           (SELECT split_part(pair, ' ', 2) FROM m$k) || '·',
       |    '·' || (SELECT replace(pair, ' ', '') FROM m$k) || '·') AS s
       |  FROM $prev)""".stripMargin
  }

  /** One unrolled BATCHED BPE round K (mirrors
    * TextAnalysis.bpeMergesBatched at batch = 2): the round's shared pair
    * counts, greedy pick A (count desc, pair asc), greedy pick B — the
    * best pair whose symbols AND concatenation avoid A's symbols and
    * concatenation (the full non-interaction ban) — and one rewrite
    * applying both (A then B, commuting under the ban). CTEs are
    * MATERIALIZED:
    * a/b are referenced several times each and DuckDB inlines CTEs by
    * default, which re-expands the whole prior-round chain per reference
    * (the round-14 fd-exhaustion lesson). An absent B (no disjoint pair)
    * degrades to a no-op replace via a sentinel no-match pattern.
    */
  private def bpeBatchedRoundCte(k: Int): String = {
    val prev = if (k == 1) "s0" else s"bs${k - 1}"
    s"""bp$k AS MATERIALIZED (
       |  SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
       |    SELECT freq,
       |           unnest(list_transform(range(1, len(sy)), j -> sy[j] || ' ' || sy[j+1])) AS pair
       |    FROM (SELECT freq, list_filter(string_split(s, '·'), x -> x <> '') AS sy
       |          FROM $prev) t) u
       |  GROUP BY 1),
       |ba$k AS MATERIALIZED (SELECT pair, cnt FROM bp$k ORDER BY cnt DESC, pair LIMIT 1),
       |ban$k AS MATERIALIZED (
       |  SELECT split_part(pair, ' ', 1) AS s FROM ba$k
       |  UNION ALL SELECT split_part(pair, ' ', 2) FROM ba$k
       |  UNION ALL SELECT replace(pair, ' ', '') FROM ba$k),
       |bb$k AS MATERIALIZED (
       |  SELECT pair, cnt FROM bp$k
       |  WHERE split_part(pair, ' ', 1) NOT IN (SELECT s FROM ban$k)
       |    AND split_part(pair, ' ', 2) NOT IN (SELECT s FROM ban$k)
       |    AND replace(pair, ' ', '') NOT IN (SELECT s FROM ban$k)
       |  ORDER BY cnt DESC, pair LIMIT 1),
       |bs$k AS MATERIALIZED (
       |  SELECT freq, replace(replace(s,
       |    (SELECT '·' || split_part(pair, ' ', 1) || '·' || split_part(pair, ' ', 2) || '·' FROM ba$k),
       |    (SELECT '·' || replace(pair, ' ', '') || '·' FROM ba$k)),
       |    COALESCE((SELECT '·' || split_part(pair, ' ', 1) || '·' || split_part(pair, ' ', 2) || '·' FROM bb$k), chr(1)),
       |    COALESCE((SELECT '·' || replace(pair, ' ', '') || '·' FROM bb$k), chr(1))) AS s
       |  FROM $prev)""".stripMargin
  }

  /** Shared BPE oracle chain: word frequencies (delimiter/marker-unsafe
    * words excluded, as in the operator), round-0 symbol strings, and
    * three unrolled learn rounds ending in m1..m3 / s3.
    */
  private lazy val bpeCtes: String =
    s"""$tokCtes,
       |wf AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(tk) AS w FROM tks) t
       |  WHERE w NOT LIKE '%·%' AND w NOT LIKE '%<%' AND w NOT LIKE '%>%'
       |  GROUP BY 1),
       |s0 AS (
       |  SELECT freq,
       |         '·' || array_to_string(list_append(list_transform(range(1, len(w) + 1),
       |                i -> w[i:i]), '</w>'), '·') || '·' AS s
       |  FROM wf),
       |${bpeRoundCte(1)},
       |${bpeRoundCte(2)},
       |${bpeRoundCte(3)}""".stripMargin

    private lazy val pqDriftOracleSql: String =
    s"""WITH $pqCtes,
         |mind AS (SELECT vec_id, subspace, MIN(dist) AS d FROM pqd GROUP BY 1, 2),
         |base AS (SELECT SUM(d) AS s, CAST(COUNT(*) // 4 AS BIGINT) AS n FROM mind),
         |bpe AS (
         |  SELECT vec_id,
         |         list_transform(embedding,
         |           x -> CAST(round(CAST(CAST(x * CAST(3.0 AS FLOAT) AS FLOAT) AS DOUBLE)
         |                           * 1000, 0) AS BIGINT)) AS vm
         |  FROM embeddings WHERE vec_id % 10 = 3),
         |bsv AS (
         |  SELECT vec_id, CAST(j AS BIGINT) AS subspace, vm[(j*16+1):(j*16+16)] AS sub
         |  FROM bpe, range(0, 4) t(j)),
         |bqd AS (
         |  SELECT s.vec_id, s.subspace,
         |         list_sum(list_transform(range(1, 17),
         |                  i -> (s.sub[i] - cb.cm[i]) * (s.sub[i] - cb.cm[i]))) AS dist
         |  FROM bsv s JOIN cb ON cb.subspace = s.subspace),
         |bmind AS (SELECT vec_id, subspace, MIN(dist) AS d FROM bqd GROUP BY 1, 2),
         |bb AS (SELECT SUM(d) AS s, CAST(COUNT(*) // 4 AS BIGINT) AS n FROM bmind)
         |SELECT bb.n AS n_batch,
         |       CAST(base.s // base.n AS BIGINT) AS base_err,
         |       CAST(bb.s // bb.n AS BIGINT) AS batch_err,
         |       CAST((1000000 * (bb.s // bb.n)) // greatest(base.s // base.n, 1) AS BIGINT)
         |         AS inflation_ppm,
         |       CAST(1500000 AS BIGINT) AS threshold_ppm,
         |       ((1000000 * (bb.s // bb.n)) // greatest(base.s // base.n, 1)) > 1500000
         |         AS retrained
         |FROM base CROSS JOIN bb""".stripMargin

  private val pqCtes =
    """pe AS (
      |  SELECT vec_id,
      |         list_transform(embedding,
      |                        x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS vm
      |  FROM embeddings),
      |seeds AS (
      |  SELECT vec_id, vm, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code
      |  FROM (SELECT * FROM pe ORDER BY vec_id LIMIT 8)),
      |cb AS (
      |  SELECT CAST(j AS BIGINT) AS subspace, CAST(code AS BIGINT) AS code,
      |         vm[(j*16+1):(j*16+16)] AS cm
      |  FROM seeds, range(0, 4) t(j)),
      |sv AS (
      |  SELECT vec_id, CAST(j AS BIGINT) AS subspace, vm[(j*16+1):(j*16+16)] AS sub
      |  FROM pe, range(0, 4) t(j)),
      |pqd AS (
      |  SELECT s.vec_id, s.subspace, cb.code,
      |         list_sum(list_transform(range(1, 17),
      |                  i -> (s.sub[i] - cb.cm[i]) * (s.sub[i] - cb.cm[i]))) AS dist
      |  FROM sv s JOIN cb ON cb.subspace = s.subspace)""".stripMargin

  /** The lined corpus of `linedDocs`, as a CTE over `tks` (so callers
    * prepend `tokCtes`). Byte-identical text construction.
    */
  private val linedCte =
    """lined AS (
      |  SELECT doc_id,
      |    array_to_string(
      |      list_concat(
      |        list_concat(
      |          list_transform(range(0, ((greatest(len(tk), 1) - 1) // 12) + 1),
      |            i -> array_to_string(tk[(i*12+1):(i*12+12)], ' ') ||
      |                 CASE WHEN (doc_id + i) % 3 = 0 THEN '.' ELSE '' END),
      |          ['please enable javascript to view this page.',
      |           'all rights reserved { footer }.',
      |           'ok.',
      |           'subscribe to the newsletter for updates today.']),
      |        CASE WHEN doc_id % 4 = 1 THEN ['follow us on social media.']
      |             ELSE CAST([] AS VARCHAR[]) END),
      |      chr(10)) AS text
      |  FROM tks)""".stripMargin

  private def jaccardSql(interSrc: String, threshold: Double, extraCols: String = "") =
    s"""SELECT i.doc_a, i.doc_b, $extraCols
       |       round(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 4) AS jaccard
       |FROM $interSrc i
       |JOIN sizes sa ON sa.id = i.doc_a
       |JOIN sizes sb ON sb.id = i.doc_b
       |WHERE round(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 4) >= $threshold""".stripMargin

  private val simhashVotes = (0 until 16)
    .map(i =>
      s"SUM(CASE WHEN substr(h, ${i + 1}, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS v$i")
    .mkString(",\n         ")

  private val simhashValue = (0 until 16)
    .map(i => s"CASE WHEN v$i > 0 THEN ${1L << i} ELSE 0 END")
    .mkString(" + ")

  /** embeddings CTE with norm + sign bucket; `src` supplies (vec_id, embedding). */
  private def embCte(src: String, bits: Int = 8) = {
    val bucket = (0 until bits)
      .map(i => s"(CASE WHEN embedding[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
    s"""e AS (
       |  SELECT vec_id AS id, embedding AS v,
       |         CAST($bucket AS BIGINT) AS bucket,
       |         sqrt(list_sum(list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE) * embedding[i]))) AS nrm
       |  FROM ($src))""".stripMargin
  }

  private val dotSql =
    "list_sum(list_transform(range(1, 65), i -> CAST(q.v[i] AS DOUBLE) * c.v[i]))"

  /** Power-iteration PCA oracle chain: exact HUGEINT scaled covariance
    * (`n·Σxᵢxⱼ − sᵢsⱼ` over milli coords — no mean, no FP) + `iters`
    * unrolled integer-renormalized iterations mirroring
    * `Similarity.powerIterate` to the bit (trunc `//` == BigInt `/`),
    * ending in the sign-canonical direction CTE `vf` (1-based dim `i`,
    * micro loadings `v`).
    */
  private def pcaCtes(iters: Int): String = {
    val steps = (1 to iters)
      .map { k =>
        s"""w$k AS MATERIALIZED (
           |  SELECT cov.i, CAST(SUM(cov.m * v${k - 1}.v) AS HUGEINT) AS w
           |  FROM cov JOIN v${k - 1} ON v${k - 1}.i = cov.j GROUP BY cov.i),
           |m$k AS (SELECT MAX(ABS(w)) AS mx FROM w$k),
           |v$k AS MATERIALIZED (
           |  SELECT w$k.i,
           |         CASE WHEN m$k.mx > 0 THEN (w$k.w * 1000000) // m$k.mx ELSE p.v END AS v
           |  FROM w$k CROSS JOIN m$k JOIN v${k - 1} p ON p.i = w$k.i)""".stripMargin
      }
      .mkString(",\n")
    s"""mv AS MATERIALIZED (
       |  SELECT vec_id,
       |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS vm
       |  FROM embeddings),
       |ii AS (SELECT unnest(range(1, 65)) AS i),
       |d2 AS (
       |  SELECT a.i AS i, b.i AS j,
       |         CAST(SUM(CAST(vm[a.i] AS HUGEINT) * vm[b.i]) AS HUGEINT) AS sxx
       |  FROM mv CROSS JOIN ii a CROSS JOIN ii b GROUP BY 1, 2),
       |s1 AS (
       |  SELECT i, CAST(SUM(vm[i]) AS HUGEINT) AS s, CAST(COUNT(*) AS HUGEINT) AS n
       |  FROM mv CROSS JOIN ii GROUP BY i),
       |cov AS MATERIALIZED (
       |  SELECT d2.i, d2.j, sa.n * d2.sxx - sa.s * sb.s AS m
       |  FROM d2 JOIN s1 sa ON sa.i = d2.i JOIN s1 sb ON sb.i = d2.j),
       |v0 AS MATERIALIZED (SELECT i, CAST(1000000 AS HUGEINT) AS v FROM ii),
       |$steps,
       |sg AS (SELECT CASE WHEN (SELECT v FROM v$iters WHERE v <> 0 ORDER BY i LIMIT 1) < 0
       |                   THEN -1 ELSE 1 END AS s),
       |vf AS MATERIALIZED (SELECT i, CAST(v * s AS HUGEINT) AS v FROM v$iters CROSS JOIN sg)""".stripMargin
  }

  /** The MMR oracle: greedy selection unrolled to `k` step CTEs (step 1 is
    * pure relevance; step i scores remaining candidates as
    * `λ·rel − (1−λ)·max sim to acc(i-1)` with the same integer micro-units
    * and lowest-id tiebreak as `Similarity.mmrTopK`).
    */
  private def mmrOracleSql(k: Int, pool: Int, lam: Int): String = {
    val dotVab =
      "list_sum(list_transform(range(1, 65), i -> CAST(va.v[i] AS DOUBLE) * vb.v[i]))"
    val steps = (2 to k)
      .map { i =>
        s"""sel$i AS (
           |  SELECT query_id, neighbor_id, $i AS rank, mmr_u FROM (
           |    SELECT g.*, ROW_NUMBER() OVER (
           |      PARTITION BY query_id ORDER BY mmr_u DESC, neighbor_id) AS pk
           |    FROM (
           |      SELECT c.query_id, c.neighbor_id,
           |             $lam * c.rel_u - ${1000 - lam} * MAX(pr.sim_u) AS mmr_u
           |      FROM cand c
           |      JOIN pairs pr ON pr.query_id = c.query_id AND pr.da = c.neighbor_id
           |      JOIN acc${i - 1} ac ON ac.query_id = pr.query_id AND ac.neighbor_id = pr.db
           |      WHERE NOT EXISTS (
           |        SELECT 1 FROM acc${i - 1} x
           |        WHERE x.query_id = c.query_id AND x.neighbor_id = c.neighbor_id)
           |      GROUP BY c.query_id, c.neighbor_id, c.rel_u) g) t WHERE pk = 1),
           |acc$i AS (SELECT * FROM acc${i - 1} UNION ALL SELECT * FROM sel$i)""".stripMargin
      }
      .mkString(",\n")
    s"""WITH ${embCte("SELECT vec_id, embedding FROM embeddings")},
       |cand AS (
       |  SELECT query_id, neighbor_id, rel_u FROM (
       |    SELECT q.id AS query_id, c.id AS neighbor_id,
       |           CAST(round(round($dotSql / (q.nrm * c.nrm), 6) * 1000000, 0) AS BIGINT) AS rel_u,
       |           ROW_NUMBER() OVER (PARTITION BY q.id
       |             ORDER BY round($dotSql / (q.nrm * c.nrm), 6) DESC, c.id) AS rn
       |    FROM e q JOIN e c ON q.id < 8 AND c.id <> q.id) t
       |  WHERE rn <= $pool),
       |pairs AS (
       |  SELECT a.query_id, a.neighbor_id AS da, b.neighbor_id AS db,
       |         CAST(round(round($dotVab / (va.nrm * vb.nrm), 6) * 1000000, 0) AS BIGINT) AS sim_u
       |  FROM cand a
       |  JOIN cand b ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id
       |  JOIN e va ON va.id = a.neighbor_id
       |  JOIN e vb ON vb.id = b.neighbor_id),
       |sel1 AS (
       |  SELECT query_id, neighbor_id, 1 AS rank, $lam * rel_u AS mmr_u FROM (
       |    SELECT c.*, ROW_NUMBER() OVER (
       |      PARTITION BY query_id ORDER BY rel_u DESC, neighbor_id) AS pk
       |    FROM cand c) t WHERE pk = 1),
       |acc1 AS (SELECT * FROM sel1),
       |$steps
       |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, mmr_u FROM acc$k""".stripMargin
  }

  /** Per-script deletion-count select list, generated from the SAME
    * `TextAnalysis.ScriptRanges` table the operator compiles, so the
    * regex class text is identical in both engines (RE2 and java.regex
    * both take literal BMP chars in a class). DuckDB's regexp_replace
    * needs the explicit 'g' flag to mirror Spark's replace-all.
    */
  private val scriptCountsSql = TextAnalysis.ScriptRanges
    .map { case (name, range) =>
      s"CAST(length(text) - length(regexp_replace(text, '[$range]', '', 'g')) AS BIGINT) AS n_$name"
    }
    .mkString(",\n  ")

  /** Per-language marker-count select list (shared: `text_langid`,
    * `corpus_sample`).
    */
  private val langScoresSql = TextAnalysis.LangMarkers
    .map { case (lang, markers) =>
      val lst = markers.map(m => s"'$m'").mkString(", ")
      s"CAST(len(list_filter(tk, t -> t IN ($lst))) AS BIGINT) AS s_$lang"
    }
    .mkString(",\n  ")

  /** Declaration-order argmax CASE chain over the s_<lang> columns. */
  private val langCaseSql = {
    val langs = TextAnalysis.LangMarkers.map(_._1)
    val chain = langs.init.zipWithIndex
      .map { case (lang, i) =>
        val conds = langs.drop(i + 1).map(o => s"s_$lang >= s_$o").mkString(" AND ")
        s"WHEN $conds THEN '$lang'"
      }
      .mkString(" ")
    s"CASE $chain ELSE '${langs.last}' END"
  }

  // langid chain + (truth, pred) cells + per-axis folds; f1 via the
  // single-division identity 2tp // (n_truth + n_pred) — shared by the
  // batch query and its streamed twin (cell additivity)
  private val langidReportSql =
      s"""WITH lt AS (
         |  SELECT lang,
         |         list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tk
         |  FROM documents),
         |scored AS (
         |  SELECT lang,
         |  $langScoresSql
         |  FROM lt),
         |pr AS (
         |  SELECT lang AS t, $langCaseSql AS p FROM scored
         |  WHERE lang IS NOT NULL),
         |cells AS (SELECT t, p, CAST(COUNT(*) AS BIGINT) AS n FROM pr GROUP BY 1, 2),
         |bt AS (SELECT t AS label, CAST(SUM(n) AS BIGINT) AS n_truth FROM cells GROUP BY 1),
         |bp AS (SELECT p AS label, CAST(SUM(n) AS BIGINT) AS n_pred FROM cells GROUP BY 1),
         |dg AS (SELECT t AS label, n AS tp FROM cells WHERE t = p),
         |j AS (
         |  SELECT COALESCE(bt.label, bp.label) AS label,
         |         COALESCE(bt.n_truth, 0) AS n_truth,
         |         COALESCE(bp.n_pred, 0) AS n_pred
         |  FROM bt FULL OUTER JOIN bp ON bp.label = bt.label)
         |SELECT j.label, j.n_truth, j.n_pred,
         |       CAST(COALESCE(dg.tp, 0) AS BIGINT) AS tp,
         |       CAST(CASE WHEN j.n_pred > 0
         |            THEN (1000000 * COALESCE(dg.tp, 0)) // j.n_pred END AS BIGINT) AS precision_ppm,
         |       CAST(CASE WHEN j.n_truth > 0
         |            THEN (1000000 * COALESCE(dg.tp, 0)) // j.n_truth END AS BIGINT) AS recall_ppm,
         |       CAST(CASE WHEN j.n_truth + j.n_pred > 0
         |            THEN (2000000 * COALESCE(dg.tp, 0)) // (j.n_truth + j.n_pred) END AS BIGINT) AS f1_ppm
         |FROM j LEFT JOIN dg ON dg.label = j.label""".stripMargin

  /** Shared by `dedup_minhash_lsh` and (as a nested CTE body) by
    * `dedup_clusters`' recursive closure.
    */
  private val minhashLshSql =
    s"""WITH $tokCtes,
       |shingles AS (
       |  SELECT doc_id AS id,
       |         unnest(list_distinct(list_transform(range(1, len(tk) - 1),
       |                i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS tok
       |  FROM tks WHERE len(tk) >= 3),
       |mh AS (
       |  SELECT id,
       |         MIN(substr(md5('0:' || tok), 1, 16)) AS mh0,
       |         MIN(substr(md5('1:' || tok), 1, 16)) AS mh1,
       |         MIN(substr(md5('2:' || tok), 1, 16)) AS mh2,
       |         MIN(substr(md5('3:' || tok), 1, 16)) AS mh3,
       |         MIN(substr(md5('4:' || tok), 1, 16)) AS mh4,
       |         MIN(substr(md5('5:' || tok), 1, 16)) AS mh5,
       |         MIN(substr(md5('6:' || tok), 1, 16)) AS mh6,
       |         MIN(substr(md5('7:' || tok), 1, 16)) AS mh7
       |  FROM shingles GROUP BY id),
       |bands0 AS (
       |  SELECT id, 0 AS band, mh0 || '|' || mh1 AS bkey FROM mh
       |  UNION ALL SELECT id, 1, mh2 || '|' || mh3 FROM mh
       |  UNION ALL SELECT id, 2, mh4 || '|' || mh5 FROM mh
       |  UNION ALL SELECT id, 3, mh6 || '|' || mh7 FROM mh),
       |okb AS (SELECT band, bkey FROM bands0 GROUP BY band, bkey HAVING COUNT(*) <= 50),
       |bands AS (SELECT b.* FROM bands0 b JOIN okb USING (band, bkey)),
       |cand AS (
       |  SELECT DISTINCT x.id AS doc_a, y.id AS doc_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bkey = y.bkey AND x.id < y.id),
       |sizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM shingles GROUP BY id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS inter
       |  FROM cand c
       |  JOIN shingles a ON a.id = c.doc_a
       |  JOIN shingles b ON b.id = c.doc_b AND b.tok = a.tok
       |  GROUP BY c.doc_a, c.doc_b)
       |${jaccardSql("inter", 0.8)}""".stripMargin

  /** One side's shingle→minhash→band CTE chain for the cross-corpus
    * near-dup oracle; `p` prefixes the CTE names, `src` supplies
    * (doc_id, text).
    */
  private def mhSideCtes(p: String, src: String): String = {
    val mhCols = (0 until 8)
      .map(k => s"MIN(substr(md5('$k:' || tok), 1, 16)) AS mh$k")
      .mkString(",\n         ")
    val bandRows = (0 until 4)
      .map(b => s"SELECT id, $b AS band, mh${2 * b} || '|' || mh${2 * b + 1} AS bkey FROM ${p}mh")
      .mkString("\n  UNION ALL ")
    s"""${p}tks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tk
       |  FROM ($src)),
       |${p}shingles AS (
       |  SELECT doc_id AS id,
       |         unnest(list_distinct(list_transform(range(1, len(tk) - 1),
       |                i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS tok
       |  FROM ${p}tks WHERE len(tk) >= 3),
       |${p}mh AS (
       |  SELECT id,
       |         $mhCols
       |  FROM ${p}shingles GROUP BY id),
       |${p}bands AS (
       |  $bandRows)""".stripMargin
  }

  /** The incremental-clustering oracle's CTE chain, shared by
    * `dedup_clusters_incremental` and `dedup_cluster_merge_audit`: the
    * batch of [[incBatch]] (mirrored verbatim), history cluster labels
    * from the full-corpus recursive closure, batch↔history cross pairs
    * with the corpus-side hot-bucket cap (the `probeLshIndex` contract),
    * batch-internal pairs with the batch-side cap (the `minHashLsh`
    * contract), then min-label closure over the labeled union graph.
    * Ends with `labels(id, r)` and `xedges(a, b)` available.
    */
  private def incClusterCtes(batchSrc: String, corpusSrc: String): String = {
    s"""${mhSideCtes("b_", batchSrc)},
       |${mhSideCtes("c_", corpusSrc)},
       |hokb AS (SELECT band, bkey FROM c_bands GROUP BY band, bkey HAVING COUNT(*) <= 50),
       |hbands AS (SELECT b.* FROM c_bands b JOIN hokb USING (band, bkey)),
       |csizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM c_shingles GROUP BY id),
       |bsizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM b_shingles GROUP BY id),
       |hcand AS (
       |  SELECT DISTINCT x.id AS doc_a, y.id AS doc_b
       |  FROM hbands x JOIN hbands y
       |    ON x.band = y.band AND x.bkey = y.bkey AND x.id < y.id),
       |hinter AS (
       |  SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS inter
       |  FROM hcand c
       |  JOIN c_shingles a ON a.id = c.doc_a
       |  JOIN c_shingles b ON b.id = c.doc_b AND b.tok = a.tok
       |  GROUP BY 1, 2),
       |hpairs AS (
       |  SELECT i.doc_a, i.doc_b FROM hinter i
       |  JOIN csizes sa ON sa.id = i.doc_a
       |  JOIN csizes sb ON sb.id = i.doc_b
       |  WHERE round(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 4) >= 0.8),
       |hedges AS (
       |  SELECT doc_a AS a, doc_b AS b FROM hpairs
       |  UNION
       |  SELECT doc_b AS a, doc_a AS b FROM hpairs),
       |hreach(id, r) AS (
       |  SELECT DISTINCT a, a FROM hedges
       |  UNION
       |  SELECT e.b, hreach.r FROM hreach JOIN hedges e ON e.a = hreach.id),
       |hclusters AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM hreach GROUP BY id),
       |xcand AS (
       |  SELECT DISTINCT x.id AS probe_id, y.id AS corpus_id
       |  FROM b_bands x JOIN hbands y ON x.band = y.band AND x.bkey = y.bkey),
       |xinter AS (
       |  SELECT c.probe_id, c.corpus_id, CAST(COUNT(*) AS BIGINT) AS inter
       |  FROM xcand c
       |  JOIN b_shingles a ON a.id = c.probe_id
       |  JOIN c_shingles b ON b.id = c.corpus_id AND b.tok = a.tok
       |  GROUP BY 1, 2),
       |xpairs AS (
       |  SELECT i.probe_id, i.corpus_id FROM xinter i
       |  JOIN bsizes sa ON sa.id = i.probe_id
       |  JOIN csizes sb ON sb.id = i.corpus_id
       |  WHERE round(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 4) >= 0.8),
       |xedges AS (
       |  SELECT x.probe_id AS a, COALESCE(hc.cluster_id, x.corpus_id) AS b
       |  FROM xpairs x LEFT JOIN hclusters hc ON hc.doc_id = x.corpus_id),
       |bokb AS (SELECT band, bkey FROM b_bands GROUP BY band, bkey HAVING COUNT(*) <= 50),
       |bbands AS (SELECT b.* FROM b_bands b JOIN bokb USING (band, bkey)),
       |wcand AS (
       |  SELECT DISTINCT x.id AS doc_a, y.id AS doc_b
       |  FROM bbands x JOIN bbands y
       |    ON x.band = y.band AND x.bkey = y.bkey AND x.id < y.id),
       |winter AS (
       |  SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS inter
       |  FROM wcand c
       |  JOIN b_shingles a ON a.id = c.doc_a
       |  JOIN b_shingles b ON b.id = c.doc_b AND b.tok = a.tok
       |  GROUP BY 1, 2),
       |wpairs AS (
       |  SELECT i.doc_a, i.doc_b FROM winter i
       |  JOIN bsizes sa ON sa.id = i.doc_a
       |  JOIN bsizes sb ON sb.id = i.doc_b
       |  WHERE round(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 4) >= 0.8),
       |edges AS (
       |  SELECT a, b FROM xedges
       |  UNION
       |  SELECT b, a FROM xedges
       |  UNION
       |  SELECT doc_a, doc_b FROM wpairs
       |  UNION
       |  SELECT doc_b, doc_a FROM wpairs),
       |reach(id, r) AS (
       |  SELECT DISTINCT a, a FROM edges
       |  UNION
       |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
       |labels AS (SELECT id, MIN(r) AS r FROM reach GROUP BY id)""".stripMargin
  }

  /** The aHash table of `Multimodal.bmpAHashes` over the generator formula,
    * as CTEs ending in `ah(doc_id, hash_hi, hash_lo)`.
    */
  private val ahashCtes =
    """dims AS (
      |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    list_transform(range(0, 64), k ->
      |      (((doc_id   + 7*(((k % 8) * w) // 8) + 13*(((k // 8) * h) // 8)) % 256)
      |     + ((doc_id*3 + 5*(((k % 8) * w) // 8) + 11*(((k // 8) * h) // 8)) % 256)
      |     + ((doc_id*5 + 3*(((k % 8) * w) // 8) + 17*(((k // 8) * h) // 8)) % 256)) // 3) AS gray
      |  FROM dims),
      |s AS (SELECT doc_id, gray, list_sum(gray) AS total FROM g),
      |ah AS (
      |  SELECT doc_id,
      |    CAST(list_sum(list_transform(range(32, 64),
      |         k -> CASE WHEN gray[k+1]*64 > total THEN CAST(1 AS BIGINT) << (k-32) ELSE 0 END)) AS BIGINT) AS hash_hi,
      |    CAST(list_sum(list_transform(range(0, 32),
      |         k -> CASE WHEN gray[k+1]*64 > total THEN CAST(1 AS BIGINT) << k ELSE 0 END)) AS BIGINT) AS hash_lo
      |  FROM s)""".stripMargin

  /** Waveform-fingerprint CTEs (mirrors `Multimodal.wavFingerprint` over
    * the WAV generator formula): per-window |amplitude| sums against the
    * clip total, packed into 32-bit hash halves like the image aHash.
    */
  private val wavFpCtes = {
    def half(range: String, shift: String) =
      s"""CAST(list_sum(list_transform($range, w ->
         |      CASE WHEN 64 * list_sum(list_transform(
         |             range(CAST(w*n//64 AS BIGINT)+1, CAST((w+1)*n//64 AS BIGINT)+1),
         |             i -> amp[CAST(i AS INT)])) > tot
         |           THEN CAST(1 AS BIGINT) << ($shift) ELSE 0 END)) AS BIGINT)""".stripMargin
    s"""wsamp AS (
       |  SELECT doc_id, 64 + doc_id % 64 AS n,
       |         list_transform(range(0, 64 + doc_id % 64),
       |                        i -> abs((doc_id*73 + i*179) % 65536 - 32768)) AS amp
       |  FROM documents),
       |wtot AS (SELECT doc_id, n, amp, list_sum(amp) AS tot FROM wsamp),
       |wfp AS (
       |  SELECT doc_id,
       |    ${half("range(32, 64)", "w-32")} AS hash_hi,
       |    ${half("range(0, 32)", "w")} AS hash_lo
       |  FROM wtot)""".stripMargin
  }

  /** 60-bit wide-SimHash vote/fingerprint select lists (mirrors
    * `Dedup.simHashWide`'s md5-hex-digit bit votes).
    */
  private val simhashWideVotes = (0 until 60)
    .map { i =>
      val pos = i / 4 + 1
      val shift = 3 - i % 4
      s"SUM(CASE WHEN (((strpos('0123456789abcdef', substr(h, $pos, 1)) - 1) >> $shift) & 1) = 1 THEN 1 ELSE -1 END) AS v$i"
    }
    .mkString(",\n         ")

  private val simhashWideValue = (0 until 60)
    .map(i => s"CASE WHEN v$i > 0 THEN ${1L << i} ELSE 0 END")
    .mkString(" + ")

  /** Mirrors Similarity.ivfCentroids' determinism contract as a reusable
    * CTE chain ending in `cells(id, v, nrm, cid)`: 3 unrolled Lloyd
    * iterations — nearest-centroid assignment (cosine rounded to 6,
    * centroid-id tie-break) then integer milli-means per dimension
    * (floor(sum(round(x*1000))/count), order-independent) mapped back to
    * float via m/1000.0. Shared by `similarity_topk_ivf` (+ its persisted
    * and compacted faces) and `ann_index_audit`, which all hang off the
    * same trained quantizer.
    */
  private val kmeansDotCv =
    "list_sum(list_transform(range(1, 65), i -> CAST(q.v[i] AS DOUBLE) * c.cv[i]))"

  private def kmeansAssignCteOn(name: String, cents: String, src: String) =
    s"""$name AS (
       |  SELECT id, v, nrm, cid FROM (
       |    SELECT q.id, q.v, q.nrm, c.cid,
       |           ROW_NUMBER() OVER (PARTITION BY q.id
       |             ORDER BY round($kmeansDotCv / (q.nrm * c.cnrm), 6) DESC, c.cid) AS rn
       |    FROM $src q CROSS JOIN $cents c)
       |  WHERE rn = 1)""".stripMargin

  private def kmeansAssignCte(name: String, cents: String) =
    kmeansAssignCteOn(name, cents, "e")

  /** One Lloyd iteration with CTE names prefixed `pfx` and the TRAINING
    * set `src` — the parameterization that lets ann_autotune_nprobe train
    * a second (deliberately stale) quantizer on rotated vectors in the
    * same query; the default ("", "e") emits the original names
    * byte-for-byte.
    */
  private def kmeansLloydCtesOn(k: Int, src: String = "e", pfx: String = "") =
    s"""${kmeansAssignCteOn(s"${pfx}a$k", s"${pfx}c${k - 1}", src)},
       |${pfx}m$k AS (
       |  SELECT cid, i,
       |         CAST(floor(CAST(SUM(CAST(round(CAST(v[i] AS DOUBLE) * 1000, 0) AS BIGINT)) AS DOUBLE)
       |                    / COUNT(*)) AS BIGINT) AS m
       |  FROM ${pfx}a$k, range(1, 65) t(i) GROUP BY 1, 2),
       |${pfx}c$k AS (
       |  SELECT cid, cv,
       |         sqrt(list_sum(list_transform(range(1, 65), i -> CAST(cv[i] AS DOUBLE) * cv[i]))) AS cnrm
       |  FROM (SELECT cid,
       |               list_transform(list(m ORDER BY i), mm -> CAST(CAST(mm AS DOUBLE) / 1000.0 AS FLOAT)) AS cv
       |        FROM ${pfx}m$k GROUP BY cid))""".stripMargin

  private def kmeansLloydCtes(k: Int) = kmeansLloydCtesOn(k)

  private lazy val kmeansCellsCtes: String =
    s"""${embCte("SELECT vec_id, embedding FROM embeddings")},
       |c0 AS (SELECT id AS cid, v AS cv, nrm AS cnrm FROM e WHERE id < 16),
       |${kmeansLloydCtes(1)},
       |${kmeansLloydCtes(2)},
       |${kmeansLloydCtes(3)},
       |${kmeansAssignCte("cells", "c3")}""".stripMargin

  /** One store's nProbe-tuning block for ann_autotune_nprobe: the
    * query sample's FULL cell ranking, every candidate with its cell's
    * probe rank, probe top-5 at EVERY p in 1..16 in one pass (a
    * neighbor is retrieved at p iff its cell ranks <= p), micro-average
    * recall per p against the shared exact baseline `bk`, and the
    * MINIMAL passing p — equivalent to the operator's ladder + binary
    * search because per-query recall is monotone in nProbe.
    */
  private def tuneBlockCtes(
      pfx: String, cells: String, cents: String, maxP: Int = 16): String =
    s"""${pfx}prbs AS (
       |  SELECT q.id AS query_id, q.v AS qv, q.nrm AS qnrm, c.cid,
       |         ROW_NUMBER() OVER (PARTITION BY q.id
       |           ORDER BY round($kmeansDotCv / (q.nrm * c.cnrm), 6) DESC, c.cid) AS prn
       |  FROM e q CROSS JOIN $cents c WHERE q.id < 8),
       |${pfx}cand AS MATERIALIZED (
       |  SELECT p.query_id, m.id AS neighbor_id, p.prn,
       |         round(list_sum(list_transform(range(1, 65),
       |                 i -> CAST(p.qv[i] AS DOUBLE) * m.v[i])) / (p.qnrm * m.nrm), 6) AS cos_r
       |  FROM ${pfx}prbs p JOIN $cells m ON p.cid = m.cid AND m.id <> p.query_id),
       |${pfx}byp AS MATERIALIZED (
       |  SELECT p, query_id, neighbor_id FROM (
       |    SELECT pp.p, c.query_id, c.neighbor_id,
       |           ROW_NUMBER() OVER (PARTITION BY pp.p, c.query_id
       |             ORDER BY c.cos_r DESC, c.neighbor_id) AS rnk
       |    FROM ${pfx}cand c JOIN range(1, ${maxP + 1}) pp(p) ON c.prn <= pp.p)
       |  WHERE rnk <= 5),
       |${pfx}rec AS MATERIALIZED (
       |  SELECT pp.p,
       |         CAST((1000 * COUNT(i.neighbor_id)) // COUNT(*) AS BIGINT) AS recall_milli
       |  FROM bk CROSS JOIN range(1, ${maxP + 1}) pp(p)
       |  LEFT JOIN ${pfx}byp i ON i.p = pp.p AND i.query_id = bk.query_id
       |        AND i.neighbor_id = bk.neighbor_id
       |  GROUP BY 1),
       |${pfx}sel AS (SELECT MIN(p) AS np FROM ${pfx}rec WHERE recall_milli >= 950)""".stripMargin

  private lazy val autoTuneOracleSql: String = {
    def row(label: String, pfx: String) =
      s"""SELECT '$label' AS store, CAST(16 AS BIGINT) AS n_centroids,
         |       CAST(t.np AS BIGINT) AS n_probe,
         |       (SELECT recall_milli FROM ${pfx}rec WHERE p = t.np) AS recall_milli,
         |       CAST(950 AS BIGINT) AS target_milli,
         |       (SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) FROM bk) AS n_queries,
         |       t.np = 16 AS exhaustive,
         |       (SELECT CAST(COUNT(*) AS BIGINT) FROM ${pfx}cand
         |        WHERE prn <= t.np) AS candidates_scored
         |FROM ${pfx}sel t""".stripMargin
    s"""WITH $kmeansCellsCtes,
       |er AS (
       |  SELECT vec_id AS id, list_concat(embedding[2:64], embedding[1:1]) AS v,
       |         sqrt(list_sum(list_transform(range(1, 65),
       |              i -> CAST(embedding[i] AS DOUBLE) * embedding[i]))) AS nrm
       |  FROM embeddings),
       |rc0 AS (SELECT id AS cid, v AS cv, nrm AS cnrm FROM er WHERE id < 16),
       |${kmeansLloydCtesOn(1, "er", "r")},
       |${kmeansLloydCtesOn(2, "er", "r")},
       |${kmeansLloydCtesOn(3, "er", "r")},
       |${kmeansAssignCteOn("rcells", "rc3", "e")},
       |bscored AS (
       |  SELECT q.id AS query_id, c.id AS neighbor_id,
       |         round($dotSql / (q.nrm * c.nrm), 6) AS cos_r
       |  FROM e q JOIN e c ON q.id < 8 AND c.id <> q.id),
       |bk AS MATERIALIZED (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY query_id ORDER BY cos_r DESC, neighbor_id) AS rank
       |    FROM bscored)
       |  WHERE rank <= 5),
       |${tuneBlockCtes("f", "cells", "c3")},
       |${tuneBlockCtes("s", "rcells", "rc3")}
       |${row("fresh", "f")}
       |UNION ALL
       |${row("stale", "s")}""".stripMargin
  }

  /** One build-ladder rung's CTE chain for ann_autotune_build: Lloyd
    * k-means seeded from the lowest `nc` ids of the TRAIN SAMPLE `et`
    * (vec_id%3!=0 — mirroring the operator's writeIvfIndexTrained
    * split) and iterated over `et`, with the FULL corpus `e` assigned
    * against the trained centroids, plus the shared tune block scanning
    * every p in 1..nc.
    */
  private def buildRungCtes(nc: Int): String = {
    val pfx = s"b$nc"
    s"""${pfx}c0 AS (SELECT id AS cid, v AS cv, nrm AS cnrm FROM et ORDER BY id LIMIT $nc),
       |${kmeansLloydCtesOn(1, "et", pfx)},
       |${kmeansLloydCtesOn(2, "et", pfx)},
       |${kmeansLloydCtesOn(3, "et", pfx)},
       |${kmeansAssignCteOn(s"${pfx}cells", s"${pfx}c3", "e")},
       |${tuneBlockCtes(pfx, s"${pfx}cells", s"${pfx}c3", maxP = nc)}""".stripMargin
  }

  private lazy val autoTuneBuildOracleSql: String = {
    def rung(nc: Int) =
      s"""SELECT CAST($nc AS BIGINT) AS n_centroids, CAST(t.np AS BIGINT) AS n_probe,
         |       (SELECT recall_milli FROM b${nc}rec WHERE p = t.np) AS recall_milli,
         |       (SELECT CAST(COUNT(*) AS BIGINT) FROM b${nc}cand
         |        WHERE prn <= t.np) AS candidates_scored
         |FROM b${nc}sel t""".stripMargin
    s"""WITH ${embCte("SELECT vec_id, embedding FROM embeddings")},
       |et AS (SELECT id, v, nrm FROM e WHERE id % 3 <> 0),
       |bscored AS (
       |  SELECT q.id AS query_id, c.id AS neighbor_id,
       |         round($dotSql / (q.nrm * c.nrm), 6) AS cos_r
       |  FROM e q JOIN e c ON q.id < 8 AND c.id <> q.id),
       |bk AS MATERIALIZED (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY query_id ORDER BY cos_r DESC, neighbor_id) AS rank
       |    FROM bscored)
       |  WHERE rank <= 5),
       |${buildRungCtes(4)},
       |${buildRungCtes(8)},
       |${buildRungCtes(16)},
       |rungs AS (${rung(4)} UNION ALL ${rung(8)} UNION ALL ${rung(16)})
       |SELECT n_centroids, n_probe, recall_milli, candidates_scored,
       |       ROW_NUMBER() OVER (ORDER BY candidates_scored, n_centroids) = 1 AS chosen
       |FROM rungs""".stripMargin
  }

  private lazy val kmeansIvfTopkSql: String =
    s"""WITH $kmeansCellsCtes,
       |probes AS (
       |  SELECT id AS query_id, v AS qv, nrm AS qnrm, cid FROM (
       |    SELECT q.id, q.v, q.nrm, c.cid,
       |           ROW_NUMBER() OVER (PARTITION BY q.id
       |             ORDER BY round($kmeansDotCv / (q.nrm * c.cnrm), 6) DESC, c.cid) AS prn
       |    FROM e q CROSS JOIN c3 c WHERE q.id < 8)
       |  WHERE prn <= 4),
       |scored AS (
       |  SELECT p.query_id, m.id AS neighbor_id,
       |         round(list_sum(list_transform(range(1, 65),
       |                 i -> CAST(p.qv[i] AS DOUBLE) * m.v[i])) / (p.qnrm * m.nrm), 6) AS cos_r
       |  FROM probes p JOIN cells m ON p.cid = m.cid AND m.id <> p.query_id)
       |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos_r FROM (
       |  SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY query_id ORDER BY cos_r DESC, neighbor_id) AS rank
       |  FROM scored)
       |WHERE rank <= 5""".stripMargin

  // The persisted-index queries are CONTRACTED to be bit-identical to
  // their in-memory twins, so they share one oracle string — a divergence
  // shows up as a hash mismatch on either row.
  def oracleSql: Map[String, String] =
    baseOracleSql ++ Map(
      "similarity_topk_ivf_persisted" -> baseOracleSql("similarity_topk_ivf"),
      "similarity_topk_pq_persisted" -> baseOracleSql("similarity_topk_pq"),
      // the persisted search lifecycle (build + append + tombstone +
      // compact + pruned probe) is CONTRACTED bit-identical to
      // tokenize-per-query over the same live docs — one oracle, two faces
      "text_search_persisted" -> baseOracleSql("text_search"),
      // the streamed index's three deduped generations + mid-stream fold
      // land exactly the corpus — same contract, same oracle
      "text_search_streamed" -> baseOracleSql("text_search"),
      // as-of generation 1 = the same scoring over ONLY the first two
      // generations' corpus (doc_id%3<=1), historical idf N included
      "text_search_asof" ->
        """WITH traw AS (
          |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
          |  FROM documents WHERE doc_id % 3 <= 1),
          |p AS (
          |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
          |  FROM traw WHERE tok IN ('window', 'merge', 'scan') GROUP BY 1, 2),
          |w AS (
          |  SELECT tok,
          |         CAST(round(1000.0 * ((SELECT COUNT(*) FROM documents WHERE doc_id % 3 <= 1)
          |                              - COUNT(*) + 0.5)
          |                    / (COUNT(*) + 0.5), 0) AS BIGINT) AS idf_milli
          |  FROM p GROUP BY tok)
          |SELECT p.doc_id,
          |       CAST(SUM(p.tf * w.idf_milli) AS BIGINT) AS score_milli,
          |       CAST(COUNT(*) AS BIGINT) AS n_terms
          |FROM p JOIN w ON p.tok = w.tok
          |GROUP BY p.doc_id
          |ORDER BY score_milli DESC, p.doc_id
          |LIMIT 20""".stripMargin,
      // append + tombstone-delete + compact must be invisible to the
      // probe (the appended rows were exactly the deleted ones), so the
      // compacted faces share their in-memory twins' oracles too
      "similarity_topk_ivf_compacted" -> baseOracleSql("similarity_topk_ivf"),
      "similarity_topk_pq_compacted" -> baseOracleSql("similarity_topk_pq"),
      // retrain-over-live-content must equal a clean rebuild over the
      // same live set (= the full corpus after the decoys are
      // tombstoned), so the retrained faces share those oracles as well
      "similarity_topk_ivf_retrained" -> baseOracleSql("similarity_topk_ivf"),
      "similarity_topk_pq_retrained" -> baseOracleSql("similarity_topk_pq"),
      // composed IVF-PQ: the 3-iteration integer-milli Lloyd chain routes
      // candidates (top-4 cells per query), the global PQ codebook ADC-
      // scores only those cells' codes — both quantizers unrolled into
      // DuckDB, full hash check of the whole composition
      "similarity_topk_ivfpq" -> ivfPqOracleSql,
      // retrainIvfPqIndex rebuilds BOTH quantizers from the live id
      // set (= the full corpus once the decoys are tombstoned), so the
      // retrained composed face shares the clean-build oracle too
      "similarity_topk_ivfpq_retrained" -> ivfPqOracleSql,
      // the persisted cluster map IS clusterPairs' output round-tripped
      // through parquet — one oracle for both faces
      "dedup_clusters_persisted" -> baseOracleSql("dedup_clusters"),
      // the conditional rebuild's report IS the drift audit's numbers
      // plus the threshold decision — the rebuild side effect is pinned
      // by SetJoinSpec (store ≡ clean writeSetJoinIndex), not the hash
      "dedup_setjoin_rebuild" ->
        s"""SELECT n_docs, cand_frozen, cand_fresh, inflation_ppm,
           |       CAST(1500000 AS BIGINT) AS threshold_ppm,
           |       inflation_ppm > 1500000 AS rebuilt
           |FROM (${baseOracleSql("dedup_setjoin_drift")})""".stripMargin)

  // composed IVF-PQ: the 3-iteration integer-milli Lloyd chain routes
  // candidates (top-4 cells per query), the global PQ codebook ADC-
  // scores only those cells' codes — both quantizers unrolled into
  // DuckDB, full hash check of the whole composition
  private lazy val ivfPqOracleSql =
    s"""WITH $kmeansCellsCtes,
           |$pqCtes,
           |codes AS (
           |  SELECT vec_id, subspace, code
           |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
           |                                     ORDER BY dist, code) AS rn FROM pqd)
           |  WHERE rn = 1),
           |ccodes AS (
           |  SELECT codes.vec_id, codes.subspace, codes.code, cells.cid
           |  FROM codes JOIN cells ON cells.id = codes.vec_id),
           |probes AS (
           |  SELECT id AS query_id, cid FROM (
           |    SELECT q.id, c.cid,
           |           ROW_NUMBER() OVER (PARTITION BY q.id
           |             ORDER BY round($kmeansDotCv / (q.nrm * c.cnrm), 6) DESC, c.cid) AS prn
           |    FROM e q CROSS JOIN c3 c WHERE q.id < 8)
           |  WHERE prn <= 4),
           |dt AS (
           |  SELECT s.vec_id AS query_id, s.subspace, cb.code,
           |         list_sum(list_transform(range(1, 17),
           |                  i -> (s.sub[i] - cb.cm[i]) * (s.sub[i] - cb.cm[i]))) AS qdist
           |  FROM sv s JOIN cb ON cb.subspace = s.subspace
           |  WHERE s.vec_id < 8),
           |adc AS (
           |  SELECT p.query_id, c.vec_id AS neighbor_id,
           |         CAST(SUM(dt.qdist) AS BIGINT) AS adc_dist
           |  FROM ccodes c
           |  JOIN probes p ON p.cid = c.cid AND p.query_id <> c.vec_id
           |  JOIN dt ON dt.query_id = p.query_id AND dt.subspace = c.subspace
           |         AND dt.code = c.code
           |  GROUP BY 1, 2)
           |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, adc_dist FROM (
           |  SELECT *, ROW_NUMBER() OVER (
           |    PARTITION BY query_id ORDER BY adc_dist ASC, neighbor_id) AS rank
           |  FROM adc)
           |WHERE rank <= 5""".stripMargin

  private lazy val baseOracleSql: Map[String, String] = Map(
    "dedup_simhash_pairs" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0),
         |tokd AS (
         |  SELECT DISTINCT id, tok FROM (
         |    SELECT doc_id AS id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
         |    FROM corpus) WHERE tok <> ''),
         |th AS (SELECT id, md5(tok) AS h FROM tokd),
         |votes AS (
         |  SELECT id,
         |         $simhashWideVotes
         |  FROM th GROUP BY id),
         |fp AS (SELECT id AS doc_id, CAST($simhashWideValue AS BIGINT) AS simhash FROM votes),
         |bd AS (
         |  SELECT doc_id, simhash, b.band AS band,
         |         (simhash >> (15 * b.band)) & 32767 AS bkey
         |  FROM fp CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b),
         |bc AS (SELECT *, COUNT(*) OVER (PARTITION BY band, bkey) AS bn FROM bd),
         |bok AS (SELECT doc_id, simhash, band, bkey FROM bc WHERE bn <= 1000),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sa, b.doc_id AS doc_b, b.simhash AS sb
         |  FROM bok a JOIN bok b
         |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(sa, sb)) <= 3""".stripMargin,
    // three unrolled BPE learn rounds (the Lloyd-loop move, tokenizer
    // edition): weighted pair counts -> deterministic arg-max ->
    // delimiter-safe replace, per round
    "text_bpe_merges" ->
      s"""WITH $bpeCtes
         |SELECT merge_rank, left_sym, right_sym, pair_count FROM (
         |  SELECT CAST(1 AS BIGINT) AS merge_rank, split_part(pair, ' ', 1) AS left_sym,
         |         split_part(pair, ' ', 2) AS right_sym, cnt AS pair_count FROM m1
         |  UNION ALL
         |  SELECT CAST(2 AS BIGINT), split_part(pair, ' ', 1), split_part(pair, ' ', 2), cnt FROM m2
         |  UNION ALL
         |  SELECT CAST(3 AS BIGINT), split_part(pair, ' ', 1), split_part(pair, ' ', 2), cnt FROM m3) t""".stripMargin,
    // two unrolled BATCHED rounds × two greedy symbol-disjoint picks,
    // ranks in claim order, counts from each round's shared table
    "text_bpe_merges_batched" ->
      s"""WITH $tokCtes,
         |wf AS (
         |  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
         |    SELECT unnest(tk) AS w FROM tks) t
         |  WHERE w NOT LIKE '%·%' AND w NOT LIKE '%<%' AND w NOT LIKE '%>%'
         |  GROUP BY 1),
         |s0 AS (
         |  SELECT freq,
         |         '·' || array_to_string(list_append(list_transform(range(1, len(w) + 1),
         |                i -> w[i:i]), '</w>'), '·') || '·' AS s
         |  FROM wf),
         |${bpeBatchedRoundCte(1)},
         |${bpeBatchedRoundCte(2)}
         |SELECT merge_rank, left_sym, right_sym, pair_count FROM (
         |  SELECT CAST(1 AS BIGINT) AS merge_rank, split_part(pair, ' ', 1) AS left_sym,
         |         split_part(pair, ' ', 2) AS right_sym, cnt AS pair_count FROM ba1
         |  UNION ALL
         |  SELECT CAST(2 AS BIGINT), split_part(pair, ' ', 1), split_part(pair, ' ', 2), cnt FROM bb1
         |  UNION ALL
         |  SELECT CAST(3 AS BIGINT), split_part(pair, ' ', 1), split_part(pair, ' ', 2), cnt FROM ba2
         |  UNION ALL
         |  SELECT CAST(4 AS BIGINT), split_part(pair, ' ', 1), split_part(pair, ' ', 2), cnt FROM bb2) t""".stripMargin,
    // the learned merges applied per word occurrence, summed per doc;
    // delimiter/marker-unsafe words count 1, as in the operator
    "text_bpe_tokens" ->
      s"""WITH $bpeCtes,
         |uw AS (SELECT DISTINCT w FROM (SELECT unnest(tk) AS w FROM tks) t),
         |wn AS (
         |  SELECT w,
         |    CASE WHEN w LIKE '%·%' OR w LIKE '%<%' OR w LIKE '%>%' THEN 1
         |    ELSE len(list_filter(string_split(
         |      replace(replace(replace(
         |        '·' || array_to_string(list_append(list_transform(range(1, len(w) + 1),
         |               i -> w[i:i]), '</w>'), '·') || '·',
         |        (SELECT '·' || split_part(pair, ' ', 1) || '·' || split_part(pair, ' ', 2) || '·' FROM m1),
         |        (SELECT '·' || replace(pair, ' ', '') || '·' FROM m1)),
         |        (SELECT '·' || split_part(pair, ' ', 1) || '·' || split_part(pair, ' ', 2) || '·' FROM m2),
         |        (SELECT '·' || replace(pair, ' ', '') || '·' FROM m2)),
         |        (SELECT '·' || split_part(pair, ' ', 1) || '·' || split_part(pair, ' ', 2) || '·' FROM m3),
         |        (SELECT '·' || replace(pair, ' ', '') || '·' FROM m3)),
         |      '·'), x -> x <> '')) END AS n
         |  FROM uw)
         |SELECT d.doc_id, CAST(SUM(wn.n) AS BIGINT) AS n_bpe_tokens
         |FROM (SELECT doc_id, unnest(tk) AS w FROM tks) d JOIN wn USING (w)
         |GROUP BY 1""".stripMargin,
    "text_hash_vectors" ->
      s"""WITH $tokCtes,
         |b AS (
         |  SELECT id AS doc_id,
         |         ((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 256
         |          + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) * 16
         |          + strpos('0123456789abcdef', substr(md5(tok), 3, 1)) - 1) % 1024 AS bucket
         |  FROM tokraw WHERE tok <> ''),
         |w AS (
         |  SELECT doc_id, CAST(bucket AS BIGINT) AS bucket, CAST(COUNT(*) AS BIGINT) AS w
         |  FROM b GROUP BY 1, 2)
         |SELECT doc_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_features,
         |       CAST(SUM(w) AS BIGINT) AS n_tokens,
         |       md5(array_to_string(
         |             list(CAST(bucket AS VARCHAR) || ':' || CAST(w AS VARCHAR) ORDER BY bucket),
         |             ',')) AS vec_md5
         |FROM w GROUP BY doc_id""".stripMargin,
    // lined-corpus token/sentence/syllable counts folded to the Flesch
    // milli formula — trunc division, vowel-group runs, min-1 clamps
    "text_readability" ->
      s"""WITH $tokCtes,
         |$linedCte,
         |r AS (
         |  SELECT doc_id,
         |         list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS ltk,
         |         CAST(len(regexp_extract_all(lower(text), '[.!?]+')) AS BIGINT) AS s0
         |  FROM lined),
         |c AS (
         |  SELECT doc_id,
         |         CAST(len(ltk) AS BIGINT) AS n_words,
         |         s0 AS n_sentences,
         |         CAST(COALESCE(list_sum(list_transform(ltk,
         |                t -> greatest(len(regexp_extract_all(t, '[aeiouy]+')), 1))), 0)
         |              AS BIGINT) AS n_syllables
         |  FROM r)
         |SELECT doc_id, n_words, n_sentences, n_syllables,
         |       CAST(206835 - (1015 * n_words) // greatest(n_sentences, 1)
         |            - (84600 * n_syllables) // greatest(n_words, 1) AS BIGINT)
         |         AS flesch_milli
         |FROM c""".stripMargin,
    // the RAKE chain unrolled: position-indexed tokens, running-sum
    // stopword segmentation, per-doc word degree/freq, trunc-div scores
    "text_keyphrases" ->
      s"""WITH $tokCtes,
         |base AS (
         |  SELECT id, u.pos AS pos, u.tok AS tok,
         |         CASE WHEN u.tok IN ($stopList) THEN 1 ELSE 0 END AS stop
         |  FROM (
         |    SELECT doc_id AS id,
         |           unnest(list_transform(range(1, len(tk) + 1),
         |                  j -> struct_pack(pos := j, tok := tk[j]))) AS u
         |    FROM tks) t),
         |seg AS (
         |  SELECT * FROM (
         |    SELECT id, pos, tok, stop,
         |           SUM(stop) OVER (PARTITION BY id ORDER BY pos) AS ph
         |    FROM base)
         |  WHERE stop = 0),
         |phr0 AS (SELECT id, ph, list(tok ORDER BY pos) AS wds FROM seg GROUP BY 1, 2),
         |phr AS (SELECT * FROM phr0 WHERE len(wds) <= 4),
         |mem AS (SELECT id, ph, CAST(len(wds) AS BIGINT) AS plen, unnest(wds) AS wd FROM phr),
         |ws AS (
         |  SELECT id, wd, CAST(COUNT(*) AS BIGINT) AS freq, CAST(SUM(plen) AS BIGINT) AS deg
         |  FROM mem GROUP BY 1, 2),
         |wsc AS (SELECT id, wd, CAST((1000000 * deg) // freq AS BIGINT) AS wscore FROM ws),
         |ps AS (
         |  SELECT m.id, m.ph, CAST(SUM(w.wscore) AS BIGINT) AS score_micro
         |  FROM mem m JOIN wsc w ON w.id = m.id AND w.wd = m.wd
         |  GROUP BY 1, 2),
         |coll AS (
         |  SELECT p.id, array_to_string(p.wds, ' ') AS phrase,
         |         CAST(MAX(len(p.wds)) AS BIGINT) AS n_words,
         |         CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         |         CAST(MAX(s.score_micro) AS BIGINT) AS score_micro
         |  FROM phr p JOIN ps s ON s.id = p.id AND s.ph = p.ph
         |  GROUP BY 1, 2)
         |SELECT id AS doc_id, phrase, n_words, n_occurrences, score_micro,
         |       CAST(rank AS BIGINT) AS rank
         |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY id
         |        ORDER BY score_micro DESC, phrase) AS rank FROM coll)
         |WHERE rank <= 5""".stripMargin,
    "text_collocations" ->
      s"""WITH $tokCtes,
         |pr0 AS (
         |  SELECT unnest(list_transform(range(1, len(tk)),
         |         i -> struct_pack(x := tk[i], y := tk[i+1]))) AS p
         |  FROM tks WHERE len(tk) >= 2),
         |big AS (
         |  SELECT p.x AS x, p.y AS y, CAST(COUNT(*) AS BIGINT) AS c_xy
         |  FROM pr0 GROUP BY 1, 2 HAVING COUNT(*) >= 5),
         |uni AS (
         |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM tokraw WHERE tok <> '' GROUP BY 1),
         |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni)
         |SELECT b.x, b.y, b.c_xy,
         |       CAST((1000 * tot.n * b.c_xy) // (ux.c * uy.c) AS BIGINT) AS lift_milli
         |FROM big b
         |JOIN uni ux ON ux.tok = b.x
         |JOIN uni uy ON uy.tok = b.y
         |CROSS JOIN tot
         |ORDER BY lift_milli DESC, b.x, b.y
         |LIMIT 20""".stripMargin,
    "corpus_snapshot_diff" ->
      """WITH cur AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 7 = 2 THEN text || ' edited v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 10 <> 3
        |  UNION ALL
        |  SELECT doc_id + 9000000 AS doc_id, text FROM documents WHERE doc_id % 8 = 0),
        |a AS (
        |  SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp_prev
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp_cur
        |  FROM cur)
        |SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
        |       CASE WHEN a.doc_id IS NULL THEN 'added'
        |            WHEN b.doc_id IS NULL THEN 'removed'
        |            WHEN a.fp_prev = b.fp_cur THEN 'unchanged'
        |            ELSE 'changed' END AS status
        |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id""".stripMargin,
    "text_rarity" ->
      s"""WITH $tokCtes,
         |tf AS (
         |  SELECT id AS doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM tokraw WHERE tok <> '' GROUP BY 1, 2),
         |ctf AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS ctf FROM tf GROUP BY 1),
         |tot AS (SELECT CAST(SUM(ctf) AS BIGINT) AS n FROM ctf)
         |SELECT tf.doc_id,
         |       CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
         |       CAST(SUM(tf.tf * (tot.n // ctf.ctf)) AS BIGINT) AS rarity_sum,
         |       CAST((1000 * SUM(tf.tf * (tot.n // ctf.ctf))) // SUM(tf.tf) AS BIGINT) AS rarity_milli
         |FROM tf JOIN ctf USING (tok) CROSS JOIN tot
         |GROUP BY tf.doc_id""".stripMargin,
    "text_lm_bigram" ->
      s"""WITH $tokCtes,
         |bgl AS (
         |  SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM tks),
         |tf AS (
         |  SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM bgl GROUP BY 1, 2, 3),
         |c2 AS (SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS c2 FROM tf GROUP BY 1, 2),
         |c1 AS (SELECT w1, CAST(SUM(tf) AS BIGINT) AS c1 FROM tf GROUP BY 1)
         |SELECT tf.doc_id,
         |       CAST(SUM(tf.tf) AS BIGINT) AS n_bigrams,
         |       CAST(SUM(tf.tf * (c1.c1 // c2.c2)) AS BIGINT) AS lm_sum,
         |       CAST((1000 * SUM(tf.tf * (c1.c1 // c2.c2))) // SUM(tf.tf) AS BIGINT) AS lm_milli
         |FROM tf JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
         |GROUP BY tf.doc_id""".stripMargin,
    "text_lm_backoff" ->
      s"""WITH $tokCtes,
         |rtk AS (
         |  SELECT list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tk
         |  FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')),
         |runi AS (SELECT unnest(tk) AS w FROM rtk),
         |c3 AS (SELECT w AS w3, CAST(COUNT(*) AS BIGINT) AS c3 FROM runi GROUP BY 1),
         |ntok AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM runi),
         |rbi AS (
         |  SELECT tk[i] AS b1, tk[i + 1] AS b2, CAST(COUNT(*) AS BIGINT) AS cb
         |  FROM (SELECT tk, unnest(range(1, len(tk))) AS i FROM rtk WHERE len(tk) >= 2)
         |  GROUP BY 1, 2),
         |rtri AS (
         |  SELECT tk[i] AS w1, tk[i + 1] AS w2, tk[i + 2] AS w3,
         |         CAST(COUNT(*) AS BIGINT) AS c123
         |  FROM (SELECT tk, unnest(range(1, len(tk) - 1)) AS i FROM rtk WHERE len(tk) >= 3)
         |  GROUP BY 1, 2, 3),
         |tf AS (
         |  SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2, tk[i + 2] AS w3,
         |         CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) - 1)) AS i
         |        FROM tks WHERE len(tk) >= 3)
         |  GROUP BY 1, 2, 3, 4),
         |scored AS (
         |  SELECT tf.doc_id, tf.tf,
         |         CASE WHEN r.c123 IS NOT NULL THEN 3
         |              WHEN b23.cb IS NOT NULL THEN 2
         |              WHEN c3.c3 IS NOT NULL THEN 1 ELSE 0 END AS tier,
         |         CASE WHEN r.c123 IS NOT NULL THEN 1000000 * r.c123 // b12.cb
         |              WHEN b23.cb IS NOT NULL THEN 400000 * b23.cb // u2.c3
         |              WHEN c3.c3 IS NOT NULL THEN 160000 * c3.c3 // ntok.n
         |              ELSE 0 END AS s_micro
         |  FROM tf
         |  LEFT JOIN rtri r ON r.w1 = tf.w1 AND r.w2 = tf.w2 AND r.w3 = tf.w3
         |  LEFT JOIN rbi b12 ON b12.b1 = tf.w1 AND b12.b2 = tf.w2
         |  LEFT JOIN rbi b23 ON b23.b1 = tf.w2 AND b23.b2 = tf.w3
         |  LEFT JOIN c3 u2 ON u2.w3 = tf.w2
         |  LEFT JOIN c3 ON c3.w3 = tf.w3
         |  CROSS JOIN ntok)
         |SELECT doc_id,
         |       CAST(SUM(tf) AS BIGINT) AS n_trigrams,
         |       CAST(SUM(CASE WHEN tier = 3 THEN tf ELSE 0 END) AS BIGINT) AS n_tri,
         |       CAST(SUM(CASE WHEN tier = 2 THEN tf ELSE 0 END) AS BIGINT) AS n_bi,
         |       CAST(SUM(CASE WHEN tier = 1 THEN tf ELSE 0 END) AS BIGINT) AS n_uni,
         |       CAST(SUM(CASE WHEN tier = 0 THEN tf ELSE 0 END) AS BIGINT) AS n_oov,
         |       CAST(SUM(tf * s_micro) // SUM(tf) AS BIGINT) AS sb_micro
         |FROM scored GROUP BY doc_id""".stripMargin,
    "text_winnow" ->
      s"""WITH $tokCtes,
         |g AS (SELECT doc_id, tk FROM tks WHERE len(tk) >= 3),
         |gr AS (
         |  SELECT doc_id, len(tk) - 2 AS ng, tk, unnest(range(1, len(tk) - 1)) AS i FROM g),
         |hx AS (
         |  SELECT doc_id, ng, i,
         |         CAST(('0x' || substr(md5(tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2]), 1, 12)) AS BIGINT) AS h
         |  FROM gr),
         |wm AS (
         |  SELECT doc_id, ng, i,
         |         MIN(h) OVER (PARTITION BY doc_id ORDER BY i
         |                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
         |  FROM hx),
         |fps AS (
         |  SELECT DISTINCT doc_id, ng, fp FROM wm WHERE i - 1 <= greatest(ng - 4, 0))
         |SELECT doc_id,
         |       CAST(MAX(ng) AS BIGINT) AS n_grams,
         |       CAST(COUNT(*) AS BIGINT) AS n_fps,
         |       md5(array_to_string(list_transform(list_sort(list(fp)), x -> CAST(x AS VARCHAR)), ',')) AS fp_digest
         |FROM fps GROUP BY doc_id""".stripMargin,
    "text_reuse_pairs" ->
      s"""WITH $tokCtes,
         |g AS (SELECT doc_id, tk FROM tks WHERE len(tk) >= 3),
         |gr AS (
         |  SELECT doc_id, len(tk) - 2 AS ng, tk, unnest(range(1, len(tk) - 1)) AS i FROM g),
         |hx AS (
         |  SELECT doc_id, ng, i,
         |         CAST(('0x' || substr(md5(tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2]), 1, 12)) AS BIGINT) AS h
         |  FROM gr),
         |wm AS (
         |  SELECT doc_id, ng, i,
         |         MIN(h) OVER (PARTITION BY doc_id ORDER BY i
         |                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
         |  FROM hx),
         |fps0 AS (
         |  SELECT DISTINCT doc_id, fp FROM wm WHERE i - 1 <= greatest(ng - 4, 0)),
         |dfc AS (SELECT fp FROM fps0 GROUP BY fp HAVING COUNT(*) <= 20),
         |fps AS (SELECT fps0.doc_id, fps0.fp FROM fps0 JOIN dfc USING (fp))
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_shared
         |FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING COUNT(*) >= 2""".stripMargin,
    "corpus_length_buckets" ->
      """WITH t AS (
        |  SELECT CAST(len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |b AS (
        |  SELECT n_tokens,
        |         CAST(CASE WHEN n_tokens <= 16 THEN 16 WHEN n_tokens <= 32 THEN 32
        |                   WHEN n_tokens <= 64 THEN 64 WHEN n_tokens <= 128 THEN 128
        |                   WHEN n_tokens <= 256 THEN 256 ELSE 512 END AS BIGINT) AS bucket
        |  FROM t)
        |SELECT bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(least(n_tokens, bucket)) AS BIGINT) AS sum_tokens,
        |       CAST(bucket * COUNT(*) AS BIGINT) AS padded_tokens,
        |       round(1.0 - CAST(SUM(least(n_tokens, bucket)) AS DOUBLE) / (bucket * COUNT(*)), 4) AS waste_frac
        |FROM b GROUP BY bucket""".stripMargin,
    "dedup_paragraph" ->
      s"""WITH $tokCtes,
         |$linedCte,
         |ls AS (
         |  SELECT doc_id, list_filter(string_split_regex(text, '\\r?\\n'), l -> trim(l) <> '') AS lst
         |  FROM lined),
         |paras0 AS (
         |  SELECT doc_id,
         |         unnest(list_transform(range(1, len(lst) + 1),
         |                i -> struct_pack(pos := i - 1, para := lst[i]))) AS s
         |  FROM ls),
         |paras AS (
         |  SELECT doc_id, CAST(s.pos AS BIGINT) AS pos, s.para AS para,
         |         md5(regexp_replace(trim(lower(s.para)), '\\s+', ' ', 'g')) AS pfp,
         |         struct_pack(doc_id := doc_id, pos := CAST(s.pos AS BIGINT)) AS okey
         |  FROM paras0),
         |firsts AS (SELECT pfp, MIN(okey) AS first_key FROM paras GROUP BY pfp)
         |SELECT p.doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_paras,
         |  CAST(SUM(CASE WHEN p.okey = f.first_key THEN 0 ELSE 1 END) AS BIGINT) AS n_dup,
         |  md5(COALESCE(array_to_string(
         |        list_filter(list(CASE WHEN p.okey = f.first_key THEN p.para END ORDER BY p.pos),
         |                    x -> x IS NOT NULL),
         |        chr(10)), '')) AS clean_md5
         |FROM paras p JOIN firsts f USING (pfp)
         |GROUP BY p.doc_id""".stripMargin,
    "text_clean_lines" ->
      s"""WITH $tokCtes,
         |$linedCte,
         |ls AS (
         |  SELECT doc_id, list_filter(string_split_regex(text, '\\r?\\n'), l -> trim(l) <> '') AS lst
         |  FROM lined),
         |k AS (
         |  SELECT doc_id, lst,
         |         list_filter(lst,
         |           l -> len(list_filter(string_split_regex(trim(l), '\\s+'), w -> w <> '')) >= 5
         |                AND substr(trim(l), length(trim(l)), 1) IN ('.', '!', '?', '"')
         |                AND NOT contains(lower(trim(l)), 'javascript')
         |                AND NOT contains(trim(l), '{')) AS kept
         |  FROM ls)
         |SELECT doc_id,
         |  CAST(len(lst) AS BIGINT) AS n_lines,
         |  CAST(len(kept) AS BIGINT) AS n_kept,
         |  md5(COALESCE(array_to_string(kept, chr(10)), '')) AS kept_md5
         |FROM k""".stripMargin,
    "text_url_domains" ->
      """WITH corpus AS (
        |  SELECT doc_id,
        |         text || ' see https://site' || CAST(doc_id % 7 AS VARCHAR)
        |              || '.example/p/' || CAST(doc_id AS VARCHAR)
        |              || CASE WHEN doc_id % 3 = 0 THEN ' and http://mirror.example/download' ELSE '' END
        |              || CASE WHEN doc_id % 5 = 0
        |                 THEN ' https://site' || CAST(doc_id % 7 AS VARCHAR) || '.example/about'
        |                 ELSE '' END AS text
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text, 'https?://[^\s]+')) AS url
        |  FROM corpus)
        |SELECT regexp_extract(url, 'https?://([^/\s]+)', 1) AS domain,
        |       CAST(COUNT(*) AS BIGINT) AS n_urls,
        |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM u GROUP BY 1""".stripMargin,
    "corpus_shuffle_order" ->
      """SELECT doc_id,
        |       CAST(ROW_NUMBER() OVER (
        |         ORDER BY md5('shuf:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS shuffle_pos
        |FROM documents""".stripMargin,
    // md5-ring rank join + 8-hex-digit probe fold mod n, collisions drop
    "corpus_negative_sample" -> {
      val fold = (1 to 8)
        .map(i => s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1)")
        .reduce((a, b) => s"($a * 16 + $b)")
      s"""WITH cand AS (SELECT DISTINCT CAST(doc_id AS BIGINT) AS nid FROM documents),
         |ranked AS (
         |  SELECT nid, CAST(ROW_NUMBER() OVER (
         |    ORDER BY md5('neg:c:' || CAST(nid AS VARCHAR)), nid) - 1 AS BIGINT) AS idx
         |  FROM cand),
         |p0 AS (
         |  SELECT CAST(doc_id AS BIGINT) AS query_id,
         |         CAST((doc_id * 7 + 13) % 500 AS BIGINT) AS pos_id
         |  FROM documents WHERE doc_id < 16),
         |probes AS (
         |  SELECT query_id, pos_id, CAST(j AS BIGINT) AS j,
         |         md5('neg:p:' || CAST(query_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)) AS h
         |  FROM p0, (SELECT unnest(range(1, 5)) AS j)),
         |ix AS (
         |  SELECT query_id, pos_id, j,
         |         CAST($fold AS BIGINT) % (SELECT COUNT(*) FROM cand) AS idx
         |  FROM probes)
         |SELECT query_id, pos_id, j, ranked.nid AS neg_id
         |FROM ix JOIN ranked USING (idx)
         |WHERE ranked.nid <> ix.pos_id AND ranked.nid <> ix.query_id""".stripMargin
    },
    "corpus_sample_quota" ->
      """SELECT doc_id, source, CAST(bucket AS BIGINT) AS bucket FROM (
        |  SELECT doc_id, source, bucket,
        |         ROW_NUMBER() OVER (
        |           PARTITION BY source
        |           ORDER BY bucket, md5('samp:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM (
        |    SELECT doc_id, source,
        |           (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
        |            + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS bucket
        |    FROM documents))
        |WHERE rk <= 10""".stripMargin,
    "dedup_semantic" -> {
      val src =
        """SELECT vec_id, embedding FROM embeddings
          |        UNION ALL
          |        SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings WHERE vec_id % 20 = 0""".stripMargin
      val dotQC = "list_sum(list_transform(range(1, 65), i -> CAST(q.v[i] AS DOUBLE) * c.cv[i]))"
      val dotAB = "list_sum(list_transform(range(1, 65), i -> CAST(a.v[i] AS DOUBLE) * b.v[i]))"
      s"""WITH ${embCte(src)},
         |cents AS (SELECT id AS centroid_id, v AS cv, nrm AS cnrm FROM e WHERE id < 16),
         |cells AS (
         |  SELECT id, v, nrm, centroid_id FROM (
         |    SELECT q.id, q.v, q.nrm, c.centroid_id,
         |           ROW_NUMBER() OVER (
         |             PARTITION BY q.id
         |             ORDER BY round($dotQC / (q.nrm * c.cnrm), 6) DESC, c.centroid_id) AS rn
         |    FROM e q CROSS JOIN cents c) WHERE rn = 1),
         |pruned AS (
         |  SELECT DISTINCT b.id AS id
         |  FROM cells a JOIN cells b ON a.centroid_id = b.centroid_id AND a.id < b.id
         |  WHERE round($dotAB / (a.nrm * b.nrm), 4) >= 0.99)
         |SELECT c.id AS vec_id, CAST(c.centroid_id AS BIGINT) AS centroid_id,
         |       CAST(CASE WHEN p.id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM cells c LEFT JOIN pruned p ON p.id = c.id""".stripMargin
    },
    "dedup_cross_corpus" ->
      s"""WITH
         |${mhSideCtes("p_", "SELECT doc_id + 5000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 2")},
         |${mhSideCtes("c_", "SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 2")},
         |okb AS (SELECT band, bkey FROM c_bands GROUP BY band, bkey HAVING COUNT(*) <= 50),
         |cbands AS (SELECT b.* FROM c_bands b JOIN okb USING (band, bkey)),
         |cand AS (
         |  SELECT DISTINCT x.id AS probe_id, y.id AS corpus_id
         |  FROM p_bands x JOIN cbands y ON x.band = y.band AND x.bkey = y.bkey),
         |psizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM p_shingles GROUP BY id),
         |csizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM c_shingles GROUP BY id),
         |inter AS (
         |  SELECT c.probe_id, c.corpus_id, CAST(COUNT(*) AS BIGINT) AS inter
         |  FROM cand c
         |  JOIN p_shingles a ON a.id = c.probe_id
         |  JOIN c_shingles b ON b.id = c.corpus_id AND b.tok = a.tok
         |  GROUP BY 1, 2)
         |SELECT i.probe_id, i.corpus_id,
         |       round(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 4) AS jaccard
         |FROM inter i
         |JOIN psizes sa ON sa.id = i.probe_id
         |JOIN csizes sb ON sb.id = i.corpus_id
         |WHERE round(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 4) >= 0.8""".stripMargin,
    "dedup_minhash_lsh" -> minhashLshSql,
    "dedup_edit_verify" ->
      s"""WITH pairs AS (
         |$minhashLshSql
         |)
         |SELECT p.doc_a, p.doc_b,
         |       CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist,
         |       round(1.0 - CAST(levenshtein(da.text, db.text) AS DOUBLE)
         |             / greatest(length(da.text), length(db.text)), 4) AS similarity
         |FROM pairs p
         |JOIN documents da ON da.doc_id = p.doc_a
         |JOIN documents db ON db.doc_id = p.doc_b""".stripMargin,
    // Transitive closure over the minhash near-dup pairs: min reachable id
    // per vertex = the cluster representative. The Spark side iterates
    // min-label propagation to fixpoint; the closure below is the same
    // fixpoint expressed recursively.
    "dedup_clusters" ->
      s"""WITH RECURSIVE pairs AS (
         |$minhashLshSql
         |),
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION
         |  SELECT doc_b AS a, doc_a AS b FROM pairs),
         |reach(id, r) AS (
         |  SELECT DISTINCT a, a FROM edges
         |  UNION
         |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id)
         |SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id""".stripMargin,
    // Incremental assignment of the re-crawl batch: min reachable id over
    // (cross pairs mapped through the history cluster labels) ∪ (batch-
    // internal pairs) — batch ids only, exactly Dedup.assignClusters.
    "dedup_clusters_incremental" -> {
      val batchSrc =
        """SELECT doc_id + 7000000 AS doc_id, text FROM documents WHERE doc_id % 11 = 7
          |        UNION ALL
          |        SELECT doc_id + 8000000 AS doc_id, text FROM documents WHERE doc_id % 22 = 7""".stripMargin
      s"""WITH RECURSIVE
         |${incClusterCtes(batchSrc, "SELECT doc_id, text FROM documents")}
         |SELECT id AS doc_id, r AS cluster_id FROM labels WHERE id >= 7000000""".stripMargin
    },
    // History clusters whose batch-local label moved off their own id —
    // the clusters the batch bridged (Dedup.clusterMergeAudit): prefix/
    // suffix crawl fragments of each seed sit in different clusters until
    // the batch re-crawls the full seed text and connects them.
    "dedup_cluster_merge_audit" -> {
      val seedTk =
        """SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS tk
          |          FROM documents WHERE doc_id % 31 = 11""".stripMargin
      val corpusSrc =
        s"""SELECT doc_id, text FROM documents WHERE doc_id % 31 <> 11
           |        UNION ALL
           |        SELECT doc_id + 600000 AS doc_id,
           |               array_to_string(tk[1:(17 * len(tk)) // 20], ' ') AS text
           |        FROM ($seedTk)
           |        UNION ALL
           |        SELECT doc_id + 650000 AS doc_id,
           |               array_to_string(tk[(3 * len(tk)) // 20 + 1:len(tk)], ' ') AS text
           |        FROM ($seedTk)""".stripMargin
      val batchSrc =
        "SELECT doc_id + 7000000 AS doc_id, text FROM documents WHERE doc_id % 31 = 11"
      s"""WITH RECURSIVE
         |${incClusterCtes(batchSrc, corpusSrc)}
         |SELECT hn.b AS cluster_id, l.r AS merged_into
         |FROM (SELECT DISTINCT b FROM xedges) hn
         |JOIN labels l ON l.id = hn.b
         |WHERE l.r <> hn.b""".stripMargin
    },
    "corpus_split" ->
      """WITH h AS (
        |  SELECT doc_id,
        |         (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
        |          + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS bucket
        |  FROM documents)
        |SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
        |       CASE WHEN bucket < 179 THEN 'train'
        |            WHEN bucket < 217 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM h""".stripMargin,
    "text_pii_redact" ->
      """WITH corpus AS (
        |  SELECT doc_id,
        |         text || ' contact user' || CAST(doc_id AS VARCHAR)
        |              || '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
        |              || '.77 or call 555-0142' AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(text, '\b\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
        |  md5(regexp_replace(
        |        regexp_replace(
        |          regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |          '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |        '\b\d{3}-\d{4}\b', '<PHONE>', 'g')) AS clean_md5
        |FROM corpus""".stripMargin,
    "dedup_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |fp AS (
        |  SELECT doc_id,
        |         md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint
        |  FROM corpus)
        |SELECT fingerprint, CAST(COUNT(*) AS BIGINT) AS n_docs, MIN(doc_id) AS min_doc_id
        |FROM fp GROUP BY 1 HAVING COUNT(*) > 1""".stripMargin,
    "dedup_soft_weights" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |fp AS (
        |  SELECT doc_id,
        |         md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint
        |  FROM corpus),
        |c AS (SELECT fingerprint, CAST(COUNT(*) AS BIGINT) AS n_copies FROM fp GROUP BY 1)
        |SELECT fp.doc_id, fp.fingerprint, c.n_copies,
        |       CAST(greatest(1000 // c.n_copies, 1) AS BIGINT) AS weight_milli
        |FROM fp JOIN c USING (fingerprint)""".stripMargin,
    "corpus_token_drift" ->
      """WITH prev AS (
        |  SELECT doc_id, text
        |    || CASE WHEN doc_id % 6 = 0 THEN ' qqshift qqshift qqshift qqshift qqshift qqshift qqshift qqshift' ELSE '' END
        |    || CASE WHEN doc_id % 5 = 0 THEN ' qqgone qqgone' ELSE '' END AS text
        |  FROM documents),
        |cur AS (
        |  SELECT doc_id, text
        |    || CASE WHEN doc_id % 4 = 0 THEN ' qqdrift qqdrift qqdrift' ELSE '' END
        |    || CASE WHEN doc_id % 6 = 0 THEN ' qqshift' ELSE '' END AS text
        |  FROM documents WHERE doc_id % 10 <> 3),
        |ptf AS (
        |  SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS prev_tf
        |  FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS tok FROM prev)
        |  GROUP BY 1),
        |ctf AS (
        |  SELECT tok AS token, CAST(COUNT(*) AS BIGINT) AS cur_tf
        |  FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS tok FROM cur)
        |  GROUP BY 1),
        |j AS (
        |  SELECT COALESCE(p.token, c.token) AS token,
        |         COALESCE(p.prev_tf, 0) AS prev_tf, COALESCE(c.cur_tf, 0) AS cur_tf
        |  FROM ptf p FULL OUTER JOIN ctf c ON p.token = c.token),
        |f AS (SELECT * FROM j WHERE greatest(prev_tf, cur_tf) >= 5),
        |r AS (
        |  SELECT token, prev_tf, cur_tf,
        |         (prev_tf * 1000000) // (SELECT CAST(SUM(prev_tf) AS BIGINT) FROM ptf) AS prev_ppm,
        |         (cur_tf * 1000000) // (SELECT CAST(SUM(cur_tf) AS BIGINT) FROM ctf) AS cur_ppm,
        |         CASE WHEN prev_tf = 0 THEN 'new' WHEN cur_tf = 0 THEN 'gone' ELSE 'shifted' END AS status
        |  FROM f),
        |o AS (
        |  SELECT token, prev_tf, cur_tf,
        |         CAST(prev_ppm AS BIGINT) AS prev_ppm, CAST(cur_ppm AS BIGINT) AS cur_ppm, status,
        |         CAST(CASE WHEN status = 'shifted' AND prev_ppm >= 1
        |              THEN (cur_ppm * 1000) // prev_ppm ELSE -1 END AS BIGINT) AS drift_milli
        |  FROM r)
        |SELECT token, prev_tf, cur_tf, prev_ppm, cur_ppm, status, drift_milli
        |FROM o
        |WHERE status <> 'shifted' OR drift_milli = -1
        |   OR drift_milli >= 2000 OR drift_milli <= 500""".stripMargin,
    "dedup_prefix" ->
      s"""WITH $tokCtes
         |SELECT md5(COALESCE(array_to_string(tk[1:8], ' '), '')) AS prefix_fp,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       MIN(doc_id) AS min_doc_id
         |FROM tks WHERE len(tk) > 0 GROUP BY 1 HAVING COUNT(*) > 1""".stripMargin,
    "dedup_simhash" ->
      s"""WITH $tokCtes,
         |th AS (SELECT DISTINCT id, md5(tok) AS h FROM tok),
         |votes AS (
         |  SELECT id,
         |         $simhashVotes
         |  FROM th GROUP BY id)
         |SELECT id AS doc_id, CAST($simhashValue AS BIGINT) AS simhash FROM votes""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH $tokCtes,
         |grams AS (
         |  SELECT doc_id AS id,
         |         unnest(list_distinct(list_transform(range(1, len(tk) - 1),
         |                i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS gram
         |  FROM tks WHERE len(tk) >= 3),
         |rare AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) <= 20),
         |g AS (SELECT id, gram FROM grams WHERE gram IN (SELECT gram FROM rare)),
         |sizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY id),
         |pr AS (
         |  SELECT a.id AS doc_a, b.id AS doc_b, CAST(COUNT(*) AS BIGINT) AS inter
         |  FROM g a JOIN g b ON a.gram = b.gram AND a.id < b.id
         |  GROUP BY 1, 2)
         |${jaccardSql("pr", 0.8, "i.inter,")}""".stripMargin,
    // Brute force on purpose: the Spark side prunes with the prefix
    // filter, the oracle enumerates every length-compatible pair — a
    // hash match certifies the filter dropped nothing. Integer-exact
    // keep test (1000*inter >= t*(union)), display-only rounding.
    "dedup_setjoin_exact" ->
      s"""WITH $tokCtes,
         |gsets AS (
         |  SELECT doc_id AS id,
         |         list_distinct(list_transform(range(1, len(tk) - 1),
         |                i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS lst
         |  FROM tks WHERE len(tk) >= 3),
         |sz AS (SELECT id, lst, CAST(len(lst) AS BIGINT) AS n FROM gsets),
         |pairs AS (
         |  SELECT a.id AS doc_a, b.id AS doc_b,
         |         CAST(len(list_intersect(a.lst, b.lst)) AS BIGINT) AS inter,
         |         a.n AS na, b.n AS nb
         |  FROM sz a JOIN sz b
         |    ON a.id < b.id AND 1000*LEAST(a.n, b.n) >= 800*GREATEST(a.n, b.n))
         |SELECT doc_a, doc_b, inter,
         |       round(CAST(inter AS DOUBLE)/(na + nb - inter), 4) AS jaccard
         |FROM pairs WHERE 1000*inter >= 800*(na + nb - inter)""".stripMargin,
    // Brute force on purpose (the dedup_setjoin_exact move): every
    // length-compatible pair gets the exact prefix+suffix edit check; a
    // hash match certifies the deletion-neighborhood join is complete
    // AND its verify stage rejects the shared-signature distance-2 pairs
    "dedup_token_edit" ->
      s"""WITH $tokCtes,
         |t AS (SELECT doc_id AS id, tk, CAST(len(tk) AS BIGINT) AS n
         |      FROM tks WHERE len(tk) > 0),
         |pr AS (
         |  SELECT a.id AS doc_a, b.id AS doc_b, a.tk AS ta, b.tk AS tb,
         |         a.n AS na, b.n AS nb
         |  FROM t a JOIN t b ON a.id < b.id AND abs(a.n - b.n) <= 1),
         |mp AS (
         |  SELECT doc_a, doc_b, na, nb,
         |    list_position(list_transform(range(1, CAST(GREATEST(na, nb) AS INT) + 1),
         |        i -> COALESCE(ta[i] = tb[i], false)), false) AS pp,
         |    list_position(list_transform(range(1, CAST(GREATEST(na, nb) AS INT) + 1),
         |        i -> COALESCE(list_reverse(ta)[i] = list_reverse(tb)[i], false)), false) AS sp
         |  FROM pr),
         |-- list_position returns 0 (not NULL) for not-found: no mismatch
         |-- means fully equal arrays, p = the common length
         |m AS (
         |  SELECT doc_a, doc_b, na, nb,
         |    CASE WHEN pp IS NULL OR pp = 0 THEN LEAST(na, nb) ELSE pp - 1 END AS p,
         |    CASE WHEN sp IS NULL OR sp = 0 THEN LEAST(na, nb) ELSE sp - 1 END AS s
         |  FROM mp)
         |SELECT doc_a, doc_b,
         |       CAST(CASE WHEN na = nb AND p >= na THEN 0 ELSE 1 END AS BIGINT) AS ed,
         |       na, nb
         |FROM m
         |WHERE (na = nb AND (p >= na OR p + s >= na - 1))
         |   OR (na <> nb AND p + s >= LEAST(na, nb))""".stripMargin,
    // NOT brute force: the drift audit's numbers are properties of the
    // prefix MECHANICS, so the oracle mirrors them exactly — md5 trigram
    // digests, (df asc, digest) ranks per doc, plen = n - ceil(t*n) + 1,
    // candidate self-joins under the frozen and fresh orders
    "dedup_setjoin_drift" ->
      """WITH bt AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS tk
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id AS id,
        |         unnest(list_distinct(list_transform(range(1, len(tk) - 1),
        |                i -> md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])))) AS tok
        |  FROM bt WHERE len(tk) >= 3),
        |fdf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM bg GROUP BY 1),
        |dt AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(
        |           lower(text || ' breaking news update breaking news update'), '\s+'),
        |           t -> t <> '') AS tk
        |  FROM documents WHERE doc_id % 3 = 0),
        |dg AS MATERIALIZED (
        |  SELECT doc_id AS id,
        |         unnest(list_distinct(list_transform(range(1, len(tk) - 1),
        |                i -> md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])))) AS tok
        |  FROM dt WHERE len(tk) >= 3),
        |ndf AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM dg GROUP BY 1),
        |sz AS MATERIALIZED (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM dg GROUP BY 1),
        |fr AS (
        |  SELECT dg.id, dg.tok, s.n,
        |         ROW_NUMBER() OVER (PARTITION BY dg.id
        |           ORDER BY COALESCE(f.df, 0), dg.tok) AS rk
        |  FROM dg JOIN sz s ON s.id = dg.id LEFT JOIN fdf f ON f.tok = dg.tok),
        |fp AS MATERIALIZED (
        |  SELECT id, tok, n FROM fr WHERE rk <= n - (n * 800 + 999) // 1000 + 1),
        |nr AS (
        |  SELECT dg.id, dg.tok, s.n,
        |         ROW_NUMBER() OVER (PARTITION BY dg.id ORDER BY f.df, dg.tok) AS rk
        |  FROM dg JOIN sz s ON s.id = dg.id JOIN ndf f ON f.tok = dg.tok),
        |np AS MATERIALIZED (
        |  SELECT id, tok, n FROM nr WHERE rk <= n - (n * 800 + 999) // 1000 + 1),
        |cf AS (SELECT CAST(COUNT(*) AS BIGINT) AS cand_frozen FROM (
        |  SELECT DISTINCT a.id AS da, b.id AS db FROM fp a JOIN fp b
        |  ON a.tok = b.tok AND a.id < b.id
        |  AND 1000 * LEAST(a.n, b.n) >= 800 * GREATEST(a.n, b.n))),
        |cn AS (SELECT CAST(COUNT(*) AS BIGINT) AS cand_fresh FROM (
        |  SELECT DISTINCT a.id AS da, b.id AS db FROM np a JOIN np b
        |  ON a.tok = b.tok AND a.id < b.id
        |  AND 1000 * LEAST(a.n, b.n) >= 800 * GREATEST(a.n, b.n))),
        |pf AS (SELECT CAST(COUNT(*) AS BIGINT) AS prefix_frozen FROM fp),
        |pn AS (SELECT CAST(COUNT(*) AS BIGINT) AS prefix_fresh FROM np),
        |nd AS (SELECT CAST(COUNT(DISTINCT id) AS BIGINT) AS n_docs FROM dg)
        |SELECT n_docs, prefix_frozen, cand_frozen, prefix_fresh, cand_fresh,
        |       CAST((1000000 * cand_frozen) // GREATEST(cand_fresh, 1) AS BIGINT)
        |         AS inflation_ppm
        |FROM nd CROSS JOIN pf CROSS JOIN cf CROSS JOIN pn CROSS JOIN cn""".stripMargin,
    // Brute force over the UNION corpus restricted to pairs touching the
    // batch: a hash match proves the frozen-order prefix probe equals the
    // full batch join's batch slice, lifecycle (append/tombstone/compact)
    // included
    "dedup_setjoin_incremental" ->
      """WITH corb AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, text || ' fresh crawl ' || CAST(doc_id AS VARCHAR)
        |  FROM documents WHERE doc_id % 10 = 5),
        |tksb AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS tk
        |  FROM corb),
        |gsets AS (
        |  SELECT doc_id AS id,
        |         list_distinct(list_transform(range(1, len(tk) - 1),
        |                i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS lst
        |  FROM tksb WHERE len(tk) >= 3),
        |sz AS (SELECT id, lst, CAST(len(lst) AS BIGINT) AS n FROM gsets),
        |pairs AS (
        |  SELECT a.id AS doc_a, b.id AS doc_b,
        |         CAST(len(list_intersect(a.lst, b.lst)) AS BIGINT) AS inter,
        |         a.n AS na, b.n AS nb
        |  FROM sz a JOIN sz b
        |    ON a.id < b.id AND 1000*LEAST(a.n, b.n) >= 800*GREATEST(a.n, b.n)
        |   AND (a.id >= 1000000 OR b.id >= 1000000))
        |SELECT doc_a, doc_b, inter,
        |       round(CAST(inter AS DOUBLE)/(na + nb - inter), 4) AS jaccard
        |FROM pairs WHERE 1000*inter >= 800*(na + nb - inter)""".stripMargin,
    // same union-restricted brute force for the signature-index probe
    "dedup_token_edit_incremental" ->
      """WITH corb AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, text || ' zz' FROM documents WHERE doc_id % 10 = 5),
        |tksb AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS tk
        |  FROM corb),
        |t AS (SELECT doc_id AS id, tk, CAST(len(tk) AS BIGINT) AS n
        |      FROM tksb WHERE len(tk) > 0),
        |pr AS (
        |  SELECT a.id AS doc_a, b.id AS doc_b, a.tk AS ta, b.tk AS tb,
        |         a.n AS na, b.n AS nb
        |  FROM t a JOIN t b ON a.id < b.id AND abs(a.n - b.n) <= 1
        |   AND (a.id >= 1000000 OR b.id >= 1000000)),
        |mp AS (
        |  SELECT doc_a, doc_b, na, nb,
        |    list_position(list_transform(range(1, CAST(GREATEST(na, nb) AS INT) + 1),
        |        i -> COALESCE(ta[i] = tb[i], false)), false) AS pp,
        |    list_position(list_transform(range(1, CAST(GREATEST(na, nb) AS INT) + 1),
        |        i -> COALESCE(list_reverse(ta)[i] = list_reverse(tb)[i], false)), false) AS sp
        |  FROM pr),
        |m AS (
        |  SELECT doc_a, doc_b, na, nb,
        |    CASE WHEN pp IS NULL OR pp = 0 THEN LEAST(na, nb) ELSE pp - 1 END AS p,
        |    CASE WHEN sp IS NULL OR sp = 0 THEN LEAST(na, nb) ELSE sp - 1 END AS s
        |  FROM mp)
        |SELECT doc_a, doc_b,
        |       CAST(CASE WHEN na = nb AND p >= na THEN 0 ELSE 1 END AS BIGINT) AS ed,
        |       na, nb
        |FROM m
        |WHERE (na = nb AND (p >= na OR p + s >= na - 1))
        |   OR (na <> nb AND p + s >= LEAST(na, nb))""".stripMargin,
    "dedup_embedding_cosine" -> {
      val src =
        """SELECT vec_id, embedding FROM embeddings
          |        UNION ALL
          |        SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings WHERE vec_id % 20 = 0""".stripMargin
      s"""WITH ${embCte(src)}
         |SELECT q.id AS vec_a, c.id AS vec_b,
         |       round($dotSql / (q.nrm * c.nrm), 4) AS cosine
         |FROM e q JOIN e c ON q.bucket = c.bucket AND q.id < c.id
         |WHERE round($dotSql / (q.nrm * c.nrm), 4) >= 0.99""".stripMargin
    },
    // same blocking + cosine recipe as dedup_embedding_cosine, cross-
    // corpus; per-vector rollup with the (cos DESC, bench_id ASC) argmax
    "contamination_semantic" -> {
      val bucket = (0 until 8)
        .map(i => s"(CASE WHEN embedding[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END)")
        .mkString(" + ")
      val nrm =
        "sqrt(list_sum(list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE) * embedding[i])))"
      s"""WITH e AS (
         |  SELECT vec_id AS id, embedding AS v, CAST($bucket AS BIGINT) AS bucket, $nrm AS nrm
         |  FROM embeddings),
         |bq AS (
         |  SELECT vec_id + 1000000 AS id, embedding AS v, CAST($bucket AS BIGINT) AS bucket, $nrm AS nrm
         |  FROM embeddings WHERE vec_id % 17 = 0),
         |sc AS (
         |  SELECT c.id AS vec_id, q.id AS bench_id,
         |         round($dotSql / (q.nrm * c.nrm), 4) AS cos
         |  FROM e c JOIN bq q ON c.bucket = q.bucket
         |  WHERE round($dotSql / (q.nrm * c.nrm), 4) >= 0.99),
         |agg AS (SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_hits FROM sc GROUP BY 1),
         |best AS (
         |  SELECT vec_id, cos AS best_cosine, bench_id AS best_bench_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, bench_id) AS rn
         |    FROM sc)
         |  WHERE rn = 1)
         |SELECT a.vec_id, a.n_hits, b.best_cosine, CAST(b.best_bench_id AS BIGINT) AS best_bench_id
         |FROM agg a JOIN best b USING (vec_id)""".stripMargin
    },
    // both rankers' oracle chains at k=10 + the contribution flip: each
    // shared doc contributes the driver-literal tail weight W(max rank)
    "ann_rbo_audit" -> {
      val p = BigDecimal(900) / 1000
      val wd = (1 to 10).map(d => (1 - p) * p.pow(d - 1) / d)
      val wArr = (1 to 10)
        .map(m =>
          (wd.drop(m - 1).sum * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
        .mkString(", ")
      s"""WITH ${embCte("SELECT vec_id, embedding FROM embeddings")},
         |asg AS (
         |  SELECT q.id AS vid, c.id AS cid,
         |         ROW_NUMBER() OVER (
         |           PARTITION BY q.id
         |           ORDER BY round($dotSql / (q.nrm * c.nrm), 6) DESC, c.id) AS rn
         |  FROM e q JOIN e c ON c.id < 16),
         |cells AS (SELECT vid, cid FROM asg WHERE rn = 1),
         |probes AS (SELECT vid AS query_id, cid FROM asg WHERE vid < 8 AND rn <= 4),
         |iscored AS (
         |  SELECT p.query_id, m.vid AS neighbor_id,
         |         round($dotSql / (q.nrm * c.nrm), 6) AS cos_r
         |  FROM probes p
         |  JOIN cells m ON p.cid = m.cid AND m.vid <> p.query_id
         |  JOIN e q ON q.id = p.query_id
         |  JOIN e c ON c.id = m.vid),
         |ra AS (
         |  SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank_a FROM (
         |    SELECT *, ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY cos_r DESC, neighbor_id) AS rank
         |    FROM iscored)
         |  WHERE rank <= 10),
         |rb AS (
         |  SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank_b FROM (
         |    SELECT q.id AS query_id, c.id AS neighbor_id,
         |           ROW_NUMBER() OVER (PARTITION BY q.id
         |             ORDER BY round($dotSql / (q.nrm * c.nrm), 6) DESC, c.id) AS rank
         |    FROM e q JOIN e c ON q.id < 8 AND c.id <> q.id)
         |  WHERE rank <= 10),
         |mt AS (
         |  SELECT ra.query_id,
         |         ([$wArr])[CAST(greatest(ra.rank_a, rb.rank_b) AS INT)] AS w
         |  FROM ra JOIN rb ON rb.query_id = ra.query_id
         |                 AND rb.neighbor_id = ra.neighbor_id),
         |agg AS (
         |  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_overlap,
         |         CAST(SUM(w) AS BIGINT) AS rbo_ppm
         |  FROM mt GROUP BY 1)
         |SELECT qs.query_id,
         |       CAST(COALESCE(agg.n_overlap, 0) AS BIGINT) AS n_overlap,
         |       CAST(COALESCE(agg.rbo_ppm, 0) AS BIGINT) AS rbo_ppm
         |FROM (SELECT DISTINCT query_id FROM ra) qs
         |LEFT JOIN agg ON agg.query_id = qs.query_id""".stripMargin
    },
    // milli vectors, exact integer squared distances, rank-2 pick per
    // vector, trunc-div ppm silhouette, per-cell fold
    "ann_silhouette" ->
      """WITH m AS (
        |  SELECT vec_id, list_transform(range(1, 65),
        |           i -> CAST(round(CAST(embedding[i] AS DOUBLE) * 1000, 0) AS BIGINT)) AS vm
        |  FROM embeddings),
        |cents AS (SELECT vec_id AS centroid_id, vm AS cm FROM m WHERE vec_id < 8),
        |d AS (
        |  SELECT m.vec_id, c.centroid_id,
        |         CAST(list_sum(list_transform(range(1, 65),
        |           i -> (m.vm[i] - c.cm[i]) * (m.vm[i] - c.cm[i]))) AS BIGINT) AS d2
        |  FROM m, cents c),
        |rk AS (
        |  SELECT vec_id, centroid_id, d2,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, centroid_id) AS rn
        |  FROM d),
        |ab AS (
        |  SELECT vec_id,
        |         MIN(CASE WHEN rn = 1 THEN centroid_id END) AS centroid_id,
        |         MIN(CASE WHEN rn = 1 THEN d2 END) AS a,
        |         MIN(CASE WHEN rn = 2 THEN d2 END) AS b
        |  FROM rk WHERE rn <= 2 GROUP BY 1),
        |sv AS (
        |  SELECT centroid_id,
        |         CASE WHEN greatest(a, b) > 0
        |              THEN CAST((1000000 * (b - a)) // greatest(a, b) AS BIGINT) END AS s_ppm
        |  FROM ab)
        |SELECT centroid_id, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(s_ppm) // COUNT(s_ppm) AS BIGINT) AS mean_s_ppm,
        |       CAST(MIN(s_ppm) AS BIGINT) AS min_s_ppm
        |FROM sv GROUP BY 1""".stripMargin,
    // both rankers mirrored (exact-cosine top-10, distinct-token overlap
    // top-10), then the integer RRF combine: 1000000 // (60 + best rank)
    "search_rrf_hybrid" ->
      s"""WITH ${embCte("SELECT vec_id, embedding FROM embeddings")},
         |dense AS (
         |  SELECT query_id, neighbor_id AS doc_id, CAST(rank AS BIGINT) AS rank FROM (
         |    SELECT q.id AS query_id, c.id AS neighbor_id,
         |           ROW_NUMBER() OVER (PARTITION BY q.id
         |             ORDER BY round($dotSql / (q.nrm * c.nrm), 6) DESC, c.id) AS rank
         |    FROM e q JOIN e c ON q.id < 8 AND c.id <> q.id)
         |  WHERE rank <= 10),
         |tok AS (
         |  SELECT DISTINCT doc_id, tok FROM (
         |    SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
         |                                      t -> t <> '')) AS tok
         |    FROM documents)),
         |lex0 AS (
         |  SELECT q.doc_id AS query_id, c.doc_id, CAST(COUNT(*) AS BIGINT) AS ov
         |  FROM tok q JOIN tok c ON c.tok = q.tok AND q.doc_id < 8 AND c.doc_id <> q.doc_id
         |  GROUP BY 1, 2),
         |lex AS (
         |  SELECT query_id, doc_id, CAST(rank AS BIGINT) AS rank FROM (
         |    SELECT query_id, doc_id, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY ov DESC, doc_id) AS rank
         |    FROM lex0)
         |  WHERE rank <= 10),
         |best AS (
         |  SELECT src, query_id, doc_id, MIN(rank) AS best FROM (
         |    SELECT 'dense' AS src, * FROM dense
         |    UNION ALL SELECT 'lex', * FROM lex)
         |  GROUP BY 1, 2, 3),
         |fused AS (
         |  SELECT query_id, doc_id,
         |         CAST(SUM(1000000 // (60 + best)) AS BIGINT) AS score_ppm,
         |         CAST(COUNT(*) AS BIGINT) AS n_sources,
         |         MIN(best) AS best_rank
         |  FROM best GROUP BY 1, 2)
         |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score_ppm, n_sources, best_rank
         |FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY score_ppm DESC, n_sources DESC, doc_id) AS rank
         |  FROM fused)
         |WHERE rank <= 5""".stripMargin,
    "similarity_topk" ->
      s"""WITH ${embCte("SELECT vec_id, embedding FROM embeddings")},
         |scored AS (
         |  SELECT q.id AS query_id, c.id AS neighbor_id,
         |         round($dotSql / (q.nrm * c.nrm), 6) AS cos_r
         |  FROM e q JOIN e c ON q.id < 8 AND c.id <> q.id)
         |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos_r FROM (
         |  SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cos_r DESC, neighbor_id) AS rank
         |  FROM scored)
         |WHERE rank <= 5""".stripMargin,
    "similarity_topk_mmr" -> mmrOracleSql(k = 5, pool = 15, lam = 700),
    // projected pool (same md5-parity matrix as embedding_project; exact
    // integer dots/norms in JL space), restricted to the query's sign-LSH
    // bucket over the first 4 projected coordinates (bit t-1 = pv[t] > 0)
    // with Hamming<=1 multi-probe on the query side, mirroring
    // Similarity.projectedTopK bits=4, + exact rerank on the originals
    "similarity_topk_projected" -> {
      val sign =
        """(CASE WHEN substr(md5(CAST(i - 1 AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 1)
          |               IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE -1 END)""".stripMargin
      s"""WITH pr0 AS (
         |  SELECT vec_id AS id,
         |         list_transform(range(0, 16), j ->
         |           CAST(list_sum(list_transform(range(1, 65), i ->
         |             CAST(round(CAST(embedding[i] AS DOUBLE) * 1000, 0) AS BIGINT) *
         |             $sign)) AS BIGINT)) AS pv
         |  FROM embeddings),
         |pr AS (
         |  SELECT id, pv,
         |         CAST(list_sum(list_transform(range(1, 5), t ->
         |           CASE WHEN pv[t] > 0 THEN 1 << (t - 1) ELSE 0 END)) AS BIGINT) AS bkt
         |  FROM pr0),
         |prq AS (
         |  SELECT id, pv,
         |         unnest([bkt, xor(bkt, 1), xor(bkt, 2), xor(bkt, 4), xor(bkt, 8)]) AS bkt
         |  FROM pr WHERE id < 8),
         |pc AS (
         |  SELECT q.id AS query_id, c.id AS neighbor_id,
         |         round(
         |           CAST(list_sum(list_transform(range(1, 17), t -> q.pv[t] * c.pv[t])) AS DOUBLE)
         |           / sqrt(
         |               CAST(list_sum(list_transform(range(1, 17), t -> q.pv[t] * q.pv[t])) AS DOUBLE)
         |             * CAST(list_sum(list_transform(range(1, 17), t -> c.pv[t] * c.pv[t])) AS DOUBLE)),
         |           6) AS pcos_r
         |  FROM prq q JOIN pr c ON q.bkt = c.bkt AND c.id <> q.id),
         |pool AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY pcos_r DESC, neighbor_id) AS prank
         |    FROM pc) t WHERE prank <= 15),
         |${embCte("SELECT vec_id, embedding FROM embeddings")}
         |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos_r FROM (
         |  SELECT p.query_id, p.neighbor_id,
         |         round($dotSql / (q.nrm * c.nrm), 6) AS cos_r,
         |         ROW_NUMBER() OVER (
         |           PARTITION BY p.query_id
         |           ORDER BY round($dotSql / (q.nrm * c.nrm), 6) DESC, p.neighbor_id) AS rank
         |  FROM pool p
         |  JOIN e q ON q.id = p.query_id
         |  JOIN e c ON c.id = p.neighbor_id) t
         |WHERE rank <= 5""".stripMargin
    },
    "similarity_topk_lsh" ->
      s"""WITH ${embCte("SELECT vec_id, embedding FROM embeddings")},
         |scored AS (
         |  SELECT q.id AS query_id, c.id AS neighbor_id,
         |         round($dotSql / (q.nrm * c.nrm), 6) AS cos_r
         |  FROM e q JOIN e c ON q.bucket = c.bucket AND q.id < 8 AND c.id <> q.id)
         |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos_r FROM (
         |  SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cos_r DESC, neighbor_id) AS rank
         |  FROM scored)
         |WHERE rank <= 5""".stripMargin,
    // Mirrors dimStats: milli elements via round(x*1000), exact integer
    // sum/sum-of-squares per position (HUGEINT = Spark's decimal(38,0)),
    // mean/std finished in DOUBLE + floor exactly like the Spark side.
    "embedding_dim_stats" ->
      """WITH e AS (
        |  SELECT embedding, unnest(range(0, len(embedding))) AS pos FROM embeddings),
        |m AS (
        |  SELECT CAST(pos AS BIGINT) AS pos,
        |         CAST(round(CAST(embedding[pos + 1] AS DOUBLE) * 1000, 0) AS BIGINT) AS xm
        |  FROM e),
        |s AS (
        |  SELECT pos, CAST(COUNT(*) AS BIGINT) AS n,
        |         SUM(CAST(xm AS HUGEINT)) AS sm,
        |         SUM(CAST(xm AS HUGEINT) * xm) AS sq
        |  FROM m GROUP BY pos)
        |SELECT pos, n,
        |       CAST(floor(CAST(sm AS DOUBLE) / n) AS BIGINT) AS mean_milli,
        |       CAST(floor(sqrt(CAST(n * sq - sm * sm AS DOUBLE)
        |                       / (CAST(n AS DOUBLE) * n))) AS BIGINT) AS std_milli
        |FROM s""".stripMargin,
    // Same md5-parity sign matrix and milli rounding as Similarity
    // .projectMilli; list_sum promotes to HUGEINT, hence the final CAST.
    "embedding_project" ->
      """WITH p AS (
        |  SELECT vec_id, unnest(range(0, 16)) AS pos, embedding FROM embeddings)
        |SELECT vec_id, CAST(pos AS BIGINT) AS pos,
        |       CAST(list_sum(list_transform(range(1, 65), i ->
        |         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000, 0) AS BIGINT) *
        |         (CASE WHEN substr(md5(CAST(i - 1 AS VARCHAR) || ':' || CAST(pos AS VARCHAR)), 1, 1)
        |               IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE -1 END)))
        |         AS BIGINT) AS p_milli
        |FROM p""".stripMargin,
    // Mirrors standardizeMilli's exploded face: z = floor((xm - mean)*1000
    // / greatest(std, 1)) against the same-corpus dim stats.
    "embedding_standardize" ->
      """WITH e AS (
        |  SELECT vec_id, embedding, unnest(range(0, len(embedding))) AS pos FROM embeddings),
        |m AS (
        |  SELECT vec_id, CAST(pos AS BIGINT) AS pos,
        |         CAST(round(CAST(embedding[pos + 1] AS DOUBLE) * 1000, 0) AS BIGINT) AS xm
        |  FROM e),
        |s AS (
        |  SELECT pos, CAST(COUNT(*) AS BIGINT) AS n,
        |         SUM(CAST(xm AS HUGEINT)) AS sm,
        |         SUM(CAST(xm AS HUGEINT) * xm) AS sq
        |  FROM m GROUP BY pos),
        |st AS (
        |  SELECT pos,
        |         CAST(floor(CAST(sm AS DOUBLE) / n) AS BIGINT) AS mean_milli,
        |         GREATEST(CAST(floor(sqrt(CAST(n * sq - sm * sm AS DOUBLE)
        |                         / (CAST(n AS DOUBLE) * n))) AS BIGINT), 1) AS std_milli
        |  FROM s)
        |SELECT m.vec_id, m.pos,
        |       CAST(floor(CAST(m.xm - st.mean_milli AS DOUBLE) * 1000
        |                  / CAST(st.std_milli AS DOUBLE)) AS BIGINT) AS z_milli
        |FROM m JOIN st USING (pos)""".stripMargin,
    "embedding_quantize" ->
      """SELECT vec_id,
        |  round(mab, 6) AS scale_r,
        |  CAST(list_sum(q) AS BIGINT) AS q_sum,
        |  md5(array_to_string(q, ',')) AS q_md5
        |FROM (
        |  SELECT vec_id, mab,
        |         CASE WHEN mab = 0
        |           THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
        |           ELSE list_transform(embedding,
        |                  x -> CAST(round(127.0 * CAST(x AS DOUBLE) / mab, 0) AS BIGINT))
        |         END AS q
        |  FROM (
        |    SELECT vec_id, embedding,
        |           list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mab
        |    FROM embeddings))""".stripMargin,
    "corpus_quality_gate" ->
      s"""WITH $tokCtes,
         |q AS (
         |  SELECT d.doc_id, d.source,
         |         CAST(round(round(least(CAST(len(tk) AS DOUBLE) / 100.0, 1.0) *
         |              (1.0 - CAST(len(list_filter(tk, t -> t IN ($stopList))) AS DOUBLE)
         |                / greatest(len(tk), 1)), 4) * 10000, 0) AS BIGINT) AS q_i
         |  FROM tks JOIN documents d ON d.doc_id = tks.doc_id),
         |h AS (SELECT source, q_i, COUNT(*) AS cnt FROM q GROUP BY 1, 2),
         |c AS (
         |  SELECT source, q_i,
         |         SUM(cnt) OVER (PARTITION BY source ORDER BY q_i
         |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |         SUM(cnt) OVER (PARTITION BY source) AS tot
         |  FROM h),
         |th AS (
         |  SELECT source,
         |         CAST(MIN(CASE WHEN cum * 100 >= tot * 50 THEN q_i END) AS BIGINT) AS q_threshold
         |  FROM c GROUP BY 1)
         |SELECT q.doc_id, q.source, q.q_i, th.q_threshold
         |FROM q JOIN th ON q.source = th.source
         |WHERE q.q_i >= th.q_threshold""".stripMargin,
    "corpus_mixture" ->
      """WITH tc AS (
        |  SELECT doc_id, source,
        |         CAST(len(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |tot AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS t_src FROM tc GROUP BY 1),
        |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_src FROM tot),
        |rates AS (
        |  SELECT source, CAST(least(256, (10000 // n_src) * 256 // t_src) AS BIGINT) AS rate_256
        |  FROM tot, ns),
        |b AS (
        |  SELECT doc_id, source, n_tokens,
        |         (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
        |          + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS bucket
        |  FROM tc)
        |SELECT b.doc_id, b.source, b.n_tokens, CAST(b.bucket AS BIGINT) AS bucket, r.rate_256
        |FROM b JOIN rates r ON b.source = r.source
        |WHERE b.bucket < r.rate_256""".stripMargin,
    // Mirrors Corpus.mixtureSampleSqrt: per-source weight floor(sqrt(t))
    // (IEEE sqrt correctly rounded -> engine-identical), then pure
    // integer share/rate arithmetic in the same operation order
    "corpus_mixture_sqrt" ->
      """WITH tc AS (
        |  SELECT doc_id, source,
        |         CAST(len(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |tot AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS t_src FROM tc GROUP BY 1),
        |w AS (SELECT source, t_src,
        |             CAST(floor(sqrt(CAST(t_src AS DOUBLE))) AS BIGINT) AS w_src
        |      FROM tot),
        |ws AS (SELECT greatest(CAST(SUM(w_src) AS BIGINT), 1) AS wsum FROM w),
        |rates AS (
        |  SELECT source,
        |         CAST(least(256, ((10000 * w_src) // wsum) * 256 // greatest(t_src, 1)) AS BIGINT) AS rate_256
        |  FROM w, ws),
        |b AS (
        |  SELECT doc_id, source, n_tokens,
        |         (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
        |          + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS bucket
        |  FROM tc)
        |SELECT b.doc_id, b.source, b.n_tokens, CAST(b.bucket AS BIGINT) AS bucket, r.rate_256
        |FROM b JOIN rates r ON b.source = r.source
        |WHERE b.bucket < r.rate_256""".stripMargin,
    "dedup_incremental" ->
      """WITH batch AS (
        |  SELECT d.doc_id + 1000000 AS doc_id, d.text
        |  FROM documents d WHERE d.doc_id % 10 = 0
        |  UNION ALL
        |  SELECT d.doc_id + 2000000 AS doc_id,
        |         d.text || ' fresh crawl ' || CAST(d.doc_id AS VARCHAR) AS text
        |  FROM documents d WHERE d.doc_id % 10 = 5),
        |fp AS (
        |  SELECT doc_id,
        |         md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint
        |  FROM batch),
        |grp AS (SELECT fingerprint, MIN(doc_id) AS doc_id FROM fp GROUP BY 1),
        |seen AS (
        |  SELECT DISTINCT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint
        |  FROM documents)
        |SELECT g.doc_id, g.fingerprint FROM grp g
        |WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.fingerprint = g.fingerprint)""".stripMargin,
    // Mirrors Similarity.ivfCentroids/ivfTopK: 3 unrolled Lloyd iterations.
    // Each iteration = nearest-centroid assignment (cosine rounded to 6,
    // centroid-id tie-break) then integer milli-means per dimension
    // (floor(sum(round(x*1000))/count), order-independent) mapped back to
    // float via m/1000.0 — the determinism contract that lets a full
    // FP-iterative k-means hash-match across engines.
    "similarity_topk_ivf" -> kmeansIvfTopkSql,
    // The ingest-census audit over the same trained quantizer: batch 0 is
    // the whole corpus, batch 1 re-ingests id%7=1 (new ids), batch 2
    // id%5=0; copies assign to their source's cell (assignment depends
    // only on the vector), so every census count derives from `cells`.
    "ann_index_audit" ->
      s"""WITH $kmeansCellsCtes,
         |idx AS (
         |  SELECT cid,
         |         CAST(COUNT(*) + SUM(CASE WHEN id % 7 = 1 THEN 1 ELSE 0 END)
         |              + SUM(CASE WHEN id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_index,
         |         CAST(1 + MAX(CASE WHEN id % 7 = 1 THEN 1 ELSE 0 END)
         |              + MAX(CASE WHEN id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_batches
         |  FROM cells GROUP BY cid),
         |b AS (
         |  SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_batch
         |  FROM cells WHERE id % 10 = 3 GROUP BY cid),
         |ti AS (SELECT CAST(SUM(n_index) AS BIGINT) AS t FROM idx),
         |tb AS (SELECT CAST(SUM(n_batch) AS BIGINT) AS t FROM b)
         |SELECT i.cid AS centroid_id, i.n_index, i.n_batches,
         |       CAST(COALESCE(b.n_batch, 0) AS BIGINT) AS n_batch,
         |       CAST(i.n_index * 1000000 // ti.t AS BIGINT) AS index_ppm,
         |       CAST(COALESCE(b.n_batch, 0) * 1000000 // tb.t AS BIGINT) AS batch_ppm,
         |       CASE WHEN i.n_index * 1000000 // ti.t >= 1
         |            THEN CAST((COALESCE(b.n_batch, 0) * 1000000 // tb.t) * 1000
         |                      // (i.n_index * 1000000 // ti.t) AS BIGINT)
         |            ELSE CAST(-1 AS BIGINT) END AS drift_milli
         |FROM idx i LEFT JOIN b ON b.cid = i.cid
         |CROSS JOIN ti CROSS JOIN tb""".stripMargin,
    // the conditional retrain's decision: the collapsed batch (constant
    // e1 direction) assigned against the same frozen kmeans quantizer,
    // per-cell ppm on both sides, total-variation score, threshold
    // compare — the retrain side effect is pinned by OpsSpec (store ≡
    // clean writeIvfIndex), not the hash
    "ann_retrain_if_drifted" ->
      s"""WITH $kmeansCellsCtes,
         |bq AS (
         |  SELECT id,
         |         list_transform(range(1, 65),
         |           i -> CASE WHEN i = 1 THEN CAST(1.0 AS FLOAT) ELSE CAST(0.0 AS FLOAT) END) AS v,
         |         CAST(1.0 AS DOUBLE) AS nrm
         |  FROM e WHERE id % 10 = 3),
         |bc AS (
         |  SELECT id, cid FROM (
         |    SELECT q.id, c.cid,
         |           ROW_NUMBER() OVER (PARTITION BY q.id
         |             ORDER BY round($kmeansDotCv / (q.nrm * c.cnrm), 6) DESC, c.cid) AS rn
         |    FROM bq q CROSS JOIN c3 c)
         |  WHERE rn = 1),
         |idx AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_index FROM cells GROUP BY 1),
         |b AS (SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_batch FROM bc GROUP BY 1),
         |ti AS (SELECT CAST(SUM(n_index) AS BIGINT) AS t FROM idx),
         |tb AS (SELECT CAST(SUM(n_batch) AS BIGINT) AS t FROM b),
         |rep AS (
         |  SELECT COALESCE(i.n_index * 1000000 // ti.t, 0) AS index_ppm,
         |         COALESCE(b.n_batch * 1000000 // tb.t, 0) AS batch_ppm
         |  FROM idx i FULL OUTER JOIN b ON b.cid = i.cid
         |  CROSS JOIN ti CROSS JOIN tb)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
         |       CAST(SUM(abs(index_ppm - batch_ppm)) // 2000 AS BIGINT) AS tv_milli,
         |       CAST(300 AS BIGINT) AS threshold_milli,
         |       (SUM(abs(index_ppm - batch_ppm)) // 2000) > 300 AS retrained
         |FROM rep""".stripMargin,
    // the codebook-drift decision: per-(vector, subspace) minimum
    // quantization distance under the stored codebook, averaged per
    // vector — baseline over the training corpus vs the 3x-scaled batch,
    // exact-integer inflation ratio and threshold compare (the retrain
    // side effect is pinned by OpsSpec, not the hash)
    "ann_pq_retrain_if_drifted" -> pqDriftOracleSql,
    // the composed store trains the SAME global codebook over the same
    // corpus (flat seed rule), so the decision row is identical — one
    // oracle serves both conditional faces
    "ann_ivfpq_retrain_if_drifted" -> pqDriftOracleSql,
    // recall@k: the persisted IVF probe (the kmeansIvfTopkSql chain, same
    // frozen quantizer) set-intersected per query against exact brute
    // force over the indexed corpus — hits match on neighbor membership,
    // not rank order
    "ann_autotune_nprobe" -> autoTuneOracleSql,
    "ann_autotune_build" -> autoTuneBuildOracleSql,
    "ann_recall_audit" ->
      s"""WITH $kmeansCellsCtes,
         |probes AS (
         |  SELECT id AS query_id, v AS qv, nrm AS qnrm, cid FROM (
         |    SELECT q.id, q.v, q.nrm, c.cid,
         |           ROW_NUMBER() OVER (PARTITION BY q.id
         |             ORDER BY round($kmeansDotCv / (q.nrm * c.cnrm), 6) DESC, c.cid) AS prn
         |    FROM e q CROSS JOIN c3 c WHERE q.id < 8)
         |  WHERE prn <= 4),
         |iscored AS (
         |  SELECT p.query_id, m.id AS neighbor_id,
         |         round(list_sum(list_transform(range(1, 65),
         |                 i -> CAST(p.qv[i] AS DOUBLE) * m.v[i])) / (p.qnrm * m.nrm), 6) AS cos_r
         |  FROM probes p JOIN cells m ON p.cid = m.cid AND m.id <> p.query_id),
         |ivfk AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY cos_r DESC, neighbor_id) AS rank
         |    FROM iscored)
         |  WHERE rank <= 5),
         |bscored AS (
         |  SELECT q.id AS query_id, c.id AS neighbor_id,
         |         round($dotSql / (q.nrm * c.nrm), 6) AS cos_r
         |  FROM e q JOIN e c ON q.id < 8 AND c.id <> q.id),
         |bk AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY cos_r DESC, neighbor_id) AS rank
         |    FROM bscored)
         |  WHERE rank <= 5)
         |SELECT bk.query_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_exact,
         |       CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_hit,
         |       CAST((1000 * SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END))
         |            // COUNT(*) AS BIGINT) AS recall_milli
         |FROM bk
         |LEFT JOIN ivfk i
         |  ON i.query_id = bk.query_id AND i.neighbor_id = bk.neighbor_id
         |GROUP BY 1""".stripMargin,
    "similarity_topk_ivf_flat" ->
      s"""WITH ${embCte("SELECT vec_id, embedding FROM embeddings")},
         |asg AS (
         |  SELECT q.id AS vid, c.id AS cid,
         |         ROW_NUMBER() OVER (
         |           PARTITION BY q.id
         |           ORDER BY round($dotSql / (q.nrm * c.nrm), 6) DESC, c.id) AS rn
         |  FROM e q JOIN e c ON c.id < 16),
         |cells AS (SELECT vid, cid FROM asg WHERE rn = 1),
         |probes AS (SELECT vid AS query_id, cid FROM asg WHERE vid < 8 AND rn <= 4),
         |scored AS (
         |  SELECT p.query_id, m.vid AS neighbor_id,
         |         round($dotSql / (q.nrm * c.nrm), 6) AS cos_r
         |  FROM probes p
         |  JOIN cells m ON p.cid = m.cid AND m.vid <> p.query_id
         |  JOIN e q ON q.id = p.query_id
         |  JOIN e c ON c.id = m.vid)
         |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos_r FROM (
         |  SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cos_r DESC, neighbor_id) AS rank
         |  FROM scored)
         |WHERE rank <= 5""".stripMargin,
    "embedding_pca_top" ->
      s"""WITH ${pcaCtes(12)},
         |wf AS (
         |  SELECT cov.i, CAST(SUM(cov.m * vf.v) AS HUGEINT) AS w
         |  FROM cov JOIN vf ON vf.i = cov.j GROUP BY cov.i),
         |ray AS (SELECT CAST(SUM(vf.v * wf.w) AS HUGEINT) AS num
         |        FROM vf JOIN wf ON wf.i = vf.i),
         |den AS (SELECT CAST(SUM(v * v) AS HUGEINT) AS vv FROM vf),
         |tr AS (SELECT CAST(SUM(m) AS HUGEINT) AS t FROM cov WHERE i = j)
         |SELECT CAST(vf.i - 1 AS BIGINT) AS pos, CAST(vf.v AS BIGINT) AS loading_micro,
         |       CAST(CASE WHEN den.vv > 0 AND tr.t > 0
         |                 THEN (ray.num * 1000000) // (den.vv * tr.t) ELSE 0 END AS BIGINT)
         |         AS anisotropy_ppm
         |FROM vf CROSS JOIN ray CROSS JOIN den CROSS JOIN tr""".stripMargin,
    "embedding_debias_abtt" ->
      s"""WITH ${pcaCtes(12)},
         |vvq AS (SELECT CAST(SUM(v * v) AS HUGEINT) AS vv FROM vf),
         |dq AS (
         |  SELECT mv.vec_id, CAST(SUM(CAST(vm[vf.i] AS HUGEINT) * vf.v) AS HUGEINT) AS d
         |  FROM mv CROSS JOIN vf GROUP BY mv.vec_id)
         |SELECT mv.vec_id, CAST(vf.i - 1 AS BIGINT) AS pos,
         |       CAST(vm[vf.i] - (dq.d * vf.v) // vvq.vv AS BIGINT) AS c_milli
         |FROM mv CROSS JOIN vf
         |JOIN dq ON dq.vec_id = mv.vec_id
         |CROSS JOIN vvq""".stripMargin,
    "similarity_topk_debiased" ->
      s"""WITH ${pcaCtes(12)},
         |vvq AS (SELECT CAST(SUM(v * v) AS HUGEINT) AS vv FROM vf),
         |dq AS (
         |  SELECT mv.vec_id, CAST(SUM(CAST(vm[vf.i] AS HUGEINT) * vf.v) AS HUGEINT) AS d
         |  FROM mv CROSS JOIN vf GROUP BY mv.vec_id),
         |dbx AS MATERIALIZED (
         |  SELECT mv.vec_id, vf.i AS i,
         |         CAST(vm[vf.i] - (dq.d * vf.v) // vvq.vv AS BIGINT) AS c
         |  FROM mv CROSS JOIN vf
         |  JOIN dq ON dq.vec_id = mv.vec_id
         |  CROSS JOIN vvq),
         |nrm AS MATERIALIZED (
         |  SELECT vec_id, sqrt(CAST(SUM(c * c) AS DOUBLE)) AS nr
         |  FROM dbx GROUP BY vec_id),
         |dots AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         CAST(SUM(q.c * c.c) AS BIGINT) AS dt
         |  FROM dbx q JOIN dbx c ON c.i = q.i AND c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 8 GROUP BY 1, 2),
         |scored AS (
         |  SELECT d.query_id, d.neighbor_id, round(d.dt / (nq.nr * nc.nr), 6) AS cos_r
         |  FROM dots d
         |  JOIN nrm nq ON nq.vec_id = d.query_id
         |  JOIN nrm nc ON nc.vec_id = d.neighbor_id
         |  WHERE nq.nr > 0 AND nc.nr > 0)
         |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos_r FROM (
         |  SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cos_r DESC, neighbor_id) AS rank
         |  FROM scored)
         |WHERE rank <= 5""".stripMargin,
    // PCA -> debias -> sign-bucket (first 4 ABTT coords) -> Hamming<=1
    // multi-probe -> exact integer rerank: the debiasedTopK chain with
    // the candidate set restricted to probed buckets, mirroring
    // Similarity.debiasedAnnTopK bits=4
    "similarity_topk_debiased_ann" ->
      s"""WITH ${pcaCtes(12)},
         |vvq AS (SELECT CAST(SUM(v * v) AS HUGEINT) AS vv FROM vf),
         |dq AS (
         |  SELECT mv.vec_id, CAST(SUM(CAST(vm[vf.i] AS HUGEINT) * vf.v) AS HUGEINT) AS d
         |  FROM mv CROSS JOIN vf GROUP BY mv.vec_id),
         |dbx AS MATERIALIZED (
         |  SELECT mv.vec_id, vf.i AS i,
         |         CAST(vm[vf.i] - (dq.d * vf.v) // vvq.vv AS BIGINT) AS c
         |  FROM mv CROSS JOIN vf
         |  JOIN dq ON dq.vec_id = mv.vec_id
         |  CROSS JOIN vvq),
         |nrm AS MATERIALIZED (
         |  SELECT vec_id, sqrt(CAST(SUM(c * c) AS DOUBLE)) AS nr
         |  FROM dbx GROUP BY vec_id),
         |bkt AS MATERIALIZED (
         |  SELECT vec_id,
         |         CAST(SUM(CASE WHEN i <= 4 AND c > 0 THEN 1 << (i - 1) ELSE 0 END) AS BIGINT) AS b
         |  FROM dbx GROUP BY vec_id),
         |qb AS (
         |  SELECT bkt.vec_id, unnest([b, xor(b, 1), xor(b, 2), xor(b, 4), xor(b, 8)]) AS b
         |  FROM bkt JOIN nrm ON nrm.vec_id = bkt.vec_id
         |  WHERE bkt.vec_id < 8 AND nrm.nr > 0),
         |cand AS (
         |  SELECT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
         |  FROM qb JOIN bkt cb ON cb.b = qb.b AND cb.vec_id <> qb.vec_id
         |  JOIN nrm cn ON cn.vec_id = cb.vec_id AND cn.nr > 0),
         |dots AS (
         |  SELECT p.query_id, p.neighbor_id, CAST(SUM(q.c * c.c) AS BIGINT) AS dt
         |  FROM cand p
         |  JOIN dbx q ON q.vec_id = p.query_id
         |  JOIN dbx c ON c.vec_id = p.neighbor_id AND c.i = q.i
         |  GROUP BY 1, 2),
         |scored AS (
         |  SELECT d.query_id, d.neighbor_id, round(d.dt / (nq.nr * nc.nr), 6) AS cos_r
         |  FROM dots d
         |  JOIN nrm nq ON nq.vec_id = d.query_id
         |  JOIN nrm nc ON nc.vec_id = d.neighbor_id)
         |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cos_r FROM (
         |  SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cos_r DESC, neighbor_id) AS rank
         |  FROM scored)
         |WHERE rank <= 5""".stripMargin,
    "embedding_group_affinity" ->
      """WITH d AS (
        |  SELECT label AS grp, i AS pos,
        |    CAST(SUM(CAST(round(CAST(embedding[i] AS DOUBLE) * 1000, 0) AS BIGINT)) AS HUGEINT) AS s,
        |    COUNT(*) AS n
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS i) AS dd
        |  GROUP BY 1, 2),
        |norms AS (SELECT grp, SUM(s * s) AS ss, MAX(n) AS n FROM d GROUP BY 1),
        |pairs AS (
        |  SELECT a.grp AS group_a, b.grp AS group_b, SUM(a.s * b.s) AS dot
        |  FROM d a JOIN d b ON a.pos = b.pos AND a.grp < b.grp
        |  GROUP BY 1, 2)
        |SELECT p.group_a, p.group_b,
        |       CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
        |       round(CAST(p.dot AS DOUBLE) /
        |             (sqrt(CAST(na.ss AS DOUBLE)) * sqrt(CAST(nb.ss AS DOUBLE))), 6) AS cos_r
        |FROM pairs p
        |JOIN norms na ON na.grp = p.group_a
        |JOIN norms nb ON nb.grp = p.group_b""".stripMargin,
    "similarity_hard_negatives" ->
      s"""WITH el AS (
         |  SELECT vec_id AS id, embedding AS v, label,
         |         sqrt(list_sum(list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE) * embedding[i]))) AS nrm
         |  FROM embeddings),
         |asg AS (
         |  SELECT q.id AS vid, c.id AS cid,
         |         ROW_NUMBER() OVER (
         |           PARTITION BY q.id
         |           ORDER BY round($dotSql / (q.nrm * c.nrm), 6) DESC, c.id) AS rn
         |  FROM el q JOIN el c ON c.id < 16),
         |cells AS (SELECT vid, cid FROM asg WHERE rn = 1),
         |probes AS (SELECT vid AS query_id, cid FROM asg WHERE vid < 8 AND rn <= 4),
         |scored AS (
         |  SELECT p.query_id, m.vid AS neighbor_id, c.label AS neighbor_label,
         |         round($dotSql / (q.nrm * c.nrm), 6) AS cos_r
         |  FROM probes p
         |  JOIN cells m ON p.cid = m.cid AND m.vid <> p.query_id
         |  JOIN el q ON q.id = p.query_id
         |  JOIN el c ON c.id = m.vid
         |  WHERE c.label <> q.label)
         |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, neighbor_label, cos_r FROM (
         |  SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY cos_r DESC, neighbor_id) AS rank
         |  FROM scored)
         |WHERE rank <= 5""".stripMargin,
    "text_search" ->
      s"""WITH $tokCtes,
         |p AS (
         |  SELECT id AS doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM tokraw WHERE tok IN ('window', 'merge', 'scan') GROUP BY 1, 2),
         |w AS (
         |  SELECT tok,
         |         CAST(round(1000.0 * ((SELECT COUNT(*) FROM documents) - COUNT(*) + 0.5)
         |                    / (COUNT(*) + 0.5), 0) AS BIGINT) AS idf_milli
         |  FROM p GROUP BY tok)
         |SELECT p.doc_id,
         |       CAST(SUM(p.tf * w.idf_milli) AS BIGINT) AS score_milli,
         |       CAST(COUNT(*) AS BIGINT) AS n_terms
         |FROM p JOIN w ON p.tok = w.tok
         |GROUP BY p.doc_id
         |ORDER BY score_milli DESC, p.doc_id
         |LIMIT 20""".stripMargin,
    // phrase hits = positions i with tk[i..i+1] equal to the phrase; the
    // Spark side's rebased postings must find exactly these (first_pos is
    // 0-based, DuckDB lists are 1-based, hence the -1)
    "text_phrase_search" ->
      s"""WITH $tokCtes,
         |hits AS (
         |  SELECT doc_id,
         |         list_filter(range(1, len(tk)), i -> tk[i] = 'table' AND tk[i+1] = 'scan') AS ps
         |  FROM tks)
         |SELECT doc_id, CAST(len(ps) AS BIGINT) AS n_hits,
         |       CAST(ps[1] - 1 AS BIGINT) AS first_pos
         |FROM hits WHERE len(ps) > 0""".stripMargin,
    // (O*n - r*c)^2 per-cell rational milli terms over the lang x source
    // contingency cells, folded; v^2 = 1000*chi2 // (n*min(r-1,c-1))
    "stats_cramers_v" ->
      """WITH cells AS (
        |  SELECT lang AS a, source AS b, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM documents WHERE lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY 1, 2),
        |ra AS (SELECT a, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
        |cb AS (SELECT b, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
        |               CAST(COUNT(DISTINCT a) AS BIGINT) AS levels_a,
        |               CAST(COUNT(DISTINCT b) AS BIGINT) AS levels_b
        |        FROM cells),
        |terms AS (
        |  SELECT tot.n, tot.levels_a, tot.levels_b,
        |         (1000 * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c) *
        |                 (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c))
        |           // (CAST(n AS HUGEINT) * r * c) AS term,
        |         CAST(r AS HUGEINT) * c AS rc
        |  FROM cells
        |  JOIN ra ON ra.a = cells.a
        |  JOIN cb ON cb.b = cells.b, tot),
        |f AS (
        |  SELECT n, levels_a, levels_b,
        |         CAST(SUM(term) +
        |              (1000 * (CAST(n AS HUGEINT) * n - SUM(rc)) // n) AS BIGINT) AS chi2_milli
        |  FROM terms GROUP BY 1, 2, 3)
        |SELECT n, levels_a, levels_b, chi2_milli,
        |       CAST(CASE WHEN least(levels_a - 1, levels_b - 1) > 0
        |            THEN (1000 * chi2_milli) // (n * least(levels_a - 1, levels_b - 1))
        |            END AS BIGINT) AS v2_ppm
        |FROM f""".stripMargin,
    // integer milli score (1000*stop_hits // n_tokens) -> 10 bins ->
    // conf/acc/gap, every division a trunc-div on non-negative ints
    "quality_calibration" ->
      s"""WITH d AS (
         |  SELECT lang,
         |         list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tk
         |  FROM documents),
         |sc AS (
         |  SELECT (1000 * len(list_filter(tk, t -> t IN ($stopList)))) // greatest(len(tk), 1) AS s,
         |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         |  FROM d),
         |b AS (SELECT least((s * 10) // 1000, 9) AS bin, s, y FROM sc)
         |SELECT CAST(bin AS BIGINT) AS bin,
         |       CAST((bin * 1000) // 10 AS BIGINT) AS lo_milli,
         |       CAST(((bin + 1) * 1000) // 10 AS BIGINT) AS hi_milli,
         |       CAST(COUNT(*) AS BIGINT) AS n,
         |       CAST(SUM(y) AS BIGINT) AS n_pos,
         |       CAST(SUM(s) // COUNT(*) AS BIGINT) AS conf_milli,
         |       CAST((1000 * SUM(y)) // COUNT(*) AS BIGINT) AS acc_milli,
         |       CAST(abs(SUM(s) // COUNT(*) - (1000 * SUM(y)) // COUNT(*)) AS BIGINT) AS gap_milli
         |FROM b GROUP BY bin""".stripMargin,
    "text_quality" ->
      s"""WITH $tokCtes
         |SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len(tk) AS BIGINT) AS n_tokens,
         |  round(CAST(list_sum(list_transform(tk, t -> length(t))) AS DOUBLE) / greatest(len(tk), 1), 4) AS avg_token_len,
         |  round(CAST(len(list_filter(tk, t -> t IN ($stopList))) AS DOUBLE) / greatest(len(tk), 1), 4) AS stopword_ratio,
         |  round(least(CAST(len(tk) AS DOUBLE) / 100.0, 1.0) *
         |        (1.0 - CAST(len(list_filter(tk, t -> t IN ($stopList))) AS DOUBLE) / greatest(len(tk), 1)), 4) AS quality_score
         |FROM tks""".stripMargin,
    "text_repetition" ->
      s"""WITH $tokCtes,
         |g2 AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(tk)),
         |                        i -> tk[i] || ' ' || tk[i+1])) AS g
         |  FROM tks WHERE len(tk) >= 2),
         |c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
         |s2 AS (
         |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS total2,
         |         CAST(COUNT(*) AS BIGINT) AS distinct2, CAST(MAX(c) AS BIGINT) AS max2
         |  FROM c2 GROUP BY doc_id),
         |g3 AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
         |                        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g
         |  FROM tks WHERE len(tk) >= 3),
         |c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY 1, 2),
         |s3 AS (
         |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS total3, CAST(MAX(c) AS BIGINT) AS max3
         |  FROM c3 GROUP BY doc_id)
         |SELECT s2.doc_id, total2 AS n_2grams,
         |       round(CAST(max2 AS DOUBLE) / total2, 4) AS top2_frac,
         |       round(1.0 - CAST(distinct2 AS DOUBLE) / total2, 4) AS dup2_frac,
         |       round(CAST(max3 AS DOUBLE) / total3, 4) AS top3_frac
         |FROM s2 JOIN s3 ON s2.doc_id = s3.doc_id""".stripMargin,
    "text_top_terms" ->
      s"""WITH $tokCtes,
         |tf AS (SELECT id AS doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
         |       FROM tokraw WHERE tok <> '' GROUP BY 1, 2),
         |df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
         |scored AS (
         |  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
         |         CAST(tf.tf AS DOUBLE) / df.df AS score
         |  FROM tf JOIN df ON tf.tok = df.tok)
         |SELECT doc_id, CAST(rank AS INT) AS rank, tok, tf, df,
         |       round(score, 6) AS score
         |FROM (
         |  SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY doc_id ORDER BY score DESC, tok) AS rank
         |  FROM scored)
         |WHERE rank <= 3""".stripMargin,
    "text_langid" ->
      s"""WITH $tokCtes,
         |scored AS (
         |  SELECT doc_id,
         |  $langScoresSql
         |  FROM tks)
         |SELECT doc_id, s_en, s_de, s_es, s_fr,
         |       $langCaseSql AS lang_pred
         |FROM scored""".stripMargin,
    // langid chain + (truth, pred) cells + per-axis folds; f1 via the
    // single-division identity 2tp // (n_truth + n_pred); the streamed
    // variant folds its batch cells to the identical answer
    "text_langid_report" -> langidReportSql,
    "text_langid_report_streamed" -> langidReportSql,
    "text_script" ->
      s"""WITH c AS (
         |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_total,
         |  $scriptCountsSql
         |  FROM documents)
         |SELECT doc_id, n_chars_total, n_latin, n_cyrillic, n_cjk, n_arabic,
         |  CASE
         |    WHEN greatest(n_latin, n_cyrillic, n_cjk, n_arabic) = 0 THEN 'other'
         |    WHEN n_latin >= n_cyrillic AND n_latin >= n_cjk AND n_latin >= n_arabic THEN 'latin'
         |    WHEN n_cyrillic >= n_cjk AND n_cyrillic >= n_arabic THEN 'cyrillic'
         |    WHEN n_cjk >= n_arabic THEN 'cjk'
         |    ELSE 'arabic' END AS script_pred
         |FROM c""".stripMargin,
    "corpus_curriculum" ->
      s"""WITH $tokCtes,
         |q AS (
         |  SELECT doc_id,
         |         CAST(round(round(least(CAST(len(tk) AS DOUBLE) / 100.0, 1.0) *
         |              (1.0 - CAST(len(list_filter(tk, t -> t IN ($stopList))) AS DOUBLE)
         |                / greatest(len(tk), 1)), 4) * 10000, 0) AS BIGINT) AS score_i
         |  FROM tks)
         |SELECT doc_id, score_i,
         |       CAST(ROW_NUMBER() OVER (ORDER BY score_i DESC,
         |            md5(CAST(doc_id AS VARCHAR) || 'curr'), doc_id) AS BIGINT) AS curriculum_rank
         |FROM q""".stripMargin,
    "corpus_lang_mix" ->
      s"""WITH $tokCtes,
         |scored AS (
         |  SELECT d.source,
         |  $langScoresSql
         |  FROM tks JOIN documents d ON d.doc_id = tks.doc_id),
         |lab AS (SELECT source, $langCaseSql AS lang_pred FROM scored),
         |c AS (SELECT source, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
         |      FROM lab GROUP BY 1, 2),
         |t AS (SELECT source, CAST(SUM(n_docs) AS BIGINT) AS tot FROM c GROUP BY 1)
         |SELECT c.source, c.lang_pred, c.n_docs,
         |       CAST(c.n_docs * 1000000 // t.tot AS BIGINT) AS share_ppm
         |FROM c JOIN t ON c.source = t.source""".stripMargin,
    "embedding_cell_balance" ->
      s"""WITH ${embCte("SELECT vec_id, embedding FROM embeddings")},
         |asg AS (
         |  SELECT q.id AS vid, c.id AS cid,
         |         ROW_NUMBER() OVER (
         |           PARTITION BY q.id
         |           ORDER BY round($dotSql / (q.nrm * c.nrm), 6) DESC, c.id) AS rn
         |  FROM e q JOIN e c ON c.id < 16),
         |c AS (
         |  SELECT cid AS centroid_id, CAST(COUNT(*) AS BIGINT) AS n_vectors
         |  FROM asg WHERE rn = 1 GROUP BY 1),
         |t AS (SELECT CAST(SUM(n_vectors) AS BIGINT) AS tot FROM c)
         |SELECT centroid_id, n_vectors,
         |       CAST(n_vectors * 1000000 // t.tot AS BIGINT) AS share_ppm
         |FROM c, t""".stripMargin,
    // Stratified sampling: language from the langid CASE chain, keep-rate a
    // per-language bucket cutoff on the same md5 bucket as corpus_split.
    "corpus_sample" ->
      s"""WITH $tokCtes,
         |scored AS (
         |  SELECT doc_id,
         |  $langScoresSql
         |  FROM tks),
         |lang AS (SELECT doc_id, $langCaseSql AS lang_pred FROM scored),
         |h AS (
         |  SELECT doc_id,
         |         (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
         |          + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS bucket
         |  FROM documents)
         |SELECT l.doc_id, l.lang_pred, CAST(h.bucket AS BIGINT) AS bucket
         |FROM lang l JOIN h ON l.doc_id = h.doc_id
         |WHERE h.bucket < CASE WHEN l.lang_pred = 'en' THEN 128 ELSE 256 END""".stripMargin,
    // The dedup endgame over the same minhash pair graph as dedup_clusters:
    // every doc except non-representative cluster members.
    "dedup_keep" ->
      s"""WITH RECURSIVE pairs AS (
         |$minhashLshSql
         |),
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION
         |  SELECT doc_b AS a, doc_a AS b FROM pairs),
         |reach(id, r) AS (
         |  SELECT DISTINCT a, a FROM edges
         |  UNION
         |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
         |cl AS (SELECT id, MIN(r) AS clu FROM reach GROUP BY id)
         |SELECT d.doc_id FROM documents d
         |LEFT JOIN cl ON cl.id = d.doc_id
         |WHERE cl.id IS NULL OR cl.clu = d.doc_id""".stripMargin,
    "corpus_manifest" ->
      """WITH m AS (
        |  SELECT source,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || md5(COALESCE(text, ''))), 1, 14)) AS BIGINT) AS sig,
        |    len(list_filter(string_split_regex(lower(COALESCE(text, '')), '\s+'), t -> t <> '')) AS nt,
        |    length(COALESCE(text, '')) AS nc
        |  FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(nt) AS BIGINT) AS n_tokens,
        |  CAST(SUM(nc) AS BIGINT) AS n_chars,
        |  CAST(SUM(CAST(sig AS HUGEINT)) % 72057594037927936 AS BIGINT) AS content_sig
        |FROM m GROUP BY source""".stripMargin,
    "dedup_savings" ->
      s"""WITH RECURSIVE pairs AS (
         |$minhashLshSql
         |),
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION
         |  SELECT doc_b AS a, doc_a AS b FROM pairs),
         |reach(id, r) AS (
         |  SELECT DISTINCT a, a FROM edges
         |  UNION
         |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
         |cl AS (SELECT id, MIN(r) AS clu FROM reach GROUP BY id),
         |tk AS (
         |  SELECT doc_id, source,
         |         len(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')) AS nt
         |  FROM documents)
         |SELECT source,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN cl.id IS NOT NULL AND cl.clu <> tk.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
         |  CAST(SUM(nt) AS BIGINT) AS tokens_total,
         |  CAST(SUM(CASE WHEN cl.id IS NOT NULL AND cl.clu <> tk.doc_id THEN nt ELSE 0 END) AS BIGINT) AS tokens_dup,
         |  CAST(1000 * SUM(CASE WHEN cl.id IS NOT NULL AND cl.clu <> tk.doc_id THEN nt ELSE 0 END)
         |       // greatest(SUM(nt), 1) AS BIGINT) AS savings_milli
         |FROM tk LEFT JOIN cl ON cl.id = tk.doc_id
         |GROUP BY source""".stripMargin,
    "dedup_keep_best" ->
      s"""WITH RECURSIVE pairs AS (
         |$minhashLshSql
         |),
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION
         |  SELECT doc_b AS a, doc_a AS b FROM pairs),
         |reach(id, r) AS (
         |  SELECT DISTINCT a, a FROM edges
         |  UNION
         |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
         |cl AS (SELECT id, MIN(r) AS clu FROM reach GROUP BY id),
         |q AS (
         |  SELECT doc_id,
         |         CAST(round(round(least(CAST(len(tk2) AS DOUBLE) / 100.0, 1.0) *
         |              (1.0 - CAST(len(list_filter(tk2, t -> t IN ($stopList))) AS DOUBLE)
         |                / greatest(len(tk2), 1)), 4) * 10000, 0) AS BIGINT) AS q_i
         |  FROM (SELECT doc_id,
         |               list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tk2
         |        FROM documents)),
         |best AS (
         |  SELECT clu, doc_id AS best_id FROM (
         |    SELECT cl.clu, q.doc_id,
         |           ROW_NUMBER() OVER (PARTITION BY cl.clu ORDER BY q.q_i DESC, q.doc_id) AS rn
         |    FROM cl JOIN q ON q.doc_id = cl.id) WHERE rn = 1)
         |SELECT d.doc_id FROM documents d
         |LEFT JOIN cl ON cl.id = d.doc_id
         |LEFT JOIN best ON best.clu = cl.clu
         |WHERE cl.id IS NULL OR best.best_id = d.doc_id""".stripMargin,
    "text_tokens" ->
      s"""WITH $tokCtes
         |SELECT doc_id,
         |  CAST(len(tk) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct,
         |  md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
         |FROM tks""".stripMargin,
    "events_window_agg" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "multimodal_features" ->
      """SELECT doc_id, 'text/plain' AS kind,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       md5(text) AS media_md5
        |FROM documents""".stripMargin,
    // Mirrors MediaSynth.docBmp's generating formula: the Spark side decodes
    // the actual BMP bytes; the oracle enumerates the same (x, y) grid
    // arithmetically (k % w = x, k // w = y). Integer channel sums are
    // exact, so only the final round(mean, 4) is FP — identical both sides.
    // Mirrors sampleFrames+decodeBmp over docVideo's generator: frames
    // 0, 2, 4 of nf = 3 + doc_id % 4; frame f shifts every channel by 19*f.
    "multimodal_frame_sample" ->
      """WITH dims AS (
        |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
        |         3 + doc_id % 4 AS nf
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id, w, h, unnest(range(0, nf)) AS f FROM dims),
        |s AS (
        |  SELECT doc_id, CAST(f AS INT) AS frame_id,
        |    list_sum(list_transform(range(0, w*h), k -> (doc_id   + 19*f + 7*(k % w) + 13*(k // w)) % 256)) AS sr,
        |    list_sum(list_transform(range(0, w*h), k -> (doc_id*3 + 19*f + 5*(k % w) + 11*(k // w)) % 256)) AS sg,
        |    list_sum(list_transform(range(0, w*h), k -> (doc_id*5 + 19*f + 3*(k % w) + 17*(k // w)) % 256)) AS sb
        |  FROM fr WHERE f % 2 = 0)
        |SELECT doc_id, frame_id, CAST(sr AS BIGINT) AS sum_r,
        |       CAST(sg AS BIGINT) AS sum_g, CAST(sb AS BIGINT) AS sum_b
        |FROM s""".stripMargin,
    // Mirrors sceneCuts: full frame sequence (every=1), luminance-sum lag
    // diff per clip, integer cut flag at the same threshold.
    "multimodal_scene_cuts" ->
      """WITH dims AS (
        |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
        |         3 + doc_id % 4 AS nf
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id, w, h, unnest(range(0, nf)) AS f FROM dims),
        |s AS (
        |  SELECT doc_id, CAST(f AS INT) AS frame_id,
        |    list_sum(list_transform(range(0, w*h), k -> (doc_id   + 19*f + 7*(k % w) + 13*(k // w)) % 256))
        |    + list_sum(list_transform(range(0, w*h), k -> (doc_id*3 + 19*f + 5*(k % w) + 11*(k // w)) % 256))
        |    + list_sum(list_transform(range(0, w*h), k -> (doc_id*5 + 19*f + 3*(k % w) + 17*(k // w)) % 256)) AS lum
        |  FROM fr),
        |d AS (
        |  SELECT doc_id, frame_id,
        |         abs(lum - lag(lum) OVER (PARTITION BY doc_id ORDER BY frame_id)) AS diff
        |  FROM s)
        |SELECT doc_id, frame_id, CAST(diff AS BIGINT) AS diff,
        |       CAST(CASE WHEN diff > 1500 THEN 1 ELSE 0 END AS BIGINT) AS is_cut
        |FROM d WHERE diff IS NOT NULL""".stripMargin,
    // Mirrors aHashBmp: 8x8 nearest-neighbor sample over the generator
    // formula, integer gray mean test, bits packed into two 32-bit halves.
    "multimodal_ahash" ->
      s"""WITH $ahashCtes
         |SELECT doc_id, hash_hi, hash_lo FROM ah""".stripMargin,
    "multimodal_wav_fp" ->
      s"""WITH $wavFpCtes
         |SELECT doc_id, hash_hi, hash_lo FROM wfp""".stripMargin,
    "multimodal_wav_pairs" ->
      s"""WITH $wavFpCtes,
         |dup AS (
         |  SELECT doc_id, hash_hi, hash_lo FROM wfp
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, hash_hi, hash_lo FROM wfp WHERE doc_id % 25 = 0),
         |bd AS (
         |  SELECT doc_id, hash_hi, hash_lo, b.band AS band,
         |         ((CASE WHEN b.band < 2 THEN hash_lo ELSE hash_hi END) >> (16 * (b.band % 2))) & 65535 AS bkey
         |  FROM dup CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b),
         |bc AS (SELECT *, COUNT(*) OVER (PARTITION BY band, bkey) AS bn FROM bd),
         |bok AS (SELECT doc_id, hash_hi, hash_lo, band, bkey FROM bc WHERE bn <= 1000),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, a.hash_hi AS ha, a.hash_lo AS la,
         |                  b.doc_id AS doc_b, b.hash_hi AS hb, b.hash_lo AS lb
         |  FROM bok a JOIN bok b
         |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |       CAST(bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 3""".stripMargin,
    "multimodal_ahash_pairs" ->
      s"""WITH $ahashCtes,
         |dup AS (
         |  SELECT doc_id, hash_hi, hash_lo FROM ah
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id, hash_hi, hash_lo FROM ah WHERE doc_id % 25 = 0),
         |bd AS (
         |  SELECT doc_id, hash_hi, hash_lo, b.band AS band,
         |         ((CASE WHEN b.band < 2 THEN hash_lo ELSE hash_hi END) >> (16 * (b.band % 2))) & 65535 AS bkey
         |  FROM dup CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b),
         |bc AS (SELECT *, COUNT(*) OVER (PARTITION BY band, bkey) AS bn FROM bd),
         |bok AS (SELECT doc_id, hash_hi, hash_lo, band, bkey FROM bc WHERE bn <= 1000),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, a.hash_hi AS ha, a.hash_lo AS la,
         |                  b.doc_id AS doc_b, b.hash_hi AS hb, b.hash_lo AS lb
         |  FROM bok a JOIN bok b
         |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |       CAST(bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 3""".stripMargin,
    // Mirrors frameAHashes + clipPairs: per-sampled-frame aHash over the
    // video generator formula (frame f shifts every channel by 19*f),
    // frame key doc_id*1000+f through the ahash band/cap/verify SQL, then
    // the clip-level count/min aggregation.
    "multimodal_clip_pairs" ->
      """WITH vdims AS (
        |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h, 3 + doc_id % 4 AS nf
        |  FROM documents),
        |vf AS (SELECT doc_id, w, h, unnest(range(0, nf)) AS f FROM vdims),
        |vg AS (
        |  SELECT doc_id, f,
        |    list_transform(range(0, 64), k ->
        |      (((doc_id   + 19*f + 7*(((k % 8) * w) // 8) + 13*(((k // 8) * h) // 8)) % 256)
        |     + ((doc_id*3 + 19*f + 5*(((k % 8) * w) // 8) + 11*(((k // 8) * h) // 8)) % 256)
        |     + ((doc_id*5 + 19*f + 3*(((k % 8) * w) // 8) + 17*(((k // 8) * h) // 8)) % 256)) // 3) AS gray
        |  FROM vf WHERE f % 2 = 0),
        |vs AS (SELECT doc_id, f, gray, list_sum(gray) AS total FROM vg),
        |vah AS (
        |  SELECT doc_id, f,
        |    CAST(list_sum(list_transform(range(32, 64),
        |         k -> CASE WHEN gray[k+1]*64 > total THEN CAST(1 AS BIGINT) << (k-32) ELSE 0 END)) AS BIGINT) AS hash_hi,
        |    CAST(list_sum(list_transform(range(0, 32),
        |         k -> CASE WHEN gray[k+1]*64 > total THEN CAST(1 AS BIGINT) << k ELSE 0 END)) AS BIGINT) AS hash_lo
        |  FROM vs),
        |dup AS (
        |  SELECT doc_id, f, hash_hi, hash_lo FROM vah
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, f, hash_hi, hash_lo FROM vah WHERE doc_id % 25 = 0),
        |fr AS (SELECT doc_id * 1000 + f AS fid, hash_hi, hash_lo FROM dup),
        |bd AS (
        |  SELECT fid, hash_hi, hash_lo, b.band AS band,
        |         ((CASE WHEN b.band < 2 THEN hash_lo ELSE hash_hi END) >> (16 * (b.band % 2))) & 65535 AS bkey
        |  FROM fr CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b),
        |bc AS (SELECT *, COUNT(*) OVER (PARTITION BY band, bkey) AS bn FROM bd),
        |bok AS (SELECT fid, hash_hi, hash_lo, band, bkey FROM bc WHERE bn <= 1000),
        |cand AS (
        |  SELECT DISTINCT a.fid AS fa, a.hash_hi AS ha, a.hash_lo AS la,
        |                  b.fid AS fb, b.hash_hi AS hb, b.hash_lo AS lb
        |  FROM bok a JOIN bok b
        |    ON a.band = b.band AND a.bkey = b.bkey AND a.fid < b.fid),
        |fpair AS (
        |  SELECT fa // 1000 AS clip_a, fa % 1000 AS frame_a,
        |         fb // 1000 AS clip_b, fb % 1000 AS frame_b,
        |         CAST(bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) AS BIGINT) AS hamming
        |  FROM cand
        |  WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 3)
        |SELECT clip_a, clip_b,
        |       CAST(COUNT(*) AS BIGINT) AS n_frame_pairs,
        |       CAST(COUNT(DISTINCT frame_a) AS BIGINT) AS n_frames_a,
        |       CAST(COUNT(DISTINCT frame_b) AS BIGINT) AS n_frames_b,
        |       CAST(MIN(hamming) AS BIGINT) AS min_hamming
        |FROM fpair WHERE clip_a <> clip_b
        |GROUP BY 1, 2 HAVING LEAST(COUNT(DISTINCT frame_a), COUNT(DISTINCT frame_b)) >= 2""".stripMargin,
    // Mirrors probeMediaIndex over the planted-re-upload fixture: history
    // = image aHashes ∪ audio fingerprints (medium-tagged), batch = every
    // 25th item under +1M ids; banded (medium, band, bkey) candidates with
    // per-side hot-bucket caps, exact Hamming <= 3 verify. The decoy
    // append + tombstone + compact in the Spark query must be invisible.
    "media_index_probe" ->
      s"""WITH $ahashCtes,
         |$wavFpCtes,
         |hist AS (
         |  SELECT doc_id, 'image' AS medium, hash_hi, hash_lo FROM ah
         |  UNION ALL
         |  SELECT doc_id, 'audio' AS medium, hash_hi, hash_lo FROM wfp),
         |batch AS (
         |  SELECT doc_id + 1000000 AS doc_id, medium, hash_hi, hash_lo
         |  FROM hist WHERE doc_id % 25 = 0),
         |bb AS (
         |  SELECT doc_id, medium, hash_hi, hash_lo, b.band AS band,
         |         ((CASE WHEN b.band < 2 THEN hash_lo ELSE hash_hi END) >> (16 * (b.band % 2))) & 65535 AS bkey
         |  FROM batch CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b),
         |bbc AS (SELECT *, COUNT(*) OVER (PARTITION BY medium, band, bkey) AS bn FROM bb),
         |bbok AS (SELECT doc_id, medium, hash_hi, hash_lo, band, bkey FROM bbc WHERE bn <= 1000),
         |hb AS (
         |  SELECT doc_id, medium, hash_hi, hash_lo, b.band AS band,
         |         ((CASE WHEN b.band < 2 THEN hash_lo ELSE hash_hi END) >> (16 * (b.band % 2))) & 65535 AS bkey
         |  FROM hist CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b),
         |hbc AS (SELECT *, COUNT(*) OVER (PARTITION BY medium, band, bkey) AS bn FROM hb),
         |hbok AS (SELECT doc_id, medium, hash_hi, hash_lo, band, bkey FROM hbc WHERE bn <= 1000),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_id, a.medium AS medium,
         |                  a.hash_hi AS ha, a.hash_lo AS la,
         |                  b.doc_id AS match_id, b.hash_hi AS hb2, b.hash_lo AS lb2
         |  FROM bbok a JOIN hbok b
         |    ON a.medium = b.medium AND a.band = b.band AND a.bkey = b.bkey)
         |SELECT doc_id, medium, match_id,
         |       CAST(bit_count(xor(ha, hb2)) + bit_count(xor(la, lb2)) AS BIGINT) AS hamming
         |FROM cand
         |WHERE bit_count(xor(ha, hb2)) + bit_count(xor(la, lb2)) <= 3""".stripMargin,
    // Mirrors resizeBmpNearest's index arithmetic over the generator
    // formula: target pixel (x, y) of the 2x2 resample reads source pixel
    // (x*w div 2, y*h div 2); channel value formulas as in decode_bmp.
    "multimodal_resize_bmp" ->
      """WITH dims AS (
        |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    list_sum(list_transform(range(0, 4), k -> (doc_id   + 7*(((k % 2) * w) // 2) + 13*(((k // 2) * h) // 2)) % 256)) AS sr,
        |    list_sum(list_transform(range(0, 4), k -> (doc_id*3 + 5*(((k % 2) * w) // 2) + 11*(((k // 2) * h) // 2)) % 256)) AS sg,
        |    list_sum(list_transform(range(0, 4), k -> (doc_id*5 + 3*(((k % 2) * w) // 2) + 17*(((k // 2) * h) // 2)) % 256)) AS sb
        |  FROM dims)
        |SELECT doc_id, CAST(sr AS BIGINT) AS sum_r, CAST(sg AS BIGINT) AS sum_g,
        |       CAST(sb AS BIGINT) AS sum_b
        |FROM s""".stripMargin,
    "multimodal_decode_bmp" ->
      """WITH dims AS (
        |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h FROM documents),
        |px AS (
        |  SELECT doc_id, w, h,
        |         list_sum(list_transform(range(0, w*h), k -> (doc_id + 7*(k % w) + 13*(k // w)) % 256)) AS sr,
        |         list_sum(list_transform(range(0, w*h), k -> (doc_id*3 + 5*(k % w) + 11*(k // w)) % 256)) AS sg,
        |         list_sum(list_transform(range(0, w*h), k -> (doc_id*5 + 3*(k % w) + 17*(k // w)) % 256)) AS sb
        |  FROM dims)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |       round(CAST(sr AS DOUBLE) / (w*h), 4) AS mean_r,
        |       round(CAST(sg AS DOUBLE) / (w*h), 4) AS mean_g,
        |       round(CAST(sb AS DOUBLE) / (w*h), 4) AS mean_b
        |FROM px""".stripMargin,
    "multimodal_wav_zc" ->
      """WITH s AS (
        |  SELECT doc_id, 64 + doc_id % 64 AS n,
        |         list_transform(range(0, 64 + doc_id % 64),
        |                        i -> (doc_id*73 + i*179) % 65536 - 32768) AS smp
        |  FROM documents)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
        |       CAST(len(list_filter(range(1, n), i -> smp[i] * smp[i+1] < 0)) AS BIGINT) AS zero_crossings
        |FROM s""".stripMargin,
    "multimodal_decode_wav" ->
      """WITH s AS (
        |  SELECT doc_id, 64 + doc_id % 64 AS n,
        |         list_transform(range(0, 64 + doc_id % 64),
        |                        i -> (doc_id*73 + i*179) % 65536 - 32768) AS smp
        |  FROM documents)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
        |       round(sqrt(CAST(list_sum(list_transform(smp, v -> v*v)) AS DOUBLE) / n), 4) AS rms,
        |       CAST(list_max(list_transform(smp, v -> abs(v))) AS BIGINT) AS peak
        |FROM s""".stripMargin,
    // same analytic sample regeneration, quality counters folded to ppm
    // shares and the trunc-div DC offset — all exact integers
    "multimodal_wav_quality" ->
      """WITH s AS (
        |  SELECT doc_id, 64 + doc_id % 64 AS n,
        |         list_transform(range(0, 64 + doc_id % 64),
        |                        i -> (doc_id*73 + i*179) % 65536 - 32768) AS smp
        |  FROM documents)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
        |       CAST((1000000 * len(list_filter(smp, v -> abs(v) >= 32440))) // n AS BIGINT)
        |         AS clipped_ppm,
        |       CAST((1000000 * len(list_filter(smp, v -> abs(v) <= 327))) // n AS BIGINT)
        |         AS silent_ppm,
        |       CAST((1000 * list_sum(smp)) // n AS BIGINT) AS dc_milli
        |FROM s""".stripMargin,
    "events_session_window" ->
      """WITH ev AS (
        |  SELECT CAST(user_id AS BIGINT) AS user_id, epoch_us(ts) // 1000000 AS ts_secs
        |  FROM events),
        |x AS (
        |  SELECT *, LAG(ts_secs) OVER (PARTITION BY user_id ORDER BY ts_secs) AS prev
        |  FROM ev),
        |y AS (
        |  SELECT *, CASE WHEN prev IS NULL OR ts_secs - prev >= 1800 THEN 1 ELSE 0 END AS ns
        |  FROM x),
        |z AS (
        |  SELECT *, SUM(ns) OVER (
        |    PARTITION BY user_id ORDER BY ts_secs ROWS UNBOUNDED PRECEDING) AS sno
        |  FROM y)
        |SELECT user_id,
        |       CAST(MIN(ts_secs) AS BIGINT) AS session_start,
        |       CAST(MAX(ts_secs) + 1800 AS BIGINT) AS session_end,
        |       CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM z GROUP BY user_id, sno""".stripMargin,
    "sessionize" ->
      """WITH ev AS (
        |  SELECT CAST(user_id AS BIGINT) AS user_id, epoch_us(ts) // 1000000 AS ts_secs
        |  FROM events),
        |x AS (
        |  SELECT *, LAG(ts_secs) OVER (PARTITION BY user_id ORDER BY ts_secs) AS prev
        |  FROM ev),
        |y AS (
        |  SELECT *, CASE WHEN prev IS NULL OR ts_secs - prev > 1800 THEN 1 ELSE 0 END AS ns
        |  FROM x),
        |z AS (
        |  SELECT *, SUM(ns) OVER (
        |    PARTITION BY user_id ORDER BY ts_secs ROWS UNBOUNDED PRECEDING) AS sno
        |  FROM y)
        |SELECT user_id, MIN(ts_secs) AS session_start, MAX(ts_secs) AS session_end,
        |       CAST(COUNT(*) AS INT) AS n_events
        |FROM z GROUP BY user_id, sno""".stripMargin,
    // Mirrors chunkTokens: window 32, stride 24, final partial chunk kept.
    "text_chunk" ->
      s"""WITH $tokCtes,
         |c AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n FROM tks WHERE len(tk) > 0),
         |s AS (SELECT doc_id, tk, n, unnest(range(0, ((n - 1) // 24) + 1)) AS cid FROM c)
         |SELECT doc_id,
         |       CAST(cid AS BIGINT) AS chunk_id,
         |       CAST(cid * 24 + 1 AS BIGINT) AS tok_start,
         |       CAST(least(cid * 24 + 32, n) AS BIGINT) AS tok_end,
         |       CAST(least(cid * 24 + 32, n) - cid * 24 AS BIGINT) AS n_tokens,
         |       array_to_string(tk[(cid*24+1):(cid*24+32)], ' ') AS chunk_text,
         |       md5(array_to_string(tk[(cid*24+1):(cid*24+32)], ' ')) AS chunk_md5
         |FROM s""".stripMargin,
    // Mirrors chunkContentDefined: a token ends a chunk when its md5's
    // first byte ≡ 0 (mod 16); the last token always closes the final
    // chunk. Same strpos arithmetic both engines.
    "text_chunks_cdc" ->
      s"""WITH $tokCtes,
         |c AS (SELECT doc_id, tk, len(tk) AS n FROM tks WHERE len(tk) > 0),
         |e AS (
         |  SELECT doc_id, tk, n,
         |         list_filter(range(1, n + 1),
         |           i -> ((strpos('0123456789abcdef', substr(md5(tk[i]), 1, 1)) - 1) * 16
         |                 + strpos('0123456789abcdef', substr(md5(tk[i]), 2, 1)) - 1) % 16 = 0
         |                OR i = n) AS ends
         |  FROM c),
         |x AS (SELECT doc_id, tk, ends, unnest(range(1, len(ends) + 1)) AS k FROM e),
         |y AS (
         |  SELECT doc_id, tk, k,
         |         CASE WHEN k = 1 THEN 1 ELSE ends[CAST(k - 1 AS INT)] + 1 END AS ts,
         |         ends[CAST(k AS INT)] AS te
         |  FROM x)
         |SELECT doc_id,
         |       CAST(k - 1 AS BIGINT) AS chunk_id,
         |       CAST(ts AS BIGINT) AS tok_start,
         |       CAST(te AS BIGINT) AS tok_end,
         |       CAST(te - ts + 1 AS BIGINT) AS n_tokens,
         |       md5(array_to_string(tk[CAST(ts AS INT):CAST(te AS INT)], ' ')) AS chunk_md5
         |FROM y""".stripMargin,
    // Mirrors boilerplateLines over the lined fixture: line df by distinct
    // (fingerprint, doc), drop lines in more than 20 docs.
    "text_boilerplate" ->
      s"""WITH $tokCtes,
         |$linedCte,
         |ls AS (
         |  SELECT doc_id, list_filter(string_split_regex(text, '\\r?\\n'), l -> trim(l) <> '') AS lst
         |  FROM lined),
         |l AS (
         |  SELECT doc_id,
         |         unnest(list_transform(range(1, len(lst) + 1),
         |                i -> struct_pack(no := i, line := lst[i]))) AS s
         |  FROM ls),
         |l2 AS (
         |  SELECT doc_id, CAST(s.no AS BIGINT) AS line_no, s.line AS line,
         |         md5(trim(s.line)) AS fp
         |  FROM l),
         |dfq AS (SELECT fp, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS line_df FROM l2 GROUP BY 1)
         |SELECT l2.doc_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_lines,
         |       CAST(SUM(CASE WHEN d.line_df <= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |       md5(COALESCE(array_to_string(
         |             list_filter(list(CASE WHEN d.line_df <= 20 THEN l2.line END ORDER BY l2.line_no),
         |                         x -> x IS NOT NULL),
         |             chr(10)), '')) AS kept_md5
         |FROM l2 JOIN dfq d USING (fp)
         |GROUP BY l2.doc_id""".stripMargin,
    // Mirrors linearScore: text_hash_vectors' bucket hashing + the Knuth
    // multiplicative weight (bucket * 2654435761 % 2001 - 1000), all BIGINT.
    "text_quality_classifier" ->
      s"""WITH $tokCtes,
         |b AS (
         |  SELECT id AS doc_id,
         |         CAST(((strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 256
         |          + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) * 16
         |          + strpos('0123456789abcdef', substr(md5(tok), 3, 1)) - 1) % 1024 AS BIGINT) AS bucket
         |  FROM tokraw WHERE tok <> ''),
         |w AS (SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS tf FROM b GROUP BY 1, 2)
         |SELECT doc_id,
         |       CAST(SUM(tf) AS BIGINT) AS n_tokens,
         |       CAST(SUM(tf * ((bucket * 2654435761) % 2001 - 1000)) AS BIGINT) AS score_milli,
         |       (SUM(tf * ((bucket * 2654435761) % 2001 - 1000)) > 0) AS keep
         |FROM w GROUP BY doc_id""".stripMargin,
    // Mirrors Corpus.datacard: per-source + ALL rollup over the integer
    // ten-thousandths of the shared quality score (corpus_quality_gate's q_i).
    "corpus_datacard" ->
      s"""WITH $tokCtes,
         |q AS (
         |  SELECT d.doc_id, d.source, d.lang,
         |         CAST(length(d.text) AS BIGINT) AS n_chars,
         |         CAST(len(tk) AS BIGINT) AS n_tokens,
         |         CAST(round(round(least(CAST(len(tk) AS DOUBLE) / 100.0, 1.0) *
         |              (1.0 - CAST(len(list_filter(tk, t -> t IN ($stopList))) AS DOUBLE)
         |                / greatest(len(tk), 1)), 4) * 10000, 0) AS BIGINT) AS q_tenk
         |  FROM tks JOIN documents d ON d.doc_id = tks.doc_id)
         |SELECT coalesce(source, 'ALL') AS source,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
         |       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         |       CAST(MIN(q_tenk) AS BIGINT) AS q_tenk_min,
         |       CAST(MAX(q_tenk) AS BIGINT) AS q_tenk_max,
         |       CAST(SUM(q_tenk) // COUNT(*) AS BIGINT) AS q_tenk_avg,
         |       CAST(SUM(CASE WHEN q_tenk >= 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM q GROUP BY ROLLUP(source)""".stripMargin,
    // Mirrors pqCodes: milli-int vectors, seed codebook = 8 lowest-id
    // vectors sliced into 4 subspaces, integer squared-L2 assignment.
    "embedding_pq" ->
      s"""WITH $pqCtes
         |SELECT vec_id, subspace, code, CAST(dist AS BIGINT) AS qdist
         |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
         |                                   ORDER BY dist, code) AS rn FROM pqd)
         |WHERE rn = 1""".stripMargin,
    // Mirrors pqTopK: ADC — per-query distance table to every codebook
    // entry, candidate distance = sum over the 4 assigned codes.
    "similarity_topk_pq" ->
      s"""WITH $pqCtes,
         |codes AS (
         |  SELECT vec_id, subspace, code, dist
         |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
         |                                     ORDER BY dist, code) AS rn FROM pqd)
         |  WHERE rn = 1),
         |dt AS (
         |  SELECT s.vec_id AS query_id, s.subspace, cb.code,
         |         list_sum(list_transform(range(1, 17),
         |                  i -> (s.sub[i] - cb.cm[i]) * (s.sub[i] - cb.cm[i]))) AS qdist
         |  FROM sv s JOIN cb ON cb.subspace = s.subspace
         |  WHERE s.vec_id < 8),
         |adc AS (
         |  SELECT dt.query_id, codes.vec_id AS neighbor_id,
         |         CAST(SUM(dt.qdist) AS BIGINT) AS adc_dist
         |  FROM codes JOIN dt ON dt.subspace = codes.subspace AND dt.code = codes.code
         |  WHERE dt.query_id <> codes.vec_id
         |  GROUP BY 1, 2)
         |SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, adc_dist FROM (
         |  SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY adc_dist ASC, neighbor_id) AS rank
         |  FROM adc)
         |WHERE rank <= 5""".stripMargin,
    // recall@k of the ADC probe vs exact brute force — the PQ twin of
    // ann_recall_audit's chain (set-membership hits, never rank order)
    "ann_recall_audit_pq" ->
      s"""WITH $pqCtes,
         |${embCte("SELECT vec_id, embedding FROM embeddings")},
         |codes AS (
         |  SELECT vec_id, subspace, code
         |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
         |                                     ORDER BY dist, code) AS rn FROM pqd)
         |  WHERE rn = 1),
         |dt AS (
         |  SELECT s.vec_id AS query_id, s.subspace, cb.code,
         |         list_sum(list_transform(range(1, 17),
         |                  i -> (s.sub[i] - cb.cm[i]) * (s.sub[i] - cb.cm[i]))) AS qdist
         |  FROM sv s JOIN cb ON cb.subspace = s.subspace
         |  WHERE s.vec_id < 8),
         |adc AS (
         |  SELECT dt.query_id, codes.vec_id AS neighbor_id,
         |         CAST(SUM(dt.qdist) AS BIGINT) AS adc_dist
         |  FROM codes JOIN dt ON dt.subspace = codes.subspace AND dt.code = codes.code
         |  WHERE dt.query_id <> codes.vec_id
         |  GROUP BY 1, 2),
         |pqk AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY adc_dist ASC, neighbor_id) AS rank
         |    FROM adc)
         |  WHERE rank <= 5),
         |bscored AS (
         |  SELECT q.id AS query_id, c.id AS neighbor_id,
         |         round($dotSql / (q.nrm * c.nrm), 6) AS cos_r
         |  FROM e q JOIN e c ON q.id < 8 AND c.id <> q.id),
         |bk AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY cos_r DESC, neighbor_id) AS rank
         |    FROM bscored)
         |  WHERE rank <= 5)
         |SELECT bk.query_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_exact,
         |       CAST(SUM(CASE WHEN p.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_hit,
         |       CAST((1000 * SUM(CASE WHEN p.neighbor_id IS NOT NULL THEN 1 ELSE 0 END))
         |            // COUNT(*) AS BIGINT) AS recall_milli
         |FROM bk
         |LEFT JOIN pqk p
         |  ON p.query_id = bk.query_id AND p.neighbor_id = bk.neighbor_id
         |GROUP BY 1""".stripMargin,
    // the IVF probe's rank order scored against the exact top-5 with
    // driver-pinned integer NDCG weights — same probe/truth chains as
    // ann_recall_audit, metric arithmetic in exact integers
    "ann_ranking_audit" -> {
      val w = graft.ops.Similarity.ndcgWeightsMicro(5)
      val cum = w.scanLeft(0L)(_ + _).tail
      val wLst = w.mkString("[", ", ", "]")
      val cLst = cum.mkString("[", ", ", "]")
      s"""WITH $kmeansCellsCtes,
         |probes AS (
         |  SELECT id AS query_id, v AS qv, nrm AS qnrm, cid FROM (
         |    SELECT q.id, q.v, q.nrm, c.cid,
         |           ROW_NUMBER() OVER (PARTITION BY q.id
         |             ORDER BY round($kmeansDotCv / (q.nrm * c.cnrm), 6) DESC, c.cid) AS prn
         |    FROM e q CROSS JOIN c3 c WHERE q.id < 8)
         |  WHERE prn <= 4),
         |iscored AS (
         |  SELECT p.query_id, m.id AS neighbor_id,
         |         round(list_sum(list_transform(range(1, 65),
         |                 i -> CAST(p.qv[i] AS DOUBLE) * m.v[i])) / (p.qnrm * m.nrm), 6) AS cos_r
         |  FROM probes p JOIN cells m ON p.cid = m.cid AND m.id <> p.query_id),
         |ivfk AS (
         |  SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM (
         |    SELECT *, ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY cos_r DESC, neighbor_id) AS rank
         |    FROM iscored)
         |  WHERE rank <= 5),
         |bscored AS (
         |  SELECT q.id AS query_id, c.id AS neighbor_id,
         |         round($dotSql / (q.nrm * c.nrm), 6) AS cos_r
         |  FROM e q JOIN e c ON q.id < 8 AND c.id <> q.id),
         |bk AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY cos_r DESC, neighbor_id) AS rank
         |    FROM bscored)
         |  WHERE rank <= 5),
         |nt AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_truth FROM bk GROUP BY 1),
         |h AS (
         |  SELECT i.query_id, i.rank,
         |         CASE WHEN b.neighbor_id IS NOT NULL THEN 1 END AS rel
         |  FROM ivfk i LEFT JOIN bk b
         |    ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id),
         |pq AS (
         |  SELECT query_id,
         |         CAST(MIN(CASE WHEN rel IS NOT NULL THEN rank END) AS BIGINT)
         |           AS first_hit_rank,
         |         CAST(COALESCE(SUM(CASE WHEN rel IS NOT NULL THEN ($wLst)[rank] END), 0)
         |           AS BIGINT) AS dcg_micro
         |  FROM h GROUP BY 1)
         |SELECT COALESCE(pq.query_id, nt.query_id) AS query_id,
         |       CAST(COALESCE(nt.n_truth, 0) AS BIGINT) AS n_truth,
         |       pq.first_hit_rank,
         |       CAST(COALESCE(1000000 // pq.first_hit_rank, 0) AS BIGINT) AS mrr_micro,
         |       CAST(COALESCE(pq.dcg_micro, 0) AS BIGINT) AS dcg_micro,
         |       CASE WHEN COALESCE(nt.n_truth, 0) > 0
         |            THEN CAST((1000000 * COALESCE(pq.dcg_micro, 0))
         |                 // ($cLst)[CAST(LEAST(nt.n_truth, 5) AS INT)] AS BIGINT)
         |       END AS ndcg_ppm
         |FROM pq FULL JOIN nt ON nt.query_id = pq.query_id""".stripMargin
    },
    // recall@k of the COMPOSED IVF-PQ probe: the similarity_topk_ivfpq
    // chain (3-round integer-milli Lloyd routes candidates to top-4
    // cells, the global PQ codebook ADC-scores only those cells' codes)
    // set-intersected per query against exact brute force over the full
    // corpus — both approximations' stacked recall, hash-checked
    "ann_recall_audit_ivfpq" ->
      s"""WITH $kmeansCellsCtes,
         |$pqCtes,
         |codes AS (
         |  SELECT vec_id, subspace, code
         |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
         |                                     ORDER BY dist, code) AS rn FROM pqd)
         |  WHERE rn = 1),
         |ccodes AS (
         |  SELECT codes.vec_id, codes.subspace, codes.code, cells.cid
         |  FROM codes JOIN cells ON cells.id = codes.vec_id),
         |probes AS (
         |  SELECT id AS query_id, cid FROM (
         |    SELECT q.id, c.cid,
         |           ROW_NUMBER() OVER (PARTITION BY q.id
         |             ORDER BY round($kmeansDotCv / (q.nrm * c.cnrm), 6) DESC, c.cid) AS prn
         |    FROM e q CROSS JOIN c3 c WHERE q.id < 8)
         |  WHERE prn <= 4),
         |dt AS (
         |  SELECT s.vec_id AS query_id, s.subspace, cb.code,
         |         list_sum(list_transform(range(1, 17),
         |                  i -> (s.sub[i] - cb.cm[i]) * (s.sub[i] - cb.cm[i]))) AS qdist
         |  FROM sv s JOIN cb ON cb.subspace = s.subspace
         |  WHERE s.vec_id < 8),
         |adc AS (
         |  SELECT p.query_id, c.vec_id AS neighbor_id,
         |         CAST(SUM(dt.qdist) AS BIGINT) AS adc_dist
         |  FROM ccodes c
         |  JOIN probes p ON p.cid = c.cid AND p.query_id <> c.vec_id
         |  JOIN dt ON dt.query_id = p.query_id AND dt.subspace = c.subspace
         |         AND dt.code = c.code
         |  GROUP BY 1, 2),
         |ipqk AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY adc_dist ASC, neighbor_id) AS rank
         |    FROM adc)
         |  WHERE rank <= 5),
         |bscored AS (
         |  SELECT q.id AS query_id, c.id AS neighbor_id,
         |         round($dotSql / (q.nrm * c.nrm), 6) AS cos_r
         |  FROM e q JOIN e c ON q.id < 8 AND c.id <> q.id),
         |bk AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, ROW_NUMBER() OVER (
         |      PARTITION BY query_id ORDER BY cos_r DESC, neighbor_id) AS rank
         |    FROM bscored)
         |  WHERE rank <= 5)
         |SELECT bk.query_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_exact,
         |       CAST(SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_hit,
         |       CAST((1000 * SUM(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END))
         |            // COUNT(*) AS BIGINT) AS recall_milli
         |FROM bk
         |LEFT JOIN ipqk i
         |  ON i.query_id = bk.query_id AND i.neighbor_id = bk.neighbor_id
         |GROUP BY 1""".stripMargin,
    // Mirrors Similarity.diversity: milli-int normalized vectors, mean
    // pairwise cosine per label via the sum-vector identity.
    "embedding_diversity" ->
      """WITH nv AS (
        |  SELECT vec_id, label, embedding,
        |         sqrt(list_sum(list_transform(embedding,
        |              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nm
        |  FROM embeddings),
        |u AS (
        |  SELECT label, i AS pos,
        |         CASE WHEN nm = 0 THEN 0
        |              ELSE CAST(round(CAST(embedding[i] AS DOUBLE) * 1000 / nm, 0) AS BIGINT)
        |         END AS u
        |  FROM nv, range(1, 65) t(i)),
        |s AS (SELECT label, pos, CAST(SUM(u) AS BIGINT) AS s, COUNT(*) AS cnt
        |      FROM u GROUP BY 1, 2),
        |g AS (SELECT label, CAST(MAX(cnt) AS BIGINT) AS n, CAST(SUM(s * s) AS BIGINT) AS ss
        |      FROM s GROUP BY 1)
        |SELECT CAST(label AS BIGINT) AS label, n,
        |       CAST(round((CAST(ss AS DOUBLE) / 1000000.0 - CAST(n AS DOUBLE)) /
        |            (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) * 1000.0, 0) AS BIGINT)
        |         AS cos_avg_milli
        |FROM g WHERE n > 1""".stripMargin,
    // Mirrors urlCanonicalGroups over the variant-planted url fixture:
    // lowercase, fragment / utm-query / trailing-slash stripped, one group
    // per canonical URL.
    "dedup_url" ->
      """WITH corpus AS (
        |  SELECT doc_id,
        |         text || ' see https://site' || CAST(doc_id % 7 AS VARCHAR)
        |              || '.example/p/' || CAST(doc_id AS VARCHAR)
        |              || CASE WHEN doc_id % 3 = 0 THEN ' and http://mirror.example/download' ELSE '' END
        |              || CASE WHEN doc_id % 5 = 0
        |                 THEN ' https://site' || CAST(doc_id % 7 AS VARCHAR) || '.example/about'
        |                 ELSE '' END
        |              || CASE WHEN doc_id % 4 = 2
        |                 THEN ' https://site' || CAST(doc_id % 7 AS VARCHAR) || '.example/p/'
        |                      || CAST(doc_id AS VARCHAR) || '?utm_source=feed#frag'
        |                 ELSE '' END
        |              || CASE WHEN doc_id % 10 = 0
        |                 THEN ' https://site' || CAST(doc_id % 7 AS VARCHAR) || '.example/about/'
        |                 ELSE '' END AS text
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text, 'https?://[^\s]+')) AS url
        |  FROM corpus),
        |c AS (
        |  SELECT doc_id,
        |         lower(regexp_replace(regexp_replace(regexp_replace(url,
        |               '#[^\s]*', ''), '\?utm_[^#\s]*', ''), '/+$', '')) AS canon_url
        |  FROM u)
        |SELECT canon_url,
        |       CAST(COUNT(*) AS BIGINT) AS n_urls,
        |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |       CAST(MIN(doc_id) AS BIGINT) AS rep_doc
        |FROM c GROUP BY 1""".stripMargin,
    // Mirrors chunkOverlapPairs over the containment fixture: 32/24 chunk
    // windows, distinct (md5, doc) postings, hot-fingerprint cap at 50,
    // pairs sharing >= 2 chunks.
    "dedup_chunk_overlap" ->
      s"""WITH $tokCtes,
         |$chunkCtes
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       CAST(COUNT(*) AS BIGINT) AS n_shared
         |FROM p2 a JOIN p2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2
         |HAVING COUNT(*) >= 2""".stripMargin,
    // Mirrors dupSpans(n=5, minTokens=8) over the same containment corpus:
    // 1-based positioned 5-grams, cross-doc-duplicated grams (distinct
    // (gram, doc) then per-gram doc count >= 2), gaps-and-islands runs.
    "text_dup_spans" ->
      s"""WITH $tokCtes,
         |$chunkCtes,
         |ps AS (
         |  SELECT doc_id, tk, unnest(range(1, greatest(len(tk) - 4, 0) + 1)) AS i
         |  FROM tkc),
         |pgr AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         |         array_to_string(tk[i:i+4], ' ') AS g
         |  FROM ps),
         |dupg AS (
         |  SELECT g FROM (SELECT DISTINCT g, doc_id FROM pgr) t
         |  GROUP BY g HAVING COUNT(*) >= 2),
         |mk AS (SELECT pgr.doc_id, pgr.pos FROM pgr SEMI JOIN dupg USING (g)),
         |isl AS (
         |  SELECT doc_id, pos,
         |         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS k
         |  FROM mk),
         |sp AS (
         |  SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 4 AS span_end
         |  FROM isl GROUP BY doc_id, k)
         |SELECT doc_id, CAST(span_start AS BIGINT) AS span_start,
         |       CAST(span_end AS BIGINT) AS span_end,
         |       CAST(span_end - span_start + 1 AS BIGINT) AS span_tokens
         |FROM sp WHERE span_end - span_start + 1 >= 8""".stripMargin,
    // Mirrors crossDupSpans: corpus grams marked iff present in the
    // benchmark side (one-directional), islands → spans.
    "contamination_spans" ->
      s"""WITH $tokCtes,
         |corp AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 2
         |  UNION ALL
         |  SELECT doc_id + 3000000,
         |         array_to_string(tk[1:30], ' ') || ' leak tail ' || CAST(doc_id AS VARCHAR)
         |  FROM tks WHERE doc_id % 10 = 2),
         |tkp AS (
         |  SELECT doc_id,
         |         list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tk
         |  FROM corp),
         |ps AS (
         |  SELECT doc_id, tk, unnest(range(1, greatest(len(tk) - 4, 0) + 1)) AS i
         |  FROM tkp),
         |pgr AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         |         array_to_string(tk[i:i+4], ' ') AS g
         |  FROM ps),
         |bps AS (
         |  SELECT tk, unnest(range(1, greatest(len(tk) - 4, 0) + 1)) AS i
         |  FROM tks WHERE doc_id % 5 = 2),
         |bg AS (SELECT DISTINCT array_to_string(tk[i:i+4], ' ') AS g FROM bps),
         |mk AS (SELECT pgr.doc_id, pgr.pos FROM pgr SEMI JOIN bg USING (g)),
         |isl AS (
         |  SELECT doc_id, pos,
         |         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS k
         |  FROM mk),
         |sp AS (
         |  SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 4 AS span_end
         |  FROM isl GROUP BY doc_id, k)
         |SELECT doc_id, CAST(span_start AS BIGINT) AS span_start,
         |       CAST(span_end AS BIGINT) AS span_end,
         |       CAST(span_end - span_start + 1 AS BIGINT) AS span_tokens
         |FROM sp WHERE span_end - span_start + 1 >= 8""".stripMargin,
    // Mirrors stripContamination over the contamination_spans corpus: the
    // one-directional benchmark mark, then the keep-tokens-outside-spans
    // rewrite (whole corpus back, n_removed = 0 for clean docs).
    "contamination_strip" ->
      s"""WITH $tokCtes,
         |corp AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 2
         |  UNION ALL
         |  SELECT doc_id + 3000000,
         |         array_to_string(tk[1:30], ' ') || ' leak tail ' || CAST(doc_id AS VARCHAR)
         |  FROM tks WHERE doc_id % 10 = 2),
         |ctk AS (
         |  SELECT doc_id,
         |         list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tk
         |  FROM corp),
         |ps AS (
         |  SELECT doc_id, tk, unnest(range(1, greatest(len(tk) - 4, 0) + 1)) AS i
         |  FROM ctk),
         |pgr AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         |         array_to_string(tk[i:i+4], ' ') AS g
         |  FROM ps),
         |bps AS (
         |  SELECT tk, unnest(range(1, greatest(len(tk) - 4, 0) + 1)) AS i
         |  FROM tks WHERE doc_id % 5 = 2),
         |bg AS (SELECT DISTINCT array_to_string(tk[i:i+4], ' ') AS g FROM bps),
         |mk AS (SELECT pgr.doc_id, pgr.pos FROM pgr SEMI JOIN bg USING (g)),
         |isl AS (
         |  SELECT doc_id, pos,
         |         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS k
         |  FROM mk),
         |sp AS (
         |  SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 4 AS span_end
         |  FROM isl GROUP BY doc_id, k),
         |spf AS (SELECT * FROM sp WHERE span_end - span_start + 1 >= 8),
         |tkpos AS (
         |  SELECT doc_id, unnest(tk) AS tok, unnest(range(1, len(tk) + 1)) AS p
         |  FROM ctk),
         |keptc AS (
         |  SELECT t.doc_id,
         |         string_agg(t.tok, ' ' ORDER BY t.p) AS clean_text,
         |         CAST(COUNT(*) AS BIGINT) AS n_kept
         |  FROM tkpos t
         |  WHERE NOT EXISTS (SELECT 1 FROM spf
         |                    WHERE spf.doc_id = t.doc_id
         |                      AND t.p BETWEEN spf.span_start AND spf.span_end)
         |  GROUP BY t.doc_id)
         |SELECT k.doc_id, COALESCE(c.clean_text, '') AS clean_text,
         |       CAST(len(k.tk) - COALESCE(c.n_kept, 0) AS BIGINT) AS n_removed
         |FROM ctk k LEFT JOIN keptc c USING (doc_id)""".stripMargin,
    // Mirrors probeDupSpans' contract directly: dupSpans over history
    // UNION batch (re-inserts +1M verbatim, fresh-tail +2M), restricted
    // to batch rows — the decoy/tombstone churn in the Spark query must
    // be invisible here.
    "text_dup_spans_incremental" ->
      """WITH corb AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |         text || ' fresh crawl ' || CAST(doc_id AS VARCHAR)
        |  FROM documents WHERE doc_id % 10 = 5),
        |tkb AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS tk
        |  FROM corb),
        |ps AS (
        |  SELECT doc_id, tk, unnest(range(1, greatest(len(tk) - 4, 0) + 1)) AS i
        |  FROM tkb),
        |pgr AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |         array_to_string(tk[i:i+4], ' ') AS g
        |  FROM ps),
        |dupg AS (
        |  SELECT g FROM (SELECT DISTINCT g, doc_id FROM pgr) t
        |  GROUP BY g HAVING COUNT(*) >= 2),
        |mk AS (
        |  SELECT pgr.doc_id, pgr.pos FROM pgr SEMI JOIN dupg USING (g)
        |  WHERE pgr.doc_id >= 1000000),
        |isl AS (
        |  SELECT doc_id, pos,
        |         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS k
        |  FROM mk),
        |sp AS (
        |  SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 4 AS span_end
        |  FROM isl GROUP BY doc_id, k)
        |SELECT doc_id, CAST(span_start AS BIGINT) AS span_start,
        |       CAST(span_end AS BIGINT) AS span_end,
        |       CAST(span_end - span_start + 1 AS BIGINT) AS span_tokens
        |FROM sp WHERE span_end - span_start + 1 >= 8""".stripMargin,
    // Mirrors stripDupSpans over the same corpus: kept tokens = positions
    // outside every >= 8-token span, re-joined with single spaces; whole
    // corpus returned (untouched docs pass through, n_removed = 0).
    "text_strip_dup_spans" ->
      s"""WITH $tokCtes,
         |$chunkCtes,
         |ps AS (
         |  SELECT doc_id, tk, unnest(range(1, greatest(len(tk) - 4, 0) + 1)) AS i
         |  FROM tkc),
         |pgr AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         |         array_to_string(tk[i:i+4], ' ') AS g
         |  FROM ps),
         |dupg AS (
         |  SELECT g FROM (SELECT DISTINCT g, doc_id FROM pgr) t
         |  GROUP BY g HAVING COUNT(*) >= 2),
         |mk AS (SELECT pgr.doc_id, pgr.pos FROM pgr SEMI JOIN dupg USING (g)),
         |isl AS (
         |  SELECT doc_id, pos,
         |         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS k
         |  FROM mk),
         |sp AS (
         |  SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 4 AS span_end
         |  FROM isl GROUP BY doc_id, k),
         |spf AS (SELECT * FROM sp WHERE span_end - span_start + 1 >= 8),
         |tkp AS (
         |  SELECT doc_id, unnest(tk) AS tok, unnest(range(1, len(tk) + 1)) AS p
         |  FROM tkc),
         |keptc AS (
         |  SELECT t.doc_id,
         |         string_agg(t.tok, ' ' ORDER BY t.p) AS clean_text,
         |         CAST(COUNT(*) AS BIGINT) AS n_kept
         |  FROM tkp t
         |  WHERE NOT EXISTS (SELECT 1 FROM spf
         |                    WHERE spf.doc_id = t.doc_id
         |                      AND t.p BETWEEN spf.span_start AND spf.span_end)
         |  GROUP BY t.doc_id)
         |SELECT k.doc_id, COALESCE(c.clean_text, '') AS clean_text,
         |       CAST(len(k.tk) - COALESCE(c.n_kept, 0) AS BIGINT) AS n_removed
         |FROM tkc k LEFT JOIN keptc c USING (doc_id)""".stripMargin,
    // Mirrors containmentDrops at threshold 600: uncapped per-doc chunk
    // counts as the denominator, capped pairs as the numerator, contained
    // side = fewer chunks (tie: larger id), best container by
    // (contain_milli, n_shared) desc then container asc.
    "dedup_containment" ->
      s"""WITH $tokCtes,
         |$chunkCtes,
         |cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks FROM p GROUP BY 1),
         |pr AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_shared
         |  FROM p2 a JOIN p2 b ON a.fp = b.fp AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |jj AS (
         |  SELECT pr.*, ca.n_chunks AS ca, cb.n_chunks AS cb
         |  FROM pr JOIN cnt ca ON pr.doc_a = ca.doc_id JOIN cnt cb ON pr.doc_b = cb.doc_id),
         |cc AS (
         |  SELECT CASE WHEN ca < cb THEN doc_a WHEN cb < ca THEN doc_b
         |              ELSE greatest(doc_a, doc_b) END AS doc_id,
         |         CASE WHEN ca < cb THEN doc_b WHEN cb < ca THEN doc_a
         |              ELSE least(doc_a, doc_b) END AS container,
         |         n_shared,
         |         CAST((n_shared * 1000) // least(ca, cb) AS BIGINT) AS contain_milli
         |  FROM jj),
         |rr AS (
         |  SELECT doc_id, container, contain_milli, n_shared,
         |         ROW_NUMBER() OVER (PARTITION BY doc_id
         |                            ORDER BY contain_milli DESC, n_shared DESC, container ASC) AS rn
         |  FROM cc WHERE contain_milli >= 600)
         |SELECT doc_id, CAST(container AS BIGINT) AS container, contain_milli,
         |       CAST(n_shared AS BIGINT) AS n_shared
         |FROM rr WHERE rn = 1""".stripMargin,
    // Mirrors clusterSafeSplit: CC closure over the minhash pairs, split
    // bucket computed on the cluster representative (falling back to the
    // doc's own id for singletons).
    "corpus_split_cluster_safe" ->
      s"""WITH RECURSIVE pairs AS (
         |$minhashLshSql
         |),
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION
         |  SELECT doc_b AS a, doc_a AS b FROM pairs),
         |reach(id, r) AS (
         |  SELECT DISTINCT a, a FROM edges
         |  UNION
         |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
         |cl AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
         |w AS (
         |  SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS rep
         |  FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id),
         |h AS (SELECT doc_id, rep, ${bucketSql("rep")} AS bucket FROM w)
         |SELECT doc_id, CAST(rep AS BIGINT) AS rep, CAST(bucket AS BIGINT) AS bucket,
         |       CASE WHEN bucket < 179 THEN 'train'
         |            WHEN bucket < 217 THEN 'val'
         |            ELSE 'test' END AS split
         |FROM h""".stripMargin,
    // Mirrors splitLeakage: the cross-corpus minhash machinery with the
    // hash-split partitions as the two sides (train = corpus, rest =
    // probe), eval split label recomputed from the bucket.
    "corpus_split_leakage" ->
      s"""WITH
         |${mhSideCtes("e_", s"SELECT doc_id, text FROM documents WHERE ${bucketSql("doc_id")} >= 179")},
         |${mhSideCtes("t_", s"SELECT doc_id, text FROM documents WHERE ${bucketSql("doc_id")} < 179")},
         |okb AS (SELECT band, bkey FROM t_bands GROUP BY band, bkey HAVING COUNT(*) <= 50),
         |tbands AS (SELECT b.* FROM t_bands b JOIN okb USING (band, bkey)),
         |cand AS (
         |  SELECT DISTINCT x.id AS eval_doc, y.id AS train_doc
         |  FROM e_bands x JOIN tbands y ON x.band = y.band AND x.bkey = y.bkey),
         |esizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM e_shingles GROUP BY id),
         |tsizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM t_shingles GROUP BY id),
         |inter AS (
         |  SELECT c.eval_doc, c.train_doc, CAST(COUNT(*) AS BIGINT) AS inter
         |  FROM cand c
         |  JOIN e_shingles a ON a.id = c.eval_doc
         |  JOIN t_shingles b ON b.id = c.train_doc AND b.tok = a.tok
         |  GROUP BY 1, 2),
         |j AS (
         |  SELECT i.eval_doc, i.train_doc,
         |         round(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 4) AS jaccard
         |  FROM inter i
         |  JOIN esizes sa ON sa.id = i.eval_doc
         |  JOIN tsizes sb ON sb.id = i.train_doc
         |  WHERE round(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter), 4) >= 0.8)
         |SELECT eval_doc,
         |       CASE WHEN ${bucketSql("eval_doc")} < 217 THEN 'val' ELSE 'test' END AS split,
         |       train_doc, jaccard
         |FROM j""".stripMargin,
    // Mirrors balancedShards: global (n_tokens desc, doc_id asc) rank,
    // snake-dealt to 8 shards (odd rounds reversed).
    "corpus_balanced_shards" ->
      s"""WITH $tokCtes,
         |t AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens FROM tks),
         |r AS (
         |  SELECT doc_id, n_tokens,
         |         CAST(ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id ASC) AS BIGINT) AS rank
         |  FROM t)
         |SELECT doc_id, n_tokens, rank,
         |       CAST(CASE WHEN ((rank - 1) // 8) % 2 = 0 THEN (rank - 1) % 8
         |                 ELSE 7 - ((rank - 1) % 8) END AS BIGINT) AS shard
         |FROM r""".stripMargin,
    // Mirrors fluencyGate: the bigram-LM score (text_lm_bigram's chain)
    // gated at each source's p75 by the exact nearest-rank quantile rule
    // (stats_quantiles' cum*100 >= tot*pct formulation).
    "text_fluency_gate" ->
      s"""WITH $tokCtes,
         |bgl AS (
         |  SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM tks),
         |tf AS (
         |  SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM bgl GROUP BY 1, 2, 3),
         |c2 AS (SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS c2 FROM tf GROUP BY 1, 2),
         |c1 AS (SELECT w1, CAST(SUM(tf) AS BIGINT) AS c1 FROM tf GROUP BY 1),
         |lm AS (
         |  SELECT tf.doc_id,
         |         CAST((1000 * SUM(tf.tf * (c1.c1 // c2.c2))) // SUM(tf.tf) AS BIGINT) AS lm_milli
         |  FROM tf JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
         |  GROUP BY tf.doc_id),
         |s AS (
         |  SELECT lm.doc_id, d.source, lm.lm_milli
         |  FROM lm JOIN documents d USING (doc_id)),
         |h AS (SELECT source, lm_milli, COUNT(*) AS cnt FROM s GROUP BY 1, 2),
         |c AS (
         |  SELECT source, lm_milli,
         |         SUM(cnt) OVER (PARTITION BY source ORDER BY lm_milli
         |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |         SUM(cnt) OVER (PARTITION BY source) AS tot
         |  FROM h),
         |th AS (
         |  SELECT source,
         |         CAST(MIN(CASE WHEN cum * 100 >= tot * 75 THEN lm_milli END) AS BIGINT) AS lm_threshold
         |  FROM c GROUP BY 1)
         |SELECT s.doc_id, s.source, s.lm_milli, th.lm_threshold
         |FROM s JOIN th USING (source)
         |WHERE s.lm_milli <= th.lm_threshold""".stripMargin,
    // Mirrors blocklistHits for terms {dup, slow scan}: token-aligned
    // unigram + bigram matches counted per doc.
    "corpus_blocklist" ->
      s"""WITH $tokCtes,
         |g1 AS (
         |  SELECT doc_id, unnest(tk) AS gram FROM tks),
         |b2 AS (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM tks),
         |g2 AS (SELECT doc_id, tk[i] || ' ' || tk[i + 1] AS gram FROM b2),
         |g AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2),
         |terms(term) AS (VALUES ('dup'), ('slow scan'))
         |SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS n_hits
         |FROM g JOIN terms ON g.gram = terms.term
         |GROUP BY 1, 2""".stripMargin,
    // Mirrors cellDrift: both snapshots assigned against the PREV
    // snapshot's flat centroids (ids < 16), ppm shares, integer milli
    // ratio with the tokenDrift -1 convention.
    "embedding_cell_drift" ->
      s"""WITH prev AS (SELECT vec_id, embedding FROM embeddings),
         |cur AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 3
         |  UNION ALL
         |  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 7 = 1),
         |pe AS (
         |  SELECT vec_id AS id, embedding AS v,
         |         sqrt(list_sum(list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE) * embedding[i]))) AS nrm
         |  FROM prev),
         |ce AS (
         |  SELECT vec_id AS id, embedding AS v,
         |         sqrt(list_sum(list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE) * embedding[i]))) AS nrm
         |  FROM cur),
         |cents AS (SELECT id, v, nrm FROM pe WHERE id < 16),
         |pasg AS (
         |  SELECT q.id AS vid, c.id AS cid,
         |         ROW_NUMBER() OVER (PARTITION BY q.id
         |           ORDER BY round($dotSql / (q.nrm * c.nrm), 6) DESC, c.id) AS rn
         |  FROM pe q JOIN cents c ON TRUE),
         |casg AS (
         |  SELECT q.id AS vid, c.id AS cid,
         |         ROW_NUMBER() OVER (PARTITION BY q.id
         |           ORDER BY round($dotSql / (q.nrm * c.nrm), 6) DESC, c.id) AS rn
         |  FROM ce q JOIN cents c ON TRUE),
         |pc AS (SELECT cid AS centroid_id, CAST(COUNT(*) AS BIGINT) AS n_prev
         |       FROM pasg WHERE rn = 1 GROUP BY 1),
         |cc AS (SELECT cid AS centroid_id, CAST(COUNT(*) AS BIGINT) AS n_cur
         |       FROM casg WHERE rn = 1 GROUP BY 1),
         |pt AS (SELECT CAST(SUM(n_prev) AS BIGINT) AS tot FROM pc),
         |ct AS (SELECT CAST(SUM(n_cur) AS BIGINT) AS tot FROM cc),
         |pp AS (SELECT centroid_id, n_prev,
         |              CAST(n_prev * 1000000 // pt.tot AS BIGINT) AS prev_ppm FROM pc, pt),
         |cp AS (SELECT centroid_id, n_cur,
         |              CAST(n_cur * 1000000 // ct.tot AS BIGINT) AS cur_ppm FROM cc, ct),
         |j AS (
         |  SELECT centroid_id,
         |         COALESCE(n_prev, 0) AS n_prev, COALESCE(n_cur, 0) AS n_cur,
         |         COALESCE(prev_ppm, 0) AS prev_ppm, COALESCE(cur_ppm, 0) AS cur_ppm
         |  FROM pp FULL OUTER JOIN cp USING (centroid_id))
         |SELECT centroid_id, n_prev, n_cur, prev_ppm, cur_ppm,
         |       CAST(CASE WHEN prev_ppm >= 1 THEN (cur_ppm * 1000) // prev_ppm
         |            ELSE -1 END AS BIGINT) AS drift_milli
         |FROM j""".stripMargin
  )

  /** DuckDB mirror of Corpus.md5Bucket: first md5 byte of the
    * stringified id via hex-digit positions.
    */
  private def bucketSql(e: String): String =
    s"(strpos('0123456789abcdef', substr(md5(CAST($e AS VARCHAR)), 1, 1)) - 1) * 16" +
      s" + strpos('0123456789abcdef', substr(md5(CAST($e AS VARCHAR)), 2, 1)) - 1"

  /** Shared DuckDB CTE chain for the chunk-dedup oracles: containment
    * corpus (clones + prefix republishes) → 32/24 token chunk
    * fingerprints → distinct (fp, doc) postings `p` → hot-fp cap at 50
    * postings → capped table `p2`. Mirrors [[graft.ops.TextAnalysis
    * .chunkOverlapPairs]]'s posting construction.
    */
  private val chunkCtes =
    """cor AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000,
      |         array_to_string(tk[1:56], ' ') || ' zz tail ' || CAST(doc_id AS VARCHAR)
      |  FROM tks WHERE doc_id % 7 = 3),
      |tkc AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS tk
      |  FROM cor),
      |ch AS (
      |  SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n FROM tkc WHERE len(tk) > 0),
      |cs AS (
      |  SELECT doc_id, tk, n, unnest(range(0, ((n - 1) // 24) + 1)) AS cid FROM ch),
      |p AS (
      |  SELECT DISTINCT md5(array_to_string(tk[(cid*24+1):(cid*24+32)], ' ')) AS fp, doc_id
      |  FROM cs),
      |hot AS (SELECT fp FROM p GROUP BY fp HAVING COUNT(*) > 50),
      |p2 AS (SELECT p.* FROM p ANTI JOIN hot USING (fp))""".stripMargin
}
