package graft

import graft.etl.NessusSynth
import graft.queries.ScanQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan regression tests: the properties that make these queries
  * survive a 100 TB scale-up (SURVEY §4.2) — filters reaching the parquet
  * scan, dimensions broadcasting, the Nth-run window pruning map-side via
  * WindowGroupLimit, and no single-partition global windows anywhere.
  */
class PlanShapeSpec extends SparkSpec {
  lazy val w = NessusSynth(spark, sf)

  private def plan(df: DataFrame): String = {
    df.count() // let AQE finalize
    df.queryExecution.executedPlan.toString
  }

  test("scan_results: scan_id filter is pushed to the parquet scan") {
    val p = plan(ScanQueries.scanResults(w, 7, 0))
    assert(p.contains("PushedFilters: [EqualTo(scan_id,7)]"), p.take(2000))
  }

  test("scan_results: all three dimension joins broadcast; run-id set broadcasts semi") {
    val p = plan(ScanQueries.scanResults(w, 7, 0))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(2000))
    assert(!p.contains("SortMergeJoin"), "fact-dim joins must not sort-merge at this size")
  }

  test("nth-latest window prunes map-side (WindowGroupLimit) and never runs on a single partition") {
    val p = plan(ScanQueries.folderStats(w, 1, 0))
    assert(p.contains("WindowGroupLimit"), p.take(2000))
    assert(
      !p.contains("SinglePartition"),
      "global-window single-partition exchange would bottleneck at scale")
  }

  test("stats column pruning: scan_run parquet scan reads only needed columns") {
    val df = ScanQueries.scanStats(w, 7, 0)
    df.count()
    // the window input scan needs only (scan_run_id, scan_id, scan_start) +
    // the stats payload; host/vuln tables must not be read at all
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("/host"), "stats query must not scan the host table")
    assert(!p.contains("/vuln_output"), "stats query must not scan vuln_output")
  }

  // ---- dedup family: the self-join shapes that must never regress --------

  private lazy val docsDf = spark.read.parquet(s"$sf/documents.parquet")

  test("minHashLsh: no cartesian product; shingles/bands materialized before reuse") {
    val df = graft.ops.Dedup.minHashLsh(docsDf)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), "candidate join must be an equi-join on (band,bkey)")
    assert(!p.contains("BroadcastNestedLoopJoin"), "candidate join must not nest-loop")
    // the checkpoint guard: both multi-consumer subtrees enter the plan as
    // materialized scans, not as re-executions of the shingle explode. If
    // someone removes the localCheckpoint, the explode/generate reappears
    // many times and this count blows past the budget.
    assert(
      "Scan ExistingRDD".r.findAllIn(p).size >= 2,
      "shingles and bands must be localCheckpoint-materialized before the self-join:\n" +
        p.take(2000))
    assert(
      "Generate explode".r.findAllIn(p).size <= 1,
      "the shingle explode must be evaluated once, not once per consumer")
  }

  test("hot-key cap (capHotKeys) is agg + anti-join — never a window over the posting key") {
    // the materialization boundary hides the cap from minHashLsh's final
    // plan, so assert on the capped bands subtree itself: the hot bucket
    // must be absorbed by map-side partial counts and removed via an
    // anti-join against the (tiny) hot-key set — a Window here co-locates
    // every posting of the degenerate key on one reducer, and a semi-join
    // against the cold set would shuffle the whole posting table
    val shingles = docsDf
      .select(col("doc_id").as("id"), explode(graft.ops.TextAnalysis.tokens(col("text"))).as("tok"))
    val bands = graft.ops.Dedup.lshBands(
      graft.ops.Dedup.minHashSignature(shingles, 8), 8, 2)
    val p = plan(graft.ops.Skew.capHotKeys(bands, Seq("band", "bkey"), 50))
    assert(!p.contains("Window"), "cap must not be a window count:\n" + p.take(1500))
    assert(p.contains("LeftAnti"), "cap must drop hot keys via anti-join:\n" + p.take(1500))
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      "bucket counts must partial-aggregate map-side:\n" + p.take(1500))
    assert(!p.contains("SinglePartition"))
    // AQE's runtime sizing broadcasts the hot-key side (it is near-empty),
    // so the posting table itself is never shuffled for the cap
    assert(p.contains("BroadcastExchange"),
      "hot-key set must broadcast at runtime:\n" + p.take(1500))
  }

  test("pair generators: no Window over any posting key (simhash/ahash bands, grams, winnow fps)") {
    // every pair generator now materializes its capped band table (both
    // self-join sides consume it), so the cap sits behind a checkpoint
    // boundary in all final plans — the anti-join + broadcast shape is
    // asserted on the capHotKeys subtree in the previous test; here the
    // assertion is that nothing smuggled a window back in.
    val pSim = plan(graft.ops.Dedup.simHashPairs(docsDf))
    assert(!pSim.contains("Window"), "simHashPairs cap regressed to a window:\n" + pSim.take(1500))
    val hashes = docsDf.select(
      col("doc_id"),
      pmod(hash(col("doc_id")), lit(65536)).cast("long").as("hash_hi"),
      pmod(hash(col("doc_id"), lit(7)), lit(65536)).cast("long").as("hash_lo"))
    val pA = plan(graft.ops.Dedup.aHashPairs(hashes))
    assert(!pA.contains("Window"), "aHashPairs cap regressed to a window:\n" + pA.take(1500))
    val pNg = plan(graft.ops.Dedup.ngramJaccard(docsDf))
    assert(!pNg.contains("Window"), pNg.take(1500))
    val pWr = plan(graft.ops.TextAnalysis.winnowReusePairs(docsDf))
    assert(!pWr.contains("Window"), pWr.take(1500))
    val pCt = plan(graft.ops.Corpus.contaminationNgrams(docsDf))
    assert(!pCt.contains("Window"), "contamination train-mark must be agg+join:\n" + pCt.take(1500))
    val pCo = plan(graft.ops.TextAnalysis.chunkOverlapPairs(docsDf))
    assert(!pCo.contains("Window"), "chunkOverlapPairs cap regressed to a window:\n" + pCo.take(1500))
  }

  test("containmentDrops / splitLeakage / balancedShards: no Window, no single-partition exchange") {
    // containment: pair table + chunk-count joins + max(struct) agg
    val pCd = plan(graft.ops.TextAnalysis.containmentDrops(docsDf, minContainMilli = 1))
    assert(!pCd.contains("Window"), "containment best-container pick must be an agg:\n" + pCd.take(1500))
    // leakage audit inherits crossMinHashLsh's banded shape
    val pLk = plan(graft.ops.Corpus.splitLeakage(docsDf))
    assert(!pLk.contains("Window"), pLk.take(1500))
    assert(!pLk.contains("CartesianProduct"), pLk.take(1500))
    // token-balanced sharding: the global rank must come from the
    // range-partition + offsets machinery, never row_number() over ()
    val pBs = plan(graft.ops.Corpus.balancedShards(docsDf))
    assert(!pBs.contains("Window"), "global rank regressed to a window:\n" + pBs.take(1500))
    assert(!pBs.contains("SinglePartition"), "no single-partition exchange:\n" + pBs.take(1500))
  }

  test("ngramJaccard: no cartesian product; inverted index materialized once") {
    val df = graft.ops.Dedup.ngramJaccard(docsDf)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"))
    assert(
      "Scan ExistingRDD".r.findAllIn(p).size >= 1,
      "inverted index must be localCheckpoint-materialized before sizes + self-join")
    assert(
      "Generate explode".r.findAllIn(p).size <= 1,
      "the gram explode must be evaluated once, not once per consumer")
  }

  test("clusterPairs: label propagation is equi-join + partial agg, never cartesian") {
    val s = spark
    import s.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val p = plan(graft.ops.Dedup.clusterPairs(pairs))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SinglePartition"), "labels must stay hash-partitioned by id")
    // converged labels come from the per-iteration materialization boundary
    assert(p.contains("Scan ExistingRDD"), p.take(1500))
  }

  test("corpus ops are shuffle-free row-local projections") {
    val pSplit = plan(graft.ops.Corpus.splitAssign(docsDf))
    assert(!pSplit.contains("Exchange"), "hash split must not shuffle:\n" + pSplit.take(1500))
    val pPii = plan(graft.ops.Corpus.piiRedact(docsDf))
    assert(!pPii.contains("Exchange"), "redaction must not shuffle:\n" + pPii.take(1500))
    // both stay inside whole-stage codegen ("*(n)" stage markers) and prune
    // the scan down to the columns they read
    assert(pSplit.contains("*(1)"), pSplit.take(800))
    assert(pPii.contains("*(1)"), pPii.take(800))
    assert(pSplit.contains("ReadSchema: struct<doc_id:bigint>"), "split must scan only doc_id")
  }

  test("standardizeMilli: transform face is a zero-shuffle column program") {
    // the dim stats ride in as array LITERALS (collected, <= dim rows), so
    // the per-vector z-score is a pure projection — no Exchange, no join
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(graft.ops.Similarity.standardizeMilli(embs))
    assert(!p.contains("Exchange"), "z-scoring must not shuffle the corpus:\n" + p.take(1500))
    assert(!p.contains("Join"), "stats must be literals, not a join side:\n" + p.take(1500))
  }

  test("multimodal decode: partition-parallel map, no exchange before the decode") {
    val p = plan(graft.ops.Multimodal.bmpFeatures(
      graft.etl.MediaSynth.mediaTable(docsDf, "image/bmp", graft.etl.MediaSynth.docBmp)))
    assert(!p.contains("Exchange"), "decode is per-row; a shuffle would be pure overhead:\n" + p.take(1500))
    assert(p.contains("MapPartitions") || p.contains("SerializeFromObject"), p.take(1500))
  }

  test("cleanLines is a shuffle-free codegen projection") {
    val p = plan(graft.ops.TextAnalysis.cleanLines(docsDf))
    assert(!p.contains("Exchange"), "line cleaning is per-row; it must not shuffle:\n" + p.take(1500))
    assert(p.contains("*(1)"), p.take(800))
  }

  test("paragraphDedup: first-occurrence via agg+join, never a window over the fingerprint") {
    val p = plan(graft.ops.Dedup.paragraphDedup(docsDf))
    // the whole point of the agg formulation is that a hot boilerplate
    // fingerprint partial-aggregates map-side instead of landing on one
    // window reducer — a Window in this plan is a scale regression
    assert(!p.contains("Window"), "no window over pfp:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Scan ExistingRDD"), "paragraph table must be materialized before reuse")
    assert(
      "Generate" .r.findAllIn(p).size <= 1,
      "the paragraph explode must be evaluated once, not once per consumer")
  }

  test("semanticDedup: centroids broadcast; prune join is equi on the cluster id") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(graft.ops.Dedup.semanticDedup(embs))
    assert(!p.contains("CartesianProduct"), "within-cluster prune must equi-join on centroid_id")
    assert(!p.contains("SinglePartition"), "per-vector argmax partitions by id, never globally")
    // the assignment subtree sits behind the materialization boundary in the
    // final plan, so assert its shape directly (same move as the minhash
    // bucket-cap test): centroid side broadcast, argmax window per vector id
    val cents = embs
      .filter(col("vec_id") < 16)
      .select(col("vec_id").cast("long").as("centroid_id"), col("embedding").as("centroid"))
    val assignment = embs
      .select(col("vec_id").cast("long").as("id"), col("embedding").as("v"))
      .crossJoin(broadcast(cents))
      .withColumn("sim", round(graft.ops.Similarity.cosine(col("v"), col("centroid")), 6))
      .withColumn(
        "rn",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("id")
            .orderBy(col("sim").desc, col("centroid_id"))))
      .filter(col("rn") === 1)
    val pa = plan(assignment)
    assert(
      pa.contains("BroadcastNestedLoopJoin") || pa.contains("BroadcastExchange"),
      "centroid assignment must broadcast the (tiny) centroid side:\n" + pa.take(1500))
    assert(!pa.contains("SinglePartition"), "argmax window must partition by vector id")
  }

  test("sampleQuota: no single-partition window; quota window confined to the boundary bucket") {
    val p = plan(graft.ops.Corpus.sampleQuota(docsDf, n = 10))
    assert(!p.contains("SinglePartition"), p.take(1500))
    // the boundary-side window input carries the cutoff filter (bucket =
    // cut_bucket) BELOW the window — the full corpus never sorts
    assert(p.contains("Window"), p.take(1500))
  }

  test("collocations: top-k plans as TakeOrdered, tail pruned before the unigram joins") {
    val p = plan(graft.ops.TextAnalysis.collocations(docsDf))
    assert(p.contains("TakeOrderedAndProject"), "top-k must never be a global sort:\n" + p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("retention: distinct-first aggregation, equi-joins only") {
    val evRaw = spark.read.parquet(s"$sf/events.parquet")
    val ev = evRaw.select(col("user_id"), graft.io.EventTime.tsSecs(evRaw).as("secs"))
    val p = plan(graft.ops.Funnel.retention(ev))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SinglePartition"), "cohort computation must stay key-partitioned")
  }

  // ---- round-6 additions: chunking / boilerplate / classifier / PQ ------

  test("chunkTokens is a shuffle-free codegen expansion") {
    val p = plan(graft.ops.TextAnalysis.chunkTokens(docsDf))
    assert(!p.contains("Exchange"), "chunking is per-row; it must not shuffle:\n" + p.take(1500))
    assert(!p.contains("Window"), p.take(1500))
  }

  test("boilerplateLines: line df is agg+join, never a window over the line fingerprint") {
    val p = plan(graft.ops.TextAnalysis.boilerplateLines(docsDf))
    // a hot boilerplate line ("all rights reserved") must partial-aggregate
    // map-side and come back via an AQE-skew-splittable equi-join — a
    // Window over line_fp funnels every posting to one reducer
    assert(!p.contains("Window"), "no window over line_fp:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Scan ExistingRDD"), "line table must be materialized before df + join reuse")
    assert("Generate".r.findAllIn(p).size <= 1, "the line explode must be evaluated once")
  }

  test("linearScore: two hash aggregations on uniform keys, no window, no join") {
    val p = plan(graft.ops.TextAnalysis.linearScore(docsDf))
    assert(!p.contains("Window"), p.take(1500))
    assert(!p.contains("Join"), "the weight is an expression, not a join:\n" + p.take(1500))
    assert(p.contains("HashAggregate"), p.take(1500))
    assert(!p.contains("SinglePartition"), p.take(1500))
  }

  test("datacard: one rollup aggregation pass, no join, no window") {
    val p = plan(graft.ops.Corpus.datacard(docsDf))
    assert(!p.contains("Window"), p.take(1500))
    assert(!p.contains("Join"), "per-source + ALL must come from one rollup:\n" + p.take(1500))
    assert(p.contains("Expand"), "rollup grouping sets plan as Expand:\n" + p.take(1500))
  }

  test("PQ: encode is a zero-exchange projection, ADC joins are equi") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val pCodes = plan(graft.ops.Similarity.pqCodes(embs))
    assert(!pCodes.contains("CartesianProduct"), pCodes.take(1500))
    // round-17: the m·ksub codebook rides as a per-subspace array literal
    // and the argmin folds into the projection — no broadcast, no
    // shuffle, no aggregation anywhere in the encode
    assert(!pCodes.contains("Exchange"),
      "PQ encode must not shuffle (argmin folds into the projection):\n" + pCodes.take(1500))
    assert(!pCodes.contains("Window") && !pCodes.contains("HashAggregate"), pCodes.take(1500))
    val pTopK = plan(graft.ops.Similarity.pqTopK(embs.filter(col("vec_id") < 8), embs, k = 5))
    assert(!pTopK.contains("CartesianProduct"), pTopK.take(1500))
    assert("BroadcastExchange".r.findAllIn(pTopK).size >= 1,
      "the query distance table must broadcast into the ADC join:\n" + pTopK.take(1500))
  }

  test("diversity: linear aggregation path — no pairs, no window, no single partition") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(graft.ops.Similarity.diversity(embs))
    assert(!p.contains("Window"), p.take(1500))
    assert(!p.contains("Join"), "the identity needs no pairs and no join:\n" + p.take(1500))
    assert(!p.contains("SinglePartition"), p.take(1500))
  }

  test("triangleCounts: wedge and closing joins are equi, edge tables materialized, no window") {
    val s = spark
    import s.implicits._
    // pin the DISTRIBUTED kernel's shape (the small-graph fast path takes
    // over below the cutoff; its equivalence is pinned in GraphSpec).
    // Conf-isolated clone: the cutoff must not leak into concurrent suites.
    val p = SparkSpec.withIsolatedConf("spark.graft.graph.localEdgeCutoff" -> "0") { s2 =>
      import s2.implicits._
      plan(graft.ops.Graph.triangleCounts(
        Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")))
    }
    assert(!p.contains("CartesianProduct"), "wedges must equi-join on the apex:\n" + p.take(1500))
    assert(!p.contains("Window"), p.take(1500))
    // canonical + oriented edge tables each feed multiple consumers
    assert("Scan ExistingRDD".r.findAllIn(p).size >= 2, p.take(1500))
    // the fast path itself: one task, zero exchanges
    val pLocal = plan(graft.ops.Graph.triangleCounts(
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")))
    assert(!pLocal.contains("Exchange") && !pLocal.contains("Join"), pLocal.take(1500))
  }

  test("urlCanonicalGroups: one hash aggregation over per-row regex projections") {
    val p = plan(graft.ops.TextAnalysis.urlCanonicalGroups(docsDf))
    assert(!p.contains("Window"), p.take(1500))
    assert(!p.contains("Join"), "canonicalization is per-row; grouping is one agg:\n" + p.take(1500))
    assert(p.contains("HashAggregate"), p.take(1500))
  }

  test("embeddingCosine / ANN: bucketed equi-joins, centroids broadcast") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val pDedup = plan(graft.ops.Dedup.embeddingCosine(embs))
    assert(!pDedup.contains("CartesianProduct"), "sign-LSH blocking must equi-join on bucket")
    val q = embs.filter(col("vec_id") < 4)
    val pIvf = plan(graft.ops.Similarity.ivfTopK(q, embs, k = 5, nCentroids = 8, nProbe = 2))
    assert(pIvf.contains("BroadcastNestedLoopJoin") || pIvf.contains("BroadcastExchange"),
      "centroid assignment must broadcast the (tiny) centroid side")
    assert(!pIvf.contains("SinglePartition"), "no global-window centroid id assignment")
  }

  test("debiasedAnnTopK: probe reads the checkpointed debias boundary, bucket join hashes") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(graft.ops.Similarity.debiasedAnnTopK(embs, col("vec_id") < 4, k = 3))
    // the checkpoint must sit on the debiased arrays: every consumer
    // references __c, and an un-materialized debias chain costs seconds
    // of per-reference analyzer inlining (the round-11 regression) —
    // both join sides must scan the materialized RDD
    assert("Scan ExistingRDD".r.findAllIn(p).size >= 2, p.take(1500))
    assert(p.contains("BroadcastHashJoin"), "multi-probe must equi-join on the bucket:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the debiased ANN face must never fall back to all-pairs:\n" + p.take(1500))
    assert(p.contains("WindowGroupLimit"), "per-query top-k must prune map-side")
  }

  test("bucketed stores: a bucket-filtered read PRUNES partitions at the scan") {
    val s = spark
    import s.implicits._
    // the exact read shape the edge-store mutators and CC mutators use:
    // a filter on the bucket PARTITION column must land in the scan's
    // PartitionFilters (directory pruning), never as a post-scan Filter
    // over all buckets — the claim SCALE.md makes for the O(delta)
    // write-set computation
    val dir = java.nio.file.Files.createTempDirectory("bucketprune").toString
    graft.ops.Graph.writeEdgeStore(
      (1L to 300L).map(i => (i, i + 1)).toDF("src", "dst"), dir)
    val pruned = spark.read.parquet(s"$dir/support")
      .filter(col("bucket").isin(3, 7))
      .select("u", "v", "support")
    pruned.count()
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("bucket"), p.take(1500))
    val scanned = pruned.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }.sum
    assert(scanned <= 2, s"bucket filter must prune to <= 2 directories, scanned $scanned")
  }
}
