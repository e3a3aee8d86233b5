package graft

/** Registry-wide physical-plan sweep: invariants that must hold for EVERY
  * query in `SparkEntry.queries`, not just the families PlanShapeSpec
  * pins individually. A new query cannot regress the repo's 100 TB
  * posture without failing here.
  *
  * Checked per plan (initial AQE plan, built at the sf0.001 fixture):
  *   - no `CartesianProduct` — an unbounded all-pairs join is never
  *     acceptable; every pairwise operator in the repo blocks/buckets
  *     first (LSH bands, time buckets, cells).
  *   - every `BroadcastNestedLoopJoin` carries a broadcast side — i.e. it
  *     is a deliberate bounded-side crossJoin(broadcast(...)) (centroid
  *     tables, scalar totals), not a fallback for an un-equi-keyed join
  *     of two large inputs.
  *
  * Construction-time driver jobs (centroid loops, checkpoint
  * materialization) run at sf0.001, so the sweep stays cheap.
  */
class RegistryPlanSpec extends SparkSpec {

  /** Queries that DELIBERATELY plan a BroadcastNestedLoopJoin: each one is
    * a `crossJoin(broadcast(...))` whose broadcast side is bounded by
    * construction (a centroid table, a scalar-totals row, a quantile
    * threshold row) — never data-sized. Every BNLJ in Spark names a build
    * side, so "has a build side" is vacuous; the enforceable invariant is
    * that NO query outside this list plans one. A new query that
    * introduces a nested loop (e.g. an accidental non-equi join of two
    * large inputs) fails here until it is reviewed and either re-keyed or
    * allowlisted with a boundedness argument.
    */
  private val deliberateBnlj: Set[String] = Set(
    "similarity_topk", // crossJoin(broadcast(query-norms row)) — |queries| rows
    "search_rrf_hybrid", // dense arm is bruteForceTopK's reviewed |queries|-row broadcast (8 ids); the lexical arm and the fusion are equi-joins/aggregates
    "similarity_topk_debiased", // crossJoin(broadcast(debiased query rows)) — |queries| rows
    // (similarity_topk_mmr's brute pool materializes at construction, so
    // its final plan carries no BNLJ; no allowlist entry needed)
    // (similarity_topk_projected pools via a sign-bucket equi-join in the
    // projected space since round 10 — no BNLJ, no allowlist entry)
    "similarity_topk_ivf", // crossJoin(broadcast(centroids)) — nCentroids rows
    "similarity_topk_ivf_flat", // same centroid broadcast
    "similarity_hard_negatives", // same centroid broadcast (label rides the equi-keyed stages)
    "similarity_topk_ivf_persisted", // same centroid broadcast, read from the index
    "similarity_topk_ivf_compacted", // same centroid broadcast over the compacted store
    "similarity_topk_ivf_retrained", // same centroid broadcast over the retrained store
    "similarity_topk_ivfpq", // centroid + codebook broadcasts (both bounded), probe side broadcast onto the partition column
    "similarity_topk_ivfpq_retrained", // same bounded broadcasts over the retrained store
    "ann_index_audit", // centroid broadcast (batch assignment) + 1-row ppm totals
    "ann_recall_audit", // centroid broadcast (probe side) + |queries|-row broadcast on the exact ground-truth side — the audited sample is bounded by contract (8 ids)
    "ann_recall_audit_pq", // codebook broadcast (ADC probe) + the same bounded exact-side broadcast
    "ann_recall_audit_ivfpq", // centroid + codebook broadcasts (composed probe) + the same bounded exact-side broadcast (8-id sample)
    "ann_ranking_audit", // centroid broadcast (IVF probe) + the bounded exact-truth-side broadcast (8-id sample)
    "embedding_cell_balance", // centroid broadcast
    "ann_silhouette", // crossJoin(broadcast(flat centroids)) — nCentroids rows, the ivfFlatTopK assign envelope
    "ann_rbo_audit", // both arms are reviewed bounded broadcasts: the flat-centroid assign + bruteForceTopK's |queries|-row (8-id) broadcast
    "stats_cramers_v", // crossJoin(broadcast(1-row n/levels totals)) onto contingency cells
    "embedding_cell_drift", // centroid broadcast (two epochs)
    "dedup_setjoin_drift", // crossJoin(broadcast(1-row candidate/prefix counts)) ×4
    "audit_orders", // crossJoin(broadcast(1-row totals summary))
    "audit_join_cardinality", // crossJoin(broadcast(1-row grand total))
    "skew_key_profile", // crossJoin(broadcast(1-row totals))
    "stats_chisq_drift", // crossJoin(broadcast(1-row cohort totals))
    "events_cuped", // crossJoin(broadcast(1-row pooled moments)) onto per-variant rows
    "events_cobasket", // crossJoin(broadcast(1-row capped-universe user total)) onto item-pair rows
    "gen_pareto", // crossJoin(broadcast(1-row revenue total)) onto ten decile rows
    "text_lm_backoff" // crossJoin(broadcast(1-row reference token total))
  )

  /** Physical-plan substrings that mark a lambda reading an INLINE array
    * expression element-by-element — the optimizer re-evaluates the inline
    * expression per element (and predicate pushdown plants exactly this
    * shape when an inferred `size(...) > 0` filter sinks below the
    * projection that named the array). Measured O(n²): re-tokenizing per
    * token cost 1.8x all of chunkContentDefined before the round-8 fix.
    * Lambdas must bind elements (`transform`/`zip_with`), not index an
    * outer column.
    */
  private val inlineElementAt =
    Seq("element_at(filter(split(", "element_at(transform(", "element_at(filter(transform(")

  test("no query in the registry plans a CartesianProduct or an unreviewed nested-loop join") {
    val bad = scala.collection.mutable.ListBuffer.empty[String]
    val bnljQueries = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct"))
          bad += s"$name: CartesianProduct"
        if (plan.contains("BroadcastNestedLoopJoin")) bnljQueries += name
        inlineElementAt.filter(plan.contains).foreach { sig =>
          bad += s"$name: per-element re-evaluation of an inline array expr ($sig...)"
        }
      } catch {
        case e: Throwable => bad += s"$name: plan build FAILED: ${e.getMessage}"
      }
      // queries that localCheckpoint during construction leave scratch
      // blocks; drop them so 134 builds in one JVM don't accumulate
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    val unreviewed = bnljQueries.toSet -- deliberateBnlj
    assert(bad.isEmpty, "registry plan violations:\n" + bad.mkString("\n"))
    assert(unreviewed.isEmpty,
      s"queries planning a nested-loop join outside the reviewed allowlist: $unreviewed")
  }
}
