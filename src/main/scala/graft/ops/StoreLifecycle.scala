package graft.ops

import org.apache.spark.sql.SparkSession

/** The shared batch-store claim protocol behind every batch-id-keyed
  * sketch/state store (`Stats.ingestKmvBatch`/`ingestCmsBatch`/
  * `ingestHistBatch`/`ingestHllBatch`, `Rollup.ingestAggBatch`,
  * `Dedup.ingestLshBatch`/`ingestTokenEditBatch`,
  * `TextAnalysis.ingestGramBatch`): batch 0 — or a missing store — CLAIMS
  * the root, deleting any stale state from a previous run and pinning the
  * store's parameters; later batches validate against the pin and fail
  * fast on a mismatch (stores built under different parameters must never
  * merge).
  *
  * The claim runs BEFORE any empty-batch check on the caller's side: an
  * empty batch 0 must still replace a stale store, or a previous run's
  * state would silently inflate every later rollup — and the claim is
  * what creates the store, so the read face sees "empty", not "missing",
  * on an idle stream. Each batch then lands its own state under
  * `<state>/batch_id=N` (the caller's write), so a checkpoint-retried
  * batch overwrites itself — exactly-once without a transaction log.
  *
  * Stores whose pinned artifact is TRAINED FROM CONTENT (the set-join df
  * order, IVF centroids, the PQ codebook, media fingerprints) cannot
  * write params on an empty claim; they implement the same rule's second
  * variant inline: batch 0 wipes EVERYTHING including params, and an
  * empty batch returns after the wipe — the first non-empty batch then
  * re-enters the claim branch (params are gone) and trains. Either way,
  * no batch ever validates against a previous run's pin.
  */
private[graft] object StoreLifecycle {

  /** Claim-or-validate: on batch 0 / missing store, wipe every dir in
    * `stateDirs` and run `writeParams`; otherwise run `validateParams`
    * (which must throw on a pin mismatch).
    */
  def claim(
      spark: SparkSession,
      path: String,
      stateDirs: Seq[String],
      batchId: Long,
      writeParams: () => Unit,
      validateParams: () => Unit): Unit =
    if (batchId == 0L || !Similarity.storeExists(spark, s"$path/params")) {
      stateDirs.foreach(d => Similarity.deleteDir(spark, s"$path/$d"))
      writeParams()
    } else {
      validateParams()
    }

  /** Single-state-dir face kept for the sketch/rollup callers. */
  def claim(
      spark: SparkSession,
      path: String,
      stateDir: String,
      batchId: Long,
      writeParams: () => Unit,
      validateParams: () => Unit): Unit =
    claim(spark, path, Seq(stateDir), batchId, writeParams, validateParams)
}
