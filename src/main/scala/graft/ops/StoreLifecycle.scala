package graft.ops

import org.apache.spark.sql.SparkSession

/** The shared batch-store claim protocol behind every batch-id-keyed
  * sketch/state store (`Stats.ingestKmvBatch`/`ingestCmsBatch`/
  * `ingestHistBatch`, `Rollup.ingestAggBatch`): batch 0 — or a missing
  * store — CLAIMS the root, deleting any stale state from a previous run
  * and pinning the store's parameters; later batches validate against the
  * pin and fail fast on a mismatch (stores built under different
  * parameters must never merge).
  *
  * The claim runs BEFORE any empty-batch check on the caller's side: an
  * empty batch 0 must still replace a stale store, or a previous run's
  * state would silently inflate every later rollup — and the claim is
  * what creates the store, so the read face sees "empty", not "missing",
  * on an idle stream. Each batch then lands its own state under
  * `<state>/batch_id=N` (the caller's write), so a checkpoint-retried
  * batch overwrites itself — exactly-once without a transaction log.
  */
private[graft] object StoreLifecycle {

  /** Claim-or-validate: on batch 0 / missing store, wipe `stateDir` and
    * run `writeParams`; otherwise run `validateParams` (which must throw
    * on a pin mismatch).
    */
  def claim(
      spark: SparkSession,
      path: String,
      stateDir: String,
      batchId: Long,
      writeParams: () => Unit,
      validateParams: () => Unit): Unit =
    if (batchId == 0L || !Similarity.storeExists(spark, s"$path/params")) {
      Similarity.deleteDir(spark, s"$path/$stateDir")
      writeParams()
    } else {
      validateParams()
    }
}
