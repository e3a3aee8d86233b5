package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous ANN-index maintenance — the streaming face of the persisted
  * IVF lifecycle ([[graft.ops.Similarity.writeIvfIndex]]/`appendIvfIndex`):
  * a stream of embedding rows keeps a probeable index current without
  * ever rebuilding it. Batch 0 trains the coarse quantizer (a fresh
  * stream pointed at an existing store retrains and overwrites it); if
  * leading batches are empty they no-op and the first NON-EMPTY batch
  * trains instead. Every batch assigns against the then-frozen centroids
  * and lands its cells under a batch-id-keyed directory with overwrite
  * semantics — the [[CorpusIngest]] exactly-once recipe, so a
  * checkpoint-retried batch rewrites itself instead of duplicating
  * vectors. Probes ([[graft.ops.Similarity.probeIvfIndex]]) see every
  * completed batch and still prune unprobed cells at the scan.
  *
  * At 100 TB this is the production embedding-ingest loop: each round
  * touches |batch| vectors plus the (tiny, broadcast) centroid table; the
  * historical corpus is never rescanned. Re-training the quantizer when
  * the embedding distribution drifts (tracked by
  * [[graft.ops.Similarity.cellDrift]]) is a REBUILD by contract, exactly
  * as for the batch index.
  */
object AnnIngest {

  def ivfIngest(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      nCentroids: Int = 16,
      iters: Int = 3,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.ops.Similarity.ingestIvfBatch(
          batch.toDF(), path, batchId, nCentroids, iters, idCol, vecCol)
        ()
      }
      .start()

  /** The compressed-domain twin: same training contract (batch 0, or the
    * first non-empty batch when leading batches were empty, trains the PQ
    * codebook), later batches encode against it into batch-id-keyed code
    * directories — same exactly-once recipe, probed by
    * [[graft.ops.Similarity.probePqIndex]].
    */
  def pqIngest(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      m: Int = 4,
      ksub: Int = 8,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.ops.Similarity.ingestPqBatch(
          batch.toDF(), path, batchId, m, ksub, dim, idCol, vecCol)
        ()
      }
      .start()

  /** The COMPOSED face: batch 0 (or the first non-empty batch) trains the
    * coarse quantizer AND the PQ codebook; later batches assign + encode
    * against both, landing `centroid_id`-partitioned codes under
    * batch-id-keyed dirs — probed by
    * [[graft.ops.Similarity.probeIvfPqIndex]] with unprobed cells pruned
    * at the scan. Same exactly-once and retrain-replace contract as
    * [[ivfIngest]]/[[pqIngest]].
    */
  def ivfPqIngest(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      nCentroids: Int = 16,
      iters: Int = 3,
      m: Int = 4,
      ksub: Int = 8,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.ops.Similarity.ingestIvfPqBatch(
          batch.toDF(), path, batchId, nCentroids, iters, m, ksub, dim, idCol, vecCol)
        ()
      }
      .start()
}
