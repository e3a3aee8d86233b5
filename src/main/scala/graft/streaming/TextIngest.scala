package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous lexical-index maintenance — the streaming face of the
  * persisted search store ([[graft.ops.TextAnalysis.writeTextIndex]] /
  * `searchTextIndex`): a stream of documents keeps a servable inverted
  * index current without ever re-tokenizing the corpus. Batch 0 claims
  * the root (a fresh stream pointed at an existing store retires it);
  * every later batch tokenizes ONLY its actually-new documents and lands
  * them under a batch-id-keyed generation with overwrite semantics — the
  * [[CorpusIngest]] exactly-once recipe, idempotence-based (postings are
  * per-document data, so no stamp is needed; the retried batch
  * recomputes its delta excluding its own generation and overwrites
  * itself). Probes ([[graft.ops.TextAnalysis.searchTextIndex]]) see
  * every completed generation and still prune unqueried token buckets at
  * the scan.
  *
  * At 100 TB this is the production document-ingest loop: each round
  * tokenizes |batch| documents; the historical corpus is never rescanned,
  * and the serving read stays |terms|-bucket-bounded regardless of how
  * many generations accumulated ([[graft.ops.TextAnalysis.compactTextIndex]]
  * folds them — safe mid-stream, the `batch_id=-1` rule).
  */
object TextIngest {

  def textIngest(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      textCol: String = "text",
      idCol: String = "doc_id"): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.ops.TextAnalysis.ingestTextBatch(batch.toDF(), path, batchId, textCol, idCol)
        ()
      }
      .start()
}
