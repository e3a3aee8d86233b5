package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous sketch maintenance: bounded-state distinct-count rollups
  * over an unbounded stream, without ever re-reading raw data.
  */
object SketchIngest {

  /** Streaming face of the KMV distinct-count sketch
    * ([[graft.ops.Stats.kmvSketch]]): each micro-batch lands its own
    * ≤ k·|groups|-row sketch under a batch-id-keyed directory (the
    * [[CorpusIngest]] exactly-once recipe — a checkpoint-retried batch
    * overwrites itself), and the live estimate is
    * [[graft.ops.Stats.readKmvEstimate]]'s union + re-trim over the batch
    * sketches. Contrast with a stateful streaming `approx_count_distinct`:
    * the KMV store is engine-portable parquet, auditable after the fact,
    * and mergeable ACROSS streams (per-day or per-shard stores roll up by
    * the same union + re-trim).
    *
    * At 100 TB/day this is the shape that survives: per batch the only
    * shuffle is the batch's own distinct + per-map-task WindowGroupLimit
    * (≤ k rows per group per task), the history is never touched on
    * ingest, and the read side scans |batches|·k·|groups| sketch rows —
    * megabytes, not the corpus.
    */
  def kmvIngest(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      groupCol: String,
      valueCol: String,
      k: Int = 64): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.ops.Stats.ingestKmvBatch(batch.toDF(), path, batchId, groupCol, valueCol, k)
        ()
      }
      .start()

  /** Streaming face of the count-min frequency sketch
    * ([[graft.ops.Stats.cmsBuild]]): each micro-batch lands its own
    * ≤ depth·256-row counter table batch-id-keyed (retried batches
    * overwrite themselves), and the live estimate is
    * [[graft.ops.Stats.readCmsEstimate]]'s counter-sum rollup — by CMS
    * linearity exactly the one-pass whole-stream sketch. The frequency
    * complement of [[kmvIngest]] under the same store lifecycle: point
    * lookups for ANY value ever streamed, state ≤ depth·256 longs per
    * batch regardless of cardinality, stores mergeable across streams by
    * the same counter addition.
    */
  def cmsIngest(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      valueCol: String,
      depth: Int = 4): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.ops.Stats.ingestCmsBatch(batch.toDF(), path, batchId, valueCol, depth)
        ()
      }
      .start()

  /** Streaming face of the fixed-grid histogram sketch
    * ([[graft.ops.Stats.histSketch]]): each micro-batch lands its own
    * ≤ bins·|groups|-row bucket-count table batch-id-keyed (retried
    * batches overwrite themselves), and live quantiles are
    * [[graft.ops.Stats.readHistQuantiles]]'s counter-sum rollup — by
    * histogram linearity exactly the one-pass whole-stream sketch. The
    * quantile complement of [[kmvIngest]] (distinct) and [[cmsIngest]]
    * (frequency) under the same store lifecycle: engine-portable parquet
    * state, mergeable across streams by counter addition, deterministic
    * one-bucket-width error.
    */
  def histIngest(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      groupCol: String,
      valueCol: String,
      loMilli: Long = 0L,
      hiMilli: Long = 1024000L,
      bins: Int = 256): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.ops.Stats
          .ingestHistBatch(batch.toDF(), path, batchId, groupCol, valueCol, loMilli, hiMilli, bins)
        ()
      }
      .start()

  /** Streaming face of the deterministic HLL sketch
    * ([[graft.ops.Stats.hllSketch]]): each micro-batch lands its own
    * ≤ 256·|groups|-row register table batch-id-keyed (retried batches
    * overwrite themselves), and the live estimate is
    * [[graft.ops.Stats.readHllEstimate]]'s pointwise-MAX rollup — by
    * max-linearity exactly the one-pass whole-stream sketch. Fixed ~2 KB
    * of state per group per batch at any cardinality — the
    * cheapest-state member of the sketch family, still engine-portable
    * parquet and mergeable across streams.
    */
  def hllIngest(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      groupCol: String,
      valueCol: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.ops.Stats.ingestHllBatch(batch.toDF(), path, batchId, groupCol, valueCol)
        ()
      }
      .start()

  /** Streaming face of the per-class classification report
    * ([[graft.ops.Checks.classificationReport]]): each micro-batch lands
    * its own ≤ |classes|²-row confusion-cell table batch-id-keyed
    * (retried batches overwrite themselves), and
    * [[graft.ops.Checks.readClassificationReport]] folds the store to
    * the exact one-pass report — cells are plain-additive, so the
    * readback equals scoring all ingested rows at once regardless of
    * arrival order. The always-on model-quality dashboard: a drifting
    * classifier shows up in per-class recall without ever re-reading
    * scored history.
    */
  def confusionIngest(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      truthCol: String,
      predCol: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.ops.Checks.ingestConfusionBatch(batch.toDF(), path, batchId, truthCol, predCol)
        ()
      }
      .start()

  /** Streaming face of the EXACT since-launch distinct count
    * ([[graft.ops.Rollup.ingestCumulativeDistinctBatch]]): each
    * micro-batch lands only the ids the stream has never delivered before
    * (once, under their first batch — the first-seen trick as state), and
    * [[graft.ops.Rollup.readCumulativeDistinct]] serves "unique since
    * launch, by period" from the stored rows without ever
    * re-deduplicating history. State grows with |all-time distinct ids|
    * (plus a correction row per genuinely-late first arrival) — the
    * exact complement of [[hllIngest]]'s fixed-size approximate
    * registers; the readback equals the batch operator over everything
    * ingested regardless of arrival order (late earlier-period
    * recurrences land min-reconciling correction rows).
    */
  def cumulativeDistinctIngest(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      groupCol: String,
      periodCol: String,
      idCol: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.ops.Rollup
          .ingestCumulativeDistinctBatch(batch.toDF(), path, batchId, groupCol, periodCol, idCol)
        ()
      }
      .start()

}
