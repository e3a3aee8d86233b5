package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous materialized-rollup maintenance: per-key algebraic partials
  * appended per micro-batch ([[graft.ops.Rollup.ingestAggBatch]]), served
  * at any grouping level without re-reading the stream's history. The
  * aggregate complement of [[SketchIngest]]'s distinct/frequency/quantile
  * sketches under the same batch-id-keyed exactly-once store.
  */
object RollupIngest {

  def aggIngest(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      keyCols: Seq[String],
      valueCol: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.ops.Rollup.ingestAggBatch(batch.toDF(), path, batchId, keyCols, valueCol)
        ()
      }
      .start()
}
