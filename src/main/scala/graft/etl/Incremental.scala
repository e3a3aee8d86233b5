package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Watermark-driven incremental ingestion semantics (SURVEY §2.9).
  *
  * The reference discovers its watermark by listing S3 keys shaped
  * `{deployment_id}/{YYYYMMDD}/{file_type}.json` and taking the max valid
  * date segment, defaulting to 1970-01-01 on an empty bucket
  * (`export.py:75-87`); new runs are `status == 'completed' AND
  * date(last_modification_date) >= watermark` (`export.py:235`) — the `>=`
  * re-ingests the watermark day, so duplicates across partitions are
  * by-design and dedup is the engine's job (W4).
  */
object Incremental {

  /** S8/A2/F8/C2-C4/C12: per-deployment watermark from landed keys.
    * Segment 2 must be exactly 8 digits to count (`export.py:82-85`);
    * deployments with no valid date partition default to 1970-01-01.
    * One hash aggregation — scales to any number of keys/deployments.
    */
  def watermarks(keys: DataFrame, keyCol: String = "key"): DataFrame = {
    val parts = split(col(keyCol), "/")
    val seg = parts.getItem(1)
    val valid = seg.rlike("^[0-9]{8}$")
    keys
      .select(
        parts.getItem(0).as("deployment"),
        // when-guard keeps ANSI to_date from throwing on malformed segments
        when(valid, to_date(seg, "yyyyMMdd")).as("part_date"))
      .groupBy("deployment")
      .agg(coalesce(max(col("part_date")), to_date(lit("1970-01-01"))).as("watermark"))
  }

  /** F1/W5: completed-run + watermark filter. `lastModified` is epoch
    * seconds; comparison is at DATE granularity with `>=` (late-data
    * re-ingest, W4).
    */
  def newCompletedRuns(
      history: DataFrame,
      watermark: Column,
      statusCol: String = "status",
      lastModifiedCol: String = "last_modification_date"): DataFrame =
    history.filter(
      col(statusCol) === "completed" &&
        to_date(timestamp_seconds(col(lastModifiedCol))) >= watermark)

  /** W4: keep exactly one row per natural key — the first under `order`
    * (pass descending columns to keep the latest). One window shuffle on the
    * key columns; skew-safe for high-cardinality keys.
    */
  def dedupLatest(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    df.withColumn(
        "_rn",
        row_number().over(Window.partitionBy(keys.map(col): _*).orderBy(order: _*)))
      .filter(col("_rn") === 1)
      .drop("_rn")
}
