package graft.io

import graft.schema.Schemas
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema-enforced readers and the date-partitioned writer for the raw
  * landing zone — the engine side of the reference's S3 layout
  * `{deployment_id}/{YYYYMMDD}/{file_type}.json` (K1, `export.py:89-108`).
  *
  * Reads never infer schemas (stability under unknown passthrough fields —
  * SURVEY Q9); writes are partitioned by (deployment_id, ingest_date) with
  * dynamic partition overwrite, reproducing K1's deterministic-key
  * idempotency (W6: a same-day rerun overwrites that day's partition and
  * only that partition) — unlike the reference, failures raise instead of
  * being silently swallowed (Q3 is deliberately NOT replicated).
  */
object LandingZone {

  /** Read one landed document type across all deployments/days. The
    * partition columns materialize from the directory layout.
    */
  def read(spark: SparkSession, root: String, schema: StructType): DataFrame =
    spark.read
      .schema(
        schema
          .add("deployment_id", "string")
          .add("ingest_date", "string"))
      .option("basePath", root)
      .json(s"$root/deployment_id=*/ingest_date=*")

  def readScanRunDocs(spark: SparkSession, root: String): DataFrame =
    read(spark, root, Schemas.scanRunDoc)

  /** K1/W6/W7: land docs partitioned by (deployment_id, ingest_date),
    * overwriting only the partitions present in `docs` (dynamic mode).
    */
  def write(docs: DataFrame, root: String): Unit =
    docs.write
      .partitionBy("deployment_id", "ingest_date")
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
      .json(root)

  /** K3/Q10: folder/scan snapshots are written only when `newRuns` is
    * non-empty, unless `snapshotAlways` (the export_last_month behavior).
    */
  def writeSnapshots(
      snapshots: DataFrame,
      newRuns: DataFrame,
      root: String,
      snapshotAlways: Boolean): Boolean = {
    val doWrite = snapshotAlways || !newRuns.isEmpty
    if (doWrite) write(snapshots, root)
    doWrite
  }

  /** Stamp docs with today's landing partition (C5: yyyyMMdd compact day). */
  def stamped(docs: DataFrame, deploymentId: String): DataFrame =
    docs
      .withColumn("deployment_id", lit(deploymentId))
      .withColumn("ingest_date", date_format(current_date(), "yyyyMMdd"))
}
