package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for scan pruning: Z-order clustering.
  *
  * Parquet (and every engine reading it) skips row groups / files whose
  * column min/max statistics exclude a filter — but statistics only help
  * if the writer CLUSTERED the data. Sorting by one column gives perfect
  * pruning on that column and none on the others; interleaving the bits
  * of several columns' bucket ranks (the Z-order curve) gives each
  * clustered column locality proportional to its share of the bits, so a
  * selective filter on ANY of them prunes most files. This is the same
  * construction Delta/Iceberg `OPTIMIZE ZORDER BY` applies; here it is a
  * plain column expression + `repartitionByRange` so it works on vanilla
  * parquet.
  *
  * Mechanics: each clustered column is bucketized into `2^bitsPerCol`
  * rank buckets by approximate quantiles (a driver-sized array of
  * boundaries — the sketch pass never shuffles the data), the bucket ids
  * are bit-interleaved into the z-value, and the frame is range-written
  * so each output file covers a compact z-range. Everything after the
  * quantile sketch is stateless per-row arithmetic.
  */
object Layout {

  /** Bucket id (0..nBuckets-1) of `c` given ascending split points.
    * Public alongside [[interleaveBits]] so callers can pin FIXED split
    * points (engine-portable, oracle-mirrorable) where [[zValue]]'s
    * sketch-derived boundaries are engine-private.
    */
  def bucketOf(c: Column, splits: Array[Double]): Column =
    splits.zipWithIndex.foldLeft(lit(0)) {
      case (acc, (s, i)) => when(c.cast("double") >= s, lit(i + 1)).otherwise(acc)
    }

  /** Bit-interleave of per-column bucket ids: bit j of column i lands at
    * position `j * nCols + i` — the Z-order (Morton) index as a long
    * column expression (pure integer shifts/masks, codegen-friendly).
    */
  def interleaveBits(bucketCols: Seq[Column], bitsPerCol: Int): Column = {
    val nCols = bucketCols.length
    val terms = for {
      (c, i) <- bucketCols.zipWithIndex
      j <- 0 until bitsPerCol
    } yield shiftleft(shiftright(c.cast("long"), j).bitwiseAND(lit(1L)), j * nCols + i)
    terms.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Clustering-quality audit for a FIXED-grid z-order layout: per z-value
    * cell, the row count and each clustered column's min/max — exactly the
    * per-file statistics a scan's predicate pushdown prunes on, so this
    * table IS the answer to "how much would a selective filter skip after
    * OPTIMIZE ZORDER". Compact rectangles (tight min/max per cell) =
    * effective skipping; a cell spanning a column's whole range = that
    * column wasn't really clustered. Fixed split points keep the whole
    * audit integer/comparison arithmetic — engine-portable where
    * [[zValue]]'s quantile sketch is engine-private.
    *
    * Scale shape: stateless per-row bucket math + ONE map-side-combinable
    * aggregate over at most `(2^bitsPerCol)^|cols|` cells.
    */
  def zBucketStats(
      df: DataFrame,
      cols: Seq[(String, Array[Double])],
      bitsPerCol: Int = 2): DataFrame = {
    require(cols.nonEmpty, "need at least one clustered column")
    cols.foreach { case (c, s) =>
      require(
        s.length == (1 << bitsPerCol) - 1,
        s"column $c needs ${(1 << bitsPerCol) - 1} split points for $bitsPerCol bits, got ${s.length}")
    }
    val z = interleaveBits(cols.map { case (c, s) => bucketOf(col(c), s) }, bitsPerCol)
    val statCols = cols.flatMap { case (c, _) =>
      Seq(
        min(col(c).cast("double")).as(s"min_$c"),
        max(col(c).cast("double")).as(s"max_$c"))
    }
    df.withColumn("zkey", z.cast("long"))
      .groupBy("zkey")
      .agg(count(lit(1)).cast("long").as("n"), statCols: _*)
  }

  /** The z-value column for `df` over `cols`, bucket boundaries from an
    * approximate-quantile sketch (`relErr` rank error is fine: boundaries
    * only steer locality, never correctness).
    */
  def zValue(
      df: DataFrame,
      cols: Seq[String],
      bitsPerCol: Int = 4,
      relErr: Double = 0.01): Column = {
    require(cols.nonEmpty, "z-order needs at least one column")
    val nBuckets = 1 << bitsPerCol
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val buckets = cols.map { c =>
      val splits = df.stat.approxQuantile(c, probs, relErr).distinct.sorted
      bucketOf(col(c), splits)
    }
    interleaveBits(buckets, bitsPerCol)
  }

  /** Write `df` as parquet clustered on the Z-order curve over `cols`,
    * `targetFiles` output files each covering a compact z-range. After
    * this, a selective filter on any clustered column skips most files on
    * min/max statistics alone.
    */
  def zOrderWrite(
      df: DataFrame,
      cols: Seq[String],
      path: String,
      targetFiles: Int = 32,
      bitsPerCol: Int = 4): Unit =
    df.withColumn("__z", zValue(df, cols, bitsPerCol))
      .repartitionByRange(targetFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write
      .mode("overwrite")
      .parquet(path)

  /** Bucketed (hash-clustered) warehouse write: the table is written in
    * `nBuckets` hash buckets of `key`, sorted by `key` within each bucket.
    * Two tables bucketed the same way join/aggregate on that key with NO
    * exchange — the bucket layout IS the shuffle, paid once at write time
    * and amortized over every subsequent join (asserted shuffle-free in
    * LayoutSpec). This is the co-location story for the warehouse's
    * fact-fact joins (e.g. `host_vuln` ⋈ `vuln_output` on the vuln key)
    * where neither side broadcasts; bucket metadata lives in the catalog,
    * hence `saveAsTable`.
    *
    * Pick `nBuckets` so a bucket of the LARGER table fits an executor
    * core's working set at target scale; both join sides must use the
    * same `nBuckets` and key for the exchange-free plan.
    */
  def bucketedWrite(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
