package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Count-series anomaly flags — "did this hour's event volume deviate
  * more than k sigmas from its trailing baseline" — with the decision
  * made in EXACT integer arithmetic.
  *
  * Over the trailing `trailing` windows per key (row-based frame; absent
  * periods simply don't contribute), let S = Σcount, Q = Σcount², m =
  * frame size. The k-sigma test `(x − S/m)² > k²·(mQ − S²)/m²` cross-
  * multiplies to `(m·x − S)² > k²·(m·Q − S²)` — pure int64 (counts up to
  * ~10⁶ with m=24 stay far from overflow), so the flag is deterministic
  * and engine-portable, unlike any stddev/sqrt formulation.
  *
  * Scale shape: the input is already a (key, period) aggregate —
  * |keys|·|periods| rows, orders of magnitude under the raw events — and
  * the trailing window partitions by key, so the heavy table only ever
  * moves through its initial counting aggregation.
  */
object Anomaly {

  /** Flags per (key, period): input must hold one row per key+period with
    * an integer count. Emits only rows with a full trailing baseline.
    */
  def countAnomalies(
      counted: DataFrame,
      keyCol: String,
      tsCol: String,
      cntCol: String,
      trailing: Int = 24,
      sigmas: Int = 3): DataFrame = {
    require(trailing > 1, s"trailing baseline needs >1 periods (got $trailing)")
    val w = Window
      .partitionBy(keyCol)
      .orderBy(tsCol)
      .rowsBetween(-trailing, -1)
    val x = col(cntCol)
    counted
      .withColumn("s", sum(x).over(w))
      .withColumn("q", sum(x * x).over(w))
      .withColumn("m", count(lit(1)).over(w))
      .filter(col("m") === trailing)
      .withColumn(
        "anomaly",
        when(
          (col("m") * x - col("s")) * (col("m") * x - col("s")) >
            lit(sigmas.toLong * sigmas) * (col("m") * col("q") - col("s") * col("s")),
          1L).otherwise(0L))
      .select(col(tsCol), col(keyCol), x, col("anomaly"))
  }
}
