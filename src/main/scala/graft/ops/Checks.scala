package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality audit aggregates — the pre-flight checks a pipeline runs
  * before trusting an ingest: key uniqueness, null rates, referential
  * integrity. Each check is a counting aggregate (one partial-then-final
  * shuffle, map-side combined) or an anti-join on uniform keys; results
  * are single-row summaries a scheduler can gate on.
  */
object Checks {

  /** One-row audit of `df`: row count, duplicate-key count (rows beyond
    * the first per key), and a null count per requested column.
    * `count distinct` expands to a two-phase partial aggregate, so a
    * high-cardinality key never funnels raw rows to one reducer.
    */
  def audit(df: DataFrame, keyCol: String, notNullCols: Seq[String]): DataFrame = {
    val nullCounts = notNullCols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"n_null_$c"))
    df.agg(
      count(lit(1)).cast("long").as("n_rows"),
      (sum(lit(1L)) - countDistinct(col(keyCol))).cast("long").as("n_dup_keys") +:
        nullCounts: _*)
  }

  /** Referential-integrity violation count: rows of `child` whose
    * `childKey` has no match in `parent.parentKey` (null keys count as
    * orphans — they reference nothing). Anti join on the key: the parent
    * side prunes to its key column, both sides shuffle uniformly.
    */
  def orphanCount(
      child: DataFrame,
      parent: DataFrame,
      childKey: String,
      parentKey: String): DataFrame =
    child
      .join(
        parent.select(col(parentKey).as(childKey)),
        Seq(childKey),
        "left_anti")
      .agg(count(lit(1)).cast("long").as("n_orphans"))
}
