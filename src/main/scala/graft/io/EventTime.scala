package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Physical-encoding-tolerant event-time normalization.
  *
  * Upstream producers change timestamp precision and encoding without
  * notice: the events fixture has shipped both as INT64 nanoseconds
  * (surfaced as a plain `LongType` under
  * `spark.sql.legacy.parquet.nanosAsLong`, build.sbt) and as
  * TIMESTAMP(MICROS) (pandas-written footers, surfaced as
  * `TIMESTAMP_NTZ`). An engine aimed at 100 TB cannot hard-assume one
  * physical encoding — so every events reader derives its time columns
  * through this one normalizer, which branches on the OBSERVED schema
  * instead.
  *
  * All derivations are integer epoch arithmetic (micros → seconds), so
  * downstream query semantics are encoding-independent. NTZ wall-clocks
  * cast through the session timezone, which the engine pins to UTC
  * (build.sbt:28 and every SparkSession builder) — making
  * `unix_micros(cast(ts as timestamp))` equal to the DuckDB oracle's
  * `epoch_us(ts)` on the same file.
  */
object EventTime {

  /** `c` (physical type `dt`) as integer microseconds since the epoch. */
  def usExpr(c: Column, dt: DataType): Column = dt match {
    // legacy fixture: INT64 nanos read as a plain long
    case LongType => call_function("div", c, lit(1000L))
    // TIMESTAMP / TIMESTAMP_NTZ(micros): NTZ casts through the session
    // timezone (pinned UTC), so unix_micros sees the instant DuckDB's
    // epoch_us(ts) computes
    case TimestampType | TimestampNTZType => unix_micros(c.cast(TimestampType))
    case other =>
      throw new IllegalArgumentException(
        s"unsupported event-time physical type $other " +
          "(expected LONG nanos, TIMESTAMP or TIMESTAMP_NTZ)")
  }

  /** [[usExpr]] floored to integer epoch seconds. */
  def secsExpr(c: Column, dt: DataType): Column =
    call_function("div", usExpr(c, dt), lit(1000000L))

  /** [[secsExpr]] as a second-truncated `TimestampType` column (the input
    * shape for `window`/`session_window` aggregations).
    */
  def tExpr(c: Column, dt: DataType): Column = timestamp_seconds(secsExpr(c, dt))

  /** `df`'s `ts` as epoch microseconds (LongType). */
  def tsUs(df: DataFrame, tsCol: String = "ts"): Column =
    usExpr(df(tsCol), df.schema(tsCol).dataType)

  /** `df`'s `ts` as epoch seconds (LongType, floored). */
  def tsSecs(df: DataFrame, tsCol: String = "ts"): Column =
    secsExpr(df(tsCol), df.schema(tsCol).dataType)

  /** `df`'s `ts` as a second-truncated TimestampType column. */
  def tsTimestamp(df: DataFrame, tsCol: String = "ts"): Column =
    tExpr(df(tsCol), df.schema(tsCol).dataType)
}
