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

  /** Two-sided CUSUM changepoint detection per key (Page 1954): over the
    * ordered count series, `S⁺ := max(0, S⁺ + r − k)` and
    * `S⁻ := min(0, S⁻ + r + k)` with residual `r = 1000·x − mean_milli`,
    * first alarm where S⁺ > h or S⁻ < −h — the sequential drift detector
    * that catches a sustained small shift the per-point k-sigma test
    * ([[countAnomalies]]) never sees. All integer milli (`mean_milli` is
    * the exact `1000·Σx div m`), so alarms are engine-portable. Emits ONE
    * summary row per key regardless of alarms: series length, mean, the
    * CUSUM extremes, and the first alarm's period/side (−1/0 when in
    * control) — monitoring dashboards want the margins, not just the
    * firings.
    *
    * Ties: rows sharing a (key, period) fold in (period, value) order —
    * the struct sort's full ordering — and any oracle mirror must ORDER BY
    * both; feed one row per (key, period) (the intended pre-aggregated
    * shape) to make the question moot.
    *
    * Scale shape: the recurrence is inherently sequential per key, so
    * each key's (already pre-aggregated — |periods| rows, not raw events)
    * series is folded in ONE `aggregate` lambda over its sorted
    * collect_list, O(|series|) with a constant-size accumulator (no
    * per-step array append); keys fold in parallel. This is the honest
    * shape for a recurrence: a window cannot express max(0, ·) folds, and
    * a driver loop would serialize keys.
    */
  def cusumChanges(
      counted: DataFrame,
      keyCol: String,
      tsCol: String,
      cntCol: String,
      kMilli: Long,
      hMilli: Long): DataFrame = {
    require(kMilli >= 0 && hMilli > 0, s"need kMilli >= 0 and hMilli > 0, got $kMilli/$hMilli")
    val grouped = counted
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).cast("long").as("m"),
        sum(col(cntCol)).cast("long").as("s"),
        array_sort(collect_list(struct(col(tsCol).cast("long").as("ts"), col(cntCol).cast("long").as("x"))))
          .as("series"))
      .withColumn("mean_milli", expr("(1000 * s) div m").cast("long"))
    val init = struct(
      lit(0L).as("sp"),
      lit(0L).as("sn"),
      lit(0L).as("max_sp"),
      lit(0L).as("min_sn"),
      lit(-1L).as("alarm_ts"),
      lit(0L).as("alarm_side"))
    val folded = aggregate(
      col("series"),
      init,
      (acc, e) => {
        val r = lit(1000L) * e.getField("x") - col("mean_milli")
        val sp = greatest(lit(0L), acc.getField("sp") + r - lit(kMilli))
        val sn = least(lit(0L), acc.getField("sn") + r + lit(kMilli))
        val firing = acc.getField("alarm_side") === 0L &&
          (sp > lit(hMilli) || sn < lit(-hMilli))
        struct(
          sp.as("sp"),
          sn.as("sn"),
          greatest(acc.getField("max_sp"), sp).as("max_sp"),
          least(acc.getField("min_sn"), sn).as("min_sn"),
          when(firing, e.getField("ts")).otherwise(acc.getField("alarm_ts")).as("alarm_ts"),
          when(firing, when(sp > lit(hMilli), 1L).otherwise(-1L))
            .otherwise(acc.getField("alarm_side"))
            .as("alarm_side"))
      })
    grouped
      .withColumn("f", folded)
      .select(
        col(keyCol),
        col("m"),
        col("mean_milli"),
        col("f.max_sp").as("max_s_pos"),
        col("f.min_sn").as("min_s_neg"),
        col("f.alarm_ts").as("alarm_ts"),
        col("f.alarm_side").as("alarm_side"))
  }

  /** Per-key exponential smoothing (EWMA) over an ordered series — the
    * trend-following smoother between [[countAnomalies]]' fixed window
    * and [[cusumChanges]]' drift alarm: `s_t = (α·x_t + (1000−α)·s_{t−1})
    * div 1000` in integer milli with `s_0 = x_0`, α per-mille. The trunc
    * division each step makes the recurrence engine-portable (DuckDB's
    * `//` folds to the same bits), unlike the float EWMA every
    * monitoring stack hand-waves. Emits the SMOOTHED SERIES — one row
    * per input point `(key, ts, x_milli, ewma_milli)` — so callers flag
    * deviations with whatever band they trust downstream.
    *
    * Ties: rows sharing (key, ts) fold in (ts, value) order (the struct
    * sort's full ordering); feed one row per (key, period) — the
    * pre-aggregated shape — to make the question moot.
    *
    * Scale shape: like [[cusumChanges]], the recurrence is sequential
    * per key, so each key's pre-aggregated series folds in one
    * `aggregate` lambda over its sorted collect_list; the accumulator
    * carries the output array (|series| longs — bounded by periods per
    * key, NOT raw events), and keys fold in parallel. A window cannot
    * express the fold; a driver loop would serialize keys.
    */
  def ewmaSmooth(
      counted: DataFrame,
      keyCol: String,
      tsCol: String,
      valCol: String,
      alphaMilli: Long = 300L): DataFrame = {
    require(
      alphaMilli > 0 && alphaMilli <= 1000,
      s"alphaMilli must be in (0, 1000], got $alphaMilli")
    val grouped = counted
      .filter(col(valCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(
        array_sort(
          collect_list(struct(
            col(tsCol).cast("long").as("ts"),
            round(col(valCol).cast("double") * 1000, 0).cast("long").as("xm"))))
          .as("series"))
    // the recurrence needs SQL `div` (trunc integer division — Column has
    // no integral divide), so the whole fold is one expr lambda; the next
    // state is recomputed for both fields, safe under any binding order
    val step =
      s"CASE WHEN size(acc.out) = 0 THEN e.xm " +
        s"ELSE (${alphaMilli}L * e.xm + ${1000L - alphaMilli}L * acc.s) div 1000L END"
    grouped
      .withColumn(
        "out",
        expr(
          s"""aggregate(
             |  series,
             |  named_struct('s', CAST(0 AS BIGINT), 'out', CAST(array() AS ARRAY<BIGINT>)),
             |  (acc, e) -> named_struct('s', $step, 'out', concat(acc.out, array($step))),
             |  acc -> acc.out)""".stripMargin))
      .select(col(keyCol), posexplode_outer(arrays_zip(col("series"), col("out"))).as(Seq("i", "z")))
      .filter(col("z").isNotNull)
      .select(
        col(keyCol),
        col("z.series.ts").as("ts"),
        col("z.series.xm").as("x_milli"),
        col("z.out").as("ewma_milli"))
  }

  /** Classical seasonal decomposition (the moving-average STL-lite every
    * capacity dashboard starts from): `value = trend + seasonal +
    * residual`, all integer-milli so the decomposition is
    * oracle-hashable. Input is the PRE-AGGREGATED series — one row per
    * (key, consecutive period index) — with `seasonLen` periods per cycle
    * (24 for hour-of-day over hourly counts, 7 for day-of-week over
    * daily). Stages: trend = centered moving average — the classical
    * frames: `seasonLen + 1` rows for EVEN season lengths (the 2×MA
    * shape) and a symmetric `seasonLen`-row frame (−half..+half) for ODD
    * ones (integral `1000·Σ div cnt`; null until the full window
    * exists — edges are honestly unknown, not zero-padded); seasonal
    * index per
    * (key, period mod seasonLen) = integral mean of the detrended values
    * over COMPLETE observations (the same trunc-toward-zero `div` both
    * engines share, so negative deviations mirror exactly); residual =
    * the leftover. A season index is null when no complete observation
    * covered that phase.
    *
    * Scale shape: both windows and the season aggregate run on the
    * (key, period) AGGREGATE — |keys|·|periods| rows, orders below the
    * fact table, the [[graft.ops.Rollup.periodOverPeriod]] contract;
    * feed gap-filled periods (the `gen_gap_fill` move) so row-frame
    * windows see calendar-true neighbors.
    */
  def seasonalDecompose(
      counted: DataFrame,
      keyCol: String,
      periodCol: String,
      valCol: String,
      seasonLen: Int = 24): DataFrame = {
    require(seasonLen >= 2 && seasonLen <= 1000, s"seasonLen must be in [2, 1000], got $seasonLen")
    val half = seasonLen / 2
    // even L: -half..+half (L+1 rows, the classical 2xMA span); odd L:
    // the symmetric L-point MA -half..+half (L rows) — never forward-biased
    val hi = if (seasonLen % 2 == 0) seasonLen - half else half
    val frameLen = (half + hi + 1).toLong
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol)
      .orderBy("p")
      .rowsBetween(-half, hi)
    val base = counted
      .filter(col(valCol).isNotNull)
      .select(
        col(keyCol),
        col(periodCol).cast("long").as("p"),
        round(col(valCol).cast("double") * 1000, 0).cast("long").as("x_milli"))
    val trended = base
      .withColumn("__cnt", count(lit(1)).over(w))
      .withColumn("__sum", sum("x_milli").over(w))
      .withColumn(
        "trend_milli",
        when(col("__cnt") === frameLen, expr("__sum div __cnt")))
      .drop("__cnt", "__sum")
    val season = trended
      .filter(col("trend_milli").isNotNull)
      .groupBy(col(keyCol).as("__k"), (col("p") % seasonLen).as("__phase"))
      .agg(expr("sum(x_milli - trend_milli) div count(1)").cast("long").as("seasonal_milli"))
    trended
      .join(
        season,
        col(keyCol) === col("__k") && (col("p") % seasonLen) === col("__phase"),
        "left")
      .select(
        col(keyCol),
        col("p"),
        col("x_milli"),
        col("trend_milli"),
        col("seasonal_milli"),
        (col("x_milli") - col("trend_milli") - col("seasonal_milli")).as("residual_milli"))
  }

  /** AUTO-tuned seasonal decomposition — the composition
    * [[graft.ops.Stats.autocorrMilli]]'s scaladoc promises: detect the
    * season length from the ACF peak, then [[seasonalDecompose]] with it,
    * so nobody hand-wires the two. Detection: per-lag score = the
    * integer mean across keys of `round(acf_r · 10⁶)` (acf_r is a
    * round-6 double, so the micro conversion is exact in any engine and
    * the mean is trunc-div integer — no order-dependent float
    * accumulation in the DECISION), restricted to lags ≥ 2 (lag 1 is
    * trend autocorrelation, not a season); the peak lag wins (smaller
    * lag on ties), and when no peak clears `minAcfMilli` the caller's
    * `fallbackSeasonLen` is used — a flat series is decomposed under an
    * explicit default, never under a noise-picked period. Output is
    * [[seasonalDecompose]]'s shape plus the decided `season_len`, so the
    * decision itself is part of the hash-checked result.
    *
    * Scale shape: one [[graft.ops.Stats.autocorrMilli]] pass
    * (series-grain window + one aggregate) folded to ≤ maxLag rows and a
    * 1-row bounded collect for the decision; the decomposition itself is
    * unchanged.
    */
  def seasonalAuto(
      counted: DataFrame,
      keyCol: String,
      periodCol: String,
      valCol: String,
      maxLag: Int = 36,
      minAcfMilli: Long = 300L,
      fallbackSeasonLen: Int = 24): DataFrame = {
    require(maxLag >= 2, s"maxLag must be >= 2 to contain any season, got $maxLag")
    require(
      minAcfMilli >= 0L && minAcfMilli <= 1000L,
      s"minAcfMilli is an ACF level in [0, 1000] milli, got $minAcfMilli")
    // the series feeds TWO full passes (the ACF decision and the
    // decomposition): materialize its lineage once — it is (key, period)
    // grain, so the checkpoint is orders below the fact table
    val series = counted.localCheckpoint()
    val acf = graft.ops.Stats.autocorrMilli(series, keyCol, periodCol, valCol, maxLag)
    val scored = acf
      .filter(col("lag") >= 2 && col("acf_r").isNotNull)
      .select(col("lag"), round(col("acf_r") * 1000000, 0).cast("long").as("am"))
      .groupBy("lag")
      .agg(expr("sum(am) div count(1)").cast("long").as("score_micro"))
    // bounded <= maxLag rows: the decision is a 1-row collect, never data
    val top = scored.orderBy(col("score_micro").desc, col("lag").asc).limit(1).collect()
    val detected =
      if (top.nonEmpty && top(0).getLong(1) > minAcfMilli * 1000L) top(0).getLong(0).toInt
      else fallbackSeasonLen
    seasonalDecompose(series, keyCol, periodCol, valCol, detected)
      .withColumn("season_len", lit(detected.toLong))
  }

  /** Seasonal-adjusted anomaly flags — the composition a raw-count
    * monitor gets wrong twice: [[countAnomalies]]' trailing sigma fires
    * on every daily peak (seasonality IS deviation to a flat baseline),
    * and a mean/sigma test is skewed by the very outliers it hunts.
    * This runs [[seasonalDecompose]] first (trend + seasonal removed),
    * then [[graft.ops.Stats.madOutliers]] per key on the RESIDUALS —
    * median/MAD, so a fat-fingered 100× hour can't hide itself by
    * inflating the threshold. Edge periods with no defined trend (the
    * centered-MA window) carry no residual and are excluded — honest
    * "not scoreable", not silent normals. Output one row per scoreable
    * (key, period): `(key, p, residual_milli, med_milli, mad_milli,
    * outlier)`.
    *
    * Scale shape: [[seasonalDecompose]]'s series-grain window + phase
    * aggregate, then [[graft.ops.Stats.madOutliers]]' histogram-compact
    * exact medians over the same series grain — nothing touches raw
    * events beyond the caller's counting aggregate.
    */
  def seasonalOutliers(
      counted: DataFrame,
      keyCol: String,
      periodCol: String,
      valCol: String,
      seasonLen: Int = 24,
      kMilli: Long = 3000L): DataFrame = {
    val res = seasonalDecompose(counted, keyCol, periodCol, valCol, seasonLen)
      .filter(col("residual_milli").isNotNull)
      // madOutliers re-millis its value column; feeding residual/1000
      // makes its x_milli EXACTLY the residual (|res| ≪ 2^52, so the
      // double round-trip is lossless)
      .select(
        col(keyCol),
        col("p"),
        (col("residual_milli").cast("double") / 1000.0).as("__res"))
    Stats.madOutliers(res, keyCol, "__res", idCol = "p", kMilli = kMilli)
      .select(
        col(keyCol),
        col("p"),
        col("x_milli").as("residual_milli"),
        col("med_milli"),
        col("mad_milli"),
        col("outlier"))
  }
}
