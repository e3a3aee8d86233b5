package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence (funnel) analysis: how many users completed step 1,
  * then step 2 strictly after it, then step 3 after that, ... — the
  * canonical product-analytics question no single SQL aggregate answers,
  * because each step's qualifying time depends on the previous step's.
  *
  * Execution shape: one pass over the (step-filtered) events per step.
  * Step i's table is the per-user FIRST completion time — |users| rows,
  * `localCheckpoint`ed both because step i+1 joins it and the final
  * count union reads every step table (multi-consumer), and because the
  * join chain would otherwise re-evaluate all previous steps per step.
  * The per-step join is an equi-join on the user key (uniform); the
  * events table is never shuffled — each pass filters map-side to one
  * step type and aggregates by user.
  *
  * Greedy first-completion semantics (earliest qualifying time per
  * step) — the standard funnel definition; it maximizes completion
  * counts for strictly-increasing time chains.
  */
object Funnel {

  /** Per-step completion counts: (step_idx, step, n_users), one row per
    * step, n_users non-increasing.
    */
  def stages(
      events: DataFrame,
      steps: Seq[String],
      userCol: String = "user_id",
      tsCol: String = "ts_us",
      typeCol: String = "event_type",
      maxGapUs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val stepTables = perStepFirsts(events, steps, userCol, tsCol, typeCol, maxGapUs)
    stepTables.zipWithIndex
      .map { case (t, i) =>
        t.agg(count(lit(1)).cast("long").as("n_users"))
          .select(
            lit(i + 1).cast("int").as("step_idx"),
            lit(steps(i)).as("step"),
            col("n_users"))
      }
      .reduce(_.unionAll(_))
  }

  /** Step i's per-user first qualifying completion time (`userCol`, `t`)
    * under the greedy sequential semantics — the kernel [[stages]] counts
    * and [[conversionLags]] differences.
    */
  private def perStepFirsts(
      events: DataFrame,
      steps: Seq[String],
      userCol: String,
      tsCol: String,
      typeCol: String,
      maxGapUs: Option[Long]): Seq[DataFrame] =
    steps.scanLeft(Option.empty[DataFrame]) {
      case (prev, step) =>
        val hits = events.filter(col(typeCol) === step)
        val qualified = prev match {
          case None => hits
          case Some(p) =>
            // maxGapUs = the conversion-window variant: the next step must
            // land within the gap of the previous step's completion, or
            // the user churns out (the product-analytics default; None
            // keeps the unbounded ordered-sequence semantics)
            val after = hits
              .join(p.select(col(userCol), col("t").as("t_prev")), Seq(userCol))
              .filter(col(tsCol) > col("t_prev"))
            maxGapUs.fold(after)(g => after.filter(col(tsCol) <= col("t_prev") + g))
        }
        Some(
          qualified
            .groupBy(col(userCol))
            .agg(min(col(tsCol)).as("t"))
            .localCheckpoint())
    }.flatten

  /** Time-to-convert per funnel edge — the "how long does the funnel
    * take" half [[stages]]' counts leave open: for each consecutive step
    * pair, every converting user's lag between first completions, under
    * the SAME greedy sequential semantics (so `n` per edge equals
    * [[stages]]' step count of the TO step). Returns one row per
    * (edge, user): `step_idx` (1-based TO step), `edge` ("a>b"), the
    * user, and `lag_us` — feed it to [[graft.ops.Stats.quantilesByGroup]]
    * for the p50/p90 dashboard row, or aggregate conversion counts by
    * edge directly.
    *
    * Scale shape: the per-step tables are |users| rows each (the
    * [[stages]] contract — events filter map-side per step); each edge is
    * one equi-join of two user-keyed tables.
    */
  def conversionLags(
      events: DataFrame,
      steps: Seq[String],
      userCol: String = "user_id",
      tsCol: String = "ts_us",
      typeCol: String = "event_type",
      maxGapUs: Option[Long] = None): DataFrame = {
    require(steps.size >= 2, "conversion lags need at least two steps")
    val stepTables = perStepFirsts(events, steps, userCol, tsCol, typeCol, maxGapUs)
    stepTables
      .sliding(2)
      .toSeq
      .zipWithIndex
      .map { case (Seq(a, b), i) =>
        a.select(col(userCol), col("t").as("t_from"))
          .join(b.select(col(userCol), col("t").as("t_to")), Seq(userCol))
          .select(
            lit(i + 2).cast("int").as("step_idx"),
            lit(s"${steps(i)}>${steps(i + 1)}").as("edge"),
            col(userCol),
            (col("t_to") - col("t_from")).cast("long").as("lag_us"))
      }
      .reduce(_.unionAll(_))
  }

  /** Cohort retention matrix — the other canonical product-analytics
    * question: users grouped by first-activity period (week by default),
    * and for each offset k, how many of the cohort were active k periods
    * later. Input needs (user_id, secs) columns; output one row per
    * (cohort, k <= maxK) with the distinct-user count.
    *
    * Execution shape: the raw event stream collapses FIRST to distinct
    * (user, period) — each user contributes at most one row per period
    * regardless of event volume, which is what bounds the rest of the
    * plan at 100 TB of events. Cohorts are a min-aggregation over that
    * compact table; the join back is an equi-join on the uniform user
    * key; the final count distinct partial-aggregates per (cohort, k).
    */
  def retention(
      ev: DataFrame,
      periodSecs: Long = 604800L,
      maxK: Int = 4): DataFrame = {
    val uw = ev
      .select(col("user_id"), expr(s"secs div $periodSecs").cast("long").as("period"))
      .distinct()
    val cohorts = uw.groupBy("user_id").agg(min("period").as("cohort"))
    uw.join(cohorts, Seq("user_id"))
      .select(
        col("cohort"),
        (col("period") - col("cohort")).cast("long").as("k"),
        col("user_id"))
      .filter(col("k") <= maxK)
      .groupBy("cohort", "k")
      .agg(countDistinct("user_id").cast("long").as("n_users"))
  }

  /** Top user-journey paths: each user's first `maxSteps` event types in
    * time order collapsed to one `a>b>c` path string, counted across
    * users, top `k` — the "what do people actually do" complement of
    * [[transitions]]' one-step matrix (a path is a whole Markov walk).
    *
    * Scale shape: one per-user aggregate (collect_list is bounded by the
    * user's OWN event count; array_sort + slice truncate to `maxSteps`
    * before the path string exists), one map-side-combinable path count,
    * and the final sort+limit runs over that AGGREGATE — at most
    * `|types|^maxSteps` distinct paths, never the events table.
    * A user with millions of events does make one big array here; feed
    * pre-truncated events (e.g. a per-user row_number filter) if the
    * fixture's per-user volumes aren't already bounded.
    */
  def topPaths(
      events: DataFrame,
      maxSteps: Int = 8,
      k: Int = 20,
      userCol: String = "user_id",
      tsCol: String = "ts_us",
      ordCol: String = "event_id",
      typeCol: String = "event_type"): DataFrame = {
    require(maxSteps >= 1 && k >= 1, s"need maxSteps/k >= 1, got $maxSteps/$k")
    events
      .filter(col(userCol).isNotNull)
      .groupBy(col(userCol))
      .agg(
        array_sort(collect_list(struct(col(tsCol), col(ordCol), col(typeCol).as("t"))))
          .as("seq"))
      .select(
        concat_ws(">", slice(transform(col("seq"), s => s.getField("t")), 1, maxSteps))
          .as("path"))
      .groupBy("path")
      .agg(count(lit(1)).cast("long").as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(k)
  }

  /** First-order transition matrix over per-user event sequences: for each
    * ordered pair of event types, how often type B immediately follows
    * type A in some user's timeline, with the integer-milli row-normalized
    * probability `p_milli = n · 1000 div n_from` — the Markov-chain view
    * of user behavior (next-step prediction, path anomaly detection,
    * session modeling).
    *
    * Null user rows are dropped: a transition is only defined within one
    * user's ordered timeline (and a NULL key would pile every keyless row
    * into a single window partition — the null-semantics trap
    * [[Relational]] documents). Scale shape: one per-user window (lag 1,
    * deterministic `ordCol` tiebreak — uniform keys), then two tiny
    * aggregations over the ≤ |types|² transition table; the normalizing
    * join is |types|-row broadcast-sized.
    */
  def transitions(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts_us",
      ordCol: String = "event_id",
      typeCol: String = "event_type"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(ordCol))
    val steps = events
      .filter(col(userCol).isNotNull)
      .select(col(userCol), col(tsCol), col(ordCol), col(typeCol).as("to_type"))
      .withColumn("from_type", lag(col("to_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
    // the transition table feeds two consumers (itself + the normalizer):
    // materialize the ≤ |types|²-row aggregate once so the window pass
    // doesn't re-run per consumer
    val n = steps
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).cast("long").as("n"))
      .localCheckpoint()
    val tot = n.groupBy("from_type").agg(sum("n").cast("long").as("n_from"))
    n.join(broadcast(tot), Seq("from_type"))
      .withColumn("p_milli", expr("n * 1000 div n_from").cast("long"))
  }

  /** Marketing ATTRIBUTION — for every conversion, which touch gets the
    * credit: the LAST touch (the closer) and the FIRST touch (the opener)
    * within `windowUs` before (inclusive of) the conversion instant, per
    * user. One row per distinct (user, conversion ts) with both
    * attributions — type and its timestamp — null when no touch landed in
    * the window ("organic", honestly distinguishable from attributed).
    * Determinism under ties: touches collapse to ONE row per (user, ts)
    * first (max type string on a same-instant tie), so the range-frame
    * `last`/`first` never depends on intra-tie row order; a touch at
    * EXACTLY the conversion's timestamp is in the window (inclusive
    * frame), the standard same-session convention.
    *
    * Scale shape: one per-user range-framed window over the touch+conv
    * rows (events already filtered to the named types), no self-join —
    * the windowed-aggregation shape every attribution query degenerates
    * to when written naively as a per-conversion subquery.
    */
  def attribution(
      events: DataFrame,
      touchTypes: Seq[String],
      convType: String,
      windowUs: Long,
      userCol: String = "user_id",
      tsCol: String = "ts_us",
      typeCol: String = "event_type"): DataFrame = {
    require(touchTypes.nonEmpty, "attribution needs at least one touch type")
    require(!touchTypes.contains(convType), s"conversion type $convType cannot also be a touch")
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    import org.apache.spark.sql.expressions.Window
    val base = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull && col(typeCol).isNotNull)
      .select(col(userCol).as("u"), col(tsCol).cast("long").as("ts"), col(typeCol).as("ty"))
    val touches = base
      .filter(col("ty").isin(touchTypes: _*))
      .groupBy("u", "ts")
      .agg(max("ty").as("touch"))
      .withColumn("__conv", lit(0L))
    val convs = base
      .filter(col("ty") === convType)
      .select("u", "ts")
      .distinct()
      .withColumn("touch", lit(null).cast("string"))
      .withColumn("__conv", lit(1L))
    val w = Window.partitionBy("u").orderBy("ts").rangeBetween(-windowUs, 0)
    val t = when(col("touch").isNotNull, struct(col("ts").as("t"), col("touch").as("ty")))
    touches
      .unionByName(convs)
      .withColumn("__lt", last(t, ignoreNulls = true).over(w))
      .withColumn("__ft", first(t, ignoreNulls = true).over(w))
      .filter(col("__conv") === 1L)
      .select(
        col("u").as(userCol),
        col("ts").as("conv_ts"),
        col("__lt.ty").as("last_touch_type"),
        col("__lt.t").as("last_touch_ts"),
        col("__ft.ty").as("first_touch_type"),
        col("__ft.t").as("first_touch_ts"))
  }

  /** MULTI-touch attribution with rank-linear recency decay — the credit
    * model between [[attribution]]'s two extremes (first/last give one
    * touch everything): every touch inside the lookback window shares
    * the conversion's credit, weighted by recency RANK — with m touches,
    * the most recent gets m shares, the oldest 1, so
    * `credit_ppm = 10⁶·2·(m − rank + 1) div (m·(m+1))` (shares sum to
    * m(m+1)/2 — exact integers, no float, no overflow however long the
    * window). One output row per (user, conversion, touch) with the
    * credit; summing credit_ppm per touch type is the channel report.
    * Same tie rule as [[attribution]]: same-timestamp touches collapse
    * to one row first (max type), so ranks are total. A conversion with
    * NO touch in the window emits nothing here — the untouched-conversion
    * share is [[attribution]]'s null-touch row.
    *
    * Scale shape: one user-keyed equi-join of collapsed touches to
    * conversions filtered to the window — candidate-bounded by the
    * OUTPUT grain (every surviving row is a reported credit), the
    * [[graft.ops.Dedup.blockingPairs]] argument — plus one window over
    * per-conversion touches.
    */
  def attributionCredit(
      events: DataFrame,
      touchTypes: Seq[String],
      convType: String,
      windowUs: Long,
      userCol: String = "user_id",
      tsCol: String = "ts_us",
      typeCol: String = "event_type"): DataFrame = {
    require(touchTypes.nonEmpty, "attributionCredit needs at least one touch type")
    require(!touchTypes.contains(convType), s"conversion type $convType cannot also be a touch")
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    import org.apache.spark.sql.expressions.Window
    val base = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull && col(typeCol).isNotNull)
      .select(col(userCol).as("u"), col(tsCol).cast("long").as("ts"), col(typeCol).as("ty"))
    val touches = base
      .filter(col("ty").isin(touchTypes: _*))
      .groupBy("u", "ts")
      .agg(max("ty").as("touch"))
    val convs = base
      .filter(col("ty") === convType)
      .select(col("u"), col("ts").as("conv_ts"))
      .distinct()
    val w = Window.partitionBy("u", "conv_ts")
    val wr = w.orderBy(col("ts").desc)
    touches
      .join(convs, Seq("u"))
      .filter(col("ts") >= col("conv_ts") - windowUs && col("ts") <= col("conv_ts"))
      .withColumn("m", count(lit(1)).over(w))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .select(
        col("u").as(userCol),
        col("conv_ts"),
        col("ts").as("touch_ts"),
        col("touch").as("touch_type"),
        col("rank"),
        expr("CAST((1000000 * 2 * (m - rank + 1)) div (m * (m + 1)) AS BIGINT)")
          .as("credit_ppm"))
  }

  /** Market-basket co-occurrence with lift — "users who touched A also
    * touched B": every unordered item pair's shared-user count and
    * `lift_milli = (1000·n_ab·N) div (n_a·n_b)` (>1000 = together more
    * than independence predicts; the association strength behind
    * recommendations and bundling). The universe is DISTINCT
    * (user, item) — volume never inflates affinity. Users with more
    * than `maxUserItems` distinct items are excluded from PAIRING and
    * from every count (the [[graft.ops.Graph.commonNeighborRecs]] hub
    * discipline: a do-everything account contributes Σdeg² pair rows
    * and no signal; the cap is echoed in the output so the exclusion
    * is auditable, and totals/N stay consistent with the capped
    * universe so lift remains a probability ratio). Pairs below
    * `minCount` shared users drop. Output: `(item_a, item_b, n_ab,
    * n_a, n_b, lift_milli, max_user_items)` with `item_a < item_b`.
    *
    * Scale shape: one distinct + per-user count + the user-keyed
    * self-join bounded by maxUserItems·|rows| pair rows
    * (map-side-combined per pair), item totals joined back, the
    * 1-row user total broadcast (the chiSquareDrift crossJoin
    * pattern).
    */
  def coOccurrence(
      events: DataFrame,
      userCol: String,
      itemCol: String,
      maxUserItems: Long = 64L,
      minCount: Long = 1L): DataFrame = {
    require(maxUserItems >= 2, s"maxUserItems must be >= 2, got $maxUserItems")
    val ui = events
      .filter(col(userCol).isNotNull && col(itemCol).isNotNull)
      .select(col(userCol).cast("long").as("u"), col(itemCol).cast("string").as("i"))
      .distinct()
    val kept = ui
      .join(
        ui.groupBy("u").agg(count(lit(1)).as("c")).filter(col("c") <= maxUserItems)
          .select("u"),
        Seq("u"),
        "left_semi")
      .localCheckpoint() // consumers: pair join both sides, totals, N
    val totals = kept.groupBy(col("i")).agg(count(lit(1)).cast("long").as("n_i"))
    val nUsers = kept.select(col("u")).distinct().agg(count(lit(1)).cast("long").as("nu"))
    kept.as("l")
      .join(kept.as("r"), col("l.u") === col("r.u") && col("l.i") < col("r.i"))
      .groupBy(col("l.i").as("item_a"), col("r.i").as("item_b"))
      .agg(count(lit(1)).cast("long").as("n_ab"))
      .filter(col("n_ab") >= minCount)
      .join(totals.select(col("i").as("item_a"), col("n_i").as("n_a")), Seq("item_a"))
      .join(totals.select(col("i").as("item_b"), col("n_i").as("n_b")), Seq("item_b"))
      .crossJoin(broadcast(nUsers))
      .select(
        col("item_a"),
        col("item_b"),
        col("n_ab"),
        col("n_a"),
        col("n_b"),
        // widened through decimal(38,0) (the chiSquareDrift rule): the
        // raw BIGINT product 1000·n_ab·nu wraps silently past ~10⁷
        // distinct users on a hot pair
        expr("CAST((1000 * CAST(n_ab AS DECIMAL(38,0)) * nu) div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)")
          .as("lift_milli"),
        lit(maxUserItems).as("max_user_items"))
  }
}
