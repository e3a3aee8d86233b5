package graft.queries

import graft.io.EventTime
import graft.ops.{Corpus, Relational, Rollup, Stats}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational-extension and corpus-statistics queries: as-of join, interval
  * range join, hopping-window aggregation, train/test contamination, exact
  * group quantiles. Each entry has a DuckDB oracle mirror; timestamps flow
  * as integer microseconds end-to-end ([[graft.io.EventTime]] on the Spark
  * side — tolerant of the fixture's physical encoding — `epoch_us(ts)` in
  * DuckDB), so no engine-specific timestamp semantics can leak into the
  * hash compare.
  */
object RelQueries {

  /** 30 minutes in microseconds: the incident window and hop width. */
  private val HalfHourUs = 1800000000L

  private def events(s: SparkSession, dir: String): DataFrame = {
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.select(
      col("event_id"),
      col("user_id"),
      EventTime.tsUs(raw).as("ts_us"),
      col("event_type"),
      col("value"))
  }

  /** events with `ts` normalized to a second-truncated timestamp `t`, plus
    * the listed columns — the input shape for window aggregations.
    */
  private def eventsT(s: SparkSession, dir: String, cols: String*): DataFrame = {
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.select(EventTime.tsTimestamp(raw).as("t") +: cols.map(col): _*)
  }

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // For every purchase, the user's most recent click at-or-before it:
    // the canonical attribution as-of join.
    "asof_join_events" -> { (s, dir) =>
      val ev = events(s, dir)
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts_us")
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(
          col("event_id"),
          col("user_id"),
          col("ts_us"),
          col("ts_us").as("click_ts_us"),
          col("value").as("click_value"))
      Relational.asOfJoin(
        purchases,
        clicks,
        keyCol = "user_id",
        tsCol = "ts_us",
        ordCol = "event_id",
        payloadCols = Seq("click_ts_us", "click_value"))
    },
    // For every purchase, the count/sum/max of the user's click values in
    // the half hour at-or-before it: the sliding-window join-aggregate,
    // phrased as ONE value-range window instead of an inequality join +
    // re-shuffled group-by.
    "asof_window_agg" -> { (s, dir) =>
      val ev = events(s, dir)
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts_us")
      val clicks = ev
        .filter(col("event_type") === "click")
        .select("user_id", "ts_us", "value")
      Relational.windowAggJoin(
        purchases,
        clicks,
        keyCol = "user_id",
        tsCol = "ts_us",
        valueCol = "value",
        spanUnits = HalfHourUs)
    },
    // the hot-key-bounded twin (window partitioned on (user, 1h bucket),
    // right rows exploded x2): must hash-match asof_window_agg's oracle
    "asof_window_agg_bucketed" -> { (s, dir) =>
      val ev = events(s, dir)
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts_us")
      val clicks = ev
        .filter(col("event_type") === "click")
        .select("user_id", "ts_us", "value")
      Relational.windowAggJoinBucketed(
        purchases,
        clicks,
        keyCol = "user_id",
        tsCol = "ts_us",
        valueCol = "value",
        spanUnits = HalfHourUs,
        bucketUnits = 2 * HalfHourUs)
    },
    // hottest user_ids with ppm shares + key cardinality — the saltFactor
    // sizing input for Skew.saltedJoin
    "skew_key_profile" -> { (s, dir) =>
      graft.ops.Checks.keyProfile(events(s, dir), "user_id", topK = 10)
    },
    // pre-flight for the events-by-user self-join: per-key |clicks| x
    // |purchases| products + the exact total, before paying for the join
    "audit_join_cardinality" -> { (s, dir) =>
      val ev = events(s, dir)
      graft.ops.Checks.joinCardinality(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        "user_id")
    },
    // Tolerance attribution: the backward as-of with a 1-hour staleness
    // bound — a click older than an hour no longer explains the purchase.
    "asof_join_tolerance" -> { (s, dir) =>
      val ev = events(s, dir)
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts_us")
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(
          col("event_id"),
          col("user_id"),
          col("ts_us"),
          col("ts_us").as("click_ts_us"),
          col("value").as("click_value"))
      Relational.asOfJoinTolerance(
        purchases,
        clicks,
        keyCol = "user_id",
        tsCol = "ts_us",
        ordCol = "event_id",
        payloadCols = Seq("click_ts_us", "click_value"),
        toleranceUnits = 2 * HalfHourUs)
    },
    // Nearest attribution: each purchase takes the click closest in time
    // in EITHER direction (ties to the earlier click) — the third as-of
    // direction, completing the pandas/polars matrix.
    "asof_join_nearest" -> { (s, dir) =>
      val ev = events(s, dir)
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts_us")
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(
          col("event_id"),
          col("user_id"),
          col("ts_us"),
          col("ts_us").as("click_ts_us"),
          col("value").as("click_value"))
      Relational.asOfJoinNearest(
        purchases,
        clicks,
        keyCol = "user_id",
        tsCol = "ts_us",
        ordCol = "event_id",
        payloadCols = Seq("click_ts_us", "click_value"))
    },
    // Same nearest attribution through the bucketed composition (30-minute
    // buckets force cross-bucket carry in BOTH directions at this
    // fixture's spacing): must hash-match asof_join_nearest's oracle.
    "asof_join_nearest_bucketed" -> { (s, dir) =>
      val ev = events(s, dir)
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts_us")
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(
          col("event_id"),
          col("user_id"),
          col("ts_us"),
          col("ts_us").as("click_ts_us"),
          col("value").as("click_value"))
      Relational.asOfJoinNearestBucketed(
        purchases,
        clicks,
        keyCol = "user_id",
        tsCol = "ts_us",
        ordCol = "event_id",
        payloadCols = Seq("click_ts_us", "click_value"),
        bucketUnits = HalfHourUs)
    },
    // Nearest attribution with a 1-hour tolerance: a candidate farther
    // than an hour on its own side is nulled BEFORE the comparison, so a
    // stale backward click loses to a fresh forward one (and vice versa).
    "asof_join_nearest_tolerance" -> { (s, dir) =>
      val ev = events(s, dir)
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts_us")
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(
          col("event_id"),
          col("user_id"),
          col("ts_us"),
          col("ts_us").as("click_ts_us"),
          col("value").as("click_value"))
      Relational.asOfJoinNearest(
        purchases,
        clicks,
        keyCol = "user_id",
        tsCol = "ts_us",
        ordCol = "event_id",
        payloadCols = Seq("click_ts_us", "click_value"),
        toleranceUnits = Some(2 * HalfHourUs))
    },
    // Forward attribution: for every click, the user's NEXT purchase at
    // or after it — the mirrored as-of direction (first-following instead
    // of last-preceding).
    "asof_join_forward" -> { (s, dir) =>
      val ev = events(s, dir)
      val clicks = ev
        .filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts_us")
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(
          col("event_id"),
          col("user_id"),
          col("ts_us"),
          col("ts_us").as("purchase_ts_us"),
          col("value").as("purchase_value"))
      Relational.asOfJoinForward(
        clicks,
        purchases,
        keyCol = "user_id",
        tsCol = "ts_us",
        ordCol = "event_id",
        payloadCols = Seq("purchase_ts_us", "purchase_value"))
    },
    // Forward attribution with a 1-hour horizon: a purchase more than an
    // hour ahead no longer counts as converted-from-this-click.
    "asof_join_forward_tolerance" -> { (s, dir) =>
      val ev = events(s, dir)
      val clicks = ev
        .filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts_us")
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(
          col("event_id"),
          col("user_id"),
          col("ts_us"),
          col("ts_us").as("purchase_ts_us"),
          col("value").as("purchase_value"))
      Relational.asOfJoinForwardTolerance(
        clicks,
        purchases,
        keyCol = "user_id",
        tsCol = "ts_us",
        ordCol = "event_id",
        payloadCols = Seq("purchase_ts_us", "purchase_value"),
        toleranceUnits = 2 * HalfHourUs)
    },
    // Forward attribution through the bucketed variant: must hash-match
    // asof_join_forward's oracle exactly (carry-back across 30-minute
    // bucket boundaries).
    "asof_join_forward_bucketed" -> { (s, dir) =>
      val ev = events(s, dir)
      val clicks = ev
        .filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts_us")
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select(
          col("event_id"),
          col("user_id"),
          col("ts_us"),
          col("ts_us").as("purchase_ts_us"),
          col("value").as("purchase_value"))
      Relational.asOfJoinForwardBucketed(
        clicks,
        purchases,
        keyCol = "user_id",
        tsCol = "ts_us",
        ordCol = "event_id",
        payloadCols = Seq("purchase_ts_us", "purchase_value"),
        bucketUnits = HalfHourUs)
    },
    // Same attribution join through the bucketed variant (30-minute
    // buckets force plenty of cross-bucket carry-ins at this fixture's
    // event spacing): must hash-match asof_join_events' oracle exactly.
    "asof_join_bucketed" -> { (s, dir) =>
      val ev = events(s, dir)
      val purchases = ev
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts_us")
      val clicks = ev
        .filter(col("event_type") === "click")
        .select(
          col("event_id"),
          col("user_id"),
          col("ts_us"),
          col("ts_us").as("click_ts_us"),
          col("value").as("click_value"))
      Relational.asOfJoinBucketed(
        purchases,
        clicks,
        keyCol = "user_id",
        tsCol = "ts_us",
        ordCol = "event_id",
        payloadCols = Seq("click_ts_us", "click_value"),
        bucketUnits = HalfHourUs)
    },
    // Per-user activity spans: every click opens an interval of `value`
    // seconds; overlapping/abutting intervals coalesce into merged spans
    // (chains collapse transitively). Negative values clamp to points.
    "intervals_coalesce" -> { (s, dir) =>
      val iv = events(s, dir)
        .filter(col("event_type") === "click")
        .select(
          col("user_id"),
          col("ts_us").as("start_us"),
          (col("ts_us") + round(col("value") * 1000000, 0).cast("long")).as("end_us"))
      Relational.coalesceIntervals(iv, "user_id", "start_us", "end_us")
    },
    // The complement: silence windows BETWEEN a user's merged activity
    // spans (same click fixture), one row per gap with bounds + length
    "intervals_gaps" -> { (s, dir) =>
      val iv = events(s, dir)
        .filter(col("event_type") === "click")
        .select(
          col("user_id"),
          col("ts_us").as("start_us"),
          (col("ts_us") + round(col("value") * 1000000, 0).cast("long")).as("end_us"))
      Relational.intervalGaps(iv, "user_id", "start_us", "end_us")
    },
    // Every event falling inside a 30-minute window opened by a severe
    // error ("incident"), aggregated per incident. Incidents are rare, so
    // the interval side broadcasts and the event stream is never shuffled.
    "range_join_incidents" -> { (s, dir) =>
      val ev = events(s, dir)
      val incidents = ev
        .filter(col("event_type") === "error" && col("value") > 200)
        .select(col("event_id").as("incident_id"), col("ts_us").as("start_us"))
      Relational
        .rangeJoinBucketed(
          ev.select("ts_us", "value"),
          incidents,
          tsCol = "ts_us",
          startCol = "start_us",
          lengthUnits = HalfHourUs)
        .groupBy("incident_id", "start_us")
        .agg(
          count(lit(1)).cast("long").as("n_events"),
          sum(col("value").cast("decimal(14,2)")).cast("double").as("sum_value"))
    },
    // Variable-length incident windows: each severe error opens a window
    // of `value` MINUTES (per-incident length), events inside aggregate
    // per incident — the variable-length face of the bucketed range join
    // (bucket width = the interval side's max length).
    // Interval x interval: view "sessions" ([ts, ts + value seconds))
    // against severe-error incident windows ([ts, ts + value minutes)) —
    // sessions touching each incident, via the two-half start-point
    // decomposition instead of an inequality join.
    "range_join_overlap" -> { (s, dir) =>
      val ev = events(s, dir)
      val sessions = ev
        .filter(col("event_type") === "view")
        .select(
          col("event_id").as("session_id"),
          col("ts_us").as("s_start_us"),
          (col("ts_us") + round(col("value") * 1000000, 0).cast("long")).as("s_end_us"))
      val incidents = ev
        .filter(col("event_type") === "error" && col("value") > 100)
        .select(
          col("event_id").as("incident_id"),
          col("ts_us").as("i_start_us"),
          (col("ts_us") +
            round(col("value") * 60, 0).cast("long") * lit(1000000L)).as("i_end_us"))
      Relational
        .rangeJoinOverlap(
          sessions,
          incidents,
          lStartCol = "s_start_us",
          lEndCol = "s_end_us",
          rStartCol = "i_start_us",
          rEndCol = "i_end_us")
        .groupBy("incident_id", "i_start_us", "i_end_us")
        .agg(
          count(lit(1)).cast("long").as("n_sessions"),
          sum(col("s_end_us") - col("s_start_us")).cast("long").as("sum_session_us"))
    },
    // the large x large face of the same overlap: identical fixture and
    // aggregate, but the pairing is the SHUFFLED (stratum, bucket) hash
    // join with no broadcast requirement — must hash-match the broadcast
    // face's oracle exactly. Strata are precomputed once via
    // intervalStrata (the cached-composition path) to cover that face too.
    "range_join_overlap_big" -> { (s, dir) =>
      val ev = events(s, dir)
      val sessions = ev
        .filter(col("event_type") === "view")
        .select(
          col("event_id").as("session_id"),
          col("ts_us").as("s_start_us"),
          (col("ts_us") + round(col("value") * 1000000, 0).cast("long")).as("s_end_us"))
      val incidents = ev
        .filter(col("event_type") === "error" && col("value") > 100)
        .select(
          col("event_id").as("incident_id"),
          col("ts_us").as("i_start_us"),
          (col("ts_us") +
            round(col("value") * 60, 0).cast("long") * lit(1000000L)).as("i_end_us"))
      val lStrata = Relational.intervalStrata(sessions, "s_start_us", "s_end_us")
      val rStrata = Relational.intervalStrata(incidents, "i_start_us", "i_end_us")
      Relational
        .rangeJoinOverlapBig(
          sessions,
          incidents,
          lStartCol = "s_start_us",
          lEndCol = "s_end_us",
          rStartCol = "i_start_us",
          rEndCol = "i_end_us",
          lStrata = Some(lStrata),
          rStrata = Some(rStrata))
        .groupBy("incident_id", "i_start_us", "i_end_us")
        .agg(
          count(lit(1)).cast("long").as("n_sessions"),
          sum(col("s_end_us") - col("s_start_us")).cast("long").as("sum_session_us"))
    },
    "range_join_var" -> { (s, dir) =>
      val ev = events(s, dir)
      val incidents = ev
        .filter(col("event_type") === "error" && col("value") > 150)
        .select(
          col("event_id").as("incident_id"),
          col("ts_us").as("start_us"),
          (col("ts_us") +
            round(col("value") * 60, 0).cast("long") * lit(1000000L)).as("end_us"))
      Relational
        .rangeJoinIntervals(
          ev.select("ts_us", "value"),
          incidents,
          tsCol = "ts_us",
          startCol = "start_us",
          endCol = "end_us")
        .groupBy("incident_id", "start_us", "end_us")
        .agg(
          count(lit(1)).cast("long").as("n_events"),
          sum(col("value").cast("decimal(14,2)")).cast("double").as("sum_value"))
    },
    // Sliding (hopping) windows: 1-hour windows every 30 minutes — each
    // event lands in exactly two windows.
    "events_hopping_agg" -> { (s, dir) =>
      eventsT(s, dir, "event_type", "value")
        .groupBy(window(col("t"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(
          count(lit(1)).cast("long").as("n"),
          sum(col("value").cast("decimal(14,2)")).as("sv"))
        .select(
          unix_micros(col("w.start")).as("window_start_us"),
          col("event_type"),
          col("n"),
          col("sv").cast("double").as("sum_value"))
    },
    // unique visitors per sliding window: exact COUNT(DISTINCT user) —
    // partial-aggregates as (window, type, user) first, so a hot window
    // never funnels raw events; the HLL sketch (`Stats.distinctCounts`)
    // is the swap-in at cardinalities where exact no longer pays
    "events_hopping_uniques" -> { (s, dir) =>
      eventsT(s, dir, "event_type", "user_id")
        .groupBy(window(col("t"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(countDistinct("user_id").cast("long").as("n_users"))
        .select(
          unix_micros(col("w.start")).as("window_start_us"),
          col("event_type"),
          col("n_users"))
    },
    // the promised "sketch swap-in at scale" for the exact hopping-window
    // distinct: KMV per (window, type) — k-bounded state per window where
    // countDistinct's per-window set is unbounded; exact below k, and
    // (unlike HLL) engine-portable, hence still hash-checked
    "events_hopping_uniques_kmv" -> { (s, dir) =>
      val keyed = eventsT(s, dir, "event_type", "user_id")
        .select(
          window(col("t"), "1 hour", "30 minutes").as("w"),
          col("event_type"),
          col("user_id"))
        .select(
          struct(
            unix_micros(col("w.start")).as("window_start_us"),
            col("event_type")).as("wk"),
          col("user_id"))
      Stats.kmvEstimate(Stats.kmvSketch(keyed, "wk", "user_id", k = 64), "wk", k = 64)
        .select(
          col("wk.window_start_us").as("window_start_us"),
          col("wk.event_type").as("event_type"),
          col("n_kept"),
          col("est_distinct"))
    },
    "contamination_ngrams" -> { (s, dir) =>
      Corpus.contaminationNgrams(docs(s, dir), n = 5)
    },
    // DSIR-style selection: hashed-bigram importance score vs the English
    // subset as the target distribution; keep = at-or-above corpus-typical
    "corpus_importance_resample" -> { (s, dir) =>
      Corpus.importanceScore(docs(s, dir), isTarget = col("lang") === "en", keepMilli = 1000L)
    },
    // Char-weighted systematic sample: ~one doc per 10k chars of corpus,
    // long docs proportionally more likely, selection grid phase-shifted
    // by 137 to exercise the phase arithmetic.
    "corpus_sample_pps" -> { (s, dir) =>
      Corpus.samplePps(docs(s, dir), step = 10000L, phase = 137L)
    },
    // Reproducible ~50k-char subset in hash order; the straddling doc is
    // kept, so the subset weighs at least the budget.
    "corpus_token_budget" -> { (s, dir) =>
      Corpus.takeTokenBudget(docs(s, dir), budget = 50000L)
    },
    "stats_quantiles" -> { (s, dir) =>
      Stats.quantilesByGroup(docs(s, dir), "lang", "n_chars")
    },
    // count-min frequency sketch over the token stream, probed with the
    // corpus vocabulary: est >= true count, min-over-rows tightens it
    "stats_cms_freq" -> { (s, dir) =>
      // _outer + the null filter cmsBuild/cmsQuery already apply: plain
      // explode's inferred filter re-tokenizes per row (see importanceScore)
      val toks = docs(s, dir)
        .select(explode_outer(graft.ops.TextAnalysis.tokens(col("text"))).as("tok"))
      Stats.cmsQuery(Stats.cmsBuild(toks, "tok"), toks, "tok")
    },
    // per-language sketches merged by counter addition: CMS linearity says
    // this IS the whole-corpus sketch, so the oracle is shared verbatim
    "stats_cms_merged" -> { (s, dir) =>
      val d = docs(s, dir)
      def toks(f: DataFrame) =
        f.select(explode_outer(graft.ops.TextAnalysis.tokens(col("text"))).as("tok"))
      val merged = Stats.cmsMerge(Seq(
        Stats.cmsBuild(toks(d.filter(col("lang") === "en")), "tok"),
        Stats.cmsBuild(toks(d.filter(col("lang") =!= "en")), "tok")))
      Stats.cmsQuery(merged, toks(d), "tok")
    },
    // join cardinality from sketches ALONE: the CMS inner-product
    // estimator sizes |halfA join halfB on user_id| from two depth·256
    // counter tables, never touching either side — min over depth rows,
    // one-sided (collisions only ever ADD)
    "stats_cms_join_est" -> { (s, dir) =>
      val ev = events(s, dir).filter(col("user_id").isNotNull)
      Stats.cmsJoinEstimate(
        Stats.cmsBuild(ev.filter(col("event_id") % 2 === 0), "user_id"),
        Stats.cmsBuild(ev.filter(col("event_id") % 2 === 1), "user_id"))
    },
    // the CMS streaming-store lifecycle inside the timed query: three
    // ingest rounds land batch-keyed counter tables (batch 0 claiming any
    // stale store), then the read face sums them — by CMS linearity this
    // must hash-equal the one-pass whole-corpus sketch's estimates
    "stats_cms_streamed" -> { (s, dir) =>
      val root = s"${sys.props("java.io.tmpdir")}/graft_cms_${ProcessHandle.current().pid()}"
      val d = docs(s, dir)
      def toks(f: DataFrame) =
        f.select(explode_outer(graft.ops.TextAnalysis.tokens(col("text"))).as("tok"))
      (0L to 2L).foreach { b =>
        Stats.ingestCmsBatch(toks(d.filter(col("doc_id") % 3 === b)), root, b, "tok")
      }
      Stats.readCmsEstimate(s, root, toks(d), "tok")
    },
    // KMV distinct-user sketch per event type: exact below k (sf0.001, 15
    // users/group), estimator at k (sf0.01, 150 users/group)
    "stats_kmv_distinct" -> { (s, dir) =>
      Stats.kmvDistinct(events(s, dir), "event_type", "user_id", k = 64)
    },
    // the FULL streaming-store lifecycle inside the timed query: three
    // ingest rounds land batch-keyed sketches (batch 0 claiming/replacing
    // any stale store), then the read face rolls them up — which must
    // hash-equal the one-pass whole-corpus sketch (mergeability again)
    "stats_kmv_streamed" -> { (s, dir) =>
      val root = s"${sys.props("java.io.tmpdir")}/graft_kmv_${ProcessHandle.current().pid()}"
      val ev = events(s, dir)
      (0L to 2L).foreach { b =>
        Stats.ingestKmvBatch(
          ev.filter(col("event_id") % 3 === b), root, b, "event_type", "user_id", k = 64)
      }
      Stats.readKmvEstimate(s, root, "event_type", k = 64)
    },
    // the HLL ingest-store lifecycle inside the timed query: three rounds
    // land batch-keyed registers, the read face MAX-rolls them up — which
    // must hash-equal the one-pass whole-corpus sketch (max-linearity)
    "stats_hll_streamed" -> { (s, dir) =>
      val root = s"${sys.props("java.io.tmpdir")}/graft_hll_${ProcessHandle.current().pid()}"
      val ev = events(s, dir)
      (0L to 2L).foreach { b =>
        Stats.ingestHllBatch(ev.filter(col("event_id") % 3 === b), root, b, "event_type", "user_id")
      }
      Stats.readHllEstimate(s, root, "event_type")
    },
    // per-row mid-rank percentile of event value within its type — the
    // rank/quantile normalization transform, windowed over DISTINCT
    // values only and joined back, never a window over raw rows
    "stats_rank_normalize" -> { (s, dir) =>
      Stats.rankNormalize(events(s, dir), "event_type", "value")
    },
    // period-over-period reporting: daily event counts per type with
    // day-over-day and week-over-week ppm deltas (null when no comparison
    // period exists — "no data" is not "flat")
    "events_period_over_period" -> { (s, dir) =>
      val daily = eventsT(s, dir, "event_type")
        .groupBy(window(col("t"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"))
        .select(unix_micros(col("w.start")).as("ts_us"), col("event_type"), col("n"))
      graft.ops.Rollup.periodOverPeriod(daily, "event_type", "ts_us", "n", seasonLag = 7)
    },
    // Benford first-digit audit of event values per type: observed digit
    // shares vs the pinned log10(1+1/d) ppm expectations — the fabricated-
    // data / unit-mixing screen, integer end-to-end
    "stats_benford" -> { (s, dir) =>
      Stats.benfordAudit(events(s, dir), "event_type", "value")
    },
    // autocorrelation of the hourly count series per type, lags 1..30 —
    // the season-length detector (a daily cycle spikes at lag 24); one
    // window pass + stack unpivot + exact decimal moments
    "events_autocorr" -> { (s, dir) =>
      val hourly = events(s, dir)
        .withColumn("hour", expr("ts_us div 3600000000"))
        .groupBy("event_type", "hour")
        .agg(count(lit(1)).cast("long").as("n"))
      Stats.autocorrMilli(hourly, "event_type", "hour", "n", maxLag = 30)
    },
    // time-weighted average of each type's gauge value: samples hold
    // until the next sample (step series), last sample weightless; exact
    // milli·us products in decimal(38)
    "events_twap" -> { (s, dir) =>
      Relational.timeWeightedAvg(events(s, dir), "event_type", "ts_us", "value")
    },
    // same answer, hot-key-safe plan: in-bucket lead + cross-bucket carry
    // from the (key, bucket)-grain firsts table — serial work bounded by
    // one hour of samples, results byte-identical to events_twap
    "events_twap_bucketed" -> { (s, dir) =>
      Relational.timeWeightedAvgBucketed(
        events(s, dir), "event_type", "ts_us", "value", bucketUs = 3600000000L)
    },
    // Mann-Kendall monotone-trend test over each type's daily volume:
    // exact integer S / tie-corrected var18 / continuity-corrected
    // z2_milli — the drift alarm a volume dashboard actually wants
    "events_trend_mk" -> { (s, dir) =>
      val daily = events(s, dir)
        .withColumn("day", expr("ts_us div 86400000000"))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).cast("long").as("n"))
      Stats.mannKendall(daily, "event_type", "day", "n")
    },
    // Poisson-bootstrap 95% CI on each type's mean value: deterministic
    // md5-fold Poisson(1) weights, 40 replicates, percentile picks
    "events_bootstrap_ci" -> { (s, dir) =>
      Stats.poissonBootstrap(events(s, dir), "event_type", "value", "event_id", reps = 40)
    },
    // CUPED: adjust each cohort's second-half spend by its first-half
    // covariate — pooled theta, exact decimal moments over per-user
    // integer milli sums (summed as ints so no float order enters)
    "events_cuped" -> { (s, dir) =>
      val byUser = events(s, dir)
        .filter(col("user_id").isNotNull && col("value").isNotNull && col("ts_us").isNotNull)
        .withColumn("day", expr("ts_us div 86400000000"))
        .groupBy("user_id")
        .agg(
          sum(when(col("day") < 19738L, expr("CAST(round(value * 1000, 0) AS BIGINT)"))
            .otherwise(0L)).cast("long").as("pre"),
          sum(when(col("day") >= 19738L, expr("CAST(round(value * 1000, 0) AS BIGINT)"))
            .otherwise(0L)).cast("long").as("post"))
        .withColumn("variant", (col("user_id") % 2).cast("long"))
      Stats.cupedAdjust(byUser, "variant", "pre", "post")
    },
    // Theil-Sen median pairwise slope over the same daily series: the
    // robust how-fast next to trend_mk's is-it-drifting, doubled-median
    // micro units per day-index
    "events_trend_theilsen" -> { (s, dir) =>
      val daily = events(s, dir)
        .withColumn("day", expr("ts_us div 86400000000"))
        .groupBy("event_type", "day")
        .agg(count(lit(1)).cast("long").as("n"))
      Stats.theilSenSlope(daily, "event_type", "day", "n")
    },
    // two-sample KS distance between the even/odd user cohorts' value
    // distributions per type — the integer-exact drift monitor (a healthy
    // randomized split should score near zero; the score IS the check)
    "stats_ks_drift" -> { (s, dir) =>
      val ev = events(s, dir).filter(col("user_id").isNotNull)
      Stats.ksDrift(
        ev.filter(col("user_id") % 2 === 0),
        ev.filter(col("user_id") % 2 === 1),
        "event_type",
        "value")
    },
    // QQ shift over the same cohorts: WHERE the distribution moved, per
    // exact decile — the shape readout next to KS's one number
    "stats_qq_shift" -> { (s, dir) =>
      val ev = events(s, dir)
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .withColumn("v_milli", expr("CAST(round(value * 1000, 0) AS BIGINT)"))
      Stats.qqShift(
        ev.filter(col("user_id") % 2 === 0),
        ev.filter(col("user_id") % 2 === 1),
        "event_type",
        "v_milli")
    },
    // two-proportion z^2 on a high-value-event rate between the cohorts:
    // the conversion-lift test, exact rational z^2 in milli
    "stats_two_proportion" -> { (s, dir) =>
      val ev = events(s, dir)
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .withColumn("hit", col("value") >= 100.0)
      Stats.twoProportionTest(
        ev.filter(col("user_id") % 2 === 0),
        ev.filter(col("user_id") % 2 === 1),
        "event_type",
        "hit")
    },
    // Welch's t over the same cohorts: the parametric mean-shift reading
    // next to KS's any-change reading — exact decimal moments, one
    // token-mirrored float conversion for t and the Satterthwaite df
    "stats_welch_ttest" -> { (s, dir) =>
      val ev = events(s, dir).filter(col("user_id").isNotNull)
      Stats.welchTTest(
        ev.filter(col("user_id") % 2 === 0),
        ev.filter(col("user_id") % 2 === 1),
        "event_type",
        "value")
    },
    // Mann-Whitney U over the same cohorts: the nonparametric rank-sum
    // reading next to Welch's mean-shift — doubled midranks keep ties
    // integral, tie-corrected variance in exact decimal, one
    // token-mirrored float conversion for z
    "stats_mannwhitney" -> { (s, dir) =>
      val ev = events(s, dir).filter(col("user_id").isNotNull)
      Stats.mannWhitneyU(
        ev.filter(col("user_id") % 2 === 0),
        ev.filter(col("user_id") % 2 === 1),
        "event_type",
        "value")
    },
    // since-launch unique users per (type, day), EXACT via the first-seen
    // trick — one min-aggregate + a cumulative window over period rows,
    // never a dedup-to-date re-scan; the exact complement of the sliding
    // HLL's trailing window
    "events_cumulative_users" -> { (s, dir) =>
      Rollup.cumulativeDistinct(
        events(s, dir).withColumn("day", expr("ts_us div 86400000000")),
        "event_type",
        "day",
        "user_id")
    },
    // the same report maintained INCREMENTALLY — and OUT OF ORDER: the
    // middle day-range third arrives FIRST, so every id whose true first
    // period lives in the earliest third arrives as a late recurrence;
    // the min-reconciling correction rows make the read face hash-equal
    // the batch operator over all events regardless of arrival order
    "events_cumulative_streamed" -> { (s, dir) =>
      val root = s"${sys.props("java.io.tmpdir")}/graft_cumdist_${ProcessHandle.current().pid()}"
      val ev = events(s, dir).withColumn("day", expr("ts_us div 86400000000"))
      // 1-row bounded collect: day-range thirds define the batches
      val mm = ev.agg(min("day").as("lo"), max("day").as("hi")).head()
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val (c1, c2) = (lo + (hi - lo + 1) / 3, lo + 2 * (hi - lo + 1) / 3)
      Rollup.ingestCumulativeDistinctBatch(
        ev.filter(col("day") >= c1 && col("day") < c2), root, 0L, "event_type", "day", "user_id")
      Rollup.ingestCumulativeDistinctBatch(
        ev.filter(col("day") < c1), root, 1L, "event_type", "day", "user_id")
      Rollup.ingestCumulativeDistinctBatch(
        ev.filter(col("day") >= c2), root, 2L, "event_type", "day", "user_id")
      Rollup.readCumulativeDistinct(s, root, "event_type")
    },
    // the windowed stream's drop contract MEASURED (no silent drops), in
    // the shape late data really takes: run 1 (Trigger.AvailableNow)
    // processes the on-time generation (last 3 hours) and checkpoints —
    // its trailing no-data batch emits every window the watermark
    // finalized (window_end <= max(t) - 1h, the <= boundary StreamingSpec
    // pins at equality); run 2 RESTARTS from the checkpoint onto a
    // late-arrived file whose every row sits >= 2 hours past the
    // checkpointed watermark. The engine's own per-operator accounting
    // (numRowsDroppedByWatermark, surfaced by lateDropCount) must then
    // equal the late (window, event_type) GROUP count — aggregation drops
    // are counted at the stateful operator's input, which sits after the
    // partial aggregate, so the grain is groups-per-batch, not raw rows
    // (raw-row loss = n_late, bounded below by the group count; both are
    // reported). Within one run, Spark filters late events with the
    // PREVIOUS batch's watermark (the two-value tracker), which is why
    // the late file must arrive behind a checkpoint boundary — a
    // same-run second batch would be filtered against the not-yet-moved
    // value and silently accepted.
    "events_stream_late_drops" -> { (s, dir) =>
      import s.implicits._
      val root = s"${sys.props("java.io.tmpdir")}/graft_latedrop_${ProcessHandle.current().pid()}"
      val ev = eventsT(s, dir, "event_type")
      // 1-row bounded collect: the arrival-generation split point
      val hi = ev.agg(max(col("t").cast("long"))).head().getLong(0)
      val cut = hi - 10800L
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      // land each generation as ONE file with a pinned mtime, so the file
      // source's arrival order (on-time first, late second) is
      // deterministic, never racy
      def land(df: DataFrame, n: Int): Unit = {
        val tmp = s"$root/tmp_$n"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val parts = fs.globStatus(new org.apache.hadoop.fs.Path(s"$tmp/part-*.parquet"))
        if (parts.nonEmpty) {
          val dst = new org.apache.hadoop.fs.Path(s"$root/in/gen_$n.parquet")
          fs.mkdirs(dst.getParent)
          require(fs.rename(parts.head.getPath, dst), s"landing rename to $dst failed")
          fs.setTimes(dst, 1000L * (n + 1), -1L)
        }
        fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      }
      // one AvailableNow pass over whatever files currently exist; the
      // shared checkpoint carries watermark + sink idempotence across runs
      def runOnce(): org.apache.spark.sql.streaming.StreamingQuery = {
        val q = graft.streaming.EventsStream
          .windowedCounts(s.readStream.schema(ev.schema).parquet(s"$root/in"))
          .writeStream
          .option("checkpointLocation", s"$root/ck")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
              batch.write
                .mode(org.apache.spark.sql.SaveMode.Overwrite)
                .parquet(s"$root/out/batch_id=$batchId")
              ()
          }
          .start()
        q.awaitTermination()
        q
      }
      val onTime = ev.filter(col("t").cast("long") > cut)
      val late = ev.filter(col("t").cast("long") <= cut)
      land(onTime, 0)
      runOnce()
      land(late, 1)
      val dropped = graft.streaming.EventsStream.lateDropCount(runOnce())
      val out = s.read.parquet(s"$root/out")
        .agg(
          count(lit(1)).cast("long").as("n_windows_out"),
          coalesce(sum("n"), lit(0L)).cast("long").as("n_events_out"))
        .head()
      Seq((onTime.count(), late.count(), dropped, out.getLong(0), out.getLong(1)))
        .toDF("n_ontime", "n_late", "n_dropped_groups", "n_windows_out", "n_events_out")
    },
    // sliding distinct users per (type, day): per-day HLL registers merged
    // by MAX over a 7-day RANGE frame — no re-scan of raw events per
    // window, the mergeability law doing dashboard work
    "stats_hll_sliding" -> { (s, dir) =>
      Stats.hllSlidingEstimate(
        events(s, dir).withColumn("day", expr("ts_us div 86400000000")),
        "event_type",
        "day",
        "user_id",
        window = 7)
    },
    // classical seasonal decomposition of hourly counts per type:
    // value = trend (centered 25-row MA) + hour-of-day seasonal index +
    // residual, all integer-milli, edges honestly null
    "events_seasonal" -> { (s, dir) =>
      val hourly = events(s, dir)
        .groupBy(expr("ts_us div 3600000000").cast("long").as("p"), col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"))
      graft.ops.Anomaly.seasonalDecompose(hourly, "event_type", "p", "n", seasonLen = 24)
    },
    // deseasonalize, THEN flag: median/MAD on the residuals, so the daily
    // cycle stops tripping the alarm and an outlier can't inflate its
    // own threshold
    "events_seasonal_outliers" -> { (s, dir) =>
      val hourly = events(s, dir)
        .groupBy(expr("ts_us div 3600000000").cast("long").as("p"), col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"))
      graft.ops.Anomaly.seasonalOutliers(hourly, "event_type", "p", "n", seasonLen = 24)
    },
    // the ACF→decompose composition, auto-tuned: a planted hour-of-day
    // sawtooth (count + (hour%24)*5 — the deterministic cycle fixture)
    // peaks the cross-key ACF score at lag 24 at every sf, so the
    // detector picks 24 and feeds the decomposition; season_len rides in
    // the hash-checked output, so a mis-detection cannot hide
    "events_seasonal_auto" -> { (s, dir) =>
      // positional index (row_number over calendar hours) rather than the
      // raw hour: autocorrMilli lags by POSITION, so the planted cycle
      // must ride the gap-free index — which is also seasonalDecompose's
      // gap-filled input contract
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type")
        .orderBy("p0")
      val hourly = events(s, dir)
        .filter(col("ts_us").isNotNull)
        .groupBy(expr("ts_us div 3600000000").cast("long").as("p0"), col("event_type"))
        .agg(count(lit(1)).cast("long").as("c"))
        .withColumn("p", row_number().over(w).cast("long") - 1)
        .select(col("event_type"), col("p"), (col("c") + (col("p") % 24) * 5).as("n"))
      graft.ops.Anomaly.seasonalAuto(
        hourly, "event_type", "p", "n", maxLag = 36, minAcfMilli = 300L, fallbackSeasonLen = 7)
    },
    // categorical drift between the same even/odd cohorts: per event_type
    // the exact-integral chi-square term (which category drifted); the
    // statistic is the consumer's sum
    "stats_chisq_drift" -> { (s, dir) =>
      val ev = events(s, dir).filter(col("user_id").isNotNull)
      Stats.chiSquareDrift(
        ev.filter(col("user_id") % 2 === 0),
        ev.filter(col("user_id") % 2 === 1),
        "event_type")
    },
    // value-inequality lens: Gini concentration of event values per type,
    // rank sums over distinct values only, exact ppm
    "stats_gini" -> { (s, dir) =>
      Stats.giniByGroup(events(s, dir), "event_type", "value")
    },
    // categorical concentration: is each event type's volume spread
    // across users or owned by a few — HHI + top share, exact ppm
    "stats_hhi" -> { (s, dir) =>
      Stats.hhiByGroup(
        events(s, dir).filter(col("user_id").isNotNull),
        "event_type",
        "user_id")
    },
    // incremental materialized rollup: three ingest rounds land per-key
    // algebraic partials (count / exact milli sum / min / max) at
    // (event_type, day) grain; the read face re-aggregates the tiny store
    // — which must hash-equal the one-pass aggregate over the fact table
    // the store never re-reads
    "rollup_incremental" -> { (s, dir) =>
      val root = s"${sys.props("java.io.tmpdir")}/graft_rollup_${ProcessHandle.current().pid()}"
      val ev = events(s, dir).withColumn("day", expr("ts_us div 86400000000"))
      (0L to 2L).foreach { b =>
        Rollup.ingestAggBatch(
          ev.filter(col("event_id") % 3 === b), root, b, Seq("event_type", "day"), "value")
      }
      Rollup
        .serve(Rollup.readState(s, root, Seq("event_type", "day")), Seq("event_type", "day"))
    },
    // the grouping-sets face served from the SAME store: per-type totals,
    // per-day totals, and the grand total re-aggregated from the
    // (event_type, day) partials — a cube that never touches the facts
    "rollup_serve_levels" -> { (s, dir) =>
      val root = s"${sys.props("java.io.tmpdir")}/graft_rollupc_${ProcessHandle.current().pid()}"
      val ev = events(s, dir).withColumn("day", expr("ts_us div 86400000000"))
      (0L to 2L).foreach { b =>
        Rollup.ingestAggBatch(
          ev.filter(col("event_id") % 3 === b), root, b, Seq("event_type", "day"), "value")
      }
      Rollup.serveLevels(
        Rollup.readState(s, root, Seq("event_type", "day")),
        Seq("event_type", "day"),
        Seq(Seq("event_type"), Seq("day"), Seq.empty))
    },
    // distributed percentiles from the mergeable fixed-grid histogram
    // sketch: p25/p50/p90/p99 of event value per type, each located to a
    // 4-unit bucket in exact integer arithmetic (the oracle the
    // engine-private approx_percentile sketch cannot give)
    "stats_hist_quantiles" -> { (s, dir) =>
      Stats.histQuantiles(
        Stats.histSketch(events(s, dir), "event_type", "value"),
        "event_type",
        Seq(250, 500, 900, 990))
    },
    // the domain-unknown face: a two-pass fit derives the tightest
    // [min, max+1) milli grid first, so no mass clamps into edge buckets;
    // the oracle derives the same grid and must land the same buckets
    "stats_hist_quantiles_auto" -> { (s, dir) =>
      val ev = events(s, dir)
      val (lo, hi) = Stats.fitHistGrid(ev, "value")
      Stats.histQuantiles(
        Stats.histSketch(ev, "event_type", "value", lo, hi),
        "event_type",
        Seq(250, 500, 900, 990),
        lo,
        hi)
    },
    // per-group derived grids: each event type's 256 buckets span its OWN
    // value domain — the resolution answer when group ranges differ by
    // orders of magnitude and a shared grid starves the narrow groups
    "stats_hist_quantiles_pergroup" -> { (s, dir) =>
      Stats.histQuantilesPerGroup(
        Stats.histSketchPerGroup(events(s, dir), "event_type", "value"),
        "event_type",
        Seq(250, 500, 900, 990))
    },
    // per-shard histogram sketches merged by counter addition MUST answer
    // like the whole-corpus sketch (linearity) — the oracle runs the
    // whole-corpus SQL against the merged result
    "stats_hist_merged" -> { (s, dir) =>
      val ev = events(s, dir)
      val halves = Seq(
        Stats.histSketch(ev.filter(col("event_id") % 2 === 0), "event_type", "value"),
        Stats.histSketch(ev.filter(col("event_id") % 2 === 1), "event_type", "value"))
      Stats.histQuantiles(Stats.histMerge(halves), "event_type", Seq(250, 500, 900, 990))
    },
    // the full streaming-store lifecycle inside the timed query: three
    // ingest rounds land batch-keyed bucket tables (batch 0 claiming or
    // replacing any stale store), then the read face rolls them up —
    // which must hash-equal the one-pass whole-corpus sketch
    "stats_hist_streamed" -> { (s, dir) =>
      val root = s"${sys.props("java.io.tmpdir")}/graft_hist_${ProcessHandle.current().pid()}"
      val ev = events(s, dir)
      (0L to 2L).foreach { b =>
        Stats.ingestHistBatch(
          ev.filter(col("event_id") % 3 === b), root, b, "event_type", "value")
      }
      Stats.readHistQuantiles(s, root, "event_type", Seq(250, 500, 900, 990))
    },
    // per-shard sketches merged by union + re-trim: MUST equal the
    // whole-corpus sketch (the mergeability law), so the oracle runs the
    // whole-corpus SQL against the merged result
    "stats_kmv_merged" -> { (s, dir) =>
      val ev = events(s, dir)
      val halves = Seq(
        Stats.kmvSketch(ev.filter(col("event_id") % 2 === 0), "event_type", "user_id", k = 64),
        Stats.kmvSketch(ev.filter(col("event_id") % 2 === 1), "event_type", "user_id", k = 64))
      Stats.kmvEstimate(Stats.kmvMerge(halves, k = 64), "event_type", k = 64)
    },
    // sketch-only corpus overlap: the two halves' user sets compared
    // WITHOUT re-reading raw events — union/intersection/Jaccard from
    // k=64 survivors; exact below k (sf0.001), estimator at k (sf0.01)
    "stats_kmv_overlap" -> { (s, dir) =>
      val ev = events(s, dir)
      Stats.kmvOverlap(
        Stats.kmvSketch(ev.filter(col("event_id") % 2 === 0), "event_type", "user_id", k = 64),
        Stats.kmvSketch(ev.filter(col("event_id") % 2 === 1), "event_type", "user_id", k = 64),
        "event_type",
        k = 64)
    },
    // hourly volume anomalies per event type: 3-sigma vs the trailing-24
    // baseline, decided in exact integer arithmetic (no stddev/sqrt)
    "events_anomaly" -> { (s, dir) =>
      val counted = eventsT(s, dir, "event_type")
        .groupBy(window(col("t"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"))
        .select(unix_micros(col("w.start")).as("window_start_us"), col("event_type"), col("n"))
      graft.ops.Anomaly.countAnomalies(counted, "event_type", "window_start_us", "n")
    },
    // two-sided CUSUM drift detection over the same hourly series: one
    // summary row per type with the cusum extremes and first alarm —
    // catches the sustained small shift the 3-sigma test never fires on
    "events_cusum" -> { (s, dir) =>
      val counted = eventsT(s, dir, "event_type")
        .groupBy(window(col("t"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"))
        .select(unix_micros(col("w.start")).as("ts_us"), col("event_type"), col("n"))
      graft.ops.Anomaly.cusumChanges(counted, "event_type", "ts_us", "n", kMilli = 500L, hMilli = 1500L)
    },
    // integer-exact EWMA smoothing of the same hourly series: the trunc
    // division each step makes the recurrence engine-portable (the float
    // EWMA every monitoring stack hand-waves never hash-checks)
    "events_ewma" -> { (s, dir) =>
      val counted = eventsT(s, dir, "event_type")
        .groupBy(window(col("t"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"))
        .select(unix_micros(col("w.start")).as("ts_us"), col("event_type"), col("n"))
      graft.ops.Anomaly.ewmaSmooth(counted, "event_type", "ts_us", "n", alphaMilli = 300L)
    },
    // deterministic HyperLogLog distinct users per type: md5 registers the
    // oracle rebuilds bit-for-bit; the register SUM stays integer so the
    // only float op is the final constant multiply/divide
    "stats_hll" -> { (s, dir) =>
      Stats.hllEstimate(Stats.hllSketch(events(s, dir), "event_type", "user_id"), "event_type")
    },
    // per-shard HLL registers merged by pointwise MAX must answer like
    // the whole-corpus sketch (max-linearity) — whole-corpus oracle SQL
    "stats_hll_merged" -> { (s, dir) =>
      val ev = events(s, dir)
      Stats.hllEstimate(
        Stats.hllMerge(Seq(
          Stats.hllSketch(ev.filter(col("event_id") % 2 === 0), "event_type", "user_id"),
          Stats.hllSketch(ev.filter(col("event_id") % 2 === 1), "event_type", "user_id"))),
        "event_type")
    },
    // ordered-sequence funnel over view -> click -> purchase: each step
    // counts users whose first qualifying completion is strictly after
    // their previous step's
    "funnel_stages" -> { (s, dir) =>
      graft.ops.Funnel.stages(events(s, dir), Seq("view", "click", "purchase"))
    },
    // time-to-convert per funnel edge: every converting user's lag between
    // first completions under the same greedy sequential semantics; n per
    // edge equals funnel_stages' TO-step count
    "funnel_convert_lag" -> { (s, dir) =>
      graft.ops.Funnel.conversionLags(events(s, dir), Seq("view", "click", "purchase"))
    },
    // the conversion-window variant: each step must land within 24h of
    // the previous completion or the user churns out (15 -> 6 at step 2
    // on sf0.001 — the window genuinely bites)
    "funnel_stages_windowed" -> { (s, dir) =>
      graft.ops.Funnel.stages(
        events(s, dir),
        Seq("view", "click", "purchase"),
        maxGapUs = Some(86400000000L))
    },
    // first-order Markov transition matrix over per-user event
    // sequences: counts + integer-milli row-normalized probabilities
    "events_transitions" -> { (s, dir) =>
      graft.ops.Funnel.transitions(events(s, dir))
    },
    // top whole journeys: first-8-step paths counted across users,
    // top-20 via TakeOrderedAndProject
    "events_top_paths" -> { (s, dir) =>
      graft.ops.Funnel.topPaths(events(s, dir))
    },
    // weekly cohort retention over the 30-day event window
    "events_retention" -> { (s, dir) =>
      val raw = s.read.parquet(s"$dir/events.parquet")
      graft.ops.Funnel.retention(
        raw.select(col("user_id"), EventTime.tsSecs(raw).as("secs")))
    },
    // dominant event type per user: mode with the (count DESC, value ASC)
    // deterministic argmax, share in ppm
    "stats_mode" -> { (s, dir) =>
      Stats.modeByGroup(events(s, dir).filter(col("user_id").isNotNull), "user_id", "event_type")
    },
    // first/last-touch attribution: every purchase credited to the
    // opener and closer touch (view/click/signup) within 3 days, per
    // user — one range-framed window, organic conversions read null
    "events_attribution" -> { (s, dir) =>
      graft.ops.Funnel.attribution(
        events(s, dir),
        touchTypes = Seq("view", "click", "signup"),
        convType = "purchase",
        windowUs = 259200000000L)
    },
    // the MULTI-touch credit split over the same funnel: every touch in
    // the 3-day window shares the conversion, rank-linear recency decay,
    // exact-integer ppm credits per (conversion, touch) row
    "events_attribution_credit" -> { (s, dir) =>
      graft.ops.Funnel.attributionCredit(
        events(s, dir),
        touchTypes = Seq("view", "click", "signup"),
        convType = "purchase",
        windowUs = 259200000000L)
    },
    // gaps-and-islands: each event opens a value-minutes activity
    // interval; per user, intervals within 6h of the running coverage
    // edge stitch into islands — uptime math over session-grain rows,
    // zero-width intervals dropped (the half-open convention)
    "events_islands" -> { (s, dir) =>
      val iv = events(s, dir)
        .filter(col("user_id").isNotNull)
        .select(
          col("user_id"),
          col("ts_us").as("s_us"),
          (col("ts_us") + expr("CAST(round(value * 60000000, 0) AS BIGINT)")).as("e_us"))
      graft.ops.Relational.mergeIntervals(iv, "user_id", "s_us", "e_us", gapUnits = 21600000000L)
    },
    // sweep-line peak concurrency per type over the same value-minutes
    // intervals: +-1 deltas, running sum, earliest-peak argmax
    "events_concurrency" -> { (s, dir) =>
      val iv = events(s, dir)
        .select(
          col("event_type"),
          col("ts_us").as("s_us"),
          (col("ts_us") + expr("CAST(round(value * 60000000, 0) AS BIGINT)")).as("e_us"))
      graft.ops.Relational.maxConcurrency(iv, "event_type", "s_us", "e_us")
    },
    // same answer with hot-key serial work bounded by one-hour buckets:
    // in-bucket prefix sums + bucket-grain offset cumsum
    "events_concurrency_bucketed" -> { (s, dir) =>
      val iv = events(s, dir)
        .select(
          col("event_type"),
          col("ts_us").as("s_us"),
          (col("ts_us") + expr("CAST(round(value * 60000000, 0) AS BIGINT)")).as("e_us"))
      graft.ops.Relational
        .maxConcurrencyBucketed(iv, "event_type", "s_us", "e_us", bucketUs = 3600000000L)
    },
    // users-who-did-A-also-did-B over distinct (user, type) baskets:
    // hub-capped pairing, integer lift vs independence
    "events_cobasket" -> { (s, dir) =>
      graft.ops.Funnel.coOccurrence(events(s, dir), "user_id", "event_type")
    },
    // robust outliers: exact median/MAD per lang, integer decision —
    // immune to the very outliers the mean/sigma test is skewed by
    "stats_mad_outliers" -> { (s, dir) =>
      Stats.madOutliers(docs(s, dir), "lang", "n_chars", "doc_id")
    },
    "stats_winsorize" -> { (s, dir) =>
      Stats
        .winsorizeByGroup(docs(s, dir), "lang", "n_chars", loPct = 10, hiPct = 90)
        .select(
          col("doc_id"),
          col("lang"),
          col("n_chars").cast("long").as("n_chars"),
          col("n_chars_w"))
    },
    // Hot-key join via explicit salting: event_type has 5 values (extreme
    // key skew), so the per-type dim joins on (type, salt) with the dim
    // replicated salt-ways. Row-identical to the plain join the oracle runs.
    "skew_salted_join" -> { (s, dir) =>
      val ev = events(s, dir)
      val dim = ev
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("type_total"))
      graft.ops.Skew
        .saltedJoin(ev, dim, key = "event_type", disambig = "event_id", saltFactor = 8)
        .groupBy("event_type", "type_total")
        .agg(
          count(lit(1)).cast("long").as("n"),
          sum(col("value").cast("decimal(14,2)")).cast("double").as("sum_value"))
    },
    // semi-structured extraction: the props column is a JSON string;
    // schema-on-read pulls k out per row (from_json with an explicit
    // schema — codegen-friendly, no sampling pass) and aggregates on it
    "events_json_extract" -> { (s, dir) =>
      s.read
        .parquet(s"$dir/events.parquet")
        .select(
          col("event_type"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(
            Seq(org.apache.spark.sql.types.StructField(
              "k",
              org.apache.spark.sql.types.LongType)))).getField("k").as("k"))
        .groupBy(col("event_type"), (col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).cast("long").as("n"), max("k").cast("long").as("max_k"))
    },
    // SCD2 validity intervals from an event stream: each user's events
    // become [ts, next-ts) rows, the open row marked by a null valid_to —
    // the standard dimension-history build, one window per key.
    "scd2_intervals" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      events(s, dir)
        .filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id"), col("ts_us"), col("value"))
        .withColumn("valid_from", col("ts_us"))
        .withColumn("valid_to", lead(col("ts_us"), 1).over(w))
        .select("user_id", "event_id", "valid_from", "valid_to", "value")
    },
    // pivot: event counts per user bucketed by type, wide — the
    // fixed-value-list pivot (dynamic discovery would be a driver round
    // trip; production pipelines pin the list for exactly that reason)
    "events_pivot" -> { (s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "error", "signup"))
        .agg(count(lit(1)).cast("long"))
        .select(
          col("user_id"),
          coalesce(col("click"), lit(0L)).as("n_click"),
          coalesce(col("view"), lit(0L)).as("n_view"),
          coalesce(col("purchase"), lit(0L)).as("n_purchase"),
          coalesce(col("error"), lit(0L)).as("n_error"),
          coalesce(col("signup"), lit(0L)).as("n_signup"))
    },
    // unpivot (melt) back to long form: wide per-user counts -> (user,
    // metric, n) rows; stack() stays whole-stage-codegen, one narrow pass
    "events_unpivot" -> { (s, dir) =>
      events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view"))
        .agg(count(lit(1)).cast("long"))
        .select(
          col("user_id"),
          coalesce(col("click"), lit(0L)).as("n_click"),
          coalesce(col("view"), lit(0L)).as("n_view"))
        .select(
          col("user_id"),
          expr("stack(2, 'click', n_click, 'view', n_view) AS (metric, n)"))
    },
    // ntile: spend quartiles per user from total purchase value, ordered
    // deterministically (value desc, then user_id). Computed by
    // Relational.globalNtile — range shuffle + partition offsets, NOT the
    // single-partition global window NTILE forces — and hash-identical to
    // the oracle's NTILE(4) OVER (ORDER BY ...) by the SQL bucket rule.
    "events_ntile" -> { (s, dir) =>
      val spend = events(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(sum(col("value").cast("decimal(14,2)")).as("spend"))
      graft.ops.Relational
        .globalNtile(spend, Seq(col("spend").desc, col("user_id")), n = 4, tileCol = "quartile")
        .select(col("user_id"), col("spend").cast("double").as("spend"), col("quartile"))
    },
    "corpus_pack" -> { (s, dir) =>
      Corpus.packGreedy(docs(s, dir), ctxTokens = 2048, shardSize = 256)
    },
    "vocab_min_df" -> { (s, dir) =>
      graft.ops.TextAnalysis.vocabulary(docs(s, dir), minDf = 2)
    },
    // Top-k rows per group via ranked window — Catalyst turns the
    // rank-then-filter into a map-side WindowGroupLimit, so each partition
    // forwards at most k rows per group to the shuffle.
    "topk_per_group" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      docs(s, dir)
        .withColumn(
          "rk",
          row_number()
            .over(Window.partitionBy("source").orderBy(col("n_chars").desc, col("doc_id")))
            .cast("int"))
        .filter(col("rk") <= 3)
        .select("source", "doc_id", "n_chars", "rk")
    },
    // Batch MERGE (CDC apply): a synthesized change feed — deletes,
    // two-version updates (latest-by-seq must win), inserts of new keys,
    // and a delete of a key that never existed — applied onto the orders
    // snapshot in one agg + one full-outer join. The % 23 probe keeps the
    // checked surface row-level without dumping the whole snapshot.
    "cdc_merge" -> { (s, dir) =>
      val t = s.read
        .parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val k = col("o_orderkey")
      def ch(filter: Column, key: Column, status: Column, price: Column, seq: Long, op: String) =
        t.filter(filter)
          .select(
            key.as("o_orderkey"),
            col("o_custkey"),
            status.as("o_orderstatus"),
            price.as("o_totalprice"),
            lit(seq).as("seq"),
            lit(op).as("op"))
      val changes = ch(k % 10 === 0, k, col("o_orderstatus"), col("o_totalprice"), 1L, "D")
        .unionByName(ch(k % 10 === 1, k, lit("STALE"), lit(0.0), 1L, "U"))
        .unionByName(ch(k % 10 === 1, k, lit("UPD"), col("o_custkey").cast("double"), 2L, "U"))
        .unionByName(ch(k % 10 === 2, k + 1000000L, lit("NEW"), lit(1.0), 1L, "I"))
        .unionByName(ch(k % 10 === 3, k + 2000000L, col("o_orderstatus"), col("o_totalprice"), 1L, "D"))
      Relational
        .mergeApply(t, changes, Seq("o_orderkey"))
        .filter(col("o_orderkey") % 23 === 0)
    }
  )

  /** Forward as-of (next purchase at-or-after each click) — shared by the
    * plain and bucketed variants, whose outputs are contract-identical.
    */
  private val asofForwardSql =
    """WITH tagged AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side,
      |         CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END AS p_ts,
      |         CASE WHEN event_type = 'purchase' THEN value END AS p_val
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |), attached AS (
      |  SELECT user_id, ts_us, event_id, side,
      |         FIRST_VALUE(p_ts IGNORE NULLS) OVER win AS purchase_ts_us,
      |         FIRST_VALUE(p_val IGNORE NULLS) OVER win AS purchase_value
      |  FROM tagged
      |  WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, side, event_id
      |                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |)
      |SELECT event_id, user_id, ts_us, purchase_ts_us, purchase_value
      |FROM attached WHERE side = 0""".stripMargin

  /** Shared tagged-union + two-frame window CTEs of the nearest as-of
    * oracles: backward candidate via LAST_VALUE over the preceding frame,
    * forward via FIRST_VALUE over the following frame of the same sort
    * (clicks sort before purchases at equal ts, so a simultaneous click
    * is the backward candidate at distance 0 — matching the operator).
    */
  private val nearestAttachedCtes =
    """tagged AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
      |         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side,
      |         CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS c_ts,
      |         CASE WHEN event_type = 'click' THEN value END AS c_val
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |), attached AS (
      |  SELECT user_id, ts_us, event_id, side,
      |         LAST_VALUE(c_ts IGNORE NULLS) OVER wb AS b_ts,
      |         LAST_VALUE(c_val IGNORE NULLS) OVER wb AS b_val,
      |         FIRST_VALUE(c_ts IGNORE NULLS) OVER wf AS f_ts,
      |         FIRST_VALUE(c_val IGNORE NULLS) OVER wf AS f_val
      |  FROM tagged
      |  WINDOW wb AS (PARTITION BY user_id ORDER BY ts_us, side, event_id
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |         wf AS (PARTITION BY user_id ORDER BY ts_us, side, event_id
      |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |)""".stripMargin

  /** Both directions' candidates from the two frames of ONE sort; the
    * CASE picks the closer (ties backward). Single-source-row note as
    * asof_join_tolerance: clicks carry both payloads, so b_ts/f_ts gate
    * both columns consistently. Shared by the plain and bucketed nearest
    * (contract-identical outputs).
    */
  private lazy val asofNearestSql =
    s"""WITH $nearestAttachedCtes
       |SELECT event_id, user_id, ts_us,
       |       CASE WHEN b_ts IS NOT NULL AND f_ts IS NOT NULL
       |            THEN CASE WHEN ts_us - b_ts <= f_ts - ts_us THEN b_ts ELSE f_ts END
       |            ELSE COALESCE(b_ts, f_ts) END AS click_ts_us,
       |       CASE WHEN b_ts IS NOT NULL AND f_ts IS NOT NULL
       |            THEN CASE WHEN ts_us - b_ts <= f_ts - ts_us THEN b_val ELSE f_val END
       |            ELSE COALESCE(b_val, f_val) END AS click_value
       |FROM attached WHERE side = 1""".stripMargin

  // KMV sketch: 56-bit md5-prefix hashes, k = 64 minima per group,
  // estimator (k-1)·2^56 div h_k once the sketch is full (63·2^56 below)
  private val kmvSql =
    """WITH hv AS (
      |  SELECT DISTINCT event_type AS grp,
      |    list_sum(list_transform(range(0, 14), i ->
      |      (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), i + 1, 1)) - 1)::BIGINT
      |        << (4 * (13 - i)))) AS h
      |  FROM events WHERE user_id IS NOT NULL),
      |r AS (SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rk FROM hv),
      |a AS (SELECT grp, COUNT(*) AS n_kept, MAX(h) AS h_k FROM r WHERE rk <= 64 GROUP BY grp)
      |SELECT grp AS event_type, CAST(n_kept AS BIGINT) AS n_kept,
      |       CAST(CASE WHEN n_kept < 64 THEN n_kept
      |            ELSE 4539628424389459968 // h_k END AS BIGINT) AS est_distinct
      |FROM a""".stripMargin

  // KMV overlap: each half's k=64 sketch, side-flagged union re-trimmed to
  // k, Beyer-style intersection estimator (integer milli Jaccard)
  private val kmvOverlapSql =
    """WITH hv AS (
      |  SELECT DISTINCT event_type AS grp, event_id % 2 AS side,
      |    list_sum(list_transform(range(0, 14), i ->
      |      (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), i + 1, 1)) - 1)::BIGINT
      |        << (4 * (13 - i)))) AS h
      |  FROM events WHERE user_id IS NOT NULL),
      |r AS (SELECT grp, side, h,
      |        row_number() OVER (PARTITION BY grp, side ORDER BY h) AS rk FROM hv),
      |sk AS (SELECT grp, h,
      |         MAX(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS in_a,
      |         MAX(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS in_b
      |       FROM r WHERE rk <= 64 GROUP BY grp, h),
      |u AS (SELECT grp, h, in_a, in_b,
      |        row_number() OVER (PARTITION BY grp ORDER BY h) AS rk FROM sk),
      |a AS (SELECT grp, COUNT(*) AS n_kept, MAX(h) AS h_k,
      |        SUM(in_a * in_b) AS n_both
      |      FROM u WHERE rk <= 64 GROUP BY grp),
      |est AS (SELECT *, CASE WHEN n_kept < 64 THEN n_kept
      |                       ELSE 4539628424389459968 // h_k END AS est_union
      |        FROM a)
      |SELECT grp AS event_type, CAST(n_kept AS BIGINT) AS n_kept,
      |       CAST(n_both AS BIGINT) AS n_both,
      |       CAST(est_union AS BIGINT) AS est_union,
      |       CAST(n_both * est_union // n_kept AS BIGINT) AS est_intersect,
      |       CAST(n_both * 1000 // n_kept AS BIGINT) AS jaccard_milli
      |FROM est""".stripMargin

  // fixed-grid histogram sketch: 256 buckets over [0, 1024000) milli,
  // bucket = clamped-milli·256 // 1024000; quantile q = first bucket whose
  // cumulative count reaches (q·n + 999) // 1000, with integer bucket
  // edges. One SQL for all three faces: merged shards and the streamed
  // store must answer like the whole-corpus sketch (linearity).
  private val histSql =
    """WITH sk AS (
      |  SELECT event_type AS grp,
      |         (GREATEST(CAST(0 AS BIGINT),
      |                   LEAST(CAST(round(CAST(value AS DOUBLE) * 1000, 0) AS BIGINT),
      |                         1023999)) * 256) // 1024000 AS bucket,
      |         CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events WHERE value IS NOT NULL
      |  GROUP BY 1, 2),
      |cum AS (
      |  SELECT grp, bucket, SUM(cnt) OVER (PARTITION BY grp ORDER BY bucket) AS cum FROM sk),
      |tot AS (SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n FROM sk GROUP BY 1),
      |tq AS (
      |  SELECT grp, n, q_milli, (q_milli * n + 999) // 1000 AS target
      |  FROM tot CROSS JOIN (SELECT CAST(unnest([250, 500, 900, 990]) AS BIGINT) AS q_milli)),
      |sel AS (
      |  SELECT t.grp, t.q_milli, t.n, MIN(c.bucket) AS bucket
      |  FROM tq t JOIN cum c ON t.grp = c.grp AND c.cum >= t.target
      |  GROUP BY 1, 2, 3)
      |SELECT grp AS event_type, q_milli, n, bucket,
      |       CAST((bucket * 1024000) // 256 AS BIGINT) AS lo_milli,
      |       CAST(((bucket + 1) * 1024000) // 256 AS BIGINT) AS hi_milli
      |FROM sel""".stripMargin

  // EWMA: per index i, fold the sorted prefix lst[1:i] with a SCALAR
  // struct accumulator (DuckDB 1.0's list_reduce drops LIST-typed struct
  // fields between steps, so the append-an-output-array shape is
  // unusable; the O(n^2) prefix fold is exact and fixture-cheap). The
  // `s` field binds BEFORE `k` so it reads the still-old accumulator
  // under struct_pack's let-chaining (the events_cusum lesson).
  // sweep line: value-minutes intervals, half-open delta ordering,
  // running concurrency, earliest timestamp attaining the peak
  private val concurrencySql =
    """WITH iv AS (
      |  SELECT event_type AS k, epoch_us(ts) AS s,
      |         epoch_us(ts) + CAST(round(value * 60000000, 0) AS BIGINT) AS e
      |  FROM events
      |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
      |f AS (SELECT * FROM iv WHERE e > s),
      |d AS (SELECT k, s AS t, CAST(1 AS BIGINT) AS dd FROM f
      |      UNION ALL SELECT k, e, -1 FROM f),
      |r AS (
      |  SELECT k, t,
      |         SUM(dd) OVER (PARTITION BY k ORDER BY t, dd
      |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      |  FROM d),
      |best AS (
      |  SELECT k, run, t, ROW_NUMBER() OVER (PARTITION BY k ORDER BY run DESC, t) AS rn
      |  FROM r),
      |n AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_intervals FROM f GROUP BY 1)
      |SELECT n.k AS event_type, n.n_intervals,
      |       CAST(best.run AS BIGINT) AS peak, CAST(best.t AS BIGINT) AS peak_ts
      |FROM n JOIN best ON best.k = n.k AND best.rn = 1""".stripMargin

  // step-series TWAP: LEAD per type (ties by value, matching the Spark
  // window), last sample weightless, trunc-div milli result
  private val twapSql =
    """WITH s AS (
      |  SELECT event_type AS k, epoch_us(ts) AS t,
      |         CAST(round(value * 1000, 0) AS BIGINT) AS v
      |  FROM events
      |  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
      |l AS (
      |  SELECT k, t, v, LEAD(t) OVER (PARTITION BY k ORDER BY t, v) AS nxt FROM s),
      |d AS (SELECT k, t, v, COALESCE(nxt - t, 0) AS dur FROM l)
      |SELECT k AS event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |       MIN(t) AS ts_first, MAX(t) AS ts_last,
      |       CAST(SUM(dur) AS BIGINT) AS held_us,
      |       CAST(CASE WHEN SUM(dur) > 0
      |            THEN SUM(CAST(v AS HUGEINT) * dur) // SUM(dur) END AS BIGINT) AS twap_milli
      |FROM d GROUP BY 1""".stripMargin

  private val ewmaSql =
    """WITH c AS (
      |  SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS ts_us, event_type,
      |         CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |g AS (
      |  SELECT event_type,
      |         list(struct_pack(s := CAST(0 AS BIGINT), k := CAST(0 AS BIGINT),
      |                          ts := CAST(ts_us AS BIGINT), xm := CAST(1000 * n AS BIGINT))
      |              ORDER BY ts_us, n) AS lst
      |  FROM c GROUP BY 1),
      |r AS (SELECT event_type, lst, unnest(range(1, len(lst) + 1)) AS i FROM g)
      |SELECT event_type,
      |       CAST(lst[i].ts AS BIGINT) AS ts,
      |       CAST(lst[i].xm AS BIGINT) AS x_milli,
      |       CAST((list_reduce(
      |         list_prepend(struct_pack(s := CAST(0 AS BIGINT), k := CAST(0 AS BIGINT),
      |                                  ts := CAST(0 AS BIGINT), xm := CAST(0 AS BIGINT)),
      |                      lst[1:i]),
      |         (acc, e) -> struct_pack(
      |           s := CASE WHEN acc.k = 0 THEN e.xm
      |                     ELSE (300 * e.xm + 700 * acc.s) // 1000 END,
      |           k := acc.k + 1,
      |           ts := acc.ts, xm := acc.xm))).s AS BIGINT) AS ewma_milli
      |FROM r""".stripMargin

  // deterministic HLL: bucket = first md5 byte, rank = leading zeros + 1
  // of the next 32 bits (bin() has no leading zeros; chunk 0 -> 33);
  // register sum exact-integer at 2^33 scale, float only in the last op
  private val hllSql = {
    val d = "'0123456789abcdef'"
    def dig(i: Int) = s"(strpos($d, substr(h, $i, 1)) - 1)"
    val chunkExpr = (3 to 10)
      .map(i => s"${dig(i)} * ${1L << (4 * (10 - i))}")
      .mkString(" + ")
    s"""WITH vals AS (
       |  SELECT DISTINCT event_type AS grp, CAST(user_id AS VARCHAR) AS sv
       |  FROM events WHERE user_id IS NOT NULL),
       |hx AS (SELECT grp, md5(sv) AS h FROM vals),
       |br AS (
       |  SELECT grp,
       |         CAST(${dig(1)} * 16 + ${dig(2)} AS BIGINT) AS bucket,
       |         CAST($chunkExpr AS BIGINT) AS chunk
       |  FROM hx),
       |reg AS (
       |  SELECT grp, bucket,
       |         MAX(CASE WHEN chunk = 0 THEN 33 ELSE 33 - len(bin(chunk)) END) AS rho_max
       |  FROM br GROUP BY 1, 2),
       |ag AS (
       |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_hit,
       |         CAST(SUM(CAST(1 AS BIGINT) << CAST(33 - rho_max AS INT)) AS BIGINT) AS hit_scaled
       |  FROM reg GROUP BY 1),
       |est0 AS (
       |  SELECT grp AS event_type,
       |         CAST(256 - n_hit AS BIGINT) AS n_zero,
       |         CAST(hit_scaled + (256 - n_hit) * 8589934592 AS BIGINT) AS sum_scaled,
       |         round(0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 8589934592.0 /
       |               CAST(hit_scaled + (256 - n_hit) * 8589934592 AS DOUBLE), 4) AS est_raw,
       |         CASE WHEN 256 - n_hit > 0
       |              THEN round(256.0 * ln(256.0 / CAST(256 - n_hit AS DOUBLE)), 4) END AS est_small
       |  FROM ag)
       |SELECT *,
       |       CASE WHEN est_raw <= 640.0 AND n_zero > 0 THEN est_small ELSE est_raw END AS est
       |FROM est0""".stripMargin
  }

  // first-seen trick mirrored: min day per (type, user), per-day new
  // counts, cumulative over observed days (zero-new days are rows)
  private val cumulativeUsersSql =
    """WITH base AS (
      |  SELECT event_type AS grp, epoch_us(ts) // 86400000000 AS p, user_id AS id
      |  FROM events
      |  WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
      |fs AS (
      |  SELECT grp, MIN(p) AS p, id FROM base GROUP BY grp, id),
      |nn AS (SELECT grp, p, CAST(COUNT(*) AS BIGINT) AS n_new FROM fs GROUP BY 1, 2),
      |obs AS (SELECT DISTINCT grp, p FROM base)
      |SELECT obs.grp AS event_type, CAST(obs.p AS BIGINT) AS period,
      |       CAST(COALESCE(nn.n_new, 0) AS BIGINT) AS n_new,
      |       CAST(SUM(COALESCE(nn.n_new, 0))
      |              OVER (PARTITION BY obs.grp ORDER BY obs.p) AS BIGINT) AS n_total
      |FROM obs LEFT JOIN nn ON nn.grp = obs.grp AND nn.p = obs.p""".stripMargin

  // sliding HLL: per-day registers, bucket grid, MAX over a 7-day RANGE
  // frame, then the stats_hll estimate chain keyed by (grp, day)
  private val hllSlidingSql = {
    val d = "'0123456789abcdef'"
    def dig(i: Int) = s"(strpos($d, substr(h, $i, 1)) - 1)"
    val chunkExpr = (3 to 10)
      .map(i => s"${dig(i)} * ${1L << (4 * (10 - i))}")
      .mkString(" + ")
    s"""WITH vals AS (
       |  SELECT DISTINCT event_type AS grp, epoch_us(ts) // 86400000000 AS p,
       |         CAST(user_id AS VARCHAR) AS sv
       |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
       |hx AS (SELECT grp, p, md5(sv) AS h FROM vals),
       |reg AS MATERIALIZED (
       |  SELECT grp, p,
       |         CAST(${dig(1)} * 16 + ${dig(2)} AS BIGINT) AS bucket,
       |         MAX(CASE WHEN CAST($chunkExpr AS BIGINT) = 0 THEN 33
       |                  ELSE 33 - len(bin(CAST($chunkExpr AS BIGINT))) END) AS rho_max
       |  FROM hx GROUP BY 1, 2, 3),
       |grid AS (
       |  SELECT pp.grp, pp.p, bb.bucket
       |  FROM (SELECT DISTINCT grp, p FROM reg) pp
       |  JOIN (SELECT DISTINCT grp, bucket FROM reg) bb ON bb.grp = pp.grp),
       |mg AS (
       |  SELECT g.grp, g.p, g.bucket,
       |         MAX(r.rho_max) OVER (PARTITION BY g.grp, g.bucket ORDER BY g.p
       |           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS rho_w
       |  FROM grid g LEFT JOIN reg r
       |    ON r.grp = g.grp AND r.p = g.p AND r.bucket = g.bucket),
       |live AS (SELECT grp, p, rho_w FROM mg WHERE rho_w IS NOT NULL),
       |ag AS (
       |  SELECT grp, p, CAST(COUNT(*) AS BIGINT) AS n_hit,
       |         CAST(SUM(CAST(1 AS BIGINT) << CAST(33 - rho_w AS INT)) AS BIGINT) AS hit_scaled
       |  FROM live GROUP BY 1, 2),
       |est0 AS (
       |  SELECT grp AS event_type, CAST(p AS BIGINT) AS period,
       |         CAST(256 - n_hit AS BIGINT) AS n_zero,
       |         CAST(hit_scaled + (256 - n_hit) * 8589934592 AS BIGINT) AS sum_scaled,
       |         round(0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 8589934592.0 /
       |               CAST(hit_scaled + (256 - n_hit) * 8589934592 AS DOUBLE), 4) AS est_raw,
       |         CASE WHEN 256 - n_hit > 0
       |              THEN round(256.0 * ln(256.0 / CAST(256 - n_hit AS DOUBLE)), 4)
       |         END AS est_small
       |  FROM ag)
       |SELECT *,
       |       CASE WHEN est_raw <= 640.0 AND n_zero > 0 THEN est_small ELSE est_raw END AS est
       |FROM est0""".stripMargin
  }

  // derived-grid histogram: grid = corpus [min, max+1) milli, then the
  // identical bucket/cumulative/target walk as histSql
  private val histAutoSql =
    """WITH vm AS (
      |  SELECT event_type AS grp, CAST(round(CAST(value AS DOUBLE) * 1000, 0) AS BIGINT) AS vm
      |  FROM events WHERE value IS NOT NULL),
      |grid AS (SELECT MIN(vm) AS lo, MAX(vm) + 1 AS hi FROM vm),
      |sk AS (
      |  SELECT grp,
      |         ((GREATEST(g.lo, LEAST(vm, g.hi - 1)) - g.lo) * 256) // (g.hi - g.lo) AS bucket,
      |         CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM vm CROSS JOIN grid g GROUP BY 1, 2),
      |cum AS (
      |  SELECT grp, bucket, SUM(cnt) OVER (PARTITION BY grp ORDER BY bucket) AS cum FROM sk),
      |tot AS (SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n FROM sk GROUP BY 1),
      |tq AS (
      |  SELECT grp, n, q_milli, (q_milli * n + 999) // 1000 AS target
      |  FROM tot CROSS JOIN (SELECT CAST(unnest([250, 500, 900, 990]) AS BIGINT) AS q_milli)),
      |sel AS (
      |  SELECT t.grp, t.q_milli, t.n, MIN(c.bucket) AS bucket
      |  FROM tq t JOIN cum c ON t.grp = c.grp AND c.cum >= t.target
      |  GROUP BY 1, 2, 3)
      |SELECT grp AS event_type, q_milli, n, bucket,
      |       CAST(g.lo + (bucket * (g.hi - g.lo)) // 256 AS BIGINT) AS lo_milli,
      |       CAST(g.lo + ((bucket + 1) * (g.hi - g.lo)) // 256 AS BIGINT) AS hi_milli
      |FROM sel CROSS JOIN grid g""".stripMargin

  // per-group derived grids: each group's own [min, max+1) milli domain
  private val histPerGroupSql =
    """WITH vm AS (
      |  SELECT event_type AS grp, CAST(round(CAST(value AS DOUBLE) * 1000, 0) AS BIGINT) AS vm
      |  FROM events WHERE value IS NOT NULL),
      |grid AS (SELECT grp, MIN(vm) AS lo, MAX(vm) + 1 AS hi FROM vm GROUP BY 1),
      |sk AS (
      |  SELECT v.grp, ((v.vm - g.lo) * 256) // (g.hi - g.lo) AS bucket,
      |         CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM vm v JOIN grid g ON g.grp = v.grp GROUP BY 1, 2),
      |cum AS (
      |  SELECT grp, bucket, SUM(cnt) OVER (PARTITION BY grp ORDER BY bucket) AS cum FROM sk),
      |tot AS (SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n FROM sk GROUP BY 1),
      |tq AS (
      |  SELECT grp, n, q_milli, (q_milli * n + 999) // 1000 AS target
      |  FROM tot CROSS JOIN (SELECT CAST(unnest([250, 500, 900, 990]) AS BIGINT) AS q_milli)),
      |sel AS (
      |  SELECT t.grp, t.q_milli, t.n, MIN(c.bucket) AS bucket
      |  FROM tq t JOIN cum c ON t.grp = c.grp AND c.cum >= t.target
      |  GROUP BY 1, 2, 3)
      |SELECT s.grp AS event_type, s.q_milli, s.n, s.bucket,
      |       CAST(g.lo + (s.bucket * (g.hi - g.lo)) // 256 AS BIGINT) AS lo_milli,
      |       CAST(g.lo + ((s.bucket + 1) * (g.hi - g.lo)) // 256 AS BIGINT) AS hi_milli
      |FROM sel s JOIN grid g ON g.grp = s.grp""".stripMargin

  // count-min sketch: row d's bucket = md5 hex digits 2d+1..2d+2 (0..255),
  // 4 rows; estimate = min over rows of the item's counter
  private val cmsSql =
    """WITH tokraw AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS tok
      |  FROM documents),
      |hx AS (SELECT tok, md5(tok) AS h FROM tokraw),
      |dd AS (SELECT unnest([0, 1, 2, 3]) AS d),
      |cells AS (
      |  SELECT d, (strpos('0123456789abcdef', substr(h, d * 2 + 1, 1)) - 1) * 16
      |            + strpos('0123456789abcdef', substr(h, d * 2 + 2, 1)) - 1 AS bucket,
      |         COUNT(*) AS cnt
      |  FROM hx CROSS JOIN dd GROUP BY 1, 2),
      |items AS (SELECT DISTINCT tok, md5(tok) AS h FROM tokraw),
      |pq AS (
      |  SELECT i.tok AS item, dd.d,
      |         (strpos('0123456789abcdef', substr(i.h, dd.d * 2 + 1, 1)) - 1) * 16
      |          + strpos('0123456789abcdef', substr(i.h, dd.d * 2 + 2, 1)) - 1 AS bucket
      |  FROM items i CROSS JOIN dd)
      |SELECT p.item, CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS est_count
      |FROM pq p LEFT JOIN cells c ON p.d = c.d AND p.bucket = c.bucket
      |GROUP BY 1""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "asof_join_events" ->
      """WITH tagged AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side,
        |         CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS c_ts,
        |         CASE WHEN event_type = 'click' THEN value END AS c_val
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |), attached AS (
        |  SELECT user_id, ts_us, event_id, side,
        |         LAST_VALUE(c_ts IGNORE NULLS) OVER win AS click_ts_us,
        |         LAST_VALUE(c_val IGNORE NULLS) OVER win AS click_value
        |  FROM tagged
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, side, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_id, user_id, ts_us, click_ts_us, click_value
        |FROM attached WHERE side = 1""".stripMargin,
    // The declarative twin of windowAggJoin: an inequality LEFT JOIN +
    // GROUP BY, which DuckDB executes fine at oracle scale but Spark must
    // not (BNLJ) — hence the operator's range-window rewrite.
    "asof_window_agg" ->
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
        |       CAST(COUNT(c.value) AS BIGINT) AS w_cnt,
        |       CAST(SUM(CAST(c.value AS DECIMAL(14,2))) AS DOUBLE) AS w_sum,
        |       CAST(MAX(CAST(c.value AS DECIMAL(14,2))) AS DOUBLE) AS w_max
        |FROM events p
        |LEFT JOIN events c
        |  ON c.event_type = 'click'
        | AND c.user_id = p.user_id
        | AND epoch_us(c.ts) BETWEEN epoch_us(p.ts) - 1800000000 AND epoch_us(p.ts)
        |WHERE p.event_type = 'purchase'
        |GROUP BY 1, 2, 3""".stripMargin,
    // contract-identical to the plain window-agg join — same oracle
    "asof_window_agg_bucketed" ->
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
        |       CAST(COUNT(c.value) AS BIGINT) AS w_cnt,
        |       CAST(SUM(CAST(c.value AS DECIMAL(14,2))) AS DOUBLE) AS w_sum,
        |       CAST(MAX(CAST(c.value AS DECIMAL(14,2))) AS DOUBLE) AS w_max
        |FROM events p
        |LEFT JOIN events c
        |  ON c.event_type = 'click'
        | AND c.user_id = p.user_id
        | AND epoch_us(c.ts) BETWEEN epoch_us(p.ts) - 1800000000 AND epoch_us(p.ts)
        |WHERE p.event_type = 'purchase'
        |GROUP BY 1, 2, 3""".stripMargin,
    "skew_key_profile" ->
      """WITH c AS (
        |  SELECT COALESCE(CAST(user_id AS VARCHAR), '(null)') AS key,
        |         CAST(COUNT(*) AS BIGINT) AS n_rows
        |  FROM events GROUP BY 1),
        |s AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total,
        |             CAST(COUNT(*) AS BIGINT) AS n_keys FROM c)
        |SELECT c.key, c.n_rows,
        |       CAST(c.n_rows * 1000000 // s.total AS BIGINT) AS share_ppm,
        |       s.total AS total_rows, s.n_keys
        |FROM c, s ORDER BY c.n_rows DESC, c.key LIMIT 10""".stripMargin,
    "audit_join_cardinality" ->
      """WITH lc AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key, CAST(COUNT(*) AS BIGINT) AS n_left
        |  FROM events WHERE event_type = 'click' AND user_id IS NOT NULL GROUP BY 1),
        |rc AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key, CAST(COUNT(*) AS BIGINT) AS n_right
        |  FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL GROUP BY 1),
        |j AS (
        |  SELECT key, n_left, n_right, CAST(n_left * n_right AS BIGINT) AS n_out
        |  FROM lc JOIN rc USING (key)),
        |t AS (SELECT CAST(SUM(n_out) AS BIGINT) AS total_out FROM j)
        |SELECT j.key, j.n_left, j.n_right, j.n_out, t.total_out,
        |       CAST(j.n_out * 1000000 // t.total_out AS BIGINT) AS share_ppm
        |FROM j, t ORDER BY j.n_out DESC, j.key LIMIT 10""".stripMargin,
    // The fixture's clicks carry both payloads non-null from the same row,
    // so one matched-ts gates both columns (per-column independent aging
    // is pinned by the RelationalSpec split-payload case).
    "asof_join_tolerance" ->
      """WITH tagged AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side,
        |         CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS c_ts,
        |         CASE WHEN event_type = 'click' THEN value END AS c_val
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |), attached AS (
        |  SELECT user_id, ts_us, event_id, side,
        |         LAST_VALUE(c_ts IGNORE NULLS) OVER win AS m_ts,
        |         LAST_VALUE(c_val IGNORE NULLS) OVER win AS m_val
        |  FROM tagged
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, side, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_id, user_id, ts_us,
        |       CASE WHEN m_ts >= ts_us - 3600000000 THEN m_ts END AS click_ts_us,
        |       CASE WHEN m_ts >= ts_us - 3600000000 THEN m_val END AS click_value
        |FROM attached WHERE side = 1""".stripMargin,
    // Both directions' candidates from the two frames of ONE sort; the
    // CASE picks the closer (ties backward). Single-source-row note as
    // asof_join_tolerance: clicks carry both payloads, so b_ts/f_ts gate
    // both columns consistently.
    "asof_join_nearest" -> asofNearestSql,
    // bucketed nearest is contract-identical to the plain nearest
    "asof_join_nearest_bucketed" -> asofNearestSql,
    "asof_join_nearest_tolerance" ->
      s"""WITH $nearestAttachedCtes,
         |tol AS (
         |  SELECT event_id, user_id, ts_us, side,
         |         CASE WHEN b_ts >= ts_us - 3600000000 THEN b_ts END AS b_ts,
         |         CASE WHEN b_ts >= ts_us - 3600000000 THEN b_val END AS b_val,
         |         CASE WHEN f_ts <= ts_us + 3600000000 THEN f_ts END AS f_ts,
         |         CASE WHEN f_ts <= ts_us + 3600000000 THEN f_val END AS f_val
         |  FROM attached)
         |SELECT event_id, user_id, ts_us,
         |       CASE WHEN b_ts IS NOT NULL AND f_ts IS NOT NULL
         |            THEN CASE WHEN ts_us - b_ts <= f_ts - ts_us THEN b_ts ELSE f_ts END
         |            ELSE COALESCE(b_ts, f_ts) END AS click_ts_us,
         |       CASE WHEN b_ts IS NOT NULL AND f_ts IS NOT NULL
         |            THEN CASE WHEN ts_us - b_ts <= f_ts - ts_us THEN b_val ELSE f_val END
         |            ELSE COALESCE(b_val, f_val) END AS click_value
         |FROM tol WHERE side = 1""".stripMargin,
    "asof_join_forward" -> asofForwardSql,
    // same single-source-row note as asof_join_tolerance: purchases carry
    // both payloads, so one matched ts gates both columns in the mirror
    "asof_join_forward_tolerance" ->
      """WITH tagged AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side,
        |         CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END AS p_ts,
        |         CASE WHEN event_type = 'purchase' THEN value END AS p_val
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |), attached AS (
        |  SELECT user_id, ts_us, event_id, side,
        |         FIRST_VALUE(p_ts IGNORE NULLS) OVER win AS m_ts,
        |         FIRST_VALUE(p_val IGNORE NULLS) OVER win AS m_val
        |  FROM tagged
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, side, event_id
        |                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |)
        |SELECT event_id, user_id, ts_us,
        |       CASE WHEN m_ts <= ts_us + 3600000000 THEN m_ts END AS purchase_ts_us,
        |       CASE WHEN m_ts <= ts_us + 3600000000 THEN m_val END AS purchase_value
        |FROM attached WHERE side = 0""".stripMargin,
    // contract-identical to the plain forward as-of, so same oracle
    "asof_join_forward_bucketed" -> asofForwardSql,
    // The bucketed operator's contract is bit-identical output to the
    // plain as-of join, so its oracle IS the plain as-of SQL.
    "asof_join_bucketed" ->
      """WITH tagged AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
        |         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS side,
        |         CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS c_ts,
        |         CASE WHEN event_type = 'click' THEN value END AS c_val
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |), attached AS (
        |  SELECT user_id, ts_us, event_id, side,
        |         LAST_VALUE(c_ts IGNORE NULLS) OVER win AS click_ts_us,
        |         LAST_VALUE(c_val IGNORE NULLS) OVER win AS click_value
        |  FROM tagged
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, side, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_id, user_id, ts_us, click_ts_us, click_value
        |FROM attached WHERE side = 1""".stripMargin,
    // Same chain construction in DuckDB window SQL: running max-end over
    // strictly-preceding rows flags chain starts; a running sum numbers
    // the chains; min/max/count collapse each chain. Ties on (start, end)
    // are identical rows, so every aggregate is tie-order-free.
    "intervals_coalesce" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) AS start_us,
        |         epoch_us(ts) + CAST(round(value * 1000000, 0) AS BIGINT) AS end_raw
        |  FROM events WHERE event_type = 'click'
        |), cl AS (
        |  SELECT user_id, start_us, greatest(end_raw, start_us) AS end_c FROM iv
        |), fl AS (
        |  SELECT user_id, start_us, end_c,
        |         MAX(end_c) OVER (PARTITION BY user_id ORDER BY start_us, end_c
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM cl
        |), ch AS (
        |  SELECT user_id, start_us, end_c,
        |         SUM(CASE WHEN prev_max IS NULL OR start_us > prev_max THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY start_us, end_c
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chain
        |  FROM fl
        |)
        |SELECT user_id, CAST(MIN(start_us) AS BIGINT) AS start_us,
        |       CAST(MAX(end_c) AS BIGINT) AS end_us,
        |       CAST(COUNT(*) AS BIGINT) AS n_merged
        |FROM ch GROUP BY user_id, chain""".stripMargin,
    "intervals_gaps" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) AS start_us,
        |         epoch_us(ts) + CAST(round(value * 1000000, 0) AS BIGINT) AS end_raw
        |  FROM events WHERE event_type = 'click'
        |), cl AS (
        |  SELECT user_id, start_us, greatest(end_raw, start_us) AS end_c FROM iv
        |), fl AS (
        |  SELECT user_id, start_us, end_c,
        |         MAX(end_c) OVER (PARTITION BY user_id ORDER BY start_us, end_c
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM cl
        |), ch AS (
        |  SELECT user_id, start_us, end_c,
        |         SUM(CASE WHEN prev_max IS NULL OR start_us > prev_max THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY start_us, end_c
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chain
        |  FROM fl)
        |SELECT user_id, gap_start, gap_end, gap_len FROM (
        |  SELECT user_id,
        |         CAST(end_us AS BIGINT) AS gap_start,
        |         CAST(LEAD(start_us) OVER (PARTITION BY user_id ORDER BY start_us) AS BIGINT) AS gap_end,
        |         CAST(LEAD(start_us) OVER (PARTITION BY user_id ORDER BY start_us) - end_us AS BIGINT) AS gap_len
        |  FROM (
        |    SELECT user_id, MIN(start_us) AS start_us, MAX(end_c) AS end_us
        |    FROM ch GROUP BY user_id, chain))
        |WHERE gap_end IS NOT NULL""".stripMargin,
    // The oracle MAY use the single-partition window — DuckDB is
    // single-node anyway; only the Spark plan must avoid it.
    "corpus_sample_pps" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         greatest(CAST(n_chars AS BIGINT), 0) AS weight,
        |         md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, weight,
        |         SUM(weight) OVER (ORDER BY h, doc_id
        |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t
        |)
        |SELECT doc_id, weight, CAST(cum AS BIGINT) AS cum
        |FROM c
        |WHERE (cum + 137) // 10000 > (cum - weight + 137) // 10000""".stripMargin,
    "corpus_token_budget" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         greatest(CAST(n_chars AS BIGINT), 0) AS weight,
        |         md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, weight,
        |         SUM(weight) OVER (ORDER BY h, doc_id
        |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t
        |)
        |SELECT doc_id, weight, CAST(cum AS BIGINT) AS cum
        |FROM c
        |WHERE cum - weight < 50000""".stripMargin,
    "range_join_incidents" ->
      """WITH inc AS (
        |  SELECT event_id AS incident_id, epoch_us(ts) AS start_us
        |  FROM events WHERE event_type = 'error' AND value > 200
        |)
        |SELECT i.incident_id, i.start_us,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(CAST(e.value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |FROM inc i
        |JOIN events e ON epoch_us(e.ts) >= i.start_us
        |             AND epoch_us(e.ts) < i.start_us + 1800000000
        |GROUP BY 1, 2""".stripMargin,
    "range_join_overlap" ->
      """WITH sess AS (
        |  SELECT event_id AS session_id, epoch_us(ts) AS s_start_us,
        |         epoch_us(ts) + CAST(round(value * 1000000, 0) AS BIGINT) AS s_end_us
        |  FROM events WHERE event_type = 'view'
        |), inc AS (
        |  SELECT event_id AS incident_id, epoch_us(ts) AS i_start_us,
        |         epoch_us(ts) + CAST(round(value * 60, 0) AS BIGINT) * 1000000 AS i_end_us
        |  FROM events WHERE event_type = 'error' AND value > 100
        |)
        |SELECT i.incident_id, i.i_start_us, i.i_end_us,
        |       CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |       CAST(SUM(s.s_end_us - s.s_start_us) AS BIGINT) AS sum_session_us
        |FROM inc i
        |JOIN sess s ON s.s_start_us < i.i_end_us AND i.i_start_us < s.s_end_us
        |            AND s.s_end_us > s.s_start_us
        |GROUP BY 1, 2, 3""".stripMargin,
    // identical semantics to range_join_overlap - the big face must
    // hash-match the broadcast face
    "range_join_overlap_big" ->
      """WITH sess AS (
        |  SELECT event_id AS session_id, epoch_us(ts) AS s_start_us,
        |         epoch_us(ts) + CAST(round(value * 1000000, 0) AS BIGINT) AS s_end_us
        |  FROM events WHERE event_type = 'view'
        |), inc AS (
        |  SELECT event_id AS incident_id, epoch_us(ts) AS i_start_us,
        |         epoch_us(ts) + CAST(round(value * 60, 0) AS BIGINT) * 1000000 AS i_end_us
        |  FROM events WHERE event_type = 'error' AND value > 100
        |)
        |SELECT i.incident_id, i.i_start_us, i.i_end_us,
        |       CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |       CAST(SUM(s.s_end_us - s.s_start_us) AS BIGINT) AS sum_session_us
        |FROM inc i
        |JOIN sess s ON s.s_start_us < i.i_end_us AND i.i_start_us < s.s_end_us
        |            AND s.s_end_us > s.s_start_us
        |GROUP BY 1, 2, 3""".stripMargin,
    "range_join_var" ->
      """WITH inc AS (
        |  SELECT event_id AS incident_id, epoch_us(ts) AS start_us,
        |         epoch_us(ts) + CAST(round(value * 60, 0) AS BIGINT) * 1000000 AS end_us
        |  FROM events WHERE event_type = 'error' AND value > 150
        |)
        |SELECT i.incident_id, i.start_us, i.end_us,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(CAST(e.value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |FROM inc i
        |JOIN events e ON epoch_us(e.ts) >= i.start_us
        |             AND epoch_us(e.ts) < i.end_us
        |GROUP BY 1, 2, 3""".stripMargin,
    "events_hopping_agg" ->
      """SELECT window_start_us, event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT (epoch_us(ts) // 1800000000) * 1800000000 - offs AS window_start_us,
        |         event_type, value
        |  FROM events
        |  CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (CAST(1800000000 AS BIGINT))) AS d(offs))
        |GROUP BY 1, 2""".stripMargin,
    "events_hopping_uniques" ->
      """SELECT window_start_us, event_type,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM (
        |  SELECT (epoch_us(ts) // 1800000000) * 1800000000 - offs AS window_start_us,
        |         event_type, user_id
        |  FROM events
        |  CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (CAST(1800000000 AS BIGINT))) AS d(offs))
        |GROUP BY 1, 2""".stripMargin,
    "corpus_importance_resample" ->
      """WITH tks AS (
        |  SELECT doc_id, lang,
        |         list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS tk
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, lang = 'en' AS is_target,
        |         unnest(list_transform(range(1, greatest(len(tk) - 1, 0) + 1),
        |                               i -> array_to_string(list_slice(tk, i, i + 1), ' '))) AS gram
        |  FROM tks),
        |b AS (
        |  SELECT doc_id, is_target,
        |         (strpos('0123456789abcdef', substr(md5(gram), 1, 1)) - 1) * 16
        |          + strpos('0123456789abcdef', substr(md5(gram), 2, 1)) - 1 AS bucket
        |  FROM grams),
        |dim AS (
        |  SELECT bucket, COUNT(*) AS q_cnt, COUNT(*) FILTER (is_target) AS p_cnt
        |  FROM b GROUP BY bucket),
        |tot AS (SELECT SUM(q_cnt) AS q_tot, SUM(p_cnt) AS p_tot FROM dim),
        |r AS (
        |  SELECT bucket,
        |         CAST((1000 * (p_cnt + 1) * (q_tot + 256))
        |              // ((q_cnt + 1) * (p_tot + 256)) AS BIGINT) AS ratio_milli
        |  FROM dim CROSS JOIN tot),
        |ds AS (
        |  SELECT b.doc_id, SUM(r.ratio_milli) AS s, COUNT(*) AS n
        |  FROM b JOIN r USING (bucket) GROUP BY b.doc_id)
        |SELECT d.doc_id,
        |       CAST(COALESCE(n, 0) AS BIGINT) AS n_grams,
        |       CAST(COALESCE(s // n, 0) AS BIGINT) AS score_milli,
        |       CAST(COALESCE(s // n, 0) AS BIGINT) >= 1000 AS keep
        |FROM documents d LEFT JOIN ds USING (doc_id)""".stripMargin,
    "contamination_ngrams" ->
      """WITH split AS (
        |  SELECT doc_id,
        |         (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
        |          + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS bucket
        |  FROM documents),
        |labeled AS (
        |  SELECT doc_id,
        |         CASE WHEN bucket < 179 THEN 'train'
        |              WHEN bucket < 217 THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM split),
        |tks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS tk
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT t.doc_id, l.split,
        |         unnest(list_transform(range(1, greatest(len(tk) - 4, 0) + 1),
        |                               i -> array_to_string(list_slice(tk, i, i + 4), ' '))) AS gram
        |  FROM tks t JOIN labeled l USING (doc_id)
        |  WHERE l.split IN ('train', 'test')),
        |train_g AS (SELECT DISTINCT gram FROM grams WHERE split = 'train'),
        |test_g AS (SELECT doc_id, gram FROM grams WHERE split = 'test')
        |SELECT t.doc_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_grams,
        |       CAST(COUNT(tr.gram) AS BIGINT) AS n_contaminated,
        |       round(CAST(COUNT(tr.gram) AS DOUBLE) / COUNT(*), 4) AS contamination
        |FROM test_g t LEFT JOIN train_g tr USING (gram)
        |GROUP BY 1""".stripMargin,
    "events_json_extract" ->
      """SELECT event_type,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY 1, 2""".stripMargin,
    "scd2_intervals" ->
      """SELECT user_id, event_id, epoch_us(ts) AS valid_from,
        |       LEAD(epoch_us(ts), 1) OVER (PARTITION BY user_id
        |                                   ORDER BY epoch_us(ts), event_id) AS valid_to,
        |       value
        |FROM events WHERE event_type = 'signup'""".stripMargin,
    "events_pivot" ->
      """SELECT user_id,
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
        |  CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup
        |FROM events GROUP BY 1""".stripMargin,
    "events_unpivot" ->
      """WITH wide AS (
        |  SELECT user_id,
        |    CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
        |    CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view
        |  FROM events GROUP BY 1)
        |SELECT user_id, 'click' AS metric, n_click AS n FROM wide
        |UNION ALL
        |SELECT user_id, 'view' AS metric, n_view AS n FROM wide""".stripMargin,
    "events_ntile" ->
      """WITH spend AS (
        |  SELECT user_id, SUM(CAST(value AS DECIMAL(14,2))) AS spend
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT user_id, CAST(spend AS DOUBLE) AS spend,
        |       CAST(NTILE(4) OVER (ORDER BY spend DESC, user_id) AS INT) AS quartile
        |FROM spend""".stripMargin,
    "skew_salted_join" ->
      """WITH dim AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS type_total
        |  FROM events GROUP BY 1)
        |SELECT e.event_type, d.type_total,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(e.value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |FROM events e JOIN dim d USING (event_type)
        |GROUP BY 1, 2""".stripMargin,
    "corpus_pack" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |         CAST(len(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, doc_id // 256 AS shard, n_tokens,
        |         SUM(n_tokens) OVER (PARTITION BY doc_id // 256 ORDER BY doc_id
        |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM tk)
        |SELECT shard, CAST((cum - n_tokens) // 2048 AS BIGINT) AS chunk,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        |FROM c GROUP BY 1, 2""".stripMargin,
    "vocab_min_df" ->
      """SELECT tok AS token,
        |       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
        |       CAST(COUNT(*) AS BIGINT) AS tf
        |FROM (
        |  SELECT doc_id,
        |         unnest(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')) AS tok
        |  FROM documents)
        |GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2""".stripMargin,
    "topk_per_group" ->
      """SELECT source, doc_id, n_chars, CAST(rk AS INT) AS rk FROM (
        |  SELECT source, doc_id, n_chars,
        |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 3""".stripMargin,
    "events_anomaly" ->
      """WITH c AS (
        |  SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us, event_type,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT *,
        |         SUM(n) OVER tw AS s,
        |         SUM(n * n) OVER tw AS q,
        |         COUNT(*) OVER tw AS m
        |  FROM c
        |  WINDOW tw AS (PARTITION BY event_type ORDER BY window_start_us
        |                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT window_start_us, event_type, n,
        |       CAST(CASE WHEN (m * n - s) * (m * n - s) > 9 * (m * q - s * s)
        |            THEN 1 ELSE 0 END AS BIGINT) AS anomaly
        |FROM w WHERE m = 24""".stripMargin,
    // CUSUM: same hourly counts, folded per type with list_reduce (init
    // prepended — DuckDB's reduce seeds from the first element); residual
    // and thresholds all integer milli, mirroring Anomaly.cusumChanges.
    // CAUTION: struct_pack fields inside a reduce lambda LET-CHAIN —
    // acc.sp after `sp :=` resolves to the NEW value — so sp/sn are bound
    // LAST and every other field recomputes them from the still-old acc;
    // with this order the fold is correct under either binding semantics.
    "events_ewma" -> ewmaSql,
    "stats_hll" -> hllSql,
    "stats_hll_merged" -> hllSql,
    "stats_hll_streamed" -> hllSql,
    "stats_hll_sliding" -> hllSlidingSql,
    "events_cumulative_users" -> cumulativeUsersSql,
    // readback ≡ the batch operator over the union of the (period-ordered)
    // ingest rounds — one oracle for both faces
    "events_cumulative_streamed" -> cumulativeUsersSql,
    // mirrors the two-run stream: run-1 watermark = hi - 3600; every late
    // row (secs <= hi - 10800) has window_end <= hi - 7200 < watermark, so
    // the restarted run drops ALL late groups — the engine counts drops at
    // the stateful operator's post-partial-agg input, hence the DISTINCT
    // (window, event_type) grain; emitted windows are the on-time ones
    // with window_end <= watermark (the <= boundary StreamingSpec pins)
    "events_stream_late_drops" ->
      """WITH ev AS (SELECT event_type, epoch_us(ts) // 1000000 AS secs FROM events),
        |mx AS (SELECT MAX(secs) AS hi FROM ev),
        |ontime AS (SELECT secs, event_type FROM ev, mx WHERE secs > hi - 10800),
        |late AS (SELECT secs, event_type FROM ev, mx WHERE secs <= hi - 10800),
        |lateg AS (SELECT DISTINCT (secs // 3600) * 3600 AS ws, event_type FROM late),
        |fin AS (SELECT (secs // 3600) * 3600 AS ws, event_type,
        |               CAST(COUNT(*) AS BIGINT) AS n
        |        FROM ontime GROUP BY 1, 2),
        |emitted AS (SELECT f.* FROM fin f, mx WHERE ws + 3600 <= hi - 3600)
        |SELECT CAST((SELECT COUNT(*) FROM ontime) AS BIGINT) AS n_ontime,
        |       CAST((SELECT COUNT(*) FROM late) AS BIGINT) AS n_late,
        |       CAST((SELECT COUNT(*) FROM lateg) AS BIGINT) AS n_dropped_groups,
        |       CAST((SELECT COUNT(*) FROM emitted) AS BIGINT) AS n_windows_out,
        |       CAST((SELECT COALESCE(SUM(n), 0) FROM emitted) AS BIGINT) AS n_events_out""".stripMargin,
    // mirrors Funnel.attribution: per-(user, ts) touch collapse, then one
    // range-framed IGNORE NULLS first/last window over touch+conv rows
    "events_attribution" ->
      """WITH b AS (
        |  SELECT user_id AS u, epoch_us(ts) AS ts, event_type AS ty
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
        |tch AS (
        |  SELECT u, ts, MAX(ty) AS touch FROM b
        |  WHERE ty IN ('view', 'click', 'signup') GROUP BY 1, 2),
        |c AS (SELECT DISTINCT u, ts FROM b WHERE ty = 'purchase'),
        |uni AS (
        |  SELECT u, ts, touch, 0 AS isconv FROM tch
        |  UNION ALL SELECT u, ts, NULL AS touch, 1 FROM c),
        |wnd AS (
        |  SELECT u, ts, isconv,
        |    LAST_VALUE(CASE WHEN touch IS NOT NULL
        |                    THEN struct_pack(t := ts, ty := touch) END IGNORE NULLS)
        |      OVER (PARTITION BY u ORDER BY ts
        |            RANGE BETWEEN 259200000000 PRECEDING AND CURRENT ROW) AS lt,
        |    FIRST_VALUE(CASE WHEN touch IS NOT NULL
        |                     THEN struct_pack(t := ts, ty := touch) END IGNORE NULLS)
        |      OVER (PARTITION BY u ORDER BY ts
        |            RANGE BETWEEN 259200000000 PRECEDING AND CURRENT ROW) AS ft
        |  FROM uni)
        |SELECT u AS user_id, CAST(ts AS BIGINT) AS conv_ts,
        |       lt.ty AS last_touch_type, CAST(lt.t AS BIGINT) AS last_touch_ts,
        |       ft.ty AS first_touch_type, CAST(ft.t AS BIGINT) AS first_touch_ts
        |FROM wnd WHERE isconv = 1""".stripMargin,
    // per-(conversion, touch) join bounded by the output grain, recency
    // rank by touch ts desc, exact-integer linear-decay shares
    "events_attribution_credit" ->
      """WITH b AS (
        |  SELECT user_id AS u, epoch_us(ts) AS ts, event_type AS ty
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
        |tch AS (
        |  SELECT u, ts, MAX(ty) AS touch FROM b
        |  WHERE ty IN ('view', 'click', 'signup') GROUP BY 1, 2),
        |c AS (SELECT DISTINCT u, ts AS conv_ts FROM b WHERE ty = 'purchase'),
        |j AS (
        |  SELECT t.u, c.conv_ts, t.ts, t.touch
        |  FROM tch t JOIN c ON c.u = t.u
        |  WHERE t.ts >= c.conv_ts - 259200000000 AND t.ts <= c.conv_ts),
        |r AS (
        |  SELECT u, conv_ts, ts, touch,
        |         CAST(COUNT(*) OVER (PARTITION BY u, conv_ts) AS BIGINT) AS m,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY u, conv_ts ORDER BY ts DESC)
        |              AS BIGINT) AS rank
        |  FROM j)
        |SELECT u AS user_id, CAST(conv_ts AS BIGINT) AS conv_ts,
        |       CAST(ts AS BIGINT) AS touch_ts, touch AS touch_type, rank,
        |       CAST((1000000 * 2 * (m - rank + 1)) // (m * (m + 1)) AS BIGINT) AS credit_ppm
        |FROM r""".stripMargin,
    // mirrors Stats.autocorrMilli: 30 LAG columns in one window, unpivoted
    // per lag, HUGEINT moment sums, one rounded double conversion per
    // (type, lag)
    "events_autocorr" -> {
      val lags = 1 to 30
      val lagCols = lags.map(k => s"LAG(x, $k) OVER w AS l$k").mkString(", ")
      val unions = lags
        .map(k =>
          s"SELECT grp, CAST($k AS BIGINT) AS lag, x, l$k AS y FROM l WHERE l$k IS NOT NULL")
        .mkString("\n  UNION ALL ")
      s"""WITH srs AS (
         |  SELECT event_type AS grp, epoch_us(ts) // 3600000000 AS p,
         |         CAST(COUNT(*) * 1000 AS BIGINT) AS x
         |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
         |  GROUP BY 1, 2),
         |l AS (
         |  SELECT grp, x,
         |         $lagCols
         |  FROM srs WINDOW w AS (PARTITION BY grp ORDER BY p)),
         |pr AS (
         |  $unions),
         |a AS (
         |  SELECT grp, lag, CAST(COUNT(*) AS BIGINT) AS n,
         |         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         |         SUM(CAST(x AS HUGEINT) * x) AS sxx, SUM(CAST(y AS HUGEINT) * y) AS syy,
         |         SUM(CAST(x AS HUGEINT) * y) AS sxy
         |  FROM pr GROUP BY 1, 2)
         |SELECT grp AS event_type, lag, n,
         |       CAST(round(
         |         CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
         |         THEN CAST(n * sxy - sx * sy AS DOUBLE) /
         |              sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
         |                   CAST(n * syy - sy * sy AS DOUBLE))
         |         END, 6) AS DOUBLE) AS acf_r
         |FROM a WHERE n >= 2""".stripMargin
    },
    // lead window per type, value holds to next sample, exact HUGEINT
    // milli·us weighting; both Spark faces mirror THIS one SQL
    "events_twap" -> twapSql,
    "events_twap_bucketed" -> twapSql,
    // md5 hex fold mod 1e6 -> nine driver-literal Poisson(1) CDF ppm
    // thresholds -> exact weighted replicate means -> percentile picks
    "events_bootstrap_ci" -> {
      val fold = (1 to 8)
        .map(i => s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1)")
        .reduce((a, b) => s"($a * 16 + $b)")
      val cdf = Seq(367879, 735759, 919699, 981012, 996340, 999406, 999917, 999990, 999999)
      val w = cdf.map(t => s"CASE WHEN u >= $t THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH b AS (
         |  SELECT event_type AS grp, CAST(event_id AS VARCHAR) AS id,
         |         CAST(round(value * 1000, 0) AS BIGINT) AS x
         |  FROM events
         |  WHERE event_type IS NOT NULL AND value IS NOT NULL AND event_id IS NOT NULL),
         |pr AS (
         |  SELECT grp, x, CAST(r AS INT) AS r,
         |         md5('boot:' || id || ':' || CAST(r AS VARCHAR)) AS h
         |  FROM b, (SELECT unnest(range(1, 41)) AS r)),
         |uu AS (SELECT grp, r, x, CAST($fold AS BIGINT) % 1000000 AS u FROM pr),
         |ww AS (SELECT grp, r, x, CAST($w AS BIGINT) AS w FROM uu),
         |rm AS (
         |  SELECT grp, r, CAST(SUM(CAST(w AS HUGEINT) * x) // SUM(w) AS BIGINT) AS m
         |  FROM ww GROUP BY 1, 2 HAVING SUM(w) > 0),
         |rk AS (
         |  SELECT grp, m, r, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY m, r) AS rn
         |  FROM rm),
         |nr AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_reps FROM rm GROUP BY 1),
         |ci AS (
         |  SELECT rk.grp, nr.n_reps,
         |         MIN(CASE WHEN rn = (n_reps * 25) // 1000 + 1 THEN m END) AS ci_lo_milli,
         |         MIN(CASE WHEN rn = n_reps - (n_reps * 25) // 1000 THEN m END) AS ci_hi_milli
         |  FROM rk JOIN nr ON nr.grp = rk.grp GROUP BY 1, 2),
         |pt AS (
         |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(SUM(CAST(x AS HUGEINT)) // COUNT(*) AS BIGINT) AS mean_milli
         |  FROM b GROUP BY 1)
         |SELECT pt.grp AS event_type, pt.n, pt.mean_milli,
         |       CAST(COALESCE(ci.n_reps, 0) AS BIGINT) AS n_reps,
         |       ci.ci_lo_milli, ci.ci_hi_milli
         |FROM pt LEFT JOIN ci ON ci.grp = pt.grp""".stripMargin
    },
    // per-user integer milli sums -> pooled HUGEINT moments -> the three
    // token-mirrored float readouts (theta, adjusted mean, rho^2)
    "events_cuped" -> {
      val theta = "(CAST(nn * sxy - sx * sy AS DOUBLE) / CAST(nn * sxx - sx * sx AS DOUBLE))"
      val testable = "nn >= 2 AND (nn * sxx - sx * sx) > 0"
      s"""WITH bu AS (
         |  SELECT user_id,
         |         CAST(SUM(CASE WHEN epoch_us(ts) // 86400000000 < 19738
         |                  THEN CAST(round(value * 1000, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS pre,
         |         CAST(SUM(CASE WHEN epoch_us(ts) // 86400000000 >= 19738
         |                  THEN CAST(round(value * 1000, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS post
         |  FROM events
         |  WHERE user_id IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL
         |  GROUP BY 1),
         |b AS (SELECT CAST(user_id % 2 AS BIGINT) AS grp,
         |             pre * 1000 AS x, post * 1000 AS y FROM bu),
         |pv AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         |              SUM(CAST(x AS HUGEINT)) AS sx_v, SUM(CAST(y AS HUGEINT)) AS sy_v
         |       FROM b GROUP BY 1),
         |pl AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
         |              SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         |              SUM(CAST(x AS HUGEINT) * x) AS sxx,
         |              SUM(CAST(x AS HUGEINT) * y) AS sxy,
         |              SUM(CAST(y AS HUGEINT) * y) AS syy
         |       FROM b)
         |SELECT grp AS variant, n,
         |       CAST(sy_v // n AS BIGINT) AS mean_post_milli,
         |       CAST(round(
         |         CASE WHEN $testable
         |         THEN CAST(sy_v AS DOUBLE) / n -
         |              $theta * (CAST(sx_v AS DOUBLE) / n - CAST(sx AS DOUBLE) / nn)
         |         END, 4) AS DOUBLE) AS mean_adj_milli_r,
         |       CAST(round(
         |         CASE WHEN $testable THEN $theta END, 6) AS DOUBLE) AS theta_r,
         |       CAST(round(
         |         CASE WHEN $testable AND (nn * syy - sy * sy) > 0
         |         THEN (CAST(nn * sxy - sx * sy AS DOUBLE) * CAST(nn * sxy - sx * sy AS DOUBLE)) /
         |              (CAST(nn * sxx - sx * sx AS DOUBLE) * CAST(nn * syy - sy * sy AS DOUBLE))
         |         END, 6) AS DOUBLE) AS rho2_r
         |FROM pv, pl""".stripMargin
    },
    // pairwise micro slopes (trunc // toward zero both engines), doubled
    // median by two rank picks so odd counts double the single middle
    "events_trend_theilsen" ->
      """WITH srs AS (
        |  SELECT event_type AS grp, epoch_us(ts) // 86400000000 AS t,
        |         CAST(COUNT(*) * 1000 AS BIGINT) AS x
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |sl AS (
        |  SELECT l.grp, CAST((1000 * (r.x - l.x)) // (r.t - l.t) AS BIGINT) AS sl
        |  FROM srs l JOIN srs r ON r.grp = l.grp AND l.t < r.t),
        |cnt AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM sl GROUP BY 1),
        |rk AS (
        |  SELECT grp, sl, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY sl) AS rn
        |  FROM sl),
        |med AS (
        |  SELECT rk.grp, cnt.n_pairs,
        |         CAST(SUM(CASE WHEN rn = (n_pairs + 1) // 2 THEN sl END) +
        |              SUM(CASE WHEN rn = (n_pairs + 2) // 2 THEN sl END) AS BIGINT)
        |           AS med2_slope_micro
        |  FROM rk JOIN cnt ON cnt.grp = rk.grp
        |  GROUP BY 1, 2),
        |n AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n FROM srs GROUP BY 1)
        |SELECT n.grp AS event_type, n.n,
        |       CAST(COALESCE(med.n_pairs, 0) AS BIGINT) AS n_pairs,
        |       med.med2_slope_micro
        |FROM n LEFT JOIN med ON med.grp = n.grp""".stripMargin,
    // pairwise sgn sum + tie-corrected var18 + integer z2_milli, token-
    // mirrored from Stats.mannKendall (// == div on the non-negative num)
    "events_trend_mk" ->
      """WITH srs AS (
        |  SELECT event_type AS grp, epoch_us(ts) // 86400000000 AS t,
        |         CAST(COUNT(*) * 1000 AS BIGINT) AS x
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |sgn AS (
        |  SELECT l.grp,
        |         CAST(SUM(CASE WHEN r.x > l.x THEN 1
        |                       WHEN r.x < l.x THEN -1 ELSE 0 END) AS BIGINT) AS s
        |  FROM srs l JOIN srs r ON r.grp = l.grp AND l.t < r.t
        |  GROUP BY 1),
        |tb AS (
        |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM srs GROUP BY grp, x),
        |ties AS (
        |  SELECT grp, CAST(SUM(c * (c - 1) * (2 * c + 5)) AS BIGINT) AS tsum
        |  FROM tb GROUP BY 1),
        |cnt AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n FROM srs GROUP BY 1),
        |j AS (
        |  SELECT cnt.grp, cnt.n, COALESCE(sgn.s, 0) AS s,
        |         cnt.n * (cnt.n - 1) * (2 * cnt.n + 5) - ties.tsum AS var18
        |  FROM cnt JOIN ties ON ties.grp = cnt.grp
        |  LEFT JOIN sgn ON sgn.grp = cnt.grp)
        |SELECT grp AS event_type, n, s, var18,
        |       CAST(CASE WHEN var18 > 0 THEN
        |         (18000 * greatest(abs(s) - 1, 0) * greatest(abs(s) - 1, 0)) // var18
        |       END AS BIGINT) AS z2_milli,
        |       CASE WHEN s > 0 THEN 'up' WHEN s < 0 THEN 'down' ELSE 'flat' END AS trend,
        |       CASE WHEN var18 > 0 THEN
        |         (18000 * greatest(abs(s) - 1, 0) * greatest(abs(s) - 1, 0)) // var18 > 3841
        |       END AS significant
        |FROM j""".stripMargin,
    // +-1 deltas (ends sort first at equal t: half-open), running sum per
    // type, earliest peak; one SQL for both Spark faces
    "events_concurrency" -> concurrencySql,
    "events_concurrency_bucketed" -> concurrencySql,
    // distinct (user, type) -> hub cap semi-join -> per-user pair join ->
    // integer lift (1000 * n_ab * N) // (n_a * n_b)
    "events_cobasket" ->
      """WITH ui AS (
        |  SELECT DISTINCT CAST(user_id AS BIGINT) AS u, event_type AS i
        |  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |kept AS (
        |  SELECT ui.* FROM ui
        |  JOIN (SELECT u FROM ui GROUP BY u HAVING COUNT(*) <= 64) ok ON ok.u = ui.u),
        |tot AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS n_i FROM kept GROUP BY 1),
        |nu AS (SELECT CAST(COUNT(DISTINCT u) AS BIGINT) AS nu FROM kept),
        |pr AS (
        |  SELECT l.i AS item_a, r.i AS item_b, CAST(COUNT(*) AS BIGINT) AS n_ab
        |  FROM kept l JOIN kept r ON r.u = l.u AND l.i < r.i
        |  GROUP BY 1, 2)
        |SELECT pr.item_a, pr.item_b, pr.n_ab, ta.n_i AS n_a, tb.n_i AS n_b,
        |       CAST((1000 * pr.n_ab * nu.nu) // (ta.n_i * tb.n_i) AS BIGINT) AS lift_milli,
        |       CAST(64 AS BIGINT) AS max_user_items
        |FROM pr
        |JOIN tot ta ON ta.i = pr.item_a
        |JOIN tot tb ON tb.i = pr.item_b, nu
        |WHERE pr.n_ab >= 1""".stripMargin,
    // mirrors Relational.mergeIntervals: running-max island detection over
    // per-user interval rows, islands aggregated; empty intervals dropped
    "events_islands" ->
      """WITH iv AS (
        |  SELECT user_id AS k, epoch_us(ts) AS s,
        |         epoch_us(ts) + CAST(round(value * 60000000) AS BIGINT) AS e
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
        |f AS (SELECT * FROM iv WHERE e > s),
        |m AS (
        |  SELECT k, s, e,
        |         MAX(e) OVER (PARTITION BY k ORDER BY s, e
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM f),
        |n AS (
        |  SELECT k, s, e,
        |         CASE WHEN pmax IS NULL OR s > pmax + 21600000000 THEN 1 ELSE 0 END AS nw
        |  FROM m),
        |i AS (
        |  SELECT k, s, e,
        |         SUM(nw) OVER (PARTITION BY k ORDER BY s, e
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM n)
        |SELECT k AS user_id,
        |       CAST(MIN(s) AS BIGINT) AS island_start,
        |       CAST(MAX(e) AS BIGINT) AS island_end,
        |       CAST(COUNT(*) AS BIGINT) AS n_intervals,
        |       CAST(MAX(e) - MIN(s) AS BIGINT) AS island_units,
        |       CAST(SUM(e - s) AS BIGINT) AS sum_interval_units
        |FROM i GROUP BY k, island""".stripMargin,
    "stats_rank_normalize" ->
      """WITH vm AS (
        |  SELECT event_type AS grp,
        |         CAST(round(CAST(value AS DOUBLE) * 1000, 0) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |h AS (SELECT grp, v, CAST(COUNT(*) AS BIGINT) AS cnt FROM vm GROUP BY 1, 2),
        |c AS (
        |  SELECT grp, v, cnt,
        |         SUM(cnt) OVER (PARTITION BY grp ORDER BY v) - cnt AS cum_lt
        |  FROM h),
        |n AS (SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n FROM h GROUP BY 1)
        |SELECT vm.grp AS event_type, vm.v AS value_milli,
        |       CAST((1000000 * (2 * c.cum_lt + c.cnt + 1)) // (2 * n.n) AS BIGINT) AS pct_ppm
        |FROM vm
        |JOIN c ON c.grp = vm.grp AND c.v = vm.v
        |JOIN n ON n.grp = vm.grp""".stripMargin,
    "events_period_over_period" ->
      """WITH d AS (
        |  SELECT (epoch_us(ts) // 86400000000) * 86400000000 AS ts, event_type,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |l AS (
        |  SELECT event_type, CAST(ts AS BIGINT) AS ts, n * 1000 AS n_milli,
        |         LAG(n * 1000, 1) OVER (PARTITION BY event_type ORDER BY ts) AS prev_n_milli,
        |         LAG(n * 1000, 7) OVER (PARTITION BY event_type ORDER BY ts) AS season_n_milli
        |  FROM d)
        |SELECT event_type, ts, CAST(n_milli AS BIGINT) AS n_milli,
        |       CAST(prev_n_milli AS BIGINT) AS prev_n_milli,
        |       CAST(CASE WHEN prev_n_milli IS NOT NULL AND prev_n_milli <> 0
        |                 THEN (1000000 * (n_milli - prev_n_milli)) // prev_n_milli
        |            END AS BIGINT) AS delta_ppm,
        |       CAST(season_n_milli AS BIGINT) AS season_n_milli,
        |       CAST(CASE WHEN season_n_milli IS NOT NULL AND season_n_milli <> 0
        |                 THEN (1000000 * (n_milli - season_n_milli)) // season_n_milli
        |            END AS BIGINT) AS season_delta_ppm
        |FROM l""".stripMargin,
    "stats_benford" ->
      """WITH vm AS (
        |  SELECT event_type AS grp,
        |         abs(CAST(round(CAST(value AS DOUBLE) * 1000, 0) AS BIGINT)) AS am
        |  FROM events WHERE value IS NOT NULL),
        |dg AS (
        |  SELECT grp,
        |         CAST(list_reduce(list_prepend(am, range(1, 19)),
        |              (acc, i) -> CASE WHEN acc >= 10 THEN acc // 10 ELSE acc END) AS BIGINT)
        |           AS digit
        |  FROM vm WHERE am > 0),
        |cnts AS (SELECT grp, digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM dg GROUP BY 1, 2),
        |tot AS (SELECT grp, CAST(SUM(n_obs) AS BIGINT) AS n FROM cnts GROUP BY 1),
        |ex AS (SELECT unnest(range(1, 10)) AS digit,
        |              unnest([301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757])
        |                AS expected_ppm),
        |f AS (
        |  SELECT t.grp, CAST(ex.digit AS BIGINT) AS digit, t.n,
        |         COALESCE(c.n_obs, 0) AS n_obs,
        |         CAST(ex.expected_ppm AS BIGINT) AS expected_ppm
        |  FROM tot t CROSS JOIN ex
        |  LEFT JOIN cnts c ON c.grp = t.grp AND c.digit = ex.digit),
        |g AS (
        |  SELECT grp AS event_type, digit, n, n_obs,
        |         CAST((1000000 * n_obs) // n AS BIGINT) AS obs_ppm, expected_ppm
        |  FROM f)
        |SELECT event_type, digit, n, n_obs, obs_ppm, expected_ppm,
        |       obs_ppm - expected_ppm AS dev_ppm,
        |       CAST(MAX(abs(obs_ppm - expected_ppm))
        |            OVER (PARTITION BY event_type) AS BIGINT) AS dev_max_ppm
        |FROM g""".stripMargin,
    // mirrors Stats.welchTTest token-for-token past the HUGEINT moments:
    // identical parenthesization keeps every double op correctly-rounded
    // to the same bits in both engines
    "stats_welch_ttest" -> {
      def v(t: String) =
        s"((CAST(sxx_$t AS DOUBLE) - CAST(sx_$t AS DOUBLE) * CAST(sx_$t AS DOUBLE) / n_$t) " +
          s"/ (n_$t - 1))"
      val se2 = s"(${v("a")} / n_a + ${v("b")} / n_b)"
      s"""WITH ev AS (
         |  SELECT event_type AS grp, user_id,
         |         CAST(round(CAST(value AS DOUBLE) * 1000, 0) AS BIGINT) AS x
         |  FROM events
         |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL),
         |ma AS (
         |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_a, SUM(CAST(x AS HUGEINT)) AS sx_a,
         |         SUM(CAST(x AS HUGEINT) * x) AS sxx_a
         |  FROM ev WHERE user_id % 2 = 0 GROUP BY 1),
         |mb AS (
         |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_b, SUM(CAST(x AS HUGEINT)) AS sx_b,
         |         SUM(CAST(x AS HUGEINT) * x) AS sxx_b
         |  FROM ev WHERE user_id % 2 = 1 GROUP BY 1)
         |SELECT COALESCE(ma.grp, mb.grp) AS event_type,
         |       CAST(COALESCE(n_a, 0) AS BIGINT) AS n_a,
         |       CAST(COALESCE(n_b, 0) AS BIGINT) AS n_b,
         |       CAST(sx_a // n_a AS BIGINT) AS mean_a_milli,
         |       CAST(sx_b // n_b AS BIGINT) AS mean_b_milli,
         |       CAST(round(
         |         CASE WHEN n_a >= 2 AND n_b >= 2 AND $se2 > 0
         |         THEN (CAST(sx_a AS DOUBLE) / n_a - CAST(sx_b AS DOUBLE) / n_b) / sqrt($se2)
         |         END, 6) AS DOUBLE) AS t_stat,
         |       CAST(round(
         |         CASE WHEN n_a >= 2 AND n_b >= 2 AND $se2 > 0
         |         THEN $se2 * $se2 /
         |              ((${v("a")} / n_a) * (${v("a")} / n_a) / (n_a - 1) +
         |               (${v("b")} / n_b) * (${v("b")} / n_b) / (n_b - 1))
         |         END, 2) AS DOUBLE) AS df
         |FROM ma FULL OUTER JOIN mb ON mb.grp = ma.grp""".stripMargin
    },
    // tie-block doubled midranks (2F + c + 1), doubled rank sum, doubled
    // U, tie-corrected variance — HUGEINT mirrors of the decimal moments
    "stats_mannwhitney" -> {
      val vn = "(CAST(n_a AS HUGEINT) * n_b) * " +
        "((CAST(n_a + n_b AS HUGEINT) + 1) * (n_a + n_b) * (n_a + n_b - 1) - ties)"
      val vd = "(CAST(12 AS HUGEINT) * (n_a + n_b) * (n_a + n_b - 1))"
      s"""WITH ev AS (
         |  SELECT event_type AS grp, user_id,
         |         CAST(round(CAST(value AS DOUBLE) * 1000, 0) AS BIGINT) AS v
         |  FROM events
         |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL),
         |h AS (
         |  SELECT grp, v,
         |         CAST(COUNT(CASE WHEN user_id % 2 = 0 THEN 1 END) AS BIGINT) AS ca,
         |         CAST(COUNT(CASE WHEN user_id % 2 = 1 THEN 1 END) AS BIGINT) AS cb,
         |         CAST(COUNT(*) AS BIGINT) AS c
         |  FROM ev GROUP BY 1, 2),
         |f AS (
         |  SELECT grp, v, ca, cb, c,
         |         SUM(c) OVER (PARTITION BY grp ORDER BY v) - c AS f
         |  FROM h),
         |g AS (
         |  SELECT grp,
         |         CAST(SUM(ca) AS BIGINT) AS n_a,
         |         CAST(SUM(cb) AS BIGINT) AS n_b,
         |         SUM(CAST(ca AS HUGEINT) * (2 * f + c + 1)) AS r2a,
         |         SUM(CAST(c AS HUGEINT) * c * c - c) AS ties
         |  FROM f GROUP BY 1)
         |SELECT grp AS event_type, n_a, n_b,
         |       CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS BIGINT) AS u2_a,
         |       CAST(round(
         |         CASE WHEN n_a >= 1 AND n_b >= 1 AND $vn > 0
         |         THEN CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1)
         |                   - CAST(n_a AS HUGEINT) * n_b AS DOUBLE) /
         |              (2 * sqrt(CAST($vn AS DOUBLE) / CAST($vd AS DOUBLE)))
         |         END, 6) AS DOUBLE) AS z_stat
         |FROM g""".stripMargin
    },
    "stats_ks_drift" ->
      """WITH va AS (
        |  SELECT event_type AS grp, CAST(round(CAST(value AS DOUBLE) * 1000, 0) AS BIGINT) AS v
        |  FROM events
        |  WHERE user_id IS NOT NULL AND user_id % 2 = 0 AND value IS NOT NULL
        |    AND event_type IS NOT NULL),
        |vb AS (
        |  SELECT event_type AS grp, CAST(round(CAST(value AS DOUBLE) * 1000, 0) AS BIGINT) AS v
        |  FROM events
        |  WHERE user_id IS NOT NULL AND user_id % 2 = 1 AND value IS NOT NULL
        |    AND event_type IS NOT NULL),
        |ha AS (SELECT grp, v, CAST(COUNT(*) AS BIGINT) AS ca FROM va GROUP BY 1, 2),
        |hb AS (SELECT grp, v, CAST(COUNT(*) AS BIGINT) AS cb FROM vb GROUP BY 1, 2),
        |m AS (
        |  SELECT COALESCE(ha.grp, hb.grp) AS grp, COALESCE(ha.v, hb.v) AS v,
        |         COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
        |  FROM ha FULL OUTER JOIN hb ON ha.grp = hb.grp AND ha.v = hb.v),
        |c AS (
        |  SELECT grp, v,
        |         SUM(ca) OVER (PARTITION BY grp ORDER BY v) AS cum_a,
        |         SUM(cb) OVER (PARTITION BY grp ORDER BY v) AS cum_b
        |  FROM m),
        |t AS (
        |  SELECT grp, CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b
        |  FROM m GROUP BY 1),
        |d AS (
        |  SELECT c.grp, t.n_a, t.n_b,
        |         MAX(abs(CAST(cum_a AS HUGEINT) * n_b - CAST(cum_b AS HUGEINT) * n_a)) AS dmax
        |  FROM c JOIN t ON t.grp = c.grp
        |  WHERE t.n_a > 0 AND t.n_b > 0
        |  GROUP BY 1, 2, 3)
        |SELECT grp AS event_type, n_a, n_b,
        |       CAST((1000000 * dmax) // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS d_ppm
        |FROM d""".stripMargin,
    // mirrors Anomaly.seasonalDecompose: 25-row centered MA (null unless
    // complete), trunc-div seasonal means per hour-of-day phase
    // the events_seasonal residual chain, then the mad-outlier chain on
    // the residuals (group = type, id = period)
    "events_seasonal_outliers" ->
      """WITH c AS (
        |  SELECT epoch_us(ts) // 3600000000 AS p, event_type AS k,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT k, CAST(p AS BIGINT) AS p, n * 1000 AS xm FROM c),
        |t AS (
        |  SELECT k, p, xm, COUNT(*) OVER w AS cnt, SUM(xm) OVER w AS s
        |  FROM b
        |  WINDOW w AS (PARTITION BY k ORDER BY p ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |tr AS (SELECT k, p, xm, CASE WHEN cnt = 25 THEN s // cnt END AS trend FROM t),
        |se AS (
        |  SELECT k, p % 24 AS ph, CAST(SUM(xm - trend) // COUNT(*) AS BIGINT) AS seasonal
        |  FROM tr WHERE trend IS NOT NULL GROUP BY 1, 2),
        |r AS (
        |  SELECT tr.k, tr.p, CAST(tr.xm - tr.trend - se.seasonal AS BIGINT) AS x_milli
        |  FROM tr LEFT JOIN se ON se.k = tr.k AND se.ph = tr.p % 24
        |  WHERE tr.xm - tr.trend - se.seasonal IS NOT NULL),
        |h AS (SELECT k, x_milli, COUNT(*) AS cnt FROM r GROUP BY 1, 2),
        |cc AS (
        |  SELECT k, x_milli,
        |         SUM(cnt) OVER (PARTITION BY k ORDER BY x_milli
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         SUM(cnt) OVER (PARTITION BY k) AS tot
        |  FROM h),
        |med AS (
        |  SELECT k,
        |         CAST(MIN(CASE WHEN cum * 100 >= tot * 50 THEN x_milli END) AS BIGINT) AS med_milli
        |  FROM cc GROUP BY 1),
        |dv AS (
        |  SELECT r.k, abs(r.x_milli - med.med_milli) AS adev
        |  FROM r JOIN med ON r.k = med.k),
        |h2 AS (SELECT k, adev, COUNT(*) AS cnt FROM dv GROUP BY 1, 2),
        |c2 AS (
        |  SELECT k, adev,
        |         SUM(cnt) OVER (PARTITION BY k ORDER BY adev
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         SUM(cnt) OVER (PARTITION BY k) AS tot
        |  FROM h2),
        |mad AS (
        |  SELECT k,
        |         CAST(MIN(CASE WHEN cum * 100 >= tot * 50 THEN adev END) AS BIGINT) AS mad_milli
        |  FROM c2 GROUP BY 1)
        |SELECT r.k AS event_type, r.p, r.x_milli AS residual_milli,
        |       med.med_milli, mad.mad_milli,
        |       CAST(CASE WHEN 1000 * abs(r.x_milli - med.med_milli) > 3000 * mad.mad_milli
        |            THEN 1 ELSE 0 END AS BIGINT) AS outlier
        |FROM r JOIN med ON r.k = med.k JOIN mad ON r.k = mad.k""".stripMargin,
    "events_seasonal" ->
      """WITH c AS (
        |  SELECT epoch_us(ts) // 3600000000 AS p, event_type AS k,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT k, CAST(p AS BIGINT) AS p, n * 1000 AS xm FROM c),
        |t AS (
        |  SELECT k, p, xm, COUNT(*) OVER w AS cnt, SUM(xm) OVER w AS s
        |  FROM b
        |  WINDOW w AS (PARTITION BY k ORDER BY p ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |tr AS (SELECT k, p, xm, CASE WHEN cnt = 25 THEN s // cnt END AS trend FROM t),
        |se AS (
        |  SELECT k, p % 24 AS ph, CAST(SUM(xm - trend) // COUNT(*) AS BIGINT) AS seasonal
        |  FROM tr WHERE trend IS NOT NULL GROUP BY 1, 2)
        |SELECT tr.k AS event_type, tr.p, CAST(tr.xm AS BIGINT) AS x_milli,
        |       CAST(tr.trend AS BIGINT) AS trend_milli,
        |       se.seasonal AS seasonal_milli,
        |       CAST(tr.xm - tr.trend - se.seasonal AS BIGINT) AS residual_milli
        |FROM tr LEFT JOIN se ON se.k = tr.k AND se.ph = tr.p % 24""".stripMargin,
    // the ACF detector (lags 2..36, integer micro mean across keys,
    // argmax smaller-lag-on-ties) picks 24 from the planted sawtooth;
    // the decomposition mirrors events_seasonal over the planted series
    // with the detected length riding along
    "events_seasonal_auto" -> {
      val lags = 2 to 36
      val lagCols = lags.map(k => s"LAG(x, $k) OVER w AS l$k").mkString(", ")
      val unions = lags
        .map(k =>
          s"SELECT k, CAST($k AS BIGINT) AS lag, x, l$k AS y FROM l WHERE l$k IS NOT NULL")
        .mkString("\n  UNION ALL ")
      s"""WITH c0 AS (
         |  SELECT epoch_us(ts) // 3600000000 AS p0, event_type AS k,
         |         CAST(COUNT(*) AS BIGINT) AS cnt0
         |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
         |rn AS (
         |  SELECT k, CAST(ROW_NUMBER() OVER (PARTITION BY k ORDER BY p0) - 1 AS BIGINT) AS p,
         |         cnt0
         |  FROM c0),
         |srs AS (
         |  SELECT k, p, (cnt0 + (p % 24) * 5) * 1000 AS x
         |  FROM rn),
         |l AS (
         |  SELECT k, x, $lagCols
         |  FROM srs WHERE k IS NOT NULL WINDOW w AS (PARTITION BY k ORDER BY p)),
         |pr AS (
         |  $unions),
         |a AS (
         |  SELECT k, lag, CAST(COUNT(*) AS BIGINT) AS n,
         |         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         |         SUM(CAST(x AS HUGEINT) * x) AS sxx, SUM(CAST(y AS HUGEINT) * y) AS syy,
         |         SUM(CAST(x AS HUGEINT) * y) AS sxy
         |  FROM pr GROUP BY 1, 2),
         |r AS (
         |  SELECT lag,
         |         CAST(round(
         |           CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
         |           THEN CAST(n * sxy - sx * sy AS DOUBLE) /
         |                sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
         |                     CAST(n * syy - sy * sy AS DOUBLE))
         |           END, 6) AS DOUBLE) AS acf_r
         |  FROM a WHERE n >= 2),
         |sc AS (
         |  SELECT lag,
         |         CAST(SUM(CAST(round(acf_r * 1000000, 0) AS HUGEINT)) // COUNT(*) AS BIGINT)
         |           AS score
         |  FROM r WHERE acf_r IS NOT NULL GROUP BY 1),
         |det AS (
         |  SELECT CAST(CASE WHEN score > 300000 THEN lag ELSE 7 END AS BIGINT) AS sl
         |  FROM sc ORDER BY score DESC, lag LIMIT 1),
         |b AS (SELECT k, p, x AS xm FROM srs),
         |t AS (
         |  SELECT k, p, xm, COUNT(*) OVER w AS cnt, SUM(xm) OVER w AS s
         |  FROM b
         |  WINDOW w AS (PARTITION BY k ORDER BY p ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
         |tr AS (SELECT k, p, xm, CASE WHEN cnt = 25 THEN s // cnt END AS trend FROM t),
         |se AS (
         |  SELECT k, p % 24 AS ph, CAST(SUM(xm - trend) // COUNT(*) AS BIGINT) AS seasonal
         |  FROM tr WHERE trend IS NOT NULL GROUP BY 1, 2)
         |SELECT tr.k AS event_type, tr.p, CAST(tr.xm AS BIGINT) AS x_milli,
         |       CAST(tr.trend AS BIGINT) AS trend_milli,
         |       se.seasonal AS seasonal_milli,
         |       CAST(tr.xm - tr.trend - se.seasonal AS BIGINT) AS residual_milli,
         |       det.sl AS season_len
         |FROM tr LEFT JOIN se ON se.k = tr.k AND se.ph = tr.p % 24
         |CROSS JOIN det""".stripMargin
    },
    // 2xm chi-square in the exact cross-product form: D = o_a*nb - na*o_b,
    // term = 1e6*D^2 // (na*nb*(o_a+o_b)) per category, HUGEINT throughout
    "stats_chisq_drift" ->
      """WITH ca AS (
        |  SELECT event_type AS v, CAST(COUNT(*) AS BIGINT) AS o_a FROM events
        |  WHERE user_id IS NOT NULL AND user_id % 2 = 0 AND event_type IS NOT NULL
        |  GROUP BY 1),
        |cb AS (
        |  SELECT event_type AS v, CAST(COUNT(*) AS BIGINT) AS o_b FROM events
        |  WHERE user_id IS NOT NULL AND user_id % 2 = 1 AND event_type IS NOT NULL
        |  GROUP BY 1),
        |m AS (
        |  SELECT COALESCE(ca.v, cb.v) AS v, COALESCE(o_a, 0) AS o_a, COALESCE(o_b, 0) AS o_b
        |  FROM ca FULL OUTER JOIN cb ON ca.v = cb.v),
        |t AS (SELECT CAST(SUM(o_a) AS BIGINT) AS na, CAST(SUM(o_b) AS BIGINT) AS nb FROM m)
        |SELECT m.v AS event_type, m.o_a, m.o_b,
        |       CAST((1000000 * (CAST(o_a AS HUGEINT) * nb - CAST(na AS HUGEINT) * o_b)
        |                     * (CAST(o_a AS HUGEINT) * nb - CAST(na AS HUGEINT) * o_b))
        |            // (CAST(na AS HUGEINT) * nb * (o_a + o_b)) AS BIGINT) AS term_micro
        |FROM m CROSS JOIN t
        |WHERE na > 0 AND nb > 0""".stripMargin,
    // Gini from tie-block rank sums over DISTINCT milli values:
    // s1 = v*(c*F + c(c+1)/2) with F = strictly-smaller count
    "stats_gini" ->
      """WITH vm AS (
        |  SELECT event_type AS grp, CAST(round(CAST(value AS DOUBLE) * 1000, 0) AS BIGINT) AS v
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL
        |    AND CAST(round(CAST(value AS DOUBLE) * 1000, 0) AS BIGINT) >= 0),
        |h AS (SELECT grp, v, CAST(COUNT(*) AS BIGINT) AS c FROM vm GROUP BY 1, 2),
        |f AS (
        |  SELECT grp, v, c, SUM(c) OVER (PARTITION BY grp ORDER BY v) - c AS f
        |  FROM h),
        |ag AS (
        |  SELECT grp, CAST(SUM(c) AS BIGINT) AS n,
        |         CAST(SUM(CAST(v AS HUGEINT) * c) AS HUGEINT) AS s,
        |         CAST(SUM(CAST(v AS HUGEINT) * (c * f + (c * (c + 1)) // 2)) AS HUGEINT) AS s1
        |  FROM f GROUP BY 1)
        |SELECT grp AS event_type, n, CAST(s AS BIGINT) AS sum_milli,
        |       CAST(CASE WHEN s > 0
        |                 THEN (1000000 * (2 * s1 - (n + 1) * s)) // (n * s) END AS BIGINT)
        |         AS gini_ppm
        |FROM ag""".stripMargin,
    // HHI: exact squared-share sum, 1e6*SUM(c^2) // n^2 per group
    "stats_hhi" ->
      """WITH c AS (
        |  SELECT event_type AS grp, user_id AS cat, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        |  GROUP BY 1, 2),
        |ag AS (
        |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_cats, CAST(SUM(c) AS BIGINT) AS n,
        |         CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2,
        |         CAST(MAX(c) AS BIGINT) AS cmax
        |  FROM c GROUP BY 1)
        |SELECT grp AS event_type, n_cats, n,
        |       CAST((1000000 * s2) // (CAST(n AS HUGEINT) * n) AS BIGINT) AS hhi_ppm,
        |       CAST((CAST(1000000 AS HUGEINT) * cmax) // n AS BIGINT) AS top_share_ppm
        |FROM ag""".stripMargin,
    "events_cusum" ->
      """WITH c AS (
        |  SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS ts_us, event_type,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS m, CAST(SUM(n) AS BIGINT) AS s,
        |         list(struct_pack(mx := CAST(0 AS BIGINT), mn := CAST(0 AS BIGINT),
        |                          ats := CAST(-1 AS BIGINT), sd := CAST(0 AS BIGINT),
        |                          sp := CAST(0 AS BIGINT), sn := CAST(0 AS BIGINT),
        |                          ts := CAST(ts_us AS BIGINT), x := n) ORDER BY ts_us, n) AS lst
        |  FROM c GROUP BY 1),
        |f AS (
        |  SELECT event_type, m, (1000 * s) // m AS mean_milli,
        |    list_reduce(
        |      list_prepend(struct_pack(mx := CAST(0 AS BIGINT), mn := CAST(0 AS BIGINT),
        |                               ats := CAST(-1 AS BIGINT), sd := CAST(0 AS BIGINT),
        |                               sp := CAST(0 AS BIGINT), sn := CAST(0 AS BIGINT),
        |                               ts := CAST(-1 AS BIGINT), x := CAST(0 AS BIGINT)), lst),
        |      (acc, e) -> struct_pack(
        |        mx := GREATEST(acc.mx,
        |                       GREATEST(0, acc.sp + (1000 * e.x - (1000 * s) // m) - 500)),
        |        mn := LEAST(acc.mn,
        |                    LEAST(0, acc.sn + (1000 * e.x - (1000 * s) // m) + 500)),
        |        ats := CASE WHEN acc.sd = 0 AND
        |                     (GREATEST(0, acc.sp + (1000 * e.x - (1000 * s) // m) - 500) > 1500
        |                      OR LEAST(0, acc.sn + (1000 * e.x - (1000 * s) // m) + 500) < -1500)
        |               THEN e.ts ELSE acc.ats END,
        |        sd := CASE WHEN acc.sd = 0 AND
        |                    GREATEST(0, acc.sp + (1000 * e.x - (1000 * s) // m) - 500) > 1500
        |               THEN 1
        |               WHEN acc.sd = 0 AND
        |                    LEAST(0, acc.sn + (1000 * e.x - (1000 * s) // m) + 500) < -1500
        |               THEN -1
        |               ELSE acc.sd END,
        |        sp := GREATEST(0, acc.sp + (1000 * e.x - (1000 * s) // m) - 500),
        |        sn := LEAST(0, acc.sn + (1000 * e.x - (1000 * s) // m) + 500),
        |        ts := acc.ts, x := acc.x)) AS r
        |  FROM g)
        |SELECT event_type, m, mean_milli,
        |       r.mx AS max_s_pos, r.mn AS min_s_neg,
        |       r.ats AS alarm_ts, r.sd AS alarm_side
        |FROM f""".stripMargin,
    "funnel_stages" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |s1 AS (
        |  SELECT user_id, MIN(ts_us) AS t FROM ev WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, MIN(e.ts_us) AS t
        |  FROM ev e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts_us > s1.t GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, MIN(e.ts_us) AS t
        |  FROM ev e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts_us > s2.t GROUP BY 1)
        |SELECT CAST(1 AS INT) AS step_idx, 'view' AS step,
        |       CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
        |UNION ALL
        |SELECT CAST(2 AS INT), 'click', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
        |UNION ALL
        |SELECT CAST(3 AS INT), 'purchase', CAST((SELECT COUNT(*) FROM s3) AS BIGINT)""".stripMargin,
    "funnel_convert_lag" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |s1 AS (
        |  SELECT user_id, MIN(ts_us) AS t FROM ev WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, MIN(e.ts_us) AS t
        |  FROM ev e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts_us > s1.t GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, MIN(e.ts_us) AS t
        |  FROM ev e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts_us > s2.t GROUP BY 1)
        |SELECT CAST(2 AS INT) AS step_idx, 'view>click' AS edge, s1.user_id,
        |       CAST(s2.t - s1.t AS BIGINT) AS lag_us
        |FROM s1 JOIN s2 ON s1.user_id = s2.user_id
        |UNION ALL
        |SELECT CAST(3 AS INT), 'click>purchase', s2.user_id,
        |       CAST(s3.t - s2.t AS BIGINT)
        |FROM s2 JOIN s3 ON s2.user_id = s3.user_id""".stripMargin,
    "funnel_stages_windowed" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |s1 AS (
        |  SELECT user_id, MIN(ts_us) AS t FROM ev WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, MIN(e.ts_us) AS t
        |  FROM ev e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts_us > s1.t
        |    AND e.ts_us <= s1.t + 86400000000 GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, MIN(e.ts_us) AS t
        |  FROM ev e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts_us > s2.t
        |    AND e.ts_us <= s2.t + 86400000000 GROUP BY 1)
        |SELECT CAST(1 AS INT) AS step_idx, 'view' AS step,
        |       CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
        |UNION ALL
        |SELECT CAST(2 AS INT), 'click', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
        |UNION ALL
        |SELECT CAST(3 AS INT), 'purchase', CAST((SELECT COUNT(*) FROM s3) AS BIGINT)""".stripMargin,
    "events_retention" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id, (epoch_us(ts) // 1000000) // 604800 AS period
        |  FROM events),
        |c AS (SELECT user_id, MIN(period) AS cohort FROM uw GROUP BY 1)
        |SELECT CAST(c.cohort AS BIGINT) AS cohort,
        |       CAST(uw.period - c.cohort AS BIGINT) AS k,
        |       CAST(COUNT(DISTINCT uw.user_id) AS BIGINT) AS n_users
        |FROM uw JOIN c USING (user_id)
        |WHERE uw.period - c.cohort <= 4
        |GROUP BY 1, 2""".stripMargin,
    "stats_winsorize" ->
      """WITH h AS (
        |  SELECT lang, n_chars, COUNT(*) AS cnt FROM documents GROUP BY 1, 2),
        |c AS (
        |  SELECT lang, n_chars,
        |         SUM(cnt) OVER (PARTITION BY lang ORDER BY n_chars
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         SUM(cnt) OVER (PARTITION BY lang) AS tot
        |  FROM h),
        |th AS (
        |  SELECT lang,
        |         CAST(MIN(CASE WHEN cum * 100 >= tot * 10 THEN n_chars END) AS BIGINT) AS lo,
        |         CAST(MIN(CASE WHEN cum * 100 >= tot * 90 THEN n_chars END) AS BIGINT) AS hi
        |  FROM c GROUP BY 1)
        |SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars,
        |       least(greatest(CAST(d.n_chars AS BIGINT), th.lo), th.hi) AS n_chars_w
        |FROM documents d JOIN th ON d.lang = th.lang""".stripMargin,
    // one SQL for both KMV faces: the merged-shards query must equal the
    // whole-corpus sketch (mergeability), so it shares the oracle verbatim
    "stats_kmv_distinct" -> kmvSql,
    "stats_kmv_merged" -> kmvSql,
    "stats_kmv_streamed" -> kmvSql,
    "stats_kmv_overlap" -> kmvOverlapSql,
    // top journeys: per-user ordered type list truncated to 8, counted,
    // deterministic (n DESC, path ASC) top-20
    "events_top_paths" ->
      """WITH sq AS (
        |  SELECT user_id,
        |         array_to_string(list(event_type ORDER BY epoch_us(ts), event_id)[1:8], '>') AS path
        |  FROM events WHERE user_id IS NOT NULL GROUP BY 1)
        |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM sq GROUP BY 1
        |ORDER BY n_users DESC, path
        |LIMIT 20""".stripMargin,
    // Markov transitions: lag-1 window per user (event_id tiebreak),
    // pair counts row-normalized in integer milli
    "events_transitions" ->
      """WITH st AS (
        |  SELECT user_id, event_type AS to_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY epoch_us(ts), event_id) AS from_type
        |  FROM events WHERE user_id IS NOT NULL),
        |n AS (
        |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM st WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from FROM n GROUP BY 1)
        |SELECT n.from_type, n.to_type, n.n, t.n_from,
        |       CAST(n.n * 1000 // t.n_from AS BIGINT) AS p_milli
        |FROM n JOIN t USING (from_type)""".stripMargin,
    // incremental rollup: the batch-maintained store must answer exactly
    // like the one-pass aggregate over the fact table
    "rollup_incremental" ->
      """WITH base AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         CAST(round(CAST(value AS DOUBLE) * 1000, 0) AS BIGINT) AS vm
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(vm) AS BIGINT) AS sum_milli,
        |       CAST(MIN(vm) AS BIGINT) AS min_milli,
        |       CAST(MAX(vm) AS BIGINT) AS max_milli,
        |       CAST(CAST(SUM(vm) AS BIGINT) // COUNT(*) AS BIGINT) AS avg_milli
        |FROM base GROUP BY 1, 2""".stripMargin,
    "rollup_serve_levels" ->
      """WITH base AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         CAST(round(CAST(value AS DOUBLE) * 1000, 0) AS BIGINT) AS vm
        |  FROM events WHERE value IS NOT NULL)
        |SELECT 'event_type' AS level, event_type, CAST(NULL AS VARCHAR) AS day,
        |       CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(vm) AS BIGINT) AS sum_milli,
        |       CAST(MIN(vm) AS BIGINT) AS min_milli, CAST(MAX(vm) AS BIGINT) AS max_milli,
        |       CAST(CAST(SUM(vm) AS BIGINT) // COUNT(*) AS BIGINT) AS avg_milli
        |FROM base GROUP BY 2
        |UNION ALL
        |SELECT 'day', CAST(NULL AS VARCHAR), CAST(day AS VARCHAR),
        |       CAST(COUNT(*) AS BIGINT), CAST(SUM(vm) AS BIGINT),
        |       CAST(MIN(vm) AS BIGINT), CAST(MAX(vm) AS BIGINT),
        |       CAST(CAST(SUM(vm) AS BIGINT) // COUNT(*) AS BIGINT)
        |FROM base GROUP BY 3
        |UNION ALL
        |SELECT 'total', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
        |       CAST(COUNT(*) AS BIGINT), CAST(SUM(vm) AS BIGINT),
        |       CAST(MIN(vm) AS BIGINT), CAST(MAX(vm) AS BIGINT),
        |       CAST(CAST(SUM(vm) AS BIGINT) // COUNT(*) AS BIGINT)
        |FROM base""".stripMargin,
    // CMS inner product: same md5-digit counters per half, dot per depth
    // row, min over rows
    "stats_cms_join_est" ->
      """WITH hv AS (
        |  SELECT event_id % 2 AS side, md5(CAST(user_id AS VARCHAR)) AS h
        |  FROM events WHERE user_id IS NOT NULL),
        |dd AS (SELECT unnest([0, 1, 2, 3]) AS d),
        |cells AS (
        |  SELECT side, d,
        |         (strpos('0123456789abcdef', substr(h, d * 2 + 1, 1)) - 1) * 16
        |         + strpos('0123456789abcdef', substr(h, d * 2 + 2, 1)) - 1 AS bucket,
        |         CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM hv CROSS JOIN dd GROUP BY 1, 2, 3),
        |dots AS (
        |  SELECT a.d, CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS dot
        |  FROM cells a JOIN cells b
        |    ON a.side = 0 AND b.side = 1 AND a.d = b.d AND a.bucket = b.bucket
        |  GROUP BY 1)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_depths, CAST(MIN(dot) AS BIGINT) AS est_pairs
        |FROM dots""".stripMargin,
    // one SQL for all three histogram faces (linearity — see histSql)
    "stats_hist_quantiles" -> histSql,
    "stats_hist_quantiles_auto" -> histAutoSql,
    "stats_hist_quantiles_pergroup" -> histPerGroupSql,
    "stats_hist_merged" -> histSql,
    "stats_hist_streamed" -> histSql,
    "events_hopping_uniques_kmv" ->
      """WITH keyed AS (
        |  SELECT (epoch_us(ts) // 1800000000) * 1800000000 - offs AS window_start_us,
        |         event_type, user_id
        |  FROM events
        |  CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (CAST(1800000000 AS BIGINT))) AS d(offs)
        |  WHERE user_id IS NOT NULL),
        |hv AS (
        |  SELECT DISTINCT window_start_us, event_type,
        |    list_sum(list_transform(range(0, 14), i ->
        |      (strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), i + 1, 1)) - 1)::BIGINT
        |        << (4 * (13 - i)))) AS h
        |  FROM keyed),
        |r AS (SELECT window_start_us, event_type, h,
        |        row_number() OVER (PARTITION BY window_start_us, event_type ORDER BY h) AS rk
        |      FROM hv),
        |a AS (SELECT window_start_us, event_type, COUNT(*) AS n_kept, MAX(h) AS h_k
        |      FROM r WHERE rk <= 64 GROUP BY 1, 2)
        |SELECT window_start_us, event_type, CAST(n_kept AS BIGINT) AS n_kept,
        |       CAST(CASE WHEN n_kept < 64 THEN n_kept
        |            ELSE 4539628424389459968 // h_k END AS BIGINT) AS est_distinct
        |FROM a""".stripMargin,
    "stats_cms_freq" -> cmsSql,
    "stats_cms_merged" -> cmsSql,
    "stats_cms_streamed" -> cmsSql,
    // mode: (count DESC, value ASC) row_number argmax mirror
    "stats_mode" ->
      """WITH c AS (
        |  SELECT user_id, event_type AS v, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL GROUP BY 1, 2),
        |t AS (
        |  SELECT user_id, CAST(SUM(cnt) AS BIGINT) AS n,
        |         CAST(COUNT(*) AS BIGINT) AS n_distinct
        |  FROM c GROUP BY 1),
        |b AS (
        |  SELECT user_id, v AS mode, cnt AS mode_n FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY cnt DESC, v) AS rn
        |    FROM c)
        |  WHERE rn = 1)
        |SELECT t.user_id, t.n, t.n_distinct, b.mode, b.mode_n,
        |       CAST(b.mode_n * 1000000 // t.n AS BIGINT) AS mode_ppm
        |FROM t JOIN b USING (user_id)""".stripMargin,
    // median + MAD via the same exact histogram walk, values exact-milli,
    // flags integer
    "stats_mad_outliers" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |         CAST(round(CAST(n_chars AS DOUBLE) * 1000, 0) AS BIGINT) AS x_milli
        |  FROM documents WHERE n_chars IS NOT NULL),
        |h AS (SELECT lang, x_milli, COUNT(*) AS cnt FROM r GROUP BY 1, 2),
        |c AS (
        |  SELECT lang, x_milli,
        |         SUM(cnt) OVER (PARTITION BY lang ORDER BY x_milli
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         SUM(cnt) OVER (PARTITION BY lang) AS tot
        |  FROM h),
        |med AS (
        |  SELECT lang,
        |         CAST(MIN(CASE WHEN cum * 100 >= tot * 50 THEN x_milli END) AS BIGINT) AS med_milli
        |  FROM c GROUP BY 1),
        |dv AS (
        |  SELECT r.lang, abs(r.x_milli - med.med_milli) AS adev
        |  FROM r JOIN med ON r.lang = med.lang),
        |h2 AS (SELECT lang, adev, COUNT(*) AS cnt FROM dv GROUP BY 1, 2),
        |c2 AS (
        |  SELECT lang, adev,
        |         SUM(cnt) OVER (PARTITION BY lang ORDER BY adev
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         SUM(cnt) OVER (PARTITION BY lang) AS tot
        |  FROM h2),
        |mad AS (
        |  SELECT lang,
        |         CAST(MIN(CASE WHEN cum * 100 >= tot * 50 THEN adev END) AS BIGINT) AS mad_milli
        |  FROM c2 GROUP BY 1)
        |SELECT r.doc_id, r.lang, r.x_milli, med.med_milli, mad.mad_milli,
        |       CAST(CASE WHEN 1000 * abs(r.x_milli - med.med_milli) > 3000 * mad.mad_milli
        |            THEN 1 ELSE 0 END AS BIGINT) AS outlier
        |FROM r JOIN med ON r.lang = med.lang JOIN mad ON r.lang = mad.lang""".stripMargin,
    // per-cohort exact nearest-rank deciles (the stats_quantiles chain
    // twice) joined on the group, unpivoted one row per percentile
    "stats_qq_shift" -> {
      val ps = Seq(10, 25, 50, 75, 90)
      def side(c: Int, tag: String) = {
        val qcols = ps
          .map(p =>
            s"CAST(MIN(CASE WHEN cum * 100 >= tot * $p THEN v END) AS BIGINT) AS ${tag}_p$p")
          .mkString(",\n  ")
        s"""h$c AS (SELECT g, v, COUNT(*) AS cnt FROM e WHERE c = $c GROUP BY 1, 2),
           |c$c AS (
           |  SELECT g, v,
           |         SUM(cnt) OVER (PARTITION BY g ORDER BY v
           |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           |         SUM(cnt) OVER (PARTITION BY g) AS tot
           |  FROM h$c),
           |q$c AS (
           |  SELECT g, CAST(MAX(tot) AS BIGINT) AS n_$tag,
           |  $qcols
           |  FROM c$c GROUP BY g)""".stripMargin
      }
      val rows = ps
        .map(p =>
          s"SELECT g AS event_type, n_a, n_b, CAST($p AS BIGINT) AS p, " +
            s"a_p$p AS q_a, b_p$p AS q_b, b_p$p - a_p$p AS shift FROM j")
        .mkString("\nUNION ALL ")
      s"""WITH e AS (
         |  SELECT event_type AS g, CAST(user_id % 2 AS INT) AS c,
         |         CAST(round(value * 1000, 0) AS BIGINT) AS v
         |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
         |${side(0, "a")},
         |${side(1, "b")},
         |j AS (SELECT * FROM q0 JOIN q1 USING (g))
         |$rows""".stripMargin
    },
    // pooled-variance z^2 multiplied through to one exact rational:
    // (x_a*n_b - x_b*n_a)^2*(n_a+n_b) over n_a*n_b*(x)*(n-x), in milli
    "stats_two_proportion" -> {
      val num = "(CAST(x_a AS HUGEINT) * n_b - CAST(x_b AS HUGEINT) * n_a) * " +
        "(CAST(x_a AS HUGEINT) * n_b - CAST(x_b AS HUGEINT) * n_a) * (n_a + n_b)"
      val den = "CAST(n_a AS HUGEINT) * n_b * (x_a + x_b) * (n_a + n_b - x_a - x_b)"
      s"""WITH e AS (
         |  SELECT event_type AS g, CAST(user_id % 2 AS INT) AS c,
         |         CASE WHEN value >= 100 THEN 1 ELSE 0 END AS s
         |  FROM events
         |  WHERE user_id IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL),
         |a AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_a, CAST(SUM(s) AS BIGINT) AS x_a
         |      FROM e WHERE c = 0 GROUP BY 1),
         |b AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_b, CAST(SUM(s) AS BIGINT) AS x_b
         |      FROM e WHERE c = 1 GROUP BY 1),
         |j AS (
         |  SELECT COALESCE(a.g, b.g) AS g,
         |         COALESCE(n_a, 0) AS n_a, COALESCE(x_a, 0) AS x_a,
         |         COALESCE(n_b, 0) AS n_b, COALESCE(x_b, 0) AS x_b
         |  FROM a FULL OUTER JOIN b ON b.g = a.g)
         |SELECT g AS event_type, n_a, x_a, n_b, x_b,
         |       CAST(CASE WHEN n_a > 0 THEN (1000000 * x_a) // n_a END AS BIGINT) AS p_a_ppm,
         |       CAST(CASE WHEN n_b > 0 THEN (1000000 * x_b) // n_b END AS BIGINT) AS p_b_ppm,
         |       CAST(CASE WHEN $den > 0 THEN (1000 * $num) // ($den) END AS BIGINT) AS z2_milli,
         |       CASE WHEN $den > 0 THEN (1000 * $num) // ($den) > 3841 END AS significant
         |FROM j""".stripMargin
    },
    "stats_quantiles" ->
      """WITH h AS (
        |  SELECT lang, n_chars, COUNT(*) AS cnt FROM documents GROUP BY 1, 2),
        |c AS (
        |  SELECT lang, n_chars,
        |         SUM(cnt) OVER (PARTITION BY lang ORDER BY n_chars
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         SUM(cnt) OVER (PARTITION BY lang) AS tot
        |  FROM h)
        |SELECT lang, CAST(MAX(tot) AS BIGINT) AS n_rows,
        |       CAST(MIN(CASE WHEN cum * 100 >= tot * 25 THEN n_chars END) AS BIGINT) AS p25,
        |       CAST(MIN(CASE WHEN cum * 100 >= tot * 50 THEN n_chars END) AS BIGINT) AS p50,
        |       CAST(MIN(CASE WHEN cum * 100 >= tot * 75 THEN n_chars END) AS BIGINT) AS p75,
        |       CAST(MIN(CASE WHEN cum * 100 >= tot * 90 THEN n_chars END) AS BIGINT) AS p90
        |FROM c GROUP BY lang""".stripMargin,
    "cdc_merge" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
        |ch AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |         1 AS seq, 'D' AS op FROM t WHERE o_orderkey % 10 = 0
        |  UNION ALL SELECT o_orderkey, o_custkey, 'STALE', 0.0, 1, 'U'
        |    FROM t WHERE o_orderkey % 10 = 1
        |  UNION ALL SELECT o_orderkey, o_custkey, 'UPD', CAST(o_custkey AS DOUBLE), 2, 'U'
        |    FROM t WHERE o_orderkey % 10 = 1
        |  UNION ALL SELECT o_orderkey + 1000000, o_custkey, 'NEW', 1.0, 1, 'I'
        |    FROM t WHERE o_orderkey % 10 = 2
        |  UNION ALL SELECT o_orderkey + 2000000, o_custkey, o_orderstatus, o_totalprice, 1, 'D'
        |    FROM t WHERE o_orderkey % 10 = 3),
        |latest AS (
        |  SELECT * FROM (
        |    SELECT ch.*, ROW_NUMBER() OVER (
        |      PARTITION BY o_orderkey
        |      ORDER BY seq DESC, op DESC, o_custkey DESC, o_orderstatus DESC, o_totalprice DESC) AS rn
        |    FROM ch) WHERE rn = 1)
        |SELECT COALESCE(t.o_orderkey, l.o_orderkey) AS o_orderkey,
        |       CASE WHEN l.op IS NOT NULL THEN l.o_custkey ELSE t.o_custkey END AS o_custkey,
        |       CASE WHEN l.op IS NOT NULL THEN l.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
        |       CASE WHEN l.op IS NOT NULL THEN l.o_totalprice ELSE t.o_totalprice END AS o_totalprice
        |FROM t FULL OUTER JOIN latest l ON t.o_orderkey = l.o_orderkey
        |WHERE (l.op IS NULL OR l.op <> 'D')
        |  AND COALESCE(t.o_orderkey, l.o_orderkey) % 23 = 0""".stripMargin
  )
}
