package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** General analytics queries over the TPC-H-ish star — operator breadth
  * beyond the reference's inner-equi-join-only surface: exact decimal
  * aggregation, a multi-join revenue rollup with broadcastable dimensions,
  * and an anti-join. Sums over doubles cast to DECIMAL first so both
  * engines aggregate exactly (FP summation order is engine-dependent;
  * decimals are not).
  */
object GenQueries {

  private def t(s: SparkSession, dir: String, n: String) =
    s.read.parquet(s"$dir/$n.parquet")

  /** Mirrors Relational.scd2Apply over the [[scd2Dim]] fixture: the open
    * version + the key's changes form one (ts, src, attrs)-ordered
    * timeline, no-op entries collapse via null-safe per-field compare
    * (rn=1 mirrors Spark's lag-null first-row rule), lead() closes each
    * surviving version. Shared by the `etl_scd2` oracle and, as a nested
    * subquery, the `etl_scd2_asof` interval join.
    */
  private lazy val scd2DimSql: String =
    """WITH open0 AS (
      |  SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal,
      |         CASE WHEN c_custkey % 13 = 0 THEN 500 ELSE 0 END AS ts,
      |         0 AS src
      |  FROM customer),
      |closed AS (
      |  SELECT c_custkey, 'OLDSEG' AS c_mktsegment, c_acctbal,
      |         CAST(0 AS BIGINT) AS valid_from_us, CAST(500 AS BIGINT) AS valid_to_us,
      |         false AS is_current
      |  FROM customer WHERE c_custkey % 13 = 0),
      |ch AS (
      |  SELECT c_custkey AS k, 'SEG' || CAST(c_custkey % 5 AS VARCHAR) AS seg,
      |         c_acctbal AS bal, 1000 AS ts, 1 AS src
      |  FROM customer WHERE c_custkey % 3 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_mktsegment, c_acctbal, 2000, 1
      |  FROM customer WHERE c_custkey % 5 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_mktsegment, c_acctbal + 1.0, 3000, 1
      |  FROM customer WHERE c_custkey % 7 = 0
      |  UNION ALL
      |  SELECT c_custkey + 10000000, c_mktsegment, c_acctbal, 1500, 1
      |  FROM customer WHERE c_custkey % 11 = 0),
      |tl AS (SELECT * FROM open0 UNION ALL SELECT * FROM ch),
      |d AS (
      |  SELECT *,
      |         LAG(seg) OVER w AS pseg, LAG(bal) OVER w AS pbal,
      |         ROW_NUMBER() OVER w AS rn
      |  FROM tl WINDOW w AS (PARTITION BY k ORDER BY ts, src, seg, bal)),
      |s AS (
      |  SELECT k, seg, bal, ts, src FROM d
      |  WHERE rn = 1 OR seg IS DISTINCT FROM pseg OR bal IS DISTINCT FROM pbal),
      |v AS (
      |  SELECT k, seg, bal, ts,
      |         LEAD(ts) OVER (PARTITION BY k ORDER BY ts, src, seg, bal) AS vto
      |  FROM s)
      |SELECT k AS c_custkey, seg AS c_mktsegment, bal AS c_acctbal,
      |       CAST(ts AS BIGINT) AS valid_from_us, CAST(vto AS BIGINT) AS valid_to_us,
      |       vto IS NULL AS is_current
      |FROM v
      |WHERE vto IS NULL OR vto <> ts
      |UNION ALL SELECT * FROM closed""".stripMargin

  /** The SCD2 customer-dimension fixture shared by `etl_scd2` (the apply)
    * and `etl_scd2_asof` (the point-in-time consumer): closed history for
    * %13 keys, changes at ts 1000/2000/3000 (segment, no-op, balance),
    * brand-new %11 keys at 1500.
    */
  private def scd2Dim(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val open = cust.select(
      col("c_custkey"),
      col("c_mktsegment"),
      col("c_acctbal"),
      when(col("c_custkey") % 13 === 0, 500L).otherwise(0L).as("valid_from_us"),
      lit(null).cast("long").as("valid_to_us"))
    val closedRows = cust
      .filter(col("c_custkey") % 13 === 0)
      .select(
        col("c_custkey"),
        lit("OLDSEG").as("c_mktsegment"),
        col("c_acctbal"),
        lit(0L).as("valid_from_us"),
        lit(500L).as("valid_to_us"))
    val ch1 = cust
      .filter(col("c_custkey") % 3 === 0)
      .select(
        col("c_custkey"),
        concat(lit("SEG"), (col("c_custkey") % 5).cast("string")).as("c_mktsegment"),
        col("c_acctbal"),
        lit(1000L).as("ts_us"))
    val noop = cust
      .filter(col("c_custkey") % 5 === 0)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"), lit(2000L).as("ts_us"))
    val ch2 = cust
      .filter(col("c_custkey") % 7 === 0)
      .select(
        col("c_custkey"),
        col("c_mktsegment"),
        (col("c_acctbal") + 1.0).as("c_acctbal"),
        lit(3000L).as("ts_us"))
    val fresh = cust
      .filter(col("c_custkey") % 11 === 0)
      .select(
        (col("c_custkey") + 10000000L).as("c_custkey"),
        col("c_mktsegment"),
        col("c_acctbal"),
        lit(1500L).as("ts_us"))
    graft.ops.Relational.scd2Apply(
      open.unionByName(closedRows),
      ch1.unionByName(noop).unionByName(ch2).unionByName(fresh),
      "c_custkey",
      Seq("c_mktsegment", "c_acctbal"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-shaped pricing summary: grouped decimal aggregation
    "gen_pricing_summary" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") < to_timestamp(lit("1998-09-01")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum(
            (col("l_extendedprice").cast("decimal(18,2)") *
              (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)") -
                col("l_discount").cast("decimal(18,2)"))).cast("decimal(28,4)"))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).cast("long").as("count_order"))
    },
    // revenue by nation: fact -> supplier -> nation -> region joins
    // (dimensions broadcast), grouped decimal sum, deterministic order
    "gen_nation_revenue" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum(
            (col("l_extendedprice").cast("decimal(18,2)") *
              (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)") -
                col("l_discount").cast("decimal(18,2)"))).cast("decimal(28,4)"))
            .cast("double").as("revenue"),
          count(lit(1)).cast("long").as("n_items"))
    },
    // orders with no lineitems: left anti join (the testdata has 257 at sf0.01)
    "gen_orders_without_items" -> { (s, dir) =>
      t(s, dir, "orders")
        .join(
          t(s, dir, "lineitem").select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"),
          "left_anti")
        .select(
          col("o_orderkey").cast("long").as("o_orderkey"),
          col("o_orderstatus"),
          col("o_totalprice"))
    },
    // grouping sets: ROLLUP over (region, nation) with the grouping-id
    // bitmask disambiguating subtotal levels from genuine nulls
    "gen_revenue_rollup" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(
          grouping_id().cast("long").as("gid"),
          sum(
            (col("l_extendedprice").cast("decimal(18,2)") *
              (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)") -
                col("l_discount").cast("decimal(18,2)"))).cast("decimal(28,4)"))
            .cast("double").as("revenue"),
          count(lit(1)).cast("long").as("n_items"))
    },
    // grouping sets: full CUBE over (region, order priority) — all four
    // subtotal combinations in one pass (partial-agg per grouping set)
    "gen_revenue_cube" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .join(
          broadcast(t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .cube(col("r_name"), col("o_orderpriority"))
        .agg(
          grouping_id().cast("long").as("gid"),
          sum(
            (col("l_extendedprice").cast("decimal(18,2)") *
              (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)") -
                col("l_discount").cast("decimal(18,2)"))).cast("decimal(28,4)"))
            .cast("double").as("revenue"),
          count(lit(1)).cast("long").as("n_items"))
    },
    // time-series gap fill: the complete daily calendar (from the series'
    // own bounds — a 1-row aggregate exploded, broadcast to nothing) left-
    // joined against observed daily totals, absent days zero-filled
    "gen_gap_fill" -> { (s, dir) =>
      val daily = t(s, dir, "orders")
        .groupBy(unix_micros(col("o_orderdate").cast("timestamp")).as("d_us"))
        .agg(count(lit(1)).cast("long").as("n_orders"))
      val dayUs = 86400000000L
      val calendar = daily
        .agg(min("d_us").as("lo"), max("d_us").as("hi"))
        .select(explode(expr(s"sequence(lo, hi, $dayUs)")).as("d_us"))
      calendar
        .join(daily, Seq("d_us"), "left")
        .select(col("d_us"), coalesce(col("n_orders"), lit(0L)).as("n_orders"))
    },
    // window frames: 7-row moving aggregate over the (small, pre-aggregated)
    // daily series, partitioned by year so no global-order single partition
    // z-order clustering audit on a pinned 2-bit grid over (quantity,
    // extendedprice): per z-cell counts + min/max — the file statistics a
    // scan prunes on, proving each cell covers a compact rectangle
    "gen_layout_zorder" -> { (s, dir) =>
      graft.io.Layout.zBucketStats(
        t(s, dir, "lineitem"),
        Seq(
          "l_quantity" -> Array(13.0, 25.0, 38.0),
          "l_extendedprice" -> Array(26000.0, 51000.0, 77000.0)),
        bitsPerCol = 2)
    },
    // per-nation revenue trend: exact integer OLS over order-level points,
    // x = days since a FIXED origin near the data (1995-01-01); customer
    // dim joins hash-side, the 25-row nation dim broadcasts
    "gen_revenue_trend" -> { (s, dir) =>
      val o = t(s, dir, "orders")
        .select(
          col("o_custkey"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("x"),
          col("o_totalprice"))
      val c = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val n = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      graft.ops.Stats.linearTrend(
        o.join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey")),
        "n_name",
        "x",
        "o_totalprice")
    },
    "gen_moving_avg" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val daily = t(s, dir, "orders")
        .groupBy(col("o_orderdate").as("d"))
        .agg(
          sum(col("o_totalprice").cast("decimal(18,2)")).as("tot"),
          count(lit(1)).cast("long").as("n_orders"))
      val w = Window
        .partitionBy(year(col("d").cast("timestamp")))
        .orderBy("d")
        .rowsBetween(-6, 0)
      daily
        .withColumn("msum", sum("tot").over(w))
        .withColumn("mcnt", count(lit(1)).over(w))
        .select(
          unix_micros(col("d").cast("timestamp")).as("d_us"),
          col("tot").cast("double").as("tot"),
          col("n_orders"),
          round(col("msum").cast("double") / col("mcnt"), 4).as("mavg7"))
    },
    // DESCRIBE-grade column profile of events: per column null share and
    // exact distinct cardinality, one Expand-planned aggregation pass
    "audit_profile" -> { (s, dir) =>
      graft.ops.Checks.profile(
        s.read.parquet(s"$dir/events.parquet"),
        Seq("event_id", "user_id", "event_type", "value"))
    },
    // entity resolution over the customer dimension: offset-canopy
    // blocking (two half-cell-shifted cents grids per nation — a planted
    // +1-cent duplicate crossing one grid's boundary is still caught by
    // the other), integer-cents verify, connected components → entity id;
    // records with no match are their own entity
    "er_entities" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val base = c.select(
        col("c_custkey").cast("long").as("id"),
        col("c_nationkey").cast("long").as("nat"),
        expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)").as("cents"))
      val planted = base
        .filter(col("id") % 9 === 0)
        .select((col("id") + 1000000L).as("id"), col("nat"), (col("cents") + 1L).as("cents"))
      val recs = base.unionByName(planted)
      graft.ops.Dedup.resolveEntities(
        recs,
        "id",
        Seq(
          struct(col("nat"), expr("cents div 10000").as("g")),
          struct(col("nat"), expr("(cents + 5000) div 10000").as("g"))),
        (a, b) =>
          a.getField("nat") === b.getField("nat") &&
            abs(a.getField("cents") - b.getField("cents")) <= 2L)
    },
    // the no-silent-caps report for ER blocking: per blocker, how many
    // hot blocks the maxBlock canopy cap excluded and how many records
    // sat in them — maxBlock=5 guarantees dropped nation blocks at every
    // sf (25 nations over >=150 customers), while the fine cents grid
    // stays mostly under the cap
    "er_block_report" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val recs = c.select(
        col("c_custkey").cast("long").as("id"),
        col("c_nationkey").cast("long").as("nat"),
        expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)").as("cents"))
      graft.ops.Dedup.blockingDropReport(
        recs,
        Seq(col("nat"), expr("cents div 100000")),
        maxBlock = 5L)
    },
    // two-hop reach over the chord graph (n -> n+1, n -> n+2): local
    // influence radius, hub-capped wedge step, exact distinct union
    "graph_two_hop_reach" -> { (s, dir) =>
      val k = t(s, dir, "orders").select(col("o_custkey").cast("long").as("n")).distinct()
      val e = k.select(col("n").as("src"), (col("n") + 1).as("dst"))
        .unionAll(k.select(col("n").as("src"), (col("n") + 2).as("dst")))
      graft.ops.Graph.twoHopReach(e, maxMiddleDeg = 64L)
    },
    // resource-allocation link prediction over the same chord graph:
    // non-adjacent pairs scored 1e6 div deg(common neighbor), top-3 per
    // node — exact integer ppm, the log-free Adamic-Adar twin
    "graph_link_prediction" -> { (s, dir) =>
      val k = t(s, dir, "orders").select(col("o_custkey").cast("long").as("n")).distinct()
      val e = k.select(col("n").as("src"), (col("n") + 1).as("dst"))
        .unionAll(k.select(col("n").as("src"), (col("n") + 2).as("dst")))
      graft.ops.Graph.resourceAllocationRecs(e, k = 3, maxMiddleDeg = 64L)
    },
    // degree assortativity of the bipartite trade graph: hubs (busy
    // customers) link suppliers of every degree, so r reads negative —
    // the one-number structure readout next to clustering; exact decimal
    // moments over the doubled edge list, corr-kernel float conversion
    "graph_assortativity" -> { (s, dir) =>
      val e = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey")
        .join(
          t(s, dir, "lineitem").select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      graft.ops.Graph.assortativityMilli(e)
    },
    // SCD Type-2 apply over the customer dimension: closed history passes
    // through, no-op re-crawls collapse, real changes close the open
    // version and chain (two changes to %21 keys), %11 keys arrive brand
    // new — the warehouse pattern behind every as-of dimension join
    "etl_scd2" -> { (s, dir) => scd2Dim(s, dir) },
    // the dimension USED: every order joined to the customer version that
    // was true at the order's own event time — half-open intervals, exact
    // boundary semantics (ts == valid_from reads the new version), the
    // bucketed as-of shape underneath
    "etl_scd2_asof" -> { (s, dir) =>
      val facts = t(s, dir, "orders").select(
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_custkey").cast("long").as("c_custkey"),
        (col("o_orderkey") % 4000).cast("long").as("ts_us"))
      graft.ops.Relational.scd2AsOf(
        facts,
        scd2Dim(s, dir),
        "c_custkey",
        "ts_us",
        Seq("c_mktsegment", "c_acctbal"),
        bucketUnits = 1000L)
    },
    // the 100 TB face of the profile: distincts via the deterministic
    // m=256 HLL (bounded per-task state) instead of |cols| exact dedup
    // aggregations — integer/string columns only here, so the string
    // casts the registers hash are engine-portable
    "audit_profile_approx" -> { (s, dir) =>
      graft.ops.Checks.profileApprox(
        s.read.parquet(s"$dir/events.parquet"),
        Seq("event_id", "user_id", "event_type"))
    },
    // data-quality audit: key uniqueness + null rates on orders, orphan
    // lineitems (no parent order) by anti join — one gating summary row
    "audit_orders" -> { (s, dir) =>
      val orders = t(s, dir, "orders")
      graft.ops.Checks
        .audit(orders, "o_orderkey", Seq("o_custkey", "o_totalprice"))
        .crossJoin(
          graft.ops.Checks
            .orphanCount(t(s, dir, "lineitem"), orders, "l_orderkey", "o_orderkey"))
    },
    // declarative data-contract report: one conditional-sum pass, one row
    // per rule (the min-length rule is violated by real short orders, so
    // the report exercises non-zero counts)
    "audit_expectations" -> { (s, dir) =>
      val orders = t(s, dir, "orders")
      graft.ops.Checks.expectations(
        orders,
        Seq(
          "key_nonneg" -> (col("o_orderkey") >= 0),
          "price_positive" -> (col("o_totalprice") > 0),
          "priority_urgent" -> col("o_orderpriority").startsWith("1-"),
          "status_known" -> col("o_orderstatus").isin("O", "F", "P")))
    },
    // schema-contract pre-flight over the events table. The contract
    // deliberately mis-declares `value` as string (type_mismatch),
    // declares an absent `ingest_batch` (missing), and does NOT declare
    // `ts` (unexpected) — so the report is independent of ts's physical
    // encoding, the exact drift this check exists to catch.
    "audit_schema_drift" -> { (s, dir) =>
      graft.ops.Checks.schemaDrift(
        s.read.parquet(s"$dir/events.parquet"),
        Seq(
          "event_id" -> "bigint",
          "user_id" -> "bigint",
          "event_type" -> "string",
          "value" -> "string",
          "props" -> "string",
          "ingest_batch" -> "bigint"))
    },
    // bloom-prefiltered semi join: lineitem rows whose part is size-1,
    // probe side pruned map-side by a bloom sketch of the build keys
    // before any shuffle; exact join removes false positives, so the
    // oracle is the plain IN-subquery
    "gen_bloom_semi_join" -> { (s, dir) =>
      graft.ops.BloomJoin
        .semiJoinBloom(
          t(s, dir, "lineitem"),
          t(s, dir, "part").filter(col("p_size") === 1),
          "l_partkey",
          "p_partkey",
          expectedItems = 10000L)
        .groupBy("l_linestatus")
        .agg(
          count(lit(1)).cast("long").as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
    },
    // integer PageRank over the customer<->supplier trade graph (who-buys-
    // from-whom via orders x lineitem, bidirectional): node encoding
    // custkey*2 / suppkey*2+1 keeps the bipartite id spaces disjoint
    "graph_pagerank" -> { (s, dir) =>
      val d = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey")
        .join(
          t(s, dir, "lineitem").select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val e = d.union(d.select(col("dst").as("src"), col("src").as("dst")))
      graft.ops.Graph.pageRankMilli(e, iters = 3)
    },
    // personalized PageRank from a seed customer set over the same trade
    // graph: relevance FROM the seeds (mass decays with distance,
    // unreachable nodes hold at exactly 0), integer-unrolled oracle
    "graph_ppr" -> { (s, dir) =>
      val d = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey")
        .join(
          t(s, dir, "lineitem").select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val e = d.union(d.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = t(s, dir, "customer")
        .filter(col("c_custkey") % 97 === 0)
        .select((col("c_custkey") * 2).cast("long").as("node"))
      graft.ops.Graph.personalizedPageRankMilli(e, seeds, iters = 3)
    },
    // HITS over the DIRECTED customer→supplier trade graph: customers are
    // hubs (they point), suppliers authorities (they are pointed at) —
    // the bipartite ranking the symmetrized PageRank blurs; integer
    // max-normalized half-steps, 3 iterations unrolled in the oracle
    "graph_hits" -> { (s, dir) =>
      val d = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey")
        .join(
          t(s, dir, "lineitem").select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      graft.ops.Graph.hitsMilli(d, iters = 3)
    },
    // feature-redundancy screen: pairwise Pearson r over the lineitem
    // numerics in one pass, exact integer moments, one final sqrt/divide
    "gen_correlation" -> { (s, dir) =>
      graft.ops.Stats.corrMatrixMilli(
        t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    },
    // Spearman twin of gen_correlation: tie-exact doubled midranks, then
    // the same one-scan Pearson kernel — monotone association, outlier-
    // proof, integer-exact end to end
    "gen_spearman" -> { (s, dir) =>
      graft.ops.Stats.spearmanMatrixMilli(
        t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    },
    // Pareto concentration of revenue over customers: exact-cents decile
    // table (NTILE semantics) with cumulative share ppm — "the top 10% of
    // customers carry X% of revenue" as one hash-checked row per decile
    "gen_pareto" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val rev = t(s, dir, "orders")
        .groupBy(col("o_custkey").cast("long").as("id"))
        .agg(sum(expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)")).cast("long").as("cents"))
      val per = graft.ops.Relational
        .globalNtile(rev, Seq(col("cents").desc, col("id")), 10, "decile")
        .groupBy("decile")
        .agg(count(lit(1)).cast("long").as("n_customers"), sum("cents").cast("long").as("rev_cents"))
      // the cumulative window runs over the TEN decile rows, not data
      val w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
      per
        .withColumn("cum_cents", sum("rev_cents").over(w).cast("long"))
        .crossJoin(broadcast(per.agg(sum("rev_cents").cast("decimal(38,0)").as("__tot"))))
        .select(
          col("decile").cast("long").as("decile"),
          col("n_customers"),
          col("rev_cents"),
          expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * cum_cents) div __tot AS BIGINT)")
            .as("cum_share_ppm"))
    },
    // community detection over the same bipartite customer—supplier
    // graph: 4 deterministic synchronous LPA rounds (min-label ties),
    // label column = community id
    "graph_labelprop" -> { (s, dir) =>
      val d = t(s, dir, "orders")
        .select("o_orderkey", "o_custkey")
        .join(
          t(s, dir, "lineitem").select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      graft.ops.Graph.labelPropagation(d, rounds = 4)
    },
    // k-core decomposition over a planted clique-plus-chain graph on the
    // customer key space: K10 cliques on even decades (internal degree 9)
    // survive k=6 peeling, chain/bridge noise (degree <= 6) peels away —
    // the peel cascade depth is a property of the STRUCTURE, so the same
    // fixture converges in 1 round at every scale factor
    "graph_kcore" -> { (s, dir) =>
      val kk = t(s, dir, "orders")
        .select(col("o_custkey").cast("long").as("n"))
        .distinct()
        .localCheckpoint()
      val ka = kk.select(col("n").as("an")).withColumn("ag", expr("an div 10"))
      val kb = kk.select(col("n").as("bn")).withColumn("bg", expr("bn div 10"))
      val clique = ka
        .join(kb, col("ag") === col("bg") && col("an") =!= col("bn") && col("ag") % 2 === 0)
        .select(col("an").as("src"), col("bn").as("dst"))
      val chain = kk
        .select(col("n").as("src"), (col("n") + 1).as("dst"))
        .unionAll(kk.select(col("n").as("src"), (col("n") + 2).as("dst")))
      val bridges = kk
        .filter(expr("(n div 10) % 2 = 0 AND n % 10 < 3"))
        .select(col("n").as("src"), (col("n") + 20).as("dst"))
      val cand = clique
        .unionAll(chain)
        .unionAll(bridges)
        .join(kk.select(col("n").as("dst")), Seq("dst"), "left_semi")
      graft.ops.Graph.kCore(cand, k = 6, maxRounds = 8)
    },
    // per-vertex core numbers via 4 unrolled h-index rounds over the
    // clique-plus-bridge graph (no chain noise: this fixture's cascade
    // depth is structural — shells stabilize in <= 3 rounds at any scale,
    // so round 4's values ARE the core numbers): K10 members settle at 9,
    // bridge endpoints' inflated degrees collapse in one round
    "graph_core_numbers" -> { (s, dir) =>
      val kk = t(s, dir, "orders")
        .select(col("o_custkey").cast("long").as("n"))
        .distinct()
        .localCheckpoint()
      val ka = kk.select(col("n").as("an")).withColumn("ag", expr("an div 10"))
      val kb = kk.select(col("n").as("bn")).withColumn("bg", expr("bn div 10"))
      val clique = ka
        .join(kb, col("ag") === col("bg") && col("an") =!= col("bn") && col("ag") % 2 === 0)
        .select(col("an").as("src"), col("bn").as("dst"))
      val bridges = kk
        .filter(expr("(n div 10) % 2 = 0 AND n % 10 < 3"))
        .select(col("n").as("src"), (col("n") + 20).as("dst"))
      val cand = clique
        .unionAll(bridges)
        .join(kk.select(col("n").as("dst")), Seq("dst"), "left_semi")
      graft.ops.Graph.coreNumbers(cand, rounds = 4)
    },
    // triangle counting over a deterministic chord graph on the customer
    // key space: edges (n, n+1) and (n, n+2) for every distinct custkey n —
    // sparse (degree <= 4), scales linearly with the table, and every run
    // of consecutive keys closes one triangle per interior key
    "graph_triangles" -> { (s, dir) =>
      val k = t(s, dir, "orders").select(col("o_custkey").cast("long").as("n")).distinct()
      val e = k
        .select(col("n").as("src"), (col("n") + 1).as("dst"))
        .unionAll(k.select(col("n").as("src"), (col("n") + 2).as("dst")))
      graft.ops.Graph.triangleCounts(e)
    },
    // 3-truss of the chord graph after 2 peel rounds: edges outside any
    // triangle die, survivors report their recounted support
    "graph_ktruss" -> { (s, dir) =>
      val k = t(s, dir, "orders").select(col("o_custkey").cast("long").as("n")).distinct()
      val e = k
        .select(col("n").as("src"), (col("n") + 1).as("dst"))
        .unionAll(k.select(col("n").as("src"), (col("n") + 2).as("dst")))
      graft.ops.Graph.kTruss(e, k = 3, rounds = 2)
    },
    // Watts-Strogatz local clustering per node over the same chord graph:
    // 2e6*tri div d(d-1) ppm, degree-1 nodes null, triangle-free nodes 0
    "graph_clustering" -> { (s, dir) =>
      val k = t(s, dir, "orders").select(col("o_custkey").cast("long").as("n")).distinct()
      val e = k
        .select(col("n").as("src"), (col("n") + 1).as("dst"))
        .unionAll(k.select(col("n").as("src"), (col("n") + 2).as("dst")))
      graft.ops.Graph.clusteringCoeff(e)
    },
    // the persisted edge store's full lifecycle, driver-verified: base
    // build (chord graph missing every n%3==0 second chord), an append
    // batch completing it, a removal batch tombstoning the n%7==0 first
    // chords — support maintained INCREMENTALLY (only wedges through the
    // churned edges), readback must hash-equal the batch recompute over
    // the final live set, which the oracle derives directly
    "graph_support_incremental" -> { (s, dir) =>
      val k = t(s, dir, "orders").select(col("o_custkey").cast("long").as("n")).distinct()
      val idx = s"${sys.props("java.io.tmpdir")}/graft_edgestore_${ProcessHandle.current().pid()}"
      val base = k
        .select(col("n").as("src"), (col("n") + 1).as("dst"))
        .unionAll(
          k.filter(col("n") % 3 =!= 0).select(col("n").as("src"), (col("n") + 2).as("dst")))
      graft.ops.Graph.writeEdgeStore(base, idx)
      graft.ops.Graph.appendEdgeStore(
        k.filter(col("n") % 3 === 0).select(col("n").as("src"), (col("n") + 2).as("dst")),
        idx)
      graft.ops.Graph.removeFromEdgeStore(
        k.filter(col("n") % 7 === 0).select(col("n").as("src"), (col("n") + 1).as("dst")),
        idx)
      graft.ops.Graph.readEdgeSupport(s, idx)
    },
    // the incremental CC label store: decade chains (n%10<=7 first
    // chords) built batch, then a bridge batch (n%30==8 second chords)
    // merges neighboring components INCREMENTALLY — a label-graph
    // contraction the size of the batch, never a corpus re-solve; the
    // readback must hash-equal the closure over the union
    "graph_cc_incremental" -> { (s, dir) =>
      val k = t(s, dir, "orders").select(col("o_custkey").cast("long").as("n")).distinct()
      val idx = s"${sys.props("java.io.tmpdir")}/graft_ccstore_${ProcessHandle.current().pid()}"
      graft.ops.Graph.writeCcStore(
        k.filter(col("n") % 10 <= 7).select(col("n").as("src"), (col("n") + 1).as("dst")),
        idx)
      graft.ops.Graph.appendCcStore(
        k.filter(col("n") % 30 === 8).select(col("n").as("src"), (col("n") + 2).as("dst")),
        idx)
      graft.ops.Graph.readCcLabels(s, idx)
    },
    // the STREAMED label store: three ingest generations (decade chains,
    // then the %30 bridges with a deliberate duplicate resend, then the
    // %10<=1 chords) — exactly-once WITHOUT a stamp, because min-label
    // merging is monotone and idempotent; readback must hash-equal the
    // closure over the union
    "graph_cc_streamed" -> { (s, dir) =>
      val k = t(s, dir, "orders").select(col("o_custkey").cast("long").as("n")).distinct()
      val idx = s"${sys.props("java.io.tmpdir")}/graft_ccstream_${ProcessHandle.current().pid()}"
      val b1 = k.filter(col("n") % 30 === 8).select(col("n").as("src"), (col("n") + 2).as("dst"))
      graft.ops.Graph.ingestCcBatch(
        k.filter(col("n") % 10 <= 7).select(col("n").as("src"), (col("n") + 1).as("dst")),
        idx, 0L)
      graft.ops.Graph.ingestCcBatch(b1, idx, 1L)
      graft.ops.Graph.ingestCcBatch(b1, idx, 1L) // checkpoint retry: must merge nothing
      graft.ops.Graph.ingestCcBatch(
        k.filter(col("n") % 10 <= 1).select(col("n").as("src"), (col("n") + 2).as("dst")),
        idx, 2L)
      graft.ops.Graph.readCcLabels(s, idx)
    },
    // the CC store's REMOVAL path: decade chains with cycle chords at
    // n%10<=1; removing the n%10==4 chain edge genuinely SPLITS its
    // decade while the n%10==0 one is cycle-protected, plus an edge the
    // store never saw (no-op by contract) — only the touched components
    // re-solve, nodes stripped of every edge stay as singletons, and the
    // readback must hash-equal the closure over the live set seeded at
    // every node the store ever labeled
    "graph_cc_removal" -> { (s, dir) =>
      val k = t(s, dir, "orders").select(col("o_custkey").cast("long").as("n")).distinct()
      val idx = s"${sys.props("java.io.tmpdir")}/graft_ccremove_${ProcessHandle.current().pid()}"
      val base = k
        .filter(col("n") % 10 <= 8)
        .select(col("n").as("src"), (col("n") + 1).as("dst"))
        .unionAll(
          k.filter(col("n") % 10 <= 1).select(col("n").as("src"), (col("n") + 2).as("dst")))
      graft.ops.Graph.writeCcStore(base, idx)
      val rem = k
        .filter(col("n") % 10 === 4 || col("n") % 10 === 0)
        .select(col("n").as("src"), (col("n") + 1).as("dst"))
        .unionAll(
          k.filter(col("n") % 100 === 3).select(col("n").as("src"), (col("n") + 77).as("dst")))
      val liveAfter = base.join(
        rem.select(col("src").as("rs"), col("dst").as("rd")),
        col("src") === col("rs") && col("dst") === col("rd"),
        "left_anti")
      graft.ops.Graph.removeFromCcStore(rem, liveAfter, idx)
      graft.ops.Graph.readCcLabels(s, idx)
    },
    // the INDEXED removal — the regime the node-keyed secondary index
    // exists for: a SMALL cut (n%1000==4 first chords, ~1/100 of the
    // decades) against a big store. buildCcNodeIndex opts the store in; the
    // removal's membership probe then PRUNES to the removed endpoints'
    // node buckets instead of scanning every label row, and the mutation
    // maintains cclabels + nodeidx through ONE staged apply (the
    // mirror-consistency spec pins their equality)
    "graph_cc_removal_indexed" -> { (s, dir) =>
      val k = t(s, dir, "orders").select(col("o_custkey").cast("long").as("n")).distinct()
      val idx = s"${sys.props("java.io.tmpdir")}/graft_ccremidx_${ProcessHandle.current().pid()}"
      val base = k
        .filter(col("n") % 10 <= 8)
        .select(col("n").as("src"), (col("n") + 1).as("dst"))
        .unionAll(
          k.filter(col("n") % 10 <= 1).select(col("n").as("src"), (col("n") + 2).as("dst")))
      graft.ops.Graph.writeCcStore(base, idx)
      graft.ops.Graph.buildCcNodeIndex(s, idx)
      val rem = k
        .filter(col("n") % 1000 === 4)
        .select(col("n").as("src"), (col("n") + 1).as("dst"))
      val liveAfter = base.join(
        rem.select(col("src").as("rs"), col("dst").as("rd")),
        col("src") === col("rs") && col("dst") === col("rd"),
        "left_anti")
      graft.ops.Graph.removeFromCcStore(rem, liveAfter, idx)
      graft.ops.Graph.readCcLabels(s, idx)
    },
    // TIME-TRAVEL over the streamed label store's remap log: the same
    // three-generation ingest as graph_cc_streamed, labels read AS OF
    // batch 1 — the third generation's merges must be invisible, and the
    // replay (insertion labels resolved through the remap closure) must
    // hash-equal the min-label closure over just the first two
    // generations
    "graph_cc_asof" -> { (s, dir) =>
      val k = t(s, dir, "orders").select(col("o_custkey").cast("long").as("n")).distinct()
      val idx = s"${sys.props("java.io.tmpdir")}/graft_ccasof_${ProcessHandle.current().pid()}"
      graft.ops.Graph.ingestCcBatch(
        k.filter(col("n") % 10 <= 7).select(col("n").as("src"), (col("n") + 1).as("dst")),
        idx, 0L)
      graft.ops.Graph.ingestCcBatch(
        k.filter(col("n") % 30 === 8).select(col("n").as("src"), (col("n") + 2).as("dst")),
        idx, 1L)
      graft.ops.Graph.ingestCcBatch(
        k.filter(col("n") % 10 <= 1).select(col("n").as("src"), (col("n") + 2).as("dst")),
        idx, 2L)
      graft.ops.Graph.readCcLabelsAsOf(s, idx, 1L)
    },
    // the remap log FOLDED through generation 1 (compactCcLog: gens 0-1
    // collapse into resolved batch_id=-1 node rows, gen 2 kept verbatim),
    // then read as of 2 — the replay must compose the folded prefix with
    // the surviving generation's remaps and hash-equal the closure over
    // all three generations (= what the unfolded log answered); reads
    // below the fold refuse, spec-pinned
    "graph_cc_asof_compacted" -> { (s, dir) =>
      val k = t(s, dir, "orders").select(col("o_custkey").cast("long").as("n")).distinct()
      val idx = s"${sys.props("java.io.tmpdir")}/graft_ccfold_${ProcessHandle.current().pid()}"
      graft.ops.Graph.ingestCcBatch(
        k.filter(col("n") % 10 <= 7).select(col("n").as("src"), (col("n") + 1).as("dst")),
        idx, 0L)
      graft.ops.Graph.ingestCcBatch(
        k.filter(col("n") % 30 === 8).select(col("n").as("src"), (col("n") + 2).as("dst")),
        idx, 1L)
      graft.ops.Graph.ingestCcBatch(
        k.filter(col("n") % 10 <= 1).select(col("n").as("src"), (col("n") + 2).as("dst")),
        idx, 2L)
      graft.ops.Graph.compactCcLog(s, idx, 1L)
      graft.ops.Graph.readCcLabelsAsOf(s, idx, 2L)
    },
    // RESIZE mid-lifecycle: the incremental edge store relaid 64 -> 16
    // buckets between its mutations (one content-preserving shuffle +
    // the pin update — never a triangle recount), with the removal then
    // pruning against the NEW layout; the readback must hash-equal the
    // batch recompute exactly as if the resize never happened
    "graph_support_rebucketed" -> { (s, dir) =>
      val k = t(s, dir, "orders").select(col("o_custkey").cast("long").as("n")).distinct()
      val idx = s"${sys.props("java.io.tmpdir")}/graft_rebucket_${ProcessHandle.current().pid()}"
      val base = k
        .select(col("n").as("src"), (col("n") + 1).as("dst"))
        .unionAll(
          k.filter(col("n") % 3 =!= 0).select(col("n").as("src"), (col("n") + 2).as("dst")))
      graft.ops.Graph.writeEdgeStore(base, idx)
      graft.ops.Graph.appendEdgeStore(
        k.filter(col("n") % 3 === 0).select(col("n").as("src"), (col("n") + 2).as("dst")),
        idx)
      graft.ops.Graph.rebucketEdgeStore(s, idx, 16)
      graft.ops.Graph.removeFromEdgeStore(
        k.filter(col("n") % 7 === 0).select(col("n").as("src"), (col("n") + 1).as("dst")),
        idx)
      graft.ops.Graph.readEdgeSupport(s, idx)
    },
    // the store's read-side dividend: per-node triangle counts served
    // from the incrementally-maintained support (sum of incident edge
    // supports = 2·tri(v)) — no wedge join at read time; must hash-equal
    // the direct per-node recompute over the final live set
    "graph_tricount_served" -> { (s, dir) =>
      val k = t(s, dir, "orders").select(col("o_custkey").cast("long").as("n")).distinct()
      val idx = s"${sys.props("java.io.tmpdir")}/graft_edgetric_${ProcessHandle.current().pid()}"
      val base = k
        .select(col("n").as("src"), (col("n") + 1).as("dst"))
        .unionAll(
          k.filter(col("n") % 3 =!= 0).select(col("n").as("src"), (col("n") + 2).as("dst")))
      graft.ops.Graph.writeEdgeStore(base, idx)
      graft.ops.Graph.appendEdgeStore(
        k.filter(col("n") % 3 === 0).select(col("n").as("src"), (col("n") + 2).as("dst")),
        idx)
      graft.ops.Graph.removeFromEdgeStore(
        k.filter(col("n") % 7 === 0).select(col("n").as("src"), (col("n") + 1).as("dst")),
        idx)
      graft.ops.Graph.readTriangleCounts(s, idx)
    },
    // the STREAMED edge store: three ingest generations (first chords,
    // then the second chords split by parity with deliberate duplicate
    // resends, with a checkpoint-retry of batch 1) — exactly-once support
    // maintenance must leave the readback hash-equal to the batch
    // recompute over the union
    "graph_support_streamed" -> { (s, dir) =>
      val k = t(s, dir, "orders").select(col("o_custkey").cast("long").as("n")).distinct()
      val idx = s"${sys.props("java.io.tmpdir")}/graft_edgestream_${ProcessHandle.current().pid()}"
      val c1 = k.select(col("n").as("src"), (col("n") + 1).as("dst"))
      val c2 = k.select(col("n").as("src"), (col("n") + 2).as("dst"))
      val b1 = c2.filter(col("src") % 2 === 0).unionAll(c1.filter(col("src") % 5 === 0))
      graft.ops.Graph.ingestEdgeBatch(c1, idx, 0L)
      graft.ops.Graph.ingestEdgeBatch(b1, idx, 1L)
      graft.ops.Graph.ingestEdgeBatch(b1, idx, 1L) // checkpoint retry: must not recount
      graft.ops.Graph.ingestEdgeBatch(c2.filter(col("src") % 2 =!= 0), idx, 2L)
      graft.ops.Graph.readEdgeSupport(s, idx)
    },
    // multi-source BFS over the decade chains (component diameter <= 8,
    // so the wave converges in <= 16 rounds): landmarks at n%50 in {0,3}
    // give most touched components TWO sources — every (node, source)
    // hop distance must hash-equal the oracle's capped recursive walk
    "graph_bfs_distances" -> { (s, dir) =>
      val k = t(s, dir, "orders").select(col("o_custkey").cast("long").as("n")).distinct()
      val e = k.filter(col("n") % 10 <= 7).select(col("n").as("src"), (col("n") + 1).as("dst"))
      val lm = k.filter(col("n") % 50 === 0 || col("n") % 50 === 3).select(col("n").as("node"))
      graft.ops.Graph.bfsDistances(e, lm)
    },
    // landmark closeness over the same waves: reached-count, hop sum, and
    // the integer ppm rate (null when a landmark reaches no other)
    "graph_closeness" -> { (s, dir) =>
      val k = t(s, dir, "orders").select(col("o_custkey").cast("long").as("n")).distinct()
      val e = k.filter(col("n") % 10 <= 7).select(col("n").as("src"), (col("n") + 1).as("dst"))
      val lm = k.filter(col("n") % 50 === 0 || col("n") % 50 === 3).select(col("n").as("node"))
      graft.ops.Graph.landmarkCloseness(e, lm)
    },
    // TIME-TRAVEL over the streamed store's generation log: the same
    // three-generation ingest as graph_support_streamed, read AS OF
    // batch 1 — support must hash-equal the batch recompute over just
    // the first two generations (the later chords invisible)
    "graph_support_asof" -> { (s, dir) =>
      val k = t(s, dir, "orders").select(col("o_custkey").cast("long").as("n")).distinct()
      val idx = s"${sys.props("java.io.tmpdir")}/graft_edgeasof_${ProcessHandle.current().pid()}"
      val c1 = k.select(col("n").as("src"), (col("n") + 1).as("dst"))
      val c2 = k.select(col("n").as("src"), (col("n") + 2).as("dst"))
      graft.ops.Graph.ingestEdgeBatch(c1, idx, 0L)
      graft.ops.Graph.ingestEdgeBatch(c2.filter(col("src") % 2 === 0), idx, 1L)
      graft.ops.Graph.ingestEdgeBatch(c2.filter(col("src") % 2 =!= 0), idx, 2L)
      graft.ops.Graph.triangleSupportAsOf(s, idx, 1L)
    },
    // friend-of-friend link prediction over the same chord graph: top-3
    // non-adjacent nodes per node by common-neighbor count (n+-3 shares
    // two middles, n+-4 one), hub middles capped — all integer, so the
    // oracle mirrors cap, anti-join, and tiebreak exactly
    "graph_recs" -> { (s, dir) =>
      val k = t(s, dir, "orders").select(col("o_custkey").cast("long").as("n")).distinct()
      val e = k
        .select(col("n").as("src"), (col("n") + 1).as("dst"))
        .unionAll(k.select(col("n").as("src"), (col("n") + 2).as("dst")))
      graft.ops.Graph.commonNeighborRecs(e, k = 3)
    }
  )

  private val discPrice =
    """CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))""".stripMargin

  /** Per-edge triangle support over a chord-graph edge source `e00Sql`
    * (which may reference `kys`) — one graph_ktruss-style pass: the batch
    * recompute both edge-store readback oracles compare against.
    */
  private def edgeSupportOracle(e00Sql: String): String =
    s"""WITH kys AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS n FROM orders),
       |e00 AS ($e00Sql),
       |e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |       FROM e00 WHERE src <> dst),
       |dg AS MATERIALIZED (SELECT node, CAST(COUNT(*) AS BIGINT) AS d
       |       FROM (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0) GROUP BY 1),
       |o1 AS MATERIALIZED (
       |  SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v) THEN e.u ELSE e.v END AS a,
       |         CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v) THEN e.v ELSE e.u END AS b
       |  FROM e0 e JOIN dg du ON du.node = e.u JOIN dg dv ON dv.node = e.v),
       |t1 AS MATERIALIZED (SELECT w.a, w.w1, w.w2 FROM (
       |         SELECT e1.a, e1.b AS w1, e2.b AS w2
       |         FROM o1 e1 JOIN o1 e2 ON e1.a = e2.a AND e1.b < e2.b) w
       |       JOIN e0 s ON s.u = w.w1 AND s.v = w.w2),
       |cr AS (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS support FROM (
       |         SELECT least(a, w1) AS u, greatest(a, w1) AS v FROM t1
       |         UNION ALL SELECT least(a, w2), greatest(a, w2) FROM t1
       |         UNION ALL SELECT w1, w2 FROM t1) GROUP BY 1, 2)
       |SELECT e.u, e.v, CAST(COALESCE(cr.support, 0) AS BIGINT) AS support
       |FROM e0 e LEFT JOIN cr ON cr.u = e.u AND cr.v = e.v""".stripMargin

  /** Shared walk CTEs for the BFS family: decade-chain edges, both-way
    * adjacency, landmarks at n%50 in {0,3} restricted to graph nodes,
    * and the depth-capped recursive wave (the cap never binds — the
    * fixture's components have diameter <= 8 — it just bounds the
    * recursion the way the operator's maxRounds does).
    */
  private def bfsOracle(finalSelect: String): String =
    s"""WITH RECURSIVE kys AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS n FROM orders),
       |e00 AS (SELECT n AS src, n + 1 AS dst FROM kys WHERE n % 10 <= 7),
       |e0 AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |       FROM e00 WHERE src <> dst),
       |adj AS (SELECT u AS a, v AS b FROM e0 UNION SELECT v, u FROM e0),
       |srcs AS (SELECT DISTINCT n AS s FROM kys
       |         WHERE (n % 50 = 0 OR n % 50 = 3) AND n IN (SELECT a FROM adj)),
       |walk(node, src, d) AS (
       |  SELECT s, s, 0 FROM srcs
       |  UNION
       |  SELECT a.b, w.src, w.d + 1 FROM walk w JOIN adj a ON a.a = w.node WHERE w.d < 16)
       |$finalSelect""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "audit_profile" -> {
      def one(c: String) =
        s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |       CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
           |       CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct
           |FROM events""".stripMargin
      s"""WITH p AS (
         |${Seq("event_id", "user_id", "event_type", "value").map(one).mkString("\nUNION ALL\n")})
         |SELECT col_name, n_rows, n_null,
         |       CAST((1000000 * n_null) // n_rows AS BIGINT) AS null_ppm, n_distinct
         |FROM p""".stripMargin
    },
    // mirrors the blocking → verify → recursive-CC chain; singletons keep
    // their own id via the left join
    "er_entities" ->
      """WITH RECURSIVE recs AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS id, CAST(c_nationkey AS BIGINT) AS nat,
        |         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 1000000, CAST(c_nationkey AS BIGINT),
        |         CAST(round(c_acctbal * 100, 0) AS BIGINT) + 1
        |  FROM customer WHERE c_custkey % 9 = 0),
        |k1 AS (SELECT id, nat, cents // 10000 AS g FROM recs),
        |ok1 AS (SELECT nat, g FROM k1 GROUP BY 1, 2 HAVING COUNT(*) <= 1000),
        |p1 AS (
        |  SELECT a.id AS doc_a, b.id AS doc_b
        |  FROM k1 a JOIN k1 b ON a.nat = b.nat AND a.g = b.g AND a.id < b.id
        |  JOIN ok1 ON ok1.nat = a.nat AND ok1.g = a.g),
        |k2 AS (SELECT id, nat, (cents + 5000) // 10000 AS g FROM recs),
        |ok2 AS (SELECT nat, g FROM k2 GROUP BY 1, 2 HAVING COUNT(*) <= 1000),
        |p2 AS (
        |  SELECT a.id AS doc_a, b.id AS doc_b
        |  FROM k2 a JOIN k2 b ON a.nat = b.nat AND a.g = b.g AND a.id < b.id
        |  JOIN ok2 ON ok2.nat = a.nat AND ok2.g = a.g),
        |cand AS (SELECT doc_a, doc_b FROM p1 UNION SELECT doc_a, doc_b FROM p2),
        |verified AS (
        |  SELECT c.doc_a, c.doc_b
        |  FROM cand c
        |  JOIN recs ra ON ra.id = c.doc_a
        |  JOIN recs rb ON rb.id = c.doc_b
        |  WHERE ra.nat = rb.nat AND abs(ra.cents - rb.cents) <= 2),
        |edges AS (
        |  SELECT doc_a AS a, doc_b AS b FROM verified
        |  UNION
        |  SELECT doc_b AS a, doc_a AS b FROM verified),
        |reach(id, r) AS (
        |  SELECT DISTINCT a, a FROM edges
        |  UNION
        |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
        |labels AS (SELECT id, MIN(r) AS ent FROM reach GROUP BY id)
        |SELECT recs.id, COALESCE(labels.ent, recs.id) AS entity_id
        |FROM recs LEFT JOIN labels ON labels.id = recs.id""".stripMargin,
    // hub-capped wedges weighted 1e6 // deg(middle), summed per
    // non-adjacent pair, top-3 per node
    "graph_link_prediction" ->
      """WITH k AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS n FROM orders),
        |e0 AS (SELECT n AS src, n + 1 AS dst FROM k
        |       UNION ALL SELECT n, n + 2 FROM k),
        |und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |        FROM e0 WHERE src <> dst),
        |adj AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
        |mid AS (SELECT u AS m, 1000000 // COUNT(*) AS w_ppm
        |        FROM adj GROUP BY 1 HAVING COUNT(*) <= 64),
        |sp AS (SELECT adj.u AS m, adj.v AS x, mid.w_ppm
        |       FROM adj JOIN mid ON mid.m = adj.u),
        |cand AS (
        |  SELECT l.x AS a, r.x AS b,
        |         CAST(SUM(l.w_ppm) AS BIGINT) AS ra_ppm,
        |         CAST(COUNT(*) AS BIGINT) AS cn
        |  FROM sp l JOIN sp r ON r.m = l.m AND l.x < r.x
        |  GROUP BY 1, 2),
        |nonadj AS (
        |  SELECT cand.* FROM cand
        |  LEFT JOIN und ON und.u = cand.a AND und.v = cand.b
        |  WHERE und.u IS NULL),
        |bidir AS (
        |  SELECT a AS node, b AS rec, ra_ppm, cn FROM nonadj
        |  UNION ALL SELECT b, a, ra_ppm, cn FROM nonadj)
        |SELECT node, CAST(rank AS BIGINT) AS rank, rec, ra_ppm, cn FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY node
        |    ORDER BY ra_ppm DESC, cn DESC, rec) AS rank
        |  FROM bidir)
        |WHERE rank <= 3""".stripMargin,
    // adjacency ∪ hub-capped wedge endpoints, distinct-counted per node
    "graph_two_hop_reach" ->
      """WITH k AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS n FROM orders),
        |e0 AS (SELECT n AS src, n + 1 AS dst FROM k
        |       UNION ALL SELECT n, n + 2 FROM k),
        |und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |        FROM e0 WHERE src <> dst),
        |adj AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
        |deg AS (SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY 1),
        |okm AS (SELECT node AS m FROM deg WHERE d <= 64),
        |two AS (
        |  SELECT l.u AS a, r.v AS c
        |  FROM adj l
        |  JOIN okm ON okm.m = l.v
        |  JOIN adj r ON r.u = l.v
        |  WHERE l.u <> r.v),
        |reach AS (
        |  SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS n_reach2 FROM (
        |    SELECT u AS a, v AS c FROM adj
        |    UNION
        |    SELECT a, c FROM two) t
        |  GROUP BY 1)
        |SELECT deg.node, deg.d AS n_1hop,
        |       CAST(COALESCE(reach.n_reach2, deg.d) AS BIGINT) AS n_reach2,
        |       CAST(64 AS BIGINT) AS max_middle_deg
        |FROM deg LEFT JOIN reach ON reach.node = deg.node""".stripMargin,
    // endpoint-degree Pearson over both orientations of the undirected
    // trade edges — HUGEINT moments, corr-kernel conversion
    "graph_assortativity" ->
      """WITH d AS (
        |  SELECT DISTINCT o_custkey * 2 AS s0, l_suppkey * 2 + 1 AS d0
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |und AS (SELECT DISTINCT least(s0, d0) AS u, greatest(s0, d0) AS v
        |        FROM d WHERE s0 <> d0),
        |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS dg
        |        FROM (SELECT u AS node FROM und UNION ALL SELECT v FROM und)
        |        GROUP BY 1),
        |bp AS (
        |  SELECT du.dg AS dx, dv.dg AS dy
        |  FROM und JOIN deg du ON du.node = und.u JOIN deg dv ON dv.node = und.v
        |  UNION ALL
        |  SELECT dv.dg, du.dg
        |  FROM und JOIN deg du ON du.node = und.u JOIN deg dv ON dv.node = und.v),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n2,
        |         SUM(CAST(dx AS HUGEINT)) AS sx, SUM(CAST(dy AS HUGEINT)) AS sy,
        |         SUM(CAST(dx AS HUGEINT) * dx) AS sxx, SUM(CAST(dy AS HUGEINT) * dy) AS syy,
        |         SUM(CAST(dx AS HUGEINT) * dy) AS sxy
        |  FROM bp)
        |SELECT CAST(n2 // 2 AS BIGINT) AS n_edges,
        |       CAST(round(
        |         CASE WHEN n2 >= 2
        |               AND (n2 * sxx - sx * sx) > 0
        |               AND (n2 * syy - sy * sy) > 0
        |         THEN CAST(n2 * sxy - sx * sy AS DOUBLE) /
        |              sqrt(CAST(n2 * sxx - sx * sx AS DOUBLE) *
        |                   CAST(n2 * syy - sy * sy AS DOUBLE))
        |         END, 6) AS DOUBLE) AS r
        |FROM m""".stripMargin,
    // per-blocker block-size histogram folded to dropped-block counts —
    // the cap audit, exact integers throughout
    "er_block_report" ->
      """WITH recs AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS id, CAST(c_nationkey AS BIGINT) AS nat,
        |         CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
        |  FROM customer),
        |b0 AS (SELECT nat AS bk, CAST(COUNT(*) AS BIGINT) AS c FROM recs
        |       WHERE nat IS NOT NULL GROUP BY 1),
        |b1 AS (SELECT cents // 100000 AS bk, CAST(COUNT(*) AS BIGINT) AS c FROM recs
        |       WHERE cents IS NOT NULL GROUP BY 1)
        |SELECT CAST(0 AS BIGINT) AS blocker,
        |       CAST(COUNT(CASE WHEN c > 5 THEN 1 END) AS BIGINT) AS n_blocks_dropped,
        |       CAST(COALESCE(SUM(CASE WHEN c > 5 THEN c END), 0) AS BIGINT)
        |         AS n_records_affected
        |FROM b0
        |UNION ALL
        |SELECT CAST(1 AS BIGINT),
        |       CAST(COUNT(CASE WHEN c > 5 THEN 1 END) AS BIGINT),
        |       CAST(COALESCE(SUM(CASE WHEN c > 5 THEN c END), 0) AS BIGINT)
        |FROM b1""".stripMargin,
    // mirrors Relational.scd2Apply: the open version + the key's changes
    // form one (ts, src, attrs)-ordered timeline, no-op entries collapse
    // via null-safe per-field compare (rn=1 mirrors Spark's lag-null
    // first-row rule), lead() closes each surviving version
    "etl_scd2" -> scd2DimSql,
    // the point-in-time read over the same version chains: plain interval
    // LEFT JOIN in the oracle (valid_from <= ts < valid_to, open = no
    // bound) — Spark's bucketed as-of + validity cut must agree exactly,
    // boundary timestamps included
    "etl_scd2_asof" ->
      s"""WITH f AS (
         |  SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
         |         CAST(o_custkey AS BIGINT) AS c_custkey,
         |         CAST(o_orderkey % 4000 AS BIGINT) AS ts_us
         |  FROM orders)
         |SELECT f.o_orderkey, f.c_custkey, f.ts_us, d.c_mktsegment, d.c_acctbal
         |FROM f LEFT JOIN ($scd2DimSql) d
         |  ON d.c_custkey = f.c_custkey
         | AND d.valid_from_us <= f.ts_us
         | AND (d.valid_to_us IS NULL OR f.ts_us < d.valid_to_us)""".stripMargin,
    // mirrors Checks.profileApprox: per-column string-cast union, then
    // the deterministic HLL register chain (RelQueries' stats_hll shape)
    // with the small-range rule folded into the selected estimate
    "audit_profile_approx" -> {
      val d = "'0123456789abcdef'"
      def dig(i: Int) = s"(strpos($d, substr(h, $i, 1)) - 1)"
      val chunkExpr = (3 to 10)
        .map(i => s"${dig(i)} * ${1L << (4 * (10 - i))}")
        .mkString(" + ")
      s"""WITH src AS (
         |  SELECT 'event_id' AS grp, CAST(event_id AS VARCHAR) AS sv FROM events
         |  UNION ALL SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
         |  UNION ALL SELECT 'event_type', event_type FROM events),
         |cnt AS (
         |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |         CAST(COUNT(*) - COUNT(sv) AS BIGINT) AS n_null
         |  FROM src GROUP BY 1),
         |vals AS (SELECT DISTINCT grp, sv FROM src WHERE sv IS NOT NULL),
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
         |  SELECT grp,
         |         CAST(256 - n_hit AS BIGINT) AS n_zero,
         |         round(0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 8589934592.0 /
         |               CAST(hit_scaled + (256 - n_hit) * 8589934592 AS DOUBLE), 4) AS est_raw,
         |         CASE WHEN 256 - n_hit > 0
         |              THEN round(256.0 * ln(256.0 / CAST(256 - n_hit AS DOUBLE)), 4)
         |         END AS est_small
         |  FROM ag),
         |este AS (
         |  SELECT grp,
         |         CASE WHEN est_raw <= 640.0 AND n_zero > 0 THEN est_small ELSE est_raw END AS est
         |  FROM est0)
         |SELECT n.grp AS col_name,
         |       CAST(COALESCE(c.n_rows, 0) AS BIGINT) AS n_rows,
         |       CAST(COALESCE(c.n_null, 0) AS BIGINT) AS n_null,
         |       CAST(COALESCE((1000000 * c.n_null) // c.n_rows, 0) AS BIGINT) AS null_ppm,
         |       COALESCE(e.est, 0.0) AS n_distinct_est
         |FROM (VALUES ('event_id'), ('user_id'), ('event_type')) n(grp)
         |LEFT JOIN cnt c ON c.grp = n.grp
         |LEFT JOIN este e ON e.grp = n.grp""".stripMargin
    },
    "audit_orders" ->
      """SELECT a.*, b.* FROM
        |(SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |        CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_dup_keys,
        |        CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_o_custkey,
        |        CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_o_totalprice
        | FROM orders) a,
        |(SELECT CAST(COUNT(*) AS BIGINT) AS n_orphans FROM lineitem l
        | WHERE l.l_orderkey IS NULL
        |    OR NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) b""".stripMargin,
    "audit_expectations" ->
      """WITH a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(CASE WHEN NOT COALESCE(o_orderkey >= 0, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v1,
        |    CAST(SUM(CASE WHEN NOT COALESCE(o_totalprice > 0, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v2,
        |    CAST(SUM(CASE WHEN NOT COALESCE(o_orderpriority LIKE '1-%', FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v3,
        |    CAST(SUM(CASE WHEN NOT COALESCE(o_orderstatus IN ('O', 'F', 'P'), FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v4
        |  FROM orders)
        |SELECT 'key_nonneg' AS rule, v1 AS n_violations, n_rows FROM a
        |UNION ALL SELECT 'price_positive', v2, n_rows FROM a
        |UNION ALL SELECT 'priority_urgent', v3, n_rows FROM a
        |UNION ALL SELECT 'status_known', v4, n_rows FROM a""".stripMargin,
    "audit_schema_drift" ->
      """SELECT * FROM (VALUES
        |  ('event_id', 'ok'), ('user_id', 'ok'), ('event_type', 'ok'),
        |  ('value', 'type_mismatch'), ('props', 'ok'),
        |  ('ingest_batch', 'missing'), ('ts', 'unexpected'))
        |AS t("column", status)""".stripMargin,
    "gen_bloom_semi_join" ->
      """SELECT l_linestatus,
        |  CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 1)
        |GROUP BY 1""".stripMargin,
    "gen_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         |  CAST(SUM($discPrice) AS DOUBLE) AS sum_disc_price,
         |  CAST(COUNT(*) AS BIGINT) AS count_order
         |FROM lineitem
         |WHERE l_shipdate < TIMESTAMP '1998-09-01'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "gen_nation_revenue" ->
      s"""SELECT r_name, n_name,
         |  CAST(SUM($discPrice) AS DOUBLE) AS revenue,
         |  CAST(COUNT(*) AS BIGINT) AS n_items
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name""".stripMargin,
    "gen_orders_without_items" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderstatus, o_totalprice
        |FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)""".stripMargin,
    "gen_revenue_rollup" ->
      s"""SELECT r_name, n_name,
         |  CAST(GROUPING(r_name, n_name) AS BIGINT) AS gid,
         |  CAST(SUM($discPrice) AS DOUBLE) AS revenue,
         |  CAST(COUNT(*) AS BIGINT) AS n_items
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "gen_revenue_cube" ->
      s"""SELECT r_name, o_orderpriority,
         |  CAST(GROUPING(r_name, o_orderpriority) AS BIGINT) AS gid,
         |  CAST(SUM($discPrice) AS DOUBLE) AS revenue,
         |  CAST(COUNT(*) AS BIGINT) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY CUBE (r_name, o_orderpriority)""".stripMargin,
    "gen_gap_fill" ->
      """WITH daily AS (
        |  SELECT epoch_us(o_orderdate) AS d_us, CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1),
        |bounds AS (SELECT min(d_us) AS lo, max(d_us) AS hi FROM daily),
        |cal AS (
        |  SELECT unnest(range(lo, hi + 1, 86400000000)) AS d_us FROM bounds)
        |SELECT c.d_us, CAST(COALESCE(dy.n_orders, 0) AS BIGINT) AS n_orders
        |FROM cal c LEFT JOIN daily dy USING (d_us)""".stripMargin,
    "gen_moving_avg" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS d,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS tot,
        |         CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1),
        |win AS (
        |  SELECT d, tot, n_orders,
        |         SUM(tot) OVER w AS msum,
        |         COUNT(*) OVER w AS mcnt
        |  FROM daily
        |  WINDOW w AS (PARTITION BY year(d) ORDER BY d
        |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT epoch_us(d) AS d_us, CAST(tot AS DOUBLE) AS tot, n_orders,
        |       round(CAST(msum AS DOUBLE) / mcnt, 4) AS mavg7
        |FROM win""".stripMargin,
    "graph_labelprop" ->
      """WITH d AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS MATERIALIZED (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT src, dst FROM d UNION ALL SELECT dst AS src, src AS dst FROM d)),
        |l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
        |l1 AS MATERIALIZED (
        |  SELECT src AS node, label FROM (
        |    SELECT src, label, ROW_NUMBER() OVER (PARTITION BY src ORDER BY c DESC, label ASC) AS rn
        |    FROM (SELECT e.src, l.label, COUNT(*) AS c
        |          FROM e JOIN l0 l ON l.node = e.dst GROUP BY 1, 2))
        |  WHERE rn = 1),
        |l2 AS MATERIALIZED (
        |  SELECT src AS node, label FROM (
        |    SELECT src, label, ROW_NUMBER() OVER (PARTITION BY src ORDER BY c DESC, label ASC) AS rn
        |    FROM (SELECT e.src, l.label, COUNT(*) AS c
        |          FROM e JOIN l1 l ON l.node = e.dst GROUP BY 1, 2))
        |  WHERE rn = 1),
        |l3 AS MATERIALIZED (
        |  SELECT src AS node, label FROM (
        |    SELECT src, label, ROW_NUMBER() OVER (PARTITION BY src ORDER BY c DESC, label ASC) AS rn
        |    FROM (SELECT e.src, l.label, COUNT(*) AS c
        |          FROM e JOIN l2 l ON l.node = e.dst GROUP BY 1, 2))
        |  WHERE rn = 1),
        |l4 AS MATERIALIZED (
        |  SELECT src AS node, label FROM (
        |    SELECT src, label, ROW_NUMBER() OVER (PARTITION BY src ORDER BY c DESC, label ASC) AS rn
        |    FROM (SELECT e.src, l.label, COUNT(*) AS c
        |          FROM e JOIN l3 l ON l.node = e.dst GROUP BY 1, 2))
        |  WHERE rn = 1),
        |fin AS (SELECT node, label FROM l4)
        |SELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS label FROM fin""".stripMargin,
    // Morton interleave in plain arithmetic: q's bit j at position 2j,
    // p's bit j at position 2j+1
    "gen_layout_zorder" ->
      """WITH b AS (
        |  SELECT CASE WHEN l_quantity >= 38 THEN 3 WHEN l_quantity >= 25 THEN 2
        |              WHEN l_quantity >= 13 THEN 1 ELSE 0 END AS q,
        |         CASE WHEN l_extendedprice >= 77000 THEN 3 WHEN l_extendedprice >= 51000 THEN 2
        |              WHEN l_extendedprice >= 26000 THEN 1 ELSE 0 END AS p,
        |         l_quantity, l_extendedprice
        |  FROM lineitem)
        |SELECT CAST((q % 2) + ((q // 2) % 2) * 4 + (p % 2) * 2 + ((p // 2) % 2) * 8 AS BIGINT) AS zkey,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(MIN(l_quantity) AS DOUBLE) AS min_l_quantity,
        |       CAST(MAX(l_quantity) AS DOUBLE) AS max_l_quantity,
        |       CAST(MIN(l_extendedprice) AS DOUBLE) AS min_l_extendedprice,
        |       CAST(MAX(l_extendedprice) AS DOUBLE) AS max_l_extendedprice
        |FROM b GROUP BY 1""".stripMargin,
    // OLS in HUGEINT: products widened before summation, truncating //
    // division mirrors Spark's decimal div bit-for-bit
    "gen_revenue_trend" ->
      """WITH pts AS (
        |  SELECT n.n_name, CAST(CAST(o.o_orderdate AS DATE) - DATE '1995-01-01' AS BIGINT) AS x,
        |         CAST(round(CAST(o.o_totalprice AS DOUBLE) * 1000, 0) AS BIGINT) AS ym
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey),
        |agg AS (
        |  SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(ym) AS HUGEINT) AS sy,
        |         CAST(SUM(CAST(x AS HUGEINT) * ym) AS HUGEINT) AS sxy,
        |         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
        |  FROM pts GROUP BY 1),
        |f AS (
        |  SELECT n_name, n,
        |         CAST(n AS HUGEINT) * sxy - sx * sy AS s1,
        |         CAST(n AS HUGEINT) * sxx - sx * sx AS s2,
        |         sx, sy
        |  FROM agg)
        |SELECT n_name, n,
        |       CAST((1000 * s1) // s2 AS BIGINT) AS slope_micro,
        |       CAST((sy * s2 - s1 * sx) // (CAST(n AS HUGEINT) * s2) AS BIGINT) AS intercept_milli
        |FROM f WHERE s2 <> 0""".stripMargin,
    // k-core by the same monotone peel, 4 recursive rounds (fixpoint is
    // reached in 1 on this fixture at every sf — margin pinned anyway);
    // round-R rows are the core, final degrees from the induced subgraph
    "graph_kcore" ->
      """WITH RECURSIVE
        |kk AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS n FROM orders),
        |d AS (
        |  SELECT a.n AS src, b.n AS dst
        |  FROM kk a JOIN kk b
        |    ON a.n // 10 = b.n // 10 AND a.n <> b.n AND (a.n // 10) % 2 = 0
        |  UNION ALL SELECT n, n + 1 FROM kk
        |  UNION ALL SELECT n, n + 2 FROM kk
        |  UNION ALL SELECT n, n + 20 FROM kk WHERE (n // 10) % 2 = 0 AND n % 10 < 3),
        |e AS MATERIALIZED (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT src, dst FROM d UNION ALL SELECT dst, src FROM d)
        |  WHERE src IN (SELECT n FROM kk) AND dst IN (SELECT n FROM kk)),
        |surv(round, node) AS (
        |  SELECT 0, n FROM kk
        |  UNION ALL
        |  SELECT r + 1, src FROM (
        |    SELECT s.round AS r, e.src, COUNT(*) AS c
        |    FROM surv s JOIN e ON e.dst = s.node
        |    GROUP BY 1, 2)
        |  WHERE c >= 6 AND r < 4)
        |SELECT e.src AS node, CAST(COUNT(*) AS BIGINT) AS deg
        |FROM e
        |JOIN (SELECT node FROM surv WHERE round = 4) a ON e.src = a.node
        |JOIN (SELECT node FROM surv WHERE round = 4) b ON e.dst = b.node
        |GROUP BY 1""".stripMargin,
    // mirrors Graph.coreNumbers: degree start, then 4 unrolled h-index
    // rounds — per round, (node, neighbor-value) counts, cumulative n>=
    // over DISTINCT values descending, h = max(least(value, n>=))
    "graph_core_numbers" -> {
      def round(i: Int) =
        s"""c$i AS (
           |  SELECT src AS node, CAST(MAX(LEAST(cn, n_ge)) AS BIGINT) AS core FROM (
           |    SELECT src, cn, SUM(cnt) OVER (PARTITION BY src ORDER BY cn DESC) AS n_ge
           |    FROM (
           |      SELECT s.src, c.core AS cn, CAST(COUNT(*) AS BIGINT) AS cnt
           |      FROM sym s JOIN c${i - 1} c ON c.node = s.dst GROUP BY 1, 2))
           |  GROUP BY 1)""".stripMargin
      s"""WITH n AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS n FROM orders),
         |cl AS (
         |  SELECT a.n AS src, b.n AS dst FROM n a JOIN n b
         |  ON a.n // 10 = b.n // 10 AND a.n <> b.n AND (a.n // 10) % 2 = 0),
         |br AS (
         |  SELECT a.n AS src, a.n + 20 AS dst FROM n a
         |  WHERE (a.n // 10) % 2 = 0 AND a.n % 10 < 3
         |    AND EXISTS (SELECT 1 FROM n b WHERE b.n = a.n + 20)),
         |e0 AS (SELECT src, dst FROM cl UNION ALL SELECT src, dst FROM br),
         |sym AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM e0 WHERE src <> dst
         |    UNION ALL SELECT dst, src FROM e0 WHERE src <> dst)),
         |c0 AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS core FROM sym GROUP BY 1),
         |${(1 to 4).map(round).mkString(",\n")}
         |SELECT node, core FROM c4""".stripMargin
    },
    // mirrors Graph.hitsMilli: authority-first max-normalized half-steps
    // over the directed trade graph, 3 rounds unrolled
    "graph_hits" -> {
      def round(k: Int) =
        s"""a$k AS (
           |  SELECT e.dst AS node, CAST(SUM(hn${k - 1}.v) AS BIGINT) AS raw
           |  FROM e JOIN hn${k - 1} ON hn${k - 1}.node = e.src GROUP BY 1),
           |am$k AS (SELECT MAX(raw) AS m FROM a$k),
           |an$k AS (
           |  SELECT n.node, CAST(COALESCE((1000 * a$k.raw) // am$k.m, 0) AS BIGINT) AS v
           |  FROM nodes n LEFT JOIN a$k USING (node) CROSS JOIN am$k),
           |h$k AS (
           |  SELECT e.src AS node, CAST(SUM(an$k.v) AS BIGINT) AS raw
           |  FROM e JOIN an$k ON an$k.node = e.dst GROUP BY 1),
           |hm$k AS (SELECT MAX(raw) AS m FROM h$k),
           |hn$k AS (
           |  SELECT n.node, CAST(COALESCE((1000 * h$k.raw) // hm$k.m, 0) AS BIGINT) AS v
           |  FROM nodes n LEFT JOIN h$k USING (node) CROSS JOIN hm$k)"""
      s"""WITH e AS (
         |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |hn0 AS (SELECT node, CAST(1000 AS BIGINT) AS v FROM nodes),
         |${(1 to 3).map(round).mkString(",\n")}
         |SELECT hn3.node, hn3.v AS hub_milli, an3.v AS auth_milli
         |FROM hn3 JOIN an3 USING (node)""".stripMargin
    },
    // graph_pagerank's unrolled chain with the teleport pinned to seeds:
    // r0 = 1000 on seeds else 0; r = s*150 + (850*inb)//1000
    "graph_ppr" ->
      """WITH d AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT src, dst FROM d UNION ALL SELECT dst AS src, src AS dst FROM d),
        |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY 1),
        |sd AS (SELECT DISTINCT CAST(c_custkey * 2 AS BIGINT) AS node
        |       FROM customer WHERE c_custkey % 97 = 0),
        |nodes AS (
        |  SELECT n.node, CASE WHEN sd.node IS NULL THEN 0 ELSE 1 END AS s
        |  FROM (SELECT src AS node FROM e UNION SELECT dst FROM e
        |        UNION SELECT node FROM sd) n
        |  LEFT JOIN sd ON sd.node = n.node),
        |r0 AS (SELECT node, s, CAST(s * 1000 AS BIGINT) AS r FROM nodes),
        |c1 AS (
        |  SELECT e.dst AS node, SUM(r0.r // deg.deg) AS inb
        |  FROM e JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.src
        |  WHERE r0.r > 0 GROUP BY 1),
        |r1 AS (
        |  SELECT n.node, n.s, CAST(n.s * 150 + (850 * COALESCE(c1.inb, 0)) // 1000 AS BIGINT) AS r
        |  FROM nodes n LEFT JOIN c1 USING (node)),
        |c2 AS (
        |  SELECT e.dst AS node, SUM(r1.r // deg.deg) AS inb
        |  FROM e JOIN r1 ON e.src = r1.node JOIN deg ON e.src = deg.src
        |  WHERE r1.r > 0 GROUP BY 1),
        |r2 AS (
        |  SELECT n.node, n.s, CAST(n.s * 150 + (850 * COALESCE(c2.inb, 0)) // 1000 AS BIGINT) AS r
        |  FROM nodes n LEFT JOIN c2 USING (node)),
        |c3 AS (
        |  SELECT e.dst AS node, SUM(r2.r // deg.deg) AS inb
        |  FROM e JOIN r2 ON e.src = r2.node JOIN deg ON e.src = deg.src
        |  WHERE r2.r > 0 GROUP BY 1),
        |r3 AS (
        |  SELECT n.node, n.s, CAST(n.s * 150 + (850 * COALESCE(c3.inb, 0)) // 1000 AS BIGINT) AS r
        |  FROM nodes n LEFT JOIN c3 USING (node))
        |SELECT node, r AS rank_milli FROM r3""".stripMargin,
    // mirrors corrMatrixMilli: HUGEINT conditional moment sums, one
    // correctly-rounded double conversion + sqrt/divide per pair
    "gen_correlation" -> {
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val milli = cs.zipWithIndex
        .map { case (c, i) => s"CAST(round(CAST($c AS DOUBLE) * 1000, 0) AS BIGINT) AS v$i" }
        .mkString(",\n       ")
      val pairs = for { i <- cs.indices; j <- (i + 1) until cs.size } yield (i, j)
      val aggs = pairs.zipWithIndex
        .flatMap { case ((i, j), k) =>
          val both = s"v$i IS NOT NULL AND v$j IS NOT NULL"
          Seq(
            s"CAST(COUNT(*) FILTER (WHERE $both) AS BIGINT) AS n_$k",
            s"CAST(SUM(CAST(v$i AS HUGEINT)) FILTER (WHERE $both) AS HUGEINT) AS sx_$k",
            s"CAST(SUM(CAST(v$j AS HUGEINT)) FILTER (WHERE $both) AS HUGEINT) AS sy_$k",
            s"CAST(SUM(CAST(v$i AS HUGEINT) * v$i) FILTER (WHERE $both) AS HUGEINT) AS sxx_$k",
            s"CAST(SUM(CAST(v$j AS HUGEINT) * v$j) FILTER (WHERE $both) AS HUGEINT) AS syy_$k",
            s"CAST(SUM(CAST(v$i AS HUGEINT) * v$j) FILTER (WHERE $both) AS HUGEINT) AS sxy_$k")
        }
        .mkString(",\n       ")
      val sels = pairs.zipWithIndex
        .map { case ((i, j), k) =>
          s"SELECT '${cs(i)}' AS col_a, '${cs(j)}' AS col_b, n_$k AS n,\n" +
            s"  CAST(round(CASE WHEN n_$k >= 2\n" +
            s"    AND (n_$k * sxx_$k - sx_$k * sx_$k) > 0\n" +
            s"    AND (n_$k * syy_$k - sy_$k * sy_$k) > 0\n" +
            s"  THEN CAST(n_$k * sxy_$k - sx_$k * sy_$k AS DOUBLE) /\n" +
            s"       sqrt(CAST(n_$k * sxx_$k - sx_$k * sx_$k AS DOUBLE) *\n" +
            s"            CAST(n_$k * syy_$k - sy_$k * sy_$k AS DOUBLE))\n" +
            s"  END, 6) AS DOUBLE) AS corr_r\nFROM ag"
        }
        .mkString("\nUNION ALL\n")
      s"WITH m AS (\n  SELECT $milli\n  FROM lineitem),\nag AS (\n  SELECT $aggs\n  FROM m)\n$sels"
    },
    // doubled midranks via RANK + tie COUNT windows (2R + c - 1 ==
    // 2F + c + 1), then the gen_correlation kernel over rank-millis
    "gen_spearman" -> {
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val milli = cs.zipWithIndex
        .map { case (c, i) => s"CAST(round(CAST($c AS DOUBLE) * 1000, 0) AS BIGINT) AS v$i" }
        .mkString(",\n       ")
      val notNull = cs.indices.map(i => s"v$i IS NOT NULL").mkString(" AND ")
      val ranks = cs.indices
        .map(i =>
          s"CAST((2 * RANK() OVER (ORDER BY v$i) + COUNT(*) OVER (PARTITION BY v$i) - 1) " +
            s"* 1000 AS BIGINT) AS r$i")
        .mkString(",\n       ")
      val pairs = for { i <- cs.indices; j <- (i + 1) until cs.size } yield (i, j)
      val aggs = pairs.zipWithIndex
        .flatMap { case ((i, j), k) =>
          Seq(
            s"CAST(COUNT(*) AS BIGINT) AS n_$k",
            s"CAST(SUM(CAST(r$i AS HUGEINT)) AS HUGEINT) AS sx_$k",
            s"CAST(SUM(CAST(r$j AS HUGEINT)) AS HUGEINT) AS sy_$k",
            s"CAST(SUM(CAST(r$i AS HUGEINT) * r$i) AS HUGEINT) AS sxx_$k",
            s"CAST(SUM(CAST(r$j AS HUGEINT) * r$j) AS HUGEINT) AS syy_$k",
            s"CAST(SUM(CAST(r$i AS HUGEINT) * r$j) AS HUGEINT) AS sxy_$k")
        }
        .mkString(",\n       ")
      val sels = pairs.zipWithIndex
        .map { case ((i, j), k) =>
          s"SELECT '${cs(i)}' AS col_a, '${cs(j)}' AS col_b, n_$k AS n,\n" +
            s"  CAST(round(CASE WHEN n_$k >= 2\n" +
            s"    AND (n_$k * sxx_$k - sx_$k * sx_$k) > 0\n" +
            s"    AND (n_$k * syy_$k - sy_$k * sy_$k) > 0\n" +
            s"  THEN CAST(n_$k * sxy_$k - sx_$k * sy_$k AS DOUBLE) /\n" +
            s"       sqrt(CAST(n_$k * sxx_$k - sx_$k * sx_$k AS DOUBLE) *\n" +
            s"            CAST(n_$k * syy_$k - sy_$k * sy_$k AS DOUBLE))\n" +
            s"  END, 6) AS DOUBLE) AS rho_r\nFROM ag"
        }
        .mkString("\nUNION ALL\n")
      s"WITH m0 AS (\n  SELECT $milli\n  FROM lineitem),\n" +
        s"m1 AS (SELECT * FROM m0 WHERE $notNull),\n" +
        s"r AS (\n  SELECT $ranks\n  FROM m1),\nag AS (\n  SELECT $aggs\n  FROM r)\n$sels"
    },
    // NTILE over exact cents, cumulative share via the 10-row window
    "gen_pareto" ->
      """WITH rev AS (
        |  SELECT CAST(o_custkey AS BIGINT) AS id,
        |         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |tiled AS (
        |  SELECT id, cents, NTILE(10) OVER (ORDER BY cents DESC, id) AS decile FROM rev),
        |per AS (
        |  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |         CAST(SUM(cents) AS BIGINT) AS rev_cents
        |  FROM tiled GROUP BY 1),
        |tot AS (SELECT CAST(SUM(rev_cents) AS HUGEINT) AS t FROM per),
        |c AS (
        |  SELECT decile, n_customers, rev_cents,
        |         CAST(SUM(rev_cents) OVER (ORDER BY decile) AS BIGINT) AS cum
        |  FROM per)
        |SELECT CAST(decile AS BIGINT) AS decile, n_customers, rev_cents,
        |       CAST((1000000 * CAST(cum AS HUGEINT)) // tot.t AS BIGINT) AS cum_share_ppm
        |FROM c CROSS JOIN tot""".stripMargin,
    "graph_pagerank" ->
      """WITH d AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT src, dst FROM d UNION ALL SELECT dst AS src, src AS dst FROM d),
        |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY 1),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |r0 AS (SELECT node, CAST(1000 AS BIGINT) AS r FROM nodes),
        |c1 AS (
        |  SELECT e.dst AS node, SUM(r0.r // deg.deg) AS inb
        |  FROM e JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.src GROUP BY 1),
        |r1 AS (
        |  SELECT n.node, CAST(150 + (850 * COALESCE(c1.inb, 0)) // 1000 AS BIGINT) AS r
        |  FROM nodes n LEFT JOIN c1 USING (node)),
        |c2 AS (
        |  SELECT e.dst AS node, SUM(r1.r // deg.deg) AS inb
        |  FROM e JOIN r1 ON e.src = r1.node JOIN deg ON e.src = deg.src GROUP BY 1),
        |r2 AS (
        |  SELECT n.node, CAST(150 + (850 * COALESCE(c2.inb, 0)) // 1000 AS BIGINT) AS r
        |  FROM nodes n LEFT JOIN c2 USING (node)),
        |c3 AS (
        |  SELECT e.dst AS node, SUM(r2.r // deg.deg) AS inb
        |  FROM e JOIN r2 ON e.src = r2.node JOIN deg ON e.src = deg.src GROUP BY 1),
        |r3 AS (
        |  SELECT n.node, CAST(150 + (850 * COALESCE(c3.inb, 0)) // 1000 AS BIGINT) AS r
        |  FROM nodes n LEFT JOIN c3 USING (node))
        |SELECT node, r AS rank_milli FROM r3""".stripMargin,
    // Mirrors Graph.triangleCounts: canonical undirected edges, degree
    // orientation ((d, id)-smaller endpoint first), apex wedge self-join,
    // closing-edge join, per-corner counts.
    "graph_recs" ->
      """WITH k AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS n FROM orders),
        |e0 AS (SELECT n AS src, n + 1 AS dst FROM k
        |       UNION ALL SELECT n, n + 2 FROM k),
        |und AS MATERIALIZED (
        |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |  FROM e0 WHERE src <> dst),
        |sym AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
        |mid AS (SELECT u AS m FROM sym GROUP BY u HAVING COUNT(*) <= 64),
        |sp AS (SELECT sym.u AS m, sym.v AS x FROM sym JOIN mid ON sym.u = mid.m),
        |cand AS (
        |  SELECT a.x AS a, b.x AS b, CAST(COUNT(*) AS BIGINT) AS cn
        |  FROM sp a JOIN sp b ON a.m = b.m AND a.x < b.x
        |  GROUP BY 1, 2),
        |nonadj AS (
        |  SELECT c.a, c.b, c.cn FROM cand c
        |  LEFT JOIN und e ON e.u = c.a AND e.v = c.b
        |  WHERE e.u IS NULL),
        |bo AS (SELECT a AS node, b AS rec, cn FROM nonadj
        |       UNION ALL SELECT b, a, cn FROM nonadj)
        |SELECT node, CAST(rank AS BIGINT) AS rank, rec, cn FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY node ORDER BY cn DESC, rec) AS rank
        |  FROM bo) t
        |WHERE rank <= 3""".stripMargin,
    // 2 unrolled peel rounds + a final support recount, each round the
    // graph_triangles chain with per-EDGE credit
    "graph_ktruss" -> {
      val kk = 3
      def sup(i: Int, src: String) =
        s"""dg$i AS MATERIALIZED (SELECT node, CAST(COUNT(*) AS BIGINT) AS d
           |        FROM (SELECT u AS node FROM $src UNION ALL SELECT v FROM $src)
           |        GROUP BY 1),
           |o$i AS MATERIALIZED (SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
           |                    THEN e.u ELSE e.v END AS a,
           |               CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
           |                    THEN e.v ELSE e.u END AS b
           |        FROM $src e
           |        JOIN dg$i du ON du.node = e.u
           |        JOIN dg$i dv ON dv.node = e.v),
           |t$i AS MATERIALIZED (SELECT w.a, w.w1, w.w2 FROM (
           |          SELECT e1.a, e1.b AS w1, e2.b AS w2
           |          FROM o$i e1 JOIN o$i e2 ON e1.a = e2.a AND e1.b < e2.b) w
           |        JOIN $src s ON s.u = w.w1 AND s.v = w.w2),
           |cr$i AS (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS support FROM (
           |           SELECT least(a, w1) AS u, greatest(a, w1) AS v FROM t$i
           |           UNION ALL SELECT least(a, w2), greatest(a, w2) FROM t$i
           |           UNION ALL SELECT w1, w2 FROM t$i)
           |         GROUP BY 1, 2),
           |s$i AS MATERIALIZED (SELECT e.u, e.v, CAST(COALESCE(cr$i.support, 0) AS BIGINT) AS support
           |        FROM $src e LEFT JOIN cr$i ON cr$i.u = e.u AND cr$i.v = e.v)""".stripMargin
      s"""WITH kys AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS n FROM orders),
         |e00 AS (SELECT n AS src, n + 1 AS dst FROM kys
         |        UNION ALL SELECT n, n + 2 FROM kys),
         |e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
         |       FROM e00 WHERE src <> dst),
         |${sup(1, "e0")},
         |e1 AS MATERIALIZED (SELECT u, v FROM s1 WHERE support >= ${kk - 2}),
         |${sup(2, "e1")},
         |e2 AS MATERIALIZED (SELECT u, v FROM s2 WHERE support >= ${kk - 2}),
         |${sup(3, "e2")}
         |SELECT u, v, support, CAST($kk AS BIGINT) AS k FROM s3""".stripMargin
    },
    // the FINAL live edge set derived directly (first chords minus the
    // n%7 removals, all second chords), then one graph_ktruss-style
    // support pass — the batch recompute the incremental store must equal
    "graph_support_incremental" -> edgeSupportOracle(
      """SELECT n AS src, n + 1 AS dst FROM kys WHERE n % 7 <> 0
        |        UNION ALL SELECT n, n + 2 FROM kys""".stripMargin),
    // the resize is INVISIBLE to content: same final live set, same
    // support recompute as the incremental store
    "graph_support_rebucketed" -> edgeSupportOracle(
      """SELECT n AS src, n + 1 AS dst FROM kys WHERE n % 7 <> 0
        |        UNION ALL SELECT n, n + 2 FROM kys""".stripMargin),
    // the streamed store's readback over the union of its three ingest
    // generations (duplicate resends land nothing) = the full chord graph
    "graph_support_streamed" -> edgeSupportOracle(
      """SELECT n AS src, n + 1 AS dst FROM kys
        |        UNION ALL SELECT n, n + 2 FROM kys""".stripMargin),
    // min-label transitive closure over the union of both generations —
    // components are calendar-bounded (<= ~19 nodes: decade chains plus
    // one bridge per 30), so the closure stays tiny per component
    "graph_cc_incremental" ->
      """WITH RECURSIVE kys AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS n FROM orders),
        |e00 AS (SELECT n AS src, n + 1 AS dst FROM kys WHERE n % 10 <= 7
        |        UNION ALL SELECT n, n + 2 FROM kys WHERE n % 30 = 8),
        |e0 AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |       FROM e00 WHERE src <> dst),
        |edges AS (SELECT u AS a, v AS b FROM e0 UNION SELECT v, u FROM e0),
        |nodes AS (SELECT DISTINCT a AS id FROM edges),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id)
        |SELECT id AS node, CAST(MIN(r) AS BIGINT) AS comp FROM reach GROUP BY id""".stripMargin,
    // the first two generations' union (all first chords, even second
    // chords) through the same support recompute — generation 2 must be
    // invisible to the as-of read
    "graph_support_asof" -> edgeSupportOracle(
      """SELECT n AS src, n + 1 AS dst FROM kys
        |        UNION ALL SELECT n, n + 2 FROM kys WHERE n % 2 = 0""".stripMargin),
    // capped recursive walk from the landmark set; UNION dedups exact
    // (node, src, d) triples so rows stay bounded by |V|x|srcs|x cap,
    // MIN collapses multi-path arrivals to the hop distance
    "graph_bfs_distances" -> bfsOracle(
      "SELECT node, src, CAST(MIN(d) AS BIGINT) AS dist FROM walk GROUP BY 1, 2"),
    // the per-node fold of the same walk: trunc-div ppm, null when no
    // other landmark is reachable (d_sum 0)
    "graph_closeness" -> bfsOracle(
      """SELECT node, CAST(COUNT(*) AS BIGINT) AS n_reached,
        |       CAST(SUM(md) AS BIGINT) AS d_sum,
        |       CASE WHEN SUM(md) > 0
        |            THEN CAST((1000000 * COUNT(*)) // SUM(md) AS BIGINT) END AS closeness_ppm
        |FROM (SELECT node, src, MIN(d) AS md FROM walk GROUP BY 1, 2)
        |GROUP BY 1""".stripMargin),
    // min-label closure over the union of the three ingest generations
    // (the duplicate resend lands nothing)
    "graph_cc_streamed" ->
      """WITH RECURSIVE kys AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS n FROM orders),
        |e00 AS (SELECT n AS src, n + 1 AS dst FROM kys WHERE n % 10 <= 7
        |        UNION ALL SELECT n, n + 2 FROM kys WHERE n % 30 = 8
        |        UNION ALL SELECT n, n + 2 FROM kys WHERE n % 10 <= 1),
        |e0 AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |       FROM e00 WHERE src <> dst),
        |edges AS (SELECT u AS a, v AS b FROM e0 UNION SELECT v, u FROM e0),
        |nodes AS (SELECT DISTINCT a AS id FROM edges),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id)
        |SELECT id AS node, CAST(MIN(r) AS BIGINT) AS comp FROM reach GROUP BY id""".stripMargin,
    // min-label closure over the POST-REMOVAL live set, seeded at every
    // node of the BASE set (the store never forgets a labeled node —
    // isolated survivors label themselves); the n%10==4 cuts split,
    // the n%10==0 cuts are bridged by the n%10<=1 chords
    "graph_cc_removal" ->
      """WITH RECURSIVE kys AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS n FROM orders),
        |b00 AS (SELECT n AS src, n + 1 AS dst FROM kys WHERE n % 10 <= 8
        |        UNION ALL SELECT n, n + 2 FROM kys WHERE n % 10 <= 1),
        |b0 AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |       FROM b00 WHERE src <> dst),
        |l0 AS (SELECT u, v FROM b0
        |       WHERE NOT (v = u + 1 AND (u % 10 = 4 OR u % 10 = 0))),
        |edges AS (SELECT u AS a, v AS b FROM l0 UNION SELECT v, u FROM l0),
        |nodes AS (SELECT u AS id FROM b0 UNION SELECT v FROM b0),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id)
        |SELECT id AS node, CAST(MIN(r) AS BIGINT) AS comp FROM reach GROUP BY id""".stripMargin,
    // the indexed removal's oracle is the same post-removal min-label
    // closure seeded at every base node — only the cut differs (the
    // n%1000==4 first chords), the index never changes answers
    "graph_cc_removal_indexed" ->
      """WITH RECURSIVE kys AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS n FROM orders),
        |b00 AS (SELECT n AS src, n + 1 AS dst FROM kys WHERE n % 10 <= 8
        |        UNION ALL SELECT n, n + 2 FROM kys WHERE n % 10 <= 1),
        |b0 AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |       FROM b00 WHERE src <> dst),
        |l0 AS (SELECT u, v FROM b0
        |       WHERE NOT (v = u + 1 AND u % 1000 = 4)),
        |edges AS (SELECT u AS a, v AS b FROM l0 UNION SELECT v, u FROM l0),
        |nodes AS (SELECT u AS id FROM b0 UNION SELECT v FROM b0),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id)
        |SELECT id AS node, CAST(MIN(r) AS BIGINT) AS comp FROM reach GROUP BY id""".stripMargin,
    // labels as of batch 1 = the min-label closure over the first TWO
    // generations' union — the replay must make generation 2 invisible
    "graph_cc_asof" ->
      """WITH RECURSIVE kys AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS n FROM orders),
        |e00 AS (SELECT n AS src, n + 1 AS dst FROM kys WHERE n % 10 <= 7
        |        UNION ALL SELECT n, n + 2 FROM kys WHERE n % 30 = 8),
        |e0 AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |       FROM e00 WHERE src <> dst),
        |edges AS (SELECT u AS a, v AS b FROM e0 UNION SELECT v, u FROM e0),
        |nodes AS (SELECT DISTINCT a AS id FROM edges),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id)
        |SELECT id AS node, CAST(MIN(r) AS BIGINT) AS comp FROM reach GROUP BY id""".stripMargin,
    // folding the log through generation 1 must leave as-of-2 reads
    // exact: the oracle is the closure over ALL THREE generations — what
    // the unfolded log answered
    "graph_cc_asof_compacted" ->
      """WITH RECURSIVE kys AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS n FROM orders),
        |e00 AS (SELECT n AS src, n + 1 AS dst FROM kys WHERE n % 10 <= 7
        |        UNION ALL SELECT n, n + 2 FROM kys WHERE n % 30 = 8
        |        UNION ALL SELECT n, n + 2 FROM kys WHERE n % 10 <= 1),
        |e0 AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |       FROM e00 WHERE src <> dst),
        |edges AS (SELECT u AS a, v AS b FROM e0 UNION SELECT v, u FROM e0),
        |nodes AS (SELECT DISTINCT a AS id FROM edges),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id)
        |SELECT id AS node, CAST(MIN(r) AS BIGINT) AS comp FROM reach GROUP BY id""".stripMargin,
    // per-node fold of the same support recompute: Σ incident supports
    // over both endpoints = 2·tri(v); triangle-free nodes drop, as in
    // the batch triangleCounts face
    "graph_tricount_served" ->
      s"""SELECT node, CAST(SUM(support) // 2 AS BIGINT) AS n_tri FROM (
         |  SELECT unnest([u, v]) AS node, support
         |  FROM (${edgeSupportOracle(
               """SELECT n AS src, n + 1 AS dst FROM kys WHERE n % 7 <> 0
                 |        UNION ALL SELECT n, n + 2 FROM kys""".stripMargin)}) s)
         |GROUP BY 1 HAVING SUM(support) > 0""".stripMargin,
    // graph_triangles' oracle chain + degree join + trunc-div ppm
    "graph_clustering" ->
      """WITH k AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS n FROM orders),
        |e0 AS (SELECT n AS src, n + 1 AS dst FROM k
        |       UNION ALL SELECT n, n + 2 FROM k),
        |und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |        FROM e0 WHERE src <> dst),
        |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d
        |        FROM (SELECT u AS node FROM und UNION ALL SELECT v FROM und)
        |        GROUP BY 1),
        |o AS (SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND un.u < un.v)
        |                  THEN un.u ELSE un.v END AS a,
        |             CASE WHEN du.d < dv.d OR (du.d = dv.d AND un.u < un.v)
        |                  THEN un.v ELSE un.u END AS b
        |      FROM und un
        |      JOIN deg du ON du.node = un.u
        |      JOIN deg dv ON dv.node = un.v),
        |w AS (SELECT e1.a AS a, e1.b AS w1, e2.b AS w2
        |      FROM o e1 JOIN o e2 ON e1.a = e2.a AND e1.b < e2.b),
        |t AS (SELECT w.a, w.w1, w.w2
        |      FROM w JOIN und ON und.u = w.w1 AND und.v = w.w2),
        |tri AS (
        |  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
        |  FROM (SELECT a AS node FROM t
        |        UNION ALL SELECT w1 FROM t
        |        UNION ALL SELECT w2 FROM t)
        |  GROUP BY 1)
        |SELECT deg.node, deg.d, CAST(COALESCE(tri.n_tri, 0) AS BIGINT) AS n_tri,
        |       CAST(CASE WHEN deg.d >= 2
        |            THEN (2000000 * COALESCE(tri.n_tri, 0)) // (deg.d * (deg.d - 1))
        |            END AS BIGINT) AS lcc_ppm
        |FROM deg LEFT JOIN tri ON tri.node = deg.node""".stripMargin,
    "graph_triangles" ->
      """WITH k AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS n FROM orders),
        |e0 AS (SELECT n AS src, n + 1 AS dst FROM k
        |       UNION ALL SELECT n, n + 2 FROM k),
        |und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |        FROM e0 WHERE src <> dst),
        |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d
        |        FROM (SELECT u AS node FROM und UNION ALL SELECT v FROM und)
        |        GROUP BY 1),
        |o AS (SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND un.u < un.v)
        |                  THEN un.u ELSE un.v END AS a,
        |             CASE WHEN du.d < dv.d OR (du.d = dv.d AND un.u < un.v)
        |                  THEN un.v ELSE un.u END AS b
        |      FROM und un
        |      JOIN deg du ON du.node = un.u
        |      JOIN deg dv ON dv.node = un.v),
        |w AS (SELECT e1.a AS a, e1.b AS w1, e2.b AS w2
        |      FROM o e1 JOIN o e2 ON e1.a = e2.a AND e1.b < e2.b),
        |t AS (SELECT w.a, w.w1, w.w2
        |      FROM w JOIN und ON und.u = w.w1 AND und.v = w.w2)
        |SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
        |FROM (SELECT a AS node FROM t
        |      UNION ALL SELECT w1 FROM t
        |      UNION ALL SELECT w2 FROM t)
        |GROUP BY 1""".stripMargin
  )
}
