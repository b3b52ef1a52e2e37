package graft.queries

import graft.core.{IncrementalPlanner, Tables}
import graft.operators.{AsOfJoin, MergeOps, Resample}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2 relational operator inventory exercised on the driver
  * testdata, each with a DuckDB oracle (SparkEntry.oracleSql).
  *
  * Numeric policy for oracle hash-matching: money sums run on
  * `decimal(18,2)` (exact in both engines) and are cast back to double
  * for a stable output schema; pure divisions of deterministic doubles
  * are IEEE-identical and shipped unrounded; anything else is rounded.
  */
object RelationalQueries {
  private type Q = (SparkSession, String) => DataFrame
  private val dec = "decimal(18,2)"

  val queries: Map[String, Q] = Map(
    // ── A-family: aggregations ────────────────────────────────────────
    "a1_pricing_summary" -> ((s, d) => {
      // TPC-H Q1 shape: the reference's daily-aggregate workhorse.
      val li = Tables.lineitem(s, d)
        .filter(to_date(col("l_shipdate")) <= lit("1999-12-01"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice").cast(dec) * (lit(1).cast(dec) - col("l_discount").cast(dec))).cast("decimal(28,6)"))
            .cast("double").as("sum_disc_price"),
          (sum(col("l_quantity").cast(dec)).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "a1_watermark_per_key" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .agg(max(to_date(col("l_shipdate"))).as("max_ship_date"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_suppkey"))
    }),

    "a2_global_watermark" -> ((s, d) => {
      Tables.orders(s, d)
        .agg(max(to_date(col("o_orderdate"))).as("wm"), count(lit(1)).as("n_rows"))
    }),

    "a8_median_by_group" -> ((s, d) => {
      Tables.customer(s, d)
        .groupBy(col("c_nationkey"))
        .agg(median(col("c_acctbal")).as("median_acctbal"),
          count(lit(1)).as("n_customers"))
        .orderBy(col("c_nationkey"))
    }),

    "a12_bucket_counts" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      daily.groupBy(col("event_type"))
        .agg(max(col("n")).as("max_daily_events"),
          countDistinct(col("day")).as("n_days"))
        .orderBy(col("event_type"))
    }),

    // ── J-family: joins ───────────────────────────────────────────────
    "j3_fetch_ranges" -> ((s, d) => {
      // The signature incremental-watermark plan (SURVEY J3) via
      // IncrementalPlanner: per-customer next order-date fetch window.
      val keys = Tables.customer(s, d).select(col("c_custkey"))
      val existing = Tables.orders(s, d)
        .select(col("o_custkey").as("c_custkey"), to_date(col("o_orderdate")).as("od"))
      IncrementalPlanner.fetchRanges(keys, existing, Seq("c_custkey"), "od",
        defaultStart = lit("1992-01-01").cast("date"),
        dateTo = lit("2002-12-31").cast("date"))
        .orderBy(col("c_custkey"))
    }),

    "j4_anti_new_keys" -> ((s, d) => {
      // Every fixture customer has orders at every SF, so the plain
      // customer-vs-orders anti join was vacuously empty. Extend the
      // candidate set with a deterministic slice of synthetic keys
      // guaranteed absent from orders (re-keyed past the custkey range)
      // so the anti-join semantics are actually exercised; the oracle
      // derives the identical candidate set.
      val known = Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
      val synth = Tables.customer(s, d).filter(col("c_custkey") % 7 === 0)
        .select((col("c_custkey") + 1000000L).as("c_custkey"),
          concat(lit("new-"), col("c_name")).as("c_name"))
      IncrementalPlanner.newKeys(
        known.unionAll(synth),
        Tables.orders(s, d).select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"))
        .orderBy(col("c_custkey"))
    }),

    "j1_vendor_merge" -> ((s, d) => {
      // D9 cross-vendor reconciliation shape: two overlapping "vendor"
      // views of the same series, full-outer merged with F1/F2 rules
      // and a provenance marker.
      def vendor(maxLine: Int, minLine: Int) = Tables.lineitem(s, d)
        .filter(col("l_linenumber") <= maxLine && col("l_linenumber") >= minLine)
        .groupBy(col("l_suppkey"), to_date(col("l_shipdate")).as("ship_date"))
        .agg(sum(col("l_extendedprice").cast(dec)).cast("double").as("px"),
          sum(col("l_quantity").cast(dec)).cast("double").as("qty"))
      val va = vendor(3, 1)
      val vb = vendor(7, 2)
      val srcCol = (n: String) => if (n == "provenance") "px" else n
      MergeOps.reconcile(
        va, vb,
        leftKeys = Seq("l_suppkey", "ship_date"), rightKeys = Seq("l_suppkey", "ship_date"),
        outKeys = Seq("l_suppkey", "ship_date"),
        rules = Seq(
          "px" -> ((l, r) => MergeOps.preferLeft(l, r)),
          "qty" -> ((l, r) => round(MergeOps.meanValue(l, r), 6)),
          "provenance" -> ((l, r) => MergeOps.provenance(l, r))),
        leftCols = n => va(srcCol(n)), rightCols = n => vb(srcCol(n)))
        .orderBy(col("l_suppkey"), col("ship_date"))
    }),

    "j8_asof_join" -> ((s, d) => {
      // Report→daily as-of shape on events: every event sees the value
      // of the user's latest purchase at-or-before its timestamp.
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      val purchases = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("value").as("last_purchase_value"))
      AsOfJoin.asofBackward(ev, purchases, Seq("user_id"),
        leftTime = "ts", rightTime = "p_ts", valueCols = Seq("last_purchase_value"))
        .select("event_id", "user_id", "ts", "event_type", "last_purchase_value")
        .orderBy(col("event_id"))
    }),

    "j8_asof_native" -> ((s, d) => {
      // Same as-of shape on the NATIVE operator (custom LogicalPlan +
      // SparkStrategy + sort-merge SparkPlan, graft.plans.AsOfJoinPlan):
      // one streamed merge per co-partition instead of union+window.
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      val purchases = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("value").as("last_purchase_value"))
      graft.plans.AsOfJoinPlan.asofBackwardNative(ev, purchases, Seq("user_id"),
        leftTime = "ts", rightTime = "p_ts", valueCols = Seq("last_purchase_value"))
        .select("event_id", "user_id", "ts", "event_type", "last_purchase_value")
        .orderBy(col("event_id"))
    }),

    "j10_interval_flag" -> ((s, d) => {
      // Suspension-interval membership: an order is "suspended" if its
      // date falls within 30 days after any F-status order of the same
      // customer.
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), to_date(col("o_orderdate")).as("od"))
      val intervals = Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_custkey"), to_date(col("o_orderdate")).as("s_start"),
          date_add(to_date(col("o_orderdate")), 30).as("s_end"))
      AsOfJoin.flagInIntervals(o, intervals, Seq("o_custkey"), "od", "s_start", "s_end", "suspended")
        .select("o_orderkey", "o_custkey", "od", "suspended")
        .orderBy(col("o_orderkey"))
    }),

    // ── A3/A4: tick→bar and roll-up ──────────────────────────────────
    "a3_tick_bars" -> ((s, d) => {
      val ticks = Tables.events(s, d).withColumn("one", lit(1.0))
      Resample.ticksToBars(ticks, Seq("user_id"), "ts", "event_id", "value", "one", "1 hour")
        .withColumn("amount", round(col("amount"), 4))
        .orderBy(col("user_id"), col("bar_start"))
    }),

    "a4_bar_rollup" -> ((s, d) => {
      val ticks = Tables.events(s, d).withColumn("one", lit(1.0))
      val bars1h = Resample.ticksToBars(ticks, Seq("user_id"), "ts", "event_id", "value", "one", "1 hour")
        .select(col("user_id"), col("bar_start"), col("open"), col("high"),
          col("low"), col("close"), col("volume"))
      Resample.rollUpBars(bars1h, Seq("user_id"), "bar_start", 240)
        .orderBy(col("user_id"), col("bar_start"))
    }),

    "d8_big_order_flow" -> ((s, d) => {
      val ticks = Tables.events(s, d).withColumn("one", lit(1.0))
      Resample.bigOrderFlow(ticks, Seq("user_id"), "value", "one",
        buyFlag = col("event_type").isin("purchase", "signup"), threshold = 100.0)
        .select(col("user_id"),
          round(col("big_buy_amount"), 4).as("big_buy_amount"),
          round(col("big_sell_amount"), 4).as("big_sell_amount"),
          round(col("big_buy_vol"), 4).as("big_buy_vol"),
          round(col("big_sell_vol"), 4).as("big_sell_vol"),
          round(col("net_big_buy_amount"), 4).as("net_big_buy_amount"),
          round(col("big_ratio"), 6).as("big_ratio"))
        .orderBy(col("user_id"))
    }),

    // J5b: fuzzy name matching — the last-resort mapping step when
    // exact normalized-name equality (j5_code_mapping) misses: a second
    // vendor's names carry one deterministic char deletion, and the
    // blocked edit-distance join recovers them without the O(n²) name
    // cross product.
    "j5b_fuzzy_name_match" -> ((s, d) => {
      val names = Tables.part(s, d).select(col("p_name")).distinct()
      val h = expr("CAST(conv(substring(md5(p_name), 1, 15), 16, 10) AS BIGINT)")
      val perturbed = Tables.part(s, d).select(col("p_name")).distinct()
        .withColumn("__pos",
          (lit(2) + pmod(h, length(col("p_name")) - 1)).cast("int"))
        .select(concat(expr("substring(p_name, 1, __pos - 1)"),
          expr("substring(p_name, __pos + 1, 1000)")).as("alt_name"))
        .distinct()
      graft.operators.CodeMapping.fuzzyNameMatch(
          names, perturbed, "p_name", "alt_name", maxDistance = 2)
        .orderBy(col("name_l"), col("name_r"))
    }),

    // P10: z-order layout audit — cluster lineitem by the Morton code
    // of (l_suppkey, l_partkey) into 32 equal buckets (one per would-be
    // file) and report each bucket's min/max span on BOTH dimensions.
    // Z-ordered buckets cover small rectangles (~√32 of each axis), so
    // parquet min/max stats would prune point scans on either column;
    // a plain sort clusters only its leading column. Exact ntile over
    // the unique (z, orderkey, linenumber) order stands in
    // deterministically for the production mechanism — computed by the
    // distributed two-pass rank (GlobalRank.withNtile), NOT a global
    // window: Window.orderBy with no partition key executes in ONE task,
    // which at 100 TB is the layout job's own anti-pattern.
    "p10_zorder_layout" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_suppkey"), col("l_partkey"))
        .withColumn("z", graft.functions.ZOrder.zValue(col("l_suppkey"), col("l_partkey")))
      graft.operators.GlobalRank.withNtile(li,
          Seq(col("z"), col("l_orderkey"), col("l_linenumber")), 32, "bucket")
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"),
          min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"))
        .orderBy(col("bucket"))
    }),

    // P11: Bloom-pruned shuffle join — runtime-filter pushdown as an
    // explicit operator (what Spark's Bloom join hint / runtime
    // row-group filtering do internally): build a Bloom filter over the
    // small side's keys, probe the fact scan with the codegen'd
    // BloomProbeExpr BEFORE the shuffle, and let the exact equi-join
    // delete the false positives — so the result provably equals the
    // plain join while only ~|small side| of the fact rows reach the
    // exchange. At 100 TB this is the difference between shuffling the
    // whole fact table and shuffling the matching third.
    "p11_bloom_join_prune" -> ((s, d) => {
      import graft.operators.Sketches
      val keep = col("s_suppkey") % 3 === 0
      val supp = Tables.supplier(s, d).filter(keep)
        .select(col("s_suppkey"), col("s_name"))
      val sketch = Sketches.bloomBuild(
        Tables.supplier(s, d).filter(keep),
        col("s_suppkey").cast("string"), mBits = 1L << 16, k = 5)
      val li = Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_extendedprice"))
      val pruned = Sketches.bloomMightContain(sketch, li,
        col("l_suppkey").cast("string"), mBits = 1L << 16, k = 5)
        .filter(col("might_contain"))
      pruned.join(supp, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_suppkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast(dec)).cast("double").as("revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // ── W-family: windows ─────────────────────────────────────────────
    "w1_lead_lag" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          to_date(col("o_orderdate")).as("od"), col("o_totalprice"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("od"), col("o_orderkey"))
      o.withColumn("prev_od", lag(col("od"), 1).over(w))
        .withColumn("next_od", lead(col("od"), 1).over(w))
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("pct_chg",
          when(lag(col("o_totalprice"), 1).over(w) =!= 0,
            round((col("o_totalprice") - lag(col("o_totalprice"), 1).over(w)) /
              lag(col("o_totalprice"), 1).over(w), 6)))
        .orderBy(col("o_orderkey"))
    }),

    // W10: gap-based sessionization — the classic event-log operator a
    // 100 TB pipeline runs daily: split each user's event stream at
    // inactivity gaps, then aggregate per session. One shuffle on
    // user_id (lag, running sum, and the final groupBy all share that
    // partitioning); the 24 h gap matches this fixture's event density
    // (~67 events/user/month). Gap math in integer microseconds so both
    // engines compare exactly.
    "w10_sessionize" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("__us", unix_micros(col("ts")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gapUs = 24L * 3600L * 1000000L
      val sess = ev
        .withColumn("new_s",
          when(lag(col("__us"), 1).over(w).isNull ||
            col("__us") - lag(col("__us"), 1).over(w) > gapUs, 1L).otherwise(0L))
        .withColumn("session_idx",
          sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      sess.groupBy(col("user_id"), col("session_idx"))
        .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          sum(col("value").cast(dec)).cast("double").as("sum_value"))
        .orderBy(col("user_id"), col("session_idx"))
    }),

    // W11: the same sessionization through Spark's NATIVE session_window
    // operator (one merging-window aggregation instead of two windows +
    // a groupBy — the form whose state model also runs under Structured
    // Streaming, see stream_sessionize). Window semantics: a new session
    // starts when the gap is ≥ 24 h (half-open [ts, ts+gap) windows);
    // session_end = last ts + gap by definition.
    "w11_session_window" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"), col("value"))
      ev.groupBy(col("user_id"), session_window(col("ts"), "24 hours").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(dec)).cast("double").as("sum_value"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("sw.end").as("session_end"), col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    "w3_running_windows" -> ((s, d) => {
      // W3 cumprod (back-adjust factor chains) + W4 cumsum + W5 ffill.
      val li = Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          to_date(col("l_shipdate")).as("ship_date"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_returnflag"))
      // Partition by (supplier, year) so the factor chain stays short and
      // the ratio near 1 — the shape of real back-adjust chains.
      // All four columns in ONE select over the same window spec: chained
      // withColumn puts a Project between consecutive Window nodes, which
      // blocks CollapseWindow and plans four shuffles instead of one
      // (caught by PlanAuditSpec).
      // (ship_date, orderkey, linenumber) is NOT a total order: sf0.1
      // has duplicate keys with different measures, and a tied window
      // order makes every running value after the tie depend on
      // partition-internal arrival order (caught by the round-10 sf0.1
      // sweep — both engines flapped). Tie-break by every column the
      // running frames consume; rows still tied are then value-identical
      // and order-irrelevant by construction.
      val w = Window.partitionBy(col("l_suppkey"), year(col("ship_date")))
        .orderBy(col("ship_date"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_returnflag"))
        .rowsBetween(Window.unboundedPreceding, 0)
      li.select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("ship_date"),
        sum(col("l_quantity").cast(dec)).over(w).cast("double").as("run_qty"),
        sum(col("l_extendedprice").cast(dec)).over(w).cast("double").as("run_price"),
        round(graft.functions.ProductAgg.productOf(lit(1.0) + col("l_discount") / 100.0).over(w), 8)
          .as("cum_ratio"),
        last(when(col("l_returnflag") === "R", col("l_extendedprice")), ignoreNulls = true).over(w)
          .as("last_r_price"))
        .orderBy(col("l_suppkey"), col("ship_date"), col("l_orderkey"), col("l_linenumber"),
          col("run_qty"), col("run_price"), col("cum_ratio"))
    }),

    "w6_rank_topk" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rnk", row_number().over(w).cast("long")) // DuckDB row_number is BIGINT
        .filter(col("rnk") <= 3)
        .select(col("o_custkey"), col("rnk"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rnk"))
    }),

    "w7_argmax_per_group" -> ((s, d) => {
      // idxmax on the long format (SURVEY W7): top order-priority per
      // month by order count, ties broken by priority name.
      val m = Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"),
          col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("month"))
        .orderBy(col("n").desc, col("o_orderpriority").asc)
      m.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("month"), col("o_orderpriority").as("top_priority"), col("n"))
        .orderBy(col("month"))
    }),

    // ── O-family: set ops / dedup / distinct ─────────────────────────
    "o4_set_algebra" -> ((s, d) => {
      val o = Tables.orders(s, d)
      def custs(st: String) = o.filter(col("o_orderstatus") === st)
        .select(col("o_custkey")).distinct()
      val both = custs("O").intersect(custs("F")).withColumn("tag", lit("o_and_f"))
      val onlyO = custs("O").except(custs("F")).withColumn("tag", lit("o_not_f"))
      val either = custs("O").union(custs("F")).distinct().withColumn("tag", lit("o_or_f"))
      both.unionByName(onlyO).unionByName(either)
        .select(col("tag"), col("o_custkey"))
        .orderBy(col("tag"), col("o_custkey"))
    }),

    "o5_distinct_pairs" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_orderpriority"))
        .dropDuplicates("o_orderstatus", "o_orderpriority")
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    }),

    // ── F-family: scalar functions ───────────────────────────────────
    "f7_string_funcs" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
        split_part(col("p_type"), lit(" "), lit(1)).as("type_head"),
        upper(col("p_name")).as("name_upper"),
        concat(col("p_brand"), lit("#"), col("p_size").cast("string")).as("brand_size"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("name_first_word"),
        substring(col("p_type"), 1, 5).as("type_prefix"))
        .orderBy(col("p_partkey"))
    }),

    "f10_date_funcs" -> ((s, d) => {
      Tables.orders(s, d).select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("od"),
        date_add(to_date(col("o_orderdate")), 7).as("od_plus7"),
        last_day(to_date(col("o_orderdate"))).as("od_eom"),
        year(col("o_orderdate")).cast("long").as("od_year"), // DuckDB year() is BIGINT
        quarter(col("o_orderdate")).cast("long").as("od_quarter"),
        least(to_date(col("o_orderdate")), lit("1998-01-01").cast("date")).as("od_clamped"),
        datediff(lit("2002-01-01").cast("date"), to_date(col("o_orderdate"))).cast("long").as("days_to_2002"))
        .orderBy(col("o_orderkey"))
    }),

    "f12_code_norm" -> ((s, d) => {
      // Vendor code normalization (XSHG→.SH family) as when-chains +
      // a literal map lookup (F14).
      val exch = typedlit(Map(0 -> "SH", 1 -> "SZ", 2 -> "HK"))
      Tables.customer(s, d).select(
        col("c_custkey"),
        concat(col("c_mktsegment"), lit("."),
          element_at(exch, pmod(col("c_nationkey"), lit(3)).cast("int"))).as("norm_code"),
        when(col("c_mktsegment") === "BUILDING", "BLD")
          .when(col("c_mktsegment") === "AUTOMOBILE", "AUT")
          .otherwise(substring(col("c_mktsegment"), 1, 3)).as("seg_code"))
        .orderBy(col("c_custkey"))
    }),

    // ── R1: pivot ────────────────────────────────────────────────────
    "r1_pivot_monthly" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(sum(col("o_totalprice").cast(dec)).cast("double"))
        .withColumnRenamed("1-URGENT", "p_urgent")
        .withColumnRenamed("2-HIGH", "p_high")
        .withColumnRenamed("3-MEDIUM", "p_medium")
        .withColumnRenamed("4-NOT SPECIFIED", "p_notspec")
        .withColumnRenamed("5-LOW", "p_low")
        .orderBy(col("month"))
    }),

    // ── TPC-H-style multi-join (P-family pushdown showcase) ──────────
    "p3_pushdown_join" -> ((s, d) => {
      // Filter + projection pushdown through a 4-table join; broadcast
      // dims (nation/region), shuffle join facts.
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(to_date(col("o_orderdate")) >= lit("1997-01-01"))
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(col("o_totalprice").cast(dec)).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("r_name"), col("n_name"))
    }))
}
