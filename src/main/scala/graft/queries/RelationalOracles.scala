package graft.queries

/** DuckDB oracle SQL for [[RelationalQueries]] — semantically identical
  * plans with matching column names/aliases (the driver's compare hashes
  * by sorted column name).
  */
object RelationalOracles {
  val oracleSql: Map[String, String] = Map(
    "a1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS n_rows
        |FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1999-12-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "a1_watermark_per_key" ->
      """SELECT l_suppkey, max(CAST(l_shipdate AS DATE)) AS max_ship_date, count(*) AS n_rows
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,

    "a2_global_watermark" ->
      """SELECT max(CAST(o_orderdate AS DATE)) AS wm, count(*) AS n_rows FROM orders""".stripMargin,

    "a8_median_by_group" ->
      """SELECT c_nationkey, median(c_acctbal) AS median_acctbal, count(*) AS n_customers
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "a12_bucket_counts" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, max(n) AS max_daily_events, count(DISTINCT day) AS n_days
        |FROM daily GROUP BY event_type ORDER BY event_type""".stripMargin,

    "j3_fetch_ranges" ->
      """WITH wm AS (
        |  SELECT o_custkey AS c_custkey, max(CAST(o_orderdate AS DATE)) AS m
        |  FROM orders GROUP BY 1)
        |SELECT c.c_custkey,
        |  coalesce(wm.m + 1, DATE '1992-01-01') AS date_from,
        |  DATE '2002-12-31' AS date_to
        |FROM customer c LEFT JOIN wm ON c.c_custkey = wm.c_custkey
        |WHERE coalesce(wm.m + 1, DATE '1992-01-01') <= DATE '2002-12-31'
        |ORDER BY c.c_custkey""".stripMargin,

    "j4_anti_new_keys" ->
      """WITH cand AS (
        |  SELECT c_custkey, c_name FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 'new-' || c_name FROM customer
        |  WHERE c_custkey % 7 = 0)
        |SELECT c_custkey, c_name FROM cand c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "j1_vendor_merge" ->
      """WITH va AS (
        |  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS ship_date,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS px,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |  FROM lineitem WHERE l_linenumber <= 3 AND l_linenumber >= 1 GROUP BY 1, 2),
        |vb AS (
        |  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS ship_date,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS px,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |  FROM lineitem WHERE l_linenumber <= 7 AND l_linenumber >= 2 GROUP BY 1, 2)
        |SELECT coalesce(va.l_suppkey, vb.l_suppkey) AS l_suppkey,
        |  coalesce(va.ship_date, vb.ship_date) AS ship_date,
        |  coalesce(va.px, vb.px) AS px,
        |  round(CASE WHEN va.qty IS NULL AND vb.qty IS NULL THEN NULL
        |    ELSE (coalesce(va.qty, 0) + coalesce(vb.qty, 0)) /
        |         (CAST(va.qty IS NOT NULL AS INT) + CAST(vb.qty IS NOT NULL AS INT)) END, 6) AS qty,
        |  CASE WHEN va.px IS NOT NULL AND vb.px IS NOT NULL THEN 'both'
        |       WHEN va.px IS NOT NULL THEN 'left_only' ELSE 'right_only' END AS provenance
        |FROM va FULL OUTER JOIN vb
        |  ON va.l_suppkey = vb.l_suppkey AND va.ship_date = vb.ship_date
        |ORDER BY 1, 2""".stripMargin,

    "j8_asof_join" ->
      """SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts, e.event_type,
        |  p.value AS last_purchase_value
        |FROM events e LEFT JOIN
        |  (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND p.ts <= e.ts
        |QUALIFY row_number() OVER (PARTITION BY e.event_id ORDER BY p.ts DESC, p.value DESC) = 1
        |ORDER BY e.event_id""".stripMargin,

    // Identical semantics to j8_asof_join — the query differs only in
    // the engine-side operator (native plan node vs union-and-carry), so
    // the oracle is the same as-of SQL.
    "j8_asof_native" ->
      """SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts, e.event_type,
        |  p.value AS last_purchase_value
        |FROM events e LEFT JOIN
        |  (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND p.ts <= e.ts
        |QUALIFY row_number() OVER (PARTITION BY e.event_id ORDER BY p.ts DESC, p.value DESC) = 1
        |ORDER BY e.event_id""".stripMargin,

    "j10_interval_flag" ->
      """SELECT o.o_orderkey, o.o_custkey, CAST(o.o_orderdate AS DATE) AS od,
        |  CASE WHEN EXISTS (
        |    SELECT 1 FROM orders f
        |    WHERE f.o_orderstatus = 'F' AND f.o_custkey = o.o_custkey
        |      AND CAST(o.o_orderdate AS DATE)
        |          BETWEEN CAST(f.o_orderdate AS DATE) AND CAST(f.o_orderdate AS DATE) + 30)
        |  THEN 1 ELSE 0 END AS suspended
        |FROM orders o ORDER BY o.o_orderkey""".stripMargin,

    "a3_tick_bars" ->
      """SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar_start,
        |  arg_min(value, event_id) AS open, max(value) AS high, min(value) AS low,
        |  arg_max(value, event_id) AS close, sum(CAST(1.0 AS DOUBLE)) AS volume,
        |  round(sum(value * 1.0), 4) AS amount, count(*) AS n_ticks
        |FROM events GROUP BY 1, 2 ORDER BY user_id, bar_start""".stripMargin,

    "a4_bar_rollup" ->
      """WITH bars AS (
        |  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bar_start,
        |    arg_min(value, event_id) AS open, max(value) AS high, min(value) AS low,
        |    arg_max(value, event_id) AS close, sum(CAST(1.0 AS DOUBLE)) AS volume
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, b4 AS bar_start, open, high, low, close, volume FROM (
        |  SELECT user_id, time_bucket(INTERVAL '240 minutes', bar_start) AS b4,
        |    arg_min(open, bar_start) AS open, max(high) AS high, min(low) AS low,
        |    arg_max(close, bar_start) AS close, sum(volume) AS volume
        |  FROM bars GROUP BY 1, 2) t
        |ORDER BY user_id, bar_start""".stripMargin,

    "d8_big_order_flow" ->
      """WITH t AS (
        |  SELECT user_id, value * 1.0 AS notional, CAST(1.0 AS DOUBLE) AS one,
        |    event_type IN ('purchase', 'signup') AS buy,
        |    value * 1.0 >= 100.0 AS big
        |  FROM events)
        |SELECT user_id,
        |  round(sum(CASE WHEN buy AND big THEN notional ELSE 0.0 END), 4) AS big_buy_amount,
        |  round(sum(CASE WHEN (NOT buy) AND big THEN notional ELSE 0.0 END), 4) AS big_sell_amount,
        |  round(sum(CASE WHEN buy AND big THEN one ELSE 0.0 END), 4) AS big_buy_vol,
        |  round(sum(CASE WHEN (NOT buy) AND big THEN one ELSE 0.0 END), 4) AS big_sell_vol,
        |  round(sum(CASE WHEN buy AND big THEN notional ELSE 0.0 END)
        |      - sum(CASE WHEN (NOT buy) AND big THEN notional ELSE 0.0 END), 4) AS net_big_buy_amount,
        |  round(CASE WHEN sum(notional) <> 0 THEN
        |    (sum(CASE WHEN buy AND big THEN notional ELSE 0.0 END)
        |     + sum(CASE WHEN (NOT buy) AND big THEN notional ELSE 0.0 END)) / sum(notional) END, 6) AS big_ratio
        |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin,

    "w1_lead_lag" ->
      """SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS od, o_totalprice,
        |  lag(CAST(o_orderdate AS DATE)) OVER w AS prev_od,
        |  lead(CAST(o_orderdate AS DATE)) OVER w AS next_od,
        |  lag(o_totalprice) OVER w AS prev_price,
        |  CASE WHEN lag(o_totalprice) OVER w <> 0 THEN
        |    round((o_totalprice - lag(o_totalprice) OVER w) / lag(o_totalprice) OVER w, 6) END AS pct_chg
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    // Replays the blocked fuzzy pipeline: same perturbation, same
    // (first-char, length-band ±1) blocking, same distance cutoff.
    "j5b_fuzzy_name_match" ->
      """WITH names AS (SELECT DISTINCT p_name FROM part),
        |alt AS (SELECT DISTINCT
        |    substr(p_name, 1, pos - 1) || substr(p_name, pos + 1) AS alt_name
        |  FROM (SELECT p_name,
        |      CAST(2 + ('0x' || substr(md5(p_name), 1, 15))::BIGINT % (len(p_name) - 1) AS INT) AS pos
        |    FROM names) t),
        |l AS (SELECT p_name AS name_l, substr(p_name, 1, 1) AS c,
        |    CAST(floor(len(p_name) / 4.0) AS INT) AS band FROM names),
        |r AS (SELECT name_r, c, unnest([b0 - 1, b0, b0 + 1]) AS band
        |  FROM (SELECT alt_name AS name_r, substr(alt_name, 1, 1) AS c,
        |      CAST(floor(len(alt_name) / 4.0) AS INT) AS b0 FROM alt) x)
        |SELECT DISTINCT name_l, name_r,
        |  CAST(levenshtein(name_l, name_r) AS BIGINT) AS dist
        |FROM l JOIN r USING (c, band)
        |WHERE levenshtein(name_l, name_r) <= 2
        |ORDER BY name_l, name_r""".stripMargin,

    // Bloom pruning is invisible to the result (no false negatives;
    // the exact join removes false positives) — the oracle is the
    // plain join.
    "p11_bloom_join_prune" ->
      """SELECT s_suppkey, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_suppkey % 3 = 0
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin,

    "p10_zorder_layout" ->
      """WITH z AS (SELECT l_orderkey, l_linenumber, l_suppkey, l_partkey,
        |    list_sum(list_transform(range(0, 16), i ->
        |      ((l_suppkey >> i) & 1) * (1::BIGINT << (2 * i + 1))
        |      + ((l_partkey >> i) & 1) * (1::BIGINT << (2 * i)))) AS z
        |  FROM lineitem),
        |b AS (SELECT l_suppkey, l_partkey,
        |    CAST(ntile(32) OVER (ORDER BY z, l_orderkey, l_linenumber) AS BIGINT) AS bucket
        |  FROM z)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
        |  min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp,
        |  min(l_partkey) AS min_part, max(l_partkey) AS max_part
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    "w10_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, ts, value, epoch_us(ts) AS us FROM events),
        |m AS (SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 86400000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts, value,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |  FROM m)
        |SELECT user_id, session_idx, min(ts) AS session_start, max(ts) AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    // session_window semantics: new session at gap >= 24 h (half-open
    // windows), end = last ts + gap.
    "w11_session_window" ->
      """WITH e AS (SELECT user_id, event_id, ts, value, epoch_us(ts) AS us FROM events),
        |m AS (SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w >= 86400000000 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts, value,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |  FROM m)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 24 HOURS AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id, session_start""".stripMargin,

    // Window order tie-breaks by every consumed measure (see the Spark
    // side): sf0.1 has duplicate (ship_date, orderkey, linenumber) keys,
    // and without the tie-break the running values after a tie depend on
    // engine-internal arrival order — the round-10 sf0.1 sweep caught
    // both engines flapping on one such pair.
    "w3_running_windows" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, ship_date,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE) AS run_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS run_price,
        |  round(list_product(list(1.0 + l_discount / 100.0) OVER w), 8) AS cum_ratio,
        |  last_value(CASE WHEN l_returnflag = 'R' THEN l_extendedprice END IGNORE NULLS) OVER w AS last_r_price
        |FROM (SELECT *, CAST(l_shipdate AS DATE) AS ship_date FROM lineitem) t
        |WINDOW w AS (PARTITION BY l_suppkey, year(ship_date)
        |  ORDER BY ship_date, l_orderkey, l_linenumber,
        |    l_quantity, l_extendedprice, l_discount, l_returnflag
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey, ship_date, l_orderkey, l_linenumber,
        |  run_qty, run_price, cum_ratio""".stripMargin,

    "w6_rank_topk" ->
      """SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,

    "w7_argmax_per_group" ->
      """SELECT month, o_orderpriority AS top_priority, n FROM (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    o_orderpriority, count(*) AS n,
        |    row_number() OVER (PARTITION BY CAST(date_trunc('month', o_orderdate) AS DATE)
        |      ORDER BY count(*) DESC, o_orderpriority ASC) AS rn
        |  FROM orders GROUP BY 1, 2) t
        |WHERE rn = 1 ORDER BY month""".stripMargin,

    "o4_set_algebra" ->
      """WITH co AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
        |cf AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |SELECT 'o_and_f' AS tag, o_custkey FROM (SELECT o_custkey FROM co INTERSECT SELECT o_custkey FROM cf) a
        |UNION ALL
        |SELECT 'o_not_f' AS tag, o_custkey FROM (SELECT o_custkey FROM co EXCEPT SELECT o_custkey FROM cf) b
        |UNION ALL
        |SELECT 'o_or_f' AS tag, o_custkey FROM (SELECT o_custkey FROM co UNION SELECT o_custkey FROM cf) c
        |ORDER BY tag, o_custkey""".stripMargin,

    "o5_distinct_pairs" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,

    "f7_string_funcs" ->
      """SELECT p_partkey,
        |  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
        |  split_part(p_type, ' ', 1) AS type_head,
        |  upper(p_name) AS name_upper,
        |  p_brand || '#' || CAST(p_size AS VARCHAR) AS brand_size,
        |  regexp_extract(p_name, '^([a-z]+)', 1) AS name_first_word,
        |  substring(p_type, 1, 5) AS type_prefix
        |FROM part ORDER BY p_partkey""".stripMargin,

    "f10_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS od,
        |  CAST(o_orderdate AS DATE) + 7 AS od_plus7,
        |  last_day(CAST(o_orderdate AS DATE)) AS od_eom,
        |  year(o_orderdate) AS od_year,
        |  quarter(o_orderdate) AS od_quarter,
        |  least(CAST(o_orderdate AS DATE), DATE '1998-01-01') AS od_clamped,
        |  date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "f12_code_norm" ->
      """SELECT c_custkey,
        |  c_mktsegment || '.' ||
        |    (CASE (c_nationkey % 3) WHEN 0 THEN 'SH' WHEN 1 THEN 'SZ' WHEN 2 THEN 'HK' END) AS norm_code,
        |  CASE WHEN c_mktsegment = 'BUILDING' THEN 'BLD'
        |       WHEN c_mktsegment = 'AUTOMOBILE' THEN 'AUT'
        |       ELSE substring(c_mktsegment, 1, 3) END AS seg_code
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "r1_pivot_monthly" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p_urgent,
        |  CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p_high,
        |  CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p_medium,
        |  CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p_notspec,
        |  CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p_low
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,

    "p3_pushdown_join" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)
}
