package graft.queries

/** DuckDB oracle SQL for [[RefQueries]] — ANSI-ish SQL the driver runs on the
  * same parquet tables. Column aliases match the Spark side exactly (the
  * driver sorts columns by name before hashing). Every double is produced by
  * the same exact-DECIMAL-sum → double → IEEE-op sequence as the Spark code,
  * so values are bit-identical.
  */
object RefOracles {
  /** Exact ⌈q·n⌉ rank-selection percentiles. Shared by `q_order_stats` and
    * `q_order_stats_approx`: GK `percentile_approx` with accuracy ≥ n
    * degenerates to the same rank selection (see
    * [[RefQueries.orderStatsApprox]] for the scale caveat). */
  private val orderStatsSql: String =
    """WITH r AS (
      |  SELECT event_type, event_id, value,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events)
      |SELECT event_type, max(n) AS n,
      |  max(CASE WHEN rn = ceil(n * 0.5) THEN value END) AS p50,
      |  max(CASE WHEN rn = ceil(n * 0.9) THEN value END) AS p90,
      |  max(CASE WHEN rn = ceil(n * 0.99) THEN value END) AS p99
      |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin

  val sql: Map[String, String] = Map(
    "q_order_stats" -> orderStatsSql,
    "q_order_stats_approx" -> orderStatsSql,
    "q_json_flatten" ->
      """SELECT event_id, event_type, TRY_CAST(props->>'k' AS BIGINT) AS k,
        |CAST(ts AS DATE) AS date FROM events ORDER BY event_id""".stripMargin,

    "q_coalesce_defaults" ->
      """SELECT o_orderkey,
        |  coalesce(c_mktsegment, 'Unkown') AS segment,
        |  coalesce(c_acctbal, 0.0) AS acctbal
        |FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING') c
        |  ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_filter_eq_date" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) = DATE '1996-03-15'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_filter_between" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
        |ORDER BY event_id""".stripMargin,

    "q_count_guard" ->
      """SELECT count(*) AS cnt FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) = DATE '1996-03-15'""".stripMargin,

    "q_anti_join" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM customer
        |  WHERE c_acctbal > 5000 AND c_custkey = o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_broadcast_join" ->
      """SELECT r_name, n_name, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q_daily_agg" ->
      """SELECT l_returnflag AS flag, CAST(l_shipdate AS DATE) AS date,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_qty,
        |  max(l_quantity) AS max_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_price,
        |  max(l_extendedprice) AS max_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) AS total_disc,
        |  CAST(sum(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS avg_disc,
        |  max(l_discount) AS max_disc
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_daily_agg_rounded" ->
      """WITH g AS (
        |  SELECT l_returnflag AS flag, CAST(l_shipdate AS DATE) AS date,
        |    CAST(count(*) AS HUGEINT) * 1000000 AS q,
        |    CAST(CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DECIMAL(38,6)) * 1000000 AS HUGEINT) * 100 AS p_qty,
        |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DECIMAL(38,6)) * 1000000 AS HUGEINT) * 100 AS p_price,
        |    CAST(CAST(sum(CAST(l_discount AS DECIMAL(28,6))) AS DECIMAL(38,6)) * 1000000 AS HUGEINT) * 100 AS p_disc
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT flag, date,
        |  CAST(p_qty//q   + CASE WHEN 2*(p_qty%q)   > q THEN 1 WHEN 2*(p_qty%q)   = q THEN (p_qty//q)%2   ELSE 0 END AS DOUBLE)/100.0 AS avg_qty,
        |  CAST(p_price//q + CASE WHEN 2*(p_price%q) > q THEN 1 WHEN 2*(p_price%q) = q THEN (p_price//q)%2 ELSE 0 END AS DOUBLE)/100.0 AS avg_price,
        |  CAST(p_disc//q  + CASE WHEN 2*(p_disc%q)  > q THEN 1 WHEN 2*(p_disc%q)  = q THEN (p_disc//q)%2  ELSE 0 END AS DOUBLE)/100.0 AS avg_disc
        |FROM g ORDER BY flag, date""".stripMargin,

    "q_exists_probe" ->
      """SELECT count(*) AS found FROM (
        |  SELECT 1 FROM lineitem
        |  WHERE CAST(l_shipdate AS DATE) = DATE '1996-03-15' LIMIT 1)""".stripMargin,

    "q_engagement_ratio" ->
      """SELECT flag, date,
        |  CASE WHEN total_qty > 0
        |       THEN (total_price + 2 * total_disc) / total_qty * 1000
        |       ELSE 0.0 END AS engagement_ratio
        |FROM (
        |  SELECT l_returnflag AS flag, CAST(l_shipdate AS DATE) AS date,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price,
        |    CAST(sum(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) AS total_disc
        |  FROM lineitem GROUP BY 1, 2)
        |ORDER BY flag, date""".stripMargin,

    "q_top_category" ->
      """SELECT event_type, bucket AS top_bucket, cnt FROM (
        |  SELECT event_type, bucket, cnt,
        |    row_number() OVER (PARTITION BY event_type ORDER BY cnt DESC, bucket ASC) AS rn
        |  FROM (SELECT event_type, user_id % 10 AS bucket, count(*) AS cnt
        |        FROM events GROUP BY 1, 2))
        |WHERE rn = 1 ORDER BY event_type""".stripMargin,

    "q_mode_udaf" ->
      """SELECT event_type, bucket AS top_bucket FROM (
        |  SELECT event_type, bucket,
        |    row_number() OVER (PARTITION BY event_type ORDER BY count(*) DESC, bucket ASC) AS rn
        |  FROM (SELECT event_type, user_id % 10 AS bucket FROM events)
        |  GROUP BY event_type, bucket)
        |WHERE rn = 1 ORDER BY event_type""".stripMargin,

    "q_distinct_regions" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",

    "q_dedup_day" ->
      """SELECT DISTINCT event_type, CAST(ts AS DATE) AS date FROM events
        |ORDER BY event_type, date""".stripMargin,

    "q_union_regions" ->
      """SELECT event_id, event_type FROM events WHERE event_type IN ('click','view')
        |UNION ALL
        |SELECT event_id, event_type FROM events WHERE event_type = 'error'
        |ORDER BY event_id""".stripMargin,

    "q_range_join" ->
      """SELECT o_orderkey, p_partkey, o_totalprice, p_retailprice
        |FROM orders JOIN part
        |  ON o_totalprice >= p_retailprice AND o_totalprice < p_retailprice + 100
        |ORDER BY o_orderkey, p_partkey""".stripMargin,

    "q_asof_join" ->
      """WITH r AS (
        |  SELECT user_id % 50 AS k, ts, max_by(event_id, event_id) AS event_id,
        |         max_by(value, event_id) AS value
        |  FROM events GROUP BY 1, 2),
        |l AS (
        |  SELECT o_orderkey, o_custkey % 50 AS k,
        |    TIMESTAMP '2024-01-01' + INTERVAL (o_orderkey % 45) DAY AS t
        |  FROM orders)
        |SELECT l.o_orderkey, l.k, r.event_id AS asof_event, r.value AS asof_value
        |FROM l ASOF LEFT JOIN r ON l.k = r.k AND r.ts <= l.t
        |ORDER BY o_orderkey""".stripMargin,

    "q_salted_agg" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_rollup_agg" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |  coalesce(l_linestatus, 'ALL') AS status,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY flag, status""".stripMargin,

    "q_dod_growth" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS date, count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, date, n, total_value,
        |  lag(total_value, 1) OVER (PARTITION BY event_type ORDER BY date) AS prev_value,
        |  total_value - lag(total_value, 1) OVER (PARTITION BY event_type ORDER BY date) AS growth
        |FROM daily ORDER BY event_type, date""".stripMargin,

    "q_ntile_quartile" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS date, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, date, n,
        |  ntile(4) OVER (PARTITION BY event_type ORDER BY n ASC, date ASC) AS quartile,
        |  lead(n, 1) OVER (PARTITION BY event_type ORDER BY n ASC, date ASC) AS next_n
        |FROM daily ORDER BY event_type, n, date""".stripMargin,

    "q_pivot" ->
      """SELECT CAST(ts AS DATE) AS date,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'view') AS view,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_unpivot" ->
      """SELECT CAST(ts AS DATE) AS date, event_type, count(*) AS n
        |FROM events
        |WHERE event_type IN ('click','view','purchase','error','signup')
        |GROUP BY 1, 2 HAVING count(*) > 0
        |ORDER BY date, event_type""".stripMargin,

    "q_nested_map_array" ->
      """WITH t AS (
        |  SELECT doc_id, (regexp_split_to_array(trim(text), '\s+'))[1:3] AS tags,
        |    length(text)*2 AS thumb_w
        |  FROM documents)
        |SELECT doc_id, i AS tag_pos, tags[i+1] AS tag, thumb_w
        |FROM t, LATERAL (SELECT unnest(range(len(t.tags))) AS i) s
        |ORDER BY doc_id, tag_pos""".stripMargin,

    "q_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |    lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev_ts IS NULL
        |           OR epoch_us(ts)//1000000 - epoch_us(prev_ts)//1000000 > 1800
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM g),
        |c AS (
        |  SELECT user_id, ts, event_id,
        |    -- CAST is load-bearing: DuckDB's windowed sum returns HUGEINT (int128),
        |    -- which materializes as float64 (1.0 vs Spark's int64 1) and diverges
        |    -- under a serialized-value hash despite comparing numerically equal.
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM s)
        |SELECT user_id, session_id,
        |  min(epoch_us(ts)) AS session_start, max(epoch_us(ts)) AS session_end,
        |  count(*) AS n_events
        |FROM c GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,

    "q_weekly_report" ->
      """WITH week AS (
        |  SELECT * FROM events
        |  WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'),
        |daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS date, count(*) AS n_events,
        |    CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
        |  FROM week GROUP BY 1, 2),
        |bc AS (
        |  SELECT event_type, CAST(ts AS DATE) AS date, user_id % 10 AS bucket, count(*) AS bn
        |  FROM week GROUP BY 1, 2, 3),
        |topd AS (
        |  SELECT event_type, date, bucket AS top_bucket FROM (
        |    SELECT event_type, date, bucket,
        |      row_number() OVER (PARTITION BY event_type, date ORDER BY bn DESC, bucket ASC) AS rn
        |    FROM bc) WHERE rn = 1),
        |d AS (
        |  SELECT daily.event_type, daily.date, daily.n_events, daily.total_value,
        |    topd.top_bucket, daily.total_value / daily.n_events AS ratio
        |  FROM daily JOIN topd ON daily.event_type = topd.event_type AND daily.date = topd.date),
        |wins AS (
        |  SELECT event_type, top_bucket AS win FROM (
        |    SELECT event_type, top_bucket,
        |      row_number() OVER (PARTITION BY event_type ORDER BY count(*) DESC, top_bucket ASC) AS rn
        |    FROM d GROUP BY event_type, top_bucket) WHERE rn = 1)
        |SELECT d.event_type, w.win AS top_bucket,
        |  count(*) FILTER (WHERE d.top_bucket = w.win) AS days_won,
        |  CAST(sum(CAST(d.total_value AS DECIMAL(28,6))) FILTER (WHERE d.top_bucket = w.win) AS DOUBLE) AS total_value_top,
        |  CAST(sum(CAST(d.ratio AS DECIMAL(28,6))) FILTER (WHERE d.top_bucket = w.win) AS DOUBLE)
        |    / count(*) FILTER (WHERE d.top_bucket = w.win) AS avg_ratio_top
        |FROM d JOIN wins w ON d.event_type = w.event_type
        |GROUP BY d.event_type, w.win
        |ORDER BY d.event_type""".stripMargin,

    "q_report_rows" ->
      """SELECT event_type, count(*) AS n_events,
        |  format('{:,}', count(*)) AS n_events_fmt,
        |  strftime(min(CAST(ts AS DATE)), '%d %b %Y') AS first_date_fmt
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_pt_duration" ->
      """SELECT event_id,
        |  CASE WHEN event_id % 5 = 0
        |    THEN 'PT' || (event_id % 60) || 'M' || ((event_id * 7) % 60) || 'S'
        |    ELSE 'P' || (event_id % 3) || 'DT' || (user_id % 24) || 'H' ||
        |         (event_id % 60) || 'M' || ((event_id * 7) % 60) || 'S' END AS iso,
        |  CASE WHEN event_id % 5 = 0
        |    THEN (event_id % 60) * 60 + ((event_id * 7) % 60)
        |    ELSE (event_id % 3) * 86400 + (user_id % 24) * 3600 +
        |         (event_id % 60) * 60 + ((event_id * 7) % 60) END AS secs
        |FROM events ORDER BY event_id""".stripMargin,

    "q_explode_seq" ->
      """SELECT event_id, pos, event_id * pos AS weight
        |FROM events, LATERAL (SELECT unnest(range(1, event_id % 4 + 2)) AS pos) t
        |ORDER BY event_id, pos""".stripMargin,

    "q_ts_normalize" ->
      """SELECT event_id, date_trunc('second', ts) AS ts_norm
        |FROM events ORDER BY event_id""".stripMargin,

    "q_date_format" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d') AS d_iso,
        |  strftime(ts, '%d %b %Y') AS d_label
        |FROM events ORDER BY event_id""".stripMargin,
  )
}
