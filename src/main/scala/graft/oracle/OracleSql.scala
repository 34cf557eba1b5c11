package graft.oracle

/** DuckDB 1.0.0 oracle SQL, keyed identically to `SparkEntry.queries`.
  *
  * Contract (SURVEY.md §2): every query's SQL is runnable by DuckDB against
  * the same parquet files; column aliases match the Spark output exactly
  * (the driver sorts columns by name before hashing); every statement ends
  * in a total ORDER BY (D1); money math is integer cents (D2); float
  * outputs are ROUND-ed (D3). Tables are referenced by bare name — the
  * driver registers views over `<sfDir>/<name>.parquet`.
  */
object OracleSql {

  val sql: Map[String, String] = Map(
    "q_scan_lineitem_count" ->
      "SELECT count(*) AS n FROM lineitem",

    "q_scan_pruned" -> """
      SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem WHERE l_quantity > 45
      ORDER BY l_orderkey, l_linenumber, qty""",

    "q_filter_complex" -> """
      SELECT l_orderkey, l_linenumber,
             CAST(ROUND(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS disc_price_e4
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_returnflag IN ('A','R')
      ORDER BY l_orderkey, l_linenumber, disc_price_e4""",

    "q_project_expr" -> """
      SELECT p_partkey, UPPER(p_brand) AS brand_uc,
             SUBSTRING(p_name, 1, 8) AS name8,
             CAST(ROUND(p_retailprice*100) AS BIGINT) AS retail_cents,
             p_size * 2 AS size2
      FROM part ORDER BY p_partkey""",

    "q_agg_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
             CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_e4,
             COUNT(*) AS n_rows,
             ROUND(SUM(CAST(l_quantity AS BIGINT)) / COUNT(*), 4) AS avg_qty
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q_agg_distinct" -> """
      SELECT l_returnflag,
             CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
             CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_agg_rollup" -> """
      SELECT COALESCE(l_returnflag, 'ALL') AS rf,
             COALESCE(l_linestatus, 'ALL') AS ls,
             CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS rev_e4,
             CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY gid, rf, ls""",

    "q_agg_cube" -> """
      SELECT COALESCE(event_type, 'ALL') AS event_type,
             COALESCE(strftime(day, '%Y-%m-%d'), '1900-01-01') AS day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(value_cents) AS BIGINT) AS value_cents,
             CAST(GROUPING(event_type, day) AS BIGINT) AS gid
      FROM (SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(ROUND(value*100) AS BIGINT) AS value_cents FROM events)
      GROUP BY CUBE(event_type, day)
      ORDER BY gid, event_type, day""",

    "q_agg_stats" -> """
      SELECT ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
             ROUND(STDDEV_SAMP(l_quantity), 4) AS std_qty,
             ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qty_price
      FROM lineitem""",

    "q_agg_median" -> """
      SELECT o_orderpriority,
             ROUND(quantile_cont(tp_cents, 0.5), 4) AS median_cents,
             ROUND(quantile_cont(tp_cents, 0.9), 4) AS p90_cents
      FROM (SELECT o_orderpriority,
                   CAST(ROUND(o_totalprice*100) AS BIGINT) AS tp_cents FROM orders)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_topk_customers" -> """
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
      FROM orders GROUP BY o_custkey
      ORDER BY total_cents DESC, o_custkey LIMIT 10""",

    "q_sort_multi" -> """
      SELECT s_suppkey, s_nationkey,
             CAST(ROUND(s_acctbal*100) AS BIGINT) AS acct_cents
      FROM supplier
      ORDER BY s_nationkey ASC, acct_cents DESC, s_suppkey ASC""",

    "q_set_intersect" -> """
      SELECT DISTINCT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
      INTERSECT
      SELECT DISTINCT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
      ORDER BY custkey""",

    "q_set_except" -> """
      SELECT DISTINCT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
      EXCEPT
      SELECT DISTINCT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
      ORDER BY custkey""",

    "q_set_union" -> """
      SELECT custkey, CAST(COUNT(*) AS BIGINT) AS n
      FROM (
        SELECT DISTINCT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
        UNION ALL
        SELECT DISTINCT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
      ) GROUP BY custkey ORDER BY custkey""",

    "q_join_broadcast" -> """
      SELECT p_brand,
             CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS rev_e4
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand ORDER BY p_brand""",

    "q_join_shuffle_multi" -> """
      SELECT r_name, n_name,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name""",

    "q_join_left_outer" -> """
      SELECT o_orderkey, CAST(COUNT(l_orderkey) AS BIGINT) AS n_lines
      FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderkey ORDER BY o_orderkey""",

    "q_join_semi" -> """
      SELECT o_orderkey, o_orderpriority FROM orders o
      WHERE EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
      ORDER BY o_orderkey""",

    "q_join_anti" -> """
      SELECT o_orderkey FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
      ORDER BY o_orderkey""",

    "q_join_theta" -> """
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem JOIN orders
        ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 100 DAY
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_join_asof" -> """
      SELECT event_id, user_id, prev_type,
             (ts_usl - prev_usl) / 1e6 AS gap_sec
      FROM (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_usl,
                   LAG(epoch_us(ts)) OVER w AS prev_usl,
                   LAG(event_type) OVER w AS prev_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
      WHERE event_type = 'purchase'
      ORDER BY event_id""",

    "q_window_rank" -> """
      SELECT o_orderpriority, o_orderkey, total_cents, rnk FROM (
        SELECT o_orderpriority, o_orderkey,
               CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_cents,
               CAST(RANK() OVER (PARTITION BY o_orderpriority
                    ORDER BY CAST(ROUND(o_totalprice*100) AS BIGINT) DESC, o_orderkey)
                    AS BIGINT) AS rnk
        FROM orders)
      WHERE rnk <= 3
      ORDER BY o_orderpriority, rnk, o_orderkey""",

    "q_window_running" -> """
      SELECT user_id, event_id, running_cents, rn FROM (
        SELECT user_id, event_id,
               CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (
                 PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC)
                 AS BIGINT) AS rn
        FROM events)
      WHERE rn <= 5
      ORDER BY user_id, event_id""",

    "q_window_lag_delta" -> """
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             ROUND(SUM(delta_us) / (COUNT(delta_us) * 1e6), 4) AS avg_gap_sec
      FROM (SELECT user_id,
                   epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                     PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS delta_us
            FROM events)
      GROUP BY user_id ORDER BY user_id""",

    "q_window_ntile" -> """
      SELECT c_mktsegment, quartile, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MIN(acct_cents) AS BIGINT) AS min_cents,
             CAST(MAX(acct_cents) AS BIGINT) AS max_cents
      FROM (SELECT c_mktsegment,
                   CAST(ROUND(c_acctbal*100) AS BIGINT) AS acct_cents,
                   CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
                        ORDER BY CAST(ROUND(c_acctbal*100) AS BIGINT) ASC, c_custkey ASC)
                        AS BIGINT) AS quartile
            FROM customer)
      GROUP BY c_mktsegment, quartile ORDER BY c_mktsegment, quartile""",

    "q_scalar_string" -> """
      SELECT p_partkey,
             p_brand || ':' || p_type AS brand_type,
             CAST(LENGTH(p_name) AS BIGINT) AS name_len,
             REPLACE(p_name, ' ', '_') AS name_us,
             LPAD(CAST(p_size AS VARCHAR), 5, '0') AS size_pad,
             string_split(p_name, ' ')[1] AS first_tok,
             CAST(regexp_extract(p_brand, '#(\d+)', 1) AS BIGINT) AS brand_num
      FROM part ORDER BY p_partkey""",

    "q_scalar_date" -> """
      SELECT o_orderkey,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
             CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
             CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS d,
             strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
             CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT) AS days_to_2000,
             strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
      FROM orders ORDER BY o_orderkey""",

    "q_scalar_math" -> """
      SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS BIGINT) AS qty,
             ROUND(SQRT(l_quantity), 4) AS sqrt_qty,
             ROUND(LN(l_quantity), 4) AS ln_qty,
             CAST(POWER(l_quantity, 2) AS BIGINT) AS qty_sq,
             CAST(ABS(l_quantity - 25) AS BIGINT) AS abs_dev,
             CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
             CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
             ROUND(l_extendedprice / 7, 2) AS price_7th
      FROM lineitem WHERE l_orderkey % 997 = 0
      ORDER BY l_orderkey, l_linenumber, qty, price_k_ceil, price_7th""",

    "q_scalar_json" -> """
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(k) AS BIGINT) AS sum_k,
             MIN(k) AS min_k, MAX(k) AS max_k
      FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS INT) AS k FROM events)
      GROUP BY event_type ORDER BY event_type""",

    "q_scalar_array" -> """
      SELECT vec_id,
             CAST(len(embedding) AS BIGINT) AS dim,
             ROUND(CAST(embedding[1] AS DOUBLE), 4) AS first_e,
             ROUND(CAST(embedding[64] AS DOUBLE), 4) AS last_e,
             ROUND(SQRT(list_sum(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm
      FROM embeddings ORDER BY vec_id""",
  )
}
