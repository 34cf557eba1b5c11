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
  )
}
