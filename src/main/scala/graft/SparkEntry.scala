package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._
import graft.oracle.OracleSql

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q_agg_pricing_summary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_lineitem_count" -> (Relational.q_scan_lineitem_count _),
    "q_scan_pruned"         -> (Relational.q_scan_pruned _),
    "q_filter_complex"      -> (Relational.q_filter_complex _),
    "q_project_expr"        -> (Relational.q_project_expr _),
    "q_agg_pricing_summary" -> (Relational.q_agg_pricing_summary _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = OracleSql.sql
}
