package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Det, Tables}
import graft.core.Det.{cents, pct, r4}

/** Relational operators: scans, filters/projections, aggregations, sorts,
  * top-k, set operations (SURVEY.md §2.1, §2.2, §2.4, §2.6, §2.7).
  *
  * All plans are declarative DataFrame ops so Catalyst handles pushdown,
  * pruning, partial aggregation and AQE re-planning; every query ends in a
  * total ORDER BY over a unique key set (determinism rule D1).
  */
object Relational {

  // ---- §2.1 scans ----------------------------------------------------------

  /** Full-scan COUNT(*) — exercises the vectorized parquet reader's
    * metadata-only count path (no column materialization).
    */
  def q_scan_lineitem_count(spark: SparkSession, sf: String): DataFrame =
    Tables.lineitem(spark, sf).agg(count(lit(1)).as("n"))

  /** Column-pruned, predicate-pushed scan: only 2 of 11 lineitem columns
    * reach the scan and the quantity filter lands in PushedFilters
    * (asserted by the plan-shape test).
    */
  def q_scan_pruned(spark: SparkSession, sf: String): DataFrame =
    Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity").cast("long").as("qty"))
      .filter(col("l_quantity") > 45)
      .orderBy("l_orderkey", "l_linenumber", "qty")

  // ---- §2.2 projection / filter -------------------------------------------

  /** Conjunctive/disjunctive predicate mix (range, BETWEEN, IN) plus a
    * derived money expression kept exact in cents×100 space (D2).
    */
  def q_filter_complex(spark: SparkSession, sf: String): DataFrame =
    Tables.lineitem(spark, sf)
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") <  lit("1997-01-01").cast("timestamp_ntz") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_returnflag").isin("A", "R"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount"))))
          .as("disc_price_e4"))
      .orderBy("l_orderkey", "l_linenumber", "disc_price_e4")

  /** Computed projections over `part`: string ops + exact money cents. */
  def q_project_expr(spark: SparkSession, sf: String): DataFrame =
    Tables.part(spark, sf)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_uc"),
        substring(col("p_name"), 1, 8).as("name8"),
        cents(col("p_retailprice")).as("retail_cents"),
        (col("p_size") * 2).as("size2"))
      .orderBy("p_partkey")

  // ---- §2.4 aggregations ---------------------------------------------------

  /** TPC-H Q1 flavor: the flagship pricing summary. Exact integer math per
    * D2 — sums of cents (and cents×percent for the discounted price), with
    * the only float output a ROUND(...,4) average.
    */
  def q_agg_pricing_summary(spark: SparkSession, sf: String): DataFrame =
    Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
        sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount"))))
          .as("sum_disc_e4"),
        count(lit(1)).as("n_rows"),
        r4(sum(col("l_quantity").cast("long")) / count(lit(1))).as("avg_qty"))
      .orderBy("l_returnflag", "l_linestatus")
}
