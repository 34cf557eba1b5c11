package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.core.Det.{cents, r4}

/** Scalar function surface: string / date / math / JSON / array
  * (SURVEY.md §2.8). All codegen'd builtin expressions — zero UDFs.
  * Integer-producing functions are cast to long so Spark and DuckDB
  * (whose EXTRACT/LENGTH return BIGINT) emit identical schemas.
  */
object Scalars {

  def q_scalar_string(spark: SparkSession, sf: String): DataFrame =
    Tables.part(spark, sf)
      .select(
        col("p_partkey"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_replace(col("p_name"), lit(" "), lit("_")).as("name_us"),
        lpad(col("p_size").cast("string"), 5, "0").as("size_pad"),
        split(col("p_name"), " ").getItem(0).as("first_tok"),
        regexp_extract(col("p_brand"), "#(\\d+)", 1).cast("long").as("brand_num"))
      .orderBy("p_partkey")

  def q_scalar_date(spark: SparkSession, sf: String): DataFrame =
    Tables.orders(spark, sf)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        datediff(to_date(lit("2000-01-01")), to_date(col("o_orderdate")))
          .cast("long").as("days_to_2000"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"))
      .orderBy("o_orderkey")

  /** Math functions on a deterministic lineitem sample. Each float output
    * is a single libm op then ROUND(,4) — quantity has only 50 distinct
    * integral values, so cross-engine ULP drift cannot cross a rounding
    * boundary.
    */
  def q_scalar_math(spark: SparkSession, sf: String): DataFrame =
    Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 997 === 0)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("qty"),
        r4(sqrt(col("l_quantity"))).as("sqrt_qty"),
        r4(log(col("l_quantity"))).as("ln_qty"),
        pow(col("l_quantity"), 2).cast("long").as("qty_sq"),
        abs(col("l_quantity") - 25).cast("long").as("abs_dev"),
        ceil(col("l_extendedprice") / 1000).cast("long").as("price_k_ceil"),
        floor(col("l_extendedprice") / 1000).cast("long").as("price_k_floor"),
        round(col("l_extendedprice") / 7, 2).as("price_7th"))
      .orderBy("l_orderkey", "l_linenumber", "qty", "price_k_ceil", "price_7th")

  /** JSON extraction from the events props payload, aggregated exactly. */
  def q_scalar_json(spark: SparkSession, sf: String): DataFrame =
    Tables.table(spark, sf, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** PII-style redaction pass over the JSON props payload: digit runs are
    * the sensitive pattern; per event type — payloads containing digits,
    * total digit runs, total digit characters, and the redacted ('#' per
    * run) payload length. Pure per-row regex (codegen'd builtins), one tiny
    * aggregate — the shape of a full-corpus scrubbing pass.
    */
  def q_pii_redact(spark: SparkSession, sf: String): DataFrame =
    Tables.table(spark, sf, "events")
      .select(col("event_type"),
        regexp_count(col("props"), lit("[0-9]+")).cast("long").as("runs"),
        length(regexp_replace(col("props"), "[^0-9]", "")).cast("long").as("digits"),
        length(regexp_replace(col("props"), "[0-9]+", "#")).cast("long").as("red_len"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("digits") > 0L, 1L).otherwise(0L)).as("n_with_digits"),
        sum(col("runs")).as("total_runs"),
        sum(col("digits")).as("total_digits"),
        sum(col("red_len")).as("total_red_len"))
      .orderBy("event_type")

  /** Array higher-order functions over the embedding vectors: length,
    * element access, L2 norm — float elements cast to double before any
    * arithmetic (D3), all inside codegen-friendly builtin HOFs.
    */
  def q_scalar_array(spark: SparkSession, sf: String): DataFrame =
    Tables.embeddings(spark, sf)
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        (r4(element_at(col("embedding"), 1).cast("double")) + lit(0.0)).as("first_e"),
        (r4(element_at(col("embedding"), -1).cast("double")) + lit(0.0)).as("last_e"),
        r4(sqrt(aggregate(
          transform(col("embedding"), x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, x) => acc + x))).as("l2_norm"))
      .orderBy("vec_id")
}
