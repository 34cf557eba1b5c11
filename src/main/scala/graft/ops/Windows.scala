package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.core.Det.cents

/** Window functions (SURVEY.md §2.5). Every window orders by a provably
  * unique key set inside each partition (money cents + entity id, or
  * µs-timestamp + event id) so rank/lag/ntile are total-order deterministic
  * across engines.
  */
object Windows {

  /** Top-3 orders per priority via RANK over (cents desc, key asc). */
  def q_window_rank(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("total_cents").desc, col("o_orderkey").asc)
    Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_orderkey"),
        cents(col("o_totalprice")).as("total_cents"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .orderBy("o_orderpriority", "rnk", "o_orderkey")
  }

  /** Running per-user cents sum (unbounded-preceding frame); emit the last
    * 5 events per user by a descending row_number.
    */
  def q_window_running(spark: SparkSession, sf: String): DataFrame = {
    val ev = Tables.eventsWithTs(spark, sf)
    val wAsc = Window.partitionBy("user_id")
      .orderBy(col("ts_usl").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy("user_id")
      .orderBy(col("ts_usl").desc, col("event_id").desc)
    ev.withColumn("running_cents", sum(cents(col("value"))).over(wAsc))
      .withColumn("rn", row_number().over(wDesc).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("user_id"), col("event_id"), col("running_cents"), col("rn"))
      .orderBy("user_id", "event_id")
  }

  /** Per-user inter-event gap stats. Deltas are exact integer µs; the only
    * float op is the final single division + ROUND (D3).
    */
  def q_window_lag_delta(spark: SparkSession, sf: String): DataFrame = {
    val ev = Tables.eventsWithTs(spark, sf)
    val w = Window.partitionBy("user_id").orderBy(col("ts_usl").asc, col("event_id").asc)
    ev.withColumn("delta_us", col("ts_usl") - lag(col("ts_usl"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("delta_us")) / (count(col("delta_us")) * lit(1e6)), 4)
          .as("avg_gap_sec"))
      .orderBy("user_id")
  }

  /** first/last/nth value over each user's full event history (unbounded
    * frame — last_value needs it, the default frame stops at CURRENT ROW).
    */
  def q_window_firstlast(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_usl").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.eventsWithTs(spark, sf)
      .select(col("user_id"), col("ts_usl"), col("event_id"),
        first(col("event_type")).over(w).as("first_type"),
        last(col("event_type")).over(w).as("last_type"),
        nth_value(col("event_type"), 2).over(w).as("second_type"))
      .groupBy(col("user_id"))
      .agg(
        first(col("first_type")).as("first_type"),
        first(col("last_type")).as("last_type"),
        first(col("second_type")).as("second_type"))
      .orderBy("user_id")
  }

  /** Value-based RANGE frame: per customer, the rolling 30-day order value
    * (all orders whose day number lies in [current−30, current]). The
    * frame key is an exact integer day number, so peer-group membership —
    * and therefore the integer sum — is identical across engines.
    */
  def q_window_range_frame(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("day_num")).rangeBetween(-30, 0)
    Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), to_date(lit("1990-01-01"))).cast("long").as("day_num"),
        cents(col("o_totalprice")).as("tp_cents"))
      .withColumn("sum30_cents", sum(col("tp_cents")).over(w))
      .orderBy("o_custkey", "day_num", "o_orderkey")
  }

  /** Distribution-position windows: PERCENT_RANK and CUME_DIST of each
    * customer's balance within its market segment. Both are closed-form
    * ((rank−1)/(n−1), peers/n) over exact integer cents, so the rounded
    * outputs are identical across engines even with balance ties.
    */
  def q_window_percentiles(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy(col("bal"))
    Tables.customer(spark, sf)
      .select(col("c_mktsegment"), col("c_custkey"), cents(col("c_acctbal")).as("bal"))
      .withColumn("pr", round(percent_rank().over(w), 4))
      .withColumn("cd", round(cume_dist().over(w), 4))
      .orderBy("c_mktsegment", "bal", "c_custkey")
  }

  /** Exponentially weighted moving average as a rolling feature: per user,
    * EWMA of value cents over the last 8 events with FIXED integer e6
    * weights (halving per step; literal constants on both engines — no
    * runtime float-weight derivation, so the weighted sum is an exact
    * integer). The recurrence unrolls into 8 `lag` terms — one window, no
    * self-joins.
    */
  def q_window_ewma(spark: SparkSession, sf: String): DataFrame = {
    val weights = Seq(1000000L, 500000L, 250000L, 125000L, 62500L, 31250L, 15625L, 7812L)
    val w = Window.partitionBy("user_id").orderBy(col("ts_usl").asc, col("event_id").asc)
    val terms = weights.zipWithIndex.map { case (wk, k) =>
      coalesce(lag(col("v"), k).over(w), lit(0L)) * lit(wk)
    }.reduce(_ + _)
    Tables.eventsWithTs(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts_usl"), cents(col("value")).as("v"))
      .withColumn("ewma_e6", terms)
      .select(col("user_id"), col("event_id"), col("v"), col("ewma_e6"))
      .orderBy("user_id", "event_id")
  }

  /** Account-balance quartiles per market segment via NTILE(4). */
  def q_window_ntile(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("acct_cents").asc, col("c_custkey").asc)
    Tables.customer(spark, sf)
      .select(col("c_mktsegment"), col("c_custkey"), cents(col("c_acctbal")).as("acct_cents"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .groupBy(col("c_mktsegment"), col("quartile"))
      .agg(
        count(lit(1)).as("n"),
        min(col("acct_cents")).as("min_cents"),
        max(col("acct_cents")).as("max_cents"))
      .orderBy("c_mktsegment", "quartile")
  }

  /** Windowed lag-feature export (the time-series feature engineering a
    * sequence model trains on): for each event of users 0-19, the
    * previous value, the delta, and the trailing-3 rolling sum + count —
    * all exact integer cents kept as (sum, n) pairs so no division ever
    * happens. One user-keyed shuffle; the user bound is a pushed-down
    * filter.
    */
  def q_lag_features_export(spark: SparkSession, sf: String): DataFrame = {
    import graft.core.Det.cents
    val w = Window.partitionBy("user_id").orderBy(col("ts_usl").asc, col("event_id").asc)
    Tables.eventsWithTs(spark, sf)
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"), col("ts_usl"), cents(col("value")).as("vc"))
      .withColumn("prev_cents", lag(col("vc"), 1).over(w))
      .withColumn("delta_cents", col("vc") - col("prev_cents"))
      .withColumn("sum3_cents", sum(col("vc")).over(w.rowsBetween(-2, 0)))
      .withColumn("n3", count(lit(1)).over(w.rowsBetween(-2, 0)))
      .select(col("user_id"), col("event_id"), col("vc").as("value_cents"),
        col("prev_cents"), col("delta_cents"), col("sum3_cents"), col("n3"))
      .orderBy("user_id", "event_id")
  }

  /** Boundary window functions over the FULL frame (first_value /
    * nth_value(2) / last_value with unbounded-both frames) per market
    * segment on the unique (balance desc, custkey) order — the top /
    * runner-up / bottom readout without three separate rank passes.
    */
  def q_window_nth_value(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("bal_cents").desc, col("c_custkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.customer(spark, sf)
      .select(col("c_mktsegment"), col("c_custkey"), cents(col("c_acctbal")).as("bal_cents"))
      .withColumn("top_bal", first(col("bal_cents")).over(w))
      .withColumn("second_bal", nth_value(col("bal_cents"), 2).over(w))
      .withColumn("bottom_bal", last(col("bal_cents")).over(w))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), max(col("top_bal")).as("top_bal"),
        max(col("second_bal")).as("second_bal"), max(col("bottom_bal")).as("bottom_bal"))
      .orderBy("c_mktsegment")
  }

  /** Distribution window functions percent_rank() and cume_dist() over a
    * segment-keyed unique (balance, custkey) order — both are exact
    * rationals of small integers, so the same IEEE division happens on
    * both engines; rounded r6 for the compare. Spot output custkey < 50.
    */
  def q_window_cume_dist(spark: SparkSession, sf: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("bal_cents").asc, col("c_custkey").asc)
    Tables.customer(spark, sf)
      .select(col("c_mktsegment"), col("c_custkey"), cents(col("c_acctbal")).as("bal_cents"))
      .withColumn("pr", round(percent_rank().over(w), 6) + lit(0.0))
      .withColumn("cd", round(cume_dist().over(w), 6) + lit(0.0))
      .filter(col("c_custkey") < 50)
      .select(col("c_mktsegment"), col("c_custkey"), col("bal_cents"), col("pr"), col("cd"))
      .orderBy("c_custkey")
  }
}
