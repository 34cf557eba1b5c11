package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.core.Det.{cents, pct}

/** Join operators (SURVEY.md §2.3).
  *
  * Scale posture: fact-to-dim joins broadcast the dim explicitly (the
  * MapReduce "DistributedCache map-side join" expressed Spark-first);
  * fact-to-fact joins shuffle on their equi-keys and rely on AQE for
  * runtime re-planning / skew splitting at production scale.
  */
object Joins {

  /** Broadcast hash join: lineitem ⋈ part (dim explicitly broadcast —
    * plan-shape test asserts BroadcastHashJoin), revenue per brand.
    */
  def q_join_broadcast(spark: SparkSession, sf: String): DataFrame =
    Tables.lineitem(spark, sf)
      .join(broadcast(Tables.part(spark, sf)),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount"))))
        .as("rev_e4"))
      .orderBy("p_brand")

  /** 4-way join across the star schema; revenue rolled up to region/nation.
    * nation/region are tiny → Catalyst broadcasts them; customer⋈orders
    * shuffles on the key.
    */
  def q_join_shuffle_multi(spark: SparkSession, sf: String): DataFrame =
    Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf), col("c_custkey") === col("o_custkey"))
      .join(broadcast(Tables.nation(spark, sf)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, sf)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(cents(col("o_totalprice"))).as("rev_cents"))
      .orderBy("r_name", "n_name")

  /** LEFT OUTER preserving line-less orders (n_lines = 0 for them). */
  def q_join_left_outer(spark: SparkSession, sf: String): DataFrame =
    Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"), "left_outer")
      .groupBy(col("o_orderkey"))
      .agg(count(col("l_orderkey")).as("n_lines"))
      .orderBy("o_orderkey")

  /** LEFT SEMI: orders having at least one high-quantity line. */
  def q_join_semi(spark: SparkSession, sf: String): DataFrame =
    Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf).filter(col("l_quantity") >= 49),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_orderpriority"))
      .orderBy("o_orderkey")

  /** LEFT ANTI: orders with no lineitems at all. */
  def q_join_anti(spark: SparkSession, sf: String): DataFrame =
    Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select(col("o_orderkey"))
      .orderBy("o_orderkey")

  /** Equi-join with a theta residual (ship date > order date + 100 days) —
    * the residual stays a post-join filter on the hash join, not a
    * nested-loop.
    */
  def q_join_theta(spark: SparkSession, sf: String): DataFrame =
    Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 100 DAYS"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** Range (binning) join: orders banded into price tiers through a pure
    * non-equi BETWEEN join against a tiny inline tier table — Spark plans a
    * BroadcastNestedLoopJoin, the right physical choice for a 5-row build
    * side at any fact-table scale.
    */
  def q_join_range_bin(spark: SparkSession, sf: String): DataFrame = {
    import spark.implicits._
    val tiers = Seq(
      (1L, 0L, 10000000L),
      (2L, 10000000L, 20000000L),
      (3L, 20000000L, 30000000L),
      (4L, 30000000L, 40000000L),
      (5L, 40000000L, 1000000000000L)).toDF("tier", "lo", "hi")
    Tables.orders(spark, sf)
      .select(cents(col("o_totalprice")).as("tp_cents"))
      .join(broadcast(tiers), col("tp_cents") >= col("lo") && col("tp_cents") < col("hi"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n"), sum(col("tp_cents")).as("sum_cents"))
      .orderBy("tier")
  }

  /** FULL OUTER join: each customer's 1996 vs 1997 order activity, keeping
    * customers active in only one of the years on the appropriate side
    * (nulls → 0). Both inputs are pre-aggregated to one row per key, so the
    * outer join is key-unique and the shuffle is on the join key only.
    */
  def q_join_full_outer(spark: SparkSession, sf: String): DataFrame = {
    val o = Tables.orders(spark, sf)
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"),
        cents(col("o_totalprice")).as("tp"))
    def yearAgg(y: Int, n: String, c: String): DataFrame =
      o.filter(col("yr") === y).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as(n), sum(col("tp")).as(c))
    yearAgg(1996, "n96", "cents96")
      .join(yearAgg(1997, "n97", "cents97"), Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        coalesce(col("n96"), lit(0L)).as("n96"),
        coalesce(col("cents96"), lit(0L)).as("cents96"),
        coalesce(col("n97"), lit(0L)).as("n97"),
        coalesce(col("cents97"), lit(0L)).as("cents97"))
      .orderBy("o_custkey")
  }

  /** Skew-mitigated (salted) join, oracle-verified: lineitem ⋈ orders
    * through [[graft.core.Layout.saltedJoin]] — the hot-key side splits
    * across 8 deterministic salts (derived from `l_linenumber`, no rand())
    * while the other side replicates ×8, then revenue rolls up per order
    * priority. The oracle runs the PLAIN join: salting must be invisible
    * in the result, only in the shuffle layout.
    */
  def q_join_salted(spark: SparkSession, sf: String): DataFrame = {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"),
        (cents(col("l_extendedprice")) * (lit(100L) - pct(col("l_discount"))))
          .as("rev_e4"))
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    graft.core.Layout.saltedJoin(li, o, "l_orderkey", col("l_linenumber"), 8)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"), sum(col("rev_e4")).as("rev_e4"))
      .orderBy("o_orderpriority")
  }

  /** Interval (time-window) join — the batch twin of a stream-stream join
    * with a ±5-minute join window: for each purchase, the count and types
    * of OTHER events by the same user within the window. Equi-key on user
    * plus a residual time predicate; integer µs throughout. At fleet scale
    * the same plan applies with time-bucketed keys (user, window-bucket) to
    * bound the per-key product; per-user event counts here make the
    * residual filter cheap.
    */
  def q_join_interval(spark: SparkSession, sf: String): DataFrame = {
    val ev = Tables.eventsWithTs(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts_usl"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts_usl").as("p_ts"))
    val win = 300000000L // 5 minutes in µs
    purchases.join(ev,
        Seq("user_id"))
      .filter(col("event_id") =!= col("p_id") &&
        col("ts_usl") >= col("p_ts") - win && col("ts_usl") <= col("p_ts") + win)
      .groupBy(col("p_id"))
      .agg(
        count(lit(1)).as("n_nearby"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n_views"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_clicks"))
      .orderBy("p_id")
  }

  /** As-of join idiom: for each purchase, the nearest preceding event of
    * the same user. Spark SQL has no native ASOF JOIN; the scalable idiom
    * for self-as-of is a window `lag` over (user, time) — one shuffle on
    * user_id, no N² and no range join. Time arithmetic runs on exact
    * integer microseconds (matching DuckDB's µs-truncated reads).
    */
  def q_join_asof(spark: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.eventsWithTs(spark, sf)
    val w = Window.partitionBy("user_id").orderBy(col("ts_usl").asc, col("event_id").asc)
    ev.withColumn("prev_usl", lag(col("ts_usl"), 1).over(w))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id"), col("user_id"), col("prev_type"),
        // exact integer µs gap: a single IEEE division is bit-identical
        // across engines, where ROUND at a half-point boundary is not
        ((col("ts_usl") - col("prev_usl")) / 1e6).as("gap_sec"))
      .orderBy("event_id")
  }

  /** As-of join with a TOLERANCE window (pandas `merge_asof(tolerance=
    * ...)`): each purchase matches its nearest preceding same-user event
    * only if it happened within the last 10 minutes; stale or missing
    * predecessors yield the −1 sentinel instead of a row drop, so the
    * output stays one-row-per-purchase (the left-join contract a feature
    * pipeline needs). Same single user-keyed shuffle as [[q_join_asof]].
    */
  def q_join_asof_tolerance(spark: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.eventsWithTs(spark, sf)
    val w = Window.partitionBy("user_id").orderBy(col("ts_usl").asc, col("event_id").asc)
    val inTol = col("prev_usl").isNotNull &&
      col("ts_usl") - col("prev_usl") <= 600L * 1000000L
    ev.withColumn("prev_usl", lag(col("ts_usl"), 1).over(w))
      .withColumn("prev_id", lag(col("event_id"), 1).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        when(inTol, col("prev_id")).otherwise(lit(-1L)).as("matched_id"),
        when(inTol, col("ts_usl") - col("prev_usl")).otherwise(lit(-1L)).as("gap_us"))
      .orderBy("user_id", "event_id")
  }

  /** As-of join, NEAREST mode (the pandas `merge_asof(direction=
    * 'nearest')` / kdb `aj` completion of [[q_join_asof]]'s backward
    * mode): for each purchase, the nearest same-user event in EITHER
    * direction by absolute time gap, tie → the earlier neighbor. One
    * user-keyed shuffle carrying both `lag` and `lead` — still no N²,
    * no range join. Time runs in exact integer microseconds — the
    * common precision of both engines (DuckDB reads the ns column
    * µs-truncated) — and the signed gap is pure subtraction (dividing a
    * negative gap would hit the trunc-vs-floor divergence).
    */
  def q_join_asof_nearest(spark: SparkSession, sf: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.eventsWithTs(spark, sf)
    val w = Window.partitionBy("user_id").orderBy(col("ts_usl").asc, col("event_id").asc)
    ev.withColumn("p_ts", lag(col("ts_usl"), 1).over(w))
      .withColumn("p_id", lag(col("event_id"), 1).over(w))
      .withColumn("n_ts", lead(col("ts_usl"), 1).over(w))
      .withColumn("n_id", lead(col("event_id"), 1).over(w))
      .filter(col("event_type") === "purchase")
      .filter(col("p_id").isNotNull || col("n_id").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts_usl"),
        when(col("n_id").isNull ||
          (col("p_id").isNotNull &&
            (col("ts_usl") - col("p_ts")) <= (col("n_ts") - col("ts_usl"))), col("p_id"))
          .otherwise(col("n_id")).as("matched_id"),
        when(col("n_id").isNull ||
          (col("p_id").isNotNull &&
            (col("ts_usl") - col("p_ts")) <= (col("n_ts") - col("ts_usl"))),
          col("p_ts") - col("ts_usl"))
          .otherwise(col("n_ts") - col("ts_usl")).as("gap_us"))
      .select(col("user_id"), col("event_id"), col("matched_id"), col("gap_us"))
      .orderBy("user_id", "event_id")
  }

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): zero
    * discounts become NULL keys via NULLIF, and the null-safe comparator
    * keeps the NULL group matched where a plain equi-join would silently
    * drop it — the canonical "join on a nullable dimension" semantics.
    * Both sides are pre-aggregated to key-unique rows, so the join is a
    * tiny broadcast regardless of lineitem size. NULLS FIRST is pinned
    * explicitly (Spark and DuckDB default opposite null orders).
    */
  def q_join_null_safe(spark: SparkSession, sf: String): DataFrame = {
    def byDisc(df: DataFrame, n: String): DataFrame = df
      .select(expr("nullif(CAST(ROUND(l_discount*100) AS BIGINT), 0)").as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as(n))
    val all = byDisc(Tables.lineitem(spark, sf), "n_all")
    val heavy = byDisc(Tables.lineitem(spark, sf).filter(col("l_quantity") > 25), "n_heavy")
    all.as("l").join(heavy.as("r"), col("l.d") <=> col("r.d"))
      .select(col("l.d").as("disc_pct"), col("n_all"), col("n_heavy"))
      .orderBy(asc_nulls_first("disc_pct"))
  }
}
