package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.core.Det.hash32

/** Probabilistic-sketch operators (SURVEY.md §2.20), each built ONLY from
  * the shared [[graft.core.Det.hash32]] primitive so the sketch contents —
  * not just their accuracy — are bit-identical on Spark and the DuckDB
  * oracle. That turns normally "approximate" structures into exact
  * hash-comparable queries: the estimate is deterministic given the hash.
  *
  * Scale notes: every sketch here is an algebraic aggregate (map-side
  * partial merge, one small reduce), which is the whole point of sketches
  * at 100 TB — the shuffled state is the sketch (≤ KBs), never the data.
  */
object Sketches {

  /** Deterministic HyperLogLog (p=8 → 256 buckets, 24-bit rank words)
    * cardinality estimates for lineitem part and supplier keys, next to
    * the exact COUNT(DISTINCT) for comparison. The harmonic-mean sum
    * Σ2^(−M_j) is carried ×2^25 as an EXACT integer (`s_scaled`) so
    * summation order cannot drift; the only floats are one fixed epilogue
    * expression and the standard small-range ln() correction, identical
    * trees on both engines.
    */
  def q_hll_estimate(spark: SparkSession, sf: String): DataFrame = {
    val li = Tables.lineitem(spark, sf)
    def side(c: String, name: String): DataFrame = {
      val buckets = li
        .select(hash32(col(c)).as("h"))
        .select(expr("h div 16777216").as("idx"), (col("h") % 16777216).as("w24"))
        .select(col("idx"),
          when(col("w24") === 0, lit(25))
            .otherwise(lit(25) - length(bin(col("w24")))).as("rank"))
        .groupBy("idx").agg(max(col("rank")).as("m"))
      val agg = buckets.agg(
        count(lit(1)).as("nb"),
        sum(expr("CAST(pow(2, 25 - m) AS BIGINT)")).as("ss"))
      val truth = li.agg(countDistinct(col(c)).as("n_true"))
      agg.crossJoin(truth)
        .select(
          lit(name).as("col_name"), col("n_true"),
          (lit(256) - col("nb")).cast("long").as("v_zero"),
          (col("ss") + (lit(256) - col("nb")) * lit(33554432L)).as("s_scaled"))
        .select(col("col_name"), col("n_true"), col("v_zero"), col("s_scaled"),
          expr(
            """ROUND(CASE
                 WHEN (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 33554432.0
                      / CAST(s_scaled AS DOUBLE) <= 640.0 AND v_zero > 0
                 THEN 256.0 * ln(256.0 / CAST(v_zero AS DOUBLE))
                 ELSE (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 * 33554432.0
                      / CAST(s_scaled AS DOUBLE)
               END, 2) + 0.0""").as("est_r2"))
    }
    side("l_partkey", "partkey").unionAll(side("l_suppkey", "suppkey"))
      .orderBy("col_name")
  }

  /** Count-min sketch (d=4 rows × w=64 buckets) over the document token
    * stream: per-token CMS estimate (min over the 4 hashed cells) next to
    * the true count. Estimates over-count by construction (`cms_c ≥
    * true_c` — the spec asserts it); with the fixed hash both engines
    * build byte-identical sketches. The sketch build is one groupBy of
    * 4·64 cells regardless of corpus size.
    */
  def q_cms_topk(spark: SparkSession, sf: String): DataFrame = {
    val tc = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("true_c"))
    val hashed = tc
      .select(col("term"), col("true_c"), explode(expr("sequence(0, 3)")).as("i"))
      .withColumn("b",
        hash32(concat(col("i").cast("string"), lit("|"), col("term"))) % 64)
    val sketch = hashed.groupBy("i", "b").agg(sum(col("true_c")).as("cell"))
    hashed.join(sketch, Seq("i", "b"))
      .groupBy("term")
      .agg(max(col("true_c")).as("true_c"), min(col("cell")).as("cms_c"))
      .orderBy("term")
  }

  /** Bloom-filter membership (k=3 hashes, m=4096 bits) of "customer has at
    * least one order": the filter is built from the distinct order custkeys
    * and probed with every customer; output is the 2×2 confusion summary.
    * False negatives are impossible (the spec asserts the FN cell is
    * empty); false positives are whatever the fixed hash produces —
    * identically on both engines. At scale this is THE pattern for
    * semi-join pushdown: ship the KB-sized bit set, not the key set.
    */
  def q_bloom_filter(spark: SparkSession, sf: String): DataFrame = {
    def bits(df: DataFrame, key: String): DataFrame =
      df.select(col(key).as("k"), explode(expr("sequence(0, 2)")).as("i"))
        .select(col("k"), col("i"),
          (hash32(concat(col("i").cast("string"), lit("|"), col("k").cast("string"))) % 4096)
            .as("bit"))
    val filterBits = bits(Tables.orders(spark, sf).select("o_custkey").distinct(), "o_custkey")
      .select("bit").distinct().withColumn("hit", lit(1))
    val present = Tables.orders(spark, sf).select(col("o_custkey").as("k")).distinct()
      .withColumn("present", lit(1))
    val probes = bits(Tables.customer(spark, sf), "c_custkey")
      .join(filterBits, Seq("bit"), "left_outer")
      .groupBy("k").agg(sum(coalesce(col("hit"), lit(0))).as("hits"))
      .join(present, Seq("k"), "left_outer")
    probes
      .select(
        coalesce(col("present"), lit(0)).cast("long").as("actually_present"),
        when(col("hits") === 3, 1L).otherwise(0L).as("bloom_positive"))
      .groupBy("actually_present", "bloom_positive")
      .agg(count(lit(1)).as("n"))
      .orderBy("actually_present", "bloom_positive")
  }
}
