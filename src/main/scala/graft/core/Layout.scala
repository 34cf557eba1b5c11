package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for the 100 TB posture: bucketing for
  * co-located (shuffle-free) joins, and deterministic salting for skewed
  * keys. Correctness is layout-independent — these only change the plan.
  */
object Layout {

  /** Persist a DataFrame as a bucketed+sorted table. A subsequent equi-join
    * of two tables bucketed on the same key with the same bucket count
    * needs NO Exchange on either side (asserted in LayoutSpec) — at fleet
    * scale this removes the dominant shuffle of repeated fact-fact joins.
    */
  def saveBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Deterministic salted join for skewed equi-keys (no rand(): the salt
    * derives from a stable secondary column so plans stay replayable).
    * The left (skewed, large) side splits each hot key across `salts`
    * partitions; the right side replicates each row `salts` times. Result
    * set is identical to a plain equi-join — only the shuffle layout
    * changes. AQE's skew-join split is the runtime alternative; explicit
    * salting is the plan-level one for known-hot keys.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltSource: Column, salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    val saltedRight = right
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }
}
