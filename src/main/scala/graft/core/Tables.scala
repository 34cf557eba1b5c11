package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central table loader for the driver-generated parquet fixtures.
  *
  * All queries load tables through here so that session-level read
  * configuration is applied on every entry path (`Verify`, `Bench`,
  * tests each build their own SparkSession).
  *
  * Scale note: each table is a single parquet file at test scale, but the
  * loaders take any directory layout `spark.read.parquet` accepts — at
  * production scale the same paths would be partitioned directories and the
  * plans below (declarative DataFrame ops) pick up partition pruning and
  * split-parallel scans with no code change.
  */
object Tables {

  /** Read-time confs that must hold before touching the fixtures.
    *
    * `events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS) which Spark 4.x
    * refuses by default ([PARQUET_TYPE_ILLEGAL]); `nanosAsLong` reads it as
    * raw nanosecond longs, from which [[eventsWithTs]] derives a
    * microsecond-floored timestamp that matches DuckDB's own µs truncation
    * bit-for-bit. Safe to set on a live session (read-time conf).
    */
  def prepare(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    prepare(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(spark: SparkSession, sf: String): DataFrame   = table(spark, sf, "region")
  def nation(spark: SparkSession, sf: String): DataFrame   = table(spark, sf, "nation")
  def customer(spark: SparkSession, sf: String): DataFrame = table(spark, sf, "customer")
  def supplier(spark: SparkSession, sf: String): DataFrame = table(spark, sf, "supplier")
  def part(spark: SparkSession, sf: String): DataFrame     = table(spark, sf, "part")
  def orders(spark: SparkSession, sf: String): DataFrame   = table(spark, sf, "orders")
  def lineitem(spark: SparkSession, sf: String): DataFrame = table(spark, sf, "lineitem")
  def documents(spark: SparkSession, sf: String): DataFrame = table(spark, sf, "documents")
  def embeddings(spark: SparkSession, sf: String): DataFrame = table(spark, sf, "embeddings")

  /** `events` with a µs-precision `ts_us` timestamp and an exact `ts_usl`
    * µs long derived from the raw nanosecond long (see [[prepare]]).
    *
    * The ns→µs floor MUST be integer division (`div`): `col/1000` would go
    * through double, and 2024-epoch nanos (~1.7e18) exceed double's 2^53
    * exact-integer range — off-by-one µs that breaks the oracle compare.
    */
  def eventsWithTs(spark: SparkSession, sf: String): DataFrame =
    table(spark, sf, "events")
      .withColumn("ts_usl", expr("ts div 1000"))
      .withColumn("ts_us", timestamp_micros(col("ts_usl")))
}
