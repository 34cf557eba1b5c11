package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface beyond the fixture parquet (SURVEY.md §2.1): the
  * reference class consumes delimited text and emits text part-files; the
  * engine exposes the same formats through Spark's datasource API with
  * schemas supplied explicitly (no inference job at scale).
  *
  * Scale posture: every reader returns a lazily-planned DataFrame over
  * splittable files; sinks support partitioning columns so downstream
  * scans get partition pruning.
  */
object Sources {

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema) // explicit schema: no inference pass over 100 TB
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .csv(path)

  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
}
