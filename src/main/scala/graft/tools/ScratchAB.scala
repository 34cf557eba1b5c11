package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only A/B scratch harness (deleted or repurposed freely between
  * rounds; not part of the driver contract): times the round-8 verbatim
  * ROUGE pair pipeline against the current rep-collapsed one at a given
  * SF, in one JVM, warm (second run timed).
  *
  * Usage: runMain graft.tools.ScratchAB <sfDir>
  */
object ScratchAB {
  private def toks(c: org.apache.spark.sql.Column) =
    split(lower(c), "\\s+")

  def rougeTwin(spark: SparkSession, sf: String): DataFrame = {
    val dsrc = graft.core.Tables.documents(spark, sf)
    def gramCounts(n: Int): DataFrame = {
      val base = dsrc.select(col("doc_id"), col("lang"), col("source"),
        toks(col("text")).as("tk"))
      val grams =
        if (n == 1) base.select(col("doc_id"), col("lang"), col("source"),
          explode(col("tk")).as("g"))
        else base.select(col("doc_id"), col("lang"), col("source"),
          explode(expr("transform(sequence(1, size(tk) - 1), " +
            "i -> concat(tk[i - 1], ' ', tk[i]))")).as("g"))
      grams.groupBy(col("doc_id"), col("lang"), col("source"), col("g"))
        .agg(count(lit(1)).as("c"))
    }
    val docs = dsrc
      .select(col("doc_id"), col("lang"), col("source"),
        size(toks(col("text"))).cast("long").as("len"))
      .localCheckpoint()
    val pairs = docs.as("a")
      .join(docs.select(col("lang"), col("source"), col("doc_id").as("d2"),
        col("len").as("len2")).as("b"), Seq("lang", "source"))
      .filter(col("doc_id") < col("d2"))
      .select(col("lang"), col("source"), col("doc_id"), col("d2"), col("len"))
    def overlap(n: Int, out: String): DataFrame = {
      val g = gramCounts(n)
      g.as("a")
        .join(g.select(col("lang"), col("source"), col("doc_id").as("d2"),
          col("g"), col("c").as("c2")).as("b"),
          Seq("lang", "source", "g"))
        .filter(col("doc_id") < col("d2"))
        .groupBy(col("lang"), col("source"), col("doc_id"), col("d2"))
        .agg(sum(least(col("c"), col("c2"))).as(out))
    }
    pairs
      .join(overlap(1, "ov1"), Seq("lang", "source", "doc_id", "d2"), "left_outer")
      .join(overlap(2, "ov2"), Seq("lang", "source", "doc_id", "d2"), "left_outer")
      .select(col("lang"), col("source"),
        round(coalesce(col("ov1"), lit(0L)).cast("double") /
          col("len").cast("double") * lit(1e6)).cast("long").as("r1_e6"),
        round(coalesce(col("ov2"), lit(0L)).cast("double") /
          (col("len") - 1L).cast("double") * lit(1e6)).cast("long").as("r2_e6"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_pairs"),
        (round(sum(col("r1_e6")).cast("double") /
          (count(lit(1)).cast("double") * lit(1e6)), 4) + lit(0.0))
          .as("mean_rouge1"),
        (round(sum(col("r2_e6")).cast("double") /
          (count(lit(1)).cast("double") * lit(1e6)), 4) + lit(0.0))
          .as("mean_rouge2"))
      .orderBy("lang", "source")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Tables.region(spark, sfDir).groupBy("r_name").count().count()
    def time(tag: String)(f: => Long): Unit = {
      f // cold
      val t0 = System.nanoTime(); val n = f
      println(f"$tag: warm=${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    time("r8-verbatim rouge")(rougeTwin(spark, sfDir).count())
    time("current rouge")(
      graft.SparkEntry.queries("q_rouge_recall")(spark, sfDir).count())
    spark.stop()
  }
}
