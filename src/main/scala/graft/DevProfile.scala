package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan profiler: `runMain graft.DevProfile <key> [sfDir] [reps]`
  * prints the formatted physical plan of one SparkEntry query and times
  * `.count()` `reps` times (first = warm-up JIT/codegen, rest = steady
  * state). Never invoked by the driver; exists so a slow query can be
  * read and re-timed in isolation without editing Bench.
  */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(key)
    fn(spark, sfDir).explain("formatted")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[devprofile] $key rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
