package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev utility: per-JOB wall-time breakdown for the named queries — the
  * local-mode substitute for the Spark UI's job/stage pages (guide §1/§7;
  * the UI is disabled in driver runs). For each query it runs the plan
  * twice (cold, then warm — codegen and scan caches primed) and prints
  * every Spark job the warm run launched, with its duration, stage count
  * and task count, so a flat-cost query's overhead can be attributed to
  * eager materializations (localCheckpoint jobs), driver-side sizing
  * actions, and the final action. Not part of the driver contract.
  *
  * Usage: runMain graft.tools.Profile <sfDir> <queryName...>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Job(id: Int, desc: String, var ms: Long = -1,
                   var start: Long = 0, var stages: Int = 0)
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs(e.jobId) = Job(e.jobId, desc, start = e.time, stages = e.stageInfos.size)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(j => j.ms = e.time - j.start)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // warm the scan path once so the first profiled query is comparable
    graft.core.Tables.region(spark, sfDir).groupBy("r_name").count().count()

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // cold pass
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val cold = (System.nanoTime() - t0) / 1e9
      // warm pass, jobs recorded
      jobs.synchronized(jobs.clear())
      val t1 = System.nanoTime()
      fn(spark, sfDir).count()
      val warm = (System.nanoTime() - t1) / 1e9
      Thread.sleep(300) // let job-end events drain (listener bus is async)
      println(f"\n===== $name cold=$cold%.2fs warm=$warm%.2fs =====")
      jobs.synchronized {
        val js = jobs.values.toSeq
        val accounted = js.map(_.ms).filter(_ > 0).sum / 1e3
        js.foreach { j =>
          println(f"  job ${j.id}%4d ${j.ms}%6d ms  stages=${j.stages}%2d  ${j.desc.take(80)}")
        }
        println(f"  jobs=${js.size} accounted=$accounted%.2fs (gap to warm = driver/planning time)")
      }
    }
    spark.stop()
  }
}
