package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (JVM-forked once). */
object TestSpark {
  lazy val spark: SparkSession = {
    // keep the derby metastore + warehouse out of the repo working tree,
    // and give each test JVM a fresh warehouse (the derby catalog is
    // per-JVM, so a persistent location would collide on re-runs)
    System.setProperty("derby.system.home", "/tmp/graft_derby")
    val warehouse = java.nio.file.Files.createTempDirectory("graft_warehouse").toString
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.core.Tables.prepare(s)
    graft.functions.GraftFunctions.register(s)
    s
  }

  val sf: String = "/root/testdata/sf0.001"
}
