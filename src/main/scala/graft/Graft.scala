package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Public facade — the one-stop entry point for library users.
  *
  * {{{
  * val spark = Graft.session()                    // configured local session
  * val li    = Graft.table(spark, dataDir, "lineitem")
  * val top   = Graft.query("q_topk_customers")(spark, dataDir)
  * }}}
  *
  * Programmatic users can also take any existing session and call
  * [[attach]] to install the read confs and the graft function surface
  * (`graft_dot`, `graft_dist2`, `graft_tokenize`, `graft_cosine_centroid`).
  */
object Graft {

  /** A session configured the way the engine expects: UTC, AQE on,
    * nanos-timestamp reads enabled, graft functions registered.
    * `shufflePartitions` should be ≈ total cores on the cluster (set to
    * explicit values in tests/bench; leave default 200 on real clusters
    * only if AQE coalescing is on — it is by default).
    */
  def session(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .getOrCreate()
    attach(s)
    s
  }

  /** Install graft's read confs + function surface on a live session. */
  def attach(spark: SparkSession): Unit = {
    core.Tables.prepare(spark)
    functions.GraftFunctions.register(spark)
  }

  /** Load one of the engine's tables from a data directory. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") core.Tables.eventsWithTs(spark, dir)
    else core.Tables.table(spark, dir, name)

  /** Look up a declared operator by its SURVEY.md §2 key. */
  def query(name: String): (SparkSession, String) => DataFrame =
    SparkEntry.queries(name)

  /** All declared operator keys. */
  def queryNames: Seq[String] = SparkEntry.queries.keys.toSeq.sorted

  /** Register all fixture tables as temp views for the SQL entry path. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      core.Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }
}
