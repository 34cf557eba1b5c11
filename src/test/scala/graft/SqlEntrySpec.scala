package graft

import org.scalatest.funsuite.AnyFunSuite

/** E2 (SQL-string) entry path: the same queries expressed as Spark SQL
  * over temp views must produce exactly what the DataFrame (E1) path
  * produces — both lower into one Catalyst pipeline.
  */
class SqlEntrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import TestSpark.sf

  private def registerViews(): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem",
      "documents", "embeddings").foreach { t =>
      graft.core.Tables.table(spark, sf, t).createOrReplaceTempView(t)
    }

  private val parity: Map[String, String] = Map(
    "q_agg_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
             SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
             SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS sum_base_cents,
             SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS sum_disc_e4,
             COUNT(*) AS n_rows,
             ROUND(SUM(CAST(l_quantity AS BIGINT)) / COUNT(*), 4) AS avg_qty
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "q_join_broadcast" -> """
      SELECT p_brand,
             SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS rev_e4
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand ORDER BY p_brand""",
    "q_topk_customers" -> """
      SELECT o_custkey, SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS total_cents
      FROM orders GROUP BY o_custkey
      ORDER BY total_cents DESC, o_custkey LIMIT 10""",
    "q_join_anti" -> """
      SELECT o_orderkey FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
      ORDER BY o_orderkey""",
    "q_wordcount" -> """
      SELECT word, COUNT(*) AS n
      FROM (SELECT explode(split(lower(text), ' ')) AS word FROM documents)
      GROUP BY word ORDER BY n DESC, word LIMIT 50""")

  parity.foreach { case (key, sql) =>
    test(s"$key: SQL entry path matches the DataFrame path") {
      registerViews()
      val viaSql = spark.sql(sql).collect().map(_.toString).toSeq
      val viaDf = SparkEntry.queries(key)(spark, sf).collect().map(_.toString).toSeq
      assert(viaSql === viaDf)
    }
  }
}
