package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.{Layout, Tables}

/** Physical layout: bucketed co-located joins and salted skew joins. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import TestSpark.sf

  test("bucketed tables join without an Exchange on either side") {
    Layout.saveBucketed(Tables.orders(spark, sf), "orders_b", "o_orderkey", 4)
    Layout.saveBucketed(
      Tables.lineitem(spark, sf).withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", "o_orderkey", 4)
    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"), "o_orderkey")
      .groupBy("o_orderkey").count()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    // and it computes the same thing as the plain join
    val plain = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey").count()
    assert(joined.orderBy("o_orderkey").collect().toSeq ===
      plain.orderBy("o_orderkey").collect().toSeq)
  }

  test("partitioned sink produces partition-pruned scans") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    graft.sources.Sources.writeParquet(
      Tables.lineitem(spark, sf), dir, partitionBy = Seq("l_returnflag"))
    val pruned = spark.read.parquet(dir).filter(col("l_returnflag") === "A")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("l_returnflag"), s"no partition pruning in:\n$plan")
    // the pruned scan reads exactly the A partition
    val expected = Tables.lineitem(spark, sf).filter(col("l_returnflag") === "A").count()
    assert(pruned.count() === expected)
  }

  test("salted join returns exactly the plain join's result") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey", "l_quantity")
    val orders = Tables.orders(spark, sf).select(
      col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(orders, "l_orderkey")
      .groupBy("o_orderpriority").agg(sum(col("l_quantity").cast("long")).as("q"))
    val salted = Layout.saltedJoin(li, orders, "l_orderkey",
      saltSource = col("l_partkey"), salts = 8)
      .groupBy("o_orderpriority").agg(sum(col("l_quantity").cast("long")).as("q"))
    assert(salted.orderBy("o_orderpriority").collect().toSeq ===
      plain.orderBy("o_orderpriority").collect().toSeq)
  }

  test("query registry has no silent key collisions (Map keeps last wins)") {
    // a duplicate key in the SparkEntry.queries literal silently shadows the
    // earlier operator (it has happened twice); parse the source and fail loudly
    import scala.jdk.CollectionConverters._
    val src = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala")).asScala
        .mkString("\n")
    val body = src.substring(src.indexOf("def queries"),
      src.indexOf("def oracleSql"))
    val keys = "\"(q_[a-z0-9_]+)\"\\s*->".r.findAllMatchIn(body)
      .map(_.group(1)).toSeq
    val dups = keys.groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    assert(dups.isEmpty, s"duplicate registry keys shadow operators: $dups")
    assert(keys.size == SparkEntry.queries.size,
      s"registry literal has ${keys.size} entries but the Map kept " +
        s"${SparkEntry.queries.size}")
  }
}
