package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops._

/** Semantics + plan-shape tests for the relational operator surface. */
class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import TestSpark.sf

  test("pricing summary groups are exhaustive and exact") {
    val rows = Relational.q_agg_pricing_summary(spark, sf).collect()
    assert(rows.length === 6) // 3 returnflags × 2 linestatuses
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    assert(total === 6000L)
  }

  test("left outer join preserves line-less orders as zero counts") {
    val df = Joins.q_join_left_outer(spark, sf)
    val zeroes = df.filter(col("n_lines") === 0).count()
    val anti = Joins.q_join_anti(spark, sf).count()
    assert(zeroes === anti) // outer-join zeros ≡ anti-join rows
    assert(anti > 0)        // fixture plants dangling orders
  }

  test("semi ∪ anti partitions orders exactly when filter is non-selective") {
    val orders = graft.core.Tables.orders(spark, sf).count()
    val semiAll = graft.core.Tables.orders(spark, sf)
      .join(graft.core.Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"), "left_semi").count()
    val anti = Joins.q_join_anti(spark, sf).count()
    assert(semiAll + anti === orders)
  }

  test("set union counts decompose into intersect and except") {
    val inter = Relational.q_set_intersect(spark, sf).count()
    val exc = Relational.q_set_except(spark, sf).count()
    val union = Relational.q_set_union(spark, sf)
    val n2 = union.filter(col("n") === 2).count()
    assert(n2 === inter)
    val only96 = union.filter(col("n") === 1).count()
    assert(only96 >= exc) // n=1 rows = except-1996 + except-1997
  }

  test("rollup emits per-group, per-flag, and grand-total levels") {
    val df = Relational.q_agg_rollup(spark, sf).collect()
    assert(df.count(_.getAs[Long]("gid") == 3L) === 1) // grand total
    val grand = df.find(_.getAs[Long]("gid") == 3L).get.getAs[Long]("rev_e4")
    val leaves = df.filter(_.getAs[Long]("gid") == 0L).map(_.getAs[Long]("rev_e4")).sum
    assert(grand === leaves)
  }

  test("plan shape: pruned scan pushes filter and reads 2 columns") {
    val plan = Relational.q_scan_pruned(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"),
      s"missing pushdown in:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"))
  }

  test("plan shape: dim join broadcasts, top-k uses TakeOrderedAndProject") {
    val joinPlan = Joins.q_join_broadcast(spark, sf).queryExecution.executedPlan.toString
    assert(joinPlan.contains("BroadcastHashJoin"), joinPlan)
    val topkPlan = Relational.q_topk_customers(spark, sf).queryExecution.executedPlan.toString
    assert(topkPlan.contains("TakeOrderedAndProject"), topkPlan)
  }

  test("plan shape: aggregation is two-phase (partial + final)") {
    val plan = Relational.q_agg_pricing_summary(spark, sf).queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("cents-sum is invariant under repartitioning (associativity)") {
    val li = graft.core.Tables.lineitem(spark, sf)
    val sums = Seq(1, 2, 8).map { p =>
      li.repartition(p)
        .agg(sum(graft.core.Det.cents(col("l_extendedprice")))).head().getLong(0)
    }
    assert(sums.distinct.length === 1)
  }

  test("null-safe join keeps the NULL discount group; heavy is a subset") {
    val rows = graft.ops.Joins.q_join_null_safe(spark, sf).collect()
    assert(rows.head.isNullAt(rows.head.fieldIndex("disc_pct"))) // nulls first
    assert(rows.forall(r => r.getAs[Long]("n_heavy") <= r.getAs[Long]("n_all")))
  }

  test("union-by-name: branch columns never bleed across years") {
    val rows = graft.ops.Relational.q_union_by_name(spark, sf).collect()
    assert(rows.length === 2)
    val y96 = rows.find(_.getAs[Long]("yr") == 1996L).get
    val y97 = rows.find(_.getAs[Long]("yr") == 1997L).get
    assert(y96.getAs[Long]("rows_with_orders") === y96.getAs[Long]("n_rows"))
    assert(y96.getAs[Long]("rows_with_rev") === 0L)
    assert(y97.getAs[Long]("rows_with_rev") === y97.getAs[Long]("n_rows"))
    assert(y97.getAs[Long]("rows_with_orders") === 0L)
  }

  test("eval f1: per-class support equals tp + fn and metrics bounded") {
    val rows = graft.ops.MLDeterministic.q_eval_f1(spark, sf).collect()
    val support = graft.core.Tables.documents(spark, sf)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    rows.foreach { r =>
      val c = r.getAs[String]("class")
      assert(r.getAs[Long]("tp") + r.getAs[Long]("fn") === support(c))
      val f1 = r.getAs[Long]("f1_e4")
      assert(f1 >= -1L && f1 <= 10000L)
    }
  }

  test("target encoding: shrinkage keeps enc between brand mean and global mean") {
    val rows = graft.ops.MLDeterministic.q_target_encoding(spark, sf).collect()
    rows.foreach { r =>
      val brandMean = r.getAs[Long]("s").toDouble / r.getAs[Long]("n")
      val g = r.getAs[Long]("global_mean_cents").toDouble
      val enc = r.getAs[Long]("enc_cents").toDouble
      val (lo, hi) = (math.min(brandMean, g), math.max(brandMean, g))
      assert(enc >= lo - 1 && enc <= hi + 1, s"${r.getAs[String]("p_brand")}: $enc not in [$lo,$hi]")
    }
  }

  test("pca power: loadings normalized to max |1e6| and rayleigh positive") {
    val rows = graft.ops.Vectors.q_pca_power(spark, sf).collect()
    assert(rows.length === 8)
    assert(rows.map(r => math.abs(r.getAs[Long]("loading_e6"))).max === 1000000L)
    assert(rows.forall(_.getAs[Double]("rayleigh") > 0.0))
  }
}
