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
}
