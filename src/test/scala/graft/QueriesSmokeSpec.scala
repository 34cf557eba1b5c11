package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query runs at sf0.001 and is deterministic: two
  * executions produce identical row sequences (guards the D1 total-order
  * contract without needing the DuckDB oracle in-JVM).
  */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import TestSpark.sf

  test("entry returns rows at smoke scale") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  private val capabilityOnly = Set("q_approx_distinct")

  test("every query has an oracle or is explicitly capability-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- capabilityOnly
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty,
      "oracle SQL for undeclared queries")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and is deterministic at sf0.001") {
      val a = fn(spark, sf).collect().map(_.toString).toSeq
      val b = fn(spark, sf).collect().map(_.toString).toSeq
      assert(a === b, s"$name not deterministic")
    }
  }
}
