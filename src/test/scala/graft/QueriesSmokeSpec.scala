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

  test("no duplicate keys in the SparkEntry / OracleSql map literals") {
    // a Map literal silently keeps only the LAST binding for a repeated
    // key — a new query reusing an existing name would shadow the old
    // implementation with no compile error (it happened once)
    for (path <- Seq("src/main/scala/graft/SparkEntry.scala",
        "src/main/scala/graft/oracle/OracleSql.scala")) {
      // explicit UTF-8: the sources carry µ/× in Scaladoc and the test
      // JVM's platform default charset may be ASCII
      val src = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8)
      val keys = "\"(q_\\w+)\"\\s*->".r.findAllMatchIn(src)
        .map(_.group(1)).toSeq
      val dups = keys.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
      assert(dups.isEmpty, s"$path declares duplicate keys: ${dups.mkString(", ")}")
    }
  }

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
