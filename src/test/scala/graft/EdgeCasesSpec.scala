package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.Det

/** Edge cases the fixtures cannot exercise (they have zero nulls and no
  * planted ties): null join keys, null-vs-empty aggregation, top-k tie
  * stability, cents rounding at boundaries.
  */
class EdgeCasesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("null join keys never match (inner, semi, anti)") {
    import spark.implicits._
    val a = Seq((Some(1L), "a1"), (None, "a2")).toDF("k", "va")
    val b = Seq((Some(1L), "b1"), (None, "b2")).toDF("k", "vb")
    assert(a.join(b, a("k") === b("k")).count() === 1)            // null ≠ null
    assert(a.join(b, a("k") === b("k"), "left_semi").count() === 1)
    assert(a.join(b, a("k") === b("k"), "left_anti").count() === 1) // the null row survives anti
    // null-safe equality is the opt-in
    assert(a.join(b, a("k") <=> b("k")).count() === 2)
  }

  test("aggregates on empty input vs all-null input") {
    import spark.implicits._
    val empty = Seq.empty[(String, Option[Double])].toDF("g", "v")
    assert(empty.agg(sum("v")).head().isNullAt(0))
    assert(empty.agg(count(lit(1))).head().getLong(0) === 0L)
    val nulls = Seq(("a", None: Option[Double]), ("a", None)).toDF("g", "v")
    val r = nulls.groupBy("g").agg(sum("v").as("s"), count(col("v")).as("c")).head()
    assert(r.isNullAt(1) && r.getLong(2) === 0L) // SUM all-null = NULL, COUNT(col) = 0
  }

  test("top-k with exact ties is stable under the id tie-breaker") {
    import spark.implicits._
    val df = Seq((1L, 100L), (2L, 100L), (3L, 100L), (4L, 99L))
      .toDF("id", "score")
    val top2 = df.orderBy(col("score").desc, col("id").asc).limit(2)
      .collect().map(_.getLong(0)).toSeq
    assert(top2 === Seq(1L, 2L)) // deterministic despite 3-way score tie
  }

  test("cents conversion handles FP representation noise and negatives") {
    import spark.implicits._
    val vals = Seq(19.99, 0.01, -5.07, 123456.78, 0.0).toDF("v")
    val got = vals.select(Det.cents(col("v"))).collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1999L, 1L, -507L, 12345678L, 0L))
  }

  test("rank vs row_number diverge exactly on ties") {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("score").desc)
    val df = Seq(("a", 10), ("b", 10), ("c", 9)).toDF("id", "score")
      .withColumn("rnk", rank().over(w))
      .withColumn("rn", row_number().over(w))
      .collect().map(r => (r.getString(0), r.getInt(2), r.getInt(3)))
    assert(df.count(x => x._2 == 1) === 2) // rank: both tied rows are 1
    assert(df.map(_._3).sorted.toSeq === Seq(1, 2, 3)) // row_number: unique
  }

  test("window lag over a single-row partition yields null delta") {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy("t")
    val df = Seq((1L, 10L), (2L, 20L), (2L, 30L)).toDF("u", "t")
      .withColumn("prev", lag(col("t"), 1).over(w))
    val u1 = df.filter(col("u") === 1).head()
    assert(u1.isNullAt(2))
  }
}
