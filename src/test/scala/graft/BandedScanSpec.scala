package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.BandedScan

/** Unit spec for the shared [[BandedScan]] primitive (~17 query call
  * sites): inclusive cumulative sums vs a brute-force theta-join oracle
  * on deterministic pseudo-random lattices, covering negative values,
  * grouped variants, multi-measure scans, every recursion depth, and the
  * auto-bandWidth path. Also pins the plan shape: no empty-partitionSpec
  * window at any depth.
  */
class BandedScanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Deterministic lattice: distinct (g, v) rows with arbitrary-ish
    * measures; v from a hash so values are sparse and unordered, and the
    * negative half of the domain is exercised.
    */
  private def lattice(n: Int, groups: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val g = i % groups
      val v = ((i * 2654435761L) % 10007L) - 5003L // sparse, signed
      val x = (i * 37L) % 101L - 50L               // signed measures too
      val y = (i * 17L) % 11L
      (g.toLong, v, x, y)
    }.distinct.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq // unique (g,v)
      .toDF("g", "v", "x", "y")
  }

  private def bruteCum(df: DataFrame, grouped: Boolean): DataFrame = {
    val a = df.as("a")
    val b = df.select(col("g").as("bg"), col("v").as("bv"),
      col("x").as("bx"), col("y").as("by")).as("b")
    val cond = if (grouped) col("a.g") === col("bg") && col("bv") <= col("a.v")
               else col("bv") <= col("a.v")
    a.join(b, cond)
      .groupBy(col("a.g").as("g"), col("a.v").as("v"))
      .agg(sum(col("bx")).as("cx_expect"), sum(col("by")).as("cy_expect"))
  }

  private def assertMatches(actual: DataFrame, expected: DataFrame,
                            cols: Seq[(String, String)]): Unit = {
    val j = actual.join(expected, Seq("g", "v"))
    val bad = cols.map { case (a, e) =>
      sum(when(col(a) === col(e), 0L).otherwise(1L))
    }.reduce(_ + _)
    assert(j.agg(bad.as("bad")).head().getLong(0) === 0L,
      "banded cum sums diverge from brute-force oracle")
    assert(actual.count() === expected.count())
  }

  test("ungrouped cumSum matches brute force incl. negative values") {
    val df = lattice(400, 1).localCheckpoint()
    for (bw <- Seq(1L, 7L, 64L, 100000000L)) {
      val got = BandedScan.cumSum(df, Seq.empty, "v", "x", "cx", bandWidth = bw)
      assertMatches(got, bruteCum(df, grouped = false), Seq("cx" -> "cx_expect"))
    }
  }

  test("grouped multi-measure cumSums match brute force") {
    val df = lattice(600, 5).localCheckpoint()
    for (bw <- Seq(3L, 32L, 1024L)) {
      val got = BandedScan.cumSums(df, Seq("g"), "v",
        Seq("x" -> "cx", "y" -> "cy"), bandWidth = bw)
      assertMatches(got, bruteCum(df, grouped = true),
        Seq("cx" -> "cx_expect", "cy" -> "cy_expect"))
    }
  }

  test("every recursion depth gives identical results") {
    val df = lattice(500, 3).localCheckpoint()
    val expected = bruteCum(df, grouped = true)
    for (depth <- 1 to 4) {
      val got = BandedScan.cumSums(df, Seq("g"), "v", Seq("x" -> "cx"),
        bandWidth = 8L, maxDepth = depth)
      assertMatches(got, expected, Seq("cx" -> "cx_expect"))
    }
  }

  test("auto bandWidth matches brute force and stays multi-band") {
    val df = lattice(500, 1).localCheckpoint()
    val got = BandedScan.cumSumAuto(df, Seq.empty, "v", "x", "cx")
    assertMatches(got, bruteCum(df, grouped = false), Seq("cx" -> "cx_expect"))
  }

  test("groups whose first band differs stay independent") {
    import spark.implicits._
    // group 0 lives in bands ~[0..], group 1 entirely in negative bands
    val df = Seq((0L, 10L, 1L), (0L, 300L, 2L), (0L, 900L, 4L),
      (1L, -900L, 8L), (1L, -300L, 16L), (1L, -10L, 32L))
      .toDF("g", "v", "x").localCheckpoint()
    val got = BandedScan.cumSum(df, Seq("g"), "v", "x", "cx", bandWidth = 256L)
      .select("g", "v", "cx").orderBy("g", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((0L, 10L, 1L), (0L, 300L, 3L), (0L, 900L, 7L),
      (1L, -900L, 8L), (1L, -300L, 24L), (1L, -10L, 56L)))
  }

  test("strict-variant contract: inclusive minus own measure") {
    val df = lattice(100, 1).localCheckpoint()
    val strict = BandedScan.cumSum(df, Seq.empty, "v", "x", "ci", 16L)
      .withColumn("cs", col("ci") - col("x"))
    // strict cum of the minimum value is 0
    val mn = strict.orderBy("v").limit(1).select("cs").head().getLong(0)
    assert(mn === 0L)
  }

  test("non-integral vCol fails fast with a clear message") {
    import spark.implicits._
    val df = Seq((1.5, 1L)).toDF("v", "x")
    val e = intercept[IllegalArgumentException](
      BandedScan.cumSum(df, Seq.empty, "v", "x", "c"))
    assert(e.getMessage.contains("must be integral"))
  }

  test("no empty-partitionSpec window at any depth") {
    val df = lattice(300, 2).localCheckpoint()
    val plan = BandedScan.cumSums(df, Seq("g"), "v", Seq("x" -> "cx"),
      bandWidth = 4L, maxDepth = 3).queryExecution.optimizedPlan
    val bare = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    assert(bare.isEmpty, "found a global (unkeyed) window in the banded scan")
  }
}
