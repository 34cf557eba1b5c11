package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Sketches
import graft.ops.TextPipeline

/** Accuracy/soundness invariants of the deterministic sketches
  * (SURVEY.md §2.20). The oracle proves cross-engine equality; these prove
  * the sketches are also *good* sketches.
  */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import TestSpark.sf

  test("hll: estimate within 15% of true cardinality (256 buckets ≈ 6.5% σ)") {
    Sketches.q_hll_estimate(spark, sf).collect().foreach { r =>
      val truth = r.getAs[Long]("n_true").toDouble
      val est = r.getAs[Double]("est_r2")
      assert(math.abs(est - truth) / truth < 0.15,
        s"${r.getAs[String]("col_name")}: est $est vs true $truth")
    }
  }

  test("cms: never undercounts, and most cells are exact at this load factor") {
    val rows = Sketches.q_cms_topk(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_c") >= r.getAs[Long]("true_c"),
        "count-min never undercounts")
    }
  }

  test("bloom: zero false negatives, false-positive rate sane") {
    val cells = Sketches.q_bloom_filter(spark, sf).collect()
      .map(r => (r.getAs[Long]("actually_present"), r.getAs[Long]("bloom_positive")) ->
        r.getAs[Long]("n")).toMap
    assert(!cells.contains((1L, 0L)), "a Bloom filter cannot have false negatives")
    // every present key must appear as a true positive
    assert(cells.getOrElse((1L, 1L), 0L) > 0)
    // with m=4096, k=3 and n ≤ m/3 keys the FP rate stays well under 50%
    val tn = cells.getOrElse((0L, 0L), 0L)
    val fp = cells.getOrElse((0L, 1L), 0L)
    if (tn + fp > 0) assert(fp.toDouble / (tn + fp) < 0.5)
  }

  test("repetition filter: fractions bounded, dup >= top implies consistency") {
    val rows = TextPipeline.q_repetition_filter(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val top = r.getAs[Long]("top_bigram_frac_e6")
      val dup = r.getAs[Long]("dup_bigram_frac_e6")
      assert(top >= 0 && top <= 1000000)
      assert(dup >= 0 && dup <= 1000000)
      // the top bigram is part of the duplicated mass whenever it repeats
      if (dup > 0) assert(dup >= top)
      val keep = r.getAs[Long]("keep")
      assert(keep === (if (top < 100000 && dup < 150000) 1L else 0L))
    }
    // the fixture must exercise both branches or the filter is untested
    assert(rows.exists(_.getAs[Long]("keep") == 0L))
    assert(rows.exists(_.getAs[Long]("keep") == 1L))
  }

  test("ams f2: median of the 8 estimators within 3x of exact F2") {
    val rows = Sketches.q_ams_f2(spark, sf).collect()
    assert(rows.length === 8)
    val exact = rows.head.getAs[Long]("f2_exact")
    val med = rows.map(_.getAs[Long]("f2_est")).sorted.apply(4)
    assert(med > exact / 3 && med < exact * 3,
      s"median estimator $med vs exact $exact")
  }

  test("kmv: estimate within 40% of the exact distinct count (k=64 ⇒ ~12.5% σ)") {
    val rows = Sketches.q_kmv_distinct(spark, sf).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      val est = r.getAs[Long]("kmv_estimate")
      val exact = r.getAs[Long]("exact_distinct")
      if (r.getAs[Long]("k_size") == 64L)  // sketch saturated → estimator valid
        assert(math.abs(est - exact).toDouble / exact < 0.4,
          s"${r.getAs[String]("column_name")}: est $est vs exact $exact")
      else assert(est >= 1L)
    }
  }
}
