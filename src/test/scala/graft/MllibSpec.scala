package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.MllibTwins
import graft.ops.MLDeterministic

/** MLlib twins: fixed-seed determinism, quality floors, and agreement
  * with the deterministic closed-form formulations.
  */
class MllibSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import TestSpark.sf

  test("logistic regression beats chance on the synthetic labels") {
    val (_, auc) = MllibTwins.logistic(spark, sf)
    assert(auc > 0.5, s"AUC $auc")
  }

  test("kmeans with a fixed seed is run-to-run deterministic") {
    val a = MllibTwins.kmeans(spark, sf).collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val b = MllibTwins.kmeans(spark, sf).collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    assert(a === b)
  }

  test("mllib linear regression agrees with the closed-form twin") {
    val (slope, intercept) = MllibTwins.linreg(spark, sf)
    val det = MLDeterministic.q_linreg_normal(spark, sf).head()
    assert(math.abs(slope - det.getAs[Double]("slope")) < 1.0)
    assert(math.abs(intercept - det.getAs[Double]("intercept")) < 100.0)
  }

  test("minhash-lsh near-dup recalls most exact jaccard pairs (J >= 0.8)") {
    val exact = graft.ops.Text.q_neardup_jaccard(spark, sf)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    if (exact.nonEmpty) {
      val approx = MllibTwins.minhashNeardup(spark, sf, threshold = 0.8)
        .select(col("d1"), col("d2")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = exact.count(approx.contains).toDouble / exact.size
      assert(recall >= 0.9, s"recall $recall over ${exact.size} exact pairs")
    }
  }

  test("random-projection ANN returns k neighbors with sane distances") {
    val rows = MllibTwins.annNeighbors(spark, sf, queryVecId = 0L, k = 5).collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getAs[Double]("distCol") >= 0.0))
  }

  test("naive bayes twin predicts a label for every document") {
    val rows = MllibTwins.naiveBayes(spark, sf).collect()
    assert(rows.length === 500)
    assert(rows.forall(r => r.getAs[Double]("prediction") >= 0.0))
  }
}
