package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The engine's user-facing function surface (SURVEY.md §2.13): Column
  * wrappers for the native codegen expressions, a registered scalar UDF,
  * and a typed Aggregator UDAF. The oracle queries need none of these
  * (they are pure builtins); this is the extension surface a user of the
  * engine programs against.
  */
object GraftFunctions {

  import org.apache.spark.sql.graftbridge.Bridge

  /** Column API over the native integer dot product expression. */
  def dotLong(a: Column, b: Column): Column =
    Bridge.column(DotProductLong(Bridge.expression(a), Bridge.expression(b)))

  /** Column API over the native integer squared distance expression. */
  def dist2Long(a: Column, b: Column): Column =
    Bridge.column(SquaredDistanceLong(Bridge.expression(a), Bridge.expression(b)))

  /** Column API over the sorted-postings sparse dot product expression. */
  def postingsDot(a: Column, b: Column): Column =
    Bridge.column(PostingsDotLong(Bridge.expression(a), Bridge.expression(b)))

  /** Column API over the one-pass MinHash sketch aggregate (K=8 affine
    * minima of the shared 32-bit token hash in one buffer — no 8× row
    * expansion).
    */
  def minHash(tokenHash: Column): Column =
    Bridge.column(MinHashAgg(Bridge.expression(tokenHash)).toAggregateExpression())

  /** Column API over the one-pass element-wise `array<bigint>` sum
    * aggregate (the keyed centroid/vector-sum shape — one buffer per
    * group, map-side combine, no per-dimension row fan-out).
    */
  def vecSum(vec: Column): Column =
    Bridge.column(VecSumLongAgg(Bridge.expression(vec)).toAggregateExpression())

  /** Registers SQL-callable functions on the session:
    * `graft_tokenize(text)`, `graft_dot(a,b)`, `graft_dist2(a,b)`,
    * `graft_cosine_centroid(arr)`, `graft_minhash(h)`, `graft_vec_sum(arr)`.
    */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_tokenize", (s: String) =>
      Option(s).map(_.toLowerCase.replaceAll("[^a-z ]", " ").trim
        .split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProductLong(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dist2", exprs => SquaredDistanceLong(exprs(0), exprs(1)), "built-in")
    spark.udf.register("graft_cosine_centroid", udaf(CentroidAggregator))
    // the analyzer wraps a bare AggregateFunction into its
    // AggregateExpression — the builder returns the function itself
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", exprs => MinHashAgg(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vec_sum", exprs => VecSumLongAgg(exprs(0)), "built-in")
  }

  /** Typed UDAF: element-wise mean of float-array embeddings (the exact
    * centroid of a cluster) via a single-pass sum+count buffer — the
    * partial/merge shape MapReduce combiners approximate.
    */
  object CentroidAggregator extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {
    override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)
    override def reduce(b: (Array[Double], Long), a: Seq[Float]): (Array[Double], Long) = {
      val sums = if (b._1.isEmpty) new Array[Double](a.length) else b._1
      var i = 0
      while (i < a.length) { sums(i) += a(i); i += 1 }
      (sums, b._2 + 1)
    }
    override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
      if (x._1.isEmpty) y
      else if (y._1.isEmpty) x
      else {
        var i = 0
        while (i < x._1.length) { x._1(i) += y._1(i); i += 1 }
        (x._1, x._2 + y._2)
      }
    }
    override def finish(r: (Array[Double], Long)): Seq[Double] =
      if (r._2 == 0) Seq.empty else r._1.map(_ / r._2).toSeq
    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }
}
