package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass MinHash sketch as a low-level Catalyst aggregate
  * (`TypedImperativeAggregate`, SURVEY.md §2.13's "register-based
  * sketch" slot): given the shared 32-bit token hash (`Det.hash32`), it
  * maintains all K=8 affine minima — `min((2i+1)·h + 7919·i + 12345 mod
  * 1000000007)` — in a single flat long[8] buffer.
  *
  * Semantically identical to the `explode(sequence(0,7)) + groupBy +
  * min` formulation `q_dedup_minhash_lsh` hash-matches against DuckDB
  * (asserted by an equivalence test), but the input stream is NOT
  * expanded 8×: one pass, one aggregation buffer per group, partial
  * merges are element-wise minima — exactly the shape a 100 TB
  * signature build wants.
  */
case class MinHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val K = 8
  private val P = 1000000007L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"expected bigint, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Long] = Array.fill(K)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < K) {
        val cand = ((2L * i + 1L) * h + 7919L * i + 12345L) % P
        if (cand < buffer(i)) buffer(i) = cand
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < K) {
      if (other(i) < buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(K * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(K)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}
