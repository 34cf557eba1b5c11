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

/** Element-wise sum of `array<bigint>` columns as a single low-level
  * Catalyst aggregate (`TypedImperativeAggregate`): the buffer is one flat
  * long[] sized lazily from the first input row, `update` adds each
  * element in a primitive loop, and partial `merge` is element-wise
  * addition — so a grouped centroid/vector sum is ONE partial-aggregable
  * pass with map-side combine.
  *
  * This replaces the `posexplode → groupBy(key, dim) → sum →
  * collect_list` ladder (which fans every row out ×dims and pays TWO
  * aggregate exchanges) wherever a keyed element-wise vector sum is
  * needed — most importantly the per-iteration centroid recompute of
  * Lloyd's K-Means ([[graft.ops.MLDeterministic.q_kmeans_converged]]),
  * where it is the difference between shuffling N×dims rows per round
  * and shuffling k buffers. Exact integer addition — byte-identical to
  * the per-dimension `sum` it replaces. Inputs of differing lengths
  * within one group fail loudly (a silent truncation would corrupt the
  * centroid); a null ELEMENT fails loudly at runtime (per-dimension
  * `sum` would silently skip it — a corrupt embedding must not shift a
  * centroid unnoticed). Null ARRAYS are skipped like builtin `sum`
  * skips null scalars.
  */
case class VecSumLongAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // empty group / all-null input
  override def prettyName: String = "graft_vec_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected array<bigint>, got $other")
  }

  // length-0 buffer = "no input seen yet" sentinel; a real zero-length
  // array input is rejected in update (a 0-dim vector sum is meaningless
  // and would collide with the sentinel)
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    require(n > 0, "graft_vec_sum: zero-length array input")
    if (buffer.isEmpty) {
      val fresh = new Array[Long](n)
      var i = 0
      while (i < n) {
        require(!arr.isNullAt(i), s"graft_vec_sum: null element at index $i")
        fresh(i) = arr.getLong(i); i += 1
      }
      fresh
    } else {
      require(buffer.length == n,
        s"graft_vec_sum: ragged input — ${buffer.length} vs $n elements")
      var i = 0
      while (i < n) {
        require(!arr.isNullAt(i), s"graft_vec_sum: null element at index $i")
        buffer(i) += arr.getLong(i); i += 1
      }
      buffer
    }
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.isEmpty) return buffer
    if (buffer.isEmpty) return other.clone()
    require(buffer.length == other.length,
      s"graft_vec_sum: ragged partials — ${buffer.length} vs ${other.length}")
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer.isEmpty) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.length * 8)
    bb.putInt(buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bb.getInt)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumLongAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumLongAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSumLongAgg =
    copy(child = newChild)
}
