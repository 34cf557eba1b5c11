package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the integer-lattice vector math used by
  * §2.11/§2.12. Spark's higher-order functions (`zip_with` + `aggregate`)
  * evaluate interpreted lambdas per row and break whole-stage codegen;
  * these expressions generate a tight primitive loop instead — same exact
  * integer semantics, one fused codegen stage.
  */
case class DotProductLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(LongType, false) || left.dataType == ArrayType(LongType, true)) {
      if (left.dataType == right.dataType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"argument types differ: ${left.dataType} vs ${right.dataType}")
    } else TypeCheckResult.TypeCheckFailure(s"expected array<bigint>, got ${left.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Exact integer squared euclidean distance between two long arrays. */
case class SquaredDistanceLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dist2"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(LongType, false) || left.dataType == ArrayType(LongType, true)) {
      if (left.dataType == right.dataType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"argument types differ: ${left.dataType} vs ${right.dataType}")
    } else TypeCheckResult.TypeCheckFailure(s"expected array<bigint>, got ${left.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $d = $a.getLong($i) - $b.getLong($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Exact dot product of two SPARSE integer vectors given as postings
  * arrays `array<struct<word:string, w:long>>` SORTED ascending by word
  * (distinct words; `sort_array` over the struct produces exactly this
  * order — binary UTF8 comparison, the same comparator this merge uses).
  * A two-pointer merge makes each pair O(|a|+|b|); the HOF/map-lookup
  * alternatives are O(|a|·|b|) per pair because `element_at` on unsafe
  * map data is a linear key scan, which dominated the near-dup cosine
  * join at 10× duplicate density.
  */
case class PostingsDotLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_postings_dot"

  private def okType(t: DataType): Boolean = t match {
    // containsNull must be false: the merge loop reads each element's
    // struct unconditionally, so a null entry (possible via the public
    // column API, not the internal collect_list producers) would NPE at
    // runtime — make it a plan-time type error instead
    case ArrayType(s: org.apache.spark.sql.types.StructType, false) =>
      s.length == 2 &&
        s(0).dataType == org.apache.spark.sql.types.StringType &&
        s(1).dataType == LongType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "expected array<struct<string,bigint>> (containsNull=false) on both sides, " +
        s"got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var acc = 0L
    var i = 0
    var j = 0
    while (i < n && j < m) {
      val rx = x.getStruct(i, 2)
      val ry = y.getStruct(j, 2)
      val c = rx.getUTF8String(0).compareTo(ry.getUTF8String(0))
      if (c == 0) { acc += rx.getLong(1) * ry.getLong(1); i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val c = ctx.freshName("c")
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |long $acc = 0L;
         |int $i = 0;
         |int $j = 0;
         |while ($i < $n && $j < $m) {
         |  final org.apache.spark.sql.catalyst.InternalRow $rx = $a.getStruct($i, 2);
         |  final org.apache.spark.sql.catalyst.InternalRow $ry = $b.getStruct($j, 2);
         |  final int $c = $rx.getUTF8String(0).compareTo($ry.getUTF8String(0));
         |  if ($c == 0) { $acc += $rx.getLong(1) * $ry.getLong(1); $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
