package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels invoked from generated code — one virtual call per row
  * instead of one interpreted lambda per array element.
  */
object TextExprUtils {
  /** All overlapping character bigrams of a string (code-point based, same
    * semantics as SQL substring(s, i, 2) over i = 1..len-1).
    */
  def charBigrams(s: UTF8String): ArrayData = {
    val n = s.numChars()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      out(i) = s.substringSQL(i + 1, 2)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen'd character-bigram extraction — replaces the
  * `transform(sequence(...), i -> substring(text, i, 2))` HOF chain whose
  * lambda is evaluated interpreted per character.
  */
case class CharBigrams(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_bigrams"

  override def nullSafeEval(input: Any): Any =
    TextExprUtils.charBigrams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprUtils.charBigrams($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
