package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge. Spark 4 made these conversions
  * private[sql] (the Column API is backend-agnostic since Spark Connect);
  * third-party expression libraries reach them from a package under
  * org.apache.spark.sql — the standard extension idiom.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Apply a SparkSessionExtensions instance to a fresh function registry —
    * lets tests exercise injectFunction wiring without building a second
    * SparkContext (registerFunctions is private[sql]).
    */
  def registerExtensions(ext: org.apache.spark.sql.SparkSessionExtensions)
    : org.apache.spark.sql.catalyst.analysis.FunctionRegistry = {
    val reg = new org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
    ext.registerFunctions(reg)
  }
}
