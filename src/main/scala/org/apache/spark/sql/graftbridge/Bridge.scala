package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for `private[sql]` seams the public API does not
  * expose in Spark 4: Expression↔Column conversion and live-session
  * function registration. Lives under org.apache.spark.sql.* solely for
  * access scope; contains no Spark code.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER conversion of a Column to its catalyst tree.
    * [[expression]] returns a lazy `ColumnNodeExpression` wrapper whose
    * children are invisible to `collect`/`references`; callers that
    * INSPECT the tree (e.g. which attributes a predicate touches) need
    * the converted form. */
  def convertedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  def registerFunction(
      spark: SparkSession,
      name: String,
      info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}
