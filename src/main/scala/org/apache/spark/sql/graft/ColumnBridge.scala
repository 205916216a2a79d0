package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters
  * (Spark 4's Column wraps a ColumnNode; custom Catalyst expressions need
  * this hop to surface as user Columns). Lives under org.apache.spark.sql
  * solely for access; contains no Spark-internal logic.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Convert a Column COMPOSITION (functions-API when/regexp/…, which
    * builds ColumnNodes) into a plain Catalyst expression TREE the
    * analyzer can resolve — `expression` alone wraps the node in an
    * opaque leaf that a SQL-function builder's output cannot carry
    * (codegen refuses it). Used by GraftExtensions to register Column
    * compositions as SQL functions.
    */
  def resolvableExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
