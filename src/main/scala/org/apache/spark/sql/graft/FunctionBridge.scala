package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.SparkSession

/** Bridge into the `private[sql]` session function registry, so graft's SQL
  * functions can also be registered on an ALREADY-RUNNING session (the
  * `spark.sql.extensions` config path only applies at session build).
  * Lives under org.apache.spark.sql solely for access; contains no
  * Spark-internal logic.
  */
object FunctionBridge {
  def register(spark: org.apache.spark.sql.SparkSession, id: FunctionIdentifier,
      info: ExpressionInfo, builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[SparkSession].sessionState.functionRegistry
      .registerFunction(id, info, builder)
}
