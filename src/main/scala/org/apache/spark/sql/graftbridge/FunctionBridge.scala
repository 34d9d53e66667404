package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-state bridge: `SparkSession.sessionState` is `private[sql]` in
  * Spark 4, so function registration on an EXISTING session goes through
  * this subpackage (same convention as [[ColumnBridge]]). New sessions
  * should prefer `spark.sql.extensions=graft.GraftExtensions`. */
object FunctionBridge {
  def registerFunction(spark: SparkSession, name: FunctionIdentifier,
                       info: ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(name, info, builder)
}
