package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Runtime function registration on an existing session
  * (`sessionState` is `private[sql]`, hence the bridge package). */
object FunctionBridge {
  def register(spark: SparkSession, name: String, info: ExpressionInfo,
               builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}
