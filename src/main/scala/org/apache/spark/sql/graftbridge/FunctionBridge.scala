package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bridge into the `private[sql]` session FunctionRegistry — the
  * runtime companion to `graft.GraftExtensions`: the extensions
  * class is the config-time install path
  * (`spark.sql.extensions=graft.GraftExtensions`), and this is the
  * post-hoc path for sessions the library didn't construct (the
  * driver's own harness session). Same builder tuples flow through
  * both, so SQL behavior cannot diverge by install path. Kept in
  * graftbridge with ColumnBridge — the repo's declared package-cheat
  * surface, nothing else reaches into spark internals.
  */
object FunctionBridge {
  def register(spark: SparkSession, id: FunctionIdentifier,
      info: ExpressionInfo, builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)

  /** Table-valued function registration — the post-hoc mirror of
    * `SparkSessionExtensions.injectTableFunction`. */
  def registerTable(spark: SparkSession, id: FunctionIdentifier,
      info: ExpressionInfo,
      builder: Seq[Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.sessionState.tableFunctionRegistry
      .registerFunction(id, info, builder)
}
