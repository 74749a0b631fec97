package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal Column ↔ catalyst-Expression bridge for graft's custom
  * expressions. Spark 4 moved these conversions behind private[sql]
  * (classic.ExpressionUtils), so the bridge lives inside the sql package —
  * the same approach third-party Spark extensions use.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Test-visible accessor for the optimizer rules an extensions object
    * would inject (buildOptimizerRules is private[sql]).
    */
  def optimizerRules(
      ext: SparkSessionExtensions,
      session: SparkSession): Seq[catalyst.rules.Rule[catalyst.plans.logical.LogicalPlan]] =
    ext.buildOptimizerRules(session)
}
