package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 moved Column↔Expression conversion behind
  * `private[sql] classic.ExpressionUtils`; libraries extending
  * Catalyst conventionally bridge from inside the sql package (the
  * same pattern Spark-ecosystem projects use for Dataset/plan
  * access). This is the only file outside the graft package.
  */
object GraftSqlBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Run a logical plan to rows (Dataset.ofRows is private[sql]) —
    * used by the IVF probe rule to evaluate a provably-tiny query-side
    * subplan at rewrite time. */
  def runPlan(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Array[Row] =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan).collect()
}
