package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql package for wrapping custom Catalyst expressions
  * as user-facing Columns (the classic ExpressionUtils is private[sql]).
  * Same pattern used by public Spark extension libraries.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Re-wrap a lazily-planned batch DataFrame as a streaming one — what
    * Spark's own file/delta v1 sources do inside Source.getBatch.
    */
  def asStreamingDF(spark: SparkSession, df: DataFrame): DataFrame = {
    val classicSpark = spark.asInstanceOf[classic.SparkSession]
    classicSpark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
