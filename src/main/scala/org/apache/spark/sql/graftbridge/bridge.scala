package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` surface for registering custom
  * Catalyst expressions as Columns / SQL functions — the standard
  * pattern for Spark-extension libraries (the public alternative,
  * SparkSessionExtensions#injectFunction, requires controlling the
  * session builder; a library cannot assume that). */
object GraftSql {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    ExpressionUtils.expression(c)

  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
}
