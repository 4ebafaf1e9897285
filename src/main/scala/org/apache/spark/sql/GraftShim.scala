package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ExpressionColumnNode, ExpressionUtils}

/** Internal-access shim: `SparkSession.sessionState`, `ExpressionUtils` and
  * `ExpressionColumnNode` are `private[sql]`, so Catalyst-expression-level
  * function registration (the codegen-friendly alternative to Scala UDFs)
  * needs accessors inside the `org.apache.spark.sql` package. Standard
  * pattern for Spark extension libraries. */
object GraftShim {
  def functionRegistry(spark: SparkSession): FunctionRegistry =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry

  /** Wrap a raw Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))

  /** Unwrap a Column to its Catalyst expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
