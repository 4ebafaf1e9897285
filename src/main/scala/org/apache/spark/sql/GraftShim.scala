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

  /** Neutral view of a Column's DSL-level node tree, for predicate
    * derivation outside the sql package (the `internal.ColumnNode`
    * classes themselves are private[sql]). `Fn` names are the DSL
    * operator strings ("and", "=", "<", "isnull", …); anything beyond
    * functions/attributes/literals collapses to `Other`. */
  sealed trait PredNode
  object PredNode {
    final case class Fn(name: String, args: Seq[PredNode]) extends PredNode
    final case class Attr(name: String) extends PredNode
    final case class Lit(value: Any) extends PredNode
    case object Other extends PredNode
  }

  /** Convert a Column's un-analyzed node tree to the neutral view. */
  def predicateTree(c: Column): PredNode = {
    import org.apache.spark.sql.internal
    def conv(n: internal.ColumnNode): PredNode = n match {
      case f: internal.UnresolvedFunction =>
        PredNode.Fn(f.functionName, f.arguments.map(conv))
      case a: internal.UnresolvedAttribute =>
        PredNode.Attr(a.nameParts.mkString("."))
      case l: internal.Literal => PredNode.Lit(l.value)
      case _ => PredNode.Other
    }
    conv(c.node)
  }
}
