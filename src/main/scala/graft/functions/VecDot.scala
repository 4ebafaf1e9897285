package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * `vec_dot(a, b)`: dot product of two `array<double>` columns, as a native
 * codegen Catalyst expression.
 *
 * This is the hot inner loop of every embedding-similarity operator
 * (brute-force cosine, sign-LSH ANN, IVF probe, embedding near-dup — the
 * reference ships the same primitive inside its vectorized kernels). The
 * `aggregate(zip_with(...))` higher-order-function formulation it replaces
 * is interpreted per element (two closure invocations per dimension and an
 * intermediate zipped array); this expression compiles to a tight
 * primitive `for` loop inside whole-stage codegen — no allocation, no
 * virtual calls.
 *
 * Summation is sequential in index order — the same fold order as the HOF
 * formulation and DuckDB's `list_sum(list_transform(list_zip(...)))`, so
 * results stay bit-identical across engines. Mismatched lengths multiply
 * the common prefix (zip semantics); null elements are treated as 0.
 */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // No implicit-cast hook (AbstractDataType is private[sql] in Spark 4):
  // callers cast to array<double> explicitly; anything else is rejected.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects (array<double>, array<double>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}
