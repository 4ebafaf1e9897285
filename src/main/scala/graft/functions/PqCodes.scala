package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native product-quantization building blocks (see
 * [[graft.operators.Similarity]]): the PQ ENCODE (per-subspace argmin
 * over the codebook) and the per-query LUT (all subspace×codeword
 * distances) as single Catalyst expressions over a micro-quantized
 * BIGINT vector column.
 *
 * These replace the `aggregate(transform(sequence(...)))` /
 * `transform(cb, cv -> aggregate(zip_with(...)))` higher-order-function
 * formulations, which evaluate INTERPRETED — m·ksub·ds closure
 * invocations and as many intermediate arrays per corpus row (the
 * dominant per-row cost of every PQ query; same lesson as [[VecDot]]).
 * Here the whole encode is one tight primitive loop over the codebook
 * held as a flat `long[]` reference object — no allocation per
 * codeword, no virtual calls — inside whole-stage codegen.
 *
 * Bit-equality contract (the repo's replay idiom): all arithmetic is
 * the same BIGINT squared-L2 in the same order; the argmin keeps the
 * LOWEST code on ties (strict `<` against the running best, matching
 * the HOF fold's `when(s.dist < acc.dist, s)` with a Long.MaxValue
 * seed). Degenerate inputs mirror the HOF semantics exactly: a
 * subspace whose slice of `qv` is short (vector shorter than d) or
 * contains a NULL element folds to a NULL distance under `zip_with`
 * padding, so its LUT entries are NULL and its code is Long.MaxValue
 * (the untouched fold seed).
 */
abstract class PqCodebookExpression extends UnaryExpression {
  def cb: Array[Long] // flat: cb((j*ksub + c)*ds + i) = codebook j, word c, dim i
  def m: Int
  def ds: Int
  def ksub: Int
  /** `strict = true` (the m = 1 nearest-centroid form): the vector must
    * be EXACTLY ds elements — the direct `zip_with(qv, cqv)` semantics,
    * where a LONGER qv pads the centroid side with nulls and every
    * distance folds to NULL. The PQ form (strict = false) slices qv, so
    * trailing extra elements are simply ignored. */
  def strict: Boolean

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${prettyName} expects array<bigint>, got ${other.simpleString}")
  }

  /** subspace j has a complete, null-free slice of qv */
  protected final def subValid(qv: ArrayData, j: Int): Boolean = {
    if (strict && qv.numElements() != m * ds) return false
    if (qv.numElements() < (j + 1) * ds) return false
    var i = 0
    while (i < ds) {
      if (qv.isNullAt(j * ds + i)) return false
      i += 1
    }
    true
  }

  /** exact BIGINT squared L2 of subspace j of qv vs codeword c */
  protected final def dist(qv: ArrayData, j: Int, c: Int): Long = {
    val base = (j * ksub + c) * ds
    var s = 0L
    var i = 0
    while (i < ds) {
      val d = qv.getLong(j * ds + i) - cb(base + i)
      s += d * d
      i += 1
    }
    s
  }
}

/** `m` PQ codes (argmin codeword per subspace) as `array<bigint>`. */
case class PqEncode(child: Expression, cb: Array[Long],
                    m: Int, ds: Int, ksub: Int,
                    strict: Boolean = false)
    extends PqCodebookExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def encode(v: ArrayData): ArrayData = {
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      if (!subValid(v, j)) out(j) = Long.MaxValue
      else {
        var best = Long.MaxValue
        var bc = Long.MaxValue
        var c = 0
        while (c < ksub) {
          val d = dist(v, j, c)
          if (d < best) { best = d; bc = c.toLong }
          c += 1
        }
        out(j) = bc
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    encode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ref.encode($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** The per-query ADC lookup table, flattened: entry `j*ksub + c + 1`
  * (1-based SQL indexing) = squared L2 of subspace j of the query vs
  * codeword c — `array<bigint>` of m·ksub entries, NULL entries for
  * degenerate subspaces (see class doc). */
case class PqLut(child: Expression, cb: Array[Long],
                 m: Int, ds: Int, ksub: Int,
                 strict: Boolean = false)
    extends PqCodebookExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  def lut(v: ArrayData): ArrayData = {
    val out = new Array[Any](m * ksub)
    var j = 0
    while (j < m) {
      if (subValid(v, j)) {
        var c = 0
        while (c < ksub) {
          out(j * ksub + c) = java.lang.Long.valueOf(dist(v, j, c))
          c += 1
        }
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    lut(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLut", this, classOf[PqLut].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ref.lut($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** Shared shape of the exact-integer BIGINT vector folds: result is
  * NULL when the two arrays differ in length or any element is NULL —
  * exactly the `aggregate(zip_with(a, b, f), 0L, +)` semantics these
  * expressions replace (zip_with pads the shorter side with nulls and
  * the running sum absorbs them), so swapping them in changes no
  * query's output. Summation of longs is exact, so fold order is
  * irrelevant; overflow wraps like the Column arithmetic it replaces.
  */
abstract class LongVecFold extends BinaryExpression {
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<bigint>, array<bigint>), got $other")
    }

  /** the per-dimension term */
  protected def term(a: Long, b: Long): Long

  final def fold(l: ArrayData, r: ArrayData): java.lang.Long = {
    val n = l.numElements()
    if (r.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (l.isNullAt(i) || r.isNullAt(i)) return null
      s += term(l.getLong(i), r.getLong(i))
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    fold(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecFold", this, classOf[LongVecFold].getName)
    val tmp = ctx.freshName("gfFold")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
       |java.lang.Long $tmp = $ref.fold($a, $b);
       |if ($tmp == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = $tmp.longValue(); }
     """.stripMargin)
  }
}

/** Σ aᵢ·bᵢ over two BIGINT arrays (exact). */
case class VecDotLong(left: Expression, right: Expression)
    extends LongVecFold {
  override protected def term(a: Long, b: Long): Long = a * b
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotLong =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)² over two BIGINT arrays (exact squared L2). */
case class VecL2Long(left: Expression, right: Expression)
    extends LongVecFold {
  override protected def term(a: Long, b: Long): Long = { val d = a - b; d * d }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Long =
    copy(left = newLeft, right = newRight)
}
