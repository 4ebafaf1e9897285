package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.functions._
import graft.functions.{PqEncode, PqLut, VecDotLong, VecL2Long}

/** The r20 native PQ/vector expressions must reproduce the
  * higher-order-function formulations they replaced BIT-FOR-BIT —
  * including the degenerate inputs no registry fixture exercises:
  * short vectors (zip_with null-padding), NULL elements, exact
  * distance ties (lowest code wins), and the strict-length
  * nearest-centroid mode. Each test evaluates the old HOF Column and
  * the new expression side by side on the same frame. */
class PqCodesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 2 subspaces × 3 codewords × 2 dims; codewords chosen so vector
  // (5, 5, ...) ties codewords 1 and 2 of subspace 0 exactly
  private val cbs: IndexedSeq[IndexedSeq[IndexedSeq[Long]]] = IndexedSeq(
    IndexedSeq(IndexedSeq(0L, 0L), IndexedSeq(4L, 4L), IndexedSeq(6L, 6L)),
    IndexedSeq(IndexedSeq(10L, 10L), IndexedSeq(-3L, 7L), IndexedSeq(0L, 0L)))
  private val m = 2; private val ds = 2; private val ksub = 3
  private val flat: Array[Long] = {
    val a = new Array[Long](m * ksub * ds)
    for (j <- 0 until m; c <- 0 until ksub; i <- 0 until ds)
      a((j * ksub + c) * ds + i) = cbs(j)(c)(i)
    a
  }

  // the exact HOF formulations the natives replaced (pqPartsFromCodebooks
  // r19 shape, verbatim semantics)
  private def cbLit(j: Int): Column = typedLit(cbs(j))
  private def subv(j: Int): Column = expr(s"slice(qv, ${j * ds + 1}, $ds)")
  private def subDist(sub: Column, cv: Column): Column =
    aggregate(zip_with(sub, cv, (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)
  private def hofCode(j: Int): Column = {
    val scored = transform(sequence(lit(0), lit(ksub - 1)), c => struct(
      subDist(subv(j), element_at(cbLit(j), c + 1)).as("dist"),
      c.cast("long").as("code")))
    aggregate(scored,
      struct(lit(Long.MaxValue).as("dist"), lit(Long.MaxValue).as("code")),
      (acc, s) => when(s.getField("dist") < acc.getField("dist"), s)
        .otherwise(acc)).getField("code")
  }
  private def hofLut(j: Int): Column =
    transform(cbLit(j), cv => subDist(subv(j), cv))

  private def vecs = Seq(
    (1L, Seq[java.lang.Long](5L, 5L, 0L, 1L)),     // exact tie in subspace 0
    (2L, Seq[java.lang.Long](-3L, 7L, -3L, 7L)),   // negative coords
    (3L, Seq[java.lang.Long](1L, 2L, 3L)),         // SHORT: subspace 1 incomplete
    (4L, Seq[java.lang.Long](1L)),                 // SHORT: both subspaces at risk
    (5L, Seq[java.lang.Long](1L, null, 3L, 4L)),   // NULL element in subspace 0
    (6L, Seq[java.lang.Long](0L, 0L, 10L, 10L, 99L, 99L)) // LONGER than d
  ).toDF("id", "qv")

  private def native(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftShim.column(e)

  test("PqEncode == HOF argmin fold on ties, short vectors, nulls, long vectors") {
    val enc = native(PqEncode(GraftShim.expression(col("qv")), flat, m, ds, ksub))
    val rows = vecs.select(col("id"), enc.as("codes"),
        array((0 until m).map(hofCode): _*).as("hof"))
      .orderBy("id").collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2),
        s"id=${r.getLong(0)}: native ${r.getSeq[Long](1)} != hof ${r.getSeq[Long](2)}")
    }
    // the tie case must take the LOWEST code (codewords 1 and 2 are
    // equidistant from (5,5))
    val tie = rows.find(_.getLong(0) == 1L).get.getSeq[Long](1)
    assert(tie.head == 1L)
    // short/null subspaces fold to the Long.MaxValue seed
    assert(rows.find(_.getLong(0) == 3L).get.getSeq[Long](1)(1) == Long.MaxValue)
    assert(rows.find(_.getLong(0) == 5L).get.getSeq[Long](1)(0) == Long.MaxValue)
  }

  test("PqLut == flattened HOF LUTs incl. null entries for degenerate subspaces") {
    val lut = native(PqLut(GraftShim.expression(col("qv")), flat, m, ds, ksub))
    val rows = vecs.select(col("id"), lut.as("lutf"),
        flatten(array((0 until m).map(hofLut): _*)).as("hof"))
      .orderBy("id").collect()
    rows.foreach { r =>
      val a = r.getSeq[java.lang.Long](1)
      val b = r.getSeq[java.lang.Long](2)
      assert(a === b, s"id=${r.getLong(0)}: native $a != hof $b")
    }
    // degenerate subspace -> NULL entries (matches zip_with padding)
    val shortRow = rows.find(_.getLong(0) == 4L).get.getSeq[java.lang.Long](1)
    assert(shortRow.forall(_ == null))
  }

  test("strict PqEncode reproduces direct zip_with length semantics (m=1)") {
    // m=1, ds=4: the nearest-centroid form — a LONGER vector must fold
    // to NULL distances (zip_with pads the centroid side) => MaxValue
    val cents = IndexedSeq(IndexedSeq(0L, 0L, 0L, 0L), IndexedSeq(5L, 5L, 0L, 1L))
    val f = cents.flatten.toArray
    val strictEnc = native(PqEncode(GraftShim.expression(col("qv")), f, 1, 4, 2,
      strict = true))
    val centLit = typedLit(cents)
    val hof = {
      val scored = transform(sequence(lit(0), lit(1)), c => struct(
        aggregate(zip_with(col("qv"), element_at(centLit, c + 1),
            (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("dist"),
        c.cast("long").as("cell")))
      aggregate(scored,
        struct(lit(Long.MaxValue).as("dist"), lit(Long.MaxValue).as("cell")),
        (acc, s) => when(s.getField("dist") < acc.getField("dist"), s)
          .otherwise(acc)).getField("cell")
    }
    val rows = vecs.select(col("id"),
        element_at(strictEnc, 1).as("native"), hof.as("hof"))
      .orderBy("id").collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"id=${r.getLong(0)}: native ${r.getLong(1)} != hof ${r.getLong(2)}")
    }
    // the longer-than-d vector specifically must be MaxValue, not a
    // prefix-distance argmin
    assert(rows.find(_.getLong(0) == 6L).get.getLong(1) == Long.MaxValue)
  }

  test("VecDotLong / VecL2Long == aggregate(zip_with) on mismatch and nulls") {
    val pairs = Seq(
      (1L, Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](4L, 5L, 6L)),
      (2L, Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](4L, 5L, 6L)), // length mismatch
      (3L, Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](4L, 5L, 6L)), // null elem
      (4L, Seq[java.lang.Long](-7L, 9L), Seq[java.lang.Long](3L, -2L))
    ).toDF("id", "a", "b")
    val dotHof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0L), (acc, x) => acc + x)
    val l2Hof = aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, x) => acc + x)
    val rows = pairs.select(col("id"),
        native(VecDotLong(GraftShim.expression(col("a")),
          GraftShim.expression(col("b")))).as("nd"),
        dotHof.as("hd"),
        native(VecL2Long(GraftShim.expression(col("a")),
          GraftShim.expression(col("b")))).as("nl"),
        l2Hof.as("hl"))
      .orderBy("id").collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2) &&
        (r.isNullAt(1) || r.getLong(1) == r.getLong(2)),
        s"dot id=${r.getLong(0)}")
      assert(r.isNullAt(3) == r.isNullAt(4) &&
        (r.isNullAt(3) || r.getLong(3) == r.getLong(4)),
        s"l2 id=${r.getLong(0)}")
    }
    assert(rows.find(_.getLong(0) == 2L).get.isNullAt(1)) // mismatch -> null
    assert(rows.find(_.getLong(0) == 3L).get.isNullAt(3)) // null elem -> null
  }
}
