package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.WeightedPercentile

/** Property tests (fixed-seed random trials) for the weighted-percentile
  * sketch against an exact reference implementation of the same midpoint
  * interpolation. */
class WeightedPercentileSpec extends AnyFunSuite {

  /** Exact weighted percentile with cumulative-midpoint interpolation —
    * the definition the sketch implements. */
  private def exact(data: Seq[(Double, Double)], p: Double): Double = {
    val sorted = data.sortBy(_._1)
    val total = sorted.map(_._2).sum
    val target = p * total
    var cum = 0.0
    for (i <- sorted.indices) {
      val mid = cum + sorted(i)._2 / 2
      if (mid >= target) {
        if (i == 0) return sorted.head._1
        val prevMid = cum - sorted(i - 1)._2 / 2
        val frac = if (mid == prevMid) 0.0 else (target - prevMid) / (mid - prevMid)
        return sorted(i - 1)._1 + frac * (sorted(i)._1 - sorted(i - 1)._1)
      }
      cum += sorted(i)._2
    }
    sorted.last._1
  }

  private def sketchOf(data: Seq[(Double, Double)], p: Double, cap: Int = 2048): Double = {
    val agg = new WeightedPercentile(cap)
    var buf = agg.zero
    data.foreach { case (v, w) => buf = agg.reduce(buf, (v, w, p)) }
    agg.finish(buf)
  }

  test("exact below capacity: sketch equals the reference implementation") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 100) {
      val n = 1 + rnd.nextInt(200)
      val data = Seq.fill(n)((rnd.nextDouble() * 2000 - 1000, 0.1 + rnd.nextDouble() * 10))
      val p = 0.01 + rnd.nextDouble() * 0.98
      assert(math.abs(sketchOf(data, p) - exact(data, p)) < 1e-9,
        s"n=$n p=$p")
    }
  }

  test("compressed: result stays within the data range and is monotone in p") {
    val data = (1 to 10000).map(i => (i.toDouble, 1.0))
    val lo = sketchOf(data, 0.25, cap = 64)
    val hi = sketchOf(data, 0.75, cap = 64)
    assert(lo >= 1.0 && hi <= 10000.0 && lo < hi)
    // compressed estimate still close (uniform data, generous 5% tolerance)
    assert(math.abs(lo - 2500.75) < 500)
    assert(math.abs(hi - 7500.25) < 500)
  }

  test("merge of partial buffers equals single-pass result below capacity") {
    val a = (1 to 50).map(i => (i.toDouble, 1.0))
    val b = (51 to 100).map(i => (i.toDouble, 1.0))
    val agg = new WeightedPercentile()
    var ba = agg.zero
    a.foreach { case (v, w) => ba = agg.reduce(ba, (v, w, 0.5)) }
    var bb = agg.zero
    b.foreach { case (v, w) => bb = agg.reduce(bb, (v, w, 0.5)) }
    val merged = agg.finish(agg.merge(ba, bb))
    assert(math.abs(merged - sketchOf(a ++ b, 0.5)) < 1e-9)
  }

  test("empty buffer yields NaN") {
    val agg = new WeightedPercentile()
    assert(agg.finish(agg.zero).isNaN)
  }
}
