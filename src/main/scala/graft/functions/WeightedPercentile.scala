package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mutable buffer: bounded set of weighted centroids (t-digest-style).
  * Kept sorted only at compress/finish time. */
case class WPBuffer(var values: Array[Double], var weights: Array[Double],
                    var n: Int, var percentile: Double)

/**
 * `approx_percentile_cont_with_weight(value, weight, percentile)` —
 * the one aggregate in the reference's surface with no Spark builtin
 * (reference: ballista/core/proto/datafusion.proto:542 `AggregateFunction.
 * APPROX_PERCENTILE_CONT_WITH_WEIGHT`, exercised in
 * ballista/client/src/context.rs:963-984).
 *
 * Implementation: bounded-size weighted centroid sketch (t-digest style
 * merge-by-size): each partition accumulates up to `cap` (value, weight)
 * centroids; overflow triggers a compress that merges nearest-neighbor
 * centroids weighted-mean-wise. Mergeable across partitions → works as a
 * partial/final Spark aggregation at any scale (memory is O(cap) per
 * group, not O(rows)). Result: linearly-interpolated weighted percentile
 * over the centroids, matching DataFusion's continuous interpolation.
 */
class WeightedPercentile(cap: Int = 2048)
    extends Aggregator[(Double, Double, Double), WPBuffer, Double] {

  def zero: WPBuffer = WPBuffer(new Array[Double](cap * 2), new Array[Double](cap * 2), 0, 0.5)

  def reduce(b: WPBuffer, in: (Double, Double, Double)): WPBuffer = {
    if (b.n >= b.values.length) compress(b)
    b.values(b.n) = in._1
    b.weights(b.n) = in._2
    b.n += 1
    b.percentile = in._3
    b
  }

  def merge(a: WPBuffer, b: WPBuffer): WPBuffer = {
    var i = 0
    while (i < b.n) {
      if (a.n >= a.values.length) compress(a)
      a.values(a.n) = b.values(i); a.weights(a.n) = b.weights(i); a.n += 1
      i += 1
    }
    if (b.n > 0) a.percentile = b.percentile
    a
  }

  /** Sort by value, then merge adjacent centroids until size <= cap/2.
    * Buckets are bounded by cumulative WEIGHT (not centroid count): when
    * compress runs repeatedly, surviving centroids carry large weights,
    * and equal-count chunking would fold a heavy centroid together with
    * light fresh points, skewing the quantile estimate. */
  private def compress(b: WPBuffer): Unit = {
    sortByValue(b)
    val target = math.max(1, cap / 2)
    if (b.n <= target) return
    var total = 0.0
    var t = 0
    while (t < b.n) { total += b.weights(t); t += 1 }
    val perBucket = total / target
    val nv = new Array[Double](b.values.length)
    val nw = new Array[Double](b.values.length)
    var out = 0
    var i = 0
    var cum = 0.0
    while (i < b.n) {
      var wsum = 0.0; var vsum = 0.0
      // always take at least one centroid, then fill to the weight quota
      while (i < b.n && (wsum == 0.0 || out == target - 1 ||
          cum + wsum + b.weights(i) <= (out + 1) * perBucket)) {
        wsum += b.weights(i); vsum += b.values(i) * b.weights(i); i += 1
      }
      nv(out) = if (wsum > 0) vsum / wsum else 0.0
      nw(out) = wsum
      cum += wsum
      out += 1
    }
    b.values = nv; b.weights = nw; b.n = out
  }

  private def sortByValue(b: WPBuffer): Unit = {
    val idx = (0 until b.n).sortBy(b.values)
    val nv = new Array[Double](b.values.length)
    val nw = new Array[Double](b.values.length)
    var i = 0
    idx.foreach { k => nv(i) = b.values(k); nw(i) = b.weights(k); i += 1 }
    b.values = nv; b.weights = nw
  }

  def finish(b: WPBuffer): Double = {
    if (b.n == 0) return Double.NaN
    sortByValue(b)
    val total = { var s = 0.0; var i = 0; while (i < b.n) { s += b.weights(i); i += 1 }; s }
    if (total <= 0) return Double.NaN
    val targetW = b.percentile * total
    // continuous interpolation over cumulative weight midpoints
    var cum = 0.0
    var i = 0
    while (i < b.n) {
      val mid = cum + b.weights(i) / 2
      if (mid >= targetW) {
        if (i == 0) return b.values(0)
        val prevMid = cum - b.weights(i - 1) / 2
        val frac = if (mid == prevMid) 0.0 else (targetW - prevMid) / (mid - prevMid)
        return b.values(i - 1) + frac * (b.values(i) - b.values(i - 1))
      }
      cum += b.weights(i)
      i += 1
    }
    b.values(b.n - 1)
  }

  def bufferEncoder: Encoder[WPBuffer] = Encoders.product[WPBuffer]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
