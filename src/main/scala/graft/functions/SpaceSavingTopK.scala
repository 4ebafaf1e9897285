package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * SpaceSaving heavy-hitters sketch (Metwally, Agrawal, El Abbadi 2005) as
 * a typed, mergeable Spark aggregator: top-`k` most frequent items with a
 * hard `capacity` bound on state, regardless of input cardinality.
 *
 * Why this exists: an exact token histogram over a 100 TB corpus shuffles
 * the full vocabulary; SpaceSaving keeps at most `capacity` counters per
 * partial aggregate, merges associatively (partial sketches combine by
 * summed counts + re-truncation), and guarantees any item with true count
 * > N/capacity is present, with count overestimated by at most the
 * smallest tracked count at eviction time. With `capacity` ≥ the true
 * distinct count it degrades gracefully to exact counting (how the
 * sf0.01 oracle pins it).
 *
 * Eviction and the final top-k are tie-broken deterministically
 * ((count, item) ordering) so results are stable across partitionings.
 */
class SpaceSavingTopK(k: Int, capacity: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(k > 0 && capacity >= k, "need capacity >= k > 0")

  override def zero: Map[String, Long] = Map.empty

  private def add(m: Map[String, Long], item: String, c: Long): Map[String, Long] =
    m.get(item) match {
      case Some(n) => m.updated(item, n + c)
      case None if m.size < capacity => m.updated(item, c)
      case None =>
        // evict the (minCount, lexicographically-smallest item) entry —
        // any consistent tie-break works, it just must be deterministic
        // across partitionings; the newcomer inherits the evicted count
        // (the SpaceSaving overestimate bound)
        val (evictItem, evictCnt) = m.minBy { case (i, n) => (n, i) }
        (m - evictItem).updated(item, evictCnt + c)
    }

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
    if (item == null) b else add(b, item, 1L)

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    // exact merge of tracked counts, then re-truncate to capacity keeping
    // the largest (deterministic tie-break)
    val combined = b.foldLeft(a) { case (m, (i, c)) =>
      m.updated(i, m.getOrElse(i, 0L) + c)
    }
    if (combined.size <= capacity) combined
    else combined.toSeq.sortBy { case (i, c) => (-c, i) }.take(capacity).toMap
  }

  override def finish(m: Map[String, Long]): Seq[(String, Long)] =
    m.toSeq.sortBy { case (i, c) => (-c, i) }.take(k)

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}
