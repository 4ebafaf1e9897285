package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Mutable SpaceSaving sketch state: a counts map plus a transient
 * (count, item)-ordered index, rebuilt lazily after deserialization.
 * Per-row cost is O(log capacity) — no per-row persistent-map copy, no
 * O(capacity) eviction scan (both mattered for the 100 TB token-histogram
 * use this aggregator advertises: the common hot path on a full sketch is
 * "unseen item → evict min", which the index serves in O(log capacity)).
 *
 * Serialization (kryo, at exchange/spill boundaries only): just the
 * java.util.HashMap; the index is @transient and rebuilt on first use.
 */
final class SpaceSavingBuffer extends Serializable {
  val counts = new java.util.HashMap[String, Long]()

  @transient private var idx: java.util.TreeSet[(Long, String)] = _

  /** (count asc, item asc) — head is the eviction candidate. */
  private def index: java.util.TreeSet[(Long, String)] = {
    if (idx == null) {
      idx = new java.util.TreeSet[(Long, String)](
        implicitly[Ordering[(Long, String)]])
      counts.forEach((i, c) => { idx.add((c, i)); () })
    }
    idx
  }

  /** SpaceSaving insert: increment if tracked; append if below capacity;
    * else evict the (minCount, lexicographically-smallest) entry and the
    * newcomer inherits its count (the overestimate bound). */
  def add(item: String, c: Long, capacity: Int): this.type = {
    if (counts.containsKey(item)) {
      val existing = counts.get(item)
      index.remove((existing, item))
      counts.put(item, existing + c)
      index.add((existing + c, item))
    } else if (counts.size < capacity) {
      counts.put(item, c)
      index.add((c, item))
    } else {
      val min = index.first()
      index.remove(min)
      counts.remove(min._2)
      counts.put(item, min._1 + c)
      index.add((min._1 + c, item))
    }
    this
  }

  /** Exact-sum merge of `other`'s tracked counts into this buffer, then
    * truncate back to capacity keeping the largest counts (ties keep the
    * lexicographically smaller item — same order the final top-k uses).
    * Commutative: sum-then-truncate gives the same result regardless of
    * argument order. */
  def mergeFrom(other: SpaceSavingBuffer, capacity: Int): this.type = {
    other.counts.forEach { (i, c) =>
      if (counts.containsKey(i)) {
        val cur = counts.get(i)
        index.remove((cur, i))
        counts.put(i, cur + c)
        index.add((cur + c, i))
      } else {
        counts.put(i, c)
        index.add((c, i))
      }
    }
    while (counts.size > capacity) {
      // drop the minimum count; among min-count ties the LARGEST item
      // (keep-side order is (-count, item) ascending). lower((min+1, ""))
      // is the greatest (minCount, item) pair in the index.
      val minC = index.first()._1
      val drop = index.lower((minC + 1, ""))
      index.remove(drop)
      counts.remove(drop._2)
    }
    this
  }

  def topK(k: Int): Seq[(String, Long)] = {
    val it = index.descendingIterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    while (it.hasNext) buf += it.next()
    // descending index order is (count desc, item desc); the contract is
    // (count desc, item asc) — re-sort the (small, ≤capacity) seq.
    buf.toSeq.map { case (c, i) => (i, c) }
      .sortBy { case (i, c) => (-c, i) }.take(k)
  }
}

/**
 * SpaceSaving heavy-hitters sketch (Metwally, Agrawal, El Abbadi 2005) as
 * a typed, mergeable Spark aggregator: top-`k` most frequent items with a
 * hard `capacity` bound on state, regardless of input cardinality.
 *
 * Why this exists: an exact token histogram over a 100 TB corpus shuffles
 * the full vocabulary; SpaceSaving keeps at most `capacity` counters per
 * partial aggregate and merges associatively (summed counts +
 * re-truncation).
 *
 * Guarantees, precisely scoped: any item with true count > N/capacity is
 * present in a single-sketch pass; a tracked count never undercounts the
 * item's true count WHILE the item remains tracked (reduce-time eviction
 * hands the evicted count to the newcomer — the overestimate bound).
 * Items dropped at a merge-truncation lose their tracked mass: if such an
 * item re-enters later its count restarts, so cross-partition estimates
 * for items near the truncation boundary can undercount. The heavy-hitter
 * presence bound survives merging; the "never undercount" bound is
 * per-sketch, not global. With `capacity` ≥ the true distinct count
 * nothing is ever evicted or truncated and the sketch is exact counting
 * (how the sf0.01 oracle pins it).
 *
 * Eviction, merge truncation, and the final top-k are tie-broken
 * deterministically so results are stable across partitionings; the
 * merge is commutative (exact sum, then deterministic truncation).
 */
class SpaceSavingTopK(k: Int, capacity: Int)
    extends Aggregator[String, SpaceSavingBuffer, Seq[(String, Long)]] {
  require(k > 0 && capacity >= k, "need capacity >= k > 0")

  override def zero: SpaceSavingBuffer = new SpaceSavingBuffer

  override def reduce(b: SpaceSavingBuffer, item: String): SpaceSavingBuffer =
    if (item == null) b else b.add(item, 1L, capacity)

  override def merge(a: SpaceSavingBuffer, b: SpaceSavingBuffer): SpaceSavingBuffer =
    a.mergeFrom(b, capacity)

  override def finish(m: SpaceSavingBuffer): Seq[(String, Long)] = m.topK(k)

  override def bufferEncoder: Encoder[SpaceSavingBuffer] =
    Encoders.kryo[SpaceSavingBuffer]
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}
