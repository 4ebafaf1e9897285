package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{SpaceSavingBuffer, SpaceSavingTopK}

/** SpaceSaving sketch invariants on the raw buffer, property-style over
  * seeded random streams (the Spark-level behavior is pinned by
  * AdvancedOpsSpec + the agg_topk_sketch oracle). */
class SpaceSavingSpec extends AnyFunSuite {

  private def build(items: Seq[String], capacity: Int): SpaceSavingBuffer =
    items.foldLeft(new SpaceSavingBuffer)((b, i) => b.add(i, 1L, capacity))

  private def randomStream(rnd: scala.util.Random, n: Int, universe: Int): Seq[String] =
    Seq.fill(n)(s"w${rnd.nextInt(universe)}")

  test("partial-merge order does not change the result (commutative merge)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 200) {
      val capacity = 4 + rnd.nextInt(5)
      val xs = randomStream(rnd, rnd.nextInt(60), universe = 12)
      val ys = randomStream(rnd, rnd.nextInt(60), universe = 12)
      val ab = build(xs, capacity).mergeFrom(build(ys, capacity), capacity)
      val ba = build(ys, capacity).mergeFrom(build(xs, capacity), capacity)
      assert(ab.topK(capacity) === ba.topK(capacity),
        s"trial $trial: merge not commutative (capacity=$capacity)")
    }
  }

  test("exact when capacity >= distinct count, regardless of partition split") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 200) {
      val xs = randomStream(rnd, 1 + rnd.nextInt(80), universe = 12)
      val capacity = 16 // >= the 12-word universe
      val cut = rnd.nextInt(xs.length + 1)
      val (l, r) = xs.splitAt(cut)
      val merged = build(l, capacity).mergeFrom(build(r, capacity), capacity)
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(merged.topK(capacity).toMap === exact, s"trial $trial")
      // agrees with the single-pass sketch
      assert(merged.topK(capacity) === build(xs, capacity).topK(capacity),
        s"trial $trial: split result differs from single pass")
    }
  }

  test("heavy hitter present with capacity << cardinality; tracked count " +
      "never undercounts") {
    val rnd = new scala.util.Random(13)
    val heavy = Seq.fill(500)("HH")
    val noise = (0 until 400).flatMap(i => Seq(s"n$i", s"n$i"))
    val stream = rnd.shuffle(heavy ++ noise)
    val b = build(stream, capacity = 32)
    val top = b.topK(5)
    assert(top.head._1 === "HH")
    assert(top.head._2 >= 500L) // overestimate-only while tracked
  }

  test("serialization round-trip preserves state (index rebuilt lazily)") {
    val b = build(Seq("a", "b", "a", "c", "b", "a"), 8)
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(b); oos.close()
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[SpaceSavingBuffer]
    assert(back.topK(8) === b.topK(8))
    // and the revived buffer keeps accepting inserts through the rebuilt index
    assert(back.add("d", 1L, 3).topK(3).map(_._1).contains("a"))
  }

  test("aggregator finish order is (count desc, item asc)") {
    val agg = new SpaceSavingTopK(4, 8)
    val b = build(Seq("b", "a", "b", "a", "c"), 8)
    assert(agg.finish(b) === Seq(("a", 2L), ("b", 2L), ("c", 1L)))
  }
}
