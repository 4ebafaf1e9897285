package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew-aware equi-join via key salting: the skewed (large, hot-keyed)
 * side gets a random salt in [0, buckets); the small/replicable side is
 * exploded across every salt value. The join key becomes (key, salt), so
 * one hot key fans out over `buckets` reducers instead of melting a
 * single task — the classic remedy when AQE's skew-join split isn't
 * available (e.g. a non-shuffle-read side) or needs to be forced.
 *
 * Inner-join semantics are preserved exactly: each right row is
 * duplicated once per salt, and each left row carries exactly one salt,
 * so every matching (l, r) pair appears exactly once.
 *
 * Prefer AQE (`spark.sql.adaptive.skewJoin.enabled`) when it applies —
 * this operator is for the cases it can't reach, and for pinning a plan
 * regardless of runtime statistics.
 */
object SkewJoin {

  def saltedInnerJoin(skewed: DataFrame, small: DataFrame, key: String,
                      buckets: Int = 16): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salted = skewed.withColumn("__salt",
      (rand(seed = 42) * buckets).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
