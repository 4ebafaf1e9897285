package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (temporal) join: for every left row `(keys, t)` find the single
 * right row with the greatest right-time ≤ t (backward) or the smallest
 * right-time ≥ t (forward) for the same keys — the standard align step
 * for event streams and slowly-changing features.
 *
 * Spark has no built-in as-of join, and the naive formulation
 * (`JOIN ON keys AND rt <= t` + argmax) explodes to every historical
 * right row per left row before reducing. This implementation uses the
 * union-and-carry-forward shape instead:
 *
 *   1. union left (side=1) and right (side=0) rows, right payload in one
 *      nullable struct column;
 *   2. one window per key, ordered by (time, side), running
 *      `last(payload, ignoreNulls)` carries the latest right payload
 *      forward onto each left row;
 *   3. keep side=1 rows.
 *
 * Cost at scale: ONE hash shuffle of |L|+|R| rows on the keys (the same
 * partitioning a plain equi-join would need) and a per-key sort — no
 * pair explosion, no skew amplification beyond the key distribution
 * itself. Survives 100× data growth as long as single-key event history
 * fits a partition sort (same contract as any windowed sessionization).
 *
 * Right rows must be unique per (keys, time) — pre-aggregate ties (e.g.
 * `groupBy(keys, time).agg(max(...))`) or the carried row among equal
 * times is unspecified, matching the reference engines' contract for
 * as-of ties.
 */
object TemporalJoin {

  sealed trait Direction
  case object Backward extends Direction
  case object Forward extends Direction

  /**
   * @param toleranceUs optional max |t - rt| (in the time column's unit);
   *   matches farther away are nulled out, keeping the left row (the
   *   pandas `merge_asof(tolerance=...)` contract).
   * @return all left columns, then the right payload columns (right time
   *   and non-key columns) as nullable fields — null when no match.
   */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTimeCol: String, rightTimeCol: String,
               direction: Direction = Backward,
               toleranceUs: Option[Long] = None): DataFrame = {
    val rPayload = right.columns.filterNot(keys.contains)
    require(rPayload.contains(rightTimeCol), s"$rightTimeCol not in right")
    // Output is all left columns + right payload columns: overlapping
    // names would produce ambiguous duplicates — fail early, not at the
    // first downstream col() reference.
    val overlap = rPayload.toSet.intersect(left.columns.toSet)
    require(overlap.isEmpty,
      s"asofJoin output would duplicate column(s) ${overlap.mkString(", ")}: " +
        "rename/prefix right payload columns so left and right names are disjoint")
    // __-prefixed names are reserved for the union-and-carry-forward
    // internals (__t/__side/__l/__r/__m) — user columns would silently
    // collide with them.
    val reserved = (left.columns ++ right.columns).filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"asofJoin inputs must not contain __-prefixed columns (reserved): " +
        reserved.distinct.mkString(", "))
    val lStructT = left.select(struct(left.columns.map(col): _*).as("s"))
      .schema("s").dataType
    val rStructT = right.select(struct(rPayload.map(col): _*).as("s"))
      .schema("s").dataType

    val l2 = left.select(
      keys.map(col) ++ Seq(
        col(leftTimeCol).as("__t"), lit(1).as("__side"),
        struct(left.columns.map(col): _*).as("__l"),
        lit(null).cast(rStructT).as("__r")): _*)
    val r2 = right.select(
      keys.map(col) ++ Seq(
        col(rightTimeCol).as("__t"), lit(0).as("__side"),
        lit(null).cast(lStructT).as("__l"),
        struct(rPayload.map(col): _*).as("__r")): _*)

    // Backward: ascending time, right-before-left at equal times makes the
    // match inclusive (rt == t matches). Forward: descending time, same
    // side order gives the smallest rt >= t.
    val timeOrd: Column = direction match {
      case Backward => col("__t").asc
      case Forward  => col("__t").desc
    }
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrd, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l2.unionByName(r2)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val bounded = toleranceUs match {
      case None => carried
      case Some(tol) =>
        val gap = abs(col("__t") - col(s"__m.$rightTimeCol"))
        carried.withColumn("__m",
          when(gap <= tol, col("__m")).otherwise(lit(null).cast(rStructT)))
    }
    val lCols = left.columns.map(c => col(s"__l.$c").as(c))
    val rCols = rPayload.map(c => col(s"__m.$c").as(c))
    bounded.select(lCols ++ rCols: _*)
  }
}
