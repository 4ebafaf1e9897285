package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Point-in-interval range join without a cartesian product.
 *
 * The naive plan for `points JOIN intervals ON p BETWEEN lo AND hi` with
 * no equality key is BroadcastNestedLoopJoin — every point tested against
 * every interval, O(|P|·|I|), a scale-killer once intervals stop fitting
 * in a broadcast. The standard fix (used by every warehouse engine's
 * "band join" optimization) is binning:
 *
 *   1. pick a bin width W; a point maps to ONE bin floor(p / W);
 *   2. each interval is exploded to the bins it covers,
 *      floor(lo/W) .. floor(hi/W) — ⌈len/W⌉+1 rows, bounded when W is
 *      chosen near the typical interval length;
 *   3. hash equi-join on the bin id, then re-check `p BETWEEN lo AND hi`
 *      as a residual filter.
 *
 * Each point lands in exactly one bin, so a (point, interval) pair can
 * meet only once — no post-join dedup needed. Cost: one hash shuffle of
 * each side on the bin id; interval row count inflates by the per-bin
 * cover factor only.
 */
object RangeJoin {

  /**
   * @param pointCol  integral column in `points` (e.g. epoch days/micros)
   * @param loCol/hiCol integral inclusive bounds in `intervals`
   * @param binWidth  bin width in the same unit; choose ≈ the typical
   *                  interval length (cover factor ≈ 2 rows/interval)
   * @return matching (point, interval) pairs: all point columns + all
   *         interval columns (inner join semantics)
   */
  def pointInterval(points: DataFrame, pointCol: String,
                    intervals: DataFrame, loCol: String, hiCol: String,
                    binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // The residual filter references both sides by bare name — any shared
    // column would resolve ambiguously after the join, and a pre-existing
    // __bin would be silently overwritten. Fail early with the offenders.
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"pointInterval inputs must have disjoint column names, shared: " +
        shared.mkString(", "))
    val binCol = (points.columns ++ intervals.columns).filter(_ == "__bin")
    require(binCol.isEmpty, "pointInterval inputs must not contain a __bin column (reserved)")
    val p = points.withColumn("__bin", binStart(col(pointCol), binWidth))
    // drop inverted intervals (lo > hi): they match nothing by BETWEEN
    // semantics, and sequence() would throw on a descending range
    val i = intervals.filter(col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(
        binStart(col(loCol), binWidth), binStart(col(hiCol), binWidth),
        lit(binWidth))))
    p.join(i, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /**
   * INTERVAL-OVERLAP join — both sides are intervals, matching when
   * `[a_lo, a_hi] ∩ [b_lo, b_hi] ≠ ∅` (inclusive bounds; the
   * genomics/temporal "range overlap" shape). Same binning idea as
   * [[pointInterval]], with the classic de-duplication trick for
   * two exploded sides: a pair of overlapping intervals meets in EVERY
   * shared bin, so the pair is emitted only from the bin containing
   * `max(a_lo, b_lo)` — the overlap's left edge, which lies in exactly
   * one bin. One hash shuffle per side on the bin id, no post-join
   * distinct (which would need a full extra shuffle at scale), never a
   * nested-loop. Inverted intervals (lo > hi) match nothing.
   */
  def intervalOverlap(left: DataFrame, lLoCol: String, lHiCol: String,
                      right: DataFrame, rLoCol: String, rHiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"intervalOverlap inputs must have disjoint column names, shared: " +
        shared.mkString(", "))
    require(!(left.columns ++ right.columns).contains("__bin"),
      "intervalOverlap inputs must not contain a __bin column (reserved)")
    def explodeBins(df: DataFrame, lo: String, hi: String): DataFrame =
      df.filter(col(lo) <= col(hi))
        .withColumn("__bin", explode(sequence(
          binStart(col(lo), binWidth), binStart(col(hi), binWidth),
          lit(binWidth))))
    explodeBins(left, lLoCol, lHiCol)
      .join(explodeBins(right, rLoCol, rHiCol), Seq("__bin"))
      // overlap check + emit-once: only the bin holding the overlap's
      // left edge keeps the pair
      .filter(col(lLoCol) <= col(rHiCol) && col(rLoCol) <= col(lHiCol) &&
        col("__bin") === binStart(greatest(col(lLoCol), col(rLoCol)), binWidth))
      .drop("__bin")
  }

  /** The start of the bin containing `a` — `a - (a mod w)` with positive
    * mod, so it floors correctly for negative values too. Used as the bin
    * id directly: pure integer arithmetic (no division, no double
    * round-trip that would lose precision past 2^53). */
  private def binStart(a: Column, w: Long): Column =
    a.cast("long") - pmod(a.cast("long"), lit(w))
}
