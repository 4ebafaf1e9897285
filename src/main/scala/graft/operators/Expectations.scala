package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality expectations — the validation pass a training
 * pipeline runs over every ingested batch BEFORE it mixes into the
 * corpus (the Great-Expectations / dbt-test shape, re-expressed as
 * Spark aggregates): each check declares a property, [[Expectations
 * .validate]] evaluates ALL of them and returns one verdict row per
 * check `(check, kind, n_rows, n_violations, pass)`.
 *
 * Scale shape: every ROW-GRAIN check (not-null, range, regex, set
 * membership) compiles to one `sum(when(violated, 1))` aggregate
 * column, so ANY number of row-grain checks costs exactly ONE pass over
 * the data (map-side partial aggregation, one 1-row result). The two
 * relation-grain checks pay for what they assert: [[Expectations
 * .Unique]] is one count-distinct shuffle on the key tuple,
 * [[Expectations.RefIntegrity]] one anti-join against the (broadcast
 * when small) dimension — both the minimum possible. Nothing collects
 * more than one row per check to the driver.
 *
 * All verdict arithmetic is exact integer counting, so a DuckDB replay
 * is bit-exact (entry `cur_expectations`).
 */
object Expectations {

  sealed trait Check { def name: String }

  /** `column IS NOT NULL` on every row. */
  final case class NotNull(name: String, column: String) extends Check

  /** `lo <= column <= hi` (closed range); NULL values count as
    * violations (an absent measurement fails a range assertion). */
  final case class InRange(name: String, column: String, lo: Column,
                           hi: Column) extends Check

  /** `column RLIKE regex` — keep the pattern in the java.regex ∩ RE2
    * subset if the check must replay cross-engine. NULL violates. */
  final case class Matches(name: String, column: String, regex: String)
    extends Check

  /** `column IN values`. NULL violates (it is not a member). */
  final case class InSet(name: String, column: String,
                         values: Seq[String]) extends Check

  /** The key tuple is unique across the relation. Violations = rows in
    * excess of one per distinct tuple (NULLs compare null-safe, i.e. two
    * all-NULL tuples collide). */
  final case class Unique(name: String, columns: Seq[String]) extends Check

  /** Every (non-null) key tuple exists in `dim(dimColumns)` — foreign-key
    * integrity. Violations = rows whose tuple has no match; rows with any
    * NULL key component are skipped (SQL FK semantics). */
  final case class RefIntegrity(name: String, columns: Seq[String],
                                dim: DataFrame, dimColumns: Seq[String])
    extends Check

  private def rowViolation(c: Check): Option[Column] = c match {
    case NotNull(_, col0) => Some(col(col0).isNull)
    case InRange(_, col0, lo, hi) =>
      Some(!(col(col0) >= lo && col(col0) <= hi) || col(col0).isNull)
    case Matches(_, col0, re) =>
      Some(!col(col0).rlike(re) || col(col0).isNull)
    case InSet(_, col0, vs) =>
      Some(!col(col0).isin(vs: _*) || col(col0).isNull)
    case _ => None
  }

  private def kind(c: Check): String = c match {
    case _: NotNull      => "not_null"
    case _: InRange      => "in_range"
    case _: Matches      => "matches"
    case _: InSet        => "in_set"
    case _: Unique       => "unique"
    case _: RefIntegrity => "ref_integrity"
  }

  /**
   * Evaluate every check against `df`; returns
   * `(check, kind, n_rows, n_violations, pass)` — one row per check,
   * `n_rows` = total relation rows for row-grain and unique checks, the
   * evaluated (non-null-key) row count for referential checks.
   */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "validate: no checks given")
    require(checks.map(_.name).distinct.size == checks.size,
      "validate: duplicate check names")

    val rowChecks = checks.filter(rowViolation(_).isDefined)
    val rowFrame: Option[DataFrame] =
      if (rowChecks.isEmpty) None
      else {
        // coalesce: `sum` over ZERO rows is NULL — an empty relation
        // (a quiet streaming micro-batch) must verdict as 0 violations
        val aggs = count(lit(1)).cast("long").as("__n") +:
          rowChecks.map(c => coalesce(sum(when(rowViolation(c).get, 1L)
            .otherwise(0L)), lit(0L)).as(s"__v_${c.name}"))
        val one = df.agg(aggs.head, aggs.tail: _*)
        // one row -> one verdict row per check via an inline exploded map
        Some(one.select(explode(map(rowChecks.flatMap(c =>
            Seq(lit(c.name), col(s"__v_${c.name}"))): _*)).as(Seq("check", "n_violations")),
          col("__n").as("n_rows")))
      }

    val kinds = checks.map(c => c.name -> kind(c)).toMap
    val grainFrames: Seq[DataFrame] = checks.flatMap {
      case Unique(name, cols0) =>
        val keyed = df.groupBy(cols0.map(col): _*)
          .agg(count(lit(1)).cast("long").as("__c"))
        Some(keyed.agg(
          coalesce(sum(col("__c")), lit(0L)).cast("long").as("n_rows"),
          coalesce(sum(col("__c") - lit(1L)), lit(0L)).cast("long")
            .as("n_violations"))
          .select(lit(name).as("check"), col("n_violations"), col("n_rows")))
      case RefIntegrity(name, cols0, dim, dimCols) =>
        require(cols0.size == dimCols.size,
          s"ref_integrity $name: column arity mismatch")
        val nonNull = df.filter(cols0.map(col(_).isNotNull).reduce(_ && _))
        val dimKeys = dim.select(dimCols.zip(cols0)
          .map { case (d, f) => col(d).as(f) }: _*).distinct()
        val missing = nonNull.join(broadcast(dimKeys), cols0, "left_anti")
        Some(nonNull.agg(count(lit(1)).cast("long").as("n_rows"))
          .crossJoin(missing.agg(count(lit(1)).cast("long")
            .as("n_violations")))
          .select(lit(name).as("check"), col("n_violations"), col("n_rows")))
      case _ => None
    }

    val verdictCols = (f: DataFrame) => f.select(col("check"),
      element_at(typedLit(kinds), col("check")).as("kind"),
      col("n_rows"), col("n_violations"),
      (col("n_violations") === 0L).as("pass"))
    (rowFrame.toSeq ++ grainFrames).map(verdictCols)
      .reduce(_ unionByName _)
  }
}
