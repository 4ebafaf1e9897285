package graft.functions

import org.apache.spark.sql.{Column, GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String}

/**
 * Function-parity layer: every spelling the reference engine accepts
 * (DataFusion `ScalarFunction` enum, reference:
 * ballista/core/proto/datafusion.proto:448-522, and `AggregateFunction`,
 * proto:529-549) resolves in our sessions too. Where Spark has the same
 * builtin under a different name we register a thin Catalyst-expression
 * alias (stays inside whole-stage codegen — no UDF overhead); where Spark
 * has no equivalent (`date_bin`, `current_time`,
 * `approx_percentile_cont_with_weight`) we supply a custom implementation.
 */
object GraftFunctions {

  private type Builder = Seq[Expression] => Expression

  /** All alias registrations: name → expression builder. */
  private def aliases: Seq[(String, Builder)] = Seq(
    // -- aggregates (proto:529-549) -------------------------------------
    // rsd 0.008 ≈ the reference's fixed 16384-register HLL
    // (DataFusion approx_distinct), not Spark's looser 0.05 default.
    "approx_distinct" -> { es =>
      HyperLogLogPlusPlus(es.head, relativeSD = 0.008).toAggregateExpression() },
    "approx_percentile_cont" -> { es =>
      new ApproximatePercentile(es(0), es(1)).toAggregateExpression() },
    "approx_median" -> { es =>
      new ApproximatePercentile(es.head, Literal(0.5d)).toAggregateExpression() },
    "array_agg" -> { es => CollectList(es.head).toAggregateExpression() },
    "var" -> { es => VarianceSamp(es.head).toAggregateExpression() },
    "covar" -> { es => CovSample(es(0), es(1)).toAggregateExpression() },
    "correlation" -> { es => Corr(es(0), es(1)).toAggregateExpression() },
    // -- math (proto:449-468): DataFusion dialect divergences ------------
    // DataFusion/DuckDB log(x) is base-10 (Spark's log(x) is ln);
    // two-arg log(base, x) agrees.
    "log" -> { es =>
      if (es.size == 1) Log10(es.head) else Logarithm(es(0), es(1)) },
    // trunc(x[, digits]): truncate toward zero, double-preserving.
    // x - (x % 1) keeps the dividend's sign, so it truncates toward zero
    // for negatives too and never overflows a long the way floor() casts
    // would. The reference proto's Trunc (datafusion.proto:468) is
    // single-arg; the 2-arg form is an extension matching later
    // DataFusion's scale-by-10^d formulation, and deliberately inherits
    // its binary-float artifacts (trunc(0.29, 2) = 0.28 because
    // 0.29*100 = 28.999...): decimal-exact truncation is what
    // CAST(x AS DECIMAL(p, d)) is for.
    "trunc" -> { es =>
      def t(e: Expression): Expression =
        Subtract(e, Remainder(e, Literal(1.0d)))
      val x = Cast(es.head, DoubleType)
      if (es.size == 1) t(x)
      else {
        val scale = Pow(Literal(10.0d), Cast(es(1), DoubleType))
        Divide(t(Multiply(x, scale)), scale)
      } },
    // -- strings (proto:453-511) ----------------------------------------
    "strpos" -> { es => StringInstr(es(0), es(1)) },
    // DataFusion spells it starts_with; Spark's builtin is startswith
    "starts_with" -> { es => StartsWith(es(0), es(1)) },
    // DataFusion to_hex(int) is lowercase; Spark hex() is uppercase
    "to_hex" -> { es => Lower(Hex(es.head)) },
    // -- regex (proto:470): see regexpMatchBuilder for semantics
    "regexp_match" -> regexpMatchBuilder _,
    // -- crypto (proto:456,484,495-498); Spark returns hex strings
    "sha224" -> { es => Sha2(es.head, Literal(224)) },
    "sha256" -> { es => Sha2(es.head, Literal(256)) },
    "sha384" -> { es => Sha2(es.head, Literal(384)) },
    "sha512" -> { es => Sha2(es.head, Literal(512)) },
    "digest" -> { es => digestBuilder(es) },
    // -- timestamps at fixed precision (proto:505-507); integral input is
    // reinterpreted at the named unit (DataFusion semantics), dispatched
    // post-resolution by ToTimestampAtUnit.
    "to_timestamp_seconds" -> { es => ToTimestampAtUnit(es.head, 1000000L) },
    "to_timestamp_millis"  -> { es => ToTimestampAtUnit(es.head, 1000L) },
    "to_timestamp_micros"  -> { es => ToTimestampAtUnit(es.head, 1L) },
    // -- vectors: native codegen dot product (see VecDot scaladoc); the
    // SQL entry point casts so array<float> embeddings work directly.
    "vec_dot" -> { es =>
      VecDot(Cast(es(0), ArrayType(DoubleType)),
        Cast(es(1), ArrayType(DoubleType))) },
    // -- misc (proto:449-521) -------------------------------------------
    "arrow_typeof" -> { es => new TypeOf(es.head) },
    "random" -> { _ => new Rand() },
    "make_array" -> { es => CreateArray(es) },
    // DataFusion date_bin(stride, source[, origin]) (proto:515)
    "date_bin" -> dateBinBuilder _,
    // DataFusion current_time → TIME64(ns); Spark has no TIME type, we map
    // to ns-since-midnight-UTC LongType (SURVEY §1 type table).
    "current_time" -> { _ =>
      Multiply(
        Pmod(UnixMicros(Now()), Literal(86400000000L)),
        Literal(1000L)) }
  )

  private def digestBuilder(es: Seq[Expression]): Expression = {
    val algo = es(1) match {
      case Literal(s, StringType) => s.toString.toLowerCase
      case other => throw new IllegalArgumentException(
        s"digest() algorithm must be a string literal, got $other")
    }
    algo match {
      case "md5"    => Md5(es.head)
      case "sha224" => Sha2(es.head, Literal(224))
      case "sha256" => Sha2(es.head, Literal(256))
      case "sha384" => Sha2(es.head, Literal(384))
      case "sha512" => Sha2(es.head, Literal(512))
      case "sha1"   => Sha1(es.head)
      case other    => throw new IllegalArgumentException(s"digest: unknown algorithm $other")
    }
  }

  /**
   * DataFusion `regexp_match(subject, pattern[, flags])` (proto:470):
   * returns the capture groups of the FIRST match as an array (the full
   * match when the pattern has no groups), or NULL when there is no
   * match. The optional third argument is a flags string ('i' =
   * case-insensitive), applied by rewriting to an inline `(?i)` prefix.
   * The pattern (and flags) must be string literals — true of every
   * in-repo reference usage — so the capture-group count is known at
   * plan time and the whole thing compiles to codegen-capable builtins.
   */
  private def regexpMatchBuilder(es: Seq[Expression]): Expression = {
    val subject = es(0)
    val rawPattern = es(1) match {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"regexp_match pattern must be a string literal, got $other")
    }
    val flags = es.drop(2).headOption.map {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"regexp_match flags must be a string literal, got $other")
    }.getOrElse("")
    val inline = flags.filter("imsx".contains(_)) match {
      case "" => ""
      case f  => s"(?$f)"
    }
    val pattern = Literal(inline + rawPattern)
    val nGroups = countCaptureGroups(rawPattern)
    val parts =
      if (nGroups == 0) Seq(RegExpExtract(subject, pattern, Literal(0)))
      else (1 to nGroups).map(i => RegExpExtract(subject, pattern, Literal(i)))
    If(RLike(subject, pattern),
      CreateArray(parts),
      Literal(null, ArrayType(StringType)))
  }

  /** Count unescaped capturing groups `(`. `(?...)` forms are
    * non-capturing EXCEPT named groups `(?<name>...)` — which Java counts
    * as capturing — while lookbehinds `(?<=` / `(?<!` are not. */
  private[graft] def countCaptureGroups(pattern: String): Int = {
    var i = 0; var n = 0; var inClass = false
    while (i < pattern.length) {
      pattern.charAt(i) match {
        case '\\' => i += 1 // skip escaped char
        case '[' if !inClass => inClass = true
        case ']' if inClass  => inClass = false
        case '(' if !inClass =>
          val next = if (i + 1 < pattern.length) pattern.charAt(i + 1) else ' '
          if (next != '?') n += 1
          else {
            val third = if (i + 2 < pattern.length) pattern.charAt(i + 2) else ' '
            val fourth = if (i + 3 < pattern.length) pattern.charAt(i + 3) else ' '
            if (third == '<' && fourth != '=' && fourth != '!') n += 1 // (?<name>...)
          }
        case _ =>
      }
      i += 1
    }
    n
  }

  /**
   * `date_bin(stride, source[, origin])` — no Spark builtin (SURVEY §2C).
   * Semantics (DataFusion): snap `source` down onto a grid of width
   * `stride` anchored at `origin` (default epoch):
   * `bin = source - ((source - origin) mod stride)` with positive mod, so
   * pre-origin timestamps bin correctly too. Composed from codegen-capable
   * catalyst expressions — stays inside whole-stage codegen.
   */
  def dateBinBuilder(es: Seq[Expression]): Expression = {
    val strideMicros: Long = es(0) match {
      case Literal(ci: CalendarInterval, CalendarIntervalType) =>
        require(ci.months == 0, "date_bin month strides are not supported")
        ci.days * 86400000000L + ci.microseconds
      case Literal(v: Long, _: DayTimeIntervalType) => v
      case Literal(v, LongType | IntegerType) => v.toString.toLong
      case other => throw new IllegalArgumentException(
        s"date_bin stride must be a foldable interval literal, got $other")
    }
    val source = Cast(es(1), TimestampType)
    val originUs: Expression =
      if (es.length > 2) UnixMicros(Cast(es(2), TimestampType)) else Literal(0L)
    val us = UnixMicros(source)
    MicrosToTimestamp(
      Subtract(us, Pmod(Subtract(us, originUs), Literal(strideMicros))))
  }

  /** Column-API form of date_bin for DataFrame users. */
  def date_bin(stride: Column, source: Column, origin: Column): Column =
    GraftShim.column(dateBinBuilder(
      Seq(GraftShim.expression(stride), GraftShim.expression(source),
        GraftShim.expression(origin))))

  /** The alias table as `SparkSessionExtensions.injectFunction`
    * descriptions — the deployment path for getting the parity layer into
    * EVERY session of a cluster via `spark.sql.extensions=graft.GraftExtensions`
    * (no façade call needed). */
  private[graft] def injectables: Seq[(org.apache.spark.sql.catalyst.FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression)] =
    aliases.map { case (name, b) =>
      (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new ExpressionInfo(GraftFunctions.getClass.getCanonicalName, name),
        b)
    }

  /**
   * Register the parity layer on a session. Idempotent and cheap
   * (`createOrReplaceTempFunction` replaces in place), so no per-session
   * guard is kept — the round-1 `Set[SparkSession]` guard leaked every
   * session it ever saw.
   */
  def registerAll(spark: SparkSession): Unit = {
    val reg = GraftShim.functionRegistry(spark)
    aliases.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, es => b(es), "scala_udf")
    }
    // weighted approximate percentile: custom aggregator (SURVEY §2C —
    // APPROX_PERCENTILE_CONT_WITH_WEIGHT has no Spark builtin)
    spark.udf.register("approx_percentile_cont_with_weight",
      org.apache.spark.sql.functions.udaf(new WeightedPercentile()))
  }
}
