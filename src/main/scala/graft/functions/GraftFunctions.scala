package graft.functions

import org.apache.spark.sql.{Column, GraftShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

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
    "approx_distinct" -> { es => HyperLogLogPlusPlus(es.head).toAggregateExpression() },
    "approx_percentile_cont" -> { es =>
      new ApproximatePercentile(es(0), es(1)).toAggregateExpression() },
    "approx_median" -> { es =>
      new ApproximatePercentile(es.head, Literal(0.5d)).toAggregateExpression() },
    "var" -> { es => VarianceSamp(es.head).toAggregateExpression() },
    "covar" -> { es => CovSample(es(0), es(1)).toAggregateExpression() },
    "correlation" -> { es => Corr(es(0), es(1)).toAggregateExpression() },
    // -- strings (proto:453-511) ----------------------------------------
    "strpos" -> { es => StringInstr(es(0), es(1)) },
    // -- regex: DataFusion regexp_match returns the matched substrings
    "regexp_match" -> { es =>
      RegExpExtractAll(es(0), es(1), if (es.length > 2) es(2) else Literal(0)) },
    // -- crypto (proto:456,484,495-498); Spark returns hex strings
    "sha224" -> { es => Sha2(es.head, Literal(224)) },
    "sha384" -> { es => Sha2(es.head, Literal(384)) },
    "sha512" -> { es => Sha2(es.head, Literal(512)) },
    "digest" -> { es => digestBuilder(es) },
    // -- timestamps at fixed precision (proto:505-507) ------------------
    "to_timestamp_seconds" -> { es => truncTs(es.head, 1000000L) },
    "to_timestamp_millis"  -> { es => truncTs(es.head, 1000L) },
    "to_timestamp_micros"  -> { es => truncTs(es.head, 1L) },
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

  /** Parse-to-timestamp then truncate to the named precision: reference
    * `to_timestamp_millis` et al parse strings / reinterpret ints at that
    * unit (DataFusion semantics). Resolution is deferred (input types are
    * unknown at registration), so integers are handled by the general
    * cast path: int seconds→timestamp cast matches the seconds variant,
    * and sub-unit truncation is a no-op for it. */
  private def truncTs(e: Expression, quantumMicros: Long): Expression = {
    val ts = Cast(e, TimestampType)
    if (quantumMicros == 1L) ts
    else {
      val us = UnixMicros(ts)
      MicrosToTimestamp(Subtract(us, Pmod(us, Literal(quantumMicros))))
    }
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

  @volatile private var registered = Set.empty[SparkSession]

  /** Idempotently register the parity layer on a session. */
  def registerAll(spark: SparkSession): Unit = synchronized {
    if (!registered.contains(spark)) {
      val reg = GraftShim.functionRegistry(spark)
      aliases.foreach { case (name, b) =>
        reg.createOrReplaceTempFunction(name, es => b(es), "graft")
      }
      // weighted approximate percentile: custom aggregator (SURVEY §2C —
      // APPROX_PERCENTILE_CONT_WITH_WEIGHT has no Spark builtin)
      spark.udf.register("approx_percentile_cont_with_weight",
        org.apache.spark.sql.functions.udaf(new WeightedPercentile()))
      registered += spark
    }
  }
}
