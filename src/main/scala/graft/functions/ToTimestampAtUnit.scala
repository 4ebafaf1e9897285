package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/**
 * `to_timestamp_seconds/_millis/_micros(e)` with reference-dialect
 * semantics (reference: ballista/core/proto/datafusion.proto:505-507):
 *
 *  - integral input is reinterpreted as a count of the named unit since
 *    the epoch (DataFusion `to_timestamp_millis(1500)` = 1.5 s, NOT the
 *    seconds-based cast Spark would perform);
 *  - string/timestamp input is parsed/cast to timestamp and then
 *    truncated DOWN to the named precision.
 *
 * Implemented as a [[RuntimeReplaceable]] so we can dispatch on the
 * resolved input type while staying inside whole-stage codegen (the
 * replacement is built purely from codegen-capable builtins).
 */
case class ToTimestampAtUnit(child: Expression, unitMicros: Long)
    extends UnaryExpression with RuntimeReplaceable {

  override lazy val replacement: Expression = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType => unitMicros match {
      case 1000000L => SecondsToTimestamp(child)
      case 1000L    => MillisToTimestamp(child)
      case _        => MicrosToTimestamp(child)
    }
    case _ =>
      // Explicit zone: the analyzer's ResolveTimeZone rule does not descend
      // into a RuntimeReplaceable's `replacement`, so an unadorned Cast
      // would stay unresolved.
      val tz = org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone
      val ts = Cast(child, TimestampType, Some(tz))
      if (unitMicros == 1L) ts
      else {
        val us = UnixMicros(ts)
        MicrosToTimestamp(Subtract(us, Pmod(us, Literal(unitMicros))))
      }
  }

  override protected def withNewChildInternal(newChild: Expression): ToTimestampAtUnit =
    copy(child = newChild)
}
