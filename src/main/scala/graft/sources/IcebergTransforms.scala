package graft.sources

/**
 * Iceberg partition-transform math needed for planning-time pruning —
 * specifically `bucket[N]`, which the public table spec (Appendix B,
 * https://iceberg.apache.org/spec/#appendix-b-32-bit-hash-requirements)
 * defines as
 *
 *   bucket(v) = (murmur3_x86_32(serialize(v), seed = 0) & Int.MaxValue) % N
 *
 * with a fixed per-type serialization: int/long/date/time/timestamp hash
 * their value widened to a LITTLE-ENDIAN 8-byte long (so `bucket(34: Int)`
 * == `bucket(34L)` — the spec's type-promotion guarantee), strings hash
 * their UTF-8 bytes, binary hashes raw bytes. The spec publishes test
 * vectors (34 -> 2017239379, "iceberg" -> 1210000089, ...) which
 * IcebergSpec pins, so this stays anchored to the published algorithm
 * rather than to itself.
 *
 * Reference analog: the fork scans Iceberg through `iceberg-rust`'s
 * transform module (reference: Cargo.toml:43-45); here only the hash is
 * needed — pruning compares a transformed filter value against the bucket
 * ordinals recorded in manifest partition tuples.
 */
object IcebergTransforms {

  /** Canonical MurmurHash3 x86 32-bit (Austin Appleby's public-domain
    * algorithm), the variant the Iceberg spec mandates. Spark's internal
    * Murmur3 is NOT this for long inputs (it hashes longs natively, not
    * their little-endian bytes), hence a direct implementation. */
  private[sources] def murmur3x86_32(data: Array[Byte], seed: Int): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    val len = data.length
    var h1 = seed
    val nblocks = len >>> 2
    var i = 0
    while (i < nblocks) {
      val base = i << 2
      var k1 = (data(base) & 0xff) | ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) | ((data(base + 3) & 0xff) << 24)
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = nblocks << 2
    if ((len & 3) >= 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if ((len & 3) >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if ((len & 3) >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1
    }
    h1 ^= len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** Spec serialization for integral types: the value widened to long,
    * as 8 little-endian bytes. */
  private def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var x = v
    var i = 0
    while (i < 8) { b(i) = (x & 0xffL).toByte; x >>>= 8; i += 1 }
    murmur3x86_32(b, 0)
  }

  /** The 32-bit hash underlying bucket[N] (before the modulo). */
  def bucketHash(v: Any): Int = v match {
    case i: Int         => hashLong(i.toLong)
    case l: Long        => hashLong(l)
    case s: String      => murmur3x86_32(s.getBytes("UTF-8"), 0)
    case b: Array[Byte] => murmur3x86_32(b, 0)
    case d: java.sql.Date      => hashLong(d.toLocalDate.toEpochDay)
    case d: java.time.LocalDate => hashLong(d.toEpochDay)
    case other => throw new IllegalArgumentException(
      s"bucket transform not supported for value type " +
        s"${other.getClass.getSimpleName} (int/long/string/binary/date)")
  }

  /** Bucket ordinal: `(hash & Int.MaxValue) % n` per spec. */
  def bucket(n: Int, v: Any): Int = {
    require(n > 0, s"bucket width must be positive, got $n")
    (bucketHash(v) & Integer.MAX_VALUE) % n
  }

  // ---------------------------------------------------- time transforms
  // The spec's partition ordinals: year = years from 1970, month = months
  // from 1970-01, day = days from 1970-01-01, hour = hours from
  // 1970-01-01T00:00. Timestamps without zone are treated as UTC (the
  // spec's `timestamp` type carries no zone; `timestamptz` values arrive
  // here already as instants).

  private def toLocalDate(v: Any): java.time.LocalDate = v match {
    case d: java.time.LocalDate     => d
    case d: java.sql.Date           => d.toLocalDate
    case t: java.time.LocalDateTime => t.toLocalDate
    case t: java.time.Instant       =>
      t.atOffset(java.time.ZoneOffset.UTC).toLocalDate
    case t: java.sql.Timestamp      => t.toLocalDateTime.toLocalDate
    case other => throw new IllegalArgumentException(
      s"time transform needs a date/timestamp value, got " +
        other.getClass.getSimpleName)
  }

  private def toEpochSecond(v: Any): Long = v match {
    case t: java.time.LocalDateTime => t.toEpochSecond(java.time.ZoneOffset.UTC)
    case t: java.time.Instant       => t.getEpochSecond
    case t: java.sql.Timestamp      =>
      t.toLocalDateTime.toEpochSecond(java.time.ZoneOffset.UTC)
    case other => throw new IllegalArgumentException(
      s"hour transform needs a timestamp value, got " +
        other.getClass.getSimpleName)
  }

  /** `year` partition ordinal: years from 1970. */
  def yearOrdinal(v: Any): Int = toLocalDate(v).getYear - 1970

  /** `month` partition ordinal: months from 1970-01. */
  def monthOrdinal(v: Any): Int = {
    val d = toLocalDate(v)
    (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
  }

  /** `day` partition ordinal: days from 1970-01-01 (the epoch day). */
  def dayOrdinal(v: Any): Int = Math.toIntExact(toLocalDate(v).toEpochDay)

  /** `hour` partition ordinal: hours from 1970-01-01T00:00 UTC. */
  def hourOrdinal(v: Any): Int =
    Math.toIntExact(Math.floorDiv(toEpochSecond(v), 3600L))

  // ------------------------------------------- single-value serialization
  // The spec's binary form for manifest column bounds (Appendix D):
  // int/date = 4-byte little-endian, long/timestamp = 8-byte LE,
  // float/double = IEEE bits LE, string = UTF-8 bytes.

  private def le(bits: Long, n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    var x = bits; var i = 0
    while (i < n) { b(i) = (x & 0xffL).toByte; x >>>= 8; i += 1 }
    b
  }

  private def leToLong(b: Array[Byte]): Long = {
    var x = 0L; var i = b.length - 1
    while (i >= 0) { x = (x << 8) | (b(i) & 0xffL); i -= 1 }
    x
  }

  /** Serialize a bound value to the spec's binary single-value form.
    * Decimals are the UNSCALED value as minimal big-endian
    * two's-complement bytes (exactly `BigInteger.toByteArray`); the
    * scale is carried by the column type, not the bytes. */
  def serializeBound(v: Any): Array[Byte] = v match {
    case i: Int             => le(i.toLong, 4)
    case l: Long            => le(l, 8)
    case f: Float           => le(java.lang.Float.floatToIntBits(f).toLong, 4)
    case d: Double          => le(java.lang.Double.doubleToLongBits(d), 8)
    case s: String          => s.getBytes("UTF-8")
    case d: java.sql.Date   => le(d.toLocalDate.toEpochDay, 4)
    case d: java.time.LocalDate => le(d.toEpochDay, 4)
    case d: java.math.BigDecimal => d.unscaledValue().toByteArray
    case d: BigDecimal      => d.underlying().unscaledValue().toByteArray
    case other => throw new IllegalArgumentException(
      s"bound serialization not supported for ${other.getClass.getSimpleName}")
  }

  /** Deserialize a decimal bound: big-endian two's-complement unscaled
    * bytes + the column's scale. */
  def deserializeDecimal(b: Array[Byte], scale: Int): java.math.BigDecimal =
    new java.math.BigDecimal(new java.math.BigInteger(b), scale)

  /** Deserialize a bound for comparisons, by the column's Iceberg type
    * class: "int"/"date" → Int, "long" → Long, "float" → Float,
    * "double" → Double, "string" → String. */
  def deserializeBound(typeName: String, b: Array[Byte]): Any = typeName match {
    case "int" | "date"          => leToLong(b).toInt
    case "long" | "timestamp" | "timestamptz" => leToLong(b)
    case "float"  => java.lang.Float.intBitsToFloat(leToLong(b).toInt)
    case "double" => java.lang.Double.longBitsToDouble(leToLong(b))
    case "string" => new String(b, "UTF-8")
    case other => throw new IllegalArgumentException(
      s"bound deserialization not supported for Iceberg type '$other'")
  }

  /** Epoch-micros of a timestamp column as a SQL fragment, session-TZ
    * independent. TimestampType is an instant — `unix_micros` is exact.
    * TimestampNTZType is a wall clock the spec reads as UTC; a
    * `cast(x as timestamp)` would re-interpret it in the SESSION zone
    * (latent mis-scoping in a non-UTC session — ADVICE r8), so the
    * micros are assembled arithmetically from date + time-of-day
    * fields, which are zone-free on NTZ: epoch-day × 86400000000 +
    * hour/minute + `date_part('SECOND')` (a DECIMAL(8,6) carrying the
    * sub-second fraction exactly). Valid for pre-1970 values too —
    * negative epoch-day plus a non-negative intra-day offset. */
  private def epochMicrosSql(src: String,
                             dt: org.apache.spark.sql.types.DataType): String =
    dt match {
      case org.apache.spark.sql.types.TimestampType => s"unix_micros($src)"
      case org.apache.spark.sql.types.TimestampNTZType =>
        s"cast(datediff(cast($src as date), date'1970-01-01') as bigint) " +
          s"* 86400000000 + hour($src) * 3600000000 + " +
          s"minute($src) * 60000000 + " +
          s"cast(date_part('SECOND', $src) * 1000000 as bigint)"
      case other => throw new IllegalArgumentException(
        s"epoch micros not defined on $other")
    }

  /** The value a MANIFEST partition tuple stores for `transform` over
    * `src`, recomputed per data row. Differs from [[sparkColumn]] only
    * for identity over date/timestamp: the writer computes the tuple
    * from the raw column and converts to the spec's epoch ordinals when
    * serializing the manifest, so a reader re-deriving the stored tuple
    * (the partition-scoped delete join) must apply the same ordinal
    * mapping. Identity over other unsupported types (e.g. decimal,
    * stored as unscaled bytes) still throws — callers fail loudly
    * rather than silently mis-scope. */
  def storedColumn(transformName: String, src: String,
                   dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col => c, _}
    import org.apache.spark.sql.types._
    (transformName, dt) match {
      case ("identity", IntegerType | LongType | StringType | BooleanType) =>
        c(src)
      case ("identity", DateType) =>
        datediff(c(src), to_date(lit("1970-01-01")))
      case ("identity", TimestampType | TimestampNTZType) =>
        expr(s"cast((${epochMicrosSql(src, dt)}) as bigint)")
      case ("identity", other) => throw new IllegalArgumentException(
        s"identity partition over $other has no stored-form mapping")
      case _ => sparkColumn(transformName, src, dt)
    }
  }

  /**
   * The STORED partition value of `transform` over source column `src`
   * as a Spark Column — shared by the fixture writer (computing the
   * tuple to record) and the scan's partition-scoped delete join
   * (recomputing the tuple per data row). One mapping, so writer and
   * reader can never disagree on a transform's Spark form.
   */
  def sparkColumn(transformName: String, src: String,
                  dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.Column = {
    // NB: `transform` would clash with functions.transform once the
    // wildcard import is in scope
    import org.apache.spark.sql.functions.{col => c, _}
    import org.apache.spark.sql.types._
    val W = "\\d+".r.findFirstIn(transformName).map(_.toInt)
    (transformName, dt) match {
      case ("identity", _) => c(src)
      case ("void", _)     => lit(null).cast("int")
      // spec time-transform ordinals; date sources (hour: timestamps)
      case ("year", DateType)  => year(c(src)) - lit(1970)
      case ("month", DateType) =>
        (year(c(src)) - lit(1970)) * lit(12) + month(c(src)) - lit(1)
      case ("day", DateType)   => datediff(c(src), to_date(lit("1970-01-01")))
      case ("hour", TimestampNTZType) | ("hour", TimestampType) =>
        // Spec ordinal is FLOOR(micros / hour) — Java impl uses
        // Math.floorDiv — but SQL `div` truncates toward zero, which
        // differs for pre-1970 values off an hour boundary
        // (1969-12-31T23:30 is hour -1, not 0). pmod is non-negative,
        // so (m - pmod(m, w)) is the largest multiple of w ≤ m and the
        // div below is exact floor division, overflow-free (no doubles).
        val m = s"(${epochMicrosSql(src, dt)})"
        expr(s"cast(($m - pmod($m, 3600000000)) div 3600000000 as int)")
      case (tt, other) if Set("year", "month", "day", "hour")(tt) =>
        throw new IllegalArgumentException(
          s"$tt transform not supported on $other")
      case (b, srcDt) if b.startsWith("bucket") =>
        val n = W.get
        val u = srcDt match {
          case IntegerType => udf((x: java.lang.Integer) =>
            if (x == null) null else Int.box(IcebergTransforms.bucket(n, x.intValue())))
          case LongType => udf((x: java.lang.Long) =>
            if (x == null) null else Int.box(IcebergTransforms.bucket(n, x.longValue())))
          case StringType => udf((x: String) =>
            if (x == null) null else Int.box(IcebergTransforms.bucket(n, x)))
          case DateType => udf((x: java.sql.Date) =>
            if (x == null) null else Int.box(IcebergTransforms.bucket(n, x)))
          case other => throw new IllegalArgumentException(
            s"bucket transform not supported on $other")
        }
        u(c(src))
      case (t, IntegerType) if t.startsWith("truncate") =>
        c(src) - pmod(c(src), lit(W.get))
      case (t, LongType) if t.startsWith("truncate") =>
        c(src) - pmod(c(src), lit(W.get))
      case (t, StringType) if t.startsWith("truncate") =>
        substring(c(src), 1, W.get)
      case (t, other) =>
        throw new IllegalArgumentException(
          s"transform '$t' not supported on $other")
    }
  }
}
