package graft.sources

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * Executable Avro container-file source/sink (reference `read_avro` /
 * `register_avro`: ballista/client/src/context.rs:227-234,272-280; proto
 * `AvroScanExecNode`: datafusion.proto:1169-1171).
 *
 * This environment ships no `spark-avro` connector jar, but the Apache
 * Avro CORE library (`avro-1.12.1.jar`) IS on the Spark classpath — so
 * rather than an inert API stub, this reads/writes real Avro object
 * container files through the public `org.apache.avro` API:
 *
 *  - READ: the file list is enumerated driver-side (cheap — same grain as
 *    Spark's own file-source listing), the writer schema is taken from the
 *    first container header, and the files are distributed one-per-task
 *    via `parallelize(files).flatMap(decode)`. Each task streams its file
 *    through `DataFileReader` — constant memory, no whole-file buffering.
 *    Scale note: parallelism is per-FILE (a single multi-TB .avro file
 *    would not be block-split the way the connector's sync-marker splitter
 *    would); real corpora ship many files, which is exactly this grain.
 *  - WRITE: one container file per partition via `DataFileWriter`
 *    (snappy-codec), written under `path/part-NNNNN.avro` — the same
 *    layout contract as Spark's file sinks on a shared filesystem.
 *
 * Type mapping (both directions): null/boolean/int/long/float/double/
 * string/bytes/fixed, enum→string, record→struct, array→array, map→map,
 * nullable as the 2-branch union `[null, T]`, plus logical types
 * date (int) and timestamp-micros/millis (long). Multi-branch non-null
 * unions are rejected with a clear message (no Spark analog).
 */
object AvroIO {

  // ---------------------------------------------------------------- schema

  /** Avro → Spark. Returns (dataType, nullable). */
  def toSparkType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.NULL    => (NullType, true)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.INT =>
      if (s.getLogicalType != null && s.getLogicalType.getName == "date")
        (DateType, false)
      else (IntegerType, false)
    case Schema.Type.LONG =>
      s.getLogicalType match {
        case lt if lt != null && lt.getName == "timestamp-micros" => (TimestampType, false)
        case lt if lt != null && lt.getName == "timestamp-millis" => (TimestampType, false)
        case _ => (LongType, false)
      }
    case Schema.Type.FLOAT  => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.STRING => (StringType, false)
    case Schema.Type.ENUM   => (StringType, false)
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      s.getLogicalType match {
        case d: org.apache.avro.LogicalTypes.Decimal =>
          (DecimalType(d.getPrecision, d.getScale), false)
        case _ => (BinaryType, false)
      }
    case Schema.Type.ARRAY =>
      val (et, en) = toSparkType(s.getElementType)
      (ArrayType(et, en), false)
    case Schema.Type.MAP =>
      val (vt, vn) = toSparkType(s.getValueType)
      (MapType(StringType, vt, vn), false)
    case Schema.Type.RECORD =>
      val fields = s.getFields.asScala.map { f =>
        val (dt, n) = toSparkType(f.schema())
        StructField(f.name(), dt, n)
      }.toArray
      (StructType(fields), false)
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      if (nonNull.size == 1) {
        val (dt, _) = toSparkType(nonNull.head)
        (dt, true)
      } else
        throw new IllegalArgumentException(
          s"unsupported Avro union with ${nonNull.size} non-null branches: $s " +
            "(only [null, T] nullable unions map to Spark)")
    case other =>
      throw new IllegalArgumentException(s"unsupported Avro type: $other")
  }

  def toSparkSchema(s: Schema): StructType = {
    require(s.getType == Schema.Type.RECORD,
      s"top-level Avro schema must be a record, got ${s.getType}")
    toSparkType(s)._1.asInstanceOf[StructType]
  }

  /** Spark → Avro. Nullable fields become `[null, T]` unions.
    * `timestampMillis` writes timestamp columns with the millis logical
    * type (ms precision — for consumers that reject micros); the default
    * is micros, Spark's native precision. */
  def toAvroSchema(st: StructType, recordName: String = "spark_row",
                   timestampMillis: Boolean = false): Schema = {
    def conv(dt: DataType, path: String): Schema = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
      case LongType    => Schema.create(Schema.Type.LONG)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case StringType  => Schema.create(Schema.Type.STRING)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      case DateType =>
        org.apache.avro.LogicalTypes.date()
          .addToSchema(Schema.create(Schema.Type.INT))
      case TimestampType | TimestampNTZType =>
        (if (timestampMillis) org.apache.avro.LogicalTypes.timestampMillis()
         else org.apache.avro.LogicalTypes.timestampMicros())
          .addToSchema(Schema.create(Schema.Type.LONG))
      case ArrayType(et, en) => Schema.createArray(nullable(conv(et, path + ".elem"), en))
      case MapType(StringType, vt, vn) =>
        Schema.createMap(nullable(conv(vt, path + ".value"), vn))
      case s: StructType => record(s, path.replace('.', '_'))
      case d: DecimalType =>
        // the standard Avro decimal logical type: two's-complement
        // unscaled value in bytes, precision/scale in the schema
        org.apache.avro.LogicalTypes.decimal(d.precision, d.scale)
          .addToSchema(Schema.create(Schema.Type.BYTES))
      case other =>
        throw new IllegalArgumentException(
          s"unsupported Spark type for Avro write at $path: $other")
    }
    def nullable(s: Schema, isNullable: Boolean): Schema =
      if (isNullable) Schema.createUnion(Schema.create(Schema.Type.NULL), s) else s
    def record(s: StructType, name: String): Schema = {
      val fields = s.fields.map { f =>
        new Schema.Field(f.name, nullable(conv(f.dataType, name + "." + f.name), f.nullable),
          null, null.asInstanceOf[AnyRef])
      }
      Schema.createRecord(name, null, "graft.avro", false, fields.toList.asJava)
    }
    record(st, recordName)
  }

  // ---------------------------------------------------------------- values

  /** Avro runtime value → Spark external Row value, guided by the SPARK
    * type (so logical date/timestamp longs land as java.sql types).
    * Shared with the V2 connector ([[AvroDataSourceV2]]). */
  private[sources] def valueToSpark(v: Any, dt: DataType, avro: Schema): Any =
    toSparkValue(v, dt, avro)

  private def toSparkValue(v: Any, dt: DataType, avro: Schema): Any = {
    if (v == null) return null
    val elemSchema =
      if (avro.getType == Schema.Type.UNION)
        avro.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(avro)
      else avro
    dt match {
      case StringType => v.toString // Utf8 | String | enum symbol
      case d: DecimalType =>
        val bytes = v match {
          case b: ByteBuffer =>
            val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
          case f: GenericData.Fixed => f.bytes()
          case a: Array[Byte] => a
        }
        new java.math.BigDecimal(new java.math.BigInteger(bytes), d.scale)
      case BinaryType => v match {
        case b: ByteBuffer =>
          val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
        case f: GenericData.Fixed => f.bytes().clone()
        case a: Array[Byte] => a
      }
      case DateType => java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(v.asInstanceOf[Number].longValue()))
      case TimestampType | TimestampNTZType =>
        val micros =
          if (elemSchema.getLogicalType != null &&
              elemSchema.getLogicalType.getName == "timestamp-millis")
            v.asInstanceOf[Number].longValue() * 1000L
          else v.asInstanceOf[Number].longValue()
        // Row encoders expect LocalDateTime for NTZ (a user-supplied NTZ
        // schema is invited by supportsExternalMetadata) — a Timestamp
        // here would ClassCastException deep inside the encoder.
        if (dt == TimestampNTZType)
          java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(micros, 1000000L),
            (Math.floorMod(micros, 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC)
        else
          java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
            Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L))
      case ArrayType(et, _) =>
        v.asInstanceOf[java.util.Collection[Any]].asScala
          .map(toSparkValue(_, et, elemSchema.getElementType)).toSeq
      case MapType(_, vt, _) =>
        v.asInstanceOf[java.util.Map[Any, Any]].asScala.map { case (k, mv) =>
          k.toString -> toSparkValue(mv, vt, elemSchema.getValueType)
        }.toMap
      case st: StructType =>
        val rec = v.asInstanceOf[GenericRecord]
        recordToRow(rec, st, elemSchema)
      case ByteType  => v.asInstanceOf[Number].byteValue()
      case ShortType => v.asInstanceOf[Number].shortValue()
      case _ => v // int/long/float/double/boolean pass through
    }
  }

  private def recordToRow(rec: GenericRecord, st: StructType, avro: Schema): Row = {
    val vals = new Array[Any](st.fields.length)
    var i = 0
    while (i < st.fields.length) {
      val f = st.fields(i)
      vals(i) = toSparkValue(rec.get(f.name), f.dataType, avro.getField(f.name).schema())
      i += 1
    }
    Row.fromSeq(vals.toIndexedSeq)
  }

  /** Spark external Row value → Avro runtime value. */
  private def toAvroValue(v: Any, dt: DataType, avro: Schema): Any = {
    if (v == null) return null
    val target =
      if (avro.getType == Schema.Type.UNION)
        avro.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(avro)
      else avro
    dt match {
      case StringType => v.toString
      case BinaryType => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case DateType => v match {
        case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
        case d: java.time.LocalDate => d.toEpochDay.toInt
      }
      case TimestampType | TimestampNTZType =>
        val inst = v match {
          case t: java.sql.Timestamp => t.toInstant
          case i: java.time.Instant => i
          case l: java.time.LocalDateTime => l.toInstant(java.time.ZoneOffset.UTC)
        }
        val micros = inst.getEpochSecond * 1000000L + inst.getNano / 1000L
        // write the unit the TARGET schema declares (micros by default;
        // millis when toAvroSchema ran with timestampMillis = true)
        if (target.getLogicalType != null &&
            target.getLogicalType.getName == "timestamp-millis")
          Math.floorDiv(micros, 1000L)
        else micros
      case ArrayType(et, _) =>
        v.asInstanceOf[scala.collection.Seq[Any]]
          .map(toAvroValue(_, et, target.getElementType)).asJava
      case MapType(_, vt, _) =>
        v.asInstanceOf[scala.collection.Map[String, Any]].map { case (k, mv) =>
          k -> toAvroValue(mv, vt, target.getValueType)
        }.asJava
      case st: StructType => rowToRecord(v.asInstanceOf[Row], st, target)
      case d: DecimalType =>
        val jbd = v match {
          case b: java.math.BigDecimal => b
          case b: BigDecimal           => b.bigDecimal
        }
        ByteBuffer.wrap(
          jbd.setScale(d.scale, java.math.RoundingMode.UNNECESSARY)
            .unscaledValue().toByteArray)
      case ByteType | ShortType => v.asInstanceOf[Number].intValue()
      case _ => v
    }
  }

  private[sources] def rowToRecordPub(row: Row, st: StructType, avro: Schema): GenericRecord =
    rowToRecord(row, st, avro)

  private def rowToRecord(row: Row, st: StructType, avro: Schema): GenericRecord = {
    val rec = new GenericData.Record(avro)
    var i = 0
    while (i < st.fields.length) {
      val f = st.fields(i)
      rec.put(f.name, toAvroValue(row.get(i), f.dataType, avro.getField(f.name).schema()))
      i += 1
    }
    rec
  }

  // ------------------------------------------------------------------- I/O
  // All file access resolves through the Hadoop FileSystem API
  // ([[GraftFs]]) — object-store URIs (s3a://, hdfs://, abfs://, gs://),
  // explicit file:// URIs (catalog tables hand locations over that way)
  // and plain local paths all work with one code path.

  /** `.avro` files under `path` as (full path, length) — one FileStatus
    * pass so split planning needs no per-file RPC. */
  private[sources] def listAvroStatuses(path: String): Seq[(String, Long)] = {
    val c = GraftFs.conf()
    val st = GraftFs.status(path, c).getOrElse(
      throw new java.io.FileNotFoundException(s"no such Avro path: $path"))
    val files =
      if (st.isDirectory)
        GraftFs.list(path, c)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
          .map(s => s.getPath.toString -> s.getLen)
      else Seq(st.getPath.toString -> st.getLen)
    require(files.nonEmpty, s"no .avro files under $path")
    files
  }

  private[sources] def listAvroFiles(path: String): Seq[String] =
    listAvroStatuses(path).map(_._1)

  /** Read an Avro container file (or directory of part files) as a
    * DataFrame. Schema is the writer schema of the first file — or the
    * caller's READER schema (`readerSchemaJson`), against which every
    * file is resolved by Avro's standard schema-resolution rules: fields
    * match by NAME (reorder-safe), reader-only fields take their
    * declared defaults, writer-only fields are skipped, and primitive
    * promotions (int→long, float→double, …) apply. This is schema
    * EVOLUTION ON READ: a corpus written over years under drifting
    * schemas reads back uniform — each file resolves independently, so
    * heterogeneous writer schemas across part files are fine.
    * Large containers split on byte ranges (sync-marker aligned at read
    * time, `spark.sql.files.maxPartitionBytes` contract — same as the V2
    * connector), so even ONE huge file parallelizes across tasks. */
  def read(spark: SparkSession, path: String,
           readerSchemaJson: Option[String] = None): DataFrame = {
    val files = listAvroStatuses(path)
    val sconf = GraftFs.serializableConf()
    val expectedSchema = readerSchemaJson match {
      case Some(json) => new Schema.Parser().parse(json)
      case None =>
        val r = new DataFileReader[GenericRecord](
          GraftFs.openSeekable(files.head._1, sconf.value),
          new GenericDatumReader[GenericRecord]())
        try r.getSchema finally r.close()
    }
    val sparkSchema = toSparkSchema(expectedSchema)
    val schemaJson = expectedSchema.toString // Schema isn't serializable: ship JSON
    val maxSplit = math.max(4096L,
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes",
          s"${128L * 1024 * 1024}")))
    // (file, start, length) byte-range splits: the reader syncs to the
    // first block boundary after `start` and stops once past the end —
    // every Avro block is read by exactly one split. Lengths come from
    // the single listing pass — no per-file stat RPC.
    val splits: Seq[(String, Long, Long)] = files.flatMap { case (f, len) =>
      val n = math.max(1L, (len + maxSplit - 1) / maxSplit)
      (0L until n).map(i =>
        (f, i * maxSplit, math.min(maxSplit, len - i * maxSplit)))
    }
    // one task per split, the same grain as the V2 connector (splits are
    // already bounded by maxPartitionBytes, so tasks stay right-sized)
    val rdd = spark.sparkContext.parallelize(splits, splits.size)
      .flatMap { case (file, start, length) =>
        val schema = new Schema.Parser().parse(schemaJson)
        val st = toSparkSchema(schema)
        // expected (reader) schema fixed here; the writer schema is taken
        // from each file's own header by DataFileReader — resolution is
        // per-file, which is what makes mixed-schema directories readable.
        val reader = new DataFileReader[GenericRecord](
          GraftFs.openSeekable(file, sconf.value),
          new GenericDatumReader[GenericRecord](null, schema))
        // Close on task completion too — a short-circuited task (limit,
        // failure) never exhausts the iterator, and the handle would
        // otherwise live until GC.
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => reader.close()))
        reader.sync(start) // sync(0) is safe: positions at the first block
        val end = start + length
        // Stream the range; hand the iterator off with a close-on-end.
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = reader.hasNext && !reader.pastSync(end)
            if (!h) reader.close()
            h
          }
          def next(): Row = recordToRow(reader.next(), st, schema)
        }
      }
    spark.createDataFrame(rdd, sparkSchema)
  }

  /** Write a DataFrame as Avro container files, one per partition, under
    * `path/part-NNNNN.avro` (snappy codec). Overwrites the directory.
    * `timestampMillis` selects the millis logical type for timestamps. */
  def write(df: DataFrame, path: String, timestampMillis: Boolean = false): Unit = {
    val st = df.schema
    val avroSchema = toAvroSchema(st, timestampMillis = timestampMillis)
    val schemaJson = avroSchema.toString
    val sconf = GraftFs.serializableConf()
    if (GraftFs.exists(path, sconf.value))
      GraftFs.delete(path, recursive = true, sconf.value): Unit
    GraftFs.mkdirs(path, sconf.value)
    val written = df.rdd.mapPartitionsWithIndex { (idx, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(schemaJson)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        w.setCodec(org.apache.avro.file.CodecFactory.snappyCodec())
        val out = GraftFs.child(path, f"part-$idx%05d.avro")
        w.create(schema, GraftFs.create(out, sconf.value))
        var n = 0L
        try rows.foreach { r => w.append(rowToRecord(r, st, schema)); n += 1 }
        finally w.close()
        Iterator((out, n))
      }
    }.collect() // small: one (path, count) pair per partition
    // An all-empty input wrote no containers; emit one empty container so
    // the schema (and thus a read-back) survives the round-trip — same
    // contract as Spark's file sinks writing a schema-bearing empty file.
    if (written.isEmpty) {
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](avroSchema))
      w.setCodec(org.apache.avro.file.CodecFactory.snappyCodec())
      w.create(avroSchema,
        GraftFs.create(GraftFs.child(path, "part-00000.avro"), sconf.value))
      w.close()
    }
  }

  /** Hive-layout partitioned write (`path/col=value/part-NNNNN.avro`) in
    * ONE distributed job: a single shuffle on the partition column
    * co-locates each value's rows, then every task streams its rows into
    * one container per partition value it holds — the dynamic-partition
    * write shape. No driver-side value enumeration: at 100 TB the
    * partition-value set is itself big data; a collect-and-loop writer
    * (one Spark job per value) is a scheduler DoS. Overwrites `path`. */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit = {
    import org.apache.spark.sql.functions.col
    val partIdx = df.schema.fieldIndex(partCol)
    val st = StructType(df.schema.fields.filterNot(_.name == partCol))
    val dataIdx = df.schema.fields.zipWithIndex
      .collect { case (f, i) if f.name != partCol => i }
    val avroSchema = toAvroSchema(st)
    val schemaJson = avroSchema.toString
    val sconf = GraftFs.serializableConf()
    if (GraftFs.exists(path, sconf.value))
      GraftFs.delete(path, recursive = true, sconf.value): Unit
    GraftFs.mkdirs(path, sconf.value)
    df.repartition(col(partCol)).rdd.mapPartitionsWithIndex { (idx, rows) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val writers = scala.collection.mutable.HashMap.empty[String, DataFileWriter[GenericRecord]]
      def writerFor(v: String): DataFileWriter[GenericRecord] =
        writers.getOrElseUpdate(v, {
          require(!v.contains('/') && !v.contains('='),
            s"partition value not path-safe: '$v'")
          val d = GraftFs.child(path, s"$partCol=$v")
          GraftFs.mkdirs(d, sconf.value)
          val w = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](schema))
          w.setCodec(org.apache.avro.file.CodecFactory.snappyCodec())
          w.create(schema,
            GraftFs.create(GraftFs.child(d, f"part-$idx%05d.avro"), sconf.value))
          w
        })
      try rows.foreach { r =>
        val v = r.get(partIdx)
        require(v != null, s"null partition value in column $partCol")
        val data = Row.fromSeq(dataIdx.toIndexedSeq.map(r.get))
        writerFor(v.toString).append(rowToRecord(data, st, schema))
      } finally writers.values.foreach(_.close())
      Iterator.single(writers.size)
    }.count(): Unit
  }
}
