package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * DataSource V2 connector for Avro object container files, registered
 * under the short name `avro` (service-loaded via DataSourceRegister) —
 * so `spark.read.format("avro")`, `CREATE TABLE … USING avro`, and the
 * reference's `STORED AS AVRO` DDL (reference `AvroScanExecNode`,
 * datafusion.proto:1169-1171; `read_avro`, context.rs:227-234) all work
 * without the spark-avro connector jar, which this environment lacks.
 *
 * Built on [[AvroIO]]'s schema/value conversion. V2 integration buys
 * what the plain RDD reader cannot express:
 *
 *  - **column pruning pushdown** (`SupportsPushDownRequiredColumns`):
 *    a projection over an Avro scan decodes every record (row-major
 *    format — unavoidable) but converts ONLY the required fields to
 *    Spark values, and the scan's `readSchema` shows the pruning in
 *    `.explain` just like the parquet source;
 *  - **one InputPartition per container file** — the same distribution
 *    grain as AvroIO.read, now visible to Catalyst/AQE as a proper scan.
 */
final class AvroDataSourceV2 extends TableProvider with DataSourceRegister {

  override def shortName(): String = "avro"

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("avro source requires a path"))
    p
  }

  /** Writes to a not-yet-existing path also route through inferSchema
    * (the provider cannot see the direction) — return an empty schema
    * there; reads of a missing path still fail, at scan planning, with
    * the clear "no such Avro path" message. */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val p = pathOf(options)
    val c = GraftFs.conf()
    // a subdirectory vanishing between status and list (or being
    // unreadable) counts as empty here — schema inference must fall
    // through to the empty-schema write path, not surface a raw Hadoop
    // error; a real READ of the path still fails with a clear message
    // in discover()
    def anyAvro(st: org.apache.hadoop.fs.FileStatus): Boolean =
      (st.isFile && st.getPath.getName.endsWith(".avro")) ||
        (st.isDirectory &&
          scala.util.Try(GraftFs.list(st.getPath.toString, c))
            .getOrElse(Seq.empty).exists(anyAvro))
    val hasAvro = GraftFs.status(p, c).exists(anyAvro)
    if (!hasAvro) new StructType()
    else AvroTable.schemaOf(p, Option(options.get(AvroTable.ReaderSchemaOption)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new AvroTable(properties.get("path"), schema)

  override def supportsExternalMetadata(): Boolean = true
}

private object AvroTable {
  /** Scan option carrying an Avro READER schema (JSON): every file is
    * resolved against it per Avro's schema-resolution rules — evolution
    * on read (added fields w/ defaults, drops, reorders, promotions). */
  val ReaderSchemaOption = "avroReaderSchema"

  /** (file, byte length, partition values aligned with partitionCols) —
    * lengths ride along from the one listing pass so split planning
    * needs no per-file stat RPC (material at 1e5 files on an object
    * store). */
  final case class Layout(files: Seq[(String, Long, Seq[String])],
                          partitionCols: Seq[String])

  /** Hive-layout discovery: `.avro` files directly under `path` form an
    * unpartitioned table; `path/k=v[/k2=v2…]/part.avro` layouts
    * contribute `k,k2,…` as string partition columns (same contract as
    * Spark's file sources; values are not type-inferred — cast in the
    * query). Mixing bare files and partition dirs is rejected. All
    * listing goes through the Hadoop FS API ([[GraftFs]]). */
  def discover(path: String): Layout = {
    val c = GraftFs.conf()
    val root = GraftFs.status(path, c).getOrElse(
      throw new java.io.FileNotFoundException(s"no such Avro path: $path"))
    if (root.isFile)
      return Layout(Seq((root.getPath.toString, root.getLen, Nil)), Nil)
    val acc = Seq.newBuilder[(String, Long, Seq[(String, String)])]
    def walk(dir: String, parts: Seq[(String, String)]): Unit =
      GraftFs.list(dir, c).foreach { s =>
        val n = s.getPath.getName
        if (s.isFile && n.endsWith(".avro"))
          acc += ((s.getPath.toString, s.getLen, parts))
        else if (s.isDirectory) n.split("=", 2) match {
          case Array(k, v) => walk(s.getPath.toString, parts :+ (k -> v))
          case _           => // non-hive dir (e.g. _tmp): skip
        }
      }
    walk(root.getPath.toString, Nil)
    val all = acc.result()
    require(all.nonEmpty, s"no .avro files under $path")
    val cols = all.head._3.map(_._1)
    require(all.forall(_._3.map(_._1) == cols),
      s"inconsistent partition layout under $path: " +
        all.map(_._3.map(_._1).mkString("/")).distinct.mkString(" vs "))
    Layout(all.map { case (f, len, ps) => (f, len, ps.map(_._2)) }, cols)
  }

  def schemaOf(path: String, readerSchemaJson: Option[String] = None): StructType = {
    val layout = discover(path)
    val data = readerSchemaJson match {
      case Some(json) =>
        AvroIO.toSparkSchema(new Schema.Parser().parse(json))
      case None =>
        val first = layout.files.head._1
        val r = new DataFileReader[GenericRecord](
          GraftFs.openSeekable(first), new GenericDatumReader[GenericRecord]())
        try AvroIO.toSparkSchema(r.getSchema) finally r.close()
    }
    val clash = layout.partitionCols.toSet.intersect(data.fieldNames.toSet)
    require(clash.isEmpty,
      s"partition column(s) ${clash.mkString(", ")} also present in the data schema")
    layout.partitionCols.foldLeft(data)((s, c) =>
      s.add(org.apache.spark.sql.types.StructField(
        c, org.apache.spark.sql.types.StringType, nullable = false)))
  }

  def listFiles(path: String): Seq[String] = AvroIO.listAvroFiles(path)
}

private final class AvroTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"avro:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(path, tableSchema,
      Option(options.get(AvroTable.ReaderSchemaOption)))
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new AvroWriteBuilder(path, info.schema())
}

private final class AvroScanBuilder(path: String, full: StructType,
                                    readerSchemaJson: Option[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  import org.apache.spark.sql.sources.Filter
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** Advisory pushdown: keep the evaluable subset for reader-side row
    * skipping, but return ALL filters so Spark retains its own Filter
    * node (Avro is row-major — pushdown saves per-row serialization and
    * downstream work, it cannot skip IO like parquet row groups). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(AvroFilterEval.supported)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new AvroScan(path, required, pushed, readerSchemaJson)
}

/** Minimal evaluator for source filters over the decoded field values —
  * unsupported shapes are simply not pushed (Spark re-filters anyway). */
private object AvroFilterEval extends Serializable {
  import org.apache.spark.sql.sources._

  def supported(f: Filter): Boolean = f match {
    case EqualTo(_, _) | GreaterThan(_, _) | GreaterThanOrEqual(_, _) |
         LessThan(_, _) | LessThanOrEqual(_, _) | IsNull(_) | IsNotNull(_) |
         In(_, _) | StringStartsWith(_, _) => true
    case And(l, r) => supported(l) && supported(r)
    case Or(l, r)  => supported(l) && supported(r)
    case Not(c)    => supported(c)
    case _         => false
  }

  /** 3-valued-logic-free approximation: returns false only when the row
    * DEFINITELY fails the filter; unknown comparisons pass the row
    * through (Spark's own Filter decides). */
  def eval(f: Filter, get: String => Any): Boolean = f match {
    case EqualTo(a, v)            => cmp(get(a), v).forall(_ == 0)
    case GreaterThan(a, v)        => cmp(get(a), v).forall(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(get(a), v).forall(_ >= 0)
    case LessThan(a, v)           => cmp(get(a), v).forall(_ < 0)
    case LessThanOrEqual(a, v)    => cmp(get(a), v).forall(_ <= 0)
    case IsNull(a)                => get(a) == null
    case IsNotNull(a)             => get(a) != null
    case In(a, vs)                => get(a) == null ||
      vs.exists(v => cmp(get(a), v).forall(_ == 0))
    case StringStartsWith(a, p)   => get(a) match {
      case s: String => s.startsWith(p); case _ => true
    }
    case And(l, r) => eval(l, get) && eval(r, get)
    case Or(l, r)  => eval(l, get) || eval(r, get)
    case Not(c)    => !definitely(c, get)
    case _         => true
  }

  /** True only when the row DEFINITELY satisfies `f` (for Not). */
  private def definitely(f: Filter, get: String => Any): Boolean = f match {
    case EqualTo(a, v)  => get(a) != null && cmp(get(a), v).contains(0)
    case IsNull(a)      => get(a) == null
    case IsNotNull(a)   => get(a) != null
    case _              => false // conservative: Not(other) never prunes
  }

  /** None = incomparable (null or mismatched types) → do not prune. */
  private def cmp(x: Any, v: Any): Option[Int] = (x, v) match {
    case (null, _) | (_, null) => None
    case (a: Number, b: Number) =>
      Some(java.lang.Double.compare(a.doubleValue(), b.doubleValue()))
    case (a: String, b: String) => Some(a.compareTo(b))
    case (a: Boolean, b: Boolean) => Some(java.lang.Boolean.compare(a, b))
    case (a: java.sql.Date, b: java.sql.Date) => Some(a.compareTo(b))
    case (a: java.sql.Timestamp, b: java.sql.Timestamp) => Some(a.compareTo(b))
    case _ => None
  }
}

/** One byte-range split of one container file. The reader syncs to the
  * first block boundary after `start` and stops once it passes
  * `start + length` — the standard Avro split contract: every block is
  * read by exactly one split. */
private final case class AvroFilePartition(
    file: String, start: Long, length: Long,
    partCols: Seq[String], partValues: Seq[String])
    extends InputPartition

private final class AvroScan(path: String, required: StructType,
                             filters: Array[org.apache.spark.sql.sources.Filter],
                             readerSchemaJson: Option[String] = None)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Size = bytes of the files that SURVIVE partition pruning — without
    * this a V2 scan reports unknown stats and a small Avro dimension
    * never broadcasts in a join. Row count left empty (compressed
    * containers; bytes are the planner's broadcast criterion). */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      private val bytes: Long = planInputPartitions()
        .map(p => p.asInstanceOf[AvroFilePartition].length).sum
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(math.max(bytes, 1L))
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  override def description(): String =
    s"graft-avro $path ${required.simpleString}" +
      (if (filters.isEmpty) "" else s" PushedFilters: ${filters.mkString("[", ", ", "]")}")

  /** Partition PRUNING happens here: filters whose referenced columns are
    * all partition columns are evaluated against each file's partition
    * values, and non-matching files are never opened — the V2 analog of
    * the parquet source's PartitionFilters (genuine IO skip, unlike the
    * row-level advisory pushdown). Planned once per scan (statistics and
    * batch planning share the listing — no repeated FS walks). */
  private lazy val planned: Array[InputPartition] = {
    val layout = AvroTable.discover(path)
    val partitionFilters = filters.filter(
      _.references.forall(layout.partitionCols.contains))
    // Split large containers on byte ranges (sync-marker aligned at read
    // time) so ONE huge file still parallelizes — the same
    // maxPartitionBytes contract as Spark's file sources.
    val maxSplit = math.max(4096L,
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        SparkSession.active.conf.get(
          "spark.sql.files.maxPartitionBytes", s"${128L * 1024 * 1024}")))
    layout.files
      .filter { case (_, _, values) =>
        val get: String => Any =
          name => layout.partitionCols.indexOf(name) match {
            case -1 => null
            case i  => values(i)
          }
        partitionFilters.forall(AvroFilterEval.eval(_, get))
      }
      .flatMap { case (f, len, values) =>
        val nSplits = math.max(1L, (len + maxSplit - 1) / maxSplit)
        (0L until nSplits).map { i =>
          val start = i * maxSplit
          AvroFilePartition(f, start, math.min(maxSplit, len - start),
            layout.partitionCols, values)
        }
      }.toArray
  }

  override def planInputPartitions(): Array[InputPartition] = planned

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(required.json, filters, readerSchemaJson,
      GraftFs.serializableConf())
}

private final class AvroReaderFactory(
    requiredJson: String, filters: Array[org.apache.spark.sql.sources.Filter],
    readerSchemaJson: Option[String], sconf: GraftFs.SerializableConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[AvroFilePartition]
    new AvroPartitionReader(p, requiredJson, filters, readerSchemaJson, sconf)
  }
}

// ------------------------------------------------------------------ write

/** V2 write: each task writes one container file into a run-scoped temp
  * dir; commit moves them into place (after clearing existing containers
  * on truncate/overwrite), abort deletes the temp dir — the standard
  * two-phase file-sink contract on a shared filesystem. */
private final class AvroWriteBuilder(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new AvroWrite(path, schema, doTruncate)
}

private final class AvroWrite(path: String, schema: StructType, truncate: Boolean)
    extends org.apache.spark.sql.connector.write.Write
    with org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  private val tmpName = s"_tmp_${java.util.UUID.randomUUID().toString.take(8)}"

  override def toBatch: BatchWrite = this
  override def description(): String = s"graft-avro-write $path"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val c = GraftFs.conf()
    GraftFs.mkdirs(GraftFs.child(path, tmpName), c)
    new AvroWriterFactory(path, tmpName, schema.json, GraftFs.serializableConf())
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val c = GraftFs.conf()
    val tmp = GraftFs.child(path, tmpName)
    // Publish ONLY the files named in task commit messages — a task
    // attempt that died without abort() leaves a partial .avro in the
    // temp dir which must never be renamed into place alongside its
    // retry's output (the FileCommitProtocol contract).
    val committed = messages.flatMap {
      case AvroCommitMessage(files) => files
      case other =>
        throw new IllegalStateException(s"unexpected commit message: $other")
    }
    def avroChildren(): Seq[String] =
      GraftFs.list(path, c).filter(s => s.isFile &&
        s.getPath.getName.endsWith(".avro")).map(_.getPath.toString)
    if (truncate) avroChildren().foreach(GraftFs.delete(_, recursive = false, c))
    // Publish is not atomic across files (per-file FileSystem renames),
    // so a failure mid-loop must not leave a half-published append
    // visible to concurrent readers: roll back the renames already done
    // in THIS commit before rethrowing. Spark does not retry
    // BatchWrite.commit, so after the rollback the directory is exactly
    // as before commit.
    val published = scala.collection.mutable.ListBuffer.empty[String]
    try {
      committed.foreach { name =>
        val target = GraftFs.child(path, name)
        // Final names carry this write's UUID, so a collision means a
        // genuine bug (double commit) — refuse rather than silently
        // replace.
        require(!GraftFs.exists(target, c),
          s"refusing to overwrite existing $target")
        val ok = GraftFs.rename(GraftFs.child(tmp, name), target, c)
        require(ok, s"commit rename failed for $name")
        published += target
      }
    } catch {
      case e: Throwable =>
        published.foreach(f => if (!GraftFs.delete(f, recursive = false, c))
          System.err.println(s"avro commit rollback: could not unlink $f"))
        throw e
    }
    // Anything left in the temp dir is a dead attempt's orphan: drop it.
    GraftFs.delete(tmp, recursive = true, c): Unit
    // all-empty input: leave a schema-bearing empty container (same
    // contract as AvroIO.write) so a read-back sees the schema
    if (avroChildren().isEmpty) {
      val avroSchema = AvroIO.toAvroSchema(schema)
      val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
        new org.apache.avro.generic.GenericDatumWriter[GenericRecord](avroSchema))
      w.setCodec(org.apache.avro.file.CodecFactory.snappyCodec())
      w.create(avroSchema, GraftFs.create(GraftFs.child(path, "part-00000.avro"), c))
      w.close()
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    GraftFs.delete(GraftFs.child(path, tmpName), recursive = true,
      GraftFs.conf()): Unit
  }
}

/** Task-side commit message: the file name(s) this attempt wrote (empty
  * for an empty partition). A top-level class — an anonymous subclass
  * would capture the non-serializable writer. */
private final case class AvroCommitMessage(files: Seq[String])
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

private final class AvroWriterFactory(dir: String, tmpName: String,
                                      schemaJson: String,
                                      sconf: GraftFs.SerializableConf)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new AvroDataWriter(dir, tmpName, schemaJson, partitionId, taskId, sconf)
}

private final class AvroDataWriter(dir: String, tmpName: String,
                                   schemaJson: String, partitionId: Int,
                                   taskId: Long, sconf: GraftFs.SerializableConf)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
  import org.apache.spark.sql.connector.write.WriterCommitMessage

  private val sparkSchema = org.apache.spark.sql.types.DataType
    .fromJson(schemaJson).asInstanceOf[StructType]
  private val avroSchema = AvroIO.toAvroSchema(sparkSchema)
  private val fromInternal =
    ExpressionEncoder(RowEncoder.encoderFor(sparkSchema))
      .resolveAndBind().createDeserializer()
  // The write UUID (from the temp dir name) is part of the FINAL file
  // name: taskIds restart at 0 in a new Spark application, so a bare
  // part-<pid>-<taskId> name could collide with a previous append's file
  // and rename would silently replace it.
  private val fileName =
    f"part-$partitionId%05d-$taskId-${tmpName.stripPrefix("_tmp_")}.avro"
  private val file = GraftFs.child(GraftFs.child(dir, tmpName), fileName)
  private var writer: org.apache.avro.file.DataFileWriter[GenericRecord] = _
  private var count = 0L

  override def write(record: InternalRow): Unit = {
    if (writer == null) {
      writer = new org.apache.avro.file.DataFileWriter[GenericRecord](
        new org.apache.avro.generic.GenericDatumWriter[GenericRecord](avroSchema))
      writer.setCodec(org.apache.avro.file.CodecFactory.snappyCodec())
      writer.create(avroSchema, GraftFs.create(file, sconf.value))
    }
    writer.append(AvroIO.rowToRecordPub(fromInternal(record), sparkSchema, avroSchema))
    count += 1
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    AvroCommitMessage(if (writer != null) Seq(fileName) else Nil)
  }
  override def abort(): Unit = {
    if (writer != null) writer.close()
    GraftFs.delete(file, recursive = false, sconf.value): Unit
  }
  override def close(): Unit = ()
}

/** Streams one container file; decodes each record, converts the
  * REQUIRED fields only, and serializes through a Row encoder. */
private final class AvroPartitionReader(
    partition: AvroFilePartition, requiredJson: String,
    filters: Array[org.apache.spark.sql.sources.Filter],
    readerSchemaJson: Option[String],
    sconf: GraftFs.SerializableConf)
    extends PartitionReader[InternalRow] {

  private val file = partition.file
  private val partValue: Map[String, String] =
    partition.partCols.zip(partition.partValues).toMap
  private val required = org.apache.spark.sql.types.DataType
    .fromJson(requiredJson).asInstanceOf[StructType]
  // With a reader schema, the datum reader resolves this file's writer
  // schema against it (by-name matching, defaults, promotions) and the
  // decoded records are SHAPED by the reader schema — so field lookups
  // below must use it, not the header schema.
  private val expectedSchema: Option[Schema] =
    readerSchemaJson.map(new Schema.Parser().parse(_))
  private val reader = new DataFileReader[GenericRecord](
    GraftFs.openSeekable(file, sconf.value),
    expectedSchema match {
      case Some(rs) => new GenericDatumReader[GenericRecord](null, rs)
      case None     => new GenericDatumReader[GenericRecord]()
    })
  // Position to the split: first sync-marker-aligned block after `start`;
  // stop once past `start + length`. sync(0) is safe (first block).
  reader.sync(partition.start)
  private val splitEnd = partition.start + partition.length
  private val writerSchema: Schema = expectedSchema.getOrElse(reader.getSchema)
  private val toInternal =
    ExpressionEncoder(RowEncoder.encoderFor(required)).createSerializer()
  private val fieldIdx = required.fieldNames.zipWithIndex.toMap
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (reader.hasNext && !reader.pastSync(splitEnd)) {
      val rec = reader.next()
      val vals = required.fields.map { f =>
        partValue.get(f.name) match {
          case Some(v) => v // partition column: value comes from the path
          case None =>
            val avroField = writerSchema.getField(f.name)
            require(avroField != null, s"column ${f.name} absent in Avro file $file")
            AvroIO.valueToSpark(rec.get(f.name), f.dataType, avroField.schema())
        }
      }
      // pushed-filter row skip BEFORE catalyst serialization — saves the
      // per-row encoder + downstream cost for rows the query drops anyway
      val get: String => Any = name => fieldIdx.get(name).map(vals(_)).orNull
      if (filters.forall(AvroFilterEval.eval(_, get))) {
        current = toInternal(Row.fromSeq(vals.toIndexedSeq)).copy()
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
