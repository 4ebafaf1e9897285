package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.Row
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

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AvroTable.schemaOf(pathOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new AvroTable(properties.get("path"), schema)

  override def supportsExternalMetadata(): Boolean = true
}

private object AvroTable {
  def schemaOf(path: String): StructType = {
    val first = listFiles(path).head
    val r = new DataFileReader[GenericRecord](
      new java.io.File(first), new GenericDatumReader[GenericRecord]())
    try AvroIO.toSparkSchema(r.getSchema) finally r.close()
  }

  def listFiles(path: String): Seq[String] = AvroIO.listAvroFiles(path)
}

private final class AvroTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"avro:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(path, tableSchema)
}

private final class AvroScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new AvroScan(path, required)
}

private final case class AvroFilePartition(file: String) extends InputPartition

private final class AvroScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"graft-avro $path ${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] =
    AvroTable.listFiles(path).map(AvroFilePartition.apply).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(required.json)
}

private final class AvroReaderFactory(requiredJson: String)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new AvroPartitionReader(
      partition.asInstanceOf[AvroFilePartition].file, requiredJson)
}

/** Streams one container file; decodes each record, converts the
  * REQUIRED fields only, and serializes through a Row encoder. */
private final class AvroPartitionReader(file: String, requiredJson: String)
    extends PartitionReader[InternalRow] {

  private val required = org.apache.spark.sql.types.DataType
    .fromJson(requiredJson).asInstanceOf[StructType]
  private val reader = new DataFileReader[GenericRecord](
    new java.io.File(file), new GenericDatumReader[GenericRecord]())
  private val writerSchema: Schema = reader.getSchema
  private val toInternal =
    ExpressionEncoder(RowEncoder.encoderFor(required)).createSerializer()
  private var current: InternalRow = _

  override def next(): Boolean =
    if (reader.hasNext) {
      val rec = reader.next()
      val vals = required.fields.map { f =>
        val avroField = writerSchema.getField(f.name)
        require(avroField != null, s"column ${f.name} absent in Avro file $file")
        AvroIO.valueToSpark(rec.get(f.name), f.dataType, avroField.schema())
      }
      current = toInternal(Row.fromSeq(vals.toIndexedSeq)).copy()
      true
    } else false

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
