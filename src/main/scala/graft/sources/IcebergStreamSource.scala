package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/**
 * Metadata-driven Iceberg streaming source: each micro-batch is planned
 * from the table's SNAPSHOT LOG, not from directory listings. Offsets
 * are Iceberg v2 sequence numbers; a batch is exactly the rows appended
 * in the `(fromSeq, toSeq]` snapshot range
 * ([[IcebergIO.readIncrementalBySeq]]).
 *
 * Why a v1 `Source` and not a DSv2 `MicroBatchStream`: `getBatch`
 * returns a DataFrame, so the data path stays on Spark's own vectorized
 * parquet reader over the manifest-planned file list — the same
 * delegation argument as the SQL-surface scan ([[IcebergTableScan]]).
 * A DSv2 `PartitionReader` would have to produce rows itself.
 *
 * Semantics this buys over the file-grain `icebergAppendStream`:
 *  - **arbitrary data file names** — real writers use uuid names; no
 *    glob to configure, the manifests say exactly which files exist;
 *  - **mid-stream delete detection** — a non-append commit inside a
 *    planned range fails the stream LOUDLY (phantom rows are
 *    impossible: only manifest-listed appends are ever read);
 *  - **snapshot-exact batches** — a batch never sees a half-committed
 *    write, because files become visible only at the metadata swap.
 *
 * Restart recovery works through the checkpoint: offsets serialize as
 *  the sequence number (`LongOffset`), so a restarted query resumes at
 * `(lastCommittedSeq, …]`.
 *
 * Reference analog: the fork's Iceberg integration is scan-only
 * (ballista/core/src/serde/mod.rs:92); streaming ingestion of an
 * append-only table is the natural pipeline extension.
 */
class IcebergStreamProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-iceberg"

  private def tablePath(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-iceberg stream needs .option(\"path\", <table dir>)"))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "graft-iceberg streams read with the TABLE schema from metadata.json; " +
        "a user-supplied schema would silently diverge from the manifests")
    (shortName(), IcebergIO.loadMetadata(tablePath(parameters)).schema)
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source =
    new IcebergStreamSource(sqlContext.sparkSession, tablePath(parameters))
}

class IcebergStreamSource(spark: SparkSession, tablePath: String)
    extends Source {

  // pinned at construction: a mid-stream schema evolution is surfaced as
  // a loud failure in getBatch, never as silently misaligned columns
  override val schema: StructType = IcebergIO.loadMetadata(tablePath).schema

  /** Latest available offset = the current snapshot's sequence number
    * (one metadata.json read — cheap, no manifest is parsed here). */
  override def getOffset: Option[OffsetV1] = {
    val meta = IcebergIO.loadMetadata(tablePath)
    meta.currentSnapshotId
      .flatMap(id => meta.snapshots.find(_.snapshotId == id))
      .map(s => LongOffset(s.sequenceNumber))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val current = IcebergIO.loadMetadata(tablePath).schema
    if (current != schema)
      throw new IllegalStateException(
        s"Iceberg table $tablePath changed schema mid-stream " +
          s"(was ${schema.simpleString}, now ${current.simpleString}) — " +
          "restart the stream to pick up the new schema")
    // start = None on the very first batch (and on restart before any
    // commit): stream the table from the beginning. asStreaming marks
    // the parquet relation with the isStreaming flag the micro-batch
    // engine asserts on.
    org.apache.spark.sql.GraftShim.asStreaming(
      IcebergIO.readIncrementalBySeq(spark, tablePath,
        start.map(seqOf).getOrElse(0L), seqOf(end)))
  }

  /** Offsets come back from the checkpoint log as [[SerializedOffset]]
    * json (the engine does not know the concrete class); LongOffset's
    * json is just the number. */
  private def seqOf(o: OffsetV1): Long = o match {
    case l: LongOffset     => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other => throw new IllegalStateException(
      s"unexpected offset type ${other.getClass.getName}: $other")
  }

  override def stop(): Unit = ()

  override def toString: String = s"IcebergStreamSource[$tablePath]"
}
