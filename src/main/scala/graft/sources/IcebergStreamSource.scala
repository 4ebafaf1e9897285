package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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

  private def maxSnaps(parameters: Map[String, String]): Option[Int] =
    parameters.get("maxSnapshotsPerTrigger").map { s =>
      val n = s.toInt
      require(n > 0, s"maxSnapshotsPerTrigger must be positive, got $n")
      n
    }

  /** `.option("changelog", "true")` switches the source to CDC rows. */
  private def changelogMode(parameters: Map[String, String]): Boolean =
    boolOpt(parameters, "changelog")

  /** `.option("rowLineage", "true")` appends `_row_id` +
    * `_last_updated_sequence_number` to every streamed row (v3 only) —
    * the incremental-consumer handle that stays stable for ever.
    * Composes with `changelog`: change rows then carry lineage too (an
    * UPDATE's delete+insert pair shares one `_row_id`). */
  private def rowLineageMode(parameters: Map[String, String]): Boolean =
    boolOpt(parameters, "rowLineage")

  private def boolOpt(parameters: Map[String, String], name: String): Boolean =
    parameters.get(name) match {
      case None => false
      case Some(v) if v.equalsIgnoreCase("true") => true
      case Some(v) if v.equalsIgnoreCase("false") => false
      case Some(v) => throw new IllegalArgumentException(
        s"invalid boolean for option $name: '$v'")
    }

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "graft-iceberg streams read with the TABLE schema from metadata.json; " +
        "a user-supplied schema would silently diverge from the manifests")
    maxSnaps(parameters): Unit // validate at load() time, synchronously
    val meta = IcebergIO.loadMetadata(tablePath(parameters))
    if (rowLineageMode(parameters))
      require(meta.formatVersion >= 3,
        "rowLineage requires format v3 (row lineage); " +
          "run upgradeFormatVersion first")
    val table = meta.schema
    val lin = if (rowLineageMode(parameters)) IcebergIO.lineageFields else Nil
    (shortName(),
      if (changelogMode(parameters))
        StructType(table.fields.toSeq ++ lin ++ IcebergIO.changelogFields)
      else StructType(table.fields.toSeq ++ lin))
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source =
    new IcebergStreamSource(sqlContext.sparkSession, tablePath(parameters),
      maxSnaps(parameters), Some(metadataPath),
      changelog = changelogMode(parameters),
      rowLineage = rowLineageMode(parameters))
}

class IcebergStreamSource(spark: SparkSession, tablePath: String,
                          maxSnapshotsPerTrigger: Option[Int] = None,
                          metadataPath: Option[String] = None,
                          changelog: Boolean = false,
                          rowLineage: Boolean = false)
    extends Source {

  // pinned at construction: a mid-stream schema evolution is surfaced as
  // a loud failure in getBatch, never as silently misaligned columns
  private val tableSchema: StructType = {
    val meta = IcebergIO.loadMetadata(tablePath)
    // refused at construction (not first getBatch): a v2 table must not
    // advertise the lineage schema it can never serve — mirrors the
    // provider's sourceSchema check for the DataStreamReader path
    if (rowLineage)
      require(meta.formatVersion >= 3,
        "rowLineage requires format v3 (row lineage); " +
          "run upgradeFormatVersion first")
    meta.schema
  }
  override val schema: StructType = {
    val lin = if (rowLineage) IcebergIO.lineageFields else Nil
    if (changelog) StructType(tableSchema.fields.toSeq ++ lin ++
      IcebergIO.changelogFields)
    else StructType(tableSchema.fields.toSeq ++ lin)
  }

  // ---- rate limiting ([[maxSnapshotsPerTrigger]]): a batch covers at
  // most N snapshots of backlog. The cap needs a BASE — the last
  // sequence number already handed to the engine — which a v1 Source
  // must track itself. It survives restarts in a small file under the
  // source's checkpoint dir (metadataPath): the engine may ask for a
  // NEW offset before replaying the restored batch, and a cap computed
  // from zero there would hand back an offset BELOW the checkpoint —
  // read as new data, committing the stream backwards into duplicates.
  // The persisted value may exceed the engine's committed offset after
  // a crash (planned-but-uncommitted batch) — that only makes the next
  // batch larger, never wrong.
  private val plannedFile: Option[String] =
    metadataPath.map(p => GraftFs.child(p, "graft-planned-seq"))
  private var plannedSeq: Option[Long] =
    plannedFile.filter(GraftFs.exists(_)).flatMap { f =>
      scala.util.Try(GraftFs.readUtf8(f).trim.toLong).toOption
    }

  private def recordPlanned(seq: Long): Unit = {
    if (!plannedSeq.contains(seq)) {
      plannedSeq = Some(seq)
      plannedFile.foreach { f =>
        val out = GraftFs.create(f) // truncate-and-write, single writer
        try out.write(s"$seq\n".getBytes("UTF-8")) finally out.close()
      }
    }
  }

  /** Latest available offset = the current snapshot's sequence number
    * (one metadata.json read — cheap, no manifest is parsed here),
    * capped to `maxSnapshotsPerTrigger` snapshots above the last
    * planned offset when rate limiting is on. */
  override def getOffset: Option[OffsetV1] = {
    val meta = IcebergIO.loadMetadata(tablePath)
    val cur = meta.currentSnapshotId
      .flatMap(id => meta.snapshots.find(_.snapshotId == id))
      .map(_.sequenceNumber)
    val end = (cur, maxSnapshotsPerTrigger) match {
      case (Some(c), Some(n)) =>
        val base = plannedSeq.getOrElse(0L)
        // the Nth distinct backlog sequence number above the base; the
        // snapshot list is the planning input, no manifest is touched
        val backlog = meta.snapshots.map(_.sequenceNumber)
          .filter(s => s > base && s <= c).distinct.sorted
        backlog.take(n).lastOption.orElse(Some(math.max(base, c)).filter(_ > 0))
      case _ => cur
    }
    end.foreach(recordPlanned)
    end.map(LongOffset(_))
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    // restart recovery: the engine replays the restored range before any
    // getOffset — adopt its end as the planned base
    if (plannedSeq.forall(_ < seqOf(end))) recordPlanned(seqOf(end))
    val current = IcebergIO.loadMetadata(tablePath).schema
    if (current != tableSchema)
      throw new IllegalStateException(
        s"Iceberg table $tablePath changed schema mid-stream " +
          s"(was ${tableSchema.simpleString}, now ${current.simpleString}) — " +
          "restart the stream to pick up the new schema")
    // start = None on the very first batch (and on restart before any
    // commit): stream the table from the beginning. asStreaming marks
    // the parquet relation with the isStreaming flag the micro-batch
    // engine asserts on; the changelog batch is a multi-relation
    // composition (per-snapshot diffs), so it streams behind one lazy
    // RDD leaf instead (asStreamingRdd — the KafkaSource pattern).
    // CDC mode is what makes delete/upsert commits STREAMABLE: the
    // append mode fails loudly on them, a changelog consumer gets them
    // as typed delete+insert rows.
    if (changelog)
      org.apache.spark.sql.GraftShim.asStreamingRdd(
        IcebergIO.readChangelogBySeq(spark, tablePath,
          start.map(seqOf).getOrElse(0L), seqOf(end),
          withRowId = rowLineage))
    else if (rowLineage)
      // the lineage batch joins the per-file first-row-id map — a
      // multi-relation plan, so it streams behind one lazy RDD leaf
      // like the changelog form
      org.apache.spark.sql.GraftShim.asStreamingRdd(
        IcebergIO.readIncrementalBySeq(spark, tablePath,
          start.map(seqOf).getOrElse(0L), seqOf(end), withRowId = true))
    else
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
