package graft.sources

import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Project, Statistics}
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * SQL-surface Iceberg scan: a placeholder logical leaf that is
 * materialized — metadata re-resolved, partition + manifest-stats pruning
 * derived from the adjacent `WHERE` — at OPTIMIZATION time of each query.
 *
 * Why a `LogicalPlan` + `Rule` and not a DataSource V2 relation: a V2
 * `PartitionReader` must produce rows itself, which for parquet content
 * files would mean reimplementing (or bypassing) Spark's vectorized
 * parquet reader — strictly worse than delegating to it. The rule instead
 * rewrites the leaf into Spark's own parquet relation over exactly the
 * manifest-pruned file list, so the data path keeps whole-stage codegen,
 * vectorized decoding and parquet row-group pushdown (the retained Filter
 * lands on the parquet scan through `FileSourceStrategy` as usual).
 * This is the brief's option (c): custom plan + rule, Spark executes.
 *
 * Semantics this buys over the static temp views:
 *  - **live metadata**: each query re-reads `metadata.json`, so a commit
 *    made after `registerIceberg` is visible without re-registering
 *    (pass `snapshotId`/`ref` to pin — a pinned snapshot is immutable,
 *    so re-resolution then only picks up table-location changes);
 *  - **pushdown from plain SQL**: `WHERE` conjuncts drive the same
 *    planning-time pruning as [[IcebergIO.readWhere]] — the catalyst
 *    predicate converts to the neutral tree via
 *    `GraftShim.predicateTreeOf`, so both surfaces share one derivation.
 *
 * Reference analog: the fork plans an Iceberg scan per query through its
 * extension codec (ballista/core/src/serde/mod.rs:92,
 * distributed_query.rs:44,100) — registration is by name, resolution per
 * query.
 */
final case class IcebergTableScan(
    tablePath: String,
    snapshotId: Option[Long],
    asOfTimestampMs: Option[Long],
    ref: Option[String],
    output: Seq[Attribute],
    // v3 row lineage: materialize with _row_id +
    // _last_updated_sequence_number appended — the <name>_row_lineage
    // view rides THIS leaf (not the metadata path) so WHERE-driven
    // partition/stats pruning composes with lineage
    rowLineage: Boolean = false)(
    // second parameter list (Spark's ExternalRDD pattern): the OWNING
    // session rides along outside the case-class equality/tree args, so
    // materialization in a multi-session JVM uses this session's Hadoop
    // conf, never the active-session thread-local at rule-apply time
    @transient val session: org.apache.spark.sql.SparkSession)
    extends LeafNode
    with org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation {
  override protected def otherCopyArgs: Seq[AnyRef] = session :: Nil
  // Conservative placeholder: the leaf is replaced before physical
  // planning (join selection reads stats from the materialized parquet
  // relation, never from here).
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = BigInt(Long.MaxValue) / 16)
  // self-joins of a registered view need per-instance attribute ids
  override def newInstance(): IcebergTableScan =
    copy(output = output.map(_.newInstance()))(session)
}

object IcebergTableScan {
  /** A DataFrame whose scan re-plans per query (see class doc). */
  def dataFrame(spark: org.apache.spark.sql.SparkSession, tablePath: String,
                snapshotId: Option[Long] = None,
                asOfTimestampMs: Option[Long] = None,
                ref: Option[String] = None,
                rowLineage: Boolean = false)
      : org.apache.spark.sql.DataFrame = {
    GraftShim.addOptimization(spark, IcebergScanRule)
    val meta = IcebergIO.loadMetadata(tablePath)
    if (rowLineage)
      require(meta.formatVersion >= 3,
        "row_lineage requires format v3 (row lineage); " +
          "run upgradeFormatVersion first")
    val schema =
      if (rowLineage)
        org.apache.spark.sql.types.StructType(
          meta.schema.fields.map(_.copy(nullable = true)).toSeq ++
            IcebergIO.lineageFields)
      else meta.schema
    GraftShim.dataFrame(spark, IcebergTableScan(tablePath, snapshotId,
      asOfTimestampMs, ref, GraftShim.attributes(schema), rowLineage)(spark))
  }
}

/**
 * A LIVE Iceberg metadata relation (`.files`, `.history`, …): like
 * [[IcebergTableScan]], a placeholder leaf materialized per query at
 * optimization time, so `<name>_files` etc. reflect commits made after
 * registration — the dot-suffix metadata tables of the runtime jar
 * re-resolve per query, and now so do these. Metadata relations are
 * driver-computed local relations (manifest grain, no data files), so no
 * pushdown is derived — materialize-and-align is all that's needed.
 */
final case class IcebergMetaScan(
    tablePath: String,
    kind: String, // history | files | partitions | manifests | snapshots | refs
    snapshotId: Option[Long],
    asOfTimestampMs: Option[Long],
    ref: Option[String],
    output: Seq[Attribute])(
    @transient val session: org.apache.spark.sql.SparkSession)
    extends LeafNode
    with org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation {
  override protected def otherCopyArgs: Seq[AnyRef] = session :: Nil
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = BigInt(1) << 20) // metadata grain: small
  override def newInstance(): IcebergMetaScan =
    copy(output = output.map(_.newInstance()))(session)
}

object IcebergMetaScan {
  /** Materialize the relation, honoring the SAME pin the data view has:
    * a ref/as-of registration must describe the snapshot it serves, not
    * silently the current one (refs re-resolve per query, like the data
    * view — a moved branch is picked up). history/snapshots/refs are
    * whole-table relations and take no pin (runtime-jar semantics). */
  private[sources] def relation(spark: org.apache.spark.sql.SparkSession,
                                m: IcebergMetaScan)
      : org.apache.spark.sql.DataFrame = {
    // ONE metadata load per materialization: the pin resolves against
    // the same TableMetadata the relation is built from
    val meta = IcebergIO.loadMetadata(m.tablePath)
    lazy val pinned: Option[Long] = IcebergIO.resolveSnapshotId(
      meta, m.snapshotId, m.asOfTimestampMs, m.ref)
    m.kind match {
      case "history"    => IcebergIO.historyOf(spark, meta)
      case "files"      => IcebergIO.filesOf(spark, meta, m.tablePath, pinned)
      case "data_files"   => IcebergIO.dataFilesOf(spark, meta, m.tablePath, pinned)
      case "delete_files" => IcebergIO.deleteFilesOf(spark, meta, m.tablePath, pinned)
      case "entries"    => IcebergIO.entriesOf(spark, meta, m.tablePath, pinned)
      case "partitions" => IcebergIO.partitionsOf(spark, meta, m.tablePath, pinned)
      case "manifests"  => IcebergIO.manifestsOf(spark, meta, m.tablePath, pinned)
      case "snapshots"  => IcebergIO.snapshotsOf(spark, meta)
      case "refs"       => IcebergIO.refsOf(spark, meta)
      case "all_files"            => IcebergIO.allFilesOf(spark, meta)
      case "all_data_files"       => IcebergIO.allDataFilesOf(spark, meta)
      case "all_delete_files"     => IcebergIO.allDeleteFilesOf(spark, meta)
      case "all_entries"          => IcebergIO.allEntriesOf(spark, meta)
      case "all_manifests"        => IcebergIO.allManifestsOf(spark, meta)
      case "metadata_log_entries" => IcebergIO.metadataLogEntriesOf(spark, meta)
      case "position_deletes" =>
        IcebergIO.positionDeletesOf(spark, meta, m.tablePath, pinned)
      case "partition_stats" =>
        IcebergIO.partitionStatsOf(spark, meta, m.tablePath, pinned)
      case "statistics" =>
        IcebergIO.tableStatsOf(spark, meta, m.tablePath, pinned)
      case other => throw new IllegalArgumentException(
        s"unknown Iceberg metadata relation: $other")
    }
  }

  /** A DataFrame over the metadata relation that re-resolves per query.
    * The schema is a per-kind constant — nothing is materialized here. */
  def dataFrame(spark: org.apache.spark.sql.SparkSession, tablePath: String,
                kind: String, snapshotId: Option[Long] = None,
                asOfTimestampMs: Option[Long] = None,
                ref: Option[String] = None)
      : org.apache.spark.sql.DataFrame = {
    GraftShim.addOptimization(spark, IcebergScanRule)
    // NOTE row_lineage is NOT a metadata kind: it is a TABLE-sized data
    // relation and rides [[IcebergTableScan]] (rowLineage = true) so
    // WHERE-driven pruning and honest size stats compose
    GraftShim.dataFrame(spark, IcebergMetaScan(tablePath, kind, snapshotId,
      asOfTimestampMs, ref,
      GraftShim.attributes(IcebergIO.metaSchema(kind)))(spark))
  }
}

/**
 * Replaces [[IcebergTableScan]] / [[IcebergMetaScan]] leaves with the
 * materialized (pruned) scan. Runs in `experimental.extraOptimizations`
 * — after the main operator-optimization batches, so filters have been
 * pushed down to sit directly above the leaf and every derivable
 * conjunct is visible.
 */
object IcebergScanRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case Filter(cond, rel: IcebergTableScan) =>
      // keep the exact Filter; the leaf only prunes best-effort
      Filter(cond, aligned(rel, Some(cond)))
    case rel: IcebergTableScan =>
      aligned(rel, None)
    case m: IcebergMetaScan =>
      align(m.output, GraftShim.optimizedPlan(
        IcebergMetaScan.relation(m.session, m)),
        s"${m.tablePath}#${m.kind}")
  }

  /** Materialize the scan and re-expose it under the leaf's original
    * attribute ids (the surrounding plan references those). */
  private def aligned(rel: IcebergTableScan, cond: Option[Expression]): LogicalPlan = {
    // the session captured at dataFrame() construction — NOT the
    // active-session thread-local, which in a multi-session JVM may be a
    // different session with a different Hadoop conf
    val spark = rel.session
    val df = cond match {
      case Some(c) =>
        // lineage-column conjuncts derive nothing (unknown to the
        // manifests — sound skip); table-column conjuncts prune exactly
        // as on the data view
        IcebergIO.readPruned(spark, rel.tablePath, GraftShim.predicateTreeOf(c),
          rel.snapshotId, rel.asOfTimestampMs, rel.ref, rel.rowLineage)
      case None if rel.rowLineage =>
        IcebergIO.readLineage(spark, rel.tablePath, rel.snapshotId,
          rel.asOfTimestampMs, rel.ref)
      case None =>
        IcebergIO.read(spark, rel.tablePath, rel.snapshotId,
          rel.asOfTimestampMs, ref = rel.ref)
    }
    // OPTIMIZED, not analyzed: this splices into the host plan during
    // the last optimizer batch, so the sub-plan must not re-enter the
    // main batches (a ResolvedHint from the delete-path broadcast would
    // otherwise survive to physical planning and throw)
    align(rel.output, GraftShim.optimizedPlan(df), rel.tablePath)
  }

  private def align(output: Seq[Attribute], child: LogicalPlan,
                    what: String): LogicalPlan = {
    val byName = child.output.map(a => a.name -> a).toMap
    val projections: Seq[NamedExpression] = output.map { old =>
      val now = byName.getOrElse(old.name, throw new IllegalStateException(
        s"column '${old.name}' registered for $what no longer exists " +
          s"(current: ${child.output.map(_.name).mkString(", ")}) — " +
          "re-register the table"))
      Alias(now, old.name)(exprId = old.exprId)
    }
    Project(projections, child)
  }
}
