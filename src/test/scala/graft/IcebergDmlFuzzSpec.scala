package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{IcebergFixture, IcebergIO, IcebergWrite}

/** Randomized DML interaction fuzz: a seeded op sequence
  * (append / deleteWhere / updateWhere / deleteEquality / upsert /
  * compact) runs against a PARTITIONED table and an in-memory model;
  * the read-back must match the model exactly after every step. The
  * unit specs pin each verb alone — this pins their INTERACTIONS
  * (update over prior deletes, partition-moving updates then equality
  * deletes on the moved rows, compact folding mid-sequence, upserts
  * over updated rows), which is where merge-on-read bugs live. */
class IcebergDmlFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("p", StringType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  private val parts = Vector("p0", "p1", "p2", "p3")

  private def toDf(rows: Seq[(Long, String, Double)]) = {
    val list = new java.util.ArrayList[Row]()
    rows.foreach(r => list.add(Row(r._1, r._2, r._3)))
    spark.createDataFrame(list, schema)
  }

  for (seed <- Seq(17, 41))
  test(s"30 random DML ops match the in-memory model at every step (seed $seed)") {
    runFuzz(seed, hiveImport = false)
  }

  // Same sequence over a table whose BASE is a hive-layout import: the
  // initial files physically lack `p` (injected per file from manifest
  // tuples), so every verb interaction — deletes scoping on the injected
  // column, partition-moving updates off imported files, compact folding
  // imports into table-local files, the changelog replay — runs through
  // the injection path for as long as imported files stay live.
  test("30 random DML ops over a HIVE-IMPORTED base match the model " +
      "(seed 23)") {
    runFuzz(23, hiveImport = true)
  }

  // Format-v3 variant: the same interactions over DELETION VECTORS plus
  // ROW-LINEAGE INVARIANTS at every verification step — _row_id unique
  // and non-null, and every row NOT touched by an intervening verb
  // keeps its exact (_row_id, _last_updated_sequence_number) pair, even
  // across the step-10/20/30 compactions (the materialized-lineage
  // rewrite path under every verb mix the sequence produces).
  for (seed <- Seq(31, 47))
  test(s"30 random DML ops on a v3 table preserve row lineage (seed $seed)") {
    runFuzz(seed, hiveImport = false, formatVersion = 3)
  }

  // Upgrade-mid-sequence variant: the table is BORN v2, runs a third of
  // the sequence accumulating parquet position deletes / eq deletes, then
  // upgradeFormatVersion flips it to v3 BETWEEN two random ops — the
  // absorb-legacy-pos-deletes rewrite, DV commits over mixed pre/post
  // files, and lineage derivation over files with NULL first_row_id all
  // run under the same verb storm the pure-v3 runs pin. Lineage
  // invariants are the null-tolerant forms: pre-upgrade files read NULL
  // _row_id (documented), but non-null ids stay unique, never revert to
  // null, and follow the same touched/re-identified rules.
  for (seed <- Seq(19, 53))
  test(s"30 random DML ops with a v2->v3 upgrade at step 12 (seed $seed)") {
    runFuzz(seed, hiveImport = false, formatVersion = 2,
      upgradeAtStep = Some(12))
  }

  // SNAPSHOT-ISOLATION fuzz: a reader thread hammers the table in a
  // loop WHILE the writer runs the full verb storm; every read must be
  // EXACTLY one of the committed states the model walked through —
  // never a torn mix of two commits, never a half-published metadata
  // file. This pins the atomic optimistic publish and the stale/empty
  // version-hint fallback (resolveMetadataFile's max-vN listing) under
  // real concurrent load, which no single-threaded spec reaches.
  test("concurrent reader observes only exact committed states during " +
      "the DML storm (seed 61)") {
    runFuzz(61, hiveImport = false, formatVersion = 3,
      concurrentReads = true)
  }

  // The same isolation property across the v2->v3 UPGRADE: the upgrade
  // publishes TWO commits (metadata bump, then the absorb-legacy-pos
  // replace) and flips the reader's delete-application path from
  // parquet position deletes to DVs — a read landing anywhere in that
  // window must still see exactly one committed state (both upgrade
  // commits are data-preserving by contract).
  test("concurrent reader stays consistent across a mid-storm v2->v3 " +
      "upgrade (seed 67)") {
    runFuzz(67, hiveImport = false, formatVersion = 2,
      upgradeAtStep = Some(12), concurrentReads = true)
  }

  private def runFuzz(seed: Int, hiveImport: Boolean,
                      formatVersion: Int = 2,
                      upgradeAtStep: Option[Int] = None,
                      concurrentReads: Boolean = false): Unit = {
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val dir = s"/tmp/graft_dml_fuzz_$tag"
    IcebergFixture.deleteRecursively(dir)
    IcebergWrite.create(spark, dir, schema, partitionCols = Seq("p"),
      fieldIds = !hiveImport, formatVersion = formatVersion)
    val rnd = new scala.util.Random(seed)
    var model = Map.empty[Long, (String, Double)]
    var nextId = 0L
    // current format version — advances when upgradeAtStep fires; rows
    // whose ids were allocated AFTER the upgrade must carry non-null
    // lineage (they only ever live in post-upgrade files)
    var fv = formatVersion
    var idsFromUpgrade: Option[Long] = None

    def freshIds(k: Int): Seq[Long] = {
      val ids = (nextId until nextId + k)
      nextId += k
      ids
    }
    // v3 lineage tracking, three strengths: untouched rows keep their
    // EXACT lineage pair; MODIFIED rows (update / preserving upsert) may
    // advance _last_updated but must keep their _row_id; RE-IDENTIFIED
    // rows (plain upsert = delete+insert) may change both
    var prevLin = Map.empty[Long, (Long, Long)]
    var touched = Set.empty[Long]
    var reIdentified = Set.empty[Long]
    def verify(step: String): Unit = {
      val got = IcebergIO.read(spark, dir).orderBy("id").collect()
        .map(r => (r.getLong(0), (r.getString(1), r.getDouble(2)))).toSeq
      val want = model.toSeq.sortBy(_._1)
      assert(got === want, s"divergence after $step")
      if (fv >= 3) {
        val linRows = IcebergIO.readWithRowId(spark, dir).collect()
        assert(linRows.length === model.size, s"lineage row count after $step")
        // Rows living in PRE-UPGRADE files legitimately read NULL
        // lineage (no first_row_id on carried v2 files — documented in
        // upgradeFormatVersion); a table born v3 must never have one.
        val lin = linRows.flatMap { r =>
          val ri = r.fieldIndex("_row_id")
          if (r.isNullAt(ri)) None
          else {
            assert(!r.isNullAt(r.fieldIndex("_last_updated_sequence_number")),
              s"row ${r.getLong(0)}: non-null _row_id with null " +
                s"_last_updated after $step")
            Some(r.getLong(0) -> ((r.getAs[Long]("_row_id"),
              r.getAs[Long]("_last_updated_sequence_number"))))
          }
        }.toMap
        if (upgradeAtStep.isEmpty)
          assert(lin.size === model.size, s"null lineage on a born-v3 " +
            s"table after $step")
        // guards the upgrade variant against vacuous passes: if lineage
        // stamping broke entirely post-upgrade, every id allocated after
        // the upgrade would read NULL and this fires
        idsFromUpgrade.foreach { w =>
          model.keys.filter(_ >= w).foreach(id =>
            assert(lin.contains(id),
              s"post-upgrade row $id read NULL lineage after $step"))
        }
        assert(lin.values.map(_._1).toSeq.distinct.size === lin.size,
          s"_row_id collision after $step")
        prevLin.foreach { case (id, pair) =>
          if (model.contains(id))
            assert(lin.contains(id),
              s"row $id lineage reverted to NULL after $step")
          if (lin.contains(id) && !reIdentified(id)) {
            if (!touched(id))
              assert(lin(id) === pair,
                s"untouched row $id lineage moved after $step: " +
                  s"${pair} -> ${lin(id)}")
            else
              assert(lin(id)._1 === pair._1,
                s"modified row $id changed _row_id after $step: " +
                  s"${pair._1} -> ${lin(id)._1}")
          }
        }
        prevLin = lin
        touched = Set.empty
        reIdentified = Set.empty
      }
    }

    // seed the table so every verb has something to chew on
    val initRows = freshIds(20).map(i => (i, parts(rnd.nextInt(4)), i.toDouble))
    if (hiveImport) {
      val src = s"/tmp/graft_dml_fuzz_src_$tag"
      IcebergFixture.deleteRecursively(src)
      toDf(initRows).write.partitionBy("p").parquet(src)
      IcebergWrite.addFiles(spark, dir, src)
    } else {
      IcebergWrite.append(toDf(initRows), dir)
    }
    model ++= initRows.map(r => r._1 -> ((r._2, r._3)))

    // committed-state history for the snapshot-isolation reader: every
    // verb publishes exactly ONE data-visible state, so the set of
    // post-op model snapshots IS the set of readable table contents
    val states =
      scala.collection.mutable.Set.empty[Seq[(Long, (String, Double))]]
    def record(): Unit = { states += model.toSeq.sortBy(_._1): Unit }
    // the EMPTY create() state is also committed history: a reader
    // resolving through a torn/stale version hint may legitimately land
    // on v1 (the pre-append metadata) — stale is fine, torn is not
    states += Seq.empty
    record()
    val readerStop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val readerErr =
      new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val readerSeen = new java.util.concurrent
      .ConcurrentLinkedQueue[Seq[(Long, (String, Double))]]()
    val reader: Option[Thread] = if (!concurrentReads) None else Some {
      val t = new Thread(() => {
        try {
          while (!readerStop.get) {
            val got = IcebergIO.read(spark, dir).orderBy("id").collect()
              .map(r => (r.getLong(0), (r.getString(1), r.getDouble(2))))
              .toSeq
            readerSeen.add(got): Unit
          }
        } catch { case e: Throwable => readerErr.set(e) }
      })
      t.setDaemon(true)
      t.start()
      t
    }

    // stop the reader even when the storm itself throws — a live daemon
    // reader would keep firing Spark jobs for the rest of the JVM,
    // obscuring the original failure and perturbing later suites
    try for (step <- 1 to 30) {
      if (upgradeAtStep.contains(step)) {
        IcebergWrite.upgradeFormatVersion(spark, dir)
        fv = 3
        idsFromUpgrade = Some(nextId)
        verify(s"upgrade at step $step")
      }
      val op = rnd.nextInt(9)
      op match {
        case 0 => // append fresh rows
          val rows = freshIds(1 + rnd.nextInt(5))
            .map(i => (i, parts(rnd.nextInt(4)), i.toDouble))
          IcebergWrite.append(toDf(rows), dir)
          model ++= rows.map(r => r._1 -> ((r._2, r._3)))
        case 1 => // position delete by residue predicate
          val m = 2 + rnd.nextInt(5); val r0 = rnd.nextInt(m)
          IcebergWrite.deleteWhere(spark, dir, pmod(col("id"), lit(m.toLong)) === r0.toLong)
          model = model.filter { case (id, _) => id % m != r0 }
        case 2 => // update: score bump keyed on residue, sees the OLD row
          val m = 2 + rnd.nextInt(5); val r0 = rnd.nextInt(m)
          IcebergWrite.updateWhere(spark, dir,
            pmod(col("id"), lit(m.toLong)) === r0.toLong,
            Map("score" -> (col("score") + 100.0)))
          touched ++= model.keys.filter(_ % m == r0)
          model = model.map { case (id, (p, s)) =>
            id -> ((p, if (id % m == r0) s + 100.0 else s))
          }
        case 3 => // PARTITION-MOVING update on one source partition
          val from = parts(rnd.nextInt(4)); val to = parts(rnd.nextInt(4))
          IcebergWrite.updateWhere(spark, dir, col("p") === from,
            Map("p" -> lit(to)))
          touched ++= model.collect { case (id, (p, _)) if p == from => id }
          model = model.map { case (id, (p, s)) =>
            id -> ((if (p == from) to else p, s))
          }
        case 4 => // equality delete on a partition value (scoped files)
          val victim = parts(rnd.nextInt(4))
          // deleteEquality refuses an empty values frame implicitly by
          // writing a no-op; the model mirrors exact equality semantics
          IcebergWrite.deleteEquality(
            toDf(Seq((0L, victim, 0.0))).select("p").distinct(), dir)
          model = model.filter { case (_, (p, _)) => p != victim }
        case 5 => // upsert: replace a few survivors + insert a few fresh;
          // on v3 half the draws go identity-PRESERVING — matched keys
          // must then keep their _row_id through every later verb
          val existing = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(3))
            .map(i => (i, parts(rnd.nextInt(4)), -1.0 * i))
          val fresh = freshIds(rnd.nextInt(3))
            .map(i => (i, parts(rnd.nextInt(4)), i.toDouble))
          val rows = existing ++ fresh
          val preserve = fv >= 3 && rnd.nextBoolean()
          if (rows.nonEmpty) {
            IcebergWrite.upsert(toDf(rows), dir, Seq("id"),
              preserveLineage = preserve)
            if (preserve) touched ++= rows.map(_._1) // _row_id preserved
            else reIdentified ++= rows.map(_._1) // delete+insert
            model ++= rows.map(r => r._1 -> ((r._2, r._3)))
          }
        case 6 => // maintenance: fold position-delete files (model unchanged)
          IcebergWrite.rewritePositionDeletes(spark, dir)
        case 7 => // maintenance: equality -> positional (model unchanged)
          IcebergWrite.convertEqualityDeletes(spark, dir)
        case 8 => // full-sync MERGE: the table becomes the source exactly
          // (matched keys UPDATE in place — v3 lineage preserved —
          // unmatched source keys insert, NOT MATCHED BY SOURCE deletes
          // the rest)
          val keep = rnd.shuffle(model.toSeq).take(model.size / 2)
            .map { case (id, (p, _)) => (id, p, -2.0 * id) }
          val fresh = freshIds(1 + rnd.nextInt(2))
            .map(i => (i, parts(rnd.nextInt(4)), i.toDouble))
          val src = keep ++ fresh
          if (src.nonEmpty) {
            import org.apache.spark.sql.functions.expr
            IcebergWrite.merge(spark, dir, toDf(src), Seq("id"), Seq(
              IcebergWrite.WhenMatchedUpdate(Map(
                "p" -> expr("s.p"), "score" -> expr("s.score"))),
              IcebergWrite.WhenNotMatchedInsert(Map(
                "id" -> expr("s.id"), "p" -> expr("s.p"),
                "score" -> expr("s.score"))),
              IcebergWrite.WhenNotMatchedBySourceDelete()))
            touched ++= keep.map(_._1) // UPDATE rewrites preserve _row_id
            model = src.map(r => r._1 -> ((r._2, r._3))).toMap
          }
      }
      record()
      if (step % 10 == 0) IcebergWrite.compact(spark, dir)
      if (step % 5 == 0 || step == 30) verify(s"step $step (op $op)")
    } finally {
      readerStop.set(true)
      reader.foreach(_.join(60000))
    }
    reader.foreach { t =>
      assert(!t.isAlive, "reader thread still running after join timeout")
      Option(readerErr.get).foreach(e =>
        throw new AssertionError("concurrent reader thread failed", e))
      import scala.jdk.CollectionConverters._
      val seen = readerSeen.asScala.toSeq
      assert(seen.nonEmpty, "reader thread never completed a read")
      // the storm takes tens of seconds and each read is sub-second, so
      // a reader that completed several reads witnesses multiple
      // distinct commits; a loaded machine can stall the FIRST read
      // (Spark job warmup) past most of the storm. When the reader
      // demonstrably kept pace the distinct-states property is a hard
      // assert; when it did not, CANCEL (visible in the report) rather
      // than silently skip — a green run must mean the property ran
      seen.zipWithIndex.foreach { case (g, i) =>
        assert(states.contains(g),
          s"read $i observed a state OUTSIDE the committed history " +
            s"(${g.size} rows; sample ${g.take(3)}) — torn or " +
            "half-published snapshot")
      }
    }
    // final shape sanity: history intact, entries readable, files live
    assert(IcebergIO.snapshotIds(dir).nonEmpty)
    assert(IcebergIO.entries(spark, dir).count() ===
      IcebergIO.files(spark, dir).count())
    // CHANGELOG CONSISTENCY over the whole fuzzed history: summing each
    // row value's inserts minus deletes across every emitted change must
    // reproduce the final live multiset exactly — the strongest
    // cross-check of per-snapshot change attribution under every verb
    // interaction the sequence produced (compact commits are skipped as
    // data-preserving, so they must not perturb the net).
    val net = IcebergIO.readChangelog(spark, dir)
      .groupBy("id", "p", "score")
      .agg(sum(when(col("_change_type") === "insert", 1L).otherwise(-1L))
        .as("n"))
      .filter(col("n") =!= 0L)
    assert(net.filter(col("n") =!= 1L).isEmpty,
      "net multiplicity other than 0/1 — changelog double-counted a row")
    val replayed = net.select("id", "p", "score").orderBy("id").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getDouble(2)))).toSeq
    assert(replayed === model.toSeq.sortBy(_._1),
      "changelog replay diverged from the final table state")
    // distinct-states claim LAST, after every other assert already ran:
    // a reader too slow to witness multiple commits (loaded machine)
    // CANCELS visibly instead of silently passing, and the cancel
    // cannot mask any of the checks above
    reader.foreach { _ =>
      import scala.jdk.CollectionConverters._
      val seen = readerSeen.asScala.toSeq
      assume(seen.size >= 5,
        s"reader completed only ${seen.size} read(s) — too few to " +
          "exercise the multiple-distinct-states property (loaded " +
          "machine); every completed read was still history-verified")
      assert(seen.distinct.size >= 2,
        s"reader saw only ${seen.distinct.size} distinct state(s) " +
          s"over ${seen.size} reads")
    }
  }
}
