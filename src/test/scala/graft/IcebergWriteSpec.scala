package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftFs, IcebergFixture, IcebergIO, IcebergWrite}

/** Native Iceberg WRITE path ([[IcebergWrite]]): create/append/overwrite
  * via one distributed job + spec commit protocol, round-tripped through
  * the in-repo reader (and its pruning machinery — written stats and
  * partition tuples must PRUNE, not just parse). */
class IcebergWriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val root =
    s"/tmp/graft_iceberg_write_${java.util.UUID.randomUUID().toString.take(8)}"

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true)))

  private def df(rows: (Long, String, Double)*) = {
    val list = new java.util.ArrayList[Row]()
    rows.foreach(r => list.add(Row(r._1, r._2, r._3)))
    spark.createDataFrame(list, schema)
  }

  private def ids(d: org.apache.spark.sql.DataFrame): Seq[Long] =
    d.select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("create -> empty read -> append -> append: content + time travel") {
    val dir = s"$root/basic"
    IcebergWrite.create(spark, dir, schema)
    val empty = IcebergIO.read(spark, dir)
    assert(empty.schema.fieldNames.toSeq === Seq("id", "name", "score"))
    assert(empty.count() === 0L)

    val s1 = IcebergWrite.append(df((1L, "a", 1.5), (2L, "b", 2.5)), dir)
    val s2 = IcebergWrite.append(df((3L, "c", 3.5)), dir)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L, 3L))
    assert(ids(IcebergIO.read(spark, dir, snapshotId = Some(s1))) === Seq(1L, 2L))
    assert(ids(IcebergIO.read(spark, dir, snapshotId = Some(s2))) === Seq(1L, 2L, 3L))
    // values, not just ids
    val r = IcebergIO.read(spark, dir).filter(col("id") === 3L).collect().head
    assert((r.getLong(0), r.getString(1), r.getDouble(2)) === ((3L, "c", 3.5)))
    // history surfaces both snapshots on the main lineage
    assert(IcebergIO.snapshotIds(dir) === Seq(s1, s2))
  }

  test("create is refused on an existing table; append checks schema") {
    val dir = s"$root/guards"
    IcebergWrite.create(spark, dir, schema)
    intercept[IllegalArgumentException](IcebergWrite.create(spark, dir, schema))
    val bad = df((1L, "a", 1.0)).withColumnRenamed("score", "points")
    intercept[IllegalArgumentException](IcebergWrite.append(bad, dir))
  }

  test("overwrite replaces live content; old snapshot stays time-travelable") {
    val dir = s"$root/overwrite"
    IcebergWrite.create(spark, dir, schema)
    val s1 = IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0)), dir)
    val s2 = IcebergWrite.overwrite(df((9L, "z", 9.0)), dir)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(9L))
    assert(ids(IcebergIO.read(spark, dir, snapshotId = Some(s1))) === Seq(1L, 2L))
    val meta = IcebergIO.loadMetadata(dir)
    assert(meta.currentSnapshotId === Some(s2))
  }

  test("identity-partitioned write: planning-time pruning + stats prune") {
    val dir = s"$root/parted"
    IcebergWrite.create(spark, dir, schema, partitionCols = Seq("name"))
    IcebergWrite.append(
      df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0), (4L, "c", 4.0)), dir)
    // one data file per partition tuple
    val files = IcebergIO.files(spark, dir).collect()
    assert(files.length === 3)
    // partition pruning on the written tuples: only a's file is scanned
    val pruned = IcebergIO.read(spark, dir, partitionFilter = Map("name" -> "a"))
    assert(pruned.inputFiles.length === 1)
    assert(ids(pruned) === Seq(1L, 3L))
    // manifest stats (bounds) prune too: id >= 4 excludes a/b files
    val statsPruned = IcebergIO.readWhere(spark, dir, col("id") >= 4L)
    assert(statsPruned.inputFiles.length === 1)
    assert(ids(statsPruned) === Seq(4L))
  }

  test("bucket + truncate transform writes prune and round-trip") {
    val dir = s"$root/bucketed"
    IcebergWrite.create(spark, dir, schema,
      partitionCols = Seq("name"),
      partitionTransforms = Map("name" -> "bucket[4]"))
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)), dir)
    val full = ids(IcebergIO.read(spark, dir))
    assert(full === Seq(1L, 2L, 3L))
    // bucket pruning keeps every row in b's bucket (hash collisions are
    // legitimate — compute expected membership, don't assume distinct)
    val bBucket = graft.sources.IcebergTransforms.bucket(4, "b")
    val expected = Seq("a" -> 1L, "b" -> 2L, "c" -> 3L)
      .filter(kv => graft.sources.IcebergTransforms.bucket(4, kv._1) == bBucket)
      .map(_._2).sorted
    val pruned = IcebergIO.read(spark, dir, partitionFilter = Map("name" -> "b"))
    assert(ids(pruned) === expected)
    assert(pruned.inputFiles.length <= 2)

    val dir2 = s"$root/truncated"
    IcebergWrite.create(spark, dir2, schema,
      partitionCols = Seq("name"),
      partitionTransforms = Map("name" -> "truncate[1]"))
    IcebergWrite.append(df((1L, "aa", 1.0), (2L, "ab", 2.0), (3L, "bz", 3.0)), dir2)
    val p2 = IcebergIO.read(spark, dir2, partitionFilter = Map("name" -> "ab"))
    assert(ids(p2) === Seq(1L, 2L)) // shares the 'a' truncate bucket
    assert(p2.inputFiles.length === 1)
  }

  test("date-identity partition records epoch-day ordinals; prunes by date") {
    val dir = s"$root/dated"
    val st2 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("d", DateType, nullable = false)))
    def rows2(xs: (Long, String)*) = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(
        xs.map(x => Row(x._1, java.sql.Date.valueOf(x._2))): _*)), st2)
    IcebergWrite.create(spark, dir, st2, partitionCols = Seq("d"))
    IcebergWrite.append(
      rows2(1L -> "1995-03-05", 2L -> "1995-03-05", 3L -> "2001-07-01"), dir)
    val pruned = IcebergIO.read(spark, dir,
      partitionFilter = Map("d" -> java.sql.Date.valueOf("1995-03-05")))
    assert(ids(pruned) === Seq(1L, 2L))
    assert(pruned.inputFiles.length === 1)
  }

  test("null partition value and hive-escaped string values round-trip") {
    val dir = s"$root/specialvals"
    IcebergWrite.create(spark, dir, schema, partitionCols = Seq("name"))
    IcebergWrite.append(
      df((1L, null, 1.0), (2L, "a b/c%d", 2.0), (3L, "plain", 3.0)), dir)
    val out = IcebergIO.read(spark, dir).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("<null>")))
      .sorted.toSeq
    assert(out === Seq((1L, "<null>"), (2L, "a b/c%d"), (3L, "plain")))
    assert(ids(IcebergIO.read(spark, dir,
      partitionFilter = Map("name" -> "a b/c%d"))) === Seq(2L))
  }

  test("maxRecordsPerFile splits files with exact per-file record counts") {
    val dir = s"$root/split"
    IcebergWrite.create(spark, dir, schema)
    val many = spark.range(0, 10).selectExpr(
      "id", "cast(id as string) as name", "cast(id as double) as score")
    IcebergWrite.append(many.coalesce(1), dir, maxRecordsPerFile = Some(3L))
    val files = IcebergIO.files(spark, dir).collect()
    assert(files.length === 4) // 3+3+3+1
    assert(files.map(_.getAs[Long]("record_count")).sum === 10L)
    assert(files.forall(_.getAs[Long]("record_count") <= 3L))
    assert(ids(IcebergIO.read(spark, dir)) === (0L until 10L))
  }

  test("append to a fixture table with equality deletes: seq rule holds") {
    val dir = s"$root/mixed"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    w.append(df((1L, "a", 1.0), (2L, "b", 2.0)))
    import spark.implicits._
    w.deleteEquality(Seq(1L).toDF("id"), Seq(1)) // deletes the first id=1
    assert(ids(IcebergIO.read(spark, dir)) === Seq(2L))
    // a RE-INSERTED id=1 lands at a HIGHER sequence number than the
    // delete -> survives, while the original stays deleted
    IcebergWrite.append(df((1L, "again", 1.5), (3L, "c", 3.0)), dir)
    val out = IcebergIO.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(out === Seq((1L, "again"), (2L, "b"), (3L, "c")))
  }

  test("concurrent commit: the second publisher of a version fails loudly") {
    val dir = s"$root/race"
    IcebergWrite.create(spark, dir, schema)
    IcebergWrite.append(df((1L, "a", 1.0)), dir) // publishes v2
    // simulate a racing writer that already published v3
    val out = GraftFs.create(GraftFs.child(GraftFs.child(dir, "metadata"),
      "v3.metadata.json"))
    out.write("{}".getBytes("UTF-8")); out.close()
    val e = intercept[IllegalStateException](
      IcebergWrite.append(df((2L, "b", 2.0)), dir))
    assert(e.getMessage.contains("concurrent commit"))
    // the table still reads at its last good version
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L))
  }

  test("concurrent appends: optimistic retries land every batch exactly once") {
    val dir = s"$root/race_real"
    IcebergWrite.create(spark, dir, schema)
    val writers = 6
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    try {
      val tasks = (0 until writers).map { i =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            val rows = df((100L + i, s"w$i", i.toDouble))
            var attempts = 0
            var done = false
            while (!done) {
              attempts += 1
              require(attempts <= 40, s"writer $i starved after 40 attempts")
              try { IcebergWrite.append(rows, dir); done = true }
              catch {
                // the loser of an optimistic race retries against the
                // newly published metadata (staging dirs are unique per
                // attempt, so a racing writer never clobbers another's
                // staged files)
                case e: IllegalStateException
                  if e.getMessage.contains("concurrent commit") => ()
              }
            }
          }
        })
      }
      tasks.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdownNow()
    // every batch exactly once, one snapshot per batch, strictly
    // increasing sequence numbers
    assert(ids(IcebergIO.read(spark, dir)) === (0 until writers).map(100L + _))
    assert(IcebergIO.snapshotIds(dir).size === writers)
    val seqs = IcebergIO.files(spark, dir).collect()
      .map(_.getLong(4)).sorted.toSeq
    assert(seqs === (1 to writers).map(_.toLong))
    // no staging debris survives the retries
    assert(!GraftFs.list(dir).exists(_.getPath.getName.startsWith("_tmp_")))
  }

  test("format v1 create + append round-trips") {
    val dir = s"$root/v1"
    IcebergWrite.create(spark, dir, schema, formatVersion = 1)
    IcebergWrite.append(df((1L, "a", 1.0)), dir)
    IcebergWrite.append(df((2L, "b", 2.0)), dir)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L))
  }

  test("deleteWhere removes exactly the matching rows (partitioned, MoR)") {
    val dir = s"$root/delwhere"
    IcebergWrite.create(spark, dir, schema, partitionCols = Seq("name"))
    IcebergWrite.append(
      df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0), (4L, "b", 4.0)), dir)
    val preDelete = IcebergIO.loadMetadata(dir).currentSnapshotId.get
    val s2 = IcebergWrite.deleteWhere(spark, dir, col("score") >= 3.0)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L))
    // merge-on-read: data files untouched, time travel sees everything
    assert(ids(IcebergIO.read(spark, dir, snapshotId = Some(preDelete))) ===
      Seq(1L, 2L, 3L, 4L))
    assert(IcebergIO.loadMetadata(dir).currentSnapshotId === Some(s2))
    // a second delete on top composes
    IcebergWrite.deleteWhere(spark, dir, col("id") === 1L)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(2L))
    // deleting an already-deleted row is a no-op, not an error
    IcebergWrite.deleteWhere(spark, dir, col("id") === 1L)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(2L))
  }

  test("deleteWhere works against a fixture-written table") {
    val dir = s"$root/delwhere_fixture"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    w.append(df((1L, "a", 1.0), (2L, "b", 2.0)))
    w.append(df((3L, "c", 3.0)))
    IcebergWrite.deleteWhere(spark, dir, col("name") === "b")
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 3L))
  }

  test("deleteEquality: global key delete + re-insert survives (seq rule)") {
    val dir = s"$root/deleq"
    IcebergWrite.create(spark, dir, schema)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0)), dir)
    import spark.implicits._
    IcebergWrite.deleteEquality(Seq(1L).toDF("id"), dir)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(2L))
    // re-inserted id=1 has a HIGHER data sequence number -> survives
    IcebergWrite.append(df((1L, "again", 1.5)), dir)
    val out = IcebergIO.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(out === Seq((1L, "again"), (2L, "b")))
    // unknown column and reserved-prefix names fail loudly
    intercept[IllegalArgumentException](
      IcebergWrite.deleteEquality(Seq(1L).toDF("nope"), dir))
    intercept[IllegalArgumentException](
      IcebergWrite.deleteEquality(Seq(1L).toDF("__gf_x"), dir))
  }

  test("deleteEquality on a partitioned table writes partition-scoped files") {
    val dir = s"$root/deleq_scoped"
    import spark.implicits._
    val rows = Seq((1L, "a", "p1"), (2L, "b", "p1"), (3L, "a", "p2"),
      (4L, "c", "p2"), (5L, "a", "p3"), (6L, null.asInstanceOf[String], "p3"),
      (8L, "d", null.asInstanceOf[String]))
      .toDF("id", "k", "p")
    IcebergWrite.create(spark, dir, rows.schema, partitionCols = Seq("p"))
    IcebergWrite.append(rows, dir)
    // 'a' spans three partitions, null-k matches null (<=>), and 'd'
    // lives in the NULL partition — the delete columns do NOT include
    // the partition source, so scope is derived by joining against the
    // current data
    IcebergWrite.deleteEquality(
      Seq("a", "d", null.asInstanceOf[String]).toDF("k"), dir)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(2L, 4L))
    // the .files relation shows content-2 files each scoped to ONE
    // partition (a global file would read back null-partition-scoped)
    val delFiles = IcebergIO.files(spark, dir)
      .filter(col("content") === 2)
      .select("partition").collect().map(_.getString(0)).sorted.toSeq
    assert(delFiles === Seq("p=null", "p=p1", "p=p2", "p=p3"),
      s"expected one scoped delete file per affected partition, got $delFiles")
    // seq rule: a NEW 'a' row appended after the delete survives
    IcebergWrite.append(Seq((7L, "a", "p1")).toDF("id", "k", "p"), dir)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(2L, 4L, 7L))
    // values with no matching current row stage no delete file (no-op)
    val before = IcebergIO.files(spark, dir)
      .filter(col("content") === 2).count()
    IcebergWrite.deleteEquality(Seq("zzz").toDF("k"), dir)
    assert(IcebergIO.files(spark, dir)
      .filter(col("content") === 2).count() === before)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(2L, 4L, 7L))
  }

  test("scoped eq-delete + upsert on transform-partitioned tables") {
    import spark.implicits._
    // bucket[4] on the key: the scoped delete must land in each key's
    // murmur3 bucket, and the upsert's delete must scope the same way
    val bdir = s"$root/scoped_bucket"
    IcebergWrite.create(spark, bdir, schema, partitionCols = Seq("name"),
      partitionTransforms = Map("name" -> "bucket[4]"))
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)), bdir)
    IcebergWrite.deleteEquality(Seq("b").toDF("name"), bdir)
    assert(ids(IcebergIO.read(spark, bdir)) === Seq(1L, 3L))
    IcebergWrite.upsert(df((1L, "a", 10.0), (4L, "d", 4.0)), bdir, Seq("id"))
    val got = IcebergIO.read(spark, bdir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(got === Seq((1L, 10.0), (3L, 3.0), (4L, 4.0)))

    // truncate[1]: two keys SHARE a partition — deleting one must not
    // take the other with it (the delete rows are key-scoped, the
    // partition tuple only bounds where they apply)
    val tdir = s"$root/scoped_trunc"
    IcebergWrite.create(spark, tdir, schema, partitionCols = Seq("name"),
      partitionTransforms = Map("name" -> "truncate[1]"))
    IcebergWrite.append(df((1L, "aa", 1.0), (2L, "ab", 2.0), (3L, "bz", 3.0)), tdir)
    IcebergWrite.deleteEquality(Seq("aa").toDF("name"), tdir)
    assert(ids(IcebergIO.read(spark, tdir)) === Seq(2L, 3L),
      "'ab' shares the truncate partition with 'aa' and must survive")

    // date identity: manifests store epoch-day ordinals
    val ddir = s"$root/scoped_date"
    val dschema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("d", DateType, nullable = true)))
    val drows = {
      val list = new java.util.ArrayList[Row]()
      Seq((1L, "2024-01-01"), (2L, "2024-01-01"), (3L, "2024-02-15"))
        .foreach { case (i, d) =>
          list.add(Row(i, java.sql.Date.valueOf(d)))
        }
      spark.createDataFrame(list, dschema)
    }
    IcebergWrite.create(spark, ddir, dschema, partitionCols = Seq("d"))
    IcebergWrite.append(drows, ddir)
    val delDates = {
      val list = new java.util.ArrayList[Row]()
      list.add(Row(java.sql.Date.valueOf("2024-01-01")))
      spark.createDataFrame(list,
        StructType(Seq(StructField("d", DateType, nullable = true))))
    }
    IcebergWrite.deleteEquality(delDates, ddir)
    assert(ids(IcebergIO.read(spark, ddir)) === Seq(3L))
  }

  test("upsert: one atomic snapshot updates + inserts, partitioned") {
    val dir = s"$root/upsert_part"
    import spark.implicits._
    val base = Seq((1L, "one", "p1"), (2L, "two", "p1"), (3L, "three", "p2"))
      .toDF("id", "v", "p")
    IcebergWrite.create(spark, dir, base.schema, partitionCols = Seq("p"))
    IcebergWrite.append(base, dir)
    // id=2 moves partition p1 -> p2 (the delete scopes to OLD p1, the
    // new row lands in p2); id=4 is a pure insert
    val up = Seq((2L, "TWO", "p2"), (4L, "four", "p3")).toDF("id", "v", "p")
    val snapsBefore = IcebergIO.snapshotIds(dir).size
    IcebergWrite.upsert(up, dir, Seq("id"))
    assert(IcebergIO.snapshotIds(dir).size === snapsBefore + 1,
      "upsert must publish exactly ONE snapshot")
    val got = IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got === Seq((1L, "one", "p1"), (2L, "TWO", "p2"),
      (3L, "three", "p2"), (4L, "four", "p3")))
    // idempotent re-upsert of the same rows changes nothing
    IcebergWrite.upsert(up, dir, Seq("id"))
    val again = IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(again === got)
  }

  test("upsert: unpartitioned, empty-table degenerate, and guards") {
    val dir = s"$root/upsert_flat"
    IcebergWrite.create(spark, dir, schema)
    // empty table: no delete manifest, plain append
    IcebergWrite.upsert(df((1L, "x", 1.0)), dir, Seq("id"))
    IcebergWrite.upsert(df((1L, "y", 2.0), (2L, "z", 3.0)), dir, Seq("id"))
    val got = IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "y"), (2L, "z")))
    // composite key upsert
    IcebergWrite.upsert(df((2L, "z", 9.0)), dir, Seq("id", "name"))
    assert(IcebergIO.read(spark, dir).filter(col("id") === 2L)
      .collect().head.getDouble(2) === 9.0)
    intercept[IllegalArgumentException](
      IcebergWrite.upsert(df((1L, "a", 1.0)), dir, Nil))
    intercept[IllegalArgumentException](
      IcebergWrite.upsert(df((1L, "a", 1.0)), dir, Seq("nope")))
    // v1 tables cannot upsert (no equality deletes)
    val v1dir = s"$root/upsert_v1"
    IcebergWrite.create(spark, v1dir, schema, formatVersion = 1)
    intercept[IllegalArgumentException](
      IcebergWrite.upsert(df((1L, "a", 1.0)), v1dir, Seq("id")))
  }

  test("updateWhere: one snapshot, simultaneous assignment, time travel") {
    val dir = s"$root/update_basic"
    IcebergWrite.create(spark, dir, schema)
    val s1 = IcebergWrite.append(
      df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0)), dir)
    val snapsBefore = IcebergIO.snapshotIds(dir).size
    // SQL UPDATE semantics: every SET expression sees the OLD row —
    // 'id' changes and 'score' reads the PRE-update id
    IcebergWrite.updateWhere(spark, dir, col("name") === "a",
      Map("id" -> (col("id") + 10L),
          "score" -> col("id").cast("double")))
    assert(IcebergIO.snapshotIds(dir).size === snapsBefore + 1,
      "updateWhere must publish exactly ONE snapshot")
    val got = IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got === Seq((2L, "b", 2.0), (11L, "a", 1.0), (13L, "a", 3.0)))
    // the pre-update snapshot is still exactly readable
    assert(ids(IcebergIO.read(spark, dir, snapshotId = Some(s1)))
      === Seq(1L, 2L, 3L))
  }

  test("updateWhere: partition-moving assignment + post-move pruning") {
    val dir = s"$root/update_part"
    import spark.implicits._
    val base = Seq((1L, "one", "p1"), (2L, "two", "p1"), (3L, "three", "p2"))
      .toDF("id", "v", "p")
    IcebergWrite.create(spark, dir, base.schema, partitionCols = Seq("p"))
    IcebergWrite.append(base, dir)
    IcebergWrite.updateWhere(spark, dir, col("id") === 2L,
      Map("p" -> org.apache.spark.sql.functions.lit("p9"),
          "v" -> org.apache.spark.sql.functions.upper(col("v"))))
    val got = IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got === Seq((1L, "one", "p1"), (2L, "TWO", "p9"),
      (3L, "three", "p2")))
    // the rewritten row is visible under its NEW partition via pruning,
    // and pruned out of its OLD one
    assert(IcebergIO.read(spark, dir, partitionFilter = Map("p" -> "p9"))
      .collect().map(_.getLong(0)).toSeq === Seq(2L))
    assert(!IcebergIO.read(spark, dir, partitionFilter = Map("p" -> "p1"))
      .collect().map(_.getLong(0)).contains(2L))
  }

  test("updateWhere: no-match no-op, deleted rows stay dead, guards") {
    val dir = s"$root/update_flat"
    IcebergWrite.create(spark, dir, schema)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)), dir)
    // a row removed by a PRIOR delete must not be resurrected by an
    // update whose predicate would have matched it
    IcebergWrite.deleteEquality(df((2L, "b", 2.0)).select("id"), dir)
    IcebergWrite.updateWhere(spark, dir, col("id") <= 3L,
      Map("score" -> (col("score") + 100.0)))
    val got = IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(got === Seq((1L, 101.0), (3L, 103.0)))
    // no-match update commits a clean no-op snapshot
    val snaps = IcebergIO.snapshotIds(dir).size
    IcebergWrite.updateWhere(spark, dir, col("id") === 999L,
      Map("score" -> org.apache.spark.sql.functions.lit(0.0)))
    assert(IcebergIO.snapshotIds(dir).size === snaps + 1)
    assert(IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq === got)
    // guards: unknown column, wrong result type, empty assignment set,
    // v1 table (no position deletes), empty table
    intercept[IllegalArgumentException](IcebergWrite.updateWhere(
      spark, dir, col("id") === 1L,
      Map("nope" -> org.apache.spark.sql.functions.lit(1))))
    intercept[IllegalArgumentException](IcebergWrite.updateWhere(
      spark, dir, col("id") === 1L,
      Map("score" -> org.apache.spark.sql.functions.lit("not-a-double"))))
    intercept[IllegalArgumentException](
      IcebergWrite.updateWhere(spark, dir, col("id") === 1L, Map.empty))
    val v1dir = s"$root/update_v1"
    IcebergWrite.create(spark, v1dir, schema, formatVersion = 1)
    intercept[IllegalArgumentException](IcebergWrite.updateWhere(
      spark, v1dir, col("id") === 1L,
      Map("score" -> org.apache.spark.sql.functions.lit(0.0))))
    val emptyDir = s"$root/update_empty"
    IcebergWrite.create(spark, emptyDir, schema)
    intercept[IllegalArgumentException](IcebergWrite.updateWhere(
      spark, emptyDir, col("id") === 1L,
      Map("score" -> org.apache.spark.sql.functions.lit(0.0))))
  }

  test("sort order: sorted files carry disjoint bounds that prune") {
    // SCRAMBLED input (round-robin repartition spreads the full key
    // range over every task) — the degenerate layout where stats
    // pruning does nothing unless the writer actually sorts
    val big = spark.range(1000).selectExpr("id",
      "CAST(id AS STRING) AS name", "CAST(id AS DOUBLE) AS score")
      .repartition(8)
    val unsortedDir = s"$root/unsorted_ctl"
    IcebergWrite.create(spark, unsortedDir, schema)
    IcebergWrite.append(big, unsortedDir)
    val ctl = IcebergIO.readWhere(spark, unsortedDir, col("id") === 500L)
    assert(ctl.inputFiles.length === 8,
      "control: overlapping bounds must keep every file")

    val dir = s"$root/sorted"
    IcebergWrite.create(spark, dir, schema)
    IcebergWrite.setSortOrder(dir, Seq("id"))
    val meta = IcebergIO.loadMetadata(dir)
    assert(meta.sortOrderFields === Seq("id") && meta.defaultSortOrderId > 0)
    // maxRecordsPerFile splits each (sorted) task output sequentially,
    // so files stay disjoint even when AQE coalesces the tiny range
    // shuffle to one partition
    IcebergWrite.append(big, dir, maxRecordsPerFile = Some(100L))
    val total = IcebergIO.files(spark, dir).count().toInt
    assert(total >= 10, s"expected >=10 sorted files, got $total")
    val pruned = IcebergIO.readWhere(spark, dir, col("id") === 500L)
    assert(pruned.inputFiles.length === 1,
      s"sorted write must leave ONE file for a point predicate, " +
        s"scan reads ${pruned.inputFiles.length} of $total")
    assert(pruned.collect().map(_.getLong(0)).toSeq === Seq(500L))
    // range predicate: a contiguous slice of files survives, not all
    val rng = IcebergIO.readWhere(spark, dir,
      col("id") >= 100L && col("id") < 300L)
    assert(rng.inputFiles.length < total && rng.count() === 200L)

    // order-reuse rule: same columns resolve to the SAME order id
    val before = meta.defaultSortOrderId
    IcebergWrite.setSortOrder(dir, Seq("name"))
    IcebergWrite.setSortOrder(dir, Seq("id"))
    assert(IcebergIO.loadMetadata(dir).defaultSortOrderId === before)
    // Nil restores unsorted order 0
    IcebergWrite.setSortOrder(dir, Nil)
    assert(IcebergIO.loadMetadata(dir).defaultSortOrderId === 0)
    assert(IcebergIO.loadMetadata(dir).sortOrderFields === Nil)
    intercept[IllegalArgumentException](
      IcebergWrite.setSortOrder(dir, Seq("nope")))

    // partitioned + sorted roundtrip: tuple-first in-task sort keeps
    // every per-partition file internally ordered; content stays exact
    val pdir = s"$root/sorted_part"
    import spark.implicits._
    val pdata = Seq((5L, "x", "p1"), (1L, "y", "p2"), (3L, "z", "p1"),
      (2L, "w", "p2")).toDF("id", "v", "p")
    IcebergWrite.create(spark, pdir, pdata.schema, partitionCols = Seq("p"))
    IcebergWrite.setSortOrder(pdir, Seq("id"))
    IcebergWrite.append(pdata, pdir)
    assert(IcebergIO.read(spark, pdir).orderBy("id").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 5L))
  }

  test("zorder: clustered files prune range predicates on BOTH columns") {
    // 100x100 grid, SCRAMBLED input — the layout where nothing prunes
    // unless the writer actually clusters
    val grid = spark.range(10000).selectExpr(
      "CAST(id % 100 AS INT) AS x", "CAST(id / 100 AS INT) AS y",
      "id AS payload").repartition(8)
    val gridSchema = StructType(Seq(
      StructField("x", IntegerType, nullable = false),
      StructField("y", IntegerType, nullable = false),
      StructField("payload", LongType, nullable = false)))

    // control: LINEAR sort on x — prunes x, cannot prune y
    val xdir = s"$root/z_ctl_xsort"
    IcebergWrite.create(spark, xdir, gridSchema)
    IcebergWrite.setSortOrder(xdir, Seq("x"))
    IcebergWrite.append(grid, xdir, maxRecordsPerFile = Some(500L))
    val yOnXsort = IcebergIO.readWhere(spark, xdir,
      col("y") >= 10 && col("y") < 20)
    val totalFiles = IcebergIO.files(spark, xdir).count().toInt
    assert(totalFiles >= 20)
    assert(yOnXsort.inputFiles.length === totalFiles,
      "x-sorted control must keep EVERY file for a y predicate")

    val zdir = s"$root/z_main"
    IcebergWrite.create(spark, zdir, gridSchema)
    IcebergWrite.zorderBy(zdir, Seq("x", "y"))
    IcebergWrite.append(grid, zdir, maxRecordsPerFile = Some(500L))
    val zTotal = IcebergIO.files(spark, zdir).count().toInt
    val yFiles = IcebergIO.readWhere(spark, zdir,
      col("y") >= 10 && col("y") < 20).inputFiles.length
    val xFiles = IcebergIO.readWhere(spark, zdir,
      col("x") >= 10 && col("x") < 20).inputFiles.length
    assert(yFiles < zTotal && xFiles < zTotal,
      s"z-order must prune both dimensions: x $xFiles, y $yFiles of $zTotal")
    // content stays exact under the clustered layout
    assert(IcebergIO.readWhere(spark, zdir,
      col("x") === 42 && col("y") === 17).collect()
      .map(_.getLong(2)).toSeq === Seq(1742L))
    assert(IcebergIO.read(spark, zdir).count() === 10000L)

    // 3-way interleave: every clustered dimension prunes
    val grid3 = spark.range(8000).selectExpr(
      "CAST(id % 20 AS INT) AS x", "CAST((id / 20) % 20 AS INT) AS y",
      "CAST(id / 400 AS INT) AS z", "id AS payload").repartition(8)
    val s3 = StructType(Seq(
      StructField("x", IntegerType, nullable = false),
      StructField("y", IntegerType, nullable = false),
      StructField("z", IntegerType, nullable = false),
      StructField("payload", LongType, nullable = false)))
    val z3dir = s"$root/z3_main"
    IcebergWrite.create(spark, z3dir, s3)
    IcebergWrite.zorderBy(z3dir, Seq("x", "y", "z"))
    IcebergWrite.append(grid3, z3dir, maxRecordsPerFile = Some(400L))
    val z3Total = IcebergIO.files(spark, z3dir).count().toInt
    assert(z3Total >= 16)
    Seq("x", "y", "z").foreach { d =>
      val n = IcebergIO.readWhere(spark, z3dir,
        col(d) >= 5 && col(d) < 8).inputFiles.length
      assert(n < z3Total, s"3-way z-order must prune on $d: $n of $z3Total")
    }
    assert(IcebergIO.read(spark, z3dir).count() === 8000L)

    // guards: arity, type, mutual exclusion with sort orders, clear
    intercept[IllegalArgumentException](
      IcebergWrite.zorderBy(zdir, Seq("x")))
    intercept[IllegalArgumentException](
      IcebergWrite.zorderBy(zdir, Seq("x", "y", "payload", "x", "y")))
    intercept[IllegalArgumentException](
      IcebergWrite.zorderBy(zdir, Seq("x", "payload"))) // long: rejected
    intercept[IllegalArgumentException](
      IcebergWrite.setSortOrder(zdir, Seq("x"))) // z-order declared
    intercept[IllegalArgumentException](
      IcebergWrite.zorderBy(xdir, Seq("x", "y"))) // sort order declared
    IcebergWrite.zorderBy(zdir, Nil)
    IcebergWrite.setSortOrder(zdir, Seq("x")) // clear unlocks sort order
  }

  test(".entries relation: every manifest entry, delete files included") {
    val dir = s"$root/entries"
    IcebergWrite.create(spark, dir, schema)
    val s1 = IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0)), dir)
    val s2 = IcebergWrite.append(df((3L, "c", 3.0)), dir)
    val s3 = IcebergWrite.deleteWhere(spark, dir, col("id") === 1L)
    val rows = IcebergIO.entries(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(4), r.getLong(5)))
    // every data file of both appends plus exactly one position-delete
    // file (input partitioning decides the data-file count — don't pin)
    val nFiles = IcebergIO.files(spark, dir).count()
    assert(rows.length.toLong === nFiles && rows.length >= 3)
    assert(rows.count(_._3 == 1) === 1 &&
      rows.count(_._3 == 0) === rows.length - 1)
    assert(rows.forall(_._1 == 1), "writer manifests carry ADDED entries")
    assert(rows.map(_._2).toSet === Set(s1, s2, s3),
      "each entry reports the snapshot that added it")
    // the delete file holds one (file, pos) row
    assert(rows.find(_._3 == 1).get._4 === 1L)
    // registered metadata view serves the same relation live
    val g = GraftSession.wrap(spark)
    val vn = s"ent_${java.util.UUID.randomUUID().toString.take(6)}"
    g.registerIceberg(vn, dir, metadataTables = true)
    assert(spark.table(s"${vn}_entries").count() === rows.length.toLong)
  }

  test("rewriteManifests: folds manifests, sequence rule survives") {
    val dir = s"$root/rewrite_mf"
    IcebergWrite.create(spark, dir, schema)
    val s1 = IcebergWrite.append(
      df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)), dir)
    // equality delete on id=2, then RE-INSERT id=2 at a later sequence:
    // the re-inserted row survives the delete only while its data seq
    // stays above the delete's — the exact invariant a manifest rewrite
    // could silently destroy by resetting sequence numbers
    IcebergWrite.deleteEquality(df((2L, "x", 0.0)).select("id"), dir)
    IcebergWrite.append(df((2L, "B2", 9.0)), dir)
    def state() = IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val before = state()
    assert(before === Seq((1L, "a", 1.0), (2L, "B2", 9.0), (3L, "c", 3.0)))
    val nManifestsBefore = IcebergIO.manifests(spark, dir).count()
    assert(nManifestsBefore >= 3)

    IcebergWrite.rewriteManifests(spark, dir)
    // one data manifest + one delete manifest now plan the whole table
    assert(IcebergIO.manifests(spark, dir).count() === 2)
    assert(state() === before,
      "a metadata-only rewrite must not change a single row")
    // entries carried as EXISTING, attributed to their original snapshot
    val entries = IcebergIO.entries(spark, dir).collect()
    assert(entries.forall(_.getInt(0) === 0))
    assert(entries.map(_.getLong(1)).toSet.contains(s1))
    // pre-rewrite snapshots stay exactly time-travelable
    assert(IcebergIO.read(spark, dir, snapshotId = Some(s1))
      .orderBy("id").collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    // a later append coexists with the folded manifests
    IcebergWrite.append(df((4L, "d", 4.0)), dir)
    assert(IcebergIO.read(spark, dir).count() === 4)
    // v1 / empty-table guards
    val v1dir = s"$root/rewrite_v1"
    IcebergWrite.create(spark, v1dir, schema, formatVersion = 1)
    intercept[IllegalArgumentException](
      IcebergWrite.rewriteManifests(spark, v1dir))
  }

  test("rewriteManifests groups by partition spec; pruning intact") {
    val dir = s"$root/rewrite_spec"
    import spark.implicits._
    val d = Seq((1L, "p1", 10), (2L, "p2", 20), (3L, "p1", 30))
      .toDF("id", "p", "x")
    IcebergWrite.create(spark, dir, d.schema, partitionCols = Seq("p"))
    IcebergWrite.append(d, dir)
    // evolve the spec, append under the NEW spec too
    IcebergWrite.updatePartitionSpec(dir, Seq("x"),
      Map("x" -> "bucket[4]"))
    IcebergWrite.append(Seq((4L, "p2", 40)).toDF("id", "p", "x"), dir)
    val before = IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(_.getLong(0)).toSeq
    IcebergWrite.rewriteManifests(spark, dir)
    // one data manifest PER SPEC (a manifest header carries one spec)
    assert(IcebergIO.manifests(spark, dir).count() === 2)
    assert(IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(_.getLong(0)).toSeq === before)
    // old-spec partition pruning still resolves through the rewrite:
    // p1 files survive, the p2 file drops, and the NEW-spec file (which
    // cannot resolve 'p') is kept — never silently over-pruned
    val pruned = IcebergIO.read(spark, dir,
      partitionFilter = Map("p" -> "p1"))
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L, 4L))
  }

  test("removeOrphanFiles sweeps exactly the unreferenced, old files") {
    val dir = s"$root/orphans"
    IcebergWrite.create(spark, dir, schema)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0)), dir)
    IcebergWrite.append(df((3L, "c", 3.0)), dir)
    IcebergWrite.deleteWhere(spark, dir, col("id") === 1L)
    IcebergWrite.compact(spark, dir)
    val future = System.currentTimeMillis() + 60_000
    // every snapshot is still retained -> nothing is orphaned yet
    assert(IcebergWrite.removeOrphanFiles(dir, future).isEmpty)
    // drop history, then sweep: the pre-compact data files, the
    // position-delete file, and the expired snapshots' manifests +
    // manifest lists all become orphans
    assert(IcebergWrite.expireSnapshots(dir, Long.MaxValue) > 0)
    // the olderThan guard protects everything first (simulates a sweep
    // racing an in-flight commit's fresh files)
    assert(IcebergWrite.removeOrphanFiles(dir, 0L).isEmpty)
    val swept = IcebergWrite.removeOrphanFiles(dir, future)
    assert(swept.nonEmpty)
    assert(swept.exists(_.contains("posdelete")),
      s"the folded-away position delete must be swept, got: $swept")
    // table content is untouched; metadata history files stay
    assert(ids(IcebergIO.read(spark, dir)) === Seq(2L, 3L))
    assert(GraftFs.exists(GraftFs.child(GraftFs.child(dir, "metadata"),
      "version-hint.text")))
    // a second sweep finds nothing left
    assert(IcebergWrite.removeOrphanFiles(dir, future).isEmpty)
  }

  test("v3 DV puffins: live survive the sweep, superseded sweep after expire") {
    val dir = s"$root/orphans_dv"
    IcebergWrite.create(spark, dir, schema, formatVersion = 3)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .coalesce(1), dir)
    // two DV commits on the SAME data file: the second puffin absorbs
    // (replaces) the first, which stays referenced only by history
    IcebergWrite.deleteWhere(spark, dir, col("id") === 1L)
    IcebergWrite.deleteWhere(spark, dir, col("id") === 2L)
    def puffins(): Set[String] = GraftFs.list(s"$dir/data")
      .map(_.getPath.getName).filter(_.endsWith(".puffin")).toSet
    val both = puffins()
    assert(both.size === 2)
    val future = System.currentTimeMillis() + 60_000
    // all snapshots retained: every puffin is referenced, nothing sweeps
    assert(IcebergWrite.removeOrphanFiles(dir, future).isEmpty)
    assert(IcebergWrite.expireSnapshots(dir, Long.MaxValue) > 0)
    val swept = IcebergWrite.removeOrphanFiles(dir, future)
    assert(swept.exists(_.endsWith(".puffin")),
      s"the superseded DV puffin must sweep, got: $swept")
    // the LIVE puffin survives and still applies
    assert(puffins().size === 1)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(3L))
  }

  test("setCurrentSnapshot rolls back; later snapshots stay reachable") {
    val dir = s"$root/rollback"
    IcebergWrite.create(spark, dir, schema)
    val s1 = IcebergWrite.append(df((1L, "a", 1.0)), dir)
    val s2 = IcebergWrite.append(df((2L, "b", 2.0)), dir)
    IcebergWrite.setCurrentSnapshot(dir, s1)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L))
    // rolled-past snapshot: still time-travelable by id
    assert(ids(IcebergIO.read(spark, dir, snapshotId = Some(s2))) === Seq(1L, 2L))
    // as-of AFTER the rollback resolves to the restored state (the
    // snapshot log records the rollback as the newest entry)
    assert(ids(IcebergIO.read(spark, dir,
      asOfTimestampMs = Some(System.currentTimeMillis()))) === Seq(1L))
    // appending after a rollback forks from the restored snapshot
    IcebergWrite.append(df((3L, "c", 3.0)), dir)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 3L))
    // unknown snapshot fails loudly; same-snapshot rollback is a no-op
    intercept[IllegalArgumentException](
      IcebergWrite.setCurrentSnapshot(dir, 424242L))
    val v = IcebergIO.loadMetadata(dir).metadataFile
    IcebergWrite.setCurrentSnapshot(dir, IcebergIO.loadMetadata(dir)
      .currentSnapshotId.get)
    assert(IcebergIO.loadMetadata(dir).metadataFile === v,
      "no-op rollback must not publish a new metadata version")
  }

  test("createTag / createBranch / dropRef lifecycle") {
    val dir = s"$root/refs"
    IcebergWrite.create(spark, dir, schema)
    val s1 = IcebergWrite.append(df((1L, "a", 1.0)), dir)
    val s2 = IcebergWrite.append(df((2L, "b", 2.0)), dir)
    IcebergWrite.createTag(dir, "v1.0", s1)
    IcebergWrite.createBranch(dir, "audit", s2)
    assert(ids(IcebergIO.read(spark, dir, ref = Some("v1.0"))) === Seq(1L))
    assert(ids(IcebergIO.read(spark, dir, ref = Some("audit"))) === Seq(1L, 2L))
    // refs pin their snapshot through expiration
    assert(IcebergWrite.expireSnapshots(dir, Long.MaxValue) === 0)
    // guards: duplicate name, unknown snapshot, main is reserved
    intercept[IllegalArgumentException](IcebergWrite.createTag(dir, "v1.0", s2))
    intercept[IllegalArgumentException](IcebergWrite.createTag(dir, "x", 999L))
    intercept[IllegalArgumentException](IcebergWrite.createTag(dir, "main", s1))
    intercept[IllegalArgumentException](IcebergWrite.dropRef(dir, "main"))
    intercept[IllegalArgumentException](IcebergWrite.dropRef(dir, "ghost"))
    IcebergWrite.dropRef(dir, "v1.0")
    intercept[IllegalArgumentException](
      IcebergIO.read(spark, dir, ref = Some("v1.0")).count())
  }

  test("overwrite drops prior deletes along with prior data") {
    val dir = s"$root/del_then_overwrite"
    IcebergWrite.create(spark, dir, schema)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0)), dir)
    IcebergWrite.deleteWhere(spark, dir, col("id") === 1L)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(2L))
    IcebergWrite.overwrite(df((1L, "back", 9.0)), dir)
    // the overwrite's manifest list holds ONLY the new files — the old
    // position delete must not leak onto the new data
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L))
  }

  test("compact merges small files, applies deletes, preserves content") {
    val dir = s"$root/compact"
    IcebergWrite.create(spark, dir, schema, partitionCols = Seq("name"))
    // 3 appends x 2 partitions = 6 small files, plus a delete file
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0)), dir)
    IcebergWrite.append(df((3L, "a", 3.0), (4L, "b", 4.0)), dir)
    IcebergWrite.append(df((5L, "a", 5.0), (6L, "b", 6.0)), dir)
    IcebergWrite.deleteWhere(spark, dir, col("id") === 4L)
    val before = IcebergIO.files(spark, dir).collect()
    assert(before.length === 7) // 6 data + 1 position-delete
    val preCompact = IcebergIO.loadMetadata(dir).currentSnapshotId.get
    IcebergWrite.compact(spark, dir)
    // live view: one file per partition, delete files gone, rows identical
    val after = IcebergIO.files(spark, dir).collect()
    assert(after.length === 2, s"got ${after.length} files after compaction")
    assert(after.forall(_.getAs[Int]("content") === 0))
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L, 3L, 5L, 6L))
    // pre-compaction snapshot still time-travels with its deletes applied
    assert(ids(IcebergIO.read(spark, dir, snapshotId = Some(preCompact))) ===
      Seq(1L, 2L, 3L, 5L, 6L))
  }

  test("expireSnapshots drops old metadata but keeps current + refs") {
    val dir = s"$root/expire"
    IcebergWrite.create(spark, dir, schema)
    val s1 = IcebergWrite.append(df((1L, "a", 1.0)), dir)
    val s2 = IcebergWrite.append(df((2L, "b", 2.0)), dir)
    val s3 = IcebergWrite.append(df((3L, "c", 3.0)), dir)
    val metaBefore = IcebergIO.loadMetadata(dir)
    assert(metaBefore.snapshots.size === 3)
    // everything is "old" vs a future cutoff, but current must survive
    val n = IcebergWrite.expireSnapshots(dir, olderThanMs = Long.MaxValue)
    assert(n === 2)
    val metaAfter = IcebergIO.loadMetadata(dir)
    assert(metaAfter.snapshots.map(_.snapshotId).toSet === Set(s3))
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L, 3L))
    // expired snapshots no longer time-travelable
    intercept[IllegalArgumentException](
      IcebergIO.read(spark, dir, snapshotId = Some(s1)).collect())
    // idempotent once everything young is kept
    assert(IcebergWrite.expireSnapshots(dir, olderThanMs = 0L) === 0)
    assert(s2 > s1) // ordering sanity for the ids used above
  }

  test("addColumn evolves the schema; old files read as nulls") {
    val dir = s"$root/evolve"
    IcebergWrite.create(spark, dir, schema)
    IcebergWrite.append(df((1L, "a", 1.0)), dir)
    IcebergWrite.addColumn(dir, "extra", LongType)
    // the pre-evolution file surfaces the new column as null
    val evolved = IcebergIO.read(spark, dir)
    assert(evolved.schema.fieldNames.toSeq === Seq("id", "name", "score", "extra"))
    assert(evolved.collect().head.isNullAt(3))
    // a duplicate add fails loudly; appends must now carry the column
    intercept[IllegalArgumentException](IcebergWrite.addColumn(dir, "extra", LongType))
    intercept[IllegalArgumentException](IcebergWrite.append(df((9L, "x", 9.0)), dir))
    val wide = df((2L, "b", 2.0)).withColumn("extra", col("id") * 100L)
    IcebergWrite.append(wide, dir)
    val got = IcebergIO.read(spark, dir).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
      .sorted.toSeq
    assert(got === Seq((1L, -1L), (2L, 200L)))
    // equality delete keyed on the NEW column's field id resolves by id
    import spark.implicits._
    IcebergWrite.deleteEquality(Seq(200L).toDF("extra"), dir)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L))
  }

  test("dropColumn hides the bytes; guards partition/delete refs + re-add") {
    val dir = s"$root/drop"
    IcebergWrite.create(spark, dir, schema)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0)), dir)
    IcebergWrite.dropColumn(spark, dir, "name")
    val narrowed = IcebergIO.read(spark, dir)
    assert(narrowed.schema.fieldNames.toSeq === Seq("id", "score"))
    assert(narrowed.count() === 2L)
    // appends must now carry the REDUCED schema
    intercept[IllegalArgumentException](IcebergWrite.append(df((3L, "c", 3.0)), dir))
    IcebergWrite.append(df((3L, "c", 3.0)).drop("name"), dir)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L, 3L))
    // re-adding the dropped NAME is refused (old bytes would resurrect
    // under name-based resolution); a fresh name is fine
    intercept[IllegalArgumentException](
      IcebergWrite.addColumn(dir, "name", StringType))
    IcebergWrite.addColumn(dir, "name2", StringType)
    assert(IcebergIO.read(spark, dir).schema.fieldNames.toSeq
      === Seq("id", "score", "name2"))
    // unknown column / partition source / eq-delete reference all reject
    intercept[IllegalArgumentException](
      IcebergWrite.dropColumn(spark, dir, "ghost"))
    val pdir = s"$root/drop_part"
    IcebergWrite.create(spark, pdir, schema, partitionCols = Seq("name"))
    IcebergWrite.append(df((1L, "a", 1.0)), pdir)
    intercept[IllegalArgumentException](
      IcebergWrite.dropColumn(spark, pdir, "name"))
    val edir = s"$root/drop_eq"
    IcebergWrite.create(spark, edir, schema)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0)), edir)
    import spark.implicits._
    IcebergWrite.deleteEquality(Seq("a").toDF("name"), edir)
    intercept[IllegalArgumentException](
      IcebergWrite.dropColumn(spark, edir, "name"))
    // compacting folds the delete away, after which the drop is legal
    IcebergWrite.compact(spark, edir)
    IcebergWrite.dropColumn(spark, edir, "name")
    assert(IcebergIO.read(spark, edir).schema.fieldNames.toSeq
      === Seq("id", "score"))
    assert(ids(IcebergIO.read(spark, edir)) === Seq(2L))
  }

  test("empty or stale version-hint falls back to the newest metadata") {
    val dir = s"$root/hintrace"
    IcebergWrite.create(spark, dir, schema)
    IcebergWrite.append(df((1L, "a", 1.0)), dir)
    val hint = GraftFs.child(GraftFs.child(dir, "metadata"), "version-hint.text")
    // a concurrent writer's truncate-then-write window: hint is EMPTY
    val out = GraftFs.create(hint); out.close()
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L))
    // hint names a version that does not exist (mid-publish observation)
    val out2 = GraftFs.create(hint)
    out2.write("999".getBytes("UTF-8")); out2.close()
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L))
    // and a later append repairs the hint
    IcebergWrite.append(df((2L, "b", 2.0)), dir)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L))
  }

  test("written tables register and answer SQL through the live scan") {
    val dir = s"$root/sqlsurface"
    IcebergWrite.create(spark, dir, schema, partitionCols = Seq("name"))
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0)), dir)
    val g = graft.GraftSession.wrap(spark)
    g.registerIceberg("written_ice", dir)
    val got = spark.sql(
      "SELECT name, count(*) AS n FROM written_ice GROUP BY name ORDER BY name")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("a", 2L), ("b", 1L)))
    // a write AFTER registration is visible (live view)
    IcebergWrite.append(df((4L, "b", 4.0)), dir)
    val got2 = spark.sql(
      "SELECT count(*) AS n FROM written_ice WHERE name = 'b'")
      .collect().head.getLong(0)
    assert(got2 === 2L)
  }

  test("renameColumn: pre-rename files resolve by field id; appends carry the new name") {
    val dir = s"$root/rename"
    IcebergWrite.create(spark, dir, schema)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0)), dir)
    IcebergWrite.renameColumn(dir, "name", "label")
    val renamed = IcebergIO.read(spark, dir)
    assert(renamed.schema.fieldNames.toSeq === Seq("id", "label", "score"))
    // pre-rename file content surfaces under the NEW name (by-id
    // resolution), never as nulls
    assert(renamed.orderBy("id").collect().map(_.getString(1)).toSeq
      === Seq("a", "b"))
    // appends must carry the renamed schema
    intercept[IllegalArgumentException](IcebergWrite.append(df((3L, "c", 3.0)), dir))
    IcebergWrite.append(
      df((3L, "c", 3.0)).withColumnRenamed("name", "label"), dir)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L, 3L))
    // guards: unknown source, duplicate target, internal prefix
    intercept[IllegalArgumentException](IcebergWrite.renameColumn(dir, "ghost", "x"))
    intercept[IllegalArgumentException](IcebergWrite.renameColumn(dir, "label", "id"))
    intercept[IllegalArgumentException](IcebergWrite.renameColumn(dir, "label", "__gf_x"))
  }

  test("renameColumn: equality deletes keyed on the field resolve across the rename") {
    val dir = s"$root/rename_eq"
    import spark.implicits._
    IcebergWrite.create(spark, dir, schema)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)), dir)
    // delete BEFORE the rename: the delete file stores the OLD name
    IcebergWrite.deleteEquality(Seq("a").toDF("name"), dir)
    IcebergWrite.renameColumn(dir, "name", "label")
    assert(ids(IcebergIO.read(spark, dir)) === Seq(2L, 3L))
    // delete AFTER the rename, keyed on the NEW name, hitting an OLD file
    IcebergWrite.deleteEquality(Seq("b").toDF("label"), dir)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(3L))
  }

  test("renameColumn: partition source rename keeps pruning + deleteWhere + upsert working") {
    val dir = s"$root/rename_part"
    IcebergWrite.create(spark, dir, schema, partitionCols = Seq("name"))
    IcebergWrite.append(df((1L, "x", 1.0), (2L, "y", 2.0)), dir)
    IcebergWrite.renameColumn(dir, "name", "tag")
    IcebergWrite.append(df((3L, "x", 3.0)).withColumnRenamed("name", "tag"), dir)
    // partition pruning through the renamed SOURCE column name
    assert(ids(IcebergIO.read(spark, dir,
      partitionFilter = Map("tag" -> "x"))) === Seq(1L, 3L))
    // position delete by predicate over the renamed column (matches a
    // pre-rename file by id-resolved read)
    IcebergWrite.deleteWhere(spark, dir, col("tag") === "y")
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 3L))
    // whole-row upsert with the renamed schema
    IcebergWrite.upsert(
      df((1L, "x", 10.0), (9L, "z", 9.0)).withColumnRenamed("name", "tag"),
      dir, keyCols = Seq("id"))
    val got = IcebergIO.read(spark, dir).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(got === Seq((1L, 10.0), (3L, 3.0), (9L, 9.0)))
  }

  test("renameColumn is refused on tables without the field-id property") {
    val dir = s"$root/rename_ext"
    // a fixture-written table has no graft.write.field-ids property —
    // exactly the external-table shape the guard exists for
    val w = new IcebergFixture.Writer(spark, dir, schema)
    w.append(df((1L, "a", 1.0), (2L, "b", 2.0)))
    val e = intercept[IllegalArgumentException](
      IcebergWrite.renameColumn(dir, "name", "label"))
    assert(e.getMessage.contains("field-id"))
  }

  test("reader output schema carries no field-id metadata leak") {
    val dir = s"$root/rename_meta"
    IcebergWrite.create(spark, dir, schema)
    IcebergWrite.append(df((1L, "a", 1.0)), dir)
    val out = IcebergIO.read(spark, dir)
    assert(out.schema.fields.forall(!_.metadata.contains("parquet.field.id")))
  }

  test("partition evolution: files stay under their spec; reads and deletes span specs") {
    val dir = s"$root/evolve"
    IcebergFixture.deleteRecursively(dir)
    IcebergWrite.create(spark, dir, schema) // spec 0: unpartitioned
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0)), dir)
    IcebergWrite.updatePartitionSpec(dir, Seq("name")) // spec 1: identity(name)
    IcebergWrite.append(df((3L, "a", 3.0), (4L, "b", 4.0)), dir)
    IcebergWrite.updatePartitionSpec(dir, Seq("id"),
      Map("id" -> "bucket[4]")) // spec 2: bucket(id)
    IcebergWrite.append(df((5L, "a", 5.0)), dir)

    val meta = IcebergIO.loadMetadata(dir)
    assert(meta.specsById.keySet === Set(0, 1, 2))
    assert(meta.defaultSpecId === 2)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L, 3L, 4L, 5L))

    // a filter on spec 1's source prunes spec-1 files and KEEPS files of
    // specs that cannot resolve it; the row filter keeps results exact
    val a = IcebergIO.read(spark, dir, partitionFilter = Map("name" -> "a"))
      .filter(col("name") === "a")
    assert(ids(a) === Seq(1L, 3L, 5L))

    // deletes across specs
    import spark.implicits._
    IcebergWrite.deleteEquality(Seq(1L, 4L).toDF("id"), dir)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(2L, 3L, 5L))
    IcebergWrite.deleteWhere(spark, dir, col("id") === 3L)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(2L, 5L))
    // compact folds everything into the CURRENT spec; content unchanged
    IcebergWrite.compact(spark, dir)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(2L, 5L))

    // un-partition (empty spec) and keep appending
    IcebergWrite.updatePartitionSpec(dir, Nil)
    IcebergWrite.append(df((6L, "c", 6.0)), dir)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(2L, 5L, 6L))

    // dropping a source referenced by ANY spec (old spec 1 uses name) is
    // refused even though the current spec doesn't use it
    intercept[IllegalArgumentException](
      IcebergWrite.dropColumn(spark, dir, "name"))
  }

  test("partition evolution reuses field ids for equivalent fields") {
    val dir = s"$root/evolve_reuse"
    IcebergFixture.deleteRecursively(dir)
    IcebergWrite.create(spark, dir, schema, partitionCols = Seq("name"))
    IcebergWrite.append(df((1L, "a", 1.0)), dir)
    IcebergWrite.updatePartitionSpec(dir, Nil)
    IcebergWrite.updatePartitionSpec(dir, Seq("name"))
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(
      new java.io.File(IcebergIO.loadMetadata(dir).metadataFile))
    val specs = node.get("partition-specs")
    assert(specs.size === 3)
    val fid0 = specs.get(0).get("fields").get(0).get("field-id").asInt
    val fid2 = specs.get(2).get("fields").get(0).get("field-id").asInt
    assert(fid0 === fid2, "equivalent partition field must reuse its id")
    // a NEW field gets a fresh id above last-partition-id
    IcebergWrite.updatePartitionSpec(dir, Seq("name", "id"))
    val node2 = om.readTree(
      new java.io.File(IcebergIO.loadMetadata(dir).metadataFile))
    val f3 = node2.get("partition-specs").get(3).get("fields")
    assert(f3.get(0).get("field-id").asInt === fid0)
    assert(f3.get(1).get("field-id").asInt === fid0 + 1)
  }

  // ---- type promotion (widenColumn) ---------------------------------

  test("widenColumn int->long / float->double: old files upcast, deletes apply, appends mix") {
    import org.apache.spark.sql.functions.expr
    val dir = s"$root/widen"
    IcebergFixture.deleteRecursively(dir)
    val narrow = StructType(Seq(
      StructField("k", IntegerType, nullable = false),
      StructField("x", FloatType, nullable = true)))
    def rows(vals: (Int, Float)*) = {
      val list = new java.util.ArrayList[Row]()
      vals.foreach(v => list.add(Row(v._1, v._2)))
      spark.createDataFrame(list, narrow)
    }
    IcebergWrite.create(spark, dir, narrow)
    IcebergWrite.append(rows((-5, 1.5f), (2, 2.5f), (3, 3.5f)), dir)
    // a pre-widen equality delete (narrow-typed delete file)
    IcebergWrite.deleteEquality(rows((3, 3.5f)).select("k"), dir)
    IcebergWrite.widenColumn(dir, "k", LongType)
    IcebergWrite.widenColumn(dir, "x", DoubleType)
    val got = IcebergIO.read(spark, dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === Seq((-5L, 1.5), (2L, 2.5)))
    // post-widen append writes wide; both generations scan together
    val wide = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("x", DoubleType, nullable = true)))
    val list = new java.util.ArrayList[Row]()
    list.add(Row(10000000000L, 0.25)) // needs 64 bits
    IcebergWrite.append(spark.createDataFrame(list, wide), dir)
    assert(IcebergIO.read(spark, dir).orderBy("k").collect()
      .map(_.getLong(0)).toSeq === Seq(-5L, 2L, 10000000000L))
  }

  test("widenColumn: narrow 4-byte bounds still stats-prune correctly (sign + float bits)") {
    val dir = s"$root/widen_stats"
    IcebergFixture.deleteRecursively(dir)
    val narrow = StructType(Seq(
      StructField("k", IntegerType, nullable = false),
      StructField("x", FloatType, nullable = true)))
    def rows(vals: (Int, Float)*) = {
      val list = new java.util.ArrayList[Row]()
      vals.foreach(v => list.add(Row(v._1, v._2)))
      spark.createDataFrame(list, narrow)
    }
    IcebergWrite.create(spark, dir, narrow)
    // two files with disjoint NEGATIVE-range and positive-range keys —
    // sign-dropping 4-byte decode would corrupt the negative bounds
    IcebergWrite.append(rows((-100, -1.5f), (-50, -0.5f)).coalesce(1), dir)
    IcebergWrite.append(rows((50, 1.5f), (100, 2.5f)).coalesce(1), dir)
    IcebergWrite.widenColumn(dir, "k", LongType)
    IcebergWrite.widenColumn(dir, "x", DoubleType)
    import org.apache.spark.sql.functions.col
    def filesRead(c: org.apache.spark.sql.Column): Long =
      IcebergIO.readWhere(spark, dir, c).inputFiles.length.toLong
    assert(filesRead(col("k") < -40L) === 1L, "negative-range file only")
    assert(filesRead(col("k") > 40L) === 1L, "positive-range file only")
    assert(filesRead(col("x") < -0.1) === 1L, "float bounds widen to double")
    val got = IcebergIO.readWhere(spark, dir, col("k") < -40L)
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(-100L, -50L))
  }

  test("widenColumn guards: partition source, z-order column, illegal promotion") {
    val dir = s"$root/widen_guard"
    IcebergFixture.deleteRecursively(dir)
    val s2 = StructType(Seq(
      StructField("k", IntegerType, nullable = false),
      StructField("z", IntegerType, nullable = false)))
    IcebergWrite.create(spark, dir, s2, partitionCols = Seq("k"))
    assert(intercept[IllegalArgumentException](
      IcebergWrite.widenColumn(dir, "k", LongType))
      .getMessage.contains("partition source"))
    assert(intercept[IllegalArgumentException](
      IcebergWrite.widenColumn(dir, "z", DoubleType))
      .getMessage.contains("promotion"))
    val dir2 = s"$root/widen_guard_z"
    IcebergFixture.deleteRecursively(dir2)
    IcebergWrite.create(spark, dir2, s2)
    IcebergWrite.zorderBy(dir2, Seq("k", "z"))
    assert(intercept[IllegalArgumentException](
      IcebergWrite.widenColumn(dir2, "z", LongType))
      .getMessage.contains("z-order"))
  }

  // ---- conditional MERGE --------------------------------------------

  private def mergeSrc(rows: (Long, Double, String)*) = {
    val s = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("delta", DoubleType, nullable = true),
      StructField("tag", StringType, nullable = true)))
    val list = new java.util.ArrayList[Row]()
    rows.foreach(r => list.add(Row(r._1, r._2, r._3)))
    spark.createDataFrame(list, s)
  }

  test("merge: first-match-wins clause order, update + delete + conditional insert") {
    import org.apache.spark.sql.functions.expr
    val dir = s"$root/merge_basic"
    IcebergFixture.deleteRecursively(dir)
    IcebergWrite.create(spark, dir, schema, partitionCols = Seq("name"))
    IcebergWrite.append(
      df((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)), dir)
    val snaps0 = IcebergIO.loadMetadata(dir).snapshots.size
    IcebergWrite.merge(spark, dir,
      mergeSrc((1L, 5.0, "upd"), (2L, 100.0, "big"), (4L, 50.0, "ins"),
        (5L, 1.0, "skip")),
      Seq("id"), Seq(
        IcebergWrite.WhenMatchedDelete(Some(expr("s.delta > 50"))),
        IcebergWrite.WhenMatchedUpdate(Map(
          "score" -> expr("t.score + s.delta"),
          "name" -> expr("concat(t.name, '_', s.tag)"))),
        IcebergWrite.WhenNotMatchedInsert(Map(
          "id" -> expr("s.id"), "name" -> expr("s.tag"),
          "score" -> expr("s.delta")),
          cond = Some(expr("s.delta >= 10")))))
    // ONE new snapshot (atomicity), exact post-state
    assert(IcebergIO.loadMetadata(dir).snapshots.size === snaps0 + 1)
    val got = IcebergIO.read(spark, dir).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got === Seq((1L, "a_upd", 15.0), (3L, "c", 30.0),
      (4L, "ins", 50.0)))
  }

  test("merge: unconditional first clause shadows later ones; unassigned cols keep old values") {
    import org.apache.spark.sql.functions.expr
    val dir = s"$root/merge_order"
    IcebergFixture.deleteRecursively(dir)
    IcebergWrite.create(spark, dir, schema)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0)), dir)
    IcebergWrite.merge(spark, dir, mergeSrc((1L, 9.0, "x"), (2L, 9.0, "y")),
      Seq("id"), Seq(
        IcebergWrite.WhenMatchedUpdate(Map("score" -> expr("s.delta"))),
        // unreachable: the unconditional update above always fires first
        IcebergWrite.WhenMatchedDelete()))
    val got = IcebergIO.read(spark, dir).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got === Seq((1L, "a", 9.0), (2L, "b", 9.0)))
  }

  test("merge: cardinality violation (two source rows hit one target row) throws") {
    import org.apache.spark.sql.functions.expr
    val dir = s"$root/merge_card"
    IcebergFixture.deleteRecursively(dir)
    IcebergWrite.create(spark, dir, schema)
    IcebergWrite.append(df((1L, "a", 1.0)), dir)
    val e = intercept[IllegalArgumentException] {
      IcebergWrite.merge(spark, dir, mergeSrc((1L, 2.0, "x"), (1L, 3.0, "y")),
        Seq("id"),
        Seq(IcebergWrite.WhenMatchedUpdate(Map("score" -> expr("s.delta")))))
    }
    assert(e.getMessage.contains("cardinality"))
    // duplicate UNMATCHED source keys are legal (both insert, SQL semantics)
    IcebergWrite.merge(spark, dir, mergeSrc((7L, 2.0, "x"), (7L, 3.0, "y")),
      Seq("id"), Seq(
        IcebergWrite.WhenMatchedDelete(),
        IcebergWrite.WhenNotMatchedInsert(Map(
          "id" -> expr("s.id"), "score" -> expr("s.delta")))))
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 7L, 7L))
  }

  test("merge: previously deleted rows are NOT MATCHED (no resurrection)") {
    import org.apache.spark.sql.functions.expr
    val dir = s"$root/merge_dead"
    IcebergFixture.deleteRecursively(dir)
    IcebergWrite.create(spark, dir, schema)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0)), dir)
    IcebergWrite.deleteWhere(spark, dir, col("id") === 2L)
    IcebergWrite.merge(spark, dir, mergeSrc((2L, 99.0, "z")), Seq("id"), Seq(
      IcebergWrite.WhenMatchedUpdate(Map("score" -> expr("s.delta"))),
      IcebergWrite.WhenNotMatchedInsert(Map(
        "id" -> expr("s.id"), "name" -> expr("'fresh'"),
        "score" -> expr("s.delta")))))
    val got = IcebergIO.read(spark, dir).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    // id=2 was dead -> NOT MATCHED -> inserted fresh, never updated-in-place
    assert(got === Seq((1L, "a", 1.0), (2L, "fresh", 99.0)))
  }

  test("merge: empty table takes the insert-only path; no-op merge commits cleanly") {
    import org.apache.spark.sql.functions.expr
    val dir = s"$root/merge_empty"
    IcebergFixture.deleteRecursively(dir)
    IcebergWrite.create(spark, dir, schema)
    IcebergWrite.merge(spark, dir, mergeSrc((1L, 1.5, "a")), Seq("id"), Seq(
      IcebergWrite.WhenMatchedDelete(),
      IcebergWrite.WhenNotMatchedInsert(Map(
        "id" -> expr("s.id"), "score" -> expr("s.delta")))))
    val got = IcebergIO.read(spark, dir).orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getDouble(2))).toSeq
    assert(got === Seq((1L, None, 1.5))) // unlisted column -> NULL
    // matched-nothing + insert-nothing = a clean no-op snapshot
    val before = IcebergIO.read(spark, dir).count()
    IcebergWrite.merge(spark, dir, mergeSrc((1L, 0.0, "a")), Seq("id"), Seq(
      IcebergWrite.WhenMatchedUpdate(Map("score" -> expr("t.score")),
        cond = Some(expr("s.delta > 100")))))
    assert(IcebergIO.read(spark, dir).count() === before)
  }

  /** (change_type, ordinal, snapshot_id, row id) tuples, sorted. */
  private def changes(dir: String, from: Option[Long] = None,
                      to: Option[Long] = None): Seq[(String, Int, Long, Long)] =
    IcebergIO.readChangelog(spark, dir, from, to)
      .select("_change_type", "_change_ordinal", "_commit_snapshot_id", "id")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted

  test("changelog: appends surface as inserts; from-bound is exclusive") {
    val dir = s"$root/cdc_append"
    IcebergWrite.create(spark, dir, schema)
    assert(changes(dir).isEmpty) // no snapshot yet
    val s1 = IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0)), dir)
    val s2 = IcebergWrite.append(df((3L, "c", 3.0)), dir)
    assert(changes(dir) === Seq(
      ("insert", 0, s1, 1L), ("insert", 0, s1, 2L), ("insert", 1, s2, 3L)))
    assert(changes(dir, from = Some(s1)) === Seq(("insert", 0, s2, 3L)))
    assert(changes(dir, from = Some(s2)).isEmpty)
    assert(changes(dir, to = Some(s1)) ===
      Seq(("insert", 0, s1, 1L), ("insert", 0, s1, 2L)))
    intercept[IllegalArgumentException](changes(dir, from = Some(999L)))
  }

  test("changelog: position deletes, updates, and eq-delete upserts") {
    val dir = s"$root/cdc_verbs"
    IcebergWrite.create(spark, dir, schema)
    val s1 = IcebergWrite.append(
      df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)), dir)
    // position delete of id=2
    IcebergWrite.deleteWhere(spark, dir, col("id") === 2L)
    val s2 = IcebergIO.snapshotIds(dir).last
    assert(changes(dir, from = Some(s1)) === Seq(("delete", 0, s2, 2L)))
    // updateWhere = delete(old) + insert(new) in ONE snapshot/ordinal
    IcebergWrite.updateWhere(spark, dir, col("id") === 3L,
      Map("score" -> (col("score") + 10.0)))
    val s3 = IcebergIO.snapshotIds(dir).last
    assert(changes(dir, from = Some(s2)) ===
      Seq(("delete", 0, s3, 3L), ("insert", 0, s3, 3L)))
    val upd = IcebergIO.readChangelog(spark, dir, Some(s2))
      .filter(col("_change_type") === "insert").collect().head
    assert(upd.getDouble(upd.fieldIndex("score")) === 13.0)
    // upsert (eq delete + data, same snapshot): update id=1, insert id=9;
    // the already-deleted id=2 key inserts with NO delete row
    IcebergWrite.upsert(df((1L, "a2", 5.0), (2L, "b2", 6.0), (9L, "i", 9.0)),
      dir, Seq("id"))
    val s4 = IcebergIO.snapshotIds(dir).last
    assert(changes(dir, from = Some(s3)) === Seq(
      ("delete", 0, s4, 1L),
      ("insert", 0, s4, 1L), ("insert", 0, s4, 2L), ("insert", 0, s4, 9L)))
    // whole-range view: ordinals count emitted commits in order
    assert(changes(dir).map(_._2).distinct.sorted === Seq(0, 1, 2, 3))
  }

  test("changelog: compaction and manifest rewrites emit nothing") {
    val dir = s"$root/cdc_replace"
    IcebergWrite.create(spark, dir, schema)
    val s1 = IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0)), dir)
    IcebergWrite.deleteWhere(spark, dir, col("id") === 1L)
    val s2 = IcebergIO.snapshotIds(dir).last
    IcebergWrite.compact(spark, dir)
    IcebergWrite.rewriteManifests(spark, dir)
    val s3 = IcebergWrite.append(df((5L, "e", 5.0)), dir)
    // range spans delete + compact + manifest rewrite + append: the two
    // data-preserving replace snapshots vanish, ordinals stay dense
    assert(changes(dir, from = Some(s1)) === Seq(
      ("delete", 0, s2, 1L), ("insert", 1, s3, 5L)))
    // overwrite (truncate-and-load) is NOT data-preserving: every prior
    // live row deletes, every new row inserts
    IcebergWrite.overwrite(df((7L, "g", 7.0)), dir)
    val s4 = IcebergIO.snapshotIds(dir).last
    assert(changes(dir, from = Some(s3)) === Seq(
      ("delete", 0, s4, 2L), ("delete", 0, s4, 5L), ("insert", 0, s4, 7L)))
  }

  test("branch append + fast-forward: write-audit-publish lifecycle") {
    val dir = s"$root/wap"
    IcebergWrite.create(spark, dir, schema)
    val s1 = IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0)), dir)
    // staged commits land on the branch only — main readers see nothing
    val s2 = IcebergWrite.append(df((3L, "c", 3.0)), dir,
      branch = Some("audit"))
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L))
    assert(ids(IcebergIO.read(spark, dir, ref = Some("audit"))) ===
      Seq(1L, 2L, 3L))
    // a second branch commit stacks on the BRANCH head, not on main
    IcebergWrite.append(df((4L, "d", 4.0)), dir, branch = Some("audit"))
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L))
    assert(ids(IcebergIO.read(spark, dir, ref = Some("audit"))) ===
      Seq(1L, 2L, 3L, 4L))
    // main's time travel never resolves to a staged snapshot
    assert(ids(IcebergIO.read(spark, dir,
      asOfTimestampMs = Some(System.currentTimeMillis()))) === Seq(1L, 2L))
    // publish: main fast-forwards to the branch head atomically
    val head = IcebergWrite.fastForward(dir, "audit")
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L, 3L, 4L))
    // the adopted snapshots joined the main lineage: time travel works,
    // and the changelog walks parent links straight through the fork
    assert(ids(IcebergIO.read(spark, dir, snapshotId = Some(s2))) ===
      Seq(1L, 2L, 3L))
    assert(changes(dir, from = Some(s1)).map(x => (x._1, x._4)) ===
      Seq(("insert", 3L), ("insert", 4L)))
    assert(IcebergIO.loadMetadata(dir).currentSnapshotId === Some(head))
    // guards: unknown branch; diverged main refuses the fast-forward
    intercept[IllegalArgumentException](IcebergWrite.fastForward(dir, "nope"))
    IcebergWrite.append(df((9L, "i", 9.0)), dir, branch = Some("audit2"))
    IcebergWrite.append(df((5L, "e", 5.0)), dir) // main moves past the fork
    intercept[IllegalArgumentException](
      IcebergWrite.fastForward(dir, "audit2"))
    // branch writes refuse main as an explicit target
    intercept[IllegalArgumentException](
      IcebergWrite.append(df((6L, "f", 6.0)), dir, branch = Some("main")))
  }

  test("changelog: partitioned table with partition-moving update") {
    val dir = s"$root/cdc_part"
    val pschema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("bucket", LongType, nullable = true),
      StructField("score", DoubleType, nullable = true)))
    val rows = new java.util.ArrayList[Row]()
    (1L to 6L).foreach(i => rows.add(Row(i, i % 2, i.toDouble)))
    val base = spark.createDataFrame(rows, pschema)
    IcebergWrite.create(spark, dir, pschema, partitionCols = Seq("bucket"))
    val s1 = IcebergWrite.append(base, dir)
    // move id=4 from bucket 0 to bucket 1 (pos-delete + new-partition file)
    IcebergWrite.updateWhere(spark, dir, col("id") === 4L,
      Map("bucket" -> org.apache.spark.sql.functions.lit(1L)))
    val s2 = IcebergIO.snapshotIds(dir).last
    assert(changes(dir, from = Some(s1)) ===
      Seq(("delete", 0, s2, 4L), ("insert", 0, s2, 4L)))
    val moved = IcebergIO.readChangelog(spark, dir, Some(s1))
      .filter(col("_change_type") === "insert").collect().head
    assert(moved.getLong(moved.fieldIndex("bucket")) === 1L)
    // partition-SCOPED upsert: the eq-delete candidate set honors the
    // delete files' partition tuples, and the change rows stay exact
    val rows2 = new java.util.ArrayList[Row]()
    rows2.add(Row(1L, 1L, 100.0)) // update key 1 (bucket 1)
    rows2.add(Row(8L, 0L, 8.0))   // insert key 8 (bucket 0)
    IcebergWrite.upsert(spark.createDataFrame(rows2, pschema), dir, Seq("id"))
    val s3 = IcebergIO.snapshotIds(dir).last
    assert(changes(dir, from = Some(s2)) === Seq(
      ("delete", 0, s3, 1L), ("insert", 0, s3, 1L), ("insert", 0, s3, 8L)))
  }

  test("rewritePositionDeletes folds delete files; rows, travel, CDC intact") {
    val dir = s"$root/rpd"
    IcebergWrite.create(spark, dir, schema)
    IcebergWrite.append(
      df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0), (4L, "d", 4.0))
        .coalesce(1), dir)
    IcebergWrite.append(df((5L, "e", 5.0), (6L, "f", 6.0)).coalesce(1), dir)
    IcebergWrite.deleteWhere(spark, dir, col("id") === 2L)
    IcebergWrite.deleteWhere(spark, dir, col("id") === 5L)
    val sEq = IcebergWrite.deleteEquality(df((6L, "f", 6.0)).select("id"), dir)
    def posCount() = IcebergIO.files(spark, dir)
      .filter("content = 1").count()
    assert(posCount() === 2L)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 3L, 4L))

    val preSnaps = IcebergIO.snapshotIds(dir)
    val sid = IcebergWrite.rewritePositionDeletes(spark, dir)
    assert(sid === preSnaps.max + 1)
    // one consolidated position-delete file; row visibility unchanged
    assert(posCount() === 1L)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 3L, 4L))
    // equality delete survived at its ORIGINAL sequence number: a row
    // re-inserted AFTER the rewrite must not be hit by it
    val eqSeq = IcebergIO.files(spark, dir).filter("content = 2")
      .select("sequence_number").collect().map(_.getLong(0)).toSeq
    assert(eqSeq === Seq(IcebergIO.loadMetadata(dir).snapshots
      .find(_.snapshotId == sEq).get.sequenceNumber))
    IcebergWrite.append(df((6L, "f2", 6.5)).coalesce(1), dir)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 3L, 4L, 6L))
    // time travel to the pre-rewrite snapshot is unchanged
    assert(ids(IcebergIO.read(spark, dir,
      snapshotId = Some(preSnaps.max))) === Seq(1L, 3L, 4L))
    // CDC: the rewrite snapshot emits NOTHING (data-preserving replace)
    val cl = IcebergIO.readChangelog(spark, dir)
    assert(!cl.select("_commit_snapshot_id").collect()
      .map(_.getLong(0)).contains(sid))
  }

  test("rewritePositionDeletes: duplicate (file,pos) dedupes; no-op path") {
    val dir = s"$root/rpd_dupes"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    w.append(df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).coalesce(1))
    val fileA = w.dataFilePaths.head
    w.deletePositions(fileA, Seq(0L, 1L))
    w.deletePositions(fileA, Seq(1L, 2L)) // pos 1 deleted TWICE
    assert(ids(IcebergIO.read(spark, dir)) === Seq.empty)
    IcebergWrite.rewritePositionDeletes(spark, dir)
    val pos = IcebergIO.positionDeletes(spark, dir).collect()
    assert(pos.length === 3) // 0,1,2 — the duplicate folded away
    assert(pos.map(_.getLong(1)).sorted.toSeq === Seq(0L, 1L, 2L))
    assert(ids(IcebergIO.read(spark, dir)) === Seq.empty)

    // a table with NO live position deletes is a strict no-op
    val dir2 = s"$root/rpd_noop"
    IcebergWrite.create(spark, dir2, schema)
    IcebergWrite.append(df((1L, "a", 1.0)).coalesce(1), dir2)
    val cur = IcebergIO.loadMetadata(dir2).currentSnapshotId.get
    assert(IcebergWrite.rewritePositionDeletes(spark, dir2) === cur)
    assert(IcebergIO.loadMetadata(dir2).snapshots.map(_.snapshotId).max === cur)
  }

  test("convertEqualityDeletes: eq files become positional, rows unchanged") {
    val dir = s"$root/cvt"
    IcebergWrite.create(spark, dir, schema)
    IcebergWrite.append(
      df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).coalesce(1), dir)
    IcebergWrite.deleteEquality(df((2L, "b", 2.0)).select("id"), dir)
    // re-insert id=2 AFTER the delete: survives the eq rule, and MUST
    // keep surviving after the conversion (pos deletes name old files)
    IcebergWrite.append(df((2L, "b2", 2.5)).coalesce(1), dir)
    // second eq delete so the conversion folds several files
    IcebergWrite.deleteEquality(df((3L, "c", 3.0)).select("id"), dir)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L))
    def byContent(c: Int) = IcebergIO.files(spark, dir)
      .filter(s"content = $c").count()
    assert(byContent(2) === 2L)

    val sid = IcebergWrite.convertEqualityDeletes(spark, dir)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L))
    assert(byContent(2) === 0L) // no equality delete left
    assert(byContent(1) === 1L) // one conversion file
    // forward semantics preserved: re-inserting a converted-away key
    // works exactly as under the equality rule
    IcebergWrite.append(df((3L, "c2", 3.5)).coalesce(1), dir)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L, 3L))
    // time travel to the pre-conversion snapshot is unchanged
    assert(ids(IcebergIO.read(spark, dir, snapshotId = Some(sid - 1))) ===
      Seq(1L, 2L))
    // CDC: the conversion emits nothing (data-preserving replace)
    assert(!IcebergIO.readChangelog(spark, dir)
      .select("_commit_snapshot_id").collect().map(_.getLong(0))
      .contains(sid))
    // composition: rewritePositionDeletes folds pos files to one even
    // after further positional deletes
    IcebergWrite.deleteWhere(spark, dir, col("id") === 1L)
    assert(byContent(1) === 2L)
    IcebergWrite.rewritePositionDeletes(spark, dir)
    assert(byContent(1) === 1L)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(2L, 3L))
    // no-op path: nothing equality-deleted any more
    val cur = IcebergIO.loadMetadata(dir).currentSnapshotId.get
    assert(IcebergWrite.convertEqualityDeletes(spark, dir) === cur)
  }

  test("convertEqualityDeletes on a PARTITION-SCOPED upsert table") {
    val dir = s"$root/cvt_part"
    IcebergWrite.create(spark, dir, schema, partitionCols = Seq("name"))
    IcebergWrite.append(
      df((1L, "x", 1.0), (2L, "x", 2.0), (3L, "y", 3.0)).coalesce(1), dir)
    // upsert commits a partition-scoped equality delete + data at one seq
    IcebergWrite.upsert(df((2L, "x", 2.5), (4L, "y", 4.0)), dir, Seq("id"))
    assert(IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq ===
      Seq((1L, 1.0), (2L, 2.5), (3L, 3.0), (4L, 4.0)))
    IcebergWrite.convertEqualityDeletes(spark, dir)
    assert(IcebergIO.files(spark, dir).filter("content = 2").count() === 0L)
    assert(IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq ===
      Seq((1L, 1.0), (2L, 2.5), (3L, 3.0), (4L, 4.0)))
  }

  test("addFiles imports parquet IN PLACE: stats prune, deletes, guards") {
    val dir = s"$root/addfiles"
    val src = s"$root/addfiles_src"
    // plain parquet source: two files with disjoint id ranges
    df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).coalesce(1)
      .write.parquet(src)
    df((10L, "x", 1.0), (11L, "y", 2.0)).coalesce(1)
      .write.mode("append").parquet(src)
    IcebergWrite.create(spark, dir, schema, fieldIds = false)
    IcebergWrite.addFiles(spark, dir, src)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L, 3L, 10L, 11L))
    // not a byte moved: the table's data/ dir holds NO data files
    assert(graft.sources.GraftFs.list(s"$dir/data")
      .forall(_.getPath.getName.startsWith("_")))
    // per-file bounds landed -> stats pruning works on imported files
    val pruned = IcebergIO.read(spark, dir,
      statsFilter = Seq(("id", "<=", 3L)))
    assert(pruned.inputFiles.length === 1)
    assert(ids(pruned) === Seq(1L, 2L, 3L))
    // merge-on-read deletes apply over imported files
    IcebergWrite.deleteWhere(spark, dir, col("id") === 2L)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 3L, 10L, 11L))
    // re-import double-counts — rejected
    val e = intercept[IllegalArgumentException](
      IcebergWrite.addFiles(spark, dir, src))
    assert(e.getMessage.contains("double-count"))
    // a field-id table rejects id-less imports
    val dir2 = s"$root/addfiles_ids"
    IcebergWrite.create(spark, dir2, schema)
    val e2 = intercept[IllegalArgumentException](
      IcebergWrite.addFiles(spark, dir2, src))
    assert(e2.getMessage.contains("field id"))
  }

  test("deleteWhere/updateWhere PRUNE their scans by partition + stats") {
    val dir = s"$root/dml_prune"
    IcebergWrite.create(spark, dir, schema, partitionCols = Seq("name"))
    IcebergWrite.append(
      df((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0)).coalesce(1), dir)
    // predicate excluding EVERY partition: the scan is skipped entirely
    // and the commit is a clean no-op snapshot
    IcebergWrite.deleteWhere(spark, dir, col("name") === "zzz")
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L, 3L))
    // partition-scoped verbs stay correct (other partitions untouched)
    IcebergWrite.deleteWhere(spark, dir, col("name") === "a" && col("id") === 1L)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(2L, 3L))
    IcebergWrite.updateWhere(spark, dir, col("name") === "b",
      Map("score" -> (col("score") + 10)))
    val r = IcebergIO.read(spark, dir).filter(col("id") === 3L).collect().head
    assert(r.getDouble(2) === 13.0)

    // the decisive proof: physically REMOVE partition b's data file —
    // a partition-scoped DELETE on partition a must still succeed
    // because its pruned scan never opens b's file (an unpruned scan
    // would die on the missing footer)
    val dir2 = s"$root/dml_prune_hard"
    IcebergWrite.create(spark, dir2, schema, partitionCols = Seq("name"))
    IcebergWrite.append(
      df((1L, "a", 1.0), (2L, "b", 2.0)).coalesce(1), dir2)
    val bFile = IcebergIO.files(spark, dir2)
      .filter(col("content") === 0 &&
        col("partition").contains("name=b"))
      .collect().map(_.getString(0)).toSeq
    assert(bFile.size === 1)
    GraftFs.delete(s"$dir2/data/${bFile.head}", recursive = false)
    IcebergWrite.deleteWhere(spark, dir2, col("name") === "a" && col("id") === 1L)
    assert(ids(IcebergIO.readWhere(spark, dir2, col("name") === "a")) === Nil)
  }

  test("addFiles HIVE layout: injection, pruning, deletes, later appends") {
    val dir = s"$root/addfiles_hive"
    val src = s"$root/addfiles_hive_src"
    // Spark's own hive layout: files physically LACK `name` — the value
    // lives only in the `name=K/` directory names (incl. the null dir)
    df((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "b", 4.0),
      (5L, null, 5.0)).write.partitionBy("name").parquet(src)
    IcebergWrite.create(spark, dir, schema,
      partitionCols = Seq("name"), fieldIds = false)
    IcebergWrite.addFiles(spark, dir, src)
    // injected values equal the original column, nulls included
    val got = IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1), r.getDouble(2))).toSeq
    assert(got === Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0),
      (4L, "b", 4.0), (5L, null, 5.0)))
    // partition pruning works ON THE INJECTED COLUMN (manifest tuples)
    val all = IcebergIO.read(spark, dir).inputFiles.length
    val pruned = IcebergIO.readWhere(spark, dir, col("name") === "a")
    assert(pruned.inputFiles.length < all,
      s"expected pruning below $all files, scanned ${pruned.inputFiles.length}")
    assert(ids(pruned) === Seq(1L, 2L))
    // ...and so does STATS pruning (constant bounds stamped per file)
    assert(IcebergIO.read(spark, dir,
      statsFilter = Seq(("name", "=", "a"))).inputFiles.length < all)
    // merge-on-read deletes with a predicate over the injected column
    IcebergWrite.deleteWhere(spark, dir, col("name") === "b" && col("id") === 3L)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L, 4L, 5L))
    // later appends write files that DO carry the column physically —
    // injection (tuple == column value under identity) stays correct
    IcebergWrite.append(df((6L, "a", 6.0)), dir)
    assert(ids(IcebergIO.readWhere(spark, dir, col("name") === "a")) ===
      Seq(1L, 2L, 6L))
    assert(IcebergIO.read(spark, dir).filter(col("id") === 6L)
      .collect().head.getString(1) === "a")
  }

  test("addFiles HIVE layout into a v3 table: DVs delete imported rows in place") {
    val dir = s"$root/addfiles_hive_dv"
    val src = s"$root/addfiles_hive_dv_src"
    df((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0), (4L, "b", 4.0))
      .write.partitionBy("name").parquet(src)
    IcebergWrite.create(spark, dir, schema,
      partitionCols = Seq("name"), fieldIds = false, formatVersion = 3)
    IcebergWrite.addFiles(spark, dir, src)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L, 3L, 4L))
    // a DV targets the IMPORTED file (outside <table>/data/) by its
    // recorded source path, through the injected-column predicate
    IcebergWrite.deleteWhere(spark, dir, col("name") === "a" && col("id") === 2L)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 3L, 4L))
    val d = dvRows(dir)
    assert(d.length === 1 && d.head.getAs[Long]("record_count") === 1L)
    // a second overlapping delete merges into the imported file's DV
    IcebergWrite.deleteWhere(spark, dir, col("id") <= 2L)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(3L, 4L))
    assert(dvRows(dir).map(_.getAs[Long]("record_count")).sum === 2L)
  }

  test("addFiles HIVE layout: escaped string values and DATE partitions") {
    // a space (stays literal in the dir name but URL-encodes in
    // `_metadata.file_path` — exercises the path-key join) and a literal
    // '%' (hive-escaped as %25 in the dir name)
    val dir = s"$root/addfiles_hive_esc"
    val src = s"$root/addfiles_hive_esc_src"
    df((1L, "a b", 1.0), (2L, "p%q", 2.0)).write.partitionBy("name").parquet(src)
    IcebergWrite.create(spark, dir, schema,
      partitionCols = Seq("name"), fieldIds = false)
    IcebergWrite.addFiles(spark, dir, src)
    assert(IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(_.getString(1)).toSeq === Seq("a b", "p%q"))
    assert(ids(IcebergIO.readWhere(spark, dir, col("name") === "p%q")) === Seq(2L))

    // DATE partition column: dir value parses to the epoch-day ordinal,
    // reads back as the date, prunes
    val dschema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("d", DateType, nullable = true)))
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(1L, java.sql.Date.valueOf("2021-03-04")))
    rows.add(Row(2L, java.sql.Date.valueOf("1961-11-23"))) // pre-1970
    val ddf = spark.createDataFrame(rows, dschema)
    val ddir = s"$root/addfiles_hive_date"
    val dsrc = s"$root/addfiles_hive_date_src"
    ddf.write.partitionBy("d").parquet(dsrc)
    IcebergWrite.create(spark, ddir, dschema,
      partitionCols = Seq("d"), fieldIds = false)
    IcebergWrite.addFiles(spark, ddir, dsrc)
    assert(IcebergIO.read(spark, ddir).orderBy("id").collect()
      .map(_.getDate(1).toString).toSeq === Seq("2021-03-04", "1961-11-23"))
    val dpruned = IcebergIO.readWhere(spark, ddir,
      col("d") === org.apache.spark.sql.functions.lit(
        java.sql.Date.valueOf("1961-11-23")))
    assert(dpruned.inputFiles.length === 1)
    assert(ids(dpruned) === Seq(2L))
  }

  test("addFiles HIVE layout lifecycle: compact + orphan sweep never " +
      "touch the user's source files") {
    val dir = s"$root/addfiles_hive_gc"
    val src = s"$root/addfiles_hive_gc_src"
    df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "b", 3.0))
      .write.partitionBy("name").parquet(src)
    IcebergWrite.create(spark, dir, schema,
      partitionCols = Seq("name"), fieldIds = false)
    IcebergWrite.addFiles(spark, dir, src)
    val srcLeaves = GraftFs.list(s"$src/name=b").map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).sorted.toSeq
    // compact rewrites live rows as table-local files (injection still
    // applies to the new files — identity tuple == column value)
    IcebergWrite.compact(spark, dir)
    assert(IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq(1L -> "a", 2L -> "b", 3L -> "b"))
    // post-compact the imported source files are unreferenced history;
    // expire + sweep must still NEVER delete them (they live OUTSIDE
    // the table root — the sweep walks only the table directory)
    IcebergWrite.expireSnapshots(dir,
      olderThanMs = System.currentTimeMillis() + 1000, retainLast = 1)
    val removed = IcebergWrite.removeOrphanFiles(dir,
      olderThanMs = System.currentTimeMillis() + 1000)
    assert(removed.forall(p => !p.contains("hive_gc_src")),
      s"sweep touched source files: ${removed.filter(_.contains("src"))}")
    assert(GraftFs.list(s"$src/name=b").map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).sorted.toSeq === srcLeaves)
    assert(IcebergIO.read(spark, dir).count() === 3L)
  }

  test("addFiles HIVE layout guards: mixed footers, carried partition " +
      "column, non-identity spec, removed-path re-import") {
    // (a) per-leaf footer gate: a file missing a table column is named
    val dir1 = s"$root/hive_guard_mixed"
    val src1 = s"$root/hive_guard_mixed_src"
    df((1L, "a", 1.0)).coalesce(1).write.parquet(src1)
    df((2L, "b", 2.0)).drop("score").coalesce(1)
      .write.mode("append").parquet(src1) // one leaf lacks `score`
    IcebergWrite.create(spark, dir1, schema, fieldIds = false)
    val e1 = intercept[IllegalArgumentException](
      IcebergWrite.addFiles(spark, dir1, src1))
    assert(e1.getMessage.contains("lacks table column"))
    assert(e1.getMessage.contains("score"))

    // (b) a hive-layout file physically carrying the partition column
    val dir2 = s"$root/hive_guard_carried"
    val src2 = s"$root/hive_guard_carried_src"
    df((1L, "a", 1.0)).coalesce(1).write.parquet(s"$src2/name=a")
    IcebergWrite.create(spark, dir2, schema,
      partitionCols = Seq("name"), fieldIds = false)
    val e2 = intercept[IllegalArgumentException](
      IcebergWrite.addFiles(spark, dir2, src2))
    assert(e2.getMessage.contains("physically carries"))

    // (c) transformed specs cannot be derived from directory names
    val dir3 = s"$root/hive_guard_bucket"
    IcebergWrite.create(spark, dir3, schema, partitionCols = Seq("name"),
      partitionTransforms = Map("name" -> "bucket[4]"), fieldIds = false)
    val e3 = intercept[IllegalArgumentException](
      IcebergWrite.addFiles(spark, dir3, s"$root/nonexistent"))
    assert(e3.getMessage.contains("identity-only"))

    // (d) a path referenced by a RETAINED (no longer live) snapshot is
    // rejected — a re-imported removed path would let still-retained
    // delete files apply to the new rows
    val dir4 = s"$root/hive_guard_removed"
    val src4 = s"$root/hive_guard_removed_src"
    df((1L, "a", 1.0), (2L, "b", 2.0)).coalesce(1).write.parquet(src4)
    IcebergWrite.create(spark, dir4, schema, fieldIds = false)
    IcebergWrite.addFiles(spark, dir4, src4)
    IcebergWrite.overwrite(df((9L, "z", 9.0)), dir4) // imports drop from live
    val e4 = intercept[IllegalArgumentException](
      IcebergWrite.addFiles(spark, dir4, src4))
    assert(e4.getMessage.contains("retained snapshot"))
  }

  test("addFiles HIVE layout compositions: addColumn, changelog, partition " +
      "evolution, name-mapping reject") {
    val dir = s"$root/addfiles_hive_comp"
    val src = s"$root/addfiles_hive_comp_src"
    df((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
      .write.partitionBy("name").parquet(src)
    IcebergWrite.create(spark, dir, schema,
      partitionCols = Seq("name"), fieldIds = false)
    IcebergWrite.addFiles(spark, dir, src)

    // (a) addNameMapping refused LOUDLY: it would unlock renameColumn,
    // and the injected read path resolves by current name — a
    // post-upgrade rename would silently null the column on imports
    val e = intercept[IllegalArgumentException](
      IcebergWrite.addNameMapping(dir))
    assert(e.getMessage.contains("hive-imported"), e.getMessage)

    // (b) addColumn: metadata-only; imported files surface NULL for the
    // new column while injection keeps serving the partition column
    IcebergWrite.addColumn(dir, "tag", StringType)
    val afterAdd = IcebergIO.read(spark, dir).orderBy("id").collect()
    assert(afterAdd.map(_.getString(1)).toSeq === Seq("a", "a", "b"))
    assert(afterAdd.forall(_.isNullAt(3)), "new column must read NULL")
    // a post-addColumn append carries the new column physically and
    // reads back through the same injection
    val s4 = StructType(schema.fields :+
      StructField("tag", StringType, nullable = true))
    val r4 = new java.util.ArrayList[Row]()
    r4.add(Row(4L, "b", 4.0, "t4"))
    IcebergWrite.append(spark.createDataFrame(r4, s4).coalesce(1), dir)
    val got4 = IcebergIO.read(spark, dir).filter(col("id") === 4L)
      .collect().head
    assert(got4.getString(1) === "b" && got4.getString(3) === "t4")

    // (c) DML over the injected column + CDC changelog: delete rows and
    // insert rows both ride with the injected partition values
    IcebergWrite.deleteWhere(spark, dir, col("name") === "a" && col("id") === 1L)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(2L, 3L, 4L))
    val cl = IcebergIO.readChangelog(spark, dir).collect()
    val inserts = cl.filter(_.getString(4) == "insert")
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(inserts === Seq(1L -> "a", 2L -> "a", 3L -> "b", 4L -> "b"))
    val deletes = cl.filter(_.getString(4) == "delete")
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(deletes === Seq(1L -> "a"),
      "the deleted imported row must appear as a CDC delete WITH its " +
        "injected partition value")

    // (d) partition evolution: un-partition future writes; imported
    // old-spec files keep injecting, the filter still prunes them
    // best-effort while the unpartitioned new file is kept
    IcebergWrite.updatePartitionSpec(dir, Nil)
    val r5 = new java.util.ArrayList[Row]()
    r5.add(Row(5L, "c", 5.0, "t5"))
    IcebergWrite.append(spark.createDataFrame(r5, s4).coalesce(1), dir)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(2L, 3L, 4L, 5L))
    val all = IcebergIO.read(spark, dir).inputFiles.length
    val pruned = IcebergIO.readWhere(spark, dir, col("name") === "a")
    assert(ids(pruned) === Seq(2L))
    assert(pruned.inputFiles.length < all,
      s"old-spec imported files must still prune: ${pruned.inputFiles.length} of $all")
  }

  test("addFiles path-reuse guard probes DISTRIBUTED past the manifest " +
      "threshold (inverted broadcast intersection)") {
    val dir = s"$root/addfiles_dist_guard"
    val src1 = s"$root/addfiles_dist_guard_src1"
    val src2 = s"$root/addfiles_dist_guard_src2"
    IcebergWrite.create(spark, dir, schema, fieldIds = false)
    // cross ParallelManifestThreshold: one manifest per append
    (1 to graft.sources.IcebergIO.ParallelManifestThreshold).foreach(i =>
      IcebergWrite.append(df((i.toLong, s"w$i", i.toDouble)).coalesce(1), dir))
    df((100L, "x", 1.0)).coalesce(1).write.parquet(src1)
    IcebergWrite.addFiles(spark, dir, src1)
    val meta = graft.sources.IcebergIO.loadMetadata(dir)
    assert(meta.snapshots.size >
      graft.sources.IcebergIO.ParallelManifestThreshold)
    // the re-import reject fires through the executor-side probe
    val e = intercept[IllegalArgumentException](
      IcebergWrite.addFiles(spark, dir, src1))
    assert(e.getMessage.contains("retained snapshot"))
    // and a FRESH source still imports (no false positives from the
    // broadcast intersection)
    df((200L, "y", 2.0)).coalesce(1).write.parquet(src2)
    IcebergWrite.addFiles(spark, dir, src2)
    assert(ids(IcebergIO.read(spark, dir)).filter(_ >= 100L) ===
      Seq(100L, 200L))
  }

  test("rewritePositionDeletes loses the optimistic race CLEANLY") {
    val dir = s"$root/rpd_race"
    IcebergWrite.create(spark, dir, schema)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0)).coalesce(1), dir)
    IcebergWrite.deleteWhere(spark, dir, col("id") === 2L)
    // simulate a racing writer: occupy the NEXT metadata version
    val meta = IcebergIO.loadMetadata(dir)
    val v = meta.metadataFile.replaceAll(".*/v(\\d+)\\.metadata\\.json$", "$1").toInt
    val blocker = s"$dir/metadata/v${v + 1}.metadata.json"
    val os = GraftFs.createNew(blocker)
    os.write(GraftFs.readUtf8(meta.metadataFile).getBytes("UTF-8")); os.close()
    def dataFiles(): Seq[String] = GraftFs.list(s"$dir/data")
      .map(_.getPath.getName).filterNot(_.startsWith("_")).sorted.toSeq
    val before = dataFiles()
    try {
      val e = intercept[Exception](IcebergWrite.rewritePositionDeletes(spark, dir))
      assert(e.getMessage.toLowerCase.contains("concurrent"))
      // the loser's consolidated file must NOT linger in data/
      assert(dataFiles() === before)
    } finally GraftFs.delete(blocker, recursive = false)
    // and the verb succeeds once the contention clears
    IcebergWrite.rewritePositionDeletes(spark, dir)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L))
  }

  test("cherrypickSnapshot publishes ONE branch append onto main") {
    val dir = s"$root/cherry"
    IcebergWrite.create(spark, dir, schema)
    val a1 = IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0))
      .coalesce(1), dir)
    IcebergWrite.createBranch(dir, "audit", a1)
    val b1 = IcebergWrite.append(df((10L, "x", 1.0), (11L, "y", 2.0))
      .coalesce(1), dir, branch = Some("audit"))
    val b2 = IcebergWrite.append(df((20L, "z", 3.0)).coalesce(1), dir,
      branch = Some("audit"))
    // pick ONLY the first audited commit; main never sees b2's rows
    val picked = IcebergWrite.cherrypickSnapshot(spark, dir, b1)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L, 10L, 11L))
    val meta = IcebergIO.loadMetadata(dir)
    assert(meta.currentSnapshotId.contains(picked))
    assert(meta.refs("audit") === b2) // the branch did not move
    assert(meta.snapshots.find(_.snapshotId == picked).get
      .summary("cherry-picked-snapshot-id") === b1.toString)
    // the branch still reads its own lineage
    assert(ids(IcebergIO.read(spark, dir, ref = Some("audit"))) ===
      Seq(1L, 2L, 10L, 11L, 20L))

    // re-picking the same snapshot double-counts — rejected loudly
    val e = intercept[IllegalArgumentException](
      IcebergWrite.cherrypickSnapshot(spark, dir, b1))
    assert(e.getMessage.contains("double-count"))
    // picking a non-append commit is rejected
    IcebergWrite.deleteWhere(spark, dir, col("id") === 1L)
    val del = IcebergIO.loadMetadata(dir).currentSnapshotId.get
    val e2 = intercept[IllegalArgumentException](
      IcebergWrite.cherrypickSnapshot(spark, dir, del))
    assert(e2.getMessage.contains("append snapshots only"))
  }

  test("cherrypick on a PARTITIONED table carries tuples; pruning works") {
    val dir = s"$root/cherry_part"
    IcebergWrite.create(spark, dir, schema, partitionCols = Seq("name"))
    val a1 = IcebergWrite.append(
      df((1L, "x", 1.0), (2L, "y", 2.0)).coalesce(1), dir)
    IcebergWrite.createBranch(dir, "wap", a1)
    val b1 = IcebergWrite.append(
      df((10L, "x", 1.5), (11L, "z", 3.0)).coalesce(1), dir,
      branch = Some("wap"))
    IcebergWrite.cherrypickSnapshot(spark, dir, b1)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L, 10L, 11L))
    // the picked files carried their partition tuples: partition
    // pruning on the new partition value touches ONLY the picked file
    val pruned = IcebergIO.read(spark, dir,
      partitionFilter = Map("name" -> "z"))
    assert(pruned.inputFiles.length === 1)
    assert(ids(pruned) === Seq(11L))
    // the .partitions relation aggregates the picked tuples too
    val parts = IcebergIO.partitions(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(parts === Map("name=x" -> 2L, "name=y" -> 1L, "name=z" -> 1L))
  }

  test("cherrypick RE-SEQUENCES: a later main eq-delete misses picked rows") {
    val dir = s"$root/cherry_seq"
    IcebergWrite.create(spark, dir, schema)
    val a1 = IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0))
      .coalesce(1), dir)
    IcebergWrite.createBranch(dir, "wap", a1)
    // branch append at sequence 2
    val b1 = IcebergWrite.append(df((6L, "f", 6.0)).coalesce(1), dir,
      branch = Some("wap"))
    // main equality-delete of id=6 at sequence 3 — AFTER the branch
    // commit in sequence order, but BEFORE the pick in main's history
    IcebergWrite.deleteEquality(df((6L, "f", 6.0)).select("id"), dir)
    // the pick lands id=6 at sequence 4: the seq-3 delete must NOT
    // apply (strict data seq < delete seq) — without re-sequencing the
    // picked file would keep seq 2 and silently vanish
    IcebergWrite.cherrypickSnapshot(spark, dir, b1)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L, 6L))
  }

  // ------------------------------------------------ v3 deletion vectors

  private def dvRows(dir: String) = IcebergIO.deleteFiles(spark, dir)
    .filter(col("file_format") === "PUFFIN").collect()

  test("v3 DV: delete -> merge-on-read, second delete MERGES, one DV per file") {
    val dir = s"$root/dv_basic"
    IcebergWrite.create(spark, dir, schema, formatVersion = 3)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).coalesce(1), dir)
    IcebergWrite.append(df((4L, "d", 4.0), (5L, "e", 5.0)).coalesce(1), dir)
    IcebergWrite.deleteWhere(spark, dir, col("id").isin(2L, 4L))
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 3L, 5L))
    // one DV per affected data file, format PUFFIN, no parquet deletes
    val d1 = dvRows(dir)
    assert(d1.length === 2)
    assert(d1.map(_.getAs[Long]("record_count")).toSeq.sorted === Seq(1L, 1L))
    assert(IcebergIO.deleteFiles(spark, dir)
      .filter(col("file_format") =!= "PUFFIN").count() === 0L)
    // overlapping second delete: the file-1 DV must MERGE (1 -> 2
    // positions) into a NEW puffin at the new seq, replacing its old
    // entry; the UNaffected file-2 DV carries EXISTING in the OLD
    // puffin at its original seq
    IcebergWrite.deleteWhere(spark, dir, col("id") <= 1L)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(3L, 5L))
    val d2 = dvRows(dir)
    assert(d2.length === 2)
    assert(d2.map(_.getAs[Long]("record_count")).toSeq.sorted === Seq(1L, 2L))
    assert(d2.map(_.getAs[String]("file_name")).distinct.length === 2)
    val merged = d2.find(_.getAs[Long]("record_count") == 2L).get
    val carried = d2.find(_.getAs[Long]("record_count") == 1L).get
    assert(merged.getAs[Long]("sequence_number") >
      carried.getAs[Long]("sequence_number"))
    // time travel: pre-delete and mid-delete states intact
    val meta = IcebergIO.loadMetadata(dir)
    val snaps = meta.snapshots.map(_.snapshotId).sorted
    assert(ids(IcebergIO.read(spark, dir, Some(snaps(1)))) === Seq(1L, 2L, 3L, 4L, 5L))
    assert(ids(IcebergIO.read(spark, dir, Some(snaps(2)))) === Seq(1L, 3L, 5L))
    // .position_deletes decodes the vectors (3 dead positions)
    val pd = IcebergIO.positionDeletes(spark, dir).collect()
    assert(pd.length === 3)
    assert(pd.map(_.getAs[String]("delete_file_name")).forall(_.endsWith(".puffin")))
  }

  test("v3 DV: updateWhere rewrites through a DV + data manifest in one snapshot") {
    val dir = s"$root/dv_update"
    IcebergWrite.create(spark, dir, schema, formatVersion = 3)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0)).coalesce(1), dir)
    val nBefore = IcebergIO.loadMetadata(dir).snapshots.size
    IcebergWrite.updateWhere(spark, dir, col("id") === 2L,
      Map("name" -> org.apache.spark.sql.functions.lit("upd")))
    assert(IcebergIO.loadMetadata(dir).snapshots.size === nBefore + 1)
    val out = IcebergIO.read(spark, dir).orderBy("id").collect()
    assert(out.map(_.getString(1)).toSeq === Seq("a", "upd"))
    assert(dvRows(dir).length === 1)
  }

  test("v3 DV: upsert eq-deletes convert to DVs; rewrite consolidates; compact folds") {
    val dir = s"$root/dv_maint"
    IcebergWrite.create(spark, dir, schema, formatVersion = 3)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).coalesce(1), dir)
    IcebergWrite.deleteWhere(spark, dir, col("id") === 1L)
    IcebergWrite.upsert(df((2L, "B", 2.0)).coalesce(1), dir, Seq("id"))
    assert(IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((2L, "B"), (3L, "c")))
    // convert: eq manifests dropped, killed row merged into the DV
    IcebergWrite.convertEqualityDeletes(spark, dir)
    assert(IcebergIO.files(spark, dir).filter(col("content") === 2).count() === 0L)
    assert(IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((2L, "B"), (3L, "c")))
    val afterConvert = dvRows(dir)
    assert(afterConvert.map(_.getAs[Long]("record_count")).sum === 2L) // ids 1 and old 2
    // consolidate + compact
    IcebergWrite.rewritePositionDeletes(spark, dir)
    assert(dvRows(dir).map(_.getAs[String]("file_name")).distinct.length === 1)
    IcebergWrite.compact(spark, dir)
    assert(IcebergIO.files(spark, dir).filter(col("content") =!= 0).count() === 0L)
    assert(IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === Seq((2L, "B"), (3L, "c")))
  }

  test("v3 DV: changelog attributes DV deletes to their commit") {
    val dir = s"$root/dv_cdc"
    IcebergWrite.create(spark, dir, schema, formatVersion = 3)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).coalesce(1), dir)
    IcebergWrite.deleteWhere(spark, dir, col("id") === 2L)
    IcebergWrite.deleteWhere(spark, dir, col("id") === 3L)
    val ch = IcebergIO.readChangelog(spark, dir).collect()
    val byType = ch.groupBy(_.getAs[String]("_change_type"))
    assert(byType("insert").map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
    // the two DV commits each contribute exactly their own delete row,
    // even though the second DV CONTAINS the first's position
    val dels = byType("delete")
      .map(r => (r.getLong(0), r.getAs[Int]("_change_ordinal")))
    assert(dels.sorted.toSeq === Seq((2L, 1), (3L, 2)))
  }

  test("v3 DV: row lineage counter advances; first_row_id stamped on data files") {
    val dir = s"$root/dv_rowid"
    IcebergWrite.create(spark, dir, schema, formatVersion = 3)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0)).coalesce(1), dir)
    IcebergWrite.append(df((3L, "c", 3.0)).coalesce(1), dir)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = IcebergIO.loadMetadata(dir)
    val root0 = mapper.readTree(GraftFs.readUtf8(meta.metadataFile))
    assert(root0.get("next-row-id").asLong() === 3L)
    // deletes don't advance the counter
    IcebergWrite.deleteWhere(spark, dir, col("id") === 1L)
    val meta2 = IcebergIO.loadMetadata(dir)
    assert(mapper.readTree(GraftFs.readUtf8(meta2.metadataFile))
      .get("next-row-id").asLong() === 3L)
  }

  test("v3 DV: delete loses the optimistic race CLEANLY (no stray puffin)") {
    val dir = s"$root/dv_race"
    IcebergWrite.create(spark, dir, schema, formatVersion = 3)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0)).coalesce(1), dir)
    val meta = IcebergIO.loadMetadata(dir)
    val v = meta.metadataFile.replaceAll(".*/v(\\d+)\\.metadata\\.json$", "$1").toInt
    val blocker = s"$dir/metadata/v${v + 1}.metadata.json"
    val os = GraftFs.createNew(blocker)
    os.write(GraftFs.readUtf8(meta.metadataFile).getBytes("UTF-8")); os.close()
    def dataFiles(): Seq[String] = GraftFs.list(s"$dir/data")
      .map(_.getPath.getName).filterNot(_.startsWith("_")).sorted.toSeq
    val before = dataFiles()
    try {
      val e = intercept[Exception](
        IcebergWrite.deleteWhere(spark, dir, col("id") === 1L))
      assert(e.getMessage.toLowerCase.contains("concurrent"))
      assert(dataFiles() === before) // the loser's puffin must not linger
    } finally GraftFs.delete(blocker, recursive = false)
    IcebergWrite.deleteWhere(spark, dir, col("id") === 1L)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(2L))
  }

  test("v2 -> v3 upgrade absorbs parquet position deletes into DVs") {
    val dir = s"$root/dv_upgrade"
    IcebergWrite.create(spark, dir, schema) // v2
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
      (4L, "d", 4.0)).coalesce(1), dir)
    IcebergWrite.deleteWhere(spark, dir, col("id") === 2L) // parquet pos file
    IcebergWrite.upsert(df((3L, "C", 3.5)).coalesce(1), dir, Seq("id")) // eq delete
    val before = IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(before === Seq((1L, "a"), (3L, "C"), (4L, "d")))
    IcebergWrite.upgradeFormatVersion(spark, dir)
    assert(IcebergIO.loadMetadata(dir).formatVersion === 3)
    // identical read; parquet pos files gone, their rows now a DV; eq
    // deletes untouched (still legal in v3)
    assert(IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq === before)
    val dels = IcebergIO.deleteFiles(spark, dir).collect()
    assert(dels.count(_.getAs[Int]("content") == 1) === 1)
    assert(dels.filter(_.getAs[Int]("content") == 1)
      .forall(_.getAs[String]("file_format") == "PUFFIN"))
    assert(dels.count(_.getAs[Int]("content") == 2) === 1) // the eq file
    // post-upgrade deletes are DVs and merge with the absorbed one
    IcebergWrite.deleteWhere(spark, dir, col("id") === 1L)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(3L, 4L))
    val d2 = dvRows(dir)
    assert(d2.map(_.getAs[Long]("record_count")).sum === 2L) // ids 1 + 2
    // non-v2 tables refuse loudly
    val e = intercept[IllegalArgumentException](
      IcebergWrite.upgradeFormatVersion(spark, dir))
    assert(e.getMessage.contains("v2"))
  }

  test("compactWhere: only matching files rewrite; untouched files keep their seq") {
    val dir = s"$root/cw_basic"
    IcebergWrite.create(spark, dir, schema, partitionCols = Seq("name"))
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0),
      (4L, "b", 4.0)), dir)
    IcebergWrite.deleteWhere(spark, dir, col("id") === 2L)
    val before = IcebergIO.files(spark, dir).collect()
    val bName = before.filter(r => r.getAs[String]("partition") == "name=b")
      .map(_.getAs[String]("file_name")).toSeq
    IcebergWrite.compactWhere(spark, dir, col("name") === "a")
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 3L, 4L))
    val after = IcebergIO.files(spark, dir).collect()
    // partition b's file is byte-identical and keeps its ORIGINAL seq
    val afterB = after.filter(r => r.getAs[String]("partition") == "name=b")
    assert(afterB.map(_.getAs[String]("file_name")).toSeq === bName)
    assert(afterB.forall(_.getAs[Long]("sequence_number") === 1L))
    // partition a folded to a fresh file at the new seq; the parquet
    // delete file is carried (it may name untouched targets) but its
    // entries dangle harmlessly
    val afterA = after.filter(r => r.getAs[String]("partition") == "name=a"
      && r.getAs[Int]("content") == 0)
    assert(afterA.forall(_.getAs[Long]("sequence_number") > 1L))
    assert(!afterA.map(_.getAs[String]("file_name")).toSet.exists(
      before.filter(r => r.getAs[String]("partition") == "name=a"
        && r.getAs[Int]("content") == 0)
        .map(_.getAs[String]("file_name")).toSet))
    // replace + marker: CDC sees only the original insert/delete rows
    val ch = IcebergIO.readChangelog(spark, dir).collect()
    assert(ch.count(_.getAs[String]("_change_type") == "delete") === 1)
  }

  test("compactWhere on v3: rewritten target's DV drops, kept target's DV survives") {
    val dir = s"$root/cw_dv"
    IcebergWrite.create(spark, dir, schema, partitionCols = Seq("name"),
      formatVersion = 3)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0),
      (4L, "b", 4.0)), dir)
    IcebergWrite.deleteWhere(spark, dir, col("id").isin(2L, 4L)) // DV per file
    assert(dvRows(dir).length === 2)
    IcebergWrite.compactWhere(spark, dir, col("name") === "a")
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 3L))
    val dvAfter = dvRows(dir)
    assert(dvAfter.length === 1) // only partition b's DV remains
    // manifest rewrite must CARRY the DV blob range (regression: a
    // rewrite that lost referenced_data_file broke every later read)
    IcebergWrite.rewriteManifests(spark, dir)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 3L))
    assert(dvRows(dir).length === 1)
  }

  test("v3 row lineage: _row_id stable across deletes, NULL for pre-upgrade files") {
    val dir = s"$root/dv_rowid_read"
    IcebergWrite.create(spark, dir, schema, formatVersion = 3)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).coalesce(1), dir)
    IcebergWrite.append(df((4L, "d", 4.0), (5L, "e", 5.0)).coalesce(1), dir)
    def rowIds(): Map[Long, Long] = IcebergIO.readWithRowId(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("_row_id")).toMap
    val before = rowIds()
    assert(before.values.toSeq.sorted === Seq(0L, 1L, 2L, 3L, 4L))
    assert(before(4L) === 3L || before(4L) === 4L) // second file starts at 3
    // a DV delete must not move any surviving row's id
    IcebergWrite.deleteWhere(spark, dir, col("id") === 2L)
    val after = rowIds()
    assert(after === before - 2L)
    // v2 tables refuse; upgraded tables read NULL for pre-upgrade files
    val dir2 = s"$root/dv_rowid_upg"
    IcebergWrite.create(spark, dir2, schema)
    IcebergWrite.append(df((1L, "a", 1.0)).coalesce(1), dir2)
    val e = intercept[IllegalArgumentException](
      IcebergIO.readWithRowId(spark, dir2))
    assert(e.getMessage.contains("format v3"))
    IcebergWrite.upgradeFormatVersion(spark, dir2)
    val up = IcebergIO.readWithRowId(spark, dir2).collect()
    assert(up.forall(_.isNullAt(up.head.fieldIndex("_row_id"))))
    // post-upgrade appends get fresh explicit ids
    IcebergWrite.append(df((2L, "b", 2.0)).coalesce(1), dir2)
    val mixed = IcebergIO.readWithRowId(spark, dir2).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("_row_id"))) None
         else Some(r.getAs[Long]("_row_id")))).toMap
    assert(mixed === Map(1L -> None, 2L -> Some(0L)))
  }

  test("v3 row lineage: physical rewrites preserve _row_id") {
    import org.apache.spark.sql.functions.lit
    val dir = s"$root/rowid_rewrite"
    IcebergWrite.create(spark, dir, schema, partitionCols = Seq("name"),
      formatVersion = 3)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0)), dir)
    IcebergWrite.append(df((4L, "b", 4.0), (5L, "a", 5.0)), dir)
    def rowIds(): Map[Long, Long] = IcebergIO.readWithRowId(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("_row_id")).toMap
    def lseqs(): Map[Long, Long] = IcebergIO.readWithRowId(spark, dir)
      .collect().map(r => r.getLong(0) ->
        r.getAs[Long]("_last_updated_sequence_number")).toMap
    val before = rowIds()
    assert(before.values.toSeq.sorted === Seq(0L, 1L, 2L, 3L, 4L))
    // last-updated = the appending snapshot's seq (1 and 2)
    assert(lseqs() === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L))
    IcebergWrite.deleteWhere(spark, dir, col("id") === 2L) // DV delete
    val base = before - 2L
    // a DV delete modifies no surviving row
    assert(lseqs() === Map(1L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L))

    // compact rewrites EVERY file: survivors keep their exact ids
    // (materialized into the new files), the DV folds away — and their
    // last-updated seqs, even though the new files sit at a later seq
    IcebergWrite.compact(spark, dir)
    assert(rowIds() === base)
    assert(lseqs() === Map(1L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L))
    // the preservation is the materialized column, not a first_row_id
    // coincidence: the rewrite still advanced next-row-id past 5 (new
    // files get fresh assigned ranges) while the read ids stayed 0-4
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    assert(mapper.readTree(GraftFs.readUtf8(
      IcebergIO.loadMetadata(dir).metadataFile))
      .get("next-row-id").asLong() >= 5L + 4L)

    // compactWhere of ONE partition: rewritten partition keeps ids,
    // untouched partition's files carry verbatim
    IcebergWrite.append(df((6L, "a", 6.0)), dir)
    val with6 = rowIds()
    assert(with6.keySet === base.keySet + 6L)
    IcebergWrite.compactWhere(spark, dir, col("name") === "a")
    assert(rowIds() === with6)

    // a SECOND rewrite over already-materialized files composes
    IcebergWrite.compact(spark, dir)
    assert(rowIds() === with6)

    // updateWhere rewrites the row physically: content moves, id stays,
    // and ONLY the updated row's last-updated seq advances (to the
    // update snapshot's seq — the new file's data seq, underived)
    val lseqPre = lseqs()
    IcebergWrite.updateWhere(spark, dir, col("id") === 3L,
      Map("score" -> lit(99.0)))
    assert(rowIds() === with6)
    assert(IcebergIO.read(spark, dir).filter(col("id") === 3L)
      .collect().head.getDouble(2) === 99.0)
    val lseqPost = lseqs()
    assert(lseqPost(3L) > lseqPre(3L), s"updated row seq must advance")
    assert(lseqPost - 3L === lseqPre - 3L, "other rows' seqs unchanged")
    // a compact AFTER the update carries the advanced seq verbatim
    IcebergWrite.compact(spark, dir)
    assert(lseqs() === lseqPost && rowIds() === with6)

    // merge: matched UPDATE keeps the id; NOT MATCHED insert derives a
    // fresh one from the new file's assignment (never colliding with a
    // preserved id)
    val src = df((4L, "b", 40.0), (7L, "c", 7.0))
    IcebergWrite.merge(spark, dir, src, Seq("id"), Seq(
      IcebergWrite.WhenMatchedUpdate(Map("score" ->
        org.apache.spark.sql.functions.expr("s.score"))),
      IcebergWrite.WhenNotMatchedInsert(Map(
        "id" -> org.apache.spark.sql.functions.expr("s.id"),
        "name" -> org.apache.spark.sql.functions.expr("s.name"),
        "score" -> org.apache.spark.sql.functions.expr("s.score")))))
    val afterMerge = rowIds()
    assert(afterMerge.view.filterKeys(_ != 7L).toMap === with6)
    assert(!with6.values.toSet.contains(afterMerge(7L)))
    assert(IcebergIO.read(spark, dir).filter(col("id") === 4L)
      .collect().head.getDouble(2) === 40.0)
    // merge: the matched-UPDATE row and the insert both carry the merge
    // snapshot's seq; untouched rows keep theirs
    val lseqM = lseqs()
    assert(lseqM(4L) === lseqM(7L) && lseqM(4L) > lseqPost(4L))
    assert(lseqM - 4L - 7L === lseqPost - 4L)

    // CDC across the rewrites: replace snapshots are data-preserving and
    // skipped; net content of the change rows replays the final state
    val ch = IcebergIO.readChangelog(spark, dir).collect()
    val net = ch.groupBy(_.getLong(0)).view.mapValues { rows =>
      rows.count(_.getAs[String]("_change_type") == "insert") -
        rows.count(_.getAs[String]("_change_type") == "delete")
    }.toMap
    val liveIds = ids(IcebergIO.read(spark, dir))
    liveIds.foreach(i => assert(net(i) === 1, s"id $i"))
    assert(net(2L) === 0)
  }

  test("v3 upsert(preserveLineage): matched keys keep their _row_id") {
    val dir = s"$root/rowid_upsert"
    IcebergWrite.create(spark, dir, schema, formatVersion = 3)
    IcebergWrite.append(
      df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0), (4L, "d", 4.0)), dir)
    def rowIds(): Map[Long, Long] = IcebergIO.readWithRowId(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("_row_id")).toMap
    val before = rowIds()
    assert(before.values.toSeq.sorted === Seq(0L, 1L, 2L, 3L))

    // update half the keys + insert a new one, identity-preserving:
    // matched rows keep their EXACT ids, the insert derives a fresh one
    val src = df((1L, "a", 10.0), (3L, "c", 30.0), (5L, "e", 5.0))
    IcebergWrite.upsert(src, dir, Seq("id"), preserveLineage = true)
    val after = rowIds()
    assert(after.view.filterKeys(_ != 5L).toMap === before)
    assert(!before.values.toSet.contains(after(5L)))
    // content did change (it was an update, not a no-op)
    val scores = IcebergIO.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores === Map(1L -> 10.0, 2L -> 2.0, 3L -> 30.0, 4L -> 4.0,
      5L -> 5.0))

    // a second preserving upsert over the REWRITTEN (materialized-id)
    // files composes; plain upsert on the same keys churns identity
    IcebergWrite.upsert(df((1L, "a", 100.0)), dir, Seq("id"),
      preserveLineage = true)
    assert(rowIds() === after)
    IcebergWrite.upsert(df((2L, "b", 200.0)), dir, Seq("id"))
    val churned = rowIds()
    assert(churned(2L) !== after(2L), "plain upsert must re-assign")
    assert(churned - 2L === after - 2L)

    // identity-grain CDC sees the preserving upsert as an UPDATE pair
    // sharing one id (the delete+insert of the plain form shows two)
    IcebergWrite.upsert(df((4L, "d", 400.0)), dir, Seq("id"),
      preserveLineage = true)
    val chAll = IcebergIO.readChangelog(spark, dir, withRowId = true)
      .filter(col("id") === 4L).collect()
    val maxOrd = chAll.map(_.getAs[Int]("_change_ordinal")).max
    val ch = chAll.filter(_.getAs[Int]("_change_ordinal") == maxOrd)
    assert(ch.length === 2)
    assert(ch.map(_.getAs[Long]("_row_id")).toSet.size === 1)

    // v2 tables refuse the flag loudly
    val v2 = s"$dir-v2"
    IcebergWrite.create(spark, v2, schema)
    IcebergWrite.append(df((1L, "a", 1.0)), v2)
    val e = intercept[IllegalArgumentException](
      IcebergWrite.upsert(df((1L, "a", 2.0)), v2, Seq("id"),
        preserveLineage = true))
    assert(e.getMessage.contains("format v3"), e.getMessage)
  }

  test("merge WHEN NOT MATCHED BY SOURCE: delete/flag unmatched targets") {
    import org.apache.spark.sql.functions.expr
    val dir = s"$root/merge_bysource"
    IcebergWrite.create(spark, dir, schema, formatVersion = 3)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
      (4L, "d", 4.0), (5L, "e", 5.0)), dir)
    def rowIds(): Map[Long, Long] = IcebergIO.readWithRowId(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("_row_id")).toMap
    val before = rowIds()
    // full-sync: source holds keys 1-3 (1 updated, 3 new content unused);
    // 4 flags (score below 4.5? no — first clause), 5 deletes
    val src = df((1L, "a", 10.0), (2L, "b", 2.0), (3L, "c", 3.0))
    IcebergWrite.merge(spark, dir, src, Seq("id"), Seq(
      IcebergWrite.WhenMatchedUpdate(Map("score" -> expr("s.score"))),
      IcebergWrite.WhenNotMatchedBySourceUpdate(
        Map("name" -> expr("concat(t.name, '_stale')")),
        cond = Some(expr("t.score < 4.5"))),
      IcebergWrite.WhenNotMatchedBySourceDelete()))
    val got = IcebergIO.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    // 4 (score 4.0 < 4.5) flags; 5 (score 5.0) falls to DELETE
    assert(got === Set((1L, "a", 10.0), (2L, "b", 2.0), (3L, "c", 3.0),
      (4L, "d_stale", 4.0)))
    // lineage: the flagged rewrite AND the matched update keep _row_id
    val after = rowIds()
    assert(after === (before - 5L))

    // a by-source-only merge (no MATCHED/INSERT clause at all) works:
    // the pure retention-sweep shape
    IcebergWrite.merge(spark, dir, df((1L, "a", 0.0)), Seq("id"),
      Seq(IcebergWrite.WhenNotMatchedBySourceDelete(
        cond = Some(expr("t.name = 'd_stale'")))))
    assert(IcebergIO.read(spark, dir).collect().map(_.getLong(0)).toSet ===
      Set(1L, 2L, 3L))
    assert(rowIds() === after - 4L)
  }

  test("merge on a TRUNCATED table (snapshot, zero files) inserts cleanly") {
    import org.apache.spark.sql.functions.expr
    val dir = s"$root/merge_truncated"
    IcebergWrite.create(spark, dir, schema)
    IcebergWrite.append(df((1L, "a", 1.0)), dir)
    IcebergWrite.overwrite(df(), dir) // truncate: current snapshot, no files
    assert(IcebergIO.read(spark, dir).count() === 0L)
    // regression: the position-pair scan used to reduce over ZERO data
    // branches and throw empty.reduceLeft — with matched AND by-source
    // clauses present, both now degrade to the typed empty frame
    IcebergWrite.merge(spark, dir, df((2L, "b", 2.0)), Seq("id"), Seq(
      IcebergWrite.WhenMatchedUpdate(Map("score" -> expr("s.score"))),
      IcebergWrite.WhenNotMatchedBySourceDelete(),
      IcebergWrite.WhenNotMatchedInsert(Map(
        "id" -> expr("s.id"), "name" -> expr("s.name"),
        "score" -> expr("s.score")))))
    assert(IcebergIO.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ===
      Seq((2L, "b", 2.0)))
  }

  test("timestamp_ns tables: read as ns longs, read-only to the writer") {
    import org.apache.spark.sql.types._
    val dir = s"$root/tsns"
    val nsSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ts_ns", LongType, nullable = false,
        metadata = new MetadataBuilder()
          .putString("iceberg.type", "timestamp_ns").build())))
    val w = new graft.sources.IcebergFixture.Writer(spark, dir, nsSchema)
    val rows = Seq((1L, 1500000000123456789L), (2L, 1600000000987654321L))
    val file = new java.io.File(s"$dir/data/ns-00001.parquet")
    file.getParentFile.mkdirs()
    graft.sources.IcebergFixture.writeNsParquet(
      file.getAbsolutePath, "ts_ns", rows)
    w.appendExternalFile(file, 2L)
    // reads surface EXACT ns longs (the NANOS annotation would error a
    // plain Spark read; the iceberg path sets the legacy conf itself)
    val got = IcebergIO.read(spark, dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === rows)
    // SQL surface too (registered live view)
    val g = graft.GraftSession.wrap(spark)
    g.registerIceberg("tsns_sql", dir)
    assert(g.sql("SELECT max(ts_ns) FROM tsns_sql").collect()
      .head.getLong(0) === 1600000000987654321L)
    // every data-writing verb refuses loudly (Spark cannot produce a
    // NANOS-annotated value — a write would corrupt the column's type)
    val df2 = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(org.apache.spark.sql.Row(3L, 1L))),
      StructType(nsSchema.fields.map(f =>
        StructField(f.name, f.dataType, f.nullable))))
    val eApp = intercept[IllegalArgumentException](
      IcebergWrite.append(df2, dir))
    assert(eApp.getMessage.contains("read-only"), eApp.getMessage)
    intercept[IllegalArgumentException](
      IcebergWrite.updateWhere(spark, dir, col("id") === 1L,
        Map("ts_ns" -> org.apache.spark.sql.functions.lit(0L))))
    intercept[IllegalArgumentException](
      IcebergWrite.deleteEquality(
        df2.select("ts_ns"), dir))
    intercept[IllegalArgumentException](IcebergWrite.compact(spark, dir))
    // a NESTED ns type stays a loud unsupported at schema parse
    val badMeta = s"$root/tsns_nested"
    GraftFs.mkdirs(s"$badMeta/metadata")
    def put(path: String, text: String): Unit = {
      val out = GraftFs.create(path)
      try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    val nested = GraftFs.readUtf8(IcebergIO.loadMetadata(dir).metadataFile)
      .replace("\"timestamp_ns\"",
        "{\"type\":\"struct\",\"fields\":[{\"id\":99,\"name\":\"x\"," +
          "\"required\":true,\"type\":\"timestamp_ns\"}]}")
    put(s"$badMeta/metadata/v1.metadata.json", nested)
    put(s"$badMeta/metadata/version-hint.text", "1")
    val eNested = intercept[IllegalArgumentException](
      IcebergIO.loadMetadata(badMeta))
    assert(eNested.getMessage.contains("unsupported"), eNested.getMessage)
  }

  test("v3 unknown columns: read-as-null, writes omit the column, DML " +
      "composes, v1/v2 + default + eq-key gates hold") {
    import org.apache.spark.sql.functions.{concat, lit}
    import org.apache.spark.sql.types._
    val dir = s"$root/unknown"
    val uSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("u", NullType, nullable = true),
      StructField("v", StringType, nullable = false)))
    // v1/v2 refuse the v3 type at create AND at schema evolution
    val e = intercept[IllegalArgumentException](
      IcebergWrite.create(spark, s"$dir-v2", uSchema))
    assert(e.getMessage.contains("format v3"), e.getMessage)
    val v2t = s"$dir-v2add"
    IcebergWrite.create(spark, v2t, schema)
    val eAdd = intercept[IllegalArgumentException](
      IcebergWrite.addColumn(v2t, "u", NullType))
    assert(eAdd.getMessage.contains("format v3"), eAdd.getMessage)
    // v3 create + append: the column never reaches a data file, yet
    // every read surfaces it as a typed null
    IcebergWrite.create(spark, dir, uSchema, formatVersion = 3)
    val df = spark.range(6).select(col("id"),
      lit(null).as("u"), concat(lit("x"), col("id")).as("v"))
    IcebergWrite.append(df, dir)
    val got = IcebergIO.read(spark, dir)
    assert(got.schema("u").dataType === NullType)
    assert(got.collect().forall(_.isNullAt(1)))
    assert(!spark.read.parquet(s"$dir/data").schema.fieldNames.contains("u"),
      "unknown column leaked into a physical data file")
    // DML lifecycle over the unknown-typed table: DV delete, UPDATE,
    // compact, preserving upsert — all route the omission choke point
    IcebergWrite.deleteWhere(spark, dir, col("id") === 1L)
    IcebergWrite.updateWhere(spark, dir, col("id") === 2L,
      Map("v" -> lit("upd")))
    IcebergWrite.compact(spark, dir)
    IcebergWrite.upsert(
      spark.range(1).select(lit(7L).as("id"), lit(null).as("u"),
        lit("ups").as("v")),
      dir, Seq("id"), preserveLineage = true): Unit
    val fin = IcebergIO.readWithRowId(spark, dir).orderBy("id").collect()
    assert(fin.map(_.getAs[Long]("id")).toSeq ===
      Seq(0L, 2L, 3L, 4L, 5L, 7L))
    assert(fin.forall(_.isNullAt(fin.head.fieldIndex("u"))))
    assert(fin.find(_.getAs[Long]("id") == 2L).get
      .getAs[String]("v") === "upd")
    assert(fin.map(_.getAs[Long]("_row_id")).distinct.length === fin.length)
    // equality deletes keyed on the unknown column are refused — the
    // type stores no values, so no row can be addressed by it
    val eEq = intercept[IllegalArgumentException](
      IcebergWrite.deleteEquality(spark.range(1).select(lit(null).as("u")),
        dir))
    assert(eEq.getMessage.contains("stores no values"), eEq.getMessage)
    // defaults on an unknown column are refused (nothing to default)
    val eDef = intercept[IllegalArgumentException](
      IcebergWrite.addColumnWithDefault(dir, "u2", NullType, "x"))
    assert(eDef.getMessage.contains("default"), eDef.getMessage)
    // unknown columns can never anchor physical layout: partition
    // source (create + evolution) and sort key all refuse
    val ePart = intercept[IllegalArgumentException](
      IcebergWrite.create(spark, s"$dir-part", uSchema,
        partitionCols = Seq("u"), formatVersion = 3))
    assert(ePart.getMessage.contains("stores no values"), ePart.getMessage)
    val eEvo = intercept[IllegalArgumentException](
      IcebergWrite.updatePartitionSpec(dir, Seq("u")))
    assert(eEvo.getMessage.contains("stores no values"), eEvo.getMessage)
    val eSort = intercept[IllegalArgumentException](
      IcebergWrite.setSortOrder(dir, Seq("u")))
    assert(eSort.getMessage.contains("stores no values"), eSort.getMessage)
    // ANALYZE skips the valueless column by default and refuses it
    // explicitly — no NDV blob over nothing
    IcebergWrite.computeTableStats(spark, dir): Unit
    assert(!IcebergIO.tableStats(spark, dir).collect()
      .exists(_.toString.contains("\"u\"")))
    val eNdv = intercept[IllegalArgumentException](
      IcebergWrite.computeTableStats(spark, dir, columns = Seq("u")))
    assert(eNdv.getMessage.contains("valueless"), eNdv.getMessage)
    // SQL surface: the registered live view serves the column as null
    val g = GraftSession.wrap(spark)
    g.registerIceberg("unk_sql", dir)
    assert(g.sql("SELECT count(*) FROM unk_sql WHERE u IS NULL")
      .collect().head.getLong(0) === 6L)
    // SQL INSERT aligns a TYPED null (or any expression) in the unknown
    // slot to the null literal instead of cast-to-void failing
    g.sql("INSERT INTO unk_sql SELECT CAST(8 AS BIGINT), " +
      "CAST(NULL AS STRING), 'n8'")
    assert(g.sql("SELECT count(*) FROM unk_sql WHERE u IS NULL")
      .collect().head.getLong(0) === 7L)
    IcebergWrite.deleteWhere(spark, dir, col("id") === 8L)
    // the file-grain streaming source strips the void column from the
    // physical schema and projects the null back, like the batch path
    // (fresh append-only table: the source refuses DML histories)
    val sDir = s"$dir-stream"
    IcebergWrite.create(spark, sDir, uSchema, formatVersion = 3)
    IcebergWrite.append(df, sDir)
    val streamed = graft.streaming.StreamingOps
      .icebergAppendStream(spark, sDir)
    assert(streamed.schema("u").dataType === NullType)
    // mid-life addColumn of an unknown column on v3 is metadata-only
    IcebergWrite.addColumn(dir, "u2", NullType)
    val got2 = IcebergIO.read(spark, dir)
    assert(got2.schema("u2").dataType === NullType)
    assert(got2.select("u2").collect().forall(_.isNullAt(0)))
    // a NESTED unknown stays a loud unsupported at schema parse (same
    // boundary as nested ns timestamps)
    val badMeta = s"$root/unknown_nested"
    GraftFs.mkdirs(s"$badMeta/metadata")
    def put(path: String, text: String): Unit = {
      val out = GraftFs.create(path)
      try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    val nested = GraftFs.readUtf8(IcebergIO.loadMetadata(dir).metadataFile)
      .replace("\"unknown\"",
        "{\"type\":\"struct\",\"fields\":[{\"id\":99,\"name\":\"x\"," +
          "\"required\":false,\"type\":\"unknown\"}]}")
    put(s"$badMeta/metadata/v1.metadata.json", nested)
    put(s"$badMeta/metadata/version-hint.text", "1")
    val eNested = intercept[IllegalArgumentException](
      IcebergIO.loadMetadata(badMeta))
    assert(eNested.getMessage.contains("unsupported"), eNested.getMessage)
  }

  test("v3 geometry/geography: WKB BinaryType read, tables read-only " +
      "to the writer, nested type stays loud") {
    import org.apache.spark.sql.functions.{hex, lower, lit}
    val dir = s"$root/geo"
    val geoSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("geom", BinaryType, nullable = false,
        metadata = new MetadataBuilder()
          .putString("iceberg.type", "geometry(OGC:CRS84)").build()),
      StructField("area", BinaryType, nullable = true,
        metadata = new MetadataBuilder()
          .putString("iceberg.type", "geography(OGC:CRS84, spherical)")
            .build())))
    val w = new IcebergFixture.Writer(spark, dir,
      StructType(geoSchema.fields.take(2)))
    val rows = (0L until 5L).map(i =>
      (i, IcebergFixture.wkbPoint(i.toDouble, i * 3.0)))
    val file = new java.io.File(s"$dir/data/geo-00001.parquet")
    file.getParentFile.mkdirs()
    IcebergFixture.writeGeoParquet(file.getAbsolutePath, "geom",
      "OGC:CRS84", rows)
    w.appendExternalFile(file, rows.size.toLong)
    // exact byte-level round trip of the WKB payloads
    val got = IcebergIO.read(spark, dir)
      .select(col("id"), lower(hex(col("geom"))).as("g"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === rows.map { case (i, b) =>
      (i, b.map("%02x".format(_)).mkString) })
    assert(IcebergIO.read(spark, dir).schema("geom").dataType === BinaryType)
    // GEOGRAPHY maps to BinaryType at schema parse too (metadata-level)
    val metaTxt = GraftFs.readUtf8(IcebergIO.loadMetadata(dir).metadataFile)
    def put(path: String, text: String): Unit = {
      val out = GraftFs.create(path)
      try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    val geogDir = s"$root/geog"
    GraftFs.mkdirs(s"$geogDir/metadata")
    put(s"$geogDir/metadata/v1.metadata.json", metaTxt.replace(
      "\"geometry(OGC:CRS84)\"", "\"geography(OGC:CRS84, spherical)\""))
    put(s"$geogDir/metadata/version-hint.text", "1")
    assert(IcebergIO.loadMetadata(geogDir).schema("geom").dataType
      === BinaryType)
    // every data write and geo-keyed equality delete refuses loudly
    val df2 = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        java.util.Arrays.asList(org.apache.spark.sql.Row(9L,
          IcebergFixture.wkbPoint(9.0, 9.0)))),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("geom", BinaryType, nullable = false))))
    val eApp = intercept[IllegalArgumentException](
      IcebergWrite.append(df2, dir))
    assert(eApp.getMessage.contains("read-only"), eApp.getMessage)
    intercept[IllegalArgumentException](IcebergWrite.compact(spark, dir))
    intercept[IllegalArgumentException](
      IcebergWrite.updateWhere(spark, dir, col("id") === 1L,
        Map("geom" -> lit(Array[Byte]()))))
    val eEq = intercept[IllegalArgumentException](
      IcebergWrite.deleteEquality(df2.select("geom"), dir))
    assert(eEq.getMessage.contains("geometry"), eEq.getMessage)
    // a NESTED geospatial type stays a loud unsupported at schema parse
    val badDir = s"$root/geo_nested"
    GraftFs.mkdirs(s"$badDir/metadata")
    put(s"$badDir/metadata/v1.metadata.json", metaTxt.replace(
      "\"geometry(OGC:CRS84)\"",
      "{\"type\":\"struct\",\"fields\":[{\"id\":99,\"name\":\"g\"," +
        "\"required\":false,\"type\":\"geometry(OGC:CRS84)\"}]}"))
    put(s"$badDir/metadata/version-hint.text", "1")
    val eNested = intercept[IllegalArgumentException](
      IcebergIO.loadMetadata(badDir))
    assert(eNested.getMessage.contains("unsupported"), eNested.getMessage)
  }

  test("v3 variant column: write/read/typed access/DV delete/compact") {
    import org.apache.spark.sql.functions.expr
    val dir = s"$root/variant"
    val df = spark.range(4).selectExpr("id",
      "parse_json(concat('{\"k\":', id, ',\"s\":\"x', id, '\"}')) as v")
    // v1/v2 refuse the v3 type loudly — at create AND at schema
    // evolution (an addColumn slipping it into v2 metadata would be
    // unreadable to spec readers)
    val e = intercept[IllegalArgumentException](
      IcebergWrite.create(spark, s"$dir-v2", df.schema))
    assert(e.getMessage.contains("format v3"), e.getMessage)
    val v2t = s"$dir-v2add"
    IcebergWrite.create(spark, v2t, schema)
    val eAdd = intercept[IllegalArgumentException](
      IcebergWrite.addColumn(v2t, "v",
        org.apache.spark.sql.types.VariantType))
    assert(eAdd.getMessage.contains("format v3"), eAdd.getMessage)
    IcebergWrite.create(spark, dir, df.schema, formatVersion = 3)
    IcebergWrite.append(df, dir)
    // metadata declares the spec type, the read surfaces Spark's native
    // VariantType, and typed access works through Spark's own machinery
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val md = mapper.readTree(GraftFs.readUtf8(
      IcebergIO.loadMetadata(dir).metadataFile))
    assert(md.get("schemas").elements().next().get("fields").get(1)
      .get("type").asText() === "variant")
    val back = IcebergIO.read(spark, dir)
    assert(back.schema("v").dataType ===
      org.apache.spark.sql.types.VariantType)
    assert(back.selectExpr("variant_get(v, '$.k', 'long')")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(0L, 1L, 2L, 3L))
    // DV delete + lineage + compact compose over the variant column
    IcebergWrite.deleteWhere(spark, dir, col("id") === 2L)
    IcebergWrite.compact(spark, dir)
    val got = IcebergIO.readWithRowId(spark, dir)
      .select(col("id"), col("_row_id"), expr("to_json(v)").as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(got === Seq((0L, 0L, """{"k":0,"s":"x0"}"""),
      (1L, 1L, """{"k":1,"s":"x1"}"""), (3L, 3L, """{"k":3,"s":"x3"}""")))
  }

  test("v3 changelog with lineage: an UPDATE pair shares ONE _row_id") {
    import org.apache.spark.sql.functions.lit
    val dir = s"$root/cdc_rowid"
    IcebergWrite.create(spark, dir, schema, formatVersion = 3)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .coalesce(1), dir)
    IcebergWrite.updateWhere(spark, dir, col("id") === 2L,
      Map("score" -> lit(99.0)))
    IcebergWrite.upsert(df((3L, "c", 33.0), (4L, "d", 4.0)), dir, Seq("id"))
    val ch = IcebergIO.readChangelog(spark, dir, withRowId = true)
      .collect().map(r => (r.getAs[String]("_change_type"),
        r.getAs[Int]("_change_ordinal"), r.getLong(0),
        r.getAs[Long]("_row_id"), r.getDouble(2))).toSet
    // ordinal 0: the three appended rows with their assigned ids
    assert(ch.filter(_._2 == 0) === Set(
      ("insert", 0, 1L, 0L, 1.0), ("insert", 0, 2L, 1L, 2.0),
      ("insert", 0, 3L, 2L, 3.0)))
    // ordinal 1 (UPDATE): delete + insert of row 2 share _row_id 1 — a
    // CDC consumer sees a true UPDATE at permanent-identity grain
    assert(ch.filter(_._2 == 1) === Set(
      ("delete", 1, 2L, 1L, 2.0), ("insert", 1, 2L, 1L, 99.0)))
    // ordinal 2 (upsert): the replaced row CHANGES identity (the
    // documented delete+insert semantics) and the fresh insert gets a
    // new id — no id ever collides with a live one
    val ord2 = ch.filter(_._2 == 2)
    val del3 = ord2.find(t => t._1 == "delete" && t._3 == 3L).get
    val ins3 = ord2.find(t => t._1 == "insert" && t._3 == 3L).get
    val ins4 = ord2.find(t => t._1 == "insert" && t._3 == 4L).get
    assert(del3._4 === 2L && ins3._4 != 2L && ins4._4 != ins3._4)
    assert(ord2.size === 3)
    // v2 refuses withRowId loudly
    val v2 = s"$root/cdc_rowid_v2"
    IcebergWrite.create(spark, v2, schema)
    IcebergWrite.append(df((1L, "a", 1.0)), v2)
    val e = intercept[IllegalArgumentException](
      IcebergIO.readChangelog(spark, v2, withRowId = true))
    assert(e.getMessage.contains("format v3"), e.getMessage)
  }

  test("v3 row lineage: __gf_rowid cannot be smuggled through public verbs") {
    import org.apache.spark.sql.functions.lit
    val dir = s"$root/rowlin_smuggle"
    IcebergWrite.create(spark, dir, schema, formatVersion = 3)
    IcebergWrite.append(df((1L, "a", 1.0)), dir)
    // a user frame carrying the internal lineage column must be refused
    // by append AND overwrite — only the rewrite verb (replace) threads
    // carries; accepting it would materialize colliding _row_id values
    val bad = df((2L, "b", 2.0)).withColumn("__gf_rowid", lit(0L))
    val e1 = intercept[IllegalArgumentException](IcebergWrite.append(bad, dir))
    assert(e1.getMessage.contains("rewrite-verb"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      IcebergWrite.overwrite(bad, dir))
    assert(e2.getMessage.contains("rewrite-verb"), e2.getMessage)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L))
  }

  test("v3 row lineage: hive-imported table keeps lineage across compact") {
    // compact-rewritten files stay under the SAME identity spec as the
    // imports, so they route through the injection branch — which must
    // read their materialized lineage, not null it (regression: the
    // injected branch used to blanket-null __gf_mrowid/__gf_mlseq)
    val dir = s"$root/rowlin_hive"
    val src = s"$root/rowlin_hive_src"
    IcebergWrite.create(spark, dir, schema, partitionCols = Seq("name"),
      fieldIds = false, formatVersion = 3)
    df((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
      .write.partitionBy("name").parquet(src)
    IcebergWrite.addFiles(spark, dir, src)
    def lin(): Map[Long, (Long, Long)] = IcebergIO.readWithRowId(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getAs[Long]("_row_id"),
        r.getAs[Long]("_last_updated_sequence_number")))).toMap
    val before = lin()
    assert(before.values.map(_._1).toSeq.sorted === Seq(0L, 1L, 2L))
    IcebergWrite.deleteWhere(spark, dir, col("id") === 2L)
    IcebergWrite.compact(spark, dir)
    assert(lin() === before - 2L)
    // a second compact over the (already materialized) rewritten files
    IcebergWrite.compact(spark, dir)
    assert(lin() === before - 2L)
  }

  test("v3 row lineage: cherry-pick carries branch-assigned ids, counter stays") {
    val dir = s"$root/dv_rowid_pick"
    IcebergWrite.create(spark, dir, schema, formatVersion = 3)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).coalesce(1), dir)
    val b1 = IcebergWrite.append(df((4L, "d", 4.0), (5L, "e", 5.0)).coalesce(1),
      dir, branch = Some("audit"))
    IcebergWrite.cherrypickSnapshot(spark, dir, b1)
    val got = IcebergIO.readWithRowId(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("_row_id")).toMap
    // branch commit consumed ids 3-4 from the table-global counter; the
    // pick replays them verbatim — no gap, no overlap
    assert(got.values.toSeq.sorted === Seq(0L, 1L, 2L, 3L, 4L))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = IcebergIO.loadMetadata(dir)
    assert(mapper.readTree(GraftFs.readUtf8(meta.metadataFile))
      .get("next-row-id").asLong() === 5L)
    // a later main append continues from the shared counter
    IcebergWrite.append(df((6L, "f", 6.0)).coalesce(1), dir)
    val got2 = IcebergIO.readWithRowId(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("_row_id")).toMap
    assert(got2(6L) === 5L)
  }

  test("v3 DV: corrupted blob fails loudly on read") {
    val dir = s"$root/dv_corrupt"
    IcebergWrite.create(spark, dir, schema, formatVersion = 3)
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0)).coalesce(1), dir)
    IcebergWrite.deleteWhere(spark, dir, col("id") === 1L)
    val puffin = GraftFs.list(s"$dir/data")
      .map(_.getPath.toString).find(_.endsWith(".puffin")).get
    val bytes = {
      val in = GraftFs.open(puffin)
      try in.readAllBytes() finally in.close()
    }
    bytes(10) = (bytes(10) ^ 0x1).toByte // flip a bit inside the vector
    val os = GraftFs.create(puffin)
    os.write(bytes); os.close()
    // local FS keeps a .crc sidecar that now mismatches — remove it so
    // the failure under test is OUR CRC check, not Hadoop's
    GraftFs.delete(s"$dir/data/.${puffin.split('/').last}.crc", recursive = false)
    val e = intercept[Exception](IcebergIO.read(spark, dir).count())
    assert(e.getMessage.contains("CRC") || e.getMessage.contains("magic") ||
      e.getMessage.contains("length"),
      s"unexpected failure: ${e.getMessage}")
  }

  test("ref retention: max-ref-age-ms refs drop at expiration, others pin") {
    val dir = s"$root/refage"
    IcebergWrite.create(spark, dir, schema)
    val s1 = IcebergWrite.append(df((1L, "a", 1.0)), dir)
    val s2 = IcebergWrite.append(df((2L, "b", 2.0)), dir)
    IcebergWrite.append(df((3L, "c", 3.0)), dir)
    // an age-capped tag (0 ms: expires immediately) and a permanent one
    IcebergWrite.createTag(dir, "ephemeral", s1, maxRefAgeMs = Some(0L))
    IcebergWrite.createTag(dir, "keeper", s2)
    // before expiration both refs resolve
    assert(IcebergIO.read(spark, dir, ref = Some("ephemeral")).count() === 1)
    val n = IcebergWrite.expireSnapshots(dir, Long.MaxValue)
    // the aged-out ref is gone AND its snapshot expired with it; the
    // permanent tag still pins s2
    assert(n === 1, s"expected exactly the ephemeral tag's snapshot, got $n")
    val meta = IcebergIO.loadMetadata(dir)
    assert(!meta.refs.contains("ephemeral") && meta.refs.contains("keeper"))
    assert(!meta.snapshots.exists(_.snapshotId == s1))
    assert(IcebergIO.read(spark, dir, ref = Some("keeper")).count() === 2)
    // a drop with nothing else to expire is still a metadata commit
    IcebergWrite.createTag(dir, "ephemeral2", s2, maxRefAgeMs = Some(0L))
    assert(IcebergWrite.expireSnapshots(dir, 0L) === 0) // s2 pinned by keeper
    assert(!IcebergIO.loadMetadata(dir).refs.contains("ephemeral2"))
  }

  test("branch retention: min-snapshots-to-keep preserves lineage ancestry") {
    val dir = s"$root/branchkeep"
    IcebergWrite.create(spark, dir, schema)
    val s1 = IcebergWrite.append(df((1L, "a", 1.0)), dir)
    val s2 = IcebergWrite.append(df((2L, "b", 2.0)), dir)
    val s3 = IcebergWrite.append(df((3L, "c", 3.0)), dir)
    IcebergWrite.createBranch(dir, "audited", s3,
      minSnapshotsToKeep = Some(3))
    // a global expire that would keep only the current snapshot must
    // preserve the branch's whole 3-deep ancestry
    assert(IcebergWrite.expireSnapshots(dir, Long.MaxValue) === 0)
    val ids = IcebergIO.loadMetadata(dir).snapshots.map(_.snapshotId).toSet
    assert(ids === Set(s1, s2, s3))
    // time travel through the retained ancestry still answers
    assert(IcebergIO.read(spark, dir, Some(s1)).count() === 1)

    // an age-capped branch (0 ms) keeps only what the ref itself pins:
    // ancestors strip under the same global expire
    val dir2 = s"$root/branchage"
    IcebergWrite.create(spark, dir2, schema)
    IcebergWrite.append(df((1L, "a", 1.0)), dir2)
    val t2 = IcebergWrite.append(df((2L, "b", 2.0)), dir2)
    IcebergWrite.createBranch(dir2, "dev", t2, maxSnapshotAgeMs = Some(0L))
    assert(IcebergWrite.expireSnapshots(dir2, Long.MaxValue) === 1)
    assert(IcebergIO.loadMetadata(dir2).snapshots.map(_.snapshotId).toSet
      === Set(t2))
    // plain tags are unaffected by branch-retention machinery
    IcebergWrite.createTag(dir2, "t", t2)
    assert(IcebergIO.read(spark, dir2, ref = Some("t")).count() === 2)
  }

  test("partition statistics: compute, register, stale-loud, recompute") {
    val dir = s"$root/pstats"
    IcebergWrite.create(spark, dir, schema, partitionCols = Seq("name"))
    IcebergWrite.append(
      df((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0)), dir)

    // no stats registered yet -> loud, names the CALL
    val e0 = intercept[IllegalStateException](
      IcebergIO.partitionStats(spark, dir).collect())
    assert(e0.getMessage.contains("compute_partition_stats"), e0.getMessage)

    val p1 = IcebergWrite.computePartitionStats(spark, dir)
    assert(p1.contains("/metadata/partition-stats-"), p1)
    val s1 = IcebergIO.partitionStats(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getInt(3), r.getLong(5))).toSeq
    assert(s1 === Seq(("name=a", 2L, 1, 0L), ("name=b", 1L, 1, 0L)))

    // a NEW commit makes the stats stale -> loud again (never silently
    // served for the wrong snapshot)
    IcebergWrite.deleteWhere(spark, dir, col("id") === 1L)
    val e1 = intercept[IllegalStateException](
      IcebergIO.partitionStats(spark, dir).collect())
    assert(e1.getMessage.contains("no partition-statistics"), e1.getMessage)

    // recompute: data counts stay RAW (merge-on-read), the delete file
    // surfaces as a position-delete row under its declared-null tuple
    IcebergWrite.computePartitionStats(spark, dir)
    val s2 = IcebergIO.partitionStats(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(5), r.getInt(6))).toSeq
    assert(s2 === Seq(("name=a", 2L, 0L, 0), ("name=b", 1L, 0L, 0),
      ("name=null", 0L, 1L, 1)))
  }

  test("table statistics: NDV blobs, stale-loud, ANALYZE/CALL, approx") {
    val dir = s"$root/tstats"
    IcebergWrite.create(spark, dir, schema)
    IcebergWrite.append(
      df((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 2.0)), dir)

    val e0 = intercept[IllegalStateException](
      IcebergIO.tableStats(spark, dir).collect())
    assert(e0.getMessage.contains("compute_table_stats"), e0.getMessage)

    val p1 = IcebergWrite.computeTableStats(spark, dir)
    assert(p1.endsWith(".puffin") && p1.contains("/metadata/table-stats-"))
    val s1 = IcebergIO.tableStats(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(3))).toMap
    assert(s1 === Map("id" -> 3L, "name" -> 2L, "score" -> 2L))

    // DELETED rows leave the NDV (live-row semantics, not raw-file)
    IcebergWrite.deleteWhere(spark, dir, col("id") === 3L)
    val e1 = intercept[IllegalStateException](
      IcebergIO.tableStats(spark, dir).collect()) // stale -> loud
    assert(e1.getMessage.contains("no statistics"), e1.getMessage)
    IcebergWrite.computeTableStats(spark, dir)
    assert(IcebergIO.tableStats(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(3))).toMap
      === Map("id" -> 2L, "name" -> 1L, "score" -> 2L))

    // column subset + unknown/complex-type guards
    IcebergWrite.computeTableStats(spark, dir, columns = Seq("name"))
    assert(IcebergIO.tableStats(spark, dir).collect().length === 1)
    intercept[IllegalArgumentException](
      IcebergWrite.computeTableStats(spark, dir, columns = Seq("nope")))

    // approximate mode writes the same blob layout (HLL estimate of a
    // 2-distinct column is exact)
    IcebergWrite.computeTableStats(spark, dir, approximate = true)
    assert(IcebergIO.tableStats(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(3))).toMap
      === Map("id" -> 2L, "name" -> 1L, "score" -> 2L))

    // SQL surfaces: ANALYZE TABLE + CALL + the live `_statistics` view
    val g = GraftSession.wrap(spark)
    g.registerIceberg("tstats_t", dir, metadataTables = true)
    assert(g.sql("ANALYZE TABLE tstats_t COMPUTE STATISTICS FOR COLUMNS name")
      .collect().head.getString(0).contains("table-stats-"))
    assert(g.sql("SELECT col_name, ndv FROM " +
        "(SELECT column AS col_name, ndv FROM tstats_t_statistics)")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      === Seq(("name", 1L)))
    assert(g.sql("CALL system.compute_table_stats('tstats_t', 'id, score')")
      .collect().head.getString(0).contains("table-stats-"))
    assert(g.sql("SELECT count(*) FROM tstats_t_statistics")
      .collect().head.getLong(0) === 2L)
  }

  test("statistics files survive removeOrphanFiles while registered, sweep after expire") {
    val dir = s"$root/stats_gc"
    IcebergWrite.create(spark, dir, schema)
    IcebergWrite.append(df((1L, "a", 1.0)), dir)
    val t1 = IcebergWrite.computeTableStats(spark, dir)
    val p1 = IcebergWrite.computePartitionStats(spark, dir)
    // registered stats files must NOT be swept (they're metadata the
    // manifest walk never references)
    val removed1 = IcebergWrite.removeOrphanFiles(dir, Long.MaxValue)
    assert(!removed1.exists(r => r.endsWith(".puffin") ||
      r.contains("partition-stats-")), removed1.mkString(", "))
    assert(GraftFs.exists(t1) && GraftFs.exists(p1))
    assert(IcebergIO.tableStats(spark, dir).count() === 3)

    // a new commit + recompute strands the OLD stats entries' snapshot;
    // expire drops the stale entries, making the old files sweepable
    IcebergWrite.append(df((2L, "b", 2.0)), dir)
    IcebergWrite.computeTableStats(spark, dir)
    IcebergWrite.computePartitionStats(spark, dir)
    assert(IcebergWrite.expireSnapshots(dir, Long.MaxValue) === 1)
    // removed paths carry the walk's `file:` scheme — compare suffixes
    val removed2 = IcebergWrite.removeOrphanFiles(dir, Long.MaxValue)
      .map(_.stripPrefix("file:"))
    assert(removed2.contains(t1) && removed2.contains(p1),
      removed2.mkString(", "))
    // the CURRENT snapshot's stats are intact
    assert(IcebergIO.tableStats(spark, dir).count() === 3)
    assert(IcebergIO.partitionStats(spark, dir).count() === 1)
  }

  test("partition statistics: SQL view + CALL + partition evolution") {
    val dir = s"$root/pstats_sql"
    IcebergWrite.create(spark, dir, schema, partitionCols = Seq("name"))
    IcebergWrite.append(df((1L, "a", 1.0), (2L, "b", 2.0)), dir)
    // evolve: un-partition future writes; old files keep their spec
    IcebergWrite.updatePartitionSpec(dir, Nil)
    IcebergWrite.append(df((3L, "c", 3.0)), dir)

    val g = GraftSession.wrap(spark)
    g.registerIceberg("pstats_t", dir, metadataTables = true)
    val got = g.sql("CALL system.compute_partition_stats('pstats_t')")
      .collect()
    assert(got.length === 1 && got.head.getString(0).contains("partition-stats-"))
    // the live view serves rows per (tuple, spec): the evolved append
    // sits under the new spec with an all-null tuple of spec-0's field
    val rows = g.sql(
      "SELECT partition, spec_id, data_record_count FROM pstats_t_partition_stats " +
        "ORDER BY spec_id, partition").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(rows === Seq(("name=a", 0, 1L), ("name=b", 0, 1L),
      ("", 1, 1L)))
  }

  test("spec-type carry: manifests written on ns/geo tables round-trip " +
      "the original type string; required unknown refused both ways") {
    val dir = s"$root/ns_carry"
    val nsSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ts_ns", LongType, nullable = false,
        metadata = new MetadataBuilder()
          .putString("iceberg.type", "timestamp_ns").build())))
    val w = new IcebergFixture.Writer(spark, dir, nsSchema)
    val rows = Seq((1L, 1500000000123456789L), (2L, 1600000000987654321L))
    val file = new java.io.File(s"$dir/data/ns-00001.parquet")
    file.getParentFile.mkdirs()
    IcebergFixture.writeNsParquet(file.getAbsolutePath, "ts_ns", rows)
    w.appendExternalFile(file, 2L)
    // an eq-delete keyed on a NON-ns column is still permitted on an ns
    // table — its delete manifest embeds the table schema via
    // schemaJson; loadMetadata's iceberg.type carry must keep the spec
    // string "timestamp_ns" (not the widened "long") in that embed
    val del = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(Row(1L))),
      StructType(Seq(StructField("id", LongType, nullable = false))))
    graft.sources.IcebergWrite.deleteEquality(del, dir)
    assert(IcebergIO.read(spark, dir).count() === 1L)
    val manifests = new java.io.File(s"$dir/metadata").listFiles()
      .filter(_.getName.startsWith("manifest-"))
    assert(manifests.nonEmpty)
    val schemas = manifests.map { mf =>
      val r = new org.apache.avro.file.DataFileReader(
        mf, new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      try r.getMetaString("schema") finally r.close()
    }
    assert(schemas.forall(_.contains("timestamp_ns")),
      s"manifest schema drifted from metadata.json: ${schemas.toSeq}")
    assert(!schemas.exists(_.contains("\"ts_ns\",\"required\":true," +
      "\"type\":\"long\"")), "widened long leaked into a manifest embed")

    // create() refuses a REQUIRED unknown (v3 spec: unknown is optional)
    val e = intercept[IllegalArgumentException](
      IcebergWrite.create(spark, s"$root/req_unknown", StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("u", NullType, nullable = false))),
        formatVersion = 3))
    assert(e.getMessage.contains("optional"), e.getMessage)

    // a FOREIGN table declaring a required unknown fails loudly at load
    IcebergWrite.create(spark, s"$root/opt_unknown", StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("u", NullType, nullable = true))), formatVersion = 3)
    val metaFile = IcebergIO.loadMetadata(s"$root/opt_unknown").metadataFile
    val badDir = s"$root/req_unknown_foreign"
    GraftFs.mkdirs(s"$badDir/metadata")
    def put(path: String, text: String): Unit = {
      val out = GraftFs.create(path)
      try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val tree = om.readTree(GraftFs.readUtf8(metaFile))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val schemasNode = tree.get("schemas")
    schemasNode.forEach { sn =>
      sn.get("fields").forEach { fn =>
        if (fn.get("name").asText() == "u")
          fn.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
            .put("required", true)
      }
    }
    put(s"$badDir/metadata/v1.metadata.json", om.writeValueAsString(tree))
    put(s"$badDir/metadata/version-hint.text", "1")
    val ef = intercept[IllegalArgumentException](
      IcebergIO.loadMetadata(badDir))
    assert(ef.getMessage.contains("optional"), ef.getMessage)
  }

  test("geo/ns import path: create declares widened types via iceberg.type " +
      "(v3-gated, carrier-typed); addFiles validates physical types") {
    // create() refuses widened types on v2 and wrong carrier types
    val geoSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("geom", BinaryType, nullable = false,
        metadata = new MetadataBuilder()
          .putString("iceberg.type", "geometry(OGC:CRS84)").build())))
    val e2 = intercept[IllegalArgumentException](IcebergWrite.create(
      spark, s"$root/geo_v2", geoSchema, formatVersion = 2,
      fieldIds = false))
    assert(e2.getMessage.contains("format v3"), e2.getMessage)
    val badCarrier = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ts_ns", IntegerType, nullable = false,
        metadata = new MetadataBuilder()
          .putString("iceberg.type", "timestamp_ns").build())))
    val e3 = intercept[IllegalArgumentException](IcebergWrite.create(
      spark, s"$root/ns_badcarrier", badCarrier, formatVersion = 3,
      fieldIds = false))
    assert(e3.getMessage.contains("LongType"), e3.getMessage)

    // a PLAIN parquet file (geom stored as INT64) must be refused by
    // the footer physical-type gate — a name-only check would import it
    // and the read would decode garbage
    val dir = s"$root/geoimp_neg"
    IcebergWrite.create(spark, dir, geoSchema, formatVersion = 3,
      fieldIds = false)
    val src = s"$root/geoimp_neg_src"
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(Row(1L, 2L))),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("geom", LongType, nullable = false))))
      .coalesce(1).write.parquet(src)
    val e4 = intercept[IllegalArgumentException](
      IcebergWrite.addFiles(spark, dir, src))
    assert(e4.getMessage.contains("BYTE_ARRAY"), e4.getMessage)

    // the happy path: annotated WKB imports and round-trips bytes
    val src2 = s"$root/geoimp_ok_src"
    new java.io.File(src2).mkdirs()
    val pts = Seq(1L -> IcebergFixture.wkbPoint(1.0, 2.0),
      2L -> IcebergFixture.wkbPoint(3.0, 4.0))
    IcebergFixture.writeGeoParquet(s"$src2/g.parquet", "geom",
      "OGC:CRS84", pts)
    val dir2 = s"$root/geoimp_ok"
    IcebergWrite.create(spark, dir2, geoSchema, formatVersion = 3,
      fieldIds = false)
    IcebergWrite.addFiles(spark, dir2, src2)
    val got = IcebergIO.read(spark, dir2).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toSeq
    assert(got === pts.map { case (i, b) => (i, b.toSeq) })
    // data-write verbs stay refused on the imported geo table
    val eApp = intercept[IllegalArgumentException](IcebergWrite.append(
      spark.createDataFrame(
        new java.util.ArrayList[Row](
          java.util.Arrays.asList(Row(9L, Array[Byte](1)))),
        StructType(geoSchema.fields.map(f =>
          StructField(f.name, f.dataType, f.nullable)))), dir2))
    assert(eApp.getMessage.contains("read-only"), eApp.getMessage)
  }
}
