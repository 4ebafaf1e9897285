package graft

import java.io.File

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{IcebergFixture, IcebergIO, IcebergWrite}

/** Native read-only Iceberg snapshot scan (reference fork's feature delta:
  * Cargo.toml:43-45, ballista/core/src/serde/mod.rs:92) against
  * spec-conformant fixture tables written by [[IcebergFixture]] — v1 and
  * v2, snapshot selection, time travel, position + equality deletes
  * (incl. the sequence-number re-insert rule), fail-fasts. */
class IcebergSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val root =
    s"/tmp/graft_iceberg_spec_${java.util.UUID.randomUUID().toString.take(8)}"

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

  test("v2 table: append snapshots, current read, snapshot + as-of time travel") {
    val dir = s"$root/v2basic"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    val s1 = w.append(df((1L, "a", 1.5), (2L, "b", 2.5)))
    val s2 = w.append(df((3L, "c", 3.5)))
    assert(IcebergIO.snapshotIds(dir) === Seq(s1, s2))

    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L, 3L))
    assert(ids(IcebergIO.read(spark, dir, snapshotId = Some(s1))) === Seq(1L, 2L))
    // as-of: fixture clock is t0 + 1000*snapshotId
    val meta = IcebergIO.loadMetadata(dir)
    val t1 = meta.snapshots.find(_.snapshotId == s1).get.timestampMs
    assert(ids(IcebergIO.read(spark, dir, asOfTimestampMs = Some(t1))) === Seq(1L, 2L))
    assert(ids(IcebergIO.read(spark, dir, asOfTimestampMs = Some(t1 + 5000))) ===
      Seq(1L, 2L, 3L))
  }

  test("schema and values survive the scan (not just ids)") {
    val dir = s"$root/v2vals"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    w.append(df((7L, "x", 0.25)))
    val out = IcebergIO.read(spark, dir)
    assert(out.schema.fieldNames.toSeq === Seq("id", "name", "score"))
    val r = out.collect().head
    assert((r.getLong(0), r.getString(1), r.getDouble(2)) === ((7L, "x", 0.25)))
  }

  test("v2 position deletes applied via metadata-column anti-join") {
    val dir = s"$root/v2posdel"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    val s1 = w.append(df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    w.append(df((4L, "d", 4.0)))
    // file rows are in insertion order (coalesce(1), no shuffle):
    // positions 0,1,2 = ids 1,2,3 — delete positions 0 and 2.
    val fileA = w.dataFilePaths.head
    val s3 = w.deletePositions(fileA, Seq(0L, 2L))
    assert(ids(IcebergIO.read(spark, dir)) === Seq(2L, 4L))
    // before the delete snapshot, all rows still visible
    assert(ids(IcebergIO.read(spark, dir, snapshotId = Some(s1))) === Seq(1L, 2L, 3L))
    assert(IcebergIO.snapshotIds(dir).last === s3)
  }

  test("v1 table with manifest list reads; v1 inline manifests form reads") {
    val dirA = s"$root/v1list"
    val wA = new IcebergFixture.Writer(spark, dirA, schema, formatVersion = 1)
    wA.append(df((1L, "a", 1.0)))
    wA.append(df((2L, "b", 2.0)))
    assert(ids(IcebergIO.read(spark, dirA)) === Seq(1L, 2L))

    val dirB = s"$root/v1inline"
    val wB = new IcebergFixture.Writer(spark, dirB, schema, formatVersion = 1,
      inlineManifests = true)
    wB.append(df((5L, "e", 5.0)))
    assert(ids(IcebergIO.read(spark, dirB)) === Seq(5L))
  }

  test("version-hint resolution, and fallback to highest vN without hint") {
    val dir = s"$root/hint"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    w.append(df((1L, "a", 1.0)))
    w.append(df((2L, "b", 2.0)))
    def name(p: String): String = new org.apache.hadoop.fs.Path(p).getName
    assert(name(IcebergIO.resolveMetadataFile(dir)) === "v2.metadata.json")
    // drop the hint: the highest vN.metadata.json must still win
    new File(new File(dir, "metadata"), "version-hint.text").delete()
    assert(name(IcebergIO.resolveMetadataFile(dir)) === "v2.metadata.json")
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L))
    // a direct metadata.json path reads THAT version (v1 = first snapshot)
    val v1 = new File(new File(dir, "metadata"), "v1.metadata.json")
    assert(ids(IcebergIO.read(spark, v1.getPath)) === Seq(1L))
  }

  test("unknown snapshot id fails naming the available ids") {
    val dir = s"$root/badsnap"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    w.append(df((1L, "a", 1.0)))
    val e = intercept[IllegalArgumentException](
      IcebergIO.read(spark, dir, snapshotId = Some(999L)))
    assert(e.getMessage.contains("999") && e.getMessage.contains("available"))
  }

  test("equality deletes remove matching earlier rows, by field id") {
    val dir = s"$root/eqdel"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    w.append(df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    import spark.implicits._
    // field id 1 = "id" (fixture assigns ids in field order)
    w.deleteEquality(Seq(1L, 3L).toDF("id"), Seq(1))
    assert(ids(IcebergIO.read(spark, dir)) === Seq(2L))
  }

  test("equality delete sequence rule: re-inserted rows survive; time travel unaffected") {
    val dir = s"$root/eqdelseq"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    val s1 = w.append(df((1L, "a", 1.0), (2L, "b", 2.0)))
    import spark.implicits._
    val s2 = w.deleteEquality(Seq(1L).toDF("id"), Seq(1))
    // re-insert id=1 AFTER the delete: its data sequence number is higher
    // than the delete's, so the spec says it must survive
    w.append(df((1L, "a2", 9.0)))
    val out = IcebergIO.read(spark, dir)
    assert(ids(out) === Seq(1L, 2L))
    assert(out.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq ===
      Seq((1L, "a2"), (2L, "b")))
    // time travel: before the delete both original rows exist; at the
    // delete snapshot id=1 is gone
    assert(ids(IcebergIO.read(spark, dir, snapshotId = Some(s1))) === Seq(1L, 2L))
    assert(ids(IcebergIO.read(spark, dir, snapshotId = Some(s2))) === Seq(2L))
  }

  test("equality-delete plan: equi-join on keys, never a cartesian/nested-loop") {
    val dir = s"$root/eqdelplan"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    w.append(df((1L, "a", 1.0), (2L, "b", 2.0)))
    import spark.implicits._
    w.deleteEquality(Seq(1L).toDF("id"), Seq(1))
    val plan = IcebergIO.read(spark, dir).queryExecution.executedPlan.toString
    // the sequence-number inequality must ride an EQUI anti-join on the
    // key columns, not degrade the join to a nested loop over all pairs
    assert(!plan.contains("CartesianProduct"),
      s"equality-delete join planned as cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"equality-delete join planned as nested loop:\n$plan")
  }

  test("many partition-scoped delete files consolidate into ONE anti-join") {
    val dir = s"$root/eqdelmany"
    val st2 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("grp", StringType, nullable = true)))
    def rows2(xs: (Long, String)*) = spark.createDataFrame(
      new java.util.ArrayList[Row](
        java.util.Arrays.asList(xs.map(x => Row(x._1, x._2)): _*)), st2)
    val w = new IcebergFixture.Writer(spark, dir, st2,
      partitionCols = Seq("grp"))
    val groups = (0 until 20).map(i => f"g$i%02d")
    // ids 1..3 in every partition; delete id=1 in each partition (one
    // scoped delete FILE per partition) + one GLOBAL-shaped delete is not
    // possible on a partitioned fixture, so mix scoped tuples instead
    w.append(rows2(groups.flatMap(g => Seq(1L -> g, 2L -> g, 3L -> g)): _*))
    groups.foreach { g =>
      w.deleteEqualityInPartition(rows2(1L -> g).select("id"),
        fieldIds = Seq(1), partitionVals = Seq(g))
    }
    val df2 = IcebergIO.read(spark, dir)
    // plan must not grow with the number of delete files/partitions: one
    // seq-attach join + one consolidated anti-join, however many tuples
    val joins = df2.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.size <= 2,
      s"expected a constant 2-join plan, got ${joins.size} joins")
    val got = df2.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got === groups.sorted.flatMap(g => Seq(2L -> g, 3L -> g)).sortBy(t => (t._1, t._2)))
  }

  test("multi-column equality delete matches on all named fields") {
    val dir = s"$root/eqdel2col"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    w.append(df((1L, "a", 1.0), (1L, "b", 2.0), (2L, "a", 3.0)))
    import spark.implicits._
    // (id=1 AND name="a") only — field ids 1 and 2
    w.deleteEquality(Seq((1L, "a")).toDF("id", "name"), Seq(1, 2))
    val out = IcebergIO.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(t => (t._1, t._2)).toSeq
    assert(out === Seq((1L, "b"), (2L, "a")))
  }

  test("partitioned table (identity): transparent read + planning-time pruning") {
    val dir = s"$root/parted"
    val w = new IcebergFixture.Writer(spark, dir, schema,
      partitionCols = Seq("name"))
    // one append, three partition tuples -> three data files in one snapshot
    w.append(df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0), (4L, "c", 4.0)))
    assert(w.dataFilePaths.size === 3)

    // unfiltered read sees everything (identity columns live in the files)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L, 3L, 4L))

    // partitionFilter prunes at PLANNING time: only partition a's file is
    // ever part of the scan
    val pruned = IcebergIO.read(spark, dir,
      partitionFilter = Map("name" -> "a"))
    assert(ids(pruned) === Seq(1L, 3L))
    assert(pruned.inputFiles.length === 1,
      s"expected 1 surviving data file, scan reads: ${pruned.inputFiles.mkString(", ")}")

    // filters on non-partition columns are rejected with the known list
    val e = intercept[IllegalArgumentException](
      IcebergIO.read(spark, dir, partitionFilter = Map("score" -> 1.0)))
    assert(e.getMessage.contains("non-partition-source") && e.getMessage.contains("name"))
  }

  test("truncate[W] partition transform: split on the transformed value, pruned scan") {
    val dir = s"$root/trunc"
    val w = new IcebergFixture.Writer(spark, dir, schema,
      partitionCols = Seq("name"),
      partitionTransforms = Map("name" -> "truncate[2]"))
    // prefixes: "aa" (x2), "ab", "zz" -> three data files
    w.append(df((1L, "aard", 1.0), (2L, "aaron", 2.0), (3L, "abel", 3.0), (4L, "zz", 4.0)))
    assert(w.dataFilePaths.size === 3)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L, 3L, 4L))

    // filter by SOURCE value: truncate("aaron",2)="aa" -> only that file
    // survives pruning; the file contains BOTH aa-prefix rows (file
    // pruning, not a row filter — callers still apply the row predicate)
    val pruned = IcebergIO.read(spark, dir, partitionFilter = Map("name" -> "aaron"))
    assert(ids(pruned) === Seq(1L, 2L))
    assert(pruned.inputFiles.length === 1)

    // integer truncate: width-10 bins on id
    val dir2 = s"$root/trunc_int"
    val w2 = new IcebergFixture.Writer(spark, dir2, schema,
      partitionCols = Seq("id"),
      partitionTransforms = Map("id" -> "truncate[10]"))
    w2.append(df((3L, "a", 1.0), (7L, "b", 2.0), (17L, "c", 3.0), (23L, "d", 4.0)))
    assert(w2.dataFilePaths.size === 3) // bins 0, 10, 20
    val p2 = IcebergIO.read(spark, dir2, partitionFilter = Map("id" -> 15L))
    assert(ids(p2) === Seq(17L)) // bin 10 holds only id=17
    assert(p2.inputFiles.length === 1)
  }

  test("bucket transform matches the Iceberg spec's published hash vectors") {
    import graft.sources.IcebergTransforms._
    // spec Appendix B test values — int/long promote identically
    assert(bucketHash(34) === 2017239379)
    assert(bucketHash(34L) === 2017239379)
    assert(bucketHash("iceberg") === 1210000089)
    assert(bucketHash(Array[Byte](0, 1, 2, 3)) === -188683207)
    assert(bucketHash(java.time.LocalDate.of(2017, 11, 16)) === -653330422)
    assert(bucket(16, 34) === (2017239379 & Int.MaxValue) % 16)
    val e = intercept[IllegalArgumentException](bucketHash(1.5))
    assert(e.getMessage.contains("bucket transform not supported"))
  }

  test("bucket[N] partition transform: split on bucket ordinal, pruned scan") {
    import graft.sources.IcebergTransforms
    val dir = s"$root/bucket"
    val w = new IcebergFixture.Writer(spark, dir, schema,
      partitionCols = Seq("name"),
      partitionTransforms = Map("name" -> "bucket[4]"))
    val names = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    w.append(df(names.zipWithIndex.map {
      case (n, i) => ((i + 1).toLong, n, i.toDouble) }: _*))
    // one data file per distinct bucket ordinal present
    val buckets = names.map(IcebergTransforms.bucket(4, _))
    assert(w.dataFilePaths.size === buckets.distinct.size)
    assert(ids(IcebergIO.read(spark, dir)) === (1L to 5L))

    // filter by SOURCE value: only alpha's bucket survives pruning; the
    // file holds every name sharing that bucket (file pruning, not a row
    // filter)
    val target = IcebergTransforms.bucket(4, "alpha")
    val expected = names.zipWithIndex.collect {
      case (n, i) if IcebergTransforms.bucket(4, n) == target => (i + 1).toLong }
    val pruned = IcebergIO.read(spark, dir, partitionFilter = Map("name" -> "alpha"))
    assert(ids(pruned) === expected.sorted)
    assert(pruned.inputFiles.length === 1,
      s"expected 1 surviving data file, scan reads: ${pruned.inputFiles.mkString(", ")}")

    // long-source bucket: ids 1..5 into 3 buckets
    val dir2 = s"$root/bucket_long"
    val w2 = new IcebergFixture.Writer(spark, dir2, schema,
      partitionCols = Seq("id"),
      partitionTransforms = Map("id" -> "bucket[3]"))
    w2.append(df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)))
    val t2 = IcebergTransforms.bucket(3, 2L)
    val exp2 = Seq(1L, 2L, 3L).filter(IcebergTransforms.bucket(3, _) == t2)
    val p2 = IcebergIO.read(spark, dir2, partitionFilter = Map("id" -> 2L))
    assert(ids(p2) === exp2.sorted)
  }

  test("void partition transform (v1 dropped-field form): reads, filter matches all") {
    val dir = s"$root/voidpart"
    val w = new IcebergFixture.Writer(spark, dir, schema,
      partitionCols = Seq("name"),
      partitionTransforms = Map("name" -> "void"))
    w.append(df((1L, "a", 1.0), (2L, "b", 2.0)))
    w.append(df((3L, "c", 3.0)))
    // every tuple is null -> one file per append, transparent read
    assert(w.dataFilePaths.size === 2)
    assert(ids(IcebergIO.read(spark, dir)) === Seq(1L, 2L, 3L))
    // a filter on the voided source column matches every file ("no
    // pruning possible", not an error — evolved tables hit this)
    val p = IcebergIO.read(spark, dir, partitionFilter = Map("name" -> "a"))
    assert(ids(p) === Seq(1L, 2L, 3L))
    assert(p.inputFiles.length === 2)
  }

  test("time partition transforms: spec ordinals + month-pruned scan") {
    import graft.sources.IcebergTransforms._
    // spec ordinal examples for 2017-11-16 (/ 22:31:08 UTC)
    val d = java.time.LocalDate.of(2017, 11, 16)
    assert(yearOrdinal(d) === 47)
    assert(monthOrdinal(d) === 574)
    assert(dayOrdinal(d) === 17486)
    assert(hourOrdinal(java.time.LocalDateTime.of(2017, 11, 16, 22, 31, 8)) === 419686)
    assert(hourOrdinal(java.time.Instant.parse("2017-11-16T22:31:08Z")) === 419686)

    val dschema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("d", DateType, nullable = false)))
    val dir = s"$root/time_month"
    val w = new IcebergFixture.Writer(spark, dir, dschema,
      partitionCols = Seq("d"), partitionTransforms = Map("d" -> "month"))
    val list = new java.util.ArrayList[Row]()
    Seq(1L -> "1995-03-05", 2L -> "1995-03-20", 3L -> "1995-04-02",
      4L -> "1996-03-05").foreach { case (i, s) =>
      list.add(Row(i, java.sql.Date.valueOf(s))) }
    w.append(spark.createDataFrame(list, dschema))
    assert(w.dataFilePaths.size === 3) // months 1995-03, 1995-04, 1996-03

    // any date inside 1995-03 prunes to that month's single file
    val pruned = IcebergIO.read(spark, dir,
      partitionFilter = Map("d" -> java.sql.Date.valueOf("1995-03-15")))
    assert(ids(pruned) === Seq(1L, 2L))
    assert(pruned.inputFiles.length === 1,
      s"expected 1 surviving data file, scan reads: ${pruned.inputFiles.mkString(", ")}")
  }

  test("single-value bound serialization round-trips per the spec's binary form") {
    import graft.sources.IcebergTransforms._
    // little-endian per spec Appendix D
    assert(serializeBound(34).toSeq === Seq[Byte](34, 0, 0, 0))
    assert(serializeBound(-1).toSeq === Seq[Byte](-1, -1, -1, -1))
    assert(serializeBound(34L).toSeq === Seq[Byte](34, 0, 0, 0, 0, 0, 0, 0))
    assert(serializeBound("ab").toSeq === "ab".getBytes("UTF-8").toSeq)
    assert(deserializeBound("int", serializeBound(-12345)) === -12345)
    assert(deserializeBound("long", serializeBound(Long.MinValue)) === Long.MinValue)
    assert(deserializeBound("double", serializeBound(2.5d)) === 2.5d)
    assert(deserializeBound("string", serializeBound("iceberg")) === "iceberg")
    assert(deserializeBound("int",
      serializeBound(java.time.LocalDate.of(2017, 11, 16))) === 17486)
  }

  test("bound serialization and bucket transform hold across a randomized domain") {
    import graft.sources.IcebergTransforms._
    val rnd = new scala.util.Random(42) // fixed seed — deterministic sweep
    (1 to 500).foreach { _ =>
      val i = rnd.nextInt()
      assert(deserializeBound("int", serializeBound(i)) === i)
      val l = rnd.nextLong()
      assert(deserializeBound("long", serializeBound(l)) === l)
      val d = (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(20) - 10)
      assert(deserializeBound("double", serializeBound(d)) === d)
      val s = rnd.alphanumeric.take(rnd.nextInt(20)).mkString
      assert(deserializeBound("string", serializeBound(s)) === s)
    }
    (1 to 500).foreach { _ =>
      val v = rnd.nextInt()
      val n = 1 + rnd.nextInt(1000)
      val b = bucket(n, v)
      assert(b >= 0 && b < n)
      // the spec's type-promotion guarantee: bucket(int) == bucket(long)
      assert(b === bucket(n, v.toLong))
    }
  }

  test("statsFilter prunes files by manifest column bounds") {
    val dir = s"$root/stats"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    // two files with disjoint id ranges and distinct name ranges
    w.append(df((1L, "apple", 1.0), (5L, "cherry", 2.0)))
    w.append(df((10L, "melon", 3.0), (20L, "zebra", 4.0)))

    // long bounds: only the second file can hold id >= 10
    val p1 = IcebergIO.read(spark, dir, statsFilter = Seq(("id", ">=", 10L)))
    assert(ids(p1) === Seq(10L, 20L))
    assert(p1.inputFiles.length === 1, p1.inputFiles.mkString(", "))
    // equality inside the first file's range keeps only that file
    val p2 = IcebergIO.read(spark, dir, statsFilter = Seq(("id", "=", 5)))
    assert(ids(p2) === Seq(1L, 5L))
    assert(p2.inputFiles.length === 1)
    // string bounds prune lexicographically
    val p3 = IcebergIO.read(spark, dir, statsFilter = Seq(("name", "<", "d")))
    assert(ids(p3) === Seq(1L, 5L))
    assert(p3.inputFiles.length === 1)
    // a predicate no file can satisfy scans nothing and returns empty
    val p4 = IcebergIO.read(spark, dir, statsFilter = Seq(("id", ">", 100)))
    assert(p4.count() === 0L)
    // conjunction across columns composes
    val p5 = IcebergIO.read(spark, dir,
      statsFilter = Seq(("id", "<=", 20L), ("name", ">=", "m")))
    assert(p5.inputFiles.length === 1)
    // unknown column / bad op fail loudly
    val e1 = intercept[IllegalArgumentException](
      IcebergIO.read(spark, dir, statsFilter = Seq(("nope", "=", 1))).count())
    assert(e1.getMessage.contains("unknown column"))
    val e2 = intercept[IllegalArgumentException](
      IcebergIO.read(spark, dir, statsFilter = Seq(("id", "!=", 1))).count())
    assert(e2.getMessage.contains("op must be"))
  }

  test("startsWith / LIKE-prefix predicates derive range pruning") {
    import org.apache.spark.sql.functions.{col, not}
    val dir = s"$root/prefix"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    // three files with disjoint name ranges
    w.append(df((1L, "apple", 1.0), (2L, "apricot", 2.0)))
    w.append(df((3L, "banana", 3.0), (4L, "blueberry", 4.0)))
    w.append(df((5L, "melon", 5.0), (6L, "zebra", 6.0)))
    // s startsWith 'ap' ⟺ 'ap' <= s < 'aq' — only file 1's bounds
    // intersect that range
    val q = IcebergIO.readWhere(spark, dir, col("name").startsWith("ap"))
    assert(ids(q) === Seq(1L, 2L))
    assert(q.inputFiles.length === 1,
      s"prefix pruning should scan 1 file: ${q.inputFiles.mkString(", ")}")
    // a prefix crossing file boundaries keeps both candidates, exact rows
    val q2 = IcebergIO.readWhere(spark, dir, col("name").startsWith("b"))
    assert(ids(q2) === Seq(3L, 4L))
    assert(q2.inputFiles.length === 1)
    // negation derives the complement range (OR of the flipped leaves):
    // still exact, and the all-'ap' file could be skipped only by a
    // constant-file check — soundness is what matters here
    val qn = IcebergIO.readWhere(spark, dir, not(col("name").startsWith("b")))
    assert(ids(qn) === Seq(1L, 2L, 5L, 6L))
    // non-ASCII prefixes stay underived (sound skip): rows still exact
    val qu = IcebergIO.readWhere(spark, dir, col("name").startsWith("é"))
    assert(qu.count() === 0L)
    // SQL surface: LIKE 'ap%' reaches the scan rule as StartsWith and
    // prunes the same file set
    val g = GraftSession.wrap(spark)
    g.registerIceberg("prefix_sql", dir)
    val sq = g.sql("SELECT id FROM prefix_sql WHERE name LIKE 'ap%' ORDER BY id")
    assert(sq.collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
    val scanned = org.apache.spark.sql.GraftShim.optimizedPlan(sq).collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.inputFiles.toSeq
          case _ => Seq.empty[String]
        }
    }.flatten
    assert(scanned.size === 1,
      s"SQL LIKE-prefix should scan 1 file: $scanned")
  }

  test("schema-evolved table: files predating a column read it as null") {
    val dir = s"$root/evolved"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    // file written "before score existed": only (id, name)
    val old = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, "old")),
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("name", StringType, nullable = true))))
    w.appendRaw(old)
    w.append(df((2L, "new", 2.5)))
    val out = IcebergIO.read(spark, dir).collect().sortBy(_.getLong(0))
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(out(0).isNullAt(2), "pre-evolution row must surface score as null")
    assert(out(1).getDouble(2) === 2.5)
  }

  test("registerIceberg exposes a snapshot to SQL by name") {
    val dir = s"$root/reg"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    val s1 = w.append(df((1L, "a", 1.0), (2L, "b", 2.0)))
    w.append(df((3L, "c", 3.0)))
    val g = GraftSession.wrap(spark)
    g.registerIceberg("ice_t", dir)
    assert(spark.sql("SELECT count(*) FROM ice_t").head.getLong(0) === 3L)
    g.registerIceberg("ice_t1", dir, snapshotId = Some(s1))
    assert(spark.sql("SELECT max(id) FROM ice_t1").head.getLong(0) === 2L)

    // metadataTables = true surfaces the metadata relations to SQL
    g.registerIceberg("ice_m", dir, metadataTables = true)
    assert(spark.sql("SELECT count(*) FROM ice_m_history").head.getLong(0) === 2L)
    assert(spark.sql("SELECT count(*) FROM ice_m_files").head.getLong(0) === 2L)
    // content-filtered slices: all live files are data files here
    assert(spark.sql("SELECT count(*) FROM ice_m_data_files").head.getLong(0) === 2L)
    assert(spark.sql("SELECT count(*) FROM ice_m_delete_files").head.getLong(0) === 0L)
    assert(spark.sql(
      "SELECT record_count FROM ice_m_partitions").head.getLong(0) === 3L)
    assert(spark.sql("SELECT count(*) FROM ice_m_manifests").head.getLong(0) === 2L)
    assert(spark.sql(
      "SELECT snapshot_id FROM ice_m_refs WHERE ref_name = 'main'")
      .head.getLong(0) === 2L)
    // LIVE metadata views: a commit after registration is visible in
    // the data view AND every metadata view without re-registering
    w.append(df((4L, "d", 4.0)))
    assert(spark.sql("SELECT count(*) FROM ice_t").head.getLong(0) === 4L)
    assert(spark.sql("SELECT count(*) FROM ice_m_history").head.getLong(0) === 3L)
    assert(spark.sql("SELECT count(*) FROM ice_m_files").head.getLong(0) === 3L)
    assert(spark.sql("SELECT count(*) FROM ice_m_snapshots").head.getLong(0) === 3L)
    // ...while the snapshot-pinned registration stays pinned
    assert(spark.sql("SELECT max(id) FROM ice_t1").head.getLong(0) === 2L)
    Seq("ice_t", "ice_t1", "ice_m", "ice_m_history", "ice_m_files",
      "ice_m_data_files", "ice_m_delete_files",
      "ice_m_partitions", "ice_m_manifests", "ice_m_snapshots", "ice_m_refs")
      .foreach(spark.catalog.dropTempView(_))
  }

  test("history relation: commit order, deterministic clock, operations") {
    val dir = s"$root/hist"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    w.append(df((1L, "a", 1.0)))
    w.deletePositions(w.dataFilePaths.head, Seq(0L))
    val h = IcebergIO.history(spark, dir).collect()
    assert(h.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(h.map(_.getString(3)).toSeq === Seq("append", "delete"))
    // fixture clock: 2024-01-01T00:00:00Z + 1 s per snapshot
    assert(h.map(_.getLong(2)).toSeq === Seq(1704067201000L, 1704067202000L))
  }

  test("files relation: live content files with counts, partitions, deletes") {
    val dir = s"$root/filesrel"
    val w = new IcebergFixture.Writer(spark, dir, schema,
      partitionCols = Seq("name"))
    w.append(df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0)))
    val out = IcebergIO.files(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(3), r.getString(5)))
    // one data file per partition tuple, hive-style partition string
    assert(out.toSeq === Seq(
      ("data-00001-p000.parquet", 0, 2L, "name=a"),
      ("data-00001-p001.parquet", 0, 1L, "name=b")))

    // delete files appear with their content kind; snapshot selection works
    val dir2 = s"$root/filesrel2"
    val w2 = new IcebergFixture.Writer(spark, dir2, schema)
    w2.append(df((1L, "a", 1.0), (2L, "b", 2.0)))
    w2.deletePositions(w2.dataFilePaths.head, Seq(0L))
    val all2 = IcebergIO.files(spark, dir2).collect()
    assert(all2.map(_.getInt(1)).toSeq === Seq(0, 1))
    assert(IcebergIO.files(spark, dir2, snapshotId = Some(1L))
      .collect().map(_.getInt(1)).toSeq === Seq(0))
  }

  test("is null / is not null stats pruning via null_value_counts") {
    val dir = s"$root/nullstats"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    w.append(df((1L, "a", 1.0), (2L, "b", 2.0))) // no nulls anywhere
    val list = new java.util.ArrayList[Row]()
    list.add(Row(3L, null, 3.0)) // name entirely null in this file
    w.append(spark.createDataFrame(list, schema))

    // IS NULL prunes to the file that records null rows for the column
    val pNull = IcebergIO.read(spark, dir,
      statsFilter = Seq(("name", "is null", null)))
    assert(ids(pNull) === Seq(3L))
    assert(pNull.inputFiles.length === 1)
    // IS NOT NULL prunes the all-null file (nulls == record count)
    val pNotNull = IcebergIO.read(spark, dir,
      statsFilter = Seq(("name", "is not null", null)))
    assert(ids(pNotNull) === Seq(1L, 2L))
    assert(pNotNull.inputFiles.length === 1)
    // a never-null column: IS NULL excludes every file, scans nothing
    assert(IcebergIO.read(spark, dir,
      statsFilter = Seq(("id", "is null", null))).count() === 0L)
  }

  test("readWhere derives pruning from a Spark predicate and filters exactly") {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = s"$root/where"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    w.append(df((1L, "apple", 1.0), (5L, "cherry", 2.0)))
    w.append(df((10L, "melon", 3.0), (20L, "zebra", 4.0)))
    // stats pruning from the conjunct + the exact row filter on top
    val q = IcebergIO.readWhere(spark, dir, col("id") >= 15L)
    assert(ids(q) === Seq(20L)) // exact rows, not the whole surviving file
    assert(q.inputFiles.length === 1)
    // literal-first orientation flips the operator
    val q2 = IcebergIO.readWhere(spark, dir, lit(5L) >= col("id"))
    assert(ids(q2) === Seq(1L, 5L))
    assert(q2.inputFiles.length === 1)
    // OR conditions contribute no pruning but results stay exact
    val q3 = IcebergIO.readWhere(spark, dir,
      col("id") === 1L || col("id") === 20L)
    assert(ids(q3) === Seq(1L, 20L))
    assert(q3.inputFiles.length === 2)
    // IS NULL conjunct rides the null-count stats
    assert(IcebergIO.readWhere(spark, dir, col("name").isNull).count() === 0L)
    // IN-list: values spanning both files keep both; values inside one
    // file's range prune to it; values outside every range scan nothing
    val qIn = IcebergIO.readWhere(spark, dir, col("id").isin(1L, 20L))
    assert(ids(qIn) === Seq(1L, 20L) && qIn.inputFiles.length === 2)
    val qIn2 = IcebergIO.readWhere(spark, dir, col("id").isin(2L, 3L))
    assert(qIn2.count() === 0L && qIn2.inputFiles.length === 1)
    assert(IcebergIO.readWhere(spark, dir, col("id").isin(100L, 200L))
      .count() === 0L)
    // explicit statsFilter form of IN
    val qIn3 = IcebergIO.read(spark, dir,
      statsFilter = Seq(("id", "in", Seq(5L, 6L))))
    assert(qIn3.inputFiles.length === 1)

    // OR prunes when EVERY branch excludes a file: add a third file so
    // the middle one is excluded by both branches
    val dir3 = s"$root/where_or"
    val w3 = new IcebergFixture.Writer(spark, dir3, schema)
    w3.append(df((1L, "a", 1.0), (5L, "b", 2.0)))
    w3.append(df((10L, "c", 3.0), (20L, "d", 4.0)))
    w3.append(df((30L, "e", 5.0), (40L, "f", 6.0)))
    val qOr = IcebergIO.readWhere(spark, dir3,
      col("id") <= 5L || col("id") >= 30L)
    assert(ids(qOr) === Seq(1L, 5L, 30L, 40L))
    assert(qOr.inputFiles.length === 2,
      s"middle file must be OR-pruned: ${qOr.inputFiles.mkString(", ")}")
    // an unsupported OR branch keeps every file (conservative)
    val qOr2 = IcebergIO.readWhere(spark, dir3,
      col("id") <= 5L || (col("score") * 2 > 100.0))
    assert(ids(qOr2) === Seq(1L, 5L))
    assert(qOr2.inputFiles.length === 3)
    // NOT pushdown: a constant-valued file is pruned by =!= / not-in
    val dirN = s"$root/where_not"
    val wN = new IcebergFixture.Writer(spark, dirN, schema)
    wN.append(df((5L, "a", 1.0), (5L, "b", 2.0))) // constant id = 5
    wN.append(df((7L, "c", 3.0), (9L, "d", 4.0)))
    val qNe = IcebergIO.readWhere(spark, dirN, col("id") =!= 5L)
    assert(ids(qNe) === Seq(7L, 9L))
    assert(qNe.inputFiles.length === 1,
      s"constant-5 file must be pruned by =!=: ${qNe.inputFiles.mkString(", ")}")
    val qNin = IcebergIO.readWhere(spark, dirN,
      org.apache.spark.sql.functions.not(col("id").isin(5L, 6L)))
    assert(ids(qNin) === Seq(7L, 9L))
    assert(qNin.inputFiles.length === 1)
    // De Morgan: NOT(id >= 7 AND id <= 9) == id < 7 OR id > 9
    val qDm = IcebergIO.readWhere(spark, dirN,
      !(col("id") >= 7L && col("id") <= 9L))
    assert(ids(qDm) === Seq(5L, 5L))
    assert(qDm.inputFiles.length === 1)
    // negated null check rides the null counts
    assert(IcebergIO.readWhere(spark, dirN, !col("name").isNull)
      .count() === 4L)

    // a partition equality under OR must NOT partition-prune
    val dirOp = s"$root/where_or_part"
    val wOp = new IcebergFixture.Writer(spark, dirOp, schema,
      partitionCols = Seq("name"))
    wOp.append(df((1L, "a", 1.0), (2L, "b", 2.0)))
    val qOp = IcebergIO.readWhere(spark, dirOp,
      col("name") === "a" || col("id") === 2L)
    assert(ids(qOp) === Seq(1L, 2L))
    assert(qOp.inputFiles.length === 2)

    // partition-source equality prunes through the partition tuple
    val dir2 = s"$root/where_part"
    val w2 = new IcebergFixture.Writer(spark, dir2, schema,
      partitionCols = Seq("name"))
    w2.append(df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0)))
    val q4 = IcebergIO.readWhere(spark, dir2,
      col("name") === "a" && col("score") > 1.0)
    assert(ids(q4) === Seq(3L))
    assert(q4.inputFiles.length === 1)
  }

  test("stats pruning stays conservative on schema-evolved files") {
    import org.apache.spark.sql.functions.col
    val dir = s"$root/evostats"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    // a file written before `score` existed: no bounds for that column
    val old = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, "old")),
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("name", StringType, nullable = true))))
    w.appendRaw(old)
    w.append(df((2L, "new", 9.5)))

    // file pruning alone must KEEP the boundless old file
    val q = IcebergIO.read(spark, dir, statsFilter = Seq(("score", ">=", 5.0)))
    assert(ids(q) === Seq(1L, 2L))
    // readWhere's exact row filter then drops the null-score old rows
    val q2 = IcebergIO.readWhere(spark, dir, col("score") >= 5.0)
    assert(ids(q2) === Seq(2L))
    // bounds exclude the new file; the old file survives (conservative)
    // but contributes nothing after the exact filter
    val q3 = IcebergIO.readWhere(spark, dir, col("score") < 1.0)
    assert(q3.count() === 0L)
    assert(q3.inputFiles.length === 1,
      s"only the boundless old file should scan: ${q3.inputFiles.mkString(", ")}")
  }

  test("decimal bounds: spec serde round-trips and prunes") {
    import graft.sources.IcebergTransforms._
    // 12.34 -> unscaled 1234 -> big-endian minimal two's complement
    assert(serializeBound(new java.math.BigDecimal("12.34")).toSeq ===
      Seq[Byte](0x04, 0xD2.toByte))
    assert(deserializeDecimal(
      serializeBound(new java.math.BigDecimal("12.34")), 2) ===
      new java.math.BigDecimal("12.34"))
    assert(deserializeDecimal(
      serializeBound(new java.math.BigDecimal("-0.07")), 2) ===
      new java.math.BigDecimal("-0.07"))

    import org.apache.spark.sql.functions.col
    val dschema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("price", DecimalType(10, 2), nullable = false)))
    def drow(id: Long, p: String) = Row(id, new java.math.BigDecimal(p))
    val dir = s"$root/decstats"
    val w = new IcebergFixture.Writer(spark, dir, dschema)
    w.append(spark.createDataFrame(
      java.util.Arrays.asList(drow(1, "1.50"), drow(2, "4.25")), dschema))
    w.append(spark.createDataFrame(
      java.util.Arrays.asList(drow(3, "10.00"), drow(4, "99.99")), dschema))
    // explicit statsFilter with a BigDecimal value
    val p1 = IcebergIO.read(spark, dir,
      statsFilter = Seq(("price", ">=", new java.math.BigDecimal("5"))))
    assert(ids(p1) === Seq(3L, 4L))
    assert(p1.inputFiles.length === 1)
    // derived via readWhere (DSL decimal literal)
    val p2 = IcebergIO.readWhere(spark, dir,
      col("price") < new java.math.BigDecimal("2.00"))
    assert(ids(p2) === Seq(1L))
    assert(p2.inputFiles.length === 1)
  }

  test("randomized pruning soundness: pruned + exact filter == full filter") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(7) // fixed seed — deterministic
    val dir = s"$root/fuzz"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    (1 to 4).foreach { _ =>
      val rows = (1 to 8).map(_ => (rnd.nextInt(100).toLong,
        rnd.alphanumeric.take(1).mkString, rnd.nextInt(100) / 10.0))
      w.append(df(rows: _*))
    }
    val full = IcebergIO.read(spark, dir)
    val ops = Seq("=", "<", "<=", ">", ">=")
    (1 to 20).foreach { i =>
      val c = Seq("id", "name", "score")(rnd.nextInt(3))
      val op = ops(rnd.nextInt(ops.size))
      val v: Any = c match {
        case "id"    => rnd.nextInt(100).toLong
        case "name"  => rnd.alphanumeric.take(1).mkString
        case "score" => rnd.nextInt(100) / 10.0
      }
      val cond = op match {
        case "="  => col(c) === v
        case "<"  => col(c) < v
        case "<=" => col(c) <= v
        case ">"  => col(c) > v
        case ">=" => col(c) >= v
      }
      // soundness: file pruning must never drop a matching row — the
      // pruned scan after the exact predicate equals the unpruned one
      val pruned = IcebergIO.read(spark, dir, statsFilter = Seq((c, op, v)))
      val a = pruned.filter(cond).collect().map(_.toSeq.toString).sorted.toSeq
      val b = full.filter(cond).collect().map(_.toSeq.toString).sorted.toSeq
      assert(a === b, s"iteration $i: pruning dropped rows for $c $op $v")
    }
  }

  test("randomized readWhere soundness: derived tree pruning never drops rows") {
    import org.apache.spark.sql.functions.{col, lit, not}
    import org.apache.spark.sql.Column
    val rnd = new scala.util.Random(13) // fixed seed — deterministic
    val dir = s"$root/fuzz2"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    (1 to 3).foreach { _ =>
      val rows = (1 to 6).map(_ => (rnd.nextInt(60).toLong,
        rnd.alphanumeric.take(1).mkString, rnd.nextInt(60) / 10.0))
      w.append(df(rows: _*))
    }
    val full = IcebergIO.read(spark, dir)
    def leafPred(): Column = {
      val c = Seq("id", "name", "score")(rnd.nextInt(3))
      def v(): Any = c match {
        case "id"    => rnd.nextInt(60).toLong
        case "name"  => rnd.alphanumeric.take(1).mkString
        case "score" => rnd.nextInt(60) / 10.0
      }
      def castTgt = c match {
        case "id" => "bigint"; case "name" => "string"; case "score" => "double"
      }
      rnd.nextInt(9) match {
        case 0 => col(c) === lit(v())
        case 1 => col(c) < lit(v())
        case 2 => col(c) <= lit(v())
        case 3 => col(c) > lit(v())
        case 4 => col(c) >= lit(v())
        case 5 => col(c).isNull
        case 6 => col(c).isin(v(), v())
        // cast-wrapped literals: the foldCastLiteral path must derive the
        // same pruning as the raw-literal forms (and stay sound)
        case 7 => col(c) === lit(v().toString).cast(castTgt)
        case 8 => col(c) >= lit(v().toString).cast(castTgt)
      }
    }
    def prefixPred(): Column = {
      // prefix leaves on the string column (1-2 alphanumeric chars —
      // ASCII, so the range derivation engages)
      val p = rnd.alphanumeric.take(1 + rnd.nextInt(2)).mkString
      col("name").startsWith(p)
    }
    def randPred(depth: Int): Column =
      if (depth == 0 || rnd.nextInt(3) == 0) {
        if (rnd.nextInt(5) == 0) prefixPred() else leafPred()
      } else rnd.nextInt(3) match {
        case 0 => randPred(depth - 1) && randPred(depth - 1)
        case 1 => randPred(depth - 1) || randPred(depth - 1)
        case 2 => not(randPred(depth - 1))
      }
    (1 to 25).foreach { i =>
      val p = randPred(2)
      val a = IcebergIO.readWhere(spark, dir, p)
        .collect().map(_.toSeq.toString).sorted.toSeq
      val b = full.filter(p).collect().map(_.toSeq.toString).sorted.toSeq
      assert(a === b, s"iteration $i: derived pruning broke predicate $p")
    }
  }

  test("refs: tags and the main branch resolve to snapshots by name") {
    val dir = s"$root/refs"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    w.append(df((1L, "a", 1.0)))
    w.tag("v1")
    w.append(df((2L, "b", 2.0)))
    // tag pins the first snapshot; main tracks the head
    assert(ids(IcebergIO.read(spark, dir, ref = Some("v1"))) === Seq(1L))
    assert(ids(IcebergIO.read(spark, dir, ref = Some("main"))) === Seq(1L, 2L))
    val e = intercept[IllegalArgumentException](
      IcebergIO.read(spark, dir, ref = Some("nope")))
    assert(e.getMessage.contains("available refs") &&
      e.getMessage.contains("main") && e.getMessage.contains("v1"))
    // ref is mutually exclusive with the other time-travel selectors
    intercept[IllegalArgumentException](
      IcebergIO.read(spark, dir, snapshotId = Some(1L), ref = Some("v1")))
  }

  test("partitions relation: per-partition file and record aggregates") {
    val dir = s"$root/partsrel"
    val w = new IcebergFixture.Writer(spark, dir, schema,
      partitionCols = Seq("name"))
    w.append(df((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0)))
    w.append(df((4L, "a", 4.0)))
    val out = IcebergIO.partitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("name=a", 2L, 3L), ("name=b", 1L, 1L)))
  }

  test("manifests relation: one row per manifest, delete manifests flagged") {
    val dir = s"$root/manifestsrel"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    w.append(df((1L, "a", 1.0), (2L, "b", 2.0)))
    w.deletePositions(w.dataFilePaths.head, Seq(0L))
    val out = IcebergIO.manifests(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(4)))
    assert(out.toSeq === Seq(
      ("manifest-00001.avro", 0, 1L, 1L),
      ("manifest-00002.avro", 1, 2L, 1L)))
    // v1 inline form: no list-level metadata, content 0 / seq 0
    val dir2 = s"$root/manifestsrel_v1"
    val w2 = new IcebergFixture.Writer(spark, dir2, schema,
      formatVersion = 1, inlineManifests = true)
    w2.append(df((1L, "a", 1.0)))
    val v1 = IcebergIO.manifests(spark, dir2).collect()
    assert(v1.length === 1 && v1.head.getInt(1) === 0 && v1.head.getLong(2) === 0L)
  }

  test("non-iceberg directory fails fast") {
    val e = intercept[IllegalArgumentException](
      IcebergIO.read(spark, s"$root/definitely_missing"))
    assert(e.getMessage.contains("metadata"))
  }

  test("iceberg type mapping covers the spec primitives") {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def t(s: String): DataType =
      IcebergIO.toSparkType(om.readTree("\"" + s + "\""))._1
    assert(t("int") === IntegerType)
    assert(t("long") === LongType)
    assert(t("string") === StringType)
    assert(t("double") === DoubleType)
    assert(t("float") === FloatType)
    assert(t("boolean") === BooleanType)
    assert(t("date") === DateType)
    assert(t("timestamp") === TimestampNTZType)
    assert(t("timestamptz") === TimestampType)
    assert(t("binary") === BinaryType)
    assert(t("uuid") === StringType)
    assert(t("decimal(12, 2)") === DecimalType(12, 2))
    val nested = om.readTree(
      """{"type":"struct","fields":[
        |{"id":1,"name":"a","required":true,"type":"long"},
        |{"id":2,"name":"b","required":false,"type":"string"}]}""".stripMargin)
    val st = IcebergIO.toSparkType(nested)._1.asInstanceOf[StructType]
    assert(st("a").nullable === false && st("b").nullable === true)
  }

  test("date-identity partitions: literal normalizes to the stored epoch day") {
    import org.apache.spark.sql.functions.col
    val dschema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("d", DateType, nullable = false)))
    def drow(id: Long, s: String) = Row(id, java.sql.Date.valueOf(s))
    val dir = s"$root/dateident"
    val w = new IcebergFixture.Writer(spark, dir, dschema,
      partitionCols = Seq("d"))
    w.append(spark.createDataFrame(java.util.Arrays.asList(
      drow(1, "2024-03-15"), drow(2, "2024-03-15"), drow(3, "2024-07-01")),
      dschema))
    assert(w.dataFilePaths.size === 2)

    // manifests store the epoch-day INT; the filter's java.sql.Date must
    // normalize to it — not String-compare the object (which silently
    // pruned EVERY file and returned wrong empty results)
    val p = IcebergIO.read(spark, dir,
      partitionFilter = Map("d" -> java.sql.Date.valueOf("2024-03-15")))
    assert(ids(p) === Seq(1L, 2L))
    assert(p.inputFiles.length === 1)

    // derived path: a date equality in the predicate prunes too
    val q = IcebergIO.readWhere(spark, dir,
      col("d") === java.sql.Date.valueOf("2024-03-15"))
    assert(ids(q) === Seq(1L, 2L))
    assert(q.inputFiles.length === 1,
      s"derived date pruning should scan 1 file: ${q.inputFiles.mkString(", ")}")
    // and a non-matching date matches nothing without failing
    assert(IcebergIO.readWhere(spark, dir,
      col("d") === java.sql.Date.valueOf("1999-01-01")).count() === 0L)
  }

  test("timestamp-identity partitions: literal normalizes to stored micros") {
    import org.apache.spark.sql.functions.col
    val tschema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ts", TimestampNTZType, nullable = false)))
    def trow(id: Long, s: String) = Row(id, java.time.LocalDateTime.parse(s))
    val dir = s"$root/tsident"
    val w = new IcebergFixture.Writer(spark, dir, tschema,
      partitionCols = Seq("ts"))
    w.append(spark.createDataFrame(java.util.Arrays.asList(
      trow(1, "2024-01-01T00:00:00"), trow(2, "2024-01-01T00:00:00"),
      trow(3, "2024-06-30T12:30:00")), tschema))
    assert(w.dataFilePaths.size === 2)
    val p = IcebergIO.read(spark, dir, partitionFilter =
      Map("ts" -> java.time.LocalDateTime.parse("2024-01-01T00:00:00")))
    assert(ids(p) === Seq(1L, 2L))
    assert(p.inputFiles.length === 1)
    val q = IcebergIO.readWhere(spark, dir,
      col("ts") === java.time.LocalDateTime.parse("2024-01-01T00:00:00"))
    assert(ids(q) === Seq(1L, 2L))
    assert(q.inputFiles.length === 1)
  }

  test("readWhere derives time-transform partition pruning from date literals") {
    import org.apache.spark.sql.functions.col
    val dschema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("d", DateType, nullable = false)))
    def drow(id: Long, s: String) = Row(id, java.sql.Date.valueOf(s))
    val dir = s"$root/timederived"
    val w = new IcebergFixture.Writer(spark, dir, dschema,
      partitionCols = Seq("d"), partitionTransforms = Map("d" -> "month"))
    w.append(spark.createDataFrame(java.util.Arrays.asList(
      drow(1, "1995-03-05"), drow(2, "1995-03-20"), drow(3, "1995-04-02"),
      drow(4, "1996-03-05")), dschema))
    assert(w.dataFilePaths.size === 3)
    // a date equality under a month transform prunes to that month's file
    // (the predicate's literal is the raw Date object, so the transform
    // ordinal is computable at planning time)
    val q = IcebergIO.readWhere(spark, dir,
      col("d") === java.sql.Date.valueOf("1995-03-05"))
    assert(ids(q) === Seq(1L))
    assert(q.inputFiles.length === 1,
      s"month-transform derived pruning should scan 1 file: " +
        q.inputFiles.mkString(", "))
    // the CAST-LITERAL spelling — the most natural DSL form of a date
    // predicate — must prune identically (foldCastLiteral evaluates the
    // foldable cast; before the fold this silently scanned every file)
    val qc = IcebergIO.readWhere(spark, dir,
      col("d") === org.apache.spark.sql.functions.lit("1995-03-05")
        .cast(DateType))
    assert(ids(qc) === Seq(1L))
    assert(qc.inputFiles.length === 1,
      s"cast-literal date pruning should scan 1 file: " +
        qc.inputFiles.mkString(", "))
    // bucket-on-date derives as well (bucketHash supports dates)
    val dir2 = s"$root/bucketdate"
    val w2 = new IcebergFixture.Writer(spark, dir2, dschema,
      partitionCols = Seq("d"), partitionTransforms = Map("d" -> "bucket[4]"))
    w2.append(spark.createDataFrame(java.util.Arrays.asList(
      drow(1, "2017-11-16"), drow(2, "2017-11-17"), drow(3, "2017-11-18"),
      drow(4, "2017-11-19")), dschema))
    val q2 = IcebergIO.readWhere(spark, dir2,
      col("d") === java.sql.Date.valueOf("2017-11-16"))
    assert(ids(q2) === Seq(1L))
  }

  test("readWhere skips (never fails) on literals a transform can't convert") {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.sources.IcebergIO.{identityStored, storedPartitionValue}
    // the helper itself throws for unconvertible combinations...
    intercept[IllegalArgumentException](
      storedPartitionValue("truncate[2]", java.sql.Date.valueOf("2024-01-01")))
    intercept[IllegalArgumentException](
      storedPartitionValue("bucket[4]", 1.5))
    intercept[IllegalArgumentException](
      storedPartitionValue("year", "not-a-date"))
    intercept[IllegalArgumentException](
      identityStored(new java.math.BigDecimal("1.50")))
    // ...but the derived path Try-guards it: an identity partition on a
    // DECIMAL column (stored as unscaled bytes — no literal
    // normalization exists) must read fine with partition pruning
    // skipped, not fail
    val dschema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("price", DecimalType(10, 2), nullable = false)))
    def drow(id: Long, p: String) = Row(id, new java.math.BigDecimal(p))
    val dir = s"$root/skipconvert"
    val w = new IcebergFixture.Writer(spark, dir, dschema,
      partitionCols = Seq("price"))
    w.append(spark.createDataFrame(java.util.Arrays.asList(
      drow(1, "1.50"), drow(2, "1.50"), drow(3, "99.00")), dschema))
    assert(w.dataFilePaths.size === 2)
    val q = IcebergIO.readWhere(spark, dir,
      col("price") === new java.math.BigDecimal("1.50"))
    assert(ids(q) === Seq(1L, 2L))
    // partition pruning skipped, but decimal STATS pruning still applies
    // (bounds [1.50,1.50] vs [99.00,99.00]) — one file scanned anyway
    assert(q.inputFiles.length === 1,
      s"decimal stats pruning should still engage: ${q.inputFiles.mkString(", ")}")
    // the EXPLICIT partitionFilter API surfaces the unconvertibility loudly
    val e = intercept[IllegalArgumentException](IcebergIO.read(spark, dir,
      partitionFilter = Map("price" -> new java.math.BigDecimal("1.50"))))
    assert(e.getMessage.contains("no stored-form normalization"))
    // sanity: a convertible transform still prunes (string truncate)
    val dir2 = s"$root/skipconvert2"
    val w2 = new IcebergFixture.Writer(spark, dir2, schema,
      partitionCols = Seq("name"),
      partitionTransforms = Map("name" -> "truncate[2]"))
    w2.append(df((1L, "aard", 1.0), (2L, "zulu", 2.0)))
    val q2 = IcebergIO.readWhere(spark, dir2, col("name") === "aard")
    assert(ids(q2) === Seq(1L))
    assert(q2.inputFiles.length === 1)
  }

  test("NaN rows: float/double stats pruning stays sound (Spark orders NaN greatest)") {
    import org.apache.spark.sql.functions.col
    val dir = s"$root/nanstats"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    // file A: bounds [1.0, 2.0] but holds a NaN row (bounds exclude NaN)
    w.append(df((1L, "a", 1.0), (2L, "b", Double.NaN), (3L, "c", 2.0)))
    // file B: NaN-free, bounds [10.0, 11.0]
    w.append(df((4L, "d", 10.0), (5L, "e", 11.0)))

    // score > 5.0 is satisfied by NaN in Spark semantics — file A must
    // NOT be pruned on its [1.0, 2.0] bounds (nan_value_counts says a
    // NaN row exists); both the NaN row and file B's rows come back
    val q = IcebergIO.readWhere(spark, dir, col("score") > 5.0)
    assert(ids(q) === Seq(2L, 4L, 5L))
    assert(q.inputFiles.length === 2,
      s"NaN-holding file must survive '>': ${q.inputFiles.mkString(", ")}")
    // <> against a constant-valued file: same rule via the explicit API
    val dir2 = s"$root/nanstats2"
    val w2 = new IcebergFixture.Writer(spark, dir2, schema)
    w2.append(df((1L, "a", 7.0), (2L, "b", Double.NaN)))
    val p = IcebergIO.read(spark, dir2, statsFilter = Seq(("score", "<>", 7.0)))
    assert(ids(p) === Seq(1L, 2L), "constant-plus-NaN file must not prune on <>")

    // soundness never costs pruning where it's safe: `<` can never be
    // satisfied by NaN, so file B still prunes for score < 5.0 …
    val qLt = IcebergIO.readWhere(spark, dir, col("score") < 5.0)
    assert(ids(qLt) === Seq(1L, 3L))
    assert(qLt.inputFiles.length === 1)
    // … and proven-NaN-free files still prune for `>` (file A must scan —
    // its NaN row satisfies score > 20.0 in Spark semantics)
    val qGt = IcebergIO.readWhere(spark, dir, col("score") > 20.0)
    assert(ids(qGt) === Seq(2L))
    assert(qGt.inputFiles.length === 1,
      "file B is proven NaN-free by nan_value_counts and bounds-pruned; " +
        "file A must still scan: " + qGt.inputFiles.mkString(", "))
  }

  test("GraftSession.readIceberg serves the native scan; writeIceberg appends") {
    val dir = s"$root/session"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    w.append(df((1L, "a", 1.0)))
    val g = GraftSession.wrap(spark)
    assert(ids(g.readIceberg(dir)) === Seq(1L))
    // pruning surfaces pass through the façade
    assert(ids(g.readIceberg(dir, statsFilter = Seq(("id", ">", 5)))) === Nil)
    assert(g.icebergFiles(dir).count() === 1L)
    assert(g.icebergHistory(dir).count() === 1L)
    // writeIceberg appends to an existing table through IcebergWrite …
    g.writeIceberg(df((2L, "b", 2.0)), dir)
    assert(ids(g.readIceberg(dir)) === Seq(1L, 2L))
    // … and creates-then-appends for a missing one
    val dir2 = s"$root/session_new"
    g.writeIceberg(df((7L, "x", 7.0)), dir2)
    assert(ids(g.readIceberg(dir2)) === Seq(7L))
    // upsertIceberg: replace-by-key + insert in one snapshot; creates
    // missing tables like writeIceberg does
    g.upsertIceberg(df((7L, "X", 7.5), (8L, "y", 8.0)), dir2, Seq("id"))
    val rows = g.readIceberg(dir2).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((7L, "X"), (8L, "y")))
    val dir3 = s"$root/session_up_new"
    g.upsertIceberg(df((1L, "n", 1.0)), dir3, Seq("id"))
    assert(ids(g.readIceberg(dir3)) === Seq(1L))
  }

  test("randomized SQL-surface soundness: rule pruning never drops rows") {
    import org.apache.spark.sql.functions.{col, lit, not}
    import org.apache.spark.sql.Column
    val rnd = new scala.util.Random(17) // fixed seed — deterministic
    val dir = s"$root/fuzz3"
    // PARTITIONED by name (identity): partition-equality derivation is
    // fuzzed alongside stats pruning — an `=` on the partition column
    // under AND prunes files; under OR/NOT it must not
    val w = new IcebergFixture.Writer(spark, dir, schema,
      partitionCols = Seq("name"))
    (1 to 3).foreach { _ =>
      val rows = (1 to 6).map(_ => (rnd.nextInt(60).toLong,
        rnd.alphanumeric.take(1).mkString, rnd.nextInt(60) / 10.0))
      w.append(df(rows: _*))
    }
    val full = IcebergIO.read(spark, dir)
    // the registered LIVE view: .filter over it goes through
    // IcebergScanRule -> predicateTreeOf -> the shared derivation
    val live = graft.sources.IcebergTableScan.dataFrame(spark, dir)
    def leafPred(): Column = {
      val c = Seq("id", "name", "score")(rnd.nextInt(3))
      def v(): Any = c match {
        case "id"    => rnd.nextInt(60).toLong
        case "name"  => rnd.alphanumeric.take(1).mkString
        case "score" => rnd.nextInt(60) / 10.0
      }
      rnd.nextInt(8) match {
        case 0 => col(c) === lit(v())
        case 1 => col(c) < lit(v())
        case 2 => col(c) <= lit(v())
        case 3 => col(c) > lit(v())
        case 4 => col(c) >= lit(v())
        case 5 => col(c).isNull
        case 6 => col(c).isin(v(), v())
        // 12-element list: the optimizer rewrites to InSet — covers the
        // catalyst-side conversion the DSL fuzz can't reach
        case 7 => col(c).isin(Seq.fill(12)(v()): _*)
      }
    }
    def randPred(depth: Int): Column =
      if (depth == 0 || rnd.nextInt(3) == 0) leafPred()
      else rnd.nextInt(3) match {
        case 0 => randPred(depth - 1) && randPred(depth - 1)
        case 1 => randPred(depth - 1) || randPred(depth - 1)
        case 2 => not(randPred(depth - 1))
      }
    (1 to 25).foreach { i =>
      val p = randPred(2)
      val a = live.filter(p).collect().map(_.toSeq.toString).sorted.toSeq
      val b = full.filter(p).collect().map(_.toSeq.toString).sorted.toSeq
      assert(a === b, s"iteration $i: SQL-surface pruning broke predicate $p")
    }
  }

  test("partition-scoped equality delete removes rows ONLY in its partition") {
    val dir = s"$root/eqscope"
    val st2 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("grp", StringType, nullable = true)))
    def rows2(xs: (Long, String)*) = spark.createDataFrame(
      new java.util.ArrayList[Row](
        java.util.Arrays.asList(xs.map(x => Row(x._1, x._2)): _*)), st2)
    val w = new IcebergFixture.Writer(spark, dir, st2,
      partitionCols = Seq("grp"))
    // id=1 exists in BOTH partitions — the global-application bug this
    // guards against would delete both
    w.append(rows2(1L -> "a", 2L -> "a", 1L -> "b", 3L -> "b"))
    w.deleteEqualityInPartition(
      rows2(1L -> "a").select("id"), fieldIds = Seq(1),
      partitionVals = Seq("a"))
    val got = IcebergIO.read(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got === Seq((1L, "b"), (2L, "a"), (3L, "b")))
  }

  test("partition-scoped equality delete on a BUCKET-partitioned table") {
    import graft.sources.IcebergTransforms
    val dir = s"$root/eqscope_bucket"
    val st2 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("grp", StringType, nullable = true)))
    def rows2(xs: (Long, String)*) = spark.createDataFrame(
      new java.util.ArrayList[Row](
        java.util.Arrays.asList(xs.map(x => Row(x._1, x._2)): _*)), st2)
    // two grp values landing in DIFFERENT buckets (computed, not assumed)
    val g1 = "a"
    val b1 = IcebergTransforms.bucket(4, g1)
    val g2 = ('b' to 'z').map(_.toString)
      .find(g => IcebergTransforms.bucket(4, g) != b1).get
    val w = new IcebergFixture.Writer(spark, dir, st2,
      partitionCols = Seq("grp"),
      partitionTransforms = Map("grp" -> "bucket[4]"))
    // id=1 exists in BOTH buckets; the scoped delete must only hit b1's
    w.append(rows2(1L -> g1, 2L -> g1, 1L -> g2))
    w.deleteEqualityInPartition(rows2(1L -> g1).select("id"),
      fieldIds = Seq(1), partitionVals = Seq(b1))
    val got = IcebergIO.read(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got === Seq((1L, g2), (2L, g1)))
  }

  test("partition-scoped equality delete on an identity-DATE partition") {
    val dir = s"$root/eqscope_date"
    val st2 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("d", DateType, nullable = true)))
    val d1 = java.sql.Date.valueOf("2024-01-01")
    val d2 = java.sql.Date.valueOf("2024-03-05")
    def rows2(xs: (Long, java.sql.Date)*) = spark.createDataFrame(
      new java.util.ArrayList[Row](
        java.util.Arrays.asList(xs.map(x => Row(x._1, x._2)): _*)), st2)
    val w = new IcebergFixture.Writer(spark, dir, st2, partitionCols = Seq("d"))
    // id=1 exists in BOTH date partitions: the manifest stores the
    // epoch-day ordinal, so the scan must re-derive it per row — a raw
    // date-vs-int compare would under-delete, an unscoped join over-delete
    w.append(rows2(1L -> d1, 2L -> d1, 1L -> d2))
    w.deleteEqualityInPartition(rows2(1L -> d1).select("id"),
      fieldIds = Seq(1), partitionVals = Seq(d1))
    val got = IcebergIO.read(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDate(1).toString)).sorted.toSeq
    assert(got === Seq((1L, d2.toString), (2L, d1.toString)))
  }

  test("partition-scoped equality delete on an identity-TIMESTAMP_NTZ partition") {
    val dir = s"$root/eqscope_ntz"
    val st2 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ts", TimestampNTZType, nullable = true)))
    // sub-second fraction exercises the exact DECIMAL(8,6) micros assembly
    val t1 = java.time.LocalDateTime.of(2024, 1, 1, 3, 30, 15, 123456000)
    val t2 = java.time.LocalDateTime.of(2024, 3, 5, 22, 0, 0)
    def rows2(xs: (Long, java.time.LocalDateTime)*) = spark.createDataFrame(
      new java.util.ArrayList[Row](
        java.util.Arrays.asList(xs.map(x => Row(x._1, x._2)): _*)), st2)
    val w = new IcebergFixture.Writer(spark, dir, st2, partitionCols = Seq("ts"))
    w.append(rows2(1L -> t1, 2L -> t1, 1L -> t2))
    w.deleteEqualityInPartition(rows2(1L -> t1).select("id"),
      fieldIds = Seq(1), partitionVals = Seq(t1))
    val got = IcebergIO.read(spark, dir)
      .collect().map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1)))
      .sortBy(r => (r._1, r._2.toString)).toSeq
    assert(got === Seq((1L, t2), (2L, t1)))
  }

  test("storedColumn on TIMESTAMP_NTZ is session-time-zone independent") {
    import graft.sources.IcebergTransforms
    val t = java.time.LocalDateTime.of(2024, 1, 1, 3, 30, 15, 123456000)
    // spec: NTZ wall clock reads as UTC
    val expected = t.toInstant(java.time.ZoneOffset.UTC)
    val expectedMicros = expected.getEpochSecond * 1000000L + expected.getNano / 1000L
    val st2 = StructType(Seq(StructField("ts", TimestampNTZType, nullable = true)))
    val df1 = spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(Row(t))), st2)
    val key = "spark.sql.session.timeZone"
    val tz0 = spark.conf.get(key)
    try {
      Seq("UTC", "America/New_York", "Asia/Kolkata").foreach { tz =>
        spark.conf.set(key, tz)
        val micros = df1
          .select(IcebergTransforms.storedColumn("identity", "ts", TimestampNTZType))
          .head.getLong(0)
        assert(micros === expectedMicros, s"identity micros drifted in session TZ $tz")
        val hourOrd = df1
          .select(IcebergTransforms.sparkColumn("hour", "ts", TimestampNTZType))
          .head.getInt(0)
        assert(hourOrd === (expectedMicros / 3600000000L).toInt,
          s"hour ordinal drifted in session TZ $tz")
      }
    } finally spark.conf.set(key, tz0)
  }

  test("hour transform FLOORS pre-1970 timestamps (spec floorDiv, not SQL div)") {
    import graft.sources.IcebergTransforms
    // 1969-12-31T23:30 is 30 min before epoch → hour ordinal -1; a
    // truncating division would yield 0 and silently mis-prune /
    // mis-scope against an externally written hour-partitioned table.
    val vecs = Seq(
      java.time.LocalDateTime.of(1969, 12, 31, 23, 30, 0) -> -1,
      java.time.LocalDateTime.of(1969, 12, 31, 23, 0, 0)  -> -1, // boundary
      java.time.LocalDateTime.of(1969, 12, 31, 0, 15, 0)  -> -24,
      java.time.LocalDateTime.of(1970, 1, 1, 0, 30, 0)    -> 0)
    val st = StructType(Seq(StructField("ts", TimestampNTZType, nullable = true)))
    vecs.foreach { case (t, want) =>
      assert(IcebergTransforms.hourOrdinal(t) === want, s"driver-side $t")
      val rows = new java.util.ArrayList[Row](java.util.Arrays.asList(Row(t)))
      val got = spark.createDataFrame(rows, st)
        .select(IcebergTransforms.sparkColumn("hour", "ts", TimestampNTZType))
        .head.getInt(0)
      assert(got === want, s"SQL-side hour ordinal for $t")
      // TimestampType (instant) path takes the unix_micros branch — same floor
      val inst = t.atZone(java.time.ZoneOffset.UTC).toInstant
      val rows2 = new java.util.ArrayList[Row](java.util.Arrays.asList(Row(inst)))
      val st2 = StructType(Seq(StructField("ts", TimestampType, nullable = true)))
      val got2 = spark.createDataFrame(rows2, st2)
        .select(IcebergTransforms.sparkColumn("hour", "ts", TimestampType))
        .head.getInt(0)
      assert(got2 === want, s"instant-side hour ordinal for $t")
    }
  }

  test("incremental append scan: exact range, empty tail, non-append fails") {
    val dir = s"$root/incremental"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    w.append(df((1L, "a", 1.0), (2L, "b", 2.0))) // snap 1
    w.append(df((3L, "c", 3.0)))                 // snap 2
    w.append(df((4L, "d", 4.0)))                 // snap 3
    assert(ids(IcebergIO.readIncremental(spark, dir, 1L)) === Seq(3L, 4L))
    assert(ids(IcebergIO.readIncremental(spark, dir, 1L,
      toSnapshotId = Some(2L))) === Seq(3L))
    // from == current: nothing new
    assert(IcebergIO.readIncremental(spark, dir, 3L).count() === 0L)
    // schema preserved on the empty result
    assert(IcebergIO.readIncremental(spark, dir, 3L)
      .schema.fieldNames.toSeq === Seq("id", "name", "score"))
    // a delete snapshot inside the range must fail loudly, not guess
    w.deleteEquality(df((3L, "c", 3.0)).select("id"), Seq(1)) // snap 4
    val e = intercept[UnsupportedOperationException](
      IcebergIO.readIncremental(spark, dir, 1L))
    assert(e.getMessage.contains("append-only"))
    // ...but a range that stops before the delete still reads
    assert(ids(IcebergIO.readIncremental(spark, dir, 1L,
      toSnapshotId = Some(3L))) === Seq(3L, 4L))
  }

  test("manifest planning runs DISTRIBUTED above the threshold, same results") {
    val dir = s"$root/manymanifests"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    val n = graft.sources.IcebergIO.ParallelManifestThreshold + 2
    (1 to n).foreach(i => w.append(df((i.toLong, s"n$i", i * 0.5))))
    // a listener proves a Spark job ran during planning (files() opens
    // no data file, so any job it triggers IS the manifest-parse job)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val files = IcebergIO.files(spark, dir)
      val rows = files.collect() // files() plans eagerly; collect for rows
      Thread.sleep(500) // listener delivery is async
      assert(rows.length === n)
      assert(rows.map(_.getLong(3)).sum === n.toLong) // 1 record per file
      assert(jobs.get() >= 1, "expected a distributed manifest-parse job")
    } finally spark.sparkContext.removeSparkListener(listener)
    // pruning results identical to the driver-side path's semantics:
    // stats-pruned scan keeps exactly the matching rows
    assert(ids(IcebergIO.read(spark, dir,
      statsFilter = Seq(("id", ">=", 5L)))) === (5L to n.toLong))
    assert(ids(IcebergIO.readWhere(spark, dir,
      org.apache.spark.sql.functions.col("id") <= 3L)) === Seq(1L, 2L, 3L))
  }

  test("whole-history relations: all_manifests/all_entries/all_files/" +
      "metadata_log_entries/position_deletes") {
    val dir = s"$root/allmeta"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    val s1 = w.append(df((1L, "a", 1.0), (2L, "b", 2.0)))
    val s2 = w.append(df((3L, "c", 3.0)))
    val s3 = w.deletePositions(w.dataFilePaths.head, Seq(0L))

    // .all_manifests: one row per (manifest, REFERENCING snapshot) —
    // snap1 refs {m1}, snap2 {m1,m2}, snap3 {m1,m2,m3} → 6 rows, and the
    // carried-forward first manifest appears under all three snapshots
    val am = IcebergIO.allManifests(spark, dir).collect()
    assert(am.length === 6)
    assert(Seq(s1, s2, s3).map(sid =>
      am.count(_.getAs[Long]("reference_snapshot_id") == sid)) === Seq(1, 2, 3))
    val firstManifest = am.map(_.getString(0)).distinct.sorted.head
    assert(am.count(_.getString(0) == firstManifest) === 3)

    // .all_entries parses each DISTINCT manifest exactly once → one row
    // per entry: 2 data files + 1 position-delete file
    val ae = IcebergIO.allEntries(spark, dir).collect()
    assert(ae.length === 3)
    assert(ae.count(_.getAs[Int]("content") == 0) === 2)
    assert(ae.count(_.getAs[Int]("content") == 1) === 1)

    // .position_deletes: row contents of the live delete file
    val pd = IcebergIO.positionDeletes(spark, dir).collect()
    assert(pd.length === 1)
    assert(pd.head.getString(0) === "data-00001.parquet")
    assert(pd.head.getLong(1) === 0L)
    assert(pd.head.getLong(3) === s3)

    // compact folds the deletes away; .files forgets the old files but
    // .all_files (GC/audit grain) still lists every historical one
    graft.sources.IcebergWrite.compact(spark, dir)
    val cur = IcebergIO.files(spark, dir).collect().map(_.getString(0)).toSet
    assert(!cur.contains("data-00001.parquet"))
    val allF = IcebergIO.allFiles(spark, dir).collect().map(_.getString(0)).toSet
    assert(Set("data-00001.parquet", "data-00002.parquet",
      "delete-00003.parquet").subsetOf(allF))
    assert(cur.subsetOf(allF))
    // post-compact the live position-delete relation is empty (schema kept)
    val pdAfter = IcebergIO.positionDeletes(spark, dir)
    assert(pdAfter.collect().isEmpty)
    assert(pdAfter.schema.fieldNames.toSeq ===
      Seq("file_name", "pos", "delete_file_name", "sequence_number"))

    // .metadata_log_entries: fixture commits keep an empty metadata-log,
    // so the compact's publish records exactly one prior file + current
    val ml = IcebergIO.metadataLogEntries(spark, dir).collect()
    assert(ml.length === 2)
    assert(ml.map(_.getString(1)).forall(_.endsWith(".metadata.json")))

    // registered SQL metadata views resolve (live, like the data view)
    val gs = graft.GraftSession.wrap(spark)
    gs.registerIceberg("allmeta_t", dir, metadataTables = true)
    assert(spark.sql("SELECT count(*) FROM allmeta_t_all_manifests")
      .collect().head.getLong(0) >= 6L)
    assert(spark.sql("SELECT count(*) FROM allmeta_t_position_deletes")
      .collect().head.getLong(0) === 0L)
    assert(spark.sql("SELECT count(*) FROM allmeta_t_metadata_log_entries")
      .collect().head.getLong(0) === 2L)
    // content-filtered all_* slices partition the whole-history set
    val af = spark.sql("SELECT count(*) FROM allmeta_t_all_files")
      .collect().head.getLong(0)
    val ad = spark.sql("SELECT count(*) FROM allmeta_t_all_data_files")
      .collect().head.getLong(0)
    val adel = spark.sql("SELECT count(*) FROM allmeta_t_all_delete_files")
      .collect().head.getLong(0)
    assert(ad + adel === af)
    assert(adel >= 1L) // the pre-compact delete file is history
  }

  test("all_files/all_entries run DISTRIBUTED above the threshold; " +
      "path dedupe survives manifest rewrites") {
    val dir = s"$root/allmeta_dist"
    IcebergWrite.create(spark, dir, schema)
    val n = IcebergIO.ParallelManifestThreshold + 2
    (1 to n).foreach(i =>
      IcebergWrite.append(df((i.toLong, s"n$i", i * 0.5)).coalesce(1), dir))
    // the rewrite puts every path into a SECOND (consolidated) manifest —
    // the distributed first-occurrence window must still emit each once
    IcebergWrite.rewriteManifests(spark, dir)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val rows = IcebergIO.allFiles(spark, dir).collect()
      Thread.sleep(500) // listener delivery is async
      assert(jobs.get() >= 1, "expected a distributed manifest-parse job")
      assert(rows.length === n, "each path exactly once despite 2 manifests")
      assert(rows.map(_.getLong(3)).sum === n.toLong) // 1 record per file
      // first occurrence wins: sequence numbers are the ORIGINAL ones
      assert(rows.map(_.getLong(4)).sorted.toSeq === (1L to n.toLong))
    } finally spark.sparkContext.removeSparkListener(listener)
    // all_entries: every entry of every DISTINCT manifest — n originals
    // (ADDED) + n carried copies in the consolidated manifest (EXISTING)
    val ae = IcebergIO.allEntries(spark, dir).collect()
    assert(ae.length === 2 * n)
    assert(ae.count(_.getInt(0) == 0) === n)
    assert(ae.count(_.getInt(0) == 1) === n)
  }

  test("position_deletes plan stays constant-size at many delete files") {
    val dir = s"$root/posdel_many"
    val w = new IcebergFixture.Writer(spark, dir, schema)
    w.append(df((0L until 60L).map(i => (i, s"x$i", i * 0.1)): _*))
    val target = w.dataFilePaths.head
    (0 until 50).foreach(i => w.deletePositions(target, Seq(i.toLong)))
    val pd = IcebergIO.positionDeletes(spark, dir)
    // ONE multi-path scan + the broadcast (path -> owner) map — never a
    // relation per delete file
    val leaves = pd.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.size <= 2,
      s"expected <= 2 plan leaves at 50 delete files, got ${leaves.size}")
    val rows = pd.collect()
    assert(rows.length === 50)
    assert(rows.map(_.getString(2)).distinct.length === 50) // 50 owners
    assert(rows.map(_.getLong(1)).sorted.toSeq === (0L until 50L))
    // and the merge-on-read READ over those files stays correct
    assert(ids(IcebergIO.read(spark, dir)) === (50L until 60L))
  }
}
