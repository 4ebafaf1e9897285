package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.AvroIO

/** Executable Avro path (reference read_avro/register_avro,
  * ballista/client/src/context.rs:227-234,272-280) — real container files
  * through the Avro core library. */
class AvroIOSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = s"/tmp/graft_avro_spec_${java.util.UUID.randomUUID().toString.take(8)}"

  test("schema round-trips Spark -> Avro -> Spark incl. nested/nullable") {
    val st = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = true),
      StructField("flags", ArrayType(BooleanType, containsNull = false), nullable = true),
      StructField("attrs", MapType(StringType, IntegerType, valueContainsNull = true), nullable = true),
      StructField("inner", StructType(Seq(
        StructField("a", IntegerType, nullable = true),
        StructField("b", StringType, nullable = false))), nullable = true),
      StructField("raw", BinaryType, nullable = true),
      StructField("d", DateType, nullable = true),
      StructField("ts", TimestampType, nullable = true)))
    val avro = AvroIO.toAvroSchema(st)
    val back = AvroIO.toSparkSchema(avro)
    // Avro [null,T] unions come back nullable; non-union fields non-null.
    assert(back.fields.map(f => (f.name, f.dataType)).toSeq ===
      st.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back("id").nullable === false)
    assert(back("name").nullable === true)
  }

  test("multi-branch non-null union is rejected with a clear message") {
    val s = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[
        |{"name":"x","type":["int","string"]}]}""".stripMargin)
    val e = intercept[IllegalArgumentException](AvroIO.toSparkSchema(s))
    assert(e.getMessage.contains("union"))
  }

  test("data round-trips through a real container file, nulls included") {
    val st = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("vals", ArrayType(DoubleType, containsNull = false), nullable = true),
      StructField("attrs", MapType(StringType, LongType, valueContainsNull = false), nullable = true),
      StructField("inner", StructType(Seq(
        StructField("a", IntegerType, nullable = true))), nullable = true),
      StructField("raw", BinaryType, nullable = true),
      StructField("d", DateType, nullable = true),
      StructField("ts", TimestampType, nullable = true)))
    val rows = Seq(
      Row(1L, "alpha", Seq(1.5, 2.5), Map("k" -> 7L), Row(42), Array[Byte](1, 2, 3),
        Date.valueOf("2024-03-01"), Timestamp.valueOf("2024-03-01 12:34:56.789")),
      Row(2L, null, null, null, null, null, null, null),
      Row(3L, "gamma", Seq.empty[Double], Map.empty[String, Long], Row(null.asInstanceOf[Any]),
        Array.empty[Byte], Date.valueOf("1970-01-01"), Timestamp.valueOf("1970-01-01 00:00:00")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), st)
    AvroIO.write(df, s"$dir/rt")
    val back = AvroIO.read(spark, s"$dir/rt").orderBy("id").collect()
    assert(back.length === 3)
    val r1 = back(0)
    assert(r1.getLong(0) === 1L)
    assert(r1.getString(1) === "alpha")
    assert(r1.getSeq[Double](2) === Seq(1.5, 2.5))
    assert(r1.getMap[String, Long](3) === Map("k" -> 7L))
    assert(r1.getStruct(4).getInt(0) === 42)
    assert(r1.getAs[Array[Byte]](5).toSeq === Seq[Byte](1, 2, 3))
    assert(r1.getDate(6) === Date.valueOf("2024-03-01"))
    assert(r1.getTimestamp(7) === Timestamp.valueOf("2024-03-01 12:34:56.789"))
    val r2 = back(1)
    assert((1 to 7).forall(r2.isNullAt))
  }

  test("write produces one container per partition; read parallelizes per file") {
    import spark.implicits._
    val df = spark.range(0, 1000).select($"id", ($"id" % 10).as("m")).repartition(4)
    AvroIO.write(df.toDF(), s"$dir/parts")
    val files = new java.io.File(s"$dir/parts").listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length === 4)
    val back = AvroIO.read(spark, s"$dir/parts")
    assert(back.rdd.getNumPartitions === 4)
    assert(back.count() === 1000L)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0) === 499500L)
  }

  test("empty DataFrame round-trips with schema intact") {
    import spark.implicits._
    val df = spark.range(0).select($"id", ($"id" % 2 === 0).as("flag")).toDF()
    AvroIO.write(df, s"$dir/empty")
    val back = AvroIO.read(spark, s"$dir/empty")
    assert(back.count() === 0L)
    assert(back.schema.fieldNames.toSeq === Seq("id", "flag"))
  }

  test("session facade: registerAvro exposes an Avro table to SQL") {
    val g = GraftSession.wrap(spark)
    val nation = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
    g.writeAvro(nation, s"$dir/nation")
    g.registerAvro("avro_nation", s"$dir/nation")
    val n = spark.sql("SELECT COUNT(*) c FROM avro_nation").head.getLong(0)
    assert(n === nation.count())
  }

  test("CREATE EXTERNAL TABLE ... STORED AS AVRO becomes a V2 catalog table") {
    val g = GraftSession.wrap(spark)
    val nation = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
    g.writeAvro(nation, s"$dir/ext_nation")
    g.sql("DROP TABLE IF EXISTS spec_ext_avro")
    g.sql(s"CREATE EXTERNAL TABLE spec_ext_avro STORED AS AVRO LOCATION '$dir/ext_nation'")
    assert(spark.sql("SELECT COUNT(*) c FROM spec_ext_avro").head.getLong(0) ===
      nation.count())
    // duplicate without IF NOT EXISTS errors (reference context.rs:470-481
    // semantics, enforced by Spark's catalog)
    val e = intercept[org.apache.spark.sql.AnalysisException](
      g.sql(s"CREATE EXTERNAL TABLE spec_ext_avro STORED AS AVRO LOCATION '$dir/ext_nation'"))
    assert(e.getMessage.toLowerCase.contains("already exists"))
    // IF NOT EXISTS is a no-op on an existing table
    g.sql(s"CREATE EXTERNAL TABLE IF NOT EXISTS spec_ext_avro STORED AS AVRO LOCATION '$dir/ext_nation'")
  }

  test("V2 avro scan prunes columns (BatchScan readSchema = projection)") {
    val g = GraftSession.wrap(spark)
    val nation = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
    g.writeAvro(nation, s"$dir/prune_nation")
    val pruned = g.readAvro(s"$dir/prune_nation").select("n_name")
    val scan = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("BatchScan"))
    assert(scan.contains("struct<n_name:string>"), s"scan not pruned:\n$scan")
    assert(pruned.count() === nation.count())
  }

  test("scan reports size statistics: small avro dim broadcasts in a join") {
    val g = GraftSession.wrap(spark)
    val nation = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
    g.writeAvro(nation, s"$dir/stats_nation")
    val lineitem = spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
    val dim = spark.read.format("avro").load(s"$dir/stats_nation")
    val joined = lineitem.join(dim,
      lineitem("l_suppkey") % 25 === dim("n_nationkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"small avro side not broadcast:\n$plan")
  }

  test("single large container splits into multiple sync-aligned tasks") {
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    // one file, many small blocks (tiny sync interval)
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"big","fields":[
        |  {"name":"id","type":"long"},{"name":"payload","type":"string"}]}""".stripMargin)
    val out = new java.io.File(s"$dir/bigfile"); out.mkdirs()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.setSyncInterval(1024) // block ≈ 1 KB → many sync points
    w.create(schema, new java.io.File(out, "big.avro"))
    val n = 20000
    (0 until n).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("id", i.toLong); r.put("payload", s"row-$i-" + "x" * 50)
      w.append(r)
    }
    w.close()

    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, (64 * 1024).toString) // 64 KB splits
      val df = spark.read.format("avro").load(out.getPath)
      assert(df.rdd.getNumPartitions > 4,
        s"expected multiple splits, got ${df.rdd.getNumPartitions}")
      // every row read exactly once across splits
      assert(df.count() === n.toLong)
      assert(df.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0) ===
        n.toLong * (n - 1) / 2)
    } finally spark.conf.set(key, prev)
  }

  test("hive-layout partition discovery + planning-time partition pruning") {
    val g = GraftSession.wrap(spark)
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select("doc_id", "n_chars") // lang becomes the partition column
    val root = s"$dir/part"
    val langs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    langs.select("lang").distinct().collect().map(_.getString(0)).foreach { l =>
      val part = langs.filter(s"lang = '$l'").select("doc_id", "n_chars")
      graft.sources.AvroIO.write(part.coalesce(1), s"$root/lang=$l")
    }
    val nLangs = langs.select("lang").distinct().count().toInt
    val df = spark.read.format("avro").load(root)
    // partition column appended to the schema, values from the path
    assert(df.schema.fieldNames.toSeq === Seq("doc_id", "n_chars", "lang"))
    assert(df.count() === langs.count())
    assert(df.groupBy("lang").count().count() === nLangs)
    // partition filter prunes FILES at planning time: one partition left
    val en = df.filter("lang = 'en'")
    assert(en.rdd.getNumPartitions === 1, "partition filter did not prune files")
    assert(en.count() === langs.filter("lang = 'en'").count())
    // unfiltered scan reads every partition dir
    assert(df.rdd.getNumPartitions === nLangs)
    // mixed partition+data filter still correct (data part not prunable)
    val mixed = df.filter("lang = 'en' AND n_chars > 200")
    assert(mixed.count() === langs.filter("lang = 'en' AND n_chars > 200").count())
  }

  test("decimal round-trips through the Avro decimal logical type") {
    import spark.implicits._
    val df = Seq("123456.78", "-0.01", "0.00", "99999999.99")
      .toDF("s").selectExpr("CAST(s AS DECIMAL(10,2)) AS d")
    AvroIO.write(df, s"$dir/dec")
    // schema carries the logical type, not a string fallback
    val avroSchema = {
      val first = new java.io.File(s"$dir/dec")
        .listFiles((_, n) => n.endsWith(".avro")).head
      val r = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
        first,
        new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
      try r.getSchema finally r.close()
    }
    val fieldSchema = avroSchema.getField("d").schema()
    import scala.jdk.CollectionConverters._
    val nonNull = fieldSchema.getTypes.asScala
      .find(_.getType != org.apache.avro.Schema.Type.NULL).get
    assert(nonNull.getLogicalType.isInstanceOf[org.apache.avro.LogicalTypes.Decimal])
    val back = AvroIO.read(spark, s"$dir/dec")
    assert(back.schema("d").dataType === DecimalType(10, 2))
    assert(back.select("d").collect().map(_.getDecimal(0).toPlainString).sorted.toSeq ===
      Seq("-0.01", "0.00", "123456.78", "99999999.99"))
    // V2 reader agrees
    val v2 = spark.read.format("avro").load(s"$dir/dec")
    assert(v2.schema("d").dataType === DecimalType(10, 2))
    assert(v2.agg(org.apache.spark.sql.functions.sum("d")).head.getDecimal(0).toPlainString
      === "100123456.76")
  }

  test("reads externally-written enum/fixed/reordered-union/millis types") {
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    // a schema our writer never produces: enum, fixed, [T, null] union
    // (null second), timestamp-millis logical type
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"ext","fields":[
        |  {"name":"id","type":"long"},
        |  {"name":"color","type":{"type":"enum","name":"Color",
        |    "symbols":["RED","GREEN","BLUE"]}},
        |  {"name":"tag","type":{"type":"fixed","name":"Tag","size":3}},
        |  {"name":"note","type":["string","null"]},
        |  {"name":"ts","type":{"type":"long","logicalType":"timestamp-millis"}}
        |]}""".stripMargin)
    val out = new java.io.File(s"$dir/external"); out.mkdirs()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(out, "ext.avro"))
    def rec(id: Long, color: String, tag: Array[Byte], note: String, ms: Long) = {
      val r = new GenericData.Record(schema)
      r.put("id", id)
      r.put("color", new GenericData.EnumSymbol(schema.getField("color").schema(), color))
      r.put("tag", new GenericData.Fixed(schema.getField("tag").schema(), tag))
      r.put("note", note)
      r.put("ts", ms)
      r
    }
    w.append(rec(1L, "GREEN", Array[Byte](1, 2, 3), "hello", 86400000L))
    w.append(rec(2L, "RED", Array[Byte](9, 9, 9), null, 0L))
    w.close()

    val df = AvroIO.read(spark, out.getPath).orderBy("id")
    assert(df.schema("color").dataType === StringType)
    assert(df.schema("tag").dataType === BinaryType)
    assert(df.schema("note").nullable === true)
    assert(df.schema("ts").dataType === TimestampType)
    val rows = df.collect()
    assert(rows(0).getString(1) === "GREEN")
    assert(rows(0).getAs[Array[Byte]](2).toSeq === Seq[Byte](1, 2, 3))
    assert(rows(0).getString(3) === "hello")
    assert(rows(0).getTimestamp(4) === Timestamp.valueOf("1970-01-02 00:00:00"))
    assert(rows(1).isNullAt(3))
    // the V2 connector reads the same file identically (normalize the
    // binary column — Array[Byte] stringifies by identity)
    def norm(r: Row): String =
      (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2).toSeq,
        Option(r.getString(3)), r.getTimestamp(4)).toString
    val v2 = spark.read.format("avro").load(out.getPath).orderBy("id").collect()
    assert(v2.map(norm).toSeq === rows.map(norm).toSeq)
  }

  test("V2 filter pushdown: filters appear on the scan; results exact") {
    val g = GraftSession.wrap(spark)
    val nation = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
    g.writeAvro(nation, s"$dir/filter_nation")
    val q = g.readAvro(s"$dir/filter_nation")
      .filter("n_nationkey >= 5 AND n_name IS NOT NULL")
      .select("n_nationkey")
    val scanDesc = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scanDesc.contains("PushedFilters"), s"no pushdown:\n$scanDesc")
    val expected = nation.filter("n_nationkey >= 5").count()
    assert(q.count() === expected)
    // strings + In + boundaries
    val q2 = g.readAvro(s"$dir/filter_nation")
      .filter("n_name IN ('NATION_3','NATION_7') OR n_nationkey < 1")
    assert(q2.count() ===
      nation.filter("n_name IN ('NATION_3','NATION_7') OR n_nationkey < 1").count())
    // NOT over a supported child must not over-prune
    val q3 = g.readAvro(s"$dir/filter_nation").filter("NOT (n_nationkey = 3)")
    assert(q3.count() === nation.filter("NOT (n_nationkey = 3)").count())
  }

  test("V2 write: fresh save, overwrite truncates, append adds, empty keeps schema") {
    GraftSession.wrap(spark) // enables the V2 avro short name
    val nation = spark.read.parquet(s"${TestSpark.sfDir}/nation.parquet")
    val region = spark.read.parquet(s"${TestSpark.sfDir}/region.parquet")
    val out = s"$dir/v2write"
    nation.write.format("avro").mode("overwrite").save(out)
    assert(spark.read.format("avro").load(out).count() === nation.count())
    region.write.format("avro").mode("overwrite").save(out)
    val over = spark.read.format("avro").load(out)
    assert(over.schema.fieldNames.toSeq === region.schema.fieldNames.toSeq)
    assert(over.count() === region.count())
    region.write.format("avro").mode("append").save(out)
    assert(spark.read.format("avro").load(out).count() === 2 * region.count())
    region.limit(0).write.format("avro").mode("overwrite").save(s"$out-empty")
    val empty = spark.read.format("avro").load(s"$out-empty")
    assert(empty.count() === 0L)
    assert(empty.schema.fieldNames.toSeq === region.schema.fieldNames.toSeq)
  }

  test("readIceberg (native scan) rejects a non-table path with a clear error") {
    // full read coverage lives in IcebergSpec; here just pin that the
    // session facade routes to the native scan (no jar probe anymore)
    val g = GraftSession.wrap(spark)
    val e = intercept[IllegalArgumentException](g.readIceberg("/tmp/nope"))
    assert(e.getMessage.contains("metadata"))
  }

  test("readAvro (programmatic path) splits one large container via V2") {
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"big2","fields":[
        |  {"name":"id","type":"long"},{"name":"payload","type":"string"}]}""".stripMargin)
    val out = new java.io.File(s"$dir/bigfile2"); out.mkdirs()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.setSyncInterval(1024)
    w.create(schema, new java.io.File(out, "big.avro"))
    val n = 20000
    (0 until n).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("id", i.toLong); r.put("payload", s"row-$i-" + "y" * 50)
      w.append(r)
    }
    w.close()
    val g = GraftSession.wrap(spark)
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, (64 * 1024).toString)
      val df = g.readAvro(out.getPath)
      // the session facade gets the sync-aligned splitter, not per-file grain
      assert(df.rdd.getNumPartitions > 4,
        s"expected multiple splits via readAvro, got ${df.rdd.getNumPartitions}")
      assert(df.count() === n.toLong)

      // the RDD path (AvroIO.read) honors the same split contract: every
      // row read exactly once across sync-aligned ranges
      val rdd = graft.sources.AvroIO.read(spark, out.getPath)
      assert(rdd.rdd.getNumPartitions > 4,
        s"expected multiple splits via AvroIO.read, got ${rdd.rdd.getNumPartitions}")
      assert(rdd.count() === n.toLong)
      import org.apache.spark.sql.functions.{countDistinct, sum}
      val agg = rdd.agg(sum("id"), countDistinct("id")).head()
      assert(agg.getLong(0) === n.toLong * (n - 1) / 2 && agg.getLong(1) === n.toLong)
    } finally spark.conf.set(key, prev)
  }

  test("timestamp-millis WRITE variant round-trips at ms precision") {
    val st = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ts", TimestampType, nullable = true)))
    // micros deliberately non-zero below the ms: the millis writer must
    // floor-truncate them (that's the declared precision loss)
    val t = Timestamp.valueOf("2024-03-01 10:20:30.123456")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, t), Row(2L, null)), 1), st)
    val out = s"$dir/millis_write"
    AvroIO.write(df, out, timestampMillis = true)
    // the container really declares timestamp-millis
    val f = new java.io.File(out).listFiles((_, n) => n.endsWith(".avro")).head
    val r = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
      f, new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    val tsField = try r.getSchema.getField("ts").schema() finally r.close()
    import scala.jdk.CollectionConverters._
    val nonNull = tsField.getTypes.asScala
      .find(_.getType != org.apache.avro.Schema.Type.NULL).get
    assert(nonNull.getLogicalType.getName === "timestamp-millis")
    // read back: value floored to the millisecond
    val back = AvroIO.read(spark, out).orderBy("id").collect()
    assert(back(0).getTimestamp(1) === Timestamp.valueOf("2024-03-01 10:20:30.123"))
    assert(back(1).isNullAt(1))
  }

  test("V2 append across writes: uuid-suffixed part names, no overwrite") {
    GraftSession.wrap(spark)
    val region = spark.read.parquet(s"${TestSpark.sfDir}/region.parquet")
    val out = s"$dir/appendsafe"
    region.coalesce(1).write.format("avro").mode("overwrite").save(out)
    region.coalesce(1).write.format("avro").mode("append").save(out)
    val files = new java.io.File(out).listFiles((_, n) => n.endsWith(".avro")).map(_.getName)
    assert(files.length === 2, files.mkString(", "))
    // same partitionId (0) in both writes: only the per-write uuid keeps
    // the names distinct, which is what prevents rename-over-existing
    assert(files.forall(_.matches("part-\\d{5}-\\d+-[0-9a-f]{8}\\.avro")), files.mkString(", "))
    assert(files.toSet.size === 2)
    assert(spark.read.format("avro").load(out).count() === 2 * region.count())
  }

  test("reader-schema evolution: add-with-default, drop, reorder, promote, union order") {
    val base = s"$dir/evol"
    // writer schema: (id long, name [null,string], score int)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, "a", 10), Row(2L, null, 20)),
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("name", StringType, nullable = true),
        StructField("score", IntegerType, nullable = false))))
    AvroIO.write(df.repartition(1), base)

    // Reader schema exercises four evolutions at once: fields REORDERED
    // (score first), `score` PROMOTED int→long, `tag` ADDED with a
    // default, and `name`'s union branch order FLIPPED vs the writer's
    // [null,string]. Record name must match the writer's for resolution.
    val readerJson =
      """{"type":"record","name":"spark_row","namespace":"graft.avro","fields":[
        |  {"name":"score","type":"long"},
        |  {"name":"tag","type":"string","default":"none"},
        |  {"name":"id","type":"long"},
        |  {"name":"name","type":["string","null"],"default":"?"}]}""".stripMargin

    val evolved = AvroIO.read(spark, base, Some(readerJson))
    assert(evolved.schema.fieldNames.toSeq === Seq("score", "tag", "id", "name"))
    assert(evolved.schema("score").dataType === LongType)
    val rows = evolved.collect().sortBy(_.getLong(2))
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSeq ===
      Seq((10L, "none", 1L, "a"), (20L, "none", 2L, null)))

    // DROP: a reader schema with only `id` skips the other fields
    val dropJson =
      """{"type":"record","name":"spark_row","namespace":"graft.avro","fields":[
        |  {"name":"id","type":"long"}]}""".stripMargin
    val dropped = AvroIO.read(spark, base, Some(dropJson))
    assert(dropped.schema.fieldNames.toSeq === Seq("id"))
    assert(dropped.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))

    // V2 path: the same reader schema through the `avroReaderSchema`
    // option, with column pruning on top
    val v2 = spark.read.format("avro")
      .option("avroReaderSchema", readerJson).load(base)
    assert(v2.schema.fieldNames.toSeq === Seq("score", "tag", "id", "name"))
    val v2rows = v2.selectExpr("id", "tag", "score").collect().sortBy(_.getLong(0))
    assert(v2rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq((1L, "none", 10L), (2L, "none", 20L)))

    // MIXED writer schemas across part files in ONE directory: a second
    // file already carries `tag`; per-file resolution makes the read
    // uniform — the actual tag where written, the default where not.
    val df2 = spark.createDataFrame(
      java.util.Arrays.asList(Row(3L, "c", 30, "real")),
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("name", StringType, nullable = true),
        StructField("score", IntegerType, nullable = false),
        StructField("tag", StringType, nullable = false))))
    AvroIO.write(df2.repartition(1), s"$dir/evol2")
    val mixed = new java.io.File(s"$dir/evol_mixed"); mixed.mkdirs()
    java.nio.file.Files.copy(
      new java.io.File(base, "part-00000.avro").toPath,
      new java.io.File(mixed, "a.avro").toPath)
    java.nio.file.Files.copy(
      new java.io.File(s"$dir/evol2", "part-00000.avro").toPath,
      new java.io.File(mixed, "b.avro").toPath)
    val uni = AvroIO.read(spark, mixed.getPath, Some(readerJson))
      .collect().sortBy(_.getLong(2))
    assert(uni.map(r => (r.getLong(2), r.getString(1))).toSeq ===
      Seq((1L, "none"), (2L, "none"), (3L, "real")))
  }
}
