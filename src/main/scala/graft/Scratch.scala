package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratchpad main — overwrite freely (CLAUDE.md). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sf = "/root/testdata/sf0.01"
    graft.queries.Registry.prepare(spark, sf)
    val g = GraftSession.wrap(spark)
    println("useV1SourceList before: " + spark.conf.get("spark.sql.sources.useV1SourceList"))
    spark.conf.set("spark.sql.sources.useV1SourceList",
      "csv,json,kafka,orc,parquet,text")
    println("set OK, runtime-settable")

    // write container files, then read through the V2 short name
    g.writeAvro(spark.table("nation"), "/tmp/scratch_v2_nation")
    val df = spark.read.format("avro").load("/tmp/scratch_v2_nation")
    println("v2 schema: " + df.schema.simpleString)
    df.orderBy("n_nationkey").show(3)

    // column pruning visible in the plan?
    val pruned = df.select("n_name")
    pruned.explain("formatted")
    println("pruned count: " + pruned.count())

    // USING avro DDL (catalog table)
    spark.sql("DROP TABLE IF EXISTS v2_nation")
    spark.sql("CREATE TABLE v2_nation USING avro OPTIONS (path '/tmp/scratch_v2_nation')")
    spark.sql("SELECT COUNT(*) c, SUM(n_nationkey) s FROM v2_nation").show()

    // reference-dialect DDL through the translator (no intercept needed?)
    g.sql("DROP TABLE IF EXISTS v2_nation2")
    val translated = ExternalTableDdl.translate(
      "CREATE EXTERNAL TABLE v2_nation2 STORED AS AVRO LOCATION '/tmp/scratch_v2_nation'")
    println("translated: " + translated)
    spark.sql(translated.get)
    spark.sql("SELECT COUNT(*) c FROM v2_nation2").show()

    // array<float> through V2
    g.writeAvro(spark.table("embeddings").limit(50), "/tmp/scratch_v2_emb")
    val emb = spark.read.format("avro").load("/tmp/scratch_v2_emb")
    println("emb v2: " + emb.schema.simpleString + " rows=" + emb.count())
    emb.select(expr("vec_dot(embedding, embedding)").as("norm2")).show(2)

    spark.stop()
  }
}
