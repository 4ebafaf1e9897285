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

    // Avro round-trip on region
    val g = GraftSession.wrap(spark)
    g.writeAvro(spark.table("region"), "/tmp/scratch_avro_region")
    val back = g.readAvro("/tmp/scratch_avro_region")
    back.orderBy("r_regionkey").show(5, 60)
    println("rows=" + back.count())
    println("orig schema: " + spark.table("region").schema.simpleString)
    println("back schema: " + back.schema.simpleString)

    // Nested types round-trip: embeddings has array<float>
    val emb = spark.table("embeddings").limit(100)
    println("emb schema: " + emb.schema.simpleString)
    g.writeAvro(emb, "/tmp/scratch_avro_emb")
    val embBack = g.readAvro("/tmp/scratch_avro_emb")
    println("embBack schema: " + embBack.schema.simpleString)
    println("emb rows=" + embBack.count())

    // Iceberg stub
    try g.readIceberg("/tmp/nope")
    catch { case e: UnsupportedOperationException => println("iceberg msg: " + e.getMessage) }

    // run the registered avro_read query end-to-end
    val q = graft.queries.DdlQueries.ddlAvroRead
    q.run(spark, sf).show(5, 60)

    spark.stop()
  }
}
