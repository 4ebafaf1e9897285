package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

object Scratch {
  def main(args: Array[String]): Unit = {
    // write a GEOMETRY-annotated parquet via the Group API
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.schema.Type.Repetition
    val path = s"/tmp/graft_scr_geo_${java.util.UUID.randomUUID().toString.take(8)}.parquet"
    val mt = Types.buildMessage()
      .addField(Types.primitive(PrimitiveTypeName.INT64, Repetition.REQUIRED)
        .named("id"))
      .addField(Types.primitive(PrimitiveTypeName.BINARY, Repetition.REQUIRED)
        .as(LogicalTypeAnnotation.geometryType("OGC:CRS84"))
        .named("geom"))
      .named("graft_geo_fixture")
    val conf = new org.apache.hadoop.conf.Configuration()
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(mt, conf)
    val w = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(path))
      .withConf(conf).withType(mt).build()
    val f = new org.apache.parquet.example.data.simple.SimpleGroupFactory(mt)
    // WKB point(1 2): 0101000000 + doubles LE
    def wkbPoint(x: Double, y: Double): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(21).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(1.toByte); bb.putInt(1); bb.putDouble(x); bb.putDouble(y)
      bb.array()
    }
    try (0L until 3L).foreach { i =>
      w.write(f.newGroup().append("id", i)
        .append("geom", org.apache.parquet.io.api.Binary.fromConstantByteArray(wkbPoint(i.toDouble, i * 2.0))))
    } finally w.close()
    println("wrote " + path)

    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", false).appName("scratch").getOrCreate()
    try {
      // attempt 1: inferred schema
      try {
        spark.read.parquet(path).printSchema()
        spark.read.parquet(path).show(5, false)
        println("INFERRED READ OK")
      } catch { case e: Exception => println("inferred read failed: " + e.getMessage.take(300)) }
      // attempt 2: explicit BinaryType read schema
      try {
        val rs = StructType(Seq(StructField("id", LongType), StructField("geom", BinaryType)))
        val got = spark.read.schema(rs).parquet(path).collect()
        println("EXPLICIT READ OK: " + got.map(r => (r.getLong(0), r.getAs[Array[Byte]](1).map("%02x".format(_)).mkString)).toSeq)
      } catch { case e: Exception => println("explicit read failed: " + e.getMessage.take(300)) }
    } finally spark.stop()
  }
}
