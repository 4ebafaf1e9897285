package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Scratchpad main — overwrite freely (tools/run.sh graft.Scratch). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").appName("scratch").getOrCreate()
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val dir = s"/tmp/scratch_fid_${java.util.UUID.randomUUID().toString.take(8)}"

    def fld(name: String, dt: DataType, id: Int) =
      StructField(name, dt, nullable = true,
        metadata = new MetadataBuilder().putLong("parquet.field.id", id.toLong).build())

    // file A: ids 1,2 only (no _row_id)
    val sA = StructType(Seq(fld("id", LongType, 1), fld("name", StringType, 2)))
    val la = new java.util.ArrayList[Row](); la.add(Row(1L, "a")); la.add(Row(2L, "b"))
    spark.createDataFrame(la, sA).write.parquet(s"$dir/a")
    // file B: ids 1,2 plus _row_id with reserved id 2147483540
    val sB = StructType(Seq(fld("id", LongType, 1), fld("name", StringType, 2),
      fld("_row_id", LongType, 2147483540)))
    val lb = new java.util.ArrayList[Row](); lb.add(Row(3L, "c", 100L))
    spark.createDataFrame(lb, sB).write.parquet(s"$dir/b")

    // read BOTH with a schema requesting the _row_id id
    val paths = Seq(s"$dir/a", s"$dir/b").flatMap { d =>
      new java.io.File(d).listFiles().filter(_.getName.endsWith(".parquet")).map(_.toString)
    }
    val got = spark.read.schema(sB).parquet(paths: _*)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getLong(2))).sortBy(_._1).toSeq
    println("RESULT: " + got.mkString(" | "))
    assert(got == Seq((1L, "a", null), (2L, "b", null), (3L, "c", 100L)),
      "fieldId read of a missing id must yield NULL")
    println("OK: missing field id reads as NULL")
    spark.stop()
  }
}
