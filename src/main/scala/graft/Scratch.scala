package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{IcebergIO, IcebergWrite}

/** scratchpad: conditional MERGE smoke test. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = "/tmp/graft_scratch_merge"
    graft.sources.IcebergFixture.deleteRecursively(dir)
    val base = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0))
      .toDF("id", "name", "amt")
    IcebergWrite.create(spark, dir, base.schema, partitionCols = Seq("id"))
    IcebergWrite.append(base, dir)
    // delete id=4 first so merge sees current state without it
    IcebergWrite.deleteWhere(spark, dir, col("id") === 4)

    val src = Seq((1, 5.0, "upd"), (2, 100.0, "del"), (4, 7.0, "ressurect?"),
      (5, 50.0, "ins"), (6, 1.0, "skip")).toDF("id", "delta", "tag")
    IcebergWrite.merge(spark, dir, src, Seq("id"), Seq(
      IcebergWrite.WhenMatchedDelete(Some(expr("s.delta > 50"))),
      IcebergWrite.WhenMatchedUpdate(
        Map("amt" -> expr("t.amt + s.delta"), "name" -> expr("concat(t.name, '_', s.tag)"))),
      IcebergWrite.WhenNotMatchedInsert(
        Map("id" -> expr("s.id"), "name" -> expr("s.tag"), "amt" -> expr("s.delta")),
        cond = Some(expr("s.delta >= 10")))
    ))
    IcebergIO.read(spark, dir).orderBy("id").show()
    // expect: 1,a_upd,15 | (2 deleted) | 3,c,30 | 4,ressurect?,7 INSERTED (4 was deleted -> not matched!) | 5,ins,50 | 6 skipped (delta<10)
    // hmm: id=4 deleted earlier -> source row 4 is NOT MATCHED, delta=7 < 10 -> skipped. good, no resurrection.

    // SQL surface
    val g = GraftSession.wrap(spark)
    g.registerIceberg("m_t", dir)
    src.createOrReplaceTempView("m_s")
    g.sql("""MERGE INTO m_t t USING m_s s ON t.id = s.id
            |WHEN MATCHED AND s.tag = 'upd' THEN UPDATE SET amt = t.amt * 2
            |WHEN MATCHED THEN DELETE
            |WHEN NOT MATCHED AND s.delta > 40 THEN INSERT (id, name) VALUES (s.id + 1000, upper(s.tag))""".stripMargin)
    g.sql("SELECT * FROM m_t ORDER BY id").show()
    spark.stop()
  }
}
