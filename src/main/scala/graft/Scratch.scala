package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{IcebergIO, IcebergWrite, PuffinIO}

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .appName("scratch").getOrCreate()
    import spark.implicits._
    val dir = "/tmp/graft_dv_smoke"
    graft.sources.IcebergFixture.deleteRecursively(dir)

    val df = (0L until 100L).map(i => (i, s"name_$i", i % 7)).toDF("id", "name", "grp")
    IcebergWrite.create(spark, dir, df.schema, formatVersion = 3)
    IcebergWrite.append(df.filter(col("id") < 50), dir)
    IcebergWrite.append(df.filter(col("id") >= 50), dir)
    println("count after appends: " + IcebergIO.read(spark, dir).count()) // 100

    // delete 1: ids divisible by 10
    IcebergWrite.deleteWhere(spark, dir, col("id") % 10 === 0)
    val c1 = IcebergIO.read(spark, dir).count()
    println(s"after delete1: $c1 (expect 90)")
    assert(c1 == 90)

    // .files should show PUFFIN DV entries
    IcebergIO.files(spark, dir).show(20, false)

    // delete 2: overlapping (divisible by 5) -> DVs must MERGE
    IcebergWrite.deleteWhere(spark, dir, col("id") % 5 === 0)
    val c2 = IcebergIO.read(spark, dir).count()
    println(s"after delete2: $c2 (expect 80)")
    assert(c2 == 80)
    // exactly one live DV per affected data file
    val dvs = IcebergIO.deleteFiles(spark, dir)
      .filter(col("file_format") === "PUFFIN").collect()
    println("live DVs: " + dvs.length)
    // appends fan out over local[8] partitions -> many data files; the
    // merged DVs must cover exactly the 20 deleted positions, all in
    // ONE puffin file (the second commit's, absorbing the first's)
    assert(dvs.map(_.getAs[Long]("record_count")).sum == 20,
      dvs.map(_.getAs[Long]("record_count")).sum.toString)
    assert(dvs.map(_.getAs[String]("file_name")).distinct.length == 1)
    assert(dvs.forall(_.getAs[Long]("sequence_number") == 4L))

    // time travel to the first delete
    val meta = IcebergIO.loadMetadata(dir)
    val snaps = meta.snapshots.map(_.snapshotId).sorted
    val afterDelete1 = IcebergIO.read(spark, dir, snapshotId = Some(snaps(2))).count()
    assert(afterDelete1 == 90, s"time travel: $afterDelete1")

    // updateWhere on v3: moves rows, DV + rewrite in one snapshot
    IcebergWrite.updateWhere(spark, dir, col("id") === 1L,
      Map("name" -> lit("updated")))
    val upd = IcebergIO.read(spark, dir).filter(col("id") === 1L)
      .select("name").as[String].collect()
    assert(upd.toSeq == Seq("updated"), upd.toSeq.toString)
    assert(IcebergIO.read(spark, dir).count() == 80)

    // upsert (equality deletes on v3 are legal) then convert to DVs
    IcebergWrite.upsert(Seq((2L, "upserted", 2L)).toDF("id", "name", "grp"), dir, Seq("id"))
    assert(IcebergIO.read(spark, dir).count() == 80)
    IcebergWrite.convertEqualityDeletes(spark, dir)
    assert(IcebergIO.files(spark, dir).filter(col("content") === 2).count() == 0,
      "eq deletes should be gone")
    assert(IcebergIO.read(spark, dir).count() == 80)
    assert(IcebergIO.read(spark, dir).filter(col("id") === 2L)
      .select("name").as[String].collect().toSeq == Seq("upserted"))

    // consolidate DVs into one puffin
    IcebergWrite.rewritePositionDeletes(spark, dir)
    val dvR = IcebergIO.deleteFiles(spark, dir)
      .filter(col("file_format") === "PUFFIN").collect()
    println("after consolidate: " + dvR.toSeq)
    assert(dvR.map(_.getAs[String]("file_name")).distinct.length == 1,
      "expected ONE puffin file")
    assert(IcebergIO.read(spark, dir).count() == 80)

    // compact folds everything away
    IcebergWrite.compact(spark, dir)
    val metaK = IcebergIO.loadMetadata(dir)
    assert(IcebergIO.files(spark, dir).filter(col("content") =!= 0).count() == 0,
      "compact should drop deletes")
    assert(IcebergIO.read(spark, dir).count() == 80)
    assert(IcebergIO.read(spark, dir).filter(col("id") === 1L)
      .select("name").as[String].collect().toSeq == Seq("updated"))

    // next-row-id advanced
    println("next-row-id: " + {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(graft.sources.GraftFs.readUtf8(metaK.metadataFile))
      root.get("next-row-id")
    })
    println("DV smoke OK")
    spark.stop()
  }
}
