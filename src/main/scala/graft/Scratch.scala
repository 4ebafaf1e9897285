package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{IcebergIO, IcebergWrite}

/** Scratchpad main — overwrite freely. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("scratch").master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._

    def fresh(name: String): String = {
      val d = s"/tmp/graft_scratch_$name"
      graft.sources.IcebergFixture.deleteRecursively(d)
      d
    }

    // ---- 1. scoped equality delete on a partitioned table
    val t1 = fresh("scoped_eq")
    val rows = Seq((1L, "a", "p1"), (2L, "b", "p1"), (3L, "a", "p2"),
      (4L, "c", "p2"), (5L, "a", "p3"), (6L, null.asInstanceOf[String], "p3"))
      .toDF("id", "k", "p")
    IcebergWrite.create(spark, t1, rows.schema, partitionCols = Seq("p"))
    IcebergWrite.append(rows, t1)
    // delete k='a' (spans p1,p2,p3) and k=null (null-safe)
    IcebergWrite.deleteEquality(Seq(("a"), (null.asInstanceOf[String])).toDF("k"), t1)
    val left = IcebergIO.read(spark, t1).orderBy("id").collect()
    println("scoped_eq left: " + left.map(_.getLong(0)).mkString(","))
    assert(left.map(_.getLong(0)).toSeq == Seq(2L, 4L), "scoped eq delete wrong")
    // append a NEW 'a' row after the delete: must survive (seq rule)
    IcebergWrite.append(Seq((7L, "a", "p1")).toDF("id", "k", "p"), t1)
    val left2 = IcebergIO.read(spark, t1).orderBy("id").collect().map(_.getLong(0)).toSeq
    println("scoped_eq after re-append: " + left2.mkString(","))
    assert(left2 == Seq(2L, 4L, 7L), "seq rule broken")

    // ---- 2. upsert on a partitioned table
    val t2 = fresh("upsert_part")
    val base = Seq((1L, "one", "p1"), (2L, "two", "p1"), (3L, "three", "p2"))
      .toDF("id", "v", "p")
    IcebergWrite.create(spark, t2, base.schema, partitionCols = Seq("p"))
    IcebergWrite.append(base, t2)
    // update id=2 (moves partition p1->p2!), insert id=4
    val up = Seq((2L, "TWO", "p2"), (4L, "four", "p3")).toDF("id", "v", "p")
    val snaps0 = IcebergIO.loadMetadata(t2).snapshots.size
    IcebergWrite.upsert(up, t2, Seq("id"))
    val snaps1 = IcebergIO.loadMetadata(t2).snapshots.size
    assert(snaps1 == snaps0 + 1, s"upsert must be ONE snapshot, got ${snaps1 - snaps0}")
    val got = IcebergIO.read(spark, t2).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    println("upsert_part: " + got.mkString(","))
    assert(got == Seq((1L, "one", "p1"), (2L, "TWO", "p2"), (3L, "three", "p2"), (4L, "four", "p3")),
      s"upsert wrong: $got")

    // ---- 3. upsert unpartitioned + empty-table upsert
    val t3 = fresh("upsert_flat")
    IcebergWrite.create(spark, t3, base.select("id", "v").schema)
    IcebergWrite.upsert(Seq((1L, "x")).toDF("id", "v"), t3, Seq("id")) // empty -> append
    IcebergWrite.upsert(Seq((1L, "y"), (2L, "z")).toDF("id", "v"), t3, Seq("id"))
    val g3 = IcebergIO.read(spark, t3).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    println("upsert_flat: " + g3.mkString(","))
    assert(g3 == Seq((1L, "y"), (2L, "z")), s"flat upsert wrong: $g3")

    // ---- 4. rollback + tags
    val t4 = fresh("rollback")
    IcebergWrite.create(spark, t4, base.select("id", "v").schema)
    val s1 = IcebergWrite.append(Seq((1L, "a")).toDF("id", "v"), t4)
    IcebergWrite.createTag(t4, "after-first", s1)
    val s2 = IcebergWrite.append(Seq((2L, "b")).toDF("id", "v"), t4)
    assert(IcebergIO.read(spark, t4).count() == 2)
    IcebergWrite.setCurrentSnapshot(t4, s1)
    assert(IcebergIO.read(spark, t4).count() == 1, "rollback didn't restore")
    assert(IcebergIO.read(spark, t4, snapshotId = Some(s2)).count() == 2,
      "later snapshot must stay time-travelable")
    assert(IcebergIO.read(spark, t4, ref = Some("after-first")).count() == 1)
    // append after rollback: new lineage from s1
    val s3 = IcebergWrite.append(Seq((3L, "c")).toDF("id", "v"), t4)
    val g4 = IcebergIO.read(spark, t4).orderBy("id").collect().map(_.getLong(0)).toSeq
    println(s"rollback s1=$s1 s2=$s2 s3=$s3 read: " + g4.mkString(","))
    assert(g4 == Seq(1L, 3L), s"post-rollback append wrong: $g4")
    IcebergWrite.createBranch(t4, "exp", s2)
    assert(IcebergIO.read(spark, t4, ref = Some("exp")).count() == 2)
    IcebergWrite.dropRef(t4, "exp")
    try { IcebergIO.read(spark, t4, ref = Some("exp")).count(); assert(false, "dropped ref resolved") }
    catch { case e: IllegalArgumentException => println("dropRef ok: " + e.getMessage.take(60)) }

    println("ALL SCRATCH CHECKS PASSED")
    spark.stop()
  }
}
