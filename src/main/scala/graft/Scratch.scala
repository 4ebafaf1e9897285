package graft

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").appName("scratch")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    import org.apache.spark.sql.functions._
    import graft.operators.Curation

    val keys = spark.range(0, 300).select(
      concat(lit("member_"), col("id")).as("key"))
    val bits = 16384L; val k = 5; val seed = "bl"
    val filt = Curation.bloomBuild(keys, "key", bits, k, seed)
    filt.cache()
    println("filter words: " + filt.count())
    println("word sum: " + filt.agg(sum(col("word"))).collect()(0).getLong(0))

    // probe members + non-members via join form
    val probes = spark.range(0, 600).select(
      concat(lit("member_"), col("id")).as("key"))
    val hit = Curation.bloomProbe(probes, "key", filt, bits, k, seed)
    val agg = hit.select(
      sum(when(col("bloom_hit"), 1L).otherwise(0L)).as("n_hit"),
      count(lit(1)).as("n")).collect()(0)
    println(s"join-form: hits=${agg.getLong(0)} of ${agg.getLong(1)}")

    // fold twin bit-equality
    val bf = Curation.collectBloom(filt, bits, k, seed)
    val foldHit = probes.select(col("key"),
      Curation.bloomMaybeContains(col("key"), bf).as("fh"))
    val joined = hit.join(foldHit, "key")
      .filter(col("bloom_hit") =!= col("fh"))
    println("fold mismatches: " + joined.count())

    // members must ALL hit (no false negatives)
    val fn = hit.join(keys, "key").filter(!col("bloom_hit")).count()
    println("false negatives: " + fn)
    spark.stop()
  }
}
