package graft

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/**
 * A local-disk FileSystem registered under the NON-default scheme
 * `grafttest://` (via `fs.grafttest.impl` in the Hadoop configuration).
 * Reading/writing through it proves the in-repo sources resolve paths
 * through the Hadoop FileSystem scheme registry — exactly how `s3a://`,
 * `hdfs://` or `abfs://` resolve on a real cluster — and that no
 * `java.io.File(path)` remains on any read or write path (a `grafttest://`
 * URI handed to `java.io.File` would throw or mangle).
 *
 * Must be a top-level class: Hadoop instantiates it reflectively by the
 * class name in the conf value.
 */
class GraftTestFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("grafttest:///")
}

object GraftTestFileSystem {
  val Scheme = "grafttest"
  val ConfKey = s"fs.$Scheme.impl"
  val ConfValue = classOf[GraftTestFileSystem].getName

  /** Register the scheme in a session's Hadoop configuration. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.hadoopConfiguration.set(ConfKey, ConfValue)

  def uri(localPath: String): String = s"$Scheme://$localPath"
}
