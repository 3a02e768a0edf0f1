package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for specs (one JVM-wide session, UTC, small
  * shuffle parallelism for test speed).
  */
object SparkFixture {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    // NIO local fs (see graft.util.NioLocalFs): no forked chmod/ls/
    // readlink per local-fs metadata op — the bench/verify surfaces
    // run with the same fs, so specs exercise the shipped path
    .config("spark.hadoop.fs.file.impl", "graft.util.NioLocalFileSystem")
    .config("spark.hadoop.fs.AbstractFileSystem.file.impl", "graft.util.NioLocalFs")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

trait SparkFixture {
  lazy val spark: SparkSession = {
    val s = SparkFixture.spark
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
