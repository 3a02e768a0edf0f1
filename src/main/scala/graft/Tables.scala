package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access helpers for the driver testdata layout:
  * one parquet file per table under each scale-factor dir (TESTDATA.md).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
