package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table access helpers for the driver testdata layout:
  * one parquet file per table under each scale-factor dir (TESTDATA.md).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` has shipped in two parquet flavors across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects — read nanos as long, convert to µs with INTEGER division:
    * ns values ~1.7e18 exceed double's 2^53 exact range, so a
    * double-division route would corrupt timestamps) and plain µs
    * TIMESTAMP with isAdjustedToUTC=false (Spark: TIMESTAMP_NTZ).
    * Normalize both to session-zone TimestampType — the session runs
    * UTC, so the NTZ cast is wall-clock-preserving and every consumer
    * sees one type.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType.typeName match {
      case "long" => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}
