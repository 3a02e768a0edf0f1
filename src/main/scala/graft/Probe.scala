package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, Similarity}

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    Tables.names.foreach(n => Tables.t(spark, dir, n).count())

    time("shingleStream")(Dedup.shingleStream(Tables.t(spark, dir, "documents")).count())
    time("ngramJaccard")(Dedup.ngramJaccard(spark, dir).count())
    time("minhashLsh")(Dedup.minhashLsh(spark, dir).count())
    time("embeddingCosine")(Dedup.embeddingCosine(spark, dir).count())
    time("topkBruteForce")(Similarity.topkBruteForce(spark, dir).count())
    time("topkLsh")(Similarity.topkLsh(spark, dir).count())
    spark.stop()
  }
}
