package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off SCALE PROBE data generator (dev tooling, not part of the
  * shipped library): replica-scales the driver's sf0.1 tables by K
  * (default 10 ≈ sf1) so the bench can measure how every plan grows
  * with data volume on this box. TPC-H semantics guide the shape:
  * `region`/`nation` stay fixed-size (as at every TPC-H SF); the
  * SF-scaled tables replicate K× with ALL entity keys shifted by a
  * per-entity stride so primary keys stay unique and every
  * foreign-key join keeps exactly its per-replica match set (replica
  * i's orders reference replica i's customers, etc.). Value columns
  * repeat — this probes plan scaling (shuffle growth, broadcast
  * gates, index build cost), not TPC-H value distributions; dedup
  * families see K× exact duplicates, which only makes their work
  * strictly harder.
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft-sf1")
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rd(n: String): DataFrame = spark.read.parquet(s"$src/$n.parquet")
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).collect()(0).getLong(0) + 1L

    val custOff = maxOf(rd("customer"), "c_custkey")
    val suppOff = maxOf(rd("supplier"), "s_suppkey")
    val partOff = maxOf(rd("part"), "p_partkey")
    val orderOff = maxOf(rd("orders"), "o_orderkey")
    val eventOff = maxOf(rd("events"), "event_id")
    val userOff = maxOf(rd("events"), "user_id")
    // documents and embeddings pair by id — one shared stride keeps
    // doc_id/vec_id alignment across replicas
    val docOff = math.max(maxOf(rd("documents"), "doc_id"), maxOf(rd("embeddings"), "vec_id"))

    def scaled(n: String, shifts: (String, Long)*): Unit = {
      val df = rd(n)
      val shiftMap = shifts.toMap
      val reps = spark.range(k).select(col("id").as("_rep"))
      df.crossJoin(reps)
        .select(df.columns.toIndexedSeq.map(c =>
          shiftMap.get(c).map(o => (col(c) + col("_rep") * o).as(c)).getOrElse(col(c))): _*)
        .write.mode("overwrite").parquet(s"$out/$n.parquet")
      println(s"[scale] $n x$k done")
    }
    def copied(n: String): Unit = {
      rd(n).write.mode("overwrite").parquet(s"$out/$n.parquet")
      println(s"[scale] $n copied 1x")
    }

    copied("region")
    copied("nation")
    scaled("customer", "c_custkey" -> custOff)
    scaled("supplier", "s_suppkey" -> suppOff)
    scaled("part", "p_partkey" -> partOff)
    scaled("orders", "o_orderkey" -> orderOff, "o_custkey" -> custOff)
    scaled("lineitem", "l_orderkey" -> orderOff, "l_partkey" -> partOff,
      "l_suppkey" -> suppOff)
    scaled("events", "event_id" -> eventOff, "user_id" -> userOff)
    scaled("documents", "doc_id" -> docOff)
    scaled("embeddings", "vec_id" -> docOff)
    spark.stop()
  }
}
