package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling/plan-inspection main (not part of the library
  * surface).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val interesting = Seq(
      "agg_pricing_summary", "filter_agg_revenue", "join_broadcast_dim",
      "join_shipping_priority", "asof_join", "range_join", "sim_topk_bruteforce")
    interesting.foreach { name =>
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
