package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling/plan-inspection main (not part of the library
  * surface).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    Tables.names.foreach(n => Tables.t(spark, dir, n).count())
    time("sim_topk_ivf")(SparkEntry.queries("sim_topk_ivf")(spark, dir).count())
    time("sim_topk_ivf x2")(SparkEntry.queries("sim_topk_ivf")(spark, dir).count())
    spark.stop()
  }
}
