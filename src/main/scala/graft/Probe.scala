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
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val jobTime = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); starts.put(j.jobId, System.nanoTime())
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(j.jobId); if (t0 != null) jobTime.addAndGet(System.nanoTime() - t0)
      }
    })
    time("sync_pipeline")(SparkEntry.queries("sync_pipeline")(spark, dir).count())
    println(s"jobs=${jobs.get()} jobTimeSec=${jobTime.get() / 1e9}")
    spark.stop()
  }
}
