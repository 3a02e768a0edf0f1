package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Ad-hoc per-job profiler for optimization work (not part of the
  * driver contract): runs named queries once (after the same warmup
  * Bench does) and prints one line per Spark job — duration, stage
  * count, task count, and the job group/description if set — so the
  * per-query wall time decomposes into its actual job chain.
  */
object Probe {
  private final class JobLog extends SparkListener {
    case class J(id: Int, t0: Long, var t1: Long = 0L, var stages: Int = 0,
        var tasks: Int = 0, var desc: String = "")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val j = J(e.jobId, e.time)
      j.stages = e.stageInfos.size
      j.tasks = e.stageInfos.map(_.numTasks).sum
      j.desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
      jobs.put(e.jobId, j)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      val j = jobs.get(e.jobId); if (j != null) j.t1 = e.time
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args.toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.hadoop.fs.file.impl", "graft.util.NioLocalFileSystem")
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl", "graft.util.NioLocalFs")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(n =>
      try Tables.t(spark, sfDir, n).count() catch { case _: Throwable => () })
    try SparkEntry.queries.get("agg_pricing_summary").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }
    val log = new JobLog
    spark.sparkContext.addSparkListener(log)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // two runs like the bench; report both so warm-vs-steady separates
      for (p <- 1 to 2) {
        log.jobs.clear()
        System.gc()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        try org.apache.spark.graft.ListenerFlush.flush(spark.sparkContext)
        catch { case _: Throwable => () }
        import scala.jdk.CollectionConverters._
        val js = log.jobs.values.asScala.toSeq.sortBy(_.t0)
        val jsum = js.map(j => (j.t1 - j.t0) / 1e3).sum
        println(f"== $name pass $p: wall $wall%.3f s, ${js.size} jobs, sum ${jsum}%.3f s")
        js.foreach { j =>
          println(f"   job ${j.id}%4d  ${(j.t1 - j.t0) / 1e3}%7.3f s  stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.desc.take(90)}")
        }
      }
    }
    spark.stop()
  }
}
