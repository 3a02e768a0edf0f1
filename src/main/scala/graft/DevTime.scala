package graft

import org.apache.spark.sql.SparkSession

/** Dev-loop timer: run named queries (args: sfDir, names...) twice like
  * [[Bench]], print per-pass seconds plus the sync-metrics registry, so
  * a single query's perf can be iterated without the full 98-query run.
  */
object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).flatMap(_.split(",")).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(n =>
      try Tables.t(spark, sfDir, n).count() catch { case _: Throwable => () })
    try SparkEntry.queries.get("agg_pricing_summary").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }
    try graft.operators.ShingleIndex.ensureBuilt(spark, sfDir)
    catch { case _: Throwable => () }
    try graft.operators.ClusterIndex.ensureBuilt(spark, sfDir)
    catch { case _: Throwable => () }
    try graft.operators.LmIndex.ensureBuilt(spark, sfDir)
    catch { case _: Throwable => () }
    for (pass <- 1 to 2; name <- names) {
      val fn = SparkEntry.queries(name)
      System.gc()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[devtime] pass$pass $name ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    for (id <- Seq("analytics.orders_sync", "analytics.orders_all",
        "analytics.customer_all", "analytics.orders_evo")) {
      val m = graft.sync.SyncMetrics.global.of(id)
      if (m.commits.sum > 0)
        println(s"[devtime] sync $id commits=${m.commits.sum} " +
          s"latMean=${m.commitLatencyMsSum.sum / math.max(1, m.commits.sum)}ms " +
          s"latMax=${m.commitLatencyMsMax.get}ms")
    }
    spark.stop()
  }
}
