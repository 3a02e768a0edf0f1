package graft.tools
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Files.createTempDirectory("wp").toString
    val df = spark.range(200).selectExpr("id", "concat('v', id) as v")
    df.count()
    val n = 30
    val t0 = System.nanoTime()
    (1 to n).foreach(i => df.write.parquet(s"$base/d$i"))
    println(f"raw_write_ms ${(System.nanoTime()-t0)/1e6/n}%.1f")
    val t1 = System.nanoTime()
    (1 to n).foreach(i => df.count())
    println(f"count_job_ms ${(System.nanoTime()-t1)/1e6/n}%.1f")
    spark.stop()
  }
}
