import org.apache.spark.sql.SparkSession
object CanonDbg {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d1 = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val d2 = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val c1 = d1.queryExecution.optimizedPlan.canonicalized
    val c2 = d2.queryExecution.optimizedPlan.canonicalized
    println("relation canon equal: " + (c1 == c2))
    import org.apache.spark.sql.functions._
    val p1 = d1.select(col("l_returnflag"), floor(col("l_quantity")*100).cast("long").as("q")).queryExecution.optimizedPlan.canonicalized
    val p2 = d2.select(col("l_returnflag"), floor(col("l_quantity")*100).cast("long").as("q")).queryExecution.optimizedPlan.canonicalized
    println("project canon equal: " + (p1 == p2))
  }
}
