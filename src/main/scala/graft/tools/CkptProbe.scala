package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Micro-times the components of one driver-side checkpoint commit. */
object CkptProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Files.createTempDirectory("ckpt-probe").toString
    val conf = spark.sparkContext.hadoopConfiguration
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val msg = Types.buildMessage()
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("sync_id")
      .required(INT64).named("seq")
      .named("m")
    val n = 30
    def bench(label: String)(write: Int => Unit): Unit = {
      write(0) // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(write)
      println(f"$label ${(System.nanoTime() - t0) / 1e6 / n}%.2f")
    }
    bench("hadoop_ms") { i =>
      val w = org.apache.parquet.hadoop.example.ExampleParquetWriter
        .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
          new org.apache.hadoop.fs.Path(s"$dir/h$i.parquet"), conf))
        .withType(msg).build()
      val g = new org.apache.parquet.example.data.simple.SimpleGroup(msg)
      g.append("sync_id", "x"); g.append("seq", i.toLong)
      w.write(g); w.close()
    }
    bench("local_ms") { i =>
      val w = org.apache.parquet.hadoop.example.ExampleParquetWriter
        .builder(new org.apache.parquet.io.LocalOutputFile(
          java.nio.file.Paths.get(s"$dir/l$i.parquet")))
        .withType(msg).build()
      val g = new org.apache.parquet.example.data.simple.SimpleGroup(msg)
      g.append("sync_id", "x"); g.append("seq", i.toLong)
      w.write(g); w.close()
    }
    spark.stop()
  }
}
