package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.sync.{CheckpointRecord, CheckpointStore, SyncState}
import graft.table.IceliteTable

/** Micro-probe for icelite's per-commit fixed cost (VERDICT r10 #2):
  * times N driver-side checkpoint commits and N tiny Spark appends,
  * printing per-commit milliseconds. Not part of the bench surface —
  * a diagnosis tool for the commit path.
  */
object CommitProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = if (args.nonEmpty) args(0).toInt else 30

    // driver-side checkpoint commits (no Spark jobs)
    val wh = Files.createTempDirectory("probe-wh").toString
    val store = new CheckpointStore(spark, wh)
    val t0 = System.nanoTime()
    (1 to n).foreach { i =>
      store.write(CheckpointRecord("db.probe", SyncState.SteadyState,
        "db", "probe", Some(i.toLong), None, i.toLong, i.toLong, i.toLong,
        System.currentTimeMillis()))
    }
    val ckptMs = (System.nanoTime() - t0) / 1e6 / n

    // tiny Spark appends (initial-sync chunk shape)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val tbl = IceliteTable.create(spark, wh, "p", "t", schema)
    val df = spark.range(200).selectExpr("id", "concat('v', id) as v")
    df.count() // warm
    val t1 = System.nanoTime()
    (1 to n).foreach(_ => tbl.append(df))
    val appendMs = (System.nanoTime() - t1) / 1e6 / n

    // upsert commits (steady-state change-batch shape: data + deletes)
    val t2 = System.nanoTime()
    (1 to n).foreach(_ => tbl.upsert(df, Seq("id")))
    val upsertMs = (System.nanoTime() - t2) / 1e6 / n

    println(f"""{"checkpoint_commit_ms":$ckptMs%.1f,"append_commit_ms":$appendMs%.1f,"upsert_commit_ms":$upsertMs%.1f,"n":$n}""")
    spark.stop()
  }
}
