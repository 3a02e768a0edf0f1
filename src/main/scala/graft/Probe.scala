package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.config._
    import graft.sync.{ChangeStreamSync, CheckpointStore, InitialSync}
    import graft.table.IceliteTable

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    Tables.names.foreach(n => Tables.t(spark, dir, n).count())

    val wh = Files.createTempDirectory("probe-sync").toString
    val cfg = CollectionSyncConfig(
      SourceConfig("orders"), TargetConfig("analytics", "orders_sync"),
      batch = BatchConfig(maxRecords = 50000, maxBytes = 128L << 20, flushIntervalSeconds = 60))
    val src = Tables.t(spark, dir, "orders")
      .withColumn("_id", format_string("%012d", col("o_orderkey")))
    val table = time("create")(IceliteTable.create(spark, wh, "analytics", "orders_sync", src.schema))
    val ckpts = time("ckpt store")(new CheckpointStore(spark, wh))
    time("append 50k direct")(table.append(src.limit(50000)))
    time("ckpt write direct")(ckpts.write(graft.sync.CheckpointRecord(
      "x", "INITIAL_SYNC", "shop", "orders", None, Some("a"), 1L, 1L, -1L, 0L)))
    time("ckpt write direct 2")(ckpts.write(graft.sync.CheckpointRecord(
      "x", "INITIAL_SYNC", "shop", "orders", None, Some("b"), 2L, 2L, -1L, 0L)))
    time("initial sync")(new InitialSync(spark, cfg, table, ckpts, "shop").run(src))
    val updates = src
      .filter(pmod(col("o_orderkey"), lit(97)) === 0 && pmod(col("o_orderkey"), lit(101)) =!= 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .select(col("o_orderkey").as("seq"), lit("update").as("op"), col("_id"),
        to_json(struct(src.columns.map(col).toSeq: _*)).as("fullDocument"),
        lit(null).cast("timestamp").as("clusterTime"))
    val deletes = src.filter(pmod(col("o_orderkey"), lit(101)) === 0)
      .select(col("o_orderkey").as("seq"), lit("delete").as("op"), col("_id"),
        lit(null).cast("string").as("fullDocument"),
        lit(null).cast("timestamp").as("clusterTime"))
    val batch = updates.unionByName(deletes)
      .select(ChangeStreamSync.EventSchema.fieldNames.map(col).toSeq: _*)
    time("processBatch")(new ChangeStreamSync(spark, cfg, table, ckpts, "shop").processBatch(batch, 0))
    time("read+agg")(table.read()
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders")).collect())
    spark.stop()
  }
}
