package graft.sql

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.table.IceliteTable
import graft.util.Scratch

/** Native icelite streaming sink ([[IceliteSinkProvider]]): batch-id
  * exactly-once over at-least-once replay, append/upsert modes through
  * a real file stream, and option validation.
  */
class IceliteSinkSpec extends AnyFunSuite with SparkFixture {

  test("append mode lands one commit per micro-batch; replayed batch ids are skipped") {
    import spark.implicits._
    val wh = Scratch.dir("sink-spec")
    val t = IceliteTable.create(spark, wh, "ns", "t_app",
      Seq((1L, "a")).toDF("k", "v").schema)
    val sink = new IceliteSink(wh, "ns", "t_app", "append", Nil)
    // drive addBatch directly with batch frames — the replay contract
    // is the sink's own, independent of any source
    sink.addBatch(0, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    sink.addBatch(1, Seq((3L, "c")).toDF("k", "v"))
    sink.addBatch(1, Seq((3L, "c")).toDF("k", "v")) // at-least-once replay
    sink.addBatch(0, Seq((1L, "a")).toDF("k", "v")) // stale replay
    val t2 = IceliteTable.load(spark, wh, "ns", "t_app")
    assert(t2.read().count() == 3, "replayed batches must not re-append")
    assert(t2.meta.lastSeq == 2, "exactly one commit per distinct batch id")
    assert(t2.meta.snapshots.map(
      _.summary(IceliteTable.SyncProgressPrefix + "streaming.batchId")) == Seq("0", "1"))
  }

  test("compaction carries the batch-id watermark; a post-compact replay is still skipped") {
    import spark.implicits._
    val wh = Scratch.dir("sink-spec")
    val t = IceliteTable.create(spark, wh, "ns", "t_compact",
      Seq((1L, "a")).toDF("k", "v").schema)
    val sink = new IceliteSink(wh, "ns", "t_compact", "append", Nil)
    sink.addBatch(0, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    sink.addBatch(1, Seq((3L, "c")).toDF("k", "v"))
    IceliteTable.load(spark, wh, "ns", "t_compact").compact()
    // crash-replay AFTER maintenance: the rewrite snapshot must have
    // re-published the watermark, so the stale batch is still a no-op
    sink.addBatch(1, Seq((3L, "c")).toDF("k", "v"))
    sink.addBatch(0, Seq((1L, "a")).toDF("k", "v"))
    assert(IceliteTable.load(spark, wh, "ns", "t_compact").read().count() == 3,
      "compaction dropped the exactly-once watermark: replayed batch re-applied")
  }

  test("TRUNCATE carries the batch-id watermark; a post-truncate replay is still skipped") {
    import spark.implicits._
    val wh = Scratch.dir("sink-spec")
    IceliteTable.create(spark, wh, "ns", "t_trunc",
      Seq((1L, "a")).toDF("k", "v").schema)
    val sink = new IceliteSink(wh, "ns", "t_trunc", "append", Nil)
    sink.addBatch(0, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    sink.addBatch(1, Seq((3L, "c")).toDF("k", "v"))
    IceliteTable.load(spark, wh, "ns", "t_trunc").truncate()
    // crash-replay AFTER a truncate: the rewrite snapshot must carry
    // the watermark — otherwise the replayed batch re-commits data the
    // operator just deleted (rows resurrect)
    sink.addBatch(1, Seq((3L, "c")).toDF("k", "v"))
    sink.addBatch(0, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    assert(IceliteTable.load(spark, wh, "ns", "t_trunc").read().count() == 0,
      "truncate dropped the exactly-once watermark: replayed batch resurrected rows")
  }

  test("batch columns differing only in case land in the existing column, never evolve") {
    import spark.implicits._
    val wh = Scratch.dir("sink-spec")
    IceliteTable.create(spark, wh, "ns", "t_case",
      Seq((1L, "a")).toDF("k", "value").schema)
    val sink = new IceliteSink(wh, "ns", "t_case", "append", Nil, mergeSchema = true)
    // Spark resolution is case-insensitive by default: 'Value' IS the
    // table's 'value' — auto-evolving a near-duplicate column would
    // split the data across two fields
    sink.addBatch(0, Seq((2L, "b")).toDF("k", "Value"))
    val t2 = IceliteTable.load(spark, wh, "ns", "t_case")
    assert(t2.schema.fieldNames.toSeq == Seq("k", "value"),
      s"case-variant column evolved a duplicate: ${t2.schema.fieldNames.toSeq}")
    assert(t2.read().select("value").collect().map(_.getString(0)).toSeq == Seq("b"))
  }

  test("unknown batch columns refuse loudly; mergeSchema=true evolves instead") {
    import spark.implicits._
    val wh = Scratch.dir("sink-spec")
    IceliteTable.create(spark, wh, "ns", "t_ms",
      Seq((1L, "a")).toDF("k", "v").schema)
    val strict = new IceliteSink(wh, "ns", "t_ms", "append", Nil)
    strict.addBatch(0, Seq((1L, "a")).toDF("k", "v"))
    // silent drop is data loss — the default contract is a loud refusal
    val e = intercept[IllegalArgumentException](
      strict.addBatch(1, Seq((2L, "b", 5L)).toDF("k", "v", "score")))
    assert(e.getMessage.contains("mergeSchema"))
    val evolving = new IceliteSink(wh, "ns", "t_ms", "append", Nil, mergeSchema = true)
    evolving.addBatch(1, Seq((2L, "b", 5L)).toDF("k", "v", "score"))
    val t2 = IceliteTable.load(spark, wh, "ns", "t_ms")
    assert(t2.schema.fieldNames.toSeq == Seq("k", "v", "score"))
    val rows = t2.read().orderBy("k").collect()
    assert(rows(0).isNullAt(2), "pre-evolution row must read NULL for the added column")
    assert(rows(1).getLong(2) == 5L)
  }

  test("upsert mode converges by key under replay") {
    import spark.implicits._
    val wh = Scratch.dir("sink-spec")
    val t = IceliteTable.create(spark, wh, "ns", "t_ups",
      Seq((1L, 0L)).toDF("k", "v").schema)
    val sink = new IceliteSink(wh, "ns", "t_ups", "upsert", Seq("k"))
    sink.addBatch(0, Seq((1L, 10L), (2L, 20L)).toDF("k", "v"))
    sink.addBatch(1, Seq((1L, 11L), (3L, 30L)).toDF("k", "v"))
    sink.addBatch(1, Seq((1L, 11L), (3L, 30L)).toDF("k", "v"))
    val got = IceliteTable.load(spark, wh, "ns", "t_ups").read()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((1L, 11L), (2L, 20L), (3L, 30L)))
  }

  test("a real writeStream.format(icelite) run appends through the registered provider") {
    import spark.implicits._
    val wh = Scratch.dir("sink-spec")
    val landing = Scratch.dir("sink-landing")
    Seq((1L, "x"), (2L, "y")).toDF("k", "v").write.parquet(s"$landing/f1")
    val t = IceliteTable.create(spark, wh, "ns", "t_stream",
      Seq((1L, "x")).toDF("k", "v").schema)
    val q = spark.readStream.schema(t.schema).parquet(s"$landing/*")
      .writeStream.format("icelite")
      .option("warehouse", wh).option("namespace", "ns").option("table", "t_stream")
      .option("checkpointLocation", Scratch.dir("sink-ck"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(IceliteTable.load(spark, wh, "ns", "t_stream").read().count() == 2)
  }

  test("mode/keys option validation fails fast") {
    val p = new IceliteSinkProvider
    val sqlc = spark.sqlContext
    intercept[IllegalArgumentException] {
      p.createSink(sqlc, Map("warehouse" -> "w", "namespace" -> "n", "table" -> "t",
        "mode" -> "upsert"), Nil, org.apache.spark.sql.streaming.OutputMode.Append())
    }
    intercept[IllegalArgumentException] {
      p.createSink(sqlc, Map("warehouse" -> "w", "namespace" -> "n", "table" -> "t",
        "mode" -> "bogus"), Nil, org.apache.spark.sql.streaming.OutputMode.Append())
    }
    intercept[IllegalArgumentException] {
      p.createSink(sqlc, Map("namespace" -> "n", "table" -> "t"), Nil,
        org.apache.spark.sql.streaming.OutputMode.Append())
    }
  }
}
