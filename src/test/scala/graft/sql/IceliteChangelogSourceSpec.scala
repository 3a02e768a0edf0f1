package graft.sql

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.streaming.ChangelogFeed
import graft.table.IceliteTable
import graft.util.Scratch

/** Native changelog streaming source ([[IceliteChangelogSourceProvider]]):
  * offsets are commit seqs, checkpoint resume is exact, and the
  * change rows match [[IceliteTable.readChanges]] — no export hop.
  */
class IceliteChangelogSourceSpec extends AnyFunSuite with SparkFixture {

  private def mkTable(name: String): (String, IceliteTable) = {
    import spark.implicits._
    val wh = Scratch.dir("native-src-spec")
    val df = (1L to 20L).map(i => (i, i * 100L)).toDF("k", "v")
    val t = IceliteTable.create(spark, wh, "ns", name, df.schema)
    t.append(df)
    (wh, t)
  }

  private def stream(wh: String, name: String) =
    spark.readStream.format("icelite-changelog")
      .option("warehouse", wh).option("namespace", "ns").option("table", name)
      .load()

  private def drainTo(wh: String, name: String, out: String, ck: String): Unit = {
    val q = stream(wh, name).writeStream
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", out)
      .start()
    q.awaitTermination()
  }

  test("drains commits as change rows; resumes exactly at the checkpointed seq") {
    import spark.implicits._
    val (wh, t) = mkTable("t1")
    val out = Scratch.dir("native-out")
    val ck = Scratch.dir("native-ck")
    drainTo(wh, "t1", out, ck)
    val first = spark.read.parquet(out)
    assert(first.count() == 20)
    assert(first.select("_change_type").distinct().collect().map(_.getString(0)).toSeq == Seq("insert"))

    // second commit: updates become pre/post pairs, deletes tombstone
    t.applyChanges(
      Seq((1L, 111L)).toDF("k", "v"),
      Seq(1L, 2L).toDF("k"),
      Seq("k"))
    drainTo(wh, "t1", out, ck) // resume: must ship ONLY seq 2
    val all = spark.read.parquet(out)
    val seq2 = all.filter(col("_commit_seq") === 2)
      .select("_change_type", "k").collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(seq2 == Seq(("delete", 2L), ("update_postimage", 1L), ("update_preimage", 1L)),
      s"unexpected seq-2 events: $seq2")
    assert(all.count() == 20 + seq2.size, "resume re-shipped seq 1")
  }

  test("end-to-end replication equals the feed-dir path's converged state") {
    import spark.implicits._
    val (wh, t) = mkTable("t2")
    val replica = IceliteTable.create(spark, wh, "ns", "t2_rep",
      ChangelogFeed.replicaSchema(t.schema))
    val ck = Scratch.dir("native-rep-ck")
    def drain(): Unit = ChangelogFeed.replicateStream(
      stream(wh, "t2"), t.schema.fieldNames.toSeq, replica, Seq("k"), ck)
    drain()
    t.applyChanges(Seq((3L, 333L)).toDF("k", "v"), Seq(4L, 5L).toDF("k"), Seq("k"))
    drain()
    val got = ChangelogFeed.replicaState(replica)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val want = (1L to 20L).filterNot(k => k == 4 || k == 5)
      .map(k => (k, if (k == 3) 333L else k * 100L))
    assert(got == want)
  }

  test("maxSeqsPerBatch drains a backlog in bounded micro-batches, nothing lost") {
    import spark.implicits._
    val wh = Scratch.dir("native-bp-spec")
    val df = Seq((0L, 0L)).toDF("k", "v")
    val t = IceliteTable.create(spark, wh, "ns", "bp1", df.schema)
    (1L to 5L).foreach(i => t.append(Seq((i, i * 100L)).toDF("k", "v"))) // 5-commit backlog
    val out = Scratch.dir("native-bp-out")
    val ck = Scratch.dir("native-bp-ck")
    val q = spark.readStream.format("icelite-changelog")
      .option("warehouse", wh).option("namespace", "ns").option("table", "bp1")
      .option("maxSeqsPerBatch", "2")
      .load()
      .writeStream.option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", out)
      .start()
    q.awaitTermination()
    // all 5 commits arrive, in >= 3 micro-batches of <= 2 commits each
    val got = spark.read.parquet(out)
    assert(got.count() == 5)
    assert(got.select("_commit_seq").distinct().count() == 5)
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length >= 3, s"expected >=3 bounded batches, got ${batches.length}")
    assert(batches.forall(_.numInputRows <= 2))
  }

  test("a rollback/rewrite in range surfaces the explicit resync error") {
    val (wh, t) = mkTable("t3")
    val ck = Scratch.dir("native-err-ck")
    val out = Scratch.dir("native-err-out")
    drainTo(wh, "t3", out, ck)
    t.compact(targetFileMB = 256) // maintenance snapshot
    t.append(t.read().limit(1))
    val ex = intercept[Exception] {
      drainTo(wh, "t3", out, ck)
    }
    def causes(e: Throwable): Seq[String] =
      if (e == null) Nil else e.getMessage +: causes(e.getCause)
    assert(causes(ex).exists(m => m != null && m.contains("resync")),
      s"wanted the readChanges resync error, got: ${causes(ex)}")
  }
}
