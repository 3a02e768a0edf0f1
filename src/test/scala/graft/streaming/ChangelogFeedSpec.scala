package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.table.IceliteTable

/** The CDC consumer loop: producer exports the icelite changelog
  * incrementally, a Spark file-stream consumer drains it with its own
  * checkpoint — a second drain RESUMES and sees exactly the new
  * events, and a crashed/retried export never changes a published
  * file under the consumer.
  */
class ChangelogFeedSpec extends AnyFunSuite with SparkFixture {

  private def rows(data: (Long, String, Double)*): DataFrame = {
    import spark.implicits._
    data.toDF("id", "grp", "score")
  }

  /** Drain the feed's stream with AvailableNow on a PERSISTENT
    * checkpoint; returns the batch of rows this drain delivered.
    */
  private def drain(feed: ChangelogFeed, ck: String): Seq[(Long, String, Long)] = {
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    val q = feed.readStream.writeStream
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        got.synchronized {
          got ++= batch.collect().map(r => (
            r.getLong(r.fieldIndex("id")),
            r.getString(r.fieldIndex("_change_type")),
            r.getLong(r.fieldIndex("_commit_seq"))))
        }
        ()
      }
      .start()
    q.awaitTermination()
    got.toSeq
  }

  test("second drain resumes from its checkpoint and sees exactly the new events") {
    val wh = Files.createTempDirectory("feed-wh").toString
    val t = IceliteTable.create(spark, wh, "ns", "feed", rows().schema)
    val feed = new ChangelogFeed(t, Files.createTempDirectory("feed-dir").toString)
    val ck = Files.createTempDirectory("feed-ck").toString

    t.upsert(rows((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0)), Seq("id"))
    assert(feed.exportAvailable() == (0L, 1L))
    val first = drain(feed, ck)
    assert(first.toSet == Set((1L, "insert", 1L), (2L, "insert", 1L), (3L, "insert", 1L)))

    // new commits: an update pair and a delete
    t.upsert(rows((2L, "a", 9.0)), Seq("id"))
    t.delete(rows((1L, "a", 0.0)).select("id"), Seq("id"))
    assert(feed.exportAvailable() == (1L, 3L))
    val second = drain(feed, ck)
    assert(second.toSet == Set(
      (2L, "update_preimage", 2L), (2L, "update_postimage", 2L),
      (1L, "delete", 3L)))

    // third drain with nothing new delivers nothing
    assert(feed.exportAvailable() == (3L, 3L))
    assert(drain(feed, ck).isEmpty)
  }

  test("replicateOnce converges the replica to the source state across resumed cycles") {
    val wh = Files.createTempDirectory("feed-wh").toString
    val src = IceliteTable.create(spark, wh, "ns", "repl_src", rows().schema)
    val rep = IceliteTable.create(spark, wh, "ns", "repl_dst", rows().schema)
    val feed = new ChangelogFeed(src, Files.createTempDirectory("feed-dir").toString)
    val ck = Files.createTempDirectory("feed-ck").toString
    def states() = {
      def st(df: org.apache.spark.sql.DataFrame) = df.select("id", "grp", "score")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      (st(src.read()), st(ChangelogFeed.replicaState(rep)))
    }
    // cycle 1: inserts + an update pair in one drain
    src.upsert(rows((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0)), Seq("id"))
    src.upsert(rows((2L, "a", 9.0), (4L, "c", 4.0)), Seq("id"))
    feed.exportAvailable()
    feed.replicateOnce(rep, Seq("id"), ck)
    val (s1, r1) = states()
    assert(r1 == s1 && r1.nonEmpty, "replica must equal source after cycle 1")
    // cycle 2 resumes the consumer checkpoint: delete + re-insert + update
    src.delete(rows((2L, "a", 0.0)).select("id"), Seq("id"))
    src.upsert(rows((2L, "z", 20.0), (1L, "a", 1.5)), Seq("id"))
    feed.exportAvailable()
    feed.replicateOnce(rep, Seq("id"), ck)
    val (s2, r2) = states()
    assert(r2 == s2, "replica must equal source after a delete/re-insert cycle")
    assert(r2.contains((2L, "z", 20.0)) && r2.contains((1L, "a", 1.5)))
    // idle cycle: nothing exported, replica unchanged
    feed.replicateOnce(rep, Seq("id"), ck)
    assert(states()._2 == r2)
  }

  test("re-applying the same micro-batch is a state no-op (at-least-once replay window)") {
    val wh = Files.createTempDirectory("feed-wh").toString
    val src = IceliteTable.create(spark, wh, "ns", "redo_src", rows().schema)
    val rep = IceliteTable.create(spark, wh, "ns", "redo_dst", rows().schema)
    val feed = new ChangelogFeed(src, Files.createTempDirectory("feed-dir").toString)
    src.upsert(rows((1L, "a", 1.0), (2L, "b", 2.0)), Seq("id"))
    src.upsert(rows((1L, "a", 7.0)), Seq("id"))
    src.delete(rows((2L, "b", 0.0)).select("id"), Seq("id"))
    feed.exportAvailable()
    val batch = spark.read.schema(feed.schema).parquet(feed.feedDir)
    def state() = ChangelogFeed.replicaState(rep).select("id", "grp", "score")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    feed.applyBatch(batch, rep, Seq("id"))
    val once = state()
    assert(once == Set((1L, "a", 7.0)))
    feed.applyBatch(batch, rep, Seq("id")) // crash-replay of the same batch
    assert(state() == once, "replayed batch must not diverge the replica")
  }

  test("an older-seq batch applied after a newer one can neither roll back nor resurrect") {
    val wh = Files.createTempDirectory("feed-wh-ooo").toString
    val src = IceliteTable.create(spark, wh, "ns", "ooo_src", rows().schema)
    val rep = IceliteTable.create(spark, wh, "ns", "ooo_dst", rows().schema)
    val feed = new ChangelogFeed(src, Files.createTempDirectory("feed-dir-ooo").toString)
    src.upsert(rows((1L, "old", 1.0), (2L, "b", 2.0)), Seq("id")) // seq 1
    src.upsert(rows((1L, "new", 9.0)), Seq("id")) // seq 2
    src.delete(rows((2L, "b", 0.0)).select("id"), Seq("id")) // seq 3
    feed.exportAvailable()
    val all = spark.read.schema(feed.schema).parquet(feed.feedDir)
    def state() = ChangelogFeed.replicaState(rep).select("id", "grp", "score")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    import org.apache.spark.sql.functions.col
    // newer events land first (one micro-batch), older events later —
    // the interleaving a multi-batch drain with unlucky file discovery
    // order would produce
    feed.applyBatch(all.filter(col("_commit_seq") >= 2), rep, Seq("id"))
    assert(state() == Set((1L, "new", 9.0)))
    feed.applyBatch(all.filter(col("_commit_seq") === 1), rep, Seq("id"))
    assert(state() == Set((1L, "new", 9.0)),
      "older-seq events must neither overwrite newer state (key 1) " +
        "nor resurrect a newer-seq-deleted key (key 2 tombstone)")
  }

  test("export is idempotent: a retried/redone export rewrites nothing") {
    val wh = Files.createTempDirectory("feed-wh2").toString
    val t = IceliteTable.create(spark, wh, "ns", "feed2", rows().schema)
    val dir = Files.createTempDirectory("feed-dir2").toString
    val feed = new ChangelogFeed(t, dir)
    t.upsert(rows((1L, "a", 1.0), (2L, "b", 2.0)), Seq("id"))
    feed.exportAvailable()
    def listing() = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).sortBy(_._1).toSeq
    val before = listing()
    assert(before.nonEmpty)
    // simulate a crash BEFORE the marker advanced: reset it and redo
    Files.delete(java.nio.file.Paths.get(dir, "_feed_state.json"))
    assert(feed.exportedThrough == 0L)
    Thread.sleep(20) // so an (incorrect) rewrite would bump mtime
    assert(feed.exportAvailable() == (0L, 1L))
    assert(listing() == before, "published bucket files must never be rewritten")
    // plain double-export is a no-op too
    assert(feed.exportAvailable() == (1L, 1L))
    assert(listing() == before)
  }

  test("multi-bucket export delivers every row exactly once") {
    val wh = Files.createTempDirectory("feed-wh3").toString
    val t = IceliteTable.create(spark, wh, "ns", "feed3", rows().schema)
    val dir = Files.createTempDirectory("feed-dir3").toString
    // tiny bucketBytes forces n > 1 from the commit's real file metrics
    val feed = new ChangelogFeed(t, dir, bucketBytes = 256L)
    val batch = (1L to 200L).map(i => (i, s"g${i % 7}", i * 0.5))
    t.upsert(rows(batch: _*), Seq("id"))
    feed.exportAvailable()
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("seq-1-b")).map(_.getName).toSeq
    assert(files.size > 1, s"expected multiple buckets, got $files")
    val got = drain(feed, Files.createTempDirectory("feed-ck3").toString)
    assert(got.size == 200)
    assert(got.map(_._1).toSet == (1L to 200L).toSet)
    assert(got.forall(e => e._2 == "insert" && e._3 == 1L))
  }

  test("fast-path redo after a partial publish: existing buckets untouched, missing ones appear") {
    val wh = Files.createTempDirectory("feed-wh5").toString
    val t = IceliteTable.create(spark, wh, "ns", "feed5", rows().schema)
    val dir = Files.createTempDirectory("feed-dir5").toString
    val feed = new ChangelogFeed(t, dir)
    t.upsert(rows((1L, "a", 1.0), (2L, "b", 2.0)), Seq("id")) // seq 1
    t.upsert(rows((3L, "c", 3.0)), Seq("id")) // seq 2
    assert(feed.exportAvailable() == (0L, 2L)) // single-job backlog export
    def f(name: String) = java.nio.file.Paths.get(dir, name)
    assert(Files.exists(f("seq-1-b0.parquet")) && Files.exists(f("seq-2-b0.parquet")))
    // simulate a crash between the two renames, before the marker
    // advanced: seq-1 published, seq-2 missing, marker still at 0
    val mtime1 = Files.getLastModifiedTime(f("seq-1-b0.parquet"))
    Files.delete(f("seq-2-b0.parquet"))
    Files.delete(f("_feed_state.json"))
    Thread.sleep(20)
    assert(feed.exportAvailable() == (0L, 2L)) // redo
    assert(Files.getLastModifiedTime(f("seq-1-b0.parquet")) == mtime1,
      "a published bucket must never be rewritten on redo")
    assert(Files.exists(f("seq-2-b0.parquet")))
    val got = drain(feed, Files.createTempDirectory("feed-ck5").toString)
    assert(got.toSet == Set((1L, "insert", 1L), (2L, "insert", 1L), (3L, "insert", 2L)))
  }

  test("an empty commit inside a fast-path backlog still publishes its (empty) bucket") {
    val wh = Files.createTempDirectory("feed-wh6").toString
    val t = IceliteTable.create(spark, wh, "ns", "feed6", rows().schema)
    val dir = Files.createTempDirectory("feed-dir6").toString
    val feed = new ChangelogFeed(t, dir)
    t.upsert(rows((1L, "a", 1.0)), Seq("id")) // seq 1
    t.append(rows().limit(0)) // seq 2: zero-row commit (seq still advances)
    t.upsert(rows((2L, "b", 2.0)), Seq("id")) // seq 3
    assert(feed.exportAvailable() == (0L, 3L))
    (1 to 3).foreach { s =>
      assert(Files.exists(java.nio.file.Paths.get(dir, s"seq-$s-b0.parquet")),
        s"bucket for seq $s must exist (empty commits included)")
    }
    val got = drain(feed, Files.createTempDirectory("feed-ck6").toString)
    assert(got.toSet == Set((1L, "insert", 1L), (2L, "insert", 3L)))
  }

  test("a maintenance snapshot in range fails the export loudly") {
    val wh = Files.createTempDirectory("feed-wh4").toString
    val t = IceliteTable.create(spark, wh, "ns", "feed4", rows().schema)
    val feed = new ChangelogFeed(t, Files.createTempDirectory("feed-dir4").toString)
    t.upsert(rows((1L, "a", 1.0), (2L, "b", 2.0)), Seq("id"))
    feed.exportAvailable()
    t.upsert(rows((3L, "c", 3.0)), Seq("id"))
    t.compact() // rewrite: not derivable as changes
    val e = intercept[IllegalStateException](feed.exportAvailable())
    assert(e.getMessage.contains("resync"))
  }
}
