package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Streaming operator semantics: the pure sessionizer, the batch/
  * streaming agreement on closed sessions, and the windowed-agg drain.
  */
class EventStreamsSpec extends AnyFunSuite with SparkFixture {

  import EventStreams._

  private def ev(id: Long, us: Long) = SessionEvent(1L, id, us)
  private val Min = 60L * 1000 * 1000 // µs

  test("toSessions splits on >30min gaps, ties broken by event_id, numbering from firstId") {
    val events = Seq(
      ev(1, 0), ev(2, 5 * Min), ev(3, 36 * Min), // gap 31min → new session
      ev(4, 36 * Min), // same ts, same session
      ev(5, 66 * Min), // 30min exactly → same session (strict >)
      ev(6, 97 * Min)) // 31min → new session
    val s = toSessions(1L, events.iterator, firstId = 4)
    assert(s.map(x => (x.session_id, x.startUs / Min, x.endUs / Min, x.n_events)) ==
      Seq((4, 0L, 5L, 2L), (5, 36L, 66L, 3L), (6, 97L, 97L, 1L)))
  }

  test("property: sessionizer partitions events; intra-gaps ≤ 30min; inter-gaps > 30min") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n <- Gen.choose(0, 60)
      ts <- Gen.listOfN(n, Gen.choose(0L, 6L * 60 * Min))
    } yield ts.zipWithIndex.map { case (t, i) => ev(i.toLong, t) }
    val cases = (0 until 200).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))
    cases.foreach { events =>
      val sessions = toSessions(1L, events.iterator)
      // partition: every event in exactly one session; counts add up
      assert(sessions.map(_.n_events).sum == events.size)
      assert(sessions.map(_.session_id) == (1 to sessions.size))
      val sorted = events.map(_.tsUs).sorted
      sessions.foreach { s =>
        assert(s.startUs <= s.endUs)
        // intra-session: consecutive event gaps never exceed the gap
        val inside = sorted.filter(t => t >= s.startUs && t <= s.endUs)
        inside.zip(inside.drop(1)).foreach { case (a, b) => assert(b - a <= SessionGapUs) }
      }
      // inter-session: the next session starts > gap after the previous end
      sessions.zip(sessions.drop(1)).foreach { case (a, b) =>
        assert(b.startUs - a.endUs > SessionGapUs)
      }
    }
  }

  test("streaming sessionization emits exactly the watermark-closed sessions of the batch result") {
    val dir = Files.createTempDirectory("stream-sess")
    // three files → three micro-batches (maxFilesPerTrigger=1), so the
    // watermark advances between batches and event-time timeouts fire.
    // user 7: sessions A=[00:00,00:10], B=[05:00], C=[12:00] on 2024-01-01.
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000
    def row(id: Long, offMin: Long) =
      (id, (base + offMin * Min) * 1000 /* ns */, 7L, "click", 1.0, "{}")
    val rows = Seq(
      Seq(row(1, 0), row(2, 10)), // batch 1 → wm after: 23:10 prev day
      Seq(row(3, 5 * 60)), // batch 2 at 05:00 → wm after: 04:00
      Seq(row(4, 12 * 60))) // batch 3 at 12:00: wm 04:00 closes A and fires its timeout
    import spark.implicits._
    rows.zipWithIndex.foreach { case (rs, i) =>
      rs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(dir.resolve(s"f$i").toString)
    }
    // assemble one events dir shaped like the fixture; spaced mtimes so
    // the file source's modification-time ordering matches file order
    val evDir = Files.createTempDirectory("stream-sess-in").resolve("events.parquet")
    Files.createDirectories(evDir)
    var n = 0
    Seq(0, 1, 2).foreach { i =>
      val src = new java.io.File(dir.resolve(s"f$i").toString).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      src.foreach { f =>
        Files.copy(f.toPath, evDir.resolve(f"part-$n%05d.parquet")); n += 1
        Thread.sleep(20)
      }
    }
    val sessions = sessionizeStream(spark, evDir.getParent.toString, maxFilesPerTrigger = Some(1))
    val ckpt = Files.createTempDirectory("stream-sess-ck").toString
    val sink = s"sess_test_${System.nanoTime()}"
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName(sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table(sink).orderBy("session_id")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("session_id"),
        r.getAs[Long]("startUs"), r.getAs[Long]("endUs"), r.getAs[Long]("n_events")))
    // session A closes in batch 3 (wm 04:00 > 00:10+30min); session B
    // closes in the final timeout-only batch (wm 11:00 > 05:30); the
    // trailing session C stays open in state, exactly like a live
    // stream. Batch sessionize on the same data yields A, B and C.
    assert(out.toSeq == Seq(
      (7L, 1, base, base + 10 * Min, 2L),
      (7L, 2, base + 300 * Min, base + 300 * Min, 1L)))
  }

  test("windowed agg drain matches a batch groupBy of the same data") {
    val dir = "/root/testdata/sf0.001"
    val streamed = windowCounts(spark, dir)
      .select("window_start", "event_type", "n_events").collect().toSeq
    val batch = graft.Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy("window_start", "event_type")
      .select("window_start", "event_type", "n_events").collect().toSeq
    assert(streamed == batch)
  }

  test("streaming KMV sketch across forced micro-batches equals the batch sketch") {
    import graft.operators.{Dedup, Relational}
    val srcDir = "/root/testdata/sf0.001"
    // split the event fixture into several files so AvailableNow +
    // maxFilesPerTrigger=1 processes REAL multiple micro-batches — the
    // order-independence claim is vacuous on a single batch
    val dir = java.nio.file.Files.createTempDirectory("kmvstream").toString
    graft.Tables.events(spark, srcDir).repartition(3)
      .write.parquet(s"$dir/events.parquet")
    val agg = readEventStream(spark, dir, maxFilesPerTrigger = Some(1))
      .groupBy(col("event_type"))
      .agg(graft.functions.KmvSketchAgg.kmvSketch(
        Dedup.phash(col("user_id").cast("string")), Relational.KmvK).as("kmv"))
    val q = agg.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .format("memory").queryName("kmv_mb")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(q.recentProgress.map(_.numInputRows).count(_ > 0) >= 2,
      "fixture did not actually split into multiple micro-batches")
    val streamed = spark.table("kmv_mb")
      .select(col("event_type"), col("kmv.distinct_estimate"), col("kmv.sketch_size"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.Tables.events(spark, srcDir)
      .groupBy(col("event_type"))
      .agg(graft.functions.KmvSketchAgg.kmvSketch(
        Dedup.phash(col("user_id").cast("string")), Relational.KmvK).as("kmv"))
      .select(col("event_type"), col("kmv.distinct_estimate"), col("kmv.sketch_size"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }
}
