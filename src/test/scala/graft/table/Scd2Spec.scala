package graft.table

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** SCD Type 2 maintenance ([[Scd2]]): close-and-open versioning,
  * no-op resend suppression, null-safe change detection, batch
  * re-application idempotence, and the half-open validity-interval
  * semantics of the point-in-time read.
  */
class Scd2Spec extends AnyFunSuite with SparkFixture {

  private def wh(): String = Files.createTempDirectory("scd2").toString

  private def batch(data: (Long, String, java.lang.Long)*): DataFrame = {
    import spark.implicits._
    data.toDF("id", "seg", "bal")
  }

  private def hist(dim: Scd2): Seq[(Long, String, Option[Long], Long, Option[Long])] =
    dim.history().orderBy("id", "eff_from").collect().toSeq.map { r =>
      (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }

  private def create(w: String): Scd2 =
    Scd2.create(spark, w, "ns", "dim", batch(), Seq("id"), Seq("seg", "bal"))

  test("changed attribute closes the old version and opens a new one; untouched keys keep one open version") {
    val dim = create(wh())
    dim.apply(batch((1L, "A", 10L), (2L, "B", 20L)), 100L)
    dim.apply(batch((1L, "A", 11L)), 200L)
    assert(hist(dim) == Seq(
      (1L, "A", Some(10L), 100L, Some(200L)),
      (1L, "A", Some(11L), 200L, None),
      (2L, "B", Some(20L), 100L, None)))
  }

  test("no-op resend commits nothing; a late NEW key inserts with its own eff_from") {
    val dim = create(wh())
    dim.apply(batch((1L, "A", 10L)), 100L)
    val before = dim.table.meta.lastSeq
    assert(dim.apply(batch((1L, "A", 10L)), 200L) == -1L)
    assert(dim.table.meta.lastSeq == before) // zero write amplification
    dim.apply(batch((3L, "C", 30L)), 300L)
    assert(hist(dim) == Seq(
      (1L, "A", Some(10L), 100L, None),
      (3L, "C", Some(30L), 300L, None)))
  }

  test("null-safe change detection: null->value and value->null both version; null resend is a no-op") {
    val dim = create(wh())
    dim.apply(batch((1L, "A", null)), 100L)
    assert(dim.apply(batch((1L, "A", null)), 150L) == -1L) // null <=> null
    dim.apply(batch((1L, "A", 10L)), 200L) // null -> value
    dim.apply(batch((1L, "A", null)), 300L) // value -> null
    assert(hist(dim) == Seq(
      (1L, "A", None, 100L, Some(200L)),
      (1L, "A", Some(10L), 200L, Some(300L)),
      (1L, "A", None, 300L, None)))
  }

  test("re-applying an already-applied batch at a later seq is a state no-op") {
    val dim = create(wh())
    dim.apply(batch((1L, "A", 10L), (2L, "B", 20L)), 100L)
    dim.apply(batch((1L, "A", 11L)), 200L)
    val settled = hist(dim)
    assert(dim.apply(batch((1L, "A", 11L)), 300L) == -1L)
    assert(hist(dim) == settled)
  }

  test("asOf is half-open [eff_from, eff_to): inclusive at open, exclusive at close") {
    val dim = create(wh())
    dim.apply(batch((1L, "A", 10L)), 100L)
    dim.apply(batch((1L, "A", 11L)), 200L)
    def balAt(s: Long): Option[Long] = {
      val rs = dim.asOf(s).collect()
      if (rs.isEmpty) None else Some(rs(0).getLong(2))
    }
    assert(balAt(99L).isEmpty) // before first version
    assert(balAt(100L).contains(10L)) // eff_from inclusive
    assert(balAt(199L).contains(10L))
    assert(balAt(200L).contains(11L)) // close is exclusive, new open inclusive
    assert(balAt(9999L).contains(11L)) // open version has no upper bound
  }

  test("current() returns exactly the open versions") {
    val dim = create(wh())
    dim.apply(batch((1L, "A", 10L), (2L, "B", 20L)), 100L)
    dim.apply(batch((1L, "X", 10L)), 200L)
    val cur = dim.current().orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(cur == Seq((1L, "X"), (2L, "B")))
  }
}
