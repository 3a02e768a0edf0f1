package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Misra-Gries candidate aggregate: the superset guarantee (every key
  * with count > n/(k+1) survives) under every partitioning, the
  * bounded buffer, serialization round-trip, null handling, and
  * exactness of the sketch + rescan composition.
  */
class MisraGriesSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  /** Zipf-ish corpus: key i repeated ~N/i times — few heavy keys, a
    * long uniform tail.
    */
  private val corpus: Seq[String] =
    (1 to 40).flatMap(i => Seq.fill(2000 / i)(s"hot$i")) ++
      (1 to 3000).map(i => s"tail$i")

  private def candidates(rows: Seq[String], k: Int, parts: Int): Seq[String] =
    rows.toDF("t").repartition(parts)
      .agg(MisraGriesAgg.mgCandidates(col("t"), k))
      .head.getSeq[String](0)

  private def exactOver(rows: Seq[String], minCount: Long): Set[String] =
    rows.groupBy(identity).collect { case (t, v) if v.size >= minCount => t }.toSet

  test("candidates contain every key above n/(k+1), at any partitioning") {
    val n = corpus.size
    val k = 64
    val floor = n / (k + 1) + 1 // strictly above the bound
    val truth = exactOver(corpus, floor)
    assert(truth.nonEmpty, "fixture must have hitters above the bound")
    for (parts <- Seq(1, 7, 32)) {
      val cand = candidates(corpus, k, parts).toSet
      assert(truth.subsetOf(cand), s"lost hitters at parts=$parts: ${truth.diff(cand)}")
      assert(cand.size <= k)
    }
  }

  test("sketch + exact rescan equals the plain groupBy answer, any partitioning") {
    val n = corpus.size.toLong
    val k = 64
    val support = 0.02 // > 1/(k+1), so the guarantee covers the threshold
    val expected = exactOver(corpus, math.ceil(support * n).toLong)
    for (parts <- Seq(1, 8)) {
      val df = corpus.toDF("t").repartition(parts)
      val cand = df.agg(MisraGriesAgg.mgCandidates(col("t"), k)).head.getSeq[String](0)
      val got = df.filter(col("t").isin(cand: _*))
        .groupBy("t").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt").cast("double") >= support * n)
        .collect().map(_.getString(0)).toSet
      assert(got == expected)
    }
  }

  test("nulls are ignored and an all-null column yields no candidates") {
    val withNulls = Seq(Some("a"), None, Some("a"), Some("b"), None)
    val cand = withNulls.toDF("t")
      .agg(MisraGriesAgg.mgCandidates(col("t"), 4)).head.getSeq[String](0)
    assert(cand.toSet == Set("a", "b"))
    val empty = Seq.empty[Option[String]].toDF("t")
      .agg(MisraGriesAgg.mgCandidates(col("t"), 4)).head.getSeq[String](0)
    assert(empty.isEmpty)
  }

  test("serialize/deserialize round-trips the counter map") {
    val agg = MisraGriesAgg(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("t")), 8)
    val buf = new java.util.HashMap[String, java.lang.Long]()
    buf.put("x", 3L); buf.put("yy", 1L); buf.put("", 7L)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
  }

  test("SQL registration: misra_gries callable from SQL with a literal k") {
    org.apache.spark.sql.graftbridge.ColumnBridge.registerTempFunction(
      spark, "misra_gries",
      GraftExtensions.functions.find(_._1.funcName == "misra_gries").get._3)
    corpus.toDF("t").createOrReplaceTempView("mg_docs")
    val cand = spark.sql("SELECT misra_gries(t, 64) FROM mg_docs")
      .collect().head.getSeq[String](0)
    val truth = exactOver(corpus, corpus.size / 65 + 1)
    assert(truth.subsetOf(cand.toSet))
    assert(cand.size <= 64)
  }

  test("merge trims to the k largest-weight survivors with the MG subtraction") {
    val agg = MisraGriesAgg(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("t")), 2)
    val a = new java.util.HashMap[String, java.lang.Long]()
    a.put("p", 10L); a.put("q", 4L)
    val b = new java.util.HashMap[String, java.lang.Long]()
    b.put("r", 6L); b.put("q", 1L)
    val merged = agg.merge(a, b)
    // weights p=10 q=5 r=6; cut = 3rd largest (5) → p=5, r=1 survive
    assert(merged.size <= 2)
    assert(merged.get("p") == 5L && merged.get("r") == 1L && !merged.containsKey("q"))
  }
}
