package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Known-answer semantics for [[Pipeline.sampleTokenBudgetOn]]: the
  * sqrt-share budget allocation, best-quality-first greedy admission,
  * and the empty-fill edge where a source's cheapest-ranked document
  * alone overflows its allocation.
  */
class TokenBudgetSpec extends AnyFunSuite with SparkFixture {

  // Token masses 72 (A) and 50 (B) make the sqrt shares exactly
  // 6/11 and 5/11 (both are multiples of sqrt(2)), so every budget
  // number below is hand-computable.
  private def fixture = {
    import spark.implicits._
    val high = "the " + Seq.fill(30)("aa").mkString(" ") // 31 tokens, pts 10
    val low = Seq.fill(10)("bb").mkString(" ") // 10 tokens, pts 2
    val mid = Seq.fill(40)("cc").mkString(" ") // 40 tokens, pts 7
    Seq(
      (1L, "A", high), (3L, "A", high), (5L, "A", low),
      (2L, "B", mid), (4L, "B", low)
    ).toDF("doc_id", "source", "text")
  }

  test("budget allocation and greedy fill are exact on hand-computed shares") {
    val out = Pipeline.sampleTokenBudgetOn(fixture).collect()
    assert(out.length == 2)
    val a = out(0)
    assert(a.getString(0) == "A")
    // total 72; global budget (72+50) DIV 2 = 61; share 6/11 →
    // floor(0.545454545455 * 61) = 33
    assert(a.getLong(1) == 72L && a.getLong(2) == 33L)
    // greedy order (pts desc, doc_id asc): doc1 run 31 ≤ 33 admitted,
    // doc3 run 62 rejected, doc5 rejected → cutoff is doc1's pts
    assert(a.getLong(3) == 1L && a.getLong(4) == 31L && a.getLong(5) == 10L)
  }

  test("a first-ranked doc larger than the allocation yields an empty fill, not a skip-ahead") {
    val b = Pipeline.sampleTokenBudgetOn(fixture).collect()(1)
    assert(b.getString(0) == "B")
    // total 50; share 5/11 → floor(0.454545454545 * 61) = 27; the
    // best-ranked doc (40 tokens) overflows it, and the greedy prefix
    // stops there even though doc4 (10 tokens) would fit — prefix
    // semantics, not knapsack
    assert(b.getLong(1) == 50L && b.getLong(2) == 27L)
    assert(b.getLong(3) == 0L && b.getLong(4) == 0L && b.isNullAt(5))
  }

  test("admitted set is a prefix of the (pts desc, doc_id asc) order and stays within budget") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (1 to 40).map { i =>
      val words = Seq.fill(10 + i % 7 * 9)(if (i % 3 == 0) "the" else "zz")
      (i.toLong, if (i % 2 == 0) "X" else "Y", words.mkString(" "))
    }.toDF("doc_id", "source", "text")
    val out = Pipeline.sampleTokenBudgetOn(docs).collect()
    val ranked = docs
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("nt"),
        TextAnalysis.qualityPoints(col("text")).cast("long").as("pts"))
      .collect()
      .groupBy(_.getString(1))
      .view.mapValues(_.sortBy(r => (-r.getLong(3), r.getLong(0)))).toMap
    out.foreach { r =>
      val order = ranked(r.getString(0))
      // replay the greedy prefix on the driver
      val running = order.scanLeft(0L)(_ + _.getLong(2)).tail
      val admitted = running.takeWhile(_ <= r.getLong(2)).length
      assert(r.getLong(3) == admitted.toLong)
      assert(r.getLong(4) == order.take(admitted).map(_.getLong(2)).sum)
      assert(r.getLong(4) <= r.getLong(2))
    }
  }

  test("correlated sampling: the join of the samples IS the key-sample of the full join") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    def keep(k: org.apache.spark.sql.Column) =
      pmod(Dedup.phash(concat(lit("jk:"), k.cast("string"))), lit(100)) < Pipeline.JoinSamplePct
    val o = graft.Tables.t(spark, dir, "orders")
    val l = graft.Tables.t(spark, dir, "lineitem")
    val sampleJoin = o.filter(keep(col("o_orderkey")))
      .join(l.filter(keep(col("l_orderkey"))), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("l_linenumber").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val joinSample = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .filter(keep(col("o_orderkey")))
      .select(col("o_orderkey"), col("l_linenumber").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sampleJoin.nonEmpty)
    assert(sampleJoin == joinSample)
    // and the estimator input is non-degenerate: the sample is a
    // strict, non-empty subset of the join
    val full = o.join(l, col("o_orderkey") === col("l_orderkey")).count()
    assert(sampleJoin.size < full)
  }
}
