package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The incremental-curation contract: build(base) + append(batch)
  * leaves every persisted verdict table — and the manifest — equal to
  * a from-scratch build over the union, while re-evaluating ONLY the
  * base docs whose verdicts the batch can change (the per-family dirty
  * sets), including the non-monotone corners: a batch doc with a LOWER
  * id flipping a base doc's substring flag, a batch line-hash pushing
  * a base line over the boilerplate threshold, and a batch EVAL doc
  * contaminating a base doc's n-grams.
  */
class CurationStateSpec extends AnyFunSuite with SparkFixture {

  private def filler(id: Long, n: Int): String =
    (0 until n).map(j => s"t${id}w$j").mkString(" ")

  // base: ids 10..49. Carriers: boilerplate line {11,12,13,16,18}
  // (df 5 = at threshold), 12-gram G {30, 40} (min 30), eval 5-gram Q
  // {20}; dup cluster {19, 22}. Eval docs are the %7==0 ids.
  private val bpLine = "bp1 bp2 bp3 bp4"
  private val gRun = (1 to 12).map(i => s"g$i").mkString(" ")
  private val qRun = "q1 q2 q3 q4 q5"
  private val dupText = "the " + (1 to 39).map(i => s"d$i").mkString(" ")

  private def baseDocs = (10L to 49L).map { id =>
    val text = id match {
      case 11 | 12 | 13 | 16 | 18 => s"$bpLine ${filler(id, 28)}"
      case 30 | 40                => s"$gRun ${filler(id, 20)}"
      case 20                     => s"$qRun ${filler(id, 27)}"
      case 19 | 22                => dupText
      case _                      => filler(id, 32)
    }
    (id, if (id % 2 == 0) "web" else "books", text)
  }

  // batch: 5 (G carrier, LOWER id than both base carriers), 8
  // (generic), 51 (sem-contaminated vector), 53 (joins the dup
  // cluster), 54 (6th boilerplate-line carrier), 56 (NEW eval doc
  // carrying Q)
  private def batchDocs = Seq(
    (5L, "web", s"$gRun ${filler(5L, 20)}"),
    (8L, "web", filler(8L, 32)),
    (51L, "books", filler(51L, 32)),
    (53L, "books", dupText),
    (54L, "web", s"$bpLine ${filler(54L, 28)}"),
    (56L, "web", s"$qRun ${filler(56L, 27)}"))

  private def vec(hot: Int): Array[Float] =
    Array.tabulate(8)(i => if (i == hot) 1f else 0f)

  // eval vectors 0..4 on dims 0..4; corpus vectors orthogonal to them
  // except batch vec 51, a copy of eval vec 1 (cos = 1 ≥ threshold)
  private def baseEmb = (0 to 4).map(i => (i.toLong, vec(i))) ++
    Seq((20L, vec(6)), (30L, vec(7)))
  private def batchEmb = Seq((51L, vec(1)), (53L, vec(5)))

  private def frames = {
    import spark.implicits._
    (baseDocs.toDF("doc_id", "source", "text"),
      batchDocs.toDF("doc_id", "source", "text"),
      baseEmb.toDF("vec_id", "embedding"),
      batchEmb.toDF("vec_id", "embedding"))
  }

  private def collectSorted(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  private lazy val warehouses: (String, String) = {
    val (base, batch, embB, embN) = frames
    val whInc = graft.util.Scratch.dir("cur-spec-inc")
    CurationState.build(spark, whInc, base, embB)
    CurationState.append(spark, whInc, batch, embN)
    val whFull = graft.util.Scratch.dir("cur-spec-full")
    CurationState.build(spark, whFull, base.unionByName(batch),
      embB.toDF("vec_id", "embedding").unionByName(embN))
    (whInc, whFull)
  }

  private def tbl(wh: String, name: String): DataFrame = {
    import graft.table.IceliteTable
    IceliteTable.load(spark, wh, "cur", name).read()
  }

  test("append ≡ rebuild for every persisted verdict table") {
    val (inc, full) = warehouses
    for (name <- Seq("state", "vpairs", "bands", "bdf"))
      assert(collectSorted(tbl(inc, name)) == collectSorted(tbl(full, name)),
        s"table $name diverged")
    assert(collectSorted(WgramIndex.readMeta(spark, inc)) ==
      collectSorted(WgramIndex.readMeta(spark, full)), "wgram metadata diverged")
  }

  test("incremental manifest equals the from-scratch manifest") {
    val (inc, full) = warehouses
    assert(CurationState.manifest(spark, inc).collect().map(_.toSeq).toSeq ==
      CurationState.manifest(spark, full).collect().map(_.toSeq).toSeq)
  }

  test("only the dirty carriers were re-evaluated, per family") {
    warehouses // force build+append
    assert(CurationState.lastAppendDirty == Map(
      "sig" -> 0L, // no 5-gram crossed the df cap
      "ngram" -> 1L, // {20}: batch eval doc 56 carries Q
      "substr" -> 2L, // {30, 40}: batch doc 5 lowers G's min_doc
      "line" -> 5L)) // {11,12,13,16,18}: line df crossed 5 → 6
  }

  test("the non-monotone verdict flips landed in the state table") {
    import org.apache.spark.sql.functions.col
    val (inc, _) = warehouses
    val st = tbl(inc, "state")
      .select(col("doc_id"), col("substr_bad"), col("ngram_bad"),
        col("sem_bad"), col("ntc"))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getLong(4))).toMap
    // batch doc 5 (id < 30) made base 30 the non-first carrier of G;
    // 40 was already flagged; 5 itself is never flagged (it IS min)
    assert(st(30L)._1 && st(40L)._1 && !st(5L)._1)
    // base 20 contaminated by the NEW eval doc 56's Q-run
    assert(st(20L)._2 && !st(8L)._2)
    // batch vec 51 is a copy of eval vec 1
    assert(st(51L)._3 && !st(53L)._3)
    // boilerplate line dropped from all six carriers: 32-token docs
    // lose the 4-token line
    for (id <- Seq(11L, 12L, 13L, 16L, 18L, 54L)) assert(st(id)._4 == 28L)
    assert(st(8L)._4 == 32L)
  }

  test("TWO successive appends converge to the same state as one rebuild (fold associativity)") {
    import org.apache.spark.sql.functions.col
    val (base, batch, embB, embN) = frames
    val b1 = batch.filter(col("doc_id") <= 51L)
    val b2 = batch.filter(col("doc_id") > 51L)
    val e1 = embN.filter(col("vec_id") <= 51L)
    val e2 = embN.filter(col("vec_id") > 51L)
    val wh2 = graft.util.Scratch.dir("cur-spec-two")
    CurationState.build(spark, wh2, base, embB)
    CurationState.append(spark, wh2, b1, e1)
    CurationState.append(spark, wh2, b2, e2)
    val (_, full) = warehouses
    for (name <- Seq("state", "vpairs", "bands", "bdf"))
      assert(collectSorted(tbl(wh2, name)) == collectSorted(tbl(full, name)),
        s"table $name diverged after two folds")
    assert(CurationState.manifest(spark, wh2).collect().map(_.toSeq).toSeq ==
      CurationState.manifest(spark, full).collect().map(_.toSeq).toSeq)
  }

  test("the late dup joins its cluster and the survivor stays the min id") {
    import org.apache.spark.sql.functions.col
    val (inc, _) = warehouses
    val pairs = collectSorted(tbl(inc, "vpairs"))
    assert(pairs.contains(Seq(19L, 53L)) && pairs.contains(Seq(22L, 53L)) &&
      pairs.contains(Seq(19L, 22L)))
    val clusters = Dedup.clustersFromPairs(spark,
      tbl(inc, "vpairs").select(col("x"), col("y")))
    val members = clusters.filter(col("cluster_id") === 19L)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(members == Seq(19L, 22L, 53L))
  }
}
