package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.Tables.t

/** Graph analytics over relationships the relational tables imply —
  * here the item co-purchase graph (parts linked when they share an
  * order, the `copurchase_pairs` edge set made first-class).
  *
  * PageRank runs in EXACT integer arithmetic: ranks are scaled by
  * [[PrScale]], the damping factor 0.85 is the rational 17/20, and
  * each neighbor contribution is one integer floor division
  * `r(u) div deg(u)` — so K iterations are bit-identical cross-engine
  * (the [[TextAnalysis.qualityClassifier]] pattern: a genuinely
  * iterative algorithm whose oracle is the same unrolled integer
  * chain). Floor-rounding loses mass (each division drops < 1/SCALE),
  * which is fine for RANKING — the loss is monotone-bounded and both
  * engines lose identically.
  *
  * Scale shape: the edge set builds once from an order-key self-join
  * (pair volume bounded by Σ basket² like `copurchase_pairs`, never
  * |lineitem|²), deduped, degree-joined, and MATERIALIZED; each of
  * the K iterations is then ONE equi-join of the rank vector with the
  * cached edge list plus a hash-agg on the destination — on a
  * cluster, edges and ranks co-partition on `u` so the per-iteration
  * shuffle is the rank vector, not the edge list. No driver-side
  * state: the rank vector lives distributed end to end.
  */
object Graph {

  /** Fixed-point scale for integer PageRank. */
  val PrScale: Long = 1000000L

  /** Iterations (unrolled identically in the oracle). */
  val PrIters: Int = 3

  private def idiv(num: Column, den: Column): Column =
    call_function("div", num, den)

  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    val e = li.as("a").join(li.as("b"), "l_orderkey")
      .filter(col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
    val deg = e.groupBy(col("u")).agg(count(lit(1)).as("d"))
    // (u, v, d): the per-iteration join input, built once
    val ed = e.join(deg, "u").localCheckpoint(true)
    try {
      var r = deg.select(col("u").as("p"), lit(PrScale).as("r"))
      for (_ <- 1 to PrIters) {
        r = ed.join(r, ed("u") === r("p"))
          .groupBy(col("v"))
          .agg((lit(3L * PrScale / 20) +
            idiv(lit(17) * sum(idiv(col("r"), col("d"))), lit(20))).as("r"))
          .select(col("v").as("p"), col("r"))
      }
      r.select(col("p").as("part"), col("r").as("rank"))
        .orderBy(desc("rank"), col("part"))
        .limit(20)
    } finally ed.unpersist()
  }

  private val pagerankOracle = {
    val base = 3L * PrScale / 20
    val iters = (1 to PrIters).map { k =>
      s"""r$k AS (
         |  SELECT e.v AS p,
         |    $base + (17 * sum(r${k - 1}.r // deg.d)) // 20 AS r
         |  FROM e JOIN deg ON e.u = deg.u JOIN r${k - 1} ON r${k - 1}.p = e.u
         |  GROUP BY e.v)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
       |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
       |  WHERE a.l_partkey <> b.l_partkey),
       |deg AS (SELECT u, count(*) AS d FROM e GROUP BY u),
       |r0 AS (SELECT u AS p, CAST($PrScale AS BIGINT) AS r FROM deg),
       |$iters
       |SELECT p AS part, CAST(r AS BIGINT) AS rank
       |FROM r$PrIters
       |ORDER BY rank DESC, part
       |LIMIT 20""".stripMargin
  }

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("graph_pagerank", pagerank _, Some(pagerankOracle),
      "integer PageRank over the co-purchase graph: K cached-edge joins, bit-exact unrolled oracle"))
}
