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
    // edges come from the CACHED bucket-aligned degree frame
    // ([[EdgeIndex.degreedEdges]]): every per-round reference is an
    // InMemoryTableScan that REMAPS hashpartitioning(u) onto its own
    // attributes, so the edge side of each round's join never
    // exchanges — unlike an in-plan repartition/localCheckpoint pin,
    // which the nested per-round references re-alias and re-exchange
    // (measured in r14: the |E| list shuffled every round). Per-round
    // wire cost = the |V| rank vector + map-side-combined messages.
    val ed = EdgeIndex.degreedEdges(spark, dir)
    // bucket-local distinct: one rank row per source node
    var r = ed.select(col("u").as("p")).distinct()
      .select(col("p"), lit(PrScale).as("r"))
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

  /** PERSONALIZED PageRank from a seed node (topic-sensitive ranking,
    * Haveliwala WWW'02) — "parts most relevant to THIS part by graph
    * proximity", the item-page recommendation query, vs. global
    * PageRank's "most important parts overall". Same exact integer
    * arithmetic and unrolled-oracle contract as [[pagerank]]; the
    * teleport mass returns to the SEED alone (picked as min(u), a
    * 1-row frame joined in — never a driver constant baked per-run).
    *
    * Scale shape: the rank vector starts as ONE row and grows with the
    * K-hop frontier — each round joins only the NONZERO entries
    * against the cached edge list, so early iterations ship a frontier,
    * not |V| (the sparsity a global rank can never exploit; for a
    * 3-hop neighborhood of one item in a 100 TB graph that is the
    * whole difference between a lookup and a full-graph job).
    */
  def pagerankPersonalized(spark: SparkSession, dir: String): DataFrame = {
    // cached bucket-aligned degree frame per round (see [[pagerank]]);
    // the seed stays a 1-row checkpointed frame — a driver constant
    // would bake per-run, a nested agg would rescan per round
    val ed = EdgeIndex.degreedEdges(spark, dir)
    val seed = ed.agg(min(col("u")).as("s")).localCheckpoint(true)
    try {
      val teleport = seed.select(col("s").as("p"), lit(3L * PrScale / 20).as("r"))
      var r = seed.select(col("s").as("p"), lit(PrScale).as("r"))
      for (_ <- 1 to PrIters) {
        val propagated = ed.join(r, ed("u") === r("p"))
          .groupBy(col("v"))
          .agg(idiv(lit(17) * sum(idiv(col("r"), col("d"))), lit(20)).as("r"))
          .select(col("v").as("p"), col("r"))
        r = propagated.unionAll(teleport)
          .groupBy(col("p")).agg(sum(col("r")).as("r"))
      }
      r.select(col("p").as("part"), col("r").as("rank"))
        .orderBy(desc("rank"), col("part"))
        .limit(20)
    } finally seed.unpersist()
  }

  private val pagerankPersonalizedOracle = {
    val tele = 3L * PrScale / 20
    val iters = (1 to PrIters).map { k =>
      s"""r$k AS (
         |  SELECT p, sum(r) AS r FROM (
         |    SELECT e.v AS p, (17 * sum(r${k - 1}.r // deg.d)) // 20 AS r
         |    FROM e JOIN deg ON e.u = deg.u JOIN r${k - 1} ON r${k - 1}.p = e.u
         |    GROUP BY e.v
         |    UNION ALL SELECT s, $tele FROM seed) x
         |  GROUP BY p)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT a.l_partkey AS u, b.l_partkey AS v
       |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
       |  WHERE a.l_partkey <> b.l_partkey GROUP BY 1, 2),
       |deg AS (SELECT u, count(*) AS d FROM e GROUP BY u),
       |seed AS (SELECT min(u) AS s FROM e),
       |r0 AS (SELECT s AS p, CAST($PrScale AS BIGINT) AS r FROM seed),
       |$iters
       |SELECT p AS part, CAST(r AS BIGINT) AS rank
       |FROM r$PrIters
       |ORDER BY rank DESC, part
       |LIMIT 20""".stripMargin
  }

  /** Triangle counting + per-node triangle participation — the
    * clustering primitive (community tightness, recommendation
    * confidence) over the same co-purchase graph. DEGREE-ORDERED
    * oriented edges (compact-forward: each undirected edge oriented
    * lower-(deg, id) endpoint → higher, [[EdgeIndex.orientedEdges]])
    * make each triangle enumerate EXACTLY once from its ≺-minimum
    * corner: wedge join (a→b)⋈(a→c) with key(b) ≺ key(c), then one
    * hash probe for the closing edge (b→c). Cost is the wedge count
    * Σ C(outdeg, 2), which degree ordering provably MINIMIZES over
    * all acyclic orientations (outdeg = O(√|E|)) — the r18 id-order
    * slice paid Σ ordered-deg², severalfold more under skew — and
    * the source-keyed self-join is bucket-aligned on `u`, so the
    * wedge stage runs with ZERO exchanges (the old path-shaped wedge
    * keyed one side on `v` and paid a full edge exchange per query).
    * The triangle SET is orientation-invariant, so results (and the
    * oracle) are unchanged. Participation explodes each triangle to
    * its three corners and hash-aggs — 3 rows per triangle,
    * TakeOrdered top-10.
    */
  /** Edge-count ceiling for the triangle closing-edge broadcast: two
    * 8-byte keys per row plus hash-map overhead keeps ~50M edges well
    * under Spark's 8 GB broadcast hard limit with executor headroom.
    */
  val TriangleBroadcastMaxEdges: Long = 50000000L

  def triangles(spark: SparkSession, dir: String): DataFrame = {
    // degree-ordered oriented serving slice, bucketed on u: BOTH
    // wedge sides key on the source vertex, so the self-join reads
    // bucket-aligned with zero exchanges; the three references
    // re-scan the bucketed parquet, cheaper at scale than shuffling
    val e = EdgeIndex.orientedEdges(spark, dir)
    locally {
      // the closing-edge probe BROADCASTS the ordered edge list when it
      // is small enough (tens of MB even at 10× this fixture): the
      // wedge stream — the big intermediate, Σ deg² rows — then never
      // shuffles; it probes the broadcast hash map scan-locally and
      // only the 3-per-triangle corner explosion reaches the final
      // hash-agg (map-side combined onto |V| groups). The hint is
      // SIZE-GATED here because Spark honors an explicit broadcast
      // hint regardless of autoBroadcastJoinThreshold — an unguarded
      // hint on an oversized edge list would hit the 8 GB/driver
      // broadcast limits and fail the job rather than degrade; above
      // the gate we fall back to the plain shuffle join on (a, c).
      // The gate probe is METADATA-ONLY: the persisted edge table's
      // snapshot log carries exact per-commit record counts, so the
      // directed-edge upper bound costs zero IO and zero jobs (the
      // old e.count() re-scanned the edge parquet per invocation —
      // a full extra pass at 100 TB). Canonical u < v edges are
      // exactly half the stored directed pairs.
      val canonBound = EdgeIndex.directedEdgeCountBound(spark, dir) / 2
      val probe = e.select(col("u"), col("v"))
      val e3 = if (canonBound <= TriangleBroadcastMaxEdges) broadcast(probe.as("e3")) else probe.as("e3")
      // wedge = two out-edges of one source, ordered by the (deg, id)
      // key carried in `vd` so each out-neighbor PAIR enumerates once
      val tri = e.as("e1")
        .join(e.as("e2"), col("e1.u") === col("e2.u") &&
          (col("e1.vd") < col("e2.vd") ||
            (col("e1.vd") === col("e2.vd") && col("e1.v") < col("e2.v"))))
        .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
        .join(e3, col("b") === col("e3.u") && col("c") === col("e3.v"))
        .select(col("a"), col("b"), col("c"))
      tri.select(explode(array(col("a"), col("b"), col("c"))).as("part"))
        .groupBy(col("part"))
        .agg(count(lit(1)).as("n_triangles"))
        .orderBy(desc("n_triangles"), col("part"))
        .limit(10)
    }
  }

  private val trianglesOracle =
    """WITH e AS (
      |  SELECT DISTINCT x.l_partkey AS u, y.l_partkey AS v
      |  FROM lineitem x JOIN lineitem y ON x.l_orderkey = y.l_orderkey
      |  WHERE x.l_partkey < y.l_partkey),
      |tri AS (
      |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
      |  FROM e e1 JOIN e e2 ON e1.v = e2.u
      |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
      |corners AS (
      |  SELECT a AS part FROM tri
      |  UNION ALL SELECT b FROM tri
      |  UNION ALL SELECT c FROM tri)
      |SELECT part, count(*) AS n_triangles
      |FROM corners GROUP BY part
      |ORDER BY n_triangles DESC, part
      |LIMIT 10""".stripMargin

  /** BFS hops unrolled identically in the oracle. */
  val BfsHops: Int = 3

  /** Bounded-hop BFS shortest distances from the smallest part key —
    * the reachability primitive (how much of the catalog sits within
    * K recommendation hops). Distances are exact integers: round k
    * folds `dist_k(v) = min(dist_{k-1}(v), 1 + min over in-edges from
    * the settled set)` — the relational Bellman-Ford step, monotone
    * and idempotent once settled, so K unrolled rounds equal true
    * BFS depth-K distances. Reports the distance histogram.
    *
    * Scale shape: the edge list builds once (basket-bounded like
    * `copurchase_pairs`) and is MATERIALIZED; each round is one
    * equi-join of the current distance vector with the cached edges
    * plus a min hash-agg — the shuffle is the frontier-sized distance
    * vector, never the edge list re-derivation. The source pick is a
    * 1-row broadcast, not a driver constant baked per-run.
    */
  def bfs(spark: SparkSession, dir: String): DataFrame = {
    // bucket-aligned edge scans per hop (see [[pagerank]]): the edge
    // side of each frontier join never exchanges; the wire cost per
    // hop is the frontier-sized distance vector
    // RAW bucketed scans here (not the cached degree frame): BFS's
    // per-hop frontier is tiny, so each hop is a broadcast-frontier
    // probe of the edge scan — re-reading the bucketed parquet per hop
    // measured FASTER than the columnar cache locally and shuffles
    // nearly nothing (0.3 MB vs 48 MB for the r14 per-hop re-exchange)
    val e = EdgeIndex.bucketedEdges(spark, dir).select(col("u"), col("v"))
    val src = e.agg(min(col("u")).as("p")).localCheckpoint(true)
    try {
      var d = src.select(col("p"), lit(0L).as("d"))
      for (_ <- 1 to BfsHops) {
        val stepped = e.join(d, e("u") === d("p"))
          .select(col("v").as("p"), (col("d") + 1L).as("d"))
        d = d.select(col("p"), col("d")).union(stepped)
          .groupBy(col("p")).agg(min(col("d")).as("d"))
      }
      d.groupBy(col("d").as("dist")).agg(count(lit(1)).as("n_parts")).orderBy("dist")
    } finally src.unpersist()
  }

  private val bfsOracle = {
    val rounds = (1 to BfsHops).map { k =>
      s"""d$k AS (
         |  SELECT p, min(d) AS d FROM (
         |    SELECT p, d FROM d${k - 1}
         |    UNION ALL
         |    SELECT e.v AS p, d${k - 1}.d + 1 AS d
         |    FROM e JOIN d${k - 1} ON e.u = d${k - 1}.p) x
         |  GROUP BY p)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
       |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
       |  WHERE a.l_partkey <> b.l_partkey),
       |d0 AS (SELECT min(u) AS p, CAST(0 AS BIGINT) AS d FROM e),
       |$rounds
       |SELECT d AS dist, count(*) AS n_parts FROM d$BfsHops
       |GROUP BY d ORDER BY dist""".stripMargin
  }

  /** Label-propagation rounds (unrolled identically in the oracle). */
  val CommRounds: Int = 2

  /** Synchronous label-propagation community detection — the
    * community primitive next to PageRank (importance), triangles
    * (tightness), and BFS (reachability). Every node starts as its
    * own community (label = part key); each round every node adopts
    * the PLURALITY label among its neighbors' previous-round labels,
    * ties broken by the smallest label — all-integer counting and an
    * integer tie-break, so K synchronous rounds are bit-identical
    * cross-engine (the unrolled-chain pattern again; asynchronous LPA
    * would be order-dependent and ungateable). Reports the 20 largest
    * communities.
    *
    * Scale shape: the edge list materializes once (basket-bounded);
    * each round is ONE equi-join of the |V|-row label vector with the
    * cached edges, a (v, label) hash-agg bounded by |E|, and a
    * struct-max plurality pick that map-side-combines to one row per
    * node — on a cluster edges and labels co-partition on `u`, so the
    * per-round shuffle is the label vector plus the partial-combined
    * count stream, never a re-derivation.
    */
  def communities(spark: SparkSession, dir: String): DataFrame = {
    // bucket-aligned edge scans per round (see [[pagerank]]); the
    // per-round shuffle is the |V| label vector + the map-side-combined
    // (v, label) counts
    val e = EdgeIndex.degreedEdges(spark, dir).select(col("u"), col("v"))
    var l = e.select(col("u").as("p")).distinct()
      .select(col("p"), col("p").as("label"))
    for (_ <- 1 to CommRounds) {
      val cnt = e.join(l, e("u") === l("p"))
        .groupBy(col("v"), col("label"))
        .agg(count(lit(1)).as("c"))
      // plurality pick as ONE struct-max aggregation (count desc via
      // max, min-label tie-break via the negated label) instead of a
      // row_number window: the max PARTIAL-aggregates map-side, so the
      // second per-round exchange carries ≤ one row per node per
      // partition rather than the full |E|-bounded count stream — and
      // there is no per-partition sort at all. Labels are part keys
      // (positive), so the negation is a safe total-order flip.
      l = cnt.groupBy(col("v"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("v").as("p"), (-col("m").getField("nl")).as("label"))
    }
    l.groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_parts"))
      .orderBy(desc("n_parts"), col("community"))
      .limit(20)
  }

  private val communitiesOracle = {
    val rounds = (1 to CommRounds).map { k =>
      s"""l$k AS (
         |  SELECT v AS p, label FROM (
         |    SELECT v, label, c,
         |      row_number() OVER (PARTITION BY v ORDER BY c DESC, label) AS rn
         |    FROM (
         |      SELECT e.v, l${k - 1}.label, count(*) AS c
         |      FROM e JOIN l${k - 1} ON e.u = l${k - 1}.p
         |      GROUP BY e.v, l${k - 1}.label) cnt) x
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
       |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
       |  WHERE a.l_partkey <> b.l_partkey),
       |l0 AS (SELECT DISTINCT u AS p, u AS label FROM e),
       |$rounds
       |SELECT label AS community, count(*) AS n_parts
       |FROM l$CommRounds
       |GROUP BY label
       |ORDER BY n_parts DESC, community
       |LIMIT 20""".stripMargin
  }

  /** Minimum co-occurrence MULTIPLICITY for a co-purchase edge to
    * carry link-prediction evidence (association mining's min-support
    * over lineitem-pair counts — a part listed twice in one order
    * contributes 2, so this is multiplicity, not a distinct-order
    * count; the oracle applies the identical floor): single-count
    * co-occurrence between random-basket parts is noise, and it is also
    * the complexity bomb — at sf0.1 the unfiltered graph has 2.4M
    * directed edges with near-UNIFORM degree ~120 (Σ deg² ≈ 3·10⁸
    * wedges; a hub/df cap cannot help when there are no hubs, and the
    * first cut of this query paid 130 s for exactly that reason). The
    * support threshold is the principled fix AND the scale dial: it
    * keeps repeat co-purchases only (7.7k edges at sf0.1, 300×
    * smaller), the signal a recommender would actually trust. Like
    * [[Dedup.MaxShingleDf]], the threshold is part of the gated
    * semantics — the oracle applies the identical floor.
    */
  val LinkMinSupport = 2

  /** Link prediction by COMMON-NEIGHBOR count — the classic local
    * similarity index (Liben-Nowell/Kleinberg): for part pairs NOT yet
    * co-purchased (at the support level), count shared strong
    * co-purchase neighbors; the top pairs are the "customers also
    * bought" recommendations the graph itself implies. Edges carry a
    * [[LinkMinSupport]] floor (see above — the noise/scale dial);
    * candidates come from the same wedge join as triangle counting
    * (cost = Σ deg² of the SUPPORT-FILTERED graph, never |V|²),
    * existing edges leave via one anti join on the canonical `a < b`
    * pair, and the count/ties are all-integer — bit-exact
    * cross-engine. Top-20.
    */
  def linkPredict(spark: SparkSession, dir: String): DataFrame = {
    // support-thresholded slice of the BUCKETED index serving: the
    // wedge self-join keys on u on BOTH sides, so two bucket-aligned
    // scans join with ZERO exchanges (the support filter is row-local
    // and keeps the scan's partitioning) — only the wedge stream's
    // (a, b) hash-agg shuffles, which is the operator's inherent cost
    val e = EdgeIndex.supportEdges(spark, dir, LinkMinSupport)
    // wedges through a shared neighbor w, oriented a < b
    val cand = e.as("e1").join(e.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.v").as("a"), col("e2.v").as("b"))
    val ordered = e.filter(col("u") < col("v"))
      .select(col("u").as("a"), col("v").as("b"))
    cand.join(ordered, Seq("a", "b"), "left_anti")
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common_neighbors"))
      .orderBy(desc("common_neighbors"), col("a"), col("b"))
      .limit(20)
  }

  /** Node-similarity by neighbor-set JACCARD over the support graph —
    * link prediction's normalized sibling: raw common-neighbor counts
    * favor high-degree nodes, while |N(a)∩N(b)| / |N(a)∪N(b)| ranks a
    * pair by how much of their neighborhoods AGREE (the similarity an
    * item-item recommender blends with co-occurrence). Scored in ppm
    * by one integer floor division (`10⁶·common div (da+db−common)`) —
    * both engines emit the identical integer, no float ranking to
    * diverge on. Adjacent pairs stay IN (unlike [[linkPredict]], which
    * anti-joins them away: similarity describes existing relations
    * too). Same support-filtered wedge shape and cost as link
    * prediction; degrees join from one |V|-sized hash-agg.
    */
  def jaccardSimilar(spark: SparkSession, dir: String): DataFrame = {
    // bucket-aligned wedge join (see [[linkPredict]]); degrees are a
    // bucket-local agg off the same scan — no exchange either
    val e = EdgeIndex.supportEdges(spark, dir, LinkMinSupport)
    val deg = e.groupBy(col("u")).agg(count(lit(1)).as("d"))
    val common = e.as("e1").join(e.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .groupBy(col("e1.v").as("a"), col("e2.v").as("b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(deg.select(col("u").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("u").as("b"), col("d").as("db")), "b")
      .select(col("a"), col("b"), col("common"),
        idiv(lit(1000000L) * col("common"),
          col("da") + col("db") - col("common")).as("jaccard_ppm"))
      .orderBy(desc("jaccard_ppm"), col("a"), col("b"))
      .limit(20)
  }

  private val jaccardSimilarOracle =
    s"""WITH e AS (
       |  SELECT a.l_partkey AS u, b.l_partkey AS v
       |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
       |  WHERE a.l_partkey <> b.l_partkey
       |  GROUP BY 1, 2 HAVING count(*) >= $LinkMinSupport),
       |deg AS (SELECT u, count(*) AS d FROM e GROUP BY u),
       |common AS (
       |  SELECT e1.v AS a, e2.v AS b, count(*) AS common
       |  FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
       |  GROUP BY 1, 2)
       |SELECT a, b, common,
       |  (1000000 * common) // (da.d + db.d - common) AS jaccard_ppm
       |FROM common
       |JOIN deg da ON da.u = a
       |JOIN deg db ON db.u = b
       |ORDER BY jaccard_ppm DESC, a, b
       |LIMIT 20""".stripMargin

  private val linkPredictOracle =
    s"""WITH e AS (
      |  SELECT a.l_partkey AS u, b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      |  WHERE a.l_partkey <> b.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= $LinkMinSupport),
      |cand AS (
      |  SELECT e1.v AS a, e2.v AS b
      |  FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v),
      |ordered AS (SELECT u AS a, v AS b FROM e WHERE u < v),
      |missing AS (
      |  SELECT c.a, c.b FROM cand c
      |  WHERE NOT EXISTS (SELECT 1 FROM ordered o WHERE o.a = c.a AND o.b = c.b))
      |SELECT a, b, count(*) AS common_neighbors
      |FROM missing GROUP BY a, b
      |ORDER BY common_neighbors DESC, a, b
      |LIMIT 20""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("graph_link_predict", linkPredict _, Some(linkPredictOracle),
      "common-neighbor link prediction: wedge candidates minus existing edges, integer counts"),
    GraftQuery("graph_pagerank", pagerank _, Some(pagerankOracle),
      "integer PageRank over the co-purchase graph: K cached-edge joins, bit-exact unrolled oracle"),
    GraftQuery("graph_jaccard", jaccardSimilar _, Some(jaccardSimilarOracle),
      "neighbor-set Jaccard node similarity over the support graph: integer ppm " +
        "scoring, degree-normalized common neighbors"),
    GraftQuery("graph_ppr", pagerankPersonalized _, Some(pagerankPersonalizedOracle),
      "personalized PageRank from a seed part: sparse frontier propagation, " +
        "seed-only teleport, integer-exact unrolled oracle"),
    GraftQuery("graph_triangles", triangles _, Some(trianglesOracle),
      "triangle participation via ordered-edge wedge join + closing-edge probe (each triangle once)"),
    GraftQuery("graph_bfs", bfs _, Some(bfsOracle),
      "bounded-hop BFS distance histogram: K min-fold rounds over the cached co-purchase edges"),
    GraftQuery("graph_communities", communities _, Some(communitiesOracle),
      "synchronous label propagation: K plurality-vote rounds, min-label ties, top-20 community sizes"))
}
