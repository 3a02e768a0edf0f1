package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Nearest-centroid pick for one embedding row against a DRIVER-BAKED
  * centroid matrix — the kernel of the size-gated k-means fast path
  * ([[graft.operators.Clustering]]): per row, k exact-decimal dot
  * products and one argmax, all inside a single projection. Replaces
  * (under the gate) the relational explode → broadcast-join →
  * n×k×dims decimal aggregation → argmax pipeline, which the sf1
  * scale probe showed dominating the cluster-index ingest.
  *
  * BIT-EXACT contract with the relational path (and therefore the
  * DuckDB oracle CTEs): each term replicates Spark's
  * `(val * cval).cast("decimal(38,20)")` exactly —
  * `BigDecimal.valueOf(product)` (the shortest-representation
  * conversion `Cast` uses) rounded to scale 20 HALF_UP — terms sum in
  * exact decimal (associative, so any order matches the shuffle
  * aggregation), the sum converts via `doubleValue` (Spark's
  * `Decimal.toDouble`), and the cosine divides in the same IEEE
  * bracket order `dot / (sqrt(nsq) * sqrt(c_nsq))`. Ties break to the
  * smallest cid by iterating centroids in ascending cid order and
  * replacing only on a strictly greater cosine. Missing matrix
  * entries are 0.0, which contributes an exact decimal zero — the
  * same as the relational join dropping the pair.
  *
  * SHARD-LOCAL mode (`shardMod > 1`, `vecId` supplied): only the
  * centroids with `cid % shardMod == vec_id % shardMod` compete — the
  * kernel of SHARDED k-means training ([[graft.operators.Clustering]]
  * sharded chain), where per-row work is the SHARD's centroid budget
  * (a constant), not the global k. The per-shard index lists are
  * precomputed once per baked matrix and iterate in ascending cid
  * order, so the tie-break contract is unchanged within a shard. A
  * row whose shard has no centroid yields null — identical to the
  * relational join producing no candidate pair.
  *
  * Centroid rows are constructor data (not child expressions): the
  * matrix is k×dims doubles baked per Lloyd round under the caller's
  * size gate, the executor-side analog of a broadcast hash map.
  * Evaluation is interpreted ([[CodegenFallback]]) — the per-row work
  * IS the per-shard×dims loop; codegen would only inline the loop
  * shell.
  */
case class CentroidArgMax(
    emb: Expression,
    nsq: Expression,
    cids: Array[Long],
    matrix: Array[Array[Double]],
    cnorms: Array[Double],
    vecId: Option[Expression] = None,
    shardMod: Int = 1) extends Expression with CodegenFallback {

  require(cids.length == matrix.length && cids.length == cnorms.length,
    "cids/matrix/cnorms must align")
  require((1 until cids.length).forall(i => cids(i - 1) < cids(i)),
    "cids must be strictly ascending (ties break to the smallest cid)")
  require(shardMod >= 1, s"shardMod must be >= 1 (got $shardMod)")
  require(shardMod == 1 || vecId.isDefined,
    "shard-local mode needs the vec_id child to derive the row's shard")

  override def children: Seq[Expression] = Seq(emb, nsq) ++ vecId
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def foldable: Boolean = false

  /** Ascending-cid centroid indices per shard (one all-centroid list
    * in unsharded mode).
    */
  @transient private lazy val shardIdx: Array[Array[Int]] =
    if (shardMod == 1) Array(Array.range(0, cids.length))
    else {
      val bs = Array.fill(shardMod)(Array.newBuilder[Int])
      var j = 0
      while (j < cids.length) {
        bs(((cids(j) % shardMod) + shardMod).toInt % shardMod) += j
        j += 1
      }
      bs.map(_.result())
    }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val vecOk = vecId.forall(_.dataType == LongType)
    (emb.dataType, nsq.dataType) match {
      case (ArrayType(FloatType, _), org.apache.spark.sql.types.DoubleType) if vecOk =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"centroid_argmax needs (array<float>, double[, bigint vec_id]), got $other")
    }
  }

  override def eval(input: InternalRow): Any = {
    val a = emb.eval(input)
    val n = nsq.eval(input)
    if (a == null || n == null || cids.isEmpty) return null
    val idxs =
      if (shardMod == 1) shardIdx(0)
      else {
        val v = vecId.get.eval(input)
        if (v == null) return null
        shardIdx(((v.asInstanceOf[Long] % shardMod) + shardMod).toInt % shardMod)
      }
    if (idxs.isEmpty) return null // seedless shard: no candidate pair
    val arr = a.asInstanceOf[ArrayData]
    val dims = arr.numElements()
    val vNorm = math.sqrt(n.asInstanceOf[Double])
    var best = 0L
    var bestCos = Double.NegativeInfinity
    var found = false
    var p = 0
    while (p < idxs.length) {
      val j = idxs(p)
      val row = matrix(j)
      val lim = math.min(dims, row.length)
      var acc = JBigDecimal.ZERO
      var i = 0
      while (i < lim) {
        val prod = arr.getFloat(i).toDouble * row(i)
        if (prod != 0.0) // exact zero terms cannot move an exact decimal sum
          acc = acc.add(JBigDecimal.valueOf(prod).setScale(20, RoundingMode.HALF_UP))
        i += 1
      }
      val cos = acc.doubleValue() / (vNorm * math.sqrt(cnorms(j)))
      if (!found || cos > bestCos) { best = cids(j); bestCos = cos; found = true }
      p += 1
    }
    best
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(emb = newChildren(0), nsq = newChildren(1),
      vecId = if (newChildren.length > 2) Some(newChildren(2)) else None)
}
