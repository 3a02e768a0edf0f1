package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Add, Ascending, BindReferences, Descending, Expression, If, IsNaN, Literal, SortOrder, UnsafeProjection}
import org.apache.spark.sql.types.{DoubleType, FloatType}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Whole-operator Catalyst extension (the §2 preference-order (c)
  * surface: custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`,
  * activated per session): bounded-heap top-k per group.
  *
  * The built-in formulation — `row_number().over(Window.partitionBy(g)
  * .orderBy(o)) <= k` — shuffles EVERY row to its group's partition
  * and fully sorts each partition, even though only k rows per group
  * survive. This operator plans as two physical stages, exactly like a
  * hash aggregate:
  *
  *  1. partial: per input partition, a hash map of size-k heaps —
  *     at most k·groups rows leave the partition;
  *  2. final: the same heap pass after a hash exchange on the group
  *     keys (`ClusteredDistribution` — `EnsureRequirements` inserts
  *     the shuffle).
  *
  * Shuffle volume drops from |rows| to ≤ k·groups·partitions, there is
  * NO sort anywhere (heap replace is O(log k) per row), and memory is
  * bounded by groups-per-partition · k rows. At 100 TB this is the
  * difference between shuffling the fact table and shuffling a few
  * thousand rows.
  *
  * Determinism contract: `order` must be a TOTAL order per group
  * (include a unique tiebreak column) — same requirement the
  * `row_number` formulation has for a stable result.
  */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Plans the logical node as partial + final heap passes. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, child) =>
      val partial = TopKPerGroupExec(g, o, k, partial = true, planLater(child))
      TopKPerGroupExec(g, o, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute] = child.output
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
  override def nodeName: String = if (partial) "TopKPerGroup (partial)" else "TopKPerGroup (final)"

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val gExprs = groupExprs
    val boundOrder = order.map(BindReferences.bindReference(_, childOutput))
    val kk = k
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(gExprs, childOutput)
      val ordering = GenerateOrdering.generate(boundOrder)
      // max-heap on the sort order: peek() is the WORST retained row,
      // so replace-if-better is one compare + O(log k)
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ordering.compare(b, a)
      }
      val heaps = new java.util.HashMap[InternalRow, java.util.PriorityQueue[InternalRow]]()
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var q = heaps.get(key)
        if (q == null) {
          // small initial capacity — the queue grows on demand, so a
          // large k with many tiny groups doesn't allocate k-slot
          // arrays per group
          q = new java.util.PriorityQueue[InternalRow](math.min(kk, 16) + 1, worstFirst)
          heaps.put(key.copy(), q) // projection row is reused — copy for map residency
        }
        if (q.size < kk) q.add(row.copy())
        else if (ordering.compare(row, q.peek()) < 0) {
          q.poll()
          q.add(row.copy())
        }
      }
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }
}

object TopKPerGroup {

  /** DataFrame API: the k best rows per group, ordered by `orderCols`
    * as (name, descending) pairs (must total-order each group — include
    * a unique tiebreak). Columns are resolved against the input's
    * analyzed output, so the node enters planning fully resolved (the
    * Spark 4 Column lazy-node bridge would otherwise leak unresolved
    * ColumnNodeExpressions into the physical plan). Output rows are
    * the input rows — apply a final `orderBy` for presentation.
    */
  def apply(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    require(k > 0 && k < Int.MaxValue, "topKPerGroup needs 0 < k < Int.MaxValue")
    val spark = df.sparkSession
    ensureStrategy(spark)
    val plan = ColumnBridge.logicalPlan(df)
    val resolve = ColumnBridge.resolver(spark)
    def attr(n: String) = plan.output.filter(a => resolve(a.name, n)) match {
      case Seq(one) => one
      case Seq() => throw new IllegalArgumentException(
        s"topKPerGroup: no column '$n' in ${plan.output.map(_.name).mkString(", ")}")
      case many => throw new IllegalArgumentException(
        s"topKPerGroup: ambiguous column '$n' (${many.mkString(", ")})")
    }
    val g = groupCols.map(n => normalizeKey(attr(n)))
    val o = orderCols.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    ColumnBridge.ofRows(spark, TopKPerGroupNode(g, o, k, plan))
  }

  /** Float/double group keys must canonicalize -0.0/0.0 and NaN bit
    * patterns BEFORE hashing/comparison — the optimizer's
    * NormalizeFloatingNumbers rule does this for built-in grouping
    * operators but does not know about this node, so raw keys would
    * split groups the window formulation merges.
    */
  private def normalizeKey(e: Expression): Expression = e.dataType match {
    case DoubleType => If(IsNaN(e), Literal(Double.NaN), Add(e, Literal(0.0d)))
    case FloatType => If(IsNaN(e), Literal(Float.NaN), Add(e, Literal(0.0f)))
    case _ => e
  }

  /** Idempotently install the planner strategy on a session (the
    * `spark.sql.extensions=graft.functions.GraftExtensions` config
    * does the same at session build time).
    */
  def ensureStrategy(spark: SparkSession): Unit =
    // the planner's strategy list covers BOTH sources (extension
    // injection and experimental methods) — checking only
    // extraStrategies would double-install on extension-built sessions
    if (!ColumnBridge.plannerHasStrategy(spark, TopKPerGroupStrategy)) {
      val cur = spark.experimental.extraStrategies
      if (!cur.contains(TopKPerGroupStrategy))
        spark.experimental.extraStrategies = cur :+ TopKPerGroupStrategy
    }
}
