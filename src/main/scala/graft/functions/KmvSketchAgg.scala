package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native KMV (k-minimum-values) distinct sketch as a Catalyst
  * `TypedImperativeAggregate` — the custom-aggregate surface SURVEY §4
  * lists for EXT sketches.
  *
  * Input: an already-hashed 32-bit value as LongType in [0, 2³²) (use
  * [[graft.operators.Dedup.phash]] for the portable md5-derived hash).
  * Buffer: the k smallest DISTINCT hashes (a bounded TreeSet — ≤ k
  * entries at all times, on update and on merge). Output: a struct of
  * `(distinct_estimate, sketch_size)` where the estimate is the pure
  * integer `(k-1)·2³² div h_k` (h_k = largest retained hash), or the
  * exact count while fewer than k distinct hashes were seen.
  *
  * Scale shape: this is the aggregation-native formulation of the
  * windowed KMV query — partial sketches build map-side, merge is
  * "union, keep k smallest" (associative + commutative), so shuffle
  * traffic is ≤ k longs per group instead of every distinct hash, and
  * the result is independent of partitioning.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    withValues: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2, "kmv sketch needs k >= 2")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch requires a LongType hash input, got ${child.dataType.catalogString}")
  override def nullable: Boolean = false
  override def dataType: DataType =
    if (withValues) KmvSketchAgg.OutTypeWithValues else KmvSketchAgg.OutType
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Long])
      if (buf.size > k) buf.pollLast() // keep the k smallest
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      buf.add(it.next())
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val n = buf.size.toLong
    val est =
      if (n < k) n
      else (k - 1).toLong * KmvSketchAgg.HashDomain / buf.last().longValue()
    if (!withValues) InternalRow(est, n)
    else {
      // retained minima ascending — the mergeable sketch STATE, for
      // sketch-algebra consumers (union/intersection across segments)
      val arr = new Array[Long](buf.size)
      val it = buf.iterator(); var i = 0
      while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
      InternalRow(est, n,
        new org.apache.spark.sql.catalyst.util.GenericArrayData(arr))
    }
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + buf.size * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
}

object KmvSketchAgg {

  /** 32-bit hash domain (md5-prefix hashes live in [0, 2³²)). */
  val HashDomain: Long = 4294967296L

  val OutType: StructType = StructType(Seq(
    StructField("distinct_estimate", LongType, nullable = false),
    StructField("sketch_size", LongType, nullable = false)))

  val OutTypeWithValues: StructType = StructType(Seq(
    StructField("distinct_estimate", LongType, nullable = false),
    StructField("sketch_size", LongType, nullable = false),
    StructField("values", ArrayType(LongType, containsNull = false), nullable = false)))

  /** DataFrame-side aggregate column: `kmvSketch(hashCol, k)`. */
  def kmvSketch(c: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketchAgg(ColumnBridge.expression(c), k).toAggregateExpression())

  /** Sketch WITH its retained minima (the mergeable state), for
    * sketch-algebra queries that combine per-segment sketches.
    */
  def kmvSketchValues(c: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketchAgg(ColumnBridge.expression(c), k, withValues = true)
        .toAggregateExpression())
}
