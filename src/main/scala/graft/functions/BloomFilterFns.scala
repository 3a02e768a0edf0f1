package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join prefilter — the runtime row-level filter that makes
  * selective joins survive 100 TB (reference has no general join surface,
  * SURVEY §2.4 "Joins" EXT row; same technique as Spark's own
  * `InjectRuntimeFilter`/Trino dynamic filtering, expressed as an
  * explicit, deterministic operator instead of a stats-dependent
  * optimizer rule).
  *
  * Shape: build ONE bounded bloom filter over the small/dim side's join
  * keys as a native `TypedImperativeAggregate` (partial filters build
  * map-side; merge is bitwise OR, associative + commutative, so the
  * result — and its serialized bytes — is independent of partitioning),
  * then drop fact rows whose key cannot be in the dim set BEFORE the
  * join's shuffle with a codegen'd `might_contain` scan predicate. False
  * positives pass the prefilter and are removed by the exact join that
  * follows, so end-to-end results are exactly the plain join's.
  *
  * The built filter is a single fixed-size blob (~1.2 MB at 1M keys /
  * 3% fpp) — the same driver-bounded footprint as a broadcast-join
  * hash relation, NOT a collect of the data.
  */
object BloomFilterFns {

  /** Aggregate column building a serialized bloom filter over a LongType
    * key column: `bloomBuild(col, expectedItems, fpp)` → BinaryType.
    */
  def bloomBuild(c: Column, expectedItems: Long, fpp: Double): Column =
    ColumnBridge.column(
      BloomFilterBuildAgg(ColumnBridge.expression(c), expectedItems, fpp)
        .toAggregateExpression())

  /** Scan predicate: true iff `value` might be in the serialized filter
    * (no false negatives). Null value → null, like built-in predicates.
    */
  def bloomMightContain(value: Column, filterBytes: Array[Byte]): Column =
    ColumnBridge.column(
      BloomMightContain(ColumnBridge.expression(value), filterBytes))
}

/** Builds an `org.apache.spark.util.sketch.BloomFilter` (public Spark
  * sketch library) over LongType keys. Output is the filter's portable
  * serialized form (BinaryType); identical bits regardless of row order
  * or partitioning.
  */
case class BloomFilterBuildAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  require(expectedItems > 0, "bloom_build needs expectedItems > 0")
  require(fpp > 0.0 && fpp < 1.0, "bloom_build needs 0 < fpp < 1")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_build requires a LongType key input, got ${child.dataType.catalogString}")
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_build"

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.putLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
    buf.mergeInPlace(other)
    buf
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    buf.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterBuildAgg =
    copy(inputAggBufferOffset = newOffset)
}

/** `might_contain(key)` against a pre-built serialized filter. The
  * filter is deserialized ONCE per expression instance (driver) and
  * shipped to executors as a codegen reference object — the generated
  * code is a single `mightContainLong` call inside whole-stage codegen,
  * evaluated at the scan before any shuffle.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
  extends UnaryExpression {

  require(filterBytes != null && filterBytes.nonEmpty,
    "bloom_might_contain needs a non-empty serialized filter")

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "bloom_might_contain"
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a LongType key input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
