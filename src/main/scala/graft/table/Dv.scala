package graft.table

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** DELETION VECTORS — Iceberg v3's read-optimized position-delete
  * shape: one bitmap per data file instead of coordinate rows
  * scattered across delete commits. Consolidating coordinates into DVs
  * turns the read-side (file, pos) ANTI-JOIN — a shuffle of the full
  * scan against the accumulated delete set — into a BROADCAST of the
  * per-file bitmaps plus a scan-local codegen'd membership test: at
  * 100 TB with churn-heavy tables the delete-merge join disappears
  * from every read.
  *
  * Encoding (self-describing, smallest-wins per file):
  *  - tag 0, SPARSE: sorted int64 positions, binary-searched. 8 bytes
  *    per deleted row — wins while deletes are rare.
  *  - tag 1, DENSE: a long-word bitset over [0, maxPos]. 1 bit per
  *    ROW of the file prefix — wins once ~1/64 of rows are deleted.
  * (A roaring container set is the production encoding; the two-tier
  * layout here has the same asymptotics at both extremes and stays
  * dependency-free.)
  */
object Dv {

  /** Encode a distinct, sorted position array (smallest of the two
    * layouts). Empty input encodes as the empty sparse vector.
    */
  def encode(sorted: Array[Long]): Array[Byte] = {
    val sparseBytes = 1 + 8 * sorted.length
    val denseBytes =
      if (sorted.isEmpty) Int.MaxValue
      else {
        val words = (sorted.last >>> 6) + 1
        if (words > (Int.MaxValue - 1) / 8) Int.MaxValue else (1 + 8 * words).toInt
      }
    if (sparseBytes <= denseBytes) {
      val b = ByteBuffer.allocate(sparseBytes)
      b.put(0: Byte)
      sorted.foreach(b.putLong)
      b.array()
    } else {
      val words = new Array[Long](((sorted.last >>> 6) + 1).toInt)
      sorted.foreach(p => words((p >>> 6).toInt) |= (1L << (p & 63)))
      val b = ByteBuffer.allocate(1 + 8 * words.length)
      b.put(1: Byte)
      words.foreach(b.putLong)
      b.array()
    }
  }

  /** Membership test — the read path's hot kernel (called from
    * generated code; keep it static-shaped and allocation-free).
    */
  def contains(dv: Array[Byte], pos: Long): Boolean = {
    if (dv == null || dv.length < 1) return false
    if (dv(0) == 0) {
      // sparse: binary search over big-endian longs at offset 1
      var lo = 0
      var hi = (dv.length - 1) / 8 - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val v = readLong(dv, 1 + 8 * mid)
        if (v == pos) return true
        else if (v < pos) lo = mid + 1
        else hi = mid - 1
      }
      false
    } else {
      val word = (pos >>> 6).toInt
      if (pos < 0 || 1 + 8 * (word + 1) > dv.length) false
      else (readLong(dv, 1 + 8 * word) & (1L << (pos & 63))) != 0
    }
  }

  /** Deleted-position count (metadata/reporting, not the hot path). */
  def cardinality(dv: Array[Byte]): Long =
    if (dv == null || dv.length < 1) 0L
    else if (dv(0) == 0) (dv.length - 1) / 8L
    else {
      var i = 1
      var n = 0L
      while (i + 8 <= dv.length) { n += java.lang.Long.bitCount(readLong(dv, i)); i += 8 }
      n
    }

  /** Decode to sorted positions (consolidation rebuilds from this). */
  def positions(dv: Array[Byte]): Array[Long] =
    if (dv == null || dv.length < 1) Array.empty
    else if (dv(0) == 0)
      Array.tabulate((dv.length - 1) / 8)(i => readLong(dv, 1 + 8 * i))
    else {
      val out = Array.newBuilder[Long]
      var w = 0
      while (1 + 8 * (w + 1) <= dv.length) {
        var bits = readLong(dv, 1 + 8 * w)
        while (bits != 0) {
          val b = java.lang.Long.numberOfTrailingZeros(bits)
          out += (w.toLong << 6) + b
          bits &= bits - 1
        }
        w += 1
      }
      out.result()
    }

  private def readLong(a: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (a(off + i) & 0xffL); i += 1 }
    v
  }
}

/** `dv_contains(dv BINARY, pos BIGINT)` — codegen'd membership test so
  * the DV filter rides whole-stage codegen next to the scan (a UDF
  * here would fence the hot read path out of codegen).
  */
case class DvContains(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "dv_contains"

  override protected def nullSafeEval(dv: Any, pos: Any): Any =
    Dv.contains(dv.asInstanceOf[Array[Byte]], pos.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (dv, pos) =>
      s"${ev.value} = graft.table.Dv.contains($dv, $pos);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DvContains = copy(newLeft, newRight)
}
