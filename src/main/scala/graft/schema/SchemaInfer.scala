package graft.schema

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.types._

/** Auto-mode schema inference (SURVEY.md §1.3; reference design:
  * sample first N=1000 documents, union of per-document schemas, all
  * fields optional, nested documents → struct, arrays → list, and
  * conflicting types for one path promote to StringType with JSON
  * serialization).
  *
  * Union is normalized so the result is deterministic regardless of
  * sample order: numeric conflicts widen int→long→double (and integer
  * kinds absorb into decimal); any other conflict promotes to
  * StringType. Promote is idempotent and union is commutative/
  * associative over the widening lattice (property-tested).
  */
object SchemaInfer {

  val DefaultSampleSize: Int = 1000

  /** Infer the Spark type of one extended-JSON value; None = untyped
    * (null / empty array element / MinKey/MaxKey — contributes nothing).
    */
  def inferValue(n: JsonNode): Option[DataType] = ExtJsonType.of(n) match {
    case ExtJsonType.Skip | ExtJsonType.Null => None
    case ExtJsonType.Str | ExtJsonType.Oid | ExtJsonType.Uuid | ExtJsonType.Regex =>
      Some(StringType)
    case ExtJsonType.Int32 => Some(IntegerType)
    case ExtJsonType.Int64 => Some(LongType)
    case ExtJsonType.Dbl => Some(DoubleType)
    case ExtJsonType.Dec => Some(DocType.DecimalDefault)
    case ExtJsonType.Bool => Some(BooleanType)
    case ExtJsonType.Ts => Some(TimestampType)
    case ExtJsonType.Bin => Some(BinaryType)
    case ExtJsonType.Arr =>
      val elems = n.elements().asScala.flatMap(inferValue).toSeq
      val elemType = elems.reduceOption(merge).getOrElse(StringType)
      Some(ArrayType(elemType, containsNull = true))
    case ExtJsonType.Doc => Some(inferDocument(n))
  }

  /** Infer the struct of one document; fields in first-seen order, all
    * nullable. MinKey/MaxKey fields are skipped per the type map.
    */
  def inferDocument(doc: JsonNode): StructType = {
    val fields = doc.properties().asScala.toSeq.flatMap { e =>
      inferValue(e.getValue).map(t => StructField(e.getKey, t, nullable = true))
    }
    StructType(fields)
  }

  /** Union of two inferred types with conflict promotion. Total: always
    * yields a type (worst case StringType-with-JSON).
    */
  def merge(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (x: StructType, y: StructType) => mergeStructs(x, y)
    case (ArrayType(xe, _), ArrayType(ye, _)) => ArrayType(merge(xe, ye), containsNull = true)
    case (x, y) => DocType.widen(x, y).getOrElse(StringType)
  }

  /** Field-by-field union: union of field sets (order: left's order,
    * then right's new fields), recursive merge on common names.
    */
  def mergeStructs(a: StructType, b: StructType): StructType = {
    val bByName = b.fields.map(f => f.name -> f).toMap
    val fromA = a.fields.map { fa =>
      bByName.get(fa.name) match {
        case Some(fb) => StructField(fa.name, merge(fa.dataType, fb.dataType), nullable = true)
        case None => fa.copy(nullable = true)
      }
    }
    val aNames = a.fieldNames.toSet
    val fromB = b.fields.filterNot(f => aNames.contains(f.name)).map(_.copy(nullable = true))
    StructType(fromA ++ fromB)
  }

  /** Union schema across a document sample (first `sampleSize` docs). */
  def inferSample(docs: IterableOnce[JsonNode], sampleSize: Int = DefaultSampleSize): StructType =
    docs.iterator.take(sampleSize)
      .map(inferDocument)
      .reduceOption(mergeStructs)
      .getOrElse(StructType(Nil))
}
