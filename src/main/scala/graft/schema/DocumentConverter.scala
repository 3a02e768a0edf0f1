package graft.schema

import java.time.{Instant, OffsetDateTime}
import java.util.Base64
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Extended-JSON document → Spark [[Row]] conversion against a target
  * schema (the reference's BSON→record conversion step, SURVEY.md T1):
  * recursive for structs/lists, missing fields → null (T3), and when the
  * target type is StringType any non-string value is JSON-serialized —
  * the conflict-promotion contract (T4).
  *
  * Serializable and executor-side: used inside `mapPartitions` so
  * conversion scales with the data, never through the driver.
  */
object DocumentConverter extends Serializable {

  /** Convert one document to a Row of `schema`. */
  def toRow(doc: JsonNode, schema: StructType): Row = {
    val values = schema.fields.map { f =>
      val child = if (doc != null && doc.isObject) doc.get(f.name) else null
      convert(child, f.dataType)
    }
    new GenericRowWithSchemaCompat(values, schema)
  }

  /** Convert one extended-JSON value to the Spark-external value for
    * `target`. Unconvertible values degrade to null (never throw on data;
    * the reference logs-and-continues on malformed documents).
    */
  def convert(n: JsonNode, target: DataType): Any = {
    if (n == null || n.isNull) return null
    ExtJsonType.of(n) match {
      case ExtJsonType.Skip => null
      case kind => convertTyped(n, kind, target)
    }
  }

  private def convertTyped(n: JsonNode, kind: ExtJsonType, target: DataType): Any =
    target match {
      case StringType => asString(n, kind)
      case IntegerType => numeric(n, kind).map(_.intValue()).orNull
      case LongType => numeric(n, kind).map(_.longValue()).orNull
      case DoubleType => numeric(n, kind).map(_.doubleValue()).orNull
      case dt: DecimalType =>
        numeric(n, kind).map { d =>
          new java.math.BigDecimal(d.toString).setScale(dt.scale, java.math.RoundingMode.HALF_UP)
        }.orNull
      case BooleanType => if (n.isBoolean) n.booleanValue() else null
      case TimestampType => toInstant(n, kind).orNull
      case DateType =>
        toInstant(n, kind).map(i => java.sql.Date.valueOf(
          i.atZone(java.time.ZoneOffset.UTC).toLocalDate)).orNull
      case BinaryType => toBinary(n, kind).orNull
      case ArrayType(elem, _) =>
        if (n.isArray) n.elements().asScala.map(convert(_, elem)).toSeq else null
      case st: StructType =>
        if (kind == ExtJsonType.Doc) toRow(n, st) else null
      case _ => null
    }

  /** StringType target: plain strings pass through; wrapped scalar types
    * use their canonical text; anything else JSON-serializes (T4).
    */
  private def asString(n: JsonNode, kind: ExtJsonType): String = kind match {
    case ExtJsonType.Str => n.textValue()
    case ExtJsonType.Oid => n.get("$oid").asText()
    case ExtJsonType.Uuid => n.get("$uuid").asText()
    case ExtJsonType.Regex =>
      val re = n.get("$regularExpression")
      if (re != null && re.has("pattern")) re.get("pattern").asText() else re.toString
    case ExtJsonType.Int32 | ExtJsonType.Int64 | ExtJsonType.Dbl | ExtJsonType.Dec =>
      numeric(n, kind).map(_.toString).getOrElse(n.toString)
    case ExtJsonType.Bool => n.booleanValue().toString
    case _ => n.toString // document/array/date/binary → JSON text
  }

  private def numeric(n: JsonNode, kind: ExtJsonType): Option[java.math.BigDecimal] = kind match {
    case ExtJsonType.Int32 | ExtJsonType.Int64 | ExtJsonType.Dbl | ExtJsonType.Dec =>
      if (n.isNumber) Some(new java.math.BigDecimal(n.asText()))
      else { // wrapped: {"$numberLong": "42"} etc.
        val inner = n.elements().asScala.nextOption()
        inner.flatMap(v => scala.util.Try(new java.math.BigDecimal(v.asText())).toOption)
      }
    case ExtJsonType.Str =>
      scala.util.Try(new java.math.BigDecimal(n.textValue())).toOption
    case _ => None
  }

  /** `$date` in either ISO-8601 or `{"$numberLong": millis}` form;
    * plain numbers are epoch millis.
    */
  private def toInstant(n: JsonNode, kind: ExtJsonType): Option[Instant] = kind match {
    case ExtJsonType.Ts =>
      val d = if (n.has("$date")) n.get("$date") else n.get("$timestamp")
      if (d == null) None
      else if (d.isTextual)
        scala.util.Try(Instant.parse(d.textValue()))
          .orElse(scala.util.Try(OffsetDateTime.parse(d.textValue()).toInstant)).toOption
      else if (d.isNumber) Some(Instant.ofEpochMilli(d.longValue()))
      else if (d.isObject && d.has("$numberLong"))
        scala.util.Try(Instant.ofEpochMilli(d.get("$numberLong").asText().toLong)).toOption
      else if (d.isObject && d.has("t")) // {"$timestamp": {"t": secs, "i": ord}}
        Some(Instant.ofEpochSecond(d.get("t").asLong()))
      else None
    case ExtJsonType.Str =>
      scala.util.Try(Instant.parse(n.textValue())).toOption
    case ExtJsonType.Int64 | ExtJsonType.Int32 =>
      numeric(n, kind).map(d => Instant.ofEpochMilli(d.longValue()))
    case _ => None
  }

  private def toBinary(n: JsonNode, kind: ExtJsonType): Option[Array[Byte]] = kind match {
    case ExtJsonType.Bin =>
      val b = n.get("$binary")
      if (b != null && b.has("base64"))
        scala.util.Try(Base64.getDecoder.decode(b.get("base64").asText())).toOption
      else None
    case ExtJsonType.Str =>
      scala.util.Try(Base64.getDecoder.decode(n.textValue())).toOption
    case _ => None
  }
}

/** Row with attached schema (external Row type for RowEncoder paths). */
private[schema] class GenericRowWithSchemaCompat(values: Array[Any], override val schema: StructType)
    extends org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(values, schema)
