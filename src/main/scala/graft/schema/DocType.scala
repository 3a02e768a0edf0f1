package graft.schema

import org.apache.spark.sql.types._

/** The engine's document type system: the BSON-analog → Spark type map
  * of SURVEY.md §1.2 (reference docs/design.md type table).
  *
  * Documents arrive as MongoDB Extended JSON v2 (public wire format), so
  * every BSON type has a detectable JSON representation:
  *
  * | ext-JSON wrapper            | BSON type  | Spark type        |
  * |-----------------------------|------------|-------------------|
  * | {"$oid": hex24}             | ObjectId   | StringType        |
  * | plain string                | String     | StringType        |
  * | {"$numberInt": s} / int     | Int32      | IntegerType       |
  * | {"$numberLong": s} / long   | Int64      | LongType          |
  * | {"$numberDouble": s}/double | Double     | DoubleType        |
  * | {"$numberDecimal": s}       | Decimal128 | DecimalType(38,9) |
  * | true/false                  | Boolean    | BooleanType       |
  * | {"$date": ...}              | DateTime   | TimestampType     |
  * | {"$binary": {base64,...}}   | Binary     | BinaryType        |
  * | null                        | Null       | field optional    |
  * | [ ... ]                     | Array      | ArrayType         |
  * | { ... }                     | Document   | StructType        |
  * | {"$uuid": s}                | UUID       | StringType        |
  * | {"$regularExpression": ..}  | Regex      | StringType        |
  * | {"$minKey"/"$maxKey": 1}    | Min/MaxKey | skipped           |
  */
object DocType {

  /** Engine-wide decimal shape for Decimal128 payloads and the `decimal`
    * explicit-mapping override (Spark caps at 38 digits).
    */
  val DecimalDefault: DecimalType = DecimalType(38, 9)

  /** Explicit-mapping type-override vocabulary → Spark types
    * (reference explicit-mode `type:` strings).
    */
  def forName(name: String): DataType = name match {
    case "string" => StringType
    case "int" => IntegerType
    case "long" => LongType
    case "double" => DoubleType
    case "decimal" => DecimalDefault
    case "boolean" => BooleanType
    case "timestamp" => TimestampType
    case "date" => DateType
    case "binary" => BinaryType
    case "list" => ArrayType(StringType, containsNull = true)
    case "struct" => StructType(Nil)
    case other => throw new IllegalArgumentException(s"unknown type override '$other'")
  }

  /** Numeric widening lattice used by schema union: int → long → double.
    * Decimal unifies with integers as decimal; decimal+double → double.
    */
  def widen(a: DataType, b: DataType): Option[DataType] = (a, b) match {
    case (x, y) if x == y => Some(x)
    case (IntegerType, LongType) | (LongType, IntegerType) => Some(LongType)
    case (IntegerType, DoubleType) | (DoubleType, IntegerType) => Some(DoubleType)
    case (LongType, DoubleType) | (DoubleType, LongType) => Some(DoubleType)
    case (d: DecimalType, IntegerType | LongType) => Some(d)
    case (IntegerType | LongType, d: DecimalType) => Some(d)
    case (_: DecimalType, DoubleType) | (DoubleType, _: DecimalType) => Some(DoubleType)
    case _ => None
  }
}
