package graft.schema

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

class SchemaInferSpec extends AnyFunSuite {

  /** Deterministic sampling in place of the scalatestplus bridge (not in
    * the offline dependency cache).
    */
  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val m = new ObjectMapper()
  private def j(s: String) = m.readTree(s)

  test("type map: every extended-JSON wrapper infers per SURVEY §1.2") {
    assert(SchemaInfer.inferValue(j("""{"$oid":"65f1a2b3c4d5e6f7a8b9c0d1"}""")).contains(StringType))
    assert(SchemaInfer.inferValue(j(""""plain"""")).contains(StringType))
    assert(SchemaInfer.inferValue(j("42")).contains(IntegerType))
    assert(SchemaInfer.inferValue(j("9999999999")).contains(LongType))
    assert(SchemaInfer.inferValue(j("""{"$numberLong":"42"}""")).contains(LongType))
    assert(SchemaInfer.inferValue(j("3.14")).contains(DoubleType))
    assert(SchemaInfer.inferValue(j("""{"$numberDouble":"3.14"}""")).contains(DoubleType))
    assert(SchemaInfer.inferValue(j("""{"$numberDecimal":"12.50"}""")).contains(DocType.DecimalDefault))
    assert(SchemaInfer.inferValue(j("true")).contains(BooleanType))
    assert(SchemaInfer.inferValue(j("""{"$date":"2024-01-01T00:00:00Z"}""")).contains(TimestampType))
    assert(SchemaInfer.inferValue(j("""{"$binary":{"base64":"AQID","subType":"00"}}""")).contains(BinaryType))
    assert(SchemaInfer.inferValue(j("null")).isEmpty)
    assert(SchemaInfer.inferValue(j("""{"$uuid":"f81d4fae-7dec-11d0-a765-00a0c91e6bf6"}""")).contains(StringType))
    assert(SchemaInfer.inferValue(j("""{"$regularExpression":{"pattern":"^a","options":"i"}}""")).contains(StringType))
    assert(SchemaInfer.inferValue(j("""{"$minKey":1}""")).isEmpty)
    assert(SchemaInfer.inferValue(j("""{"$maxKey":1}""")).isEmpty)
    assert(SchemaInfer.inferValue(j("[1,2]")).contains(ArrayType(IntegerType, containsNull = true)))
    assert(SchemaInfer.inferValue(j("""{"a":1}""")).contains(
      StructType(Seq(StructField("a", IntegerType, nullable = true)))))
  }

  test("document inference: nested structs, arrays of structs, skipped keys") {
    val doc = j(
      """{"_id":{"$oid":"65f1a2b3c4d5e6f7a8b9c0d1"},
        |"customer":{"name":"n1","tier":"gold"},
        |"items":[{"sku":"a","qty":1,"price":9.99}],
        |"mk":{"$minKey":1}}""".stripMargin)
    val s = SchemaInfer.inferDocument(doc)
    assert(s.fieldNames.toSeq == Seq("_id", "customer", "items"))
    assert(s("customer").dataType.isInstanceOf[StructType])
    val itemT = s("items").dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    assert(itemT("qty").dataType == IntegerType)
    assert(itemT("price").dataType == DoubleType)
  }

  test("union: numeric widening int→long→double; decimal absorbs ints") {
    assert(SchemaInfer.merge(IntegerType, LongType) == LongType)
    assert(SchemaInfer.merge(LongType, DoubleType) == DoubleType)
    assert(SchemaInfer.merge(IntegerType, DoubleType) == DoubleType)
    assert(SchemaInfer.merge(DocType.DecimalDefault, LongType) == DocType.DecimalDefault)
    assert(SchemaInfer.merge(DocType.DecimalDefault, DoubleType) == DoubleType)
  }

  test("union: true conflicts promote to StringType (JSON serialization)") {
    assert(SchemaInfer.merge(IntegerType, StringType) == StringType)
    assert(SchemaInfer.merge(BooleanType, TimestampType) == StringType)
    assert(SchemaInfer.merge(StructType(Nil), IntegerType) == StringType)
    assert(SchemaInfer.merge(ArrayType(IntegerType), IntegerType) == StringType)
  }

  test("union: new fields appended, missing fields stay optional") {
    val a = SchemaInfer.inferDocument(j("""{"x":1,"y":"s"}"""))
    val b = SchemaInfer.inferDocument(j("""{"x":2,"z":true}"""))
    val u = SchemaInfer.mergeStructs(a, b)
    assert(u.fieldNames.toSeq == Seq("x", "y", "z"))
    assert(u.fields.forall(_.nullable))
  }

  private val typeGen: Gen[DataType] = Gen.oneOf(
    IntegerType, LongType, DoubleType, StringType, BooleanType,
    TimestampType, DocType.DecimalDefault, BinaryType,
    ArrayType(IntegerType, containsNull = true),
    ArrayType(StringType, containsNull = true),
    StructType(Seq(StructField("a", IntegerType, nullable = true))),
    StructType(Seq(StructField("a", StringType, nullable = true),
      StructField("b", DoubleType, nullable = true))))

  test("property: merge is commutative") {
    for (a <- samples(typeGen); b <- samples(typeGen, 20))
      assert(SchemaInfer.merge(a, b) == SchemaInfer.merge(b, a))
  }

  test("property: merge is associative") {
    for (a <- samples(typeGen, 12); b <- samples(typeGen, 12); c <- samples(typeGen, 12))
      assert(SchemaInfer.merge(SchemaInfer.merge(a, b), c) ==
        SchemaInfer.merge(a, SchemaInfer.merge(b, c)))
  }

  test("property: merge is idempotent; StringType is absorbing") {
    for (a <- samples(typeGen)) {
      assert(SchemaInfer.merge(a, a) == a)
      assert(SchemaInfer.merge(a, StringType) == StringType)
    }
  }

  test("inference is deterministic regardless of sample order") {
    val docs = Seq(
      j("""{"v":1}"""), j("""{"v":"str"}"""), j("""{"v":2.5}"""),
      j("""{"w":{"$numberLong":"9"}}"""), j("""{"v":true}"""))
    val forward = SchemaInfer.inferSample(docs.iterator)
    docs.permutations.take(50).foreach { p =>
      val s = SchemaInfer.inferSample(p.iterator)
      assert(s.fields.map(f => f.name -> f.dataType).toMap ==
        forward.fields.map(f => f.name -> f.dataType).toMap)
    }
  }

  test("sample size cap respected (reference: first N=1000 documents)") {
    val docs = Iterator.tabulate(2000) { i =>
      if (i < 1500) j("""{"a":1}""") else j("""{"b":"only-after-cap"}""")
    }
    val s = SchemaInfer.inferSample(docs, sampleSize = 1000)
    assert(s.fieldNames.toSeq == Seq("a"))
  }
}
