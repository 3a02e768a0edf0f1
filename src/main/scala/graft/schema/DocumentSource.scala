package graft.schema

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.types.StructType

import graft.config.{FieldMapping, MappingConfig}

/** Turns a JSONL "collection" (the engine's stand-in for a source
  * MongoDB collection, FIXTURES.md §2) into a DataFrame.
  *
  * Auto mode: sample the first N documents on the driver (N=1000 like
  * the reference), infer the union schema, then parse+convert on the
  * executors via mapPartitions — the scan scales with partitions, only
  * the bounded sample ever reaches the driver.
  *
  * Explicit mode: project/rename/cast per the mapping config
  * (dot-notation nested extraction, SURVEY.md T2) applied ON TOP of the
  * inferred frame with Column expressions, so Catalyst can prune the
  * parse output.
  */
object DocumentSource {

  /** Read JSONL into rows of the inferred (or supplied) schema. */
  def readJsonl(
      spark: SparkSession,
      path: String,
      schema: Option[StructType] = None,
      sampleSize: Int = SchemaInfer.DefaultSampleSize): DataFrame = {
    import spark.implicits._
    val lines: Dataset[String] = spark.read.textFile(path)
    val target = schema.getOrElse {
      val mapper = new ObjectMapper()
      val sample = lines.limit(sampleSize).collect().iterator
        .filter(_.trim.nonEmpty).map(mapper.readTree)
      SchemaInfer.inferSample(sample, sampleSize)
    }
    fromJsonLines(lines, target)
  }

  /** Executor-side parse+convert of JSON lines against a fixed schema. */
  def fromJsonLines(lines: Dataset[String], schema: StructType): DataFrame = {
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(schema, lenient = true)
    lines.mapPartitions { it =>
      val mapper = new ObjectMapper() // one parser per partition
      it.filter(_.trim.nonEmpty).map { line =>
        DocumentConverter.toRow(mapper.readTree(line), schema)
      }
    }
  }

  /** Apply an explicit field mapping (dot-path source → flat target,
    * optional type override) as a single select — pure Catalyst
    * expressions (column pruning + codegen, no UDFs).
    */
  def applyMapping(df: DataFrame, mapping: MappingConfig): DataFrame =
    if (mapping.mode == MappingConfig.ModeAuto) df
    else df.select(mapping.fields.map(mappingColumn): _*)

  private def mappingColumn(f: FieldMapping) = {
    import org.apache.spark.sql.functions.col
    val base = col(f.source) // dot-notation reaches into structs natively
    f.`type` match {
      case Some(t) => base.cast(DocType.forName(t)).alias(f.target)
      case None => base.alias(f.target)
    }
  }
}
