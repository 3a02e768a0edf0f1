package graft.config

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import scala.util.matching.Regex

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, TextNode}
import com.fasterxml.jackson.dataformat.yaml.YAMLMapper

/** YAML config loader with recursive `${ENV_VAR}` substitution, defaults
  * and fail-fast validation.
  *
  * Behavior mirrors the reference loader
  * (`.../config/ConfigLoader.java:30-97`): read file → YAML tree →
  * substitute env vars through objects/arrays/strings → bind →
  * apply defaults → validate; a missing env var or invalid field fails
  * with the exact path in the message. Driver-side only — no Spark.
  */
object ConfigLoader {

  private val mapper = new YAMLMapper()
  private val EnvRe: Regex = """\$\{([A-Za-z_][A-Za-z0-9_]*)\}""".r

  def load(path: Path, env: Map[String, String] = sys.env): SyncConfig = {
    val text =
      try Files.readString(path)
      catch {
        case e: java.io.IOException =>
          throw new ConfigError(s"cannot read config file $path: ${e.getMessage}", e)
      }
    loadString(text, env)
  }

  def loadString(yaml: String, env: Map[String, String] = sys.env): SyncConfig = {
    val root =
      try mapper.readTree(yaml)
      catch {
        case e: Exception => throw new ConfigError(s"invalid YAML: ${e.getMessage}", e)
      }
    if (root == null || root.isNull || root.isMissingNode)
      throw new ConfigError("config file is empty")
    substituteEnvVars(root, env)
    val cfg = bind(root)
    cfg.validate()
    cfg
  }

  /** In-place recursive `${VAR}` substitution over every string node.
    * Missing variables are an error naming the variable (reference
    * `ConfigLoader.java:84-97`).
    */
  private def substituteEnvVars(node: JsonNode, env: Map[String, String]): Unit = node match {
    case obj: ObjectNode =>
      obj.fieldNames().asScala.toList.foreach { name =>
        obj.get(name) match {
          case t: TextNode => obj.set[JsonNode](name, new TextNode(substitute(t.textValue(), env)))
          case child => substituteEnvVars(child, env)
        }
      }
    case arr: ArrayNode =>
      (0 until arr.size()).foreach { i =>
        arr.get(i) match {
          case t: TextNode =>
            arr.set(i, new TextNode(substitute(t.textValue(), env))); ()
          case child => substituteEnvVars(child, env)
        }
      }
    case _ => ()
  }

  private def substitute(s: String, env: Map[String, String]): String =
    EnvRe.replaceAllIn(s, m => {
      val name = m.group(1)
      env.getOrElse(name,
        throw new ConfigError(s"environment variable '$name' referenced in config is not set"))
        .replace("\\", "\\\\").replace("$", "\\$") // literal replacement
    })

  // ------------------------------------------------------------- binding

  private def bind(root: JsonNode): SyncConfig = SyncConfig(
    mongodb = bindMongo(required(root, "mongodb")),
    iceberg = bindIceberg(required(root, "iceberg")),
    sync = bindSync(required(root, "sync")))

  private def bindMongo(n: JsonNode): MongoConfig =
    MongoConfig(uri = str(n, "mongodb", "uri"), database = str(n, "mongodb", "database"))

  private def bindIceberg(n: JsonNode): IcebergConfig = {
    val cat = required(n, "iceberg.catalog", at = "catalog")
    IcebergConfig(
      catalog = CatalogConfig(
        `type` = str(cat, "iceberg.catalog", "type"),
        warehouse = optStr(cat, "warehouse"),
        uri = optStr(cat, "uri"),
        arn = optStr(cat, "arn")),
      properties = Option(n.get("properties")).filter(_.isObject).map { p =>
        p.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
      }.getOrElse(Map.empty))
  }

  private def bindSync(n: JsonNode): SyncSection = {
    val colls = Option(n.get("collections")).filter(_.isArray)
      .getOrElse(throw new ConfigError("sync.collections is required"))
    SyncSection((0 until colls.size()).map { i =>
      bindCollection(colls.get(i), s"sync.collections[$i]")
    })
  }

  private def bindCollection(n: JsonNode, at: String): CollectionSyncConfig = {
    val src = required(n, s"$at.source", at = "source")
    val tgt = required(n, s"$at.target", at = "target")
    CollectionSyncConfig(
      source = SourceConfig(str(src, s"$at.source", "collection")),
      target = TargetConfig(str(tgt, s"$at.target", "namespace"), str(tgt, s"$at.target", "table")),
      mapping = Option(n.get("mapping")).map(bindMapping(_, s"$at.mapping")).getOrElse(MappingConfig.Auto),
      partitioning = Option(n.get("partitioning")).filter(_.isArray).map { arr =>
        (0 until arr.size()).map { i =>
          val p = arr.get(i)
          PartitionConfig(
            field = str(p, s"$at.partitioning[$i]", "field"),
            transform = optStr(p, "transform").getOrElse("identity"))
        }
      }.getOrElse(Nil),
      batch = Option(n.get("batch")).map { b =>
        BatchConfig(
          maxRecords = optLong(b, "maxRecords").getOrElse(BatchConfig.Default.maxRecords),
          maxBytes = optLong(b, "maxBytes").getOrElse(BatchConfig.Default.maxBytes),
          flushIntervalSeconds =
            optLong(b, "flushIntervalSeconds").getOrElse(BatchConfig.Default.flushIntervalSeconds))
      }.getOrElse(BatchConfig.Default))
  }

  private def bindMapping(n: JsonNode, at: String): MappingConfig = MappingConfig(
    mode = optStr(n, "mode").getOrElse(MappingConfig.ModeAuto),
    fields = Option(n.get("fields")).filter(_.isArray).map { arr =>
      (0 until arr.size()).map { i =>
        val f = arr.get(i)
        FieldMapping(
          source = str(f, s"$at.fields[$i]", "source"),
          target = str(f, s"$at.fields[$i]", "target"),
          `type` = optStr(f, "type"))
      }
    }.getOrElse(Nil))

  // ------------------------------------------------------------- helpers

  private def required(n: JsonNode, path: String, at: String = null): JsonNode = {
    val key = if (at == null) path else at
    val child = n.get(key)
    if (child == null || child.isNull)
      throw new ConfigError(s"$path section is required")
    child
  }

  private def str(n: JsonNode, at: String, key: String): String = {
    val v = n.get(key)
    if (v == null || v.isNull || v.asText().isEmpty)
      throw new ConfigError(s"$at.$key is required")
    v.asText()
  }

  private def optStr(n: JsonNode, key: String): Option[String] =
    Option(n.get(key)).filterNot(_.isNull).map(_.asText()).filter(_.nonEmpty)

  private def optLong(n: JsonNode, key: String): Option[Long] =
    Option(n.get(key)).filterNot(_.isNull).map(_.asLong())
}
