package graft.config

/** Configuration data model for the sync engine.
  *
  * Semantics mirror the reference's config surface (the only fully
  * implemented part of the reference; see SURVEY.md §0):
  * the reference's `config` package (SyncConfig.java, MongoConfig.java,
  * IcebergConfig.java, CollectionSyncConfig.java, MappingConfig.java,
  * FieldMapping.java, PartitionConfig.java, BatchConfig.java)
  * — same field names, defaults and validation rules, re-expressed as
  * immutable Scala case classes.
  */
final case class SyncConfig(
    mongodb: MongoConfig,
    iceberg: IcebergConfig,
    sync: SyncSection) {

  def validate(): Unit = {
    mongodb.validate()
    iceberg.validate()
    sync.validate()
  }
}

/** Source database endpoint (reference `MongoConfig.java`). In this
  * engine the "uri" addresses a fixture root (directory of JSONL/parquet
  * collections) instead of a live cluster.
  */
final case class MongoConfig(uri: String, database: String) {
  def validate(): Unit = {
    ConfigError.require(uri != null && uri.nonEmpty, "mongodb.uri is required")
    ConfigError.require(database != null && database.nonEmpty, "mongodb.database is required")
  }
}

/** Catalog + table-format config (reference `IcebergConfig.java`:
  * catalog type local|s3tables|rest with per-type required keys, plus
  * free-form properties passed through to the catalog).
  */
final case class IcebergConfig(
    catalog: CatalogConfig,
    properties: Map[String, String] = Map.empty) {
  def validate(): Unit = catalog.validate()
}

final case class CatalogConfig(
    `type`: String,
    warehouse: Option[String] = None,
    uri: Option[String] = None,
    arn: Option[String] = None) {

  def validate(): Unit = {
    ConfigError.require(CatalogConfig.Types.contains(`type`),
      s"iceberg.catalog.type must be one of ${CatalogConfig.Types.mkString("|")} (got '${`type`}')")
    `type` match {
      case "local" =>
        ConfigError.require(warehouse.exists(_.nonEmpty),
          "iceberg.catalog.warehouse is required for type 'local'")
      case "rest" =>
        ConfigError.require(uri.exists(_.nonEmpty),
          "iceberg.catalog.uri is required for type 'rest'")
      case "s3tables" =>
        ConfigError.require(arn.exists(_.nonEmpty),
          "iceberg.catalog.arn is required for type 's3tables'")
    }
  }
}

object CatalogConfig {
  val Types: Set[String] = Set("local", "s3tables", "rest")
}

final case class SyncSection(collections: Seq[CollectionSyncConfig]) {
  def validate(): Unit = {
    ConfigError.require(collections.nonEmpty, "sync.collections must not be empty")
    collections.foreach(_.validate())
    val dup = collections.groupBy(c => c.target.qualifiedName).collect {
      case (k, vs) if vs.size > 1 => k
    }
    ConfigError.require(dup.isEmpty, s"duplicate sync target(s): ${dup.mkString(", ")}")
  }
}

final case class SourceConfig(collection: String) {
  def validate(): Unit =
    ConfigError.require(collection != null && collection.nonEmpty,
      "source.collection is required")
}

final case class TargetConfig(namespace: String, table: String) {
  def qualifiedName: String = s"$namespace.$table"
  def validate(): Unit = {
    ConfigError.require(namespace != null && namespace.nonEmpty, "target.namespace is required")
    ConfigError.require(table != null && table.nonEmpty, "target.table is required")
  }
}

/** Per-collection sync unit (reference `CollectionSyncConfig.java`):
  * defaults — mapping mode auto, no partitioning, default batch policy.
  */
final case class CollectionSyncConfig(
    source: SourceConfig,
    target: TargetConfig,
    mapping: MappingConfig = MappingConfig.Auto,
    partitioning: Seq[PartitionConfig] = Nil,
    batch: BatchConfig = BatchConfig.Default) {

  def validate(): Unit = {
    source.validate()
    target.validate()
    mapping.validate()
    partitioning.foreach(_.validate())
    batch.validate()
  }
}

/** Field projection config (reference `MappingConfig.java` /
  * `FieldMapping.java`): mode auto|explicit; explicit requires fields;
  * each field has required source/target, optional type override.
  */
final case class MappingConfig(
    mode: String = MappingConfig.ModeAuto,
    fields: Seq[FieldMapping] = Nil) {

  def validate(): Unit = {
    ConfigError.require(
      mode == MappingConfig.ModeAuto || mode == MappingConfig.ModeExplicit,
      s"mapping.mode must be auto|explicit (got '$mode')")
    if (mode == MappingConfig.ModeExplicit)
      ConfigError.require(fields.nonEmpty, "mapping.fields must not be empty in explicit mode")
    fields.foreach(_.validate())
  }
}

object MappingConfig {
  val ModeAuto = "auto"
  val ModeExplicit = "explicit"
  val Auto: MappingConfig = MappingConfig()
}

final case class FieldMapping(source: String, target: String, `type`: Option[String] = None) {
  def validate(): Unit = {
    ConfigError.require(source != null && source.nonEmpty, "field.source is required")
    ConfigError.require(target != null && target.nonEmpty, "field.target is required")
    `type`.foreach { t =>
      ConfigError.require(FieldMapping.TypeNames.contains(t),
        s"field.type '$t' unknown; expected one of ${FieldMapping.TypeNames.mkString("|")}")
    }
  }
}

object FieldMapping {
  /** Type-override vocabulary (reference design doc §schema-mapping /
    * reference-config.yaml explicit-mode examples).
    */
  val TypeNames: Set[String] =
    Set("string", "int", "long", "double", "decimal", "boolean",
      "timestamp", "date", "binary", "list", "struct")
}

/** Partition spec entry (reference `PartitionConfig.java` +
  * design doc partition transforms identity|year|month|day|hour|bucket[N]).
  */
final case class PartitionConfig(field: String, transform: String = "identity") {
  def validate(): Unit = {
    ConfigError.require(field != null && field.nonEmpty, "partitioning.field is required")
    ConfigError.require(PartitionConfig.isValidTransform(transform),
      s"partitioning.transform '$transform' invalid; expected identity|year|month|day|hour|bucket[N]")
  }

  /** For bucket[N]: the bucket count. */
  def bucketCount: Option[Int] = PartitionConfig.BucketRe.findFirstMatchIn(transform).map(_.group(1).toInt)
}

object PartitionConfig {
  private val Simple = Set("identity", "year", "month", "day", "hour")
  private[config] val BucketRe = """^bucket\[(\d+)\]$""".r

  def isValidTransform(t: String): Boolean =
    Simple.contains(t) || BucketRe.findFirstIn(t).exists(_ => BucketRe.findFirstMatchIn(t).get.group(1).toInt > 0)
}

/** Three-threshold flush policy (reference `BatchConfig.java` defaults
  * 50k records / 128 MB / 60 s).
  */
final case class BatchConfig(
    maxRecords: Long = 50000L,
    maxBytes: Long = 134217728L,
    flushIntervalSeconds: Long = 60L) {

  def validate(): Unit = {
    ConfigError.require(maxRecords > 0, "batch.maxRecords must be > 0")
    ConfigError.require(maxBytes > 0, "batch.maxBytes must be > 0")
    ConfigError.require(flushIntervalSeconds > 0, "batch.flushIntervalSeconds must be > 0")
  }
}

object BatchConfig {
  val Default: BatchConfig = BatchConfig()
}

/** Validation failure with a config-path-style message (mirrors the
  * reference's SyncConfigException semantics: fail fast, exact path).
  */
final class ConfigError(message: String, cause: Throwable = null)
    extends RuntimeException(message, cause)

object ConfigError {
  def require(cond: Boolean, message: => String): Unit =
    if (!cond) throw new ConfigError(message)
}
