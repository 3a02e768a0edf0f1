package graft.table

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.types.{DataType, StructType}

import graft.config.PartitionConfig

/** One committed snapshot: the files added at a sequence number.
  *
  * Equality-delete semantics follow Iceberg v2 Merge-on-Read (reference
  * docs/design.md "Merge-on-Read with equality deletes"): a delete file
  * at seq S removes every row with the same key written at seq < S;
  * data rows carry their writing seq in a hidden `_graft_seq` column.
  *
  * Position-delete semantics are Iceberg v2's second delete shape: a
  * position-delete file holds (file_path, pos) coordinates of PHYSICAL
  * rows; a coordinate removes exactly that row from every read whose
  * snapshot scope includes the delete (time travel before the delete's
  * seq still sees the row because the file is out of scope).
  */
final case class Snapshot(
    seq: Long,
    timestampMs: Long,
    operation: String, // append | upsert | delete | pos-delete | rewrite | evolve | truncate
    dataFiles: Seq[String],
    deleteFiles: Seq[String],
    recordCount: Long,
    /** Per-file min/max of each derived partition column (file →
      * column → (min, max), rendered as strings): the Iceberg-manifest
      * analog that lets the read path prune whole files from table
      * metadata alone, before any footer or data IO.
      */
    fileStats: Map[String, Map[String, (String, String)]] = Map.empty,
    /** Position-delete files ((file_path, pos) coordinate parquet);
      * last field with a default so pre-existing metadata (and
      * positional constructor calls) parse/compile unchanged.
      */
    posDeleteFiles: Seq[String] = Nil,
    /** Commit summary metadata (Iceberg snapshot-summary analog):
      * small string properties that travel ATOMICALLY with the commit
      * — e.g. the initial-sync high-water mark, which makes crash
      * resume exactly-once because progress publishes in the same
      * rename as the data it describes.
      */
    summary: Map[String, String] = Map.empty,
    /** Per-file (row_count, size_bytes) — the Iceberg data-file
      * manifest entry's metrics, captured at commit time from the
      * footer/listing the commit already reads, so the `manifests`
      * metadata table plans from table metadata alone (no file IO).
      * Empty for files committed before this field existed (surfaced
      * as nulls, never guessed).
      */
    fileMetrics: Map[String, (Long, Long)] = Map.empty,
    /** DELETION-VECTOR files (parquet rows of (data file, bitmap) —
      * [[Dv]]): a snapshot carrying these SUPERSEDES every coordinate
      * position-delete file at or before its seq on the main read
      * path; time travel before it still resolves the coordinates.
      * Written only by DV consolidation ([[IceliteTable.consolidateDeleteVectors]]).
      */
    dvFiles: Seq[String] = Nil)

/** Full table state at one metadata version. Commit = atomic rename of
  * v{N+1}.json.tmp → v{N+1}.json; the failed renamer retries against the
  * re-read head (optimistic concurrency, reference design's commit-retry).
  */
final case class TableMeta(
    formatVersion: Int,
    namespace: String,
    table: String,
    schema: StructType,
    partitioning: Seq[PartitionConfig],
    snapshots: Seq[Snapshot],
    properties: Map[String, String]) {

  def lastSeq: Long = snapshots.lastOption.map(_.seq).getOrElse(0L)

  /** Live file lists = union over snapshots (rewrite snapshots carry the
    * replacement set and mark priors dead via `truncatesBefore`).
    */
  def liveDataFiles: Seq[String] = snapshots.flatMap(_.dataFiles)
  def liveDeleteFiles: Seq[String] = snapshots.flatMap(_.deleteFiles)
  def livePosDeleteFiles: Seq[String] = snapshots.flatMap(_.posDeleteFiles)
  def liveDvFiles: Seq[String] = snapshots.flatMap(_.dvFiles)

  def withSnapshot(s: Snapshot): TableMeta = copy(snapshots = snapshots :+ s)

  /** Rewrite: replace all live files with the compacted set. */
  def rewritten(s: Snapshot): TableMeta = copy(snapshots = Seq(s))

  def withSchema(newSchema: StructType): TableMeta = copy(schema = newSchema)
}

object TableMeta {
  val FormatVersion = 1
  private val mapper = new ObjectMapper()

  /** JSON render/parse for a partition-config list stored inside a
    * table PROPERTY (e.g. retired specs) — same representation as the
    * top-level `partitioning` array, so field names may contain any
    * character (no hand-rolled delimiters).
    */
  def partitionConfigsToJson(ps: Seq[PartitionConfig]): String = {
    val arr = mapper.createArrayNode()
    ps.foreach { p =>
      val o = arr.addObject(); o.put("field", p.field); o.put("transform", p.transform)
    }
    arr.toString
  }

  def partitionConfigsFromJson(json: String): Seq[PartitionConfig] =
    mapper.readTree(json).elements().asScala.map { p =>
      PartitionConfig(p.get("field").asText(), p.get("transform").asText())
    }.toSeq

  /** The heavy per-snapshot payload — file lists, per-file stats and
    * metrics — written into `node`. Shared by the inline shape and the
    * externalized MANIFEST shape so both serialize identically.
    */
  private def writeHeavy(o: ObjectNode, s: Snapshot): Unit = {
    val df = o.putArray("dataFiles"); s.dataFiles.foreach(df.add)
    val del = o.putArray("deleteFiles"); s.deleteFiles.foreach(del.add)
    if (s.posDeleteFiles.nonEmpty) {
      val pdel = o.putArray("posDeleteFiles"); s.posDeleteFiles.foreach(pdel.add)
    }
    if (s.dvFiles.nonEmpty) {
      val dv = o.putArray("dvFiles"); s.dvFiles.foreach(dv.add)
    }
    if (s.fileStats.nonEmpty) {
      val fs = o.putObject("fileStats")
      s.fileStats.toSeq.sortBy(_._1).foreach { case (file, cols) =>
        val fo = fs.putObject(file)
        cols.toSeq.sortBy(_._1).foreach { case (c, (mn, mx)) =>
          val co = fo.putObject(c); co.put("min", mn); co.put("max", mx)
        }
      }
    }
    if (s.fileMetrics.nonEmpty) {
      val fm = o.putObject("fileMetrics")
      s.fileMetrics.toSeq.sortBy(_._1).foreach { case (file, (rows, bytes)) =>
        val fo = fm.putObject(file); fo.put("rows", rows); fo.put("bytes", bytes)
      }
    }
  }

  /** A snapshot's externalized manifest file body (heavy payload only;
    * headers — seq, timestamp, operation, count, summary — stay in the
    * version JSON so history listings never touch manifests).
    */
  def payloadJson(s: Snapshot): String = {
    val o = mapper.createObjectNode()
    writeHeavy(o, s)
    o.toPrettyString
  }

  /** Serialize with optional per-snapshot manifest EXTERNALIZATION
    * (Iceberg's metadata.json → manifest split): `manifestFor` returns
    * the location-relative path of an already-written manifest file
    * carrying [[payloadJson]] for the snapshot, or None to inline.
    * Externalized, a commit's version JSON is O(snapshot count) head
    * lines instead of O(total files × stats) — the difference between
    * a bulk load whose commit cost grows with history and one that
    * writes each file list exactly once.
    */
  def toJson(m: TableMeta, manifestFor: Snapshot => Option[String]): String = {
    val root = mapper.createObjectNode()
    root.put("formatVersion", m.formatVersion)
    root.put("namespace", m.namespace)
    root.put("table", m.table)
    root.put("schema", m.schema.json)
    val parts = root.putArray("partitioning")
    m.partitioning.foreach { p =>
      val o = parts.addObject(); o.put("field", p.field); o.put("transform", p.transform)
    }
    val snaps = root.putArray("snapshots")
    m.snapshots.foreach { s =>
      val o = snaps.addObject()
      o.put("seq", s.seq); o.put("timestampMs", s.timestampMs)
      o.put("operation", s.operation); o.put("recordCount", s.recordCount)
      manifestFor(s) match {
        case Some(rel) => o.put("manifest", rel)
        case None => writeHeavy(o, s)
      }
      if (s.summary.nonEmpty) {
        val sm = o.putObject("summary")
        s.summary.toSeq.sortBy(_._1).foreach { case (k, v) => sm.put(k, v) }
      }
    }
    val props = root.putObject("properties")
    m.properties.toSeq.sortBy(_._1).foreach { case (k, v) => props.put(k, v) }
    root.toPrettyString
  }

  def toJson(m: TableMeta): String = toJson(m, _ => None)

  private def strings(n: ObjectNode, key: String): Seq[String] =
    n.get(key).asInstanceOf[ArrayNode].elements().asScala.map(_.asText()).toSeq

  /** Parse the heavy payload fields out of either an inline snapshot
    * node or an externalized manifest body (same keys by construction).
    */
  private def readHeavy(o: ObjectNode, base: Snapshot): Snapshot = base.copy(
    dataFiles = strings(o, "dataFiles"),
    deleteFiles = strings(o, "deleteFiles"),
    posDeleteFiles = Option(o.get("posDeleteFiles")).collect {
      case a: ArrayNode => a.elements().asScala.map(_.asText()).toSeq
    }.getOrElse(Nil),
    dvFiles = Option(o.get("dvFiles")).collect {
      case a: ArrayNode => a.elements().asScala.map(_.asText()).toSeq
    }.getOrElse(Nil),
    fileStats = Option(o.get("fileStats")).filter(_.isObject).map { fs =>
      fs.properties().asScala.map { fe =>
        fe.getKey -> fe.getValue.properties().asScala.map { ce =>
          ce.getKey -> (ce.getValue.get("min").asText(), ce.getValue.get("max").asText())
        }.toMap
      }.toMap
    }.getOrElse(Map.empty),
    fileMetrics = Option(o.get("fileMetrics")).filter(_.isObject).map { fm =>
      fm.properties().asScala.map { fe =>
        fe.getKey -> (fe.getValue.get("rows").asLong(), fe.getValue.get("bytes").asLong())
      }.toMap
    }.getOrElse(Map.empty))

  /** Parse, resolving externalized snapshots through `readManifest`
    * (location-relative path → manifest body). `onPointer` reports each
    * resolved (snapshot, manifest path) pair so the caller can reuse
    * the manifest on its next commit instead of re-writing it.
    */
  def fromJson(
      json: String,
      readManifest: String => String,
      onPointer: (Snapshot, String) => Unit): TableMeta = {
    val root = mapper.readTree(json)
    TableMeta(
      formatVersion = root.get("formatVersion").asInt(),
      namespace = root.get("namespace").asText(),
      table = root.get("table").asText(),
      schema = DataType.fromJson(root.get("schema").asText()).asInstanceOf[StructType],
      partitioning = root.get("partitioning").elements().asScala.map { p =>
        PartitionConfig(p.get("field").asText(), p.get("transform").asText())
      }.toSeq,
      snapshots = root.get("snapshots").elements().asScala.map { s =>
        val o = s.asInstanceOf[ObjectNode]
        val header = Snapshot(
          seq = o.get("seq").asLong(),
          timestampMs = o.get("timestampMs").asLong(),
          operation = o.get("operation").asText(),
          dataFiles = Nil,
          deleteFiles = Nil,
          recordCount = o.get("recordCount").asLong(),
          summary = Option(o.get("summary")).filter(_.isObject).map { sm =>
            sm.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
          }.getOrElse(Map.empty))
        Option(o.get("manifest")).map(_.asText()) match {
          case Some(rel) =>
            val full = readHeavy(
              mapper.readTree(readManifest(rel)).asInstanceOf[ObjectNode], header)
            onPointer(full, rel)
            full
          case None => readHeavy(o, header)
        }
      }.toSeq,
      properties = Option(root.get("properties")).filter(_.isObject).map { p =>
        p.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
      }.getOrElse(Map.empty))
  }

  def fromJson(json: String): TableMeta = fromJson(
    json,
    rel => throw new IllegalStateException(
      s"metadata references external manifest '$rel' but no manifest reader was supplied"),
    (_, _) => ())
}
