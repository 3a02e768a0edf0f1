package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.table.IceliteTable

/** Iceberg-parity SQL stored procedures for table maintenance —
  * `CALL <catalog>.system.<proc>(table => 'ns.t', …)` (the DSv2
  * procedure surface Spark 4.1 added; reference `docs/design.md`
  * "Maintenance": compaction and snapshot expiry are the reference's
  * own two scheduled actions, surfaced here the way Iceberg's Spark
  * integration surfaces them — as catalog procedures, so an operator
  * can run table upkeep from plain SQL without the Scala API).
  *
  * Every procedure is a thin router onto the already-gated
  * [[IceliteTable]] maintenance methods; each returns a one-row result
  * via [[LocalScan]] so `CALL` surfaces the commit seq / removal count
  * it produced. All are side-effecting ⇒ `isDeterministic = false`.
  */
object IceliteProcedures {

  private def in(name: String, dt: DataType) =
    ProcedureParameter.in(name, dt).build()
  private def inD(name: String, dt: DataType, default: String) =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  private final case class Spec(
      name: String,
      description: String,
      params: Seq[ProcedureParameter],
      resultSchema: StructType,
      body: (IceliteTable, InternalRow) => Seq[Any])

  private val tableParam = in("table", StringType)
  private def seqResult = StructType(Seq(StructField("snapshot_seq", LongType, nullable = false)))
  private def countResult(n: String) = StructType(Seq(StructField(n, IntegerType, nullable = false)))

  private val specs: Seq[Spec] = Seq(
    Spec("compact", "bin-pack live data files into ~target_file_mb files (one rewrite commit); zorder_by = comma-separated integral columns for multi-dimension clustering",
      Seq(tableParam, inD("target_file_mb", IntegerType, "256"),
        inD("zorder_by", StringType, "''")), seqResult,
      (t, r) => {
        val z = r.getUTF8String(2).toString.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
        Seq(t.compact(r.getInt(1), z, None))
      }),
    Spec("declare_sort_order", "declare the table's sort order (comma-separated columns): the next compact range-partitions + sorts on them so files own disjoint key ranges (metadata-only commit)",
      Seq(tableParam, in("columns", StringType)), seqResult,
      (t, r) => Seq(t.declareSortOrder(
        r.getUTF8String(1).toString.split(',').toSeq.map(_.trim).filter(_.nonEmpty)))),
    Spec("expire_snapshots", "delete metadata versions beyond keep_versions and sweep orphans",
      Seq(tableParam, inD("keep_versions", IntegerType, "3")), countResult("expired_versions"),
      (t, r) => Seq(t.expireSnapshots(r.getInt(1)))),
    Spec("remove_orphan_files", "delete files referenced by no retained snapshot and older than grace_ms (< 0 = default TTL)",
      Seq(tableParam, inD("grace_ms", LongType, "-1")), countResult("removed"),
      (t, r) => Seq(if (r.getLong(1) < 0) t.removeOrphans() else t.removeOrphans(r.getLong(1)))),
    Spec("rewrite_manifests", "fold file lists of snapshots older than the keep_recent most recent into one base snapshot (metadata-only)",
      Seq(tableParam, inD("keep_recent", IntegerType, "2")), seqResult,
      (t, r) => Seq(t.rewriteManifests(r.getInt(1)))),
    Spec("evolve_partitioning", "replace the partition spec for FUTURE writes ('col:transform' entries, ','-separated; transform = identity|year|month|day|hour|bucket[N], default identity; the keyword 'none' unpartitions); existing files keep their old spec and scans prune under both",
      Seq(tableParam, in("spec", StringType)), seqResult,
      (t, r) => {
        val raw = r.getUTF8String(1).toString
        val entries = raw.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
        // an empty/whitespace spec is almost always a typo'd argument —
        // silently unpartitioning the table would be a real metadata
        // commit, so refuse; the explicit keyword 'none' opts in
        val unpartition = entries.map(_.toLowerCase(java.util.Locale.ROOT)) == Seq("none")
        require(unpartition || entries.nonEmpty,
          "evolve_partitioning: empty spec — pass 'none' explicitly to unpartition " +
            "future writes, or 'col:transform' entries to repartition")
        Seq(t.evolvePartitioning(
          if (unpartition) Nil
          else entries.map { e =>
            val i = e.indexOf(':')
            if (i < 0) graft.config.PartitionConfig(e)
            else graft.config.PartitionConfig(e.substring(0, i).trim, e.substring(i + 1).trim)
          }))
      }),
    Spec("rollback_to_snapshot", "metadata-only rollback: snapshots after seq leave the live view",
      Seq(tableParam, in("seq", LongType)), seqResult,
      (t, r) => Seq(t.rollbackTo(r.getLong(1)))),
    Spec("consolidate_deletes", "fold equality+position deletes (full => including prior DVs) into per-file deletion-vector bitmaps",
      Seq(tableParam, inD("full", BooleanType, "true")), seqResult,
      (t, r) => Seq(if (r.getBoolean(1)) t.consolidateDeletesFull() else t.consolidateDeleteVectors())),
    Spec("analyze", "compute column stats (NDV sketch, bounds) for the comma-separated columns; one metadata commit",
      Seq(tableParam, in("columns", StringType)), seqResult,
      (t, r) => Seq(t.analyze(r.getUTF8String(1).toString.split(',').toSeq.map(_.trim).filter(_.nonEmpty)))),
    Spec("declare_policy", "declare a principal's row filter and/or column masks ('col:EXPR' entries, ';'-separated); a governed catalog (spark.sql.catalog.<n>.principal) then serves the policy view",
      Seq(tableParam, in("principal", StringType),
        inD("row_filter", StringType, "NULL"), inD("masks", StringType, "''")), seqResult,
      (t, r) => {
        val filter = if (r.isNullAt(2)) None
          else Some(r.getUTF8String(2).toString).filter(_.nonEmpty)
        val masks = r.getUTF8String(3).toString.split(';').toSeq
          .map(_.trim).filter(_.nonEmpty).map { entry =>
            val i = entry.indexOf(':')
            require(i > 0, s"mask entry '$entry' must be 'column:EXPR'")
            entry.substring(0, i).trim -> entry.substring(i + 1).trim
          }.toMap
        Seq(t.declarePolicy(r.getUTF8String(1).toString, filter, masks))
      }),
    Spec("drop_policy", "remove a principal's policy declaration",
      Seq(tableParam, in("principal", StringType)), seqResult,
      (t, r) => Seq(t.dropPolicy(r.getUTF8String(1).toString))),
    Spec("declare_constraint", "declare a write-time CHECK constraint (validates existing rows once; every later ingest write enforces it fail-fast)",
      Seq(tableParam, in("name", StringType), in("predicate", StringType)), seqResult,
      (t, r) => Seq(t.declareConstraint(r.getUTF8String(1).toString, r.getUTF8String(2).toString))),
    Spec("drop_constraint", "drop a declared CHECK constraint",
      Seq(tableParam, in("name", StringType)), seqResult,
      (t, r) => Seq(t.dropConstraint(r.getUTF8String(1).toString))),
    // ----- snapshot refs (Iceberg's create_branch/create_tag/fast_forward)
    Spec("create_branch", "create a movable branch ref (at seq, default the current head); write to it with append_to_branch, publish with publish_branch",
      Seq(tableParam, in("name", StringType), inD("seq", LongType, "-1")), seqResult,
      (t, r) => {
        t.createBranch(r.getUTF8String(1).toString,
          Some(r.getLong(2)).filter(_ >= 0))
        Seq(t.meta.lastSeq)
      }),
    Spec("create_tag", "create an immutable tag on a retained snapshot seq",
      Seq(tableParam, in("name", StringType), in("seq", LongType)), seqResult,
      (t, r) => { t.createTag(r.getUTF8String(1).toString, r.getLong(2)); Seq(r.getLong(2)) }),
    Spec("fast_forward", "advance a branch ref to the current head (tags refuse)",
      Seq(tableParam, in("name", StringType)), seqResult,
      (t, r) => { t.fastForward(r.getUTF8String(1).toString); Seq(t.meta.lastSeq) }),
    Spec("publish_branch", "land a branch's staged appends on main in stage order (cherry-pick if main moved) and fast-forward the ref",
      Seq(tableParam, in("name", StringType)), seqResult,
      (t, r) => Seq(t.publishBranch(r.getUTF8String(1).toString))),
    Spec("drop_ref", "drop a branch or tag (a branch's unpublished staged writes are discarded)",
      Seq(tableParam, in("name", StringType)), seqResult,
      (t, r) => { t.dropRef(r.getUTF8String(1).toString); Seq(t.meta.lastSeq) }))

  def names: Seq[String] = specs.map(_.name)

  def load(spark: SparkSession, warehouse: String, name: String): Option[UnboundProcedure] =
    specs.find(_.name == name).map(new Proc(spark, warehouse, _))

  private final class Proc(spark: SparkSession, warehouse: String, spec: Spec)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = spec.name
    override def description(): String = spec.description
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = spec.params.toArray
    override def isDeterministic: Boolean = false

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val ref = input.getUTF8String(0).toString
      val t = ref.split('.') match {
        case Array(ns, tn) => IceliteTable.load(spark, warehouse, ns, tn)
        case _ => throw new IllegalArgumentException(
          s"procedure ${spec.name}: table must be 'namespace.table', got '$ref'")
      }
      val vals = spec.body(t, input).map {
        case s: String => UTF8String.fromString(s)
        case x => x
      }
      val out = InternalRow.fromSeq(vals)
      val schema = spec.resultSchema
      val scan: Scan = new LocalScan {
        override def rows(): Array[InternalRow] = Array(out)
        override def readSchema(): StructType = schema
      }
      java.util.Collections.singletonList(scan).iterator()
    }
  }
}
