package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LeafCommand
import org.apache.spark.sql.connector.catalog.{Identifier, TableChange}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** `ALTER TABLE … ALTER COLUMN c SET NOT NULL` routed to the icelite
  * catalog. Spark 4.1's analyzer categorically refuses tightening
  * nullability for v2 tables ("Cannot change nullable column to
  * non-nullable") before any catalog sees the change, so — like the
  * view DDL in [[IceliteViewParser]] — the statement is rewritten at
  * parse time into this command, which hands the standard
  * `TableChange.updateColumnNullability(false)` to
  * [[IceliteCatalog.alterTable]]. The engine then runs the one-scan
  * proof ([[graft.table.IceliteTable.tightenNullability]]): refuse
  * with the violating row count if any stored row is NULL, else a
  * metadata-only flip; subsequent ingest writes enforce the contract
  * inside their own scan. Governed catalogs refuse like every other
  * DDL (`alterTable` is write-path).
  */
case class IceliteSetNotNullCommand(
    catName: String, ident: Identifier, cols: Seq[String])
  extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val cat = session.sessionState.catalogManager.catalog(catName)
      .asInstanceOf[IceliteCatalog]
    cat.alterTable(ident,
      cols.map(c => TableChange.updateColumnNullability(Array(c), false)): _*)
    Seq.empty
  }
}
