package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `TableCatalog` over [[GraftStore]] — the last DSv2 seam: with
  * `spark.sql.catalog.graft = graft.sources.v2.GraftCatalog` a pure-SQL
  * user gets DDL and DML against the store with no DataFrame code:
  *
  * {{{
  *   CREATE TABLE graft.events_agg (hour TIMESTAMP, n BIGINT)
  *   INSERT INTO graft.events_agg SELECT ...
  *   SELECT * FROM graft.events_agg
  *   DROP TABLE graft.events_agg
  * }}}
  *
  * All reads/writes route through [[GraftStoreTable]]'s two-phase commit;
  * the catalog only resolves identifiers to tables. Multi-part
  * identifiers flatten dot-joined (`graft.a.b` → table key `a.b`).
  */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = "graft"

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = { catalogName = name }

  override def name(): String = catalogName

  private def key(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString(".")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val prefix = if (namespace.isEmpty) "" else namespace.mkString(".") + "."
    GraftStore.schemas.keys.toArray.sorted
      .filter(_.startsWith(prefix))
      .map { k =>
        val rest = k.stripPrefix(prefix)
        Identifier.of(namespace, rest)
      }
  }

  override def loadTable(ident: Identifier): Table = {
    val k = key(ident)
    GraftStore.schemas.get(k) match {
      case Some(schema) => new GraftStoreTable(k, schema)
      case None => throw new NoSuchTableException(
        ident.namespace() :+ ident.name())
    }
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val k = key(ident)
    if (GraftStore.schemas.contains(k))
      throw new TableAlreadyExistsException(
        (ident.namespace() :+ ident.name()).toSeq)
    GraftStore.createEmpty(k, schema)
    new GraftStoreTable(k, schema)
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft catalog tables are append/overwrite-only; ALTER is not supported")

  override def dropTable(ident: Identifier): Boolean = {
    val k = key(ident)
    val existed = GraftStore.schemas.contains(k)
    if (existed) GraftStore.drop(k)
    existed
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft catalog does not support RENAME")
}
