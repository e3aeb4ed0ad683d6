package graft.sources.v2

import java.util

import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * A DataSource V2 `TableCatalog` exposing the synthetic connector tables to
 * plain SQL — the catalog rung of the DSv2 ladder (TableProvider covers
 * `spark.read.format(...)`; a catalog makes tables ADDRESSABLE BY NAME so
 * `spark.sql` can see them, which is how a lakehouse catalog like Iceberg's
 * or Unity's plugs in):
 *
 *   spark.conf.set("spark.sql.catalog.graft",
 *     "graft.sources.v2.GraftCatalog")
 *   spark.sql("SELECT lang, count(*) FROM graft.docs_5000 GROUP BY lang")
 *   spark.sql("""SELECT a.bucket, count(*)
 *                FROM graft.bucketed_20000_8 a
 *                JOIN graft.bucketed_12000_8 b
 *                  ON a.bucket = b.bucket GROUP BY a.bucket""")
 *
 * Table names encode their parameters — `docs_<rows>` and
 * `bucketed_<rows>_<buckets>` — so the catalog is stateless and every
 * "table" resolves deterministically; all pushdowns, reported statistics,
 * reported partitioning (SPJ through SQL!), and runtime bucket pruning of
 * the underlying tables apply unchanged, because the catalog returns the
 * same [[GraftDocsTable]]/[[GraftBucketedTable]] instances the
 * TableProvider path builds. Writes/DDL decline loudly — this is a
 * read-only catalog.
 */
class GraftCatalog extends CatalogPlugin with TableCatalog {

  private var catalogName: String = "graft"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private val Docs = """docs_(\d+)""".r
  private val Bucketed = """bucketed_(\d+)_(\d+)""".r

  override def loadTable(ident: Identifier): Table = ident.name() match {
    case Docs(rows) if ident.namespace().isEmpty =>
      new GraftDocsTable(rows.toLong, 8)
    case Bucketed(rows, buckets) if ident.namespace().isEmpty =>
      new GraftBucketedTable(rows.toLong, buckets.toInt)
    case _ => throw new NoSuchTableException(
      ident.namespace() :+ ident.name())
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().isEmpty && (ident.name() match {
      case Docs(_) | Bucketed(_, _) => true
      case _ => false
    })

  /** The name space is infinite (any size parses); list a representative
    * sample so `SHOW TABLES IN graft` is useful rather than empty. */
  override def listTables(namespace: Array[String]): Array[Identifier] =
    if (namespace.nonEmpty) Array.empty
    else Array("docs_1000", "bucketed_1000_8")
      .map(n => Identifier.of(Array.empty, n))

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")
}
