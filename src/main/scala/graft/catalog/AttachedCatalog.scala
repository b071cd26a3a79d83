package graft.catalog

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The Catalyst seat of an ATTACH mount: a V2 [[TableCatalog]] the
  * analyzer consults for `name.schema.table` references. Instantiated
  * by Spark's CatalogManager from the `spark.sql.catalog.<name>` conf
  * that [[Attachments.attach]] sets; every lookup goes back through the
  * [[Attachments]] registry, so DETACH invalidates immediately and
  * re-ATTACH swaps in the fresh snapshot even though the manager caches
  * this instance for the session's lifetime.
  *
  * Read-only by design (the reference's remote tables are federated
  * reads; DDL belongs to the owning instance). Table builds are cached
  * per attachment — the reference caches each remote provider after its
  * first lazy resolution (remote/catalog.rs), and a FileTable's listing
  * freezes the same way its snapshot does. */
class AttachedCatalog extends TableCatalog with SupportsNamespaces {

  private var catName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catName = name

  override def name(): String = catName

  private def att: Attachments.Attachment =
    Attachments.get(org.apache.spark.sql.SparkSession.active, catName)
      .getOrElse(throw new IllegalStateException(
        s"catalog '$catName' is not attached (was it DETACHed?)"))

  private def schemaOf(ident: Identifier): String = ident.namespace() match {
    case Array() => "public"
    case Array(s) => s
    case _ => throw new NoSuchTableException(ident)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val schema = if (namespace.isEmpty) "public" else namespace.mkString(".")
    att.listing.get(schema) match {
      case Some(ts) => ts.map(t => Identifier.of(namespace, t)).toArray
      case None => throw new NoSuchNamespaceException(namespace)
    }
  }

  override def tableExists(ident: Identifier): Boolean =
    att.listing.get(schemaOf(ident)).exists(_.contains(ident.name))

  override def loadTable(ident: Identifier): Table = {
    val a = att
    val schema = schemaOf(ident)
    // snapshot semantics: only tables enumerated at attach time resolve
    if (!a.listing.get(schema).exists(_.contains(ident.name)))
      throw new NoSuchTableException(ident)
    a.tableCache.computeIfAbsent(s"$schema.${ident.name}",
      _ => new Attachments.ReadOnlyTable(
        a.instance.loadTable(SparkSession.active, schema, ident.name)))
  }

  private def readOnly(): Nothing = throw new UnsupportedOperationException(
    s"catalog '$catName' is a read-only ATTACH mount; run DDL/DML on the " +
      "owning instance and re-ATTACH to refresh the snapshot")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    readOnly()

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    readOnly()

  override def dropTable(ident: Identifier): Boolean = readOnly()

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly()

  // ------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] =
    att.listing.keys.toArray.sorted.map(Array(_))

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (att.listing.contains(namespace.mkString("."))) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || att.listing.contains(namespace.mkString("."))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace)) new util.HashMap[String, String]()
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = readOnly()

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit = readOnly()

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    readOnly()
}
