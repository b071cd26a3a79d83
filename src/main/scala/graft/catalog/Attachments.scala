package graft.catalog

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Column, Identifier, SupportsRead, Table, TableCapability}
import org.apache.spark.sql.execution.datasources.csv.CSVFileFormat
import org.apache.spark.sql.execution.datasources.jdbc.{JDBCOptions, JDBCRDD}
import org.apache.spark.sql.execution.datasources.json.JsonFileFormat
import org.apache.spark.sql.execution.datasources.orc.OrcFileFormat
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.csv.CSVTable
import org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTable
import org.apache.spark.sql.execution.datasources.v2.json.JsonTable
import org.apache.spark.sql.execution.datasources.v2.orc.OrcTable
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** ATTACH '<url>' AS <name> — mount another engine instance as a named
  * foreign catalog (reference beacon_parser.rs:455-490 + the remote
  * module: remote/catalog.rs enumerates the remote once at attach time,
  * resolves each table's provider lazily on first access, and caches
  * it; remote/connection.rs validates the credential combinations).
  *
  * Spark-first re-expression: the attached name becomes a Catalyst V2
  * catalog (`spark.sql.catalog.<name>` → [[AttachedCatalog]]), so
  * `name.schema.table` resolves through Spark's own multi-catalog
  * analyzer with full DSv2 pushdown — filters, projection, and (for
  * JDBC) limits/aggregates reach the foreign side through the builtin
  * scan builders; nothing is re-implemented.
  *
  * The wire seam is [[RemoteInstance]]. Three implementations stand
  * where the reference dials Flight SQL:
  *   - a RUNNING remote instance (`graft://host:port`, served by
  *     [[graft.remote.RemoteServer]]): token/basic handshake, snapshot
  *     listing, and a DSv2 scan that ships required columns + filters
  *     + limit to the remote and streams Arrow IPC back
  *     ([[graft.remote.NetworkPeer]] — the live-wire transport; same
  *     contract as Flight SQL, plain-TCP framing because the gRPC
  *     client jars are not on the fixed classpath);
  *   - a peer graft WAREHOUSE directory (`graft://<dir>` or a plain
  *     path): enumerated from its persisted table definitions, each
  *     table served by the builtin DSv2 file tables over the peer's own
  *     files — compute is colocated, so "push the largest sub-plan to
  *     the remote" degenerates to Catalyst planning the whole query,
  *     the strongest form of pushdown available;
  *   - a JDBC endpoint (`jdbc:*`): schemas/tables from driver metadata,
  *     each table a builtin [[JDBCTable]] (Spark's JDBC pushdown).
  *
  * Like the reference, the listing is a SNAPSHOT taken at attach time
  * (re-ATTACH to pick up new tables), `information_schema` is never
  * mirrored, credentials are validated as token XOR username/password,
  * and SHOW ATTACHMENTS redacts credential values. Attached catalogs
  * are session-scoped and never persisted (definition.rs stores no
  * credentials for durable links; graft keeps the whole mount
  * ephemeral). Mounts are read-only.
  */
object Attachments {

  /** how an attached connection authenticates (connection.rs
    * RemoteCredential — same combinations, same rejections) */
  sealed trait Credential
  case object Anonymous extends Credential
  final case class Bearer(token: String) extends Credential {
    override def toString = "Bearer(<redacted>)"
  }
  final case class Basic(username: String, password: String) extends Credential {
    override def toString = s"Basic($username, <redacted>)"
  }

  /** connection.rs `RemoteCredential::from_parts` — reject ambiguous or
    * incomplete combinations with the reference's messages */
  def credentialFrom(options: Map[String, String]): Credential = {
    val o = options.map { case (k, v) => k.toLowerCase -> v }
    (o.get("token"), o.get("username"), o.get("password")) match {
      case (Some(_), Some(_), _) | (Some(_), _, Some(_)) =>
        throw new IllegalArgumentException(
          "provide either a token or a username/password, not both")
      case (Some(t), None, None) => Bearer(t)
      case (None, Some(u), Some(p)) => Basic(u, p)
      case (None, Some(_), None) =>
        throw new IllegalArgumentException("username given without a password")
      case (None, None, Some(_)) =>
        throw new IllegalArgumentException("password given without a username")
      case (None, None, None) => Anonymous
    }
  }

  /** The wire seam: how an attached instance is enumerated and how one
    * of its tables becomes a DSv2 [[Table]]. Mirrors the reference's
    * connection/executor split (GetTables ↔ [[listing]], fetch_schema +
    * provider build ↔ [[loadTable]]). */
  trait RemoteInstance {
    /** schema → sorted table names, already filtered to what this
      * connection's credential may see (remote/catalog.rs contract) */
    def listing(): Map[String, Seq[String]]
    /** build the table lazily on first reference */
    def loadTable(spark: SparkSession, schema: String, table: String): Table
  }

  final case class Attachment(
      name: String, url: String, kind: String,
      shownOptions: Seq[(String, String)],        // values pre-redacted
      instance: RemoteInstance,
      listing: Map[String, Seq[String]],
      tableCache: ConcurrentHashMap[String, Table])

  // SESSION-scoped registry: keyed by the owning SparkSession (weak, so
  // a dropped session releases its attachments), then by name — two
  // engines in one JVM attaching the same name no longer cross-mount.
  // [[AttachedCatalog]] resolves through SparkSession.active, which is
  // the session executing the lookup.
  private val registry =
    new java.util.WeakHashMap[SparkSession, ConcurrentHashMap[String, Attachment]]()

  private def sessionMap(spark: SparkSession): ConcurrentHashMap[String, Attachment] =
    registry.synchronized {
      registry.computeIfAbsent(spark,
        _ => new ConcurrentHashMap[String, Attachment]())
    }

  private val redactedKeys = Set("token", "password", "secret", "key", "key_id")
  private def redacted(k: String): Boolean = {
    val l = k.toLowerCase
    redactedKeys(l) || l.endsWith("_password") || l.endsWith("_secret")
  }

  def attach(spark: SparkSession, name: String, url: String,
      options: Map[String, String]): Attachment = {
    val credential = credentialFrom(options)
    val instance: RemoteInstance =
      if (url.startsWith("jdbc:")) new JdbcEndpoint(url, options)
      else graft.remote.NetworkPeer.parseUrl(url) match {
        // `graft://host:port` — a RUNNING remote instance over the
        // graft wire (the reference's Flight SQL transport seat);
        // 'tls' 'true' (+ optional truststore) wraps it in TLS, and
        // 'scan_parallelism' 'N' fans a single scan over N streams
        case Some((host, port)) => new graft.remote.NetworkPeer(host, port,
          credential, graft.remote.NetworkPeer.tlsFrom(options),
          graft.remote.NetworkPeer.parallelismFrom(options))
        case None => new EmbeddedPeer(spark,
          url.stripPrefix("graft://").stripPrefix("graft:"), credential)
      }
    val listing = instance.listing()
      .map { case (s, ts) => s -> ts.sorted }
      .filter { case (s, _) => !s.equalsIgnoreCase("information_schema") }
    val shown = options.toSeq.sortBy(_._1).map { case (k, v) =>
      k -> (if (redacted(k)) "<redacted>" else v)
    }
    val att = Attachment(name, url, instance match {
      case _: JdbcEndpoint => "jdbc"
      case _: graft.remote.NetworkPeer => "remote"
      case _ => "peer"
    }, shown, instance, listing, new ConcurrentHashMap[String, Table]())
    sessionMap(spark).put(name, att)
    // the V2 catalog seat: name.schema.table now resolves through
    // Spark's CatalogManager into AttachedCatalog (which consults this
    // registry per lookup, so DETACH/re-ATTACH bite despite the
    // manager's instance cache)
    spark.conf.set(s"spark.sql.catalog.$name", classOf[AttachedCatalog].getName)
    att
  }

  def detach(spark: SparkSession, name: String): Unit = {
    if (sessionMap(spark).remove(name) == null)
      throw new IllegalArgumentException(s"no attachment '$name'")
    spark.conf.unset(s"spark.sql.catalog.$name")
  }

  def get(spark: SparkSession, name: String): Option[Attachment] =
    Option(sessionMap(spark).get(name))

  def list(spark: SparkSession): Seq[Attachment] =
    sessionMap(spark).values.asScala.toSeq.sortBy(_.name)

  // --------------------------------------------------- embedded peer

  /** A second graft warehouse directory mounted as the "remote"
    * instance. Basic credentials authenticate against the PEER's auth
    * directory, and the listing is filtered to that identity's SELECT
    * grants — the reference's "the remote answers from its own catalog,
    * already filtered to what this connection's credential may see".
    * Anonymous mounts see the full catalog (the caller owns the files
    * on this filesystem); bearer tokens are a server artifact the
    * embedded peer cannot verify, rejected loudly. Only data-bearing
    * kinds mount (managed/external); views would need the peer's
    * compute, which a remote executes server-side. */
  final class EmbeddedPeer(spark: SparkSession, warehouse: String,
      credential: Credential) extends RemoteInstance {

    require(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(warehouse)),
      s"no warehouse directory at '$warehouse'")

    private val peer = new GraftCatalog(spark, warehouse)

    private val identity: Option[graft.auth.Auth.AuthIdentity] = credential match {
      case Anonymous => None
      case Bearer(_) => throw new IllegalArgumentException(
        "embedded peer warehouses cannot verify bearer tokens; " +
          "use username/password")
      case Basic(u, p) =>
        val id = peer.auth.authenticate(u, p).getOrElse(
          throw new SecurityException(s"authentication failed for user '$u'"))
        if (id.isSuperUser) None else Some(id)
    }

    private def mountable(d: GraftCatalog.TableDef): Boolean =
      d.kind == "managed" || d.kind == "external"

    private def visible(name: String): Boolean = identity.forall(id =>
      peer.auth.isAllowed(id.roles, "SELECT", graft.auth.Auth.Target.Table(name)))

    /** single-level peer catalog → one schema, named like the
      * reference's default DataFusion schema */
    override def listing(): Map[String, Seq[String]] =
      Map("public" -> peer.tables().filter(mountable).map(_.name)
        .filter(visible).sorted)

    override def loadTable(spark: SparkSession, schema: String,
        table: String): Table = {
      if (!visible(table))
        throw new graft.auth.Authz.PermissionDenied(
          s"remote permission denied: SELECT on TABLE $table")
      val d = peer.tables().find(t => t.name == table && mountable(t))
        .getOrElse(throw new org.apache.spark.sql.catalyst.analysis
          .NoSuchTableException(Identifier.of(Array(schema), table)))
      d.kind match {
        case "managed" =>
          // versioned managed tables keep their data in commit dirs —
          // mount the CURRENT version's dirs (the attach-time snapshot
          // stance extends to the version: re-ATTACH to see later
          // commits); legacy pre-versioning dirs read at the root
          val dirs = TableVersions.latest(warehouse, table)
            .map(e => TableVersions.dataDirs(warehouse, table, e))
            .getOrElse(Seq(java.nio.file.Paths.get(warehouse, table).toString))
          fileTable(spark, table, "parquet", dirs, Map.empty)
        case "external" =>
          d.format.getOrElse("parquet") match {
            case f @ ("parquet" | "csv" | "json" | "orc") =>
              fileTable(spark, table, f, d.paths, d.options)
            case "jdbc" | "postgres" | "mysql" =>
              jdbcTable(schema, table, d.paths.head, d.options)
            case other => throw new IllegalArgumentException(
              s"attached table $table has format '$other', which only the " +
                "owning engine can serve; mountable formats are " +
                "parquet/csv/json/orc/jdbc")
          }
      }
    }
  }

  // ---------------------------------------------------- jdbc endpoint

  /** A SQL database as the attached instance: schemas/tables from
    * driver metadata, each table the builtin DSv2 [[JDBCTable]] (filter
    * /projection/limit — and with the session flags, aggregate —
    * pushdown through Spark's own JDBC scan builder). */
  final class JdbcEndpoint(url: String, options: Map[String, String])
      extends RemoteInstance {

    private def jdbcProps: Map[String, String] = {
      val o = options.map { case (k, v) => k.toLowerCase -> v }
      Map.empty[String, String] ++
        o.get("username").map("user" -> _) ++ o.get("user").map("user" -> _) ++
        o.get("password").map("password" -> _) ++
        o.get("driver").map("driver" -> _)
    }

    override def listing(): Map[String, Seq[String]] = {
      val props = new java.util.Properties()
      jdbcProps.foreach { case (k, v) => props.setProperty(k, v) }
      val conn = java.sql.DriverManager.getConnection(url, props)
      try {
        val rs = conn.getMetaData.getTables(null, null, "%",
          Array("TABLE", "VIEW"))
        val out = scala.collection.mutable.Map.empty[String, List[String]]
        while (rs.next()) {
          val schema = Option(rs.getString("TABLE_SCHEM")).getOrElse("default")
          // system reflection schemas are the endpoint's own business,
          // like the reference dropping information_schema
          if (!schema.equalsIgnoreCase("information_schema") &&
              !schema.toUpperCase.startsWith("SYS"))
            out(schema) = rs.getString("TABLE_NAME") :: out.getOrElse(schema, Nil)
        }
        out.map { case (s, ts) => s -> ts.sorted }.toMap
      } finally conn.close()
    }

    override def loadTable(spark: SparkSession, schema: String,
        table: String): Table = jdbcTable(schema, table, url, jdbcProps)
  }

  // --------------------------------------------------------- builders

  /** mounts are read-only: the builtin file/JDBC tables implement
    * SupportsWrite, so without this wrapper an INSERT against the
    * attached name would write straight into the peer's data files */
  final class ReadOnlyTable(val underlying: Table)
      extends Table with SupportsRead {
    private val readCaps = Set(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ, TableCapability.CONTINUOUS_READ)
    override def name(): String = underlying.name()
    @annotation.nowarn("cat=deprecation")
    override def schema(): org.apache.spark.sql.types.StructType =
      underlying.schema()
    override def columns(): Array[Column] = underlying.columns()
    override def partitioning(): Array[org.apache.spark.sql.connector
        .expressions.Transform] = underlying.partitioning()
    override def properties(): java.util.Map[String, String] =
      underlying.properties()
    override def capabilities(): java.util.Set[TableCapability] =
      underlying.capabilities().asScala.filter(readCaps).asJava
    override def newScanBuilder(options: CaseInsensitiveStringMap)
        : org.apache.spark.sql.connector.read.ScanBuilder =
      underlying.asInstanceOf[SupportsRead].newScanBuilder(options)
  }

  private def fileTable(spark: SparkSession, name: String, format: String,
      paths: Seq[String], options: Map[String, String]): Table = {
    val map = new CaseInsensitiveStringMap(options.asJava)
    format match {
      case "parquet" =>
        ParquetTable(name, spark, map, paths, None, classOf[ParquetFileFormat])
      case "csv" =>
        CSVTable(name, spark, map, paths, None, classOf[CSVFileFormat])
      case "json" =>
        JsonTable(name, spark, map, paths, None, classOf[JsonFileFormat])
      case "orc" =>
        OrcTable(name, spark, map, paths, None, classOf[OrcFileFormat])
    }
  }

  private def jdbcTable(schema: String, table: String, url: String,
      options: Map[String, String]): Table = {
    val dbtable = options.getOrElse("dbtable",
      "\"" + schema + "\".\"" + table + "\"")
    val jdbcOptions = new JDBCOptions(url, dbtable,
      options - "dbtable" - "username")
    val resolved = JDBCRDD.resolveTable(jdbcOptions)
    JDBCTable(Identifier.of(Array(schema), table), resolved, jdbcOptions)
  }
}
