package graft.remote

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.JsonDSL._

import graft.catalog.Attachments
import graft.catalog.Attachments.{Anonymous, Basic, Bearer, Credential}

/** The dialing half of a network ATTACH — `ATTACH 'graft://host:port'`
  * mounts a RUNNING remote graft instance (one serving [[RemoteServer]])
  * as a foreign catalog. This is the reference's remote-table
  * transport (beacon-datafusion-ext/src/remote/{connection,executor}
  * .rs: connection validates the credential, GetTables enumerates,
  * fetch_schema resolves lazily, queries stream Arrow) re-expressed as
  * the third [[Attachments.RemoteInstance]] next to the embedded-peer
  * and JDBC seams.
  *
  * Credential lifecycle matches connection.rs: a bearer token rides
  * every connection's handshake as-is; username/password handshakes
  * once and the returned session token is cached and reused (the
  * PBKDF2 check happens once, not per request). Executor scan tasks
  * carry the SESSION TOKEN (password only as a fallback for a token
  * that outlived a server restart) — each scan task dials its own
  * connection, so a multi-scan query parallelizes client-side, and
  * with `scan_parallelism` > 1 a single scan fans out over N hash-mod
  * range tickets (the multi-endpoint shape Flight allows).
  *
  * `tls` on the attach options wraps every connection in JDK TLS
  * (the reference's ATTACH `tls` option, beacon_parser.rs:465);
  * `truststore`/`truststore_password` pin a private CA.
  */
final class NetworkPeer(host: String, port: Int, credential: Credential,
    tls: Option[RemoteWire.TlsClientConfig] = None,
    scanParallelism: Int = 1)
    extends Attachments.RemoteInstance {

  private val target = WireTarget(host, port, tls)

  // session token from a basic handshake, reused across requests
  @volatile private var sessionToken: Option[String] = credential match {
    case Bearer(t) => Some(t)
    case _ => None
  }

  private def handshakeJson: JValue = {
    val base: JValue = "op" -> "handshake"
    sessionToken match {
      case Some(t) => base merge (("token" -> t): JValue)
      case None => credential match {
        case Basic(u, p) => base merge (("username" -> u) ~ ("password" -> p): JValue)
        case Anonymous   => base
        case Bearer(_)   => base // unreachable: sessionToken is set
      }
    }
  }

  /** one request/response round-trip; on token rejection with basic
    * credentials available, re-handshakes once with the password */
  private def request[A](op: JValue)(read: (JValue, java.io.InputStream) => A): A = {
    def once(hs: JValue): Either[String, A] = {
      val sock = RemoteWire.connect(host, port, tls)
      try {
        val in = new java.io.BufferedInputStream(sock.getInputStream)
        val out = new java.io.BufferedOutputStream(sock.getOutputStream)
        RemoteWire.writeFrame(out, hs)
        val hsResp = RemoteWire.readFrame(in)
        if (!(hsResp \ "ok").equals(JBool(true)))
          return Left(RemoteWire.str(hsResp, "error").getOrElse("handshake rejected"))
        RemoteWire.str(hsResp, "token").foreach(t => sessionToken = Some(t))
        RemoteWire.writeFrame(out, op)
        val resp = RemoteWire.readFrame(in)
        if (!(resp \ "ok").equals(JBool(true)))
          throw new RuntimeException("remote error: " +
            RemoteWire.str(resp, "error").getOrElse("unknown"))
        Right(read(resp, in))
      } finally sock.close()
    }
    once(handshakeJson) match {
      case Right(a) => a
      case Left(err) =>
        // a cached session token can outlive a server restart; retry
        // with the password once if we have one
        val retryable = sessionToken.isDefined &&
          (credential match { case Basic(_, _) => true; case _ => false })
        if (retryable) {
          sessionToken = None
          once(handshakeJson) match {
            case Right(a) => a
            case Left(e2) => throw new SecurityException(s"remote handshake failed: $e2")
          }
        } else throw new SecurityException(s"remote handshake failed: $err")
    }
  }

  override def listing(): Map[String, Seq[String]] =
    request(("op" -> "list_tables"): JValue) { (resp, _) =>
      (resp \ "schemas") match {
        case JObject(fields) => fields.map {
          case (schema, JArray(ts)) =>
            schema -> ts.collect { case JString(t) => t }
          case (schema, _) => schema -> Seq.empty[String]
        }.toMap
        case _ => Map.empty
      }
    }

  override def loadTable(spark: SparkSession, schema: String, table: String): Table = {
    val schemaJson = request(("op" -> "get_schema") ~ ("table" -> table): JValue) {
      (resp, _) => RemoteWire.str(resp, "schema").getOrElse(
        throw new RuntimeException("remote get_schema returned no schema"))
    }
    val structType = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    new RemoteTable(target, credential, sessionToken, table, structType,
      scanParallelism)
  }
}

object NetworkPeer {
  /** `graft://host:port` (and nothing that could be a local path) */
  private val HostPort = "^([A-Za-z0-9_.\\-]+):([0-9]{1,5})$".r

  def parseUrl(url: String): Option[(String, Int)] =
    if (!url.startsWith("graft://")) None
    else url.stripPrefix("graft://") match {
      // a local directory literally named "host:port" stays an
      // embedded peer — the network form requires a non-directory
      case hp @ HostPort(h, p)
          if !java.nio.file.Files.isDirectory(java.nio.file.Paths.get(hp)) =>
        Some((h, p.toInt))
      case _ => None
    }

  /** TLS client settings from ATTACH options (the reference parses
    * `tls` — beacon_parser.rs:465); absent/false = plaintext */
  def tlsFrom(options: Map[String, String]): Option[RemoteWire.TlsClientConfig] = {
    val o = options.map { case (k, v) => k.toLowerCase -> v }
    if (o.get("tls").exists(_.equalsIgnoreCase("true")))
      Some(RemoteWire.TlsClientConfig(
        o.get("truststore"), o.get("truststore_password")))
    else None
  }

  def parallelismFrom(options: Map[String, String]): Int = {
    val n = options.collectFirst {
      case (k, v) if k.equalsIgnoreCase("scan_parallelism") =>
        v.trim.toIntOption.getOrElse(throw new IllegalArgumentException(
          s"scan_parallelism must be an integer 1..64, got '$v'"))
    }.getOrElse(1)
    require(n >= 1 && n <= 64, s"scan_parallelism out of range: $n")
    n
  }
}
