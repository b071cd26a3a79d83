package graft.remote

import java.io.{DataInputStream, DataOutputStream, InputStream, OutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.sources._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The graft remote wire: the protocol an ATTACHed network peer speaks
  * (reference surface: the Flight SQL transport dialed by remote
  * tables — beacon-server/src/flight_sql/service.rs:40-130 handshake →
  * bearer token, beacon-datafusion-ext/src/remote/connection.rs
  * GetTables/fetch_schema, executor.rs streaming Arrow results).
  *
  * Offline substitution, documented: Flight SQL rides gRPC, whose JVM
  * client jars are not on the fixed classpath, so graft speaks the same
  * CONTRACT over a plain TCP socket (or TLS — [[TlsClientConfig]]) —
  * length-prefixed JSON control frames for handshake/listing/schema,
  * the standard Arrow IPC STREAM format (the exact byte format Flight
  * DoGet carries) for results, and a trailing `{ok, rows}` COMPLETION
  * RECEIPT after the Arrow end-of-stream marker that the client
  * verifies before trusting end-of-data. One request per connection;
  * every connection opens with a handshake frame, exactly like
  * Flight's handshake-then-call flow.
  *
  * Everything pushed crosses as CLOSED vocabularies, never SQL text —
  * filters as the JSON algebra below, same-peer joins as
  * `joins: [{table2, on, type, filters2}]` (each table re-authorized
  * server-side), aggregates/TopN/limit as their own typed fields, and
  * parallel-scan range tickets as `part`/`parts` — so there is no
  * string-splicing surface and nothing a client sends can reference
  * tables beyond what its identity's grants authorize.
  */
object RemoteWire {

  /** max control-frame size; results stream separately so control
    * frames are small — a huge length prefix means a corrupt peer */
  private val MaxFrame = 16 * 1024 * 1024

  /** Client TLS settings for the wire (the reference's ATTACH parses a
    * `tls` option — beacon-core/src/parser/beacon_parser.rs:465,
    * remote/connection.rs): presence = TLS on. With no truststore the
    * JDK default trust anchors apply (public CAs); a custom truststore
    * (JKS/PKCS12 path + password) pins a private CA — the test topology
    * uses a self-signed keystore as both server identity and client
    * trust. Serializable: executor scan tasks dial their own
    * connections. */
  final case class TlsClientConfig(truststore: Option[String],
      truststorePassword: Option[String]) extends Serializable

  /** dial the wire: plain TCP, or TLS with default/pinned trust */
  def connect(host: String, port: Int, tls: Option[TlsClientConfig]): java.net.Socket = {
    val sock = tls match {
      case None => new java.net.Socket(host, port)
      case Some(cfg) =>
        val factory = cfg.truststore match {
          case None => javax.net.ssl.SSLSocketFactory.getDefault
            .asInstanceOf[javax.net.ssl.SSLSocketFactory]
          case Some(path) =>
            val ks = java.security.KeyStore.getInstance(
              if (path.endsWith(".jks")) "JKS" else "PKCS12")
            val in = new java.io.FileInputStream(path)
            // null password = skip the integrity check (standard for
            // truststores, whose store password only gates integrity;
            // an empty string would FORCE the check and reject any
            // store with a real password)
            try ks.load(in, cfg.truststorePassword.map(_.toCharArray).orNull)
            finally in.close()
            val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
              javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
            tmf.init(ks)
            val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
            ctx.init(null, tmf.getTrustManagers, null)
            ctx.getSocketFactory
        }
        val s = factory.createSocket(host, port).asInstanceOf[javax.net.ssl.SSLSocket]
        // hostname verification: without endpoint identification ANY
        // CA-trusted certificate would authenticate any host, and the
        // handshake would hand a MITM the credentials (the dNSName
        // SAN / CN must match the host we dialed)
        val params = s.getSSLParameters
        params.setEndpointIdentificationAlgorithm("HTTPS")
        s.setSSLParameters(params)
        s.startHandshake()
        s
    }
    sock.setTcpNoDelay(true)
    sock
  }

  def writeFrame(out: OutputStream, json: JValue): Unit = {
    val bytes = JsonMethods.compact(JsonMethods.render(json))
      .getBytes(StandardCharsets.UTF_8)
    val d = new DataOutputStream(out)
    d.writeInt(bytes.length)
    d.write(bytes)
    d.flush()
  }

  def readFrame(in: InputStream): JValue = {
    val d = new DataInputStream(in)
    val len = d.readInt()
    require(len >= 0 && len <= MaxFrame, s"bad frame length $len")
    val bytes = new Array[Byte](len)
    d.readFully(bytes)
    JsonMethods.parse(new String(bytes, StandardCharsets.UTF_8))
  }

  def str(j: JValue, field: String): Option[String] = j \ field match {
    case JString(s) => Some(s)
    case _ => None
  }

  // ------------------------------------------------- literal encoding

  /** typed literal → tagged JSON; None = a type the algebra doesn't
    * carry (the filter stays client-side) */
  def valueToJson(v: Any): Option[JValue] = v match {
    case null                   => Some(JNull)
    case s: String              => Some(JObject("s" -> JString(s)))
    case b: java.lang.Boolean   => Some(JObject("b" -> JBool(b)))
    case n: java.lang.Byte      => Some(JObject("l" -> JLong(n.longValue)))
    case n: java.lang.Short     => Some(JObject("l" -> JLong(n.longValue)))
    case n: java.lang.Integer   => Some(JObject("l" -> JLong(n.longValue)))
    case n: java.lang.Long      => Some(JObject("l" -> JLong(n)))
    case n: java.lang.Float     => Some(JObject("d" -> JDouble(n.doubleValue)))
    case n: java.lang.Double    => Some(JObject("d" -> JDouble(n)))
    case n: java.math.BigDecimal => Some(JObject("dec" -> JString(n.toString)))
    case n: BigDecimal          => Some(JObject("dec" -> JString(n.toString)))
    case ts: java.sql.Timestamp =>
      val inst = ts.toInstant
      Some(JObject("ts" -> JLong(inst.getEpochSecond * 1000000L + inst.getNano / 1000)))
    case inst: java.time.Instant =>
      Some(JObject("ts" -> JLong(inst.getEpochSecond * 1000000L + inst.getNano / 1000)))
    case ldt: java.time.LocalDateTime =>
      val inst = ldt.toInstant(java.time.ZoneOffset.UTC)
      Some(JObject("tsntz" -> JLong(inst.getEpochSecond * 1000000L + inst.getNano / 1000)))
    case d: java.sql.Date       => Some(JObject("dt" -> JLong(d.toLocalDate.toEpochDay)))
    case d: java.time.LocalDate => Some(JObject("dt" -> JLong(d.toEpochDay)))
    case _ => None
  }

  def valueFromJson(j: JValue): Any = j match {
    case JNull => null
    case JObject(List(("s", JString(s))))   => s
    case JObject(List(("b", JBool(b))))     => b
    case JObject(List(("l", JLong(l))))     => l
    case JObject(List(("l", JInt(l))))      => l.longValue
    case JObject(List(("d", JDouble(d))))   => d
    case JObject(List(("dec", JString(s)))) => new java.math.BigDecimal(s)
    case JObject(List(("ts", v))) =>
      val micros = v match { case JLong(l) => l; case JInt(i) => i.longValue; case _ => sys.error(s"bad ts: $v") }
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L))
    case JObject(List(("tsntz", v))) =>
      val micros = v match { case JLong(l) => l; case JInt(i) => i.longValue; case _ => sys.error(s"bad tsntz: $v") }
      java.time.LocalDateTime.ofInstant(java.time.Instant.ofEpochSecond(
        Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L),
        java.time.ZoneOffset.UTC)
    case JObject(List(("dt", v))) =>
      val days = v match { case JLong(l) => l; case JInt(i) => i.longValue; case _ => sys.error(s"bad dt: $v") }
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days))
    case other => throw new IllegalArgumentException(s"bad wire literal: $other")
  }

  // -------------------------------------------------- filter encoding

  /** flat column reference only — nested fields stay client-side */
  private def colRef(name: String): Option[String] =
    if (name.contains(".") || name.contains("`")) None else Some(name)

  /** V1 pushed filter → wire JSON; None = not expressible, evaluated
    * after the scan on the client instead (never dropped). */
  def filterToJson(f: Filter): Option[JValue] = {
    def leaf(op: String, col: String, v: Any): Option[JValue] = for {
      c <- colRef(col); jv <- valueToJson(v)
    } yield JObject("op" -> JString(op), "col" -> JString(c), "v" -> jv)
    f match {
      case EqualTo(c, v)            => leaf("eq", c, v)
      case EqualNullSafe(c, v)      => leaf("eqns", c, v)
      case GreaterThan(c, v)        => leaf("gt", c, v)
      case GreaterThanOrEqual(c, v) => leaf("ge", c, v)
      case LessThan(c, v)           => leaf("lt", c, v)
      case LessThanOrEqual(c, v)    => leaf("le", c, v)
      case StringStartsWith(c, v)   => leaf("sw", c, v)
      case StringEndsWith(c, v)     => leaf("ew", c, v)
      case StringContains(c, v)     => leaf("ct", c, v)
      case In(c, vs) =>
        val jvs = vs.toSeq.map(valueToJson)
        for { cc <- colRef(c); _ <- if (jvs.forall(_.isDefined)) Some(()) else None }
          yield JObject("op" -> JString("in"), "col" -> JString(cc),
            "vs" -> JArray(jvs.flatten.toList))
      case IsNull(c)    => colRef(c).map(cc => JObject("op" -> JString("isnull"), "col" -> JString(cc)))
      case IsNotNull(c) => colRef(c).map(cc => JObject("op" -> JString("notnull"), "col" -> JString(cc)))
      case And(l, r) => for { lj <- filterToJson(l); rj <- filterToJson(r) }
        yield JObject("op" -> JString("and"), "l" -> lj, "r" -> rj)
      case Or(l, r) => for { lj <- filterToJson(l); rj <- filterToJson(r) }
        yield JObject("op" -> JString("or"), "l" -> lj, "r" -> rj)
      case Not(c) => filterToJson(c).map(cj => JObject("op" -> JString("not"), "c" -> cj))
      case _ => None
    }
  }

  /** wire JSON → Column predicate against the single authorized scan
    * relation (server side) */
  def filterFromJson(j: JValue): Column = {
    def col(): Column = F.col(str(j, "col").getOrElse(
      throw new IllegalArgumentException(s"filter missing col: $j")))
    def lit(): Column = F.lit(valueFromJson(j \ "v"))
    str(j, "op").getOrElse(throw new IllegalArgumentException(s"filter missing op: $j")) match {
      case "eq"      => col() === lit()
      case "eqns"    => col() <=> lit()
      case "gt"      => col() > lit()
      case "ge"      => col() >= lit()
      case "lt"      => col() < lit()
      case "le"      => col() <= lit()
      case "sw"      => col().startsWith(lit())
      case "ew"      => col().endsWith(lit())
      case "ct"      => col().contains(lit())
      case "in"      =>
        val vs = (j \ "vs").asInstanceOf[JArray].arr.map(valueFromJson)
        col().isInCollection(vs)
      case "isnull"  => col().isNull
      case "notnull" => col().isNotNull
      case "and"     => filterFromJson(j \ "l") && filterFromJson(j \ "r")
      case "or"      => filterFromJson(j \ "l") || filterFromJson(j \ "r")
      case "not"     => !filterFromJson(j \ "c")
      case other => throw new IllegalArgumentException(s"bad filter op: $other")
    }
  }
}
