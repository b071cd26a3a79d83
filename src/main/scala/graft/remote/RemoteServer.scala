package graft.remote

import java.net.{ServerSocket, Socket}
import java.util.concurrent.{ConcurrentHashMap, Executors}

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.JsonDSL._

import graft.auth.Auth
import graft.sources.ArrowSource

/** The serving half of a network ATTACH: one graft engine exposed to
  * remote peers over [[RemoteWire]] (reference surface: the Flight SQL
  * service a Beacon instance runs, beacon-server/src/flight_sql/
  * service.rs — handshake issues a bearer token, catalog calls answer
  * GetTables/schema, DoGet streams Arrow record batches; remote/
  * connection.rs validates the credential combinations client-side).
  *
  * The engine lives on an ISOLATED `spark.newSession()` — same
  * SparkContext (executors, memory), separate temp-view/conf state —
  * so a server embedded next to a local engine in one JVM (the test
  * topology) cannot collide with the local catalog, and in the real
  * topology (one server process per instance) nothing changes.
  *
  * Authentication mirrors the reference's two paths: username/password
  * handshake → a fresh session bearer token (Flight's handshake
  * contract), or a pre-issued token ([[issueToken]] — the admin's
  * out-of-band PAT). Every subsequent authorization reuses the
  * engine's own RBAC: listings are filtered to the identity's SELECT
  * grants, scans re-check the single table they touch, and the
  * arbitrary-SQL op goes through `sqlAs` so the full deny-wins /
  * default-deny / DDL-requires-super lifecycle applies unchanged.
  *
  * Scale shape: one scan request = one Arrow stream produced by a
  * distributed Spark job on the server (`toLocalIterator` drains
  * partitions incrementally — bounded memory), matching the
  * reference's single-stream DoGet. Fan-out across MANY tables/scans
  * parallelizes client-side (each executor task dials its own
  * connection).
  */
final class RemoteServer(spark: SparkSession, warehouse: String,
    port: Int = 0, allowAnonymous: Boolean = false) {

  private val session = spark.newSession()
  private val engine = graft.GraftEngine(session, warehouse)
  engine.restore()

  private val server = new ServerSocket(port)
  def boundPort: Int = server.getLocalPort

  // token -> username; tokens live for the server's lifetime (the
  // reference's session tokens die with the connection's session)
  private val tokens = new ConcurrentHashMap[String, String]()
  @volatile private var running = true

  private def daemon(r: Runnable): Thread = {
    val t = new Thread(r); t.setDaemon(true); t
  }
  private val pool = Executors.newCachedThreadPool(daemon(_))

  /** admin path: mint a bearer token for a user without their password
    * (the reference's out-of-band PAT issuance — server-side only) */
  def issueToken(username: String): String = {
    val t = java.util.UUID.randomUUID().toString
    tokens.put(t, username)
    t
  }

  def stop(): Unit = {
    running = false
    try server.close() catch { case NonFatal(_) => }
    pool.shutdownNow()
  }

  private val acceptor = daemon { () =>
    while (running) {
      try {
        val sock = server.accept()
        pool.submit(daemon(() => handle(sock)))
      } catch { case NonFatal(_) => /* closed during stop() */ }
    }
  }
  acceptor.start()

  // ---------------------------------------------------------- handler

  private def handle(sock: Socket): Unit = {
    try {
      sock.setTcpNoDelay(true)
      val in = new java.io.BufferedInputStream(sock.getInputStream)
      val out = new java.io.BufferedOutputStream(sock.getOutputStream)
      val identity = handshake(in, out) match {
        case Some(id) => id
        case None => return // rejection already written
      }
      val req = RemoteWire.readFrame(in)
      RemoteWire.str(req, "op") match {
        case Some("list_tables") =>
          val names = engine.visibleTables(identity)
          RemoteWire.writeFrame(out,
            ("ok" -> true) ~ ("schemas" -> JObject("public" -> JArray(
              names.map(JString(_)).toList))))
        case Some("get_schema") =>
          val df = authorizedTable(identity, req)
          RemoteWire.writeFrame(out, ("ok" -> true) ~ ("schema" -> df.schema.json))
        case Some("scan") =>
          val df0 = authorizedTable(identity, req)
          val filtered = (req \ "filters") match {
            case JArray(fs) if fs.nonEmpty =>
              df0.where(fs.map(RemoteWire.filterFromJson).reduce(_ && _))
            case _ => df0
          }
          val aggregated = (req \ "aggregate") match {
            case JObject(_) => applyAggregate(filtered, req \ "aggregate")
            case _ => filtered
          }
          // pushed ORDER BY applies BEFORE the projection: the sort
          // column need not be among the requested columns
          val sorted = (req \ "orderby") match {
            case JArray(os) if os.nonEmpty =>
              import org.apache.spark.sql.functions.col
              val cols = os.map { o =>
                val c = col(RemoteWire.str(o, "col").getOrElse(
                  throw new IllegalArgumentException(s"orderby needs col: $o")))
                ((o \ "asc") == JBool(true), (o \ "nullsFirst") == JBool(true)) match {
                  case (true, true)   => c.asc_nulls_first
                  case (true, false)  => c.asc_nulls_last
                  case (false, true)  => c.desc_nulls_first
                  case (false, false) => c.desc_nulls_last
                }
              }
              aggregated.orderBy(cols: _*)
            case _ => aggregated
          }
          val projected = (req \ "columns") match {
            case JArray(cs) if cs.nonEmpty =>
              sorted.select(cs.collect { case JString(c) => c }
                .map(org.apache.spark.sql.functions.col): _*)
            case _ => sorted
          }
          val limited = (req \ "limit") match {
            // clamp: a BigInt wider than Int must not wrap negative
            case JLong(n) => projected.limit(math.min(n, Int.MaxValue).toInt)
            case JInt(n)  => projected.limit(n.min(Int.MaxValue).toInt)
            case _        => projected
          }
          streamResult(out, limited)
        case Some("sql") =>
          val sql = RemoteWire.str(req, "sql").getOrElse(
            throw new IllegalArgumentException("sql op needs 'sql'"))
          streamResult(out, engine.sqlAs(identity, sql))
        case other =>
          throw new IllegalArgumentException(s"unknown op: $other")
      }
    } catch {
      case NonFatal(e) =>
        try RemoteWire.writeFrame(sock.getOutputStream,
          ("ok" -> false) ~ ("error" -> s"${e.getClass.getSimpleName}: ${e.getMessage}"))
        catch { case NonFatal(_) => }
    } finally {
      try sock.close() catch { case NonFatal(_) => }
    }
  }

  /** first frame of every connection; writes the rejection itself so
    * the caller can just return */
  private def handshake(in: java.io.InputStream,
      out: java.io.OutputStream): Option[Auth.AuthIdentity] = {
    val hs = RemoteWire.readFrame(in)
    require(RemoteWire.str(hs, "op").contains("handshake"), "expected handshake")
    val result: Either[String, (Auth.AuthIdentity, Option[String])] =
      (RemoteWire.str(hs, "token"), RemoteWire.str(hs, "username"),
          RemoteWire.str(hs, "password")) match {
        // the reference's connection.rs combination rule, enforced on
        // BOTH ends: a token next to basic credentials is ambiguous
        case (Some(_), Some(_), _) | (Some(_), _, Some(_)) =>
          Left("provide either a token or a username/password, not both")
        case (Some(t), None, None) =>
          Option(tokens.get(t)) match {
            case Some(user) => Right((engine.catalog.auth.identityOf(user), None))
            case None => Left("invalid or expired token")
          }
        case (None, Some(u), Some(p)) =>
          engine.authenticate(u, p) match {
            case Some(id) => Right((id, Some(issueToken(u))))
            case None => Left(s"authentication failed for user '$u'")
          }
        case (None, None, None) if allowAnonymous =>
          Right((Auth.AuthIdentity.system, None))
        case _ => Left("handshake requires a token or username/password")
      }
    result match {
      case Right((id, fresh)) =>
        RemoteWire.writeFrame(out,
          ("ok" -> true) ~ ("token" -> fresh.map(JString(_)).getOrElse(JNothing: JValue)))
        Some(id)
      case Left(msg) =>
        RemoteWire.writeFrame(out, ("ok" -> false) ~ ("error" -> msg))
        None
    }
  }

  /** resolve + authorize the one table a metadata/scan op touches:
    * must be a cataloged (non-crawler) table AND SELECT-granted */
  private def authorizedTable(identity: Auth.AuthIdentity, req: JValue): DataFrame = {
    val name = RemoteWire.str(req, "table").getOrElse(
      throw new IllegalArgumentException("op needs 'table'"))
    val known = engine.catalog.tables().exists(t => t.name == name && t.kind != "crawler")
    if (!known)
      throw new IllegalArgumentException(s"no such table: $name")
    val allowed = identity.isSuperUser || engine.catalog.auth.isAllowed(
      identity.roles, "SELECT", Auth.Target.Table(name))
    if (!allowed)
      throw new graft.auth.Authz.PermissionDenied(
        s"remote permission denied: SELECT on TABLE $name")
    session.table(name)
  }

  /** pushed-down GROUP BY: the client's Aggregation crosses the wire
    * as {group:[cols], aggs:[{fn,col,distinct,type}]} — a closed
    * vocabulary, same no-splicing stance as the filter algebra. The
    * server computes the COMPLETE aggregate (the scan's single stream
    * is the whole result, so complete is final) and casts each value
    * to the type the client declared in its read schema. */
  private def applyAggregate(df: DataFrame, spec: JValue): DataFrame = {
    import org.apache.spark.sql.functions._
    val groups = (spec \ "group") match {
      case JArray(gs) => gs.collect { case JString(g) => g }
      case _ => Nil
    }
    val aggs = (spec \ "aggs") match {
      case JArray(as) => as.zipWithIndex.map { case (a, i) =>
        val fn = RemoteWire.str(a, "fn").getOrElse(
          throw new IllegalArgumentException(s"agg needs fn: $a"))
        val c = RemoteWire.str(a, "col").getOrElse("")
        val distinct = (a \ "distinct") == JBool(true)
        val t = RemoteWire.str(a, "type").getOrElse(
          throw new IllegalArgumentException(s"agg needs type: $a"))
        val expr = (fn, distinct) match {
          case ("count_star", _)  => count(lit(1))
          case ("count", false)   => count(col(c))
          case ("count", true)    => count_distinct(col(c))
          case ("sum", false)     => sum(col(c))
          case ("sum", true)      => sum_distinct(col(c))
          case ("avg", _)         => avg(col(c))
          case ("min", _)         => min(col(c))
          case ("max", _)         => max(col(c))
          case other => throw new IllegalArgumentException(s"bad agg fn: $other")
        }
        expr.cast(t).as(s"a$i")
      }
      case _ => Nil
    }
    require(groups.nonEmpty || aggs.nonEmpty, "empty aggregate spec")
    if (aggs.isEmpty) df.select(groups.map(col): _*).distinct() // pushed DISTINCT
    else df.groupBy(groups.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  private def streamResult(out: java.io.OutputStream, df: DataFrame): Unit = {
    RemoteWire.writeFrame(out,
      ("ok" -> true) ~ ("stream" -> true) ~ ("schema" -> df.schema.json))
    ArrowSource.writeIpcStream(df, out)
    out.flush()
  }
}
