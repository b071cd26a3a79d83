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
  * reference's single-stream DoGet; a client may instead redeem N
  * hash-mod range tickets (`part`/`parts`) to fan ONE plain scan over
  * N parallel streams. Fan-out across MANY tables/scans parallelizes
  * client-side (each executor task dials its own connection), and
  * same-peer join chains arrive as one request whose fold runs here —
  * only the join output crosses back.
  */
final class RemoteServer(spark: SparkSession, warehouse: String,
    port: Int = 0, allowAnonymous: Boolean = false,
    tokenTtlMs: Long = 60L * 60 * 1000,
    tlsKeystore: Option[(String, String)] = None) {

  private val session = spark.newSession()
  private val engine = graft.GraftEngine(session, warehouse)
  engine.restore()

  // `tlsKeystore` = (path, password) of a JKS/PKCS12 keystore holding
  // the server identity: every accepted connection is then TLS — the
  // handshake's credentials and the result stream ride encrypted (the
  // reference's ATTACH `tls` option, beacon_parser.rs:465). A
  // plaintext client against a TLS server fails its first frame read.
  private val server: ServerSocket = tlsKeystore match {
    case None => new ServerSocket(port)
    case Some((path, password)) =>
      val ks = java.security.KeyStore.getInstance(
        if (path.endsWith(".jks")) "JKS" else "PKCS12")
      val ksIn = new java.io.FileInputStream(path)
      try ks.load(ksIn, password.toCharArray) finally ksIn.close()
      val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
        javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
      kmf.init(ks, password.toCharArray)
      val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
      ctx.init(kmf.getKeyManagers, null, null)
      ctx.getServerSocketFactory.createServerSocket(port)
  }
  def boundPort: Int = server.getLocalPort

  // token -> (username, expiresAt). Tokens are TTL'd (the reference's
  // Flight tokens expire; an unbounded lifetime map would grow with
  // every basic handshake on a long-lived server) and revoked lazily:
  // expired entries fail lookup and are swept opportunistically.
  private final case class TokenInfo(user: String, expiresAt: Long)
  private val tokens = new ConcurrentHashMap[String, TokenInfo]()
  // one live token per user, reused across handshakes — executor scan
  // tasks re-handshaking must not each mint a fresh entry
  private val userTokens = new ConcurrentHashMap[String, String]()
  // observable cost of the password path: each increment is one PBKDF2
  // derivation (specs pin that executor scans reuse the session token
  // instead of re-running it per task)
  private val pbkdf2Checks = new java.util.concurrent.atomic.AtomicLong(0)
  def pbkdf2Count: Long = pbkdf2Checks.get
  def liveTokenCount: Int = { sweepExpired(); tokens.size }
  @volatile private var running = true

  private def daemon(r: Runnable): Thread = {
    val t = new Thread(r); t.setDaemon(true); t
  }
  private val pool = Executors.newCachedThreadPool(daemon(_))

  private def now(): Long = System.currentTimeMillis()

  private def sweepExpired(): Unit = {
    val t = now()
    val it = tokens.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue.expiresAt <= t) {
        userTokens.remove(e.getValue.user, e.getKey)
        it.remove()
      }
    }
  }

  private def lookupToken(t: String): Option[String] =
    Option(tokens.get(t)) match {
      case Some(info) if info.expiresAt > now() => Some(info.user)
      case Some(info) =>
        tokens.remove(t); userTokens.remove(info.user, t); None
      case None => None
    }

  // plan-time FILE-LIST snapshots for EXTERNAL tables: split tickets
  // need an immutable file list, and an external dir has no commit
  // log to pin — so `table_version` takes a sorted listing at plan
  // time, parks it under a TTL'd snapshot id, and every ticket of the
  // scan redeems the SAME id (a file added mid-scan is invisible to
  // every ticket; a file deleted mid-scan fails the read loudly
  // rather than silently shrinking one ticket).
  private final case class ScanSnapshot(table: String, shape: String,
      files: Seq[String], expiresAt: Long)
  private val snapshots = new ConcurrentHashMap[String, ScanSnapshot]()
  def liveSnapshotCount: Int = { sweepSnapshots(); snapshots.size }

  private def sweepSnapshots(): Unit = {
    val t = now()
    val it = snapshots.entrySet().iterator()
    while (it.hasNext) if (it.next().getValue.expiresAt <= t) it.remove()
  }

  // prepared statements: handle → (identity, sql text, TTL). Nothing
  // executes at prepare; execute_prepared re-runs the full sqlAs
  // lifecycle with the bound params, so grants revoked between
  // prepare and execute still deny.
  private final case class PreparedStmt(user: String, sql: String,
      expiresAt: Long)
  private val prepared = new ConcurrentHashMap[String, PreparedStmt]()
  def livePreparedCount: Int = { sweepPrepared(); prepared.size }

  private def sweepPrepared(): Unit = {
    val t = now()
    val it = prepared.entrySet().iterator()
    while (it.hasNext) if (it.next().getValue.expiresAt <= t) it.remove()
  }

  /** wire bind-parameter value: scalar JSON maps to its natural type;
    * temporal values arrive TAGGED — `{"t": "timestamp", "v":
    * "2024-01-01T12:00:00Z"}` (instant) or `{"t": "date", "v":
    * "2024-01-01"}` — because JSON has no temporal scalar and a bare
    * string must stay a string */
  private def wireParam(j: JValue): Any = j match {
    case JString(s)  => s
    case JInt(i)     =>
      // a BigInt wider than Long must fail loudly, not wrap negative
      if (i.isValidLong) i.longValue
      else throw new IllegalArgumentException(s"integer param out of range: $i")
    case JLong(l)    => l
    case JDouble(d)  => d
    case JDecimal(d) => d.bigDecimal
    case JBool(b)    => b
    case JNull       => null
    case o: JObject => (RemoteWire.str(o, "t"), RemoteWire.str(o, "v")) match {
      case (Some("timestamp"), Some(v))     => java.time.Instant.parse(v)
      case (Some("timestamp_ntz"), Some(v)) => java.time.LocalDateTime.parse(v)
      case (Some("date"), Some(v))          => java.time.LocalDate.parse(v)
      case _ => throw new IllegalArgumentException(
        s"bad typed param (want {t: timestamp|timestamp_ntz|date, v: ...}): $o")
    }
    case other => throw new IllegalArgumentException(s"bad param: $other")
  }

  /** the pinnable parquet file list of an EXTERNAL parquet table
    * (empty for every other shape — the caller then answers no pin) */
  /** committed parquet leaves under one root: hidden segments
    * (`_temporary` staging, `.`-prefixed markers) are SKIPPED — an
    * in-flight write's staged part files must never enter a pinned
    * file list (a ticket would read uncommitted rows, or crash after
    * the commit renames them away) */
  private def parquetLeaves(root: String): Seq[String] = {
    val prefix = root.stripSuffix("/") + "/"
    graft.sources.io.ByteStore.walkFiles(root).filter { f =>
      f.endsWith(".parquet") &&
        !f.stripPrefix(prefix).split('/').exists(seg =>
          seg.startsWith("_") || seg.startsWith("."))
    }
  }

  private def externalParquetFiles(
      d: graft.catalog.GraftCatalog.TableDef): Seq[String] =
    if (d.kind != "external" || !d.format.exists(_.equalsIgnoreCase("parquet")))
      Seq.empty
    else d.paths.flatMap(parquetLeaves).sorted

  /** a BUCKETED managed table's data location (session catalog — the
    * bucketed layout is unversioned, so its pin is a file-list
    * snapshot like an external's). The catalog answers a URI (percent-
    * encoded); ByteStore walks decoded paths — convert via the URI
    * API, not string surgery. */
  private def bucketedLocation(name: String): String = {
    val uri = session.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(name)).location
    uri.getScheme match {
      case null   => uri.getPath
      case "file" => java.nio.file.Paths.get(uri).toString
      case _      => uri.toString
    }
  }

  private def bucketedParquetFiles(name: String): Seq[String] =
    parquetLeaves(bucketedLocation(name)) // walkFiles is already sorted

  /** admin path: mint a bearer token for a user without their password
    * (the reference's out-of-band PAT issuance — server-side only) */
  def issueToken(username: String): String = {
    sweepExpired()
    val t = java.util.UUID.randomUUID().toString
    tokens.put(t, TokenInfo(username, now() + tokenTtlMs))
    t
  }

  /** token for a basic handshake: reuse the user's live token so N
    * handshakes (e.g. one per executor scan task) hold ONE entry */
  private def sessionTokenFor(username: String): String = {
    Option(userTokens.get(username))
      .filter(t => lookupToken(t).contains(username))
      .getOrElse {
        val t = issueToken(username)
        userTokens.put(username, t)
        t
      }
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
        case Some("table_version") =>
          // split-ticket version pinning: the client resolves the
          // table's current version ONCE at plan time and embeds it in
          // every ticket, so the N tickets of one scan carve the SAME
          // immutable file list even if a commit lands mid-scan
          authorizedTable(identity, req) // RBAC + existence
          val name = RemoteWire.str(req, "table").get
          val v = graft.catalog.TableVersions.latest(warehouse, name)
            .map(_.version)
          // external parquet tables and BUCKETED managed tables have
          // no commit log — pin a TTL'd file-list snapshot instead
          // (same plan-once, redeem-per-ticket shape as the managed
          // version pin)
          val snap: Option[String] =
            if (v.isDefined) None
            else {
              val d = authorizedDef(identity, name)
              val (shape, files) =
                if (d.kind == "external") ("external", externalParquetFiles(d))
                else if (d.kind == "managed" && d.options.contains("bucket_cols"))
                  ("bucketed", bucketedParquetFiles(name))
                else ("other", Seq.empty[String])
              if (files.isEmpty) None
              else {
                sweepSnapshots()
                // reuse a live snapshot of the identical list (a client
                // planning loop must not accumulate server heap), with
                // a fresh TTL window for the new scan; cap the rest
                // like the prepared-statement map
                val t0 = now()
                val reuse = {
                  val it = snapshots.entrySet().iterator()
                  var found: Option[String] = None
                  while (found.isEmpty && it.hasNext) {
                    val e = it.next()
                    val s0 = e.getValue
                    if (s0.table == name && s0.shape == shape &&
                        s0.expiresAt > t0 && s0.files == files)
                      found = Some(e.getKey)
                  }
                  found
                }
                // the refresh can race a concurrent sweep: if the entry
                // vanished between the find and the computeIfPresent
                // (null result), fall through and mint a fresh id
                // rather than handing the client a dead snapshot
                val refreshed = reuse.filter(id =>
                  snapshots.computeIfPresent(id,
                    (_, s0) => s0.copy(expiresAt = now() + tokenTtlMs)) != null)
                refreshed match {
                  case Some(id) => Some(id)
                  case None =>
                    require(snapshots.size < 4096,
                      "too many live scan snapshots; retry after in-flight scans drain")
                    val id = java.util.UUID.randomUUID().toString
                    snapshots.put(id,
                      ScanSnapshot(name, shape, files, now() + tokenTtlMs))
                    Some(id)
                }
              }
            }
          RemoteWire.writeFrame(out, ("ok" -> true) ~
            ("version" -> v.map(JLong(_)).getOrElse(JNothing: JValue)) ~
            ("snapshot" -> snap.map(JString(_)).getOrElse(JNothing: JValue)))
        case Some("scan") =>
          // range tickets (part/parts): for a plain scan of an
          // unbucketed, unpartitioned MANAGED table, a ticket is a
          // FILE subset (index mod parts over the current version's
          // sorted parquet files) — each ticket reads only its files,
          // so the N parallel streams cost ~1× total server work; any
          // other shape falls back to the hash-mod row filter below
          // (each ticket re-scans but stays disjoint by construction).
          val ticket = (intField(req, "part"), intField(req, "parts")) match {
            case (Some(p), Some(n)) =>
              require(n >= 2 && p >= 0 && p < n, s"bad split ticket $p/$n")
              require((req \ "aggregate") == JNothing &&
                (req \ "orderby") == JNothing && (req \ "limit") == JNothing,
                "split tickets apply only to plain scans")
              Some((p, n))
            case _ => None
          }
          val noJoin = (req \ "joins") == JNothing && (req \ "join") == JNothing
          val pinned: Option[(DataFrame, Boolean)] = ticket match {
            case Some((p, n)) if noJoin => fileSplitBase(identity, req, p, n)
            case _ => None
          }
          val base = pinned.map(_._1).getOrElse(authorizedTable(identity, req))
          // true = the file subset already IS the ticket; false = the
          // hash-mod filter below still carves it (over the pinned
          // snapshot when one was resolved)
          val ticketCarved = pinned.exists(_._2)
          // same-peer joins pushed across the wire: the server joins
          // each additional authorized table (left-to-right fold — an
          // N-way chain arrives as N-1 specs) before anything else
          // applies, so filters/aggregates/TopN below all see the
          // joined frame and only the join OUTPUT crosses the network
          // (the reference runs same-remote joins ON the remote —
          // remote-tables.md:41)
          val df0 = (req \ "joins") match {
            case JArray(specs) =>
              specs.foldLeft(base)((acc, j) => applyJoin(identity, acc, j))
            case _ => (req \ "join") match { // single-spec legacy shape
              case j: JObject => applyJoin(identity, base, j)
              case _ => base
            }
          }
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
          // hash-mod FALLBACK ticket: part i of n holds the rows whose
          // projected-row hash ≡ i (mod n) — deterministic, disjoint,
          // union = the whole scan; skipped when the file-split base
          // above already carved the ticket out of the file list.
          val ticketed = (if (ticketCarved) None else ticket) match {
            case Some((part, parts)) =>
              import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
              // hash only HASHABLE columns (xxhash64 rejects maps) —
              // still a valid disjoint partition of the rows, every
              // ticket applies the identical function; a schema with
              // no hashable column degenerates to ticket 0 carrying
              // everything (correct union, just unbalanced)
              def hashable(t: org.apache.spark.sql.types.DataType): Boolean =
                t match {
                  case _: org.apache.spark.sql.types.MapType => false
                  case s: org.apache.spark.sql.types.StructType =>
                    s.fields.forall(f => hashable(f.dataType))
                  case a: org.apache.spark.sql.types.ArrayType =>
                    hashable(a.elementType)
                  case _ => true
                }
              val hashCols = limited.schema.fields
                .filter(f => hashable(f.dataType)).map(f => limited(f.name))
              val ticketKey =
                if (hashCols.isEmpty) lit(0L) else xxhash64(hashCols: _*)
              limited.where(pmod(ticketKey, lit(parts.toLong)) === lit(part.toLong))
            case _ => limited
          }
          streamResult(out, ticketed)
        case Some("sql") =>
          val sql = RemoteWire.str(req, "sql").getOrElse(
            throw new IllegalArgumentException("sql op needs 'sql'"))
          // `$1..$n` bind parameters as TYPED JSON literals (closed
          // vocabulary, same no-splicing stance as the filter
          // algebra): values bind through the engine's parameterized
          // path, so a quote in a string value is data, not SQL
          val params: Seq[Any] = (req \ "params") match {
            case JArray(ps) => ps.map(wireParam)
            case JNothing   => Nil
            case other => throw new IllegalArgumentException(
              s"'params' must be an array, got $other")
          }
          streamResult(out, engine.sqlAs(identity, sql, params))
        case Some("prepare") =>
          // prepared statements (the reference's Flight SQL
          // CreatePreparedStatement: handle + TTL —
          // beacon-server/src/flight_sql/service.rs): the statement
          // TEXT parks server-side under a handle; nothing executes at
          // prepare, but a statement the identity could never run
          // fails HERE (early error, the Flight contract). Handles are
          // identity-bound: another user's execute is rejected.
          val sql = RemoteWire.str(req, "sql").getOrElse(
            throw new IllegalArgumentException("prepare needs 'sql'"))
          // the Flight CreatePreparedStatement contract (r12): prepare
          // answers the RESULT SCHEMA so clients can plan decoding
          // before execute — analysis only, nothing runs. For regular
          // users the schema path doubles as the denylist guard (parse
          // with markers rewritten so `$n` text parses; a statement the
          // identity could never run fails HERE, the early-error
          // contract); a super-user's engine statements (non-Spark
          // syntax) park schema-less, permissive as before.
          val schemaOpt: Option[org.apache.spark.sql.types.StructType] =
            if (!identity.isSuperUser) {
              if (graft.sql.Statements.recognizes(sql))
                throw new graft.auth.Authz.PermissionDenied(
                  "permission denied: engine statements require super-user " +
                    s"(user ${identity.name})")
              Some(engine.prepareSchemaAs(identity, sql))
            } else if (graft.sql.Statements.recognizes(sql)) None
            else scala.util.Try(engine.prepareSchemaAs(identity, sql)).toOption
          sweepPrepared()
          // bounded: the map holds caller-supplied text for the full
          // TTL — without a cap a prepare loop accumulates heap until
          // expiry. Capped per identity too: one user filling the
          // global bound must not block every OTHER user's prepare.
          val mine = {
            val it = prepared.values().iterator()
            var n = 0
            while (it.hasNext) { if (it.next().user == identity.name) n += 1 }
            n
          }
          require(mine < 64,
            s"too many live prepared statements for ${identity.name} " +
              "(max 64); close some or let them expire")
          require(prepared.size < 1024,
            "too many live prepared statements; close some or let them expire")
          val h = java.util.UUID.randomUUID().toString
          prepared.put(h, PreparedStmt(identity.name, sql, now() + tokenTtlMs))
          val schemaJson: JValue = schemaOpt match {
            case Some(st) => JArray(st.fields.toList.map(f =>
              ("name" -> f.name) ~ ("type" -> f.dataType.catalogString) ~
                ("nullable" -> f.nullable)))
            case None => JNothing
          }
          RemoteWire.writeFrame(out, ("ok" -> true) ~ ("handle" -> h) ~
            ("ttl_ms" -> JLong(tokenTtlMs)) ~ ("schema" -> schemaJson))
        case Some("execute_prepared") =>
          val h = RemoteWire.str(req, "handle").getOrElse(
            throw new IllegalArgumentException("execute_prepared needs 'handle'"))
          val p = Option(prepared.get(h)).filter(_.expiresAt > now())
            .getOrElse(throw new IllegalArgumentException(
              "prepared statement is gone (closed or expired)"))
          require(p.user == identity.name,
            "prepared statement belongs to a different identity")
          val params: Seq[Any] = (req \ "params") match {
            case JArray(ps) => ps.map(wireParam)
            case JNothing   => Nil
            case other => throw new IllegalArgumentException(
              s"'params' must be an array, got $other")
          }
          streamResult(out, engine.sqlAs(identity, p.sql, params))
        case Some("close_prepared") =>
          val h = RemoteWire.str(req, "handle").getOrElse(
            throw new IllegalArgumentException("close_prepared needs 'handle'"))
          // identity-bound like execute: another user who learned the
          // handle string must not be able to destroy it
          Option(prepared.get(h)).foreach { p =>
            require(p.user == identity.name,
              "prepared statement belongs to a different identity")
            prepared.remove(h)
          }
          RemoteWire.writeFrame(out, ("ok" -> true))
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
          lookupToken(t) match {
            case Some(user) => Right((engine.catalog.auth.identityOf(user), None))
            case None => Left("invalid or expired token")
          }
        case (None, Some(u), Some(p)) =>
          pbkdf2Checks.incrementAndGet()
          engine.authenticate(u, p) match {
            case Some(id) => Right((id, Some(sessionTokenFor(u))))
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
  private def authorizedTable(identity: Auth.AuthIdentity, req: JValue): DataFrame =
    authorizedTableByName(identity, RemoteWire.str(req, "table").getOrElse(
      throw new IllegalArgumentException("op needs 'table'")))

  /** THE security gate every table access shares (scan, schema, join
    * sides, split tickets): existence, non-crawler, SELECT grant —
    * one definition so an authorization change cannot miss a path */
  private def authorizedDef(identity: Auth.AuthIdentity,
      name: String): graft.catalog.GraftCatalog.TableDef = {
    val d = engine.catalog.tables()
      .find(t => t.name == name && t.kind != "crawler").getOrElse(
        throw new IllegalArgumentException(s"no such table: $name"))
    val allowed = identity.isSuperUser || engine.catalog.auth.isAllowed(
      identity.roles, "SELECT", Auth.Target.Table(name))
    if (!allowed)
      throw new graft.auth.Authz.PermissionDenied(
        s"remote permission denied: SELECT on TABLE $name")
    d
  }

  private def authorizedTableByName(identity: Auth.AuthIdentity,
      name: String): DataFrame = {
    authorizedDef(identity, name)
    session.table(name)
  }

  private def intField(j: JValue, field: String): Option[Int] = (j \ field) match {
    case JInt(n)  => Some(n.intValue)
    case JLong(n) => Some(n.toInt)
    case _        => None
  }

  /** observable for specs: scans served by file-granular tickets */
  private val fileSplitServed = new java.util.concurrent.atomic.AtomicLong(0)
  def fileSplitCount: Long = fileSplitServed.get

  /** version-pinned ticket base. When the client pinned a version at
    * plan time, EVERY ticket of the scan serves that immutable
    * version, whatever shape the table is:
    *  - plain (unbucketed, unpartitioned) managed: (df, true) — the
    *    ticket is carved as the FILE subset index ≡ part (mod parts)
    *    of the version's sorted parquet list (each file read by
    *    exactly one ticket, N streams ≈ one scan of server work); the
    *    schema comes from the version's OWN files, so a mid-scan
    *    schema-changing commit cannot null out columns;
    *  - any other managed shape: (tableAt(version), false) — the
    *    caller's hash-mod filter still carves the ticket, but over
    *    the SAME snapshot for every ticket, so a commit landing
    *    mid-scan cannot make the union a cross-version mixture.
    * None = no pin (older client / non-versioned table) — the caller
    * hash-mod filters the live relation, the documented
    * approximation. */
  private def fileSplitBase(identity: Auth.AuthIdentity, req: JValue,
      part: Int, parts: Int): Option[(DataFrame, Boolean)] = {
    val name = RemoteWire.str(req, "table").getOrElse(
      throw new IllegalArgumentException("op needs 'table'"))
    // EXTERNAL table: redeem the plan-time file-list snapshot — the
    // ticket serves exactly the files the plan saw, whatever has
    // landed in the directory since
    (req \ "snapshot") match {
      case JString(id) =>
        val d = authorizedDef(identity, name)
        val snap = Option(snapshots.get(id)).filter(_.expiresAt > now())
          .getOrElse(throw new IllegalArgumentException(
            s"pinned scan snapshot of $name is gone (expired mid-scan?)"))
        // each redemption refreshes the TTL: a long-queued parallel
        // scan keeps its snapshot alive by USING it, while an abandoned
        // snapshot (planned, never redeemed) still sweeps at the
        // original deadline
        snapshots.computeIfPresent(id,
          (_, s0) => s0.copy(expiresAt = now() + tokenTtlMs))
        require(snap.table == name,
          s"scan snapshot was taken for '${snap.table}', not '$name'")
        // a DDL swap mid-scan (drop + recreate as a different shape)
        // must fail loudly, never serve the OLD incarnation's files
        val shapeNow =
          if (d.kind == "external") "external"
          else if (d.kind == "managed" && d.options.contains("bucket_cols"))
            "bucketed"
          else "other"
        require(snap.shape == shapeNow,
          s"$name changed shape since the scan was planned " +
            s"(was ${snap.shape}, now $shapeNow)")
        fileSplitServed.incrementAndGet()
        // hive dir layouts (hive-partitioned externals; partitioned+
        // bucketed managed): partition columns live in the key=value
        // dir names — group the ticket's files by their root and read
        // with that root as basePath (the registered table's schema is
        // authoritative), like the partitioned-managed path
        if (d.options.get("hive_partitioned").contains("true"))
          return Some((groupedBasePathFrame(session.table(name).schema,
            snap.files, d.paths, part, parts), true))
        if (d.options.contains("bucket_cols") &&
            d.options.contains("partition_cols"))
          return Some((groupedBasePathFrame(session.table(name).schema,
            snap.files, Seq(bucketedLocation(name)), part, parts), true))
        return Some((fileSubsetFrame(id, snap.files, part, parts), true))
      case _ => ()
    }
    val version = (req \ "version") match {
      case JInt(v)  => v.longValue
      case JLong(v) => v
      case _        => return None
    }
    val d = authorizedDef(identity, name)
    if (d.kind != "managed") return None
    val e = graft.catalog.TableVersions.get(warehouse, name, version)
      .getOrElse(throw new IllegalArgumentException(
        s"pinned version $version of $name is gone (VACUUMed mid-scan?)"))
    // bucketed tables are unversioned (their pin is a file-list
    // SNAPSHOT, handled above) — a version against one means a stale
    // log; serve the pinned frame with hash-mod, defensively
    if (d.options.contains("bucket_cols"))
      return Some((engine.catalog.tableAt(name, version), false))
    val files = graft.catalog.TableVersions.parquetFiles(warehouse, name, e)
    if (files.isEmpty)
      return Some((engine.catalog.tableAt(name, version), false))
    fileSplitServed.incrementAndGet()
    // PARTITIONED managed tables: the partition columns live in the
    // hive dir names UNDER each commit dir, so a raw file-path read
    // would lose them — read each ticket's files grouped by commit
    // dir with that dir as basePath (Spark re-derives the partition
    // values from the path segments below it), under the version's
    // authoritative schema, and union the groups. Still one file per
    // ticket of server work; the union is a metadata concat.
    if (d.options.contains("partition_cols")) {
      val schema = engine.catalog.tableAt(name, version).schema
      val dirs = graft.catalog.TableVersions.dataDirs(warehouse, name, e)
      return Some((groupedBasePathFrame(schema, files, dirs, part, parts), true))
    }
    // the memo key carries the version's commit timestamp: a table
    // dropped and recreated restarts its version numbers, and a bare
    // name@version key would then serve the OLD incarnation's schema
    Some((fileSubsetFrame(s"$name@$version@${e.tsMs}", files, part, parts), true))
  }

  /** ticket `part` of `parts` over a pinned file list whose partition
    * columns live in hive dir names: group the ticket's files by
    * their owning root (commit dir / registered root — boundary-exact
    * prefix match) and read each group with that root as `basePath`
    * under the authoritative schema, so Spark re-derives the
    * dir-encoded partition values; groups union as a metadata concat.
    * Shared by the partitioned-managed and hive-external ticket
    * paths. */
  private def groupedBasePathFrame(
      schema: org.apache.spark.sql.types.StructType, files: Seq[String],
      roots: Seq[String], part: Int, parts: Int): DataFrame = {
    val mine = files.zipWithIndex.collect { case (f, i) if i % parts == part => f }
    if (mine.isEmpty)
      return session.createDataFrame(
        session.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val grouped = mine.groupBy { f =>
      roots.find(r => f.startsWith(r.stripSuffix("/") + "/")).getOrElse(
        throw new IllegalStateException(s"file $f outside every root"))
    }
    grouped.toSeq.sortBy(_._1).map { case (root, fs) =>
      session.read.schema(schema).option("basePath", root).parquet(fs: _*)
        .select(schema.fieldNames.toIndexedSeq
          .map(org.apache.spark.sql.functions.col): _*)
    }.reduce(_ unionByName _)
  }

  // memoized pinned-list schemas: a pin's file list is immutable, so
  // the merged-footer schema is resolved ONCE per pin — not re-inferred
  // by every ticket (an O(all footers) pass × parts otherwise).
  // Access-order LRU capped at 512: inserting the 513th pin evicts
  // exactly the least-recently-USED entry, so live scans' memos
  // survive a burst of new pins (the old clear()-at-512 dropped every
  // live memo at once — a thundering herd of footer re-reads)
  private val pinnedSchemas =
    new java.util.LinkedHashMap[String, org.apache.spark.sql.types.StructType](
      64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, org.apache.spark.sql.types.StructType])
          : Boolean = size > 512
    }

  private def pinnedSchemaFor(pinKey: String,
      files: Seq[String]): org.apache.spark.sql.types.StructType = {
    val hit = pinnedSchemas.synchronized(Option(pinnedSchemas.get(pinKey)))
    hit.getOrElse {
      // infer OUTSIDE the lock (a footer pass can take seconds; a
      // racing duplicate inference is deterministic and harmless)
      val s = session.read.option("mergeSchema", "true").parquet(files: _*).schema
      pinnedSchemas.synchronized(pinnedSchemas.put(pinKey, s))
      s
    }
  }

  /** ticket `part` of `parts` over a pinned file list: index ≡ part
    * (mod parts). Every ticket resolves the SAME schema — the
    * super-type of the FULL pinned list, memoized per pin key — so
    * heterogeneous per-file schemas can't make one ticket miss a
    * column another serves; a ticket with no files still answers an
    * empty frame in that schema (more tickets than files). */
  private def fileSubsetFrame(pinKey: String, files: Seq[String], part: Int,
      parts: Int): DataFrame = {
    val mine = files.zipWithIndex.collect { case (f, i) if i % parts == part => f }
    val pinnedSchema = pinnedSchemaFor(pinKey, files)
    if (mine.isEmpty)
      session.createDataFrame(
        session.sparkContext.emptyRDD[org.apache.spark.sql.Row], pinnedSchema)
    else session.read.schema(pinnedSchema).parquet(mine: _*)
  }

  /** pushed same-peer equi-join — closed vocabulary ({table2, on
    * pairs, type}), no SQL text; the SECOND table is authorized with
    * exactly the same rule as the first, so a join can never read a
    * table the identity's scan grants don't cover */
  private def applyJoin(identity: Auth.AuthIdentity, left: DataFrame,
      spec: JValue): DataFrame = {
    val t2 = RemoteWire.str(spec, "table2").getOrElse(
      throw new IllegalArgumentException("join needs 'table2'"))
    val right = authorizedTableByName(identity, t2)
    val joinType = RemoteWire.str(spec, "type").getOrElse("inner") match {
      case "inner" => "inner"
      case "left"  => "left_outer"
      case other => throw new IllegalArgumentException(s"bad join type: $other")
    }
    val on = (spec \ "on") match {
      case JArray(pairs) if pairs.nonEmpty => pairs.map {
        case JArray(List(JString(l), JString(r))) => (l, r)
        case other => throw new IllegalArgumentException(s"bad join pair: $other")
      }
      case _ => throw new IllegalArgumentException("join needs non-empty 'on'")
    }
    // right-side filters apply BEFORE the join (left-outer
    // null-extension must see the filtered right side, exactly as the
    // client plan placed them)
    val right2 = (spec \ "filters2") match {
      case JArray(fs) if fs.nonEmpty =>
        right.where(fs.map(RemoteWire.filterFromJson).reduce(_ && _))
      case _ => right
    }
    val cond = on.map { case (l, r) => left.col(l) === right2.col(r) }
      .reduce(_ && _)
    left.join(right2, cond, joinType)
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

  /** Header frame, Arrow IPC stream, then a completion RECEIPT frame
    * after the Arrow end-of-stream marker. The receipt is what lets the
    * client trust EOS: if the Spark job feeding the stream dies midway,
    * [[ArrowSource.writeIpcStream]] skips the EOS marker (the client's
    * Arrow reader fails on the truncated stream) — and a clean EOS with
    * no `{ok,rows}` receipt behind it is likewise treated as a failure,
    * so a partial result can never masquerade as a short success. */
  private def streamResult(out: java.io.OutputStream, df: DataFrame): Unit = {
    RemoteWire.writeFrame(out,
      ("ok" -> true) ~ ("stream" -> true) ~ ("schema" -> df.schema.json))
    val rows = ArrowSource.writeIpcStream(df, out)
    RemoteWire.writeFrame(out, ("ok" -> true) ~ ("rows" -> rows))
    out.flush()
  }
}
