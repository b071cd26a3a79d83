package graft.remote

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowStreamReader
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expression, FieldReference, NamedReference}
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnVector, ColumnarBatch}
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

import graft.catalog.Attachments.{Basic, Bearer, Credential}

/** where a remote scan dials: host/port plus the TLS client settings
  * (serializable — every executor task opens its own connection) */
final case class WireTarget(host: String, port: Int,
    tls: Option[RemoteWire.TlsClientConfig]) extends Serializable {
  def address: String = s"$host:$port"
}

/** a same-peer equi-join pushed across the wire as part of the scan
  * request (the reference runs a join of two tables on one remote ON
  * the remote — docs/docs/2.0.0-rc2/sql/remote-tables.md:41-42,
  * beacon-datafusion-ext/src/remote/executor.rs "largest sub-plan");
  * closed vocabulary like the filter algebra: table name + column
  * pairs + join type, never SQL text. `rightFilters` apply to the
  * right table BEFORE the join — the placement that keeps a left
  * outer join's null-extension exactly as the client plan had it. */
final case class RemoteJoinSpec(rightTable: String,
    on: Seq[(String, String)], joinType: String,
    rightFilters: List[JValue] = Nil) extends Serializable {
  def toJson: JValue = JObject(
    List(
      "table2" -> JString(rightTable),
      "on" -> (JArray(on.map { case (l, r) =>
        JArray(List(JString(l), JString(r))) }.toList): JValue),
      "type" -> JString(joinType)) ++
    (if (rightFilters.nonEmpty)
      List("filters2" -> (JArray(rightFilters): JValue)) else Nil))
}

/** DSv2 seat of one table on an ATTACHed network peer: the scan ships
  * required columns, serializable filters ([[RemoteWire]] algebra) and
  * any pushed limit to the server, which plans them into ITS scan —
  * so predicate pushdown crosses the wire exactly like the reference's
  * "largest sub-plan pushed to the remote" (remote/executor.rs), and
  * what comes back is only the surviving bytes as one Arrow IPC
  * stream. Filters the algebra can't express are returned to Spark
  * and evaluated client-side after the scan — narrowed, never wrong.
  *
  * The reader is columnar: each IPC record batch's vectors wrap
  * directly as [[ArrowColumnVector]]s (zero value conversion, same
  * stance as the arrow file source) and feed WholeStageCodegen through
  * ColumnarToRow.
  *
  * `joins` non-empty = this relation IS a same-peer join chain
  * (placed by [[graft.plans.RemoteJoinRule]], one spec per merged
  * join, folded left-to-right server-side): the server joins every
  * authorized table and everything pushed (filters/columns/
  * aggregates/TopN) applies to the joined frame — only the join
  * OUTPUT crosses the network.
  */
final class RemoteTable(val target: WireTarget, val credential: Credential,
    val sessionToken: Option[String], val table: String, fullSchema: StructType,
    val parallelism: Int = 1, val joins: List[RemoteJoinSpec] = Nil,
    val baseFilters: List[JValue] = Nil,
    allNames: Option[Seq[String]] = None,
    baseNames: Option[Seq[String]] = None) extends Table with SupportsRead {

  /** FULL column-name inventory of every participating table — the
    * server joins whole tables, so join-merge collision checks must
    * run over these, not over pruned client outputs. For a plain
    * table this is its schema; a merged relation carries the union
    * its builder recorded. */
  def participantColumns: Seq[String] =
    allNames.getOrElse(fullSchema.fieldNames.toSeq)

  /** column names of the chain's BASE (leftmost) table — the schema
    * itself for a plain table; a merged relation preserves its
    * builder's record. The join-merge rule needs this to place a
    * bushy top join: its condition must land on the right chain's
    * base, because that spec folds before the chain's own specs. */
  def baseColumns: Seq[String] =
    baseNames.getOrElse(fullSchema.fieldNames.toSeq)

  override def name(): String =
    s"remote(${target.address}/$table${joins.map("⋈" + _.rightTable).mkString})"
  override def schema(): StructType = fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RemoteScanBuilder(target, credential, sessionToken, table, fullSchema,
      parallelism, joins, baseFilters)
}

final class RemoteScanBuilder(target: WireTarget, credential: Credential,
    sessionToken: Option[String], table: String, fullSchema: StructType,
    parallelism: Int, joins: List[RemoteJoinSpec],
    baseFilters: List[JValue] = Nil)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit
    with SupportsPushDownTopN with SupportsPushDownAggregates {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var pushedJson: List[JValue] = Nil
  private var limit: Option[Int] = None
  private var topNJson: Option[JValue] = None
  private var aggJson: Option[JValue] = None
  private var aggSchema: Option[StructType] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition(f => RemoteWire.filterToJson(f).isDefined)
    pushed = ok
    pushedJson = ok.flatMap(RemoteWire.filterToJson).toList
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }

  // ---- ORDER BY … LIMIT n across the wire: the server sorts and cuts
  // to n, so only n rows cross the network. Partial-push contract:
  // Spark keeps its own TakeOrdered over the ≤n returned rows (cheap,
  // and immune to any stream-order assumption).
  override def pushTopN(orders: Array[org.apache.spark.sql.connector
      .expressions.SortOrder], l: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{NullOrdering, SortDirection}
    val cols = orders.toSeq.map { o =>
      o.expression() match {
        case f: NamedReference if f.fieldNames.length == 1 =>
          Some(JObject(
            "col" -> JString(f.fieldNames()(0)),
            "asc" -> JBool(o.direction() == SortDirection.ASCENDING),
            "nullsFirst" -> JBool(o.nullOrdering() == NullOrdering.NULLS_FIRST)))
        case _ => None
      }
    }
    if (cols.exists(_.isEmpty)) false
    else {
      topNJson = Some(JObject("orderby" -> JArray(cols.flatten.toList),
        "limit" -> JInt(l)))
      limit = Some(l)
      true
    }
  }

  override def isPartiallyPushed(): Boolean = true

  // ---- GROUP BY across the wire (the reference pushes the largest
  // sub-plan to the remote; group-by is the piece that matters at
  // scale — only one row per group crosses the network). Complete
  // pushdown only: the single-stream scan IS the whole remote result,
  // so the server's full aggregate is final — Spark drops its own
  // Aggregate node above the scan.

  private def colOf(e: Expression): Option[String] = e match {
    case f: NamedReference if f.fieldNames.length == 1 => Some(f.fieldNames()(0))
    case _ => None
  }

  private def fieldType(c: String): Option[DataType] =
    fullSchema.fields.find(_.name == c).map(_.dataType)

  /** translate if every piece is expressible: plain-column groups and
    * count/count(*)/sum/min/max/avg over plain columns */
  private def translate(agg: Aggregation)
      : Option[(Seq[String], Seq[(String, String, Boolean, DataType)])] = {
    val groups = agg.groupByExpressions.toSeq.map(colOf)
    if (groups.exists(_.isEmpty)) return None
    def integral(t: DataType): Boolean = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    def numeric(t: DataType): Boolean = integral(t) ||
      t == FloatType || t == DoubleType
    val aggs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(("count_star", "", false, LongType))
      case c: Count =>
        colOf(c.column).map(col => ("count", col, c.isDistinct, LongType))
      case s: Sum => for {
        col <- colOf(s.column); t <- fieldType(col) if numeric(t)
      } yield ("sum", col, s.isDistinct, if (integral(t)) LongType else DoubleType)
      case a: Avg => for {
        col <- colOf(a.column); t <- fieldType(col) if numeric(t) && !a.isDistinct
      } yield ("avg", col, false, DoubleType)
      case m: Min => for { col <- colOf(m.column); t <- fieldType(col) }
        yield ("min", col, false, t)
      case m: Max => for { col <- colOf(m.column); t <- fieldType(col) }
        yield ("max", col, false, t)
      case _ => None
    }
    if (aggs.exists(_.isEmpty)) None
    else Some((groups.flatten, aggs.flatten))
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translate(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = translate(agg) match {
    case Some((groups, aggs)) =>
      aggJson = Some(JObject(
        "group" -> JArray(groups.map(JString(_)).toList),
        "aggs" -> JArray(aggs.map { case (fn, col, distinct, t) =>
          JObject("fn" -> JString(fn), "col" -> JString(col),
            "distinct" -> JBool(distinct), "type" -> JString(t.catalogString))
        }.toList)))
      // output = group cols (their types) then agg values, positionally
      // — the convention V2ScanRelationPushDown rewrites against
      aggSchema = Some(StructType(
        groups.map(g => StructField(g, fieldType(g).get)) ++
          aggs.zipWithIndex.map { case ((fn, col, _, t), i) =>
            StructField(s"${fn}_${if (col.isEmpty) "star" else col}_$i", t)
          }))
      true
    case None => false
  }

  override def build(): Scan = new RemoteScan(target, credential,
    sessionToken, table, fullSchema, aggSchema.getOrElse(required),
    pushed, baseFilters ++ pushedJson, limit, topNJson, aggJson,
    parallelism, joins)
}

final class RemoteScan(target: WireTarget, credential: Credential,
    sessionToken: Option[String], table: String, fullSchema: StructType,
    required: StructType, val pushed: Array[Filter], val pushedJson: List[JValue],
    val limit: Option[Int], val topNJson: Option[JValue], val aggJson: Option[JValue],
    parallelism: Int, joins: List[RemoteJoinSpec])
    extends Scan with Batch {

  // count(*)-style scans prune to zero columns; the wire still needs a
  // stream that carries row counts, so request the narrowest column
  // and surface batches with no vectors
  private val wireColumns: Seq[String] =
    if (required.fields.nonEmpty) required.fields.map(_.name).toSeq
    else Seq(fullSchema.fields.minBy(_.dataType.defaultSize).name)

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"RemoteScan(${target.address}/$table" +
      joins.map(j => s"⋈${j.rightTable} on ${j.on.map { case (l, r) => s"$l=$r" }
        .mkString(",")}").mkString +
      s") PushedFilters: [${pushed.mkString(", ")}]" +
      limit.map(l => s" PushedLimit: $l").getOrElse("") +
      topNJson.map(t => s" PushedTopN: ${JsonMethods.compact(JsonMethods.render(t))}")
        .getOrElse("") +
      aggJson.map(a => s" PushedAggregation: ${JsonMethods.compact(JsonMethods.render(a))}")
        .getOrElse("")

  override def planInputPartitions(): Array[InputPartition] = {
    // auth for executor tasks: prefer the session token obtained at
    // attach time — shipping raw Basic credentials to every task both
    // spreads a long-lived secret and re-runs the server's PBKDF2 per
    // task; the password rides only as a FALLBACK, used when a cached
    // token outlives a server restart (same retry shape as NetworkPeer)
    val (auth, fallback): (Map[String, String], Map[String, String]) =
      credential match {
        case Bearer(t) => (Map("token" -> t), Map.empty)
        case Basic(u, p) => sessionToken match {
          case Some(t) => (Map("token" -> t), Map("username" -> u, "password" -> p))
          case None    => (Map("username" -> u, "password" -> p), Map.empty)
        }
        case _ => (sessionToken.map("token" -> _).toMap, Map.empty)
      }
    // parallel streams: N hash-mod range tickets, each redeemed as one
    // independent stream (the multi-endpoint shape Flight allows).
    // Only for plain scans — a pushed aggregate/TopN/limit is complete
    // only as a single stream.
    val nParts =
      if (parallelism > 1 && aggJson.isEmpty && topNJson.isEmpty && limit.isEmpty)
        parallelism
      else 1
    // version pinning for file-granular tickets: resolve the managed
    // table's current version — or, for an external parquet table,
    // a server-minted file-list snapshot id — ONCE here, so every
    // ticket carves the same immutable file list even if a commit
    // (or a new file in the external dir) lands mid-scan; a
    // non-pinnable table (or an older server) answers none and the
    // server falls back to hash-mod tickets
    val (pinnedVersion, pinnedSnapshot): (Option[Long], Option[String]) =
      if (nParts > 1 && joins.isEmpty) fetchScanPin(auth, fallback)
      else (None, None)
    (0 until nParts).map { part =>
      val req: JValue = ("op" -> "scan") ~ ("table" -> table) ~
        ("version" -> pinnedVersion.map(JLong(_)).getOrElse(JNothing: JValue)) ~
        ("snapshot" -> pinnedSnapshot.map(JString(_)).getOrElse(JNothing: JValue)) ~
        ("joins" -> (if (joins.isEmpty) JNothing: JValue
          else JArray(joins.map(_.toJson)))) ~
        ("columns" -> (if (aggJson.isDefined) JNothing
          else JArray(wireColumns.map(JString(_)).toList))) ~
        ("filters" -> JArray(pushedJson)) ~
        ("aggregate" -> aggJson.getOrElse(JNothing: JValue)) ~
        ("orderby" -> topNJson.map(_ \ "orderby").getOrElse(JNothing: JValue)) ~
        ("limit" -> limit.map(JInt(_)).getOrElse(JNothing: JValue)) ~
        ("part" -> (if (nParts > 1) JInt(part) else JNothing: JValue)) ~
        ("parts" -> (if (nParts > 1) JInt(nParts) else JNothing: JValue))
      RemoteScanPartition(target, auth, fallback,
        JsonMethods.compact(JsonMethods.render(req)),
        emitColumns = required.fields.nonEmpty): InputPartition
    }.toArray
  }

  /** one control round-trip: the table's current version (managed) or
    * file-list snapshot id (external parquet) — (None, None) for
    * non-pinnable tables, handshake-rejected tokens after exhausting
    * the fallback, or a server without the op */
  private def fetchScanPin(auth: Map[String, String],
      fallback: Map[String, String]): (Option[Long], Option[String]) = {
    val none: (Option[Long], Option[String]) = (None, None)
    def once(creds: Map[String, String]): Option[(Option[Long], Option[String])] = {
      val sock = RemoteWire.connect(target.host, target.port, target.tls)
      try {
        val in = new java.io.BufferedInputStream(sock.getInputStream)
        val out = new java.io.BufferedOutputStream(sock.getOutputStream)
        RemoteWire.writeFrame(out, JObject(("op" -> JString("handshake")) ::
          creds.toList.map { case (k, v) => k -> (JString(v): JValue) }))
        if (!(RemoteWire.readFrame(in) \ "ok").equals(JBool(true))) return None
        RemoteWire.writeFrame(out,
          ("op" -> "table_version") ~ ("table" -> table))
        val resp = RemoteWire.readFrame(in)
        if (!(resp \ "ok").equals(JBool(true))) return Some(none)
        val v = (resp \ "version") match {
          case JInt(x)  => Some(x.longValue)
          case JLong(x) => Some(x)
          case _        => None
        }
        val s = (resp \ "snapshot") match {
          case JString(id) => Some(id)
          case _           => None
        }
        Some((v, s))
      } finally sock.close()
    }
    try {
      val pin = once(auth).orElse(if (fallback.nonEmpty) once(fallback) else None)
        .getOrElse(none)
      if (pin == none)
        // visible downgrade: unpinned tickets fall back to the live
        // hash-mod path (correct for a quiescent table, N× server
        // re-scan, and a mid-scan commit becomes observable)
        System.err.println(s"[graft-remote] no scan pin for '$table' " +
          s"on ${target.address}: split scan proceeds unpinned (hash-mod)")
      pin
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[graft-remote] scan-pin lookup failed for " +
          s"'$table' on ${target.address} (${e.getClass.getSimpleName}: " +
          s"${e.getMessage}): split scan proceeds unpinned (hash-mod)")
        none
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RemoteReaderFactory
}

/** everything an executor task needs to dial the scan itself */
final case class RemoteScanPartition(target: WireTarget,
    auth: Map[String, String], fallbackAuth: Map[String, String],
    requestJson: String, emitColumns: Boolean)
    extends InputPartition

final class RemoteReaderFactory extends PartitionReaderFactory {
  override def supportColumnarReads(p: InputPartition): Boolean = true
  override def createReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] =
    throw new UnsupportedOperationException("remote scan is columnar-only")

  override def createColumnarReader(p0: InputPartition): PartitionReader[ColumnarBatch] = {
    val p = p0.asInstanceOf[RemoteScanPartition]
    new PartitionReader[ColumnarBatch] {
      private var sock: java.net.Socket = _
      private var in: java.io.BufferedInputStream = _
      private val alloc = new RootAllocator()
      private var reader: ArrowStreamReader = _
      private var batch: ColumnarBatch = _
      private var rowsSeen = 0L
      private var receiptVerified = false

      /** one handshake + scan request on a fresh connection;
        * Left(handshake error) is retryable with the fallback */
      private def dial(auth: Map[String, String]): Either[String, Unit] = {
        sock = RemoteWire.connect(p.target.host, p.target.port, p.target.tls)
        in = new java.io.BufferedInputStream(sock.getInputStream)
        val out = new java.io.BufferedOutputStream(sock.getOutputStream)
        val hs: JValue = JObject(("op" -> JString("handshake")) ::
          auth.toList.map { case (k, v) => k -> (JString(v): JValue) })
        RemoteWire.writeFrame(out, hs)
        val hsResp = RemoteWire.readFrame(in)
        if (!(hsResp \ "ok").equals(JBool(true))) {
          try sock.close() catch { case scala.util.control.NonFatal(_) => }
          return Left(RemoteWire.str(hsResp, "error").getOrElse("rejected"))
        }
        RemoteWire.writeFrame(out, JsonMethods.parse(p.requestJson))
        val resp = RemoteWire.readFrame(in)
        if (!(resp \ "ok").equals(JBool(true)))
          throw new RuntimeException("remote scan failed: " +
            RemoteWire.str(resp, "error").getOrElse("unknown"))
        reader = new ArrowStreamReader(in, alloc)
        Right(())
      }

      locally {
        dial(p.auth) match {
          case Right(()) => ()
          case Left(err) if p.fallbackAuth.nonEmpty =>
            // cached session token outlived a server restart: one
            // retry with the basic credentials (NetworkPeer's shape)
            dial(p.fallbackAuth) match {
              case Right(()) => ()
              case Left(e2) =>
                throw new SecurityException(s"remote handshake failed: $e2")
            }
          case Left(err) =>
            throw new SecurityException(s"remote handshake failed: $err")
        }
      }

      override def next(): Boolean = {
        if (!reader.loadNextBatch()) {
          // the Arrow EOS marker alone is not success: require the
          // server's completion receipt behind it, so a job that died
          // mid-stream (no EOS → reader already failed) or a stream
          // cut exactly at EOS (no receipt) can't pass as a short
          // result
          if (!receiptVerified) {
            val receipt = try RemoteWire.readFrame(in) catch {
              case scala.util.control.NonFatal(e) =>
                throw new java.io.IOException(
                  "remote stream ended without a completion receipt " +
                    "(truncated result)", e)
            }
            if (!(receipt \ "ok").equals(JBool(true)))
              throw new java.io.IOException("remote scan failed mid-stream: " +
                RemoteWire.str(receipt, "error").getOrElse("unknown"))
            val expected = (receipt \ "rows") match {
              case JLong(n) => n
              case JInt(n)  => n.longValue
              case _        => -1L
            }
            if (expected >= 0 && expected != rowsSeen)
              throw new java.io.IOException(
                s"remote stream row-count mismatch: receipt says $expected, " +
                  s"stream carried $rowsSeen")
            receiptVerified = true
          }
          return false
        }
        val root = reader.getVectorSchemaRoot
        val vectors: Array[ColumnVector] =
          if (p.emitColumns)
            root.getFieldVectors.asScala
              .map(v => new ArrowColumnVector(v): ColumnVector).toArray
          else Array.empty
        batch = new ColumnarBatch(vectors, root.getRowCount)
        rowsSeen += root.getRowCount
        true
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = {
        if (reader != null) reader.close()
        if (sock != null) sock.close()
        alloc.close()
      }
    }
  }
}
