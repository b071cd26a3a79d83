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
  */
final class RemoteTable(host: String, port: Int, credential: Credential,
    sessionToken: Option[String], table: String, fullSchema: StructType)
    extends Table with SupportsRead {

  override def name(): String = s"remote($host:$port/$table)"
  override def schema(): StructType = fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RemoteScanBuilder(host, port, credential, sessionToken, table, fullSchema)
}

final class RemoteScanBuilder(host: String, port: Int, credential: Credential,
    sessionToken: Option[String], table: String, fullSchema: StructType)
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

  override def build(): Scan = new RemoteScan(host, port, credential,
    sessionToken, table, fullSchema, aggSchema.getOrElse(required),
    pushed, pushedJson, limit, topNJson, aggJson)
}

final class RemoteScan(host: String, port: Int, credential: Credential,
    sessionToken: Option[String], table: String, fullSchema: StructType,
    required: StructType, pushed: Array[Filter], pushedJson: List[JValue],
    limit: Option[Int], topNJson: Option[JValue], aggJson: Option[JValue])
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
    s"RemoteScan($host:$port/$table) PushedFilters: [${pushed.mkString(", ")}]" +
      limit.map(l => s" PushedLimit: $l").getOrElse("") +
      topNJson.map(t => s" PushedTopN: ${JsonMethods.compact(JsonMethods.render(t))}")
        .getOrElse("") +
      aggJson.map(a => s" PushedAggregation: ${JsonMethods.compact(JsonMethods.render(a))}")
        .getOrElse("")

  override def planInputPartitions(): Array[InputPartition] = {
    val req: JValue = ("op" -> "scan") ~ ("table" -> table) ~
      ("columns" -> (if (aggJson.isDefined) JNothing
        else JArray(wireColumns.map(JString(_)).toList))) ~
      ("filters" -> JArray(pushedJson)) ~
      ("aggregate" -> aggJson.getOrElse(JNothing: JValue)) ~
      ("orderby" -> topNJson.map(_ \ "orderby").getOrElse(JNothing: JValue)) ~
      ("limit" -> limit.map(JInt(_)).getOrElse(JNothing: JValue))
    Array(RemoteScanPartition(host, port,
      credential match {
        case Basic(u, p) => Map("username" -> u, "password" -> p)
        case Bearer(t)   => Map("token" -> t)
        case _           => sessionToken.map("token" -> _).toMap
      },
      JsonMethods.compact(JsonMethods.render(req)),
      emitColumns = required.fields.nonEmpty))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RemoteReaderFactory
}

/** everything an executor task needs to dial the scan itself */
final case class RemoteScanPartition(host: String, port: Int,
    auth: Map[String, String], requestJson: String, emitColumns: Boolean)
    extends InputPartition

final class RemoteReaderFactory extends PartitionReaderFactory {
  override def supportColumnarReads(p: InputPartition): Boolean = true
  override def createReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.catalyst.InternalRow] =
    throw new UnsupportedOperationException("remote scan is columnar-only")

  override def createColumnarReader(p0: InputPartition): PartitionReader[ColumnarBatch] = {
    val p = p0.asInstanceOf[RemoteScanPartition]
    new PartitionReader[ColumnarBatch] {
      private val sock = new java.net.Socket(p.host, p.port)
      sock.setTcpNoDelay(true)
      private val in = new java.io.BufferedInputStream(sock.getInputStream)
      private val out = new java.io.BufferedOutputStream(sock.getOutputStream)
      private val alloc = new RootAllocator()
      private var reader: ArrowStreamReader = _
      private var batch: ColumnarBatch = _

      locally {
        val hs: JValue = JObject(("op" -> JString("handshake")) ::
          p.auth.toList.map { case (k, v) => k -> (JString(v): JValue) })
        RemoteWire.writeFrame(out, hs)
        val hsResp = RemoteWire.readFrame(in)
        if (!(hsResp \ "ok").equals(JBool(true)))
          throw new SecurityException("remote handshake failed: " +
            RemoteWire.str(hsResp, "error").getOrElse("rejected"))
        RemoteWire.writeFrame(out, JsonMethods.parse(p.requestJson))
        val resp = RemoteWire.readFrame(in)
        if (!(resp \ "ok").equals(JBool(true)))
          throw new RuntimeException("remote scan failed: " +
            RemoteWire.str(resp, "error").getOrElse("unknown"))
        reader = new ArrowStreamReader(in, alloc)
      }

      override def next(): Boolean = {
        if (!reader.loadNextBatch()) return false
        val root = reader.getVectorSchemaRoot
        val vectors: Array[ColumnVector] =
          if (p.emitColumns)
            root.getFieldVectors.asScala
              .map(v => new ArrowColumnVector(v): ColumnVector).toArray
          else Array.empty
        batch = new ColumnarBatch(vectors, root.getRowCount)
        true
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = {
        if (reader != null) reader.close()
        sock.close()
        alloc.close()
      }
    }
  }
}
