package graft.sources.bbf

import java.util.{Map => JMap}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.{SuperType, UnionByName}

/** `read_bbf` DataSourceV2: ONE scan node per distinct entry schema —
  * not per file — whose partitions span every (file, entry, block)
  * triple sharing that schema. A 10k-file collection therefore plans as
  * a handful of scans unioned once (one per schema shape), and a large
  * entry scans as independent block tasks with no shuffle. The
  * per-block column statistics feed container pruning exactly as the
  * reference's pruning index feeds DataFusion's PruningPredicate
  * (beacon-arrow-bbf/src/datafusion/opener.rs BBFPruningStatistics):
  * every uncertain path fails open, Spark re-applies all filters
  * post-scan, so pruning is an I/O optimization only. Column pruning
  * reads only the projected column chunks (the chunk offsets make each
  * column independently seekable).
  */
class BbfTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spec = BbfScanPlanner.specOf(options)
    val m = spec.members.head
    BbfStore.openCached(m._1).entry(m._2).sparkSchema
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new BbfTable(BbfScanPlanner.specOf(new CaseInsensitiveStringMap(properties)), schema)
  override def supportsExternalMetadata(): Boolean = true
}

/** members: (file path, entry name) pairs, all with the SAME schema */
final case class BbfSpec(members: Seq[(String, String)])

class BbfTable(spec: BbfSpec, schema0: StructType) extends Table with SupportsRead {
  override def name(): String = {
    val m = spec.members
    s"bbf(${m.head._1}#${m.head._2}${if (m.size > 1) s" +${m.size - 1}" else ""})"
  }
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BbfScanBuilder(spec, schema0)
}

class BbfScanBuilder(spec: BbfSpec, fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pushed: Array[sources.Filter] = Array.empty
  private var required: StructType = fullSchema

  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    pushed = filters
    filters // pruning-only pushdown: Spark re-evaluates every filter
  }
  override def pushedFilters(): Array[sources.Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = {
    if (requiredSchema.nonEmpty) required = requiredSchema
  }
  override def build(): Scan = new BbfScan(spec, required, pushed)
}

class BbfScan(spec: BbfSpec, required: StructType, filters: Array[sources.Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    BbfScanPlanner.partitions(spec, filters)
      .map { case (p, e, bi) => BbfPartition(p, e, bi, required): InputPartition }.toArray
  override def createReaderFactory(): PartitionReaderFactory = new BbfReaderFactory
}

final case class BbfPartition(path: String, entry: String, blockIndex: Int,
    required: StructType) extends InputPartition

class BbfReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new BbfPartitionReader(p.asInstanceOf[BbfPartition])

  // one block = one ColumnarBatch: the decoded column arrays copy
  // straight into OnHeapColumnVectors, so scans feed WholeStageCodegen
  // through ColumnarToRow exactly like Spark's vectorized parquet path
  override def supportColumnarReads(p: InputPartition): Boolean = true
  override def createColumnarReader(p0: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val p = p0.asInstanceOf[BbfPartition]
    new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
      private var served = false
      private var batch: org.apache.spark.sql.vectorized.ColumnarBatch = _
      override def next(): Boolean = {
        if (served) return false
        served = true
        batch = BbfColumnar.readBlock(p)
        true
      }
      override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = batch
      override def close(): Unit = if (batch != null) batch.close()
    }
  }
}

private[bbf] object BbfColumnar {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

  def readBlock(p: BbfPartition): ColumnarBatch = {
    val entry = BbfStore.openCached(p.path).entry(p.entry)
    val block = entry.blocks(p.blockIndex)
    val dtypes = entry.schema.toMap
    val n = block.rows
    val vectors: Array[ColumnVector] = p.required.fields.map { f =>
      val v = new OnHeapColumnVector(n, f.dataType)
      block.columns.get(f.name) match {
        case None => v.putNulls(0, n) // column absent from this entry
        case Some(chunk) =>
          val cd = BbfStore.readChunk(p.path, dtypes(f.name), n, chunk)
          var i = 0
          f.dataType match {
            case IntegerType | DateType =>
              while (i < n) { if (cd.valid(i)) v.putInt(i, cd.ints(i)) else v.putNull(i); i += 1 }
            case LongType | TimestampNTZType | TimestampType =>
              while (i < n) { if (cd.valid(i)) v.putLong(i, cd.longs(i)) else v.putNull(i); i += 1 }
            case DoubleType =>
              while (i < n) { if (cd.valid(i)) v.putDouble(i, cd.doubles(i)) else v.putNull(i); i += 1 }
            case BooleanType =>
              while (i < n) { if (cd.valid(i)) v.putBoolean(i, cd.bools(i)) else v.putNull(i); i += 1 }
            case StringType =>
              while (i < n) {
                if (cd.valid(i)) {
                  val b = cd.strs(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
                  v.putByteArray(i, b, 0, b.length)
                } else v.putNull(i)
                i += 1
              }
            case other => throw new IllegalArgumentException(s"bbf columnar type $other")
          }
      }
      v: ColumnVector
    }
    new ColumnarBatch(vectors, n)
  }
}

class BbfPartitionReader(p: BbfPartition) extends PartitionReader[InternalRow] {
  private val rows: Iterator[InternalRow] = {
    val entry = BbfStore.openCached(p.path).entry(p.entry)
    val block = entry.blocks(p.blockIndex)
    val dtypes = entry.schema.toMap
    val nCols = p.required.length
    // decode only the projected columns; a projected column the entry
    // lacks (supercast union across entries) is all-null
    val cols: Array[BbfStore.ColData] = p.required.fields.map { f =>
      block.columns.get(f.name) match {
        case Some(chunk) => BbfStore.readChunk(p.path, dtypes(f.name), block.rows, chunk)
        case None => null
      }
    }
    val n = block.rows
    new Iterator[InternalRow] {
      private var i = 0
      override def hasNext: Boolean = i < n
      override def next(): InternalRow = {
        val out = new GenericInternalRow(nCols)
        var c = 0
        while (c < nCols) {
          val cd = cols(c)
          if (cd == null || !cd.valid(i)) out.setNullAt(c)
          else p.required.fields(c).dataType match {
            case IntegerType | DateType => out.setInt(c, cd.ints(i))
            case LongType | TimestampNTZType | TimestampType => out.setLong(c, cd.longs(i))
            case DoubleType => out.setDouble(c, cd.doubles(i))
            case BooleanType => out.setBoolean(c, cd.bools(i))
            case StringType => out.update(c, UTF8String.fromString(cd.strs(i)))
            case other => throw new IllegalArgumentException(s"bbf read type $other")
          }
          c += 1
        }
        i += 1
        out
      }
    }
  }
  private var cur: InternalRow = _
  override def next(): Boolean = { if (rows.hasNext) { cur = rows.next(); true } else false }
  override def get(): InternalRow = cur
  override def close(): Unit = ()
}

/** driver-side planning: block enumeration + statistics pruning */
object BbfScanPlanner {

  /** members travel as a JSON array option (paths may contain commas) */
  def membersOption(members: Seq[(String, String)]): String =
    org.json4s.jackson.JsonMethods.compact(org.json4s.jackson.JsonMethods.render(
      org.json4s.JArray(members.toList.map { case (p, e) =>
        org.json4s.JObject("path" -> org.json4s.JString(p),
          "entry" -> org.json4s.JString(e)) })))

  def specOf(options: CaseInsensitiveStringMap): BbfSpec = {
    val raw = Option(options.get("members"))
      .getOrElse(throw new IllegalArgumentException("bbf: 'members' option required"))
    val members = org.json4s.jackson.JsonMethods.parse(raw) match {
      case org.json4s.JArray(ms) => ms.map { m =>
        val org.json4s.JString(p) = (m \ "path"): @unchecked
        val org.json4s.JString(e) = (m \ "entry"): @unchecked
        (p, e)
      }
      case other => throw new IllegalArgumentException(s"bbf: bad members option: $other")
    }
    require(members.nonEmpty, "bbf: at least one (path, entry) member required")
    BbfSpec(members)
  }

  /** every (path, entry, blockIdx) surviving statistics pruning —
    * lazily, so a million-block collection plans without building
    * intermediate per-file lists beyond the kept partitions */
  def partitions(spec: BbfSpec, filters: Array[sources.Filter])
      : Iterator[(String, String, Int)] =
    spec.members.iterator.flatMap { case (p, e) =>
      val entry = BbfStore.openCached(p).entry(e)
      val dtypes = entry.schema.toMap
      entry.blocks.indices.iterator
        .filter(bi => couldMatch(entry.blocks(bi), dtypes, filters))
        .map(bi => (p, e, bi))
    }

  /** one pushed comparison vs one block's stored column statistics;
    * fail-open on every uncertainty. Comparisons over (min, max) of
    * NON-NULL values are safe because NULL never satisfies one. */
  private def couldMatch(block: BbfStore.Block, dtypes: Map[String, String],
      filters: Array[sources.Filter]): Boolean =
    filters.forall(f => satisfiable(block, dtypes, f))

  private def satisfiable(block: BbfStore.Block, dtypes: Map[String, String],
      f: sources.Filter): Boolean = f match {
    case sources.And(l, r) => satisfiable(block, dtypes, l) && satisfiable(block, dtypes, r)
    case sources.Or(l, r) => satisfiable(block, dtypes, l) || satisfiable(block, dtypes, r)
    case sources.EqualTo(c, v) => cmp(block, dtypes, c, v, "eq")
    case sources.GreaterThan(c, v) => cmp(block, dtypes, c, v, "gt")
    case sources.GreaterThanOrEqual(c, v) => cmp(block, dtypes, c, v, "gte")
    case sources.LessThan(c, v) => cmp(block, dtypes, c, v, "lt")
    case sources.LessThanOrEqual(c, v) => cmp(block, dtypes, c, v, "lte")
    case sources.In(c, vs) => vs.isEmpty || vs.exists(v => cmp(block, dtypes, c, v, "eq"))
    case sources.IsNotNull(c) =>
      // a block whose column is all-null can't satisfy IS NOT NULL
      block.columns.get(c) match {
        case Some(chunk) => chunk.stats.nullCount < block.rows
        case None => true // no chunk metadata: fail open
      }
    case sources.IsNull(c) =>
      block.columns.get(c) match {
        case Some(chunk) => chunk.stats.nullCount > 0
        case None => true
      }
    case _ => true
  }

  /** compare literal v against the block's (min, max) under `op` */
  private def cmp(block: BbfStore.Block, dtypes: Map[String, String],
      c: String, v: Any, op: String): Boolean =
    block.columns.get(c) match {
      case None => true // no chunk metadata for the column: fail open
      case Some(chunk) =>
        val st = chunk.stats
        if (st.nullCount == block.rows) false // all-null block: no comparison matches
        else (numericLiteral(v, dtypes.get(c)), v, dtypes.get(c)) match {
          case (Some(x), _, _) =>
            (st.numMin, st.numMax) match {
              case (Some(mn), Some(mx)) => rangeOk(op, x, mn, mx)
              case _ => true
            }
          case (None, s: String, Some("string")) =>
            (st.strMin, st.strMax) match {
              case (Some(mn), Some(mx)) => rangeOkStr(op, s, mn, mx)
              case _ => true
            }
          case _ => true // type mismatch / unknown literal shape: fail open
        }
    }

  /** pushed literal → the stored stats' numeric domain (timestamps in
    * micros, dates in epoch days — the writer's encoding); None when the
    * literal doesn't map onto the column's numeric stats */
  private def numericLiteral(v: Any, dtype: Option[String]): Option[Double] =
    (v, dtype) match {
      case (n: Number, Some(dt)) if dt != "string" => Some(n.doubleValue())
      case (ts: java.sql.Timestamp, Some("timestamp")) =>
        Some((Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L).toDouble)
      case (ins: java.time.Instant, Some("timestamp")) =>
        Some((ins.getEpochSecond * 1000000L + ins.getNano / 1000L).toDouble)
      case (ldt: java.time.LocalDateTime, Some("timestamp")) =>
        Some((ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L).toDouble)
      case (d: java.sql.Date, Some("date")) => Some(d.toLocalDate.toEpochDay.toDouble)
      case (d: java.time.LocalDate, Some("date")) => Some(d.toEpochDay.toDouble)
      case _ => None
    }

  private def rangeOk(op: String, v: Double, mn: Double, mx: Double): Boolean = op match {
    case "eq"  => v >= mn && v <= mx
    case "gt"  => mx > v
    case "gte" => mx >= v
    case "lt"  => mn < v
    case "lte" => mn <= v
    case _     => true
  }
  private def rangeOkStr(op: String, v: String, mn: String, mx: String): Boolean = op match {
    case "eq"  => v.compareTo(mn) >= 0 && v.compareTo(mx) <= 0
    case "gt"  => mx.compareTo(v) > 0
    case "gte" => mx.compareTo(v) >= 0
    case "lt"  => mn.compareTo(v) < 0
    case "lte" => mn.compareTo(v) <= 0
    case _     => true
  }
}

/** facade mirroring the other sources */
object BbfSource {

  /** all entries of all files (or one named entry) as the supercast
    * union — the reference's table-schema adaptation: a column an entry
    * lacks comes back as NULL (opener.rs batch-adapter contract). The
    * plan unions one scan PER DISTINCT ENTRY SCHEMA (each spanning all
    * its (file, entry) members), so a collection of thousands of files
    * with a handful of schema shapes stays a handful of scan nodes. */
  def read(spark: SparkSession, paths0: Seq[String], entry: Option[String] = None): DataFrame = {
    require(paths0.nonEmpty, "bbf: at least one path required")
    // glob expansion (docs formats/bbf.md: read_bbf('bbf/**/*.bbf'))
    val paths = graft.sources.FileCollection.expandGlobs(spark, paths0)
    require(paths.nonEmpty, s"bbf: no files match ${paths0.mkString(",")}")
    val perEntry: Seq[(String, String, StructType)] = paths.flatMap { p =>
      val footer = BbfStore.openCached(p)
      entry match {
        case Some(n) =>
          val e = footer.entry(n)
          require(!e.deleted, s"bbf entry '$n' in $p is logically deleted")
          Seq((p, n, e.sparkSchema))
        case None => // scans skip logically deleted entries
          footer.entries.filterNot(_.deleted).map(e => (p, e.name, e.sparkSchema))
      }
    }
    require(perEntry.nonEmpty, s"bbf: no entries in ${paths.mkString(",")}")
    val merged = SuperType.superTypeSchemaScan(perEntry.map(_._3))
    val groups: Seq[Seq[(String, String, StructType)]] =
      perEntry.groupBy(_._3).toSeq.sortBy(_._2.head._1).map(_._2)
    val frames = groups.map { g =>
      val df = spark.read.format("graft.sources.bbf.BbfTableProvider")
        .option("members", BbfScanPlanner.membersOption(g.map(m => (m._1, m._2))))
        .load()
      UnionByName.project(df, merged)
    }
    frames.reduce(_ union _)
  }

  /** entry inventory of one file (LIST DATASETS / DESCRIBE FORMAT) */
  def entries(path: String): Seq[(String, Long, StructType)] =
    BbfStore.openCached(path).entries.map(e => (e.name, e.rows, e.sparkSchema))
}
