package graft.sources.netcdf

import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.nd.NdFlatten

/** DataSourceV2 over NetCDF/HDF5 containers: partition = file, column
  * pruning drops variables the query never references BEFORE their
  * bytes decode (the `keep` hook in both container parsers) — for wide
  * scientific files, unread variables are most of the decode cost.
  * The grid is resolved once on the driver and shipped explicitly, so
  * pruning can never change grid selection.
  *
  * (The Zarr DSv2 additionally prunes chunks; classic/HDF5 archives
  * are shaped as many modest files, so file-level parallelism + var
  * pruning is the matching design — SURVEY §2.1.)
  */
class NdFileTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NdFileSource.schema(NdFileSource.specOf(options))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new NdFileTable(NdFileSource.specOf(new CaseInsensitiveStringMap(properties)), schema)
  override def supportsExternalMetadata(): Boolean = true
}

final case class NdFileSpec(files: Seq[String], grid: Seq[String])

class NdFileTable(spec: NdFileSpec, schema0: StructType) extends Table with SupportsRead {
  override def name(): String = s"netcdf(${spec.files.take(2).mkString(",")}…)"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NdFileScanBuilder(spec, schema0)
}

class NdFileScanBuilder(spec: NdFileSpec, fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  private var required: StructType = fullSchema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    if (requiredSchema.nonEmpty) required = requiredSchema
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter]): Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters
    filters // pruning-only: Spark re-applies every filter after the scan
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed
  override def build(): Scan = new NdFileScan(spec, required, pushed)
}

class NdFileScan(spec: NdFileSpec, required: StructType,
    filters: Array[org.apache.spark.sql.sources.Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    NdFileSource.pruneFiles(spec, filters)
      .map(f => NdFilePartition(f, spec.grid, required, filters): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory = new NdFileReaderFactory
}

final case class NdFilePartition(file: String, grid: Seq[String],
    required: StructType,
    filters: Array[org.apache.spark.sql.sources.Filter]) extends InputPartition

class NdFileReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new NdFilePartitionReader(p.asInstanceOf[NdFilePartition])
}

class NdFilePartitionReader(p: NdFilePartition) extends PartitionReader[InternalRow] {
  private val rows: Iterator[InternalRow] = {
    val requiredNames = p.required.fieldNames.toSet
    // mask coordinates must decode even when unselected
    val maskCols = graft.nd.NdEmit.maskColumns(p.filters, p.grid)
    // keep a variable when its column, or one of its attribute columns,
    // is required; everything else never decodes
    def keep(v: String): Boolean =
      requiredNames.contains(v) || maskCols.contains(v) ||
        requiredNames.exists(_.startsWith(v + "."))
    // zero kept variables (count(*) shape) is fine: the row count is
    // the product of the grid dims, no data decodes at all
    val ds = NetcdfSource.readContainer(p.file, keep)
    // unboxed emit + in-flatten row masking (NdEmit)
    graft.nd.NdEmit.internalRows(ds, p.grid, p.required, p.filters)
  }
  private var cur: InternalRow = _
  override def next(): Boolean = { if (rows.hasNext) { cur = rows.next(); true } else false }
  override def get(): InternalRow = cur
  override def close(): Unit = ()
}

object NdFileSource {
  val SEP = ""

  def specOf(options: CaseInsensitiveStringMap): NdFileSpec = {
    val files = Option(options.get("files"))
      .getOrElse(throw new IllegalArgumentException("ndfile: 'files' option required"))
      .split(SEP).toSeq.filter(_.nonEmpty)
    val grid = Option(options.get("grid"))
      .getOrElse(throw new IllegalArgumentException("ndfile: 'grid' option required"))
      .split(",").toSeq.map(_.trim)
    NdFileSpec(files, grid)
  }

  def schema(spec: NdFileSpec): StructType =
    NdFlatten.plan(NetcdfSource.readContainer(spec.files.head), Some(spec.grid)).schema

  /** file-level predicate pruning — the archive story ("query a
    * million files, open the few that matter"): for predicates on grid
    * coordinate axes, each file's (tiny) 1-D coordinate variables are
    * decoded at planning time — the keep hook skips everything else —
    * and files whose coordinate range cannot satisfy the conjunction
    * are dropped before any task launches. Conservative: files keep on
    * any doubt, CF-time axes are excluded (filter literals arrive
    * decoded), and Spark re-applies all filters post-scan. */
  def pruneFiles(spec: NdFileSpec,
      filters: Array[org.apache.spark.sql.sources.Filter]): Seq[String] = {
    import org.apache.spark.sql.sources._
    val conds = scala.collection.mutable.Map.empty[String, List[(String, Double)]]
      .withDefaultValue(Nil)
    def num(v: Any): Option[Double] = v match {
      case n: Number => Some(n.doubleValue()); case _ => None
    }
    def walk(f: Filter): Unit = f match {
      case And(l, r) => walk(l); walk(r)
      case EqualTo(a, v) => num(v).foreach(d => conds(a) = ("eq", d) :: conds(a))
      case GreaterThan(a, v) => num(v).foreach(d => conds(a) = ("gt", d) :: conds(a))
      case GreaterThanOrEqual(a, v) => num(v).foreach(d => conds(a) = ("gte", d) :: conds(a))
      case LessThan(a, v) => num(v).foreach(d => conds(a) = ("lt", d) :: conds(a))
      case LessThanOrEqual(a, v) => num(v).foreach(d => conds(a) = ("lte", d) :: conds(a))
      case _ => ()
    }
    filters.foreach(walk)
    val coordNames = spec.grid.toSet.intersect(conds.keySet)
    if (coordNames.isEmpty) return spec.files
    spec.files.filter { f =>
      try {
        val ds = NetcdfSource.readContainer(f, coordNames.contains _)
        coordNames.forall { c =>
          ds.variables.find(v => v.name == c && !v.isString && v.dims == Seq(c)) match {
            case Some(v) if v.data.nonEmpty =>
              // min/max in CF-DECODED units (scale/offset, fill/NaN
              // excluded, time axes skipped) — the units the filter
              // literals carry; raw packed values would mis-prune
              graft.nd.NdFlatten.pruneStats(v.attrs, v.data) match {
                case Some((mn, mx)) =>
                  conds(c).forall {
                    case ("eq", d)  => d >= mn && d <= mx
                    case ("gt", d)  => mx > d
                    case ("gte", d) => mx >= d
                    case ("lt", d)  => mn < d
                    case ("lte", d) => mn <= d
                    case _ => true
                  }
                case None => true // time axis / all-fill: keep
              }
            case _ => true // not a plain numeric coord axis: keep
          }
        }
      } catch { case _: Throwable => true } // unreadable here: let the task report it
    }
  }
}
