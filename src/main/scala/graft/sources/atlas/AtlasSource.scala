package graft.sources.atlas

import java.util.{Map => JMap}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.{SuperType, UnionByName}
import graft.nd.NdFlatten
import graft.sources.zarr.ZarrScanPlanner

/** `read_atlas` DataSourceV2: one table per (store, dataset), partition
  * = one chunk region of the dataset's grid — the same fan-out stance as
  * the Zarr source, so a large store scans as independent chunk tasks
  * with no shuffle.
  *
  * Dataset-level pruning (the reference's PruningPredicate feed,
  * beacon-arrow-atlas/src/datafusion/pruning.rs): pushed comparison
  * filters are tested against the dataset's STORED per-array (min, max)
  * statistics at planning time; a dataset that provably can't match
  * plans ZERO partitions — none of its chunk files open. Every uncertain
  * path fails open (statistics missing, column unknown, non-comparison
  * predicate), and Spark re-applies all filters post-scan, so pruning is
  * an I/O optimization only. A whole-store scan
  * ([[AtlasSource.read]]) is the supercast union of its datasets.
  */
class AtlasTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AtlasScanPlanner.schema(AtlasScanPlanner.specOf(options))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new AtlasTable(AtlasScanPlanner.specOf(new CaseInsensitiveStringMap(properties)), schema)
  override def supportsExternalMetadata(): Boolean = true
}

final case class AtlasSpec(path: String, dataset: String, dimensions: Option[Seq[String]])

class AtlasTable(spec: AtlasSpec, schema0: StructType) extends Table with SupportsRead {
  override def name(): String = s"atlas(${spec.path}#${spec.dataset})"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AtlasScanBuilder(spec, schema0)
}

class AtlasScanBuilder(spec: AtlasSpec, fullSchema: StructType)
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
  override def build(): Scan = new AtlasScan(spec, required, pushed)
}

class AtlasScan(spec: AtlasSpec, required: StructType, filters: Array[sources.Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    AtlasScanPlanner.partitions(spec, filters)
      .map(r => AtlasPartition(spec, r, required, filters): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory = new AtlasReaderFactory
}

final case class AtlasPartition(spec: AtlasSpec, region: Seq[(String, Long, Long)],
    required: StructType, filters: Array[sources.Filter]) extends InputPartition

class AtlasReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new AtlasPartitionReader(p.asInstanceOf[AtlasPartition])
}

class AtlasPartitionReader(p: AtlasPartition) extends PartitionReader[InternalRow] {
  private val rows: Iterator[InternalRow] = {
    val store = AtlasStore.openCached(p.spec.path) // cached per JVM
    val ds = store.dataset(p.spec.dataset)
    val gridDims = p.region.map(_._1)
    val requiredNames = p.required.fieldNames.toSet
    val maskCols = graft.nd.NdEmit.maskColumns(p.filters, gridDims)
    // keep an array if its column, a mask coordinate, or any of its
    // attribute columns is needed; unkept arrays never open a chunk
    def keep(name: String): Boolean =
      requiredNames.contains(name) || maskCols.contains(name) ||
        ds.array(name).exists(_.attrs.keys.exists(k => requiredNames.contains(s"$name.$k")))
    val nd = AtlasStore.regionDataset(store, p.spec.dataset, p.region, keep)
    graft.nd.NdEmit.internalRows(nd, gridDims, p.required, p.filters)
  }
  private var cur: InternalRow = _
  override def next(): Boolean = { if (rows.hasNext) { cur = rows.next(); true } else false }
  override def get(): InternalRow = cur
  override def close(): Unit = ()
}

/** driver-side planning: grid, schema, chunk regions, stats pruning */
object AtlasScanPlanner {

  def specOf(options: CaseInsensitiveStringMap): AtlasSpec = {
    val path = Option(options.get("path"))
      .getOrElse(throw new IllegalArgumentException("atlas: 'path' option required"))
    val dataset = Option(options.get("dataset"))
      .getOrElse(throw new IllegalArgumentException("atlas: 'dataset' option required"))
    val dims = Option(options.get("dimensions")).map(_.split(",").toSeq.map(_.trim))
    AtlasSpec(path, dataset, dims)
  }

  /** grid = explicit dims or dims of the largest array */
  def gridOf(ds: AtlasStore.Dataset, dimensions: Option[Seq[String]]): Seq[String] =
    dimensions.getOrElse {
      require(ds.arrays.nonEmpty, s"atlas dataset ${ds.name} has no arrays")
      ds.arrays.maxBy(a => a.shape.map(_.toLong).product).dims
    }

  def schema(spec: AtlasSpec): StructType = {
    val store = AtlasStore.openCached(spec.path)
    val ds = store.dataset(spec.dataset)
    val grid = gridOf(ds, spec.dimensions)
    // metadata-only model: exact flatten schema, zero chunk files opened
    NdFlatten.plan(AtlasStore.metaDataset(store, spec.dataset), Some(grid)).schema
  }

  def partitions(spec: AtlasSpec, filters: Array[sources.Filter])
      : Iterator[Seq[(String, Long, Long)]] = {
    val store = AtlasStore.openCached(spec.path)
    val ds = store.dataset(spec.dataset)
    if (!couldMatch(ds, filters)) return Iterator.empty
    val grid = gridOf(ds, spec.dimensions)
    val sizes = ds.dims.toMap
    val gridArray = ds.arrays.find(_.dims == grid)
      .getOrElse(ds.arrays.maxBy(_.shape.map(_.toLong).product))
    val chunk = grid.zipWithIndex.map { case (d, i) =>
      if (gridArray.dims.lift(i).contains(d)) gridArray.chunks(i) else sizes(d)
    }
    // chunk-level pruning on 1-D coordinate arrays named like their dim
    // (same rule as the Zarr planner — the reference's atlas bridge
    // shares beacon-nd-array's pushdown engine with zarr): comparisons
    // run in CF-decoded units via NdFlatten.pruneStats, fail-open.
    val conds = ZarrScanPlanner.splitConds(filters)
    val coords: Map[String, AtlasStore.AtlasArray] = ds.arrays
      .filter(a => a.dims.length == 1 && a.dims.head == a.name && !a.isString)
      .map(a => a.name -> a).toMap
    val regionsPerDim = grid.zipWithIndex.map { case (d, i) =>
      val size = sizes(d).toLong
      val cs = chunk(i).toLong
      val slices = (0L until size by cs).map(s => (d, s, math.min(s + cs, size)))
      coords.get(d) match {
        case Some(coordVar) if conds.contains(d) =>
          slices.filter { case (_, s, e) =>
            val (vals, _) = AtlasStore.readRegion(
              AtlasStore.openCached(spec.path).root, spec.dataset, coordVar,
              Array(s), Array(e))
            graft.nd.NdFlatten.pruneStats(coordVar.attrsWithFill, vals) match {
              case Some((mn, mx)) => conds(d).forall(_.satisfiable(mn, mx))
              case None => true
            }
          }
        case _ => slices
      }
    }
    ZarrScanPlanner.regionProduct(regionsPerDim)
  }

  /** stored-statistics dataset pruning; fail-open on every uncertainty.
    * Comparisons over (min, max) of NON-NULL values are safe because a
    * NULL never satisfies a comparison predicate. */
  private def couldMatch(ds: AtlasStore.Dataset, filters: Array[sources.Filter]): Boolean = {
    val conds = ZarrScanPlanner.splitConds(filters)
    conds.forall { case (colName, cs) =>
      ds.array(colName).flatMap(_.stats) match {
        case Some(st) if !st.min.isNaN && !st.max.isNaN =>
          cs.forall(_.satisfiable(st.min, st.max))
        case _ => true // no stats / all-null / unknown column: keep
      }
    }
  }
}

/** facade mirroring the other sources */
object AtlasSource {

  /** one dataset, or the whole store as a supercast union of datasets
    * (arrays widen per [[SuperType]]; columns a dataset lacks are null) */
  def read(spark: SparkSession, path: String, dataset: Option[String] = None,
      dimensions: Option[Seq[String]] = None): DataFrame = {
    val store = AtlasStore.openCached(path)
    val names = dataset.map(Seq(_)).getOrElse(store.datasets.map(_.name))
    require(names.nonEmpty, s"atlas store has no datasets: $path")
    val frames = names.map { d =>
      var r = spark.read.format("graft.sources.atlas.AtlasTableProvider")
        .option("path", path).option("dataset", d)
      dimensions.foreach(ds => r = r.option("dimensions", ds.mkString(",")))
      r.load()
    }
    if (frames.length == 1) frames.head
    else {
      val merged = SuperType.superTypeSchemaScan(frames.map(_.schema))
      frames.map(UnionByName.project(_, merged)).reduce(_ union _)
    }
  }
}
