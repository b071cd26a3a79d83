package graft.sources.icechunk

import java.util.{Map => JMap}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.nd.NdFlatten
import graft.sources.zarr.ZarrScanPlanner

/** `read_icechunk` DataSourceV2: the zarr chunk-partitioned scan over
  * one RESOLVED repository version. The version selector (branch tip /
  * tag / snapshot id — at most one, per the reference's
  * beacon-icechunk/src/repository.rs) resolves once at planning; the
  * partition carries the immutable snapshot id, so a commit landing
  * mid-query cannot tear the scan across two versions. */
class IcechunkTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    IcechunkScanPlanner.schema(IcechunkScanPlanner.specOf(options))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new IcechunkTable(IcechunkScanPlanner.specOf(new CaseInsensitiveStringMap(properties)), schema)
  override def supportsExternalMetadata(): Boolean = true
}

final case class IcechunkSpec(path: String, version: IcechunkStore.Version,
    dimensions: Option[Seq[String]])

class IcechunkTable(spec: IcechunkSpec, schema0: StructType) extends Table with SupportsRead {
  override def name(): String = s"icechunk(${spec.path}@${spec.version.render})"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new IcechunkScanBuilder(spec, schema0)
}

class IcechunkScanBuilder(spec: IcechunkSpec, fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pushed: Array[sources.Filter] = Array.empty
  private var required: StructType = fullSchema
  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    pushed = filters; filters
  }
  override def pushedFilters(): Array[sources.Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    if (requiredSchema.nonEmpty) required = requiredSchema
  override def build(): Scan = new IcechunkScan(spec, required, pushed)
}

class IcechunkScan(spec: IcechunkSpec, required: StructType, filters: Array[sources.Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    // resolve ONCE: partitions pin the immutable snapshot id
    val repo = IcechunkStore.openCached(spec.path, spec.version)
    IcechunkScanPlanner.partitions(repo, spec.dimensions)
      .map(r => IcechunkPartition(spec.path, repo.snapshotId, r, required, filters): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = new IcechunkReaderFactory
}

final case class IcechunkPartition(path: String, snapshotId: String,
    region: Seq[(String, Long, Long)], required: StructType,
    filters: Array[sources.Filter]) extends InputPartition

class IcechunkReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new IcechunkPartitionReader(p.asInstanceOf[IcechunkPartition])
}

class IcechunkPartitionReader(p: IcechunkPartition) extends PartitionReader[InternalRow] {
  private val rows: Iterator[InternalRow] = {
    val repo = IcechunkStore.openCached(p.path,
      IcechunkStore.Version(snapshot = Some(p.snapshotId)))
    val gridDims = p.region.map(_._1)
    val requiredNames = p.required.fieldNames.toSet
    val maskCols = graft.nd.NdEmit.maskColumns(p.filters, gridDims)
    def keep(name: String): Boolean =
      requiredNames.contains(name) || maskCols.contains(name) ||
        repo.nodes.find(_.array.name == name)
          .exists(_.array.attrs.keys.exists(k => requiredNames.contains(s"$name.$k")))
    val nd = IcechunkStore.regionDataset(repo, p.region, keep)
    graft.nd.NdEmit.internalRows(nd, gridDims, p.required, p.filters)
  }
  private var cur: InternalRow = _
  override def next(): Boolean = { if (rows.hasNext) { cur = rows.next(); true } else false }
  override def get(): InternalRow = cur
  override def close(): Unit = ()
}

object IcechunkScanPlanner {

  def specOf(options: CaseInsensitiveStringMap): IcechunkSpec = {
    val path = Option(options.get("path"))
      .getOrElse(throw new IllegalArgumentException("icechunk: 'path' option required"))
    def opt(k: String) = Option(options.get(k)).map(_.trim).filter(_.nonEmpty)
    val v = IcechunkStore.Version(opt("branch"), opt("tag"), opt("snapshot"))
    IcechunkSpec(path, v, opt("dimensions").map(_.split(",").toSeq.map(_.trim)))
  }

  def gridOf(repo: IcechunkStore.Repo, dimensions: Option[Seq[String]]): Seq[String] =
    dimensions.getOrElse {
      require(repo.nodes.nonEmpty, s"icechunk snapshot ${repo.snapshotId} has no arrays")
      repo.nodes.maxBy(n => n.array.shape.product).array.dims
    }

  def schema(spec: IcechunkSpec): StructType = {
    val repo = IcechunkStore.openCached(spec.path, spec.version)
    NdFlatten.plan(IcechunkStore.metaDataset(repo), Some(gridOf(repo, spec.dimensions))).schema
  }

  def partitions(repo: IcechunkStore.Repo, dimensions: Option[Seq[String]])
      : Iterator[Seq[(String, Long, Long)]] = {
    val grid = gridOf(repo, dimensions)
    val sizes = repo.dimSizes.toMap
    val gridNode = repo.nodes.find(_.array.dims == grid)
      .getOrElse(repo.nodes.maxBy(_.array.shape.product))
    val chunk = grid.zipWithIndex.map { case (d, i) =>
      if (gridNode.array.dims.lift(i).contains(d)) gridNode.array.chunkShape(i) else sizes(d)
    }
    val regionsPerDim = grid.zipWithIndex.map { case (d, i) =>
      val size = sizes(d).toLong
      val cs = chunk(i).toLong
      (0L until size by cs).map(s => (d, s, math.min(s + cs, size)))
    }
    ZarrScanPlanner.regionProduct(regionsPerDim)
  }
}

/** facade mirroring the other sources */
object IcechunkSource {
  def read(spark: SparkSession, path: String,
      branch: Option[String] = None, tag: Option[String] = None,
      snapshot: Option[String] = None,
      dimensions: Option[Seq[String]] = None): DataFrame = {
    var r = spark.read.format("graft.sources.icechunk.IcechunkTableProvider")
      .option("path", path)
    branch.foreach(b => r = r.option("branch", b))
    tag.foreach(t => r = r.option("tag", t))
    snapshot.foreach(s => r = r.option("snapshot", s))
    dimensions.foreach(ds => r = r.option("dimensions", ds.mkString(",")))
    r.load()
  }
}
