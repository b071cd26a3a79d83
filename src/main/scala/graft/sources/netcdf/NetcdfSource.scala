package graft.sources.netcdf

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.core.{SuperType, UnionByName}
import graft.nd.NdFlatten
import graft.sources.FileCollection

/** `read_netcdf` — multi-file NetCDF scan (SURVEY §2.1; reference
  * beacon-arrow-netcdf/src/datafusion/mod.rs): glob → per-file schema
  * (arrays→tables flattening with CF decoding + attribute columns) →
  * scan-merge supertyped schema → partition-parallel read with
  * partition = file.
  *
  * Container dispatch by magic bytes: `CDF\x01|\x02` → the pure-JVM
  * classic parser ([[NetcdfClassic]]); `\x89HDF` (NetCDF-4) → the HDF5
  * reader ([[graft.sources.hdf5.Hdf5Reader]]) — mirroring the
  * reference's dual backend (netcdf-c / oxcdf).
  *
  * The optional `dimensions` argument selects the grid explicitly
  * (table-functions.md:27-43); default = dims of the largest variable.
  */
object NetcdfSource {

  /** normalize `file:` URIs; remote schemes pass through to the
    * ByteStore-routed container readers untouched */
  private def localPath(p: String): String = graft.sources.io.ByteStore.toLocal(p)

  /** parse one container into the ND model (format-dispatched); `keep`
    * skips data decode of unselected variables (DSv2 column pruning);
    * `rowRange` restricts the read to rows [start,end) of one dimension
    * (intra-file chunk-split partitions) */
  def readContainer(path0: String, keep: String => Boolean = _ => true,
      rowRange: Option[(String, Int, Int)] = None): graft.nd.NdDataset = {
    val path = localPath(path0)
    if (NetcdfClassic.isClassic(path)) NetcdfClassic.readDataset(path, keep, rowRange)
    else if (graft.sources.tiff.TiffReader.isTiff(path))
      graft.sources.tiff.TiffReader.readDataset(path, keep, rowRange)
    else graft.sources.hdf5.Hdf5Reader.readDataset(path, keep, rowRange)
  }

  /** chunk shape at the container level: HDF5 chunked layouts report
    * their chunk dims (split alignment); classic files are
    * record-striped → None */
  def chunkDimsOf(path0: String, rank: Int): Option[Array[Int]] = {
    val path = localPath(path0)
    if (NetcdfClassic.isClassic(path)) None
    else if (graft.sources.tiff.TiffReader.isTiff(path))
      graft.sources.tiff.TiffReader.stripRows(path).map(r => Array(r, Int.MaxValue))
    else graft.sources.hdf5.Hdf5Reader.chunkDimsOf(path, rank)
  }

  def isClassicFile(path0: String): Boolean = NetcdfClassic.isClassic(localPath(path0))

  private val metaCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long), graft.nd.NdDataset]()

  /** metadata-only parse: every variable present with its dims, type
    * and attributes but EMPTY data — schema inference and grid
    * selection on a 50 GB granule cost the header bytes, not the file.
    * Cached per (path, mtime) per JVM: one query's planning touches a
    * file's header from schema inference, file pruning and split
    * planning, and at a million files each extra walk is a listing-cost
    * pass (the reference's NETCDF_USE_READER_CACHE stance). */
  def readContainerMeta(path0: String): graft.nd.NdDataset = {
    val path = localPath(path0)
    val mtime = graft.sources.io.ByteStore.mtime(path)
    if (metaCache.size > 1024) metaCache.clear()
    metaCache.computeIfAbsent((path, mtime), _ =>
      if (NetcdfClassic.isClassic(path)) NetcdfClassic.readMeta(path)
      else if (graft.sources.tiff.TiffReader.isTiff(path))
        graft.sources.tiff.TiffReader.readMeta(path)
      else graft.sources.hdf5.Hdf5Reader.readMeta(path))
  }

  /** Flattened schema without decoding any data (metadata-only parse;
    * schema and default-grid selection depend only on variable shapes,
    * types and attributes). */
  def schemaOf(path: String, dimensions: Option[Seq[String]]): StructType =
    NdFlatten.plan(readContainerMeta(path), dimensions).schema

  def read(spark: SparkSession, paths: Seq[String],
      dimensions: Option[Seq[String]] = None): DataFrame = {
    val files = FileCollection.expandGlobs(spark, paths)
    require(files.nonEmpty, s"no files match: ${paths.mkString(",")}")
    val schemas = files.map(f => f -> schemaOf(f, dimensions))
    val merged = SuperType.superTypeSchemaScan(schemas.map(_._2))
    val bySchema = schemas.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val parts = bySchema.toSeq.map { case (schema, groupFiles) =>
      UnionByName.project(readGroup(spark, schema, groupFiles, dimensions), merged)
    }
    parts.reduce(_ union _)
  }

  /** one schema group reads through the column-pruning DSv2 (partition
    * = file, unselected variables never decode). The grid resolves on
    * the driver from the group's first file so executor-side pruning
    * can't change grid selection. */
  private def readGroup(spark: SparkSession, schema: StructType,
      files: Seq[String], dimensions: Option[Seq[String]]): DataFrame = {
    val grid = dimensions.getOrElse {
      val ds = readContainerMeta(files.head) // grid needs shapes, not data
      val largest = ds.variables.maxBy(v => (ds.volume(v), -ds.variables.indexOf(v)))
      largest.dims
    }
    spark.read
      .format(classOf[NdFileTableProvider].getName)
      .option("files", files.mkString(NdFileSource.SEP))
      .option("grid", grid.mkString(","))
      .schema(schema)
      .load()
  }

  /** single-file convenience (tests, DSL) */
  def readFile(spark: SparkSession, path: String,
      dimensions: Option[Seq[String]] = None): DataFrame =
    read(spark, Seq(path), dimensions)
}
