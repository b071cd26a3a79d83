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

  private def localPath(p: String): String = p.stripPrefix("file:")

  /** parse one container into the ND model (format-dispatched) */
  def readContainer(path0: String): graft.nd.NdDataset = {
    val path = localPath(path0)
    if (NetcdfClassic.isClassic(path)) NetcdfClassic.readDataset(path)
    else graft.sources.hdf5.Hdf5Reader.readDataset(path)
  }

  def schemaOf(path: String, dimensions: Option[Seq[String]]): StructType =
    NdFlatten.plan(readContainer(path), dimensions).schema

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

  private def readGroup(spark: SparkSession, schema: StructType,
      files: Seq[String], dimensions: Option[Seq[String]]): DataFrame = {
    val dims = dimensions
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.length))
      .flatMap { f =>
        val ds = readContainer(f)
        NdFlatten.localRows(ds, dims)._2
      }
    spark.createDataFrame(rdd, schema)
  }

  /** single-file convenience (tests, DSL) */
  def readFile(spark: SparkSession, path: String,
      dimensions: Option[Seq[String]] = None): DataFrame =
    read(spark, Seq(path), dimensions)
}
