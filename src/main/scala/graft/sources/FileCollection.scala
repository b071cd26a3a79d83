package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.core.{SuperType, UnionByName}

/** A table over N file globs with super-typed schema merging — the
  * engine's equivalent of the reference's FileCollection listing table
  * (beacon-datafusion-ext/src/file_collection.rs:24-61): per-file schema
  * inference, lattice merge, per-file cast/NULL-fill to the merged
  * schema.
  *
  * Spark-first design (SURVEY §7.1 step 3):
  *  - Files whose schemas are identical are read as ONE `spark.read`
  *    scan (vectorized reader, predicate pushdown, file-group splits) —
  *    the per-schema-group union only appears when types genuinely
  *    conflict, so the homogeneous fast path is exactly a native scan.
  *  - Schema discovery reads footers only. At 100 TB / millions of
  *    files this is a driver-side listing concern, same as Spark's own
  *    `mergeSchema`; production deployments should layer a file-stats
  *    catalog (see GraftCatalog) so repeated queries skip inference.
  *    Footer reads are parallelized on the driver thread pool.
  *  - The union of per-group scans is shuffle-free; filters and column
  *    pruning push into every branch (verified in FileCollectionSpec).
  */
object FileCollection {

  /** Supported format readers. CSV infers; parquet reads footers. */
  def read(
      spark: SparkSession,
      format: String,
      paths: Seq[String],
      options: Map[String, String] = Map.empty): DataFrame = {
    val files = expandGlobs(spark, paths)
    require(files.nonEmpty, s"no files match: ${paths.mkString(", ")}")
    val bySchema = schemaGroups(spark, format, files, options)
    if (bySchema.size == 1) {
      val (schema, groupFiles) = bySchema.head
      load(spark, format, schema, groupFiles, options)
    } else {
      val merged = SuperType.superTypeSchemaScan(bySchema.keys.toSeq)
      val parts = bySchema.toSeq.map { case (schema, groupFiles) =>
        UnionByName.project(load(spark, format, schema, groupFiles, options), merged)
      }
      parts.reduce(_ union _)
    }
  }

  def parquet(spark: SparkSession, paths: String*): DataFrame =
    read(spark, "parquet", paths)

  def csv(spark: SparkSession, paths: Seq[String], options: Map[String, String]): DataFrame =
    read(spark, "csv", paths, Map("header" -> "true", "inferSchema" -> "true") ++ options)

  // ------------------------------------------------------------------

  private def load(
      spark: SparkSession,
      format: String,
      schema: StructType,
      files: Seq[String],
      options: Map[String, String]): DataFrame =
    spark.read.format(format).options(options).schema(schema).load(files: _*)

  /** Hadoop-FS glob expansion (handles *, ?, [..], {..}). */
  def expandGlobs(spark: SparkSession, patterns: Seq[String]): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    patterns.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val matches = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
      matches.flatMap { st =>
        if (st.isDirectory) {
          // a directory matched: take its data files (non-hidden)
          fs.listStatus(st.getPath).toSeq
            .filter(f => f.isFile && !isHidden(f.getPath.getName))
            .map(_.getPath.toString)
        } else Seq(st.getPath.toString)
      }
    }.distinct
  }

  private def isHidden(name: String): Boolean =
    name.startsWith("_") || name.startsWith(".")

  /** Per-file schema → groups of files sharing an identical schema.
    * Footer/inference reads run in parallel on the driver. */
  private def schemaGroups(
      spark: SparkSession,
      format: String,
      files: Seq[String],
      options: Map[String, String]): Map[StructType, Seq[String]] = {
    import scala.collection.parallel.CollectionConverters._
    val inferred = files.par.map { f =>
      f -> spark.read.format(format).options(options).load(f).schema
    }.toVector.seq
    inferred.groupBy(_._2).map { case (s, fs) => s -> fs.map(_._1) }
  }
}
