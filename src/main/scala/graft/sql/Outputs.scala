package graft.sql

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File egress + dataset introspection statements (SURVEY §2.1/§2.2):
  * `COPY … TO`, `LIST DATASETS`, `DESCRIBE FORMAT` — the engine-side
  * halves of the reference's output wrapper (query/output.rs), dataset
  * listing UDTF (list_datasets.rs) and `<fmt>_schema` UDTFs
  * (schema_function.rs).
  */
object Outputs {

  /** COPY … TO '<path>' [FORMAT fmt]; format inferred from the
    * extension when not given. Multi-file formats (parquet/csv) write
    * distributed; single-file formats (arrow IPC, netcdf, odv) stream
    * from the driver with bounded memory.
    *
    * Deterministic egress order (the reference's ordered-union
    * guarantee, `ordered_union.rs`): the single-file writers consume
    * `toLocalIterator`, which yields partitions in order — so a sorted
    * plan egresses in exactly its sort order. Distributed parquet/csv
    * writes keep sort order WITHIN each part file (Spark's contract);
    * a reader that needs one global order should either COPY TO a
    * single-file format or re-sort, same trade the reference makes at
    * its multi-stream boundaries. */
  def copyTo(df: DataFrame, path: String, format: Option[String]): Long = {
    val fmt = format.getOrElse {
      path.toLowerCase match {
        case p if p.endsWith(".csv") => "csv"
        case p if p.endsWith(".jsonl") || p.endsWith(".ndjson") || p.endsWith(".json") => "jsonl"
        case p if p.endsWith(".nc") => "netcdf"
        case p if p.endsWith(".odv") => "odv"
        case p if p.endsWith(".arrow") || p.endsWith(".feather") || p.endsWith(".ipc") => "arrow"
        case p if p.endsWith(".bbf") => "bbf"
        case _ => "parquet"
      }
    }
    fmt match {
      case "parquet" | "csv" | "jsonl" | "json" =>
        // distributed write: row receipt via observe() — observation
        // metrics apply exactly once per action, so task retries and
        // speculative attempts can't skew the count (accumulators can)
        val obs = new org.apache.spark.sql.Observation("graft.copy.rows")
        val counted = df.observe(obs,
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("rows"))
        if (fmt == "parquet") counted.write.mode("overwrite").parquet(path)
        // jsonl = Spark's native json sink (one JSON object per line) —
        // the training-corpus interchange format
        else if (fmt == "jsonl" || fmt == "json")
          counted.write.mode("overwrite").json(path)
        else counted.write.mode("overwrite").option("header", "true").csv(path)
        obs.get("rows").asInstanceOf[Long]
      case "arrow" | "netcdf" | "odv" | "bbf" =>
        // single-file formats stream every row through the driver via
        // toLocalIterator; the receipt is the writer's own row count —
        // exact by construction (each row passes the driver once), and
        // with no extra encode pass. An observe() metric is NOT safe
        // here: toLocalIterator runs one job per partition and the
        // observation finalizes after the first job, so it under-counts
        // whenever the plan has more than one partition.
        fmt match {
          case "arrow" => graft.sources.ArrowSource.writeSingleFile(df, path)
          case "netcdf" => graft.sources.netcdf.NetcdfWriter.writeFlat(df, path)
          case "bbf" =>
            // multi-entry container, one entry named 'data' (the
            // reference toolbox's create-from-table shape)
            graft.sources.bbf.BbfStore.Writer.write(path, Seq("data" -> df))
          case _ => graft.sources.OdvWriter.write(df, path)
        }
      case other => throw new IllegalArgumentException(s"COPY TO format '$other' unsupported")
    }
  }

  /** classify every file/store under a root by format (extension +
    * magic bytes; a directory with zarr.json or v2 .zgroup/.zarray/
    * .zmetadata is a zarr store) */
  def listDatasets(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val rootPath = Paths.get(root)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    def walk(p: java.nio.file.Path): Unit = {
      classify(p) match {
        case Some(fmt) =>
          val size =
            if (Files.isDirectory(p)) {
              val s = Files.walk(p)
              try s.iterator().asScala.filter(Files.isRegularFile(_)).map(Files.size).sum
              finally s.close()
            } else Files.size(p)
          out += ((p.toString, fmt, size))
        case None if Files.isDirectory(p) =>
          val s = Files.list(p)
          val children = try s.iterator().asScala.toSeq.sorted finally s.close()
          children.foreach(walk)
        case None => ()
      }
    }
    walk(rootPath)
    out.toSeq.toDF("path", "format", "size_bytes")
  }

  private def classify(p: java.nio.file.Path): Option[String] =
    classifyPath(p.toString)

  /** `.zst`/`.gz` wrappers are transparent for text formats (odv, csv) */
  private def stripCompressed(name: String): String =
    name.stripSuffix(".zst").stripSuffix(".gz")

  /** classify one path by marker/extension/magic (the listDatasets
    * rule); ByteStore-routed, so remote scheme URIs classify the same */
  def classifyPath(path0: String): Option[String] = {
    import graft.sources.io.ByteStore
    val path = ByteStore.toLocal(path0)
    val name = ByteStore.fileName(path).toLowerCase
    if (ByteStore.isDirectory(path)) {
      if (graft.sources.zarr.ZarrStore.isZarr(path)) Some("zarr")
      else if (ByteStore.exists(ByteStore.resolve(path, "atlas.json"))) Some("atlas")
      else if (graft.sources.icechunk.IcechunkStore.isRepository(path)) Some("icechunk")
      else if (ByteStore.isDirectory(ByteStore.resolve(path, "_delta_log"))) Some("delta")
      else if (ByteStore.isDirectory(ByteStore.resolve(path, "metadata")) &&
        ByteStore.list(ByteStore.resolve(path, "metadata"))
          .exists(_.endsWith(".metadata.json"))) Some("iceberg")
      else None
    } else if (name.endsWith(".bbf") && graft.sources.bbf.BbfStore.isBbf(path))
      Some("bbf")
    else if (name.endsWith(".warc") || name.endsWith(".warc.gz")) {
      // magic-validated: plain archives open with the version line,
      // compressed ones with the RFC 1952 member magic
      if (ByteStore.size(path) < 7) None
      else {
        val head = ByteStore.readRange(path, 0, 7)
        val plain = new String(head, java.nio.charset.StandardCharsets.US_ASCII)
          .startsWith("WARC/1.")
        val gz = (head(0) & 0xFF) == 0x1f && (head(1) & 0xFF) == 0x8b
        if (plain || gz) Some("warc") else None
      }
    }
    else if (name.endsWith(".cdx")) Some("cdx")
    else if (name.endsWith(".parquet")) Some("parquet")
    else if (stripCompressed(name).endsWith(".csv")) Some("csv")
    else if (stripCompressed(name).endsWith(".jsonl") ||
      stripCompressed(name).endsWith(".ndjson")) Some("jsonl")
    else if (name.endsWith(".arrow") || name.endsWith(".feather")) Some("arrow")
    else if (stripCompressed(name).endsWith(".txt") ||
      stripCompressed(name).endsWith(".odv")) Some("odv")
    else if (name.endsWith(".nc") || name.endsWith(".nc4") || name.endsWith(".cdf") ||
      name.endsWith(".h5") || name.endsWith(".hdf5") || name.endsWith(".tif") ||
      name.endsWith(".tiff")) {
      // magic: classic CDF vs HDF5 container vs TIFF
      if (ByteStore.size(path) < 4) None
      else {
        val head = ByteStore.readRange(path, 0, 4)
        if (head(0) == 'C' && head(1) == 'D' && head(2) == 'F') Some("netcdf")
        else if ((head(0) & 0xFF) == 0x89 && head(1) == 'H') Some("netcdf")
        else if ((head(0) == 'I' && head(1) == 'I') ||
          (head(0) == 'M' && head(1) == 'M')) Some("tiff")
        else None
      }
    } else None
  }

  /** read one classified dataset through the matching engine source */
  def readClassified(spark: SparkSession, format: String, path: String): DataFrame =
    format match {
      case "parquet" => graft.sources.FileCollection.parquet(spark, path)
      case "csv" => graft.sources.FileCollection.csv(spark, Seq(path), Map.empty)
      case "jsonl" => spark.read.json(path)
      case "arrow" => graft.sources.ArrowSource.read(spark, Seq(path))
      case "odv" => graft.sources.OdvSource.read(spark, Seq(path))
      case "warc" => graft.sources.WarcSource.read(spark, Seq(path))
      case "cdx" => graft.sources.CdxSource.read(spark, Seq(path))
      case "netcdf" | "hdf5" | "tiff" => graft.sources.netcdf.NetcdfSource.read(spark, Seq(path))
      case "zarr" => graft.sources.zarr.ZarrSource.read(spark, Seq(path))
      case "atlas" => graft.sources.atlas.AtlasSource.read(spark, path)
      case "icechunk" => graft.sources.icechunk.IcechunkSource.read(spark, path)
      case "bbf" => graft.sources.bbf.BbfSource.read(spark, Seq(path))
      case "delta" => graft.sources.delta.DeltaSource.read(spark, path)
      case "iceberg" => graft.sources.iceberg.IcebergSource.read(spark, path)
      case other => throw new IllegalArgumentException(s"unreadable format '$other'")
    }

  /** `<fmt>_schema` UDTF equivalent: the merged scan schema of a glob,
    * one row per column, without reading data */
  def describeFormat(spark: SparkSession, format: String, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    val df = format match {
      case "parquet" => graft.sources.FileCollection.parquet(spark, paths: _*)
      case "csv" => graft.sources.FileCollection.csv(spark, paths, Map.empty)
      case "arrow" => graft.sources.ArrowSource.read(spark, paths)
      case "odv" => graft.sources.OdvSource.read(spark, paths)
      case "netcdf" => graft.sources.netcdf.NetcdfSource.read(spark, paths)
      case "zarr" => graft.sources.zarr.ZarrSource.read(spark, paths)
      case "atlas" => graft.sources.atlas.AtlasSource.read(spark, paths.head)
      case "icechunk" => graft.sources.icechunk.IcechunkSource.read(spark, paths.head)
      case "bbf" => graft.sources.bbf.BbfSource.read(spark, paths)
      case other => throw new IllegalArgumentException(s"DESCRIBE FORMAT '$other' unsupported")
    }
    df.schema.fields.toSeq
      .map(f => (f.name, f.dataType.simpleString, f.nullable))
      .toDF("column_name", "data_type", "nullable")
  }

  private def spark(df: DataFrame): SparkSession = df.sparkSession
}
