package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crawler-as-a-job (SURVEY §2.11: the reference's background dataset
  * discovery, crawler/discovery.rs, run synchronously): list a prefix,
  * classify files by format, group into candidate tables (one per
  * (directory, format)), register each group as an external table.
  * Scheduling is the caller's concern (cron/Airflow/streaming trigger)
  * — the engine exposes the single deterministic pass.
  */
object Crawler {

  /** one crawl pass; returns (table, format, files) per registration */
  def run(spark: SparkSession, catalog: GraftCatalog, root: String): DataFrame = {
    import spark.implicits._
    val datasets = graft.sql.Outputs.listDatasets(spark, root)
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
    val groups = datasets.groupBy { case (path, fmt) =>
      val p = java.nio.file.Paths.get(path)
      val dir = if (java.nio.file.Files.isDirectory(p)) p else p.getParent
      (dir.toString, fmt)
    }
    val registered = groups.toSeq.sortBy(_._1).map { case ((dir, fmt), files) =>
      val base = java.nio.file.Paths.get(dir).getFileName.toString
      val name = sanitize(
        if (fmt == "zarr") java.nio.file.Paths.get(files.head._1).getFileName.toString
        else base)
      val paths =
        if (fmt == "zarr") files.map(_._1).toSeq
        else files.map(_._1).toSeq
      catalog.createExternalTable(name, fmt, paths)
      (name, fmt, paths.length.toLong)
    }
    registered.toDF("table", "format", "n_files")
  }

  private def sanitize(s: String): String =
    s.replaceAll("\\.(zarr|parquet|csv|nc|arrow|bbf)$", "").replaceAll("[^A-Za-z0-9_]", "_")
}
