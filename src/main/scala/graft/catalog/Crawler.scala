package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crawler-as-a-job (SURVEY §2.11: the reference's background dataset
  * discovery, crawler/discovery.rs, run synchronously): list a prefix,
  * classify files by format, group into candidate tables (one per
  * (directory, format)), register each group as an external table.
  * One deterministic pass; background scheduling (the reference's
  * manager.rs timers) lives in [[CrawlerScheduler]].
  *
  * Options (the reference's CrawlerDefinition fields,
  * crawler/definition.rs:39-58):
  *  - `format_filter` — comma-separated format ids; only those register.
  *  - `detect_partitions` (default true) — files under Hive-style
  *    `key=value/` segments group at the PARTITION ROOT and the root
  *    directory registers as one table, so Spark partition discovery
  *    surfaces the partition columns and partition pruning works;
  *    without it each leaf directory would register separately.
  *  - `table_prefix` — prepended to every discovered table name (the
  *    table_naming knob).
  */
object Crawler {

  /** one crawl pass; returns (table, format, files) per registration */
  def run(spark: SparkSession, catalog: GraftCatalog, root: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    val formatFilter = options.get("format_filter")
      .map(_.split(",").map(_.trim.toLowerCase).toSet)
    val detectParts = options.get("detect_partitions").forall(_.toBoolean)
    val prefix = options.getOrElse("table_prefix", "")
    val datasets = graft.sql.Outputs.listDatasets(spark, root)
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter { case (_, fmt) => formatFilter.forall(_(fmt.toLowerCase)) }
    val groups = datasets.groupBy { case (path, fmt) =>
      val p = java.nio.file.Paths.get(path)
      val dir = if (java.nio.file.Files.isDirectory(p)) p else p.getParent
      val grouped = if (detectParts) partitionRoot(dir.toString) else dir.toString
      (grouped, fmt)
    }
    val registered = groups.toSeq.sortBy(_._1).map { case ((dir, fmt), files) =>
      val base = java.nio.file.Paths.get(dir).getFileName.toString
      val name = prefix + sanitize(
        if (fmt == "zarr") java.nio.file.Paths.get(files.head._1).getFileName.toString
        else base)
      val partitioned = detectParts && files.exists { case (p, _) =>
        partitionRoot(java.nio.file.Paths.get(p).getParent.toString) !=
          java.nio.file.Paths.get(p).getParent.toString
      }
      // a Hive-partitioned group registers by its root directory so the
      // scan discovers (and prunes on) the partition columns
      if (fmt == "zarr")
        catalog.createExternalTable(name, fmt, files.map(_._1).toSeq)
      else if (partitioned)
        catalog.createExternalTable(name, fmt, Seq(dir),
          Map("hive_partitioned" -> "true"))
      else
        catalog.createExternalTable(name, fmt, files.map(_._1).toSeq)
      (name, fmt, files.length.toLong)
    }
    registered.toDF("table", "format", "n_files")
  }

  /** strip trailing Hive-style `key=value` segments */
  private[catalog] def partitionRoot(dir: String): String = {
    var d = java.nio.file.Paths.get(dir)
    while (d.getFileName != null && d.getFileName.toString.matches("[^=/]+=[^=/]*"))
      d = d.getParent
    d.toString
  }

  private def sanitize(s: String): String =
    s.replaceAll("\\.(zarr|parquet|csv|nc|arrow|bbf|warc|cdx)$", "")
      .replaceAll("[^A-Za-z0-9_]", "_")
}
