package graft.sources.bbf

import java.nio.file.Path

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's beacon-binary-format-toolbox re-expressed as library
  * calls (beacon-binary-format-toolbox/src/{create,list,update}):
  * convert a mixed-format file collection into one multi-entry `.bbf`
  * (entry = input file, named by its file name), list footers and the
  * pruning index, logically delete entries, and update a column's
  * declared datatype in place.
  */
object BbfTools {

  /** toolbox `create` (create/mod.rs): every file matched by the globs
    * becomes ONE ENTRY named by its file name; format dispatch is by
    * extension (parquet | csv | nc — via the ND flatten rule, so
    * multi-dimensional variables arrive as flattened rows — | arrow).
    * `skipOnError` mirrors the toolbox flag: unreadable files are
    * skipped instead of failing the conversion.
    * @return total rows written */
  def create(spark: SparkSession, globs: Seq[String], output: Path,
      blockRows: Int = 65536, skipOnError: Boolean = false): Long = {
    val files = graft.sources.FileCollection.expandGlobs(spark, globs)
    require(files.nonEmpty, s"bbf create: no files match ${globs.mkString(",")}")
    val entries = files.flatMap { f =>
      val name = f.substring(f.lastIndexOf('/') + 1)
      try Some(name -> readByExtension(spark, f))
      catch {
        case scala.util.control.NonFatal(e) =>
          if (skipOnError) None
          else throw new IllegalArgumentException(s"bbf create: cannot read $f: ${e.getMessage}", e)
      }
    }
    require(entries.nonEmpty, "bbf create: every input file failed to read")
    BbfStore.Writer.write(output, entries, blockRows)
  }

  private def readByExtension(spark: SparkSession, f: String): DataFrame = {
    val lower = f.toLowerCase
    if (lower.endsWith(".parquet")) graft.sources.FileCollection.parquet(spark, f)
    else if (lower.endsWith(".csv")) graft.sources.FileCollection.csv(spark, Seq(f), Map.empty)
    else if (lower.endsWith(".nc") || lower.endsWith(".nc4") || lower.endsWith(".h5") ||
      lower.endsWith(".hdf5") || lower.endsWith(".cdf"))
      graft.sources.netcdf.NetcdfSource.read(spark, Seq(f))
    else if (lower.endsWith(".arrow") || lower.endsWith(".feather") || lower.endsWith(".ipc"))
      graft.sources.ArrowSource.read(spark, Seq(f))
    else throw new IllegalArgumentException(
      s"bbf create: unsupported input extension: $f (parquet|csv|nc|arrow)")
  }

  /** toolbox `list footer` (list/footer.rs): one row per entry with its
    * row/block counts and logical-delete state; `pattern` filters entry
    * names by regex (list/datasets_regex.rs). */
  def listEntries(spark: SparkSession, path: String,
      pattern: Option[String] = None): DataFrame = {
    import spark.implicits._
    val re = pattern.map(_.r)
    BbfStore.open(path).entries
      .filter(e => re.forall(_.findFirstIn(e.name).isDefined))
      .map(e => (e.name, e.rows, e.blocks.size, e.deleted,
        e.schema.map { case (n, dt) => s"$n:$dt" }.mkString(",")))
      .toDF("entry", "rows", "n_blocks", "deleted", "schema")
  }

  /** toolbox `list pruning-index` (list/pruning_index.rs): every
    * (entry, block, column) statistics row the planner prunes on. */
  def pruningIndex(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val rows = for {
      e <- BbfStore.open(path).entries
      (b, bi) <- e.blocks.zipWithIndex
      (cn, c) <- b.columns.toSeq.sortBy(_._1)
    } yield (e.name, bi, cn, b.rows.toLong, c.stats.nullCount,
      c.stats.numMin.map(_.toString).orElse(c.stats.strMin).orNull,
      c.stats.numMax.map(_.toString).orElse(c.stats.strMax).orNull,
      c.codec)
    rows.toDF("entry", "block", "column", "rows", "null_count", "min", "max", "codec")
  }

  /** Logical entry delete: the data section is untouched; the footer
    * marks the entry deleted and scans skip it (the reference reader's
    * entries_logical_deletes surface). */
  def deleteEntry(path: Path, entry: String): Unit =
    BbfStore.rewriteFooter(path, { entries =>
      require(entries.exists(_.name == entry),
        s"bbf delete: entry '$entry' not in $path (have ${entries.map(_.name).mkString(",")})")
      entries.map(e => if (e.name == entry) e.copy(deleted = true) else e)
    })

  /** restore a logically deleted entry */
  def undeleteEntry(path: Path, entry: String): Unit =
    BbfStore.rewriteFooter(path, _.map(e =>
      if (e.name == entry) e.copy(deleted = false) else e))

  /** dtype pairs whose byte encodings are identical, so the declared
    * type can change without touching data: 4-byte int32 ↔ date (epoch
    * days), 8-byte int64 ↔ timestamp (epoch micros) — THE toolbox use
    * case: fixing a mis-typed epoch column after conversion. */
  private val reinterpretable: Set[(String, String)] = Set(
    ("int32", "date"), ("date", "int32"),
    ("int64", "timestamp"), ("timestamp", "int64"))

  /** toolbox `update schema` (update/update_schema.rs FooterUpdater):
    * in-place declared-datatype update of one column across every entry
    * that has it. Only reinterpretation-safe pairs are allowed — a
    * width-changing update would silently mis-decode every chunk. */
  def updateDatatype(path: Path, column: String, newDtype: String): Unit = {
    require(BbfStore.Dtypes.contains(newDtype),
      s"bbf update: unknown dtype '$newDtype' (have ${BbfStore.Dtypes.mkString(",")})")
    BbfStore.rewriteFooter(path, { entries =>
      val hit = entries.flatMap(_.schema).collectFirst { case (n, dt) if n == column => dt }
      require(hit.isDefined, s"bbf update: no entry has column '$column' in $path")
      entries.map { e =>
        e.copy(schema = e.schema.map {
          case (n, dt) if n == column && dt != newDtype =>
            require(reinterpretable.contains((dt, newDtype)),
              s"bbf update: $dt -> $newDtype is not reinterpretation-safe " +
                s"(allowed: ${reinterpretable.map(p => s"${p._1}->${p._2}").mkString(", ")})")
            (n, newDtype)
          case other => other
        })
      }
    })
  }
}
