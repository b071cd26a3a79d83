package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.stats.FileStats

/** Scalar secondary indexes over a table's files — the engine's version
  * of the reference's managed-table indexes (docs sql/managed-tables.md
  * §CREATE INDEX: btree / bitmap / inverted over Lance). Re-expressed
  * for Spark's scan model: each index is a small parquet structure
  * keyed by FILE, and query planning consults it to shrink the scan's
  * file list before tasks exist (the [[graft.plans.IndexPruneRule]]
  * optimizer rule). At the reference's motivating scale a selective
  * query over a million-file table plans ~the files that matter.
  *
  *  - `btree`  — per-file min/max ranges ([[FileStats]] registry):
  *    prunes `=`, `<`, `<=`, `>`, `>=`, BETWEEN.
  *  - `bitmap` — per-file DISTINCT value sets (few-distinct columns;
  *    the build fails loudly past `bitmapCap` distinct values per file):
  *    prunes equality exactly, including values inside a btree range.
  *  - `inverted` — per-file token postings (maximal alphanumeric runs,
  *    case-preserved): prunes `contains(col, 'term')` and
  *    `LIKE '%term%'` for token-shaped terms. Sound because an
  *    alphanumeric substring always lies within one maximal
  *    alphanumeric token.
  *
  * All verdicts are computed distributed and only dropped file NAMES
  * reach the driver (same contract as [[FileStats.pruneFiles]]).
  * Indexes are conservative by construction: a file absent from the
  * index (added or renamed after the build) is always kept, and a file
  * whose live (size, mtime) no longer matches the build's `filemeta`
  * record (overwritten IN PLACE — easy on external tables) is treated
  * as unknown and also kept, so a stale index can never lose rows —
  * rebuild with CREATE INDEX to regain pruning after rewrites.
  */
object Indexes {

  final case class IndexDef(name: String, column: String, kind: String)

  val kinds = Set("btree", "bitmap", "inverted")

  /** distinct-values-per-file ceiling for bitmap builds — past this the
    * column isn't few-distinct and the build refuses (use btree) */
  val bitmapCap = 4096

  /** same URI-vs-path normalization as the stats registry */
  def norm(p: String): String = {
    val s = p.stripPrefix("file:")
    if (s.startsWith("//")) s.replaceFirst("^/+", "/") else s
  }

  /** live identity of a scanned file — a file overwritten IN PLACE since
    * the build (same path, new bytes) carries stale index entries and
    * must never be pruned */
  final case class FileMeta(path: String, size: Long, mtime: Long)

  /** (size, mtime) per file, one listStatus per parent directory so the
    * build pays O(dirs) RPCs, not O(files) */
  def fileMeta(spark: SparkSession, files: Seq[String]): Seq[FileMeta] = {
    val conf = spark.sparkContext.hadoopConfiguration
    files.groupBy(f => new org.apache.hadoop.fs.Path(f).getParent).toSeq
      .flatMap { case (parent, members) =>
        val fsys = parent.getFileSystem(conf)
        val wanted = members.map(norm).toSet
        fsys.listStatus(parent).toSeq
          .filter(st => wanted(norm(st.getPath.toString)))
          .map(st => FileMeta(norm(st.getPath.toString),
            st.getLen, st.getModificationTime))
      }
  }

  // ------------------------------------------------------------- build

  /** one distributed pass; writes the index structure under `dir` */
  def build(spark: SparkSession, kind: String, format: String,
      files: Seq[String], options: Map[String, String],
      column: String, dir: String): Unit = {
    // validity registry: pruning later requires the live (size, mtime)
    // to match what the build saw (ADVICE r7 — in-place overwrites)
    writeMeta(spark, files, dir)
    buildStructure(spark, kind, format, files, options, column, dir)
  }

  private def buildStructure(spark: SparkSession, kind: String, format: String,
      files: Seq[String], options: Map[String, String],
      column: String, dir: String): Unit = kind match {
    case "btree" =>
      // single-column stats pass (input_file_name survives projection)
      val df = spark.read.format(format).options(options).load(files: _*)
      FileStats.write(
        FileStats.collectFrom(df.select(col(quote(column)))), s"$dir/stats")
    case "bitmap" =>
      val df = spark.read.format(format).options(options).load(files: _*)
      val postings = df
        .select(input_file_name().as("file"),
          col(quote(column)).cast("string").as("v"))
        .filter(col("v").isNotNull)
        .distinct()
      // loud few-distinct contract, checked distributed
      val worst = postings.groupBy("file").count()
        .agg(max(col("count"))).collect()(0)
      val worstN = if (worst.isNullAt(0)) 0L else worst.getLong(0)
      require(worstN <= bitmapCap,
        s"bitmap index on $column: $worstN distinct values in one file " +
          s"(cap $bitmapCap) — use btree for high-cardinality columns")
      postings.coalesce(1).write.mode("overwrite").parquet(s"$dir/postings")
      indexedFileList(df).coalesce(1).write.mode("overwrite").parquet(s"$dir/files")
    case "inverted" =>
      val df = spark.read.format(format).options(options).load(files: _*)
      // range-partitioned + sorted by token: an exact-token probe then
      // reads only the part-files whose [min,max] token range covers the
      // term (VERDICT r7 hardening #2) — the substring fallback still
      // scans, but whole-token matches are bounded at any corpus size
      df.select(input_file_name().as("file"),
          explode(split(col(quote(column)).cast("string"),
            "[^A-Za-z0-9]+")).as("token"))
        .filter(length(col("token")) > 0)
        .distinct()
        // explicit N: AQE would coalesce the unspecified form to one
        // partition on small builds, collapsing the range layout the
        // exact probe depends on; the session's shuffle-partition conf
        // is the scale knob
        .repartitionByRange(spark.sessionState.conf.numShufflePartitions,
          col("token"))
        .sortWithinPartitions("token")
        .write.mode("overwrite").parquet(s"$dir/postings")
      // per-part-file token ranges, tiny (one row per postings file)
      spark.read.parquet(s"$dir/postings")
        .groupBy(input_file_name().as("part"))
        .agg(min("token").as("min_token"), max("token").as("max_token"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/tokenranges")
      indexedFileList(df).coalesce(1).write.mode("overwrite").parquet(s"$dir/files")
    case other => throw new IllegalArgumentException(
      s"unknown index type '$other' (btree, bitmap, inverted)")
  }

  /** the files covered by this build — posting absence is only
    * meaningful for files the build actually saw */
  private def indexedFileList(df: DataFrame): DataFrame =
    df.select(input_file_name().as("file")).distinct()

  // ------------------------------------------------------------- prune

  /** a single-column predicate extracted from a query plan */
  sealed trait IndexCond { def column: String }
  final case class RangeCond(column: String, op: String,
      num: Option[Double], str: Option[String]) extends IndexCond
  final case class EqCond(column: String, value: String) extends IndexCond
  /** substring containment (contains / LIKE '%term%') — postings scan */
  final case class TokenCond(column: String, term: String) extends IndexCond
  /** whole-token match (token_match) — exact, range-bounded lookup */
  final case class TokenEqCond(column: String, term: String) extends IndexCond

  /** normalized names of candidate files the index PROVES cannot match
    * `cond` — distributed, names-only collect; unknown files survive,
    * and so does any file whose live (size, mtime) no longer matches
    * the build's record (overwritten in place → index entries stale) */
  def droppedFiles(spark: SparkSession, dir: String, kind: String,
      current: Seq[FileMeta], cond: IndexCond): Set[String] = {
    val files = current.map(_.path)
    droppedByStructure(spark, dir, kind, files, cond)
      .intersect(validNames(spark, dir, current))
  }

  private def droppedByStructure(spark: SparkSession, dir: String, kind: String,
      files: Seq[String], cond: IndexCond): Set[String] = kind match {
    case "btree" =>
      val rc = cond.asInstanceOf[RangeCond]
      val all = files
      val kept = FileStats.pruneFiles(spark, s"$dir/stats", all,
        Seq(FileStats.Cond(rc.column, rc.op, rc.num, rc.str)))
      (all.map(norm).toSet -- kept.map(norm).toSet)
    case "bitmap" =>
      val v = cond.asInstanceOf[EqCond].value
      val matching = spark.read.parquet(s"$dir/postings")
        .filter(col("v") === v).select(col("file"))
      collectNames(spark, dir, matching)
    case "inverted" => cond match {
      case TokenCond(_, t) =>
        // substring semantics: any token CONTAINING t matches, which no
        // sort order can bound — full postings scan, the documented
        // fallback
        val matching = spark.read.parquet(s"$dir/postings")
          .filter(instr(col("token"), t) > 0).select(col("file"))
        collectNames(spark, dir, matching)
      case TokenEqCond(_, t) =>
        // exact token: only the postings part-files whose token range
        // covers t can hold a match
        val (candidates, _) = invertedProbeFootprint(spark, dir, t)
        val matching =
          if (candidates.isEmpty)
            spark.emptyDataFrame.withColumn("file", lit("")).limit(0)
          else spark.read.parquet(candidates: _*)
            .filter(col("token") === t).select(col("file"))
        collectNames(spark, dir, matching)
      case other => throw new IllegalStateException(s"inverted: $other")
    }
  }

  /** (candidate postings part-files for an exact probe of `term`, total
    * part-file count) — the bounded-read contract, spec-observable. A
    * pre-r8 index without `tokenranges` returns all parts (legacy
    * unbounded exact scan, still correct). Comparison uses UTF8String
    * binary order, matching Spark's min/max on strings. */
  def invertedProbeFootprint(spark: SparkSession, dir: String,
      term: String): (Seq[String], Int) = {
    val trPath = new org.apache.hadoop.fs.Path(s"$dir/tokenranges")
    val fsys = trPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val t = org.apache.spark.unsafe.types.UTF8String.fromString(term)
    if (!fsys.exists(trPath)) {
      val all = spark.read.parquet(s"$dir/postings").inputFiles.toSeq
      return (all, all.length)
    }
    val rows = spark.read.parquet(trPath.toString).collect()
    def u(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    val cands = rows.filter(r =>
      u(r.getString(1)).compareTo(t) <= 0 && t.compareTo(u(r.getString(2))) <= 0)
      .map(_.getString(0)).toSeq
    (cands, rows.length)
  }

  /** indexed-files EXCEPT files-with-a-matching-posting, normalized */
  private def collectNames(spark: SparkSession, dir: String,
      matching: DataFrame): Set[String] =
    spark.read.parquet(s"$dir/files")
      .except(matching)
      .collect().map(r => norm(r.getString(0))).toSet

  // --------------------------------------------------------- validity

  private def writeMeta(spark: SparkSession, files: Seq[String],
      dir: String): Unit = {
    import spark.implicits._
    fileMeta(spark, files).map(m => (m.path, m.size, m.mtime))
      .toDF("file", "size", "mtime")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/filemeta")
  }

  /** candidate files whose live identity matches the build's record —
    * only these may be dropped. An index built before this registry
    * existed keeps its legacy (path-only) semantics. Names+16 bytes per
    * file on the driver — same residency contract as the names-only
    * verdict collects. */
  private def validNames(spark: SparkSession, dir: String,
      current: Seq[FileMeta]): Set[String] = {
    val metaDir = new org.apache.hadoop.fs.Path(s"$dir/filemeta")
    val fsys = metaDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fsys.exists(metaDir)) return current.map(m => norm(m.path)).toSet
    val recorded = spark.read.parquet(metaDir.toString).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    current.filter(m => recorded.get(norm(m.path)).contains((m.size, m.mtime)))
      .map(m => norm(m.path)).toSet
  }

  private def quote(n: String): String = "`" + n.replace("`", "``") + "`"
}
