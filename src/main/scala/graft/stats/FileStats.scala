package graft.stats

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-file column statistics + scan pruning — the engine's version of
  * the reference's file-statistics service (beacon-core/src/
  * file_stats.rs; docs internals/file-statistics.md): a background /
  * on-demand pass records per-file per-column min/max + row/null
  * counts; scans consult the registry and skip files whose range
  * cannot satisfy the predicate. This is what makes a million-file
  * archive queryable: a selective query opens ~the files that matter,
  * not the archive.
  *
  * Spark-first shape: collection is ONE distributed aggregation
  * grouped by `input_file_name()` (no per-file driver loop), the
  * registry is a plain parquet table under the warehouse, and pruning
  * is a driver-side filter over the (tiny) registry before the scan's
  * file list is built — the same planInputPartitions-time decision a
  * DSv2 FileIndex would make, without private Spark APIs.
  */
object FileStats {

  /** long-format registry: one row per (file, column) */
  val registrySchema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("column", StringType, nullable = false),
    StructField("min_num", DoubleType, nullable = true),
    StructField("max_num", DoubleType, nullable = true),
    StructField("min_str", StringType, nullable = true),
    StructField("max_str", StringType, nullable = true),
    StructField("n_nulls", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = false)))

  /** one distributed pass over all files: min/max/nulls per column,
    * grouped by source file */
  def collect(spark: SparkSession, format: String, files: Seq[String],
      options: Map[String, String] = Map.empty): DataFrame =
    collectFrom(spark.read.format(format).options(options).load(files: _*))

  /** [[collect]] over an existing frame — callers project first to
    * stat a column subset (e.g. a single-column btree index build) */
  def collectFrom(df: DataFrame): DataFrame = {
    val cols = df.schema.fields
    val perFile = df.withColumn("__file", input_file_name())
      .groupBy(col("__file"))
      .agg(count(lit(1)).as("__n"),
        cols.flatMap { f =>
          val c = col("`" + f.name.replace("`", "``") + "`")
          // numeric stats as double; temporal types go through epoch
          // seconds (TIMESTAMP_NTZ/DATE have no direct double cast)
          val numExpr: Column =
            if (f.dataType.isInstanceOf[NumericType] || f.dataType == BooleanType ||
              f.dataType == TimestampType) c.cast(DoubleType)
            else if (f.dataType == TimestampNTZType || f.dataType == DateType)
              c.cast(TimestampType).cast(DoubleType)
            else null
          Seq(
            (if (numExpr != null) min(numExpr) else lit(null).cast(DoubleType))
              .as(s"__min_num_${f.name}"),
            (if (numExpr != null) max(numExpr) else lit(null).cast(DoubleType))
              .as(s"__max_num_${f.name}"),
            (if (f.dataType == StringType) min(c) else lit(null).cast(StringType))
              .as(s"__min_str_${f.name}"),
            (if (f.dataType == StringType) max(c) else lit(null).cast(StringType))
              .as(s"__max_str_${f.name}"),
            sum(when(c.isNull, 1L).otherwise(0L)).as(s"__nulls_${f.name}"))
        }.toIndexedSeq: _*)
    // unpivot to long format
    val entries = cols.map { f =>
      struct(lit(f.name).as("column"),
        col(s"`__min_num_${f.name}`").as("min_num"),
        col(s"`__max_num_${f.name}`").as("max_num"),
        col(s"`__min_str_${f.name}`").as("min_str"),
        col(s"`__max_str_${f.name}`").as("max_str"),
        col(s"`__nulls_${f.name}`").as("n_nulls"))
    }
    perFile.select(col("__file").as("file"), col("__n").as("n_rows"),
        explode(array(entries.toIndexedSeq: _*)).as("e"))
      .select(col("file"), col("e.column").as("column"),
        col("e.min_num"), col("e.max_num"), col("e.min_str"), col("e.max_str"),
        col("e.n_nulls"), col("n_rows"))
  }

  def write(stats: DataFrame, dir: String): Unit =
    stats.coalesce(1).write.mode("overwrite").parquet(dir)

  def load(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(registrySchema).parquet(dir)

  /** a pruning condition on one column (numeric or lexicographic) */
  final case class Cond(column: String, op: String, num: Option[Double], str: Option[String]) {
    def satisfiable(minN: Option[Double], maxN: Option[Double],
        minS: Option[String], maxS: Option[String], nRows: Long, nNulls: Long): Boolean = {
      def test[T](mn: T, mx: T, v: T)(implicit ord: Ordering[T]): Boolean = op match {
        case "eq"  => ord.lteq(mn, v) && ord.lteq(v, mx)
        case "gt"  => ord.gt(mx, v)
        case "gte" => ord.gteq(mx, v)
        case "lt"  => ord.lt(mn, v)
        case "lte" => ord.lteq(mn, v)
        case _     => true
      }
      (num, minN, maxN) match {
        case (Some(v), Some(mn), Some(mx)) => test(mn, mx, v)
        case _ =>
          (str, minS, maxS) match {
            case (Some(v), Some(mn), Some(mx)) => test(mn, mx, v)
            // all-NULL column (no min/max recorded): only IS NOT NULL-ish
            // conds could prune; value conds can't match any row, but we
            // stay conservative and keep the file
            case _ => true
          }
      }
    }
  }

  /** URI-vs-path normalization (input_file_name yields file:///…) */
  private def norm(p: String): String = {
    val s = p.stripPrefix("file:")
    if (s.startsWith("//")) s.replaceFirst("^/+", "/") else s
  }

  /** [[norm]] as a codegen'd Column (same contract, evaluated on
    * executors so the registry never leaves the cluster un-aggregated) */
  private def normCol(c: Column): Column = {
    val stripped = regexp_replace(c, lit("^file:"), lit(""))
    when(stripped.startsWith("//"), regexp_replace(stripped, lit("^/+"), lit("/")))
      .otherwise(stripped)
  }

  /** registry row (one file×column's recorded range) provably cannot
    * satisfy `c` — the Column-space negation of [[Cond.satisfiable]]:
    * numeric range applies first, string range only when numeric stats
    * are absent, missing stats never prune */
  private def unsatCol(c: Cond): Column = {
    def neg[T](mn: Column, mx: Column, v: T): Column = c.op match {
      case "eq"  => lit(v) < mn || lit(v) > mx
      case "gt"  => mx <= lit(v)
      case "gte" => mx < lit(v)
      case "lt"  => mn >= lit(v)
      case "lte" => mn > lit(v)
      case _     => lit(false)
    }
    val numeric = c.num match {
      case Some(v) => col("min_num").isNotNull && col("max_num").isNotNull &&
        neg(col("min_num"), col("max_num"), v)
      case None => lit(false)
    }
    val string = c.str match {
      case Some(v) => (col("min_num").isNull || col("max_num").isNull ||
        c.num.isEmpty) && col("min_str").isNotNull && col("max_str").isNotNull &&
        neg(col("min_str"), col("max_str"), v)
      case None => lit(false)
    }
    col("column") === c.column && (numeric || string)
  }

  /** Distributed verdict: the (normalized) candidate files the registry
    * proves CANNOT satisfy `conds`. The registry is semi-joined to the
    * candidate set and the per-file any-condition-unsatisfiable verdict
    * is aggregated on executors — only dropped file NAMES reach the
    * driver (≤ candidate count; the registry itself, rows ∝ files ×
    * columns, never does). This is what survives the reference's own
    * motivating scale: a 1M-file archive (docs internals/
    * file-statistics.md) plans a selective query without a
    * million-row collect. */
  private[graft] def droppedFiles(spark: SparkSession, statsDir: String,
      files: Seq[String], conds: Seq[Cond]): DataFrame = {
    import spark.implicits._
    val cand = files.map(norm).toDF("cand_file")
    val candJ = if (files.size <= 100000) broadcast(cand) else cand
    load(spark, statsDir)
      .filter(col("column").isin(conds.map(_.column).distinct: _*))
      .withColumn("nfile", normCol(col("file")))
      .join(candJ, col("nfile") === col("cand_file"), "left_semi")
      .groupBy(col("nfile"))
      .agg(max(conds.map(unsatCol).reduce(_ || _)).as("drop"))
      .filter(col("drop"))
      .select(col("nfile"))
  }

  /** files whose recorded ranges can satisfy every condition (files
    * absent from the registry are kept — pruning is never lossy) */
  def pruneFiles(spark: SparkSession, statsDir: String, files: Seq[String],
      conds: Seq[Cond]): Seq[String] = {
    if (conds.isEmpty) return files
    val dropped = droppedFiles(spark, statsDir, files, conds)
      .collect().map(_.getString(0)).toSet
    files.filterNot(f => dropped(norm(f)))
  }
}
