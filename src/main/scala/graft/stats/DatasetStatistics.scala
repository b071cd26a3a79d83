package graft.stats

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `DESCRIBE STATISTICS '<path>'` + `SHOW STATISTICS CACHE` — the
  * reference's statistics table functions
  * (beacon-functions/src/metadata/view_dataset_statistics.rs and
  * view_statistics_cache.rs): per-column (min, max) for one dataset
  * file of ANY readable format, served from a cache validated by file
  * size AND last-modified time; a miss computes the statistics in one
  * distributed aggregation and populates the cache so repeat calls
  * against an unchanged file are free. The cache view streams every
  * entry with its current validity.
  *
  * Output schema matches the reference's contract: (column_name,
  * data_type, min_value, max_value, is_exact) with textual min/max —
  * typed min/max would pin the schema to per-format type lattices.
  */
object DatasetStatistics {

  final case class ColStat(column: String, dataType: String,
      min: Option[String], max: Option[String], exact: Option[Boolean])
  private final case class Entry(size: Long, mtime: Long, stats: Seq[ColStat])

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  /** observable for specs: number of full computations (cache misses) */
  val computations = new java.util.concurrent.atomic.AtomicLong(0)

  private def outDf(spark: SparkSession, stats: Seq[ColStat]): DataFrame = {
    import spark.implicits._
    stats.map(s => (s.column, s.dataType, s.min.orNull, s.max.orNull,
        s.exact.map(java.lang.Boolean.valueOf).orNull))
      .toDF("column_name", "data_type", "min_value", "max_value", "is_exact")
  }

  def describe(spark: SparkSession, path: String): DataFrame = {
    val p = Paths.get(graft.sources.io.ByteStore.toLocal(path))
    require(Files.exists(p), s"DESCRIBE STATISTICS: no such path: $p")
    val (size, mtime) = fingerprint(p)
    val hit = Option(cache.get(p.toString)).filter(e => e.size == size && e.mtime == mtime)
    val stats = hit.map(_.stats).getOrElse {
      val computed = compute(spark, p.toString)
      if (cache.size > 256) cache.clear() // bounded like the source caches
      cache.put(p.toString, Entry(size, mtime, computed))
      computed
    }
    outDf(spark, stats)
  }

  private def fingerprint(p: java.nio.file.Path): (Long, Long) = {
    // a store directory fingerprints as the sum over its regular files
    if (Files.isDirectory(p)) {
      var size = 0L; var mtime = 0L
      val stream = Files.walk(p)
      try {
        val it = stream.iterator()
        while (it.hasNext) {
          val f = it.next()
          if (Files.isRegularFile(f)) {
            size += Files.size(f)
            mtime = math.max(mtime, Files.getLastModifiedTime(f).toMillis)
          }
        }
      } finally stream.close()
      (size, mtime)
    } else (Files.size(p), Files.getLastModifiedTime(p).toMillis)
  }

  private def compute(spark: SparkSession, path: String): Seq[ColStat] = {
    computations.incrementAndGet()
    val fmt = graft.sql.Outputs.classifyPath(path).getOrElse(
      throw new IllegalArgumentException(
        s"DESCRIBE STATISTICS: unrecognized dataset format: $path"))
    val df = graft.sql.Outputs.readClassified(spark, fmt, path)
    val fields = df.schema.fields
    def comparable(t: DataType): Boolean = t match {
      case _: NumericType | StringType | BooleanType | DateType |
           TimestampType | TimestampNTZType => true
      case _ => false
    }
    val aggs = fields.flatMap { f =>
      val c = col("`" + f.name.replace("`", "``") + "`")
      if (comparable(f.dataType))
        Seq(min(c).cast(StringType).as(s"__mn_${f.name}"),
          max(c).cast(StringType).as(s"__mx_${f.name}"))
      else Seq.empty
    }
    if (aggs.isEmpty)
      return fields.map(f => ColStat(f.name, f.dataType.simpleString, None, None, None)).toSeq
    val row = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).collect()(0)
    fields.map { f =>
      if (comparable(f.dataType)) {
        val mn = Option(row.getAs[String](s"__mn_${f.name}"))
        val mx = Option(row.getAs[String](s"__mx_${f.name}"))
        ColStat(f.name, f.dataType.simpleString, mn, mx, Some(true))
      } else ColStat(f.name, f.dataType.simpleString, None, None, None)
    }.toSeq
  }

  /** `SHOW STATISTICS CACHE`: every cached (file × column) entry with
    * its current validity (head-check against size + mtime) */
  def showCache(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = scala.collection.mutable.ArrayBuffer.empty[
      (String, Long, Boolean, String, String, String, String, Boolean)]
    cache.forEach { (path, e) =>
      val p = Paths.get(path)
      val valid = Files.exists(p) && fingerprint(p) == ((e.size, e.mtime))
      e.stats.foreach { s =>
        rows += ((path, e.size, valid, s.column, s.dataType,
          s.min.orNull, s.max.orNull, s.exact.getOrElse(false)))
      }
    }
    rows.sortBy(r => (r._1, r._4)).toSeq.toDF(
      "path", "file_size", "is_valid", "column_name", "data_type",
      "min_value", "max_value", "is_exact")
  }
}
