package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDXJ crawl-index source — the index layer over a WARC archive.
  *
  * A crawl index is what makes a 100 TB archive queryable without
  * scanning it: one line per captured record, `SURT timestamp14
  * {json}`, sorted by key, where the JSON block carries the original
  * url, mime, HTTP status, payload digest, the record's byte OFFSET in
  * its archive file, and the archive filename (the pywb / Common-Crawl
  * CDXJ shape). Readers range-scan the sorted keys, then fetch only
  * the referenced records ([[WarcSource.fetch]]) — never the archive
  * in full. The reference has no crawl formats (its domain is
  * scientific data); the surface here follows the public CDXJ
  * conventions directly.
  *
  * Scale: lines parse row-locally from Spark's splittable text source
  * (map-only, codegen `from_json`); [[index]] is a map-only projection
  * of a WARC scan; [[write]] range-partitions by key so each output
  * file is a sorted, non-overlapping key range — the layout a binary-
  * searchable index needs. Keys are SURTs and contain no spaces (the
  * format's own delimiter rule; URLs in CDX lines are percent-encoded).
  */
object CdxSource {

  /** JSON-block fields, in canonical line order */
  val jsonSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("mime", StringType),
    StructField("status", IntegerType),
    StructField("digest", StringType),
    StructField("length", LongType),
    StructField("offset", LongType),
    StructField("filename", StringType)))

  val schema: StructType = StructType(
    StructField("surt", StringType, nullable = false) +:
      StructField("ts", StringType, nullable = false) +:
      jsonSchema.fields.toIndexedSeq)

  /** Derive index rows from a WARC scan: one row per `response` record
    * with a target URI. `surt` keys on the normalized URI, `ts` is the
    * 14-digit capture timestamp, `digest` is the md5 hex of the HTTP
    * payload (documented: classic CDX tools write sha1-base32; the
    * digest only needs to be consistent within one index), `offset` /
    * `filename` point back into the archive for [[WarcSource.fetch]].
    * Map-only — no shuffle at any archive size. */
  def index(warc: DataFrame): DataFrame =
    warc.filter(col("warc_type") === "response" && col("target_uri").isNotNull)
      .select(
        graft.operators.TextOps.urlSurt(col("target_uri")).as("surt"),
        date_format(col("warc_date"), "yyyyMMddHHmmss").as("ts"),
        col("target_uri").as("url"),
        trim(substring_index(coalesce(col("http_content_type"), lit("")), ";", 1))
          .as("mime"),
        col("http_status").as("status"),
        md5(col("body")).as("digest"),
        col("content_length").as("length"),
        col("record_offset").as("offset"),
        regexp_extract(col("warc_file"), "([^/]+)$", 1).as("filename"))

  /** Write CDXJ: range-partition by (surt, ts) into `files` files,
    * each internally sorted — non-overlapping sorted runs, the
    * binary-searchable index layout. Each non-empty run also publishes
    * a `<file>.range` sidecar (two lines: min and max SURT) so
    * [[lookup]] can prune whole files at plan time without opening
    * them — the engine's ANALYZE-FILES stance ([[graft.stats
    * .FileStats]]) applied to its own index format. @return rows
    * written. */
  def write(cdx: DataFrame, dir: String, files: Int = 1): Long = {
    graft.sources.io.ByteStore.createDirectories(dir)
    val spark = cdx.sparkSession
    val rows = spark.sparkContext.longAccumulator("cdx_rows")
    val line = concat_ws(" ", col("surt"), col("ts"),
      to_json(struct(jsonSchema.fieldNames.toIndexedSeq.map(col): _*)))
    cdx.repartitionByRange(files, col("surt"), col("ts"))
      .sortWithinPartitions("surt", "ts")
      .select(col("surt"), line.as("line"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val target = graft.sources.io.ByteStore.resolve(dir, f"part-$pid%05d.cdx")
        val (local, publish) = graft.sources.io.ByteStore.stageOut(target)
        val out = new java.io.BufferedOutputStream(
          java.nio.file.Files.newOutputStream(local), 64 * 1024)
        // the partition is sorted, so the run's key range is simply
        // (first surt, last surt) — recorded while streaming the lines
        var minSurt: String = null
        var maxSurt: String = null
        try it.foreach { r =>
          if (minSurt == null) minSurt = r.getString(0)
          maxSurt = r.getString(0)
          out.write(r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          out.write('\n')
          rows.add(1)
        } finally { out.close(); publish() }
        if (minSurt != null) {
          // sidecar goes through the same stage+publish path as the data
          // file — a task killed mid-write must never leave a truncated
          // (but still two-line-parseable) range that misprunes later
          val (rLocal, rPublish) =
            graft.sources.io.ByteStore.stageOut(s"$target.range")
          java.nio.file.Files.write(rLocal,
            (minSurt + "\n" + maxSurt + "\n")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          rPublish()
        }
      }
    rows.value
  }

  /** The (min, max) SURT range of one index file: the `.range` sidecar
    * when present, else a first/last-line probe of the file's head and
    * tail bytes (legacy runs written before sidecars). None for an
    * empty run — nothing to scan there. */
  def fileRange(path: String): Option[(String, String)] = {
    import graft.sources.io.ByteStore
    if (ByteStore.exists(s"$path.range")) {
      ByteStore.readString(s"$path.range").split("\n").filter(_.nonEmpty) match {
        case Array(lo, hi) => Some((lo, hi))
        case _ => None
      }
    } else {
      val n = ByteStore.size(path)
      if (n == 0L) None
      else {
        def surtOf(line: String): String = line.takeWhile(_ != ' ')
        val headLen = math.min(n, 64L * 1024).toInt
        val head = new String(ByteStore.readRange(path, 0, headLen),
          java.nio.charset.StandardCharsets.UTF_8)
        val first = head.split("\n", 2)(0)
        val tailLen = math.min(n, 64L * 1024).toInt
        val tail = new String(ByteStore.readRange(path, n - tailLen, tailLen),
          java.nio.charset.StandardCharsets.UTF_8)
        // a tail candidate is only trustworthy if it provably STARTS a
        // line: either the window covers the whole file, or a '\n'
        // precedes it inside the window. Otherwise the window holds a
        // start-truncated fragment of a >64KiB line — surtOf(fragment)
        // would fabricate a lexically-wrong max key and silently prune
        // a file that intersects the range. Within the provably-
        // complete region, blank/whitespace-only trailing lines skip
        // (every line before a complete line is itself complete).
        val completeFrom =
          if (tailLen.toLong == n) 0
          else tail.indexOf('\n') match {
            case -1 => -1 // no line start inside the window
            case nl => nl + 1
          }
        val last =
          if (completeFrom < 0) None
          else tail.substring(completeFrom).split("\n").reverseIterator
            .find(_.trim.nonEmpty)
        // a line longer than the probe window can't yield a trustworthy
        // key — fall back to "unpruneable" rather than a wrong range
        if (!first.contains(' ') || !last.exists(_.contains(' '))) None
        else Some((surtOf(first), surtOf(last.get)))
      }
    }
  }

  /** Plan-time file pruning for a SURT key range [lo, hi): expands
    * `paths` (files or directories of `.cdx` runs) and keeps only
    * files whose recorded range intersects. Returns (kept, total) so
    * callers and specs can observe the pruning ratio. Driver-side over
    * tiny sidecars — the same registry-before-scan decision FileStats
    * makes; a terabyte-scale index prunes to ~1 file per point
    * lookup. A file with no derivable range stays in (correctness
    * before pruning). */
  def pruneFiles(paths: Seq[String], lo: String, hi: String): (Seq[String], Int) = {
    import graft.sources.io.ByteStore
    val files = paths.flatMap { p =>
      if (ByteStore.isDirectory(p))
        ByteStore.walkFiles(p).filter(_.endsWith(".cdx"))
      // the engine's own `.range` sidecars are pruning metadata, never
      // index lines — an expanded listing that includes them (e.g. the
      // DSL's stats-registry path) must not scan them as data
      else Seq(p).filterNot(_.endsWith(".cdx.range"))
    }.distinct.sorted
    val kept = files.filter { f =>
      fileRange(f) match {
        case Some((mn, mx)) => mn < hi && mx >= lo
        case None => ByteStore.size(f) > 0 // unprobeable: keep; empty: skip
      }
    }
    (kept, files.size)
  }

  /** Key-range lookup over a CDXJ index: prune files by their sidecar
    * ranges FIRST, then text-scan only the survivors and filter
    * `lo <= surt < hi`. Same rows as a full [[read]] + filter, opening
    * ~1 file per point lookup instead of every run — the read-side
    * half of [[write]]'s binary-searchable layout. */
  def lookup(spark: SparkSession, paths: Seq[String], lo: String,
      hi: String): DataFrame = {
    require(lo < hi, s"cdx lookup: empty key range [$lo, $hi)")
    val (kept, _) = pruneFiles(paths, lo, hi)
    if (kept.isEmpty)
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    else read(spark, kept).filter(col("surt") >= lo && col("surt") < hi)
  }

  /** Merge index GENERATIONS: the newest capture of each SURT key wins
    * (ties break on filename, then offset — fully deterministic), the
    * incremental-recrawl maintenance step: merge last month's index
    * with this week's crawl and lookups see one current row per URL.
    * One rank-window shuffle on the key; no driver-side state. */
  def latest(generations: DataFrame*): DataFrame = {
    require(generations.nonEmpty, "cdx latest: no generations given")
    val all = generations.reduce(_ unionByName _)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("surt")
      .orderBy(col("ts").desc, col("filename").desc, col("offset").desc)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Read CDXJ files/globs/dirs: Spark's splittable text scan + a
    * row-local three-way split and `from_json` — map-only. Blank lines
    * skip; a malformed JSON block surfaces as null fields (from_json's
    * PERMISSIVE contract), never a task failure. */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    // a directory of runs scans only its `.cdx` files — the `.range`
    // pruning sidecars ride alongside and are not index lines. Expand
    // directories by listing (a zero-match glob would throw, so a dir
    // that exists but holds no runs reads as an empty index instead)
    val expanded = paths.flatMap { p =>
      if (graft.sources.io.ByteStore.isDirectory(p))
        graft.sources.io.ByteStore.walkFiles(p).filter(_.endsWith(".cdx"))
      // `.range` pruning sidecars are metadata, not index lines — drop
      // them even from explicit file lists (expanded listings include
      // them, and two spurious rows per run would corrupt every read)
      else Seq(p).filterNot(_.endsWith(".cdx.range"))
    }
    if (expanded.isEmpty)
      return spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    val lines = spark.read.textFile(expanded: _*).toDF("line")
      .filter(trim(col("line")) =!= "")
    lines.select(
      regexp_extract(col("line"), "^(\\S+)", 1).as("surt"),
      regexp_extract(col("line"), "^\\S+ (\\S+)", 1).as("ts"),
      from_json(regexp_replace(col("line"), "^\\S+ \\S+ ", ""), jsonSchema)
        .as("j"))
      .select(col("surt") +: col("ts") +:
        jsonSchema.fieldNames.toIndexedSeq.map(f => col(s"j.$f").as(f)): _*)
  }
}
