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
    * binary-searchable index layout. @return rows written. */
  def write(cdx: DataFrame, dir: String, files: Int = 1): Long = {
    graft.sources.io.ByteStore.createDirectories(dir)
    val spark = cdx.sparkSession
    val rows = spark.sparkContext.longAccumulator("cdx_rows")
    val line = concat_ws(" ", col("surt"), col("ts"),
      to_json(struct(jsonSchema.fieldNames.toIndexedSeq.map(col): _*)))
    cdx.repartitionByRange(files, col("surt"), col("ts"))
      .sortWithinPartitions("surt", "ts")
      .select(line.as("line"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val target = graft.sources.io.ByteStore.resolve(dir, f"part-$pid%05d.cdx")
        val (local, publish) = graft.sources.io.ByteStore.stageOut(target)
        val out = new java.io.BufferedOutputStream(
          java.nio.file.Files.newOutputStream(local), 64 * 1024)
        try it.foreach { r =>
          out.write(r.getString(0).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          out.write('\n')
          rows.add(1)
        } finally { out.close(); publish() }
      }
    rows.value
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
    val lines = spark.read.textFile(paths: _*).toDF("line")
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
