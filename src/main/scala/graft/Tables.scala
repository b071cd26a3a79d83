package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical access to the driver-provided test tables (TESTDATA.md).
  *
  * All query entries in [[SparkEntry]] read through here so that
  * engine-vs-oracle normalization lives in exactly one place:
  *  - `events.ts` is stored as parquet TIMESTAMP(NANOS); Spark reads it
  *    as a raw long (nanosAsLong, see [[GraftSession]]) and we truncate
  *    to µs TimestampType — the same truncation DuckDB applies on
  *    `CAST(ts AS TIMESTAMP)`. (Reference keeps ns; documented
  *    divergence, SURVEY.md §7.3.)
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    name match {
      case "events" => normalizeEvents(df)
      case _        => df
    }
  }

  /** ts arrives as Long (ns since epoch) when read with nanosAsLong, or
    * as a TimestampType if some other writer produced µs. Normalize to
    * µs TimestampType either way (post-1970 data: truncating integer
    * division matches DuckDB's ns→µs cast). */
  private def normalizeEvents(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
}
