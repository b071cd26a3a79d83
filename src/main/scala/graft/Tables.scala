package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical access to the driver-provided test tables (TESTDATA.md).
  *
  * All query entries in [[SparkEntry]] read through here so that
  * engine-vs-oracle normalization lives in exactly one place. The
  * driver's generator has shipped timestamps two ways across rounds:
  *  - parquet TIMESTAMP(NANOS): Spark reads a raw long (nanosAsLong,
  *    see [[GraftSession]]); we truncate to µs TimestampType — the
  *    same truncation DuckDB applies on `CAST(ts AS TIMESTAMP)`.
  *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads
  *    TIMESTAMP_NTZ; DuckDB reads its naive TIMESTAMP. We re-type to
  *    µs TimestampType — the session TZ is pinned UTC, so the wall
  *    clock is preserved bit-for-bit and every downstream operator
  *    (windows, as-of joins, streaming watermarks) sees the single
  *    engine time type.
  * Both normalizations are type-only projections over the scan —
  * no shuffle, vectorized reader stays engaged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalize(spark.read.parquet(s"$sfDir/$name.parquet"))

  /** Re-type the event-time column `ts` to the engine's µs
    * TimestampType regardless of which physical flavor the generator
    * wrote (epoch-ns longs, or NTZ µs). Other timestamp columns
    * (o_orderdate, l_shipdate) have always surfaced as NTZ and stay
    * untouched — SUMMARIZE's type report and the as-of join's NTZ
    * comparisons pin that surface. */
  def normalize(df: DataFrame): DataFrame = {
    val needsWork = df.schema.fields.exists(f =>
      f.name == "ts" && (f.dataType == TimestampNTZType || f.dataType == LongType))
    if (!needsWork) return df
    val cols: Array[Column] = df.schema.fields.map { f =>
      f.dataType match {
        case LongType if f.name == "ts" =>
          // ns since epoch (post-1970 data: truncating integer division
          // matches DuckDB's ns→µs cast)
          timestamp_micros(expr(s"${f.name} div 1000")).as(f.name)
        case TimestampNTZType if f.name == "ts" =>
          // naive µs wall clock → engine µs instant (session TZ = UTC)
          col(f.name).cast(TimestampType).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
