package graft

import org.apache.spark.sql.SparkSession

/** Engine facade: one place that assembles a correctly-configured
  * SparkSession for the graft engine (the Spark-native re-expression of
  * the reference engine's runtime — see SURVEY.md §3.4; reference
  * session assembly at beacon-core/src/runtime_builder.rs:571-643).
  *
  * Scale notes (100 TB / 1000-executor design):
  *  - AQE on: runtime re-plan handles skew joins + partition coalescing,
  *    which replaces hand-tuned shuffle partition counts at scale.
  *  - Case-sensitive identifiers match the reference
  *    (enable_ident_normalization=false, runtime_builder.rs:927).
  *  - UTC session TZ so timestamp semantics are stable across the
  *    cluster and against the DuckDB oracle.
  *  - nanosAsLong: the reference stores ns timestamps (cf-decoding.md);
  *    Spark's TimestampType is µs. We read ns columns as raw longs and
  *    normalize at the table-loading layer (see [[Tables]]), keeping the
  *    vectorized parquet reader in play instead of failing the scan.
  */
object GraftSession {

  /** Mutating configs applied to an already-running session (tests /
    * driver-owned sessions where we don't control the builder). */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.caseSensitive", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.parquet.filterPushdown", "true")
    // µs parquet timestamps (default INT96 reads back as ns and breaks
    // schema comparison against the µs oracle)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    // parquet field-id column resolution: only engages for requested
    // schemas that carry `parquet.field.id` metadata (Delta column
    // mapping mode `id`); plain scans are unaffected
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    functions.GraftFunctions.registerAll(spark)
    spark
  }

  /** Standalone builder (local mode for tests; on a cluster the master /
    * memory knobs come from spark-submit, not from here). */
  def build(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    configure(spark)
  }
}
