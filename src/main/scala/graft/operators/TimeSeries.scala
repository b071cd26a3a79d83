package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-interval time-series downsampling — the resample step of an
  * event-log pipeline (bars for metrics, rate limiting audits, training
  * telemetry). One shuffle on (bar, group); open/close ride struct
  * min/max aggregates ordered by (time, id) — the id breaks timestamp
  * ties so bars are deterministic — with NO second window pass, so the
  * plan is a single partial-aggregated groupBy at any scale.
  */
object TimeSeries {

  /** OHLC bars: per `barWidth` window and group, the first/last/extreme
    * values of `valueCol` plus the row count. Output: (bar_start,
    * groups…, bar_open, bar_high, bar_low, bar_close, n). */
  def ohlcBars(df: DataFrame, tsCol: String, idCol: String,
      valueCol: String, groupCols: Seq[String],
      barWidth: String = "1 day"): DataFrame = {
    val keys = window(col(tsCol), barWidth).as("__w") +: groupCols.map(col)
    df.groupBy(keys: _*)
      .agg(
        min(struct(col(tsCol), col(idCol), col(valueCol).as("__v"))).as("__first"),
        max(struct(col(tsCol), col(idCol), col(valueCol).as("__v"))).as("__last"),
        max(col(valueCol)).as("bar_high"),
        min(col(valueCol)).as("bar_low"),
        count(lit(1)).as("n"))
      .select(col("__w.start").as("bar_start") +: groupCols.map(col) ++: Seq(
        col("__first.__v").as("bar_open"),
        col("bar_high"), col("bar_low"),
        col("__last.__v").as("bar_close"), col("n")): _*)
  }
}
