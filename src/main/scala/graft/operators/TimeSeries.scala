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

  /** Dyadic EWMA (α = ½) over an ordered series per group:
    * smoothed_t = Σ_{i: t−maxLag ≤ i ≤ t} x_i·2^{−(t−i)} / Σ 2^{−(t−i)}.
    * The whole computation is INTEGER — values scale to `scale`-ths,
    * weights are left-shifts, the numerator/denominator sums are exact
    * longs — so summation order cannot move a bit and the result
    * replays identically in SQL (a float EWMA's partial sums would
    * drift between engines). The lag cap is part of the contract (a
    * 2^{−40} weight is far below double ulp anyway) and bounds the
    * self-join at maxLag rows per element — designed for DOWNSAMPLED
    * series (bars), where rows per group are already bounded.
    * Overflow guard: scale·max|x|·2^maxLag·(maxLag+1) must fit a long
    * — loud at runtime via the exact integer sum. Output: groups…,
    * `orderCol`, x, ewma (6 decimals). */
  def ewmaHalf(df: DataFrame, groupCols: Seq[String], orderCol: String,
      valueCol: String, maxLag: Int = 40, scale: Long = 100L): DataFrame = {
    require(maxLag >= 0 && maxLag <= 45,
      s"ewma: maxLag must be in [0, 45], got $maxLag")
    require(scale > 0, s"ewma: scale must be positive, got $scale")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val rn = row_number().over(
      Window.partitionBy(g: _*).orderBy(col(orderCol)))
    val base = df.select(
      g ++ Seq(col(orderCol), col(valueCol).cast("double").as("__x")): _*)
      .withColumn("__rn", rn)
      .withColumn("__v", round(col("__x") * scale).cast("long"))
    val r = base.select(
      groupCols.map(c => col(c).as(s"__g_$c")) ++
        Seq(col("__rn").as("__ri"), col("__v").as("__vi")): _*)
    val joinCond = groupCols.map(c => col(c) === col(s"__g_$c"))
      .reduceOption(_ && _).getOrElse(lit(true)) &&
      col("__ri") <= col("__rn") && col("__ri") > col("__rn") - (maxLag + 1)
    base.join(r, joinCond)
      .groupBy(g ++ Seq(col(orderCol), col("__x")): _*)
      .agg(
        sum(col("__vi") * call_function("shiftleft", lit(1L),
          (lit(maxLag) - (col("__rn") - col("__ri"))).cast("int"))).as("__num"),
        sum(call_function("shiftleft", lit(1L),
          (lit(maxLag) - (col("__rn") - col("__ri"))).cast("int"))).as("__den"))
      .select(g ++ Seq(col(orderCol), col("__x").as(valueCol),
        round(col("__num") / (col("__den") * lit(scale.toDouble)), 6)
          .as("ewma")): _*)
  }

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
