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
    *
    * Hard edges made LOUD (not silent) at runtime, inside the same
    * window pass — no extra job:
    *  - `groupCols` must be non-empty: an ungrouped form would plan the
    *    rank self-join as a BroadcastNestedLoopJoin over the whole
    *    series (the nested-loop shape [[RangeJoin]] exists to avoid);
    *  - duplicate `orderCol` values within a group raise (the
    *    row_number tie order would otherwise make lag distances — and
    *    the EWMA — run-dependent);
    *  - |x·scale| ≥ 2^(61−maxLag) raises (the exact long numerator
    *    Σ v·2^(maxLag−lag) stays < 2^62 below it; Spark's default
    *    non-ANSI sum(long) would wrap SILENTLY past that while the
    *    oracle's HUGEINT keeps going).
    * Output: groups…, `orderCol`, x, ewma (6 decimals). */
  def ewmaHalf(df: DataFrame, groupCols: Seq[String], orderCol: String,
      valueCol: String, maxLag: Int = 40, scale: Long = 100L): DataFrame = {
    require(maxLag >= 0 && maxLag <= 45,
      s"ewma: maxLag must be in [0, 45], got $maxLag")
    require(scale > 0, s"ewma: scale must be positive, got $scale")
    require(groupCols.nonEmpty,
      "ewma: groupCols must be non-empty — an ungrouped EWMA would plan " +
        "the bounded-lag self-join as a nested loop over the whole series; " +
        "add a series key (or a constant bucket column sized to the data)")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col(orderCol))
    val rn = row_number().over(w)
    // both guards fold into the __v projection so they can't be pruned;
    // the lag rides the SAME window spec as row_number (one pass)
    val vLimit = 1L << (61 - maxLag)
    val vRaw = round(col("__x") * scale).cast("long")
    val prevOrd = lag(col(orderCol), 1).over(w)
    // null order values sort adjacently and would slip past an ===
    // duplicate check (null === null is null, not true) — reject them
    // outright, and use null-safe <=> gated on row position for the
    // duplicate detection so every tie shape raises
    val v = when(col(orderCol).isNull,
        raise_error(lit(s"ewma: null '$orderCol' value — an ordered " +
          "series cannot contain null order keys; filter or impute first")))
      .when(col("__rn") > 1 && (prevOrd <=> col(orderCol)),
        raise_error(concat(
          lit(s"ewma: duplicate '$orderCol' value within a group ("),
          col(orderCol).cast("string"),
          lit(") — the lag distances would be tie-order dependent; " +
            "deduplicate or pre-aggregate the series first"))))
      .when(abs(vRaw) >= vLimit,
        raise_error(concat(
          lit(s"ewma: |value|·scale exceeds 2^${61 - maxLag} ("),
          vRaw.cast("string"),
          lit(s") — the exact integer numerator would overflow a long; " +
            s"lower scale or maxLag"))))
      .otherwise(vRaw)
    val base = df.select(
      g ++ Seq(col(orderCol), col(valueCol).cast("double").as("__x")): _*)
      .withColumn("__rn", rn)
      .withColumn("__v", v)
    val r = base.select(
      groupCols.map(c => col(c).as(s"__g_$c")) ++
        Seq(col("__rn").as("__ri"), col("__v").as("__vi")): _*)
    val joinCond = groupCols.map(c => col(c) === col(s"__g_$c"))
      .reduce(_ && _) &&
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
