package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization and in-session funnels over an event log —
  * the batch half of the engine's session surface (the streaming state
  * machine is [[graft.streaming.EventStreams.sessionize]]; this is the
  * replay/backfill form of the same contract: a session breaks where
  * the gap from the user's previous event exceeds the threshold).
  *
  * Scale notes: everything here shuffles ONCE on the user key (the
  * window partition); the session id is a cumulative sum inside that
  * window, so a 1000-executor cluster shards users horizontally and no
  * user's history ever leaves one task. The funnel's per-step joins
  * reuse the same (user, session) key, so AQE coalesces them onto the
  * existing exchange. All arithmetic is integer epoch-µs over built-in
  * codegen'd functions — the DuckDB oracle replays it bit-for-bit.
  */
object Sessions {

  /** epoch µs of the event time — the arithmetic both engines share.
    * NTZ columns cast to the instant type first (digit-preserving under
    * the engine's UTC session) so a SESSIONIZE over an NTZ table works. */
  private def tsUs(tsCol: String): Column =
    unix_micros(col(tsCol).cast("timestamp"))

  /** events + `session_seq` (1-based per user, in time order): a new
    * session starts where the gap from the previous event exceeds
    * `gapMinutes`. Tie-safe: equal timestamps always land in the same
    * session (their gap is 0), so the ROWS-frame cumsum is
    * deterministic under any tie order. */
  private def assign(events: DataFrame, userCol: String, tsCol: String,
      gapMinutes: Int): DataFrame = {
    require(gapMinutes > 0,
      s"sessions: gapMinutes must be positive, got $gapMinutes")
    val w = Window.partitionBy(userCol).orderBy(tsCol)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = gapMinutes * 60L * 1000000L
    val prev = lag(tsUs(tsCol), 1).over(w)
    val brk = when(prev.isNull || tsUs(tsCol) - prev > gapUs, 1L)
      .otherwise(0L)
    events.withColumn("session_seq", sum(brk).over(cum))
  }

  /** One row per (user, session): start/end, event count, and the
    * value sum when `valueCol` is given. */
  def gapSessions(events: DataFrame, userCol: String, tsCol: String,
      gapMinutes: Int, valueCol: Option[String] = None): DataFrame = {
    val aggs = Seq(
      min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_end"),
      count(lit(1)).as("n_events")) ++
      valueCol.map(v => sum(col(v)).as("total_value"))
    assign(events, userCol, tsCol, gapMinutes)
      .groupBy(col(userCol), col("session_seq"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Ordered-step conversion funnel within sessions: step i completes
    * at the EARLIEST event of type `steps(i)` strictly after step i−1's
    * completion (step 0: any time in the session); a session that
    * skips a step completes nothing after it. One row per session with
    * `steps_completed` ∈ [0, k] and per-step completion times
    * (`step1_us` … epoch µs, null where not reached).
    *
    * ONE PASS (r14 — replaces the k join-and-aggregate rounds): each
    * session's events collect into one (time, type)-sorted array on
    * the SAME user-key shuffle sessionization already pays, and a
    * single `aggregate` fold walks the funnel greedily — the first
    * `steps(i)`-typed event strictly after step i−1's time is exactly
    * the per-step min the old joins computed (the array is time-
    * sorted, so first-match ≡ earliest; the strictly-after rule makes
    * equal-timestamp ties order-independent). Plan cost is one shuffle
    * total for ANY step count, and adding a step is free. A session's
    * event array is memory-bounded by the gap contract itself (a
    * session is one user's burst, not their history). */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], gapMinutes: Int): DataFrame = {
    require(steps.nonEmpty, "funnel: steps must be non-empty")
    val k = steps.size
    val stepsArr = array(steps.map(lit): _*)
    val grouped = assign(events, userCol, tsCol, gapMinutes)
      .select(col(userCol), col("session_seq"),
        col(typeCol).as("__t"), tsUs(tsCol).as("__us"))
      .groupBy(col(userCol), col("session_seq"))
      .agg(array_sort(collect_list(struct(col("__us"), col("__t"))))
        .as("__evs"))
    // fold state: (prev = last completed step's time, times = completed
    // step times so far); an event advances the walk iff the next step
    // is still open, the type matches, and it's strictly after prev
    val walk = aggregate(
      col("__evs"),
      struct(lit(Long.MinValue).as("prev"),
        array().cast("array<long>").as("times")),
      (acc, e) => {
        val nTimes = size(acc.getField("times"))
        val advance = nTimes < k &&
          e.getField("__t") === try_element_at(stepsArr, nTimes + 1) &&
          e.getField("__us") > acc.getField("prev")
        when(advance, struct(e.getField("__us").as("prev"),
            concat(acc.getField("times"), array(e.getField("__us")))
              .as("times")))
          .otherwise(acc)
      })
    grouped
      .withColumn("__times", walk.getField("times"))
      .select(col(userCol) +: col("session_seq") +:
        steps.indices.map(i =>
          try_element_at(col("__times"), lit(i + 1)).as(s"step${i + 1}_us")) :+
        size(col("__times")).cast("long").as("steps_completed"): _*)
  }

  /** The funnel rolled up to the conversion report: one row with the
    * session count, how many sessions reached each step, and each
    * step's conversion rate off the previous step (6 decimals; 0-base
    * steps rate 0.0) — the table every funnel analysis ships. One
    * aggregate over [[funnel]]'s output. */
  def funnelReport(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], gapMinutes: Int): DataFrame = {
    val f = funnel(events, userCol, tsCol, typeCol, steps, gapMinutes)
    val aggs = count(lit(1)).as("n_sessions") +:
      steps.indices.map(i =>
        sum(when(col("steps_completed") > i, 1L).otherwise(0L))
          .as(s"reached_${i + 1}"))
    val base = f.agg(aggs.head, aggs.tail: _*)
    steps.indices.foldLeft(base) { (acc, i) =>
      val prev = if (i == 0) col("n_sessions") else col(s"reached_$i")
      acc.withColumn(s"rate_${i + 1}",
        when(prev > 0, round(col(s"reached_${i + 1}") / prev, 6))
          .otherwise(lit(0.0)))
    }
  }
}
