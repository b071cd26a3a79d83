package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join WITHOUT an equi key, made hash-joinable:
  * intervals explode to the fixed-width buckets they cover, points map
  * to their one bucket, and the join becomes a plain equi join on the
  * bucket plus the exact BETWEEN filter. Each (point, interval) pair
  * meets in EXACTLY the point's bucket, so no post-join dedup is
  * needed. Without this, Catalyst plans a pure range condition as a
  * broadcast-nested-loop / cartesian product — quadratic at scale; with
  * it, the plan is a shuffled (or broadcast) hash join whose fan-out is
  * bounded by the interval width.
  *
  * Scale notes: an interval spanning B buckets contributes B join rows
  * — pick `bucketWidth` near the TYPICAL interval length so B stays
  * O(1); intervals wider than `maxBucketsPerInterval` buckets fail
  * loudly rather than silently amplifying the shuffle. All arithmetic
  * is integer (floor division via pmod, correct for negatives), so the
  * oracle replays the semantics with a plain BETWEEN join.
  */
object RangeJoin {

  /** Join `points` (long `pointCol`) to `intervals` (long `startCol` ≤
    * `endCol`, inclusive bounds): one output row per pair with
    * point ∈ [start, end]. Column names must not collide (same contract
    * as [[AsOfJoin]]). */
  def pointInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long, maxBucketsPerInterval: Int = 1024): DataFrame = {
    require(bucketWidth > 0,
      s"range join: bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval > 0,
      s"range join: maxBucketsPerInterval must be positive")
    // integral division (`div`), not `/`: the double path is only exact
    // below 2^53 and would silently mis-bucket epoch-ns points
    def bucketOf(c: Column): Column =
      call_function("div", c - pmod(c, lit(bucketWidth)), lit(bucketWidth))
    val checkedStart = when(col(endCol) < col(startCol), raise_error(concat(
        lit(s"range join: interval end '$endCol' < start '$startCol' ("),
        col(endCol), lit(" < "), col(startCol), lit(")"))))
      .otherwise(col(startCol))
    val expl = intervals
      .withColumn("__bs", bucketOf(checkedStart))
      .withColumn("__be", bucketOf(col(endCol)))
      .withColumn("__bucket", explode(sequence(
        when(col("__be") - col("__bs") >= maxBucketsPerInterval,
          raise_error(concat(
            lit(s"range join: interval spans ≥ $maxBucketsPerInterval " +
              s"buckets of width $bucketWidth ("),
            col(startCol), lit(".."), col(endCol),
            lit(") — widen bucketWidth or split the interval"))))
          .otherwise(col("__bs")),
        col("__be"))))
      .drop("__bs", "__be")
    points
      .withColumn("__bucket", bucketOf(col(pointCol)))
      .join(expl, Seq("__bucket"), "inner")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }
}
