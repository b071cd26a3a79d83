package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row whose
  * time ≤ the left row's time (backward, the default), or the EARLIEST
  * right row whose time ≥ it (forward), per key — optionally only
  * within a time tolerance.
  *
  * Implementation is the union-and-carry pattern rather than a
  * range join: tag both inputs, union them (no shuffle beyond the one
  * sort), and window-carry the nearest right-side values within each
  * key. One shuffle on the key + an in-partition sort —
  * the same cost profile as a single sort-merge join, and no
  * O(left × right-per-key) blowup on hot keys, which is what kills the
  * naive `t1.time >= t2.time` range-join at scale.
  *
  * Ties (right rows sharing the as-of time) resolve deterministically,
  * unlike vanilla ASOF joins: backward by the GREATEST tiebreak value
  * (max over the running struct), forward by the LEAST (the mirror).
  */
object AsOfJoin {

  def apply(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTiebreak: String,
      rightValueCols: Seq[String],
      direction: String = "backward",
      toleranceUs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(direction == "backward" || direction == "forward",
      s"as-of join: direction must be backward|forward, got $direction")
    toleranceUs.foreach(t => require(t >= 0,
      s"as-of join: tolerance must be non-negative, got $t"))

    val lCols = left.columns
    val rStruct = struct(
      col(rightTime).as("__t") +: col(rightTiebreak).as("__tb") +:
        rightValueCols.map(c => col(c).as(c)): _*)

    val taggedRight = right.select(
      col(rightKey).as("__key"), col(rightTime).as("__time"),
      lit(1).as("__isRight"), rStruct.as("__rv"))
    val taggedLeft = left.select(
      col(leftKey).cast(taggedRight.schema("__key").dataType).as("__key"),
      col(leftTime).cast(taggedRight.schema("__time").dataType).as("__time"),
      lit(0).as("__isRight"), lit(null).cast(taggedRight.schema("__rv").dataType).as("__rv"),
      struct(lCols.map(col): _*).as("__lrow"))

    val combined = taggedRight.withColumn("__lrow", lit(null).cast(taggedLeft.schema("__lrow").dataType))
      .unionByName(taggedLeft)

    // Backward: right rows sort before left rows at the same instant
    // (isRight desc) so an exactly-coincident right row is visible in
    // the running [start, current] frame; max(__rv) picks latest time,
    // then greatest tiebreak (struct ordering is lexicographic on
    // (__t, __tb)). Forward is the mirror: left rows sort first at the
    // instant, the frame looks ahead [current, end], min(__rv) picks
    // earliest time then least tiebreak.
    val carried =
      if (direction == "backward") {
        val w = Window.partitionBy(col("__key"))
          .orderBy(col("__time").asc, col("__isRight").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        combined.withColumn("__matched", max(col("__rv")).over(w))
      } else {
        val w = Window.partitionBy(col("__key"))
          .orderBy(col("__time").asc, col("__isRight").asc)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        combined.withColumn("__matched", min(col("__rv")).over(w))
      }

    // tolerance: a match farther than the bound nulls out (timestamp
    // time columns — the µs arithmetic both engines share)
    val within: Column = toleranceUs match {
      case None => lit(true)
      case Some(t) =>
        // NTZ casts to the instant type first (digit-preserving under
        // the engine's UTC session) so the µs arithmetic accepts both
        abs(unix_micros(col("__matched.__t").cast("timestamp")) -
          unix_micros(col("__time").cast("timestamp"))) <= t
    }
    val gated = carried
      .withColumn("__matched", when(within, col("__matched")))
      .filter(col("__isRight") === 0)

    val out = lCols.map(c => col(s"__lrow.$c").as(c)) ++
      rightValueCols.map(c => col(s"__matched.$c").as(c))
    gated.select(out: _*)
  }
}
