package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row whose
  * time ≤ the left row's time, per key.
  *
  * Implementation is the union-and-carry-forward pattern rather than a
  * range join: tag both inputs, union them (no shuffle beyond the one
  * sort), and window-carry the most recent right-side values forward
  * within each key. One shuffle on the key + an in-partition sort —
  * the same cost profile as a single sort-merge join, and no
  * O(left × right-per-key) blowup on hot keys, which is what kills the
  * naive `t1.time >= t2.time` range-join at scale.
  *
  * Ties (right rows sharing the as-of time) resolve by the greatest
  * tiebreak column value — deterministic, unlike vanilla ASOF joins.
  */
object AsOfJoin {

  def apply(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTiebreak: String,
      rightValueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window

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

    // right rows sort before left rows at the same instant (isRight desc)
    // so an exactly-coincident right row is visible to the left row;
    // max(__rv) over the running frame picks latest time, then greatest
    // tiebreak (struct ordering is lexicographic on (__t, __tb)).
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__time").asc, col("__isRight").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = combined.withColumn("__matched", max(col("__rv")).over(w))
      .filter(col("__isRight") === 0)

    val out = lCols.map(c => col(s"__lrow.$c").as(c)) ++
      rightValueCols.map(c => col(s"__matched.$c").as(c))
    carried.select(out: _*)
  }
}
