package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-stage wall profile of a FineWeb recipe VARIANT (r17: the curate
  * quartet drift watch — when the v2/v3 aggregates move round-over-
  * round with unchanged plans, this prints where, stage by stage,
  * instead of leaving "composition drift" as a guess). Reuses the
  * Bench instrument ([[graft.queries.QueriesData.fineWebStageTimings]]:
  * each stage timed on ITS OWN action over the materialized previous
  * output, min of 2 runs).
  *
  * Usage: runMain graft.tools.StageProfile <sfDir> <v1|v2|v3>
  * Prints one JSON line: {"variant":"v2","stages":{...},"total":N}.
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StageProfile <sfDir> <v1|v2|v3>")
    val dir = args(0)
    val variant = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stage-profile")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.configure(spark)
    val ts = graft.queries.QueriesData.fineWebStageTimings(spark, dir, variant)
    val body = ts.map { case (op, t) =>
      "\"" + op + "\":" + f"$t%.3f"
    }.mkString(",")
    println(s"""{"variant":"$variant","stages":{$body},""" +
      f""""total":${ts.map(_._2).sum}%.3f}""")
    spark.stop()
  }
}
