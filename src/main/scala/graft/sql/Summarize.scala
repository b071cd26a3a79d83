package graft.sql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `SUMMARIZE <table|query>` — single-pass column profiling.
  *
  * Output contract matches the reference's SQL generator
  * (beacon-core/src/statement_plan/mod.rs:337-455): one row per source
  * column, in source column order, with columns
  * `column_name, column_type, min, max, distinct, avg, std, count,
  * null_percentage`. All stats come from ONE aggregation pass over the
  * source (a single scan at 100 TB — this matters); the per-column rows
  * are then 1-row projections of that aggregate, unioned.
  *
  * Unsupported stats are NULL: min/max/distinct need an orderable type,
  * avg/std a numeric one. `column_type` uses Spark DDL simple names.
  */
object Summarize {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
         _: FloatType | _: DoubleType | _: DecimalType => true
    case _ => false
  }

  private def isOrderable(dt: DataType): Boolean = isNumeric(dt) || (dt match {
    case _: StringType | _: BooleanType | _: DateType |
         _: TimestampType | _: TimestampNTZType => true
    case _ => false
  })

  /** N-way multi-`countDistinct` in one Aggregate makes Spark plan an
    * Expand: every input row is replicated once per distinct group
    * (17× for lineitem) and the whole multiple shuffles. For simple
    * scan-shaped sources it is much cheaper — locally ~2× and at scale
    * shuffle-free — to run one non-distinct pass plus one tiny
    * per-column distinct-count job (parquet column pruning means each
    * job reads exactly one column; jobs run concurrently). Complex
    * sources (joins/aggs/windows upstream) keep the single-pass form so
    * the upstream plan is not re-executed per column. */
  private def cheapToRescan(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    df.queryExecution.optimizedPlan.collectFirst {
      case _: Aggregate | _: Join | _: Window | _: Union | _: Distinct => ()
    }.isEmpty
  }

  def summarize(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    require(fields.nonEmpty, "SUMMARIZE requires a source with at least one column")

    val nullV = lit(null).cast(StringType)
    val nullI = lit(null).cast(LongType)
    val nullD = lit(null).cast(DoubleType)

    def q(n: String): Column = col("`" + n.replace("`", "``") + "`")

    // distinct counts: concurrent one-column jobs when re-scanning the
    // source is cheap; otherwise folded into the single aggregation pass
    val splitDistinct = cheapToRescan(df)
    val distinctOf: Map[Int, Long] =
      if (!splitDistinct) Map.empty
      else {
        import scala.concurrent._
        import scala.concurrent.duration._
        // bounded pool: a 200-column table must not flood the scheduler
        // with 200 concurrent Spark jobs
        val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
        try {
          val jobs = fields.zipWithIndex.collect {
            case (f, i) if isOrderable(f.dataType) => Future {
              i -> df.select(q(f.name)).agg(countDistinct(q(f.name))).collect()(0).getLong(0)
            }
          }
          Await.result(Future.sequence(jobs.toSeq), 60.minutes).toMap
        } finally pool.shutdown()
      }

    val aggs: Seq[Column] = count(lit(1)).cast(LongType).as("__n") +:
      fields.zipWithIndex.flatMap { case (f, i) =>
        val c = q(f.name)
        val orderable = isOrderable(f.dataType)
        val numeric = isNumeric(f.dataType)
        val uniq =
          if (!orderable) nullI
          else if (splitDistinct) lit(distinctOf(i)).cast(LongType)
          else countDistinct(c).cast(LongType)
        Seq(
          (if (orderable) min(c).cast(StringType) else nullV).as(s"c${i}_min"),
          (if (orderable) max(c).cast(StringType) else nullV).as(s"c${i}_max"),
          uniq.as(s"c${i}_uniq"),
          (if (numeric) avg(c.cast(DoubleType)) else nullD).as(s"c${i}_avg"),
          (if (numeric) stddev(c.cast(DoubleType)) else nullD).as(s"c${i}_std"),
          count(c).cast(LongType).as(s"c${i}_cnt"))
      }.toIndexedSeq

    val agg = df.agg(aggs.head, aggs.tail: _*)

    val branches = fields.zipWithIndex.map { case (f, i) =>
      agg.select(
        lit(i).as("__ord"),
        lit(f.name).as("column_name"),
        lit(f.dataType.simpleString).as("column_type"),
        col(s"c${i}_min").as("min"),
        col(s"c${i}_max").as("max"),
        col(s"c${i}_uniq").as("distinct"),
        col(s"c${i}_avg").as("avg"),
        col(s"c${i}_std").as("std"),
        col(s"c${i}_cnt").as("count"),
        when(col("__n") === 0, 0.0)
          .otherwise((col("__n") - col(s"c${i}_cnt")) * 100.0 / col("__n"))
          .cast(DoubleType).as("null_percentage"))
    }

    branches.reduce(_ union _).orderBy("__ord").drop("__ord")
  }
}
