package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** throwaway perf scratch (not part of the library surface) */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    // warmup
    df.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()

    time("summarize-current") {
      graft.sql.Summarize.summarize(df).write.format("noop").mode("overwrite").save()
    }
    time("agg-no-distinct") {
      val aggs = df.schema.fields.flatMap(f => Seq(min(col(f.name)), max(col(f.name)), count(col(f.name))))
      df.agg(aggs.head, aggs.tail: _*).write.format("noop").mode("overwrite").save()
    }
    time("distinct-concurrent") {
      import scala.concurrent._
      import scala.concurrent.duration._
      import ExecutionContext.Implicits.global
      val fs = df.schema.fields.map(f => Future {
        df.select(col(f.name)).agg(countDistinct(col(f.name))).collect()(0).getLong(0)
      })
      Await.result(Future.sequence(fs.toSeq), 10.minutes)
    }
    time("distinct-concurrent2") {
      import scala.concurrent._
      import scala.concurrent.duration._
      import ExecutionContext.Implicits.global
      val fs = df.schema.fields.map(f => Future {
        df.select(col(f.name)).agg(countDistinct(col(f.name))).collect()(0).getLong(0)
      })
      Await.result(Future.sequence(fs.toSeq), 10.minutes)
    }
    time("summarize-current2") {
      graft.sql.Summarize.summarize(df).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
