package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): one JSON line with per-query wall
  * seconds on SPARK_GRAFT_SF_DIR.
  *
  * Honest-measurement rules (VERDICT r1 "What's wrong" #2/#6):
  *  - every query is fully materialized through the noop sink, so
  *    projection-only queries can't be pruned down to a metadata count;
  *  - caches are swept between queries (unpersist + clearCache), so one
  *    operator's persist() can't degrade every query after it and the
  *    numbers are per-query reproducible.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.configure(spark)
    def sweepCaches(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // untimed warmup: JIT + codegen + parquet reader paths, so the
    // alphabetically-first query doesn't absorb JVM cold-start
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count()
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    // noise resistance (VERDICT r3: one contended sweep recorded 10× the
    // code's real numbers): each query runs twice and the MIN is the
    // reported time — an environmental stall in either pass can't flip
    // the grade. Both raw passes are published under "runs".
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt
    // optional comma-separated subset for local iteration (full sweep when unset)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // passes are INTERLEAVED (all queries once, then all again): BENCH_r04
    // showed a host-contention window hitting both back-to-back passes of
    // one query, so min-of-2 recorded 16.6 s for a 1.5 s join. A full
    // sweep between a query's samples means a transient stall has to span
    // the whole sweep to poison both.
    val samples: Seq[Seq[(Double, Boolean)]] = (1 to passes).map { _ =>
      queries.map { case (name, fn) =>
        sweepCaches()
        val t0 = System.nanoTime()
        val ok = try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          true
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
    }
    // decider pass (VERDICT r5 Wrong #1): interleaving is not enough when
    // a contention window spans the whole sweep — both samples of a query
    // can still be poisoned together. Any query whose samples disagree by
    // >3× (and isn't sub-100ms, where ratios are scheduler jitter) gets a
    // third run after the sweep; the reported time is the min of all runs.
    val results = queries.indices.map { i =>
      val base = samples.map(_(i))
      val ok = base.forall(_._2)
      val ts = base.map(_._1)
      val noisy = ok && ts.size >= 2 && ts.min > 0.1 && ts.max / ts.min > 3.0
      val all = if (noisy) {
        sweepCaches()
        val t0 = System.nanoTime()
        val ok3 = try {
          queries(i)._2(spark, sfDir).write.format("noop").mode("overwrite").save(); true
        } catch { case _: Throwable => false }
        if (ok3) ts :+ (System.nanoTime() - t0) / 1e9 else ts
      } else ts
      (queries(i)._1, all, ok)
    }
    sweepCaches()
    // a failed query must not masquerade as a fast success: its time is
    // null in the JSON, excluded from the total, and listed in "failed".
    // r18 (VERDICT r17 Wrong #1): the STDOUT line is the driver-facing
    // COMPACT record — total + per-query min (ms precision) + failed
    // only. The raw samples ("runs") and the fineweb per-stage times
    // moved to the full-file record: at 248 queries × 2-3 samples they
    // made the line ~20 KB, and the driver keeps only a ~2,000-char
    // stdout tail, so BENCH_r16/r17 both recorded an unparseable
    // mid-line fragment and PERF lost two rounds of per-query tables.
    def ms(t: Double): String = (math.round(t * 1000) / 1000.0).toString
    val qs = results.map { case (k, ts, ok) =>
      "\"" + k + "\":" + (if (ok) ms(ts.min) else "null")
    }.mkString("{", ",", "}")
    val qsFull = results.map { case (k, ts, ok) =>
      "\"" + k + "\":" + (if (ok) ts.min.toString else "null")
    }.mkString("{", ",", "}")
    val runs = results.map { case (k, ts, _) =>
      "\"" + k + "\":" + ts.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, ts, true) => ts.min }.sum
    // north-star visibility (r12): the FineWeb recipe's PER-STAGE wall
    // times ride along once per sweep, so a regression in one stage
    // shows by name instead of hiding in the recipe's aggregate
    val fwStages: Option[String] =
      if (results.exists { case (k, _, ok) => k == "q_curate_fineweb" && ok })
        try {
          sweepCaches()
          val ts = graft.queries.QueriesData.fineWebStageTimings(spark, sfDir)
          Some(ts.map { case (k, v) =>
            "\"" + k + "\":" + (math.round(v * 1000) / 1000.0)
          }.mkString("{", ",", "}"))
        } catch { case e: Throwable =>
          System.err.println(s"[bench] fineweb stage timings failed: ${e.getMessage}")
          None
        }
      else None
    val fwField = fwStages.map(s => s""","fineweb_stages":$s""").getOrElse("")
    val line = s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qsFull,"runs":$runs,"failed":$failed$fwField,"sf":"$sfDir"}"""
    // full-precision record with raw samples + fineweb stages, persisted
    // per-run: the default name carries the core count so a lower-core
    // scaling sweep can never overwrite the 32-core record (VERDICT r17:
    // the driver's 8-core run clobbered bench_full_latest.json at 04:28)
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL",
      s"bench_full_c$cpus.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(fullPath),
      (fullLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] full-json write failed: ${e.getMessage}")
    }
    // silence the shutdown-path loggers (streaming StateStore maintenance
    // logs an ERROR stack during stop()) and print the contract line LAST:
    // the driver's tail capture must end with it, not with log noise
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    println(line)
  }
}
