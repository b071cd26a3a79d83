package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Polite crawl-frontier scheduling — the step between a deduped,
  * robots-filtered frontier ([[Robots.filterFrontier]]) and the fetch
  * fleet. Politeness has two halves: one host must never be fetched by
  * two workers at once (per-host serialization), and one host must not
  * be hammered with its whole backlog in one round (crawl-delay). Both
  * become pure column assignments here, so the schedule is a plan, not
  * a coordinator service.
  */
object Frontier {

  /** Assign every frontier URL a `(host, fetch_slot, fetch_wave)`:
    *
    *  - `fetch_slot` — which fetcher owns the URL. Slots key on the
    *    HOST via the engine's md5-bucket contract
    *    ([[Sampling.hashBucket]]), so all of one host's URLs land on
    *    one fetcher (per-host serialization IS politeness) and the
    *    assignment is stable across runs, executor counts and data
    *    layout.
    *  - `fetch_wave` — which round the URL fetches in: at most
    *    `perWave` URLs of one host per wave, higher `priorityCol`
    *    first, URL order breaking ties deterministically.
    *
    * One shuffle (the per-host rank window). The window computes a
    * rank only — no per-host state materializes — and per-host row
    * counts are bounded upstream by frontier dedup and domain caps, so
    * a hot host costs its rank pass, never a blowup. Output columns
    * `host` / `fetch_slot` / `fetch_wave` replace same-named inputs.
    */
  def schedule(df: DataFrame, urlCol: String, perWave: Int, fetchers: Int,
      priorityCol: Option[String] = None,
      salt: String = "fetch-v1"): DataFrame = {
    require(perWave > 0, s"perWave must be positive, got $perWave")
    require(fetchers > 0, s"fetchers must be positive, got $fetchers")
    val host = TextOps.urlHost(col(urlCol))
    val order: Seq[Column] = priorityCol
      .map(c => Seq(col(c).desc, col(urlCol).asc))
      .getOrElse(Seq(col(urlCol).asc))
    val rank = row_number().over(Window.partitionBy(host).orderBy(order: _*))
    df.withColumn("host", host)
      .withColumn("fetch_slot",
        Sampling.hashBucket(col("host"), salt, fetchers).cast("int"))
      .withColumn("fetch_wave",
        floor((rank.cast("long") - 1) / perWave).cast("int"))
  }
}
