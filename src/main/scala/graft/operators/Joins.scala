package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-aware join strategies. Both operators here return EXACTLY the
  * rows of the plain join they replace — the sketch work is an
  * execution strategy, not a semantic — so the DuckDB oracle replays
  * them as ordinary joins.
  *
  *  - [[skewJoin]]: the classic salted shuffle join, but only the keys
  *    a count-min sketch flags as heavy get salted/replicated — the
  *    mitigation a 100 TB fact-to-fact join needs when one key holds a
  *    double-digit percentage of the rows and AQE's post-hoc split
  *    isn't available or isn't enough.
  *  - [[bloomSemiJoin]]: a Bloom pre-filter in front of a semi join —
  *    the probe side drops non-matching rows BEFORE the shuffle (no
  *    false negatives, so the confirmed result is exact), paying one
  *    broadcast bitmap instead of shuffling the full scan.
  */
object Joins {

  /** Inner equi-join on the shared column `key`, skew-resilient:
    * a count-min sketch of the left (fact) side's keys is probed with
    * the right side's distinct keys; keys estimated ≥ `heavyThreshold`
    * rows are salted `salts` ways on the left (deterministic md5 of
    * `leftIdCol`) and replicated `salts` ways on the right, so no
    * single reducer owns a hot key's full row set. Light keys ride
    * salt 0 — exactly one copy, the plain join. CMS overestimates only
    * (collisions can promote a light key to heavy — a replication cost,
    * never a correctness issue). Other column names must not collide
    * (same contract as [[AsOfJoin]]). */
  def skewJoin(left0: DataFrame, right0: DataFrame, key: String,
      leftIdCol: String, salts: Int = 8,
      heavyThreshold: Long = 1000000L): DataFrame = {
    require(salts > 1, s"skew join: salts must exceed 1, got $salts")
    require(heavyThreshold > 0, "skew join: heavyThreshold must be positive")
    val left = Par.widen(left0)
    val right = Par.widen(right0)
    val sk = Sketches.countMin(left.select(col(key)), key,
      width = 4096, depth = 4)
    val heavy = Sketches.cmsEstimate(sk, right.select(col(key)).distinct(), key)
      .filter(col("est") >= heavyThreshold)
      .select(col(key).as("__hk"))
    val l = left
      .join(broadcast(heavy), col(key) === col("__hk"), "left")
      .withColumn("__salt",
        when(col("__hk").isNotNull,
          // null ids hash to null — coalesce to salt 0 so the row still
          // joins (unsalted) instead of silently vanishing
          coalesce(pmod(Sampling.hash48(col(leftIdCol), "skew-salt"),
            lit(salts.toLong)), lit(0L)))
          .otherwise(lit(0L)))
      .drop("__hk")
    val r = right
      .join(broadcast(heavy), col(key) === col("__hk"), "left")
      .withColumn("__salt", explode(
        when(col("__hk").isNotNull,
          sequence(lit(0L), lit(salts.toLong - 1L)))
          .otherwise(array(lit(0L)))))
      .drop("__hk")
    l.join(r, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Left-semi join on the shared column `key` behind a Bloom
    * pre-filter: the build side's keys populate a bloom bitmap
    * (bounded driver artifact: m/64 longs, like the k-means
    * codebooks), the probe side drops rows failing ANY of the k bit
    * tests — map-only, before any shuffle — and the survivors confirm
    * through the exact semi join. No false negatives, so the result
    * EQUALS the plain semi join; false positives only cost shuffle
    * rows. */
  def bloomSemiJoin(left0: DataFrame, right: DataFrame, key: String,
      m: Int = 65536, k: Int = 3): DataFrame = {
    val left = Par.widen(left0)
    val sk = Sketches.bloomBuild(right.select(col(key)), key, m, k)
    // the bitmap as a literal long[] — codegen'd bit tests, no join
    val words = new Array[Long]((m + 63) / 64)
    sk.bits.collect().foreach { row =>
      val pos = row.getLong(0)
      words(pos.toInt >> 6) |= 1L << (pos.toInt & 63)
    }
    // the k bit tests run inside ONE codegen kernel whose single child
    // is the 48-bit hash — so the md5 evaluates exactly once per probe
    // row (a composed built-in predicate inlines the digest per
    // occurrence: FilterExec does no subexpression elimination, and
    // the measured cost was 12 digests/row)
    val pass = graft.functions.SketchExprs.bloom_test(
      Sampling.hash48(col(key), Sketches.bloomSalt), words, m, k)
    left.filter(pass)
      .join(right.select(col(key)).distinct(), Seq(key), "left_semi")
  }
}
