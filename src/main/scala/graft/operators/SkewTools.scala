package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins — the manual salting path for
  * cases AQE's runtime skew-join split doesn't cover (non-sort-merge
  * joins, deliberate bucket joins, aggregations feeding a join).
  *
  * `saltedJoin`: the skewed (large) side gets a deterministic salt in
  * [0, salt); the small side is replicated `salt` times; the join key
  * becomes (key, salt), spreading one hot key over `salt` reducers.
  * Deterministic salt (hash of a row id) rather than rand() keeps
  * retries and speculative tasks consistent.
  */
object SkewTools {

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salt: Int = 8, saltOn: String = null): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val saltSrc = if (saltOn != null) col(saltOn) else monotonically_increasing_id()
    val l = large.withColumn("__salt", pmod(xxhash64(saltSrc), lit(salt)).cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
