package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines, each designed
  * for partition-parallel execution at corpus scale:
  *
  *  - exact: hash-groupBy on a canonical fingerprint — one shuffle on
  *    the 16-byte digest, keeps the smallest id per group.
  *  - MinHash + LSH: shingle → k minhashes → b bands; candidate pairs
  *    only materialize inside band buckets (the shuffle key is the band
  *    signature, so skewless data shuffles O(docs·b) tiny rows, never
  *    O(docs²) pairs).
  *  - SimHash: 64-bit sign-sum sketch; near-dup = small Hamming
  *    distance; bucketing on bit-bands gives the scale path.
  *  - n-gram Jaccard: exact verify step over candidate pairs (or all
  *    pairs at test scale) via shingle-explode + join — the join key is
  *    the shingle, so co-occurrence is computed without a cross join.
  *  - embedding cosine: see [[Similarity]]; near-dup = cosine ≥ τ.
  *
  * Hash family note: minhash permutations are md5(j || ':' || shingle)
  * — deliberately engine-portable (md5 is bit-identical everywhere, so
  * the DuckDB oracle can replay the exact pipeline), at ~2× the cost of
  * xxhash64. Swap `minhashExpr` for xxhash64(concat(j, s)) when oracle
  * portability doesn't matter.
  */
object Dedup {

  // ------------------------------------------------------------ exact

  /** One row per distinct fingerprint: kept id (min), duplicate count. */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(TextOps.fingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("kept_id"), count(lit(1)).as("n_copies"))

  /** The deduplicated view: first row (by id) per fingerprint. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(TextOps.fingerprint(col(textCol)))
      .orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  // ---------------------------------------------------------- minhash

  /** j-th minhash of a shingle array (md5 family, lexicographic min). */
  def minhashExpr(shingleArr: Column, j: Int): Column =
    array_min(transform(shingleArr, s => md5(concat(lit(j.toString), lit(":"), s))))

  /** id + k minhash columns `mh0..mh{k-1}` over word-n-gram shingles. */
  def minhashSignatures(
      df: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3, k: Int = 8): DataFrame = {
    val sh = TextOps.shingles(col(textCol), shingleN).as("__sh")
    val base = df.select(col(idCol), sh)
    val mhCols = (0 until k).map(j => minhashExpr(col("__sh"), j).as(s"mh$j"))
    base.select(col(idCol) +: mhCols: _*)
  }

  /** LSH candidate pairs: ids sharing at least one band signature.
    * k minhashes grouped into `bands` bands of k/bands rows each; one
    * shuffle on (band index, band signature). */
  def minhashCandidates(
      df: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3, k: Int = 8, bands: Int = 4): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rows = k / bands
    val sigs = minhashSignatures(df, textCol, idCol, shingleN, k)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat((0 until rows).map(r => col(s"mh${b * rows + r}")): _*).as("sig"))
    }
    // persist the banded relation: it feeds both join sides, and without
    // it Catalyst's projection collapse re-derives all k minhashes per
    // band per side (~8x the hashing work)
    val exploded = sigs.select(col(idCol), explode(array(bandCols: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))
      .persist()
    val a = exploded.toDF(s"a_$idCol", "band", "sig")
    val b = exploded.toDF(s"b_$idCol", "band", "sig")
    a.join(b, Seq("band", "sig"))
      .filter(col(s"a_$idCol") < col(s"b_$idCol"))
      .select(col(s"a_$idCol"), col(s"b_$idCol"))
      .distinct()
  }

  // ---------------------------------------------------------- simhash

  /** 64-bit SimHash over tokens: per-bit sign of the sum of ±1 token
    * votes, token hash = xxhash64. Row-local (no shuffle). */
  def simhash(text: Column): Column =
    graft.functions.VectorExprs.simhash64(TextOps.tokens(lower(text)))

  /** Hamming distance between two 64-bit sketches. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with Hamming ≤ maxDist, bucketed by 16-bit
    * bands (a pair within distance d ≤ 3 shares at least one of 4 bands). */
  def simhashCandidates(
      df: DataFrame, textCol: String, idCol: String, maxDist: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol), simhash(col(textCol)).as("sh")).persist()
    val banded = sigs.select(col(idCol), col("sh"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sh"), b * 16).bitwiseAND(0xFFFFL).as("key"))): _*)).as("bk"))
      .select(col(idCol), col("sh"), col("bk.band"), col("bk.key"))
    val a = banded.toDF(s"a_$idCol", "a_sh", "band", "key")
    val b = banded.toDF(s"b_$idCol", "b_sh", "band", "key")
    a.join(b, Seq("band", "key"))
      .filter(col(s"a_$idCol") < col(s"b_$idCol"))
      .select(col(s"a_$idCol"), col(s"b_$idCol"),
        hamming(col("a_sh"), col("b_sh")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  // ----------------------------------------------------- n-gram jaccard

  /** Exact word-n-gram Jaccard for every id pair that shares at least
    * one shingle (shingle-join, not cross join). */
  def ngramJaccardPairs(
      df: DataFrame, textCol: String, idCol: String,
      shingleN: Int = 3, minJaccard: Double = 0.0): DataFrame = {
    // the exploded shingle relation feeds three plan branches (sizes +
    // both join sides); persist so shingling runs once, not three times
    val sh = df.select(col(idCol),
        explode(array_distinct(TextOps.shingles(col(textCol), shingleN))).as("sh"))
      .persist()
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val a = sh.toDF(s"a_$idCol", "sh")
    val b = sh.toDF(s"b_$idCol", "sh")
    val inter = a.join(b, "sh")
      .filter(col(s"a_$idCol") < col(s"b_$idCol"))
      .groupBy(col(s"a_$idCol"), col(s"b_$idCol"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.toDF(s"a_$idCol", "a_sz"), s"a_$idCol")
      .join(sizes.toDF(s"b_$idCol", "b_sz"), s"b_$idCol")
      .select(col(s"a_$idCol"), col(s"b_$idCol"),
        (col("n_common").cast(DoubleType) /
          (col("a_sz") + col("b_sz") - col("n_common"))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }
}
