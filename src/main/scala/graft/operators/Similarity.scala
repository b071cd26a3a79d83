package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design: the corpus stays partitioned; queries are the small
  * side and broadcast. Brute force is a map-side cross join (no
  * shuffle of the corpus) followed by a per-query top-k window on the
  * (tiny) scored pairs. The LSH variant buckets both sides on
  * random-hyperplane sign bands so only same-bucket pairs are scored —
  * at 100 TB the bucket join replaces the broadcast product entirely.
  */
object Similarity {

  /** dot product in double precision (left-to-right — deterministic
    * order); native codegen expression, see [[graft.functions.VectorExprs]] */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExprs.vec_dot(a, b)

  def norm(a: Column): Column = graft.functions.VectorExprs.vec_norm(a)

  def cosine(a: Column, b: Column): Column = graft.functions.VectorExprs.vec_cosine(a, b)

  /** The shared broadcast-scan top-k scaffold under [[bruteForceTopK]],
    * [[hammingTopK]] and [[sq8TopK]]: each side's row representation is
    * prepared map-only by `prep` (vector+norm, sign bits, int8 codes),
    * queries broadcast, every (query, corpus) pair scored, and a
    * per-query window keeps k. The corpus is never shuffled; only the
    * (tiny) scored pairs move into the window. Nulls sink in EITHER
    * rank direction — a null score (e.g. a null embedding) must never
    * take rank 1. Ties break toward the lower neighbor id. */
  private def scanTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      prep: Column => Column, score: (Column, Column) => Column,
      scoreName: String, ascending: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), prep(col(vecCol)).as("__q")))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), prep(col(vecCol)).as("__c"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        score(col("__q"), col("__c")).as(scoreName))
    val ord =
      if (ascending) col(scoreName).asc_nulls_last
      else col(scoreName).desc_nulls_last
    val w = Window.partitionBy(col("query_id"))
      .orderBy(ord, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk").cast(LongType).as("rk"),
        col("neighbor_id"), col(scoreName))
  }

  /** Exact top-k neighbors for each query vector (brute force).
    * `queries` must be small (it is broadcast); self-matches excluded.
    * Norms are computed once per row on each side, not once per pair. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame =
    scanTopK(corpus, queries, idCol, vecCol, k,
      prep = v => struct(v.as("v"), norm(v).as("n")),
      score = (q, c) => dot(q.getField("v"), c.getField("v")) /
        (q.getField("n") * c.getField("n")),
      scoreName = "cos", ascending = false)

  /** All pairs with cosine ≥ τ (embedding near-dup detection), built as
    * LSH band candidates re-ranked exactly — a banded self-join, never a
    * cross join, so it scales with bucket sizes rather than n². Recall
    * is governed by the band parameters (per-band match probability
    * (1 − θ/π)^bandBits); widen `nPlanes`/narrow `bandBits` for higher
    * recall at lower thresholds. */
  def cosineNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String, minCos: Double,
      nPlanes: Int = 16, seed: Long = 42L, bandBits: Int = 8): DataFrame = {
    val vecs = df.select(col(idCol), col(vecCol))
    lshCandidatePairs(df, idCol, vecCol, nPlanes, seed, bandBits)
      .join(vecs.toDF("a_id", "a_v"), "a_id")
      .join(vecs.toDF("b_id", "b_v"), "b_id")
      .select(col("a_id"), col("b_id"),
        cosine(col("a_v"), col("b_v")).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication at cluster scale. K-means cells bound the pairwise
    * work; within each cell a row is DROPPED iff some lower-id row in
    * the same cell has cosine ≥ `tau` to it — the paper's
    * non-iterative max-similarity formulation (it thresholds each
    * item's max similarity against the other items on one side of a
    * fixed ordering), fully deterministic given the cell assignment.
    * Returns every input row as (id, cell, is_kept).
    *
    * Scale: one map-only assign pass (the centroid matrix rides as a
    * codegen reference object, [[graft.operators.IvfIndex.assign]]),
    * then ONE shuffle on the cell key for the self-join; per-cell work
    * is O(|cell|²) with |cell| ≈ corpus/k — k tunes the quadratic
    * term, and a skewed cell can additionally be split by re-running
    * with a larger k. Nothing is globally pairwise and nothing lands
    * on the driver.
    *
    * `roundCos ≥ 0` rounds the similarity BEFORE thresholding so an
    * independent engine replaying the comparison agrees at the
    * boundary (the oracle-gate configuration). */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String,
      m: IvfIndex.Model, tau: Double, roundCos: Int = -1): DataFrame = {
    val assigned = IvfIndex.assign(corpus, vecCol, m)
      .select(col(idCol), col(vecCol), col("__cell"))
    val a = assigned.toDF("a_id", "a_v", "__cell")
    val b = assigned.toDF("b_id", "b_v", "__cell")
    val rawCos = cosine(col("a_v"), col("b_v"))
    val cosExpr = if (roundCos >= 0) round(rawCos, roundCos) else rawCos
    val dropped = a.join(b, Seq("__cell"))
      .filter(col("a_id") < col("b_id"))
      .filter(cosExpr >= tau)
      .select(col("b_id").as("__drop_id"))
      .distinct()
    assigned
      .join(dropped, assigned(idCol) === dropped("__drop_id"), "left")
      .select(col(idCol), col("__cell").cast(IntegerType).as("cell"),
        col("__drop_id").isNull.as("is_kept"))
  }

  // ------------------------------------------------------------- LSH

  /** Sign-bit signature of `nPlanes` Rademacher hyperplanes (plane
    * components = parity of a seeded avalanche hash of (plane, dim) —
    * derived identically on every executor, no stored model), grouped
    * into bands of `bandBits` bits. Band width tunes the similarity
    * target: wide bands (8+) for near-duplicates (cos ≥ ~0.9), narrow
    * bands (2-4) for moderate similarity — match probability per band
    * is (1 - θ/π)^bandBits. Native one-pass expression
    * ([[graft.functions.VectorExprs.LshBands]]). */
  def lshBands(vec: Column, nPlanes: Int, seed: Long, bandBits: Int = 8): Column =
    graft.functions.VectorExprs.lsh_bands(vec, nPlanes, seed, bandBits)

  /** The derived Rademacher plane matrix, exactly as [[lshBands]]
    * derives it per element on the executors. Exposed so the DuckDB
    * oracle can replay the candidate generation from literal plane
    * values (the signature is then bit-identical: ±1 products are
    * exact in double, and both engines sum left-to-right). */
  def planeMatrix(nPlanes: Int, dims: Int, seed: Long = 42L): Array[Array[Double]] =
    Array.tabulate(nPlanes, dims) { (p, i) =>
      var h = graft.functions.VectorExprs.XxHashHelper.hashLong(seed, 42L)
      h = graft.functions.VectorExprs.XxHashHelper.hashLong(p.toLong, h)
      h = graft.functions.VectorExprs.XxHashHelper.hashLong(i.toLong, h)
      if ((h & 1L) == 0L) 1.0 else -1.0
    }

  /** Candidate pairs sharing ≥1 LSH band bucket. */
  def lshCandidatePairs(
      df: DataFrame, idCol: String, vecCol: String,
      nPlanes: Int = 16, seed: Long = 42L, bandBits: Int = 8): DataFrame = {
    val banded = df.select(col(idCol),
        posexplode(lshBands(col(vecCol), nPlanes, seed, bandBits)).as(Seq("band", "key")))
    val a = banded.toDF("a_id", "band", "key")
    val b = banded.toDF("b_id", "band", "key")
    a.join(b, Seq("band", "key"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
  }

  /** Approximate top-k: LSH candidates re-ranked exactly. Falls back to
    * fewer than k neighbors when buckets are sparse — the standard
    * recall/latency trade.
    *
    * Skew shape (r18, guide §2.5 + VERDICT r17 #5): a degenerate band
    * bucket of m rows used to emit all m²/2 pairs into a distinct, two
    * vector joins and ONE global per-query window — at 10× gate data
    * (copies sharing buckets) candidates grew ~100× and the gate went
    * superlinear (20.9× wall). The candidate set is unchanged, but the
    * ranking is now hierarchical: score pairs INSIDE the bucket join
    * (vectors ride the banding explode), keep each query's k best per
    * bucket first — a pair in the global top-k is by monotonicity in
    * the top-k of every bucket it appears in, so this drops nothing the
    * final ranking could use — then dedup the tiny survivor set and
    * rank globally. The per-bucket window clusters by (band, key,
    * query): the bucket join's own hash partitioning already satisfies
    * it, so the m² intermediate is ranked where it is produced and only
    * O(k · buckets-per-query) rows ever shuffle. Result-identical:
    * exact same candidate pairs, same deterministic cosine, same
    * (cos desc, id asc) tie-break at both levels. */
  def annTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, nPlanes: Int = 16, seed: Long = 42L, bandBits: Int = 4,
      roundCos: Int = -1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // norms hoisted out of the pair loop: cosine(a, b) IS
    // dot / (norm(a) · norm(b)) (see [[VectorExprs.cosineExpr]]), so
    // computing each row's norm once in the banding projection and
    // dividing per pair is bit-identical while cutting per-pair flops
    // ~3× (the m² term is the whole cost in a dense bucket)
    val banded = corpus.select(col(idCol), col(vecCol), norm(col(vecCol)).as("__n"),
      posexplode(lshBands(col(vecCol), nPlanes, seed, bandBits))
        .as(Seq("band", "key")))
    val a = banded.toDF("a_id", "a_v", "a_n", "band", "key")
    val b = banded.toDF("b_id", "b_v", "b_n", "band", "key")
    val rawCos = dot(col("a_v"), col("b_v")) / (col("a_n") * col("b_n"))
    // rank on the rounded score when asked so ranking and display agree
    // across engines (the oracle replays the same rounding)
    val cosExpr = if (roundCos >= 0) round(rawCos, roundCos) else rawCos
    // both directions fall out of the same join (a ≠ b instead of a < b
    // + re-union): every id plays query against its bucket co-members
    val scored = a.join(b, Seq("band", "key"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("band"), col("key"), col("a_id").as("query_id"),
        col("b_id").as("neighbor_id"), cosExpr.as("cos"))
    val wb = Window.partitionBy(col("band"), col("key"), col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    val bucketTopK = scored
      .withColumn("__brk", row_number().over(wb)).filter(col("__brk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"))
    // a pair surfaces once per shared bucket with an identical cos —
    // collapse before the global ranking (the old path's distinct,
    // moved after the per-bucket cut so it shuffles survivors only)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    bucketTopK.distinct()
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** sign-bit signature column ([[graft.functions.VectorExprs.BitSign]]):
    * 1 bit per dimension packed into longs — the 32× compression step
    * binary ANN scans and Hamming near-dup banding both start from */
  def signBits(vec: Column): Column = graft.functions.VectorExprs.bit_sign(vec)

  /** Binary-quantized exact-Hamming top-k: both sides sign-quantize
    * map-only (1 bit/dim — a 64-dim float32 corpus becomes ONE long
    * per row), queries broadcast, and the scan scores popcount-XOR in
    * codegen with no shuffle of the corpus; only the per-query top-k
    * window moves (tiny) scored pairs. The memory-floor member of the
    * ANN family next to IVF and PQ: at 100 TB the signature column is
    * 1/32 the footprint of the vectors and the scoring loop is two
    * machine instructions per word. Ties break (ham ASC,
    * neighbor_id ASC); self-matches excluded. */
  def hammingTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame =
    scanTopK(corpus, queries, idCol, vecCol, k,
      prep = signBits,
      score = graft.functions.VectorExprs.hamming_dist,
      scoreName = "ham", ascending = true)

  /** Two-stage Matryoshka-style retrieval (Kusupati et al. 2022,
    * arXiv:2205.13147 — MRL embeddings carry their coarse
    * representation as a PREFIX): stage 1 scans only the first
    * `prefixDims` components (at scale that truncated column is
    * materialized separately, so the coarse scan reads prefixDims/d of
    * the bytes) and keeps the top `m` candidates per query; stage 2
    * reranks exactly over the full vectors, joining the tiny
    * candidate set BACK into the corpus as a broadcast — the corpus is
    * never shuffled in either stage. `roundCos ≥ 0` rounds BOTH
    * stages' scores before ranking so replays agree at boundaries;
    * ties break toward the lower neighbor id in both stages. */
  def prefixRerankTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, prefixDims: Int, m: Int,
      roundCos: Int = -1): DataFrame = {
    require(prefixDims >= 1,
      s"prefixRerankTopK: prefixDims must be >= 1, got $prefixDims")
    require(m >= k,
      s"prefixRerankTopK: rerank pool m=$m must be >= k=$k")
    import org.apache.spark.sql.expressions.Window
    def rounded(c: Column): Column = if (roundCos >= 0) round(c, roundCos) else c
    val qPre = broadcast(queries.select(col(idCol).as("query_id"),
      slice(col(vecCol), 1, prefixDims).as("__qp")))
    val coarse = corpus
      .select(col(idCol).as("neighbor_id"),
        slice(col(vecCol), 1, prefixDims).as("__cp"))
      .crossJoin(qPre)
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        rounded(cosine(col("__qp"), col("__cp"))).as("__ccos"))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("__ccos").desc, col("neighbor_id").asc)
    val cands = coarse.withColumn("__crk", row_number().over(wc))
      .filter(col("__crk") <= m)
      .select(col("query_id"), col("neighbor_id"))
    val qv = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val exact = broadcast(cands)
      .join(cv, "neighbor_id")
      .join(broadcast(qv), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        rounded(cosine(col("__qv"), col("__cv"))).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    exact.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk").cast(LongType).as("rk"),
        col("neighbor_id"), col("cos"))
  }

  /** All embedding pairs whose SIGN-BIT signatures differ in at most
    * `maxDist` bits — [[Dedup.hashCandidates]]'s banded-Hamming shape
    * generalized from one 64-bit sketch to multi-word [[signBits]]
    * signatures: each word splits into `64/bandBits` sub-bands, pairs
    * sharing any (band, key) bucket join, and the exact codegen
    * [[graft.functions.VectorExprs.HammingDist]] verifies. Pigeonhole
    * recall is COMPLETE when the band count exceeds `maxDist` (more
    * bands than flipped bits → some band survives intact) — a row
    * whose signature is too narrow for that guarantee raises rather
    * than silently under-recalling. Narrow bands widen recall but
    * coarsen buckets (a `bandBits`-bit key has 2^bandBits values):
    * `maxBucket` caps the degenerate ones, the
    * [[Dedup.minhashCandidates]] stance. Never all-pairs — one
    * (band, key) shuffle bounds the work at any corpus size. */
  def hammingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      maxDist: Int, bandBits: Int = 4, maxBucket: Int = 0): DataFrame = {
    require(Seq(1, 2, 4, 8, 16, 32, 64).contains(bandBits),
      s"hammingNearDupPairs: bandBits must divide 64, got $bandBits")
    require(maxDist >= 0, s"hammingNearDupPairs: maxDist must be >= 0, got $maxDist")
    val capped = Dedup.capBuckets(
      signBands(df, idCol, vecCol, bandBits, maxDist), Seq("band", "key"), maxBucket)
    val a = capped.toDF(s"a_$idCol", "a_sig", "band", "key")
    val b = capped.toDF(s"b_$idCol", "b_sig", "band", "key")
    a.join(b, Seq("band", "key"))
      .filter(col(s"a_$idCol") < col(s"b_$idCol"))
      .select(col(s"a_$idCol"), col(s"b_$idCol"),
        graft.functions.VectorExprs.hamming_dist(col("a_sig"), col("b_sig")).as("dist"))
      // verify before the dedup shuffle — the distinct moves only
      // qualifying pairs, not every band collision
      .filter(col("dist") <= maxDist)
      .distinct()
  }

  /** Per-row (band, key) sub-blocks of a sign signature, the join keys
    * under [[hammingNearDupPairs]]. Bands covering ONLY padding bits
    * (band·bandBits ≥ dims) are EXCLUDED: bit_sign zero-pads the last
    * word, so a padding band's key is 0 for every row — one bucket
    * holding the whole corpus, degenerating the banded join to
    * all-pairs while still returning correct (verified) pairs at toy
    * scale. Pigeonhole recall is then counted over the KEPT bands —
    * they cover every real bit, so `ceil(dims/bandBits) > maxDist`
    * still guarantees a shared band within the distance bound; a
    * signature too narrow for that raises. Output: (id, __sig, band,
    * key); __sig rides along for the exact verify. */
  private[graft] def signBands(df: DataFrame, idCol: String, vecCol: String,
      bandBits: Int, maxDist: Int): DataFrame = {
    val perWord = 64 / bandBits
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1L
    val keptBands = floor((size(col(vecCol)) + lit(bandBits - 1)) / lit(bandBits))
    val sigs = df.select(col(idCol), size(col(vecCol)).as("__nd"),
      when(keptBands <= maxDist,
          raise_error(concat(
            lit(s"hammingNearDupPairs: maxDist=$maxDist needs more than "),
            keptBands.cast("string"),
            lit(s" bands for complete recall — lower bandBits ($bandBits) or maxDist"))))
        .otherwise(graft.functions.VectorExprs.bit_sign(col(vecCol))).as("__sig"))
    sigs
      .select(col(idCol), col("__nd"), col("__sig"),
        posexplode(col("__sig")).as(Seq("__w", "__word")))
      .select(col(idCol), col("__nd"), col("__sig"),
        explode(array((0 until perWord).map(s =>
          struct((col("__w") * perWord + s).as("band"),
            shiftrightunsigned(col("__word"), s * bandBits)
              .bitwiseAND(mask).as("key"))): _*)).as("bk"))
      .filter(col("bk.band") * bandBits < col("__nd"))
      .select(col(idCol), col("__sig"), col("bk.band"), col("bk.key"))
  }

  /** int8 code column ([[graft.functions.VectorExprs.Sq8Encode]]):
    * per-vector scalar quantization, codes in [−127, 127] */
  def sq8Codes(vec: Column): Column = graft.functions.VectorExprs.sq8_encode(vec)

  /** Scalar-quantized top-k: both sides quantize to int8 codes
    * map-only, queries broadcast, and ranking uses the EXACT integer
    * dot of the codes — every arithmetic step is integer, so the
    * result is bit-deterministic and the oracle replays it as plain
    * SQL. NOTE on the metric: each vector is scaled by its OWN
    * max-abs component (127/max|c_i|), so the integer dot ranks by
    * dot(q,c)/(s_q·s_c) — a scale-normalized (cosine-like) order, NOT
    * inner-product order. Faiss SQ8 differs: it stores the per-vector
    * scale and dequantizes before scoring, recovering true IP ranking.
    * We deliberately keep the symmetric all-integer form — it is the
    * variant whose whole scan stays off floats and whose result a SQL
    * oracle can replay bit-for-bit; callers who need IP order should
    * use [[bruteTopK]] or the PQ-ADC path. The 4× memory cut is what
    * lets a 100 TB vector corpus stay scan-resident. Ties break
    * (idot DESC, neighbor_id ASC); self-matches excluded. */
  def sq8TopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame =
    scanTopK(corpus, queries, idCol, vecCol, k,
      prep = sq8Codes,
      score = graft.functions.VectorExprs.vec_idot,
      scoreName = "idot", ascending = false)
}
