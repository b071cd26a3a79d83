package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorExprs

/** Product quantization (Jégou, Douze, Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search") — the memory-bounded
  * path for billion-vector similarity: each vector's m equal slices
  * quantize against per-subspace codebooks, compressing a d-float
  * vector to m small ints, and search runs as an Asymmetric Distance
  * Computation (ADC) scan over the codes with a per-query lookup
  * table — the corpus vectors are never touched at query time.
  *
  * Scale shape:
  *  - train: per-subspace Lloyd's over a bounded sample (the codebook
  *    is m × k × (d/m) doubles — tiny, rides as one codegen reference
  *    object);
  *  - encode: ONE map-only codegen pass ([[VectorExprs.PqEncode]]);
  *    at 64-dim float / m=8 / k=256 the corpus shrinks 32× (256 bytes
  *    → 8), which is what lets a billion-vector index sit in memory;
  *  - search: queries broadcast with their precomputed LUTs; the scan
  *    is a compressed LINEAR pass (codegen [[VectorExprs.AdcSum]]) —
  *    compose with the IVF cells ([[IvfIndex.assign]]) to probe a
  *    fraction of it (classic IVF-PQ) when even the compressed scan
  *    is too wide.
  *
  * The replayable trainer follows [[IvfIndex.trainReplayable]]'s
  * oracle contract exactly, per subspace: first-`sampleSize`-by-id
  * sample, first-k init, 6-decimal-rounded centroid updates, lowest-
  * index tie-breaks — so an independent engine unrolling the same
  * iterations in SQL reproduces codes and distances bit-for-bit.
  */
object PqIndex {

  /** per-subspace codebooks: [m][k][d/m] */
  final case class Model(sub: Array[Array[Array[Double]]]) {
    def m: Int = sub.length
    def k: Int = sub(0).length
    def subDim: Int = sub(0)(0).length
  }

  /** Persist the per-subspace codebooks as a text artifact (the
    * [[IvfIndex.writeModel]] stance): one
    * `subspace<TAB>code<TAB>comma-joined-doubles` line per codeword,
    * `Double.toString` components round-tripping bit-exactly, `#`
    * header. Bounded driver artifact: m × k × (d/m) doubles. */
  def writeModel(mdl: Model, path: String): Unit = {
    val sb = new StringBuilder(
      "# pq codebooks: subspace<TAB>code<TAB>comma-joined doubles\n")
    for (s <- mdl.sub.indices; c <- mdl.sub(s).indices)
      sb.append(s).append('\t').append(c).append('\t')
        .append(mdl.sub(s)(c).mkString(",")).append('\n')
    graft.sources.io.ByteStore.writeString(path, sb.toString)
  }

  /** Reload [[writeModel]]'s artifact; any gap in the (subspace, code)
    * grid, malformed number or ragged codeword arity raises loudly —
    * a silently-misshapen codebook would encode garbage forever. */
  def readModel(path: String): Model = {
    val rows = graft.sources.io.ByteStore.readString(path).split("\n")
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        l.split("\t") match {
          case Array(s, c, vs) =>
            try (s.toInt, c.toInt, vs.split(",").map(java.lang.Double.parseDouble))
            catch { case e: Exception =>
              throw new IllegalArgumentException(
                s"pq model $path: malformed codeword line '$l'", e)
            }
          case _ => throw new IllegalArgumentException(
            s"pq model $path: expected subspace<TAB>code<TAB>values, got '$l'")
        }
      }
    require(rows.nonEmpty, s"pq model $path: no codeword lines")
    val m = rows.map(_._1).max + 1
    val k = rows.map(_._2).max + 1
    require(rows.length == m * k,
      s"pq model $path: ${rows.length} codewords for an $m x $k grid")
    require(rows.map(_._3.length).distinct.length == 1,
      s"pq model $path: ragged codeword arities")
    val sub = Array.ofDim[Array[Double]](m, k)
    rows.foreach { case (s, c, v) =>
      require(s >= 0 && c >= 0 && sub(s)(c) == null,
        s"pq model $path: duplicate or out-of-range codeword ($s, $c)")
      sub(s)(c) = v
    }
    Model(sub)
  }

  def trainReplayable(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int = 3, sampleSize: Int = 50000): Model = {
    val sample = corpus.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(sampleSize).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    require(sample.length >= k, s"sample ${sample.length} < k=$k")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    def r6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val books = Array.tabulate(m) { s =>
      val off = s * subDim
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, off, off + subDim))
      var centroids = sub.take(k)
      require(centroids.map(_.toSeq).distinct.length == k,
        s"subspace $s: first k sub-vectors are not distinct")
      var it = 0
      while (it < iters) {
        val sums = Array.fill(k)(new Array[Double](subDim))
        val counts = new Array[Long](k)
        sub.foreach { v =>
          val c = nearest(centroids, v)
          counts(c) += 1
          var i = 0
          while (i < subDim) { sums(c)(i) += v(i); i += 1 }
        }
        centroids = Array.tabulate(k) { c =>
          if (counts(c) == 0) centroids(c)
          else sums(c).map(x => r6(x / counts(c)))
        }
        it += 1
      }
      centroids
    }
    Model(books)
  }

  private def nearest(cs: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0
      var i = 0
      val cv = cs(c)
      while (i < v.length) { val x = v(i) - cv(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** corpus + `__pq` code column (map-only codegen pass) */
  def encode(corpus: DataFrame, vecCol: String, model: Model): DataFrame =
    corpus.withColumn("__pq", VectorExprs.pq_encode(col(vecCol), model.sub))

  /** IVF-PQ (the production composition): corpus rows carry an IVF
    * cell ([[IvfIndex.assign]]) AND a PQ code; queries probe their
    * `nProbe` nearest cells and ADC-score only the codes inside them
    * — candidate volume ~nProbe/k of the corpus, candidate WIDTH m
    * bytes. This is the architecture that serves billion-vector
    * search from RAM. Returns (query_id, neighbor_id, d, rk). */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, ivf: IvfIndex.Model, pq: Model, topK: Int,
      nProbe: Int = 2, roundDist: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val coded = encode(IvfIndex.assign(corpus, vecCol, ivf), vecCol, pq)
      .select(col(idCol).as("neighbor_id"), col("__cell"), col("__pq"))
    val probed = queries.select(col(idCol).as("query_id"),
      explode(IvfIndex.probeUdf(ivf, nProbe)(col(vecCol))).as("__cell"),
      VectorExprs.pq_lut(col(vecCol), pq.sub).as("__lut"))
    val rawD = VectorExprs.adc_sum(col("__pq"), col("__lut"), pq.k)
    val scored = coded.join(broadcast(probed), "__cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (if (roundDist > 0) round(rawD, roundDist) else rawD).as("d"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d").asc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= topK)
  }

  /** ADC top-k: approximate squared-L2 rank over the code scan.
    * `roundDist > 0` rounds BEFORE ranking (the oracle-gate config).
    * Returns (query_id, rk, neighbor_id, d). */
  def adcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, model: Model, topK: Int, roundDist: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val codes = encode(corpus, vecCol, model)
      .select(col(idCol).as("neighbor_id"), col("__pq"))
    val qs = queries.select(col(idCol).as("query_id"),
      VectorExprs.pq_lut(col(vecCol), model.sub).as("__lut"))
    val rawD = VectorExprs.adc_sum(col("__pq"), col("__lut"), model.k)
    val scored = codes.crossJoin(broadcast(qs))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (if (roundDist > 0) round(rawD, roundDist) else rawD).as("d"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d").asc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= topK)
  }
}
