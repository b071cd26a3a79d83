package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IVF (inverted-file) approximate nearest neighbor — the
  * centroid-partitioned scale path for similarity search, complementing
  * the LSH variant in [[Similarity]] (builder brief: "an IVF or
  * LSH-bucketed variant as the scale path").
  *
  * Design for 100 TB:
  *  - train: k-means over a bounded SAMPLE (driver-side Lloyd's on ≤
  *    `sampleSize` rows — the model is tiny: k × dim doubles);
  *  - assign: one map-only pass tags every corpus row with its nearest
  *    centroid (the centroid matrix broadcasts);
  *  - search: queries probe only their `nProbe` nearest cells, so the
  *    candidate join touches ~nProbe/k of the corpus instead of all of
  *    it; exact cosine rerank inside the probed cells.
  *
  * Deterministic: seeded sampling + deterministic init (first k
  * distinct sample rows) + fixed iteration count — same centroids on
  * every run, so results are reproducible (spec-pinned; no DuckDB
  * oracle, k-means is not replayable in SQL).
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
  }

  /** Persist a trained codebook as a text artifact — the train-once /
    * probe-everywhere handoff, same stance as [[Bpe.writeMerges]] and
    * [[Unigram.writeVocab]]: one centroid per line, comma-joined
    * `Double.toString` components (which round-trip BIT-EXACTLY
    * through parseDouble, so a reloaded model probes the same cells),
    * `#` header. Bounded driver artifact: k × dims doubles. */
  def writeModel(m: Model, path: String): Unit = {
    val sb = new StringBuilder(
      "# ivf centroids: comma-joined doubles, one centroid per line\n")
    m.centroids.foreach { c => sb.append(c.mkString(",")).append('\n') }
    graft.sources.io.ByteStore.writeString(path, sb.toString)
  }

  /** Reload [[writeModel]]'s artifact. Malformed lines and ragged
    * centroid arities raise loudly — a silently-truncated codebook
    * would probe the wrong cells forever after. */
  def readModel(path: String): Model = {
    val rows = graft.sources.io.ByteStore.readString(path).split("\n")
      .filter(l => l.nonEmpty && !l.startsWith("#"))
    require(rows.nonEmpty, s"ivf model $path: no centroid lines")
    val cs = rows.map { l =>
      try l.split(",").map(java.lang.Double.parseDouble)
      catch { case e: NumberFormatException =>
        throw new IllegalArgumentException(
          s"ivf model $path: malformed centroid line '$l'", e)
      }
    }
    require(cs.map(_.length).distinct.length == 1,
      s"ivf model $path: ragged centroid arities ${cs.map(_.length).distinct.mkString(",")}")
    Model(cs)
  }

  private def toDoubles(a: Seq[Float]): Array[Double] = a.map(_.toDouble).toArray

  /** train on a seeded sample; deterministic Lloyd's, `iters` rounds */
  def train(corpus: DataFrame, vecCol: String, k: Int,
      sampleSize: Int = 10000, iters: Int = 10, seed: Long = 42L): Model = {
    val n = corpus.count()
    val frac = math.min(1.0, sampleSize.toDouble / math.max(n, 1))
    val sample = corpus.select(col(vecCol)).sample(frac, seed)
      .limit(sampleSize).collect()
      .map(r => toDoubles(r.getSeq[Float](0)))
    require(sample.length >= k, s"sample ${sample.length} < k=$k")
    var centroids = sample.distinct.take(k)
    require(centroids.length == k, s"fewer than k distinct vectors")
    val dim = centroids.head.length
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        val c = nearest(centroids, v)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }
      it += 1
    }
    Model(centroids)
  }

  /** Fully replayable training mode (the oracle-gated configuration):
    * the sample is the first `sampleSize` rows by id (deterministic
    * across engines, still bounded driver memory), init is the first k
    * vectors, and every centroid update is rounded to 6 decimals — so
    * an independent engine unrolling the same Lloyd's iterations in SQL
    * reproduces the centroids bit-for-bit (floating sum-order noise is
    * ~1e-16 relative and cannot move a 6-decimal rounding except on a
    * measure-zero boundary). Same contract as the LSH plane replay. */
  def trainReplayable(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 5, sampleSize: Int = 50000): Model = {
    val sample = corpus.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(sampleSize).collect()
      .map(r => toDoubles(r.getSeq[Float](1)))
    require(sample.length >= k, s"sample ${sample.length} < k=$k")
    var centroids = sample.take(k)
    require(centroids.map(_.toSeq).distinct.length == k,
      "first k vectors are not distinct; replayable init needs distinct leads")
    val dim = centroids.head.length
    def r6(x: Double): Double = // decimal-string rounding — what SQL round() does
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        val c = nearest(centroids, v)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(s => r6(s / counts(c)))
      }
      it += 1
    }
    Model(centroids)
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

  // probe stays a udf: it runs on the (small, broadcast-side) query
  // set only; the corpus-wide assign pass is the codegen'd expression
  private[operators] def probeUdf(m: Model, nProbe: Int) =
    udf((v: Seq[Float]) => {
      val dv = toDoubles(v)
      m.centroids.indices
        .map(c => c -> {
          var d = 0.0; var i = 0
          while (i < dv.length) { val x = dv(i) - m.centroids(c)(i); d += x * x; i += 1 }
          d
        })
        .sortBy(_._2).take(nProbe).map(_._1)
    })

  /** corpus + `__cell` assignment column (map-only; the centroid
    * matrix rides as a codegen reference object — no per-row boxing) */
  def assign(corpus: DataFrame, vecCol: String, m: Model): DataFrame =
    corpus.withColumn("__cell",
      graft.functions.VectorExprs.nearest_centroid(col(vecCol), m.centroids))

  /** top-k per query, probing nProbe cells; exact cosine rerank.
    * `roundCos > 0` rounds the score BEFORE ranking so ranking and
    * display agree across engines (the oracle-gate configuration). */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      m: Model, k: Int, nProbe: Int = 2, roundCos: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val assigned = assign(corpus, vecCol, m)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"), col("__cell"))
    val probed = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        explode(probeUdf(m, nProbe)(col(vecCol))).as("__cell"))
    val rawCos = Similarity.cosine(col("__qv"), col("__cv"))
    val scored = probed.join(assigned, "__cell") // co-partitioned on cell
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (if (roundCos > 0) round(rawCos, roundCos) else rawCos).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }
}
