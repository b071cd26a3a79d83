package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — the reference's one concrete
  * performance claim is that its spatial bbox benchmark runs ~34%
  * faster on Morton-sorted parquet (`benchmarks/README.md:91-99`,
  * `--sort time-geo`): interleaving the bits of quantized sort columns
  * makes rows that are close in N-dimensional space close in file
  * order, so per-file min/max statistics (ANALYZE FILES here, row-group
  * stats in any engine) turn a box predicate into a small fraction of
  * files opened.
  *
  * Spark-first shape: the Morton key is plain column arithmetic
  * (shifts + masks — whole-stage-codegen'd, no UDF), quantization
  * bounds come from one tiny min/max aggregate, and the layout step is
  * `repartitionByRange(zkey)` + in-partition sort — exactly the shuffle
  * a cluster-scale rewrite needs, nothing driver-side.
  */
object ZOrder {

  /** interleave zeros between the low 16 bits: 0bxyz → 0bx0y0z (the
    * standard mask-spread sequence, 64-bit lanes) */
  def spreadBits16(c: Column): Column = {
    var x = c.cast("long").bitwiseAND(lit(0xFFFFL))
    x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x33333333L))
    x = (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x55555555L))
    x
  }

  /** quantize a numeric column onto [0, 2^16) given fixed bounds —
    * bounds are part of the key's definition so the same formula
    * replays anywhere (the DuckDB oracle replays it verbatim) */
  def quantize16(c: Column, min: Double, max: Double): Column = {
    val span = math.max(max - min, java.lang.Double.MIN_NORMAL)
    least(greatest(
      floor((c.cast("double") - lit(min)) / lit(span) * lit(65536.0)), lit(0.0)),
      lit(65535.0)).cast("long")
  }

  /** 2-D Morton key over quantized columns (x even bits, y odd bits) */
  def zkey2(x: Column, y: Column): Column =
    spreadBits16(x).bitwiseOR(shiftleft(spreadBits16(y), 1))

  /** N-D Morton key: dimension i owns bits i, i+n, i+2n, … Built by
    * composing per-dimension spreads at stride n (n ≤ 4 keeps the key
    * in 64 bits at 16 bits/dim). */
  def zkeyN(cols: Seq[Column]): Column = {
    require(cols.nonEmpty && cols.size <= 4, "zkeyN takes 1-4 quantized columns")
    val n = cols.size
    if (n == 1) return cols.head
    if (n == 2) return zkey2(cols.head, cols(1))
    // general stride: place bit b of dim i at position b*n + i
    cols.zipWithIndex.map { case (c, i) =>
      (0 until 16).map { b =>
        shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + i)
      }.reduce((l, r) => l.bitwiseOR(r))
    }.reduce((l, r) => l.bitwiseOR(r))
  }

  final case class Dim(column: String, min: Double, max: Double)

  /** Morton key column for the given dimensions with fixed bounds. */
  def mortonKey(dims: Seq[Dim]): Column =
    zkeyN(dims.map(d => quantize16(col(d.column), d.min, d.max)))

  /** Rewrite `df` into Z-order: range-partitioned then sorted by the
    * Morton key over `dims` (bounds computed in one aggregate when not
    * given). `numPartitions` sizes the output files — at cluster scale
    * one partition becomes one parquet file whose per-file statistics
    * cover a compact N-dimensional box. */
  def zorderBy(df: DataFrame, columns: Seq[String], numPartitions: Int,
      bounds: Map[String, (Double, Double)] = Map.empty): DataFrame = {
    val missing = columns.filterNot(bounds.contains)
    val computed: Map[String, (Double, Double)] =
      if (missing.isEmpty) Map.empty
      else {
        // ONE aggregate job for every unbounded column — a second scan
        // per column would read the table N times at cluster scale
        val aggs = missing.flatMap(c => Seq(
          min(col(c)).cast("double").as(s"__mn_$c"),
          max(col(c)).cast("double").as(s"__mx_$c")))
        val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        missing.map(c => c ->
          (r.getAs[Double](s"__mn_$c"), r.getAs[Double](s"__mx_$c"))).toMap
      }
    val dims = columns.map { c =>
      val (mn, mx) = bounds.getOrElse(c, computed(c))
      Dim(c, mn, mx)
    }
    val key = mortonKey(dims)
    df.withColumn("__zkey", key)
      .repartitionByRange(numPartitions, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
  }
}
