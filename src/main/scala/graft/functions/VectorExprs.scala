package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen._
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native vector/sketch expressions for the similarity and dedup
  * operators. The composed `zip_with`/`aggregate` higher-order versions
  * evaluate an interpreted closure per element — at ~2M pairs × 64 dims
  * that was ~100× the cost of the scan. These expressions run a tight
  * primitive loop per row; dot/norm generate Java directly so the whole
  * pair-scoring stage stays inside WholeStageCodegen.
  *
  * Numeric contract: identical to the HOF formulation (left-to-right
  * double-precision fold), so the DuckDB oracles are unaffected.
  */
object VectorExprs {

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"expected array<float|double>, got ${other.simpleString}")
  }

  /** loud element-type gate for the integer-array kernels: reading an
    * int slot out of a double array would return garbage, not raise —
    * these expressions are SQL-registered, so any argument type can
    * reach them */
  private def requireElem(e: Expression, t: DataType, fn: String): Unit =
    e.dataType match {
      case ArrayType(et, _) if et == t => ()
      case other => throw new IllegalArgumentException(
        s"$fn: expected array<${t.simpleString}>, got ${other.simpleString}")
    }

  /** dot(a, b): Σ a_i·b_i in double, left-to-right */
  case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      val lf = elemIsFloat(left); val rf = elemIsFloat(right)
      var s = 0.0
      var i = 0
      while (i < n) {
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        s += xv * yv
        i += 1
      }
      s
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
      val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        s"""
          int $n = java.lang.Math.min($a.numElements(), $b.numElements());
          double ${ev.value}_acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            ${ev.value}_acc += (double) $a.$lGet($i) * (double) $b.$rGet($i);
          }
          ${ev.value} = ${ev.value}_acc;
        """
      })
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  /** norm(a): sqrt(Σ a_i²) in double */
  case class VecNorm(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_norm"
    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val f = elemIsFloat(child)
      var s = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) {
        val v = if (f) x.getFloat(i).toDouble else x.getDouble(i)
        s += v * v
        i += 1
      }
      math.sqrt(s)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val get = if (elemIsFloat(child)) "getFloat" else "getDouble"
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val v = ctx.freshName("v")
        s"""
          double ${ev.value}_acc = 0.0;
          for (int $i = 0; $i < $a.numElements(); $i++) {
            double $v = (double) $a.$get($i);
            ${ev.value}_acc += $v * $v;
          }
          ${ev.value} = java.lang.Math.sqrt(${ev.value}_acc);
        """
      })
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** cosine = dot / (norm·norm) with the same expression shape as the
    * HOF version: dot(a,b) / (norm(a) * norm(b)) */
  def cosineExpr(a: Expression, b: Expression): Expression =
    Divide(VecDot(a, b), Multiply(VecNorm(a), VecNorm(b)))

  /** Sign-bit binary quantization: bit `j` of word `w` is set iff
    * component `64·w + j` is STRICTLY positive (zeros and negatives
    * clear — one fixed rule both engines and the oracle share). One
    * bit per dimension packs a float32 embedding 32×; downstream
    * scoring is [[HammingDist]]'s popcount scan. */
  case class BitSign(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "bit_sign"
    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val f = elemIsFloat(child)
      val n = x.numElements()
      val out = new Array[Long]((n + 63) >>> 6)
      var i = 0
      while (i < n) {
        val v = if (f) x.getFloat(i).toDouble else x.getDouble(i)
        if (v > 0.0) out(i >>> 6) |= (1L << (i & 63))
        i += 1
      }
      ArrayData.toArrayData(out)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val get = if (elemIsFloat(child)) "getFloat" else "getDouble"
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val w = ctx.freshName("w")
        s"""
          int $n = $a.numElements();
          long[] $w = new long[($n + 63) >>> 6];
          for (int $i = 0; $i < $n; $i++) {
            if ((double) $a.$get($i) > 0.0) $w[$i >>> 6] |= (1L << ($i & 63));
          }
          ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($w);
        """
      })
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** Hamming distance between two packed sign-bit signatures
    * ([[BitSign]]'s output): Σ popcount(a_w XOR b_w). Signatures of
    * different widths raise — a silent zero-extension would understate
    * distances between vectors that were never comparable. The hot
    * pair-scoring loop of the binary ANN scan, kept in codegen. */
  case class HammingDist(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "hamming_dist"
    override def nullSafeEval(a: Any, b: Any): Any = {
      requireElem(left, LongType, prettyName)
      requireElem(right, LongType, prettyName)
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) throw new IllegalArgumentException(
        s"hamming_dist: signature widths differ ($n vs ${y.numElements()} words)")
      var d = 0
      var i = 0
      while (i < n) {
        d += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
        i += 1
      }
      d
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      requireElem(left, LongType, prettyName)
      requireElem(right, LongType, prettyName)
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val d = ctx.freshName("d")
        s"""
          if ($a.numElements() != $b.numElements())
            throw new IllegalArgumentException("hamming_dist: signature widths differ ("
              + $a.numElements() + " vs " + $b.numElements() + " words)");
          int $d = 0;
          for (int $i = 0; $i < $a.numElements(); $i++) {
            $d += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
          }
          ${ev.value} = $d;
        """
      })
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  /** exact integer dot of two int-code arrays ([[Sq8Encode]]'s output):
    * Σ a_i·b_i as a long — every term is ≤ 127² so the sum is exact at
    * any realistic dimensionality, and the oracle replays it as plain
    * integer SQL. Same min-length fold contract as [[VecDot]]. */
  case class VecIDot(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "vec_idot"
    override def nullSafeEval(a: Any, b: Any): Any = {
      requireElem(left, IntegerType, prettyName)
      requireElem(right, IntegerType, prettyName)
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0L
      var i = 0
      while (i < n) {
        s += x.getInt(i).toLong * y.getInt(i)
        i += 1
      }
      s
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      requireElem(left, IntegerType, prettyName)
      requireElem(right, IntegerType, prettyName)
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        s"""
          int $n = java.lang.Math.min($a.numElements(), $b.numElements());
          long ${ev.value}_acc = 0L;
          for (int $i = 0; $i < $n; $i++) {
            ${ev.value}_acc += (long) $a.getInt($i) * (long) $b.getInt($i);
          }
          ${ev.value} = ${ev.value}_acc;
        """
      })
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  /** Per-vector int8 scalar quantization (the Faiss SQ8 shape): with
    * s = max_i |v_i|, code_i = floor(127·v_i/s + 0.5) ∈ [−127, 127] —
    * explicit floor(x + 0.5) so Spark and the SQL oracle round
    * identically (round() half-away vs Math.round half-up disagree on
    * negative halves). An all-zero vector codes to all zeros. Codes
    * ride as array<int>: the quantization's 4× memory cut is real at
    * rest (parquet byte-packs the small ints) while integer reads keep
    * the scoring loop ([[VecIDot]]) and the oracle replay trivial. */
  case class Sq8Encode(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "sq8_encode"
    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val f = elemIsFloat(child)
      val n = x.numElements()
      var mx = 0.0
      var i = 0
      while (i < n) {
        val v = if (f) x.getFloat(i).toDouble else x.getDouble(i)
        val av = if (v < 0.0) -v else v
        if (av > mx) mx = av
        i += 1
      }
      val out = new Array[Int](n)
      if (mx > 0.0) {
        i = 0
        while (i < n) {
          val v = if (f) x.getFloat(i).toDouble else x.getDouble(i)
          out(i) = java.lang.Math.floor(v * 127.0 / mx + 0.5).toInt
          i += 1
        }
      }
      ArrayData.toArrayData(out)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val get = if (elemIsFloat(child)) "getFloat" else "getDouble"
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val mx = ctx.freshName("mx")
        val v = ctx.freshName("v")
        val out = ctx.freshName("out")
        s"""
          int $n = $a.numElements();
          double $mx = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $v = (double) $a.$get($i);
            if ($v < 0.0) $v = -$v;
            if ($v > $mx) $mx = $v;
          }
          int[] $out = new int[$n];
          if ($mx > 0.0) {
            for (int $i = 0; $i < $n; $i++) {
              $out[$i] = (int) java.lang.Math.floor(
                (double) $a.$get($i) * 127.0 / $mx + 0.5);
            }
          }
          ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
        """
      })
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** interpreter-free kernel for [[SimHash64]]'s generated code (r17:
    * the StWithinPoint recipe — a static callsite gets its OWN JIT
    * profile instead of sharing the interpreter's megamorphic eval) */
  def simHash64Kernel(toks: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      val s = toks.getUTF8String(t)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  /** 64-bit SimHash over an array of token strings (xxhash64 seed 42,
    * matching Spark's `xxhash64` builtin bit-for-bit). One pass per row.
    *
    * Codegen-native (r17, verdict r16): NOT CodegenFallback — this is
    * a corpus-hot kernel (simhash dedup, streaming near-dup) and a
    * fallback expression evicts its WHOLE stage from WholeStageCodegen.
    * Input type pinned so the generated call is monomorphic. */
  case class SimHash64(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    // type inferred: AbstractDataType is private[sql], but covariance
    // lets Seq[DataType] satisfy the override
    override def inputTypes = Seq(ArrayType(StringType))
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"
    override def nullSafeEval(a: Any): Any =
      simHash64Kernel(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.VectorExprs.simHash64Kernel($a);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** deterministic Rademacher plane components for [[LshBands]],
    * tabulated ONCE per (seed, nPlanes, dims) and cached JVM-wide:
    * component (p, i) = parity of the same XXH64 fold the per-row loop
    * used to recompute — identical bits, ~3 hash calls × planes × dims
    * FEWER per row. Bounded cache (an engine run uses a handful of
    * plane configs); unexpected churn falls back to tabulate-per-call,
    * never to wrong bits. */
  object LshPlanes {
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Double]]()
    def comps(seed: Long, nPlanes: Int, dims: Int): Array[Double] = {
      val key = (seed, nPlanes, dims)
      val hit = cache.get(key)
      if (hit != null) return hit
      val c = new Array[Double](nPlanes * dims)
      var p = 0
      while (p < nPlanes) {
        var i = 0
        while (i < dims) {
          var h = XxHashHelper.hashLong(seed, 42L)
          h = XxHashHelper.hashLong(p.toLong, h)
          h = XxHashHelper.hashLong(i.toLong, h)
          c(p * dims + i) = if ((h & 1L) == 0L) 1.0 else -1.0
          i += 1
        }
        p += 1
      }
      if (cache.size < 64) cache.putIfAbsent(key, c)
      c
    }
  }

  /** interpreter-free kernel for [[LshBands]] (r17) — identical bit
    * stream to the original per-row hash loop, planes precomputed */
  def lshBandsKernel(x: ArrayData, isFloat: Boolean, nPlanes: Int,
      seed: Long, bandBits: Int): ArrayData = {
    val dims = x.numElements()
    val comps = LshPlanes.comps(seed, nPlanes, dims)
    val bands = new Array[Long](nPlanes / bandBits)
    var p = 0
    while (p < nPlanes) {
      var s = 0.0
      var i = 0
      val off = p * dims
      while (i < dims) {
        val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        s += v * comps(off + i)
        i += 1
      }
      if (s >= 0) bands(p / bandBits) |= (1L << (p % bandBits))
      p += 1
    }
    ArrayData.toArrayData(bands)
  }

  /** LSH band keys: projections onto `nPlanes` Rademacher hyperplanes
    * (component = parity of an XXH64 fold of (seed, plane, dim)), sign
    * bits grouped into bands of `bandBits`. One pass over the vector
    * per plane, all planes in one expression.
    *
    * Codegen-native (r17, verdict r16): corpus-hot (LSH dedup, ANN
    * bucketing, streaming near-dup) — same eviction trap as SimHash64.
    * The plane components are row-invariant, so they tabulate once per
    * (seed, planes, dims) instead of 3 XXH64 calls per component per
    * ROW — the interpreted HOF shape this expression replaced paid
    * that on every row. */
  case class LshBands(child: Expression, nPlanes: Int, seed: Long, bandBits: Int)
      extends UnaryExpression {
    require(nPlanes % bandBits == 0, "bandBits must divide nPlanes")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "lsh_bands"
    @transient private lazy val isFloat = elemIsFloat(child)
    override def nullSafeEval(a: Any): Any =
      lshBandsKernel(a.asInstanceOf[ArrayData], isFloat, nPlanes, seed, bandBits)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.VectorExprs.lshBandsKernel(" +
          s"$a, $isFloat, $nPlanes, ${seed}L, $bandBits);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  object XxHashHelper {
    def hashLong(v: Long, seed: Long): Long =
      org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(v, seed)
  }

  /** arg-min-distance centroid assignment for the IVF index: the
    * centroid matrix (bounded: k × dims doubles, driver-fit by
    * construction) rides along as a codegen reference object, so the
    * map-only assign pass stays in WholeStageCodegen with no per-row
    * Seq[Float] boxing. Ties break to the lowest index (same contract
    * as the trainer's assignment loop). */
  case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "nearest_centroid"
    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val f = elemIsFloat(child)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        val cv = centroids(c)
        val n = math.min(x.numElements(), cv.length)
        var d = 0.0
        var i = 0
        while (i < n) {
          val v = (if (f) x.getFloat(i).toDouble else x.getDouble(i)) - cv(i)
          d += v * v
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val get = if (elemIsFloat(child)) "getFloat" else "getDouble"
      val cs = ctx.addReferenceObj("centroids", centroids, "double[][]")
      nullSafeCodeGen(ctx, ev, a => {
        val c = ctx.freshName("c")
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val d = ctx.freshName("d")
        val v = ctx.freshName("v")
        val cv = ctx.freshName("cv")
        val bestD = ctx.freshName("bestD")
        s"""
          int ${ev.value}_best = 0;
          double $bestD = Double.MAX_VALUE;
          for (int $c = 0; $c < $cs.length; $c++) {
            double[] $cv = $cs[$c];
            int $n = java.lang.Math.min($a.numElements(), $cv.length);
            double $d = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              double $v = (double) $a.$get($i) - $cv[$i];
              $d += $v * $v;
            }
            if ($d < $bestD) { $bestD = $d; ${ev.value}_best = $c; }
          }
          ${ev.value} = ${ev.value}_best;
        """
      })
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Product-quantization encode (Jégou et al. 2011): the vector's m
    * equal slices each arg-min against their own subspace codebook →
    * array<int> of m codes. The [m][k][subDim] codebook rides as ONE
    * codegen reference object; the corpus-wide encode pass is the hot
    * map, so it stays in WholeStageCodegen. Ties → lowest code (the
    * trainer's contract). */
  case class PqEncode(child: Expression, sub: Array[Array[Array[Double]]])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "pq_encode"
    private def subDim: Int = sub(0)(0).length
    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val f = elemIsFloat(child)
      val out = new Array[Int](sub.length)
      var s = 0
      while (s < sub.length) {
        val off = s * subDim
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < sub(s).length) {
          val cv = sub(s)(c)
          var d = 0.0
          var i = 0
          while (i < subDim) {
            val v = (if (f) x.getFloat(off + i).toDouble
              else x.getDouble(off + i)) - cv(i)
            d += v * v
            i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        out(s) = best
        s += 1
      }
      ArrayData.toArrayData(out)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val get = if (elemIsFloat(child)) "getFloat" else "getDouble"
      val cb = ctx.addReferenceObj("pqCodebook", sub, "double[][][]")
      nullSafeCodeGen(ctx, ev, a => {
        val out = ctx.freshName("out")
        val s = ctx.freshName("s")
        val c = ctx.freshName("c")
        val i = ctx.freshName("i")
        val d = ctx.freshName("d")
        val v = ctx.freshName("v")
        val cv = ctx.freshName("cv")
        val off = ctx.freshName("off")
        val best = ctx.freshName("best")
        val bestD = ctx.freshName("bestD")
        val sd = ctx.freshName("sd")
        s"""
          int[] $out = new int[$cb.length];
          int $sd = $cb[0][0].length;
          for (int $s = 0; $s < $cb.length; $s++) {
            int $off = $s * $sd;
            int $best = 0;
            double $bestD = Double.MAX_VALUE;
            for (int $c = 0; $c < $cb[$s].length; $c++) {
              double[] $cv = $cb[$s][$c];
              double $d = 0.0;
              for (int $i = 0; $i < $sd; $i++) {
                double $v = (double) $a.$get($off + $i) - $cv[$i];
                $d += $v * $v;
              }
              if ($d < $bestD) { $bestD = $d; $best = $c; }
            }
            $out[$s] = $best;
          }
          ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
        """
      })
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** query-side ADC lookup table: lut[s·k + c] = ‖q_s − codebook[s][c]‖²
    * — evaluated once per QUERY (the bounded broadcast side), so a
    * fallback eval is fine. */
  case class PqLut(child: Expression, sub: Array[Array[Array[Double]]])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "pq_lut"
    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val f = elemIsFloat(child)
      val m = sub.length
      val k = sub(0).length
      val subDim = sub(0)(0).length
      val out = new Array[Double](m * k)
      var s = 0
      while (s < m) {
        val off = s * subDim
        var c = 0
        while (c < k) {
          val cv = sub(s)(c)
          var d = 0.0
          var i = 0
          while (i < subDim) {
            val v = (if (f) x.getFloat(off + i).toDouble
              else x.getDouble(off + i)) - cv(i)
            d += v * v
            i += 1
          }
          out(s * k + c) = d
          c += 1
        }
        s += 1
      }
      ArrayData.toArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** the ADC inner loop: Σ_s lut[s·k + code[s]] — evaluated per
    * (query, corpus-row) pair, the hot path of a PQ scan; codegen'd so
    * the compressed linear scan stays in WholeStageCodegen. */
  case class AdcSum(left: Expression, right: Expression, k: Int)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "adc_sum"
    override def nullSafeEval(code: Any, lut: Any): Any = {
      val cd = code.asInstanceOf[ArrayData]
      val lt = lut.asInstanceOf[ArrayData]
      var d = 0.0
      var s = 0
      while (s < cd.numElements()) {
        d += lt.getDouble(s * k + cd.getInt(s))
        s += 1
      }
      d
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (code, lut) => {
        val s = ctx.freshName("s")
        val d = ctx.freshName("d")
        s"""
          double $d = 0.0;
          for (int $s = 0; $s < $code.numElements(); $s++) {
            $d += $lut.getDouble($s * $k + $code.getInt($s));
          }
          ${ev.value} = $d;
        """
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  // ------------------------------------------------- Column-level API

  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def vec_norm(a: Column): Column =
    ColumnBridge.column(VecNorm(ColumnBridge.expression(a)))

  def vec_cosine(a: Column, b: Column): Column =
    ColumnBridge.column(cosineExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def bit_sign(vec: Column): Column =
    ColumnBridge.column(BitSign(ColumnBridge.expression(vec)))

  def hamming_dist(a: Column, b: Column): Column =
    ColumnBridge.column(HammingDist(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def vec_idot(a: Column, b: Column): Column =
    ColumnBridge.column(VecIDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sq8_encode(vec: Column): Column =
    ColumnBridge.column(Sq8Encode(ColumnBridge.expression(vec)))

  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  def lsh_bands(vec: Column, nPlanes: Int, seed: Long, bandBits: Int): Column =
    ColumnBridge.column(LshBands(ColumnBridge.expression(vec), nPlanes, seed, bandBits))

  def nearest_centroid(vec: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(vec), centroids))

  def pq_encode(vec: Column, sub: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(vec), sub))

  def pq_lut(vec: Column, sub: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqLut(ColumnBridge.expression(vec), sub))

  def adc_sum(code: Column, lut: Column, k: Int): Column =
    ColumnBridge.column(AdcSum(
      ColumnBridge.expression(code), ColumnBridge.expression(lut), k))
}
