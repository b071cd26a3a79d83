package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Sketch probe kernels. The bloom membership test is a custom codegen
  * expression rather than composed built-ins for one reason: its k bit
  * tests all derive from ONE 48-bit hash, and a composed predicate
  * inlines the md5 child once per occurrence (FilterExec does no
  * subexpression elimination — the composed form measured 12 md5
  * evaluations per probe row, 24 s where this kernel takes 3). The
  * hash is the expression's single child, so it is evaluated exactly
  * once per row wherever the predicate lands.
  */
object SketchExprs {

  /** the double-hash bit walk — MUST match
    * [[graft.operators.Sketches]]'s `doubleHashFrom` derivation
    * (h ≥ 0, so plain `%` equals pmod) */
  def bloomTestKernel(h: Long, words: Array[Long], m: Int, k: Int): Boolean = {
    val h1 = h % m
    val h2 = (h >> 13) % m * 2 + 1
    var i = 0
    while (i < k) {
      val pos = ((h1 + i * h2) % m).toInt
      if ((words(pos >> 6) & (1L << (pos & 63))) == 0) return false
      i += 1
    }
    true
  }

  /** true iff all k double-hash positions of the child hash are set in
    * the bitmap; the bitmap rides as a codegen reference object */
  case class BloomTest(child: Expression, words: Array[Long], m: Int, k: Int)
      extends UnaryExpression with Predicate {
    override def prettyName: String = "graft_bloom_test"
    override def nullSafeEval(a: Any): Any =
      bloomTestKernel(a.asInstanceOf[Long], words, m, k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val w = ctx.addReferenceObj("bloomWords", words, "long[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.SketchExprs.bloomTestKernel($c, $w, $m, $k);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def bloom_test(h: Column, words: Array[Long], m: Int, k: Int): Column =
    ColumnBridge.column(BloomTest(ColumnBridge.expression(h), words, m, k))
}
