package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the scale-stress generator's contract: linear fact growth,
  * per-copy join-graph preservation, unscaled dims, disjoint shingle
  * spaces across document copies, and determinism — the properties
  * the BENCH_sf1_scaling.json methodology rests on. */
class ScaleUpSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)
  lazy val sf = "/root/testdata/sf0.001"

  private def rmTree(p: String): Unit = {
    import java.nio.file._
    if (Files.exists(Paths.get(p)))
      Files.walk(Paths.get(p)).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
  }

  test("scale-up: linear facts, preserved join graph, unscaled dims, rotated text") {
    val out = java.nio.file.Files.createTempDirectory("graft-scaleup").toString
    graft.tools.ScaleUp.scale(spark, sf, out, factor = 3)
    def n(dir: String, t: String): Long =
      spark.read.parquet(s"$dir/$t.parquet").count()
    // facts scale by the factor, dims don't
    for (t <- Seq("lineitem", "orders", "customer", "part", "supplier",
        "events", "documents", "embeddings"))
      assert(n(out, t) == 3 * n(sf, t), s"$t must scale 3x")
    assert(n(out, "nation") == n(sf, "nation"), "dims stay broadcastable")
    assert(n(out, "region") == n(sf, "region"))
    // per-copy join graph: every o_custkey resolves, every l_orderkey
    // resolves — re-keying must keep copy i's orders on copy i's
    // customers (a dangling key means the offsets drifted)
    val cust = spark.read.parquet(s"$out/customer.parquet")
    val ord = spark.read.parquet(s"$out/orders.parquet")
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    assert(ord.join(cust, ord("o_custkey") === cust("c_custkey"), "left_anti")
      .count() == 0, "every order resolves its customer")
    assert(li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left_anti")
      .count() == 0, "every lineitem resolves its order")
    // keys stay unique after offsetting
    assert(cust.select("c_custkey").distinct().count() == cust.count())
    assert(ord.select("o_orderkey").distinct().count() == ord.count())
    // document text rotates per copy: the distinct-text count scales
    // with the copies (identical corpora would collapse and fake a
    // quadratic dup structure), and per-copy dup RATE is preserved
    val docs0 = spark.read.parquet(s"$sf/documents.parquet")
    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.select("text").distinct().count() ==
      3 * docs0.select("text").distinct().count(),
      "each copy's text space must be disjoint")
    // determinism: a second run produces the identical row multiset
    val out2 = java.nio.file.Files.createTempDirectory("graft-scaleup2").toString
    graft.tools.ScaleUp.scale(spark, sf, out2, factor = 3)
    val a = spark.read.parquet(s"$out/lineitem.parquet")
    val b = spark.read.parquet(s"$out2/lineitem.parquet")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "re-running the generator must be bit-reproducible")
    // embeddings: copy-0 vectors identical to source, later copies
    // nudged (never exact duplicates of copy 0)
    val emb0 = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    val v0 = emb0.count()
    assert(emb.join(emb0, Seq("vec_id", "embedding")).count() == v0,
      "copy 0 must be verbatim")
    assert(emb.select("embedding").distinct().count() == 3 * v0,
      "nudged copies must not duplicate vectors")
    // the two generated 3x datasets are big relative to test temp
    // space — clean up instead of leaking them per run
    rmTree(out); rmTree(out2)
  }

  test("scale-up: copy transforms stay pairwise distinct past 26 (case " +
      "flip composes — digit-free text included); factor > 52 refuses (r16)") {
    // pin the transform directly (a 27x generate here would be slow):
    // copy 26 = identity letter rotation + CASE FLIP, so even a
    // digit-free document differs from copy 0
    val text = "abc xyz" // deliberately digit-free
    def xlat(s: String, from: String, to: String): String =
      s.map(c => { val j = from.indexOf(c); if (j >= 0) to(j) else c })
    // reproduce rotAll's published contract
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase; val digits = "0123456789"
    def rot(s: String, k: Int) = { val j = k % s.length
      s.substring(j) + s.substring(0, j) }
    def copyOf(i: Int): String = {
      val k = i % 26
      val flip = (i / 26) % 2 == 1
      val letters = if (flip) rot(upper, k) + rot(lower, k)
        else rot(lower, k) + rot(upper, k)
      xlat(text, lower + upper + digits, letters + rot(digits, i % 10))
    }
    assert(copyOf(0) == text)
    assert(copyOf(26) == "ABC XYZ", copyOf(26)) // flip, not a repeat
    // all 52 transforms of letter-bearing text are pairwise distinct
    val all = (0 until 52).map(copyOf)
    assert(all.distinct.size == 52, "copies must be pairwise distinct")
    val e = intercept[IllegalArgumentException] {
      graft.tools.ScaleUp.scale(spark, sf,
        java.nio.file.Files.createTempDirectory("graft-scaleup-reject")
          .toString, factor = 53)
    }
    assert(e.getMessage.contains("pairwise-distinct"), e.getMessage)
  }
}
