package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{CdxSource, WarcSource}

class CdxSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-cdx").toString

  test("cdx: written files are sorted, non-overlapping key ranges") {
    val s = spark
    import s.implicits._
    val rows = (0 until 100).map { i =>
      (f"com,h${i % 7}%d)/p/$i%03d", "20260101000000",
        s"http://h${i % 7}.com/p/$i", "text/html", 200, s"d$i", 10L + i,
        i * 100L, "part-00000.warc.gz")
    }.toDF("surt", "ts", "url", "mime", "status", "digest", "length",
      "offset", "filename")
    val dir = tmpDir()
    assert(CdxSource.write(rows, dir, files = 3) == 100)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".cdx"))
      .sortBy(_.getName)
    assert(files.length == 3)
    // each file internally sorted; file ranges don't overlap
    val perFile = files.map { f =>
      val keys = java.nio.file.Files.readAllLines(f.toPath).toArray(Array.empty[String])
        .filter(_.nonEmpty).map(_.split(" ", 3).take(2).mkString(" ")).toSeq
      assert(keys == keys.sorted, s"${f.getName} not sorted")
      keys
    }.filter(_.nonEmpty)
    perFile.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a.last <= b.head, "file ranges overlap")
      case _ =>
    }
    // read-back sees every row with fields intact
    val back = CdxSource.read(spark, Seq(dir))
    assert(back.count() == 100)
    val one = back.filter(col("url") === "http://h3.com/p/3").head()
    assert(one.getAs[String]("surt") == "com,h3)/p/003")
    assert(one.getAs[Int]("status") == 200)
    assert(one.getAs[Long]("offset") == 300L)
  }

  test("cdx: lookup prunes to 1 of 4 runs via range sidecars; legacy runs probe first/last lines (r13)") {
    val s = spark
    import s.implicits._
    val rows = (0 until 400).map { i =>
      (f"com,host)/p/$i%04d", "20260101000000",
        s"http://host.com/p/$i", "text/html", 200, s"d$i", 10L + i,
        i * 100L, "part-00000.warc.gz")
    }.toDF("surt", "ts", "url", "mime", "status", "digest", "length",
      "offset", "filename")
    val dir = tmpDir()
    assert(CdxSource.write(rows, dir, files = 4) == 400)
    // every non-empty run published a sidecar
    val sidecars = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".cdx.range"))
    assert(sidecars.length == 4, s"expected 4 sidecars, got ${sidecars.length}")
    // the FILES-OPENED pin: a point range keeps exactly 1 of 4 runs
    val (kept, total) = CdxSource.pruneFiles(Seq(dir),
      "com,host)/p/0100", "com,host)/p/0101")
    assert(total == 4 && kept.length == 1,
      s"point lookup must open 1 of 4 runs, opened ${kept.length} of $total")
    // pruned rows == full scan + filter (here: the single key)
    val hit = CdxSource.lookup(spark, Seq(dir),
      "com,host)/p/0100", "com,host)/p/0101").collect()
    assert(hit.length == 1 && hit(0).getAs[String]("url") == "http://host.com/p/100")
    // an out-of-range lookup opens ZERO files and returns empty w/ schema
    val miss = CdxSource.lookup(spark, Seq(dir), "zzz", "zzzz")
    assert(miss.isEmpty && miss.columns.toSeq == CdxSource.schema.fieldNames.toSeq)
    // a straddling range keeps only the intersecting runs
    val (k2, _) = CdxSource.pruneFiles(Seq(dir),
      "com,host)/p/0000", "com,host)/p/0150")
    assert(k2.length == 2, s"straddle must keep 2 runs, kept ${k2.length}")
    // LEGACY layout (no sidecars): delete them — lookup still prunes by
    // probing each run's first/last lines, same rows
    sidecars.foreach(f => assert(f.delete()))
    val (k3, t3) = CdxSource.pruneFiles(Seq(dir),
      "com,host)/p/0100", "com,host)/p/0101")
    assert(t3 == 4 && k3.length == 1,
      s"probe fallback must open 1 of 4, opened ${k3.length}")
    val hit2 = CdxSource.lookup(spark, Seq(dir),
      "com,host)/p/0100", "com,host)/p/0101").collect()
    assert(hit2.length == 1 && hit2(0).getAs[Long]("offset") == 10000L)
    intercept[IllegalArgumentException] {
      CdxSource.lookup(spark, Seq(dir), "b", "a")
    }
  }

  test("cdx: legacy tail probe refuses start-truncated fragments; empty dir reads empty (r14)") {
    val dir = tmpDir()
    // a legacy run (no sidecar) whose LAST line exceeds the 64 KiB probe
    // window: the window holds a mid-line fragment with no preceding
    // '\n' — fileRange must return None (unpruneable), never fabricate
    // a max key from the fragment, and pruneFiles must KEEP the file
    val huge = "com,zz)/tail 20260101000000 {\"url\":\"http://zz/" +
      ("x" * (80 * 1024)) + "\"}"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "legacy.cdx"),
      ("com,aa)/head 20260101000000 {\"url\":\"http://aa/\"}\n" + huge + "\n")
        .getBytes(UTF_8))
    val f = s"$dir/legacy.cdx"
    assert(CdxSource.fileRange(f).isEmpty,
      "a >window last line must make the file unpruneable, not mis-keyed")
    // the range it would have fabricated ("com,zz)/tail..." fragment →
    // garbage) could prune a lookup below it; unpruneable keeps the file
    val (kept, total) = CdxSource.pruneFiles(Seq(dir), "com,m", "com,n")
    assert(total == 1 && kept.length == 1, "unprobeable file must stay in")
    // a small single-line legacy file (window covers whole file, no
    // trailing '\n' before the line) still derives its range
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "one.cdx"),
      "com,bb)/only 20260101000000 {\"url\":\"http://bb/\"}".getBytes(UTF_8))
    assert(CdxSource.fileRange(s"$dir/one.cdx")
      .contains(("com,bb)/only", "com,bb)/only")))
    // trailing blank / whitespace-only lines skip — the max key comes
    // from the last NON-blank complete line, never a fabricated ""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "blanky.cdx"),
      ("com,cc)/a 20260101000000 {\"url\":\"http://cc/\"}\n" +
        "com,cc)/b 20260101000000 {\"url\":\"http://cc/b\"}\n \n\n")
        .getBytes(UTF_8))
    assert(CdxSource.fileRange(s"$dir/blanky.cdx")
      .contains(("com,cc)/a", "com,cc)/b")))
    // sidecars publish atomically — no staging residue next to them
    val s = spark
    import s.implicits._
    val rows = Seq(("com,p)/q", "20260101000000", "http://p/q", "text/html",
      200, "d", 1L, 0L, "w.warc.gz")).toDF("surt", "ts", "url", "mime",
      "status", "digest", "length", "offset", "filename")
    val dir2 = tmpDir()
    CdxSource.write(rows, dir2, files = 1)
    val names = new java.io.File(dir2).listFiles().map(_.getName).toSet
    assert(names.exists(_.endsWith(".cdx.range")))
    assert(!names.exists(_.contains(".tmp")), s"staging residue: $names")
    // a directory that exists but holds no .cdx runs reads as an EMPTY
    // index (not an AnalysisException from a zero-match glob)
    val emptyDir = tmpDir()
    val empty = CdxSource.read(spark, Seq(emptyDir))
    assert(empty.isEmpty &&
      empty.columns.toSeq == CdxSource.schema.fieldNames.toSeq)
  }

  test("cdx: randomized lookups — pruned rows equal full scan + filter over 20 ranges (r14)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260815L)
    // random SURTs across a handful of hosts — range-partitioned into
    // 5 runs, so most lookups genuinely prune files
    val rows = (0 until 300).map { i =>
      val host = s"com,h${rnd.nextInt(6)})"
      (s"$host/p/${rnd.nextInt(1000)}%03d-$i", "20260101000000",
        s"http://x/$i", "text/html", 200, s"d$i", 1L, i.toLong, "w.warc.gz")
    }.toDF("surt", "ts", "url", "mime", "status", "digest", "length",
      "offset", "filename")
    val dir = tmpDir()
    CdxSource.write(rows, dir, files = 5)
    val full = CdxSource.read(spark, Seq(dir))
    (1 to 20).foreach { trial =>
      val a = s"com,h${rnd.nextInt(7)})/p/${rnd.nextInt(1100)}"
      val b = s"com,h${rnd.nextInt(7)})/p/${rnd.nextInt(1100)}"
      val (lo, hi) = if (a < b) (a, b) else (b, a + "~")
      val got = CdxSource.lookup(spark, Seq(dir), lo, hi)
        .select("surt", "offset").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      val want = full.filter(col("surt") >= lo && col("surt") < hi)
        .select("surt", "offset").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == want, s"trial $trial [$lo, $hi): " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }

  test("cdx: DSL surt-range filter prunes files at plan time; aliases never misprune (r14)") {
    val s = spark
    import s.implicits._
    val rows = (0 until 400).map { i =>
      (f"com,host)/p/$i%04d", "20260101000000",
        s"http://host.com/p/$i", "text/html", 200, s"d$i", 10L + i,
        i * 100L, "part-00000.warc.gz")
    }.toDF("surt", "ts", "url", "mime", "status", "digest", "length",
      "offset", "filename")
    val dir = tmpDir()
    assert(CdxSource.write(rows, dir, files = 4) == 400)
    // the DSL front door reaches the sidecar pruning: a point surt
    // range plans a scan over 1 of the 4 runs (inputFiles is the
    // physical scan's file list — the FILES-OPENED pin for this path)
    val viaDsl = graft.dsl.JsonQuery.compile(spark,
      s"""{"from": {"cdx": {"paths": ["$dir"]}},
           "select": ["surt", "url", "offset"],
           "filter": {"and": [
             {"column": "surt", "gt_eq": "com,host)/p/0100"},
             {"column": "surt", "lt": "com,host)/p/0101"}]}}""")
    assert(viaDsl.inputFiles.length == 1,
      s"DSL point lookup must scan 1 of 4 runs, scanned ${viaDsl.inputFiles.length}")
    val hit = viaDsl.collect()
    assert(hit.length == 1 && hit(0).getAs[String]("url") == "http://host.com/p/100")
    // a one-sided bound still prunes (the open side widens to ±inf)
    val oneSided = graft.dsl.JsonQuery.compile(spark,
      s"""{"from": {"cdx": {"paths": ["$dir"]}},
           "select": ["surt"],
           "filter": {"column": "surt", "gt_eq": "com,host)/p/0395"}}""")
    // (range-partition boundaries are sampled, so the 5-row tail may
    // straddle a boundary — pin "pruned", not an exact count)
    assert(oneSided.inputFiles.length <= 2 && oneSided.count() == 5)
    // ALIAS SHADOWING: filters bind post-projection — `surt` here is
    // the renamed ts column, so its conds must NOT drive file pruning
    // (all 4 runs scan) and the rows are the ts-filtered ones
    val aliased = graft.dsl.JsonQuery.compile(spark,
      s"""{"from": {"cdx": {"paths": ["$dir"]}},
           "select": [{"column": "ts", "alias": "surt"}, "url"],
           "filter": {"column": "surt", "eq": "20260101000000"}}""")
    assert(aliased.inputFiles.length == 4,
      "a select-shadowed surt name must not prune index files")
    assert(aliased.count() == 400)
    // an OR subtree contributes no bounds — conservative full scan
    val ored = graft.dsl.JsonQuery.compile(spark,
      s"""{"from": {"cdx": {"paths": ["$dir"]}},
           "select": ["surt"],
           "filter": {"or": [
             {"column": "surt", "lt": "com,host)/p/0002"},
             {"column": "surt", "gt_eq": "com,host)/p/0399"}]}}""")
    assert(ored.inputFiles.length == 4 && ored.count() == 3)
  }

  test("cdx: blank lines skip; a malformed JSON block yields null fields, not a failure") {
    val dir = tmpDir()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "mixed.cdx"),
      ("com,a)/x 20260101000000 {\"url\":\"http://a.com/x\",\"status\":200,\"offset\":5}\n" +
        "\n" +
        "com,b)/y 20260101000001 not-json-at-all\n").getBytes(UTF_8))
    val rows = CdxSource.read(spark, Seq(dir)).orderBy("surt").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("url") == "http://a.com/x")
    assert(rows(0).getAs[Long]("offset") == 5L)
    assert(rows(0).isNullAt(rows(0).fieldIndex("mime"))) // absent field
    assert(rows(1).getAs[String]("surt") == "com,b)/y")  // key still parses
    assert(rows(1).isNullAt(rows(1).fieldIndex("url")))  // block nulls out
  }

  test("cdx: latest keeps the newest capture per key, deterministic tie-breaks (r12)") {
    val s = spark
    import s.implicits._
    def row(surt: String, ts: String, dig: String, off: Long, file: String) =
      (surt, ts, s"http://u/$surt", "text/html", 200, dig, 10L, off, file)
    val g1 = Seq(
      row("com,a)/x", "20260101000000", "old", 0L, "g1.warc.gz"),
      row("com,b)/y", "20260105000000", "only", 8L, "g1.warc.gz")).toDF(
      "surt", "ts", "url", "mime", "status", "digest", "length", "offset", "filename")
    val g2 = Seq(
      row("com,a)/x", "20260201000000", "new", 4L, "g2.warc.gz"),
      // exact ts tie with g2's first row's key? no — a TIE on another key:
      row("com,c)/z", "20260102000000", "t1", 2L, "ga.warc.gz"),
      row("com,c)/z", "20260102000000", "t2", 1L, "gb.warc.gz")).toDF(
      "surt", "ts", "url", "mime", "status", "digest", "length", "offset", "filename")
    val m = graft.sources.CdxSource.latest(g1, g2)
      .collect().map(r => r.getAs[String]("surt") -> r.getAs[String]("digest")).toMap
    assert(m == Map("com,a)/x" -> "new", "com,b)/y" -> "only",
      "com,c)/z" -> "t2")) // ts tie → filename desc wins (gb > ga)
    // single generation passes through unchanged
    assert(graft.sources.CdxSource.latest(g1).count() == 2)
    intercept[IllegalArgumentException] { graft.sources.CdxSource.latest() }
  }

  test("DSL cdx latest + stats pruning: non-key conds must not resurrect stale captures") {
    val s = spark
    import s.implicits._
    val dir = tmpDir()
    // generation A holds the OLD capture; generation B the NEW one,
    // whose ts fails the query filter
    def gen(sub: String, ts: String): String = {
      val rows = Seq(("com,k)/page", ts, "http://k.com/page", "text/html",
        200, s"d$ts", 10L, 0L, "f.warc.gz")).toDF(
        "surt", "ts", "url", "mime", "status", "digest", "length",
        "offset", "filename")
      graft.sources.CdxSource.write(rows, s"$dir/$sub", files = 1)
      s"$dir/$sub"
    }
    val a = gen("a", "20260101000000")
    val b = gen("b", "20260109000000")
    val files = Seq(a, b).flatMap(d => new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".cdx")).map(_.toString))
    graft.stats.FileStats.write(
      graft.stats.FileStats.collectFrom(
        graft.sources.CdxSource.read(spark, files)), s"$dir/stats")
    def q(latest: Boolean): Seq[(String, String)] =
      graft.dsl.JsonQuery.compile(spark,
        s"""{"from": {"cdx": {"paths": ["$a", "$b"], "stats": "$dir/stats",
              "latest": $latest}},
             "select": ["surt", "ts"],
             "filters": [{"column": "ts", "lt": "20260107000000"}]}""")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // newest-wins runs FIRST: the 01-09 capture wins the key, then
    // fails the filter — the key is absent. A ts-cond file prune would
    // drop the newest file and resurrect the stale 01-01 row.
    assert(q(latest = true).isEmpty)
    // without latest the filter is per-row; the old capture is a
    // correct answer, and the ts prune may legitimately skip file b
    assert(q(latest = false) == Seq(("com,k)/page", "20260101000000")))
  }

  test("cdx: index derives surt/ts/mime/digest from a warc scan; DSL format reads it") {
    val s = spark
    import s.implicits._
    val pages = Seq(("http://T.example:80/a?utm_x=1&k=2", "<p>hello body</p>"))
      .toDF("uri", "html")
    val dir = tmpDir()
    WarcSource.Writer.write(pages, s"$dir/warc", "uri", "html", files = 1, gzip = true)
    val idx = CdxSource.index(WarcSource.read(spark, Seq(s"$dir/warc")))
    val r = idx.head()
    assert(r.getAs[String]("surt") == "example,t)/a?k=2") // normalized first
    assert(r.getAs[String]("ts") == "20260101000000")
    assert(r.getAs[String]("mime") == "text/html")        // params stripped
    assert(r.getAs[String]("filename") == "part-00000.warc.gz")
    CdxSource.write(idx, s"$dir/cdx")
    val viaDsl = graft.dsl.JsonQuery.compile(spark,
      s"""{"from": {"cdx": {"paths": ["$dir/cdx"]}},
           "select": ["surt", "url", "offset"]}""")
    assert(viaDsl.head().getAs[String]("surt") == "example,t)/a?k=2")
  }
}
