package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps
import graft.sources.WarcSource

/** read_warc: ISO 28500 record framing, HTTP payload parsing,
  * record-offset splits (split-count invariance + boundary-scan
  * false-magic resilience), gzip streams, and the html_extract
  * front-door heuristic the records feed. */
class WarcSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-warc").toString

  private def pages(n: Int) = {
    val s = spark
    import s.implicits._
    (0 until n).map(i => (s"http://t.example/$i",
      s"<html><body><p>Doc number $i body text with the usual words in it.</p></body></html>"))
      .toDF("uri", "html")
  }

  test("warc: record-size ceiling is per-read tunable, guard stays loud") {
    val dir = tmpDir()
    WarcSource.Writer.write(pages(3), dir, "uri", "html", files = 1)
    // a ceiling below the real record size fails loudly with the name
    val e = intercept[org.apache.spark.SparkException] {
      WarcSource.read(spark, Seq(dir), maxRecordBytes = 16).count()
    }
    assert(e.getMessage.contains("ceiling") || Option(e.getCause).exists(
      _.getMessage.contains("ceiling")), e.getMessage)
    // a raised ceiling reads archives the default would also accept
    assert(WarcSource.read(spark, Seq(dir), maxRecordBytes = 1024L * 1024 * 1024)
      .filter(org.apache.spark.sql.functions.col("warc_type") === "response")
      .count() == 3)
    intercept[IllegalArgumentException] {
      WarcSource.read(spark, Seq(dir), maxRecordBytes = 0)
    }
    // r15: ceilings above Int.MaxValue would wrap readFully's int length
    // to a negative/truncated allocation — reject loudly up front
    val big = intercept[IllegalArgumentException] {
      WarcSource.read(spark, Seq(dir), maxRecordBytes = Int.MaxValue.toLong + 1)
    }
    assert(big.getMessage.contains("Int.MaxValue") ||
      big.getMessage.contains(s"${Int.MaxValue}"), big.getMessage)
  }

  test("warc: write → read round trip surfaces record + http fields") {
    val dir = tmpDir()
    val written = WarcSource.Writer.write(pages(20), dir, "uri", "html", files = 2)
    assert(written == 20)
    val df = WarcSource.read(spark, Seq(dir)).cache()
    assert(df.filter(col("warc_type") === "warcinfo").count() == 2)
    val resp = df.filter(col("warc_type") === "response")
    assert(resp.count() == 20)
    val r = resp.filter(col("target_uri") === "http://t.example/7").head()
    assert(r.getAs[Int]("http_status") == 200)
    assert(r.getAs[String]("http_content_type").startsWith("text/html"))
    assert(r.getAs[String]("record_id") == "<urn:graft:response:http://t.example/7>")
    assert(r.getAs[java.time.LocalDateTime]("warc_date") ==
      java.time.LocalDateTime.of(2026, 1, 1, 0, 0))
    val body = new String(r.getAs[Array[Byte]]("body"), UTF_8)
    assert(body.contains("Doc number 7 body text"))
    assert(!body.contains("HTTP/1.1")) // headers stripped from body
    // content_length covers the FULL http block (headers + body)
    assert(r.getAs[Long]("content_length") > body.length)
    df.unpersist()
  }

  test("warc: record offsets point at real record starts") {
    val dir = tmpDir()
    WarcSource.Writer.write(pages(5), dir, "uri", "html", files = 1)
    val file = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc")).head
    val bytes = java.nio.file.Files.readAllBytes(file.toPath)
    WarcSource.read(spark, Seq(dir)).select("record_offset").collect().foreach { r =>
      val off = r.getLong(0).toInt
      assert(new String(bytes, off, 8, UTF_8) == "WARC/1.1",
        s"offset $off is not a record start")
    }
  }

  test("warc: split reads are split-count invariant") {
    val dir = tmpDir()
    WarcSource.Writer.write(pages(200), dir, "uri", "html", files = 1)
    def ids(splitBytes: Long) =
      WarcSource.read(spark, Seq(dir), splitBytes)
        .select("record_id").collect().map(_.getString(0)).sorted.toSeq
    val whole = ids(Long.MaxValue >> 1)
    assert(whole.size == 201) // 200 responses + 1 warcinfo
    assert(ids(4 * 1024) == whole)   // many mid-file boundary scans
    assert(ids(777) == whole)        // unaligned odd-sized splits
  }

  test("warc: a payload embedding a fake record boundary cannot fool the scan") {
    val s = spark
    import s.implicits._
    // payload contains CRLFCRLF + WARC/1. magic followed by garbage that
    // fails a record parse — the boundary scan must skip it and find the
    // real next record under every split size
    val evil = "preamble\r\n\r\nWARC/1.0\r\nnot a header line\r\n\r\nmore text " +
      "and the usual words keep going here"
    val df = (0 until 50).map(i => (s"http://t.example/evil/$i", evil + s" #$i"))
      .toDF("uri", "html")
    val dir = tmpDir()
    WarcSource.Writer.write(df, dir, "uri", "html", files = 1)
    def uris(splitBytes: Long) =
      WarcSource.read(spark, Seq(dir), splitBytes)
        .filter(col("warc_type") === "response")
        .select("target_uri").collect().map(_.getString(0)).sorted.toSeq
    val whole = uris(Long.MaxValue >> 1)
    assert(whole.size == 50)
    assert(uris(300) == whole)
    assert(uris(128) == whole)
  }

  test("warc: a fake boundary with a huge Content-Length cannot swallow records") {
    val s = spark
    import s.implicits._
    // the hostile variant: the embedded fake record PARSES as headers
    // and its bogus Content-Length makes the speculative alignment
    // parse consume far past real records before failing at EOF — the
    // rescan must REOPEN just past the false magic (resuming from the
    // consumed position would silently drop every record in between)
    val evil = "preamble\r\n\r\nWARC/1.0\r\nContent-Type: fake\r\n" +
      "Content-Length: 500000\r\n\r\nmore text and the usual words"
    val df = (0 until 50).map(i => (s"http://t.example/evil2/$i", evil + s" #$i"))
      .toDF("uri", "html")
    val dir = tmpDir()
    WarcSource.Writer.write(df, dir, "uri", "html", files = 1)
    def uris(splitBytes: Long) =
      WarcSource.read(spark, Seq(dir), splitBytes)
        .filter(col("warc_type") === "response")
        .select("target_uri").collect().map(_.getString(0)).sorted.toSeq
    val whole = uris(Long.MaxValue >> 1)
    assert(whole.size == 50)
    assert(uris(300) == whole)
    assert(uris(128) == whole)
  }

  test("warc: reads stream lazily — an early stop leaves no partial rows") {
    val dir = tmpDir()
    WarcSource.Writer.write(pages(100), dir, "uri", "html", files = 1)
    // limit() abandons the iterator mid-split: the task-completion
    // listener closes the stream, and re-reading still sees everything
    assert(WarcSource.read(spark, Seq(dir)).limit(3).count() == 3)
    assert(WarcSource.read(spark, Seq(dir)).count() == 101)
  }

  test("warc: gzip archives read back whole (concatenated-member safe)") {
    val dir = tmpDir()
    WarcSource.Writer.write(pages(15), dir, "uri", "html", files = 3, gzip = true)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".warc.gz")) == 3)
    val df = WarcSource.read(spark, Seq(dir))
    assert(df.filter(col("warc_type") === "response").count() == 15)
    assert(df.filter(col("warc_type") === "warcinfo").count() == 3)
    val body = new String(df.filter(col("target_uri") === "http://t.example/3")
      .head().getAs[Array[Byte]]("body"), UTF_8)
    assert(body.contains("Doc number 3"))
  }

  test("warc.gz: writer emits one gzip member per record at real member offsets (r12)") {
    val dir = tmpDir()
    WarcSource.Writer.write(pages(10), dir, "uri", "html", files = 1, gzip = true)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head
    val bytes = java.nio.file.Files.readAllBytes(file.toPath)
    val offs = WarcSource.read(spark, Seq(dir))
      .select("record_offset").collect().map(_.getLong(0)).sorted
    // 10 responses + 1 warcinfo, each its own member → 11 distinct offsets,
    // the first at byte 0, every one pointing at the RFC 1952 magic
    assert(offs.length == 11 && offs.distinct.length == 11)
    assert(offs.head == 0L)
    offs.foreach { o =>
      assert((bytes(o.toInt) & 0xff) == 0x1f && (bytes(o.toInt + 1) & 0xff) == 0x8b
        && (bytes(o.toInt + 2) & 0xff) == 0x08, s"offset $o is not a member start")
    }
  }

  test("warc.gz: member-split reads are split-count invariant (r12)") {
    val dir = tmpDir()
    WarcSource.Writer.write(pages(200), dir, "uri", "html", files = 1, gzip = true)
    def ids(splitBytes: Long) =
      WarcSource.read(spark, Seq(dir), splitBytes)
        .select("record_id").collect().map(_.getString(0)).sorted.toSeq
    val whole = ids(Long.MaxValue >> 1)
    assert(whole.size == 201) // 200 responses + 1 warcinfo
    assert(ids(4 * 1024) == whole) // many mid-file member scans
    assert(ids(777) == whole)      // unaligned odd-sized splits
  }

  test("warc.gz: garbage with a fake member magic between members cannot fool the scan (r12)") {
    val dir = tmpDir()
    WarcSource.Writer.write(pages(6), dir, "uri", "html", files = 1, gzip = true)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head
    val clean = java.nio.file.Files.readAllBytes(file.toPath)
    // splice junk carrying the 1f 8b 08 magic between the first two
    // members: its "member" fails the header/deflate parse and the
    // scan must recover every real record after it
    val offs = WarcSource.read(spark, Seq(dir))
      .select("record_offset").collect().map(_.getLong(0)).sorted
    val cut = offs(1).toInt // end of the first member
    val junk = Array[Byte](0x1f.toByte, 0x8b.toByte, 0x08, 0x07,
      0x41, 0x42, 0x43, 0x44, 0x45, 0x1f.toByte, 0x8b.toByte, 0x08, 0x00,
      0x00, 0x00, 0x00, 0x00, 0x00, 0x66.toByte)
    val evil = clean.take(cut) ++ junk ++ clean.drop(cut)
    val dir2 = tmpDir()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir2, "evil.warc.gz"), evil)
    def uris(splitBytes: Long) =
      WarcSource.read(spark, Seq(dir2), splitBytes)
        .filter(col("warc_type") === "response")
        .select("target_uri").collect().map(_.getString(0)).sorted.toSeq
    assert(uris(Long.MaxValue >> 1).size == 6)
    assert(uris(400) == uris(Long.MaxValue >> 1))
  }

  test("warc.gz: legacy single-member whole-file archives still read (r12)") {
    val dir = tmpDir()
    WarcSource.Writer.write(pages(8), dir, "uri", "html", files = 1)
    val plain = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc")).head
    val dir2 = tmpDir()
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(
        java.nio.file.Paths.get(dir2, "legacy.warc.gz")))
    out.write(java.nio.file.Files.readAllBytes(plain.toPath)); out.close()
    val df = WarcSource.read(spark, Seq(dir2))
    assert(df.filter(col("warc_type") === "response").count() == 8)
    // every record shares the one member's offset: 0
    assert(df.select("record_offset").collect().forall(_.getLong(0) == 0L))
    // and a split read of the single-member file yields the same rows
    // (mid-member splits find no member start and emit nothing)
    val split = WarcSource.read(spark, Seq(dir2), 512)
    assert(split.filter(col("warc_type") === "response").count() == 8)
  }

  test("warc: fetch at stored offsets reproduces each record exactly (r12)") {
    // both layouts: plain records and gz members; fetch every record a
    // full scan reports and compare the whole row
    for (gz <- Seq(false, true)) {
      val dir = tmpDir()
      WarcSource.Writer.write(pages(30), dir, "uri", "html", files = 2, gzip = gz)
      val scanned = WarcSource.read(spark, Seq(dir))
        .select("warc_file", "record_offset", "record_id", "http_status", "body")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
          r.get(3), Option(r.getAs[Array[Byte]]("body")).map(new String(_, UTF_8))))
        .sortBy(t => (t._1, t._2))
      val s = spark
      import s.implicits._
      val req = scanned.map(t => (t._1, t._2)).toSeq.toDF("warc_file", "record_offset")
      val fetched = WarcSource.fetch(req)
        .select("warc_file", "record_offset", "record_id", "http_status", "body")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
          r.get(3), Option(r.getAs[Array[Byte]]("body")).map(new String(_, UTF_8))))
        .sortBy(t => (t._1, t._2))
      assert(fetched.toSeq == scanned.toSeq, s"gz=$gz")
    }
  }

  test("warc: fetch at a wrong offset fails loudly, never returns a wrong record (r12)") {
    val dir = tmpDir()
    WarcSource.Writer.write(pages(3), dir, "uri", "html", files = 1)
    val s = spark
    import s.implicits._
    val bad = Seq((new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc")).head.toString, 7L))
      .toDF("warc_file", "record_offset")
    val e = intercept[org.apache.spark.SparkException] {
      WarcSource.fetch(bad).collect()
    }
    assert(e.getMessage.contains("bad version line")
      || Option(e.getCause).exists(_.getMessage.contains("bad version line")))
  }

  test("warc: the JSON DSL from clause reaches read_warc (r12)") {
    val dir = tmpDir()
    WarcSource.Writer.write(pages(12), dir, "uri", "html", files = 1)
    val q = s"""{"select": ["target_uri", "warc_type", "http_status"],
                 "filter": {"column": "warc_type", "eq": "response"},
                 "from": {"warc": {"paths": ["$dir"], "split_bytes": 4096}}}"""
    val rows = graft.dsl.JsonQuery.compile(spark, q).collect()
    assert(rows.length == 12)
    assert(rows.forall(_.getAs[Int]("http_status") == 200))
  }

  test("warc: conversion records write the WET shape — raw text block, no HTTP message (r12)") {
    val s = spark
    import s.implicits._
    val dir = tmpDir()
    WarcSource.Writer.write(
      Seq(("http://t.example/w", "extracted text\nsecond line")).toDF("uri", "txt"),
      dir, "uri", "txt", files = 1, gzip = true, recordType = "conversion")
    val r = WarcSource.read(spark, Seq(dir))
      .filter(col("warc_type") === "conversion").head()
    assert(r.getAs[String]("content_type") == "text/plain")
    assert(r.isNullAt(r.fieldIndex("http_status"))) // no HTTP message
    assert(new String(r.getAs[Array[Byte]]("body"), UTF_8)
      == "extracted text\nsecond line") // block IS the payload
    val e = intercept[IllegalArgumentException] {
      WarcSource.Writer.write(Seq(("u", "t")).toDF("uri", "txt"),
        dir, "uri", "txt", recordType = "request")
    }
    assert(e.getMessage.contains("response|conversion"))
  }

  test("warc: writeDeduped stores one payload + revisit pointers, deterministic keepers (r12)") {
    val s = spark
    import s.implicits._
    val dir = tmpDir()
    // 6 uris, 2 distinct payloads; keeper = numerically smallest uri
    val rows = (0 until 6).map(i => (s"http://t.example/$i", s"payload ${i % 2}"))
      .toDF("uri", "html")
    assert(WarcSource.Writer.writeDeduped(rows, dir, "uri", "html",
      files = 1, gzip = true) == 6)
    val rec = WarcSource.read(spark, Seq(dir)).cache()
    val resp = rec.filter(col("warc_type") === "response").collect()
    val rev = rec.filter(col("warc_type") === "revisit").collect()
    assert(resp.length == 2 && rev.length == 4)
    assert(resp.map(_.getAs[String]("target_uri")).toSet ==
      Set("http://t.example/0", "http://t.example/1"))
    // revisits carry an empty block, the shared digest, and the
    // keeper's record id; payload_digest matches the keeper's body md5
    val keeperByUri = resp.map(r => r.getAs[String]("record_id") ->
      (new String(r.getAs[Array[Byte]]("body"), UTF_8),
        r.getAs[String]("payload_digest"))).toMap
    rev.foreach { r =>
      assert(r.getAs[Array[Byte]]("body").isEmpty)
      val (kbody, kdig) = keeperByUri(r.getAs[String]("refers_to"))
      assert(r.getAs[String]("payload_digest") == kdig)
      val i = r.getAs[String]("target_uri").last.toString.toInt
      assert(kbody == s"payload ${i % 2}")
    }
    // plain (non-deduped) responses leave the new columns null
    rec.unpersist()
    val dir2 = tmpDir()
    WarcSource.Writer.write(rows.limit(1), dir2, "uri", "html", files = 1)
    val plain = WarcSource.read(spark, Seq(dir2))
      .filter(col("warc_type") === "response").head()
    assert(plain.isNullAt(plain.fieldIndex("refers_to")))
    assert(plain.isNullAt(plain.fieldIndex("payload_digest")))
  }

  test("warc: non-http records keep their raw block as body") {
    val dir = tmpDir()
    WarcSource.Writer.write(pages(1), dir, "uri", "html", files = 1)
    val info = WarcSource.read(spark, Seq(dir))
      .filter(col("warc_type") === "warcinfo").head()
    assert(info.isNullAt(info.fieldIndex("http_status")))
    assert(new String(info.getAs[Array[Byte]]("body"), UTF_8)
      .startsWith("software: graft"))
  }

  // ------------------------------------------------------ html_extract

  private def extract(html: String, minWords: Int = 5,
      ratio: Double = 0.25): String = {
    val s = spark
    import s.implicits._
    Seq(html).toDF("h")
      .select(TextOps.htmlExtractText(col("h"), minWords, ratio)).head().getString(0)
  }

  test("html_extract: strips script/style/comments, keeps prose blocks") {
    val html = """<html><head><title>T</title>
      |<style>p { color: red; } /* a < b */</style>
      |<script>if (x < 3) { emit("<p>fake</p>"); }</script></head>
      |<body><!-- hidden <p>also fake</p> -->
      |<p>This is the real body of the page with plenty of words.</p>
      |<div class="nav"><a href="/">Home</a> <a href="/x">About</a></div>
      |</body></html>""".stripMargin
    assert(extract(html) ==
      "This is the real body of the page with plenty of words.")
  }

  test("html_extract: inline tags do not fuse words; entities decode") {
    val html = "<p>The <b>bold</b>word and the entity &amp; plus &lt;tag&gt; " +
      "and &quot;quotes&quot; in a sentence.</p>"
    assert(extract(html) ==
      "The bold word and the entity & plus <tag> and \"quotes\" in a sentence.")
  }

  test("html_extract: block heuristics drop short, link-dense and no-stopword blocks") {
    val html =
      "<p>Too short.</p>" + // < 5 words
      "<p>The main paragraph has many ordinary words to keep around.</p>" +
      "<div><a href=\"/a\">one</a> <a href=\"/b\">two</a> <a href=\"/c\">three</a>" +
      " of the links</div>" + // 3 links vs 6 words → dropped
      "<footer>Copyright rights reserved everyone everywhere</footer>" // no stopword
    assert(extract(html) ==
      "The main paragraph has many ordinary words to keep around.")
  }

  test("html_extract: prefix tags split correctly (pre vs p, header vs head)") {
    val html = "<header>The site header with a few words in it</header>" +
      "<pre>The preformatted block is kept with all of its words</pre>" +
      "<p>The paragraph block also survives with plenty of words.</p>"
    assert(extract(html) ==
      "The site header with a few words in it\n" +
      "The preformatted block is kept with all of its words\n" +
      "The paragraph block also survives with plenty of words.")
  }

  test("html_extract: empty and tag-only inputs yield empty text") {
    assert(extract("") == "")
    assert(extract("<html><body><br/><hr></body></html>") == "")
  }

  test("warc: untrusted-input allocation guards — giant Content-Length and endless header lines raise loudly (r14)") {
    import java.nio.charset.StandardCharsets.UTF_8
    val dir = tmpDir()
    // a record declaring a multi-GB block: must raise the NAMED ceiling
    // error, never attempt the allocation (an executor OOM would be
    // silent and fatal at crawl scale)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "bomb.warc"),
      ("WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Record-ID: <urn:uuid:1>\r\nContent-Length: 9999999999\r\n" +
        "\r\n").getBytes(UTF_8))
    val e1 = intercept[Exception] {
      graft.sources.WarcSource.read(spark, Seq(s"$dir/bomb.warc")).collect()
    }
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null) c = c.getCause
      Option(c.getMessage).getOrElse("")
    }
    assert(rootMsg(e1).contains("ceiling"), rootMsg(e1))
    // a header line with no terminator streaming past 64 KiB: bounded,
    // loud, no unbounded buffer growth
    val dir2 = tmpDir()
    java.nio.file.Files.write(java.nio.file.Paths.get(dir2, "line.warc"),
      ("WARC/1.0\r\nWARC-Type: response\r\nX-Junk: " +
        "j" * (200 * 1024)).getBytes(UTF_8))
    val e2 = intercept[Exception] {
      graft.sources.WarcSource.read(spark, Seq(s"$dir2/line.warc")).collect()
    }
    assert(rootMsg(e2).contains("allocation guard"), rootMsg(e2))
    // a legitimate near-boundary record still reads (the guard is a
    // ceiling, not a behavior change)
    val dir3 = tmpDir()
    val block = "x" * 100000
    java.nio.file.Files.write(java.nio.file.Paths.get(dir3, "ok.warc"),
      ("WARC/1.0\r\nWARC-Type: resource\r\n" +
        "WARC-Record-ID: <urn:uuid:2>\r\n" +
        s"Content-Length: ${block.length}\r\n\r\n$block\r\n\r\n").getBytes(UTF_8))
    val rows = graft.sources.WarcSource.read(spark, Seq(s"$dir3/ok.warc")).collect()
    assert(rows.length == 1 &&
      rows(0).getAs[Long]("content_length") == 100000L)
  }

  test("html_extract: text-to-markup ratio drops markup-heavy blocks") {
    // enough words and a stopword, but buried in inline markup
    val html = "<p><span class=\"aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa\">the</span>" +
      "<span class=\"bbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbbb\">tiny</span>" +
      "<span class=\"cccccccccccccccccccccccccccccccccccccc\">words</span>" +
      "<span class=\"dddddddddddddddddddddddddddddddddddddd\">hide</span>" +
      "<span class=\"eeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeeee\">here</span></p>" +
      "<p>The normal paragraph with the usual prose words stays in.</p>"
    assert(extract(html) ==
      "The normal paragraph with the usual prose words stays in.")
  }
}
