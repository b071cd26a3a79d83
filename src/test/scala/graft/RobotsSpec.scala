package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RobotsExprs.allows
import graft.operators.Robots

/** RFC 9309 decision semantics: group selection, longest-match rule
  * precedence, wildcards/anchors, parser tolerances — plus the
  * frontier-join operator. Kernel cases run on the JVM directly (the
  * expression is a thin codegen wrapper, exercised via the DataFrame
  * tests and the q_robots_frontier gate). */
class RobotsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)

  test("robots: longest match wins; allow beats disallow on ties") {
    val body = "User-agent: *\nDisallow: /private/\nAllow: /private/pub"
    assert(allows(body, "bot", "/private/pub-1.html"))
    assert(!allows(body, "bot", "/private/secret"))
    assert(allows(body, "bot", "/open"))
    // exact tie: /p vs /p → allow wins
    val tie = "User-agent: *\nDisallow: /p\nAllow: /p"
    assert(allows(tie, "bot", "/page"))
  }

  test("robots: the most specific user-agent group wins; star is the fallback") {
    val body = "User-agent: graftbot\nDisallow: /\n\nUser-agent: *\nAllow: /"
    assert(!allows(body, "graftbot", "/x"))
    assert(!allows(body, "GraftBot-News", "/x")) // token-prefix match
    assert(allows(body, "otherbot", "/x"))
    // longer named group beats shorter named group
    val two = "User-agent: graft\nAllow: /\nUser-agent: graftbot\nDisallow: /"
    assert(!allows(two, "graftbot", "/x"))
    assert(allows(two, "graftish", "/x"))
  }

  test("robots: a matching group with no rules allows everything (star not consulted)") {
    val body = "User-agent: *\nDisallow: /\n\nUser-agent: graftbot"
    assert(allows(body, "graftbot", "/x"))
    assert(!allows(body, "other", "/x"))
  }

  test("robots: same-agent groups merge; rules before any group are ignored") {
    val merged = "User-agent: a\nDisallow: /one\nUser-agent: b\nAllow: /\n" +
      "User-agent: a\nDisallow: /two"
    assert(!allows(merged, "a", "/one"))
    assert(!allows(merged, "a", "/two"))
    assert(allows(merged, "a", "/three"))
    assert(allows("Disallow: /\nUser-agent: *\nAllow: /", "bot", "/x"))
  }

  test("robots: wildcards, end anchor, literal mid-$, empty disallow") {
    val wild = "User-agent: *\nDisallow: /*.pdf$"
    assert(!allows(wild, "bot", "/docs/file.pdf"))
    assert(allows(wild, "bot", "/docs/file.pdf.html"))
    assert(allows(wild, "bot", "/docs/pdf"))
    val mid = "User-agent: *\nDisallow: /a$b"
    assert(!allows(mid, "bot", "/a$b/c")) // $ not terminal → literal prefix
    assert(allows(mid, "bot", "/ab"))
    val multi = "User-agent: *\nDisallow: /a*b*c"
    assert(!allows(multi, "bot", "/a-x-b-y-c-z"))
    assert(allows(multi, "bot", "/a-x-c-b"))
    assert(allows("User-agent: *\nDisallow:", "bot", "/anything"))
  }

  test("robots: parser tolerances — CRLF, comments, key case, versioned agents, non-group lines") {
    val body = "# header comment\r\nUSER-AGENT: GraftBot/2.1 # trailing\r\n" +
      "Sitemap: http://x.example/s.xml\r\nCrawl-delay: 10\r\n" +
      "DISALLOW: /blocked\r\n"
    assert(!allows(body, "graftbot", "/blocked/page"))
    assert(allows(body, "graftbot", "/fine"))
    // unknown records between user-agent lines do not split the group
    val split = "User-agent: a\nSitemap: http://x/s\nUser-agent: b\nDisallow: /x"
    assert(!allows(split, "a", "/x"))
    assert(!allows(split, "b", "/x"))
  }

  test("robots: filterFrontier keeps missing-robots hosts and drops denied paths") {
    val s = spark
    import s.implicits._
    val frontier = Seq(
      (1L, "http://a.example/private/secret"),
      (2L, "http://a.example/private/pub-ok"),
      (3L, "http://a.example/open"),
      (4L, "http://norobots.example/anything"),
      (5L, "http://b.example")) // authority-only → path "/"
      .toDF("id", "url")
    val robots = Seq(
      ("a.example", "User-agent: *\nDisallow: /private/\nAllow: /private/pub"),
      ("b.example", "User-agent: *\nDisallow: /"))
      .toDF("host", "body")
    val kept = Robots.filterFrontier(frontier, "url", robots, "host", "body",
        agent = "graftbot")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 4L))
  }

  test("robots: the robots_filter CURATE stage joins its table and keeps fetchable rows") {
    val s = spark
    import s.implicits._
    Seq(("a.example", "User-agent: graftbot\nDisallow: /x\nUser-agent: *\nAllow: /"))
      .toDF("host", "body").createOrReplaceTempView("robots_tbl_spec")
    val rows = Seq(
      (1L, "http://a.example/x/1"),  // denied for graftbot
      (2L, "http://a.example/ok"),
      (3L, "http://norobots.example/x/1")) // no robots row → pass
      .toDF("doc_id", "url")
    val spec = """{"stages": [{"op": "robots_filter",
      "robots_table": "robots_tbl_spec", "agent": "graftbot"}]}"""
    val kept = graft.dsl.CuratePipeline.compile(rows, spec, idCol = "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
  }

  test("robots: the matched path is always /-rooted — Disallow: / catches authority+query URLs (r12)") {
    val s = spark
    import s.implicits._
    val robots = Seq(("h.example", "User-agent: *\nDisallow: /")).toDF("host", "body")
    // urlNormalize legitimately emits authority+query URLs (bare-/
    // drop keeps the query): every shape must match rooted rules
    val rows = Seq(
      (1L, "http://h.example?q=1"),   // authority + query, no path
      (2L, "http://h.example"),       // authority only
      (3L, "http://h.example/p/x"))   // normal path
      .toDF("doc_id", "url")
    val kept = graft.operators.Robots
      .filterFrontier(rows, "url", robots, "host", "body", agent = "bot")
      .count()
    assert(kept == 0, "a fully-disallowed host must block every URL shape")
  }

  test("robots: crawl-delay resolves through group selection (r12)") {
    import graft.functions.RobotsExprs.crawlDelay
    // the selected group's delay; star only when no named match
    val b1 = "User-agent: bot\nCrawl-delay: 2.5\nDisallow: /x\n" +
      "User-agent: *\nCrawl-delay: 10\nDisallow: /"
    assert(crawlDelay(b1, "bot") == 2.5)
    assert(crawlDelay(b1, "other") == 10.0)
    // no delay in the selected group → null, even if another group has one
    val b2 = "User-agent: bot\nDisallow: /x\nUser-agent: *\nCrawl-delay: 4\nDisallow: /"
    assert(crawlDelay(b2, "bot") == null)
    // merged same-length groups: smallest delay wins
    val b3 = "User-agent: bot\nCrawl-delay: 6\nDisallow: /a\n" +
      "User-agent: bot\nCrawl-delay: 3\nDisallow: /b"
    assert(crawlDelay(b3, "bot") == 3.0)
    // first delay within one group wins; malformed/negative ignored
    val b4 = "User-agent: *\nCrawl-delay: oops\nCrawl-delay: -1\n" +
      "Crawl-delay: 1.5\nCrawl-delay: 9\nDisallow: /x"
    assert(crawlDelay(b4, "bot") == 1.5)
    // a delay BETWEEN user-agent header lines doesn't split the group
    val b5 = "User-agent: a\nCrawl-delay: 2\nUser-agent: b\nDisallow: /x"
    assert(crawlDelay(b5, "b") == 2.0)
    // pre-group delays are ignored; no applicable group → null
    assert(crawlDelay("Crawl-delay: 9\nUser-agent: *\nDisallow: /", "bot") == null)
    assert(crawlDelay("User-agent: other\nCrawl-delay: 3\nDisallow: /", "bot") == null)
    // adding crawl-delay must not have changed decision semantics
    assert(graft.functions.RobotsExprs.allows(b1, "bot", "/y"))
    assert(!graft.functions.RobotsExprs.allows(b1, "bot", "/x/1"))
  }

  test("frontier schedule: per-host serialization, wave caps, priority order (r12)") {
    val s = spark
    import s.implicits._
    val urls = (0 until 40).map(i =>
      (s"http://h${i % 3}.example/p/$i", i % 4)).toDF("url", "priority")
    val out = graft.operators.Frontier
      .schedule(urls, "url", perWave = 5, fetchers = 8,
        priorityCol = Some("priority"))
      .select("url", "priority", "host", "fetch_slot", "fetch_wave")
      .collect()
    // one host → exactly one slot; slots in range
    val slotsByHost = out.groupBy(_.getAs[String]("host"))
      .view.mapValues(_.map(_.getAs[Int]("fetch_slot")).toSet).toMap
    assert(slotsByHost.values.forall(_.size == 1))
    assert(out.forall(r => (0 until 8).contains(r.getAs[Int]("fetch_slot"))))
    // ≤ perWave URLs of one host per wave; waves dense from 0
    out.groupBy(r => (r.getAs[String]("host"), r.getAs[Int]("fetch_wave")))
      .foreach { case (_, rs) => assert(rs.length <= 5) }
    val waves = out.filter(_.getAs[String]("host") == "h0.example")
      .map(_.getAs[Int]("fetch_wave")).sorted.toSeq
    assert(waves.distinct == (0 to waves.max).toSeq)
    // within a host, no lower-priority URL fetches a strictly earlier
    // wave than a higher-priority one
    out.groupBy(_.getAs[String]("host")).values.foreach { rs =>
      for (a <- rs; b <- rs
           if a.getAs[Int]("priority") > b.getAs[Int]("priority"))
        assert(a.getAs[Int]("fetch_wave") <= b.getAs[Int]("fetch_wave"))
    }
    // deterministic: a second run assigns identical columns
    val again = graft.operators.Frontier
      .schedule(urls, "url", perWave = 5, fetchers = 8,
        priorityCol = Some("priority"))
      .select("url", "priority", "host", "fetch_slot", "fetch_wave").collect()
    assert(out.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("robots: Sitemap directives surface — order, dedupe, case, comments, group-independence (r14)") {
    import graft.functions.RobotsExprs
    // document order kept; duplicate keeps its FIRST position; the key
    // is case-insensitive; a value's own colons survive; comments strip
    val body =
      "sitemap: http://a.example/one.xml\n" +
        "User-agent: graftbot\nDisallow: /x\n" +
        "Sitemap: http://a.example/two.xml # main\n" +
        "User-agent: *\nAllow: /\n" +
        "SITEMAP: http://a.example/one.xml\n" +
        "Sitemap:\n" + // blank value is inert
        "Sitemap: https://a.example:8443/three.xml.gz"
    assert(RobotsExprs.sitemaps(body).toSeq == Seq(
      "http://a.example/one.xml", "http://a.example/two.xml",
      "https://a.example:8443/three.xml.gz"))
    assert(RobotsExprs.sitemaps("User-agent: *\nDisallow: /").isEmpty)
    // sitemap lines between user-agent lines still don't break groups
    // (the group parser ignores them as non-group records)
    val grouped = "User-agent: a\nSitemap: http://x/s.xml\n" +
      "User-agent: graftbot\nDisallow: /"
    assert(!RobotsExprs.allows(grouped, "graftbot", "/page"))
    // operator surface: one seed row per (host, url), order column
    val s = spark
    import s.implicits._
    val robots = Seq(("a.example", body), ("b.example", "User-agent: *"))
      .toDF("host", "body")
    val seeds = Robots.sitemapSeeds(robots, "host", "body")
      .orderBy("host", "order").collect()
    assert(seeds.length == 3)
    assert(seeds.map(r => (r.getAs[String]("host"), r.getAs[Int]("order"),
      r.getAs[String]("sitemap_url"))).toSeq == Seq(
      ("a.example", 0, "http://a.example/one.xml"),
      ("a.example", 1, "http://a.example/two.xml"),
      ("a.example", 2, "https://a.example:8443/three.xml.gz")))
  }

  test("robots pathMatch randomized: 400 pattern/path pairs vs a regex reference (r14)") {
    import graft.functions.RobotsExprs
    // independent reference: RFC 9309 path patterns translate exactly
    // to regex — '*' → '.*', a TRAILING '$' anchors, everything else
    // (inner '$' included) is literal, and the whole thing matches a
    // PREFIX of the path (lookingAt) unless anchored (matches)
    def ref(pattern: String, path: String): Boolean = {
      val anchored = pattern.endsWith("$")
      val body = if (anchored) pattern.dropRight(1) else pattern
      val rx = body.map {
        case '*' => ".*"
        case c => java.util.regex.Pattern.quote(c.toString)
      }.mkString
      val m = java.util.regex.Pattern.compile(rx).matcher(path)
      if (anchored) m.matches() else m.lookingAt()
    }
    val rnd = new scala.util.Random(20260815L)
    val patChars = "ab/*$"
    val pathChars = "ab/$"
    var matched = 0
    (1 to 400).foreach { trial =>
      val pattern = Seq.fill(rnd.nextInt(8))(
        patChars(rnd.nextInt(patChars.length))).mkString
      val path = "/" + Seq.fill(rnd.nextInt(9))(
        pathChars(rnd.nextInt(pathChars.length))).mkString
      val got = RobotsExprs.pathMatch(pattern, path)
      val want = ref(pattern, path)
      assert(got == want,
        s"trial $trial: pathMatch('$pattern', '$path') = $got, regex says $want")
      if (want) matched += 1
    }
    assert(matched > 40 && matched < 400, s"degenerate fixture: $matched/400")
    // the classic greedy-leftmost trap: the FIRST '*' placement must
    // not eat the segment the second literal needs
    assert(RobotsExprs.pathMatch("/a*b*c", "/axxbyyc"))
    assert(RobotsExprs.pathMatch("/a*bc", "/abxbc"), "leftmost-greedy backtrack")
    assert(!RobotsExprs.pathMatch("/a*bc$", "/abxbcd"))
  }

  test("robots: query strings participate in matching") {
    val s = spark
    import s.implicits._
    val body = "User-agent: *\nDisallow: /search?*q="
    val df = Seq(("http://a.example/search?lang=en&q=x", body),
      ("http://a.example/search?lang=en", body)).toDF("url", "b")
    val out = df.filter(Robots.allows(col("b"), lit("bot"), Robots.urlPath(col("url"))))
      .select("url").collect().map(_.getString(0))
    assert(out.toSeq == Seq("http://a.example/search?lang=en"))
  }
}
