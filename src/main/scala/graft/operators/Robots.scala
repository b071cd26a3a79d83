package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.RobotsExprs

/** Crawl-frontier politeness: apply per-host robots.txt (RFC 9309)
  * decisions to a URL frontier. The robots table is one row per host
  * (in a WARC crawl the robots bodies are themselves response records
  * — `target_uri` ending `/robots.txt`), so the join is
  * frontier-size ⋈ host-count: the frontier shuffles once on host,
  * the robots side is tiny by comparison and broadcast-eligible.
  * Hosts WITHOUT a robots row are allowed (the crawl convention for a
  * missing robots.txt). Decision evaluation is the row-local codegen
  * kernel in [[graft.functions.RobotsExprs]]; it re-parses the body
  * per frontier row, which is bounded by robots size (KBs) — at 100 TB
  * frontier scale pre-deduplicate the frontier per host first (exact
  * dedup over [[TextOps.urlNormalize]]) so each fetch candidate pays
  * the parse once.
  */
object Robots {

  /** true iff `agent` may fetch `path` under robots body `body` */
  def allows(body: Column, agent: Column, path: Column): Column =
    RobotsExprs.robots_allows(body, agent, path)

  /** path + query of a URL — the string robots rules match against,
    * ALWAYS `/`-rooted: an authority-only URL matches as "/", and an
    * authority+query URL (`http://h?q=1` — a shape urlNormalize
    * legitimately emits) as "/?q=1". Without the rooting, every
    * `/`-prefixed rule — including `Disallow: /` — would silently miss
    * such URLs and allow them. */
  def urlPath(url: Column): Column = {
    val t = regexp_replace(trim(url), "#.*", "")
    val rest = regexp_replace(t, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val tail = regexp_replace(rest, "^[^/?]*", "")
    when(substring(tail, 1, 1) === "/", tail)
      .otherwise(concat(lit("/"), tail))
  }

  /** effective `Crawl-delay` seconds for `agent` (null when the
    * selected group carries none) — feeds per-host wave pacing */
  def crawlDelay(body: Column, agent: Column): Column =
    RobotsExprs.robots_crawl_delay(body, agent)

  /** `Sitemap:` URLs of one robots body, document order (array col) */
  def sitemaps(body: Column): Column = RobotsExprs.robots_sitemaps(body)

  /** The frontier BOOTSTRAP seed list from a robots corpus: one row
    * per (host, sitemap_url) in the body's document order — the
    * out-of-band entry point a crawl starts from before any page has
    * been fetched (robots → sitemaps → [[graft.operators.TextOps
    * .sitemapUrls]] over the fetched XML → seed URLs). Map-only
    * explode; `order` is the 0-based position within the host's body
    * so downstream scheduling stays deterministic. */
  def sitemapSeeds(robots: DataFrame, hostCol: String,
      bodyCol: String): DataFrame = {
    val carry = robots.columns.filterNot(_ == bodyCol).map(col).toSeq
    robots.select(carry :+
        org.apache.spark.sql.functions.posexplode(
          RobotsExprs.robots_sitemaps(col(bodyCol)))
          .as(Seq("order", "sitemap_url")): _*)
      .withColumn("order", col("order").cast("int"))
  }

  /** frontier rows `agent` may fetch: left-join `robots(hostCol,
    * bodyCol)` on the frontier URL's host, keep missing-robots hosts
    * and allowed paths */
  def filterFrontier(frontier: DataFrame, urlCol: String,
      robots: DataFrame, hostCol: String, bodyCol: String,
      agent: String): DataFrame = {
    val r = robots.select(col(hostCol).as("__robots_host"),
      col(bodyCol).as("__robots_body"))
    frontier
      .join(r, TextOps.urlHost(col(urlCol)) === col("__robots_host"), "left")
      .filter(col("__robots_body").isNull ||
        allows(col("__robots_body"), lit(agent), urlPath(col(urlCol))))
      .drop("__robots_host", "__robots_body")
  }
}
