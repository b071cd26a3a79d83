package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** htmlTitle / htmlMeta / htmlLang / sitemapUrls edge cases the
  * q_html_meta closed-form seeds don't isolate. */
class HtmlMetaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.build("local[4]", 4)

  private def one(c: org.apache.spark.sql.Column, html: String): String = {
    val s = spark
    import s.implicits._
    Seq(html).toDF("h").select(c).head().getString(0)
  }

  test("htmlTitle: entities decode, internal whitespace collapses, absent is empty") {
    assert(one(TextOps.htmlTitle(col("h")),
      "<head><TITLE id=\"t\">  A &amp; B\n\t C  </TITLE></head>") == "A & B C")
    assert(one(TextOps.htmlTitle(col("h")), "<p>no title</p>") == "")
    // first title wins
    assert(one(TextOps.htmlTitle(col("h")),
      "<title>first</title><title>second</title>") == "first")
  }

  test("htmlMeta: attribute order and quote style are free; name is case-insensitive") {
    val h = "<meta name=\"Description\" content=\"d1\">" +
      "<meta content='k1' name='keywords'>"
    assert(one(TextOps.htmlMeta(col("h"), "description"), h) == "d1")
    assert(one(TextOps.htmlMeta(col("h"), "keywords"), h) == "k1")
    assert(one(TextOps.htmlMeta(col("h"), "robots"), h) == "")
  }

  test("htmlLang: html tag only, lowercased, absent is empty") {
    assert(one(TextOps.htmlLang(col("h")),
      "<html lang='Pt-BR'><body lang=\"en\"></body></html>") == "pt-br")
    assert(one(TextOps.htmlLang(col("h")), "<html><div lang='en'/></html>") == "")
  }

  test("sitemapUrls: urlset and sitemapindex locs, trimmed and entity-decoded") {
    val s = spark
    import s.implicits._
    val xml = "<sitemapindex><sitemap><loc>\n http://a/s1.xml \n</loc></sitemap>" +
      "<sitemap><loc>http://a/s2.xml?x=1&amp;y=2</loc></sitemap></sitemapindex>"
    val urls = Seq(xml).toDF("x")
      .select(TextOps.sitemapUrls(col("x"))).head().getSeq[String](0)
    assert(urls == Seq("http://a/s1.xml", "http://a/s2.xml?x=1&y=2"))
    assert(Seq("<urlset></urlset>").toDF("x")
      .select(TextOps.sitemapUrls(col("x"))).head().getSeq[String](0).isEmpty)
  }
}
