package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.catalog.GraftCatalog

/** The engine's SQL statement extensions over the catalog (SURVEY
  * §2.11; reference parser beacon-core/src/parser/beacon_parser.rs).
  * Recognition is regex-with-anchors over the statement head — the same
  * "peek a few tokens, else hand to the standard planner" strategy the
  * reference uses; the query payloads inside (AS <query>, INSERT
  * source, predicates, SET expressions) are full Catalyst SQL.
  */
object Statements {

  private val reExternal =
    """(?is)^CREATE\s+EXTERNAL\s+TABLE\s+(\w+)\s+STORED\s+AS\s+(\w+)\s+LOCATION\s+(.+?)\s*$""".r
  private val reMView =
    """(?is)^CREATE\s+MATERIALIZED\s+VIEW\s+(\w+)\s+AS\s+(.+)$""".r
  private val reView =
    """(?is)^CREATE\s+(?:OR\s+REPLACE\s+)?VIEW\s+(\w+)\s+AS\s+(.+)$""".r
  private val reCtas =
    """(?is)^CREATE\s+TABLE\s+(\w+)\s+AS\s+(.+)$""".r
  private val reRefresh =
    """(?is)^REFRESH\s+(?:TABLE\s+)?(\w+)\s*$""".r
  private val reDrop =
    """(?is)^DROP\s+(?:TABLE|VIEW|MATERIALIZED\s+VIEW)\s+(?:IF\s+EXISTS\s+)?(\w+)\s*$""".r
  private val reInsert =
    """(?is)^INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?(\w+)\s+(.+)$""".r
  private val reDelete =
    """(?is)^DELETE\s+FROM\s+(\w+)(?:\s+WHERE\s+(.+))?\s*$""".r
  private val reUpdate =
    """(?is)^UPDATE\s+(\w+)\s+SET\s+(.+?)(?:\s+WHERE\s+(.+))?\s*$""".r
  private val reShowTables =
    """(?is)^SHOW\s+GRAFT\s+TABLES\s*$""".r

  /** Try to run `text` as a catalog statement; None = not one of ours. */
  def tryExecute(spark: SparkSession, catalog: GraftCatalog, text: String): Option[DataFrame] = {
    val t = text.trim.stripSuffix(";")
    t match {
      case reExternal(name, fmt, locs) =>
        catalog.createExternalTable(name, fmt.toLowerCase, parsePaths(locs))
        Some(status(spark, s"created external table $name"))
      case reMView(name, sql) =>
        catalog.createMaterializedView(name, sql.trim)
        Some(status(spark, s"created materialized view $name"))
      case reView(name, sql) =>
        catalog.createView(name, sql.trim)
        Some(status(spark, s"created view $name"))
      case reCtas(name, sql) =>
        catalog.createManagedTable(name, spark.sql(sql.trim))
        Some(status(spark, s"created table $name"))
      case reRefresh(name) =>
        catalog.refresh(name)
        Some(status(spark, s"refreshed $name"))
      case reDrop(name) =>
        catalog.drop(name)
        Some(status(spark, s"dropped $name"))
      case reInsert(mode, name, src) =>
        catalog.insertInto(name, spark.sql(src.trim),
          overwrite = mode.equalsIgnoreCase("OVERWRITE"))
        Some(status(spark, s"inserted into $name"))
      case reDelete(name, pred) =>
        val n = catalog.delete(name, Option(pred).map(_.trim).getOrElse("true"))
        Some(status(spark, s"deleted $n rows from $name"))
      case reUpdate(name, sets, pred) =>
        catalog.update(name, parseAssignments(sets), Option(pred).map(_.trim))
        Some(status(spark, s"updated $name"))
      case reShowTables() =>
        import spark.implicits._
        Some(catalog.tables()
          .map(d => (d.name, d.kind, d.format.getOrElse(""), d.paths.mkString(",")))
          .toDF("name", "kind", "format", "paths"))
      case _ => None
    }
  }

  /** LOCATION 'a' [, 'b' ...] — single-quoted paths. */
  private[sql] def parsePaths(locs: String): Seq[String] =
    "'((?:[^']|'')*)'".r.findAllMatchIn(locs).map(_.group(1).replace("''", "'")).toSeq

  /** SET a = expr, b = expr — split on top-level commas (quotes and
    * parens respected), then on the first `=`. */
  private[sql] def parseAssignments(sets: String): Seq[(String, String)] =
    splitTopLevel(sets, ',').map { a =>
      val i = a.indexOf('=')
      require(i > 0, s"bad assignment: $a")
      (a.substring(0, i).trim, a.substring(i + 1).trim)
    }

  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var inQ = false
    var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case `sep` if depth == 0 =>
          out += s.substring(start, i)
          start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  private def status(spark: SparkSession, msg: String): DataFrame = {
    import spark.implicits._
    Seq(msg).toDF("status")
  }
}
