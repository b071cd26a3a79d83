package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt (RFC 9309) group selection + rule matching as a native
  * codegen kernel — the fetch-permission step between URL-frontier
  * curation and the crawl itself. One call parses one robots body and
  * answers one (agent, path) decision; the DataFrame-level join shapes
  * live in [[graft.operators.Robots]].
  *
  * Contract (the parts of RFC 9309 §2 that affect decisions):
  *  - lines split on `\r?\n`; `#` starts a comment; keys are
  *    case-insensitive; unknown keys (sitemap, crawl-delay) ignored;
  *  - consecutive `user-agent` lines open ONE group; a `user-agent`
  *    line after rule lines starts a new group; rules before any
  *    `user-agent` line are ignored;
  *  - group selection is case-insensitive on the product token (a
  *    group value is cut at `/` — version tags don't participate):
  *    the group(s) with the LONGEST token that prefixes the crawler's
  *    token apply; all groups tied at that length merge; `*` groups
  *    apply only when no named group matches; no applicable group →
  *    allowed;
  *  - rule paths are implicit prefixes with `*` wildcards and a `$`
  *    end anchor (a `$` anywhere else is literal); empty paths are
  *    inert; among matching rules the LONGEST pattern (octet length,
  *    wildcards counted) wins and a length tie resolves to allow;
  *    no matching rule → allowed.
  */
object RobotsExprs {

  /** `robots_allows(body, agent, path)` — true iff `agent` may fetch
    * `path` under `body`. Null body (host without robots.txt) is
    * allowed by convention at the operator layer, null-rejecting here. */
  case class RobotsAllows(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {
    override def dataType: DataType = BooleanType
    override def prettyName: String = "robots_allows"
    override def nullSafeEval(body: Any, agent: Any, path: Any): Any =
      allowsKernel(body.asInstanceOf[UTF8String],
        agent.asInstanceOf[UTF8String], path.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (b, a, p) =>
        s"${ev.value} = graft.functions.RobotsExprs.allowsKernel($b, $a, $p);")
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression =
      copy(first = f, second = s, third = t)
  }

  def robots_allows(body: Column, agent: Column, path: Column): Column =
    ColumnBridge.column(RobotsAllows(ColumnBridge.expression(body),
      ColumnBridge.expression(agent), ColumnBridge.expression(path)))

  /** `robots_crawl_delay(body, agent)` — the `Crawl-delay` (de facto,
    * not RFC 9309; widely honored) of the group selected for `agent`
    * by the SAME selection rule as [[RobotsAllows]], in seconds; null
    * when the selected group carries none (or no group applies). When
    * same-length groups merge, the SMALLEST of their delays wins (the
    * polite reading). Feeds per-host wave pacing
    * ([[graft.operators.Frontier.schedule]]'s per_wave). */
  case class RobotsCrawlDelay(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "robots_crawl_delay"
    override def nullSafeEval(body: Any, agent: Any): Any = {
      val d = crawlDelayKernel(body.asInstanceOf[UTF8String],
        agent.asInstanceOf[UTF8String])
      if (d == null) null else d.doubleValue()
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (b, a) => s"""
        java.lang.Double ${ev.value}_d =
          graft.functions.RobotsExprs.crawlDelayKernel($b, $a);
        if (${ev.value}_d == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}_d.doubleValue(); }""")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  def robots_crawl_delay(body: Column, agent: Column): Column =
    ColumnBridge.column(RobotsCrawlDelay(ColumnBridge.expression(body),
      ColumnBridge.expression(agent)))

  /** `robots_sitemaps(body)` — the `Sitemap:` URLs of a robots.txt in
    * document order, first occurrence kept on duplicates. Sitemap is a
    * NON-GROUP record (RFC 9309 §2.4 "other records"): it applies to
    * every agent regardless of position, so this returns all of them —
    * the out-of-band seed list a frontier bootstrap starts from. */
  case class RobotsSitemaps(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "robots_sitemaps"
    override def nullSafeEval(body: Any): Any =
      sitemapsKernel(body.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, b =>
        s"${ev.value} = graft.functions.RobotsExprs.sitemapsKernel($b);")
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def robots_sitemaps(body: Column): Column =
    ColumnBridge.column(RobotsSitemaps(ColumnBridge.expression(body)))

  // ---------------------------------------------------------- kernel

  def allowsKernel(body: UTF8String, agent: UTF8String, path: UTF8String): Boolean =
    allows(body.toString, agent.toString, path.toString)

  def crawlDelayKernel(body: UTF8String, agent: UTF8String): java.lang.Double =
    if (body == null || agent == null) null
    else crawlDelay(body.toString, agent.toString)

  def sitemapsKernel(body: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val urls = sitemaps(body.toString)
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      urls.map(UTF8String.fromString))
  }

  /** every `Sitemap:` value of the body, document order, first
    * occurrence kept on duplicates. Same tolerant line discipline as
    * the group parser (`\r?\n` splits, `#` comments, case-insensitive
    * key); the value keeps its own colons (absolute URLs). */
  def sitemaps(body: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val seen = scala.collection.mutable.Set.empty[String]
    body.split("\r\n|\n|\r", -1).foreach { raw =>
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
      val colon = line.indexOf(':')
      if (colon > 0 &&
        line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT) == "sitemap") {
        val value = line.substring(colon + 1).trim
        if (value.nonEmpty && seen.add(value)) out += value
      }
    }
    out.toArray
  }

  /** smallest Crawl-delay among the selected group(s); null if none */
  def crawlDelay(body: String, agent: String): java.lang.Double = {
    var best: java.lang.Double = null
    selectedGroups(body, agent).foreach { g =>
      if (g.delay != null && (best == null || g.delay < best)) best = g.delay
    }
    best
  }

  def allows(body: String, agent: String, path: String): Boolean = {
    val rules = applicableRules(body, agent)
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < rules.length) {
      val (allow, p) = rules(i)
      if (p.nonEmpty && pathMatch(p, path)) {
        if (p.length > bestLen || (p.length == bestLen && allow)) {
          bestLen = p.length
          bestAllow = allow
        }
      }
      i += 1
    }
    bestAllow
  }

  private final case class Group(len: Int,
      rules: scala.collection.mutable.ArrayBuffer[(Boolean, String)],
      delay: java.lang.Double)

  /** merged rule list of the group(s) RFC 9309 selects for `agent` */
  private def applicableRules(body: String,
      agent: String): Array[(Boolean, String)] =
    selectedGroups(body, agent).flatMap(_.rules).toArray

  /** the group(s) whose agent match ties at the best length */
  private def selectedGroups(body: String,
      agent: String): Seq[Group] = {
    val token = agent.toLowerCase(java.util.Locale.ROOT)
    // matchLen -1 = no match, 0 = star, >0 = named
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var curAgents = List.empty[String]
    var curRules: scala.collection.mutable.ArrayBuffer[(Boolean, String)] = null
    var curDelay: java.lang.Double = null
    var inHeader = false
    def closeGroup(): Unit = if (curRules != null) {
      var len = -1
      curAgents.foreach { a =>
        if (a == "*") { if (len < 0) len = 0 }
        else if (token.startsWith(a) && a.length > len) len = a.length
      }
      // a star alongside a longer named match keeps the named length;
      // a named non-match alongside star keeps star (0)
      groups += Group(len, curRules, curDelay)
      curAgents = Nil
      curRules = null
      curDelay = null
    }
    body.split("\r\n|\n|\r", -1).foreach { raw =>
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              if (!inHeader) { closeGroup(); inHeader = true }
              val slash = value.indexOf('/')
              val tok = (if (slash >= 0) value.substring(0, slash) else value)
                .trim.toLowerCase(java.util.Locale.ROOT)
              if (tok.nonEmpty) curAgents ::= tok
            case "allow" | "disallow" =>
              inHeader = false
              if (curAgents.nonEmpty) {
                if (curRules == null)
                  curRules = scala.collection.mutable.ArrayBuffer.empty
                curRules += ((key == "allow", value))
              }
            case "crawl-delay" =>
              // a VALUE-carrying non-group record: it neither opens nor
              // breaks a group (it doesn't clear the header run), but
              // its delay belongs to the group being formed; outside
              // any group it is ignored like rules are. A malformed or
              // negative value is ignored (the tolerant-parser stance).
              if (curAgents.nonEmpty && curDelay == null)
                value.toDoubleOption.filter(d => d >= 0 && !d.isNaN)
                  .foreach(d => curDelay = d)
            // sitemap / unknown: non-group records — they neither open
            // nor break a group (consecutive user-agent lines separated
            // only by them still share one group)
            case _ => ()
          }
        }
      }
    }
    // a trailing group whose agents never saw a rule line still counts
    // as an (empty-ruled) group for selection purposes
    if (curAgents.nonEmpty && curRules == null)
      curRules = scala.collection.mutable.ArrayBuffer.empty
    closeGroup()
    val best = groups.foldLeft(-1)((m, g) => math.max(m, g.len))
    if (best < 0) Seq.empty
    else groups.filter(_.len == best).toSeq
  }

  /** implicit-prefix match with `*` wildcards and a terminal `$`
    * anchor (literal elsewhere) — greedy leftmost segment placement */
  private[graft] def pathMatch(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val segs = p.split("\\*", -1)
    if (segs.length == 1)
      return if (anchored) path == segs(0) else path.startsWith(segs(0))
    if (!path.startsWith(segs(0))) return false
    var pos = segs(0).length
    var i = 1
    while (i < segs.length - 1) {
      val idx = path.indexOf(segs(i), pos)
      if (idx < 0) return false
      pos = idx + segs(i).length
      i += 1
    }
    val last = segs(segs.length - 1)
    if (anchored) path.endsWith(last) && path.length - last.length >= pos
    else path.indexOf(last, pos) >= 0
  }
}
