package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen kernels for the crawl-frontier URL hygiene family
  * (r17 optimization). The original formulation composed ~40 nested
  * built-in regex calls per function; because Column composition
  * DUPLICATES subtrees at every reference, `url_surt`'s expression
  * tree alone printed as ~400 KB of plan — the optimizer walked it for
  * seconds per query and codegen overflowed into interpreted paths.
  * Each kernel below runs the IDENTICAL pass sequence imperatively,
  * using the same primitives Spark's built-ins bottom out in
  * (`UTF8String.trim`/`toLowerCase`, `java.util.regex` with the same
  * patterns, `Pattern.split(s, -1)`), so results are byte-identical —
  * pinned by the differential suite in OperatorsSpec (kernel vs the
  * composed reference formulation in
  * [[graft.operators.TextOps.urlNormalizeComposed]] et al.) and by the
  * unchanged DuckDB oracle replays.
  *
  * Rule documentation lives with the original Column API in
  * [[graft.operators.TextOps]]; this file is mechanics only.
  */
object UrlExprs {

  private val FRAG = Pattern.compile("#.*")
  private val SCHEME = Pattern.compile("^([A-Za-z][A-Za-z0-9+.-]*)://")
  private val HOSTPORT = Pattern.compile("^([^/?]*)")
  private val USERINFO = Pattern.compile("^.*@")
  private val PORT_ANY = Pattern.compile(":[0-9]+$")
  private val PORT_CAP = Pattern.compile("(:[0-9]+)$")
  private val PORT_80 = Pattern.compile(":80$")
  private val PORT_443 = Pattern.compile(":443$")
  private val RAWPATH = Pattern.compile("^([^?]*)")
  private val TRACK = Pattern.compile("^(utm_[^=&]*|gclid|fbclid|msclkid)(=|$)")
  private val AMP = Pattern.compile("&")
  private val DOT = Pattern.compile("\\.")
  private val WWW = Pattern.compile("^www\\.")

  // RFC 3986 dot-segment removal: the same fixed 8-round, 5-pass
  // sequence as the composed reference (TextOps.removeDotSegments)
  private val seg = "(?:[^./][^/]*|\\.[^./][^/]*|\\.\\.[^/]+)"
  private val DS1 = Pattern.compile("/\\./")
  private val DS2 = Pattern.compile("/\\.$")
  private val DS3 = Pattern.compile("/" + seg + "/\\.\\./")
  private val DS4 = Pattern.compile("/" + seg + "/\\.\\.$")
  private val DS5 = Pattern.compile("^/\\.\\.(/|$)")

  private def extract1(p: Pattern, s: String): String = {
    val m = p.matcher(s)
    if (m.find()) { val g = m.group(1); if (g == null) "" else g } else ""
  }

  private def removeDotSegments(path: String): String = {
    if (!path.contains("/.")) return path
    var p = path
    var i = 0
    while (i < 8) {
      p = DS1.matcher(p).replaceAll("/")
      p = DS2.matcher(p).replaceAll("/")
      p = DS3.matcher(p).replaceAll("/")
      p = DS4.matcher(p).replaceAll("/")
      p = DS5.matcher(p).replaceAll("/")
      i += 1
    }
    p
  }

  /** lowercase via the same path Spark's `lower` built-in takes */
  private def low(s: String): String =
    UTF8String.fromString(s).toLowerCase.toString

  /** (scheme, normalized-hostport, rest-after-scheme) of a
    * fragment-stripped, trimmed url — the shared front half */
  private def front(u: UTF8String): (String, String, String) = {
    val t = FRAG.matcher(u.trim().toString).replaceAll("")
    val scheme = low(extract1(SCHEME, t))
    val rest = SCHEME.matcher(t).replaceAll("")
    (scheme, extract1(HOSTPORT, rest), rest)
  }

  def urlSchemeKernel(u: UTF8String): UTF8String =
    UTF8String.fromString(low(extract1(SCHEME, u.trim().toString)))

  def urlHostKernel(u: UTF8String): UTF8String = {
    val (_, rawHostport, _) = front(u)
    val noUser = USERINFO.matcher(rawHostport).replaceAll("")
    UTF8String.fromString(low(PORT_ANY.matcher(noUser).replaceAll("")))
  }

  def urlNormalizeKernel(u: UTF8String): UTF8String = {
    val (scheme, rawHostport, rest) = front(u)
    val hostport = USERINFO.matcher(low(rawHostport)).replaceAll("")
    val host =
      if (scheme == "http") PORT_80.matcher(hostport).replaceAll("")
      else if (scheme == "https") PORT_443.matcher(hostport).replaceAll("")
      else hostport
    // rawHostport is a prefix of rest (anchored extract), so the SQL
    // substr arithmetic reduces to a prefix cut
    val tail = rest.substring(math.min(rawHostport.length, rest.length))
    val rawPath = extract1(RAWPATH, tail)
    val path = removeDotSegments(rawPath)
    val query =
      if (tail.length > rawPath.length) tail.substring(rawPath.length + 1)
      else ""
    val keptParts = AMP.split(query, -1)
    val sb = new java.lang.StringBuilder(64)
    if (scheme.nonEmpty) { sb.append(scheme); sb.append("://") }
    sb.append(host)
    // q2 first (cheap): the bare-"/" drop needs it
    val q = {
      val qb = new java.lang.StringBuilder(query.length)
      var first = true
      var i = 0
      while (i < keptParts.length) {
        val p = keptParts(i)
        if (p.nonEmpty && !TRACK.matcher(p).find()) {
          if (!first) qb.append('&')
          qb.append(p); first = false
        }
        i += 1
      }
      qb.toString
    }
    if (!(path == "/" && q.isEmpty)) sb.append(path)
    if (q.nonEmpty) { sb.append('?'); sb.append(q) }
    UTF8String.fromString(sb.toString)
  }

  def urlSurtKernel(u: UTF8String): UTF8String = {
    val n = urlNormalizeKernel(u).toString
    val sRest = SCHEME.matcher(n).replaceAll("")
    val hostport = extract1(HOSTPORT, sRest)
    val host = PORT_ANY.matcher(hostport).replaceAll("")
    val port = extract1(PORT_CAP, hostport)
    val bare = WWW.matcher(host).replaceAll("")
    val tail = sRest.substring(math.min(hostport.length, sRest.length))
    val labels = DOT.split(bare, -1)
    val sb = new java.lang.StringBuilder(n.length + 4)
    var i = labels.length - 1
    while (i >= 0) {
      sb.append(labels(i))
      if (i > 0) sb.append(',')
      i -= 1
    }
    sb.append(port)
    sb.append(')')
    if (!tail.startsWith("/")) sb.append('/')
    sb.append(tail)
    UTF8String.fromString(sb.toString)
  }

  // -------------------------------------------------------- expressions

  case class UrlNormalize(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "url_normalize"
    override def nullSafeEval(a: Any): Any =
      urlNormalizeKernel(a.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.UrlExprs.urlNormalizeKernel($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class UrlSurt(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "url_surt"
    override def nullSafeEval(a: Any): Any =
      urlSurtKernel(a.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.UrlExprs.urlSurtKernel($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class UrlHost(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "url_host"
    override def nullSafeEval(a: Any): Any =
      urlHostKernel(a.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.UrlExprs.urlHostKernel($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class UrlScheme(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "url_scheme"
    override def nullSafeEval(a: Any): Any =
      urlSchemeKernel(a.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.UrlExprs.urlSchemeKernel($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  // ------------------------------------------------- Column-level API

  def url_normalize(u: Column): Column =
    ColumnBridge.column(UrlNormalize(ColumnBridge.expression(u)))
  def url_surt(u: Column): Column =
    ColumnBridge.column(UrlSurt(ColumnBridge.expression(u)))
  def url_host(u: Column): Column =
    ColumnBridge.column(UrlHost(ColumnBridge.expression(u)))
  def url_scheme(u: Column): Column =
    ColumnBridge.column(UrlScheme(ColumnBridge.expression(u)))
}
