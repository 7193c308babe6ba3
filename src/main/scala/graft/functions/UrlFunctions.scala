package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL parsing/normalization for URL-level corpus dedup and domain
  * filtering — the first dedup pass of CommonCrawl-style pipelines (CCNet,
  * RefinedWeb §3.1 both dedup by normalized URL before touching content).
  *
  * The parse is a FIXED character scan (no java.net.URI, whose parsing is
  * too lenient/Java-specific to mirror in SQL) so a DuckDB oracle can
  * reproduce every output with RE2 regexps:
  *
  *  - scheme   = text before the first "://" (empty if absent)
  *  - authority = after "://" up to the first '/', '?' or '#'
  *  - host     = authority, minus userinfo (after last '@') and port
  *               (before first ':'), lowercased
  *  - path     = from that '/' (inclusive) up to the first '?' or '#'
  *  - query    = after '?' up to '#'; fragment is dropped
  *  - domain   = the last two dot-labels of host (host itself if fewer)
  *  - normalize: lower(scheme) + "://" + host + path + filtered query,
  *               where filtering drops empty params and any param whose key
  *               is ref/fbclid/gclid or starts with "utm_" — param order is
  *               otherwise preserved
  *
  * A URL with no "://" normalizes to itself with empty host/domain.
  * All scalar single-pass work: runs inside whole-stage codegen at scan
  * speed; at 100 TB URL dedup is then exact dedup on `url_norm` (16-byte
  * fingerprints, never the raw strings — see Dedup.dedupExact).
  */
object UrlImpl {

  /** (scheme, hostStart, hostEnd, pathStart, pathEnd, queryStart, queryEnd)
    * offsets are not exposed — each accessor rescans; URLs are short and the
    * scan is branch-light, so sharing offsets buys nothing measurable.
    */
  private def afterScheme(s: String): Int = {
    val i = s.indexOf("://")
    if (i < 0) -1 else i + 3
  }

  private def authorityEnd(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && s.charAt(i) != '/' && s.charAt(i) != '?' && s.charAt(i) != '#') i += 1
    i
  }

  private def hostOf(s: String): String = {
    val a0 = afterScheme(s)
    if (a0 < 0) return ""
    val a1  = authorityEnd(s, a0)
    var lo  = a0
    val at  = s.lastIndexOf('@', a1 - 1)
    if (at >= a0) lo = at + 1
    var hi = lo
    while (hi < a1 && s.charAt(hi) != ':') hi += 1
    s.substring(lo, hi).toLowerCase(java.util.Locale.ROOT)
  }

  def host(u: UTF8String): UTF8String = UTF8String.fromString(hostOf(u.toString))

  def domain(u: UTF8String): UTF8String = {
    val h    = hostOf(u.toString)
    val last = h.lastIndexOf('.')
    if (last <= 0) return UTF8String.fromString(h)
    val prev = h.lastIndexOf('.', last - 1)
    UTF8String.fromString(if (prev < 0) h else h.substring(prev + 1))
  }

  private def isTracking(param: String): Boolean = {
    val eq  = param.indexOf('=')
    val key = if (eq < 0) param else param.substring(0, eq)
    key == "ref" || key == "fbclid" || key == "gclid" || key.startsWith("utm_")
  }

  def normalize(u: UTF8String): UTF8String = {
    val s  = u.toString
    val a0 = afterScheme(s)
    if (a0 < 0) return u
    val scheme = s.substring(0, a0 - 3).toLowerCase(java.util.Locale.ROOT)
    val a1     = authorityEnd(s, a0)
    val h      = hostOf(s)
    // path: from a1 if it is '/', up to '?' or '#'
    var pEnd = a1
    while (pEnd < s.length && s.charAt(pEnd) != '?' && s.charAt(pEnd) != '#') pEnd += 1
    val path = s.substring(a1, pEnd)
    // query: after '?' up to '#'
    var q = ""
    if (pEnd < s.length && s.charAt(pEnd) == '?') {
      var qEnd = pEnd + 1
      while (qEnd < s.length && s.charAt(qEnd) != '#') qEnd += 1
      q = s.substring(pEnd + 1, qEnd)
    }
    val kept = q.split('&').filter(p => p.nonEmpty && !isTracking(p))
    val sb   = new java.lang.StringBuilder(s.length)
    sb.append(scheme).append("://").append(h).append(path)
    if (kept.nonEmpty) sb.append('?').append(String.join("&", kept: _*))
    UTF8String.fromString(sb.toString)
  }
}

case class UrlHostExpr(child: Expression) extends GraftUnaryCodegen {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    UrlImpl.host(input.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.functions.UrlImpl.host($c)"
  override protected def withNewChildInternal(newChild: Expression): UrlHostExpr =
    copy(child = newChild)
}

case class UrlDomainExpr(child: Expression) extends GraftUnaryCodegen {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    UrlImpl.domain(input.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.functions.UrlImpl.domain($c)"
  override protected def withNewChildInternal(newChild: Expression): UrlDomainExpr =
    copy(child = newChild)
}

case class UrlNormalizeExpr(child: Expression) extends GraftUnaryCodegen {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    UrlImpl.normalize(input.asInstanceOf[UTF8String])
  override protected def staticCall(c: String): String =
    s"graft.functions.UrlImpl.normalize($c)"
  override protected def withNewChildInternal(newChild: Expression): UrlNormalizeExpr =
    copy(child = newChild)
}

/** Column-API face. */
object UrlFunctions {
  def urlHost(c: Column): Column      = ColumnBridge.column(UrlHostExpr(ColumnBridge.expression(c)))
  def urlDomain(c: Column): Column    = ColumnBridge.column(UrlDomainExpr(ColumnBridge.expression(c)))
  def urlNormalize(c: Column): Column = ColumnBridge.column(UrlNormalizeExpr(ColumnBridge.expression(c)))
}
