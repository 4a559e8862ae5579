package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native RFC 3986 URL normalization — the canonicalization a crawl
  * pipeline runs before URL-level dedup, host aggregation, or blocklist
  * joins (two syntactically different URLs naming the same resource must
  * collide). Implements the RFC's syntax-based normalization (§6.2.2)
  * plus the scheme-based default-port rule (§6.2.3):
  *
  *   - scheme and host lowercased (case-insensitive by definition)
  *   - default port stripped (`http:80`, `https:443`)
  *   - percent-encodings of UNRESERVED chars (ALPHA / DIGIT / `-._~`)
  *     decoded; all surviving `%XX` triplets uppercased
  *   - path dot-segments (`.` / `..`) removed by the RFC's §5.2.4
  *     algorithm; an empty path with an authority becomes `/`
  *   - the fragment dropped (never sent to the server)
  *   - query preserved (order is semantic — only its percent-encodings
  *     are normalized)
  *
  * Returns NULL for strings that are not absolute hierarchical URLs
  * (no `://`, empty host, malformed percent triplet) — SQL-friendly for
  * dirty crawl data; the caller filters. Participates in whole-stage
  * codegen through a static helper call.
  */
case class UrlNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_url_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UrlNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = graft.functions.UrlNormalize$$.MODULE$$.compute($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UrlNormalize =
    copy(child = newChild)
}

object UrlNormalize {

  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Percent-encoding normalization over one URL component: decode
    * unreserved octets, uppercase surviving triplets. Null on a
    * malformed triplet.
    */
  private def normPct(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') {
        if (i + 2 >= s.length) return null
        val h = hexVal(s.charAt(i + 1)); val l = hexVal(s.charAt(i + 2))
        if (h < 0 || l < 0) return null
        val v = (h << 4) | l
        if (v < 0x80 && isUnreserved(v.toChar)) sb.append(v.toChar)
        else sb.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** RFC 3986 §5.2.4 remove_dot_segments over an absolute path, plus one
    * deliberate crawl-canonicalization choice BEYOND the RFC: empty
    * segments (`//`) collapse, because in crawled link data they are
    * overwhelmingly author typos for the same resource and URL-dedup
    * wants them to collide.
    */
  private def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]
    // split preserving the leading '/' semantics; track trailing slash
    val segs = path.split("/", -1)
    var i = 0
    while (i < segs.length) {
      segs(i) match {
        case "." => // drop; a trailing "." keeps the directory slash
        case ".." => if (out.nonEmpty) out.remove(out.length - 1)
        case s => out += s
      }
      i += 1
    }
    // re-add the trailing slash a final "."/".." implies
    val trailing = segs.nonEmpty &&
      (segs.last == "." || segs.last == "..") && out.nonEmpty && out.last.nonEmpty
    val joined = out.filter(_.nonEmpty).mkString("/")
    "/" + joined + (if (trailing || (path.endsWith("/") && joined.nonEmpty)) "/" else "")
  }

  /** Normalize; null when not an absolute hierarchical URL. */
  def compute(u: UTF8String): UTF8String = {
    val s = u.toString
    val sep = s.indexOf("://")
    if (sep <= 0) return null
    val scheme = s.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    // RFC 3986 §3.1: scheme = ALPHA *( ALPHA / DIGIT / "+" / "-" / "." )
    if (!(scheme.head >= 'a' && scheme.head <= 'z')) return null
    if (!scheme.forall(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
      c == '+' || c == '-' || c == '.')) return null
    var rest = s.substring(sep + 3)
    val frag = rest.indexOf('#')
    if (frag >= 0) rest = rest.substring(0, frag)
    val (authRaw, pathQuery) = {
      val slash = rest.indexOf('/')
      val quest = rest.indexOf('?')
      val cut = if (slash < 0 && quest < 0) rest.length
        else if (slash < 0) quest
        else if (quest < 0) slash
        else math.min(slash, quest)
      (rest.substring(0, cut), rest.substring(cut))
    }
    if (authRaw.isEmpty) return null
    // userinfo@host:port
    val at = authRaw.lastIndexOf('@')
    val userinfo = if (at >= 0) authRaw.substring(0, at + 1) else ""
    val hostPort = authRaw.substring(at + 1)
    val colon = hostPort.lastIndexOf(':')
    val (host0, port) =
      if (colon >= 0 && hostPort.substring(colon + 1).forall(_.isDigit))
        (hostPort.substring(0, colon), hostPort.substring(colon + 1))
      else (hostPort, "")
    if (host0.isEmpty) return null
    val host = host0.toLowerCase(java.util.Locale.ROOT)
    val keepPort = port.nonEmpty &&
      !((scheme == "http" && port == "80") || (scheme == "https" && port == "443"))
    // split path from query
    val q = pathQuery.indexOf('?')
    val rawPath = if (q >= 0) pathQuery.substring(0, q) else pathQuery
    val rawQuery = if (q >= 0) pathQuery.substring(q + 1) else null
    val pctPath = normPct(rawPath)
    if (pctPath == null) return null
    val path = if (pctPath.isEmpty) "/" else removeDotSegments(pctPath)
    val query = if (rawQuery == null) null else {
      val nq = normPct(rawQuery)
      if (nq == null) return null
      nq
    }
    val sb = new StringBuilder(scheme).append("://").append(userinfo)
      .append(host)
    if (keepPort) sb.append(':').append(port)
    sb.append(path)
    if (query != null) sb.append('?').append(query)
    UTF8String.fromString(sb.toString)
  }

  /** Column form. */
  def apply(c: Column): Column =
    GraftSql.column(UrlNormalize(GraftSql.expression(c)))
}
