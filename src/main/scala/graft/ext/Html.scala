package graft.ext

import java.security.MessageDigest
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryDef

/** HTML text extraction — the WET step of the CommonCrawl pipeline: the
  * transformation that turns crawled markup (what [[Warc]] ingests) into
  * the plain text an LLM corpus is actually built from. The extractor is
  * a REAL HTML tokenizer, not a regex strip: tag walk with attribute
  * parsing (double-/single-/unquoted values), character-reference
  * decoding (named, decimal `&#NNN;`, hex `&#xHH;` — an `&` that starts
  * no valid reference stays literal text, the HTML5 rule), RCDATA
  * `<title>` (entities decoded, tags not parsed), raw-text `<script>`/
  * `<style>` skipped by scanning for the matching end tag only — markup
  * or a stray `</div>` inside JS/CSS never terminates or leaks into the
  * text (the mistake a regex stripper makes), comments and DOCTYPE
  * skipped, and a visible-text contract a downstream pipeline can rely
  * on: body-only text nodes, whitespace runs collapsed to one space,
  * block-level boundaries become single newlines, empty blocks dropped.
  * Structural damage — EOF inside a tag, an unterminated comment,
  * quoted attribute, RCDATA or raw-text element, an invalid numeric
  * reference — fails LOUDLY with the char offset (the MediaDecoder
  * contract); text-level leniencies browsers guarantee (a literal `<`
  * before a non-name char, unknown entity names, unclosed elements at
  * EOF) are honored, because real crawled HTML exercises them.
  *
  * [[q_html_extract]] gates the extractor end-to-end: documents become
  * deterministic HTML pages (title with a named reference, escaped body
  * text, an entity-torture paragraph with decimal + hex references, a
  * per-doc set of `<a href>` links, a decoy-laden script/style pair, a
  * comment) through [[renderHtml]], the REAL tokenizer walks them back,
  * and DuckDB recomputes every output — decoded title, visible-text
  * md5/char count, link census + sorted hosts, tag census, skipped
  * raw-text chars — closed-form from the same documents table.
  * [[q_wet_pipeline]] composes the two real container halves:
  * render → member-per-record gzip WARC ([[Warc.encodeWarc]]) → verified
  * decompress + framed parse ([[Warc.parseWarc]]) → THIS extractor, with
  * the oracle rebuilding the exact rendered markup as a SQL string to
  * re-derive the WARC framing arithmetic (content length, CDX offset)
  * alongside the extraction fields — the literal WARC→WET job.
  *
  * Scale shape: both queries are one bounded per-group aggregation (the
  * WET grouping is 8 docs/file, matching [[Warc]]) + one mapPartitions
  * render/parse pass, zero further shuffles — embarrassingly parallel
  * over pages/files, exactly how WET extraction runs over a crawl.
  */
object Html {

  /** Extraction result: RCDATA-decoded title, visible body text under
    * the collapse contract, (href, anchor text) pairs in document order,
    * open+self-closing tag census, and the raw-text chars skipped inside
    * script/style elements.
    */
  final case class Extraction(title: String, bodyText: String,
      links: Vector[(String, String)], nTags: Int, rawSkipped: Int)

  private val Named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> "\u00a0")

  /** Block-level elements: entering or leaving one ends the current
    * visible-text block (HTML's own flow/phrasing split, the part that
    * matters for text extraction).
    */
  private val Block = Set("p", "div", "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "ul", "ol", "br", "tr", "td", "th", "table", "blockquote", "pre",
    "section", "article", "header", "footer", "body", "html", "head")

  // hoisted: flush() runs per block of every page in the hot
  // mapPartitions pass — replaceAll would recompile the pattern per call
  private val Ws = java.util.regex.Pattern.compile("[ \t\r\n]+")
  private def collapse(s: String): String = Ws.matcher(s).replaceAll(" ").trim

  /** Host of an absolute href: the authority up to the first `/` or `?`
    * (host-only URLs have neither). None for scheme-less/empty hrefs —
    * real crawled pages carry `mailto:`, fragments and relative links.
    */
  private[ext] def hostOfHref(href: String): Option[String] = {
    val sep = href.indexOf("://")
    if (sep < 0) return None
    val i = sep + 3
    // authority ends at the first of '/', '?' or '#' (a fragment can
    // directly follow the host: "https://h#frag")
    val slash = href.indexOf('/', i)
    val q = href.indexOf('?', i)
    val h = href.indexOf('#', i)
    var end = if (slash < 0) href.length else slash
    if (q >= 0 && q < end) end = q
    if (h >= 0 && h < end) end = h
    if (end <= i) None else Some(href.substring(i, end))
  }

  /** Tokenize + extract. Offsets in failures are CHAR offsets into the
    * markup string.
    */
  def parseHtml(docId: Long, html: String): Extraction = {
    def fail(off: Int, why: String): Nothing = throw new IllegalArgumentException(
      s"doc $docId: HTML parse at char $off: $why")
    val n = html.length
    var pos = 0
    var inBody = false
    var rawSkipped = 0
    var nTags = 0
    var title: String = null
    val blocks = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    val links = Vector.newBuilder[(String, String)]
    var anchorHref: String = null
    var anchorFrom = 0 // cur position where the open <a> started
    var anchorBuf: StringBuilder = null // anchor text carried across flushes

    // flush the current block: collapse whitespace runs, trim, drop empty.
    // An open anchor's text-so-far is carried over (block elements inside
    // <a> are valid HTML5 — card links — and must not lose anchor text).
    def flush(): Unit = {
      val s = cur.toString
      cur.clear()
      if (anchorHref != null) {
        anchorBuf.append(s.substring(math.min(anchorFrom, s.length))).append(' ')
        anchorFrom = 0
      }
      val collapsed = collapse(s)
      if (collapsed.nonEmpty) blocks += collapsed
    }

    // emit the open anchor (on </a>, or auto-close when a new <a> opens
    // before the previous closed — browsers auto-close nested anchors)
    def closeAnchor(): Unit = if (anchorHref != null) {
      val tail = cur.substring(math.min(anchorFrom, cur.length))
      links += ((anchorHref, collapse(anchorBuf.toString + tail)))
      anchorHref = null
      anchorBuf = null
    }

    // decode one character reference starting at `&` (pos on the '&');
    // returns the decoded string and advances pos, or null if the `&`
    // starts no valid reference (HTML5: it is then literal text)
    def charRef(): String = {
      val amp = pos
      if (amp + 1 >= n) return null
      if (html.charAt(amp + 1) == '#') {
        var j = amp + 2
        var radix = 10
        if (j < n && (html.charAt(j) == 'x' || html.charAt(j) == 'X')) {
          radix = 16; j += 1
        }
        val digits = j
        while (j < n && Character.digit(html.charAt(j), radix) >= 0) j += 1
        if (j == digits) fail(amp, "numeric character reference with no digits")
        if (j >= n || html.charAt(j) != ';')
          fail(amp, "numeric character reference without ';'")
        val cp =
          try Integer.parseInt(html.substring(digits, j), radix)
          catch { case _: NumberFormatException => fail(amp, "numeric reference overflows") }
        if (cp <= 0 || cp > 0x10ffff || (cp >= 0xd800 && cp <= 0xdfff))
          fail(amp, s"invalid codepoint $cp in character reference")
        pos = j + 1
        new String(Character.toChars(cp))
      } else {
        var j = amp + 1
        while (j < n && Character.isLetter(html.charAt(j))) j += 1
        if (j < n && j > amp + 1 && html.charAt(j) == ';') {
          Named.get(html.substring(amp + 1, j)) match {
            case Some(s) => pos = j + 1; s
            case None => null // unknown named entity: literal '&' (HTML5)
          }
        } else null
      }
    }

    // decode text with references, from..until (exclusive), into sb
    def decodeInto(sb: StringBuilder, until: Int): Unit = {
      while (pos < until) {
        val c = html.charAt(pos)
        if (c == '&') {
          val d = charRef()
          if (d == null) { sb.append('&'); pos += 1 } else sb.append(d)
        } else { sb.append(c); pos += 1 }
      }
    }

    // scan for the raw-text/RCDATA end tag `</name` (ASCII
    // case-insensitive); per spec the name must be FOLLOWED by
    // whitespace, '/' or '>' — `</scripts>` inside JS must not
    // terminate a <script> element. Returns the index of its '<'.
    def findEndTag(name: String, from: Int): Int = {
      val needle = "</" + name
      var i = from
      while (i + needle.length <= n) {
        if (html.regionMatches(true, i, needle, 0, needle.length)) {
          val after = i + needle.length
          if (after >= n) return -1 // needle at EOF: no closing '>' can follow
          val c = html.charAt(after)
          if (Character.isWhitespace(c) || c == '/' || c == '>') return i
        }
        i += 1
      }
      -1
    }

    while (pos < n) {
      val c = html.charAt(pos)
      if (c == '<') {
        val at = pos
        if (html.startsWith("<!--", pos)) {
          val end = html.indexOf("-->", pos + 4)
          if (end < 0) fail(at, "unterminated comment")
          pos = end + 3
        } else if (pos + 1 < n && (html.charAt(pos + 1) == '!' || html.charAt(pos + 1) == '?')) {
          val end = html.indexOf('>', pos)
          if (end < 0) fail(at, "unterminated markup declaration")
          pos = end + 1
        } else if (pos + 1 < n && html.charAt(pos + 1) == '/') {
          // close tag
          pos += 2
          val s = pos
          while (pos < n && html.charAt(pos) != '>') pos += 1
          if (pos >= n) fail(at, "unterminated close tag")
          val name = html.substring(s, pos).trim.toLowerCase(java.util.Locale.ROOT)
          pos += 1
          if (name == "body") inBody = false
          if (name == "a") closeAnchor()
          if (Block(name)) flush()
        } else if (pos + 1 < n && Character.isLetter(html.charAt(pos + 1))) {
          // open tag: name, attributes, optional self-close
          pos += 1
          val s = pos
          while (pos < n && (Character.isLetterOrDigit(html.charAt(pos)))) pos += 1
          val name = html.substring(s, pos).toLowerCase(java.util.Locale.ROOT)
          val attrs = Map.newBuilder[String, String]
          var selfClose = false
          var open = true
          while (open) {
            while (pos < n && Character.isWhitespace(html.charAt(pos))) pos += 1
            if (pos >= n) fail(at, s"EOF inside <$name> tag")
            html.charAt(pos) match {
              case '>' => pos += 1; open = false
              case '/' =>
                if (pos + 1 >= n || html.charAt(pos + 1) != '>')
                  fail(pos, "'/' not followed by '>' in tag")
                selfClose = true; pos += 2; open = false
              case _ =>
                val as = pos
                while (pos < n && !Character.isWhitespace(html.charAt(pos)) &&
                  html.charAt(pos) != '=' && html.charAt(pos) != '>' &&
                  html.charAt(pos) != '/') pos += 1
                if (pos == as) fail(pos, "malformed attribute")
                val aname = html.substring(as, pos).toLowerCase(java.util.Locale.ROOT)
                while (pos < n && Character.isWhitespace(html.charAt(pos))) pos += 1
                if (pos < n && html.charAt(pos) == '=') {
                  pos += 1
                  while (pos < n && Character.isWhitespace(html.charAt(pos))) pos += 1
                  if (pos >= n) fail(at, s"EOF inside <$name> tag")
                  val q = html.charAt(pos)
                  val sb = new StringBuilder
                  if (q == '"' || q == '\'') {
                    pos += 1
                    val close = html.indexOf(q, pos)
                    if (close < 0) fail(at, s"unterminated quoted attribute in <$name>")
                    decodeInto(sb, close)
                    pos = close + 1
                  } else {
                    val vs = pos
                    while (pos < n && !Character.isWhitespace(html.charAt(pos)) &&
                      html.charAt(pos) != '>') pos += 1
                    if (pos == vs) fail(vs, "empty unquoted attribute value")
                    val stop = pos
                    pos = vs
                    decodeInto(sb, stop)
                  }
                  attrs += aname -> sb.toString
                } else attrs += aname -> ""
            }
          }
          nTags += 1
          if (name == "body") { inBody = true; flush() }
          else if (name == "title") {
            val end = findEndTag("title", pos)
            if (end < 0) fail(at, "unterminated <title> (RCDATA)")
            val sb = new StringBuilder
            decodeInto(sb, end) // RCDATA: references decoded, tags literal
            title = sb.toString
            val gt = html.indexOf('>', end)
            if (gt < 0) fail(end, "unterminated </title>")
            pos = gt + 1
          } else if (name == "script" || name == "style") {
            // HTML5 ignores the self-closing flag on non-foreign elements:
            // <script src="x"/> is an OPEN script consuming raw text until
            // </script> — honoring the slash would leak JS into the text
            val end = findEndTag(name, pos)
            if (end < 0) fail(at, s"unterminated <$name> (raw text)")
            rawSkipped += end - pos
            val gt = html.indexOf('>', end)
            if (gt < 0) fail(end, s"unterminated </$name>")
            pos = gt + 1
          } else {
            if (name == "a" && inBody) {
              closeAnchor() // browsers auto-close a still-open <a>
              anchorHref = attrs.result().getOrElse("href", "")
              anchorFrom = cur.length
              anchorBuf = new StringBuilder
            }
            if (Block(name)) flush()
          }
        } else {
          // '<' before a non-name char: literal text (the HTML5 rule)
          if (inBody) cur.append('<')
          pos += 1
        }
      } else if (c == '&' && inBody) {
        val d = charRef()
        if (d == null) { cur.append('&'); pos += 1 } else cur.append(d)
      } else {
        if (inBody) cur.append(c)
        pos += 1
      }
    }
    closeAnchor() // an <a> still open at EOF keeps its link (browser behavior)
    flush()
    Extraction(if (title == null) "" else title, blocks.mkString("\n"),
      links.result(), nTags, rawSkipped)
  }

  // ---- the deterministic render half --------------------------------------------

  private val StyleBody = "body { color: #123; } /* <p>decoy</p> */"
  private val ScriptBody =
    """var s = "</div> <b>no</b>"; if (1 < 2 && x) { f(); }"""

  /** `& < >` escaped — the inverse the tokenizer must apply. */
  def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** One deterministic page per document: RCDATA title with a named
    * reference, decoy-laden style + script raw text, escaped body text,
    * an entity-torture paragraph (decimal + hex references), `nLinks`
    * anchors, a comment full of markup. Every extracted field is
    * closed-form in (id, source, text, nLinks) so DuckDB can replay it.
    */
  def renderHtml(id: Long, source: String, text: String, nLinks: Int): String = {
    val links = (0 until nLinks).map { k =>
      s"""<a href="https://h${(id + k) % 8}.example.com/p/$id">link $k</a>"""
    }.mkString(" ")
    s"""<!DOCTYPE html>
       |<html>
       |<head><title>Doc $id &amp; $source</title><meta charset="utf-8"/>
       |<style>$StyleBody</style></head>
       |<body>
       |<script type="text/javascript">$ScriptBody</script>
       |<h1>Doc $id</h1>
       |<p>${escape(text)}</p>
       |<p>5 &lt; 7 &amp;&amp; &quot;q&quot; &#8212; ok&#x21;</p>
       |$links
       |<!-- trailing comment with <tags> & ampersands -->
       |</body>
       |</html>
       |""".stripMargin
  }

  /** The decoded entity-torture paragraph — shared with the oracle. */
  private val TortureSql = """'5 < 7 && "q" ' || chr(8212) || ' ok!'"""

  // ---- q_html_extract ------------------------------------------------------------

  /** Documents → [[renderHtml]] → REAL tokenizer → (title, visible-text
    * md5 + char count, link census + sorted hosts, tag census, raw-text
    * chars skipped), every column recomputed closed-form by DuckDB.
    */
  val q_html_extract: QueryDef = QueryDef(
    s"""WITH r(x) AS (VALUES (0),(1),(2),(3)),
       |l AS (SELECT doc_id,
       |    string_agg('link ' || CAST(x AS VARCHAR), ' ' ORDER BY x) AS links_text,
       |    string_agg(DISTINCT 'h' || CAST((doc_id + x) % 8 AS VARCHAR)
       |      || '.example.com', ',' ORDER BY 'h' || CAST((doc_id + x) % 8 AS VARCHAR)
       |      || '.example.com') AS hosts
       |  FROM documents JOIN r ON r.x <= doc_id % 4 GROUP BY doc_id),
       |d AS (SELECT t.doc_id, t.source, l.hosts,
       |    t.doc_id % 4 + 1 AS n_links,
       |    'Doc ' || CAST(t.doc_id AS VARCHAR) || chr(10)
       |      || trim(regexp_replace(t.text, '[ \\t\\r\\n]+', ' ', 'g')) || chr(10)
       |      || $TortureSql || chr(10) || l.links_text AS body
       |  FROM documents t JOIN l ON l.doc_id = t.doc_id)
       |SELECT doc_id,
       |  'Doc ' || CAST(doc_id AS VARCHAR) || ' & ' || source AS title,
       |  CAST(n_links AS BIGINT) AS n_links,
       |  hosts,
       |  md5(body) AS text_md5,
       |  CAST(length(body) AS BIGINT) AS n_text_chars,
       |  CAST(10 + n_links AS BIGINT) AS n_tags,
       |  CAST(${StyleBody.length + ScriptBody.length} AS BIGINT) AS raw_skipped
       |FROM d
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.map { case (id, source, text) =>
          val nLinks = (id % 4 + 1).toInt
          val ex = parseHtml(id, renderHtml(id, source, text, nLinks))
          if (ex.links.size != nLinks) throw new IllegalStateException(
            s"doc $id: rendered $nLinks links, extracted ${ex.links.size}")
          val hosts = ex.links.flatMap { case (href, _) => hostOfHref(href) }
            .distinct.sorted.mkString(",")
          md.reset()
          val hex = md.digest(ex.bodyText.getBytes(UTF_8))
            .map("%02x".format(_)).mkString
          (id, ex.title, nLinks.toLong, hosts, hex,
            ex.bodyText.codePointCount(0, ex.bodyText.length).toLong,
            ex.nTags.toLong, ex.rawSkipped.toLong)
        }
      }
      .toDF("doc_id", "title", "n_links", "hosts", "text_md5",
        "n_text_chars", "n_tags", "raw_skipped")
      .orderBy(col("doc_id"))
  }

  // ---- q_wet_pipeline: WARC → WET composed ---------------------------------------

  private val PerFile = 8

  /** The literal WARC→WET job: pages rendered, shipped as member-per-
    * record gzip WARC ([[Warc.encodeWarc]] — CommonCrawl's layout),
    * ingested back through the VERIFYING decompress + Content-Length
    * framing ([[Warc.parseWarc]]), and each payload run through the REAL
    * tokenizer. The oracle rebuilds the exact rendered markup AS A SQL
    * STRING to recompute the framing arithmetic (content length, CDX
    * running-sum offset) plus the extraction fields — so the gate covers
    * the handoff between the two real halves, not each in isolation.
    */
  val q_wet_pipeline: QueryDef = QueryDef(
    s"""WITH r(x) AS (VALUES (0),(1),(2),(3)),
       |l AS (SELECT doc_id,
       |    string_agg('<a href="https://h' || CAST((doc_id + x) % 8 AS VARCHAR)
       |      || '.example.com/p/' || CAST(doc_id AS VARCHAR) || '">link '
       |      || CAST(x AS VARCHAR) || '</a>', ' ' ORDER BY x) AS links_markup,
       |    string_agg('link ' || CAST(x AS VARCHAR), ' ' ORDER BY x) AS links_text
       |  FROM documents JOIN r ON r.x <= doc_id % 4 GROUP BY doc_id),
       |d AS (SELECT t.doc_id, t.doc_id // $PerFile AS wf, t.source, t.text,
       |    l.links_markup, l.links_text,
       |    'https://example.org/doc/' || CAST(t.doc_id AS VARCHAR) AS uri,
       |    'urn:doc:' || CAST(t.doc_id AS VARCHAR) AS rid
       |  FROM documents t JOIN l ON l.doc_id = t.doc_id),
       |h AS (SELECT *,
       |    '<!DOCTYPE html>' || chr(10) || '<html>' || chr(10)
       |    || '<head><title>Doc ' || CAST(doc_id AS VARCHAR) || ' &amp; ' || source
       |    || '</title><meta charset="utf-8"/>' || chr(10)
       |    || '<style>$StyleBody</style></head>' || chr(10)
       |    || '<body>' || chr(10)
       |    || '<script type="text/javascript">' || ${sqlLit(ScriptBody)} || '</script>' || chr(10)
       |    || '<h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1>' || chr(10)
       |    || '<p>' || replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;') || '</p>' || chr(10)
       |    || '<p>5 &lt; 7 &amp;&amp; &quot;q&quot; &#8212; ok&#x21;</p>' || chr(10)
       |    || links_markup || chr(10)
       |    || '<!-- trailing comment with <tags> & ampersands -->' || chr(10)
       |    || '</body>' || chr(10) || '</html>' || chr(10) AS page
       |  FROM d),
       |z AS (SELECT *, octet_length(encode(page)) AS plen,
       |    ${Warc.RecFixed} + length(rid) + length(uri)
       |      + length(CAST(octet_length(encode(page)) AS VARCHAR))
       |      + octet_length(encode(page)) AS rec_bytes
       |  FROM h)
       |SELECT doc_id, CAST(wf AS BIGINT) AS warc_file,
       |  CAST(count(*) OVER (PARTITION BY wf) AS BIGINT) AS n_records,
       |  CAST(plen AS BIGINT) AS content_length,
       |  CAST(coalesce(sum(rec_bytes) OVER (PARTITION BY wf ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS rec_offset,
       |  'Doc ' || CAST(doc_id AS VARCHAR) || ' & ' || source AS title,
       |  md5('Doc ' || CAST(doc_id AS VARCHAR) || chr(10)
       |    || trim(regexp_replace(text, '[ \\t\\r\\n]+', ' ', 'g')) || chr(10)
       |    || $TortureSql || chr(10) || links_text) AS text_md5
       |FROM z
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("text"))
      .transform(DecodeStage.spread(expr(s"doc_id div $PerFile")))
      .groupBy(expr(s"doc_id div $PerFile").as("wf"))
      .agg(sort_array(collect_list(struct(col("doc_id").as("_1"),
        col("source").as("_2"), col("text").as("_3")))).as("docs"))
      .as[(Long, Seq[(Long, String, String)])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.flatMap { case (wf, docs) =>
          val recs = docs.map { case (id, source, text) =>
            val page = renderHtml(id, source, text, (id % 4 + 1).toInt)
            (s"https://example.org/doc/$id", s"urn:doc:$id", page.getBytes(UTF_8))
          }
          val parsed = Warc.parseWarc(wf, Warc.encodeWarc(recs))
          parsed.map { r =>
            val docId = r.uri.substring(r.uri.lastIndexOf('/') + 1).toLong
            val ex = parseHtml(docId, new String(r.payload, UTF_8))
            md.reset()
            val hex = md.digest(ex.bodyText.getBytes(UTF_8))
              .map("%02x".format(_)).mkString
            (docId, wf, parsed.size.toLong, r.contentLength.toLong, r.offset,
              ex.title, hex)
          }
        }
      }
      .toDF("doc_id", "warc_file", "n_records", "content_length",
        "rec_offset", "title", "text_md5")
      .orderBy(col("doc_id"))
  }

  /** Escape a Scala string constant into a single-quoted SQL literal. */
  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  // ---- q_host_links: the web-graph edge aggregation -------------------------------

  /** The step after WET extraction in a crawl pipeline: extracted links
    * become the HOST-LEVEL web graph (the input to host ranking, spam
    * clustering, crawl prioritization). Each page's declared host links
    * to the hosts of its extracted hrefs; edges aggregate to (src_host,
    * dst_host, link count, distinct pages). Scale shape: the extraction
    * is the same single mapPartitions pass, and the edge aggregation is
    * ONE hash-partitioned groupBy on (src, dst) — host-pair cardinality
    * is tiny next to the page count, so the map-side partial aggregation
    * collapses almost everything before the exchange.
    */
  val q_host_links: QueryDef = QueryDef(
    """WITH r(x) AS (VALUES (0),(1),(2),(3)),
      |e AS (SELECT doc_id,
      |    'h' || CAST(doc_id % 8 AS VARCHAR) || '.example.com' AS src_host,
      |    'h' || CAST((doc_id + x) % 8 AS VARCHAR) || '.example.com' AS dst_host
      |  FROM documents JOIN r ON r.x <= doc_id % 4)
      |SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS n_links,
      |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      |FROM e GROUP BY src_host, dst_host
      |ORDER BY src_host, dst_host""".stripMargin) { (s, dir) =>
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, source, text) =>
          val ex = parseHtml(id, renderHtml(id, source, text, (id % 4 + 1).toInt))
          ex.links.flatMap { case (href, _) =>
            hostOfHref(href).map(h => (id, s"h${id % 8}.example.com", h))
          }
        }
      }
      .toDF("doc_id", "src_host", "dst_host")
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("src_host"), col("dst_host"))
  }

  val all: Map[String, QueryDef] = Map(
    "q_html_extract" -> q_html_extract,
    "q_wet_pipeline" -> q_wet_pipeline,
    "q_host_links" -> q_host_links)
}
