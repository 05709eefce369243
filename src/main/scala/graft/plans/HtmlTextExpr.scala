package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction (the WET-production step): the transform that
  * turns a crawl's raw `response` payloads into the plain-text
  * conversion records every curation pipeline consumes. Reference
  * behavior is the CommonCrawl WET convention — visible body text only,
  * with script/style/comment content and all markup dropped, character
  * entities decoded, whitespace runs collapsed, and block-level element
  * boundaries preserved as single newlines (so paragraph structure
  * survives into segmentation/quality scoring downstream).
  *
  * Spark has no built-in for this, and a regexp_replace chain would be
  * 8+ full-string passes with interpreted regex state per row — so this
  * is a native Catalyst expression with real `doGenCode` (the
  * TextNorm/TextHashExprs static-kernel pattern): ONE left-to-right
  * scan per document inside the WholeStageCodegen span, zero shuffle —
  * the pure-map shape that survives 100 TB of crawl payloads.
  *
  * Extraction contract (each rule pinned in HtmlTextSpec):
  *   - scope: the content of `<body …> … </body>` (case-insensitive;
  *     the FIRST closing tag ends the scope — a premature `</body`
  *     inside commented-out markup truncates, the same degrade class
  *     as the script-string approximation below); a document with no
  *     body tag extracts from the whole input — head content (title
  *     included) is NOT visible text under the WET convention;
  *   - `<!-- … -->` comments and `<script>`/`<style>` elements drop
  *     WITH their content (non-greedy to their own closers, so markup
  *     inside a script string cannot truncate the scan);
  *   - any other tag drops; block-level tags (p, div, h1–h6, li, br,
  *     table rows/cells, pre, blockquote, section/article/…) emit a
  *     block boundary;
  *   - character entities decode AFTER markup handling, in text
  *     position only: the core named set plus `&#NNN;` / `&#xHH;`
  *     numerics; an unrecognized or malformed entity stays literal
  *     (degrade, never drop text). A decoded `<` or `&` is TEXT — the
  *     single pass cannot re-parse it as markup (the classic
  *     double-decode hole);
  *   - whitespace: runs collapse to one space, block boundaries
  *     collapse to one `\n`, empty blocks vanish, output is trimmed.
  *
  * Known approximations, stated honestly: attribute values containing
  * a raw `>` end the tag early (spec-invalid HTML; real crawls escape
  * it), and a `</body>` inside a body-level script string would
  * truncate the scope. Both degrade to less text, never to markup
  * leaking into the corpus.
  */
object HtmlText {

  private val BlockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
      "br", "hr", "table", "tr", "td", "th", "thead", "tbody", "tfoot",
      "blockquote", "pre", "section", "article", "header", "footer",
      "nav", "aside", "form", "fieldset", "dl", "dt", "dd", "figure",
      "figcaption", "main", "address").foreach(s.add)
    s
  }

  private val NamedEntities: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    Seq("amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
      "apos" -> "'", "nbsp" -> "\u00a0", "eacute" -> "é", "egrave" -> "è",
      "agrave" -> "à", "acirc" -> "â", "ocirc" -> "ô", "ouml" -> "ö",
      "uuml" -> "ü", "ccedil" -> "ç", "reg" -> "®", "copy" -> "©",
      "trade" -> "™", "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
      "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“",
      "rdquo" -> "”", "euro" -> "€", "deg" -> "°", "middot" -> "·")
      .foreach { case (k, v) => m.put(k, v) }
    m
  }

  /** Case-insensitive index of `needle` (ASCII, lowercase) in `hay`
    * from `from`, or -1. */
  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    val n = needle.length
    var i = math.max(from, 0)
    val last = hay.length - n
    while (i <= last) {
      var j = 0
      while (j < n && Character.toLowerCase(hay.charAt(i + j)) == needle.charAt(j)) j += 1
      if (j == n) return i
      i += 1
    }
    -1
  }

  /** Static kernel, invoked from generated code: one pass, see the
    * object scaladoc for the contract. */
  def extractKernel(input: UTF8String): UTF8String = {
    val html = input.toString
    // scope: <body …> … </body> (last closer), else the whole input
    var lo = 0
    var hi = html.length
    val bodyAt = HtmlLinks.indexOfTag(html, "body", 0)
    if (bodyAt >= 0) {
      val open = html.indexOf('>', bodyAt)
      if (open >= 0) {
        val close = indexOfIgnoreCase(html, "</body", open + 1)
        if (close > open) { lo = open + 1; hi = close }
      }
    }
    val out = new java.lang.StringBuilder(hi - lo)
    var pendingSpace = false
    var pendingBreak = false
    def emit(cp: Int): Unit = {
      if (cp <= ' ' || cp == 0xa0) { // incl. a decoded nbsp
        // text whitespace (incl. a decoded nbsp) only ever collapses
        pendingSpace = true
      } else {
        if (out.length > 0) {
          if (pendingBreak) out.append('\n')
          else if (pendingSpace) out.append(' ')
        }
        pendingSpace = false; pendingBreak = false
        out.appendCodePoint(cp)
      }
    }
    var i = lo
    while (i < hi) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(i, "<!--", 0, 4)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) hi else end + 3
        } else if (i + 1 < hi && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          // markup declaration / PI (<!DOCTYPE …>, <?xml …?>): not text
          val gt = html.indexOf('>', i + 1)
          i = if (gt < 0) hi else gt + 1
        } else {
          // tag name: letters/digits after optional '/'
          var j = i + 1
          var closing = false
          if (j < hi && html.charAt(j) == '/') { closing = true; j += 1 }
          val nameStart = j
          while (j < hi && (Character.isLetterOrDigit(html.charAt(j)))) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          if (name.isEmpty) {
            // not a tag ('< ' in sloppy text): literal
            emit(c.toInt); i += 1
          } else if (!closing && (name == "script" || name == "style")) {
            // drop the element WITH content: scan to its own closer
            val close = indexOfIgnoreCase(html, "</" + name, i + 1)
            if (close < 0) i = hi
            else {
              val gt = html.indexOf('>', close)
              i = if (gt < 0) hi else gt + 1
            }
          } else {
            if (BlockTags.contains(name)) pendingBreak = true
            val gt = html.indexOf('>', j)
            i = if (gt < 0) hi else gt + 1
          }
        }
      } else if (c == '&') {
        // entity: up to 12 chars to ';'
        val semi = html.indexOf(';', i + 1)
        var decoded: String = null
        if (semi > i && semi - i <= 12) {
          val body = html.substring(i + 1, semi)
          if (body.startsWith("#")) {
            val num = body.substring(1)
            val cp =
              try {
                if (num.length > 1 && (num.charAt(0) == 'x' || num.charAt(0) == 'X'))
                  Integer.parseInt(num.substring(1), 16)
                else Integer.parseInt(num, 10)
              } catch { case _: NumberFormatException => -1 }
            // surrogate range excluded (toChars would throw); planes
            // above BMP are fine — the toChar-truncation trap
            if (cp >= 0 && cp <= 0x10ffff && (cp < 0xd800 || cp > 0xdfff))
              decoded = new String(Character.toChars(cp))
          } else {
            decoded = NamedEntities.get(body)
          }
        }
        if (decoded != null) {
          var k = 0
          while (k < decoded.length) {
            val cp = decoded.codePointAt(k)
            emit(cp)
            k += Character.charCount(cp)
          }
          i = semi + 1
        } else {
          emit('&'.toInt) // malformed/unknown entity: literal, never dropped
          i += 1
        }
      } else {
        emit(c.toInt)
        i += 1
      }
    }
    UTF8String.fromString(out.toString)
  }

  /** Block-structured extraction WITH per-block anchor accounting
    * (r18 — the inputs of the jusText/trafilatura link-density
    * classifier, which tx18's pure length floor cannot express: nav
    * bars and footers are blocks whose VISIBLE TEXT lives mostly
    * inside `<a>` elements, however long they are). One struct per
    * non-empty block — `(btext, a_chars)`: the block's extracted text
    * under exactly [[extractKernel]]'s rules (same scoping, comment/
    * script/style dropping, entity decode, whitespace collapse), and
    * how many of its codepoints (collapsed separators included —
    * attributed to the anchor state of the character that flushes
    * them) were emitted inside an `<a>` element. `a_chars / length
    * (btext)` IS the block's link density; joining the texts with \n
    * reproduces extractKernel's output (property-pinned). Anchors
    * don't legally nest, so anchor state is a flag toggled by
    * `<a`/`</a`, cleared at block boundaries' flush. */
  def blocksKernel(input: UTF8String): ArrayData = {
    val html = input.toString
    var lo = 0
    var hi = html.length
    val bodyAt = HtmlLinks.indexOfTag(html, "body", 0)
    if (bodyAt >= 0) {
      val open = html.indexOf('>', bodyAt)
      if (open >= 0) {
        val close = indexOfIgnoreCase(html, "</body", open + 1)
        if (close > open) { lo = open + 1; hi = close }
      }
    }
    val out = new java.util.ArrayList[Any]()
    val sb = new java.lang.StringBuilder()
    var aChars = 0L
    var pendingSpace = false
    var inAnchor = false
    def flushBlock(): Unit = {
      if (sb.length > 0) {
        out.add(org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromString(sb.toString), aChars))
        sb.setLength(0)
      }
      aChars = 0L
      pendingSpace = false
    }
    def emit(cp: Int): Unit = {
      if (cp <= ' ' || cp == 0xa0) pendingSpace = true
      else {
        if (sb.length > 0 && pendingSpace) {
          sb.append(' ')
          if (inAnchor) aChars += 1
        }
        pendingSpace = false
        sb.appendCodePoint(cp)
        if (inAnchor) aChars += 1
      }
    }
    var i = lo
    while (i < hi) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(i, "<!--", 0, 4)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) hi else end + 3
        } else if (i + 1 < hi && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val gt = html.indexOf('>', i + 1)
          i = if (gt < 0) hi else gt + 1
        } else {
          var j = i + 1
          var closing = false
          if (j < hi && html.charAt(j) == '/') { closing = true; j += 1 }
          val nameStart = j
          while (j < hi && Character.isLetterOrDigit(html.charAt(j))) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          if (name.isEmpty) {
            emit(c.toInt); i += 1
          } else if (!closing && (name == "script" || name == "style")) {
            val close = indexOfIgnoreCase(html, "</" + name, i + 1)
            if (close < 0) i = hi
            else {
              val gt = html.indexOf('>', close)
              i = if (gt < 0) hi else gt + 1
            }
          } else {
            if (name == "a") inAnchor = !closing
            if (BlockTags.contains(name)) flushBlock()
            val gt = html.indexOf('>', j)
            i = if (gt < 0) hi else gt + 1
          }
        }
      } else if (c == '&') {
        val semi = html.indexOf(';', i + 1)
        var decoded: String = null
        if (semi > i && semi - i <= 12) {
          val body = html.substring(i + 1, semi)
          if (body.startsWith("#")) {
            val num = body.substring(1)
            val cp =
              try {
                if (num.length > 1 && (num.charAt(0) == 'x' || num.charAt(0) == 'X'))
                  Integer.parseInt(num.substring(1), 16)
                else Integer.parseInt(num, 10)
              } catch { case _: NumberFormatException => -1 }
            if (cp >= 0 && cp <= 0x10ffff && (cp < 0xd800 || cp > 0xdfff))
              decoded = new String(Character.toChars(cp))
          } else {
            decoded = NamedEntities.get(body)
          }
        }
        if (decoded != null) {
          var k = 0
          while (k < decoded.length) {
            val cp = decoded.codePointAt(k)
            emit(cp)
            k += Character.charCount(cp)
          }
          i = semi + 1
        } else {
          emit('&'.toInt)
          i += 1
        }
      } else {
        emit(c.toInt)
        i += 1
      }
    }
    flushBlock()
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** Link extraction + reference resolution — the other half of raw-HTML
  * processing: the crawl-graph production step (every `url`/`pr`/`dp7`
  * input ultimately comes from anchors in fetched pages, resolved
  * against the page's own URL).
  *
  * [[HtmlLinks.linksKernel]] scans once for `<a … href=…>` (attribute
  * order free, quoted or bare values, case-insensitive), entity-decodes
  * each value (hrefs legally carry `&amp;` between query params), and
  * drops non-navigational schemes (`javascript:`, `mailto:`, `tel:`,
  * `data:`) and pure fragments — the hygiene every link extractor
  * applies before the frontier.
  *
  * [[HtmlLinks.resolveKernel]] is clean-room RFC 3986 §5 reference
  * resolution: absolute references pass through; `//host/…` adopts the
  * base scheme; `/path` replaces the base path; `path` merges with the
  * base path's directory; `?q` replaces the query; and dot segments
  * (`.` / `..`) are removed by the §5.2.4 algorithm. Fragments are
  * dropped (crawl identity ignores them — the same rule the url1
  * canonicalizer applies). An unresolvable reference (no base scheme/
  * authority) returns null — degrade, never a fabricated URL. */
object HtmlLinks {

  private val SkipSchemes = Array("javascript:", "mailto:", "tel:", "data:")

  /** Decode entities in an attribute value (no markup context inside
    * attributes — a pure entity pass: &amp; &lt; &#NN; …). */
  private def decodeAttr(s: String): String = {
    if (s.indexOf('&') < 0) return s
    // reuse the text kernel on the bare value: no '<' means no tag
    // handling can trigger, whitespace in URLs is already meaningless
    HtmlText.extractKernel(UTF8String.fromString(s)).toString
  }

  /** All extracted (decoded, scheme-filtered, fragment-stripped) href
    * values of `<a>` tags, in document order. Comment (`<!-- -->`) and
    * `<script>`/`<style>` spans are skipped the same way the text
    * kernel skips them — a commented-out or script-embedded anchor is
    * markup no browser renders and must not feed the crawl frontier. */
  def linksKernel(input: UTF8String): ArrayData = {
    val html = input.toString
    val out = new java.util.ArrayList[Any]()
    var i = 0
    val n = html.length
    while (i + 2 < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { i = n }
      else if (html.regionMatches(lt, "<!--", 0, 4)) {
        val end = html.indexOf("-->", lt + 4)
        i = if (end < 0) n else end + 3
      } else if (atOpenTag(html, lt, "script") || atOpenTag(html, lt, "style")) {
        // drop the element WITH content: an '<a' inside a script
        // string or style rule is not a rendered link
        val name = if (atOpenTag(html, lt, "script")) "script" else "style"
        val close = indexOfIc(html, "</" + name, lt + 1)
        if (close < 0) i = n
        else {
          val gt = html.indexOf('>', close)
          i = if (gt < 0) n else gt + 1
        }
      } else {
        // anchor open tag: "<a" followed by whitespace or '>'
        val isA = lt + 2 < n &&
          (html.charAt(lt + 1) == 'a' || html.charAt(lt + 1) == 'A') &&
          (html.charAt(lt + 2) == '>' || Character.isWhitespace(html.charAt(lt + 2)))
        if (!isA) { i = lt + 1 }
        else {
          val gt = html.indexOf('>', lt)
          if (gt < 0) { i = n }
          else {
            val tag = html.substring(lt, gt)
            val at = findHref(tag)
            if (at != null) {
              var v = decodeAttr(at).trim
              val hash = v.indexOf('#')
              if (hash >= 0) v = v.substring(0, hash) // crawl identity drops fragments
              val lower = v.toLowerCase
              if (v.nonEmpty && !SkipSchemes.exists(lower.startsWith))
                out.add(UTF8String.fromString(v))
            }
            i = gt + 1
          }
        }
      }
    }
    val arr = new Array[Any](out.size())
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  private def findHref(tag: String): String = findAttr(tag, "href")

  /** True iff position `at` (which holds '<') opens tag `name`
    * (lowercase) with a real name boundary after it — a LOCAL check,
    * unlike [[indexOfTag]]'s scan. */
  private def atOpenTag(html: String, at: Int, name: String): Boolean = {
    val after = at + 1 + name.length
    if (after >= html.length) return false
    var j = 0
    while (j < name.length &&
      Character.toLowerCase(html.charAt(at + 1 + j)) == name.charAt(j)) j += 1
    if (j < name.length) return false
    val c = html.charAt(after)
    c == '>' || c == '/' || Character.isWhitespace(c)
  }

  /** The named attribute's value inside one tag's text, or null:
    * `name` (case-insensitive) = "quoted" | 'quoted' | bare-token.
    * A real attribute TOKENIZER (r18 — the advice fix): the tag is
    * walked attribute by attribute with quoted values skipped as
    * opaque spans, so a preceding attribute whose quoted value happens
    * to contain `href =` (e.g. `title="my href = x"`) can no longer
    * hijack the match, and `data-href` never matches `href` because
    * names compare whole-token. An unterminated quote degrades to
    * null (malformed tag), never to a fabricated value. */
  private[graft] def findAttr(tag: String, name: String): String = {
    val n = tag.length
    var i = 0
    // step over "<" / "</" and the tag name itself
    if (i < n && tag.charAt(i) == '<') {
      i += 1
      if (i < n && tag.charAt(i) == '/') i += 1
      while (i < n && Character.isLetterOrDigit(tag.charAt(i))) i += 1
    }
    while (i < n) {
      // skip whitespace and self-closing slashes between attributes
      while (i < n && (Character.isWhitespace(tag.charAt(i)) || tag.charAt(i) == '/')) i += 1
      if (i >= n) return null
      // attribute name token
      val ns = i
      while (i < n && !Character.isWhitespace(tag.charAt(i)) &&
        tag.charAt(i) != '=' && tag.charAt(i) != '/' &&
        tag.charAt(i) != '"' && tag.charAt(i) != '\'') i += 1
      if (i == ns) { i += 1 } // stray punctuation: step past it
      else {
        val aname = tag.substring(ns, i)
        var j = i
        while (j < n && Character.isWhitespace(tag.charAt(j))) j += 1
        if (j < n && tag.charAt(j) == '=') {
          j += 1
          while (j < n && Character.isWhitespace(tag.charAt(j))) j += 1
          if (j >= n) return null
          val q = tag.charAt(j)
          if (q == '"' || q == '\'') {
            val end = tag.indexOf(q, j + 1)
            if (end < 0) return null // unterminated quote: malformed tag
            if (aname.equalsIgnoreCase(name)) return tag.substring(j + 1, end)
            i = end + 1
          } else {
            val vs = j
            while (j < n && !Character.isWhitespace(tag.charAt(j))) j += 1
            if (aname.equalsIgnoreCase(name)) return tag.substring(vs, j)
            i = j
          }
        } else {
          // bare attribute (no value): the named attribute without a
          // value has no href/content to give — keep scanning
          i = j
        }
      }
    }
    null
  }

  /** The first `<title>…</title>` element's text, entity-decoded and
    * whitespace-collapsed — the page metadata every crawl index keys
    * on (head content, which body-scoped text extraction deliberately
    * excludes). Null when absent/unterminated. */
  def titleKernel(input: UTF8String): UTF8String = {
    val html = input.toString
    val at = indexOfTag(html, "title", 0)
    if (at < 0) return null
    val open = html.indexOf('>', at)
    if (open < 0) return null
    val close = indexOfIc(html, "</title", open + 1)
    if (close < 0) return null
    // inner text has no markup; the text kernel is exactly the entity
    // decode + whitespace collapse this needs
    HtmlText.extractKernel(
      UTF8String.fromString(html.substring(open + 1, close)))
  }

  /** The first `<meta name="<metaName>" content="…">` value,
    * entity-decoded (attribute values carry &amp; legally) — the
    * description/keywords/robots metadata cards read. Attribute order
    * free; null when no such meta tag exists. */
  def metaKernel(input: UTF8String, metaName: String): UTF8String = {
    val html = input.toString
    var i = 0
    val n = html.length
    while (i < n) {
      val at = indexOfTag(html, "meta", i)
      if (at < 0) return null
      val gt = html.indexOf('>', at)
      if (gt < 0) return null
      val tag = html.substring(at, gt)
      val nm = findAttr(tag, "name")
      if (nm != null && nm.equalsIgnoreCase(metaName)) {
        val content = findAttr(tag, "content")
        if (content != null)
          return UTF8String.fromString(decodeAttr(content).trim)
      }
      i = gt + 1
    }
    null
  }

  private def indexOfIc(hay: String, needle: String, from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length &&
        Character.toLowerCase(hay.charAt(i + j)) == needle.charAt(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Index of the OPEN tag `<name` with a real name boundary after it
    * (whitespace, `>`, or `/`) — so `<body` cannot match `<bodyguard`
    * nor `<title` match `<titlebar>` (case-insensitive), or -1. */
  private[graft] def indexOfTag(hay: String, name: String, from: Int): Int = {
    var i = indexOfIc(hay, "<" + name, from)
    while (i >= 0) {
      val after = i + 1 + name.length
      if (after >= hay.length) return -1 // truncated right at the name
      val c = hay.charAt(after)
      if (c == '>' || c == '/' || Character.isWhitespace(c)) return i
      i = indexOfIc(hay, "<" + name, i + 1)
    }
    -1
  }

  /** RFC 3986 §5 reference resolution — see the object scaladoc. */
  def resolveKernel(base: UTF8String, ref0: UTF8String): UTF8String = {
    val ref = ref0.toString
    // absolute reference (has a scheme): pass through
    if (ref.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:.*")) return ref0
    val b = base.toString
    val sEnd = b.indexOf("://")
    if (sEnd < 0) return null // unresolvable base — degrade
    val scheme = b.substring(0, sEnd)
    val authStart = sEnd + 3
    var authEnd = authStart
    while (authEnd < b.length && b.charAt(authEnd) != '/' &&
      b.charAt(authEnd) != '?' && b.charAt(authEnd) != '#') authEnd += 1
    val authority = b.substring(authStart, authEnd)
    if (ref.startsWith("//")) return UTF8String.fromString(scheme + ":" + ref)
    // base path (no query/fragment)
    var pathEnd = authEnd
    while (pathEnd < b.length && b.charAt(pathEnd) != '?' && b.charAt(pathEnd) != '#')
      pathEnd += 1
    val basePath = if (authEnd == pathEnd) "/" else b.substring(authEnd, pathEnd)
    val resolvedPath =
      if (ref.isEmpty) basePath
      else if (ref.startsWith("?")) return UTF8String.fromString(
        scheme + "://" + authority + basePath + ref)
      else if (ref.startsWith("/")) removeDots(ref)
      else {
        // merge: base path's directory + ref (RFC 3986 §5.3)
        val dir = basePath.substring(0, basePath.lastIndexOf('/') + 1)
        removeDots(dir + ref)
      }
    UTF8String.fromString(scheme + "://" + authority + resolvedPath)
  }

  /** Dot-segment removal (RFC 3986 §5.2.4) over a path that may carry
    * a query suffix (the query never participates). */
  private def removeDots(pathAndQuery: String): String = {
    val qAt = pathAndQuery.indexOf('?')
    val path = if (qAt < 0) pathAndQuery else pathAndQuery.substring(0, qAt)
    val query = if (qAt < 0) "" else pathAndQuery.substring(qAt)
    val segs = new java.util.ArrayList[String]()
    var i = 0
    while (i < path.length) {
      val slash = path.indexOf('/', i + 1)
      val end = if (slash < 0) path.length else slash
      val seg = path.substring(i, end) // leading '/' included
      seg match {
        case "/." | "/" => // drop (trailing '/' re-added below if needed)
        case "/.." => if (!segs.isEmpty) segs.remove(segs.size() - 1)
        case s => segs.add(s)
      }
      i = end
    }
    val sb = new java.lang.StringBuilder()
    segs.forEach(s => { sb.append(s); () })
    // preserve a trailing slash ('/', '/.', '/..' endings all end in '/')
    if (path.endsWith("/") || path.endsWith("/.") || path.endsWith("/.."))
      sb.append('/')
    if (sb.length() == 0) sb.append('/')
    sb.append(query)
    sb.toString
  }
}

/** Anchor hrefs of an HTML string column, decoded and scheme-filtered,
  * in document order — see [[HtmlLinks]]. NULL in, NULL out. */
case class HtmlHrefs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    HtmlLinks.linksKernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.plans.HtmlLinks.linksKernel($in);")

  override protected def withNewChildInternal(c: Expression): HtmlHrefs = copy(child = c)
}

/** RFC 3986 resolution of `ref` against `base` — see [[HtmlLinks]].
  * NULL (either side, or an unresolvable pair) → NULL. */
case class ResolveUrl(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  // the kernel degrades unresolvable pairs to null even on non-null
  // inputs, so the expression must report nullable (a FalseLiteral
  // isNull slot would make the generated assignment unwritable)
  override def nullable: Boolean = true

  override protected def nullSafeEval(base: Any, ref: Any): Any =
    HtmlLinks.resolveKernel(base.asInstanceOf[UTF8String], ref.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, (b, r) =>
      s"""${ev.value} = graft.plans.HtmlLinks.resolveKernel($b, $r);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
    code
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ResolveUrl =
    copy(left = l, right = r)
}

/** The first `<title>` element's decoded text — null when absent. */
case class HtmlTitle(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    HtmlLinks.titleKernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""${ev.value} = graft.plans.HtmlLinks.titleKernel($in);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)

  override protected def withNewChildInternal(c: Expression): HtmlTitle = copy(child = c)
}

/** The first `<meta name=… content=…>` value for a given name — null
  * when absent. */
case class HtmlMeta(child: Expression, metaName: String) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    HtmlLinks.metaKernel(input.asInstanceOf[UTF8String], metaName)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nameRef = ctx.addReferenceObj("metaName", metaName, "java.lang.String")
    nullSafeCodeGen(ctx, ev, in =>
      s"""${ev.value} = graft.plans.HtmlLinks.metaKernel($in, $nameRef);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): HtmlMeta = copy(child = c)
}

/** Block-structured extraction with per-block anchor-codepoint counts
  * — `array<struct<btext: string, a_chars: long>>`; see
  * [[HtmlText.blocksKernel]]. NULL in, NULL out. */
case class HtmlBlocks(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("btext", StringType, nullable = false),
      org.apache.spark.sql.types.StructField("a_chars",
        org.apache.spark.sql.types.LongType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    HtmlText.blocksKernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.plans.HtmlText.blocksKernel($in);")

  override protected def withNewChildInternal(c: Expression): HtmlBlocks = copy(child = c)
}

/** Extract visible plain text from an HTML string column — see
  * [[HtmlText]] for the contract. NULL in, NULL out. */
case class HtmlToText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    HtmlText.extractKernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.plans.HtmlText.extractKernel($in);")

  override protected def withNewChildInternal(c: Expression): HtmlToText = copy(child = c)
}

object HtmlTextExpr {
  def htmlToText(html: Column): Column =
    ColumnBridge.column(HtmlToText(ColumnBridge.expression(html)))

  /** Anchor hrefs (decoded, scheme-filtered, fragment-stripped), in
    * document order. */
  def htmlHrefs(html: Column): Column =
    ColumnBridge.column(HtmlHrefs(ColumnBridge.expression(html)))

  /** RFC 3986 resolution of `ref` against `base`; NULL when
    * unresolvable. */
  def resolveUrl(base: Column, ref: Column): Column =
    ColumnBridge.column(ResolveUrl(
      ColumnBridge.expression(base), ColumnBridge.expression(ref)))

  /** The first `<title>` element's decoded text; NULL when absent. */
  def htmlTitle(html: Column): Column =
    ColumnBridge.column(HtmlTitle(ColumnBridge.expression(html)))

  /** The first `<meta name=… content=…>` value; NULL when absent. */
  def htmlMeta(html: Column, name: String): Column =
    ColumnBridge.column(HtmlMeta(ColumnBridge.expression(html), name))

  /** Block-structured extraction with per-block anchor counts —
    * `array<struct<btext, a_chars>>`; the link-density classifier's
    * input (tx19). */
  def htmlBlocks(html: Column): Column =
    ColumnBridge.column(HtmlBlocks(ColumnBridge.expression(html)))
}
