package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
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
  *     last closing tag wins); a document with no body tag extracts
  *     from the whole input — head content (title included) is NOT
  *     visible text under the WET convention;
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
    val bodyAt = indexOfIgnoreCase(html, "<body", 0)
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
}
