package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.plans.HtmlText

/** Kernel pins for the HTML→text extractor — each contract rule from
  * the HtmlText scaladoc, plus the degrade paths the ext1 oracle round
  * trip can't see (no body tag, unterminated constructs, garbage). */
class HtmlTextSpec extends AnyFunSuite {

  private def x(html: String): String =
    HtmlText.extractKernel(UTF8String.fromString(html)).toString

  test("body scoping: head content (title, script, style) is not text") {
    val html = "<!DOCTYPE html><html><head><title>The Title</title>" +
      "<script>var a = \"</p> decoy\";</script>" +
      "<style>p > .x { content: \"</span>\"; }</style></head>" +
      "<body><p>real text</p></body></html>"
    assert(x(html) == "real text")
  }

  test("no body tag: whole input extracts, markup declarations drop") {
    assert(x("<!DOCTYPE html><p>alpha beta</p>") == "alpha beta")
    assert(x("<?xml version=\"1.0\"?><p>gamma</p>") == "gamma")
    assert(x("plain text, no markup at all") == "plain text, no markup at all")
  }

  test("comments and script/style inside body drop WITH content") {
    val html = "<body><!-- <p>ghost</p> --><p>a</p>" +
      "<script>document.write('<b>ghost</b>');</script>" +
      "<style>.x { color: red }</style><p>b</p></body>"
    assert(x(html) == "a\nb")
  }

  test("block tags become newlines, inline tags become nothing") {
    assert(x("<body><p>one <b>two</b> three</p><div>four</div></body>")
      == "one two three\nfour")
    assert(x("<body>line one<br/>line two</body>") == "line one\nline two")
    // empty blocks vanish; consecutive boundaries collapse to one \n
    assert(x("<body><p>a</p><p></p><p>  </p><div></div><p>b</p></body>") == "a\nb")
  }

  test("entity decode: named, decimal, hex; decoded '<' never re-parses as a tag") {
    assert(x("<body>&quot;q&quot; &amp; &#97;&#x62;c</body>") == "\"q\" & abc")
    assert(x("<body>&lt;p&gt;not a tag&lt;/p&gt;</body>") == "<p>not a tag</p>")
    assert(x("<body>caf&eacute; &euro;5 &nbsp; x</body>") == "café €5 x")
    // malformed / unknown entities stay literal, never dropped
    assert(x("<body>&bogus; &#; &#xzz; & alone &toolongtodecode;</body>")
      == "&bogus; &#; &#xzz; & alone &toolongtodecode;")
    // surrogate-range numerics degrade to literal; astral planes decode
    assert(x("<body>&#xD800; ok</body>") == "&#xD800; ok")
    assert(x("<body>&#x1F600;</body>") == new String(Character.toChars(0x1F600)))
  }

  test("whitespace collapses: runs, tabs, newlines, decoded nbsp") {
    assert(x("<body>  a \t\n  b&nbsp;&nbsp;c  </body>") == "a b c")
  }

  test("degrades never throw: unterminated constructs and garbage") {
    for (h <- Seq("<body><p>a", "<body><!-- never closed", "<body><script>no close",
      "<body><p attr=\"unclosed", "<body>&#999999999999;", "<", "", "<body>",
      "<body>< not a tag</body>"))
      x(h) // must return, never throw
    assert(x("<body><p>kept") == "kept", "unterminated tail still extracts text")
    val rnd = new java.util.Random(7L)
    for (_ <- 1 to 200) {
      val junk = Array.fill(rnd.nextInt(300))(
        "<>&;#ab c/!-\"'xPp".charAt(rnd.nextInt(17)))
      x(new String(junk))
    }
  }

  test("link extraction: attribute forms, entity decode, scheme/fragment hygiene") {
    def links(html: String): Seq[String] = {
      val a = graft.plans.HtmlLinks.linksKernel(UTF8String.fromString(html))
      (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
    }
    val html = """<body>
      <a href="https://x.org/a">t</a>
      <A CLASS="y" HREF='/b?p=1&amp;q=2'>t</A>
      <a href=../c/d>bare</a>
      <a name="anchor-no-href">t</a>
      <a href="javascript:void(0)">t</a>
      <a href="mailto:someone@example.org">t</a>
      <a href="#frag-only">t</a>
      <a href="/keep#frag-dropped">t</a>
      <abbr href="/not-an-anchor">t</abbr>
      <a data-href="/decoy" href="/real">t</a>
    </body>"""
    assert(links(html) == Seq("https://x.org/a", "/b?p=1&q=2", "../c/d",
      "/keep", "/real"))
    // never throws on garbage
    val rnd = new java.util.Random(3L)
    val alphabet = "<>ahref='\"= /#&;x"
    for (_ <- 1 to 100)
      links(new String(Array.fill(rnd.nextInt(200))(
        alphabet.charAt(rnd.nextInt(alphabet.length)))))
  }

  test("link extraction skips comments, script/style content, and quoted-value decoys (r18)") {
    def links(html: String): Seq[String] = {
      val a = graft.plans.HtmlLinks.linksKernel(UTF8String.fromString(html))
      (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
    }
    // commented-out and script/style-embedded anchors render nowhere —
    // they must not feed the crawl frontier
    val html = """<body>
      <!-- <a href="/commented-out">ghost</a> -->
      <script>var s = '<a href="/script-string">ghost</a>';</script>
      <style>a[href="/style-decoy"] { color: red }</style>
      <a href="/real">kept</a>
      <SCRIPT src="x.js">document.write('<a href="/dw">g</a>');</SCRIPT>
      <a href="/real2">kept</a>
    </body>"""
    assert(links(html) == Seq("/real", "/real2"))
    // unterminated comment/script swallow to EOF — degrade, never a ghost link
    assert(links("""<body><!-- <a href="/x"> <a href="/y">""").isEmpty)
    assert(links("""<body><script><a href="/x">""").isEmpty)
    // a preceding attribute whose QUOTED VALUE contains 'href =' must
    // not hijack the attribute match (the advice's findAttr hole)
    assert(links("""<a title="my href = /decoy" href="/value">t</a>""")
      == Seq("/value"))
    assert(links("""<a title='href="/decoy"' href=/bare>t</a>""") == Seq("/bare"))
    // unterminated quote: malformed tag degrades to no link
    assert(links("""<a href="/unclosed>t</a>""").isEmpty)
    import graft.plans.HtmlLinks
    assert(HtmlLinks.findAttr("""<meta content="c v" name=description""", "name")
      == "description")
    assert(HtmlLinks.findAttr("""<a data-href="/decoy">""", "href") == null)
  }

  test("URL resolution: RFC 3986 reference cases and dot-segment removal") {
    def res(base: String, ref: String): String = {
      val r = graft.plans.HtmlLinks.resolveKernel(
        UTF8String.fromString(base), UTF8String.fromString(ref))
      if (r == null) null else r.toString
    }
    val base = "https://h.example.org/a/b/c?q=1"
    assert(res(base, "https://other.org/x") == "https://other.org/x")
    assert(res(base, "//cdn.example.org/x") == "https://cdn.example.org/x")
    assert(res(base, "/x/y") == "https://h.example.org/x/y")
    assert(res(base, "x") == "https://h.example.org/a/b/x")
    assert(res(base, "../x") == "https://h.example.org/a/x")
    assert(res(base, "../../x") == "https://h.example.org/x")
    assert(res(base, "../../../x") == "https://h.example.org/x", "underflow clamps at root")
    assert(res(base, "./x") == "https://h.example.org/a/b/x")
    assert(res(base, "?q=2") == "https://h.example.org/a/b/c?q=2")
    assert(res(base, "") == "https://h.example.org/a/b/c")
    assert(res("https://h.org", "x") == "https://h.org/x", "authority-only base")
    assert(res(base, "x/") == "https://h.example.org/a/b/x/", "trailing slash kept")
    assert(res("not-a-url", "x") == null, "unresolvable base degrades to null")
  }

  test("tag-name boundaries: <bodyguard>/<titlebar>/<metadata> never match body/title/meta") {
    // a custom element sharing the prefix must not open the scope
    assert(x("<bodyguard>decoy</bodyguard><body><p>real</p></body>") == "real")
    import graft.plans.HtmlLinks
    val t = HtmlLinks.titleKernel(UTF8String.fromString(
      "<titlebar>decoy</titlebar><title>real</title>"))
    assert(t != null && t.toString == "real")
    val m = HtmlLinks.metaKernel(UTF8String.fromString(
      "<metadata name=\"description\" content=\"decoy\"/>" +
        "<meta name=\"description\" content=\"real\"/>"), "description")
    assert(m != null && m.toString == "real")
  }

  test("title and meta extraction: whitespace collapse, attribute order, entity decode") {
    import graft.plans.HtmlLinks
    def title(h: String): String = {
      val t = HtmlLinks.titleKernel(UTF8String.fromString(h))
      if (t == null) null else t.toString
    }
    def meta(h: String, n: String): String = {
      val m = HtmlLinks.metaKernel(UTF8String.fromString(h), n)
      if (m == null) null else m.toString
    }
    val h = """<html><head><title> A  &amp;
      B </title><meta name="viewport" content="w"/>
      <meta content="desc &quot;x&quot;" NAME="Description"/></head><body/></html>"""
    assert(title(h) == "A & B", "title must entity-decode and collapse whitespace")
    assert(meta(h, "description") == "desc \"x\"",
      "meta lookup is name-case-insensitive and attribute-order free")
    assert(meta(h, "keywords") == null)
    assert(title("<html><body>no head</body></html>") == null)
    assert(title("<title>unterminated") == null)
    assert(meta("<meta name=description>", "description") == null, "no content attr")
  }

  test("robots.txt: group selection, pattern shapes, longest-match-wins") {
    import graft.operators.Robots
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val txt = "# comment\nUser-agent: other\nDisallow: /\n\n" +
      "User-agent: bot\nUser-agent: bot-images\n" +
      "Crawl-delay: 1\nDisallow: /a/\nAllow: /a/b\nDisallow: /c/*d\n" +
      "Disallow: /e$\nDisallow:\n"
    val rules = Robots.parseRules(txt, "Bot")
    assert(rules.map(r => (r.pattern, r.allow)).toSet ==
      Set(("/a/", false), ("/a/b", true), ("/c/*d", false), ("/e$", false)),
      s"got $rules")
    // unknown agent falls back to the * group; none here → allow-all…
    assert(Robots.parseRules(txt, "stranger").isEmpty)
    // …and the * group applies when present
    assert(Robots.parseRules(txt + "\nUser-agent: *\nDisallow: /z\n", "stranger")
      .map(_.pattern) == Seq("/z"))
    // decision semantics over a frame
    val paths = Seq("/a/x", "/a/b/x", "/c/qqd", "/c/q", "/e", "/ee", "/other")
      .toDF("p")
    val out = paths.select(col("p"), Robots.allowCol(col("p"), rules).as("ok"))
      .as[(String, Boolean)].collect().toMap
    assert(!out("/a/x"), "prefix disallow")
    assert(out("/a/b/x"), "longer Allow beats shorter Disallow")
    assert(!out("/c/qqd"), "wildcard matches")
    assert(out("/c/q"), "wildcard needs the literal tail")
    assert(!out("/e"), "anchored match")
    assert(out("/ee"), "anchor must not prefix-match")
    assert(out("/other"), "no rule matches: allowed")
    // urlPath: path+query, fragments and authority-only forms
    val urls = Seq("https://h.org/p?q=1#frag", "https://h.org", "https://h.org/x")
      .toDF("u").select(Robots.urlPath(col("u"))).as[String].collect().toSeq
    assert(urls == Seq("/p?q=1", "/", "/x"))
  }

  test("blocksKernel (r18): per-block anchor accounting, join reproduces extractKernel") {
    import graft.plans.HtmlText
    def blocks(html: String): Seq[(String, Long)] = {
      val a = HtmlText.blocksKernel(UTF8String.fromString(html))
      (0 until a.numElements()).map { i =>
        val r = a.getStruct(i, 2)
        (r.getUTF8String(0).toString, r.getLong(1))
      }
    }
    val html = """<body>
      <p><a href="/h">Home</a> <a href="/a">About</a></p>
      <p>real prose text with a <a href="/ref">source link</a> inside</p>
      <p>no links at all here</p>
    </body>"""
    val b = blocks(html)
    assert(b.map(_._1) == Seq("Home About",
      "real prose text with a source link inside", "no links at all here"))
    // nav: every codepoint (the separating space included) is anchor
    assert(b(0)._2 == 10L && b(0)._1.length == 10)
    // prose: 'source link' (11) + the flushed space before it (1) = 12
    assert(b(1)._2 == 12L)
    assert(b(2)._2 == 0L)
    // joining block texts with \n must equal the flat extraction
    for (h <- Seq(html,
      "<body><!-- x --><p>a &amp; b</p><script>var x = '<p>g</p>';</script><div>c</div></body>",
      "<p>no body tag</p><p>two</p>")) {
      val joined = blocks(h).map(_._1).mkString("\n")
      assert(joined == x(h), s"block join must reproduce extractKernel on $h")
    }
    // anchor state clears at block boundaries (an unclosed <a> cannot
    // bleed into the next block's accounting forever — degrade honestly:
    // the open anchor taints only until its closer or EOF)
    assert(blocks("<body><p><a href='/x'>open").head == (("open", 4L)))
  }

  test("robots Crawl-delay: group-matched, agent group shadows *, junk values drop") {
    import graft.operators.Robots
    val txt = "User-agent: graftbot\nCrawl-delay: 7\nDisallow: /x\n\n" +
      "User-agent: *\nCrawl-delay: 2\n"
    // product-token match picks the agent's own group
    assert(Robots.parseCrawlDelay(txt, "GraftBot/1.2").contains(7L))
    // a stranger falls back to the * group
    assert(Robots.parseCrawlDelay(txt, "otherbot").contains(2L))
    // an own group WITHOUT a delay falls back (the parseRules stance)
    val noOwn = "User-agent: graftbot\nDisallow: /x\n\nUser-agent: *\nCrawl-delay: 3\n"
    assert(Robots.parseCrawlDelay(noOwn, "graftbot").contains(3L))
    // junk and negative values drop; absence everywhere is None
    assert(Robots.parseCrawlDelay("User-agent: *\nCrawl-delay: fast\n", "b").isEmpty)
    assert(Robots.parseCrawlDelay("User-agent: *\nCrawl-delay: -4\n", "b").isEmpty)
    assert(Robots.parseCrawlDelay("User-agent: *\nDisallow: /\n", "b").isEmpty)
    // comments strip; first parseable value wins
    assert(Robots.parseCrawlDelay(
      "User-agent: *\nCrawl-delay: 5 # seconds\nCrawl-delay: 9\n", "b")
      .contains(5L))
  }

  test("robots RFC nits (r18): product-token agent match, octet-length rule order, sitemap lines") {
    import graft.operators.Robots
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val txt = "User-agent: graftbot\nDisallow: /private/\n\n" +
      "User-agent: *\nDisallow: /\n" +
      "Sitemap: https://h.org/sitemap_index.xml\n" +
      "Sitemap: https://h.org/sitemap-news.xml # daily\n"
    // a crawler identifying as graftbot/1.2 obeys the graftbot group
    // (RFC 9309 §2.2.1 product-token match), not the * group
    assert(Robots.parseRules(txt, "GraftBot/1.2").map(_.pattern) == Seq("/private/"))
    assert(Robots.parseRules(txt, "graftbot").map(_.pattern) == Seq("/private/"))
    assert(Robots.parseRules(txt, "otherbot/2.0").map(_.pattern) == Seq("/"))
    // sitemap discovery channel: Sitemap lines come back in file order
    assert(Robots.parseSitemaps(txt) == Seq("https://h.org/sitemap_index.xml",
      "https://h.org/sitemap-news.xml"))
    // specificity counts OCTETS (§2.2.2), not UTF-16 chars. The
    // divergence pin: Disallow '/éé' (3 chars / 5 UTF-8 octets) vs
    // Allow '/*d' (3 chars / 3 octets) on path '/ééd', which matches
    // both. Octet ordering puts the Disallow first → disallowed;
    // char ordering would TIE at 3 and let Allow win ties → allowed.
    val div = Seq(Robots.Rule("/*d", true), Robots.Rule("/éé", false))
    val okDiv = Seq("/ééd").toDF("p")
      .select(Robots.allowCol(col("p"), div).as("ok")).as[Boolean].head()
    assert(!okDiv,
      "5-octet Disallow must outrank the 3-octet Allow (char-length ties would flip this)")
    // same divergence through the data-driven many-host gate (url7b path)
    val rulesDf = Seq(("h.org", "/*d", true), ("h.org", "/éé", false))
      .toDF("host", "pattern", "allow")
    val gated = Robots.gateFrontier(
      Seq("https://h.org/ééd").toDF("url"), col("url"), rulesDf)
      .select(col("allowed")).as[Boolean].head()
    assert(!gated, "gateFrontier must rank by octet_length too")
  }

  test("fixture round trip: encodeBlocks pages extract back to the closed form") {
    for (id <- 0L to 9L) {
      val text = "alpha beta gamma delta epsilon zeta eta theta"
      val (b1, b2) = graft.sources.WarcSource.encodeBlocks(id, text)
      val html = s"<!DOCTYPE html>\n<html><head><title>t</title>" +
        "<script>var d = \"</p>\";</script></head>" +
        s"<body><!-- c --><div><p> $b1 </p>\n<p>$b2</p></div></body></html>"
      val toks = text.split(" ")
      val f1 = (id % 5) match {
        case 0 => "\"" + toks(0) + "\""
        case 1 => "<" + toks(0) + ">"
        case 2 => toks(0) + "é"
        case _ => toks(0)
      }
      val expect = (f1 +: toks.slice(1, 4)).mkString(" ") + "\n" +
        toks.slice(4, 8).mkString(" ")
      assert(x(html) == expect, s"id=$id")
    }
  }
}
