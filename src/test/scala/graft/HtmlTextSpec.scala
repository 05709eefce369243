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
