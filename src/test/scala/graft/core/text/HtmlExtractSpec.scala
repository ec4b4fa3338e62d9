package graft.core.text

import org.scalatest.funsuite.AnyFunSuite

/** Hostile-input spec for the real HTML extractor — each case states the
  * extraction SPEC (HtmlExtract scaladoc) independently of the code. */
class HtmlExtractSpec extends AnyFunSuite {

  test("basic structure: blocks break lines, inline tags vanish, head is not text") {
    val h = """<!DOCTYPE html><html><head><title>My Title</title>
      |<style>p { color: red; }</style></head>
      |<body><h1>Header</h1><p>one <b>two</b> three</p>
      |<ul><li>alpha</li><li>beta</li></ul></body></html>""".stripMargin
    assert(HtmlExtract.text(h) === "Header\none two three\nalpha\nbeta")
    assert(HtmlExtract.title(h) === "My Title")
  }

  test("script/style content never leaks, including angle brackets and fake close tags") {
    val h = "<p>a</p><script>if (1 < 2) { document.write(\"</div><p>junk</p>\"); }" +
      "</script><p>b</p><STYLE>body > div { x: 1 }</STYLE><p>c</p>"
    // "</div>" inside the quoted string closes nothing — the scan (like a
    // browser's script-data state) looks only for the literal "</script"
    // prefix, so everything up to it drops
    assert(HtmlExtract.text(h) === "a\nb\nc")
  }

  test("entities: named core set, numeric dec/hex, malformed stay literal") {
    assert(HtmlExtract.text("<p>a &amp; b &lt;tag&gt; &quot;q&quot; &apos;s&apos;</p>")
      === "a & b <tag> \"q\" 's'")
    assert(HtmlExtract.text("<p>&#65;&#x42;&#x1F600;</p>") === "AB😀")
    assert(HtmlExtract.text("<p>fish &chips; &amp tea &#xZZ; &#0; & done</p>")
      === "fish &chips; &amp tea &#xZZ; &#0; & done")
    // NBSP decodes then normalizes to a plain space
    assert(HtmlExtract.text("<p>tail&nbsp;line</p>") === "tail line")
  }

  test("attributes with '>' in quoted values do not end the tag") {
    assert(HtmlExtract.text("""<p data-x="a > b" title='1 > 0'>ok</p>""") === "ok")
    assert(HtmlExtract.text("""<img alt="x>y"/>text""") === "text")
  }

  test("bare '<' is literal text; malformed tags don't stall") {
    assert(HtmlExtract.text("<p>a < b and 1<2 or x </p>") === "a < b and 1<2 or x")
    assert(HtmlExtract.text("a </> b < /p> c") === "a b < /p> c")
    assert(HtmlExtract.text("truncated <p attr=\"unclosed") === "truncated")
  }

  test("comments and CDATA") {
    assert(HtmlExtract.text("<p>a</p><!-- <p>hidden</p> --><p>b</p>") === "a\nb")
    // unterminated comment drops the remainder (fail-closed on truncation)
    assert(HtmlExtract.text("<p>a</p><!-- oops <p>b</p>") === "a")
    assert(HtmlExtract.text("<p><![CDATA[x < y & z]]></p>") === "x < y & z")
  }

  test("whitespace collapses within lines; blank lines drop") {
    val h = "<p>  lots\t\tof\n\n  space  </p>\n\n<p> </p><p>next</p>"
    assert(HtmlExtract.text(h) === "lots of space\nnext")
  }

  test("title: first wins, entity-decoded, absent -> null") {
    val h = "<title>A &amp;  B</title><title>second</title>"
    assert(HtmlExtract.title(h) === "A & B")
    assert(HtmlExtract.title("<p>no title</p>") === null)
    // title content is never document text
    assert(HtmlExtract.text(h) === "")
  }

  test("links: hrefs in order, quoted/bare/entity forms, non-anchors ignored") {
    val h = """<a href="https://x.example/a?p=1&amp;q=2">one</a>
      |<a class=c href='/rel'>two</a><a href=bare>three</a>
      |<link href="/style.css"/><a name="no-href">four</a>""".stripMargin
    assert(HtmlExtract.links(h).toSeq ===
      Seq("https://x.example/a?p=1&q=2", "/rel", "bare"))
    // anchors are inline: text flows through them
    assert(HtmlExtract.text("<p>go <a href='/x'>here</a> now</p>") === "go here now")
  }

  test("raw-text close tag matching is case-insensitive and prefix-safe") {
    assert(HtmlExtract.text("<script>x</SCRIPT><p>ok</p>") === "ok")
    // "</scripting>" must not close <script>? The spec scans for the
    // literal "</script" prefix, so it DOES close there — same as HTML5
    // parsing, where "</scripting" also terminates script data. Pin it:
    assert(HtmlExtract.text("<script>a</scriptx>b</script><p>c</p>") === "b\nc")
    // unterminated raw-text element drops the remainder
    assert(HtmlExtract.text("<p>a</p><script>var x = 1; <p>b</p>") === "a")
  }

  test("null/empty and text-only inputs") {
    assert(HtmlExtract.text(null) === "")
    assert(HtmlExtract.text("") === "")
    assert(HtmlExtract.text("just plain text") === "just plain text")
    assert(HtmlExtract.title(null) === null)
    assert(HtmlExtract.links(null).length === 0)
    assert(HtmlExtract.anchors(null).length === 0)
  }

  test("anchors: text under the extraction spec — inline vanish, blocks space, collapse") {
    val a = HtmlExtract.anchors(
      "<a href=\"/x\"> Visit  <b>our</b>\n site </a>" +
      "<a href='/y'><img src=i.png></a>" + // image link: empty text
      "<a href=\"/z\">over<p>two</p>blocks</a>")
    assert(a.toSeq === Seq(("/x", "Visit our site"), ("/y", ""),
      ("/z", "over two blocks")))
  }

  test("anchors: entity-decoded href + text; script subtree never leaks in") {
    val a = HtmlExtract.anchors(
      "<a href=\"/p?a=1&amp;b=2\">A &amp; B<script>var x='</div>';</script>!</a>")
    assert(a.toSeq === Seq(("/p?a=1&b=2", "A & B!")))
  }

  test("anchors: nested <a> auto-closes, href-less <a> ignored, EOF-open emits") {
    assert(HtmlExtract.anchors(
      "<a href=\"/1\">one <a href=\"/2\">two</a>").toSeq ===
      Seq(("/1", "one"), ("/2", "two"))) // second open closes the first; EOF closes the second
    assert(HtmlExtract.anchors("<a name=\"top\">not a link</a>").length === 0)
    // an href-less <a> open still closes a pending anchor (browser rule)
    assert(HtmlExtract.anchors("<a href=\"/1\">one<a name=x>rest").toSeq ===
      Seq(("/1", "one")))
  }

  test("anchors agree with links on hrefs, in order") {
    val html = "<a href=\"/1\">x</a><p><a href='/2'>y</a><a href=/3>z</a>"
    assert(HtmlExtract.anchors(html).map(_._1).toSeq ===
      HtmlExtract.links(html).toSeq)
  }
}
