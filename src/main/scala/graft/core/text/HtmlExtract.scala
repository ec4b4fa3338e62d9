package graft.core.text

import scala.collection.mutable.ArrayBuffer

/**
 * Real HTML -> text extraction for web-crawl pipelines (the CCNet /
 * RefinedWeb "WARC payload -> document text" stage that precedes every
 * quality/dedup operator). A single-pass, allocation-light tokenizer —
 * deterministic, locale-free, resilient to the usual crawl hostility —
 * with the fixed extraction SPEC below (a contract the DuckDB gate and
 * the unit specs both state independently):
 *
 *  - `<script> <style> <noscript> <template>` subtrees are dropped
 *    wholesale (raw-text elements: content scanned only for the matching
 *    case-insensitive close tag, so `if (1 < 2)` or quoted `"</div>"`
 *    inside never leaks); `<title>` is captured for [[title]] but never
 *    part of [[text]].
 *  - `<!-- comments -->`, `<!DOCTYPE>`, `<? pi ?>` are dropped; an
 *    unterminated comment drops the remainder (fail-closed — crawl
 *    truncation must not leak markup into the corpus).
 *  - Tag attributes may contain `>` inside quoted values; a `<` not
 *    followed by a letter, `/`, `!` or `?` is literal text.
 *  - Character references: the HTML core named set (amp lt gt quot apos
 *    nbsp) and numeric `&#NN;` / `&#xHH;` forms (terminating `;`
 *    required) decode; anything else stays literal.
 *  - Block-level open OR close tags (p, div, br, li, h1..h6, tr, td, th,
 *    table, ul, ol, dl, dt, dd, blockquote, pre, hr, section, article,
 *    header, footer, nav, aside, main, form, figure, figcaption,
 *    fieldset, address) emit a line break; inline tags (a, b, i, span,
 *    em, strong, code, ...) emit nothing — `a<b>b</b>c` reads "abc".
 *  - Whitespace: runs of space/tab/CR/LF/NBSP collapse to one space
 *    inside a line (the HTML rendering rule; NBSP normalizes to plain
 *    space like mainstream extractors); lines are trimmed; empty lines
 *    drop; the result joins lines with `\n`. (`<pre>` content is
 *    collapsed too — a documented simplification.)
 *
 * [[links]] returns every `<a href>` value (entity-decoded, raw —
 * resolution against a base URL is the caller's join).
 */
object HtmlExtract {

  private val BlockTags: Set[String] = Set(
    "p", "div", "br", "li", "h1", "h2", "h3", "h4", "h5", "h6", "tr", "td",
    "th", "table", "ul", "ol", "dl", "dt", "dd", "blockquote", "pre", "hr",
    "section", "article", "header", "footer", "nav", "aside", "main",
    "form", "figure", "figcaption", "fieldset", "address")

  /** Raw-text elements whose content is never document text. `title` is
    * handled separately (captured, not emitted). */
  private val DropRaw: Set[String] = Set("script", "style", "noscript", "template")

  /** Extracted document text per the spec above; "" for null/empty input. */
  def text(html: String): String = {
    val out = new Parse(html, wantTitle = false, wantLinks = false)
    out.run()
    out.textResult
  }

  /** First `<title>` content (entity-decoded, whitespace-collapsed,
    * trimmed); null when the document has none. */
  def title(html: String): String = {
    val out = new Parse(html, wantTitle = true, wantLinks = false)
    out.run()
    out.titleResult
  }

  /** Every `<a href>` attribute value in document order, entity-decoded. */
  def links(html: String): Array[String] = {
    val out = new Parse(html, wantTitle = false, wantLinks = true)
    out.run()
    out.linksResult
  }

  /** Every `<a href>` with its anchor text, in document order: (href,
    * text) where href is entity-decoded and text is the link's rendered
    * content under the same spec as [[text]] (inline tags vanish, block
    * breaks become one space, raw-text subtrees drop, whitespace
    * collapses) — possibly "" for image/icon links. A new `<a>` open tag
    * implicitly closes an unclosed one (the browser rule); an anchor
    * still open at EOF is emitted with the text captured so far. */
  def anchors(html: String): Array[(String, String)] = {
    val out = new Parse(html, wantTitle = false, wantLinks = false,
      wantAnchors = true)
    out.run()
    out.anchorsResult
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\u000b' ||
      c == '\f' || c == '\u00a0' // NBSP normalizes to plain space

  private def isNameStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def isNameChar(c: Char): Boolean =
    isNameStart(c) || (c >= '0' && c <= '9') || c == '-'

  /** One parse over the input; the three public entry points share it so
    * the spec cannot drift between text/title/links. */
  private final class Parse(h: String, wantTitle: Boolean, wantLinks: Boolean,
                            wantAnchors: Boolean = false) {
    private val n = if (h == null) 0 else h.length
    private val lines = new ArrayBuffer[String]()
    private val line = new java.lang.StringBuilder(64)
    private var pendingSpace = false
    private var titleBuf: String = null
    private val linkBuf = new ArrayBuffer[String]()
    // anchor capture: non-null href marks an open `<a href>` whose
    // rendered text is mirrored into aText with the same collapse rule
    private var anchorHref: String = null
    private val aText = new java.lang.StringBuilder(32)
    private var aPending = false
    private val anchorBuf = new ArrayBuffer[(String, String)]()

    def textResult: String = lines.mkString("\n")
    def titleResult: String = titleBuf
    def linksResult: Array[String] = linkBuf.toArray
    def anchorsResult: Array[(String, String)] = anchorBuf.toArray

    def run(): Unit = {
      var i = 0
      while (i < n) {
        val c = h.charAt(i)
        if (c == '<') {
          if (h.startsWith("<!--", i)) {
            val e = h.indexOf("-->", i + 4)
            i = if (e < 0) n else e + 3 // unterminated: drop the remainder
          } else if (h.startsWith("<![CDATA[", i)) {
            val e = h.indexOf("]]>", i + 9)
            val end = if (e < 0) n else e
            emitText(h, i + 9, end, decode = false) // CDATA is literal text
            i = if (e < 0) n else e + 3
          } else if (i + 1 < n && (h.charAt(i + 1) == '!' || h.charAt(i + 1) == '?')) {
            val e = h.indexOf('>', i + 2) // doctype / processing instruction
            i = if (e < 0) n else e + 1
          } else if (i + 1 < n &&
              (isNameStart(h.charAt(i + 1)) || h.charAt(i + 1) == '/')) {
            i = tag(i)
          } else {
            append(c); i += 1 // bare '<' in text (e.g. "a < b")
          }
        } else {
          val e = { var j = i; while (j < n && h.charAt(j) != '<') j += 1; j }
          emitText(h, i, e, decode = true)
          i = e
        }
      }
      flushLine()
      finishAnchor() // unclosed `<a>` at EOF still emits
    }

    /** Parse a tag starting at `<`; returns the index after its `>`. */
    private def tag(start: Int): Int = {
      var i = start + 1
      val closing = h.charAt(i) == '/'
      if (closing) i += 1
      val ns = i
      while (i < n && isNameChar(h.charAt(i))) i += 1
      val name = h.substring(ns, i).toLowerCase(java.util.Locale.ROOT)
      // scan to the closing '>' honoring quoted attribute values
      val attrStart = i
      var q = 0.toChar
      while (i < n && (q != 0 || h.charAt(i) != '>')) {
        val c = h.charAt(i)
        if (q != 0) { if (c == q) q = 0 }
        else if (c == '"' || c == '\'') q = c
        i += 1
      }
      val attrEnd = i
      val after = if (i < n) i + 1 else n // past '>' (or EOF on truncation)
      if (name.isEmpty) { // "</>" or "< />": not a tag name — drop it
        return after
      }
      if (BlockTags.contains(name)) break()
      if (wantAnchors && name == "a") {
        finishAnchor() // close tag, or open tag implicitly closing one
        if (!closing) {
          val href = attr(attrStart, attrEnd, "href")
          if (href != null) anchorHref = decodeEntities(href)
        }
      }
      if (!closing) {
        if (wantLinks && name == "a") {
          val href = attr(attrStart, attrEnd, "href")
          if (href != null) linkBuf += decodeEntities(href)
        }
        if (DropRaw.contains(name) || name == "title") {
          // raw-text element: content runs to the matching close tag,
          // case-insensitive; unterminated -> drops the remainder
          val close = "</" + name
          val e = indexOfIgnoreCase(close, after)
          val bodyEnd = if (e < 0) n else e
          if (wantTitle && name == "title" && titleBuf == null)
            titleBuf = collapse(decodeEntities(h.substring(after, bodyEnd)))
          if (e < 0) return n
          val gt = h.indexOf('>', e)
          return if (gt < 0) n else gt + 1
        }
      }
      after
    }

    /** attrName="value" | attrName='value' | attrName=bare within
      * [from, to); null when absent. Case-insensitive name. */
    private def attr(from: Int, to: Int, attrName: String): String = {
      var i = from
      while (i < to) {
        while (i < to && (isWs(h.charAt(i)) || h.charAt(i) == '/')) i += 1
        val ns = i
        while (i < to && h.charAt(i) != '=' && h.charAt(i) != '>' &&
          !isWs(h.charAt(i))) i += 1
        val name = h.substring(ns, i).toLowerCase(java.util.Locale.ROOT)
        while (i < to && isWs(h.charAt(i))) i += 1
        if (i < to && h.charAt(i) == '=') {
          i += 1
          while (i < to && isWs(h.charAt(i))) i += 1
          if (i < to && (h.charAt(i) == '"' || h.charAt(i) == '\'')) {
            val q = h.charAt(i); i += 1
            val vs = i
            while (i < to && h.charAt(i) != q) i += 1
            if (name == attrName) return h.substring(vs, i)
            i += 1
          } else {
            val vs = i
            while (i < to && !isWs(h.charAt(i))) i += 1
            if (name == attrName) return h.substring(vs, i)
          }
        } else if (name.isEmpty) {
          i += 1 // stray char (e.g. '='): skip to avoid a stall
        }
      }
      null
    }

    private def indexOfIgnoreCase(needle: String, from: Int): Int = {
      val m = needle.length
      var i = from
      while (i + m <= n) {
        var j = 0
        while (j < m && Character.toLowerCase(h.charAt(i + j)) == needle.charAt(j)) j += 1
        if (j == m) return i
        i += 1
      }
      -1
    }

    // -------- text assembly: collapse-in-line, break-at-blocks --------

    private def append(c: Char): Unit = {
      if (isWs(c)) { if (line.length() > 0) pendingSpace = true }
      else {
        if (pendingSpace) { line.append(' '); pendingSpace = false }
        line.append(c)
      }
      if (anchorHref != null) { // mirror with the same collapse rule
        if (isWs(c)) { if (aText.length() > 0) aPending = true }
        else {
          if (aPending) { aText.append(' '); aPending = false }
          aText.append(c)
        }
      }
    }

    private def finishAnchor(): Unit = {
      if (anchorHref != null) {
        anchorBuf += ((anchorHref, aText.toString))
        anchorHref = null
        aText.setLength(0)
        aPending = false
      }
    }

    private def emitText(s: String, from: Int, to: Int, decode: Boolean): Unit = {
      var i = from
      while (i < to) {
        val c = s.charAt(i)
        if (decode && c == '&') {
          val (cp, next) = entity(s, i, to)
          if (next > i) {
            if (Character.isSupplementaryCodePoint(cp)) {
              append(Character.highSurrogate(cp)); append(Character.lowSurrogate(cp))
            } else append(cp.toChar)
            i = next
          } else { append(c); i += 1 }
        } else { append(c); i += 1 }
      }
    }

    /** Decode one character reference at s(i)=='&'; returns (codepoint,
      * indexAfter) or (_, i) when it is not a well-formed reference. */
    private def entity(s: String, i: Int, to: Int): (Int, Int) = {
      val semi = {
        var j = i + 1; val lim = math.min(to, i + 12)
        while (j < lim && s.charAt(j) != ';') j += 1
        if (j < lim && s.charAt(j) == ';') j else -1
      }
      if (semi < 0) return (0, i)
      val body = s.substring(i + 1, semi)
      val cp: Int = body match {
        case "amp" => '&'; case "lt" => '<'; case "gt" => '>'
        case "quot" => '"'; case "apos" => '\''; case "nbsp" => ' '
        case _ if body.length > 1 && body.charAt(0) == '#' =>
          try {
            val v = if (body.charAt(1) == 'x' || body.charAt(1) == 'X')
              Integer.parseInt(body.substring(2), 16)
            else Integer.parseInt(body.substring(1))
            if (v > 0 && v <= 0x10ffff) v else -1
          } catch { case _: NumberFormatException => -1 }
        case _ => -1
      }
      if (cp < 0) (0, i) else (cp, semi + 1)
    }

    private def decodeEntities(s: String): String = {
      if (s.indexOf('&') < 0) return s
      val b = new java.lang.StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '&') {
          val (cp, next) = entity(s, i, s.length)
          if (next > i) { b.appendCodePoint(cp); i = next }
          else { b.append(c); i += 1 }
        } else { b.append(c); i += 1 }
      }
      b.toString
    }

    private def collapse(s: String): String = {
      val b = new java.lang.StringBuilder(s.length)
      var sp = false
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (isWs(c)) { if (b.length() > 0) sp = true }
        else { if (sp) { b.append(' '); sp = false }; b.append(c) }
        i += 1
      }
      b.toString
    }

    private def break(): Unit = {
      flushLine()
      if (anchorHref != null && aText.length() > 0) aPending = true
    }

    private def flushLine(): Unit = {
      pendingSpace = false
      if (line.length() > 0) {
        lines += line.toString
        line.setLength(0)
      }
    }
  }
}
