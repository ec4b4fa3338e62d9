package graft.core.text

/**
 * Deterministic, byte-stable page-text wrap/extract pair — the per-row
 * invariant of the pipeline (BASELINE.json input_hint: "byte-identical
 * extracted text per url"). `extract(wrap(t)) == t` for any byte sequence:
 * pure byte-level scanning for the body markers, no charset decoding, no
 * locale, no time dependence, so the result is identical across partitions,
 * task retries, and parallelism levels.
 *
 * Real Common-Crawl HTML would go through a full parser here; in this
 * offline environment the generator emits exactly this shape, and the
 * extractor is additionally robust to leading/trailing junk around the
 * body markers.
 */
object HtmlText {
  private val Open = "<body>".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private val Close = "</body>".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private val Prefix = "<html><head><meta charset=\"utf-8\"/></head>".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private val Suffix = "</html>".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  def wrap(text: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](Prefix.length + Open.length + text.length + Close.length + Suffix.length)
    var o = 0
    System.arraycopy(Prefix, 0, out, o, Prefix.length); o += Prefix.length
    System.arraycopy(Open, 0, out, o, Open.length); o += Open.length
    System.arraycopy(text, 0, out, o, text.length); o += text.length
    System.arraycopy(Close, 0, out, o, Close.length); o += Close.length
    System.arraycopy(Suffix, 0, out, o, Suffix.length)
    out
  }

  /** Bytes between the first `<body>` and the last `</body>`; null when the
    * markers are absent or inverted. */
  def extract(html: Array[Byte]): Array[Byte] = {
    if (html == null) return null
    val start = indexOf(html, Open, 0)
    if (start < 0) return null
    val from = start + Open.length
    val end = lastIndexOf(html, Close)
    if (end < from) return null
    java.util.Arrays.copyOfRange(html, from, end)
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte], fromIdx: Int): Int = {
    val n = hay.length - needle.length
    var i = fromIdx
    while (i <= n) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  private def lastIndexOf(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = hay.length - needle.length
    while (i >= 0) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i -= 1
    }
    -1
  }
}
