package graft.core.net

/**
 * Domain-name normalization + escape decoding with the reference's exact
 * semantics (/root/reference/internal/domain_name.go:14-43,
 * /root/reference/internal/csv.go:129-194, constants.go:11,23).
 */
object DomainUtil {

  /** TLD validity: >=2 chars, starts with a letter, no trailing hyphen. */
  private val TldRegex = java.util.regex.Pattern.compile("^[a-z][a-z0-9-]*[a-z0-9]$")

  /**
   * Normalize: lowercase, strip one trailing dot, keep last `numLabels`
   * labels; the last label must match the TLD regex. Returns:
   *  - "."  for empty input or "." (root; excluded from per-domain stats but
   *    counted in global totals by the caller)
   *  - null for invalid domains (too few labels / bad TLD)
   */
  def normalize(name0: String, numLabels: Int): String = {
    if (name0 == null) return null
    if (name0.isEmpty || name0 == ".") return "."
    var name = name0.toLowerCase(java.util.Locale.ROOT)
    if (name.charAt(name.length - 1) == '.') name = name.substring(0, name.length - 1)
    // split on '.', preserving empty labels (Go strings.Split semantics)
    val labels = splitKeepEmpty(name, '.')
    val idx = labels.length - numLabels
    if (idx < 0) return null
    val tld = labels(labels.length - 1)
    if (!TldRegex.matcher(tld).matches()) return null
    if (numLabels == 1) tld
    else labels.slice(idx, labels.length).mkString(".")
  }

  private def splitKeepEmpty(s: String, sep: Char): Array[String] = {
    var count = 1
    var i = 0
    while (i < s.length) { if (s.charAt(i) == sep) count += 1; i += 1 }
    val out = new Array[String](count)
    var start = 0
    var k = 0
    i = 0
    while (i < s.length) {
      if (s.charAt(i) == sep) { out(k) = s.substring(start, i); k += 1; start = i + 1 }
      i += 1
    }
    out(k) = s.substring(start)
    out
  }

  /**
   * Decode backslash escapes: octal `\DDD` (1-3 digits) and hex `\xHH`
   * (lowercase x, 1-2 lowercase hex digits). Reference quirks replicated:
   *  - values above 127 are REJECTED (the Go code parses into int8), falling
   *    back to literal emission of the char after the backslash;
   *  - a trailing lone backslash is emitted literally;
   *  - operates on bytes (output may be non-ASCII; such domains then fail
   *    the TLD regex downstream, which is the intended path).
   */
  def unescape(s: String): String = {
    if (s == null || s.indexOf('\\') < 0) return s
    val in = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = new java.io.ByteArrayOutputStream(in.length)
    var i = 0
    val n = in.length
    while (i < n) {
      if (in(i) != '\\') { out.write(in(i)); i += 1 }
      else if (i + 1 >= n) { out.write('\\'); i += 1 }
      else {
        val j = i + 1
        if (in(j) == 'x') {
          var hexEnd = j + 1
          while (hexEnd < n && hexEnd < j + 3 && isLowerHex(in(hexEnd))) hexEnd += 1
          var v = -1
          if (hexEnd > j + 1) v = Integer.parseInt(new String(in, j + 1, hexEnd - j - 1, "ISO-8859-1"), 16)
          if (v >= 0 && v <= 127) { out.write(v); i = hexEnd }
          else { out.write('x'); i += 2 } // emit 'x' literally, keep digits as-is
        } else {
          var octEnd = j
          while (octEnd < n && octEnd < j + 3 && in(octEnd) >= '0' && in(octEnd) <= '7') octEnd += 1
          var v = -1
          if (octEnd > j) v = Integer.parseInt(new String(in, j, octEnd - j, "ISO-8859-1"), 8)
          if (v >= 0 && v <= 127) { out.write(v); i = octEnd }
          else { out.write(in(j)); i += 2 } // no valid escape: next char literal
        }
      }
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  @inline private def isLowerHex(b: Byte): Boolean =
    (b >= '0' && b <= '9') || (b >= 'a' && b <= 'f')

  /**
   * Zero-copy hostname extraction over a UTF8String payload (the per-row
   * hot path of the sketch-build pipeline): scans bytes in place, and
   * returns a substring view when the host is already lowercase (the
   * overwhelmingly common case), only materializing a new string when a
   * character actually needs lowering. ASCII-delimiter scanning is UTF-8
   * safe (multi-byte sequences never contain ASCII bytes).
   */
  def hostOfUrlUTF8(url: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    if (url == null) return null
    val n = url.numBytes
    val base = url.getBaseObject
    val off = url.getBaseOffset
    @inline def b(i: Int): Byte = org.apache.spark.unsafe.Platform.getByte(base, off + i)
    // find "://"
    var i = 0
    var schemeEnd = -1
    while (i + 2 < n && schemeEnd < 0) {
      if (b(i) == ':' && b(i + 1) == '/' && b(i + 2) == '/') schemeEnd = i
      else i += 1
    }
    if (schemeEnd < 0) return null
    val start = schemeEnd + 3
    var end = n
    var seenAt = -1
    i = start
    var done = false
    while (i < end && !done) {
      val c = b(i)
      if (c == '/' || c == '?' || c == '#') { end = i; done = true }
      else { if (c == '@') seenAt = i; i += 1 }
    }
    var hs = if (seenAt >= 0 && seenAt < end) seenAt + 1 else start
    var he = end
    if (hs < n && b(hs) == '[') { // IPv6 literal
      var close = hs + 1
      while (close < end && b(close) != ']') close += 1
      if (close >= end) return null
      hs += 1; he = close
    } else { // strip :port
      var colon = -1
      i = hs
      while (i < he) { if (b(i) == ':') colon = i; i += 1 }
      if (colon >= 0) he = colon
    }
    if (he <= hs) return null
    var needsLower = false
    i = hs
    while (i < he && !needsLower) {
      val c = b(i)
      if (c >= 'A' && c <= 'Z') needsLower = true
      i += 1
    }
    // copy just the host bytes (UTF8String.substring takes CHARACTER
    // indices, not byte offsets — using it here mis-sliced multi-byte
    // urls; a ~20-byte host copy is still far cheaper than String-ifying
    // the whole url)
    val hostBytes = new Array[Byte](he - hs)
    org.apache.spark.unsafe.Platform.copyMemory(
      base, off + hs, hostBytes,
      org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET.toLong, (he - hs).toLong)
    val sub = org.apache.spark.unsafe.types.UTF8String.fromBytes(hostBytes)
    if (needsLower) sub.toLowerCase else sub
  }

  /** Hostname of a URL (scheme://host[:port]/...), lowercased; null if no
    * authority component. The generalized pipeline's analogue of the
    * reference's domain key. */
  def hostOfUrl(url: String): String = {
    if (url == null) return null
    val schemeIdx = url.indexOf("://")
    val start = if (schemeIdx >= 0) schemeIdx + 3 else return null
    var end = url.length
    var i = start
    var seenAt = -1
    while (i < end) {
      val c = url.charAt(i)
      if (c == '/' || c == '?' || c == '#') { end = i }
      else {
        if (c == '@') seenAt = i
        i += 1
      }
    }
    val hostPort = url.substring(if (seenAt >= 0 && seenAt < end) seenAt + 1 else start, end)
    // strip :port (but not IPv6 literals in brackets)
    val host =
      if (hostPort.startsWith("[")) {
        val close = hostPort.indexOf(']')
        if (close < 0) return null
        hostPort.substring(1, close)
      } else {
        val colon = hostPort.lastIndexOf(':')
        if (colon >= 0) hostPort.substring(0, colon) else hostPort
      }
    if (host.isEmpty) null else host.toLowerCase(java.util.Locale.ROOT)
  }
}
