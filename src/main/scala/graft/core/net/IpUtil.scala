package graft.core.net

/**
 * IP parsing + truncation with the reference's exact semantics
 * (/root/reference/internal/ip_address.go:26-52, constants.go:17-20):
 *
 *  - textual IPv4 (`a.b.c.d`)  -> truncate to /24 -> canonical 16-byte
 *    IPv4-mapped IPv6 form `::ffff:a.b.c.0`
 *  - textual IPv6 (contains ':') -> truncate to /48 -> 16-byte form
 *  - QUIRK (load-bearing, pinned by the reference's collector_test.go:142-147):
 *    a v4-mapped-v6 INPUT string (`::ffff:a.b.c.d`) takes the v6 branch, so
 *    /48 truncation collapses it to `::` — all such clients merge into one.
 *
 * Parsing is strict like Go's netip.ParseAddr for the shapes that appear in
 * data (no DNS resolution — java.net.InetAddress is deliberately avoided).
 * Returns null on invalid input (maps to SQL NULL in the Spark expression).
 */
object IpUtil {

  /** Parse and truncate; 16-byte canonical result, or null if invalid. */
  def truncate(s: String): Array[Byte] = {
    if (s == null || s.isEmpty) return null
    if (s.indexOf(':') >= 0) truncateV6(s) else truncateV4(s)
  }

  private def truncateV4(s: String): Array[Byte] = {
    val parts = parseV4(s)
    if (parts == null) return null
    val out = new Array[Byte](16)
    out(10) = 0xff.toByte
    out(11) = 0xff.toByte
    out(12) = parts(0)
    out(13) = parts(1)
    out(14) = parts(2)
    // /24: last octet zeroed
    out
  }

  /** Dotted-quad parser, strict: 4 decimal octets 0-255, no leading '+', no
    * empty fields; leading zeros rejected (Go netip rejects "01.2.3.4"). */
  private def parseV4(s: String): Array[Byte] = {
    val out = new Array[Byte](4)
    var i = 0
    var field = 0
    val n = s.length
    while (field < 4) {
      var v = 0
      var digits = 0
      val start = i
      while (i < n && s.charAt(i) >= '0' && s.charAt(i) <= '9') {
        v = v * 10 + (s.charAt(i) - '0')
        digits += 1
        if (v > 255 || digits > 3) return null
        i += 1
      }
      if (digits == 0) return null
      if (digits > 1 && s.charAt(start) == '0') return null
      out(field) = v.toByte
      field += 1
      if (field < 4) {
        if (i >= n || s.charAt(i) != '.') return null
        i += 1
      }
    }
    if (i != n) return null
    out
  }

  /** RFC 4291 textual IPv6 incl. `::` compression and embedded dotted-quad
    * tail; zones (`%`) rejected. Returns 16 bytes or null. */
  private[net] def parseV6(s: String): Array[Byte] = {
    if (s.indexOf('%') >= 0) return null
    val groups = new Array[Int](8)   // 16-bit groups
    var nGroups = 0
    var compressAt = -1              // group index where '::' sits
    var i = 0
    val n = s.length
    if (n >= 2 && s.charAt(0) == ':' && s.charAt(1) == ':') { compressAt = 0; i = 2 }
    else if (n >= 1 && s.charAt(0) == ':') return null
    var done = false
    while (i < n && !done) {
      // try embedded IPv4 tail: rest contains '.'
      val rest = s.substring(i)
      val dotIdx = rest.indexOf('.')
      val colonIdx = rest.indexOf(':')
      if (dotIdx >= 0 && (colonIdx < 0 || dotIdx < colonIdx)) {
        if (nGroups > 6) return null
        val v4 = parseV4(rest)
        if (v4 == null) return null
        groups(nGroups) = ((v4(0) & 0xff) << 8) | (v4(1) & 0xff)
        groups(nGroups + 1) = ((v4(2) & 0xff) << 8) | (v4(3) & 0xff)
        nGroups += 2
        i = n
        done = true
      } else {
        var v = 0
        var digits = 0
        while (i < n && isHex(s.charAt(i))) {
          v = (v << 4) | hexVal(s.charAt(i))
          digits += 1
          if (digits > 4) return null
          i += 1
        }
        if (digits == 0) return null
        if (nGroups >= 8) return null
        groups(nGroups) = v
        nGroups += 1
        if (i < n) {
          if (s.charAt(i) != ':') return null
          i += 1
          if (i < n && s.charAt(i) == ':') {
            if (compressAt >= 0) return null
            compressAt = nGroups
            i += 1
            if (i == n) done = true
          } else if (i == n) return null // trailing single ':'
        }
      }
    }
    if (compressAt < 0 && nGroups != 8) return null
    if (compressAt >= 0 && nGroups >= 8) return null
    val out = new Array[Byte](16)
    val fill = if (compressAt >= 0) 8 - nGroups else 0
    var g = 0
    var slot = 0
    while (g < nGroups) {
      if (g == compressAt) slot += fill
      out(2 * slot) = (groups(g) >> 8).toByte
      out(2 * slot + 1) = groups(g).toByte
      g += 1
      slot += 1
    }
    out
  }

  private def truncateV6(s: String): Array[Byte] = {
    val b = parseV6(s)
    if (b == null) return null
    // /48: keep first 6 bytes
    var i = 6
    while (i < 16) { b(i) = 0; i += 1 }
    b
  }

  @inline private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  @inline private def hexVal(c: Char): Int =
    if (c <= '9') c - '0' else (c | 0x20) - 'a' + 10
}
