package graft.core.net

/**
 * URL canonicalization for crawl dedup — the normalization applied before
 * URL-level duplicate detection. Deliberately minimal, SQL-mirrorable
 * rules (aggressive normalizers change dedup semantics; these four are the
 * universally-safe ones):
 *
 *  1. scheme lowercased,
 *  2. host lowercased (the userinfo/host/port authority is preserved
 *     otherwise),
 *  3. fragment stripped (never sent to the server),
 *  4. default port stripped (http:80, https:443).
 *
 * Path, query and userinfo are preserved byte-for-byte (percent-encoding
 * normalization and query sorting are corpus-policy decisions, not
 * universal equivalences). Inputs without "://" return unchanged.
 */
object UrlUtil {

  def canonicalize(url: String): String = {
    if (url == null) return null
    val schemeEnd = url.indexOf("://")
    if (schemeEnd < 0) return url
    val scheme = url.substring(0, schemeEnd).toLowerCase(java.util.Locale.ROOT)

    // authority = up to the first '/', '?' or '#' after "://"
    val authStart = schemeEnd + 3
    var i = authStart
    while (i < url.length && url.charAt(i) != '/' && url.charAt(i) != '?' &&
      url.charAt(i) != '#') i += 1
    val authority = url.substring(authStart, i)

    // rest = path+query, fragment stripped
    val hash = url.indexOf('#', i)
    val rest = if (hash < 0) url.substring(i) else url.substring(i, hash)

    // lowercase only the host portion of the authority; strip default port
    val at = authority.lastIndexOf('@')
    val userinfo = if (at >= 0) authority.substring(0, at + 1) else ""
    val hostPort = authority.substring(at + 1)
    // IPv6 literal: [..]:port — the closing bracket splits host from port
    val portColon = {
      val close = hostPort.lastIndexOf(']')
      val c = hostPort.lastIndexOf(':')
      if (c > close) c else -1
    }
    val host = (if (portColon < 0) hostPort else hostPort.substring(0, portColon))
      .toLowerCase(java.util.Locale.ROOT)
    val port = if (portColon < 0) "" else hostPort.substring(portColon)
    val keepPort = port.nonEmpty &&
      !((scheme == "http" && port == ":80") || (scheme == "https" && port == ":443"))

    scheme + "://" + userinfo + host + (if (keepPort) port else "") + rest
  }
}
