package graft.core.net

import scala.collection.mutable.ArrayBuffer

/**
 * robots.txt parsing and path matching per RFC 9309 (Robots Exclusion
 * Protocol) — the crawl-politeness stage of a web pipeline (the
 * reference engine has no crawl surface; this extends the LLM-pipeline
 * family). Semantics implemented:
 *
 *  - Groups: one or more consecutive `User-agent:` lines followed by
 *    `Allow:` / `Disallow:` rules; a `User-agent:` line AFTER rules have
 *    started opens a new group (RFC 9309 §2.2.1).
 *  - Group selection: the group whose agent token is the LONGEST
 *    case-insensitive substring of the crawler's product token wins; the
 *    `*` group is the fallback. Only the winning agent's groups apply —
 *    specific and `*` groups are NOT merged (RFC 9309 §2.2.1: "crawlers
 *    MUST obey the first matching group"; multiple groups with the SAME
 *    winning token do merge).
 *  - Rule matching: patterns match from the start of the path; `*`
 *    matches any char run, `$` (final char only) anchors the end.
 *  - Precedence: the MOST SPECIFIC match wins = longest pattern (in
 *    chars); Allow wins a length tie (RFC 9309 §2.2.2). No matching
 *    rule, no rules, or an empty `Disallow:` value => allowed.
 *  - Lines are `key: value`; keys case-insensitive; `#` starts a
 *    comment; unknown keys (Sitemap, Crawl-delay, ...) are ignored but
 *    DO terminate a run of user-agent lines like rules do.
 */
object RobotsTxt {

  /** One rule: allow/disallow + raw pattern (never empty). */
  final case class Rule(allow: Boolean, pattern: String)

  /** Parse robots.txt content and return the rules of the group(s)
    * applying to `agent` (product token, e.g. "graftbot"). */
  def rulesFor(content: String, agent: String): Array[Rule] = {
    if (content == null) return Array.empty
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    // (agentToken -> rules) in document order; a group may list several
    // agent tokens, each getting the same rules
    val groups = ArrayBuffer.empty[(String, ArrayBuffer[Rule])]
    var currentAgents: List[ArrayBuffer[Rule]] = Nil
    var inAgentRun = false
    content.linesIterator.foreach { raw =>
      val line = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgentRun) currentAgents = Nil // new group
            inAgentRun = true
            val rules = ArrayBuffer.empty[Rule]
            groups += ((value.toLowerCase(java.util.Locale.ROOT), rules))
            currentAgents = rules :: currentAgents
          case "allow" | "disallow" =>
            inAgentRun = false
            if (value.nonEmpty) // empty Disallow: == no rule (allow all)
              currentAgents.foreach(_ += Rule(key == "allow", value))
          case _ =>
            inAgentRun = false // Sitemap etc.: ignored, but ends the run
        }
      }
    }
    // longest agent token that is a substring of ours; "*" is fallback
    var bestLen = -1
    groups.foreach { case (tok, _) =>
      if (tok != "*" && tok.nonEmpty && agentLc.contains(tok) && tok.length > bestLen)
        bestLen = tok.length
    }
    val picked =
      if (bestLen >= 0)
        groups.filter { case (tok, _) =>
          tok != "*" && tok.length == bestLen && agentLc.contains(tok) }
      else groups.filter(_._1 == "*")
    picked.flatMap(_._2).toArray
  }

  /** Does `pattern` (with `*` wildcards and an optional final `$`
    * anchor) match `path` from its start? */
  def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val p = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val segs = splitStar(p)
    var pos = 0
    // first segment must match at the start
    if (segs.nonEmpty) {
      if (!path.startsWith(segs(0))) return false
      pos = segs(0).length
    }
    var i = 1
    while (i < segs.length) {
      val s = segs(i)
      if (s.nonEmpty) {
        if (i == segs.length - 1 && anchored) {
          // last literal with $: must match at the very end, after pos
          return path.length - s.length >= pos && path.endsWith(s)
        }
        val at = path.indexOf(s, pos)
        if (at < 0) return false
        pos = at + s.length
      }
      i += 1
    }
    if (anchored && (segs.isEmpty || !p.endsWith("*")))
      // no trailing '*' before '$': the match must consume the path
      if (segs.length <= 1) return pos == path.length
    true
  }

  private def splitStar(p: String): Array[String] = {
    // split on '*', KEEPING empty segments so "a*" / "*a" anchor right
    val out = ArrayBuffer.empty[String]
    var start = 0
    var i = 0
    while (i <= p.length) {
      if (i == p.length || p.charAt(i) == '*') {
        out += p.substring(start, i)
        start = i + 1
      }
      i += 1
    }
    out.toArray
  }

  /** Longest-match verdict: Some(allow) from the most specific matching
    * rule (Allow wins length ties), None when nothing matches. */
  def verdict(rules: Array[Rule], path: String): Option[Boolean] = {
    var bestLen = -1
    var bestAllow = false
    var i = 0
    while (i < rules.length) {
      val r = rules(i)
      if (matches(r.pattern, path)) {
        val len = r.pattern.length
        if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
          bestLen = len
          bestAllow = r.allow
        }
      }
      i += 1
    }
    if (bestLen < 0) None else Some(bestAllow)
  }

  /** Convenience: allowed unless the most specific match disallows. */
  def isAllowed(content: String, agent: String, path: String): Boolean =
    verdict(rulesFor(content, agent), path).getOrElse(true)
}
