package graft.core.net

import org.scalatest.funsuite.AnyFunSuite

class RobotsTxtSpec extends AnyFunSuite {

  private val robots =
    """# example
      |User-agent: googlebot-news
      |Disallow: /news-archive
      |
      |User-agent: googlebot
      |User-agent: graftbot
      |Disallow: /private
      |Allow: /private/ok
      |Disallow: /*.pdf$
      |
      |User-agent: *
      |Disallow: /
      |Sitemap: https://x.example/sitemap.xml
      |Crawl-delay: 5
      |""".stripMargin

  test("group selection: longest matching agent token; * fallback; shared groups") {
    // graftbot gets the shared googlebot/graftbot group, NOT the * group
    val r = RobotsTxt.rulesFor(robots, "graftbot")
    assert(r.map(_.pattern).toSeq === Seq("/private", "/private/ok", "/*.pdf$"))
    // googlebot-news beats googlebot by token length
    assert(RobotsTxt.rulesFor(robots, "googlebot-news").map(_.pattern).toSeq ===
      Seq("/news-archive"))
    // unknown crawler falls back to *
    assert(RobotsTxt.rulesFor(robots, "otherbot").map(_.pattern).toSeq === Seq("/"))
    // case-insensitive agent match
    assert(RobotsTxt.rulesFor(robots, "GraftBot").length === 3)
  }

  test("same-token groups merge; empty Disallow is no rule; rules before any UA drop") {
    val txt = "Disallow: /lost\nUser-agent: a\nDisallow: /x\nDisallow:\n" +
      "User-agent: a\nAllow: /x/y\n"
    val r = RobotsTxt.rulesFor(txt, "a")
    assert(r.toSeq === Seq(RobotsTxt.Rule(false, "/x"), RobotsTxt.Rule(true, "/x/y")))
  }

  test("pattern matching: prefixes, * wildcards, $ anchor") {
    assert(RobotsTxt.matches("/private", "/private/page"))
    assert(RobotsTxt.matches("/private", "/private"))
    assert(!RobotsTxt.matches("/private", "/priv"))
    assert(!RobotsTxt.matches("/private", "/x/private"))
    assert(RobotsTxt.matches("/*.pdf", "/a/b/doc.pdf"))
    assert(RobotsTxt.matches("/*.pdf", "/a.pdfx")) // unanchored: prefix-of-path ok
    assert(RobotsTxt.matches("/*.pdf$", "/a/b/doc.pdf"))
    assert(!RobotsTxt.matches("/*.pdf$", "/a.pdfx"))
    assert(RobotsTxt.matches("/fish*.php$", "/fishheads/catfish.php"))
    assert(!RobotsTxt.matches("/fish*.php$", "/fish.php?id=2"))
    assert(RobotsTxt.matches("/p$", "/p"))
    assert(!RobotsTxt.matches("/p$", "/page"))
    assert(RobotsTxt.matches("/a*", "/abc"))
    assert(RobotsTxt.matches("/a*$", "/abc")) // trailing *$ absorbs the rest
    assert(RobotsTxt.matches("/", "/anything"))
  }

  test("precedence: most specific (longest) match wins; Allow wins length ties") {
    val rules = RobotsTxt.rulesFor(robots, "graftbot")
    assert(RobotsTxt.verdict(rules, "/private/page") === Some(false))
    assert(RobotsTxt.verdict(rules, "/private/ok/1") === Some(true)) // longer Allow
    assert(RobotsTxt.verdict(rules, "/public") === None) // no match -> allowed
    assert(RobotsTxt.isAllowed(robots, "graftbot", "/public"))
    assert(!RobotsTxt.isAllowed(robots, "graftbot", "/report.pdf"))
    // exact length tie: Allow wins (RFC 9309 2.2.2)
    val tie = "User-agent: *\nDisallow: /dir\nAllow: /dir\n"
    assert(RobotsTxt.isAllowed(tie, "any", "/dir/x"))
  }

  test("null/hostile input") {
    assert(RobotsTxt.rulesFor(null, "a").isEmpty)
    assert(RobotsTxt.isAllowed("", "a", "/x"))
    assert(RobotsTxt.isAllowed("garbage without colons\n:::\n", "a", "/x"))
  }
}
