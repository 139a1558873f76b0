package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.RobotsTxt
import graft.ops.RobotsTxt.Rule

/** robots.txt contract — group selection, RFC 9309 longest-match
  * precedence with Allow winning ties, and the malformed-line
  * tolerance real crawls depend on. */
class RobotsTxtSpec extends AnyFunSuite {

  private val txt =
    """# policy
      |User-agent: other-bot
      |Disallow: /
      |
      |User-agent: *
      |Disallow: /private/
      |Disallow: /a/
      |Allow: /a/p
      |Crawl-delay: 10
      |""".stripMargin

  test("group selection: the * group applies, the other-bot group does not") {
    val rules = RobotsTxt.parse(txt)
    assert(rules === Seq(Rule("/private/", allow = false),
      Rule("/a/", allow = false), Rule("/a/p", allow = true)))
    // exact-agent group wins over *
    val withMine = txt + "\nUser-agent: graftbot\nDisallow: /only-mine/\n"
    assert(RobotsTxt.parse(withMine) ===
      Seq(Rule("/only-mine/", allow = false)))
  }

  test("longest-match precedence, Allow wins ties, unmatched allowed") {
    val rules = RobotsTxt.parse(txt)
    assert(!RobotsTxt.decide(rules, "/private/x"), "prefix disallow")
    assert(!RobotsTxt.decide(rules, "/a/q1"), "/a/ disallow governs /a/q")
    assert(RobotsTxt.decide(rules, "/a/p7"),
      "Allow /a/p (len 4) beats Disallow /a/ (len 3)")
    assert(RobotsTxt.decide(rules, "/other"), "no matching rule = allowed")
    val tie = Seq(Rule("/x/", allow = false), Rule("/x/", allow = true))
    assert(RobotsTxt.decide(tie, "/x/1"), "equal length: Allow wins")
  }

  test("consecutive User-agent lines share one rule block") {
    val multi =
      """User-agent: a-bot
        |User-agent: *
        |Disallow: /shared/
        |""".stripMargin
    assert(RobotsTxt.parse(multi, "a-bot") ===
      Seq(Rule("/shared/", allow = false)))
    assert(RobotsTxt.parse(multi, "unlisted") ===
      Seq(Rule("/shared/", allow = false)))
  }

  test("malformed/unknown lines are tolerated, empty Disallow matches " +
      "nothing, comments strip") {
    val messy =
      """User-agent: *
        |Disallow:
        |Disallow: /p # trailing comment
        |NotADirective here
        |: no name
        |Allow
        |""".stripMargin
    val rules = RobotsTxt.parse(messy)
    assert(rules === Seq(Rule("/p", allow = false)))
    assert(RobotsTxt.decide(rules, "/q"), "empty Disallow = allow all")
    assert(RobotsTxt.parse("") === Nil)
    assert(RobotsTxt.decide(Nil, "/anything"))
  }
}
