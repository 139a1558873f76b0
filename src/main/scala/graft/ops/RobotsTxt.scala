package graft.ops

/** robots.txt (REP, RFC 9309) — the gate every crawl pipeline consults
  * before a URL enters the frontier. This parses the real grammar —
  * comment stripping, case-insensitive directive names, User-agent
  * GROUPS (consecutive User-agent lines share the following rule
  * block), `*` wildcard agent — and implements the RFC's precedence:
  * the rule with the LONGEST matching path prefix governs, Allow
  * winning length ties; no matching rule means allowed. Scope choices
  * (documented, not accidental): prefix match only — the `*`/`$`
  * pattern extensions are a crawler-specific extension the RFC makes
  * optional, and `decide` treats rule paths as literal prefixes;
  * empty-path Disallow (allow-all, per spec) parses to a rule that
  * matches nothing.
  *
  * Parsing is a per-DOMAIN cost (a dictionary-sized frame next to the
  * URL stream), decisions are row-local prefix algebra — the query
  * side (q257) keeps the rules as an array column and evaluates the
  * longest-match fold declaratively, so the hot path stays inside
  * codegen with no per-URL Scala.
  */
object RobotsTxt {

  /** One rule of the selected agent group. */
  final case class Rule(prefix: String, allow: Boolean)

  /** Parse the rule group that applies to `agent` (falling back to the
    * `*` group, per the RFC's most-specific-group rule — this minimal
    * form matches agent names exactly, no substring product tokens).
    * Unknown directives and malformed lines are ignored, never fatal —
    * real robots.txt files are full of both. */
  def parse(text: String, agent: String = "graftbot"): Seq[Rule] = {
    // group accumulation: consecutive User-agent lines open a group;
    // the first rule line closes the agent list
    var groups = List.empty[(List[String], List[Rule])]
    var curAgents = List.empty[String]
    var curRules = List.empty[Rule]
    var inAgentList = false
    def flush(): Unit = {
      if (curAgents.nonEmpty) groups = (curAgents, curRules.reverse) :: groups
      curAgents = Nil; curRules = Nil
    }
    for (raw <- text.split("\n")) {
      val line = raw.takeWhile(_ != '#').trim
      val i = line.indexOf(':')
      if (i > 0) {
        val name = line.substring(0, i).trim.toLowerCase
        val value = line.substring(i + 1).trim
        name match {
          case "user-agent" =>
            if (!inAgentList) { flush(); inAgentList = true }
            curAgents ::= value.toLowerCase
          case "allow" | "disallow" =>
            inAgentList = false
            // empty Disallow = allow everything (matches nothing here);
            // empty Allow is meaningless — both drop
            if (value.nonEmpty)
              curRules ::= Rule(value, allow = name == "allow")
          case _ => inAgentList = false // crawl-delay, sitemap, unknown
        }
      }
    }
    flush()
    val byAgent = groups.reverse
    byAgent.find(_._1.contains(agent.toLowerCase))
      .orElse(byAgent.find(_._1.contains("*")))
      .map(_._2).getOrElse(Nil)
  }

  /** RFC 9309 precedence: longest matching prefix governs, Allow wins
    * ties; unmatched paths are allowed. (The query form evaluates this
    * same fold declaratively over the rules array column.) */
  def decide(rules: Seq[Rule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    for (r <- rules if path.startsWith(r.prefix)) {
      if (r.prefix.length > bestLen ||
        (r.prefix.length == bestLen && r.allow)) {
        bestLen = r.prefix.length
        bestAllow = r.allow
      }
    }
    bestAllow
  }
}
