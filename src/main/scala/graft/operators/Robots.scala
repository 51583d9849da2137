package graft.operators

/** robots.txt parsing and URL gating (RFC 9309, the Robots Exclusion
  * Protocol) — the crawl-politeness filter that runs between frontier
  * and fetch. A curation pipeline replaying a crawl needs the same gate:
  * captures fetched where robots now disallows are routed out before
  * training.
  *
  * Semantics implemented (RFC 9309 §2):
  *  - line-oriented `field: value`, `#` comments, field names
  *    case-insensitive; unknown fields ignored.
  *  - groups: one or more consecutive `User-agent` lines followed by
  *    rules; rules before any `User-agent` line are ignored (no group).
  *  - group selection: ALL groups whose agent token equals the
  *    crawler's product token (case-insensitive) merge; if none match,
  *    the `*` groups apply; if none, everything is allowed.
  *  - matching: `Allow`/`Disallow` values are path prefixes with `*`
  *    (any chars) and `$` (end anchor); the LONGEST matched pattern
  *    wins, `Allow` wins ties; an empty `Disallow:` matches nothing;
  *    no matching rule = allowed.
  *
  * Scale shape: robots bodies are tiny (RFC requires crawlers to parse
  * at least 500 KiB and allows ignoring the rest — enforced here) and
  * one-per-host, so the gate is a broadcast join of a host-grain dim
  * table against the URL stream plus a map-only match. Parsing is
  * memoized per task thread keyed on the rules text, so a stream of
  * URLs from the same host parses its robots once, not per row.
  */
object Robots {

  /** One matching rule: `allow` = the verdict if this pattern is the
    * longest match; `pattern` as written (wildcards unexpanded).
    */
  final case class Rule(allow: Boolean, pattern: String)

  /** One `User-agent` group: the agent tokens it names (lower-cased),
    * its rules in file order, and its `Crawl-Delay` (seconds) if one
    * parsed — non-standard but near-universal in the wild, the pacing
    * input of a polite fetcher.
    */
  final case class Group(agents: Seq[String], rules: Seq[Rule],
      crawlDelay: Option[Double] = None)

  /** RFC 9309 §2.5: parsers must accept at least 500 KiB; bytes past
    * the cap may be ignored. We cap on characters (the corpus is UTF-8
    * text by the time it is a String) — deterministic and documented.
    */
  final val MaxChars: Int = 500 * 1024

  def parse(txt: String): Seq[Group] = {
    val body = if (txt.length > MaxChars) txt.substring(0, MaxChars) else txt
    val groups = scala.collection.mutable.ArrayBuffer.empty[(scala.collection.mutable.ArrayBuffer[String], scala.collection.mutable.ArrayBuffer[Rule], scala.collection.mutable.ArrayBuffer[Double])]
    var inAgents = false // consecutive user-agent lines extend the group
    body.linesIterator.foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val colon = noComment.indexOf(':')
      if (colon > 0) {
        val field = noComment.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        val value = noComment.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgents) groups += ((scala.collection.mutable.ArrayBuffer.empty,
              scala.collection.mutable.ArrayBuffer.empty,
              scala.collection.mutable.ArrayBuffer.empty))
            groups.last._1 += value.toLowerCase(java.util.Locale.ROOT)
            inAgents = true
          case "allow" | "disallow" =>
            inAgents = false
            if (groups.nonEmpty) groups.last._2 += Rule(field == "allow", value)
          case "crawl-delay" =>
            inAgents = false
            if (groups.nonEmpty && groups.last._3.isEmpty)
              groups.last._3 ++= parseDelay(value) // first wins within a group
          case _ => inAgents = false // sitemap, unknown: ignored
        }
      }
    }
    groups.map { case (a, r, d) => Group(a.toSeq, r.toSeq, d.headOption) }.toSeq
  }

  private def parseDelay(v: String): Option[Double] =
    try Some(v.toDouble).filter(d => d >= 0 && d.isFinite)
    catch { case _: NumberFormatException => None }

  /** Crawl-Delay for `agent`, using the same group selection as
    * [[rulesFor]]; when several applicable groups declare one, the
    * LARGEST wins — politeness errs slow. None = no declared delay.
    */
  def crawlDelay(groups: Seq[Group], agent: String): Option[Double] = {
    val tok = agent.toLowerCase(java.util.Locale.ROOT)
    val exact = groups.filter(_.agents.contains(tok))
    val chosen = if (exact.nonEmpty) exact else groups.filter(_.agents.contains("*"))
    val ds = chosen.flatMap(_.crawlDelay)
    if (ds.isEmpty) None else Some(ds.max)
  }

  /** `Sitemap:` lines (RFC 9309 records them as non-group metadata —
    * they apply regardless of agent and may appear anywhere). URL values
    * are returned verbatim in file order; the frontier seeds from them.
    */
  def sitemaps(txt: String): Seq[String] = {
    val body = if (txt.length > MaxChars) txt.substring(0, MaxChars) else txt
    body.linesIterator.flatMap { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val colon = noComment.indexOf(':')
      if (colon > 0 &&
          noComment.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT) == "sitemap") {
        val v = noComment.substring(colon + 1).trim
        if (v.nonEmpty) Some(v) else None
      } else None
    }.toSeq
  }

  /** Merge the rules that apply to `agent` (product token, matched
    * case-insensitively and exactly per RFC 9309 §2.2.1): all groups
    * naming the token; else all `*` groups; else no rules (allow all).
    */
  def rulesFor(groups: Seq[Group], agent: String): Seq[Rule] = {
    val tok = agent.toLowerCase(java.util.Locale.ROOT)
    val exact = groups.filter(_.agents.contains(tok))
    val chosen = if (exact.nonEmpty) exact else groups.filter(_.agents.contains("*"))
    chosen.flatMap(_.rules)
  }

  /** Does `pattern` (path prefix with `*` wildcards and an optional
    * trailing `$` anchor) match `path`? Returns the match specificity
    * (pattern length) or -1. Empty patterns match nothing — an empty
    * `Disallow:` line means "allow all" per spec.
    */
  def matchLength(pattern: String, path: String): Int = {
    if (pattern.isEmpty) return -1
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    // greedy segment walk: split on '*', require segments in order;
    // first segment must match at offset 0 (patterns are path prefixes)
    val segs = p.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < segs.length) {
      val s = segs(i)
      if (i == 0) {
        if (!path.startsWith(s)) return -1
        pos = s.length
      } else if (i == segs.length - 1 && anchored) {
        // last segment under a $ anchor must match at the END
        if (path.length - pos < s.length || !path.endsWith(s)) return -1
        pos = path.length
      } else {
        val at = path.indexOf(s, pos)
        if (at < 0) return -1
        pos = at + s.length
      }
      i += 1
    }
    if (anchored && pos != path.length) return -1
    pattern.length
  }

  /** RFC 9309 §2.2.2 evaluation: longest matched pattern wins; `Allow`
    * wins ties; nothing matched = allowed.
    */
  def isAllowed(rules: Seq[Rule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      val len = matchLength(r.pattern, path)
      if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
        if (len >= 0) { bestLen = len; bestAllow = r.allow }
      }
    }
    bestAllow
  }

  /** One-call form used by the gate expression: parse (memoized per
    * thread on the rules text — a URL stream grouped or even just
    * clustered by host parses each robots.txt once), select the agent
    * group, evaluate the path.
    */
  def allowed(robotsTxt: String, agent: String, path: String): Boolean =
    isAllowed(cachedRulesFor(robotsTxt, agent), path)

  // (txt, agent) -> rules, a small bounded per-thread LRU. The post-join
  // row materializes a fresh String per row, so keys compare by VALUE —
  // robots bodies are tiny (≤ MaxChars, typically a few hundred bytes),
  // so the equals is a short memcmp, far cheaper than a reparse.
  // Thread-confined, so no synchronization. Bounded at 64 entries: a URL
  // stream CLUSTERED by host hits the same entry every row (the fast
  // path — sort or partition by host first when you can), and an
  // UN-clustered stream with up to ~64 hosts interleaved per task still
  // parses each robots.txt once instead of once per row; past that the
  // LRU evicts, which is a reparse, never a wrong answer.
  private final val MemoEntries = 64

  /** Total parses performed (misses across all threads) — observability
    * for the memo's effectiveness; `RobotsSpec` asserts interleaved hosts
    * parse once each.
    */
  private[operators] val parseCount = new java.util.concurrent.atomic.AtomicLong

  private val memo =
    new ThreadLocal[java.util.LinkedHashMap[(String, String), Seq[Rule]]] {
      override def initialValue() =
        new java.util.LinkedHashMap[(String, String), Seq[Rule]](16, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[(String, String), Seq[Rule]]): Boolean =
            size() > MemoEntries
        }
    }

  private def cachedRulesFor(txt: String, agent: String): Seq[Rule] = {
    val m = memo.get()
    val k = (txt, agent)
    var rules = m.get(k)
    if (rules == null) {
      parseCount.incrementAndGet()
      rules = rulesFor(parse(txt), agent)
      m.put(k, rules)
    }
    rules
  }
}
