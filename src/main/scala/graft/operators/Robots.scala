package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.types._

/** robots.txt evaluation (RFC 9309, the Robots Exclusion Protocol) —
  * the admission gate a polite crawl pipeline applies between URL
  * discovery and fetch. Implements the spec's matching model:
  *
  *  - groups keyed by `User-agent` lines (case-insensitive product
  *    token match; several agent lines may share one group); the
  *    applicable group is the MOST SPECIFIC matching agent (longest
  *    token), falling back to `*`; no group → allowed
  *  - `Allow` / `Disallow` rules are path patterns supporting `*`
  *    (any run, including empty) and a final `$` end anchor
  *  - decision: the longest-pattern match wins (octet length of the
  *    pattern, per spec); on equal length Allow wins; no match →
  *    allowed; empty pattern → ignored
  *  - unparseable lines are skipped (the spec's tolerance), but a
  *    group-less rule (before any User-agent) is ignored
  *
  * The DataFrame face joins a per-domain robots table to a URL table on
  * the domain and evaluates per row inside `mapPartitions` — rule
  * matching is a per-string imperative walk (the repo's criterion for
  * dropping out of Catalyst), while the join/shape stays declarative;
  * at 100 TB the robots side is domains-sized and broadcasts.
  */
object Robots {

  final case class Group(agents: Seq[String], rules: Seq[(Boolean, String)])

  /** Parse robots.txt into agent groups. Adjacent User-agent lines
    * start one shared group; rules before any User-agent are dropped. */
  def parse(txt: String): Seq[Group] = {
    if (txt == null) return Seq.empty
    val groups = Seq.newBuilder[Group]
    var agents = Seq.empty[String]
    var rules = Seq.empty[(Boolean, String)]
    var open = false // collecting agent lines for a new group
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules)
      agents = Seq.empty; rules = Seq.empty
    }
    txt.split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim // comments
      val sep = line.indexOf(':')
      if (sep > 0) {
        val key = line.substring(0, sep).trim.toLowerCase
        val value = line.substring(sep + 1).trim
        key match {
          case "user-agent" =>
            if (!open) { flush(); open = true }
            agents = agents :+ value.toLowerCase
          case "allow" | "disallow" =>
            open = false
            if (agents.nonEmpty && value.nonEmpty)
              rules = rules :+ (key == "allow", value)
            else if (agents.nonEmpty && value.isEmpty && key == "disallow")
              () // "Disallow:" (empty) = allow everything: no rule
          case _ => open = false // sitemap/crawl-delay etc.: not rules
        }
      }
    }
    flush()
    groups.result()
  }

  /** The crawler's product token: the leading run of token characters
    * (letters, digits, `-`, `_`) of its agent string, lowercased —
    * "GraftBot/1.0 (+http…)" → "graftbot". RFC 9309 §2.2.1 matches
    * groups against this token, not the full UA string. */
  def productToken(agent: String): String =
    agent.toLowerCase.takeWhile(c =>
      c.isLetterOrDigit || c == '-' || c == '_')

  /** The rules applying to `agent`: every group whose most specific
    * (longest) matching agent token ties for the maximum is COMBINED
    * into one rule set (RFC 9309 §2.2.1 — rules of all groups naming
    * the matched agent apply together; a Disallow living in a duplicate
    * group must not be ignored). A group token matches when it is a
    * prefix of the crawler's product token ("googlebot" applies to
    * "googlebot-images"; "bot" does NOT apply to "mybot"). All `*`
    * groups combine as the fallback. */
  def groupFor(groups: Seq[Group], agent: String): Option[Group] = {
    val tok = productToken(agent)
    val named = groups.flatMap { g =>
      val lens = g.agents.filter(t => t != "*" && tok.startsWith(t)).map(_.length)
      if (lens.nonEmpty) Some((lens.max, g)) else None
    }
    if (named.nonEmpty) {
      val best = named.map(_._1).max
      val applicable = named.collect { case (l, g) if l == best => g }
      Some(Group(applicable.flatMap(_.agents), applicable.flatMap(_.rules)))
    } else {
      val stars = groups.filter(_.agents.contains("*"))
      if (stars.isEmpty) None
      else Some(Group(Seq("*"), stars.flatMap(_.rules)))
    }
  }

  /** Does `pattern` (with `*` and final `$`) match a PREFIX of `path`
    * (the WHOLE path when anchored)? Returns the pattern's octet length
    * for rule precedence, or -1. Greedy earliest-position matching of
    * the inter-`*` segments is complete for prefix semantics; the
    * anchored case pins the LAST segment to the path's end instead
    * (greedy would reject `a*b$` against "aXbYb"). */
  def matchLen(pattern: String, path: String): Int = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    val segs = p.split("\\*", -1)
    if (!path.startsWith(segs.head)) return -1
    var pos = segs.head.length
    if (segs.length == 1)
      return if (!anchored || pos == path.length) pattern.length else -1
    // middle segments: earliest occurrence in order
    var i = 1
    while (i < segs.length - 1) {
      val seg = segs(i)
      if (seg.nonEmpty) {
        val at = path.indexOf(seg, pos)
        if (at < 0) return -1
        pos = at + seg.length
      }
      i += 1
    }
    val last = segs.last
    if (anchored) {
      if (last.isEmpty) pattern.length // trailing '*' then '$'
      else if (path.endsWith(last) && path.length - last.length >= pos)
        pattern.length
      else -1
    } else {
      if (last.isEmpty || path.indexOf(last, pos) >= 0) pattern.length
      else -1
    }
  }

  /** RFC decision for one path under one group's rules. */
  def allowed(group: Option[Group], path: String): (Boolean, String) =
    group match {
      case None => (true, null)
      case Some(g) =>
        val hits = g.rules.flatMap { case (allow, pat) =>
          val len = matchLen(pat, path)
          if (len >= 0) Some((len, allow, pat)) else None
        }
        if (hits.isEmpty) (true, null)
        else {
          // longest pattern wins; Allow wins ties
          val (_, allow, pat) = hits.maxBy { case (len, a, _) => (len, a) }
          (allow, pat)
        }
    }

  val verdictSchema: StructType = StructType(Seq(
    StructField("allowed", BooleanType, nullable = false),
    StructField("matched_rule", StringType)))

  /** Evaluate every URL row against its domain's robots.txt for one
    * crawler agent: `urls` must carry `domainCol` and `pathCol`;
    * `robots` carries `domainCol` and `robotsCol` (NULL/absent robots →
    * allowed). Adds `allowed` and `matched_rule`. */
  def admit(urls: DataFrame, robots: DataFrame, domainCol: String,
      pathCol: String, robotsCol: String, agent: String): DataFrame = {
    val joined = urls.join(robots, Seq(domainCol), "left")
    val outSchema = joined.schema.fields
      .foldLeft(new StructType())(_ add _)
      .add(StructField("allowed", BooleanType, nullable = false))
      .add(StructField("matched_rule", StringType))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val rIdx = joined.schema.fieldIndex(robotsCol)
    val pIdx = joined.schema.fieldIndex(pathCol)
    joined.mapPartitions { rows =>
      // parse each distinct robots body once per partition
      val cache = scala.collection.mutable.Map.empty[String, Option[Group]]
      rows.map { r =>
        val body = if (r.isNullAt(rIdx)) null else r.getString(rIdx)
        val g =
          if (body == null) None
          else cache.getOrElseUpdate(body, groupFor(parse(body), agent))
        val (ok, rule) = allowed(g, r.getString(pIdx))
        Row.fromSeq(r.toSeq ++ Seq(ok, rule))
      }
    }(enc)
  }
}
