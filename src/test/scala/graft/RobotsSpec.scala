package graft

import graft.operators.Robots
import graft.operators.Robots.{Group, allowed, groupFor, matchLen, parse}

/** RFC 9309 robots evaluation: parsing (groups, comments, tolerance),
  * the most-specific-agent selection, wildcard/anchor matching, the
  * longest-match + Allow-wins decision, and the joined DataFrame face.
  * q270 gates the chain against the oracle. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  test("parsing: shared agent groups, comments, tolerance, empty Disallow") {
    val g = parse(
      """# policy
        |User-agent: GoodBot
        |User-agent: BetterBot
        |Disallow: /private/   # trailing comment
        |Allow: /private/ok
        |
        |User-agent: *
        |Disallow:
        |Crawl-delay: 10
        |Disallow: /tmp/
        |garbage line without colon
        |""".stripMargin)
    assert(g.length == 2)
    assert(g(0).agents == Seq("goodbot", "betterbot"))
    assert(g(0).rules == Seq((false, "/private/"), (true, "/private/ok")))
    assert(g(1).agents == Seq("*"))
    assert(g(1).rules == Seq((false, "/tmp/"))) // empty Disallow = no rule
    // rules before any User-agent are dropped
    assert(parse("Disallow: /x\nUser-agent: a\nDisallow: /y")
      .head.rules == Seq((false, "/y")))
  }

  test("group selection: most specific agent token, * fallback, none") {
    val gs = Seq(Group(Seq("super"), Seq((false, "/a"))),
      Group(Seq("superbot"), Seq((false, "/b"))),
      Group(Seq("*"), Seq((false, "/c"))))
    assert(groupFor(gs, "SuperBot/1.0").get.rules.head._2 == "/b") // longest
    assert(groupFor(gs, "SuperCrawl").get.rules.head._2 == "/a") // prefix
    assert(groupFor(gs, "other").get.rules.head._2 == "/c") // fallback
    assert(groupFor(gs.dropRight(1), "other").isEmpty) // no group: allowed
    // product-token PREFIX, not substring: "bot" must not catch "mybot"
    assert(groupFor(Seq(Group(Seq("bot"), Seq((false, "/a")))), "MyBot").isEmpty)
  }

  test("duplicate groups naming the same agent COMBINE (RFC 9309)") {
    // a Disallow living in the second group must not be ignored
    val gs = Seq(Group(Seq("graftbot"), Seq((true, "/ok"))),
      Group(Seq("graftbot"), Seq((false, "/ok/secret"))),
      Group(Seq("*"), Seq((false, "/"))))
    val g = groupFor(gs, "GraftBot/2.0")
    assert(g.get.rules.toSet == Set((true, "/ok"), (false, "/ok/secret")))
    assert(allowed(g, "/ok/secret/x") == ((false, "/ok/secret")))
    assert(allowed(g, "/ok/pub") == ((true, "/ok")))
    // duplicate * groups combine too
    val stars = Seq(Group(Seq("*"), Seq((false, "/a"))),
      Group(Seq("*"), Seq((false, "/b"))))
    assert(allowed(groupFor(stars, "x"), "/b/z") == ((false, "/b")))
  }

  test("pattern matching: prefixes, wildcards, anchors") {
    assert(matchLen("/a/b", "/a/b/c") == 4)
    assert(matchLen("/a/b", "/a/x") == -1)
    assert(matchLen("/*.php", "/index.php") == 6)
    assert(matchLen("/*.php", "/x/y.php?q=1") == 6)
    assert(matchLen("/*.php$", "/index.php") == 7)
    assert(matchLen("/*.php$", "/index.php?q=1") == -1)
    assert(matchLen("/a*b$", "/aXbYb") == 5) // greedy trap: must anchor last seg
    assert(matchLen("/a*b", "/aXc") == -1)
    assert(matchLen("/fish*", "/fishing") == 6)
    assert(matchLen("$", "") == 1)
    assert(matchLen("$", "/x") == -1)
  }

  test("decision: longest match wins; Allow wins ties; no match allows") {
    val g = Some(Group(Seq("*"), Seq(
      (false, "/p/"), (true, "/p/ok"), (false, "/p/ok/no"),
      (true, "/q/"), (false, "/q/"))))
    assert(allowed(g, "/p/file") == ((false, "/p/")))
    assert(allowed(g, "/p/ok/file") == ((true, "/p/ok")))
    assert(allowed(g, "/p/ok/no/file") == ((false, "/p/ok/no")))
    assert(allowed(g, "/q/x") == ((true, "/q/"))) // equal length: Allow wins
    assert(allowed(g, "/else") == ((true, null)))
    assert(allowed(None, "/p/file") == ((true, null)))
  }

  test("DataFrame face: per-domain join, NULL robots allows") {
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /private/\nAllow: /private/ok"),
      ("b.com", "User-agent: crawler\nDisallow: /\nUser-agent: *\nAllow: /"),
      ("c.com", null.asInstanceOf[String]))
      .toDF("domain", "robots_txt")
    val urls = Seq(
      ("a.com", "/private/x"), ("a.com", "/private/ok/y"), ("a.com", "/pub"),
      ("b.com", "/anything"), ("c.com", "/x"), ("d.com", "/y"))
      .toDF("domain", "path")
    val out = Robots.admit(urls, robots, "domain", "path", "robots_txt",
      agent = "crawler/2.1")
      .select("domain", "path", "allowed", "matched_rule").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getBoolean(2), Option(r.getString(3)))).toMap
    assert(out(("a.com", "/private/x")) == ((false, Some("/private/"))))
    assert(out(("a.com", "/private/ok/y")) == ((true, Some("/private/ok"))))
    assert(out(("a.com", "/pub")) == ((true, None)))
    assert(out(("b.com", "/anything")) == ((false, Some("/")))) // named group
    assert(out(("c.com", "/x")) == ((true, None))) // NULL robots
    assert(out(("d.com", "/y")) == ((true, None))) // no robots row at all
  }
}
