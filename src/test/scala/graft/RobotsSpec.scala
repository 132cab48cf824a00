package graft

import org.apache.spark.sql.functions._

/** RFC 9309 semantics of [[graft.text.Robots]]: parse filtering,
  * longest-match, the Allow tie-break, defaults, and row preservation. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rules = graft.text.Robots.parseRules(
    Seq(("ex.com",
      "User-agent: *\n# note\nDisallow: /a\nAllow: /a/ok\n" +
        "Disallow: /tie\nAllow: /tie\nDisallow:\nSitemap: s")).toDF("d", "r"),
    $"d", $"r")

  private def verdicts(paths: String*): Map[String, Boolean] = {
    val urls = paths.zipWithIndex
      .map { case (p, i) => (i, s"http://www.ex.com$p") }.toDF("id", "url")
    graft.text.Robots.evaluate(urls, graft.text.Url.canonicalize($"url"), rules)
      .select($"url", $"allowed").collect()
      .map(r => r.getString(0).stripPrefix("http://www.ex.com") -> r.getBoolean(1)).toMap
  }

  test("parse keeps only non-empty Allow/Disallow lines") {
    val got = rules.orderBy($"prefix", $"allow").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    assert(got.toSeq == Seq(
      ("ex.com", "/a", false), ("ex.com", "/a/ok", true),
      ("ex.com", "/tie", false), ("ex.com", "/tie", true)))
  }

  test("longest match wins; Allow beats Disallow on equal length; no-match allows") {
    val v = verdicts("/a/x", "/a/ok/deep", "/tie/page", "/free", "/")
    assert(v("/a/x") == false, "blocked by /a")
    assert(v("/a/ok/deep") == true, "the longer Allow /a/ok carves back")
    assert(v("/tie/page") == true, "equal-length tie goes to Allow")
    assert(v("/free") == true, "unmatched path defaults to allowed")
    assert(v("/") == true)
  }

  test("foreign domains are untouched; duplicate url rows are both preserved") {
    val urls = Seq((1, "http://other.org/a/x"), (2, "http://ex.com/a/x"),
      (3, "http://ex.com/a/x")).toDF("id", "url")
    val out = graft.text.Robots.evaluate(urls, $"url", rules)
      .select($"id", $"allowed").collect().map(r => (r.getInt(0), r.getBoolean(1))).sorted
    assert(out.toSeq == Seq((1, true), (2, false), (3, false)))
  }

  test("reserved-column guard") {
    intercept[IllegalArgumentException] {
      graft.text.Robots.evaluate(
        Seq((1, "u", true)).toDF("id", "url", "allowed"), $"url", rules)
    }
  }

  test("§2.2.3 wildcards: * spans octets, trailing $ anchors, LIKE metachars stay literal") {
    val robots = Seq(("wild.com",
      "User-agent: *\n" +
      "Disallow: /tmp*\n" +
      "Allow: /tmp/ok/*.html$\n" +
      "Disallow: /100%_sure\n" +
      "Disallow: /end$\n")).toDF("domain", "robots")
    val wrules = graft.text.Robots.parseRules(robots, $"domain", $"robots")
    def v(paths: String*): Map[String, Boolean] = {
      val urls = paths.zipWithIndex.map { case (p, i) => (i, s"http://wild.com$p") }
        .toDF("id", "url")
      graft.text.Robots.evaluate(urls, $"url", wrules)
        .select($"url", $"allowed").collect()
        .map(r => r.getString(0).stripPrefix("http://wild.com") -> r.getBoolean(1)).toMap
    }
    val got = v("/tmp/deep/x", "/tmp/ok/a.html", "/tmp/ok/a.htmlz",
      "/100%_sure", "/100x_sure", "/end", "/endless", "/free")
    assert(got("/tmp/deep/x") == false, "wildcard Disallow /tmp* blocks")
    assert(got("/tmp/ok/a.html") == true, "longer anchored Allow carves back")
    assert(got("/tmp/ok/a.htmlz") == false, "$ anchors: .htmlz doesn't end in .html")
    assert(got("/100%_sure") == false, "literal % and _ match themselves")
    assert(got("/100x_sure") == true, "_ is NOT a single-char wildcard")
    assert(got("/end") == false, "anchored literal blocks the exact path")
    assert(got("/endless") == true, "anchor keeps /endless out of /end$")
    assert(got("/free") == true)
  }

  test("rule-table names (domain/prefix/allow) are reserved on urls too") {
    // a urls frame already carrying `prefix` would make the post-join
    // col(\"prefix\") ambiguous — the guard must catch it up front
    Seq("domain", "prefix", "allow").foreach { c =>
      val e = intercept[IllegalArgumentException] {
        graft.text.Robots.evaluate(
          Seq((1, "http://ex.com/a", "x")).toDF("id", "url", c), $"url", rules)
      }
      assert(e.getMessage.contains(c))
    }
  }
}
