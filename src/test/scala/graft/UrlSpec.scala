package graft

/** Canonical-form contract of [[graft.text.Url]]. */
class UrlSpec extends SparkSpec {

  private def canon(u: String): String = {
    import spark.implicits._
    Seq(u).toDF("u").select(graft.text.Url.canonicalize($"u")).head().getString(0)
  }

  private def dom(u: String): String = {
    import spark.implicits._
    Seq(u).toDF("u")
      .select(graft.text.Url.registeredDomain(graft.text.Url.canonicalize($"u")))
      .head().getString(0)
  }

  test("case folds on scheme+host only; path case survives") {
    assert(canon("HTTP://WWW.Example.COM/Path/File.HTML") ==
      "http://example.com/Path/File.HTML")
  }

  test("fragment and utm params drop, other params survive in order") {
    assert(canon("https://a.com/p?utm_source=x&id=7&utm_campaign=y#frag") ==
      "https://a.com/p?id=7")
    assert(canon("https://a.com/p?utm_only=1") == "https://a.com/p")
    assert(canon("https://a.com/p?id=7&utm_a=1&utm_b=2") == "https://a.com/p?id=7")
  }

  test("default ports strip; explicit non-default ports survive") {
    assert(canon("http://a.com:80/x") == "http://a.com/x")
    assert(canon("https://a.com:443/x") == "https://a.com/x")
    assert(canon("http://a.com:8080/x") == "http://a.com:8080/x")
    assert(canon("https://a.com:80/x") == "https://a.com:80/x") // 80 is not https' default
  }

  test("registered domain is the last two labels, port excluded") {
    assert(dom("https://sub.deep.example.org/x") == "example.org")
    assert(dom("http://a.com:8080/x") == "a.com")
  }

  test("scheme-less input: params still clean, no host mangling") {
    assert(canon("not a url #tail") == "not a url ")
    assert(canon("rel/path?utm_x=1&k=2") == "rel/path?k=2")
  }

  test("canonicalize is idempotent over crawl-shaped variants") {
    // a canonicalizer that keeps rewriting on its own output corrupts
    // incremental pipelines (re-canonicalized stored keys stop matching)
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val schemes = Seq("http://", "HTTPS://", "https://", "")
    val hosts = Seq("WWW.Ex.COM", "a.b.ORG", "www.x.io:443", "x.io:8080", "Y.NET:80")
    val paths = Seq("/A/b", "/", "", "/p%20q")
    val queries = Seq("", "?utm_a=1", "?id=2&utm_b=3", "?utm_a=1&utm_b=2", "?K=V&k=v")
    val frags = Seq("", "#F", "#a#b")
    val urls = Seq.fill(200) {
      schemes(rnd.nextInt(schemes.size)) + hosts(rnd.nextInt(hosts.size)) +
        paths(rnd.nextInt(paths.size)) + queries(rnd.nextInt(queries.size)) +
        frags(rnd.nextInt(frags.size))
    }
    val df = urls.toDF("u")
    val once = graft.text.Url.canonicalize($"u")
    val twice = graft.text.Url.canonicalize(once)
    val bad = df.select($"u", once.as("c1"), twice.as("c2"))
      .filter($"c1" =!= $"c2").collect()
    assert(bad.isEmpty, s"non-idempotent on: ${bad.take(3).mkString("; ")}")
  }
}
