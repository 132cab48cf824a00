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
}
