package graft

import org.apache.spark.sql.functions._

/** Pattern-level contract of [[graft.text.Pii]]: what matches, what
  * doesn't, placeholder output, count/redact agreement. */
class PiiSpec extends SparkSpec {

  private def one(text: String): (Int, Int, Int, String) = {
    import spark.implicits._
    val df = Seq(text).toDF("text")
    val r = graft.text.Pii.scrub(df, "text")
      .select($"n_email", $"n_ip", $"n_phone", $"text").head()
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3))
  }

  test("emails, IPs, phones redact to typed placeholders") {
    val (e, i, p, out) = one(
      "mail a.b+c@sub.example.org, host 192.168.0.77, call 555-123-4567 now")
    assert((e, i, p) == ((1, 1, 1)))
    assert(out == "mail [EMAIL], host [IP], call [PHONE] now")
  }

  test("word-boundary and shape negatives do not match") {
    // version strings (too few octets), bare digits, @-less handles
    val (e, i, p, out) = one("v1.2.3 build 20240101 at example.com slack")
    assert((e, i, p) == ((0, 0, 0)))
    assert(out == "v1.2.3 build 20240101 at example.com slack")
  }

  test("multiple occurrences all redact; counts see pre-redaction text") {
    val (e, i, p, out) = one("a@b.co c@d.io 10.0.0.1 10.0.0.2 555-000-1111 555 000 2222")
    assert((e, i, p) == ((2, 2, 2)))
    assert(out == "[EMAIL] [EMAIL] [IP] [IP] [PHONE] [PHONE]")
  }

  test("phone inside longer digit run matches from the first valid start") {
    val (_, _, p, out) = one("id 1555-123-4567 end")
    assert(p == 1)
    assert(out == "id 1[PHONE] end")
  }
}
