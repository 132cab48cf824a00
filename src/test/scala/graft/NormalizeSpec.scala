package graft

import org.apache.spark.sql.functions._
import graft.text.Normalize

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def clean(s: String): String =
    Seq(s).toDF("t").select(Normalize.stripMarkup($"t").as("c"))
      .collect()(0).getString(0)

  test("stripMarkup: tags become word breaks, entities decode, whitespace collapses") {
    assert(clean("<p>a<br>b</p>") === "a b")
    assert(clean("x &lt;tag&gt; &quot;q&quot; &#39;s&#39; y") === "x <tag> \"q\" 's' y")
    assert(clean("a&nbsp;&nbsp;b   c\t\nd") === "a b c d")
    // &amp; decodes LAST: one escaping level resolves per pass
    assert(clean("&amp;lt;") === "&lt;")
    assert(clean("  <div class=\"x\"> hi </div>  ") === "hi")
    assert(clean("plain text untouched") === "plain text untouched")
  }
}
