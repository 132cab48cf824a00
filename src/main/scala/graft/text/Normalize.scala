package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-crawl text normalization — the extraction-stage cleanup every
  * crawl-derived corpus runs before any quality/dedup operator sees the
  * text. Everything here is a composition of codegen'd built-ins (no
  * UDF): at 100 TB this stage is pure map-side scan work and must stay
  * inside whole-stage codegen. */
object Normalize {

  /** Strip markup and normalize whitespace:
    *  1. tags `<...>` become a space (so `a<br>b` keeps its word break),
    *  2. the five standard XML entities + `&nbsp;` decode, `&amp;`
    *     LAST (the HTML-unescape convention: one escaping level
    *     resolves per pass, so `&amp;lt;` yields the literal `&lt;`),
    *  3. whitespace runs collapse to one space, ends trim. */
  def stripMarkup(c: Column): Column = {
    val noTags = regexp_replace(c, "<[^>]*>", " ")
    val unescaped = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (e, ch)) => replace(acc, lit(e), lit(ch)) }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }
}
