package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the compliance pass every training-data
  * pipeline runs before text leaves the curation boundary (emails, IPv4
  * addresses, phone numbers replaced by typed placeholders). Pure
  * codegen'd built-ins (`regexp_replace` / `regexp_count`): at 100 TB
  * this is map-side scan work with no shuffle, no UDF, no state.
  *
  * The patterns deliberately use only the regex subset shared by Java's
  * engine and RE2 (character classes, bounded repetition, `\b`), so an
  * external SQL oracle can replay detection exactly. Redaction order is
  * fixed (email, then IP, then phone) and the three patterns are
  * mutually non-overlapping by construction — emails need `@`, IPs need
  * dot-separated octets, phones need `-`/space-separated groups — so
  * sequential replacement is order-independent in effect but stated
  * anyway as part of the contract.
  */
object Pii {

  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re: String  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe: String = "\\d{3}[- ]\\d{3}[- ]\\d{4}"

  /** Occurrence counts BEFORE redaction: (emails, ips, phones). */
  def counts(text: Column): (Column, Column, Column) =
    (regexp_count(text, lit(EmailRe)),
     regexp_count(text, lit(Ipv4Re)),
     regexp_count(text, lit(PhoneRe)))

  /** Replace every match with its typed placeholder, email → IP → phone. */
  def redact(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailRe, "[EMAIL]")
    val noIp = regexp_replace(noEmail, Ipv4Re, "[IP]")
    regexp_replace(noIp, PhoneRe, "[PHONE]")
  }

  /** Scrub `textCol` in place and append per-type counts — the pipeline
    * form: one projection, fully inside whole-stage codegen. */
  def scrub(df: DataFrame, textCol: String): DataFrame = {
    val (e, i, p) = counts(col(textCol))
    df.withColumn("n_email", e)
      .withColumn("n_ip", i)
      .withColumn("n_phone", p)
      .withColumn(textCol, redact(col(textCol)))
  }
}
