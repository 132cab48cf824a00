package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robots Exclusion Protocol (RFC 9309) evaluation — the governance
  * gate a crawl pipeline applies between frontier and fetch. Implements
  * the single-group (`User-agent: *`) subset with the rules that carry
  * the protocol's semantics:
  *
  *  - longest-match wins: the most specific matching rule decides
  *    (specificity = octets of the rule's path value, §2.2.2);
  *  - Allow beats Disallow on equal length (§2.2.2's
  *    least-restrictive tie-break);
  *  - §2.2.3 wildcards: `*` matches any octet sequence and a TRAILING
  *    `$` anchors the match at the path end — compiled to a LIKE
  *    pattern (LIKE metacharacters escaped, `*`→`%`, anchored rules
  *    skip the trailing `%`), the exact glob semantics, replayable in
  *    any SQL engine; a wildcard-free rule degenerates to the plain
  *    prefix match.
  *
  * An empty `Disallow:` line means "allow all" and is dropped at parse
  * time; a URL matching no rule is allowed (the protocol default).
  *
  * Scale shape: rules explode from robots bodies map-side; evaluation
  * is one equi-join on the registered domain (rules-per-domain is small
  * by construction — broadcast when the domain census is), then a
  * per-URL longest-match window over the few matched rules. No pair
  * space beyond |urls| × rules-on-their-own-domain.
  */
object Robots {

  /** Parse robots.txt bodies into (domain, prefix, allow) rules.
    * `df` carries one robots body per domain. Lines outside
    * `Allow:`/`Disallow:` (comments, User-agent, Sitemap, blanks) and
    * empty-prefix Disallows are dropped. */
  def parseRules(df: DataFrame, domainCol: Column, txtCol: Column): DataFrame =
    df.select(domainCol.as("domain"), explode(split(txtCol, "\n")).as("line"))
      .select(col("domain"), trim(col("line")).as("line"))
      .withColumn("allow",
        when(col("line").startsWith("Allow:"), lit(true))
          .when(col("line").startsWith("Disallow:"), lit(false)))
      .filter(col("allow").isNotNull)
      .withColumn("prefix", trim(regexp_replace(col("line"), "^(Allow|Disallow):", "")))
      .filter(length(col("prefix")) >= 1)
      .select(col("domain"), col("prefix"), col("allow"))

  /** Evaluate `urls` (carrying `urlCol`) against a rule table from
    * [[parseRules]]: appends `allowed`. URL paths come from the
    * canonical form ([[Url.canonicalize]] upstream); the domain key is
    * [[Url.registeredDomain]]. Row-preserving, duplicate rows included
    * (each row is decided independently via an internal uid, so the
    * output multiset has exactly the input's rows plus `allowed`). */
  def evaluate(urls: DataFrame, urlCol: Column, rules: DataFrame): DataFrame = {
    // the rule-table names are reserved too: a `prefix`/`allow`/`domain`
    // column already on `urls` would make the post-join col() references
    // ambiguous (or resolve to the wrong side)
    val reserved = Seq("__uid", "__dom", "__path", "__like", "allowed",
        "domain", "prefix", "allow")
      .filter(urls.columns.contains)
    require(reserved.isEmpty, s"reserved columns present: ${reserved.mkString(", ")}")
    val withKey = urls
      .withColumn("__uid", monotonically_increasing_id())
      .withColumn("__dom", Url.registeredDomain(urlCol))
      .withColumn("__path",
        coalesce(nullif(regexp_extract(urlCol,
          "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1), lit("")), lit("/")))
    // §2.2.3 compile: escape LIKE metachars, * -> %, trailing $ anchors
    val anchored = col("prefix").endsWith("$")
    val body = when(anchored,
      expr("substring(prefix, 1, length(prefix) - 1)")).otherwise(col("prefix"))
    val escaped = regexp_replace(body, "([\\\\%_])", "\\\\$1")
    val glob = regexp_replace(escaped, "\\*", "%")
    val rulesL = rules.withColumn("__like",
      when(anchored, glob).otherwise(concat(glob, lit("%"))))
    val matched = withKey.join(rulesL,
        withKey("__dom") === rulesL("domain") &&
          expr("__path LIKE __like"),
        "left")
    // best matching rule per URL row: longest prefix, Allow wins ties
    // (struct max orders (length, allow) lexicographically; unmatched
    // rows contribute a NULL struct that max ignores)
    val best = when(col("prefix").isNotNull,
      struct(length(col("prefix")).as("l"), col("allow").as("a")))
    val firsts = urls.columns.map(c => first(col(c)).as(c))
    matched
      .groupBy(col("__uid"))
      .agg(firsts.head, firsts.tail :+ max(best).as("__best"): _*)
      .withColumn("allowed", coalesce(col("__best.a"), lit(true)))
      .drop("__uid", "__best")
  }
}
