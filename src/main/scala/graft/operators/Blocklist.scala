package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain blocklist filtering — the URL-level gate a crawl pipeline
  * runs before any content work: drop documents whose host matches a
  * blocked domain, where "matches" is the registrable-suffix rule
  * (`host == domain` or `host` ends with `.domain` — label-aligned, so
  * `nottracker.example` does NOT match `tracker.example`).
  *
  * Two forms, by blocklist size:
  *   - [[hostBlocked]] — a codegen'd OR fold for a small fixed list
  *     (fits in the plan; zero joins, zero shuffles);
  *   - [[flagBlocked]]/[[dropBlocked]] — the scale path for real
  *     blocklists (millions of entries): each host explodes into its
  *     label-suffix chain (bounded by its label count, ~4 rows) and
  *     joins the blocklist on exact suffix — an equi-join AQE
  *     broadcasts when the blocklist side measures small; only
  *     `(id, suffix)` pairs ever shuffle, never the payload.
  */
object Blocklist {

  /** Lowercased host of a URL: the authority with userinfo and port
    * stripped; null for strings with no `scheme://` authority. Pure
    * Column ops (three regexes), codegen'd.
    */
  def urlHost(url: Column): Column = {
    val auth = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val host = regexp_replace(regexp_replace(auth, "^.*@", ""), ":[0-9]*$", "")
    when(length(host) > 0, lower(host))
  }

  /** Second-level labels that act as public-suffix components under
    * 2-letter ccTLDs (`co.uk`, `ac.jp`, `gov.au`, …) — the
    * registrable-domain heuristic's fixed table. A full
    * publicsuffix.org list plugs in the same way (broadcast lookup);
    * this closed set keeps the rule expressible as one codegen'd
    * Column and one DuckDB CASE.
    */
  val PublicSecondLevels: Seq[String] =
    Seq("co", "com", "org", "net", "gov", "ac", "edu")

  /** Registrable domain (eTLD+1 heuristic) of an already-extracted
    * host: the last two labels, or the last THREE when the TLD is
    * 2 letters and the second-to-last label is a [[PublicSecondLevels]]
    * member (`www.alpha.co.uk` -> `alpha.co.uk`, `news.beta.com` ->
    * `beta.com`). Hosts of ≤ 2 labels pass through; null host stays
    * null. Deterministic and replayed verbatim by the DuckDB oracle.
    */
  def registrableDomain(host: Column): Column = {
    val ls = split(host, "\\.")
    val n = size(ls)
    when(n <= 2, host)
      .when(length(element_at(ls, -1)) === 2 &&
        element_at(ls, -2).isin(PublicSecondLevels: _*),
        array_join(slice(ls, n - 2, lit(3)), "."))
      .otherwise(array_join(slice(ls, n - 1, lit(2)), "."))
  }

  /** The label-suffix chain of a host: `a.b.c` ->
    * `[a.b.c, b.c, c]` — the join keys of the scale path.
    */
  def hostSuffixes(host: Column): Column = {
    val parts = split(host, "\\.")
    transform(sequence(lit(1), size(parts)),
      i => array_join(slice(parts, i, size(parts) - i + 1), "."))
  }

  /** Small-list form: true iff `host` equals a blocked domain or ends
    * with `.domain`. The fold stays inside whole-stage codegen.
    */
  def hostBlocked(host: Column, blocked: Seq[String]): Column =
    blocked.map(_.toLowerCase)
      .map(b => host === lit(b) || host.endsWith(lit("." + b)))
      .reduceOption(_ || _)
      .getOrElse(lit(false))

  /** Scale path: `df` + `flagCol` (boolean, never null) marking rows
    * whose `hostCol` matches any `domainCol` entry of `blocklist` by
    * the suffix rule. `idCol` must be unique (it keys the flag
    * join-back). Null hosts are never blocked.
    */
  def flagBlocked(
      df: DataFrame,
      idCol: String,
      hostCol: Column,
      blocklist: DataFrame,
      domainCol: String = "domain",
      flagCol: String = "blocked"): DataFrame = {
    val bl = blocklist.select(lower(col(domainCol)).as("_bdom")).distinct()
    // (id, suffix) pairs only — the payload stays out of both joins;
    // the hit set is bounded by the blocked-row count, AQE broadcasts
    val hits = df.select(col(idCol), explode(hostSuffixes(hostCol)).as("_sfx"))
      .join(bl, col("_sfx") === col("_bdom"), "left_semi")
      .select(col(idCol)).distinct()
      .withColumn("_blk", lit(true))
    df.join(hits, Seq(idCol), "left")
      .withColumn(flagCol, coalesce(col("_blk"), lit(false)))
      .drop("_blk")
  }

  /** The filter form of [[flagBlocked]]: rows whose host matches no
    * blocklist entry (an anti-join on the same hit set).
    */
  def dropBlocked(
      df: DataFrame,
      idCol: String,
      hostCol: Column,
      blocklist: DataFrame,
      domainCol: String = "domain"): DataFrame =
    flagBlocked(df, idCol, hostCol, blocklist, domainCol, "_drop_blocked")
      .filter(!col("_drop_blocked")).drop("_drop_blocked")
}
