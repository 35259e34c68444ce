package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robots-style URL rule gate — longest-prefix-match allow/disallow
  * decisions (the RFC 9309 core), the per-HOST refinement of the
  * domain-level [[Blocklist]]: a crawl-derived corpus must honor the
  * origin site's allow/disallow rules per PATH, not just drop whole
  * domains. Rule semantics (the RFC 9309 subset, documented):
  *
  *  - a rule is (host, allow: Boolean, path prefix); a rule matches a
  *    URL when the URL's host equals the rule's host and its path
  *    (query included, fragment assumed absent) starts with the
  *    prefix;
  *  - the LONGEST matching prefix wins; on an exact length tie, allow
  *    beats disallow (RFC 9309 §2.2.2's least-restrictive rule);
  *  - no matching rule (or no rules for the host, or no host at all)
  *    means allowed — robots gating is opt-out;
  *  - `*`/`$` wildcards are NOT interpreted (prefix-only subset; a
  *    rule containing them matches only the literal characters).
  *
  * 100 TB shape: rules live in a TABLE (millions of hosts × a
  * robots-file-bounded handful of rules each), so the gate is one
  * host equi-join (Spark auto-broadcasts a small rule set) + one
  * aggregation whose per-URL row count is bounded by rules-per-host —
  * never by corpus size or host popularity. The winner is a
  * `max(struct(len, allow, prefix))` partial-combining aggregate:
  * map-side max keeps hot hosts flat (the q94 hub discipline).
  */
object RobotsGate {

  /** Path + query of a URL (robots match target); "" becomes "/". */
  def urlPath(url: Column): Column = {
    val p = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    when(length(p) === 0, lit("/")).otherwise(p)
  }

  /** Gate `urls` through `rules` (host, allow, prefix). Output:
    * idCols ++ (url, host, allowed, matched_prefix) — matched_prefix
    * null when no rule matched.
    */
  def decide(urls: DataFrame, idCols: Seq[Column], urlCol: Column,
      rules: DataFrame): DataFrame = {
    val u = urls.select((idCols :+ urlCol.as("url")
      :+ Blocklist.urlHost(urlCol).as("host")
      :+ urlPath(urlCol).as("_path")): _*)
    val j = u.join(
      rules.select(col("host"), col("allow"), col("prefix")),
      Seq("host"), "left")
    // the winning rule as a lexicographic struct max: longer prefix
    // first, then allow over disallow (false < true), then prefix
    // text as a deterministic last resort for duplicate rules
    val m = when(
      col("prefix").isNotNull && col("_path").startsWith(col("prefix")),
      struct(length(col("prefix")).as("len"), col("allow").as("allow"),
        col("prefix").as("prefix")))
    val grouped = j
      .groupBy((idCols :+ col("url") :+ col("host")): _*)
      .agg(max(m).as("_w"))
    grouped.select((idCols :+ col("url") :+ col("host")
      :+ coalesce(col("_w.allow"), lit(true)).as("allowed")
      :+ col("_w.prefix").as("matched_prefix")): _*)
  }
}
