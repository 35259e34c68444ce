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

  /** robots.txt PARSER — the front end [[decide]] and
    * [[CrawlScheduler]] consume (q119 gates against an already-parsed
    * rule table; a real crawler holds raw robots bytes per host).
    * RFC 9309 subset, documented:
    *
    *  - lines split on `\n`; `#` comments stripped; blank/garbage
    *    lines ignored; directive names case-insensitive;
    *  - a GROUP is a maximal run of consecutive `User-agent:` lines
    *    plus the rule lines that follow (a UA line directly after a
    *    rule line starts a new group; consecutive UA lines share one);
    *  - group selection (§2.2.1): groups naming `userAgent` exactly
    *    (case-insensitive) if any exist, else groups naming `*`; ALL
    *    matching groups' rules combine; no match → no rows (opt-out);
    *  - `Disallow:` with an empty value is allow-all — dropped;
    *  - rules before the first UA line belong to no group — dropped;
    *  - `Crawl-delay: N` (integer seconds; anything else ignored) —
    *    the MAX across selected groups, conservatively.
    *
    * Output, one frame feeding both consumers:
    * (host, kind, allow, prefix, delay_ms) — kind `rule` rows carry
    * (allow, prefix) for [[decide]]; kind `delay` rows carry the
    * per-host delay for [[CrawlScheduler.schedule]]. Distinct — a
    * rule repeated across selected groups emits once.
    *
    * 100 TB shape: robots files are size-capped (RFC 9309 says parse
    * at least 500 KiB), so the per-host line window is bounded by the
    * file, never the corpus; everything after the line numbering is
    * narrow projections + small-key aggregations.
    */
  def parseRobots(
      df: DataFrame, hostCol: String, textCol: String,
      userAgent: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val agent = userAgent.toLowerCase(java.util.Locale.ROOT)
    val lines = df.select(col(hostCol).as("host"),
      posexplode(split(coalesce(col(textCol), lit("")), "\n"))
        .as(Seq("_rb_ln", "_rb_raw")))
      .withColumn("_rb_clean", trim(regexp_replace(col("_rb_raw"), "#.*$", "")))
      .withColumn("_rb_dir",
        lower(regexp_extract(col("_rb_clean"), "^([A-Za-z-]+)[ \\t]*:", 1)))
      .withColumn("_rb_val",
        trim(regexp_extract(col("_rb_clean"), "^[A-Za-z-]+[ \\t]*:[ \\t]*(.*)$", 1)))
      .filter(col("_rb_dir") =!= "")
    val w = Window.partitionBy(col("host")).orderBy(col("_rb_ln"))
    val run = Window.partitionBy(col("host")).orderBy(col("_rb_ln"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grouped = lines
      .withColumn("_rb_ua", col("_rb_dir") === "user-agent")
      .withColumn("_rb_prev", coalesce(lag(col("_rb_ua"), 1).over(w), lit(false)))
      .withColumn("_rb_gid",
        sum(when(col("_rb_ua") && !col("_rb_prev"), 1L).otherwise(0L)).over(run))
      .filter(col("_rb_gid") > 0)
    // group selection: exact agent beats *, all matching groups combine
    val groupAgents = grouped.filter(col("_rb_ua"))
      .groupBy(col("host"), col("_rb_gid"))
      .agg(
        max(lower(col("_rb_val")) === agent).as("_rb_exact"),
        max(col("_rb_val") === "*").as("_rb_star"))
    val hostHasExact = groupAgents.groupBy(col("host"))
      .agg(max(col("_rb_exact")).as("_rb_any_exact"))
    val selected = groupAgents.join(hostHasExact, Seq("host"))
      .filter(when(col("_rb_any_exact"), col("_rb_exact"))
        .otherwise(col("_rb_star")))
      .select(col("host"), col("_rb_gid"))
    val body = grouped.filter(!col("_rb_ua"))
      .join(selected, Seq("host", "_rb_gid"))
    val rules = body
      .filter((col("_rb_dir") === "allow" || col("_rb_dir") === "disallow") &&
        col("_rb_val") =!= "")
      .select(col("host"), lit("rule").as("kind"),
        (col("_rb_dir") === "allow").as("allow"),
        col("_rb_val").as("prefix"),
        lit(null).cast("long").as("delay_ms"))
      .distinct()
    val delays = body
      .filter(col("_rb_dir") === "crawl-delay" &&
        col("_rb_val").rlike("^[0-9]+$"))
      .groupBy(col("host"))
      .agg(max(col("_rb_val").cast("long") * 1000L).as("delay_ms"))
      .select(col("host"), lit("delay").as("kind"),
        lit(null).cast("boolean").as("allow"),
        lit(null).cast("string").as("prefix"), col("delay_ms"))
    rules.unionByName(delays)
  }
}
