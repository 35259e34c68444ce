package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction over a text column — the scrubbing pass
  * every large-scale training-data pipeline runs before anything else
  * touches the corpus (emails / IP addresses / US SSNs here; the
  * pattern set is a config surface, not a closed list).
  *
  * Pure `regexp_count` / `regexp_replace` Column work: codegen'd,
  * narrow (no shuffle), pushdown-transparent — at 100 TB this is a
  * map-only pass whose cost is the regex engine itself. Patterns stay
  * inside the common Java-regex/RE2 subset (character classes, bounded
  * repetition, `\b`; no lookaround) so the DuckDB oracle runs the SAME
  * pattern strings (q45's SQL twin).
  */
object Pii {

  /** local-part@domain.tld — deliberately permissive on the local part
    * (training corpora contain obfuscated variants; over-redacting an
    * address-shaped token is the safe direction for a scrubbing pass).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Four dotted octet-shaped runs. Permissive (matches 999.0.0.1):
    * octet range-checking triples the pattern for no scrubbing value.
    */
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** US social security number, dashed form only. */
  val SsnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  def countEmails(text: Column): Column = regexp_count(text, lit(EmailRe))
  def countIpv4(text: Column): Column = regexp_count(text, lit(Ipv4Re))
  def countSsn(text: Column): Column = regexp_count(text, lit(SsnRe))

  /** All three classes replaced with typed placeholder tags. Email runs
    * first: the other patterns cannot match inside an already-redacted
    * `<EMAIL>` tag, and neither dotted-quad nor dashed-SSN shapes occur
    * inside a matched email (local part and domain never contain four
    * dotted octet runs with word boundaries, nor dashes in 3-2-4 digit
    * groups around `\b`).
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      SsnRe, "<SSN>")

  /** Per-document counts + redacted text. */
  def withPiiStats(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_emails", countEmails(col(textCol)))
      .withColumn("n_ipv4", countIpv4(col(textCol)))
      .withColumn("n_ssn", countSsn(col(textCol)))
      .withColumn("redacted", redact(col(textCol)))
}
