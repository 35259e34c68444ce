package graft.functions

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization — the key-normalization step BEFORE URL-level
  * dedup of a crawl corpus (canonicalize-then-dedup removes the
  * fetch-level duplicates that content dedup would otherwise pay a
  * full near-dup pass for). One codegen'd pass, null-safe, no UDF.
  *
  * The canonical form, applied in order:
  *
  *  1. trim surrounding whitespace; strip the fragment (first `#` on);
  *  2. no `scheme://` prefix -> return the result of step 1 unchanged
  *     (not a hierarchical URL; never null out user data);
  *  3. lowercase the scheme and the authority (host[:port]) — path and
  *     query case is preserved (RFC 3986 §6.2.2.1: only scheme/host
  *     are case-insensitive);
  *  4. drop the scheme's default port (`:80` for http, `:443` for
  *     https — a NON-default port is kept verbatim);
  *  5. resolve `.` / `..` path segments with RFC 3986 §5.2.4
  *     remove_dot_segments (the real stack algorithm — `//` empty
  *     segments are preserved, a leading `/../` pops nothing); an
  *     empty path becomes `/`;
  *  6. drop tracking query parameters: every `name[=value]` whose NAME
  *     matches `trackingNameRegex` (default `utm_[^=]*|gclid|fbclid|
  *     ref`, anchored), plus empty params; the survivors keep their
  *     original order and text; an emptied query drops its `?`.
  *
  * Reference behavior context: the reference normalizes URIs only for
  * risk scoring (risk.py:230-261 — decode + lowercase); URL-level
  * dedup keyed on a canonical form is the beyond-reference training-
  * pipeline operator built on the same machinery family ([[UriCodec]]
  * holds the percent-decode side; canonicalization deliberately does
  * NOT percent-decode — decoding changes which bytes a fetcher
  * requests, normalization must not).
  */
object UrlCanon {

  /** Default tracking-parameter NAME regex (match is anchored). */
  val DefaultTracking = "utm_[^=]*|gclid|fbclid|ref"

  /** Canonicalization as a column: `canonicalize_url(col("url"))`. */
  def canonicalize_url(url: Column, trackingNameRegex: String = DefaultTracking): Column =
    GraftInterop.column(CanonicalizeUrl(GraftInterop.expression(url), trackingNameRegex))

  case class CanonicalizeUrl(child: Expression, trackingNameRegex: String)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "canonicalize_url"

    override def nullSafeEval(input: Any): Any =
      UrlCanon.eval(input.asInstanceOf[UTF8String], trackingNameRegex)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cls = "graft.functions.UrlCanon"
      val re = ctx.addReferenceObj("trackingRe", trackingNameRegex, "java.lang.String")
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = $cls.eval($input, $re);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Compiled anchored name patterns, cached per regex string (one
    * tiny map per executor; the set of distinct configs is the set of
    * distinct query shapes, not data-sized).
    */
  private val patternCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()

  private def namePattern(re: String): java.util.regex.Pattern =
    patternCache.computeIfAbsent(re,
      r => java.util.regex.Pattern.compile("(?:" + r + ")"))

  /** Static entry point for generated code (Java-callable). */
  def eval(input: UTF8String, trackingNameRegex: String): UTF8String =
    UTF8String.fromString(canonicalize(input.toString, trackingNameRegex))

  def canonicalize(url: String, trackingNameRegex: String = DefaultTracking): String = {
    var s = url.trim
    val hash = s.indexOf('#')
    if (hash >= 0) s = s.substring(0, hash)
    val schemeEnd = s.indexOf("://")
    if (schemeEnd <= 0 || !isScheme(s, schemeEnd)) return s
    val scheme = s.substring(0, schemeEnd).toLowerCase(java.util.Locale.ROOT)
    val after = s.substring(schemeEnd + 3)
    var aEnd = 0
    while (aEnd < after.length && after.charAt(aEnd) != '/' && after.charAt(aEnd) != '?')
      aEnd += 1
    var auth = after.substring(0, aEnd).toLowerCase(java.util.Locale.ROOT)
    if (scheme == "http" && auth.endsWith(":80")) auth = auth.dropRight(3)
    else if (scheme == "https" && auth.endsWith(":443")) auth = auth.dropRight(4)
    val rest = after.substring(aEnd)
    val qIdx = rest.indexOf('?')
    val rawPath = if (qIdx >= 0) rest.substring(0, qIdx) else rest
    val path = {
      val p = removeDotSegments(rawPath)
      if (p.isEmpty) "/" else p
    }
    val query =
      if (qIdx < 0) ""
      else filterQuery(rest.substring(qIdx + 1), trackingNameRegex)
    scheme + "://" + auth + path + (if (query.isEmpty) "" else "?" + query)
  }

  private def isScheme(s: String, end: Int): Boolean = {
    if (!((s.charAt(0) >= 'a' && s.charAt(0) <= 'z') ||
        (s.charAt(0) >= 'A' && s.charAt(0) <= 'Z'))) return false
    var i = 1
    while (i < end) {
      val c = s.charAt(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'
      if (!ok) return false
      i += 1
    }
    true
  }

  /** RFC 3986 §5.2.4 remove_dot_segments, verbatim: the input buffer
    * shrinks from the front, complete segments append to the output,
    * `/..` pops the output's last segment. Preserves empty (`//`)
    * segments; a leading `/../` pops nothing.
    */
  private[functions] def removeDotSegments(input: String): String = {
    var in = input
    val out = new java.lang.StringBuilder(input.length)
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = in.substring(2)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = in.substring(3); popSegment(out) }
      else if (in == "/..") { in = "/"; popSegment(out) }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.charAt(0) == '/') 1 else 0
        val idx = in.indexOf('/', start)
        val end = if (idx < 0) in.length else idx
        out.append(in, 0, end)
        in = in.substring(end)
      }
    }
    out.toString
  }

  private def popSegment(out: java.lang.StringBuilder): Unit = {
    val i = out.lastIndexOf("/")
    out.setLength(if (i < 0) 0 else i)
  }

  private def filterQuery(q: String, trackingNameRegex: String): String = {
    if (q.isEmpty) return ""
    val p = namePattern(trackingNameRegex)
    val parts = q.split("&", -1)
    val kept = new scala.collection.mutable.ArrayBuffer[String](parts.length)
    var i = 0
    while (i < parts.length) {
      val part = parts(i)
      if (part.nonEmpty) {
        val eq = part.indexOf('=')
        val name = if (eq >= 0) part.substring(0, eq) else part
        if (!p.matcher(name).matches()) kept += part
      }
      i += 1
    }
    kept.mkString("&")
  }
}
