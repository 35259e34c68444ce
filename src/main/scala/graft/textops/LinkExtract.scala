package graft.textops

import org.apache.spark.sql.{Column, DataFrame, GraftInterop}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML outlink extraction + RFC 3986 reference resolution — the
  * WAT-style step between a fetched page ([[graft.sources.WarcCorpus]])
  * and the link graph ([[graft.operators.LinkGraph]]): every crawl
  * pipeline extracts `<a href>` targets, resolves them against the
  * page URL, and aggregates (src_host, dst_host) edges for
  * PageRank-family quality signals (q94/q100/q104).
  *
  * Two halves:
  *
  *  - '''extraction''' ([[rawHrefs]]) is pure codegen'd Column regex
  *    algebra (the [[MainContent]] discipline — every construct means
  *    the same thing in Java regex and RE2, so the DuckDB oracle
  *    replays it verbatim): anchors with a quoted or unquoted `href`
  *    attribute value, in document order;
  *  - '''resolution''' ([[resolve_url]]) is a codegen'd Catalyst
  *    expression implementing RFC 3986 §5.2 transform-references by
  *    hand (the [[graft.functions.UrlCanon]] expression discipline),
  *    sharing §5.2.4 remove_dot_segments semantics. Link-graph
  *    divergences from the RFC, both deliberate and documented:
  *    fragments are ALWAYS dropped (a fragment never reaches a
  *    fetcher), and any result whose scheme is not http/https is
  *    `null` (`javascript:`/`mailto:`/`data:` refs are not edges).
  *
  * 100 TB shape: extraction + resolution are ONE narrow per-row pass
  * (no shuffle, no UDF); the first exchange in the composed pipeline
  * is the host-edge aggregation, which happens AFTER hosts are
  * projected — only (src_host, dst_host) strings shuffle, never page
  * payloads. The independent oracle half is `java.net.URI.resolve`
  * (RFC-correct on the fixture's well-formed repertoire), so engine
  * resolution bugs hash-mismatch against a second implementation.
  */
object LinkExtract {

  /** Anchor-href matcher. One capture: the attribute value, quoted
    * (either quote) or bare. Explicit whitespace classes (`\s` differs
    * Java-vs-RE2 on vertical tab); non-greedy `[^>]*?` scans to the
    * FIRST href inside the tag. The attribute NAME must start at a
    * whitespace boundary — `(?:[^>]*?[ws])?href` — so `data-href=`/
    * `xlink:href=` can never read as an href (a bare `[^>]*?href`
    * matches any attribute name merely ENDING in "href").
    */
  val hrefPattern: String =
    "(?is)<a[ \\t\\n\\r\\f](?:[^>]*?[ \\t\\n\\r\\f])?href[ \\t\\n\\r\\f]*=" +
      "[ \\t\\n\\r\\f]*(\"[^\"]*\"|'[^']*'|[^ \\t\\n\\r\\f>\"']+)"

  /** Raw href attribute values of every `<a>` tag, in document order,
    * surrounding quotes stripped. Empty values survive (resolution
    * nulls them — see [[ResolveUrl]]).
    */
  def rawHrefs(html: Column): Column =
    transform(
      regexp_extract_all(coalesce(html, lit("")), lit(hrefPattern), lit(1)),
      v => regexp_replace(v, "^[\"']|[\"']$", ""))

  /** Full `<a href=…>…</a>` element matcher — [[hrefPattern]] extended
    * through the closing tag (group 1 is still the href value). The
    * non-greedy body stops at the FIRST `</a>`, so an unclosed anchor
    * swallows up to the next close — a well-formed-ness assumption
    * both the engine and the oracle share verbatim.
    */
  val anchorPattern: String = hrefPattern + "[^>]*>.*?</a>"

  /** Whole anchor elements (tag through `</a>`), in document order. */
  def anchorElements(html: Column): Column =
    regexp_extract_all(coalesce(html, lit("")), lit(anchorPattern), lit(0))

  /** Normalized anchor text of one matched element: opening tag and
    * `</a>` stripped, nested tags replaced by spaces, whitespace
    * collapsed, space-trimmed. Every regex construct is Java/RE2
    * common ground — the DuckDB oracle replays these four rewrites
    * verbatim.
    */
  def anchorTextOf(elem: Column): Column =
    trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      elem,
      "(?is)^<a[^>]*>", ""),
      "(?is)</a>$", ""),
      "<[^>]*>", " "),
      "[ \\t\\n\\r\\f]+", " "))

  /** The anchor-text table — [[outlinks]]' shape plus the normalized
    * inner text: idCols ++ (link_idx, href, url, dst_host, anchor),
    * one row per RESOLVABLE closed anchor element. Anchors whose
    * visible text is empty (image links) emit `anchor = ''`. One
    * narrow pass; nothing shuffles.
    */
  def anchorTexts(
      df: DataFrame, idCols: Seq[Column], baseUrl: Column,
      html: Column): DataFrame =
    df.select((idCols :+ baseUrl.as("_base") :+
      posexplode(anchorElements(html)).as(Seq("link_idx", "_elem"))): _*)
      .withColumn("href", regexp_replace(
        regexp_extract(col("_elem"), hrefPattern, 1), "^[\"']|[\"']$", ""))
      .withColumn("url", resolve_url(col("_base"), col("href")))
      .filter(col("url").isNotNull)
      .withColumn("dst_host", graft.operators.Blocklist.urlHost(col("url")))
      .withColumn("anchor", anchorTextOf(col("_elem")))
      .drop("_base", "_elem")
      .withColumn("link_idx", col("link_idx").cast("long"))

  /** Per-target-host anchor aggregation — the link-graph text signal
    * (anchor-text corpora à la DeepMind's anchor datasets; TrustRank
    * features): for every dst_host, the inbound-link count, distinct
    * linking documents, distinct non-empty anchor texts, and the
    * modal anchor by (count desc, text asc).
    *
    * 100 TB shape: both aggregations hash-shuffle on small keys with
    * map-side partial aggregation; the modal-anchor window runs over
    * the already-REDUCED (host, anchor, count) frame — bounded by
    * distinct anchors per host, never by link count — so a host with
    * 10^9 inbound links of 10^3 distinct texts windows 10^3 rows.
    */
  def aggregateAnchors(links: DataFrame, idCol: String): DataFrame = {
    val perHost = links.groupBy(col("dst_host")).agg(
      count(lit(1)).as("n_links"),
      countDistinct(col(idCol)).as("n_docs"),
      countDistinct(when(col("anchor") =!= "", col("anchor"))).as("n_anchors"))
    val perAnchor = links.filter(col("anchor") =!= "")
      .groupBy(col("dst_host"), col("anchor"))
      .agg(count(lit(1)).as("_ax_c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dst_host"))
      .orderBy(col("_ax_c").desc, col("anchor").asc)
    val top = perAnchor.withColumn("_ax_rn", row_number().over(w))
      .filter(col("_ax_rn") === 1)
      .select(col("dst_host"), col("anchor").as("top_anchor"),
        col("_ax_c").as("top_anchor_n"))
    perHost.join(top, Seq("dst_host"), "left")
  }

  /** RFC 3986 §5.2 resolution as a column:
    * `resolve_url(col("base"), col("href"))`. Null when base is not an
    * absolute http(s) URL, when ref is empty, or when the resolved
    * scheme is not http(s).
    */
  def resolve_url(base: Column, ref: Column): Column =
    GraftInterop.column(ResolveUrl(
      GraftInterop.expression(base), GraftInterop.expression(ref)))

  case class ResolveUrl(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "resolve_url"

    override def nullSafeEval(base: Any, ref: Any): Any =
      LinkExtract.evalResolve(
        base.asInstanceOf[UTF8String], ref.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (b, r) =>
        s"""${ev.value} = graft.textops.LinkExtract.evalResolve($b, $r);
           |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Static entry point for generated code (Java-callable); null for
    * non-edges.
    */
  def evalResolve(base: UTF8String, ref: UTF8String): UTF8String = {
    val r = resolve(base.toString, ref.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  /** Parsed RFC 3986 components; absent parts are null (query/
    * authority presence matters to §5.2.2 — "" and null differ).
    */
  private[textops] final case class Parts(
      scheme: String, authority: String, path: String, query: String)

  /** RFC 3986 appendix-B split, by hand (no regex objects in the hot
    * path). Fragment is parsed off and DISCARDED — the link-graph
    * semantics.
    */
  private[textops] def parts(uri: String): Parts = {
    var s = uri
    val hash = s.indexOf('#')
    if (hash >= 0) s = s.substring(0, hash)
    var scheme: String = null
    val colon = s.indexOf(':')
    if (colon > 0 && isScheme(s, colon)) {
      var firstDelim = s.length
      var i = 0
      while (i < colon && firstDelim == s.length) {
        val c = s.charAt(i)
        if (c == '/' || c == '?') firstDelim = i
        i += 1
      }
      if (firstDelim == s.length) { // ':' precedes any '/'/'?'
        scheme = s.substring(0, colon).toLowerCase(java.util.Locale.ROOT)
        s = s.substring(colon + 1)
      }
    }
    var authority: String = null
    if (s.startsWith("//")) {
      var end = 2
      while (end < s.length && s.charAt(end) != '/' && s.charAt(end) != '?')
        end += 1
      authority = s.substring(2, end)
      s = s.substring(end)
    }
    val q = s.indexOf('?')
    val path = if (q >= 0) s.substring(0, q) else s
    val query = if (q >= 0) s.substring(q + 1) else null
    Parts(scheme, authority, path, query)
  }

  private def isScheme(s: String, end: Int): Boolean = {
    val c0 = s.charAt(0)
    if (!((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z'))) return false
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

  /** §5.2.3 merge: base-with-authority + empty base path -> "/"+ref;
    * otherwise base path up to its last "/" (inclusive) + ref.
    */
  private def merge(base: Parts, refPath: String): String =
    if (base.authority != null && base.path.isEmpty) "/" + refPath
    else {
      val i = base.path.lastIndexOf('/')
      if (i < 0) refPath else base.path.substring(0, i + 1) + refPath
    }

  /** §5.2.2 transform-references with the two documented link-graph
    * divergences (fragment drop, non-http(s) -> null). Also null when
    * `baseUri` is itself not absolute-http(s)-with-authority (a crawl
    * row with a bad page URL yields no edges, never garbage), and for
    * empty refs (a self-loop carries no information; Java's
    * RFC-2396-era `URI.resolve("")` quirk is thereby out of scope).
    */
  def resolve(baseUri: String, refUri: String): String = {
    val base = parts(baseUri.trim)
    if (base.scheme == null || base.authority == null ||
        (base.scheme != "http" && base.scheme != "https")) return null
    val ref = parts(refUri.trim)
    var scheme: String = null
    var authority: String = null
    var path: String = null
    var query: String = null
    if (ref.scheme != null) {
      scheme = ref.scheme
      authority = ref.authority
      path = removeDotSegments(ref.path)
      query = ref.query
    } else {
      scheme = base.scheme
      if (ref.authority != null) {
        authority = ref.authority
        path = removeDotSegments(ref.path)
        query = ref.query
      } else {
        authority = base.authority
        if (ref.path.isEmpty) {
          if (ref.query == null && refUri.trim.isEmpty) return null
          path = base.path
          query = if (ref.query != null) ref.query else base.query
        } else if (ref.path.charAt(0) == '/') {
          path = removeDotSegments(ref.path)
          query = ref.query
        } else {
          path = removeDotSegments(merge(base, ref.path))
          query = ref.query
        }
      }
    }
    if (scheme != "http" && scheme != "https") return null
    if (authority == null) return null
    scheme + "://" + authority + path +
      (if (query != null) "?" + query else "")
  }

  /** §5.2.4 remove_dot_segments — same algorithm as
    * [[graft.functions.UrlCanon]]'s private copy (kept separate:
    * canonicalization and resolution are independent operators and
    * the function is 15 lines of public spec).
    */
  private[textops] def removeDotSegments(input: String): String = {
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

  /** The outlink table: idCols ++ (link_idx, href, url, dst_host) —
    * one row per RESOLVABLE anchor (non-edges drop; `link_idx` keeps
    * the pre-drop document-order position so gaps mark dropped refs).
    * One narrow pass; nothing shuffles.
    */
  def outlinks(
      df: DataFrame, idCols: Seq[Column], baseUrl: Column,
      html: Column): DataFrame = {
    // widen: href scan + URL resolution is regex-heavy narrow CPU over
    // the input's partitioning — one task on a single-file bench scan
    // (byte-guarded identity at corpus scale; see Widen)
    val exploded = graft.operators.Widen.widen(df)
      .select((idCols :+ baseUrl.as("_base") :+
        posexplode(rawHrefs(html)).as(Seq("link_idx", "href"))): _*)
    exploded
      .withColumn("url", resolve_url(col("_base"), col("href")))
      .filter(col("url").isNotNull)
      .withColumn("dst_host", graft.operators.Blocklist.urlHost(col("url")))
      .drop("_base")
      .withColumn("link_idx", col("link_idx").cast("long"))
  }
}
