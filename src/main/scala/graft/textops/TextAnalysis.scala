package graft.textops

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis operators for training-data pipelines (SURVEY §7.4.9 /
  * builder brief): language-ID, quality scoring, token counting,
  * fingerprinting. All pure Column expressions (codegen, no UDFs), each
  * with a DuckDB SQL twin for the oracle gate.
  */
object TextAnalysis {

  /** Small per-language stopword lists (public common words). Order is
    * the deterministic tiebreak priority.
    */
  val stopwords: ListMap[String, Seq[String]] = ListMap(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"),
    "es" -> Seq("el", "los", "las", "es", "y", "si", "una", "por", "como", "para"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  /** Whitespace tokens (empty input -> empty array, not [""]). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, typedLit(Seq.empty[String]))
      .otherwise(split(trim(text), "\\s+"))

  /** BPE-ish lexer tokens: alnum runs or single punctuation marks. */
  val lexerPattern = "[A-Za-z0-9]+|[^\\sA-Za-z0-9]"
  def lexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(lexerPattern), lit(0)))

  /** C4-style text cleaning: optionally strip `<...>` tag runs (to a
    * space, so `a<br>b` stays two tokens), remove ASCII control
    * characters (keeping \t\n\r as whitespace), collapse whitespace
    * runs to single spaces, trim. Pure codegen'd regexp chain; every
    * class is written explicitly so the Java-regex (Spark) and RE2
    * (DuckDB oracle) semantics coincide — `\s` itself differs between
    * the two dialects (\x0B). Tag stripping is the regex
    * approximation every large pipeline ships (not an HTML parser):
    * `<[^>]*>` — an unclosed `<` is left in place.
    */
  def cleanText(text: Column, stripTags: Boolean = false): Column = {
    val untagged = if (stripTags) regexp_replace(text, "<[^>]*>", " ") else text
    val noCtl = regexp_replace(untagged,
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    trim(regexp_replace(noCtl, "[ \\t\\n\\r]+", " "))
  }

  /** Markup-to-text extraction — the crawl-pipeline stage ahead of
    * [[cleanText]]: drop `<script>`/`<style>` CONTENT (their bodies
    * are code, not prose — bare tag-stripping would leak them into
    * the text), drop `<!-- -->` comments, strip remaining tags to a
    * space, decode the common entities, collapse whitespace. The
    * regex approximation every large pipeline ships (C4/CCNet-grade),
    * NOT an HTML5 parser: unclosed constructs stay in place.
    *
    * Entity decode is a chained literal replace with `&amp;` LAST —
    * equivalent to a strict single-pass `&name;` decoder (a
    * double-encoded `&amp;lt;` yields the literal text `&lt;`, the
    * standard one-pass behavior). Every regex is written to mean the
    * same thing in Java regex (Spark) and RE2 (the DuckDB oracle):
    * inline `(?is)` flags, explicit whitespace classes, non-greedy
    * block bodies. Pure codegen'd builtin chain — no UDF, no custom
    * expression.
    */
  def stripMarkup(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val entities = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    val decoded = entities.foldLeft(noTags) { case (acc, (e, r)) =>
      regexp_replace(acc, e, r)
    }
    trim(regexp_replace(decoded, "[ \\t\\n\\r\\f\\x0B]+", " "))
  }

  /** Unicode NFC normalization (UAX #15) — the canonicalization step a
    * crawl pipeline runs BEFORE any hashing/dedup/token work: the same
    * text arriving composed (`é`) and decomposed (`e`+U+0301) from two
    * sources would otherwise hash apart and dodge every dedup family.
    * NFC (not NFK*) because it is content-preserving — compatibility
    * folding changes text (ﬁ -> fi) and belongs in lossy cleaning.
    *
    * Scale shape: one narrow codegen'd pass. The Java-side helper fast
    * paths pure-ASCII input (the overwhelming majority of crawl bytes)
    * with a byte scan — no decode, no allocation, the input UTF8String
    * passes through — and quick-checks already-normalized non-ASCII
    * (`Normalizer.isNormalized`) before paying for a rewrite. Both
    * Spark (java.text.Normalizer) and the DuckDB oracle
    * (`nfc_normalize`, utf8proc) implement the same UAX #15 algorithm,
    * whose results are stability-guaranteed across Unicode versions —
    * which is what makes an exact cross-engine oracle possible at all.
    */
  def nfc(s: UTF8String): UTF8String = {
    if (s == null) return null
    val n = s.numBytes
    var i = 0
    var ascii = true
    while (ascii && i < n) { ascii = (s.getByte(i) & 0x80) == 0; i += 1 }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  case class NfcExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "nfc_normalize"
    override def nullSafeEval(input: Any): Any =
      nfc(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.textops.TextAnalysis.nfc($input);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column form of [[nfc]]. */
  def nfc_normalize(text: Column): Column =
    GraftInterop.column(NfcExpr(GraftInterop.expression(text)))

  /** Accent stripping: NFD-decompose, drop combining marks (Mn), NFC
    * recompose — matching-insensitive text normalization for dedup
    * keys and search (résumé == resume). Deliberately conservative:
    * case, ß, ligatures, and non-Latin scripts pass through (this is
    * mark removal, not transliteration). [[nfc]]'s zero-copy ASCII
    * fast path applies — the overwhelming majority of crawl bytes
    * never decode. DuckDB's `strip_accents` (utf8proc) computes the
    * same function on the mark-bearing repertoire (cross-checked in
    * TextAnalysisSpec; singleton compatibility decompositions like
    * OHM SIGN, which utf8proc leaves alone, are excluded from the
    * oracle fixture by construction).
    */
  def stripAccents(s: UTF8String): UTF8String = {
    if (s == null) return null
    val n = s.numBytes
    var i = 0
    var ascii = true
    while (ascii && i < n) { ascii = (s.getByte(i) & 0x80) == 0; i += 1 }
    if (ascii) return s
    val str = s.toString
    val nfd = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val cp = nfd.codePointAt(j)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    UTF8String.fromString(
      java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC))
  }

  case class StripAccentsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "strip_accents"
    override def nullSafeEval(input: Any): Any =
      stripAccents(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.textops.TextAnalysis.stripAccents($input);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column form of [[stripAccents]]. */
  def strip_accents(text: Column): Column =
    GraftInterop.column(StripAccentsExpr(GraftInterop.expression(text)))

  /** Closed abbreviation list whose trailing period never ends a
    * sentence (the jusText/NLTK-style short list; case-sensitive, the
    * listed forms only). Shared with the q107 oracle so both engines
    * protect exactly the same set.
    */
  val sentenceAbbrevs: Seq[String] = Seq(
    "Mr", "Mrs", "Ms", "Dr", "Prof", "Sr", "Jr", "St", "vs", "etc",
    "al", "Inc", "Ltd", "Co", "Corp", "Fig")

  private val ProtP = "\u0001" // protected (non-boundary) period
  private val ProtE = "\u0002" // protected ellipsis

  /** Sentence segmentation as a pure Column expression (array<string>):
    * split on terminator runs `[.!?]+` with abbreviation / decimal /
    * ellipsis protection, trim, drop empties. Engine-identical by
    * construction — every rule uses only regex features Java regex and
    * RE2 (the DuckDB oracle) share (no lookaround: RE2 has none;
    * `\b` is the ASCII word boundary in both):
    *
    *  1. strip U+0001/U+0002 from the input (the two placeholder code
    *     points; never legitimate text),
    *  2. `...` runs become a placeholder — an ellipsis trails off, it
    *     does not end the sentence (a 4th+ dot still terminates),
    *  3. decimals `3.14` protect the interior period (two passes, so
    *     alternating chains like `1.2.3` protect fully — a single
    *     global pass cannot rescan the overlap),
    *  4. [[sentenceAbbrevs]] + `e.g.`/`i.e.` protect their periods,
    *  5. split `[.!?]+`, trim, restore placeholders, drop empties.
    *
    * Protected periods are RESTORED in the output ("Dr. Smith stayed"
    * keeps its dot); terminators themselves are dropped (the split
    * convention, q107's original shape). Heuristic by design — an
    * unlisted abbreviation splits — but the rule set is the classic
    * public one and each rule is pinned by SentencesSpec.
    */
  def sentences(text: Column): Column = {
    val s0 = regexp_replace(coalesce(text, lit("")), "[\\x01\\x02]", "")
    val s1 = regexp_replace(s0, "\\.\\.\\.", ProtE)
    val dec = "([0-9])\\.([0-9])"
    val s2 = regexp_replace(regexp_replace(s1, dec, "$1" + ProtP + "$2"),
      dec, "$1" + ProtP + "$2")
    val s3 = regexp_replace(s2,
      "\\b(" + sentenceAbbrevs.mkString("|") + ")\\.", "$1" + ProtP)
    val s4 = regexp_replace(s3, "\\b([ei])\\.([ge])\\.",
      "$1" + ProtP + "$2" + ProtP)
    filter(
      transform(split(s4, "[.!?]+"),
        x => trim(regexp_replace(regexp_replace(x, ProtE, "..."), ProtP, "."))),
      x => length(x) > 0)
  }

  /** Count of tokens present in `words` (with repeats). */
  def stopwordCount(toks: Column, words: Seq[String]): Column = {
    val set = typedLit(words)
    aggregate(toks, lit(0),
      (acc, t) => acc + when(array_contains(set, t), 1).otherwise(0))
  }

  /** Language-ID: argmax of per-language stopword hit counts over the
    * lowered tokens; 'und' when nothing matches; ties break in
    * [[stopwords]] order. A real deployment swaps in char-n-gram
    * profiles — the operator shape (per-language score -> argmax) is the
    * same.
    */
  def languageId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scores = stopwords.map { case (lang, words) =>
      lang -> stopwordCount(toks, words)
    }
    val maxScore = greatest(scores.values.toSeq: _*)
    scores.foldLeft(when(maxScore <= 0, "und")) { case (acc, (lang, s)) =>
      acc.when(s === maxScore, lang)
    }.otherwise("und")
  }

  /** Quality signals + composite score in [0,1] (length, punctuation
    * density, stopword density — the classic cheap quality heuristics).
    */
  def nTokens(text: Column): Column = size(tokens(text))
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(size(regexp_extract_all(text, lit("[^\\w\\s]"), lit(0))).cast("double") / length(text))
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    when(size(toks) === 0, 0.0)
      .otherwise(stopwordCount(toks, stopwords("en")).cast("double") / size(toks))
  }
  def qualityScore(text: Column): Column = {
    val lenScore = least(nTokens(text).cast("double") / 100.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 10.0, lit(1.0))
    round4(lenScore * 0.4 + stopScore * 0.3 + punctScore * 0.3)
  }

  /** 4-decimal rounding as floor(x*1e4 + 0.5)/1e4 — pure IEEE double
    * arithmetic, so Spark and DuckDB agree bit-for-bit even at exact
    * .xxxx5 boundaries (Spark's BigDecimal HALF_UP and DuckDB's round
    * disagree there; sf0.1 doc 1828 hit quality = 0.84025 exactly).
    */
  def round4(c: Column): Column = floor(c * 10000.0 + 0.5) / 10000.0

  /** Token-repetition ratio in [0,1]: 1 − distinct/total over the
    * lowered tokens (0 for empty text) — the classic cheap
    * repetition-quality signal for training-data filtering (boilerplate
    * and keyword-stuffed documents score high).
    */
  def repetitionRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    round4(when(size(toks) === 0, 0.0)
      .otherwise(lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks)))
  }

  /** Content-normalized fingerprint: md5 over the lowered text with
    * everything but [a-z0-9] stripped — byte-identical in DuckDB
    * (`md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))`).
    */
  def fingerprint(text: Column): Column =
    md5(to_binary(regexp_replace(lower(text), "[^a-z0-9]", ""), lit("utf-8")))

  /** Thresholds for [[qualityVerdict]] — the classic C4/Gopher-style
    * cheap-rule bundle, with conventional defaults.
    */
  /** `deflateBounds = Some((lo, hi))` switches on the
    * [[Compression]] gate: a doc whose deflate ratio_x10000 falls
    * below `lo` flags `too_compressible` (template spam), above `hi`
    * flags `incompressible` (binary/base64-as-text). Off by default —
    * the verdict struct then stays byte-identical to the pre-gate
    * shape (q52's oracle contract).
    */
  final case class QualityThresholds(
      minTokens: Int = 10,
      maxTokens: Int = 100000,
      maxPunctRatio: Double = 0.3,
      minStopRatio: Double = 0.02,
      maxRepetitionRatio: Double = 0.6,
      deflateBounds: Option[(Int, Int)] = None)

  /** Composite training-corpus quality FILTER (not just the scores):
    * per document, every failed rule in fixed order as a
    * comma-joined `fail_reasons` string plus the `keep` verdict —
    * the auditable form a curation pipeline wants (how much did each
    * rule cost me?) rather than a bare boolean. All signals are the
    * round4'd ratios the oracles pin, so the verdict is engine-exact.
    * One narrow codegen'd pass, no shuffle.
    */
  def qualityVerdict(
      text: Column, t: QualityThresholds = QualityThresholds()): Column = {
    val nt = nTokens(text)
    val pr = round4(punctRatio(text))
    val sr = round4(stopwordRatio(text))
    val rr = repetitionRatio(text)
    val base = Seq(
      when(nt < t.minTokens, lit("too_short")),
      when(nt > t.maxTokens, lit("too_long")),
      when(pr > t.maxPunctRatio, lit("too_much_punct")),
      when(sr < t.minStopRatio, lit("too_few_stopwords")),
      when(rr > t.maxRepetitionRatio, lit("too_repetitive")))
    val (reasons, extraFields) = t.deflateBounds match {
      case None => (array(base: _*), Seq.empty[Column])
      case Some((lo, hi)) =>
        val ratio = Compression.compressionSignal(text).getField("ratio_x10000")
        (array(base ++ Seq(
          when(ratio < lo, lit("too_compressible")),
          when(ratio > hi, lit("incompressible"))): _*),
          Seq(ratio.as("deflate_ratio_x10000")))
    }
    struct((Seq(
      nt.as("n_tokens"), pr.as("punct_ratio"), sr.as("stop_ratio"),
      rr.as("rep_ratio")) ++ extraFields ++ Seq(
      array_join(filter(reasons, r => r.isNotNull), ",").as("fail_reasons"),
      (size(filter(reasons, r => r.isNotNull)) === 0).as("keep"))): _*)
  }

  /** Character-unigram Shannon entropy, ROW-LOCAL and codegen'd: the
    * q130 signal (`H = log2(N) − Σ n·log2(n) / N`) without q130's
    * per-(doc, char) shuffle, so a composed pipeline (q131) can gate
    * on entropy as one narrow projection. The tight loop sorts the
    * doc's code points and folds run lengths ASCENDING — the same
    * addition order as q130's sorted-histogram fold, with the same
    * log2 arithmetic Spark's codegen emits (`StrictMath.log(x) /
    * StrictMath.log(2)`), so the two formulations (and the DuckDB
    * `list(n ORDER BY c)` oracle: VARCHAR order = UTF-8 byte order =
    * code-point order) agree bit-for-bit. NULL in, or empty text,
    * yields NULL (q130 has no row for a charless doc).
    */
  def charEntropy(text: Column): Column =
    when(length(text) > 0,
      GraftInterop.column(CharEntropyExpr(GraftInterop.expression(text))))

  /** Tight-loop worker for [[CharEntropyExpr]]; NaN on empty input
    * (unreachable behind [[charEntropy]]'s length guard).
    */
  def charEntropyValue(s: UTF8String): Double = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return Double.NaN
    java.util.Arrays.sort(cps)
    def log2(x: Double): Double =
      java.lang.StrictMath.log(x) / java.lang.StrictMath.log(2)
    var acc = 0.0
    var run = 1
    var i = 1
    while (i < n) {
      if (cps(i) == cps(i - 1)) run += 1
      else { acc += run.toDouble * log2(run.toDouble); run = 1 }
      i += 1
    }
    acc += run.toDouble * log2(run.toDouble)
    log2(n.toDouble) - acc / n.toDouble
  }

  case class CharEntropyExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "char_entropy"

    override def nullSafeEval(input: Any): Any =
      TextAnalysis.charEntropyValue(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.textops.TextAnalysis.charEntropyValue($input);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
