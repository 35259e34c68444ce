package graft.textops

import org.apache.spark.sql.{Column, GraftInterop}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-n-gram language ID — the classic profile-overlap heuristic
  * (the brief's "n-gram heuristic" variant; [[TextAnalysis.languageId]]
  * is the stopword-count variant and both share the argmax-over-scores
  * shape).
  *
  * Profiles are the distinct char TRIGRAMS of each language's seed
  * vocabulary ([[TextAnalysis.stopwords]]), each word padded with
  * spaces (`" the "` -> `" th"`, `"the"`, `"he "`) so word boundaries
  * discriminate. A document scores `|distinct doc trigrams ∩ profile|`
  * per language; argmax wins, ties break in stopwords order, no
  * overlap -> "und".
  *
  * The whole computation is one expression pass over the lowered text
  * (trigram set via a hash set of 24-bit-packed... no — trigrams can be
  * any chars, so a HashSet[String] over a bounded profile union keeps
  * it simple; profiles total a few hundred trigrams). A DuckDB oracle
  * expresses the identical computation with substr/range list ops
  * (q35), so this variant is fully value-checked, not rows-only.
  */
object LangNgram {

  /** lang -> distinct trigram profile, insertion-ordered like
    * [[TextAnalysis.stopwords]] for deterministic tie-break.
    */
  val profiles: Seq[(String, Set[String])] =
    TextAnalysis.stopwords.toSeq.map { case (lang, words) =>
      lang -> words.flatMap { w =>
        val padded = " " + w + " "
        (0 to padded.length - 3).map(i => padded.substring(i, i + 3))
      }.toSet
    }

  /** Distinct trigrams of the (lowered) text — ALL of them, including
    * space/punct trigrams, mirroring `substr(text, i, 3)` in SQL so the
    * oracle twin computes the identical set. Java String semantics
    * (UTF-16 code units) vs DuckDB's UTF-8 codepoints agree on any
    * BMP text without surrogates; the corpus is checked clean.
    */
  def score(text: String, profile: Set[String]): Int = {
    if (text.length < 3) return 0
    val seen = new java.util.HashSet[String]()
    var c = 0
    var i = 0
    while (i <= text.length - 3) {
      val tri = text.substring(i, i + 3)
      if (profile.contains(tri) && seen.add(tri)) c += 1
      i += 1
    }
    c
  }

  def classify(lowered: String): String = {
    var best = "und"
    var bestScore = 0
    for ((lang, prof) <- profiles) {
      val s = score(lowered, prof)
      if (s > bestScore) { bestScore = s; best = lang } // strict: first lang wins ties
    }
    best
  }

  case class LangIdNgramExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "lang_id_ngram"
    override def nullSafeEval(input: Any): Any =
      UTF8String.fromString(classify(input.asInstanceOf[UTF8String].toString))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, input =>
        s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
           |  graft.textops.LangNgram.classify($input.toString()));""".stripMargin)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def languageIdNgram(text: Column): Column =
    GraftInterop.column(LangIdNgramExpr(GraftInterop.expression(
      org.apache.spark.sql.functions.lower(text))))

  /** DuckDB twin of [[classify]] as a COMPLETE query over `documents` —
    * kept in lockstep with [[profiles]] (the SQL literals are generated
    * from the same data). Scores are computed ONCE each in a subquery
    * and the argmax CASE runs over the named columns; inlining the
    * heavy list pipeline into every pairwise CASE condition would
    * evaluate it O(languages²) times per row (DuckDB does not CSE
    * across CASE branches).
    */
  def oracleSql: String = {
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    val scoreExprs = profiles.zipWithIndex.map { case ((lang, prof), i) =>
      val plist = prof.toSeq.sorted.map(lit).mkString("[", ", ", "]")
      (lang, s"s_$i",
        s"len(list_distinct(list_filter(" +
          s"list_transform(range(1, length(lower(text)) - 1), i -> substr(lower(text), CAST(i AS INT), 3)), " +
          s"t -> list_contains($plist, t))))")
    }
    // strict argmax with first-wins tie-break: lang_i wins iff its score
    // beats every earlier language's and is >= every later one's, score > 0
    val cases = scoreExprs.zipWithIndex.map { case ((lang, sc, _), i) =>
      val beatsEarlier = scoreExprs.take(i).map(p => s"$sc > ${p._2}")
      val geLater = scoreExprs.drop(i + 1).map(p => s"$sc >= ${p._2}")
      val conds = (Seq(s"$sc > 0") ++ beatsEarlier ++ geLater).mkString(" AND ")
      s"WHEN $conds THEN '$lang'"
    }
    val inner = scoreExprs.map { case (_, name, e) => s"$e AS $name" }
      .mkString(", ")
    s"""SELECT doc_id, CASE ${cases.mkString(" ")} ELSE 'und' END AS lang_ngram
       |FROM (SELECT doc_id, $inner FROM documents)""".stripMargin
  }
}
