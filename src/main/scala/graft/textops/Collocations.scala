package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Collocation mining — pointwise mutual information over adjacent
  * token pairs (Church & Hanks 1990), the classic corpus-exploration
  * signal for multi-word expressions ("new york", "machine learning")
  * and the phrase-vocabulary step tokenizer pipelines use before
  * training (word2vec's phrase pass, Mikolov et al. 2013 §4).
  *
  *   pmi(a,b) = ln p(ab) − ln p(a) − ln p(b)
  *            = ln c(ab) − ln B − ln c(a) − ln c(b) + 2·ln N
  *
  * with c(·) corpus counts, B total bigrams, N total tokens. The ln
  * chain is evaluated in ONE fixed left-to-right association shared
  * verbatim with the DuckDB oracle (the q77/q124 ln discipline), and
  * ranking is on the 4-rounded value with the (a, b) text tiebreak.
  *
  * 100 TB shape: token and bigram counts are two hash aggregations
  * with map-side partial combine (bigrams come from a zip-shift of
  * each doc's own token array — no self-join, no window); the scoring
  * join runs over the REDUCED (bigram, count) frame, with the two
  * unigram marginals attached by equi-joins AQE broadcasts when the
  * vocabulary measures small. The final top-k window sees only pairs
  * that survived `minCount` — the corpus-sized frames never reach it.
  */
object Collocations {

  /** Adjacent-pair PMI top-k:
    * (term_a, term_b, c_ab, c_a, c_b, pmi, rank).
    */
  def pmiTopK(
      docs: DataFrame, textCol: String,
      minCount: Long = 5, k: Int = 50): DataFrame = {
    require(minCount >= 1, s"pmiTopK: minCount must be >= 1 (got $minCount)")
    require(k > 0, s"pmiTopK: k must be positive (got $k)")
    val ts = docs.select(TextIndex.terms(col(textCol)).as("_cl_ts"))

    val uni = ts.select(explode(col("_cl_ts")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val nTok = uni.agg(sum(col("c")).as("n_tok"))

    // bigrams by zipping the token array with its own 1-shifted tail;
    // the null pad of the final position drops
    val big = ts.select(explode(zip_with(
        col("_cl_ts"),
        slice(col("_cl_ts"), lit(2), greatest(size(col("_cl_ts")) - 1, lit(0))),
        (a, b) => struct(a.as("a"), b.as("b")))).as("_p"))
      .filter(col("_p.b").isNotNull)
      .groupBy(col("_p.a").as("term_a"), col("_p.b").as("term_b"))
      .agg(count(lit(1)).as("c_ab"))
    val nBig = big.agg(sum(col("c_ab")).as("n_big"))

    val scored = big.filter(col("c_ab") >= minCount)
      .join(uni.select(col("term").as("term_a"), col("c").as("c_a")), "term_a")
      .join(uni.select(col("term").as("term_b"), col("c").as("c_b")), "term_b")
      .crossJoin(broadcast(nTok))
      .crossJoin(broadcast(nBig))
      .withColumn("pmi", round(
        log(col("c_ab").cast("double")) - log(col("n_big").cast("double")) -
          log(col("c_a").cast("double")) - log(col("c_b").cast("double")) +
          log(col("n_tok").cast("double")) + log(col("n_tok").cast("double")),
        4))
    val w = Window.orderBy(col("pmi").desc, col("term_a").asc, col("term_b").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("term_a", "term_b", "c_ab", "c_a", "c_b", "pmi", "rank")
  }
}
