package graft.textops

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class BpeSpec extends GraftSparkSpec {
  import spark.implicits._

  private def counts(texts: Seq[String], merges: Seq[(String, String)]): Seq[Int] =
    texts.toDF("text")
      .select(Bpe.bpe_token_count(spark, col("text"), merges).as("n"))
      .collect().map(_.getInt(0)).toSeq

  test("merge chain follows rank order: 'the' collapses to one token") {
    // (t,h) rank 0 -> [th, e]; (th,e) rank 1 -> [the]
    assert(counts(Seq("the"), Bpe.defaultMerges) == Seq(1))
    // three words, each fully merged independently
    assert(counts(Seq("the the\nthe"), Bpe.defaultMerges) == Seq(3))
  }

  test("all occurrences of the best pair merge left-to-right without overlap") {
    // "aaa" under (a,a): first and second 'a' merge, the third survives
    assert(counts(Seq("aaa"), Seq(("a", "a"))) == Seq(2))
    assert(counts(Seq("aaaa"), Seq(("a", "a"))) == Seq(2)) // [aa][aa]
    // second round then merges the two "aa" symbols
    assert(counts(Seq("aaaa"), Seq(("a", "a"), ("aa", "aa"))) == Seq(1))
  }

  test("rank priority beats positional order") {
    // (b,c) outranks (a,b): abc -> [a, bc] -> [abc] via (a,bc); a
    // positional-first bug would take (a,b) -> [ab, c] -> 2 tokens
    assert(counts(Seq("abc"), Seq(("b", "c"), ("a", "b"), ("a", "bc"))) == Seq(1))
  }

  test("words without ranked pairs count their code points; empty text is 0") {
    assert(counts(Seq("xyz zz"), Bpe.defaultMerges.take(2)) == Seq(5))
    assert(counts(Seq(""), Bpe.defaultMerges) == Seq(0))
    assert(counts(Seq("   \t\n  "), Bpe.defaultMerges) == Seq(0))
    // null text stays null
    val r = Seq[(java.lang.Long, String)]((1L, null)).toDF("id", "text")
      .select(Bpe.bpe_token_count(spark, col("text"), Bpe.defaultMerges).as("n"))
      .collect().head
    assert(r.isNullAt(0))
  }

  test("surrogate pairs count as single symbols") {
    // two astral code points (4 UTF-16 chars), no merges apply
    assert(counts(Seq(new String(Character.toChars(0x1F600)) +
      new String(Character.toChars(0x1F601))), Bpe.defaultMerges) == Seq(2))
  }

  test("matches the straightforward reference on mixed text") {
    // independent in-test reference: Vector symbols + minBy, the same
    // algorithm OracleGen.refBpeCount embeds in the q55 oracle
    def ref(text: String): Int = {
      val rank = Bpe.defaultMerges.zipWithIndex.toMap
      text.split("\\s+").iterator.filter(_.nonEmpty).map { w =>
        var syms = w.map(_.toString).toVector
        var done = false
        while (!done && syms.length > 1) {
          val ranked = syms.zip(syms.tail).flatMap(p => rank.get(p).map(r => (r, p)))
          if (ranked.isEmpty) done = true
          else {
            val (_, (a, b)) = ranked.minBy(_._1)
            val buf = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                buf += (a + b); i += 2
              } else { buf += syms(i); i += 1 }
            }
            syms = buf.result()
          }
        }
        syms.length
      }.sum
    }
    val texts = Seq(
      "the rain in spain stays mainly on the plain",
      "concatenation of internationalization and representation",
      "a b c d e 10 20 100 2000",
      "whatever you do not have is not there")
    assert(counts(texts, Bpe.defaultMerges) == texts.map(ref))
  }
}
