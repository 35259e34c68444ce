package graft.textops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins [[CodeFilter.lineStats]]: the structural is_code verdict on
  * the two planted q169 fixture docs, the published The Stack file
  * rules (auto-generated exclusion, max-line bound, alnum floor),
  * prose/empty/null behavior, and the exact integral ratios.
  */
class CodeFilterSpec extends GraftSparkSpec {

  private def statsOf(text: String): Row = {
    import spark.implicits._
    CodeFilter.lineStats(
      Seq((1L, Option(text))).toDF("id", "text"), "id", "text")
      .collect().head
  }

  private def field[T](r: Row, name: String): T =
    r.getAs[T](name)

  test("auto-generated C doc: is_code, autogen, stack_pass=false") {
    val r = statsOf(graft.SparkEntry.cCodeDoc)
    assert(field[Long](r, "n_lines") === 7L)
    assert(field[Long](r, "kw_hits") === 4L)          // #include, int, return, for (
    assert(field[Long](r, "punctl_x10000") === 50000L / 7L) // 5 of 7 lines
    assert(field[Boolean](r, "autogen"))
    assert(field[Boolean](r, "is_code"))
    assert(!field[Boolean](r, "stack_pass"))          // killed by autogen alone
  }

  test("clean indented Python doc: is_code via indentation, stack_pass=true") {
    val r = statsOf(graft.SparkEntry.pyCodeDoc)
    assert(field[Long](r, "n_lines") === 6L)
    assert(field[Long](r, "kw_hits") === 3L)          // def, import, return
    assert(field[Long](r, "indent_x10000") === 50000L / 6L) // 5 of 6 lines
    assert(field[Long](r, "punctl_x10000") === 0L)
    assert(!field[Boolean](r, "autogen"))
    assert(field[Boolean](r, "is_code"))
    assert(field[Boolean](r, "stack_pass"))
  }

  test("prose is not code; a planted 1200-char line trips the max-line rule") {
    val prose = statsOf("plain words with no structure at all")
    assert(!field[Boolean](prose, "is_code"))
    assert(field[Long](prose, "n_lines") === 1L)

    val longLine = statsOf("short intro\n" + "z" * 1200)
    assert(field[Long](longLine, "max_line_len") === 1200L)
    assert(!field[Boolean](longLine, "stack_pass"))
  }

  test("keyword lexicon needs >= 2 hits even with code-shaped lines") {
    // punct-terminated lines but only one keyword: not code
    val r = statsOf("x = 1;\ny = 2;\nint z;")
    assert(field[Long](r, "punctl_x10000") === 10000L)
    assert(field[Long](r, "kw_hits") === 1L)
    assert(!field[Boolean](r, "is_code"))
  }

  test("empty and null text: one empty line, zero ratios, no verdicts") {
    for (t <- Seq("", null: String)) {
      val r = statsOf(t)
      assert(field[Long](r, "n_lines") === 1L)
      assert(field[Long](r, "max_line_len") === 0L)
      assert(field[Long](r, "avg_len_x100") === 0L)
      assert(field[Long](r, "alnum_x10000") === 0L)
      assert(!field[Boolean](r, "is_code"))
      assert(!field[Boolean](r, "stack_pass")) // alnum floor unmet
    }
  }

  test("The Stack avg-line rule: 100-char lines pass, 101-char lines fail") {
    val ok = statsOf(Seq.fill(3)("int x = 1; " + "a" * 89).mkString("\n") +
      "\nint y;\nreturn x;")
    assert(field[Long](ok, "avg_len_x100") <= 10000L)
    val tooWide = statsOf(Seq.fill(5)("int x = 1; " + "a" * 95).mkString("\n"))
    assert(field[Long](tooWide, "avg_len_x100") > 10000L)
    assert(!field[Boolean](tooWide, "stack_pass"))
  }
}
