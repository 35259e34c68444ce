package graft.cli

import org.scalatest.funsuite.AnyFunSuite

/** Arg-parser surface pins for the flags the reference exposes
  * (triage.py argparse block) — pure parsing, no SparkSession.
  */
class TriageArgsSpec extends AnyFunSuite {

  private def p(argv: String*): Triage.Args = Triage.parse(argv.toList, Triage.Args())

  test("--ignore-extension replaces the extension ignore list (triage.py:160-166)") {
    val a = p("--path", "x", "--ignore-extension", ".js,.css,.jpg")
    assert(a.filters.extensionIgnore == Seq(".js", ".css", ".jpg"))
    // absent flag leaves the config default to apply downstream
    assert(p("--path", "x").filters.extensionIgnore.isEmpty)
  }

  test("--output-format csv|table and -o alias (triage.py:62-65)") {
    assert(p("--path", "x", "--output-format", "csv").csv)
    assert(p("--path", "x", "-o", "csv").csv)
    assert(!p("--path", "x", "--output-format", "table").csv)
    // --output-format table after --csv wins (last flag, argparse-style)
    assert(!p("--path", "x", "--csv", "-o", "table").csv)
    val e = intercept[IllegalArgumentException](p("--path", "x", "-o", "json"))
    assert(e.getMessage.contains("csv or table"))
  }

  test("--limit defaults bounded; 0 means unbounded") {
    assert(p("--path", "x").limit == Triage.Args.DefaultLimit)
    assert(p("--path", "x", "--limit", "0").limit == 0)
    assert(p("--path", "x", "--limit", "17").limit == 17)
  }
}
