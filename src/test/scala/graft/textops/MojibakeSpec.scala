package graft.textops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins [[Mojibake]]: round-trip repair of Latin-1 AND Windows-1252
  * mis-decodes over a multilingual repertoire (the independent
  * reference is the JDK's own charset transcoding), the
  * precision-first refusal cases, one-layer-per-pass composability,
  * and the codegen path.
  */
class MojibakeSpec extends GraftSparkSpec {

  private def misdecode(s: String, charset: String): String =
    new String(s.getBytes(StandardCharsets.UTF_8), charset)

  private val repertoire = Seq(
    "café résumé naïve façade",
    "it’s ‘quoted’ — “both kinds” …",
    "Ångström Ḩusáin σύνθεση",
    "日本語テキスト",
    "emoji 😀 stays",
    "mixed: é€™ and ASCII",
    "ž š œ Ÿ € edge chars")

  test("latin-1 mis-decode round-trips for the full repertoire") {
    for (s <- repertoire)
      assert(Mojibake.fix(misdecode(s, "ISO-8859-1")) === s, s"<$s>")
  }

  test("windows-1252 mis-decode round-trips where the decode is lossless") {
    // the JDK cp1252 decoder maps the five UNDEFINED bytes
    // (0x81/0x8D/0x8F/0x90/0x9D) to U+FFFD — such a mis-decode is
    // LOSSY and unrepairable by construction; strings avoiding those
    // bytes round-trip, the rest stay untouched (U+FFFD is outside
    // the byte map)
    val undefined = Set(0x81, 0x8D, 0x8F, 0x90, 0x9D)
    for (s <- repertoire) {
      val lossless = s.getBytes(StandardCharsets.UTF_8)
        .forall(b => !undefined.contains(b & 0xFF))
      val mis = misdecode(s, "windows-1252")
      if (lossless) assert(Mojibake.fix(mis) === s, s"<$s>")
      else assert(Mojibake.fix(mis) === mis, s"lossy must pass through <$s>")
    }
    // ” (UTF-8 E2 80 9D) is the classic lossy case
    val lossy = misdecode("“both kinds”", "windows-1252")
    assert(lossy.contains('�') && Mojibake.fix(lossy) === lossy)
  }

  test("precision: plain ASCII, genuine accents, and mixed scripts pass through") {
    assert(Mojibake.fix("plain ascii only") === "plain ascii only")
    // genuine Latin-1 content: 0xE9 + ASCII is not valid UTF-8
    assert(Mojibake.fix("café already correct") === "café already correct")
    assert(Mojibake.fix("naïve text") === "naïve text")
    // chars outside Latin-1 + CP1252 repertoire: not a pure mis-decode
    assert(Mojibake.fix("Ã© mixed with 日本語") === "Ã© mixed with 日本語")
    assert(Mojibake.fix("") === "")
  }

  test("double mojibake repairs one layer per pass") {
    val s = "café"
    val twice = misdecode(misdecode(s, "ISO-8859-1"), "ISO-8859-1")
    val once = Mojibake.fix(twice)
    assert(once === misdecode(s, "ISO-8859-1"))
    assert(Mojibake.fix(once) === s)
  }

  test("cp1252 table matches the JDK decoder on every defined byte") {
    for ((c, b) <- Mojibake.cp1252Byte) {
      val viaJdk = new String(Array(b.toByte), "windows-1252")
      assert(viaJdk === c.toString, f"byte 0x$b%02x")
    }
  }

  test("expression (codegen path) matches the driver function") {
    import spark.implicits._
    val rows = repertoire.map(misdecode(_, "windows-1252")) ++
      Seq("ascii", "café genuine")
    val got = rows.toDF("raw")
      .select(Mojibake.fix_mojibake(col("raw")).as("f"))
      .collect().map(_.getString(0)).toSeq
    assert(got === rows.map(Mojibake.fix))
  }
}
