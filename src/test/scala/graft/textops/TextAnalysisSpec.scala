package graft.textops

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class TextAnalysisSpec extends GraftSparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): org.apache.spark.sql.Row =
    Seq(text).toDF("text").select(c).head

  test("language id on multilingual fixtures") {
    val cases = Seq(
      "the cat sat on the mat and it was happy" -> "en",
      "der hund ist nicht mit der katze zu hause" -> "de",
      "le chat est dans la maison et les enfants" -> "fr",
      "el perro es una mascota y los gatos para casa" -> "es",
      "我 的 书 是 在 桌子 上 了" -> "zh",
      "zzz qqq xxx" -> "und",
      "" -> "und")
    for ((t, want) <- cases)
      assert(one(t, TextAnalysis.languageId(col("text"))).getString(0) == want, s"for '$t'")
  }

  test("n-gram language id classifies the same multilingual fixtures") {
    val cases = Seq(
      "the cat sat on the mat and it was happy" -> "en",
      "der hund ist nicht mit der katze zu hause" -> "de",
      "le chat est dans la maison et les enfants" -> "fr",
      "el perro es una mascota y los gatos para casa" -> "es",
      "zzz qqq xxx" -> "und",
      "" -> "und")
    for ((t, want) <- cases)
      assert(one(t, LangNgram.languageIdNgram(col("text"))).getString(0) == want, s"for '$t'")
    // profile trigrams include word-boundary pads, so substrings inside
    // other words don't falsely trigger: "theory" contains "the" but not
    // " the "
    assert(LangNgram.score(" theory theory theory ", LangNgram.profiles.head._2) <
      LangNgram.score(" the the the ", LangNgram.profiles.head._2))
  }

  test("token counts: whitespace vs lexer") {
    val r = Seq("Hello, world! x2").toDF("text").select(
      TextAnalysis.nTokens(col("text")).as("ws"),
      TextAnalysis.lexTokenCount(col("text")).as("lex")).head
    assert(r.getInt(0) == 3)
    // Hello , world ! x2 -> 5 lexer tokens
    assert(r.getInt(1) == 5)
  }

  test("repetition ratio: unique tokens 0, full repeats high, empty 0") {
    assert(one("a b c d", TextAnalysis.repetitionRatio(col("text"))).getDouble(0) == 0.0)
    // "spam spam spam spam" -> 1 - 1/4 = 0.75
    assert(one("spam spam spam spam", TextAnalysis.repetitionRatio(col("text"))).getDouble(0) == 0.75)
    assert(one("", TextAnalysis.repetitionRatio(col("text"))).getDouble(0) == 0.0)
    // case-folded: "The the" counts as a repeat
    assert(one("The the", TextAnalysis.repetitionRatio(col("text"))).getDouble(0) == 0.5)
  }

  test("quality: clean long text beats punctuation soup") {
    val clean = "the quick brown fox jumps over the lazy dog and runs to the hills " * 10
    val soup = "@@!! ## $$%% ^^&&"
    val q1 = one(clean, TextAnalysis.qualityScore(col("text"))).getDouble(0)
    val q2 = one(soup, TextAnalysis.qualityScore(col("text"))).getDouble(0)
    assert(q1 > 0.8 && q2 < 0.3, s"clean=$q1 soup=$q2")
  }

  test("qualityVerdict: ordered fail reasons and keep flag") {
    val clean = "the quick brown fox jumps over the lazy dog and it runs to the green hills"
    val df = Seq(
      (1L, clean),
      (2L, "short text"),                      // 2 tokens -> too_short (has stopwords? no 'the' ... )
      (3L, "@@!! ## $$%% ^^&& :: ;; || ~~ `` ++ == -- ?? !! .. ,, '' \"\" //"),
      (4L, ("spam " * 50).trim))               // 50 tokens, all same -> too_repetitive
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.qualityVerdict(col("text")).as("v"))
      .select(col("doc_id"), col("v.fail_reasons").as("fr"), col("v.keep").as("keep"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
    assert(df(1L) == ("", true))
    assert(df(2L)._1.contains("too_short") && !df(2L)._2)
    // punctuation soup fails multiple rules IN DECLARATION ORDER
    assert(df(3L)._1 ==
      "too_much_punct,too_few_stopwords" || df(3L)._1.startsWith("too_short"),
      s"got ${df(3L)._1}")
    assert(!df(3L)._2)
    assert(df(4L)._1.contains("too_repetitive") && !df(4L)._2)
  }

  test("fingerprint invariant to case/punctuation/whitespace") {
    val df = Seq("Hello,   World!", "hello world", "HELLO-WORLD").toDF("text")
      .select(TextAnalysis.fingerprint(col("text")).as("fp"))
    assert(df.distinct().count() == 1)
  }

  test("empty text edge cases") {
    assert(one("", TextAnalysis.nTokens(col("text"))).getInt(0) == 0)
    assert(one("   ", TextAnalysis.nTokens(col("text"))).getInt(0) == 0)
    assert(one("", TextAnalysis.qualityScore(col("text"))).getDouble(0) == 0.3)
  }

  test("cleanText: tags to spaces, control chars removed, whitespace collapsed") {
    def clean(s: String, tags: Boolean = true): String =
      Seq(s).toDF("text")
        .select(TextAnalysis.cleanText(col("text"), stripTags = tags).as("c"))
        .collect().head.getString(0)
    assert(clean("<p class=\"x\">a</p><br>b") == "a b")
    assert(clean("a\u0007b\u0000c") == "abc") // controls vanish without spacing
    assert(clean("  a\t\tb\r\nc  ") == "a b c")
    assert(clean("a < b > c") == "a c") // regex contract: '< b >' IS a tag run
    assert(clean("a <unclosed", tags = true) == "a <unclosed") // unclosed '<' kept
    assert(clean("<p>kept</p>", tags = false) == "<p>kept</p>") // stripTags off
    assert(clean("\t\u000B\f ") == "") // pure-dirt input -> empty
  }

  test("stripMarkup: block bodies drop before tag stripping; entities single-pass") {
    def strip(s: String): String =
      Seq(s).toDF("text")
        .select(TextAnalysis.stripMarkup(col("text")).as("c"))
        .collect().head.getString(0)
    // script BODY (containing a '<' that is not a tag) vanishes whole;
    // bare tag-stripping would have left "var x = 1 " behind
    assert(strip("<p>a</p><script>var x = 1 < 2;</script>b") == "a b")
    assert(strip("<style>p { color: red }</style>text") == "text")
    assert(strip("a<!-- hidden <b>bold</b> -->z") == "a z")
    // case-insensitive, attribute-carrying, multi-line blocks
    assert(strip("<SCRIPT type=\"module\">\nx\n</SCRIPT>ok") == "ok")
    // entity decode: &amp; last == strict single-pass (double-encoded
    // &amp;lt; becomes the literal text &lt;)
    assert(strip("Tom &amp; Jerry &lt;3 &quot;q&quot; it&#39;s&nbsp;x") ==
      "Tom & Jerry <3 \"q\" it's x")
    assert(strip("&amp;lt;") == "&lt;")
    // unclosed '<' stays (not an HTML parser — the documented contract)
    assert(strip("a <unclosed") == "a <unclosed")
    assert(strip("  <p>  a  </p>  ") == "a")
  }

  test("nfc_normalize: composition, singletons, hangul, reorder, ascii identity") {
    def norm(s: String): String =
      Seq(s).toDF("text")
        .select(TextAnalysis.nfc_normalize(col("text")).as("c"))
        .collect().head.getString(0)
    assert(norm("é") == "é")             // e + combining acute -> é
    assert(norm("é") == "é")              // already composed stays
    assert(norm("Å") == "Å")              // ANGSTROM SIGN -> Å (singleton)
    assert(norm("Ω") == "Ω")              // OHM SIGN -> Ω (singleton)
    assert(norm("가") == "가")        // hangul jamo -> 가
    // canonical reordering: dot-above (ccc 230) after dot-below (ccc
    // 220), even though no precomposed q-form exists
    assert(norm("q̣̇") == "q̣̇")
    assert(norm("plain ascii stays") == "plain ascii stays")
    assert(norm("") == "")
    // null passes through the expression's null-safe path
    val r = Seq(Option.empty[String]).toDF("text")
      .select(TextAnalysis.nfc_normalize(col("text")).as("c")).collect().head
    assert(r.isNullAt(0))
  }

  test("strip_accents: marks drop, non-mark repertoire passes through") {
    def strip(s: String): String =
      Seq(s).toDF("text")
        .select(TextAnalysis.strip_accents(col("text")).as("c"))
        .collect().head.getString(0)
    assert(strip("étude Ångström naïve façade") == "etude Angstrom naive facade")
    assert(strip("é") == "e")            // decomposed input strips too
    assert(strip("Ḩusáin") == "Husain")
    assert(strip("q̣̇") == "q")            // stacked marks, no precomposed form
    // NOT transliteration: case, sharp s, ligatures, other scripts stay
    assert(strip("ß ﬁ Æ") == "ß ﬁ Æ")
    assert(strip("가") == "가")       // hangul jamo recompose, no marks
    assert(strip("plain ascii stays") == "plain ascii stays")
    assert(strip("") == "")
    val r = Seq(Option.empty[String]).toDF("text")
      .select(TextAnalysis.strip_accents(col("text")).as("c")).collect().head
    assert(r.isNullAt(0))
  }

  test("stratifiedSample: per-stratum rates, default applies, nested in global sample") {
    import graft.operators.Sampling
    val docs = (0L until 400L).map(i =>
      (i, if (i % 2 == 0) "en" else if (i % 3 == 0) "zh" else "fr"))
      .toDF("doc_id", "lang")
    val got = Sampling.stratifiedSample(docs, col("doc_id"), col("lang"),
      Map("en" -> 32, "zh" -> 256), defaultKeepBuckets = 0)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // zh rows all kept (256 = every bucket), fr rows all dropped (default 0)
    assert(got.filter(_._2 == "zh").length ==
      (0L until 400L).count(i => i % 2 != 0 && i % 3 == 0))
    assert(!got.exists(_._2 == "fr"))
    // en kept set == the global 32-bucket sample restricted to en rows
    val globalEn = Sampling.deterministicSample(docs, col("doc_id"), 32)
      .filter(col("lang") === "en").collect().map(_.getLong(0)).toSet
    assert(got.filter(_._2 == "en").map(_._1).toSet == globalEn)
  }

  test("multimodal decode: stub path deterministic shapes, kind-dependent fields") {
    val docs = Seq((0L, "abcdef", "en", "s", 6L), (1L, "xy", "en", "s", 2L),
      (2L, "video content here", "en", "s", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = graft.multimodal.Multimodal.fromDocuments(docs)
    val decoded = graft.multimodal.Multimodal.decode(media).collect()
      .map(d => d.media_id -> d).toMap
    // doc 0 is image-kind but carries TEXT bytes: ImageIO can't decode
    // them, so it must take the honest stub fallback, flagged as such
    assert(decoded(0L).kind == "image" && decoded(0L).n_frames == 1 && decoded(0L).sample_rate == 0)
    assert(!decoded(0L).decoded_real)
    assert(decoded(1L).kind == "audio" && decoded(1L).sample_rate == 16000 && !decoded(1L).decoded_real)
    assert(decoded(2L).kind == "video" && decoded(2L).n_frames == 1 + 18 % 240)
    assert(decoded(0L).feature.length == 8)
    // deterministic across runs
    val again = graft.multimodal.Multimodal.decode(media).collect()
      .map(d => d.media_id -> d.feature.toSeq).toMap
    assert(decoded.map { case (k, v) => k -> v.feature.toSeq } == again)
  }

  test("multimodal decode: REAL ImageIO decode of PNG payloads (dims + luminance from the codec)") {
    import graft.multimodal.Multimodal
    // doc_ids congruent 0 mod 3 -> image kind; synthetic payloads are
    // (16 + id%32) x (16 + 7id%32) solid-gray PNGs of level id%256
    val docs = Seq((0L, "ignored", "en", "s", 7L), (3L, "ignored", "en", "s", 7L),
      (300L, "ignored", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.withSyntheticImagePayloads(Multimodal.fromDocuments(docs))
    val decoded = Multimodal.decode(media).collect().map(d => d.media_id -> d).toMap
    for (id <- Seq(0L, 3L, 300L)) {
      val d = decoded(id)
      assert(d.decoded_real, s"image $id did not take the real codec path")
      assert(d.width == 16 + (id % 32).toInt, s"id=$id width=${d.width}")
      assert(d.height == 16 + ((id * 7) % 32).toInt, s"id=$id height=${d.height}")
      assert(d.n_frames == 1 && d.sample_rate == 0)
      // solid-gray image: every band's mean luminance IS the gray level
      assert(d.feature.length == 8 && d.feature.forall(_ == (id % 256).toFloat),
        s"id=$id feature=${d.feature.toSeq}")
    }
    // a hand-built RGB PNG with asymmetric dims decodes to exactly those dims
    val img = new java.awt.image.BufferedImage(37, 11, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val custom = Seq((9L, "image", bos.toByteArray))
      .toDF("media_id", "kind", "bytes")
    val cd = Multimodal.decode(custom).collect().head
    assert(cd.decoded_real && cd.width == 37 && cd.height == 11, s"got $cd")
  }

  test("multimodal decode: REAL WAV decode of audio payloads (rate + frames from the container)") {
    import graft.multimodal.Multimodal
    // doc_ids congruent 1 mod 3 -> audio kind; synthetic payloads are
    // 16-bit mono WAV at 8000 + (id%4)*4000 Hz with 100 + id%900 frames
    val docs = Seq((1L, "ignored", "en", "s", 7L), (4L, "ignored", "en", "s", 7L),
      (901L, "ignored", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.withSyntheticAudioPayloads(Multimodal.fromDocuments(docs))
    val decoded = Multimodal.decode(media).collect().map(d => d.media_id -> d).toMap
    for (id <- Seq(1L, 4L, 901L)) {
      val d = decoded(id)
      assert(d.decoded_real, s"audio $id did not take the real codec path")
      assert(d.sample_rate == 8000 + (id % 4).toInt * 4000, s"id=$id rate=${d.sample_rate}")
      assert(d.n_frames == 100 + (id % 900).toInt, s"id=$id frames=${d.n_frames}")
      assert(d.width == 0 && d.height == 0)
      // the sawtooth has nonzero amplitude in every band
      assert(d.feature.length == 8 && d.feature.forall(f => f > 0f && f <= 1f),
        s"id=$id feature=${d.feature.toSeq}")
    }
    // non-WAV bytes under kind=audio fall back to the stub, flagged as such
    val junk = Seq((9L, "audio", "definitely not riff".getBytes("UTF-8")))
      .toDF("media_id", "kind", "bytes")
    val jd = Multimodal.decode(junk).collect().head
    assert(!jd.decoded_real && jd.sample_rate == 16000) // stub's fixed fake rate
  }

  test("multimodal decode: REAL MP4 container probe (geometry + frames from the box tree)") {
    import graft.multimodal.Multimodal
    // doc_ids congruent 2 mod 3 -> video kind; synthetic MP4 payloads
    // carry width 128 + id%64, height 72 + (3*id)%64, frames 24 + id%240
    val docs = Seq((2L, "ignored", "en", "s", 7L), (5L, "ignored", "en", "s", 7L),
      (302L, "ignored", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.withSyntheticVideoPayloads(Multimodal.fromDocuments(docs))
    val decoded = Multimodal.decode(media).collect().map(d => d.media_id -> d).toMap
    for (id <- Seq(2L, 5L, 302L)) {
      val d = decoded(id)
      assert(d.decoded_real, s"video $id did not take the container probe path")
      assert(d.width == 128 + (id % 64).toInt, s"id=$id width=${d.width}")
      assert(d.height == 72 + ((id * 3) % 64).toInt, s"id=$id height=${d.height}")
      assert(d.n_frames == 24 + (id % 240).toInt, s"id=$id frames=${d.n_frames}")
      assert(d.sample_rate == 0)
      assert(d.feature.forall(_ == 0f)) // no codec -> no pixel features
    }
    // junk bytes under kind=video fall back to the stub, flagged as such
    val junk = Seq((9L, "video", "definitely not an mp4 box tree".getBytes("UTF-8")))
      .toDF("media_id", "kind", "bytes")
    val jd = Multimodal.decode(junk).collect().head
    assert(!jd.decoded_real)
  }

  test("multimodal decode: WebM EBML probe reads PixelWidth/PixelHeight") {
    import graft.multimodal.Multimodal
    // hand-rolled minimal WebM: EBML header + Segment > Tracks >
    // TrackEntry > Video > PixelWidth(320) PixelHeight(240)
    def elem(id: Array[Byte], payload: Array[Byte]): Array[Byte] = {
      assert(payload.length < 0x7f)
      id ++ Array((0x80 | payload.length).toByte) ++ payload
    }
    val video = elem(Array(0xe0.toByte),
      elem(Array(0xb0.toByte), Array(0x01.toByte, 0x40.toByte)) ++ // 320
        elem(Array(0xba.toByte), Array(0xf0.toByte))) // 240
    val trackEntry = elem(Array(0xae.toByte), video)
    val tracks = elem(Array(0x16.toByte, 0x54.toByte, 0xae.toByte, 0x6b.toByte), trackEntry)
    val segment = elem(
      Array(0x18.toByte, 0x53.toByte, 0x80.toByte, 0x67.toByte), tracks)
    val ebmlHeader = elem(
      Array(0x1a.toByte, 0x45.toByte, 0xdf.toByte, 0xa3.toByte), Array.empty[Byte])
    val webm = ebmlHeader ++ segment
    val d = Multimodal.decode(
      Seq((1L, "video", webm)).toDF("media_id", "kind", "bytes")).collect().head
    assert(d.decoded_real && d.width == 320 && d.height == 240 && d.n_frames == 0)
  }

  test("multimodal resize re-encodes pixels: dimensions AND pixel values survive") {
    import graft.multimodal.Multimodal
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    // 64x32 fixture: left half gray 40, right half gray 200
    val img = new BufferedImage(64, 32, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 32; x <- 0 until 64)
      img.getRaster.setSample(x, y, 0, if (x < 32) 40 else 200)
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    val media = Seq((1L, "image", bos.toByteArray), (2L, "video", Array[Byte](1, 2, 3)))
      .toDF("media_id", "kind", "bytes")
    val out = Multimodal.resizeImages(media, maxSide = 16)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Array[Byte]]("bytes"), r.getBoolean(r.fieldIndex("resized")))).toMap
    assert(out(1L)._2 && !out(2L)._2) // image re-encoded, video untouched
    assert(out(2L)._1.toSeq == Seq[Byte](1, 2, 3))
    val back = ImageIO.read(new java.io.ByteArrayInputStream(out(1L)._1))
    assert(back.getWidth == 16 && back.getHeight == 8) // aspect preserved
    // pixels: each output half is a bilinear average of a constant
    // region -> stays (approximately) that constant away from the seam
    val r = back.getRaster
    for (y <- 0 until 8; x <- 0 until 6)
      assert(math.abs(r.getSample(x, y, 0) - 40) <= 2, s"left ($x,$y)=${r.getSample(x, y, 0)}")
    for (y <- 0 until 8; x <- 10 until 16)
      assert(math.abs(r.getSample(x, y, 0) - 200) <= 2, s"right ($x,$y)=${r.getSample(x, y, 0)}")
    // an image already within bounds passes through byte-identically
    val small = Multimodal.resizeImages(media, maxSide = 1000)
      .collect().map(r2 => r2.getLong(0) -> r2.getBoolean(r2.fieldIndex("resized"))).toMap
    assert(!small(1L) && !small(2L))
  }

  test("multimodal decode: REAL MJPEG-in-AVI pixel decode (geometry + per-frame luma)") {
    import graft.multimodal.Multimodal
    // doc_ids congruent 2 mod 3 -> video kind; synthetic AVI payloads
    // carry width 32 + id%16, height 24 + (5id)%16, 3 + id%6 JPEG
    // frames of solid gray 16 + (37id + 11f) % 224
    val docs = Seq((2L, "ignored", "en", "s", 7L), (5L, "ignored", "en", "s", 7L),
      (302L, "ignored", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.withSyntheticAviVideoPayloads(Multimodal.fromDocuments(docs))
    val decoded = Multimodal.decode(media).collect().map(d => d.media_id -> d).toMap
    for (id <- Seq(2L, 5L, 302L)) {
      val d = decoded(id)
      val n = 3 + (id % 6).toInt
      assert(d.decoded_real, s"video $id did not take the AVI decode path")
      assert(d.width == 32 + (id % 16).toInt, s"id=$id width=${d.width}")
      assert(d.height == 24 + ((id * 5) % 16).toInt, s"id=$id height=${d.height}")
      assert(d.n_frames == n, s"id=$id frames=${d.n_frames}")
      // n <= 8 = FeatureDim, so band b is exactly frame b's mean luma —
      // REAL decoded pixels, within JPEG quantization error of the
      // encoded solid gray; bands past the clip length stay 0
      for (b <- 0 until n) {
        val expected = 16 + ((id * 37 + b * 11) % 224).toInt
        assert(math.abs(d.feature(b) - expected) <= 3,
          s"id=$id frame=$b luma=${d.feature(b)} expected~$expected")
      }
      for (b <- n until 8) assert(d.feature(b) == 0f)
    }
  }

  test("multimodal frameFeatures: per-frame decoded luma rows, stride and cap respected") {
    import graft.multimodal.Multimodal
    val docs = Seq((2L, "ignored", "en", "s", 7L), (8L, "ignored", "en", "s", 7L),
      (0L, "ignored", "en", "s", 7L)) // 0 -> image kind: must emit nothing
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.withSyntheticAviVideoPayloads(
      Multimodal.withSyntheticImagePayloads(Multimodal.fromDocuments(docs)))
    val rows = Multimodal.frameFeatures(media, stride = 2, maxFrames = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getFloat(4)))
    // id 2: 5 frames -> stride-2 indices {0,2,4} capped at 2 -> {0,2};
    // id 8: 5 frames -> same; image row contributes nothing
    assert(rows.map(t => (t._1, t._2)).sorted.toSeq ==
      Seq((2L, 0), (2L, 2), (8L, 0), (8L, 2)))
    for ((id, fi, w, h, luma) <- rows) {
      assert(w == 32 + (id % 16).toInt && h == 24 + ((id * 5) % 16).toInt)
      val expected = 16 + ((id * 37 + fi * 11) % 224).toInt
      assert(math.abs(luma - expected) <= 3, s"id=$id frame=$fi luma=$luma expected~$expected")
    }
    // junk video bytes and non-AVI containers emit no frame rows
    val junk = Seq((9L, "video", "not riff".getBytes("UTF-8")))
      .toDF("media_id", "kind", "bytes")
    assert(Multimodal.frameFeatures(junk, 1, 10).count() == 0)
  }

  test("multimodal decode: adversarial AVI payloads degrade to the stub, never throw") {
    import graft.multimodal.Multimodal
    def le32(v: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    // a chunk whose declared size is 0x7FFFFFFF: p + size overflows Int
    val overflow = "RIFF".getBytes("US-ASCII") ++ le32(100) ++
      "AVI ".getBytes("US-ASCII") ++
      "00dc".getBytes("US-ASCII") ++ le32(Int.MaxValue) ++ Array.fill(16)(0x41.toByte)
    // a LIST that contains itself-shaped headers deep enough to recurse
    val bomb = {
      val inner = Array.fill(40)(0.toByte)
      var payload = inner
      for (_ <- 0 until 32)
        payload = "LIST".getBytes("US-ASCII") ++ le32(payload.length + 4) ++
          "hdrl".getBytes("US-ASCII") ++ payload
      "RIFF".getBytes("US-ASCII") ++ le32(payload.length + 4) ++
        "AVI ".getBytes("US-ASCII") ++ payload
    }
    val media = Seq((1L, "video", overflow), (2L, "video", bomb))
      .toDF("media_id", "kind", "bytes")
    val decoded = Multimodal.decode(media).collect().map(d => d.media_id -> d).toMap
    assert(!decoded(1L).decoded_real) // stub fallback, no crash
    assert(!decoded(2L).decoded_real)
    assert(Multimodal.frameFeatures(media, 1, 10).count() == 0)
  }

  test("multimodal frame sampling strides video only") {
    import graft.multimodal.Multimodal
    val docs = Seq((2L, "x" * 500, "en", "s", 500L)) // doc_id 2 -> video kind
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val decoded = Multimodal.decode(
      Multimodal.withSyntheticVideoPayloads(Multimodal.fromDocuments(docs)))
    val d = decoded.collect().head
    val frames = Multimodal.frameSample(decoded, stride = 10, maxFrames = 5)
      .collect().map(r => r.getInt(1)).toSeq
    assert(d.n_frames == 26) // 24 + 2%240
    assert(frames == (0 until d.n_frames by 10).take(5))
  }
}
