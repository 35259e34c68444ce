package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.UriCodec
import graft.norm.Normalizer
import graft.session.Sessionizer

/** Property-based invariants (SURVEY §5.2). ScalaCheck generators with a
  * fixed-seed sampling loop (scalatestplus bridge is not on the offline
  * classpath).
  */
class PropertySpec extends GraftSparkSpec {
  import spark.implicits._

  /** n deterministic samples of gen (seeds 42, 43, ...). */
  private def forAll[A](gen: Gen[A], n: Int = 30)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  // -- unquote ---------------------------------------------------------------

  private val uriGen: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.oneOf("/", "?", "=", "&", ".", "+", " "),
    2 -> Gen.oneOf("%2e", "%2f", "%25", "%zz", "%", "%4"))).map(_.mkString)

  test("unquote: reaches a fixpoint and never throws; '+' is preserved") {
    forAll(uriGen, 60) { s =>
      val (decoded, depth) = UriCodec.unquoteNested(s, 3)
      assert(depth >= 0 && depth <= 3)
      if (depth < 3) assert(UriCodec.unquote(decoded) == decoded)
      assert(s.count(_ == '+') <= decoded.count(_ == '+') + 0) // '+' never consumed
      if (!s.contains("%")) assert(decoded == s && depth == 0)
    }
  }

  // -- sessionization --------------------------------------------------------

  private val epochsGen: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(0L, 5000L)).map(_.take(60))

  test("sessionization invariants: internal gaps < 60, boundary gaps >= 60") {
    forAll(epochsGen, 10) { eps =>
      val df = eps.distinct.map(e => ("s", "1.2.3.4", e)).toDF("source", "ip", "ep")
        .withColumn("utc_timestamp", col("ep").cast("timestamp"))
      val got = Sessionizer.withClusters(df)
        .select("ep", "cluster").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      got.sliding(2).foreach {
        case Array((e1, c1), (e2, c2)) =>
          val sameCluster = c1 == c2
          assert(sameCluster == (e2 - e1 < 60),
            s"gap ${e2 - e1} but sameCluster=$sameCluster")
        case _ =>
      }
      // dense ids start at 0
      val ids = got.map(_._2).distinct.sorted
      assert(ids.headOption.forall(_ == 0L) && ids.zipWithIndex.forall { case (c, i) => c == i })
    }
  }

  // -- dedup -----------------------------------------------------------------

  private val rowGen = for {
    src <- Gen.oneOf("a.log", "b.log", "c.log")
    ts <- Gen.oneOf("2025-04-21 08:00:00", "2025-04-21 08:00:01")
    ip <- Gen.oneOf("1.1.1.1", "2.2.2.2")
    status <- Gen.oneOf(200, 404)
  } yield (src, ts, ip, "GET", "/x", status, 5L, "ua", "-")

  test("dedup is idempotent and never drops single-source keys") {
    forAll(Gen.nonEmptyListOf(rowGen).map(_.take(40)), 10) { rows =>
      val df = rows.zipWithIndex.map { case (r, i) =>
        (r._1, r._2, r._3, r._4, r._5, r._6, r._7, r._8, r._9, i.toLong)
      }.toDF("source", "timestamp", "ip", "method", "request_uri", "status",
        "resp_size", "user_agent", "referrer", "_row_id")
      val once = Normalizer.removeDuplicates(df, col("_row_id"))
      val twice = Normalizer.removeDuplicates(once, col("_row_id"))
      assert(once.count() == twice.count()) // idempotent
      // every surviving key that was single-source keeps ALL its copies
      val srcPerKey = rows.groupBy(r => (r._2, r._3, r._6)).filter(_._2.map(_._1).distinct.size == 1)
      val keptCount = once.count()
      val expectedMin = srcPerKey.values.map(_.size).sum
      assert(keptCount >= expectedMin)
    }
  }

  // -- rule engine -----------------------------------------------------------

  test("risk monotonicity: appending a matching rule never lowers any score") {
    import graft.rules.RuleEngine
    val base = RuleEngine.parseRules(
      """- title: A
        |  detection: { selection: { status: [200] } }
        |  tags: [ { risk_score: 50.0 } ]""".stripMargin)
    forAll(Gen.chooseNum(1.0, 100.0), 5) { score =>
      val extra = base ++ RuleEngine.parseRules(
        s"""- title: B
           |  detection: { selection: { method|in: [GET, POST] } }
           |  tags: [ { risk_score: $score } ]""".stripMargin)
      val df = Seq(("GET", 200), ("POST", 404), ("PUT", 200)).toDF("method", "status")
      val s1 = RuleEngine(df, base).select("risk_score").collect().map(_.getDouble(0))
      val s2 = RuleEngine(df, extra).select("risk_score").collect().map(_.getDouble(0))
      s1.zip(s2).foreach { case (a, b) => assert(b >= a) }
    }
  }

  // -- perf-rewrite equivalences (round 2) -----------------------------------
  // The tight-loop expressions must stay semantically identical to the
  // combinator formulations they replaced.

  private val textGen: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar.map(_.toString),
    3 -> Gen.const(" "),
    1 -> Gen.oneOf(".", ",", "!", "-"))).map(_.mkString)

  test("hashedShingles: count/distinctness match string shingling; merge intersect = set intersect") {
    import org.apache.spark.unsafe.types.UTF8String
    forAll(Gen.zip(textGen, textGen), 40) { case (t1, t2) =>
      def stringShingles(t: String, n: Int): Seq[Seq[String]] = {
        val toks = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
        if (toks.length < n) Seq.empty else toks.sliding(n).toSeq
      }
      def hashed(t: String): Seq[Long] = {
        val arr = graft.textops.TokenShingles.hashedShingles(
          UTF8String.fromString(t.toLowerCase), 3)
        (0 until arr.numElements()).map(arr.getLong)
      }
      val (h1, h2) = (hashed(t1), hashed(t2))
      val (s1, s2) = (stringShingles(t1.toLowerCase, 3).distinct,
        stringShingles(t2.toLowerCase, 3).distinct)
      // distinct-set cardinality preserved (64-bit collisions on random
      // short texts are effectively impossible)
      assert(h1.length == s1.length, s"t1='$t1'")
      assert(h2.length == s2.length, s"t2='$t2'")
      assert(h1 == h1.sorted && h1.distinct == h1)
      // merge-scan intersect == true set-intersect cardinality
      val inter = graft.textops.TokenShingles.sortedIntersectSize(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(h1.toArray),
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(h2.toArray))
      assert(inter == (s1.toSet & s2.toSet).size, s"t1='$t1' t2='$t2'")
    }
  }

  test("DotProductExpr equals the aggregate(zip_with(...)) combinator bit-for-bit") {
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-1000, 1000).map(_ / 97.0f))
    forAll(Gen.zip(vecGen, vecGen), 30) { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val combinator = aggregate(
        zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
      val r = df.select(
        graft.vector.Ann.dot(col("a"), col("b")).as("fast"),
        combinator.as("ref")).head
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("simhash text variant equals token-array variant on random text") {
    import org.apache.spark.unsafe.types.UTF8String
    forAll(textGen, 40) { t =>
      val lower = t.toLowerCase
      val toks = lower.trim.split("\\s+").filter(_.nonEmpty)
      val viaTokens = graft.textops.SimHash.eval(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
          toks.map(UTF8String.fromString)))
      val viaText = graft.textops.SimHash.evalText(UTF8String.fromString(lower))
      assert(viaTokens == viaText, s"t='$t'")
    }
  }

  // -- BPE token counting ----------------------------------------------------

  test("BPE count invariants: bounded by [words, code points]; merges only shrink") {
    import org.apache.spark.unsafe.types.UTF8String
    val merges = graft.textops.Bpe.defaultMerges
    val full = spark.sparkContext.broadcast(graft.textops.Bpe.table(merges))
    val none = spark.sparkContext.broadcast(graft.textops.Bpe.table(Seq.empty))
    val half = spark.sparkContext.broadcast(
      graft.textops.Bpe.table(merges.take(merges.size / 2)))
    forAll(textGen, 60) { t =>
      val u = UTF8String.fromString(t)
      val words = t.split("\\s+").filter(_.nonEmpty)
      val cps = words.map(w => w.codePointCount(0, w.length)).sum
      val n = graft.textops.Bpe.countTokens(u, full)
      // every word is at least one token; no word exceeds its code points
      assert(n >= words.length && n <= cps, s"t='$t' n=$n")
      // the empty merges table counts exactly the code points
      assert(graft.textops.Bpe.countTokens(u, none) == cps, s"t='$t'")
      // a PREFIX of the merges list can only merge less (monotonicity:
      // extra merges never increase the count)
      assert(graft.textops.Bpe.countTokens(u, half) >= n, s"t='$t'")
    }
  }

  // -- perceptual hashes -----------------------------------------------------

  private val imgGen: Gen[(Int, Int, Array[Int])] = for {
    w <- Gen.chooseNum(9, 48)
    h <- Gen.chooseNum(8, 40)
    px <- Gen.listOfN(w * h, Gen.chooseNum(0, 200))
  } yield (w, h, px.toArray)

  private def pngOf(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var i = 0
    while (i < px.length) { img.getRaster.setSample(i % w, i / w, 0, px(i)); i += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dHash invariance: any uniform brightness shift preserves the hash on random images") {
    forAll(imgGen, 25) { case (w, h, px) =>
      val base = graft.multimodal.PerceptualHash.dhash64(pngOf(w, h, px))
      for (shift <- Seq(1, 17, 55)) { // px <= 200, shift <= 55 -> no clamp
        val shifted = graft.multimodal.PerceptualHash.dhash64(
          pngOf(w, h, px.map(_ + shift)))
        assert(base == shifted, s"w=$w h=$h shift=$shift")
      }
    }
  }

  private val wavGen: Gen[Array[Short]] = Gen.chooseNum(8, 600).flatMap(n =>
    // even values in [-8000, 8000]: exact halving, no rounding drift
    Gen.listOfN(n, Gen.chooseNum(-4000, 4000).map(v => (v * 2).toShort))
      .map(_.toArray))

  private def wavOf(samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)
      .putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  test("audioHash invariance: exact halving preserves the hash on random waveforms") {
    forAll(wavGen, 25) { samples =>
      val base = graft.multimodal.PerceptualHash.audioHash64(wavOf(samples))
      val halved = graft.multimodal.PerceptualHash.audioHash64(
        wavOf(samples.map(s => (s / 2).toShort)))
      assert(base != null && base == halved, s"n=${samples.length}")
    }
  }

  // -- decontamination -------------------------------------------------------

  private val tokenGen: Gen[String] = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
  private val docGen: Gen[String] =
    Gen.listOfN(12, tokenGen).map(_.mkString(" "))

  test("decontaminate flags exactly the docs sharing a k-token window (naive twin)") {
    forAll(Gen.zip(Gen.listOfN(6, docGen), Gen.listOfN(2, docGen)), 8) {
      case (corpus, evals) =>
        val k = 4
        def windows(t: String): Set[Seq[String]] =
          t.split(" ").toSeq.sliding(k).filter(_.length == k).map(_.toSeq).toSet
        val evalWins = evals.flatMap(windows).toSet
        val expected = corpus.zipWithIndex.collect {
          case (d, i) if windows(d).exists(evalWins.contains) => i.toLong
        }.toSet
        val got = graft.textops.SpanDedup.decontaminate(
          corpus.zipWithIndex.map { case (d, i) => (i.toLong, d) }.toDF("doc_id", "text"),
          "doc_id", "text",
          evals.map(Tuple1(_)).toDF("text"), "text", k = k)
          .filter(col("flagged")).select("doc_id").as[Long].collect().toSet
        assert(got == expected, s"corpus=$corpus evals=$evals")
    }
  }
}
