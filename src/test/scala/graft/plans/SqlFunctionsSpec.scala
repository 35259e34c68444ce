package graft.plans

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins the SQL function surface registered by [[GraftExtensions]]:
  * each graft_* function equals its Scala-API twin, literal-argument
  * validation fails loudly, and the expressions stay codegen'd
  * (they ARE the same expressions).
  */
class SqlFunctionsSpec extends GraftSparkSpec {

  import spark.implicits._

  test("scalar functions equal their Scala-API twins") {
    val df = Seq(
      ("GET", 200L, "/a/%252e%252e/etc/passwd", "10.1.2.3",
        "the quick brown fox jumps over the lazy dog"),
      ("TRACE", 500L, "/cgi-bin/shell.php?x=1", "192.168.7.9",
        "short"),
      ("POST", 404L, "/index.html", "172.16.0.1",
        "a a a a a a a a a a")).toDF("m", "st", "uri", "ip", "text")
    df.createOrReplaceTempView("gfx")

    val viaSql = spark.sql(
      """SELECT graft_uri_risk(uri) AS ur, graft_method_risk(m) AS mr,
        |  graft_status_risk(st) AS sr, graft_unquote(uri).uri AS dec,
        |  graft_canon_url(concat('http://x.com', uri)) AS cu,
        |  graft_ntokens(text) AS nt, graft_quality(text) AS q,
        |  graft_minhash(split(text, ' '), 8) AS mh,
        |  graft_regexp_groups(uri, '/([a-z]+)') AS rg,
        |  graft_cidr_match(ip, '10.0.0.0/8, 172.16.0.0/12') AS cm
        |FROM gfx""".stripMargin).collect()

    // minhash/regexp/cidr twins via their expression constructors
    val viaApi2 = df.select(
      org.apache.spark.sql.GraftInterop.column(
        graft.textops.MinHashSigExpr(
          org.apache.spark.sql.GraftInterop.catalystExpression(
            split(col("text"), " ")), 8)).as("mh"),
      org.apache.spark.sql.GraftInterop.column(
        graft.functions.RegexpGroups(
          org.apache.spark.sql.GraftInterop.expression(col("uri")),
          "/([a-z]+)")).as("rg"),
      graft.functions.Cidr.matches(col("ip"),
        Seq("10.0.0.0/8", "172.16.0.0/12")).as("cm")).collect()
    val viaApi1 = df.select(
      graft.functions.RiskFeatures.uriRisk(col("uri"),
        graft.rules.GraftConfig.defaultSensitivePaths,
        graft.rules.GraftConfig.extPatterns(
          graft.rules.GraftConfig.defaultSensitiveExtensions),
        graft.SparkEntry.oracleShells).as("ur"),
      graft.functions.RiskFeatures.methodRisk(col("m")).as("mr"),
      graft.functions.RiskFeatures.statusRisk(col("st")).as("sr"),
      graft.functions.UriCodec.nested_unquote(col("uri"))
        .getField("uri").as("dec"),
      graft.functions.UrlCanon.canonicalize_url(
        concat(lit("http://x.com"), col("uri"))).as("cu"),
      graft.textops.TextAnalysis.nTokens(col("text")).as("nt"),
      graft.textops.TextAnalysis.qualityScore(col("text")).as("q")).collect()

    viaSql.zip(viaApi1).foreach { case (s, a) =>
      (0 until 7).foreach(i => assert(s.get(i) === a.get(i), s"col $i"))
    }
    viaSql.zip(viaApi2).foreach { case (s, a) =>
      assert(s.getSeq[Long](7) === a.getSeq[Long](0), "minhash")
      assert(s.getSeq[String](8) === a.getSeq[String](1), "regexp groups")
      assert(s.getBoolean(9) === a.getBoolean(2), "cidr match")
    }
  }

  test("the LSH chain composes in SQL and equals its expression twins") {
    val df = Seq("the quick brown fox jumps over the lazy dog and runs",
      "an entirely different line of text with many other words here")
      .toDF("text")
    df.createOrReplaceTempView("gfx3")
    val viaSql = spark.sql(
      """SELECT graft_shingles(text, 3) AS sh,
        |  graft_minhash_long(graft_shingles(text, 3), 16) AS sig,
        |  graft_band_keys(graft_minhash_long(graft_shingles(text, 3), 16),
        |    4, 4) AS bk
        |FROM gfx3""".stripMargin).collect()
    import org.apache.spark.sql.GraftInterop.{column, expression}
    import graft.textops.TokenShingles._
    val viaApi = df.select(
      column(HashedShinglesExpr(expression(col("text")), 3)).as("sh"),
      column(MinHashSigLongExpr(
        HashedShinglesExpr(expression(col("text")), 3), 16)).as("sig"),
      column(BandKeysExpr(MinHashSigLongExpr(
        HashedShinglesExpr(expression(col("text")), 3), 16), 4, 4)).as("bk"))
      .collect()
    viaSql.zip(viaApi).foreach { case (s, a) =>
      (0 until 3).foreach(i =>
        assert(s.getSeq[Long](i) === a.getSeq[Long](i), s"col $i"))
    }
  }

  test("non-literal structural arguments fail loudly") {
    Seq(("abc", 4)).toDF("t", "k").createOrReplaceTempView("gfx2")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash(t, k) FROM gfx2").collect()
    }
    assert(e.getMessage.contains("must be a literal") ||
      Option(e.getCause).exists(_.getMessage.contains("must be a literal")),
      e.getMessage)
  }
}
