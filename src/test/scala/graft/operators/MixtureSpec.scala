package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class MixtureSpec extends GraftSparkSpec {
  import spark.implicits._

  /** 3 strata with very different weight mass: en 10 docs x 100,
    * de 4 x 50, zh 2 x 25.
    */
  private def corpus() = (
    (0 until 10).map(i => (i.toLong, "en", 100L)) ++
    (10 until 14).map(i => (i.toLong, "de", 50L)) ++
    (14 until 16).map(i => (i.toLong, "zh", 25L))
  ).toDF("id", "lang", "w")

  test("alpha=1 keeps the natural distribution: one uniform rate everywhere") {
    // p_s = T_s / sum T => r_s = B / sum T for EVERY stratum
    val rs = Mixture.rates(Seq(("en", 1000L), ("de", 200L), ("zh", 50L)), 1.0, 2500L)
    val expected = 2500.0 / 1250.0
    rs.foreach(r => assert(r.rate === expected))
  }

  test("alpha=0 gives every stratum an equal budget share") {
    val rs = Mixture.rates(Seq(("en", 1000L), ("de", 200L)), 0.0, 600L)
    // each stratum targets 300 units: r = 300/T
    val byS = rs.map(r => r.stratum -> r.rate).toMap
    assert(byS("en") === 300.0 / 1000.0)
    assert(byS("de") === 300.0 / 200.0)
  }

  test("expected output mass per stratum is p_s * budget (rate algebra)") {
    val totals = Seq(("en", 1000L), ("de", 200L), ("zh", 50L))
    val alpha = 0.5
    val budget = 5000L
    val rs = Mixture.rates(totals, alpha, budget)
    val z = totals.map(_._2.toDouble).map(Math.pow(_, alpha)).sum
    rs.foreach { r =>
      val p = Math.pow(r.total.toDouble, alpha) / z
      assert(math.abs(r.rate * r.total - p * budget) < 1e-6,
        s"${r.stratum}: rate*total should equal p*budget")
    }
    // and the full plan conserves the budget in expectation
    assert(math.abs(rs.map(r => r.rate * r.total).sum - budget) < 1e-6)
  }

  test("zero-total strata emit nothing") {
    val rs = Mixture.rates(Seq(("en", 100L), ("empty", 0L)), 0.5, 1000L)
    val e = rs.find(_.stratum == "empty").get
    assert(e.rate == 0.0 && e.nFull == 0 && e.fracThr24 == 0)
  }

  test("emission: every doc appears nFull or nFull+1 times, epochs contiguous from 0") {
    val df = corpus()
    val out = Mixture.temperatureMix(df, col("id"), col("lang"), col("w"),
      alpha = 0.5, budget = 4000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val rs = Mixture.rates(
      Seq(("de", 200L), ("en", 1000L), ("zh", 50L)), 0.5, 4000L)
      .map(r => r.stratum -> r).toMap
    val byDoc = out.groupBy(_._1)
    df.collect().map(r => (r.getLong(0), r.getString(1))).foreach { case (id, lang) =>
      val n = byDoc.get(id).map(_.length).getOrElse(0)
      val r = rs(lang)
      assert(n == r.nFull || n == r.nFull + 1,
        s"doc $id ($lang): $n copies, expected ${r.nFull} or ${r.nFull + 1}")
      if (n > 0)
        assert(byDoc(id).map(_._3).sorted.toSeq == (0L until n.toLong),
          s"doc $id: epochs not contiguous from 0")
    }
  }

  test("emission is deterministic across runs and repartitionings") {
    val df = corpus()
    def run(parts: Int): Seq[(Long, String, Long)] =
      Mixture.temperatureMix(df.repartition(parts), col("id"), col("lang"), col("w"),
        alpha = 0.5, budget = 4000L)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(x => (x._1, x._3)).toSeq
    assert(run(1) == run(7))
  }

  test("null stratum keys are rejected loudly") {
    val df = Seq((1L, "en", 10L), (2L, null.asInstanceOf[String], 10L))
      .toDF("id", "lang", "w")
    intercept[IllegalArgumentException] {
      Mixture.temperatureMix(df, col("id"), col("lang"), col("w"), 0.5, 100L)
    }
  }
}
