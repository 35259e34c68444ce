package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class QuantileSketchSpec extends GraftSparkSpec {
  import spark.implicits._

  /** Independent replay of the engine-agnostic value hash. */
  private def refHash(v: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"qsk:$v".getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** Independent replay of the whole sketch + lower-quantile query. */
  private def refQuantiles(vals: Seq[Long], k: Int,
      qs: Seq[Int]): (Long, Long, Seq[Option[Long]]) = {
    val hist = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val kept = hist.keys.toSeq.map(v => ((refHash(v), v), hist(v)))
      .sortBy(_._1).take(k)
    val byValue = kept.map { case ((_, v), c) => (v, c) }.sortBy(_._1)
    val w = byValue.map(_._2).sum
    val quants = qs.map { qx =>
      var cum = 0L
      byValue.collectFirst {
        case (v, c) if { cum += c; cum * 10000 >= qx * w } => v
      }
    }
    (vals.size.toLong, kept.size.toLong, quants)
  }

  private def engine(vals: Seq[Long], k: Int, parts: Int) = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(vals.map(Tuple1(_)), parts).map(t => org.apache.spark.sql.Row(t._1)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType))))
    df.agg(QuantileSketch.qsketch(col("v"), k).as("qs"))
      .select(col("qs.n"), col("qs.n_pairs"),
        QuantileSketch.sketchQuantile(col("qs"), 5000),
        QuantileSketch.sketchQuantile(col("qs"), 9000),
        QuantileSketch.sketchQuantile(col("qs"), 9900),
        col("qs.values"), col("qs.counts"))
      .collect()(0)
  }

  test("exact regime: quantiles equal the exact lower quantiles") {
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(500)(rnd.nextInt(40).toLong) // 40 distinct << k
    val r = engine(vals, k = 64, parts = 4)
    val sorted = vals.sorted
    def exact(qx: Int): Long = {
      val n = sorted.size
      sorted.collectFirst {
        case v if (sorted.count(_ <= v).toLong * 10000) >= qx.toLong * n => v
      }.get
    }
    assert(r.getLong(0) == 500L && r.getLong(1) == 40L)
    assert(r.getLong(2) == exact(5000))
    assert(r.getLong(3) == exact(9000))
    assert(r.getLong(4) == exact(9900))
  }

  test("above capacity: bit-identical to the independent bottom-k replay") {
    val rnd = new scala.util.Random(11)
    val vals = Seq.fill(3000)((rnd.nextInt(800) + 1).toLong)
    val (n, np, qs) = refQuantiles(vals, k = 32, qs = Seq(5000, 9000, 9900))
    val r = engine(vals, k = 32, parts = 5)
    assert(r.getLong(0) == n && r.getLong(1) == np)
    assert(Seq(Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))
      .map(_.map(_.asInstanceOf[Long])) == qs)
  }

  test("partitioning invariance: identical sketch struct at 1, 7, 13 partitions") {
    val rnd = new scala.util.Random(3)
    val vals = Seq.fill(4000)((rnd.nextInt(1500)).toLong)
    val rows = Seq(1, 7, 13).map(p => engine(vals, k = 48, p))
    val tuples = rows.map(r => (r.getLong(0), r.getLong(1),
      r.getSeq[Long](5), r.getSeq[Long](6)))
    assert(tuples.distinct.size == 1,
      "sketch must be a pure function of the multiset")
  }

  test("error bound on a skew fixture: sampled-mass quantiles stay near true ranks") {
    // zipf-ish: value v appears about 4000/v times, 2000 distinct >> k
    val vals = (1 to 2000).flatMap(v => Seq.fill(math.max(4000 / v, 1))(v.toLong))
    val r = engine(vals, k = 256, parts = 8)
    val sorted = vals.sorted
    val n = sorted.size
    for ((qx, idx) <- Seq(5000, 9000, 9900).zipWithIndex) {
      val est = r.getLong(2 + idx)
      val rank = sorted.count(_ <= est).toDouble / n
      val err = math.abs(rank - qx / 10000.0)
      assert(err <= 0.12, s"q=$qx est=$est rank=$rank err=$err")
    }
  }

  test("nulls are excluded; empty groups yield null quantiles") {
    val df = Seq[(String, Option[Long])](
      ("a", Some(1L)), ("a", Some(2L)), ("a", None), ("b", None))
      .toDF("g", "v")
    val out = QuantileSketch.quantilesByKey(df, Seq(col("g")), col("v"), 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)))).sortBy(_._1).toSeq
    assert(out == Seq(("a", 2L, 2L, Some(1L)), ("b", 0L, 0L, None)))
  }

  test("qx bounds enforced; qx=10000 is the max retained value") {
    val r = engine(Seq(5L, 1L, 9L), k = 8, parts = 2)
    intercept[IllegalArgumentException] {
      QuantileSketch.sketchQuantile(col("x"), 0)
    }
    intercept[IllegalArgumentException] {
      QuantileSketch.sketchQuantile(col("x"), 10001)
    }
    assert(r.getLong(4) == 9L || r.getLong(4) == 9L) // p99 of 3 rows = max
  }
}
