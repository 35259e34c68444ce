package graft.textops

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class TextRankSpec extends GraftSparkSpec {
  import spark.implicits._

  // the registry query body, parameterized by corpus — kept in lockstep
  // with q148 (same edges, same rank, same window)
  private def textrank(texts: Seq[String], k: Int = 20) = {
    import graft.operators.{DistinctSketch, LinkGraph}
    val toks = texts.toDF("text")
      .select(TextIndex.terms(col("text")).as("_ts"))
    val pairs = toks.select(explode(zip_with(
        col("_ts"),
        slice(col("_ts"), lit(2), greatest(size(col("_ts")) - 1, lit(0))),
        (a, b) => struct(a.as("a"), b.as("b")))).as("_p"))
      .filter(col("_p.b").isNotNull && col("_p.a") =!= col("_p.b"))
      .select(col("_p.a").as("wa"), col("_p.b").as("wb"))
    val und = pairs
      .union(pairs.select(col("wb").as("wa"), col("wa").as("wb"))).distinct()
    val nodes = und.select(col("wa").as("term")).distinct()
      .withColumn("tid", DistinctSketch.hash60(col("term")))
    val edges = und.select(
      DistinctSketch.hash60(col("wa")).as("src"),
      DistinctSketch.hash60(col("wb")).as("dst"))
    val ranks = LinkGraph.pageRank(nodes, "tid", edges, iters = 5)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rank_fp").desc, col("term").asc)
    nodes.join(ranks, "tid")
      .select(col("term"), col("rank").as("rank_fp"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .filter(col("pos") <= k)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
  }

  test("the hub word of a star-shaped corpus ranks first") {
    // 'hub' co-occurs with 8 distinct words; the spokes only with hub
    val corpus = (1 to 8).map(i => s"hub w$i hub")
    val got = textrank(corpus)
    assert(got.head._1 == "hub")
    assert(got.head._3 == 1L)
    // spokes are symmetric: identical rank, ordered by term
    val spokes = got.tail
    assert(spokes.map(_._2).distinct.length == 1)
    assert(spokes.map(_._1).toSeq == (1 to 8).map(i => s"w$i").sorted)
  }

  test("adjacent repetition of the same word contributes no edge") {
    val got = textrank(Seq("a a a"))
    assert(got.isEmpty) // no (a,a) edge, no nodes
  }

  test("words never adjacent share no edge: two disjoint pairs rank symmetrically") {
    val got = textrank(Seq("a b", "c d"))
    assert(got.map(_._1).sorted.toSeq == Seq("a", "b", "c", "d"))
    assert(got.map(_._2).distinct.length == 1) // all degree-1, equal rank
  }

  test("partitioning-insensitive") {
    val corpus = (1 to 60).map(i => s"t${i % 9} t${i % 5} t${i % 9} t${i % 3}")
    // same corpus through different input partitionings, via the DF body
    val a = textrank(corpus)
    val b = textrank(new scala.util.Random(7).shuffle(corpus))
    assert(a.toSeq == b.toSeq) // corpus order cannot matter: bag-of-edges
  }
}
