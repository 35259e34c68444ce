package graft.operators

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSparkSpec
import graft.textops.NearDup
import graft.vector.{Ivf, Pq}

/** Deletion + compaction lifecycle across the five index families:
  * search-after-delete equals a rebuild without the ids, compaction
  * physically applies tombstones and bounds the file count, and the
  * crash-healing prologue restores a half-swapped dataset.
  */
class IndexDeleteSpec extends GraftSparkSpec {
  import spark.implicits._

  private val words = Seq("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")

  private def doc(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")
  }

  private def corpusDf = (0 until 40).map(i => (i.toLong, doc(i, 30))).toDF("doc_id", "text")
  // probes near-dup against docs 0..7 (one appended token)
  private def probeDf = (0 until 8).map(i => ((300 + i).toLong, doc(i, 30) + " kappa"))
    .toDF("doc_id", "text")
  private def removedIds = Seq(0L, 1L, 2L, 3L).toDF("doc_id")
  private def remaining = corpusDf.filter(col("doc_id") >= 4)

  private def pairSet(df: DataFrame): Set[Seq[Any]] = df.collect().map(_.toSeq).toSet

  private def partFiles(dir: String, name: String): Int = {
    val p = new Path(s"$dir/$name")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(p).count(_.getPath.getName.startsWith("part-"))
  }

  test("minhash: probe after delete equals probe of an index built without the ids") {
    val dir = Files.createTempDirectory("mh_del").toString
    val dirRef = Files.createTempDirectory("mh_ref").toString
    NearDup.buildMinhashIndex(corpusDf, "doc_id", "text", dir)
    NearDup.removeFromMinhashIndex(removedIds, "doc_id", dir)
    NearDup.buildMinhashIndex(remaining, "doc_id", "text", dirRef)
    val afterDelete = pairSet(NearDup.minhashPairsAgainstIndex(probeDf, "doc_id", "text", dir))
    val rebuilt = pairSet(NearDup.minhashPairsAgainstIndex(probeDf, "doc_id", "text", dirRef))
    assert(afterDelete == rebuilt)
    assert(rebuilt.nonEmpty, "undeleted planted near-dups must still match")
    assert(!afterDelete.exists(r => r(1).asInstanceOf[Long] < 4L),
      "deleted corpus ids must not appear")
    // compaction applies the tombstones physically; probe unchanged
    NearDup.compactMinhashIndex(spark, dir, targetFiles = 1)
    assert(pairSet(NearDup.minhashPairsAgainstIndex(probeDf, "doc_id", "text", dir))
      == afterDelete)
    assert(spark.read.parquet(s"$dir/shingles.parquet")
      .filter(col("id") < 4).count() == 0, "compact must drop tombstoned ledger rows")
  }

  test("minhash: ledger keeps tombstoned ids until compact (replay stays a no-op)") {
    val dir = Files.createTempDirectory("mh_replay").toString
    NearDup.buildMinhashIndex(corpusDf, "doc_id", "text", dir)
    NearDup.removeFromMinhashIndex(removedIds, "doc_id", dir)
    // a replayed batch containing a deleted id must NOT re-ingest it
    val replay = corpusDf.filter(col("doc_id") < 2)
    assert(NearDup.dedupNewBatch(replay, "doc_id", "text", dir).count() == 0)
    // after compact the ledger forgets the id: re-adding works again
    NearDup.compactMinhashIndex(spark, dir, targetFiles = 1)
    val readd = NearDup.dedupNewBatch(replay, "doc_id", "text", dir)
      .collect().map(_.getLong(0)).toSet
    assert(readd == Set(0L, 1L))
  }

  test("simhash + winnow: probe after delete equals rebuild without the ids") {
    val dirS = Files.createTempDirectory("sh_del").toString
    val dirSRef = Files.createTempDirectory("sh_ref").toString
    NearDup.buildSimhashIndex(corpusDf, "doc_id", "text", dirS)
    NearDup.removeFromSimhashIndex(removedIds, "doc_id", dirS)
    NearDup.buildSimhashIndex(remaining, "doc_id", "text", dirSRef)
    val sDel = pairSet(NearDup.simhashPairsAgainstIndex(probeDf, "doc_id", "text", dirS))
    assert(sDel == pairSet(
      NearDup.simhashPairsAgainstIndex(probeDf, "doc_id", "text", dirSRef)))
    NearDup.compactSimhashIndex(spark, dirS, targetFiles = 1)
    assert(pairSet(NearDup.simhashPairsAgainstIndex(probeDf, "doc_id", "text", dirS)) == sDel)

    val dirW = Files.createTempDirectory("wn_del").toString
    val dirWRef = Files.createTempDirectory("wn_ref").toString
    NearDup.buildWinnowIndex(corpusDf, "doc_id", "text", dirW)
    NearDup.removeFromWinnowIndex(removedIds, "doc_id", dirW)
    NearDup.buildWinnowIndex(remaining, "doc_id", "text", dirWRef)
    val wDel = pairSet(NearDup.winnowPairsAgainstIndex(probeDf, "doc_id", "text", dirW))
    assert(wDel == pairSet(
      NearDup.winnowPairsAgainstIndex(probeDf, "doc_id", "text", dirWRef)))
    assert(wDel.nonEmpty)
    NearDup.compactWinnowIndex(spark, dirW, targetFiles = 1)
    assert(pairSet(NearDup.winnowPairsAgainstIndex(probeDf, "doc_id", "text", dirW)) == wDel)
  }

  private def vectors = {
    val rnd = new scala.util.Random(17)
    (0L until 200L).map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("IVF + PQ: search after delete equals a same-quantizer index without the ids") {
    val vecs = vectors
    val removed = Seq(5L, 6L, 7L).toDF("vec_id")
    val kept = vecs.filter(col("vec_id") < 5 || col("vec_id") > 7)
    val queries = vecs.filter(col("vec_id") < 5)

    val dirI = Files.createTempDirectory("ivf_del").toString
    val dirIRef = Files.createTempDirectory("ivf_ref").toString
    Ivf.buildIndex(vecs, "vec_id", "embedding", dirI, nlist = 8)
    Ivf.removeFromIndex(removed, "vec_id", dirI)
    Ivf.writeIndex(kept, "vec_id", "embedding", dirIRef,
      Ivf.loadCentroids(spark, dirI))
    def searchI(d: String) = pairSet(Ivf.searchIndex(
      vecs, "vec_id", "embedding", queries, "vec_id", "embedding", d, k = 5, nprobe = 3))
    val iDel = searchI(dirI)
    assert(iDel == searchI(dirIRef) && iDel.nonEmpty)
    Ivf.compactIndex(spark, dirI, targetFiles = 1)
    assert(searchI(dirI) == iDel)

    val dirP = Files.createTempDirectory("pq_del").toString
    val dirPRef = Files.createTempDirectory("pq_ref").toString
    Pq.buildIndex(vecs, "vec_id", "embedding", dirP, nlist = 8, m = 4, ks = 16)
    Pq.removeFromIndex(removed, "vec_id", dirP)
    val (cents, cbs) = Pq.loadQuantizer(spark, dirP)
    Pq.writeIndex(kept, "vec_id", "embedding", dirPRef, cents, cbs)
    def searchP(d: String) = pairSet(Pq.searchIndex(
      vecs, "vec_id", "embedding", queries, "vec_id", "embedding", d, k = 5, nprobe = 3))
    val pDel = searchP(dirP)
    assert(pDel == searchP(dirPRef) && pDel.nonEmpty)
    assert(!pDel.exists(r => Seq(5L, 6L, 7L).contains(r(1).asInstanceOf[Long])))
    Pq.compactIndex(spark, dirP, targetFiles = 1)
    assert(searchP(dirP) == pDel)
  }

  test("compaction bounds the file count after repeated appends") {
    val dir = Files.createTempDirectory("mh_compact").toString
    NearDup.buildMinhashIndex(corpusDf, "doc_id", "text", dir)
    for (b <- 0 until 4) {
      val batch = Seq(((500 + b).toLong, doc(500 + b, 30))).toDF("doc_id", "text")
      NearDup.appendToMinhashIndex(batch, "doc_id", "text", dir)
    }
    assert(partFiles(dir, "shingles.parquet") > 4, "appends accumulate part files")
    val before = pairSet(NearDup.minhashPairsAgainstIndex(probeDf, "doc_id", "text", dir))
    NearDup.compactMinhashIndex(spark, dir, targetFiles = 1)
    assert(partFiles(dir, "shingles.parquet") == 1)
    assert(partFiles(dir, "bands.parquet") == 1)
    assert(pairSet(NearDup.minhashPairsAgainstIndex(probeDf, "doc_id", "text", dir)) == before)
  }

  test("re-running compact heals a crash mid-swap (live missing, .bak present)") {
    val dir = Files.createTempDirectory("mh_heal").toString
    NearDup.buildMinhashIndex(corpusDf, "doc_id", "text", dir)
    val before = pairSet(NearDup.minhashPairsAgainstIndex(probeDf, "doc_id", "text", dir))
    // simulate the crash window between live->bak and compact->live
    val live = new Path(s"$dir/bands.parquet")
    val bak = new Path(s"$dir/bands.parquet.bak")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(live, bak)
    NearDup.compactMinhashIndex(spark, dir, targetFiles = 1)
    assert(pairSet(NearDup.minhashPairsAgainstIndex(probeDf, "doc_id", "text", dir)) == before)
    assert(!fs.exists(bak))
  }
}
