package graft.textops

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class NearDupSpec extends GraftSparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today", "a"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight", "a"), // near-dup of 1
    (3L, "completely different content about spark catalyst optimizer internals", "b"),
    (4L, "completely different content about spark catalyst optimizer internals", "b"), // exact dup of 3
    (5L, "unrelated short text", "c"))
    .toDF("doc_id", "text", "source")

  test("minhash LSH finds planted near-dups and exact dups") {
    val pairs = NearDup.minhashPairs(base, "doc_id", "text",
      shingleSize = 3, k = 32, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"near-dup pair missing: $pairs")
    assert(pairs.contains((3L, 4L)), s"exact-dup pair missing: $pairs")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("exact jaccard values are right (hand-computed)") {
    // 14 tokens each -> 12 shingles; all but the last shared -> 11/13
    val j = NearDup.ngramJaccardPairs(base, "doc_id", "text",
      bucketCols = Seq(lit(1).as("b")), threshold = 0.0)
      .filter(col("id_a") === 1 && col("id_b") === 2)
      .select("jaccard").head.getDouble(0)
    assert(math.abs(j - 11.0 / 13.0) < 1e-3, s"got $j")
  }

  test("simhash: near-dups within small hamming, exact dups at 0") {
    // simhash margins need enough tokens to be stable: use long docs
    // differing in one token out of ~140
    val longBase = Seq(
      (1L, ("the quick brown fox jumps over the lazy dog near the river bank " * 10) + "today", "a"),
      (2L, ("the quick brown fox jumps over the lazy dog near the river bank " * 10) + "tonight", "a"),
      (3L, "completely different content about spark catalyst optimizer internals", "b"),
      (4L, "completely different content about spark catalyst optimizer internals", "b"))
      .toDF("doc_id", "text", "source")
    val pairs = NearDup.simhashPairs(longBase, "doc_id", "text", maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.get((3L, 4L)).contains(0))
    assert(pairs.contains((1L, 2L)), s"got $pairs")
  }

  test("simhash maxHamming=0: exact-fingerprint matching (64-bit chunk mask must be -1, not 0)") {
    // (1L << 64) - 1 is 0 under JVM shift-mod-64; an unmasked 64-bit chunk
    // would put EVERY doc in chunk value 0 (quadratic bucket uncapped,
    // zero pairs under a cap). Exact dups must pair at hamming 0 and the
    // near-dup pair (hamming > 0) must NOT appear.
    val longBase = Seq(
      (1L, ("the quick brown fox jumps over the lazy dog near the river bank " * 10) + "today", "a"),
      (2L, ("the quick brown fox jumps over the lazy dog near the river bank " * 10) + "tonight", "a"),
      (3L, "completely different content about spark catalyst optimizer internals", "b"),
      (4L, "completely different content about spark catalyst optimizer internals", "b"))
      .toDF("doc_id", "text", "source")
    val exact = NearDup.simhashPairs(longBase, "doc_id", "text", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(exact.get((3L, 4L)).contains(0), s"exact dup missing at maxHamming=0: $exact")
    assert(exact.values.forall(_ == 0), s"non-zero hamming leaked: $exact")
    // (1,2) happens to land on the SAME fingerprint (one token in ~140
    // doesn't flip a simhash bit) — so no cross-fingerprint pair exists to
    // leak here; the broken mask instead showed up as all four docs in one
    // chunk-0 bucket. Under a cap of 2 the per-fingerprint buckets (sizes
    // 2 and 2) must survive; with the broken mask the single 4-doc bucket
    // was dropped and this returned empty.
    val capped = NearDup.simhashPairs(longBase, "doc_id", "text", maxHamming = 0, maxBucketSize = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == exact.keySet, s"cap dropped within-bound buckets: $capped vs ${exact.keySet}")
  }

  test("simhash bucket cap: uncapped keeps the guarantee; a tiny cap may drop pairs but never invents them") {
    val longBase = Seq(
      (1L, ("the quick brown fox jumps over the lazy dog near the river bank " * 10) + "today", "a"),
      (2L, ("the quick brown fox jumps over the lazy dog near the river bank " * 10) + "tonight", "a"),
      (3L, "completely different content about spark catalyst optimizer internals", "b"),
      (4L, "completely different content about spark catalyst optimizer internals", "b"))
      .toDF("doc_id", "text", "source")
    val uncapped = NearDup.simhashPairs(longBase, "doc_id", "text", maxHamming = 10)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = NearDup.simhashPairs(longBase, "doc_id", "text", maxHamming = 10,
      maxBucketSize = 1)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(uncapped))
    assert(uncapped.contains((1L, 2L)) && uncapped.contains((3L, 4L)))
  }

  test("simhash value is deterministic and order-insensitive in token multiset") {
    val h1 = SimHash.eval(org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array("a", "b", "c").map(org.apache.spark.unsafe.types.UTF8String.fromString)))
    val h2 = SimHash.eval(org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array("c", "a", "b").map(org.apache.spark.unsafe.types.UTF8String.fromString)))
    assert(h1 == h2)
  }

  test("simhash single-pass text variant equals the token-array variant") {
    for (t <- Seq("a b c", "  leading and   multiple  spaces ", "one",
        "the quick brown fox jumps over the lazy dog", "")) {
      val toks = t.trim.split("\\s+").filter(_.nonEmpty)
      val viaTokens = SimHash.eval(org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        toks.map(org.apache.spark.unsafe.types.UTF8String.fromString)))
      val viaText = SimHash.evalText(org.apache.spark.unsafe.types.UTF8String.fromString(t))
      assert(viaTokens == viaText, s"mismatch for '$t'")
    }
  }

  test("hashed shingles equal string-shingle semantics (count + set behavior)") {
    import org.apache.spark.unsafe.types.UTF8String
    // 5 tokens, n=3 -> 3 shingles, one repeated pair of tokens doesn't dedupe
    val sh = graft.textops.TokenShingles.hashedShingles(
      UTF8String.fromString("a b a b a"), 3)
    // shingles: "a b a", "b a b", "a b a" -> distinct = 2
    assert(sh.numElements() == 2)
    // below n tokens -> empty
    assert(graft.textops.TokenShingles.hashedShingles(
      UTF8String.fromString("a b"), 3).numElements() == 0)
    // sorted ascending
    val vals = (0 until sh.numElements()).map(sh.getLong)
    assert(vals == vals.sorted)
  }

  test("winnowing pairs: shared passages found, unrelated not") {
    val pairs = NearDup.winnowPairs(base, "doc_id", "text", minSharedRatio = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((3L, 4L)), s"got $pairs")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("embedding cosine pairs: identical vectors at 1.0") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f))).toDF("id", "vec")
    val got = NearDup.embeddingCosinePairs(df, "id", "vec", threshold = 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("q26's bucket cap never binds on the planted corpus (capped == uncapped at the gate scale)") {
    // sf0.01 IS the driver's correctness-gate scale — pin the invariant
    // where the harness actually runs, not just at the smallest sf
    val planted = graft.SparkEntry.plantedDocs(spark, "/root/testdata/sf0.01")
    def pairs(cap: Long) = NearDup
      .simhashPairs(planted, "doc_id", "text", maxHamming = 6, maxBucketSize = cap)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(0)
    assert(pairs(1000) == uncapped)
    assert(uncapped.nonEmpty)
  }

  test("embedding cosine pairs: non-numeric id column is rejected up front") {
    val df = Seq(("a", Seq(1.0f, 0.0f))).toDF("id", "vec")
    val e = intercept[IllegalArgumentException](
      NearDup.embeddingCosinePairs(df, "id", "vec", threshold = 0.9))
    assert(e.getMessage.contains("must be numeric"))
  }
}
