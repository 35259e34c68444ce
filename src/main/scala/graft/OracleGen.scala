package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.textops.{NearDup, SimHash, TokenShingles, Winnowing}
import graft.vector.{Ann, Ivf, Pq}

/** Generated DuckDB oracles for the six candidate-generation queries
  * whose bucket keys are engine-internal (LSH band hashes, simhash
  * chunks, winnow fingerprints, hyperplane signatures, IVF cells, PQ
  * shortlists) and therefore have no static ANSI-SQL twin.
  *
  * The q35 technique (LangNgram's generated CASE), extended: the ONLY
  * engine-supplied inputs are deterministic per-row KEYS — each one a
  * pure function of the row's text/vector, emitted by the very same
  * Catalyst expressions the query uses and embedded as a VALUES CTE.
  * Everything downstream of the keys — bucket capping, candidate
  * equi-joins, pair dedup, exact Jaccard/Hamming/cosine arithmetic,
  * thresholds, ranking — is recomputed INDEPENDENTLY by DuckDB from
  * plain SQL. A bug anywhere in the engine's join/cap/verify/rank
  * pipeline therefore hash-mismatches; only a bug inside the key
  * expressions themselves is invisible here, and those are covered by
  * the oracle-backed recall gates (q39–q44) plus the unit specs.
  *
  * Every constant below (shingle size, k, bands, caps, thresholds,
  * nlist/nprobe/m/ks/refine) is the SparkEntry query's constant; a
  * drift on either side breaks the hash match — the check is
  * self-enforcing.
  */
object OracleGen {

  /** Degenerate key frames (nothing to embed) and oversized ones (the
    * VALUES literal is O(keys) driver memory AND DuckDB parse cost)
    * both throw — [[all]] catches and drops the entry, degrading to
    * the documented rows-only check instead of emitting `VALUES ()`
    * (a syntax error) or a half-gigabyte SQL string. The cap is sized
    * for the verify gate's sf0.01/sf0.1 corpora with 10x headroom.
    */
  private def checkEmbeddable(name: String, nKeys: Long): Unit = {
    require(nKeys > 0, s"$name: empty key frame, nothing to embed")
    require(nKeys <= 5000000L,
      s"$name: $nKeys keys would embed too large a VALUES literal; " +
        "run the verify gate at a smaller sf (rows-only fallback applies)")
  }

  /** All generated oracles. Each generator runs small Spark jobs on
    * the same sf dir the queries read; a failure drops that entry (the
    * driver then records the weaker rows-only check, same as before)
    * rather than killing the whole dump.
    */
  def all(s: SparkSession, dir: String): Map[String, String] =
    Seq[(String, () => String)](
      "q25_minhash_lsh" -> (() => minhashOracle(s, dir)),
      "q205_neardup_split" -> (() => neardupSplitOracle(s, dir)),
      "q26_simhash" -> (() => simhashOracle(s, dir)),
      "q31_winnow_pairs" -> (() => winnowOracle(s, dir)),
      "q28_ann_lsh" -> (() => annLshOracle(s, dir)),
      "q32_ann_ivf" -> (() => annIvfOracle(s, dir)),
      "q34_ann_pq" -> (() => annPqOracle(s, dir)),
      "q55_bpe_tokens" -> (() => bpeOracle(s, dir)),
      "q168_tokenizer_fertility" -> (() => bpeFertilityOracle(s, dir)),
      "q62_image_neardup" -> (() => imageNearDupOracle(s, dir)),
      "q66_audio_neardup" -> (() => audioNearDupOracle(s, dir)),
      "q68_video_neardup" -> (() => videoNearDupOracle(s, dir)),
      "q64_lm_perplexity" -> (() => lmPerplexityOracle(s, dir)),
      "q97_backoff_lm" -> (() => backoffLmOracle(s, dir)),
      "q65_curation_pipeline" -> (() => curationOracle(s, dir)),
      "q131_crawl_corpus" -> (() => crawlCorpusOracle(s, dir)),
      "q133_ann_graph" -> (() => graphAnnOracle(s, dir)),
      "q134_graph_twin_recall" -> (() => graphRecallOracle(s, dir)),
      "q158_ann_hier" -> (() => graphHierOracle(s, dir)),
      // the index-served twin produces IDENTICAL results by
      // construction (searchIndexHier ≡ fresh build + hier search,
      // GraphAnnSpec pin), so it shares q158's generated replay
      "q204_ann_hier_indexed" -> (() => graphHierOracle(s, dir)),
      "q135_lang_classifier" -> (() => langClassifierOracle(s, dir)),
      "q71_shuffle_shard" -> (() => shuffleShardOracle(s, dir)),
      "q83_shard_manifest" -> (() => shardManifestOracle(s, dir)),
      "q73_quality_classifier" -> (() => qualityClassifierOracle(s, dir)),
      "q75_mixture" -> (() => mixtureOracle(s, dir)),
      "q78_semdedup" -> (() => semDedupOracle(s, dir)),
      "q79_bpe_train" -> (() => bpeTrainOracle(s, dir)),
      "q88_kmeans_refine" -> (() => kmeansRefineOracle(s, dir)),
      "q112_compression" -> (() => compressionOracle(s, dir)),
      "q115_outlinks" -> (() => linkOracle(s, dir)),
      "q116_unigram_train" -> (() => unigramTrainOracle(s, dir)),
      "q117_unigram_segment" -> (() => unigramSegmentOracle(s, dir)),
      "q120_uri_anomaly" -> (() => uriAnomalyOracle(s, dir)),
      "q122_diversity_sample" -> (() => diversityOracle(s, dir)),
      "q146_semantic_order" -> (() => curriculumOracle(s, dir)),
      "q123_outlink_rank" -> (() => outlinkRankOracle(s, dir)),
      "q124_cluster_keywords" -> (() => clusterKeywordsOracle(s, dir)),
      "q125_longest_repeat" -> (() => longestRepeatOracle(s, dir))
    ).flatMap { case (name, gen) =>
      try Some(name -> gen())
      catch {
        case e: Throwable =>
          System.err.println(s"[oracle-gen] $name failed: ${e.getMessage}")
          None
      }
    }.toMap

  private def longs(xs: Seq[Long]): String = xs.mkString("[", ",", "]")

  /** q25: engine emits per-doc sorted shingle-hash sets and LSH band
    * hashes; DuckDB recomputes the bucket cap, the banded candidate
    * join, and exact Jaccard (|A∩B| / |A∪B|) from the sets.
    */
  /** The q25 CTE chain (engine-supplied shingles + band keys, pairs
    * re-derived in SQL with the bucket cap and exact jaccard) —
    * shared by [[minhashOracle]] and [[neardupSplitOracle]].
    */
  private def minhashPairCtes(s: SparkSession, dir: String, tag: String): String = {
    val rows = SparkEntry.plantedDocs(s, dir)
      .select(col("doc_id").as("id"),
        NearDup.hashedShingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", TokenShingles.minhash_sig_long(col("sh"), 32))
      .withColumn("bands", TokenShingles.lsh_band_keys(col("sig"), 8, 32 / 8))
      .select("id", "sh", "bands")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2)))
      .sortBy(_._1)
    checkEmbeddable(tag, rows.iterator.map(_._2.size.toLong + 8).sum)
    val shVals = rows.map { case (id, sh, _) => s"($id, ${longs(sh)})" }.mkString(", ")
    val bandVals = rows.flatMap { case (id, _, bands) =>
      bands.zipWithIndex.map { case (bh, i) => s"($id, $i, $bh)" }
    }.mkString(", ")
    s"""shv(id, sh) AS (VALUES $shVals),
       |sh AS (SELECT CAST(id AS BIGINT) AS id, CAST(sh AS BIGINT[]) AS sh FROM shv),
       |bandv(id, band_idx, band_hash) AS (VALUES $bandVals),
       |capped AS (
       |  SELECT id, band_idx, band_hash FROM (
       |    SELECT id, band_idx, band_hash,
       |           count(*) OVER (PARTITION BY band_idx, band_hash) AS n
       |    FROM bandv) WHERE n <= 100),
       |cand AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM capped a JOIN capped b
       |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.id < b.id),
       |pairs AS (
       |  SELECT id_a, id_b,
       |    round(CASE WHEN len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) = 0
       |          THEN 0.0
       |          ELSE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |             / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
       |          END, 4) AS jaccard
       |  FROM cand JOIN sh sa ON sa.id = cand.id_a JOIN sh sb ON sb.id = cand.id_b)""".stripMargin
  }

  def minhashOracle(s: SparkSession, dir: String): String =
    s"""WITH ${minhashPairCtes(s, dir, "q25_minhash_lsh")}
       |SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.5""".stripMargin

  /** q205: the q25 pair replay feeding the q36 recursive CC and the
    * component split bucket — the whole near-dup-atomic split chain
    * (pairs → clusters → split → audit counts) recomputed from
    * engine-supplied shingles/bands alone.
    */
  def neardupSplitOracle(s: SparkSession, dir: String): String =
    s"""WITH RECURSIVE ${minhashPairCtes(s, dir, "q205_neardup_split")},
       |ids AS (
       |  SELECT doc_id FROM documents
       |  UNION ALL SELECT doc_id + 100000 FROM documents),
       |np AS (SELECT id_a, id_b FROM pairs WHERE jaccard >= 0.5),
       |sym AS (SELECT id_a, id_b FROM np UNION SELECT id_b, id_a FROM np),
       |reach(id, r) AS (
       |  SELECT doc_id, doc_id FROM ids
       |  UNION
       |  SELECT sy.id_b, reach.r FROM reach JOIN sym sy ON sy.id_a = reach.id),
       |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
       |d AS (
       |  SELECT id, component,
       |    CASE WHEN b < 26 THEN 'test'
       |         WHEN b < 39 THEN 'val'
       |         ELSE 'train' END AS split
       |  FROM (SELECT id, component,
       |    CAST(('0x' || substr(md5('split:' || CAST(component AS VARCHAR)),
       |      1, 2)) AS BIGINT) AS b FROM comp))
       |SELECT split, count(DISTINCT component) AS n_components,
       |  count(*) AS n_docs
       |FROM d GROUP BY split""".stripMargin

  /** q26: engine emits per-doc 64-bit simhash fingerprints; DuckDB
    * recomputes the pigeonhole chunk keys (shift+mask from the SHARED
    * [[NearDup.simhashChunkParams]]), the bucket cap, the chunk
    * candidate join, and the Hamming filter via bit_count(xor).
    */
  def simhashOracle(s: SparkSession, dir: String): String = {
    val maxHamming = 6
    val rows = SparkEntry.plantedDocs(s, dir)
      .select(col("doc_id").as("id"),
        SimHash.simhash64_text(lower(col("text"))).as("sh"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    checkEmbeddable("q26_simhash", rows.length.toLong)
    val fVals = rows.map { case (id, sh) => s"($id, $sh)" }.mkString(", ")
    val pVals = NearDup.simhashChunkParams(maxHamming)
      .map { case (i, off, mask) => s"($i, $off, $mask)" }.mkString(", ")
    s"""WITH fv(id, sh) AS (VALUES $fVals),
       |f AS (SELECT CAST(id AS BIGINT) AS id, CAST(sh AS BIGINT) AS sh FROM fv),
       |params(chunk_idx, off, mask) AS (VALUES $pVals),
       |chunks AS (
       |  SELECT id, sh, chunk_idx, (sh >> off) & CAST(mask AS BIGINT) AS chunk
       |  FROM f CROSS JOIN params),
       |capped AS (
       |  SELECT id, sh, chunk_idx, chunk FROM (
       |    SELECT *, count(*) OVER (PARTITION BY chunk_idx, chunk) AS n
       |    FROM chunks) WHERE n <= 1000)
       |SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       |  CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
       |FROM capped a JOIN capped b
       |  ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk AND a.id < b.id
       |WHERE bit_count(xor(a.sh, b.sh)) <= $maxHamming""".stripMargin
  }

  /** q62: engine emits each image's 64-bit dHash (computed through the
    * REAL ImageIO decode); DuckDB recomputes the pigeonhole chunk keys
    * (shared [[NearDup.simhashChunkParams]]), the bucket cap, the chunk
    * candidate join, and the Hamming verify — the same independent
    * recomputation as [[simhashOracle]], over perceptual instead of
    * text fingerprints.
    */
  def imageNearDupOracle(s: SparkSession, dir: String): String = {
    val rows = SparkEntry.imageTwinCorpus(s, dir)
      .select(col("media_id").as("id"),
        graft.multimodal.PerceptualHash.dhash64(col("bytes")).as("fp"))
      // undecodable payloads hash to null; fingerprintPairs drops them
      // too, so the oracle must filter BEFORE getLong (NPE otherwise)
      .filter(col("fp").isNotNull)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    checkEmbeddable("q62_image_neardup", rows.length.toLong)
    hamming64PairsSql(rows, maxHamming = 4, cap = 1000L)
  }

  /** q66: [[imageNearDupOracle]]'s construction over the AUDIO hashes
    * (slice-energy gradients through the real javax.sound decode) —
    * same independent chunk/cap/Hamming recomputation.
    */
  def audioNearDupOracle(s: SparkSession, dir: String): String = {
    val rows = SparkEntry.audioTwinCorpus(s, dir)
      .select(col("media_id").as("id"),
        graft.multimodal.PerceptualHash.audio_hash64(col("bytes")).as("fp"))
      // same null-drop as the engine side (see imageNearDupOracle)
      .filter(col("fp").isNotNull)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    checkEmbeddable("q66_audio_neardup", rows.length.toLong)
    hamming64PairsSql(rows, maxHamming = 4, cap = 1000L)
  }

  /** q79: a SECOND BPE learner, written independently (functional
    * structures, different pair-count and rewrite code paths), runs on
    * the driver over the same corpus and embeds its merge table — the
    * q64/q73 technique. Shared with the engine: only the data and the
    * published algorithm's contract (freq-weighted adjacent-position
    * counts, lexicographic tie-break, left-to-right non-overlap
    * rewrite, stop below pair-freq 2). Any divergence in the engine's
    * distributed word count, cap ordering, or merge loop
    * hash-mismatches the table.
    */
  def bpeTrainOracle(s: SparkSession, dir: String): String = {
    val texts = s.read.parquet(s"$dir/documents.parquet")
      .select(col("text")).collect().map(_.getString(0))
    checkEmbeddable("q79_bpe_train", texts.length.toLong)
    // independent tokenization + word counting (SPACE-only trim —
    // Spark's trim(), unlike Java String.trim, strips ' ' alone)
    val wordFreq: Map[List[String], Long] = texts.iterator
      .flatMap { t =>
        if (t == null) Iterator.empty
        else {
          val sp = t.replaceAll("^ +| +$", "")
          if (sp.isEmpty) Iterator.empty else sp.split("\\s+").iterator
        }
      }
      .foldLeft(Map.empty[String, Long]) { (m, w) =>
        m.updated(w, m.getOrElse(w, 0L) + 1L)
      }
      .map { case (w, f) =>
        (w.codePoints().toArray.toList
          .map(cp => new String(Character.toChars(cp))), f)
      }
    // independent learner: pairs via sliding, best via sorted ordering,
    // merge via a recursive rewrite
    def mergeWord(syms: List[String], a: String, b: String): List[String] =
      syms match {
        case x :: y :: rest if x == a && y == b => (a + b) :: mergeWord(rest, a, b)
        case x :: rest => x :: mergeWord(rest, a, b)
        case Nil => Nil
      }
    @scala.annotation.tailrec
    def learn(vocab: Map[List[String], Long], left: Int,
        acc: List[(String, String)]): List[(String, String)] =
      if (left == 0) acc.reverse
      else {
        val pairCounts = vocab.toSeq
          .flatMap { case (syms, f) => syms.sliding(2).collect {
            case List(x, y) => ((x, y), f) } }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        val eligible = pairCounts.filter(_._2 >= 2L)
        if (eligible.isEmpty) acc.reverse
        else {
          val best = eligible.toSeq
            .sortBy { case ((a, b), n) => (-n, a, b) }.head._1
          val merged = vocab.toSeq
            .map { case (syms, f) => (mergeWord(syms, best._1, best._2), f) }
            .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
          learn(merged, left - 1, best :: acc)
        }
      }
    val merges = learn(wordFreq, 40, Nil)
    checkEmbeddable("q79_bpe_train", merges.length.toLong)
    def esc(x: String): String = "'" + x.replace("'", "''") + "'"
    val vals = merges.zipWithIndex
      .map { case ((a, b), i) => s"($i, ${esc(a)}, ${esc(b)})" }
      .mkString(", ")
    s"""SELECT CAST(rank AS BIGINT) AS rank, lhs, rhs
       |FROM (VALUES $vals) t(rank, lhs, rhs)""".stripMargin
  }

  /** q78: the ONLY engine-supplied inputs are the (vec_id, cell)
    * k-means assignments — the candidate blocker, emitted by the same
    * [[graft.vector.Ivf.nearest_cells]] expression the query uses
    * (centroids have no static twin: k-means). DuckDB independently
    * recomputes the planted twin corpus, the within-cell pair join,
    * the rounded cosine arithmetic, the threshold, and the
    * keep-first-by-id drop rule from the raw embeddings.
    */
  def semDedupOracle(s: SparkSession, dir: String): String = {
    val emb = SparkEntry.plantedEmbeddings(s, dir)
    val centroids = Ivf.fitCentroids(emb, "embedding",
      SparkEntry.semDedupClusters(emb),
      cacheKey = Some("oracle:" + dir + "#embeddings-planted"))
    val cells = emb.select(col("vec_id"),
      Ivf.nearest_cells(col("embedding"), centroids, 1).getItem(0).as("cell"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)))
      .sortBy(_._1)
    checkEmbeddable("q78_semdedup", cells.length.toLong)
    val cVals = cells.map { case (id, c) => s"($id, $c)" }.mkString(", ")
    s"""WITH cellv(vec_id, cell) AS (VALUES $cVals),
       |base AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 100000, list_transform(embedding::DOUBLE[], x -> x + 0.01)
       |  FROM embeddings),
       |c AS (
       |  SELECT b.vec_id, CAST(cellv.cell AS INT) AS cell, v,
       |         sqrt(list_dot_product(v, v)) AS n
       |  FROM base b JOIN cellv ON cellv.vec_id = b.vec_id),
       |drops AS (
       |  SELECT DISTINCT b.vec_id AS id
       |  FROM c a JOIN c b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE round(list_dot_product(a.v, b.v) / (a.n * b.n), 4) >= 0.99)
       |SELECT vec_id, cell,
       |  vec_id NOT IN (SELECT id FROM drops) AS kept
       |FROM c""".stripMargin
  }

  /** q88: an INDEPENDENT driver-side recomputation of the distributed
    * fixed-point Lloyd refinement — the q64/q73 technique. Shares only
    * the arithmetic CONTRACT with [[Ivf.refineCentroids]] (reciprocal-
    * multiply normalization, floor(x*inv*2^40 + 0.5) quantization,
    * exact integer sums, the s/n/S mean expression, empty-cell
    * stability, lowest-id init): own loops, own BigInt accumulation,
    * own argmin. Because the engine's sums are fixed-point integers,
    * the recomputation is bit-identical REGARDLESS of Spark's
    * partitioning — which is exactly the property under test; the
    * embedded per-vector cells are therefore exact, not approximate.
    */
  /** q112: deflate has no DuckDB twin, so the per-doc (raw, deflated,
    * ratio) triples come from an INDEPENDENT driver-side scorer — the
    * `DeflaterOutputStream` stream path against the engine's manual
    * `Deflater.deflate` loop, sharing only the level-6/raw-stream
    * constants (the q64 independent-driver-scorer technique). Flags
    * recompute in SQL from the embedded ratios.
    */
  def compressionOracle(s: SparkSession, dir: String): String = {
    val rows = SparkEntry.compressionFixture(s, dir)
      .select("doc_id", "ftext").collect()
      .map { r =>
        val raw = r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val bos = new java.io.ByteArrayOutputStream()
        val dos = new java.util.zip.DeflaterOutputStream(
          bos, new java.util.zip.Deflater(6, true))
        dos.write(raw); dos.close()
        val dl = bos.size().toLong
        val ratio = if (raw.isEmpty) 0L else dl * 10000L / raw.length
        (r.getLong(0), raw.length.toLong, dl, ratio)
      }.sortBy(_._1)
    checkEmbeddable("q112_compression", rows.length.toLong)
    val vals = rows.map { case (id, rb, db, ra) => s"($id, $rb, $db, $ra)" }
      .mkString(", ")
    s"""WITH expv(doc_id, raw_bytes, deflate_bytes, ratio_x10000) AS (VALUES $vals)
       |SELECT d.doc_id, CAST(raw_bytes AS BIGINT) AS raw_bytes,
       |  CAST(deflate_bytes AS BIGINT) AS deflate_bytes,
       |  CAST(ratio_x10000 AS BIGINT) AS ratio_x10000,
       |  CASE WHEN ratio_x10000 < 1500 THEN 'too_compressible'
       |       WHEN ratio_x10000 > 6000 THEN 'incompressible'
       |       ELSE 'ok' END AS flag
       |FROM documents d JOIN expv ON expv.doc_id = d.doc_id""".stripMargin
  }

  /** q116/q117: a fully INDEPENDENT unigram-LM trainer + segmenter
    * (immutable maps, fold/recursion idioms — zero shared code with
    * [[graft.textops.Unigram]]), sharing ONLY the documented
    * determinism rules and the four constants (vocab 400, maxPieceLen
    * 6, 2 hard-EM iterations, UNK −1e4). Replays: Spark-split word
    * frequencies (trailing-empty semantics of Spark `split` included),
    * weighted substring seed, prune/score formula, Viterbi with the
    * longer-piece tie-break, two EM iterations, the corpus-exact
    * refine pass, and per-doc segmentation. Any divergence anywhere in
    * the engine's distributed pipeline hash-mismatches.
    */
  private def unigramExpected(s: SparkSession, dir: String)
      : (Seq[(String, Long)], Seq[(Long, Long, String)]) = {
    val VS = 400; val ML = 6; val EI = 2; val MK = "▁"
    val docs: Seq[(Long, String)] = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) "" else r.getString(1)))
      .sortBy(_._1).toSeq
    def cps(w: String): Vector[String] =
      w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))
    def isSingle(p: String) = p.codePointCount(0, p.length) == 1
    // word frequencies under the ENGINE's split semantics: Spark trim
    // strips spaces only; Spark split keeps leading/trailing empties
    val wordFreq: Map[String, Long] = docs.iterator.flatMap { case (_, t) =>
      val sp = t.replaceAll("^ +| +$", "")
      if (sp.isEmpty) Iterator.empty else sp.split("\\s+", -1).iterator
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val marked: Seq[(Vector[String], Long)] =
      wordFreq.toSeq.sortBy(_._1).map { case (w, f) => (cps(MK + w), f) }
    val seedCounts: Map[String, Long] =
      marked.foldLeft(Map.empty[String, Long]) { case (m, (cp, f)) =>
        val subs = for {
          i <- cp.indices
          l <- 1 to math.min(ML, cp.length - i)
        } yield cp.slice(i, i + l).mkString
        subs.foldLeft(m)((mm, p) => mm.updated(p, mm.getOrElse(p, 0L) + f))
      }
    val seedSingles: Seq[String] =
      seedCounts.keysIterator.filter(isSingle).toSeq.sorted
    def prune(singles: Seq[(String, Long)], multis: Seq[(String, Long)])
        : (Vector[String], Map[String, Double], Int) = {
      val keptM = multis.filter(_._2 > 0L)
        .sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, VS - singles.size))
      val kept = (singles.map { case (p, c) => (p, math.max(c, 1L)) } ++ keptM)
        .sortBy(_._1)
      val t = kept.map(_._2).sum.toDouble
      val maxLen = math.max(1,
        kept.iterator.map(e => e._1.codePointCount(0, e._1.length)).max)
      (kept.map(_._1).toVector,
        kept.map { case (p, c) => p -> Math.log(c / t) }.toMap, maxLen)
    }
    def viterbi(cp: Vector[String], score: Map[String, Double],
        maxLen: Int): List[String] = {
      val n = cp.length
      val memo = new Array[(Double, Int)](n + 1)
      memo(0) = (0.0, 0)
      for (i <- 1 to n) {
        var bestSc = Double.NegativeInfinity
        var bestL = 0
        for (l <- 1 to math.min(maxLen, i)) {
          val prev = memo(i - l)
          if (prev._1 != Double.NegativeInfinity) {
            val piece = cp.slice(i - l, i).mkString
            val ps = score.get(piece) match {
              case Some(v) => v
              case None =>
                if (l == 1) graft.textops.Unigram.UnkScore
                else Double.NegativeInfinity
            }
            if (ps != Double.NegativeInfinity) {
              val cand = prev._1 + ps
              if (cand > bestSc || (cand == bestSc && l > bestL)) {
                bestSc = cand; bestL = l
              }
            }
          }
        }
        memo(i) = (bestSc, bestL)
      }
      var out = List.empty[String]
      var j = n
      while (j > 0) {
        val l = memo(j)._2
        out = cp.slice(j - l, j).mkString :: out
        j -= l
      }
      out
    }
    var (pieces, scores, maxLen) = prune(
      seedCounts.toSeq.filter(e => isSingle(e._1)).sortBy(_._1),
      seedCounts.toSeq.filter(e => !isSingle(e._1)))
    for (_ <- 1 to EI) {
      val c2 = marked.foldLeft(Map.empty[String, Long]) { case (m, (cp, f)) =>
        viterbi(cp, scores, maxLen)
          .foldLeft(m)((mm, p) => mm.updated(p, mm.getOrElse(p, 0L) + f))
      }
      val next = prune(
        seedSingles.map(p => (p, c2.getOrElse(p, 0L))),
        c2.toSeq.filter(e => !isSingle(e._1)))
      pieces = next._1; scores = next._2; maxLen = next._3
    }
    // corpus-exact refine: occurrence counts from per-doc segmentation
    def segDoc(t: String): List[String] =
      t.split("[ \t\n\f\r]+").toList.filter(_.nonEmpty)
        .flatMap(w => viterbi(cps(MK + w), scores, maxLen))
    val refCounts = docs.foldLeft(Map.empty[String, Long]) { case (m, (_, t)) =>
      segDoc(t).foldLeft(m)((mm, p) => mm.updated(p, mm.getOrElse(p, 0L) + 1L))
    }
    val refined = prune(
      pieces.filter(isSingle).map(p => (p, refCounts.getOrElse(p, 0L))),
      pieces.filter(p => !isSingle(p)).map(p => (p, refCounts.getOrElse(p, 0L))))
    pieces = refined._1; scores = refined._2; maxLen = refined._3
    val vocab = pieces.map(p =>
      (p, Math.floor(scores(p) * 1e6).toLong))
    val segs = docs.map { case (id, t) =>
      val ps = segDoc(t)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(ps.mkString("")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      (id, ps.length.toLong, md.map("%02x".format(_)).mkString)
    }
    (vocab, segs)
  }

  def unigramTrainOracle(s: SparkSession, dir: String): String = {
    val (vocab, _) = unigramExpected(s, dir)
    checkEmbeddable("q116_unigram_train", vocab.length.toLong)
    def esc(x: String): String = "'" + x.replace("'", "''") + "'"
    val vals = vocab.map { case (p, sx) => s"(${esc(p)}, $sx)" }.mkString(", ")
    s"""SELECT piece, CAST(sx AS BIGINT) AS score_x1e6
       |FROM (VALUES $vals) t(piece, sx)""".stripMargin
  }

  def unigramSegmentOracle(s: SparkSession, dir: String): String = {
    val (_, segs) = unigramExpected(s, dir)
    checkEmbeddable("q117_unigram_segment", segs.length.toLong)
    val vals = segs.map { case (id, n, md) => s"($id, $n, '$md')" }.mkString(", ")
    s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(np AS BIGINT) AS n_pieces,
       |  seg_md5
       |FROM (VALUES $vals) t(doc_id, np, seg_md5)""".stripMargin
  }

  /** q122: the q78 discipline — the (vec_id, cell) k-means
    * assignments are the ONLY engine-supplied keys; Hamilton
    * apportionment, the per-cell cap, the md5 within-cell ranking,
    * and the quota cut all recompute independently in SQL.
    */
  def diversityOracle(s: SparkSession, dir: String): String = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val centroids = Ivf.fitCentroids(emb, "embedding", 8,
      cacheKey = Some("oracle:" + dir + "#embeddings"))
    val cells = emb.select(col("vec_id"),
      Ivf.nearest_cells(col("embedding"), centroids, 1).getItem(0).as("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    checkEmbeddable("q122_diversity_sample", cells.length.toLong)
    val vals = cells.map { case (id, c) => s"($id, $c)" }.mkString(", ")
    s"""WITH cellv(vec_id, cell) AS (VALUES $vals),
       |sizes AS (SELECT cell, count(*) AS n_c FROM cellv GROUP BY 1),
       |tot AS (SELECT count(*) AS n_total FROM cellv),
       |alloc AS (
       |  SELECT cell, n_c, (100 * n_c) // n_total AS base,
       |         (100 * n_c) % n_total AS rem
       |  FROM sizes CROSS JOIN tot),
       |sb AS (SELECT sum(base) AS sum_base FROM alloc),
       |q AS (SELECT *, row_number() OVER (ORDER BY rem DESC, cell ASC) AS crank
       |      FROM alloc CROSS JOIN sb),
       |quotas AS (
       |  SELECT cell, least(n_c, base +
       |    CASE WHEN crank <= 100 - sum_base THEN 1 ELSE 0 END) AS quota
       |  FROM q),
       |ranked AS (
       |  SELECT vec_id, cell,
       |    row_number() OVER (PARTITION BY cell
       |      ORDER BY md5('div9:' || CAST(vec_id AS VARCHAR)) ASC, vec_id ASC)
       |      AS pick_rank
       |  FROM cellv)
       |SELECT CAST(r.vec_id AS BIGINT) AS vec_id, CAST(r.cell AS INT) AS cell,
       |  CAST(r.pick_rank AS BIGINT) AS pick_rank
       |FROM ranked r JOIN quotas USING (cell) WHERE pick_rank <= quota""".stripMargin
  }

  /** q146: the q122/q78 generated-key discipline — the engine supplies
    * ONLY its (vec_id, cell) assignments and the fitted centroid
    * coordinates (Double.toString round-trips bit-exactly through
    * DuckDB's correctly-rounded parse); every cosine, in-cell rank and
    * cell-major offset recomputes in SQL from the raw embeddings.
    */
  def curriculumOracle(s: SparkSession, dir: String): String = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val n = SparkEntry.semDedupClusters(emb)
    val centroids = Ivf.fitCentroids(emb, "embedding", n,
      cacheKey = Some("oracle:" + dir + "#embeddings"))
    val cells = emb.select(col("vec_id"),
      Ivf.nearest_cells(col("embedding"), centroids, 1).getItem(0).as("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    checkEmbeddable("q146_semantic_order",
      cells.length.toLong + centroids.map(_.length.toLong).sum)
    val vals = cells.map { case (id, c) => s"($id, $c)" }.mkString(", ")
    val cvals = centroids.zipWithIndex.map { case (c, i) =>
      s"($i, [${c.map(_.toString).mkString(", ")}]::DOUBLE[])"
    }.mkString(", ")
    s"""WITH cellv(vec_id, cell) AS (VALUES $vals),
       |cent(cell, cv) AS (VALUES $cvals),
       |v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |scored AS (
       |  SELECT a.vec_id, a.cell,
       |    list_dot_product(v.v, c.cv) /
       |      (sqrt(list_dot_product(v.v, v.v)) *
       |       sqrt(list_dot_product(c.cv, c.cv))) AS cos
       |  FROM cellv a JOIN v USING (vec_id) JOIN cent c USING (cell)),
       |ranked AS (
       |  SELECT vec_id, cell, cos,
       |    row_number() OVER (PARTITION BY cell
       |      ORDER BY cos DESC, vec_id ASC) AS cell_rank
       |  FROM scored),
       |offs AS (SELECT cell, count(*) AS nc FROM cellv GROUP BY cell),
       |o2 AS (
       |  SELECT cell, coalesce(sum(nc) OVER (ORDER BY cell
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
       |  FROM offs)
       |SELECT r.vec_id, CAST(r.cell AS INT) AS cell, round(r.cos, 4) AS sim,
       |  CAST(r.cell_rank AS BIGINT) AS cell_rank,
       |  CAST(o2.off + r.cell_rank AS BIGINT) AS global_pos
       |FROM ranked r JOIN o2 USING (cell)""".stripMargin
  }

  /** q115: href extraction, quote-strip, and dst_host all recompute in
    * DuckDB from the SQL-rebuilt fixture (the regex repertoire is
    * Java/RE2-shared by design); RFC 3986 resolution — the one
    * non-SQL-expressible step — embeds from an INDEPENDENT
    * implementation, `java.net.URI.resolve` (RFC-correct on the
    * fixture's well-formed repertoire), with the engine's two
    * documented link-graph rules applied on top: fragments drop,
    * non-http(s) results and empty refs are non-edges. The join on
    * (doc_id, link_idx) makes extraction disagreements visible too: a
    * missing or extra engine match misaligns every later index of that
    * document.
    */
  /** The embedded independent-resolution rows shared by the q115 and
    * q123 oracles: `(doc_id, link_idx, 'resolved-url')` literals from
    * `java.net.URI` over the engine-extracted raw hrefs.
    */
  private def linkResolutionVals(s: SparkSession, dir: String): Seq[String] = {
    val rows = SparkEntry.linkFixture(s, dir)
      .select(col("doc_id"), col("page_url"),
        graft.textops.LinkExtract.rawHrefs(col("html")).as("hs"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2)))
      .sortBy(_._1)
    checkEmbeddable("link_resolution", rows.iterator.map(_._3.size.toLong).sum)
    def resolveJava(base: String, ref: String): Option[String] = {
      if (ref.trim.isEmpty) return None // empty ref: no edge (shared rule)
      val res =
        try java.net.URI.create(base).resolve(java.net.URI.create(ref))
        catch { case _: Exception => return None }
      val scheme = res.getScheme
      if (scheme == null) return None
      val sl = scheme.toLowerCase(java.util.Locale.ROOT)
      if (sl != "http" && sl != "https") return None // shared rule
      val str = res.toString
      val h = str.indexOf('#') // shared rule: fragments drop
      Some(if (h >= 0) str.substring(0, h) else str)
    }
    rows.flatMap { case (id, base, hs) =>
      hs.zipWithIndex.flatMap { case (h, i) =>
        resolveJava(base, h).map(u => s"($id, $i, '${u.replace("'", "''")}')")
      }
    }.toSeq
  }

  def linkOracle(s: SparkSession, dir: String): String = {
    val vals = linkResolutionVals(s, dir)
    require(vals.nonEmpty, "q115: no resolvable links")
    val pat = graft.textops.LinkExtract.hrefPattern.replace("'", "''")
    s"""WITH fx AS (
       |  SELECT doc_id,
       |    '<p>intro</p><a href="https://ext' || CAST(doc_id % 5 AS VARCHAR) ||
       |      '.example.org/x/y?z=' || CAST(doc_id AS VARCHAR) || '">abs</a>' ||
       |    '<A HREF=''//cdn' || CAST(doc_id % 3 AS VARCHAR) ||
       |      '.example.net/asset.js''>proto</A>' ||
       |    '<a class="m" href=/r/p' || CAST(doc_id % 11 AS VARCHAR) || '>rooted</a>' ||
       |    '<a href="sub/item' || CAST(doc_id AS VARCHAR) || '.html">rel</a>' ||
       |    '<a href="../up/i' || CAST(doc_id % 4 AS VARCHAR) || '">up</a>' ||
       |    CASE WHEN doc_id % 2 = 0 THEN '<a href="javascript:void(0)">js</a>' ELSE '' END ||
       |    CASE WHEN doc_id % 3 = 0 THEN '<a href="mailto:x@example.com">m</a>' ELSE '' END ||
       |    '<a href="./here.html?q=' || CAST(doc_id % 6 AS VARCHAR) || '">dot</a>' ||
       |    CASE WHEN doc_id % 5 = 0 THEN '<a href="">empty</a>' ELSE '' END ||
       |    CASE WHEN doc_id % 4 = 1 THEN '<a href="#top">top</a>' ELSE '' END ||
       |    '<img href="/not-anchor"><a name="x">none</a>' AS html
       |  FROM documents),
       |ex AS (
       |  SELECT doc_id, regexp_extract_all(html, '$pat', 1) AS hs FROM fx),
       |links AS (
       |  SELECT doc_id, unnest(range(len(hs))) AS li,
       |         regexp_replace(unnest(hs), '^["'']|["'']$$', '', 'g') AS href
       |  FROM ex),
       |res(doc_id, li, url) AS (VALUES ${vals.mkString(", ")}),
       |j AS (
       |  SELECT l.doc_id, CAST(l.li AS BIGINT) AS link_idx, l.href, r.url,
       |    regexp_replace(regexp_replace(regexp_extract(r.url,
       |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '^.*@', ''),
       |      ':[0-9]*$$', '') AS h
       |  FROM links l JOIN res r ON l.doc_id = r.doc_id AND l.li = r.li)
       |SELECT doc_id, link_idx, href, url,
       |  CASE WHEN length(h) > 0 THEN lower(h) END AS dst_host
       |FROM j""".stripMargin
  }

  /** q125: the independent-driver-scorer technique — a SECOND
    * longest-repeat implementation (plain substring-set binary
    * search, no rolling hash, different idioms) computes every doc's
    * answer over the shared fixture; the embedded values join against
    * the SQL-rebuilt fixture and the derived columns recompute in
    * SQL.
    */
  def longestRepeatOracle(s: SparkSession, dir: String): String = {
    def lrs(t: String): Int = {
      val n = t.length
      if (n < 2) return 0
      def has(len: Int): Boolean = {
        val seen = scala.collection.mutable.HashSet.empty[String]
        (0 to n - len).exists(i => !seen.add(t.substring(i, i + len)))
      }
      var lo = 0
      var hi = n - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (has(mid)) lo = mid else hi = mid - 1
      }
      lo
    }
    val rows = SparkEntry.repeatFixture(s, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    checkEmbeddable("q125_longest_repeat", rows.length.toLong)
    val vals = rows.map { case (id, t) => s"($id, ${lrs(t)})" }.mkString(", ")
    s"""WITH expv(doc_id, lr) AS (VALUES $vals),
       |fx AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 5 = 0 THEN coalesce(text, '') || ' ' ||
       |      substr(coalesce(text, ''), 1, 40) || ' ' ||
       |      substr(coalesce(text, ''), 1, 40)
       |    ELSE coalesce(text, '') END AS ftext
       |  FROM documents),
       |j AS (
       |  SELECT fx.doc_id, length(fx.ftext) AS n_chars,
       |    CAST(e.lr AS BIGINT) AS longest_repeat
       |  FROM fx JOIN expv e ON e.doc_id = fx.doc_id)
       |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, longest_repeat,
       |  (longest_repeat * 10000) // greatest(n_chars, 1) AS rep_x10000,
       |  (longest_repeat * 10000) // greatest(n_chars, 1) >= 2000 AS flagged
       |FROM j""".stripMargin
  }

  /** q124: cells embed (the q78 discipline); tokens, df, per-cell cf,
    * the stop-term cap, the smooth-idf score, rounding, and the
    * ranked cut all recompute in SQL.
    */
  def clusterKeywordsOracle(s: SparkSession, dir: String): String = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val centroids = Ivf.fitCentroids(emb, "embedding", 8,
      cacheKey = Some("oracle:" + dir + "#embeddings"))
    val cells = emb.select(col("vec_id"),
      Ivf.nearest_cells(col("embedding"), centroids, 1).getItem(0).as("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    checkEmbeddable("q124_cluster_keywords", cells.length.toLong)
    val vals = cells.map { case (id, c) => s"($id, $c)" }.mkString(", ")
    raw"""WITH cellv(doc_id, cell) AS (VALUES $vals),
       |toks AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE string_split_regex(trim(lower(text)), '[ \t\n\x0b\f\r]+')
       |         END AS ts
       |  FROM documents),
       |t AS (SELECT doc_id, u.term FROM toks, unnest(ts) AS u(term)),
       |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
       |dft AS (SELECT term, count(*) AS df
       |        FROM (SELECT DISTINCT doc_id, term FROM t) GROUP BY term),
       |cf AS (
       |  SELECT c.cell, t.term, count(*) AS cf
       |  FROM t JOIN cellv c ON c.doc_id = t.doc_id
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT cf.cell, cf.term, cf.cf, dft.df,
       |    round(cf.cf * (ln((nd.n_docs + 1) / (dft.df + 1)) + 1.0), 4) AS score
       |  FROM cf JOIN dft USING (term) CROSS JOIN nd
       |  WHERE dft.df <= greatest(8, nd.n_docs // 5)),
       |rk AS (
       |  SELECT *, row_number() OVER (PARTITION BY cell
       |    ORDER BY score DESC, term ASC) AS rank
       |  FROM scored)
       |SELECT CAST(cell AS INT) AS cell, rank, term, score,
       |  CAST(cf AS BIGINT) AS cf, CAST(df AS BIGINT) AS df
       |FROM rk WHERE rank <= 5""".stripMargin
  }

  /** q123: the crawl-loop composition oracle — src hosts from the
    * SQL-rebuilt fixture, dst hosts from the embedded independent
    * resolution ([[linkResolutionVals]]), the distinct host-edge set
    * and the q100-style integer PageRank recurrence replayed entirely
    * in SQL on host STRINGS (ids are an engine-internal detail).
    */
  def outlinkRankOracle(s: SparkSession, dir: String): String = {
    val vals = linkResolutionVals(s, dir)
    require(vals.nonEmpty, "q123: no resolvable links")
    val base = graft.operators.LinkGraph.Scale * 15 / 100
    val iters = (1 to 5).map { k =>
      s"""p$k AS (
         |  SELECT n.host AS id, $base + COALESCE(s.c, 0) AS r
         |  FROM n LEFT JOIN (
         |    SELECT e.dst AS id,
         |           CAST(SUM((p.r * 85) // (100 * g.deg)) AS BIGINT) AS c
         |    FROM p${k - 1} p JOIN e ON e.src = p.id JOIN g ON g.src = e.src
         |    GROUP BY e.dst) s ON s.id = n.host)""".stripMargin
    }.mkString(",\n")
    s"""WITH res(doc_id, li, url) AS (VALUES ${vals.mkString(", ")}),
       |d AS (
       |  SELECT doc_id,
       |    'host' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' AS src_host
       |  FROM documents),
       |l AS (
       |  SELECT doc_id,
       |    CASE WHEN length(h) > 0 THEN lower(h) END AS dst_host
       |  FROM (
       |    SELECT doc_id,
       |      regexp_replace(regexp_replace(regexp_extract(url,
       |        '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '^.*@', ''),
       |        ':[0-9]*$$', '') AS h
       |    FROM res)),
       |e AS (
       |  SELECT DISTINCT d.src_host AS src, l.dst_host AS dst
       |  FROM d JOIN l USING (doc_id)
       |  WHERE l.dst_host IS NOT NULL AND l.dst_host != d.src_host),
       |n AS (SELECT src AS host FROM e UNION SELECT dst FROM e),
       |g AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
       |p0 AS (SELECT host AS id, ${graft.operators.LinkGraph.Scale} AS r FROM n),
       |""".stripMargin + iters + """
       |SELECT n.host, p.r AS host_rank_fp
       |FROM n JOIN p5 p ON p.id = n.host""".stripMargin
  }

  def kmeansRefineOracle(s: SparkSession, dir: String): String = {
    val rows = s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    checkEmbeddable("q88_kmeans_refine", rows.length.toLong)
    val S = Ivf.RefineScale.toDouble
    val k = 8
    val iters = 2
    def normalize(v: Array[Double]): Array[Double] = {
      var norm = 0.0
      var i = 0
      while (i < v.length) { norm += v(i) * v(i); i += 1 }
      val inv = if (norm > 0) 1.0 / math.sqrt(norm) else 0.0
      v.map(_ * inv)
    }
    var centers: Array[Array[Double]] = rows.take(k).map(r => normalize(r._2))
    def assign(vn: Array[Double]): Int = {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < centers.length) {
        var acc = 0.0
        var j = 0
        val m = math.min(vn.length, centers(c).length)
        while (j < m) { val d = vn(j) - centers(c)(j); acc += d * d; j += 1 }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      best
    }
    for (_ <- 0 until iters) {
      val dim = centers(0).length
      val sums = Array.fill(k)(Array.fill(dim)(BigInt(0)))
      val counts = new Array[Long](k)
      rows.foreach { case (_, v) =>
        val vn = normalize(v)
        val c = assign(vn)
        counts(c) += 1
        var j = 0
        while (j < dim) {
          sums(c)(j) += BigInt(math.floor(vn(j) * S + 0.5).toLong)
          j += 1
        }
      }
      val next = centers.map(_.clone())
      for (c <- 0 until k if counts(c) > 0; j <- 0 until dim)
        next(c)(j) = new java.math.BigDecimal(sums(c)(j).bigInteger).doubleValue() /
          counts(c).toDouble / S
      centers = next
    }
    val vals = rows.map { case (id, v) => s"($id, ${assign(normalize(v))})" }
      .mkString(", ")
    s"""WITH a(vec_id, cell) AS (VALUES $vals)
       |SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cell AS INT) AS cell
       |FROM a""".stripMargin
  }

  /** q71: the ONLY engine-supplied inputs are the per-doc permutation
    * keys (`xxhash64(seed, doc_id)` — DuckDB has no xxhash64), emitted
    * by the same expression [[graft.operators.CorpusOrder.shuffleKey]]
    * the query uses. DuckDB independently recomputes the token counts
    * from the documents table, the (key, id) permutation order, the
    * one-window running total in that order, and the shard DIV —
    * i.e. the entire chunked-prefix-sum machinery under test.
    */
  /** q131: the crawl->corpus flagship recomputed in ONE DuckDB query.
    * Engine-supplied inputs, both keyed by doc_id so any stage
    * divergence breaks the key join and the hash match: (a) the
    * post-URL-dedup corpus's minhash shingle sets + band hashes (the
    * q65 recipe), (b) the xxhash64 shuffle keys (the q71 recipe —
    * DuckDB has no xxhash64). Everything else — the page fixture, the
    * WARC ingest verdicts (a pure doc_id%13 function, q109's rule),
    * the q111 block chain, the mojibake prefix repair (guarded
    * `starts_with`: only planted docs can carry the prefix and their
    * tails are pure ASCII, so whole-string repair provably equals the
    * literal substitution), the q20/q52/q128/q130 gates, canonical-URL
    * keep-first, banded candidate join + exact Jaccard + connected
    * components + keep-best, eval decontamination, the budget cumsum,
    * and the shuffle-order shard cut — is plain SQL over the previous
    * CTE. The WARC byte round-trip has no oracle-side shortcut: the
    * final md5(text) only matches if every clean payload came back
    * byte-exact through the streaming parser.
    */
  def crawlCorpusOracle(s: SparkSession, dir: String): String = {
    val ingested = SparkEntry.crawlPages(s, dir)
      .filter(col("doc_id") % 13 =!= 5 && col("doc_id") % 13 =!= 9)
      .select(col("doc_id"), col("page_url").as("target_uri"), col("html"))
    val dd = SparkEntry.crawlUrlDeduped(SparkEntry.crawlGated(ingested))
    val rows = dd
      .select(col("doc_id").as("id"), NearDup.hashedShingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", TokenShingles.minhash_sig_long(col("sh"), 32))
      .withColumn("bands", TokenShingles.lsh_band_keys(col("sig"), 8, 32 / 8))
      .select("id", "sh", "bands")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2)))
      .sortBy(_._1)
    checkEmbeddable("q131_crawl_corpus",
      rows.iterator.map(_._2.size.toLong + 8).sum)
    val shVals = rows.map { case (id, sh, _) => s"($id, ${longs(sh)})" }.mkString(", ")
    val bandVals = rows.flatMap { case (id, _, bands) =>
      bands.zipWithIndex.map { case (bh, i) => s"($id, $i, $bh)" }
    }.mkString(", ")
    val keys = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        graft.operators.CorpusOrder.shuffleKey(42L, col("doc_id")).as("k"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    val kVals = keys.map { case (id, k) => s"($id, $k)" }.mkString(", ")
    val toksExpr = "string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')"
    val scores = graft.textops.TextAnalysis.stopwords.map { case (lang, words) =>
      val list = words.map(w => s"'$w'").mkString("[", ", ", "]")
      lang -> s"len(list_filter($toksExpr, t -> list_contains($list, t)))"
    }
    val maxS = scores.values.mkString("greatest(", ", ", ")")
    val caseChain = scores.map { case (lang, sc) =>
      s"WHEN $sc = m THEN '$lang'"
    }.mkString(" ")
    val en = graft.textops.TextAnalysis.stopwords("en")
      .map(w => s"'$w'").mkString("[", ", ", "]")
    val p1 = SparkEntry.evalProbe1
    val p2 = SparkEntry.evalProbe2
    val mojiRaw = SparkEntry.crawlMojiRaw
    val mojiFixed = SparkEntry.crawlMojiFixed
    val soup = SparkEntry.crawlSoup
    s"""WITH RECURSIVE
       |base AS (
       |  SELECT doc_id, coalesce(text, '') AS t FROM documents
       |  WHERE doc_id % 13 NOT IN (5, 9)),
       |pg AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 19 = 4 THEN '$soup'
       |         WHEN doc_id % 17 = 2 THEN '• ' || t
       |         WHEN doc_id % 11 = 3 AND NOT regexp_matches(t, '[^\\x00-\\x7F]')
       |           THEN '$mojiRaw' || t
       |         ELSE t END AS body
       |  FROM base),
       |f AS (
       |  SELECT doc_id,
       |    '<div class="nav"><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact menu links</a></div>'
       |    || '<h1>Title ' || CAST(doc_id AS VARCHAR) || '</h1>'
       |    || '<p>' || body || '</p>'
       |    || CASE WHEN doc_id % 3 = 0
       |         THEN '<div class="promo"><a href="/sub">subscribe to our newsletter today</a></div>'
       |         ELSE '' END
       |    || '<p>Short note.</p>'
       |    || '<footer><a href="/t">terms</a> <a href="/p">privacy</a> <a href="/c">copyright example corp</a></footer>'
       |    AS html
       |  FROM pg),
       |mk AS (
       |  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
       |    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
       |    '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
       |    '(?s)<!--.*?-->', ' ', 'g'),
       |    '(?i)</?(blockquote|thead|tbody|table|section|article|footer|header|aside|main|nav|pre|ul|ol|li|tr|td|th|div|h[1-6]|hr|br|p)([ \\t\\n\\r\\f][^>]*)?/?>',
       |    chr(1), 'g') AS marked
       |  FROM f),
       |rawb AS (
       |  SELECT doc_id, i AS ri, blocks[i + 1] AS rawt
       |  FROM (SELECT doc_id, string_split(marked, chr(1)) AS blocks FROM mk),
       |       unnest(range(len(blocks))) AS u(i)),
       |calcb AS (
       |  SELECT doc_id, ri,
       |    trim(regexp_replace(regexp_replace(rawt,
       |      '(?s)<[^>]*>', ' ', 'g'), '[ \\t\\n\\r]+', ' ', 'g')) AS text,
       |    CAST(COALESCE(list_aggregate(list_transform(
       |      regexp_extract_all(rawt, '(?is)<a[^>]*>(.*?)</a>', 1),
       |      y -> length(trim(regexp_replace(regexp_replace(y,
       |        '(?s)<[^>]*>', ' ', 'g'), '[ \\t\\n\\r]+', ' ', 'g')))),
       |      'sum'), 0) AS BIGINT) AS n_link_chars
       |  FROM rawb),
       |blk AS (
       |  SELECT doc_id, ri, text,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(CASE WHEN length(text) = 0 THEN 0
       |         ELSE len(string_split(text, ' ')) END AS BIGINT) AS n_words,
       |    n_link_chars
       |  FROM calcb WHERE length(text) > 0),
       |mc0 AS (
       |  SELECT doc_id, string_agg(text, ' ' ORDER BY ri) AS text
       |  FROM blk
       |  WHERE n_words >= 6 AND n_link_chars * 10000 <= 3300 * greatest(n_chars, 1)
       |  GROUP BY doc_id),
       |mc AS (
       |  SELECT f.doc_id, coalesce(mc0.text, '') AS text
       |  FROM f LEFT JOIN mc0 ON mc0.doc_id = f.doc_id),
       |moji AS (
       |  SELECT doc_id,
       |    CASE WHEN starts_with(text, '$mojiRaw')
       |      THEN '$mojiFixed' || substr(text, length('$mojiRaw') + 1)
       |      ELSE text END AS text
       |  FROM mc),
       |lang AS (
       |  SELECT doc_id, CASE WHEN m <= 0 THEN 'und' $caseChain ELSE 'und' END AS lang_pred
       |  FROM (SELECT doc_id, text, $maxS AS m FROM moji)),
       |qbase AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') END AS toks,
       |    CASE WHEN length(text) = 0 THEN 0.0
       |         ELSE CAST(len(regexp_extract_all(text, '[^\\w \\t\\n\\x0b\\f\\r]')) AS DOUBLE) / length(text)
       |         END AS praw
       |  FROM moji),
       |qsig AS (
       |  SELECT doc_id, len(toks) AS n_tokens,
       |    floor(praw * 10000.0 + 0.5) / 10000.0 AS pr,
       |    floor((CASE WHEN len(toks) = 0 THEN 0.0
       |           ELSE CAST(len(list_filter(toks, t -> list_contains($en, t))) AS DOUBLE)
       |                / len(toks) END) * 10000.0 + 0.5) / 10000.0 AS sr,
       |    floor((CASE WHEN len(toks) = 0 THEN 0.0
       |           ELSE 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
       |           END) * 10000.0 + 0.5) / 10000.0 AS rr
       |  FROM qbase),
       |qkeep AS (
       |  SELECT doc_id FROM qsig
       |  WHERE NOT (n_tokens < 10 OR n_tokens > 100000 OR pr > 0.3
       |             OR sr < 0.02 OR rr > 0.6)),
       |gop AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id,
       |      list_filter(string_split(text, chr(10)), l -> length(trim(l)) > 0) AS lines,
       |      CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |           ELSE string_split_regex(trim(text), '[ \\t\\n\\x0b\\f\\r]+') END AS toks,
       |      CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS n_hash
       |    FROM moji)
       |  WHERE CAST(len(list_filter(lines, l ->
       |          starts_with(trim(l), '- ') OR starts_with(trim(l), '•'))) AS BIGINT) * 10000
       |          <= 9000 * CAST(greatest(len(lines), 1) AS BIGINT)
       |    AND CAST(len(list_filter(lines, l -> ends_with(trim(l), '...'))) AS BIGINT) * 10000
       |          <= 3000 * CAST(greatest(len(lines), 1) AS BIGINT)
       |    AND n_hash * 10000 <= 1000 * CAST(greatest(len(toks), 1) AS BIGINT)),
       |ech AS (SELECT doc_id, unnest(regexp_extract_all(text, '(?s).')) AS c FROM moji),
       |ecnt AS (SELECT doc_id, c, count(*) AS n FROM ech GROUP BY 1, 2),
       |ea AS (
       |  SELECT doc_id, list(n ORDER BY c) AS ns,
       |    CAST(sum(n) AS BIGINT) AS n_chars
       |  FROM ecnt GROUP BY 1),
       |ent AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id,
       |      round(log2(CAST(n_chars AS DOUBLE)) -
       |        list_sum(list_transform(ns,
       |          n -> CAST(n AS DOUBLE) * log2(CAST(n AS DOUBLE)))) / n_chars,
       |        4) AS entropy
       |    FROM ea)
       |  WHERE entropy >= 2.5 AND entropy <= 5.2),
       |gated AS (
       |  SELECT m.doc_id, m.text, l.lang_pred
       |  FROM moji m
       |  JOIN lang l ON l.doc_id = m.doc_id AND l.lang_pred <> 'und'
       |  JOIN qkeep ON qkeep.doc_id = m.doc_id
       |  JOIN gop ON gop.doc_id = m.doc_id
       |  JOIN ent ON ent.doc_id = m.doc_id),
       |dd AS (
       |  SELECT doc_id, text, lang_pred FROM (
       |    SELECT doc_id, text, lang_pred,
       |      row_number() OVER (
       |        PARTITION BY 'https://h' || CAST(doc_id % 4 AS VARCHAR) ||
       |          '.example.com/p/' || CAST(doc_id % 400 AS VARCHAR)
       |        ORDER BY doc_id) AS rn
       |    FROM gated) WHERE rn = 1),
       |shv(id, sh) AS (VALUES $shVals),
       |shx AS (SELECT CAST(id AS BIGINT) AS id, CAST(sh AS BIGINT[]) AS sh FROM shv),
       |bandv(id, band_idx, band_hash) AS (VALUES $bandVals),
       |capped AS (
       |  SELECT id, band_idx, band_hash FROM (
       |    SELECT id, band_idx, band_hash,
       |           count(*) OVER (PARTITION BY band_idx, band_hash) AS n
       |    FROM bandv) WHERE n <= 100),
       |cand AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM capped a JOIN capped b
       |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.id < b.id),
       |pairs AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT id_a, id_b,
       |      round(CASE WHEN len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) = 0
       |            THEN 0.0
       |            ELSE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |               / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
       |            END, 4) AS jaccard
       |    FROM cand JOIN shx sa ON sa.id = cand.id_a JOIN shx sb ON sb.id = cand.id_b)
       |  WHERE jaccard >= 0.5),
       |sym AS (SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs),
       |reach(id, r) AS (
       |  SELECT doc_id, doc_id FROM dd
       |  UNION
       |  SELECT sy.id_b, reach.r FROM reach JOIN sym sy ON sy.id_a = reach.id),
       |comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id),
       |s5 AS (
       |  SELECT doc_id, text, lang_pred FROM (
       |    SELECT d.doc_id, d.text, d.lang_pred,
       |           row_number() OVER (PARTITION BY c.component
       |                              ORDER BY length(d.text) DESC, d.doc_id ASC) AS rk
       |    FROM dd d JOIN comp c USING (doc_id)) WHERE rk = 1),
       |evals AS (
       |  SELECT text FROM documents WHERE doc_id % 97 = 0
       |  UNION ALL SELECT '$p1' UNION ALL SELECT '$p2'),
       |et AS (
       |  SELECT list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0b\\f\\r]+'),
       |                     x -> x != '') AS toks
       |  FROM evals),
       |ewl AS (
       |  SELECT CASE WHEN len(toks) < 8 THEN []::VARCHAR[]
       |              ELSE list_transform(range(1, len(toks) - 6),
       |                     i -> array_to_string(toks[i:i+7], ' ')) END AS ws
       |  FROM et),
       |ew AS (SELECT DISTINCT unnest(ws) AS w FROM ewl),
       |t7 AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0b\\f\\r]+'),
       |                x -> x != '') AS toks
       |  FROM s5),
       |wl7 AS (
       |  SELECT doc_id, toks,
       |    CASE WHEN len(toks) < 8 THEN []::VARCHAR[]
       |         ELSE list_transform(range(1, len(toks) - 6),
       |                i -> array_to_string(toks[i:i+7], ' ')) END AS ws
       |  FROM t7),
       |wins7 AS (
       |  SELECT doc_id, unnest(ws) AS w FROM wl7),
       |flagged AS (SELECT DISTINCT wins7.doc_id FROM wins7 JOIN ew ON ew.w = wins7.w),
       |s7 AS (
       |  SELECT t7.doc_id, array_to_string(t7.toks, ' ') AS text, len(t7.toks) AS n_tokens
       |  FROM t7 WHERE t7.doc_id NOT IN (SELECT doc_id FROM flagged)),
       |c8 AS (
       |  SELECT doc_id, text, n_tokens,
       |         sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM s7),
       |bud AS (SELECT doc_id, text, n_tokens FROM c8 WHERE cum <= 12000),
       |kv(doc_id, k) AS (VALUES $kVals),
       |sh2 AS (
       |  SELECT b.doc_id, b.text, b.n_tokens, CAST(kv.k AS BIGINT) AS shuffle_key,
       |    sum(b.n_tokens) OVER (ORDER BY kv.k, b.doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum_tokens
       |  FROM bud b JOIN kv ON kv.doc_id = b.doc_id)
       |SELECT sh2.doc_id, g.lang_pred,
       |  CAST(sh2.n_tokens AS BIGINT) AS n_tokens, sh2.shuffle_key,
       |  CAST(sh2.cum_tokens AS BIGINT) AS cum_tokens,
       |  CAST(greatest(sh2.cum_tokens - 1, 0) // 2500 AS BIGINT) AS shard_id,
       |  md5(sh2.text) AS text_md5
       |FROM sh2 JOIN dd g ON g.doc_id = sh2.doc_id""".stripMargin
  }

  def shuffleShardOracle(s: SparkSession, dir: String): String =
    raw"""${shuffleShardCtes(s, dir, "q71_shuffle_shard")}
       |SELECT doc_id, n_tokens, shuffle_key,
       |  CAST(cum_tokens AS BIGINT) AS cum_tokens,
       |  CAST(greatest(cum_tokens - 1, 0) // 5000 AS BIGINT) AS shard_id
       |FROM c""".stripMargin

  /** Shared WITH-prefix for q71/q83: embed the engine's permutation
    * keys, then let DuckDB recompute token counts, the (key, id)
    * order, and the running total. Ends with CTE `c(doc_id, n_tokens,
    * shuffle_key, cum_tokens)`.
    */
  private def shuffleShardCtes(s: SparkSession, dir: String, name: String): String = {
    val keys = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        graft.operators.CorpusOrder.shuffleKey(42L, col("doc_id")).as("k"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    checkEmbeddable(name, keys.length.toLong)
    val kVals = keys.map { case (id, k) => s"($id, $k)" }.mkString(", ")
    // raw interpolator: the \t\n\x0b in the token regex must reach
    // DuckDB as literal backslash sequences (s"" would reject \x)
    raw"""WITH kv(doc_id, k) AS (VALUES $kVals),
       |t AS (
       |  SELECT d.doc_id, CAST(kv.k AS BIGINT) AS shuffle_key,
       |    CAST(CASE WHEN length(trim(d.text)) = 0 THEN 0
       |         ELSE len(string_split_regex(trim(d.text), '[ \t\n\x0b\f\r]+'))
       |         END AS BIGINT) AS n_tokens
       |  FROM documents d JOIN kv ON kv.doc_id = d.doc_id),
       |c AS (
       |  SELECT doc_id, n_tokens, shuffle_key,
       |         sum(n_tokens) OVER (ORDER BY shuffle_key, doc_id
       |           ROWS UNBOUNDED PRECEDING) AS cum_tokens
       |  FROM t)""".stripMargin
  }

  /** q83: everything q71 recomputes, PLUS the per-shard manifest
    * aggregation — counts, token sums, id range, and the bit_xor
    * content checksum over the same md5-60-bit `id:weight` hash the
    * engine uses ([[graft.operators.ShardManifest.contentHash]] —
    * md5, so DuckDB reproduces it from scratch).
    */
  def shardManifestOracle(s: SparkSession, dir: String): String =
    raw"""${shuffleShardCtes(s, dir, "q83_shard_manifest")},
       |sh AS (
       |  SELECT doc_id, n_tokens,
       |    CAST(greatest(cum_tokens - 1, 0) // 5000 AS BIGINT) AS shard_id
       |  FROM c)
       |SELECT shard_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(min(doc_id) AS BIGINT) AS min_id,
       |  CAST(max(doc_id) AS BIGINT) AS max_id,
       |  CAST(bit_xor(CAST(('0x' || substr(md5(
       |    CAST(doc_id AS VARCHAR) || ':' || CAST(n_tokens AS VARCHAR)
       |  ), 1, 15)) AS BIGINT)) AS BIGINT) AS content_check
       |FROM sh GROUP BY shard_id""".stripMargin

  /** The shared Hamming-near-dup oracle body: embed (id, fingerprint)
    * VALUES, recompute the pigeonhole chunk keys (shared
    * [[NearDup.simhashChunkParams]]), the bucket cap, the candidate
    * join, and the exact Hamming verify in DuckDB.
    */
  private def hamming64PairsSql(
      rows: Array[(Long, Long)], maxHamming: Int, cap: Long): String = {
    val fVals = rows.map { case (id, fp) => s"($id, $fp)" }.mkString(", ")
    val pVals = NearDup.simhashChunkParams(maxHamming)
      .map { case (i, off, mask) => s"($i, $off, $mask)" }.mkString(", ")
    s"""WITH fv(id, sh) AS (VALUES $fVals),
       |f AS (SELECT CAST(id AS BIGINT) AS id, CAST(sh AS BIGINT) AS sh FROM fv),
       |params(chunk_idx, off, mask) AS (VALUES $pVals),
       |chunks AS (
       |  SELECT id, sh, chunk_idx, (sh >> off) & CAST(mask AS BIGINT) AS chunk
       |  FROM f CROSS JOIN params),
       |capped AS (
       |  SELECT id, sh, chunk_idx, chunk FROM (
       |    SELECT *, count(*) OVER (PARTITION BY chunk_idx, chunk) AS n
       |    FROM chunks) WHERE n <= $cap)
       |SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       |  CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
       |FROM capped a JOIN capped b
       |  ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk AND a.id < b.id
       |WHERE bit_count(xor(a.sh, b.sh)) <= $maxHamming""".stripMargin
  }

  /** q31: engine emits each doc's distinct winnow fingerprints; DuckDB
    * recomputes the fp bucket cap, the post-cap per-doc denominator,
    * the shared-fingerprint counts, and the containment threshold.
    */
  def winnowOracle(s: SparkSession, dir: String): String = {
    val rows = SparkEntry.plantedDocs(s, dir)
      .select(col("doc_id").as("id"),
        array_distinct(Winnowing.winnow_fingerprints(col("text"), 5, 4)).as("fps"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
      .sortBy(_._1)
    checkEmbeddable("q31_winnow_pairs", rows.iterator.map(_._2.size.toLong).sum)
    containmentPairsSql(rows, cap = 200, ratio = "0.5")
  }

  /** q68: [[winnowOracle]]'s construction over per-video sampled-frame
    * dHash sets (the real MJPEG decode) — DuckDB recomputes the
    * fingerprint bucket cap, post-cap denominators, shared counts, and
    * the containment threshold.
    */
  def videoNearDupOracle(s: SparkSession, dir: String): String = {
    val rows = SparkEntry.videoFrameHashFrame(s, dir)
      .groupBy(col("id")).agg(sort_array(collect_list(col("fp"))).as("fps"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
      .sortBy(_._1)
    checkEmbeddable("q68_video_neardup", rows.iterator.map(_._2.size.toLong).sum)
    containmentPairsSql(rows, cap = 200, ratio = "0.6")
  }

  /** The shared containment-pairs oracle body (winnow q31, video q68):
    * embed per-id DISTINCT fingerprint arrays, recompute everything
    * downstream in DuckDB.
    */
  private def containmentPairsSql(
      rows: Array[(Long, Seq[Long])], cap: Long, ratio: String): String = {
    val fVals = rows.map { case (id, fps) => s"($id, ${longs(fps)})" }.mkString(", ")
    s"""WITH fv(id, fps) AS (VALUES $fVals),
       |f AS (SELECT CAST(id AS BIGINT) AS id,
       |             CAST(unnest(fps) AS BIGINT) AS fp FROM fv),
       |capped AS (
       |  SELECT id, fp FROM (
       |    SELECT id, fp, count(*) OVER (PARTITION BY fp) AS n FROM f)
       |  WHERE n <= $cap),
       |wn AS (SELECT id, fp, count(*) OVER (PARTITION BY id) AS nfp FROM capped),
       |g AS (
       |  SELECT a.id AS id_a, a.nfp AS nfp_a, b.id AS id_b, b.nfp AS nfp_b,
       |         count(*) AS shared_fingerprints
       |  FROM wn a JOIN wn b ON a.fp = b.fp AND a.id < b.id
       |  GROUP BY a.id, a.nfp, b.id, b.nfp),
       |h AS (
       |  SELECT id_a, id_b, shared_fingerprints,
       |         round(shared_fingerprints / least(nfp_a, nfp_b), 4) AS containment
       |  FROM g)
       |SELECT id_a, id_b, shared_fingerprints, containment
       |FROM h WHERE containment >= $ratio""".stripMargin
  }

  /** Shared DuckDB scaffolding for the three ANN oracles: normalized
    * corpus + the vec_id < 20 query set, exact cosine via
    * list_dot_product (the q27 formulation, already hash-verified to
    * match [[graft.vector.DotProductExpr]]'s index-order accumulation),
    * and the (cosine DESC, neighbor ASC) top-k ranking.
    */
  private def annRank(candCte: String, k: Int): String =
    s"""c AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n
       |  FROM embeddings),
       |q AS (SELECT * FROM c WHERE vec_id < 20),
       |$candCte,
       |scored AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |         list_dot_product(cv.v, qv.v) / (cv.n * qv.n) AS cos_raw
       |  FROM cand JOIN c cv ON cv.vec_id = cand.neighbor_id
       |            JOIN q qv ON qv.vec_id = cand.query_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |            ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, round(cos_raw, 4) AS cosine, rank
       |FROM ranked WHERE rank <= $k""".stripMargin

  /** q28: engine emits each vector's 8 per-table hyperplane bucket
    * signatures; DuckDB recomputes the (table, signature) candidate
    * equi-join, the pair dedup, and the exact-cosine top-k.
    */
  def annLshOracle(s: SparkSession, dir: String): String = {
    val (nPlanes, tables, dim, k) = (4, 8, 64, 5)
    val planes = Ann.hyperplanes(nPlanes * tables, dim)
    val rows = s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        Ann.tableSignatures(col("embedding"), planes, nPlanes, tables).as("sigs"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
      .sortBy(_._1)
    checkEmbeddable("q28_ann_lsh", rows.length.toLong * 8)
    val sVals = rows.flatMap { case (id, sigs) =>
      sigs.zipWithIndex.map { case (sig, t) => s"($id, $t, $sig)" }
    }.mkString(", ")
    val cand =
      s"""sv(vec_id, t, sig) AS (VALUES $sVals),
         |qs AS (SELECT * FROM sv WHERE vec_id < 20),
         |cand AS (
         |  SELECT DISTINCT qs.vec_id AS query_id, sv.vec_id AS neighbor_id
         |  FROM qs JOIN sv ON sv.t = qs.t AND sv.sig = qs.sig
         |  WHERE sv.vec_id != qs.vec_id)""".stripMargin
    "WITH " + annRank(cand, k)
  }

  /** q32: engine emits each corpus vector's IVF cell and each query's
    * nprobe probed cells (from the shared seeded quantizer); DuckDB
    * recomputes the cell equi-join and the exact-cosine top-k.
    */
  def annIvfOracle(s: SparkSession, dir: String): String = {
    val (nlist, nprobe, k) = (16, 6, 5)
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val centroids = Ivf.fitCentroids(emb, "embedding", nlist,
      cacheKey = Some("oracle:" + dir + "#embeddings"))
    val cells = emb.select(col("vec_id"),
      Ivf.nearest_cells(col("embedding"), centroids, 1).getItem(0).as("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    val probes = emb.filter(col("vec_id") < 20)
      .select(col("vec_id"),
        explode(Ivf.nearest_cells(col("embedding"), centroids, nprobe)).as("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(identity)
    // guard BOTH frames separately: nonempty cells with an empty probe
    // set would still emit the `VALUES ()` syntax error
    checkEmbeddable("q32_ann_ivf cells", cells.length.toLong)
    checkEmbeddable("q32_ann_ivf probes", probes.length.toLong)
    val cVals = cells.map { case (id, c) => s"($id, $c)" }.mkString(", ")
    val pVals = probes.map { case (id, c) => s"($id, $c)" }.mkString(", ")
    val cand =
      s"""cellv(vec_id, cell) AS (VALUES $cVals),
         |probev(query_id, cell) AS (VALUES $pVals),
         |cand AS (
         |  SELECT p.query_id, cv.vec_id AS neighbor_id
         |  FROM probev p JOIN cellv cv ON cv.cell = p.cell
         |  WHERE cv.vec_id != p.query_id)""".stripMargin
    "WITH " + annRank(cand, k)
  }

  /** q133/q134: the graph-ANN walk replayed in SQL. Engine-supplied
    * structure keys (the q32 discipline, one level up): the symmetric
    * per-cell kNN edge list and each query's entry pool — both pure
    * functions of the deterministic quantizer + build. DuckDB then
    * recomputes EVERY cosine from the raw embeddings and replays the
    * pool/beam recurrence itself (hops unrolled as CTE rounds, same
    * (cos DESC, node ASC) tie-breaks), so a walk divergence, a wrong
    * edge, or a dropped candidate all break the hash.
    */
  private def graphCtes(s: SparkSession, dir: String, name: String,
      nlist: Int, nprobe: Int, m: Int, replicas: Int, hops: Int,
      beam: Int, nQueries: Int): String = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val corpus = SparkEntry.jitterTwinEmbeddings(emb)
    val centroids = Ivf.fitCentroids(corpus, "embedding", nlist,
      cacheKey = Some("oracle:" + dir + "#embeddings-jitter"))
    val (edges, entries) = graft.vector.GraphAnn.buildCached(
      corpus, "vec_id", "embedding", centroids, m, replicas,
      Some(("oracle:" + dir + "#embeddings-jitter", nlist)))
    val eRows = edges.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val pool0 = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id"),
        explode(Ivf.nearest_cells(col("embedding"), centroids, nprobe)).as("cell"))
      .join(entries, Seq("cell"))
      .select(col("vec_id"), col("entry_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    checkEmbeddable(s"$name edges", eRows.length.toLong)
    checkEmbeddable(s"$name pool0", pool0.length.toLong)
    val eVals = eRows.map { case (a, b) => s"($a, $b)" }.mkString(", ")
    val pVals = pool0.map { case (q, n) => s"($q, $n)" }.mkString(", ")
    val jc = SparkEntry.jitterC
    val hopCtes = (0 until hops).map { i =>
      s"""s$i AS (
         |  SELECT p.qid, p.node, list_dot_product(c.v, q.qv) / (c.n * q.qn) AS cos
         |  FROM p$i p JOIN cn c ON c.vec_id = p.node JOIN qv q ON q.qid = p.qid),
         |b$i AS (
         |  SELECT qid, node FROM (
         |    SELECT qid, node, row_number() OVER (PARTITION BY qid
         |      ORDER BY cos DESC, node ASC) AS rk FROM s$i) WHERE rk <= $beam),
         |p${i + 1} AS (
         |  SELECT qid, node FROM p$i
         |  UNION
         |  SELECT b.qid, e.dst FROM b$i b JOIN e ON e.src = b.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH cor AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 100000,
       |    list_transform(
       |      list_zip(embedding::DOUBLE[], list_reverse(embedding::DOUBLE[])),
       |      p -> p[1] + $jc * p[2])
       |  FROM embeddings),
       |cn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM cor),
       |qv AS (SELECT vec_id AS qid, v AS qv, n AS qn FROM cn WHERE vec_id < $nQueries),
       |e(src, dst) AS (VALUES $eVals),
       |p0(qid, node) AS (VALUES $pVals),
       |$hopCtes,
       |sfin AS (
       |  SELECT p.qid, p.node, list_dot_product(c.v, q.qv) / (c.n * q.qn) AS cos
       |  FROM p$hops p JOIN cn c ON c.vec_id = p.node JOIN qv q ON q.qid = p.qid
       |  WHERE p.node != p.qid),
       |gr AS (
       |  SELECT qid, node, cos, row_number() OVER (PARTITION BY qid
       |    ORDER BY cos DESC, node ASC) AS rank
       |  FROM sfin)""".stripMargin
  }

  def graphAnnOracle(s: SparkSession, dir: String): String =
    s"""${graphCtes(s, dir, "q133_ann_graph",
         nlist = SparkEntry.graphNlist(
           SparkEntry.jitterTwinEmbeddings(
             s.read.parquet(s"$dir/embeddings.parquet"))),
         nprobe = 1, m = 6, replicas = 2, hops = 5, beam = 12,
         nQueries = 100)}
       |SELECT qid AS query_id, node AS neighbor_id,
       |  round(cos, 4) AS cosine, rank
       |FROM gr WHERE rank <= 5""".stripMargin

  /** q158: the hierarchical-entry walk replayed in SQL. On top of the
    * q133 discipline (edges + every cosine recomputed from raw
    * vectors), the engine additionally supplies the coarse layer's
    * STRUCTURE keys — cell-graph edges, per-cell medoid ids, the
    * fixed seed cell — and DuckDB replays the cell walk (unrolled
    * rounds, medoid vectors re-read from the raw corpus by entry id,
    * (cos DESC, cell ASC) tie-breaks), derives pool_0 from the walked
    * entry cells itself, then replays the base walk. A wrong cell
    * edge, a mis-scored medoid, or a drifted entry-probe all break
    * the hash.
    */
  def graphHierOracle(s: SparkSession, dir: String): String = {
    val (m, replicas) = (6, 2)
    val (entryProbe, cellHops, cellBeam, hops, beam, cellM, nQueries) =
      (4, 4, 4, 5, 12, 4, 100)
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val corpus = SparkEntry.jitterTwinEmbeddings(emb)
    val nlist = SparkEntry.graphNlist(corpus)
    val centroids = Ivf.fitCentroids(corpus, "embedding", nlist,
      cacheKey = Some("oracle:" + dir + "#embeddings-jitter"))
    val (edges, entries) = graft.vector.GraphAnn.buildCached(
      corpus, "vec_id", "embedding", centroids, m, replicas,
      Some(("oracle:" + dir + "#embeddings-jitter", nlist)))
    val cellEdges = graft.vector.GraphAnn.buildCellGraph(centroids, cellM)
    val eRows = edges.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val medRows = entries.collect().map(r => (r.getInt(0), r.getLong(1))).sorted
    val seed = medRows.map(_._1).min
    checkEmbeddable("q158 edges", eRows.length.toLong)
    checkEmbeddable("q158 cellEdges", cellEdges.length.toLong)
    checkEmbeddable("q158 medoids", medRows.length.toLong)
    val eVals = eRows.map { case (a, b) => s"($a, $b)" }.mkString(", ")
    val ceVals = cellEdges.map { case (a, b) => s"($a, $b)" }.mkString(", ")
    val medVals = medRows.map { case (c, id) => s"($c, $id)" }.mkString(", ")
    val jc = SparkEntry.jitterC
    val cellCtes = (0 until cellHops).map { i =>
      s"""ccs$i AS (
         |  SELECT p.qid, p.cell,
         |    list_dot_product(c.v, q.qv) / (c.n * q.qn) AS cos
         |  FROM cp$i p JOIN med m ON m.cell = p.cell
         |  JOIN cn c ON c.vec_id = m.entry_id JOIN qv q ON q.qid = p.qid),
         |ccb$i AS (
         |  SELECT qid, cell FROM (
         |    SELECT qid, cell, row_number() OVER (PARTITION BY qid
         |      ORDER BY cos DESC, cell ASC) AS rk FROM ccs$i) WHERE rk <= $cellBeam),
         |cp${i + 1} AS (
         |  SELECT qid, cell FROM cp$i
         |  UNION
         |  SELECT b.qid, ce.cdst FROM ccb$i b JOIN ce ON ce.csrc = b.cell)""".stripMargin
    }.mkString(",\n")
    val hopCtes = (0 until hops).map { i =>
      s"""s$i AS (
         |  SELECT p.qid, p.node, list_dot_product(c.v, q.qv) / (c.n * q.qn) AS cos
         |  FROM p$i p JOIN cn c ON c.vec_id = p.node JOIN qv q ON q.qid = p.qid),
         |b$i AS (
         |  SELECT qid, node FROM (
         |    SELECT qid, node, row_number() OVER (PARTITION BY qid
         |      ORDER BY cos DESC, node ASC) AS rk FROM s$i) WHERE rk <= $beam),
         |p${i + 1} AS (
         |  SELECT qid, node FROM p$i
         |  UNION
         |  SELECT b.qid, e.dst FROM b$i b JOIN e ON e.src = b.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH cor AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 100000,
       |    list_transform(
       |      list_zip(embedding::DOUBLE[], list_reverse(embedding::DOUBLE[])),
       |      p -> p[1] + $jc * p[2])
       |  FROM embeddings),
       |cn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM cor),
       |qv AS (SELECT vec_id AS qid, v AS qv, n AS qn FROM cn WHERE vec_id < $nQueries),
       |e(src, dst) AS (VALUES $eVals),
       |ce(csrc, cdst) AS (VALUES $ceVals),
       |med(cell, entry_id) AS (VALUES $medVals),
       |cp0(qid, cell) AS (SELECT qid, $seed FROM qv),
       |$cellCtes,
       |ecs AS (
       |  SELECT p.qid, p.cell,
       |    list_dot_product(c.v, q.qv) / (c.n * q.qn) AS cos
       |  FROM cp$cellHops p JOIN med m ON m.cell = p.cell
       |  JOIN cn c ON c.vec_id = m.entry_id JOIN qv q ON q.qid = p.qid),
       |ec AS (
       |  SELECT qid, cell FROM (
       |    SELECT qid, cell, row_number() OVER (PARTITION BY qid
       |      ORDER BY cos DESC, cell ASC) AS rk FROM ecs) WHERE rk <= $entryProbe),
       |p0(qid, node) AS (
       |  SELECT DISTINCT ec.qid, m.entry_id
       |  FROM ec JOIN med m ON m.cell = ec.cell),
       |$hopCtes,
       |sfin AS (
       |  SELECT p.qid, p.node, list_dot_product(c.v, q.qv) / (c.n * q.qn) AS cos
       |  FROM p$hops p JOIN cn c ON c.vec_id = p.node JOIN qv q ON q.qid = p.qid
       |  WHERE p.node != p.qid),
       |gr AS (
       |  SELECT qid, node, cos, row_number() OVER (PARTITION BY qid
       |    ORDER BY cos DESC, node ASC) AS rank
       |  FROM sfin)
       |SELECT qid AS query_id, node AS neighbor_id,
       |  round(cos, 4) AS cosine, rank
       |FROM gr WHERE rank <= 5""".stripMargin
  }

  def graphRecallOracle(s: SparkSession, dir: String): String = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val corpus = SparkEntry.jitterTwinEmbeddings(emb)
    val (nlist, nprobe, nQueries) = (SparkEntry.graphNlist(corpus), 1, 100)
    val centroids = Ivf.fitCentroids(corpus, "embedding", nlist,
      cacheKey = Some("oracle:" + dir + "#embeddings-jitter"))
    val cells = corpus.select(col("vec_id"),
      Ivf.nearest_cells(col("embedding"), centroids, 1).getItem(0).as("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    val probes = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id"),
        explode(Ivf.nearest_cells(col("embedding"), centroids, nprobe)).as("cell"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(identity)
    checkEmbeddable("q134 cells", cells.length.toLong)
    checkEmbeddable("q134 probes", probes.length.toLong)
    val cVals = cells.map { case (id, c) => s"($id, $c)" }.mkString(", ")
    val pVals = probes.map { case (id, c) => s"($id, $c)" }.mkString(", ")
    s"""${graphCtes(s, dir, "q134_graph_twin_recall",
         nlist = nlist, nprobe = nprobe, m = 6, replicas = 2, hops = 5,
         beam = 12, nQueries = nQueries)},
       |cellv(vec_id, cell) AS (VALUES $cVals),
       |probev(query_id, cell) AS (VALUES $pVals),
       |iscored AS (
       |  SELECT p.query_id AS qid, cv.vec_id AS node,
       |         list_dot_product(c.v, q.qv) / (c.n * q.qn) AS cos
       |  FROM probev p JOIN cellv cv ON cv.cell = p.cell
       |  JOIN cn c ON c.vec_id = cv.vec_id
       |  JOIN qv q ON q.qid = p.query_id
       |  WHERE cv.vec_id != p.query_id),
       |ir AS (
       |  SELECT qid, node, row_number() OVER (PARTITION BY qid
       |    ORDER BY cos DESC, node ASC) AS rank
       |  FROM iscored)
       |SELECT 'ann_graph' AS family,
       |  count(*) AS n_truth,
       |  count(*) FILTER (WHERE node = qid + 100000) AS n_found,
       |  CAST(floor(10000 * (count(*) FILTER (WHERE node = qid + 100000))
       |       / count(*)) AS BIGINT) AS recall_x10000
       |FROM gr WHERE rank = 1
       |UNION ALL
       |SELECT 'ann_ivf_nprobe1',
       |  count(*),
       |  count(*) FILTER (WHERE node = qid + 100000),
       |  CAST(floor(10000 * (count(*) FILTER (WHERE node = qid + 100000))
       |       / count(*)) AS BIGINT)
       |FROM ir WHERE rank = 1""".stripMargin
  }

  /** q135: the q73 independent-scorer discipline for the softmax
    * model — own FNV-1a constants, own normalization/tokenization,
    * own max-shifted softmax in class order, sharing ONLY the trained
    * weight table; the fixture replays from [[SparkEntry.langText]]
    * (a pure doc_id function) and every expected (label, pred, score)
    * row embeds as VALUES joined against documents for coverage.
    */
  def langClassifierOracle(s: SparkSession, dir: String): String = {
    val model = SparkEntry.langModelFor(s, dir)
    def fnv(sIn: String): Long = {
      var h = -3750763034362895579L // 0xcbf29ce484222325
      for (b <- sIn.getBytes(java.nio.charset.StandardCharsets.UTF_8)) {
        h = (h ^ (b & 0xffL)) * 1099511628211L // 0x100000001b3
      }
      h
    }
    def idx(f: String): Int = {
      val m = fnv(f) % model.dim
      (if (m < 0) m + model.dim else m).toInt
    }
    def scoreOf(text: String): (String, Double) = {
      val t = text.toLowerCase(java.util.Locale.ROOT)
        .replaceAll("[ \t\n\\x0B\f\r]+", " ").trim
      val nC = model.classes.length
      val dot = new Array[Double](nC)
      var n = 0
      def add(f: String): Unit = {
        val i = idx(f)
        var c = 0
        while (c < nC) { dot(c) += model.w(c)(i); c += 1 }
        n += 1
      }
      for (i <- 0 to t.length - 2) add(t.substring(i, i + 2))
      for (i <- 0 to t.length - 3) add(t.substring(i, i + 3))
      val z = (0 until nC).map(c =>
        model.bias(c) + (if (n == 0) 0.0 else dot(c) / n)).toArray
      var best = 0
      for (c <- 1 until nC) if (z(c) > z(best)) best = c
      val zmax = z.max
      var sum = 0.0
      for (c <- 0 until nC) sum += math.exp(z(c) - zmax)
      (model.classes(best), math.exp(z(best) - zmax) / sum)
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    val ids = s.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    checkEmbeddable("q135_lang_classifier", ids.length.toLong)
    val rows = ids.map { id =>
      val (label, text) = SparkEntry.langText(id)
      val (pred, p) = scoreOf(text)
      s"($id, '$label', '$pred', ${r4(p)}, ${label == pred})"
    }.mkString(", ")
    s"""WITH expv(doc_id, label, pred, score, correct) AS (VALUES $rows)
       |SELECT d.doc_id, e.label, e.pred,
       |  CAST(e.score AS DOUBLE) AS score, e.correct
       |FROM documents d JOIN expv e ON e.doc_id = d.doc_id""".stripMargin
  }

  /** q55: a driver-side reference BPE implementation — intentionally
    * naive collections code sharing only the merges CONSTANT with
    * [[graft.textops.Bpe]], not its algorithmic machinery — recomputes
    * every document's token count; DuckDB joins the embedded expected
    * counts against the documents table (verifying doc coverage both
    * ways via the inner join + the driver's row-count check).
    */
  def bpeOracle(s: SparkSession, dir: String): String = {
    // first-wins on duplicate pairs, matching Bpe.Table's rank map
    // (zipWithIndex.toMap would keep the LAST duplicate's rank and
    // silently diverge engine vs oracle on a duplicated merges table)
    val rank: Map[(String, String), Int] =
      graft.textops.Bpe.defaultMerges.zipWithIndex
        .foldLeft(Map.empty[(String, String), Int]) { case (m, (p, r)) =>
          if (m.contains(p)) m else m.updated(p, r)
        }
    val rows = s.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), refBpeCount(r.getString(1), rank)))
      .sortBy(_._1)
    checkEmbeddable("q55_bpe_tokens", rows.length.toLong)
    val vals = rows.map { case (id, n) => s"($id, $n)" }.mkString(", ")
    s"""WITH expv(doc_id, n_bpe) AS (VALUES $vals)
       |SELECT d.doc_id, CAST(e.n_bpe AS INT) AS n_bpe_tokens
       |FROM documents d JOIN expv e ON e.doc_id = d.doc_id""".stripMargin
  }

  /** q168: per-doc counts from the SAME independent reference BPE
    * scorer as q55 embed as VALUES; DuckDB recomputes the whitespace
    * token twin (q56's formula), joins on doc_id for the lang key,
    * and aggregates the fertility ratio itself — so a drift in the
    * engine's apply path, the per-lang aggregation, or the integral
    * division all hash-mismatch.
    */
  def bpeFertilityOracle(s: SparkSession, dir: String): String = {
    val rank: Map[(String, String), Int] =
      graft.textops.Bpe.defaultMerges.zipWithIndex
        .foldLeft(Map.empty[(String, String), Int]) { case (m, (p, r)) =>
          if (m.contains(p)) m else m.updated(p, r)
        }
    val rows = s.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), refBpeCount(
        Option(r.getString(1)).getOrElse(""), rank)))
      .sortBy(_._1)
    checkEmbeddable("q168_tokenizer_fertility", rows.length.toLong)
    val vals = rows.map { case (id, n) => s"($id, $n)" }.mkString(", ")
    raw"""WITH expv(doc_id, n_bpe) AS (VALUES $vals),
       |ws AS (
       |  SELECT doc_id, lang,
       |    CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
       |         ELSE len(string_split_regex(trim(coalesce(text, '')),
       |                '[ \t\n\x0b\f\r]+')) END AS n_ws
       |  FROM documents)
       |SELECT w.lang, count(*) AS n_docs,
       |  CAST(sum(e.n_bpe) AS BIGINT) AS n_bpe_tokens,
       |  CAST(sum(w.n_ws) AS BIGINT) AS n_ws_tokens,
       |  CAST(sum(e.n_bpe) * 10000 // greatest(sum(w.n_ws), 1) AS BIGINT)
       |    AS fertility_x10000
       |FROM ws w JOIN expv e ON e.doc_id = w.doc_id
       |GROUP BY w.lang""".stripMargin
  }

  /** q64: a driver-side reference LM scorer — naive string-keyed maps
    * over the model's count arrays, sharing only the TRAINED COUNT
    * TABLE with [[graft.textops.NgramLm.score]] (same arithmetic
    * formula evaluated in the same order, so the raw doubles are
    * bit-identical before the shared HALF_UP rounding). DuckDB joins
    * the embedded expected rows against the documents table.
    */
  def lmPerplexityOracle(s: SparkSession, dir: String): String = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val model = graft.textops.NgramLm.train(
      docs.filter(col("doc_id") % 10 < 3), "text")
    // naive views of the count table: plain Scala maps keyed by the
    // model's ids, no binary search, no packed-long lookups — the
    // independent scoring path. Ids (not token STRINGS) key the maps
    // because a corpus can legitimately contain the literal tokens
    // "<s>"/"<unk>", which string sentinels would collide with.
    val vocabIdx: Map[String, Int] = model.vocab.zipWithIndex.toMap
    val uni: Map[Int, Long] = model.unigram.zipWithIndex.map(_.swap).toMap
    val bi: Map[(Int, Int), Long] =
      model.bigramKeys.zip(model.bigramVals).map { case (k, v) =>
        (((k >>> 32).toInt, (k & 0xFFFFFFFFL).toInt), v)
      }.toMap
    val ctx: Map[Int, Long] =
      model.contextCounts.zipWithIndex.map { case (c, id) => (id, c) }.toMap
    def score(text: String): (Long, Double, Double) = {
      val toks = text.toLowerCase(java.util.Locale.ROOT)
        .split("[ \t\n\\x0B\f\r]+").filter(_.nonEmpty)
      var h = model.startId
      var nll = 0.0
      toks.foreach { tok =>
        val w = vocabIdx.getOrElse(tok, model.unkId)
        val cw = if (w == model.unkId) model.unkCount else uni(w)
        val pu = (cw + 1.0) / (model.total + model.vocab.length + 1.0)
        val p = (bi.getOrElse((h, w), 0L) + model.alpha * pu) /
          (ctx.getOrElse(h, 0L) + model.alpha)
        nll -= math.log(p)
        h = w
      }
      val n = toks.length.toLong
      val avg = if (n == 0L) 0.0 else nll / n
      val ppl = if (n == 0L) 1.0 else math.exp(avg)
      (n, avg, ppl)
    }
    // Spark's round(): BigDecimal HALF_UP at scale 4
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = docs.select("doc_id", "text").collect()
      .map { r =>
        val (n, avg, ppl) = score(r.getString(1))
        (r.getLong(0), n, r4(avg), r4(ppl))
      }.sortBy(_._1)
    checkEmbeddable("q64_lm_perplexity", rows.length.toLong)
    val vals = rows.map { case (id, n, avg, ppl) => s"($id, $n, $avg, $ppl)" }
      .mkString(", ")
    s"""WITH expv(doc_id, n_tokens, avg_nll, ppl) AS (VALUES $vals)
       |SELECT d.doc_id, CAST(e.n_tokens AS BIGINT) AS n_tokens,
       |  CAST(e.avg_nll AS DOUBLE) AS avg_nll, CAST(e.ppl AS DOUBLE) AS ppl
       |FROM documents d JOIN expv e ON e.doc_id = d.doc_id""".stripMargin
  }

  /** q97: the q64 technique for the trigram stupid-backoff LM — a
    * driver-side reference scorer over plain tuple-keyed maps unpacked
    * from the trained arrays (no binary search, no packed-long
    * lookups), replaying the backoff chain in the same evaluation
    * order so the raw doubles are bit-identical before rounding.
    */
  def backoffLmOracle(s: SparkSession, dir: String): String = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val m = graft.textops.NgramLm.trainTrigram(
      docs.filter(col("doc_id") % 10 < 3), "text")
    val score = triScorer(m)
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = docs.select("doc_id", "text").collect()
      .map { r =>
        val (n, avg, ppl) = score(r.getString(1))
        (r.getLong(0), n, r4(avg), r4(ppl))
      }.sortBy(_._1)
    checkEmbeddable("q97_backoff_lm", rows.length.toLong)
    val vals = rows.map { case (id, n, avg, ppl) => s"($id, $n, $avg, $ppl)" }
      .mkString(", ")
    s"""WITH expv(doc_id, n_tokens, avg_nll, ppl) AS (VALUES $vals)
       |SELECT d.doc_id, CAST(e.n_tokens AS BIGINT) AS n_tokens,
       |  CAST(e.avg_nll AS DOUBLE) AS avg_nll, CAST(e.ppl AS DOUBLE) AS ppl
       |FROM documents d JOIN expv e ON e.doc_id = d.doc_id""".stripMargin
  }

  /** The independent stupid-backoff scorer over an engine-trained
    * [[graft.textops.NgramLm.TrigramModel]] — map-based lookups
    * replaying the backoff chain in the engine's evaluation order
    * (shared by the q97 and q120 oracles; the model parameters are the
    * engine-supplied keys, the scoring is recomputed from them).
    */
  private def triScorer(
      m: graft.textops.NgramLm.TrigramModel): String => (Long, Double, Double) = {
    val vocabIdx: Map[String, Int] = m.vocab.zipWithIndex.toMap
    val uni: Map[Int, Long] = m.unigram.zipWithIndex.map(_.swap).toMap
    val bi: Map[(Int, Int), Long] =
      m.bigramKeys.zip(m.bigramVals).map { case (k, v) =>
        (((k >>> 32).toInt, (k & 0xFFFFFFFFL).toInt), v)
      }.toMap
    val ctx1: Map[Int, Long] =
      m.contextCounts.zipWithIndex.map { case (c, id) => (id, c) }.toMap
    val tri: Map[(Int, Int, Int), Long] =
      m.trigramKeys.zip(m.trigramVals).map { case (k, v) =>
        (((k >>> 42).toInt, ((k >>> 21) & 0x1FFFFFL).toInt,
          (k & 0x1FFFFFL).toInt), v)
      }.toMap
    val ctx2: Map[(Int, Int), Long] =
      m.ctx2Keys.zip(m.ctx2Vals).map { case (k, v) =>
        (((k >>> 21).toInt, (k & 0x1FFFFFL).toInt), v)
      }.toMap
    def score(text: String): (Long, Double, Double) = {
      val toks = text.toLowerCase(java.util.Locale.ROOT)
        .split("[ \t\n\\x0B\f\r]+").filter(_.nonEmpty)
      var u = m.startId
      var v = m.startId
      var nll = 0.0
      toks.foreach { tok =>
        val w = vocabIdx.getOrElse(tok, m.unkId)
        val t3 = tri.getOrElse((u, v, w), 0L)
        val sc =
          if (t3 > 0L) t3.toDouble / ctx2((u, v))
          else {
            val t2 = bi.getOrElse((v, w), 0L)
            val s2 =
              if (t2 > 0L) t2.toDouble / ctx1(v)
              else {
                val cw = if (w == m.unkId) m.unkCount else uni(w)
                m.backoff * ((cw + 1.0) / (m.total + m.vocab.length + 1.0))
              }
            m.backoff * s2
          }
        nll -= math.log(sc)
        u = v
        v = w
      }
      val n = toks.length.toLong
      val avg = if (n == 0L) 0.0 else nll / n
      val ppl = if (n == 0L) 1.0 else math.exp(avg)
      (n, avg, ppl)
    }
    score
  }

  /** q120: the reference-domain composition oracle — distinct pseudo-
    * log URIs recompute IN SQL (the [[graft.PseudoLog.sqlLogs]] CTE);
    * the char-LM perplexities embed from [[triScorer]] over the
    * engine-trained model (the q97 technique); ranking and the top-25
    * cut replay in SQL over the embedded rounded values.
    */
  def uriAnomalyOracle(s: SparkSession, dir: String): String = {
    val lg = graft.PseudoLog.logs(s, dir)
      .select(col("event_id"), col("request_uri"))
    val charified = lg.select(col("event_id"),
      concat_ws(" ", split(col("request_uri"), "")).as("ctext"))
    val m = graft.textops.NgramLm.trainTrigram(charified, "ctext",
      vocabSize = 256)
    val score = triScorer(m)
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    val uris = lg.select(col("request_uri")).distinct()
      .collect().map(_.getString(0)).sorted
    checkEmbeddable("q120_uri_anomaly", uris.length.toLong)
    val vals = uris.map { u =>
      val (n, _, ppl) = score(u.toCharArray.map(_.toString).mkString(" "))
      s"('${u.replace("'", "''")}', $n, ${r4(ppl)})"
    }.mkString(", ")
    "WITH " + graft.PseudoLog.sqlLogs + s""",
       |d AS (SELECT DISTINCT request_uri FROM logs),
       |sc(request_uri, n_chars, char_ppl) AS (VALUES $vals),
       |j AS (
       |  SELECT d.request_uri, CAST(sc.n_chars AS BIGINT) AS n_chars,
       |    CAST(sc.char_ppl AS DOUBLE) AS char_ppl
       |  FROM d JOIN sc ON sc.request_uri = d.request_uri),
       |rk AS (
       |  SELECT *, row_number() OVER (
       |    ORDER BY char_ppl DESC, request_uri ASC) AS rank
       |  FROM j)
       |SELECT request_uri, n_chars, char_ppl, rank
       |FROM rk WHERE rank <= 25""".stripMargin
  }

  /** q73: the q64 technique for the hashed-feature classifier — an
    * independent driver scorer sharing ONLY the trained weight vector
    * (and the fixture constants): its own FNV-1a implementation, its
    * own regex tokenizer, its own mean/sigmoid arithmetic replaying
    * the documented accumulation order (tokens then bigrams, text
    * order) so the doubles match bit-for-bit before rounding.
    */
  def qualityClassifierOracle(s: SparkSession, dir: String): String = {
    import graft.textops.QualityClassifier
    val planted = SparkEntry.qualityLabeledDocs(s, dir)
    val wts = SparkEntry.qualityModelFor(s, dir)
    // independent FNV-1a 64 (the published constants, re-typed here on
    // purpose — a transcription bug on either side breaks the match)
    def fnv(sIn: String): Long = {
      var h = -3750763034362895579L // 0xcbf29ce484222325
      for (b <- sIn.getBytes(java.nio.charset.StandardCharsets.UTF_8)) {
        h = (h ^ (b & 0xffL)) * 1099511628211L // 0x100000001b3
      }
      h
    }
    def idx(f: String): Int = {
      val m = fnv(f) % wts.dim
      (if (m < 0) m + wts.dim else m).toInt
    }
    def score(text: String): (Double, Boolean) = {
      val toks = (if (text == null) "" else text)
        .toLowerCase(java.util.Locale.ROOT)
        .split("[ \t\n\\x0B\f\r]+").filter(_.nonEmpty)
      var dot = 0.0
      toks.foreach(t => dot += wts.w(idx(t)))
      toks.sliding(2).foreach {
        case Array(a, b) => dot += wts.w(idx(a + " " + b))
        case _ =>
      }
      val n = toks.length + math.max(toks.length - 1, 0)
      val z = wts.bias + (if (n == 0) 0.0 else dot / n)
      val p = 1.0 / (1.0 + math.exp(-z))
      (p, p >= 0.5)
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = planted.select("doc_id", "text", "label").collect()
      .map { r =>
        val (p, pred) = score(r.getString(1))
        (r.getLong(0), r.getBoolean(2), r4(p), pred)
      }.sortBy(_._1)
    checkEmbeddable("q73_quality_classifier", rows.length.toLong)
    val vals = rows.map { case (id, l, p, pr) =>
      s"($id, $l, $p, $pr)"
    }.mkString(", ")
    s"""WITH expv(doc_id, label, score, pred) AS (VALUES $vals)
       |SELECT d.doc_id, CAST(e.label AS BOOLEAN) AS label,
       |  CAST(e.score AS DOUBLE) AS score, CAST(e.pred AS BOOLEAN) AS pred
       |FROM documents d JOIN expv e ON e.doc_id = d.doc_id""".stripMargin
  }

  /** q75: the q64/q73 independent-reimplementation technique for the
    * temperature mixture — its own pass over the raw (lang, n_chars)
    * columns (no [[graft.operators.Mixture]] code), replaying the
    * documented deterministic-arithmetic contract (exact Long totals,
    * lexicographic left-fold Z, left-to-right rate expression,
    * floor(frac * 2^24) threshold) so the per-stratum (n_full, thr)
    * plan matches bit-for-bit. DuckDB then recomputes the per-doc
    * 24-bit md5 coin and the epoch explosion itself — the engine's
    * emission pass is checked end-to-end, the rate plan against an
    * independent implementation.
    */
  def mixtureOracle(s: SparkSession, dir: String): String = {
    val alpha = 0.5
    val budget = 400000L
    // raw columns only — summed driver-side into a sorted map
    val rows = s.read.parquet(dir + "/documents.parquet")
      .select("lang", "n_chars").collect()
    val totals = scala.collection.immutable.TreeMap(
      rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sum).toSeq: _*)
    var z = 0.0
    totals.foreach { case (_, t) => if (t > 0) z += Math.pow(t.toDouble, alpha) }
    val plan = totals.toSeq.map { case (lang, t) =>
      if (t <= 0 || z == 0.0) (lang, 0, 0)
      else {
        val r = Math.pow(t.toDouble, alpha) / z * budget.toDouble / t.toDouble
        val nFull = math.floor(r).toInt
        (lang, nFull, math.floor((r - nFull) * (1 << 24).toDouble).toInt)
      }
    }
    checkEmbeddable("q75_mixture", plan.length.toLong)
    val vals = plan.map { case (l, nf, thr) => s"('$l', $nf, $thr)" }.mkString(", ")
    s"""WITH rates(stratum, n_full, thr) AS (VALUES $vals),
       |e AS (
       |  SELECT d.doc_id, d.lang,
       |    r.n_full + CASE WHEN ('0x' || md5(CAST(d.doc_id AS VARCHAR))[1:6])::BIGINT < r.thr
       |               THEN 1 ELSE 0 END AS n_ep
       |  FROM documents d JOIN rates r ON d.lang = r.stratum)
       |SELECT doc_id, lang, CAST(i AS BIGINT) AS epoch
       |FROM e, unnest(range(n_ep)) AS t(i)""".stripMargin
  }

  /** q65: the whole curation chain recomputed in ONE DuckDB query. The
    * only engine-supplied inputs are the stage-4 corpus's minhash keys
    * (shingle sets + band hashes, the q25 technique — keyed by doc_id,
    * so a stage-1..4 divergence between engines breaks the key join
    * and the hash match). Every stage — the cleaning regex chain, the
    * stopword lang CASE, the quality gate, exact dedup, the capped
    * band join + exact Jaccard + connected components + keep-best, the
    * literal-string span dedup, eval-window decontamination, and the
    * budget cumsum — is plain SQL over the previous stage's CTE.
    */
  def curationOracle(s: SparkSession, dir: String): String = {
    val s4 = SparkEntry.curationStage4(s, dir)
    val rows = s4
      .select(col("doc_id").as("id"), NearDup.hashedShingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", TokenShingles.minhash_sig_long(col("sh"), 32))
      .withColumn("bands", TokenShingles.lsh_band_keys(col("sig"), 8, 32 / 8))
      .select("id", "sh", "bands")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2)))
      .sortBy(_._1)
    checkEmbeddable("q65_curation_pipeline", rows.iterator.map(_._2.size.toLong + 8).sum)
    val shVals = rows.map { case (id, sh, _) => s"($id, ${longs(sh)})" }.mkString(", ")
    val bandVals = rows.flatMap { case (id, _, bands) =>
      bands.zipWithIndex.map { case (bh, i) => s"($id, $i, $bh)" }
    }.mkString(", ")
    // stopword-CASE generators shared with the q20/q52 static oracles,
    // pointed at the cleaned text
    val toksExpr = "string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+')"
    val scores = graft.textops.TextAnalysis.stopwords.map { case (lang, words) =>
      val list = words.map(w => s"'$w'").mkString("[", ", ", "]")
      lang -> s"len(list_filter($toksExpr, t -> list_contains($list, t)))"
    }
    val maxS = scores.values.mkString("greatest(", ", ", ")")
    val caseChain = scores.map { case (lang, sc) =>
      s"WHEN $sc = m THEN '$lang'"
    }.mkString(" ")
    val en = graft.textops.TextAnalysis.stopwords("en")
      .map(w => s"'$w'").mkString("[", ", ", "]")
    val p1 = SparkEntry.evalProbe1
    val p2 = SparkEntry.evalProbe2
    s"""WITH RECURSIVE
       |cleaned AS (
       |  SELECT doc_id,
       |    trim(regexp_replace(regexp_replace(regexp_replace(text,
       |      '<[^>]*>', ' ', 'g'),
       |      '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
       |      '[ \\t\\n\\r]+', ' ', 'g')) AS text
       |  FROM documents),
       |lang AS (
       |  SELECT doc_id, CASE WHEN m <= 0 THEN 'und' $caseChain ELSE 'und' END AS lang_pred
       |  FROM (SELECT doc_id, text, $maxS AS m FROM cleaned)),
       |qbase AS (
       |  SELECT doc_id,
       |    CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
       |         ELSE string_split_regex(trim(lower(text)), '[ \\t\\n\\x0b\\f\\r]+') END AS toks,
       |    CASE WHEN length(text) = 0 THEN 0.0
       |         ELSE CAST(len(regexp_extract_all(text, '[^\\w \\t\\n\\x0b\\f\\r]')) AS DOUBLE) / length(text)
       |         END AS praw
       |  FROM cleaned),
       |qsig AS (
       |  SELECT doc_id, len(toks) AS n_tokens,
       |    floor(praw * 10000.0 + 0.5) / 10000.0 AS pr,
       |    floor((CASE WHEN len(toks) = 0 THEN 0.0
       |           ELSE CAST(len(list_filter(toks, t -> list_contains($en, t))) AS DOUBLE)
       |                / len(toks) END) * 10000.0 + 0.5) / 10000.0 AS sr,
       |    floor((CASE WHEN len(toks) = 0 THEN 0.0
       |           ELSE 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
       |           END) * 10000.0 + 0.5) / 10000.0 AS rr
       |  FROM qbase),
       |qkeep AS (
       |  SELECT doc_id FROM qsig
       |  WHERE NOT (n_tokens < 10 OR n_tokens > 100000 OR pr > 0.3
       |             OR sr < 0.02 OR rr > 0.6)),
       |chit AS (
       |  SELECT DISTINCT b.doc_id
       |  FROM qbase b, unnest(range(len(b.toks) - 2)) AS u(i)
       |  WHERE list_slice(b.toks, i + 1, i + 3) = ['slow', 'hash', 'batch']),
       |s4 AS (
       |  SELECT doc_id, text, lang_pred FROM (
       |    SELECT c.doc_id, c.text, l.lang_pred,
       |           row_number() OVER (PARTITION BY md5(c.text) ORDER BY c.doc_id) AS rn
       |    FROM cleaned c JOIN lang l USING (doc_id) JOIN qkeep USING (doc_id)
       |    WHERE c.doc_id NOT IN (SELECT doc_id FROM chit))
       |  WHERE rn = 1),
       |shv(id, sh) AS (VALUES $shVals),
       |shx AS (SELECT CAST(id AS BIGINT) AS id, CAST(sh AS BIGINT[]) AS sh FROM shv),
       |bandv(id, band_idx, band_hash) AS (VALUES $bandVals),
       |capped AS (
       |  SELECT id, band_idx, band_hash FROM (
       |    SELECT id, band_idx, band_hash,
       |           count(*) OVER (PARTITION BY band_idx, band_hash) AS n
       |    FROM bandv) WHERE n <= 100),
       |cand AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM capped a JOIN capped b
       |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.id < b.id),
       |pairs AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT id_a, id_b,
       |      round(CASE WHEN len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)) = 0
       |            THEN 0.0
       |            ELSE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
       |               / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
       |            END, 4) AS jaccard
       |    FROM cand JOIN shx sa ON sa.id = cand.id_a JOIN shx sb ON sb.id = cand.id_b)
       |  WHERE jaccard >= 0.5),
       |sym AS (SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs),
       |reach(id, r) AS (
       |  SELECT doc_id, doc_id FROM s4
       |  UNION
       |  SELECT sy.id_b, reach.r FROM reach JOIN sym sy ON sy.id_a = reach.id),
       |comp AS (SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id),
       |s5 AS (
       |  SELECT doc_id, text, lang_pred FROM (
       |    SELECT d.doc_id, d.text, d.lang_pred,
       |           row_number() OVER (PARTITION BY c.component
       |                              ORDER BY length(d.text) DESC, d.doc_id ASC) AS rk
       |    FROM s4 d JOIN comp c USING (doc_id)) WHERE rk = 1),
       |t6 AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0b\\f\\r]+'),
       |                x -> x != '') AS toks
       |  FROM s5),
       |wl6 AS (
       |  SELECT doc_id, toks,
       |    CASE WHEN len(toks) < 8 THEN []::VARCHAR[]
       |         ELSE list_transform(range(1, len(toks) - 6),
       |                i -> array_to_string(toks[i:i+7], ' ')) END AS ws
       |  FROM t6),
       |wins6 AS (
       |  SELECT doc_id, unnest(range(1, len(ws) + 1)) AS pos, unnest(ws) AS w FROM wl6),
       |rn6 AS (
       |  SELECT doc_id, pos,
       |         row_number() OVER (PARTITION BY w ORDER BY doc_id, pos) AS rn
       |  FROM wins6),
       |dup6 AS (SELECT doc_id, pos FROM rn6 WHERE rn > 1),
       |covered6 AS (
       |  SELECT DISTINCT doc_id, cpos FROM (
       |    SELECT doc_id, unnest(range(pos, pos + 8)) AS cpos FROM dup6)),
       |tp6 AS (
       |  SELECT doc_id, unnest(range(1, len(toks) + 1)) AS pos, unnest(toks) AS tok
       |  FROM t6),
       |kept6 AS (
       |  SELECT tp6.doc_id, tp6.pos, tp6.tok FROM tp6
       |  WHERE NOT EXISTS (SELECT 1 FROM covered6 c
       |                    WHERE c.doc_id = tp6.doc_id AND c.cpos = tp6.pos)),
       |agg6 AS (
       |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text_dedup
       |  FROM kept6 GROUP BY doc_id),
       |s6 AS (
       |  SELECT t6.doc_id, coalesce(a.text_dedup, '') AS text
       |  FROM t6 LEFT JOIN agg6 a ON a.doc_id = t6.doc_id),
       |evals AS (
       |  SELECT text FROM documents WHERE doc_id % 97 = 0
       |  UNION ALL SELECT '$p1' UNION ALL SELECT '$p2'),
       |et AS (
       |  SELECT list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0b\\f\\r]+'),
       |                     x -> x != '') AS toks
       |  FROM evals),
       |ewl AS (
       |  SELECT CASE WHEN len(toks) < 8 THEN []::VARCHAR[]
       |              ELSE list_transform(range(1, len(toks) - 6),
       |                     i -> array_to_string(toks[i:i+7], ' ')) END AS ws
       |  FROM et),
       |ew AS (SELECT DISTINCT unnest(ws) AS w FROM ewl),
       |t7 AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[ \\t\\n\\x0b\\f\\r]+'),
       |                x -> x != '') AS toks
       |  FROM s6),
       |wl7 AS (
       |  SELECT doc_id, toks,
       |    CASE WHEN len(toks) < 8 THEN []::VARCHAR[]
       |         ELSE list_transform(range(1, len(toks) - 6),
       |                i -> array_to_string(toks[i:i+7], ' ')) END AS ws
       |  FROM t7),
       |wins7 AS (
       |  SELECT doc_id, unnest(ws) AS w FROM wl7),
       |flagged AS (SELECT DISTINCT wins7.doc_id FROM wins7 JOIN ew ON ew.w = wins7.w),
       |s7 AS (
       |  SELECT t7.doc_id, array_to_string(t7.toks, ' ') AS text, len(t7.toks) AS n_tokens
       |  FROM t7 WHERE t7.doc_id NOT IN (SELECT doc_id FROM flagged)),
       |c8 AS (
       |  SELECT doc_id, text, n_tokens,
       |         sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM s7)
       |SELECT c8.doc_id, l.lang_pred, c8.text,
       |  CAST(c8.n_tokens AS BIGINT) AS n_tokens, CAST(c8.cum AS BIGINT) AS cum_tokens,
       |  CAST(greatest(c8.cum - 1, 0) // 2000 AS BIGINT) AS shard_id
       |FROM c8 JOIN s4 l ON l.doc_id = c8.doc_id
       |WHERE c8.cum <= 15000""".stripMargin
  }

  /** Reference BPE: per whitespace word, start from code-point symbols,
    * repeatedly merge ALL occurrences of the best-ranked adjacent pair
    * (left-to-right, overlap-skipping) until none ranks; sum symbol
    * counts.
    */
  private def refBpeCount(text: String, rank: Map[(String, String), Int]): Int =
    text.split("[ \t\n\\x0B\f\r]+").iterator.filter(_.nonEmpty).map { w =>
      var syms: Vector[String] =
        w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))
      var done = false
      while (!done && syms.length > 1) {
        val ranked = syms.zip(syms.tail).flatMap(p => rank.get(p).map(r => (r, p)))
        if (ranked.isEmpty) done = true
        else {
          val (_, (a, b)) = ranked.minBy(_._1)
          val buf = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              buf += (a + b); i += 2
            } else { buf += syms(i); i += 1 }
          }
          syms = buf.result()
        }
      }
      syms.length
    }.sum

  /** q34: engine emits the ADC shortlist (query_id, neighbor_id) —
    * codes, LUTs, and the refine·k cut are PQ-internal by design;
    * DuckDB recomputes the exact-cosine re-rank over it, verifying the
    * refine stage end to end.
    */
  def annPqOracle(s: SparkSession, dir: String): String = {
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val (shortlist, _) = Pq.adcShortlistWithQueries(
      emb, "vec_id", "embedding",
      emb.filter(col("vec_id") < 20), "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 6, m = 8, ks = 64, refine = 8,
      seed = 42L, maxQueries = Ann.MaxQueries)
    val sl = shortlist.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)
    checkEmbeddable("q34_ann_pq", sl.length.toLong)
    val slVals = sl.map { case (q, n) => s"($q, $n)" }.mkString(", ")
    val cand =
      s"""cand AS (
         |  SELECT CAST(query_id AS BIGINT) AS query_id,
         |         CAST(neighbor_id AS BIGINT) AS neighbor_id
         |  FROM (VALUES $slVals) sl(query_id, neighbor_id))""".stripMargin
    "WITH " + annRank(cand, 5)
  }
}
