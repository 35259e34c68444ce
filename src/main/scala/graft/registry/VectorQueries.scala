package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft._
import graft.SparkEntry._
import graft.functions.{Cidr, RiskFeatures}
import graft.rules.{GraftConfig, RuleEngine}
import graft.session.Sessionizer
import graft.sources.ParseLogLine

/** Vector query registry — embedding ops (brute/LSH/IVF/PQ ANN, recall gates, semdedup, k-means refine, diversity, cluster keywords).
  *
  * Mechanically split out of the former SparkEntry monolith (round
  * 10): entry text is unchanged; [[graft.SparkEntry.queries]] merges
  * every registry back into the single driver-facing map, and the
  * shared fixtures/oracle helpers stay on SparkEntry (`private[graft]`).
  */
object VectorQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // brute-force exact cosine top-5 for the first 20 vectors
    "q27_embed_topk" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      graft.vector.Ann.cosineTopK(
        emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 20), "vec_id", "embedding", k = 5)
    }),


    // LSH ANN over the same queries (rows-only; recall pinned in AnnSpec)
    "q28_ann_lsh" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      graft.vector.Ann.lshTopK(
        emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, nPlanes = 4)
    }),


    // IVF-flat ANN: kmeans coarse quantizer + nprobe cells (rows-only;
    // recall vs brute pinned in AnnSpec)
    "q32_ann_ivf" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      graft.vector.Ivf.ivfTopK(
        emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 6, cacheKey = Some(dir + "#embeddings"))
    }),


    // embedding-cosine near-dup pairs over planted perturbed copies
    // (exact, fully oracle-checkable: brute pairwise with the tight-loop
    // dot product)
    "q33_embed_pairs" -> ((s, dir) => {
      graft.textops.NearDup.embeddingCosinePairs(
        plantedEmbeddings(s, dir), "vec_id", "embedding", threshold = 0.99)
    }),


    // IVF-PQ ANN: coarse cells + product-quantized codes + ADC
    // shortlist + exact re-rank (rows-only; recall + exact-re-rank
    // equality pinned in AnnSpec)
    "q34_ann_pq" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      graft.vector.Pq.ivfPqTopK(
        emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 6, m = 8, ks = 64, refine = 8,
        cacheKey = Some(dir + "#embeddings"))
    }),


    // SQ8 scalar-quantized ANN (FAISS QT_8bit shape): per-dim corpus
    // [min,max] fit (one map-side-combined aggregation, 2·dim driver
    // doubles), codes-only approximate scan (integer-exact code dots
    // in doubles), top-(k·refine) shortlist, exact cosine re-rank via
    // id join-back. The static oracle recomputes fit, codes,
    // shortlist AND re-rank from raw embeddings — the whole codec is
    // hash-gated, not just the final ranking
    "q142_ann_sq" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      graft.vector.Sq.sqTopK(
        emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, refine = 4)
    }),


    // the SQ8 twin-recall gate beside q42/q43/q44: exact-copy twins
    // quantize to identical codes, so a correct codec must put every
    // query's twin at rank 1 — the oracle recomputes the brute-force
    // ground truth and the counts must AGREE exactly
    "q143_sq_twin_recall" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val res = graft.vector.Sq.sqTopK(
        twinEmbeddings(emb), "vec_id", "embedding",
        emb.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, refine = 4)
      twinRecallOf("ann_sq", res)
    }),


    "q42_lsh_twin_recall" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val res = graft.vector.Ann.lshTopK(
        twinEmbeddings(emb), "vec_id", "embedding",
        emb.filter(col("vec_id") < 20), "vec_id", "embedding", k = 5, nPlanes = 4)
      twinRecallOf("ann_lsh", res)
    }),


    "q43_ivf_twin_recall" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val res = graft.vector.Ivf.ivfTopK(
        twinEmbeddings(emb), "vec_id", "embedding",
        emb.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 6, cacheKey = Some(dir + "#embeddings-twin"))
      twinRecallOf("ann_ivf", res)
    }),


    "q44_pq_twin_recall" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val res = graft.vector.Pq.ivfPqTopK(
        twinEmbeddings(emb), "vec_id", "embedding",
        emb.filter(col("vec_id") < 20), "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 6, m = 8, ks = 64, refine = 8,
        cacheKey = Some(dir + "#embeddings-twin"))
      twinRecallOf("ann_pq", res)
    }),


    // SemDeDup-style semantic dedup: k-means cells block the candidate
    // pairs, within-cell cosine >= 0.99 drops the higher id. Planted
    // twin corpus (q33's) so real semantic dups exist. Oracle is
    // generated: engine emits ONLY (vec_id, cell); DuckDB recomputes
    // the within-cell pair join, the cosine arithmetic, and the
    // keep-first rule from the raw embeddings
    "q78_semdedup" -> ((s, dir) => {
      val planted = plantedEmbeddings(s, dir)
      graft.vector.SemDedup.semanticDedup(
        planted, "vec_id", "embedding",
        nClusters = semDedupClusters(planted), threshold = 0.99,
        cacheKey = Some(dir + "#embeddings-planted"))
        .select(col("id").as("vec_id"), col("cell"), col("kept"))
    }),


    // distributed fixed-point Lloyd refinement — the corpus-scale
    // quantizer path (the driver-sample fit's companion): 2 exact
    // Lloyd iterations over the full embeddings table from a
    // deterministic lowest-8-ids init; coordinates quantize to 2^40
    // fixed-point so the distributed sums are integer-exact and the
    // refined centroids are partitioning-independent. Per iteration:
    // one narrow assign scan + ONE (cell, pos) hash aggregation —
    // k*dim summary rows shuffle, never vectors. Generated oracle: an
    // independent driver scorer (own loops, own BigInt sums) embeds
    // the expected per-vector cells — exact, not approximate, BECAUSE
    // of the fixed-point contract
    "q88_kmeans_refine" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val init = graft.vector.Ivf.initFromIds(emb, "vec_id", "embedding", 8)
      val centers = graft.vector.Ivf.refineCentroids(emb, "embedding", init, iters = 2)
      emb.select(col("vec_id"),
        graft.vector.Ivf.nearest_cells(col("embedding"), centers, 1)
          .getItem(0).as("cell"))
    }),


    // cluster-balanced diversity sampling: 100 rows across 8 k-means
    // cells by Hamilton apportionment, md5-ranked within cell. Oracle
    // = q78's discipline: the (vec_id, cell) assignments are the only
    // engine-supplied keys; allocation, capping, ranking, and the cut
    // all recompute in SQL from them
    "q122_diversity_sample" -> ((s, dir) =>
      graft.vector.DiversitySample.clusterBalanced(
        s, table(s, dir, "embeddings"), "vec_id", "embedding",
        nCells = 8, total = 100, salt = "div9",
        cacheKey = Some(dir + "#embeddings"))
        .withColumnRenamed("id", "vec_id")),


    // per-cluster keyword extraction — the corpus-exploration op that
    // labels k-means cells with their top cf·idf terms (cf = term
    // occurrences within the cell, idf corpus-wide smooth, stop terms
    // capped by the q118 df rule). embeddings.vec_id IS documents
    // .doc_id in the testdata star schema. Ranking on the ROUNDED
    // score (q77's discipline). Oracle: cells embed (q78), terms/df/
    // cf/score/rank recompute in SQL
    "q124_cluster_keywords" -> ((s, dir) => {
      import graft.vector.Ivf
      val emb = table(s, dir, "embeddings")
      val centroids = Ivf.fitCentroids(emb, "embedding", 8,
        cacheKey = Some(dir + "#embeddings"))
      val cells = emb.select(col("vec_id").as("doc_id"),
        Ivf.nearest_cells(col("embedding"), centroids, 1).getItem(0).as("cell"))
      val docs = table(s, dir, "documents")
      val terms = docs.select(col("doc_id"),
        explode(graft.textops.TextIndex.terms(col("text"))).as("term"))
      val n = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
      val dft = terms.distinct().groupBy("term").agg(count(lit(1)).as("df"))
      val cf = terms.join(cells, "doc_id")
        .groupBy("cell", "term").agg(count(lit(1)).as("cf"))
      val scored = cf.join(dft, "term").crossJoin(broadcast(n))
        .filter(col("df") <=
          greatest(lit(8L), floor(col("n_docs") / 5).cast("long")))
        .withColumn("score", round(col("cf") *
          (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1.0), 4))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cell"))
        .orderBy(col("score").desc, col("term").asc)
      scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select("cell", "rank", "term", "score", "cf", "df")
    }),


    // similarity-coherent corpus ordering (In-Context Pretraining,
    // Shi et al. 2023): cell-major by the shared nlist=8 quantizer
    // (free via the fitted-quantizer memo q122/q124 already pay for),
    // within-cell by descending cosine-to-centroid. The generated
    // oracle embeds the engine's (id, cell) keys + centroid
    // coordinates and recomputes every cosine, rank and cell-major
    // offset from raw embeddings (OracleGen.curriculumOracle)
    "q146_semantic_order" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      graft.vector.Curriculum.semanticOrder(
        emb, "vec_id", "embedding",
        nCells = semDedupClusters(emb), cacheKey = Some(dir + "#embeddings"))
    }),


    // graph ANN (round-10 verdict item 3): per-IVF-cell kNN graph with
    // 2-cell overlapping assignment, searched by a deterministic
    // bounded-hop beam walk. Corpus = JITTERED twins (some cross a
    // cell boundary — the exact-copy twin fixture can't separate any
    // cell-partitioned method from brute force). Oracle is generated:
    // engine supplies edges + entry pools; DuckDB replays the walk
    // (unrolled pool/beam CTEs) and recomputes every cosine from the
    // raw vectors (OracleGen.graphAnnOracle)
    "q133_ann_graph" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val corpus = jitterTwinEmbeddings(emb)
      graft.vector.GraphAnn.graphTopK(
        corpus, "vec_id", "embedding",
        emb.filter(col("vec_id") < 100), "vec_id", "embedding",
        k = 5, nlist = graphNlist(corpus), nprobe = 1, m = 6,
        replicas = 2, hops = 5, beam = 12,
        cacheKey = Some(dir + "#embeddings-jitter"))
    }),


    // the graph-vs-IVF duel at EQUAL probe budget (nprobe=1) on the
    // jittered-twin fixture: one query, two recall rows. The graph's
    // cross-cell edges recover twins whose own cell was never probed;
    // plain IVF's candidate set is structurally the probed cell.
    // AnnSpec pins graph >= 0.9 AND graph > ivf; the oracle recomputes
    // both searches (OracleGen.graphRecallOracle)
    "q134_graph_twin_recall" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val corpus = jitterTwinEmbeddings(emb)
      val qs = emb.filter(col("vec_id") < 100)
      val nlist = graphNlist(corpus)
      val g = graft.vector.GraphAnn.graphTopK(
        corpus, "vec_id", "embedding", qs, "vec_id", "embedding",
        k = 1, nlist = nlist, nprobe = 1, m = 6, replicas = 2,
        hops = 5, beam = 12, cacheKey = Some(dir + "#embeddings-jitter"))
      val ivf = graft.vector.Ivf.ivfTopK(
        corpus, "vec_id", "embedding", qs, "vec_id", "embedding",
        k = 1, nlist = nlist, nprobe = 1,
        cacheKey = Some(dir + "#embeddings-jitter"))
      twinRecallOf("ann_graph", g)
        .unionByName(twinRecallOf("ann_ivf_nprobe1", ivf))
    }),


    // hierarchical entry (round-11 verdict item 3, HNSW's top layer in
    // spirit): a coarse kNN graph over cell centroids walked FIRST —
    // from a fixed seed cell, scored against each cell's MEDOID
    // vector (a real corpus vector, so entry choice reflects data,
    // not quantizer artifacts) — picks the entry cells; the base beam
    // walk then runs unchanged. Per-query cost independent of BOTH
    // corpus size and nlist (no O(nlist) centroid scan). Oracle is
    // generated: engine supplies base edges + cell edges + medoid
    // ids + seed; DuckDB replays the cell walk AND the base walk,
    // recomputing every cosine from raw vectors
    // (OracleGen.graphHierOracle). GraphAnnSpec's decoy-cell fixture
    // pins the recall unlock (ivf=0, flat=0, hier=1).
    "q158_ann_hier" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val corpus = jitterTwinEmbeddings(emb)
      graft.vector.GraphAnn.graphTopKHier(
        corpus, "vec_id", "embedding",
        emb.filter(col("vec_id") < 100), "vec_id", "embedding",
        k = 5, nlist = graphNlist(corpus), m = 6, replicas = 2,
        entryProbe = 4, cellHops = 4, cellBeam = 4, hops = 5, beam = 12,
        cellM = 4, cacheKey = Some(dir + "#embeddings-jitter"))
    }),


    // index-served hierarchical ANN (round-12): q158's walk from a
    // PERSISTED index — writeIndex stores the per-cell directed
    // lists, entries, and the hier cell layer (cell_edges.parquet);
    // searchIndexHier equals fresh build + hier search (spec-pinned),
    // so it shares q158's generated oracle. The composition a serving
    // pipeline runs: build once, search many, append without
    // invalidating the cell layer
    "q204_ann_hier_indexed" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val corpus = jitterTwinEmbeddings(emb)
      val centroids = graft.vector.Ivf.fitCentroids(
        corpus, "embedding", graphNlist(corpus),
        cacheKey = Some(dir + "#embeddings-jitter"))
      val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
      val idxDir = perProcessTmpDir(s"graft-gannidx-$sfx")
      // build-once economics, honestly benched: the index content is
      // a pure function of (corpus, centroids), so later passes in
      // the same process reuse it — cell_edges.parquet is writeIndex's
      // LAST artifact, so its presence proves a complete build
      val ceDone = new org.apache.hadoop.fs.Path(s"$idxDir/cell_edges.parquet")
      if (!ceDone.getFileSystem(s.sparkContext.hadoopConfiguration).exists(ceDone))
        graft.vector.GraphAnn.writeIndex(
          corpus, "vec_id", "embedding", idxDir, centroids,
          m = 6, replicas = 2)
      graft.vector.GraphAnn.searchIndexHier(
        s, idxDir, emb.filter(col("vec_id") < 100), "vec_id", "embedding",
        k = 5, entryProbe = 4, cellHops = 4, cellBeam = 4,
        hops = 5, beam = 12)
    }),


    // margin-based bitext mining (round-11; Artetxe & Schwenk 2019 /
    // CCMatrix): side A = raw embeddings (< 100), side B = jittered
    // "translations" of a WIDER slice (< 150, +100000 ids) so a third
    // of B has no true source — exactly the asymmetry the margin
    // handles and a raw cosine cutoff does not. All post-cosine
    // arithmetic integral (x10000), so the static oracle replays the
    // full criterion from brute force with zero float-order risk
    "q164_bitext_mine" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val aSide = emb.filter(col("vec_id") < 100)
      val bSide = jitterTwinEmbeddings(emb.filter(col("vec_id") < 150))
        .filter(col("vec_id") >= 100000)
      graft.vector.BitextMining.marginMine(
        aSide, "vec_id", "embedding", bSide, "vec_id", "embedding",
        k = 4, marginX10000 = 10000L)
    })
  )

  val oracleSql: Map[String, String] = Map(

    // q164: the margin criterion replayed from brute force — both
    // directions' top-4 neighborhoods, x10000 integral cosines, the
    // same greatest(...,1) denominator guard, the best-margin pick
    // with (margin desc, dst asc) tie-break, and the >= 1.0 threshold
    "q164_bitext_mine" ->
      s"""WITH a0 AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         |  WHERE vec_id < 100),
         |b0 AS (
         |  SELECT vec_id + 100000 AS vec_id,
         |    list_transform(
         |      list_zip(embedding::DOUBLE[], list_reverse(embedding::DOUBLE[])),
         |      p -> p[1] + ${SparkEntry.jitterC} * p[2]) AS v
         |  FROM embeddings WHERE vec_id < 150),
         |an AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM a0),
         |bn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM b0),
         |cab AS (
         |  SELECT x.vec_id AS qx, y.vec_id AS qy,
         |    CAST(round(round(list_dot_product(x.v, y.v) / (x.n * y.n), 4)
         |      * 10000, 0) AS BIGINT) AS ci,
         |    list_dot_product(x.v, y.v) / (x.n * y.n) AS craw
         |  FROM an x CROSS JOIN bn y),
         |rab AS (
         |  SELECT qx, qy, ci,
         |    row_number() OVER (PARTITION BY qx
         |      ORDER BY craw DESC, qy ASC) AS rk
         |  FROM cab),
         |rba AS (
         |  SELECT qx, qy, ci,
         |    row_number() OVER (PARTITION BY qy
         |      ORDER BY craw DESC, qx ASC) AS rk
         |  FROM cab),
         |sa AS (SELECT qx, sum(ci) AS s FROM rab WHERE rk <= 4 GROUP BY qx),
         |sb AS (SELECT qy, sum(ci) AS s FROM rba WHERE rk <= 4 GROUP BY qy),
         |cand AS (
         |  SELECT r.qx, r.qy, r.ci,
         |    CAST(r.ci * 8 * 10000 // greatest(sa.s + sb.s, 1) AS BIGINT)
         |      AS margin
         |  FROM rab r JOIN sa ON sa.qx = r.qx JOIN sb ON sb.qy = r.qy
         |  WHERE r.rk <= 4),
         |best AS (
         |  SELECT qx, qy, ci, margin,
         |    row_number() OVER (PARTITION BY qx
         |      ORDER BY margin DESC, qy ASC) AS brk
         |  FROM cand)
         |SELECT qx AS src_id, qy AS dst_id, ci AS cos_x10000,
         |  margin AS margin_x10000
         |FROM best WHERE brk = 1 AND margin >= 10000""".stripMargin,


    "q27_embed_topk" ->
      """WITH c AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n
        |  FROM embeddings),
        |q AS (SELECT * FROM c WHERE vec_id < 20),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         list_dot_product(c.v, q.v) / (c.n * q.n) AS cos_raw
        |  FROM c CROSS JOIN q WHERE c.vec_id != q.vec_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |            ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, round(cos_raw, 4) AS cosine, rank
        |FROM ranked WHERE rank <= 5""".stripMargin,


    "q33_embed_pairs" ->
      """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |planted AS (
        |  SELECT vec_id, v FROM base
        |  UNION ALL
        |  SELECT vec_id + 100000 AS vec_id, list_transform(v, x -> x + 0.01) AS v
        |  FROM base),
        |c AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM planted),
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |         round(list_dot_product(a.v, b.v) / (a.n * b.n), 4) AS cosine
        |  FROM c a JOIN c b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.99""".stripMargin,


    // q142: the whole SQ8 codec replayed — per-dim min/max from the
    // same doubles, the clamp(floor((x−mn)·255/(mx−mn))) code formula
    // in the engine's exact IEEE association, integer-exact code dots,
    // the (adot desc, id) shortlist at k·refine = 20, and the q27
    // exact-cosine re-rank
    "q142_ann_sq" ->
      """WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |dims AS (
        |  SELECT u.i AS i, min(c.v[u.i]) AS mn, max(c.v[u.i]) AS mx
        |  FROM c, unnest(generate_series(1, len(c.v))) AS u(i)
        |  GROUP BY u.i),
        |codes AS (
        |  SELECT c.vec_id, list(
        |    CASE WHEN d.mx = d.mn THEN 0.0
        |         ELSE least(greatest(
        |           floor((c.v[d.i] - d.mn) * 255.0 / (d.mx - d.mn)), 0.0), 255.0)
        |    END ORDER BY d.i) AS cd
        |  FROM c CROSS JOIN dims d
        |  GROUP BY c.vec_id),
        |q AS (SELECT vec_id, cd FROM codes WHERE vec_id < 20),
        |cand AS (
        |  SELECT q.vec_id AS query_id, c2.vec_id AS neighbor_id,
        |    list_dot_product(c2.cd, q.cd) /
        |      greatest(sqrt(list_dot_product(c2.cd, c2.cd)) *
        |               sqrt(list_dot_product(q.cd, q.cd)), 1e-12) AS adot
        |  FROM codes c2 CROSS JOIN q WHERE c2.vec_id != q.vec_id),
        |short AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY adot DESC, neighbor_id ASC) AS arank
        |  FROM cand),
        |norms AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM c),
        |rr AS (
        |  SELECT s.query_id, s.neighbor_id,
        |    list_dot_product(cn.v, qn.v) / (cn.n * qn.n) AS cos_raw
        |  FROM short s
        |  JOIN norms cn ON cn.vec_id = s.neighbor_id
        |  JOIN norms qn ON qn.vec_id = s.query_id
        |  WHERE s.arank <= 20),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cos_raw,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
        |  FROM rr)
        |SELECT query_id, neighbor_id, round(cos_raw, 4) AS cosine, rank
        |FROM ranked WHERE rank <= 5""".stripMargin,


    "q143_sq_twin_recall" -> annTwinOracleSql("ann_sq"),


    // ANN families: the oracle RECOMPUTES the ground truth by brute
    // force over the twin-planted corpus (top-1 per query by exact
    // cosine, ties by neighbor id — the same ordering the Spark side
    // ranks with) and counts how many top-1s are the planted twin. The
    // ANN result must agree exactly.
    "q42_lsh_twin_recall" -> annTwinOracleSql("ann_lsh"),

    "q43_ivf_twin_recall" -> annTwinOracleSql("ann_ivf"),

    "q44_pq_twin_recall" -> annTwinOracleSql("ann_pq")
  )
}
