package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage — blocking, pairwise
  * Fellegi–Sunter-style match scoring, and transitive clustering into
  * entities (the classic dirty-duplicate customer/record problem, and
  * for training corpora the metadata-record twin of document dedup).
  *
  * Spark-first shape:
  *  - **Blocking** bounds the candidate space: pairs are generated
  *    only within a caller-supplied block key (phonetic key, numeric
  *    token, sorted-neighborhood window — the caller's choice), and
  *    blocks above `maxBlockSize` are dropped with the same loud,
  *    documented degradation as the LSH bucket cap (an oversized
  *    block means the key carries no discriminating signal; scoring
  *    its quadratic pair set would dominate the job at scale).
  *  - **Scoring** is integral: name-token Jaccard scaled to
  *    `nameWeight` via long DIV, plus fixed bonuses for exact-match
  *    fields — no floats anywhere, so the DuckDB oracle matches
  *    hash-exactly.
  *  - **Clustering** is [[Dedup.connectedComponents]] (pointer
  *    jumping, localCheckpoint per round) over the above-threshold
  *    pairs; the entity id is the component minimum.
  *
  * At 100 TB: the block self-join shuffles on the block key once,
  * per-block work is quadratic only within the cap, and the CC loop
  * runs on the (id, component) projection — never the full records.
  */
object EntityResolution {

  /** Candidate pairs with integral match scores.
    *
    * `records` must carry `idCol`, `blockCol` (null/empty blocks are
    * unblockable and dropped), `toksCol` (a pre-normalized DISTINCT
    * token array for the Jaccard field), and every column named in
    * `exactBonus`.
    *
    * Output: id_a, id_b (id_a < id_b), score.
    */
  def scoredPairs(
      records: DataFrame,
      idCol: String,
      blockCol: String,
      toksCol: String,
      nameWeight: Int,
      exactBonus: Seq[(String, Int)],
      maxBlockSize: Long = 64): DataFrame = {
    require(maxBlockSize > 0, "scoredPairs: maxBlockSize must be positive")
    val base = records
      .filter(col(blockCol).isNotNull && length(col(blockCol)) > 0)
      .select(Seq(col(idCol).as("_er_id"), col(blockCol).as("_er_blk"),
        col(toksCol).as("_er_toks")) ++
        exactBonus.map { case (c, _) => col(c) }: _*)
    // block-size guard: reduced (#blocks) frame joined back on the
    // block key the pair join shuffles on anyway
    val sizes = base.groupBy(col("_er_blk"))
      .agg(count(lit(1)).as("_er_bn"))
      .filter(col("_er_bn") <= maxBlockSize)
      .select(col("_er_blk"))
    val capped = base.join(sizes, "_er_blk")
    val a = capped.select(
      Seq(col("_er_blk"), col("_er_id").as("id_a"),
        col("_er_toks").as("_er_toks_a")) ++
        exactBonus.map { case (c, _) => col(c).as(s"_er_a_$c") }: _*)
    val b = capped.select(
      Seq(col("_er_blk"), col("_er_id").as("id_b"),
        col("_er_toks").as("_er_toks_b")) ++
        exactBonus.map { case (c, _) => col(c).as(s"_er_b_$c") }: _*)
    val bonus = exactBonus
      .map { case (c, w) =>
        when(col(s"_er_a_$c") === col(s"_er_b_$c"), w.toLong).otherwise(0L)
      }
      .foldLeft(lit(0L))(_ + _)
    a.join(b, Seq("_er_blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("_er_inter",
        size(array_intersect(col("_er_toks_a"), col("_er_toks_b"))).cast("long"))
      .withColumn("_er_union",
        size(array_union(col("_er_toks_a"), col("_er_toks_b"))).cast("long"))
      .withColumn("score",
        expr(s"CAST($nameWeight * _er_inter DIV greatest(_er_union, 1) " +
          "AS BIGINT)") + bonus)
      .select(col("id_a"), col("id_b"), col("score"))
  }

  /** Full resolution: score, threshold, cluster, and label every
    * record (unmatched records are singleton entities).
    *
    * Output: rec_id, entity_id (component-min id), n_records
    * (entity size).
    */
  def resolve(
      records: DataFrame,
      idCol: String,
      blockCol: String,
      toksCol: String,
      nameWeight: Int,
      exactBonus: Seq[(String, Int)],
      threshold: Long,
      maxBlockSize: Long = 64): DataFrame = {
    val edges = scoredPairs(records, idCol, blockCol, toksCol,
      nameWeight, exactBonus, maxBlockSize)
      .filter(col("score") >= threshold)
      .select(col("id_a"), col("id_b"))
    val comps = Dedup.connectedComponents(
      records.select(col(idCol)), idCol, edges)
      .select(col("id").as("rec_id"), col("component").as("entity_id"))
    val sizes = comps.groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_records"))
    comps.join(sizes, "entity_id")
      .select(col("rec_id"), col("entity_id"), col("n_records"))
  }
}
