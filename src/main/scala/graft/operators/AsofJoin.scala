package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.RowOrdering
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** As-of join: for every left row, the single most recent right row at
  * or before the left row's time, per key — the standard align-to-last
  * operation for event streams against slowly-updating state
  * (checkpoints, prices, config versions).
  *
  * Spark has no native as-of join. The classic scalable shape (rather
  * than a `l.t >= r.t` range join, which plans as a per-key cross join
  * and goes quadratic on hot keys) is union + running `last()`:
  *
  *  1. union the two inputs into one frame (right rows carry the
  *     payload columns, left rows carry null there, and vice versa);
  *  2. one window over `(keys)` ordered by `(time, side)` computes
  *     `last(payload, ignoreNulls)` — the most recent right payload at
  *     or before each row;
  *  3. keep the left rows.
  *
  * Cost: ONE hash shuffle of `|left| + |right|` rows on the key — the
  * same price as the aggregations around it, independent of how many
  * right rows precede each left row. [[asofBackward]] sorts each key in
  * one task (fine until a key outgrows a task);
  * [[asofBackwardChunked]] is the skew-proof twin that bounds the
  * per-task sort by a time chunk, following
  * [[graft.session.Sessionizer.withClustersChunked]]'s recipe.
  *
  * Ties: a right row whose time EQUALS the left row's time matches
  * (`strict = false`, the `>=` convention DuckDB/pandas default to);
  * `strict = true` excludes it. Right rows with null time are dropped
  * (they'd sort before everything and match every row); left rows with
  * null time match nothing.
  *
  * Payload columns participate in the window ORDER BY (so a right-side
  * (key, time) tie resolves deterministically to the greatest payload
  * tuple across runs and partitionings) and must therefore be ORDERABLE
  * types — maps and other unorderable payloads are rejected up front;
  * wrap them behind an orderable tiebreak column first.
  */
object AsofJoin {

  /** Aligned union of the two sides:
    * [left cols] ++ _t ++ _ord ++ _isLeft ++ [payload cols].
    * _ord breaks time ties: for >= semantics the right row sorts first
    * (so last() sees it); for strict < it sorts after the left row.
    */
  private def alignedUnion(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      valueCols: Seq[String],
      strict: Boolean): (DataFrame, Map[String, DataType]) = {
    require(keyCols.nonEmpty, "asofBackward: at least one key column")
    val collisions = valueCols.filter(left.columns.contains)
    require(collisions.isEmpty,
      s"asofBackward: value columns ${collisions.mkString(", ")} collide with " +
        "left columns; rename the right-side payload first")
    val unorderable = valueCols.filter(v => !RowOrdering.isOrderable(right.schema(v).dataType))
    require(unorderable.isEmpty,
      s"asofBackward: payload columns ${unorderable.mkString(", ")} have unorderable " +
        "types; they participate in the deterministic (key, time)-tie ORDER BY — " +
        "project an orderable tiebreak column instead")

    val leftCols = left.columns.toSeq
    val rightValue = right.schema.fields.map(f => f.name -> f.dataType).toMap

    val lSide = left.select(
      leftCols.map(col) ++
        Seq(col(leftTimeCol).cast("long").as("_t"),
          lit(if (strict) 0 else 1).as("_ord"), lit(true).as("_isLeft")) ++
        valueCols.map(v => lit(null).cast(rightValue(v)).as(v)): _*)
    val rSide = right.filter(col(rightTimeCol).isNotNull).select(
      leftCols.map(c =>
        if (keyCols.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(rightTimeCol).cast("long").as("_t"),
          lit(if (strict) 1 else 0).as("_ord"), lit(false).as("_isLeft")) ++
        valueCols.map(col): _*)
    (lSide.unionByName(rSide), rightValue)
  }

  /** ONE struct carries match time + every payload column, so all
    * output columns come from the SAME matched right row. Filling each
    * payload with its own last(ignoreNulls) would skip a right row
    * whose column is null and fall back to an OLDER row's value —
    * stale data, and different columns could come from different rows.
    */
  private def matchStruct(valueCols: Seq[String]): Column =
    when(!col("_isLeft"), struct(col("_t").as("_rt") +: valueCols.map(col): _*))

  /** Keep left rows; apply the tolerance cut and unpack `_m`. */
  private def fillMatched(
      filled: DataFrame,
      valueCols: Seq[String],
      rightValue: Map[String, DataType],
      tolerance: Option[Long]): DataFrame = {
    val tooFar = tolerance match {
      case Some(tol) =>
        col("_m").isNull || (col("_t") - col("_m").getField("_rt")) > tol
      case None => col("_m").isNull
    }
    val out = valueCols.foldLeft(filled.filter(col("_isLeft"))) { (df, v) =>
      df.withColumn(v,
        when(tooFar, lit(null).cast(rightValue(v))).otherwise(col("_m").getField(v)))
    }
    out.drop("_t", "_ord", "_isLeft", "_m")
  }

  /** @param valueCols right-side payload columns carried to the output
    *   (they must not collide with left column names — rename first).
    *   They must be ORDERABLE types (enforced above): equal
    *   (key, time) right rows are tie-broken by payload order so the
    *   result is run-deterministic — note pandas `merge_asof` (last
    *   duplicate wins) and DuckDB ASOF (arbitrary) choose differently;
    *   dedup equal-time right rows first when matching an engine with
    *   other tie semantics.
    * @param tolerance max allowed `leftTime - rightTime` (same unit as
    *   the time columns); a match further back yields nulls, like
    *   pandas `merge_asof(tolerance=...)`.
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      valueCols: Seq[String],
      strict: Boolean = false,
      tolerance: Option[Long] = None): DataFrame = {
    val (union, rightValue) =
      alignedUnion(left, right, keyCols, leftTimeCol, rightTimeCol, valueCols, strict)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t") +: col("_ord") +: valueCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = union.withColumn("_m",
      last(matchStruct(valueCols), ignoreNulls = true).over(w))
    fillMatched(filled, valueCols, rightValue, tolerance)
  }

  /** Skew-proof two-phase twin of [[asofBackward]] — identical output
    * (AsofJoinSpec proves equality), bounded per-task sort.
    *
    * [[asofBackward]] sorts each key's entire `|left| + |right|` row
    * set in one task; a hot key serializes there (the skew duel in
    * ScaleBench measures the monolithic sessionizer's max-task growing
    * superlinearly in exactly this shape). Here the per-task unit is a
    * `(keys, _t DIV chunkSize)` time chunk:
    *
    *  1. running last(match) WITHIN each chunk (bounded work: chunk
    *     duration × peak rate);
    *  2. per-(keys, chunk) summaries — the chunk's final right match,
    *     `max(matchStruct)`; struct comparison is field-lexicographic
    *     over (_rt, payload...), which equals the window order
    *     restricted to right rows (their `_ord` is constant) — get a
    *     running `max` over PRECEDING chunks = the carry-in state;
    *  3. carry joins back on (keys, chunk) (null-safe: null keys form a
    *     window group in the monolithic twin, so they must join here
    *     too; a null `_t` left row gets a null chunk, which sorts first
    *     and carries nothing in) and fills where the chunk had no
    *     earlier right row.
    *
    * Equal times land in the same chunk (chunk = _t DIV chunkSize), so
    * strict/tie semantics are untouched: the carry only ever supplies
    * strictly-earlier-chunk (hence strictly-earlier-time) matches.
    *
    * @param chunkSize chunk width in the TIME COLUMN'S UNIT (e.g.
    *   3600L for hourly chunks over epoch seconds; 3600L * 1000000000L
    *   over epoch nanos). Pick it so chunk duration × peak per-key rate
    *   fits a task.
    */
  def asofBackwardChunked(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      valueCols: Seq[String],
      chunkSize: Long,
      strict: Boolean = false,
      tolerance: Option[Long] = None): DataFrame = {
    require(chunkSize > 0, s"asofBackwardChunked: chunkSize must be positive, got $chunkSize")
    val (union0, rightValue) =
      alignedUnion(left, right, keyCols, leftTimeCol, rightTimeCol, valueCols, strict)
    // integer chunking (DIV, not a double divide: nano-scale epochs
    // exceed 2^53 and would lose precision through a double)
    val union = union0.withColumn("_chunk", expr(s"_t DIV ${chunkSize}L"))

    val chunkPart = Window.partitionBy(keyCols.map(col) :+ col("_chunk"): _*)
      .orderBy(col("_t") +: col("_ord") +: valueCols.map(col): _*)
    val inChunk = chunkPart.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the chunk's FINAL right match, as a second frame of the SAME
    // window (same partitioning + order => one WindowExec, no extra
    // exchange). The groupBy(max(struct)) formulation this replaces
    // planned a SortAggregate — max over a struct is not
    // hash-aggregable — costing two additional full sorts of the union
    // (its max-task under the skew duel exceeded the monolithic twin's
    // hot-key sort, inverting the point of chunking).
    val fullChunk = chunkPart.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val withIn = union
      .withColumn("_in", last(matchStruct(valueCols), ignoreNulls = true).over(inChunk))
      .withColumn("_cl", last(matchStruct(valueCols), ignoreNulls = true).over(fullChunk))

    // one row per (keys, chunk): _cl is constant within the chunk, so
    // distinct() — a plain HashAggregate with struct grouping keys —
    // reduces it; the over-chunks window then shuffles only this small
    // summary frame
    val summaries = withIn
      .select(keyCols.map(col) ++ Seq(col("_chunk"), col("_cl")): _*).distinct()
    val overChunks = Window.partitionBy(keyCols.map(col): _*).orderBy(col("_chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = summaries
      .withColumn("_carry", max(col("_cl")).over(overChunks))
      .select(keyCols.zipWithIndex.map { case (k, i) => col(k).as(s"_ck$i") } ++
        Seq(col("_chunk").as("_ckc"), col("_carry")): _*)

    val joinCond = (keyCols.zipWithIndex.map { case (k, i) => col(k) <=> col(s"_ck$i") } :+
      (col("_chunk") <=> col("_ckc"))).reduce(_ && _)
    val filled = withIn.join(carries, joinCond)
      .withColumn("_m", coalesce(col("_in"), col("_carry")))
      .drop("_in", "_cl", "_carry", "_chunk", "_ckc")
      .drop(keyCols.indices.map(i => s"_ck$i"): _*)
    fillMatched(filled, valueCols, rightValue, tolerance)
  }
}
