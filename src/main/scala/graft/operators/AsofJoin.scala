package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  * right rows precede each left row. Hot keys sort within one task
  * (the same trade as [[graft.session.Sessionizer.withClusters]]; a
  * chunked twin would follow that file's recipe if a key outgrows a
  * task).
  *
  * Ties: a right row whose time EQUALS the left row's time matches
  * (`strict = false`, the `>=` convention DuckDB/pandas default to);
  * `strict = true` excludes it. Right rows with null time are dropped
  * (they'd sort before everything and match every row); left rows with
  * null time match nothing.
  */
object AsofJoin {

  /** @param valueCols right-side payload columns carried to the output
    *   (they must not collide with left column names — rename first).
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
    require(keyCols.nonEmpty, "asofBackward: at least one key column")
    val collisions = valueCols.filter(left.columns.contains)
    require(collisions.isEmpty,
      s"asofBackward: value columns ${collisions.mkString(", ")} collide with " +
        "left columns; rename the right-side payload first")

    val leftCols = left.columns.toSeq
    val rightValue = right.schema.fields.map(f => f.name -> f.dataType).toMap

    // aligned schema: [left cols] ++ _t ++ _ord ++ [payload cols]
    // _ord breaks time ties: for >= semantics the right row sorts first
    // (so last() sees it); for strict < it sorts after the left row.
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

    // Right-side (key, time) ties order by the payload tuple so the
    // pick is deterministic across runs/partitionings (greatest tuple
    // wins — last in window order).
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t") +: col("_ord") +: valueCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE struct carries match time + every payload column, so all
    // output columns come from the SAME matched right row. Filling each
    // payload with its own last(ignoreNulls) would skip a right row
    // whose column is null and fall back to an OLDER row's value —
    // stale data, and different columns could come from different rows.
    val matched = last(
      when(!col("_isLeft"), struct(col("_t").as("_rt") +: valueCols.map(col): _*)),
      ignoreNulls = true).over(w)
    val filled = lSide.unionByName(rSide).withColumn("_m", matched)

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
}
