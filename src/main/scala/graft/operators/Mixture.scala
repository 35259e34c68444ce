package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temperature-weighted corpus mixing with repetition — the
  * language/source-balancing step multilingual and multi-source
  * training runs execute (the mT5/XLM-R exponential-smoothing recipe):
  * given per-stratum weight totals `T_s` (tokens, chars, bytes — the
  * caller's unit) and a temperature `alpha`, sample stratum `s` with
  * probability
  *
  *   p_s = T_s^alpha / sum_t T_t^alpha
  *
  * so `alpha = 1` keeps the natural distribution, `alpha = 0` gives
  * every stratum an equal budget share, and intermediate values
  * upsample rare strata without drowning common ones. Against a total
  * output budget `B`, every document in stratum `s` is emitted
  *
  *   r_s = p_s * B / T_s
  *
  * times in expectation: `floor(r_s)` guaranteed copies (training
  * "epochs" over the stratum) plus one more iff the document's
  * deterministic 24-bit md5 uniform falls below `frac(r_s)` — the
  * [[Sampling]] md5-bucket idiom at 24-bit resolution, so the kept set
  * is identical in any engine/run/partitioning and the DuckDB oracle
  * recomputes the per-doc coin verbatim.
  *
  * DETERMINISTIC ARITHMETIC CONTRACT (what an independent
  * reimplementation must follow to agree bit-for-bit): totals are
  * exact Long sums; `Z = sum_t T_t^alpha` is a LEFT FOLD of
  * `Math.pow(T_t, alpha)` in LEXICOGRAPHIC stratum order;
  * `r_s = Math.pow(T_s, alpha) / Z * B / T_s` evaluated left-to-right
  * in doubles; the fractional coin threshold is
  * `floor(frac(r_s) * 2^24)` compared as `u24 < thr`. IEEE doubles
  * make every step reproducible across implementations that follow
  * the same op order.
  *
  * 100 TB shape: ONE tiny aggregation (num-strata rows) feeds a
  * driver-side rate table folded into a codegen'd CASE; the emission
  * pass is narrow (filter + bounded explode) — no corpus-wide shuffle,
  * no state, nothing to skew. Strata counts are bounded and checked
  * BEFORE collect ([[maxStrata]]).
  */
object Mixture {

  /** Per-stratum emission plan: `nFull` guaranteed copies, one more
    * iff `u24 < fracThr24`.
    */
  final case class StratumRate(
      stratum: String, total: Long, rate: Double, nFull: Int, fracThr24: Int)

  val maxStrata = 10000

  /** The deterministic rate computation (see the arithmetic contract
    * above). Zero-total strata emit nothing (`rate = 0`).
    */
  def rates(totals: Seq[(String, Long)], alpha: Double, budget: Long): Seq[StratumRate] = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0, 1], got $alpha")
    require(budget > 0, s"budget must be positive, got $budget")
    val sorted = totals.sortBy(_._1)
    var z = 0.0
    sorted.foreach { case (_, t) => if (t > 0) z += Math.pow(t.toDouble, alpha) }
    sorted.map { case (s, t) =>
      if (t <= 0 || z == 0.0) StratumRate(s, t, 0.0, 0, 0)
      else {
        val r = Math.pow(t.toDouble, alpha) / z * budget.toDouble / t.toDouble
        val nFull = math.floor(r).toInt
        val thr = math.floor((r - nFull) * (1 << 24).toDouble).toInt
        StratumRate(s, t, r, nFull, thr)
      }
    }
  }

  /** 24-bit uniform from the md5 of the id's string form — the
    * [[Sampling.bucket]] construction widened to 6 hex digits
    * (`'0x' || md5(id)[1:6]` in the DuckDB twin).
    */
  def uniform24(idCol: Column): Column =
    conv(substring(md5(idCol.cast("string")), 1, 6), 16, 10).cast("int")

  /** Emit each row `floor(r_s)` times plus the fractional md5 coin,
    * with `epoch` numbering the copies 0..n-1. Strata absent from the
    * observed totals cannot occur (totals come from the same frame);
    * null strata are rejected up front — a null key would silently
    * vanish from the when-fold.
    */
  def temperatureMix(
      df: DataFrame,
      idCol: Column,
      strataCol: Column,
      weightCol: Column,
      alpha: Double,
      budget: Long): DataFrame = {
    val totalRows = df.groupBy(strataCol.as("_stratum"))
      .agg(sum(weightCol).as("_total"))
    val bounded = totalRows.limit(maxStrata + 1).collect()
    require(bounded.length <= maxStrata,
      s"more than $maxStrata strata — temperatureMix folds rates into a CASE " +
        "expression; re-bucket the strata or raise maxStrata")
    require(bounded.forall(!_.isNullAt(0)),
      "null stratum key — fill or filter null strata before mixing")
    val totals = bounded.map(r => (r.getString(0), if (r.isNullAt(1)) 0L else r.getLong(1))).toSeq
    val rs = rates(totals, alpha, budget)

    val nFullCol = rs.foldLeft(lit(0)) { case (acc, r) =>
      when(strataCol === r.stratum, lit(r.nFull)).otherwise(acc)
    }
    val thrCol = rs.foldLeft(lit(0)) { case (acc, r) =>
      when(strataCol === r.stratum, lit(r.fracThr24)).otherwise(acc)
    }
    val nEpochs = nFullCol + when(uniform24(idCol) < thrCol, 1).otherwise(0)
    val idxs = when(nEpochs === 0, typedLit(Seq.empty[Int]))
      .otherwise(sequence(lit(0), nEpochs - 1))
    df.select(idCol.as("id"), strataCol.as("stratum"), explode(idxs).as("epoch"))
      .select(col("id"), col("stratum"), col("epoch").cast("long").as("epoch"))
  }

  /** Water-filling budget allocation WITHOUT repetition — the other
    * half of mixture planning: [[temperatureMix]] repeats data to hit
    * target shares; this answers "how much can I actually take from
    * each source" when repetition is off the table. Given per-stratum
    * availability `a_i`, target weight `w_i`, and a total budget `B`,
    * allocate `min(a_i, λ·w_i)` with λ chosen so allocations sum to
    * B: strata that run dry are capped at their availability and
    * their unused share redistributes to the rest — the classic
    * water-filling solution, computed in closed form over the SORTED
    * (by `a_i/w_i`, the saturation order) strata frame.
    *
    * Exactness contract: saturation tests and the final proportional
    * shares are pure integer arithmetic
    * (`a_k · wSuffix ≤ (B − satPrefix) · w_k`, floor-DIV shares); the
    * one double is the SORT key `a_i/w_i` (one IEEE division, ties
    * broken by stratum), so the DuckDB oracle replays the whole plan
    * bit-for-bit. Saturation is prefix-closed in this order, so the
    * per-row window test is globally consistent (unsat at k forces
    * unsat at k+1 — the standard water-filling argument).
    *
    * 100 TB shape: runs on the per-stratum TOTALS frame (#strata
    * rows); the unpartitioned windows are bounded by construction.
    * Allocation floors may leave `B − Σalloc < #unsat strata` tokens
    * unassigned — reported, never silently re-spread.
    */
  def waterFill(
      totals: DataFrame,
      stratumCol: String,
      availCol: String,
      weightCol: String,
      budget: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // guard the ratio's domain: wgt=0 makes the avail/wgt sort key
    // Infinity (or NaN at 0/0) and the saturation/allocation integer
    // arithmetic then silently produces a wrong plan; negative avail
    // breaks the prefix-closure argument. #strata rows — bounded scan.
    // NULLs must trip the guard too: a NULL weight/avail slips a
    // bare <=/< predicate (NULL comparison is NULL, filtered out by
    // where) and then poisons the ratio sort key silently
    val nBad = totals
      .where(col(weightCol).cast("long") <= 0 || col(availCol).cast("long") < 0 ||
        col(weightCol).isNull || col(availCol).isNull)
      .limit(1).count()
    require(nBad == 0,
      s"waterFill: every $weightCol must be > 0 and every $availCol >= 0 " +
        "(non-null)")
    val wOrd = Window.orderBy(col("_mx_ratio"), col(stratumCol))
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    totals.select(
      col(stratumCol),
      col(availCol).cast("long").as("avail"),
      col(weightCol).cast("long").as("wgt"),
      budget.cast("long").as("_mx_b"))
      .withColumn("_mx_ratio", col("avail").cast("double") / col("wgt"))
      .withColumn("_mx_satprefix", coalesce(
        sum(col("avail")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("_mx_wsuffix",
        sum(col("wgt")).over(wOrd.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("saturated",
        col("avail") * col("_mx_wsuffix") <=
          (col("_mx_b") - col("_mx_satprefix")) * col("wgt"))
      .withColumn("_mx_sattotal",
        sum(when(col("saturated"), col("avail")).otherwise(0L)).over(wAll))
      .withColumn("_mx_wu",
        sum(when(!col("saturated"), col("wgt")).otherwise(0L)).over(wAll))
      .withColumn("allocated",
        when(col("saturated"), col("avail"))
          .otherwise(expr("wgt * (_mx_b - _mx_sattotal) DIV _mx_wu")))
      .select(col(stratumCol), col("wgt"), col("avail"),
        col("allocated"), col("saturated"))
  }

  /** Multi-epoch ANNEALED mixture schedule without data repetition —
    * the two-stage pretraining data-schedule shape (natural mix
    * early, upweighted rare/quality strata late, e.g. the
    * "mid-training" / decay-phase recipes): epoch `e`'s weights
    * interpolate linearly from `startWCol` to `endWCol` on the
    * integer lattice
    *
    *   w_e = startW · (E−1−e) + endW · e
    *
    * (unnormalized — [[waterFill]] only consumes weight RATIOS, and
    * the floor-DIV shares stay exactly replayable), each epoch
    * allocates `budgetPerEpoch` by water-filling, and allocations
    * CONSUME availability: epoch e+1 fills from what epochs ≤ e left
    * behind, so the schedule never re-plans data it already spent.
    *
    * Output: one row per (epoch, stratum) — the weight used, the
    * availability ENTERING the epoch, the allocation, and the
    * saturation flag.
    *
    * Exactness: pure integer interpolation + [[waterFill]]'s integer
    * saturation/floor-DIV arithmetic, so a SQL oracle replays the
    * whole E-step schedule bit-for-bit. Weights must be >= 1 at both
    * endpoints (zero would zero a whole epoch's weight lattice).
    *
    * 100 TB shape: a driver loop of E steps, each on the #strata
    * TOTALS frame (localCheckpoint'ed — E chained window plans would
    * otherwise nest); the corpus itself is never touched.
    */
  def annealSchedule(
      totals: DataFrame,
      stratumCol: String,
      availCol: String,
      startWCol: String,
      endWCol: String,
      epochs: Int,
      budgetPerEpoch: Column): DataFrame = {
    require(epochs >= 2, s"annealSchedule: need >= 2 epochs, got $epochs")
    val nBadW = totals
      .where(col(startWCol).cast("long") <= 0 || col(endWCol).cast("long") <= 0 ||
        col(startWCol).isNull || col(endWCol).isNull)
      .limit(1).count()
    require(nBadW == 0,
      s"annealSchedule: every $startWCol and $endWCol must be >= 1 (non-null)")
    var remaining = totals.select(
      col(stratumCol),
      col(availCol).cast("long").as("avail"),
      col(startWCol).cast("long").as("_mx_sw"),
      col(endWCol).cast("long").as("_mx_ew"),
      budgetPerEpoch.cast("long").as("_mx_bpe"))
      .localCheckpoint()
    val steps = (0 until epochs).map { e =>
      val stepIn = remaining.withColumn("_mx_we",
        col("_mx_sw") * lit((epochs - 1 - e).toLong) +
          col("_mx_ew") * lit(e.toLong))
      val alloc = waterFill(stepIn, stratumCol, "avail", "_mx_we",
        col("_mx_bpe"))
      val step = alloc
        .select(lit(e).as("epoch"), col(stratumCol), col("wgt"),
          col("avail"), col("allocated"), col("saturated"))
        .localCheckpoint()
      remaining = remaining
        .join(step.select(col(stratumCol), col("allocated")), Seq(stratumCol))
        .withColumn("avail", col("avail") - col("allocated"))
        .drop("allocated")
        .localCheckpoint()
      step
    }
    steps.reduce(_ unionByName _)
  }

  /** Anneal schedule with per-epoch QUALITY FLOORS — the threshold
    * sweep composed into the epoch windows: epoch `e` fills only from
    * rows clearing ITS quality floor, so a schedule can demand
    * high-quality data early (or late) while the budget water-fills
    * whatever clears. Caller supplies one row per (stratum, epoch)
    * with the epoch's weight and the stratum's CLEARED availability
    * (weight-total of rows at or above the epoch's floor); epoch `e`'s
    * effective availability is that cleared pool minus what epochs
    * < e already consumed from the stratum. Floors must RELAX (or
    * hold) over epochs — cleared pools non-decreasing per stratum —
    * so prior consumption always came from rows that also clear the
    * current floor; a tightening floor can drive availability
    * negative and trips [[waterFill]]'s guard loudly.
    *
    * Output: (epoch, stratum, wgt, avail, allocated, saturated) —
    * `avail` the effective availability ENTERING the epoch.
    *
    * Exactness: integer subtraction + [[waterFill]]'s integer
    * arithmetic — a SQL oracle replays the chain bit-for-bit.
    *
    * 100 TB shape: a driver loop of E steps on #strata-row frames
    * (localCheckpoint'ed); the corpus is touched once, by the caller,
    * to build the per-epoch cleared totals (one grouped aggregate
    * with one conditional sum per floor).
    */
  def annealScheduleGated(
      perEpoch: DataFrame,
      stratumCol: String,
      epochCol: String,
      availCol: String,
      weightCol: String,
      budgetPerEpoch: Column): DataFrame = {
    // the caller's per-epoch totals usually hang off a full corpus
    // aggregation; truncate it ONCE (#strata × E rows) or every epoch
    // step, guard count, and checkpoint below re-runs the corpus pass
    val perEp = perEpoch.localCheckpoint()
    val epochs = perEp.select(col(epochCol).cast("int")).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    require(epochs.nonEmpty && epochs.head == 0 &&
      epochs.last == epochs.length - 1,
      s"annealScheduleGated: epochs must be dense 0..E-1, got $epochs")
    var consumed = perEp.select(col(stratumCol)).distinct()
      .withColumn("_mx_consumed", lit(0L))
      .localCheckpoint()
    val steps = epochs.map { e =>
      val stepIn = perEp.where(col(epochCol) === e)
        .join(consumed, Seq(stratumCol))
        .select(col(stratumCol),
          (col(availCol).cast("long") - col("_mx_consumed")).as("avail"),
          col(weightCol).cast("long").as("_mx_we"),
          budgetPerEpoch.cast("long").as("_mx_bpe"))
      val step = waterFill(stepIn, stratumCol, "avail", "_mx_we",
        col("_mx_bpe"))
        .select(lit(e).as("epoch"), col(stratumCol), col("wgt"),
          col("avail"), col("allocated"), col("saturated"))
        .localCheckpoint()
      consumed = consumed
        .join(step.select(col(stratumCol), col("allocated")),
          Seq(stratumCol), "left")
        .withColumn("_mx_consumed",
          col("_mx_consumed") + coalesce(col("allocated"), lit(0L)))
        .drop("allocated")
        .localCheckpoint()
      step
    }
    steps.reduce(_ unionByName _)
  }

  /** Materialize an [[annealSchedule]] plan as per-row EPOCH
    * assignments: within each stratum, rows ordered by `orderCol`
    * fill epoch 0's allocation first, then epoch 1's, and so on — a
    * row lands in epoch `e` iff its inclusive running weight total
    * lies in (Σ_{e'<e} alloc, Σ_{e'<=e} alloc]. Rows past the
    * schedule's total allocation are dropped (the plan never spent
    * them). Output: the input columns + `epoch` + `cumCol`.
    *
    * 100 TB shape: ONE shuffle (the per-stratum cumsum window); the
    * epoch windows are a broadcast #strata × E frame, and each row
    * matches at most one window. The q189 apply composed with a
    * schedule instead of a single budget.
    */
  def annealAssign(
      df: DataFrame,
      schedule: DataFrame,
      stratumCol: String,
      orderCol: Column,
      weightCol: Column,
      cumCol: String = "cum_weight"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Budget.requireIntegralWeight(df, weightCol, "annealAssign")
    val wEp = Window.partitionBy(col(stratumCol)).orderBy(col("epoch"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val windows = schedule
      .select(col(stratumCol), col("epoch"), col("allocated"))
      .withColumn("_mx_hi", sum(col("allocated")).over(wEp))
      .withColumn("_mx_lo", col("_mx_hi") - col("allocated"))
      .where(col("allocated") > 0L)
      .select(col(stratumCol), col("epoch"), col("_mx_lo"), col("_mx_hi"))
    val wCum = Window.partitionBy(col(stratumCol)).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(cumCol,
        sum(coalesce(weightCol.cast("long"), lit(0L))).over(wCum))
      .join(broadcast(windows), Seq(stratumCol))
      .where(col(cumCol) > col("_mx_lo") && col(cumCol) <= col("_mx_hi"))
      .drop("_mx_lo", "_mx_hi")
  }
}
