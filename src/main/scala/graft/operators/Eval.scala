package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType}

/** Classifier-evaluation metrics over scored rows — the model-eval
  * face a training-data pipeline needs next to its ranking metrics
  * (ndcg/recall in [[graft.operators.Similarity]]): exact ROC-AUC,
  * reliability-diagram calibration bins, and threshold confusion
  * counts. The reference stops at reductions; these are extensions in
  * the same exact-arithmetic house style.
  *
  * Determinism recipe: scores quantize through the tie-free
  * `floor(x·scale + 0.5)` (two IEEE ops + floor — bit-identical on
  * every engine, the [[Behavior.cusum]] lesson), every count/sum is
  * exact integer/decimal, and each metric performs ONE final double
  * division of two exact integers — so AUC/precision/frac_pos replay
  * bit-for-bit in any engine at any partitioning.
  */
object Eval {

  private val D38 = DecimalType(38, 0)

  /** Exact ROC-AUC via the Mann–Whitney rank-sum with midrank tie
    * handling: with per-distinct-score counts `(cnt, np)` ordered by
    * score ascending and `r` = rows strictly below the group, each
    * positive in the group takes midrank `r + (cnt+1)/2`, so twice the
    * positive rank-sum is `S2 = Σ np·(2r + cnt + 1)` — integers end to
    * end — and `AUC = (S2 − P(P+1)) / (2PN)`. Ties-as-half-credit is
    * exactly the probabilistic definition
    * `P(s⁺ > s⁻) + ½P(s⁺ = s⁻)`.
    *
    * Output: one row `(n_pos, n_neg, auc)`; AUC is NULL when either
    * class is absent (undefined, not 0 — same contract as
    * [[Sketch.kmvOverlap]]'s empty-side Jaccard).
    *
    * Scale shape: one scan partial-aggregates to the DISTINCT
    * quantized-score frame (bounded by the score DOMAIN — centi
    * buckets — not the corpus, the `text_zipf` contract), one ordered
    * prefix-sum window over that bounded frame, one 1-row reduce.
    * Rank sums run in DECIMAL(38,0): S2 < 2n² overflows int64 past
    * ~2³¹ rows, and 128-bit decimal carries it to ~10¹⁸ rows.
    */
  def auc(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val per = df
      .select(floor(scoreCol.cast(DoubleType) * 100d + 0.5d).cast(LongType).as("_qs"),
        labelCol.cast("boolean").as("_y"))
      .groupBy(col("_qs"))
      .agg(count(lit(1)).as("_cnt"), sum(when(col("_y"), 1L).otherwise(0L)).as("_np"))
    // bounded window: one row per distinct centi score
    val w = Window.orderBy(col("_qs"))
      .rowsBetween(Window.unboundedPreceding, -1)
    per
      .withColumn("_r", coalesce(sum(col("_cnt")).over(w), lit(0L)))
      .agg(
        sum(col("_np")).as("_p"),
        sum(col("_cnt") - col("_np")).as("_n"),
        sum(col("_np").cast(D38) *
          (lit(2) * col("_r") + col("_cnt") + 1).cast(D38)).as("_s2"))
      .select(col("_p").as("n_pos"), col("_n").as("n_neg"),
        when(col("_p") > 0 && col("_n") > 0,
          (col("_s2") - col("_p").cast(D38) * (col("_p").cast(D38) + 1))
            .cast(DoubleType) /
            (lit(2).cast(D38) * col("_p").cast(D38) * col("_n").cast(D38))
              .cast(DoubleType))
          .as("auc"))
  }

  /** Precision–recall curve at EVERY distinct score threshold: one
    * point per distinct centi-quantized score (descending — predict
    * positive at `score ≥ threshold`), with exact cumulative tp/fp
    * from the top and single-division precision/recall. The natural
    * curve sibling of [[auc]], sharing its scale shape: the window
    * runs over the distinct-score DOMAIN frame, never the corpus.
    * Output: `(threshold_centi, tp, fp, precision, recall)`; rows
    * ordered by descending threshold so the curve reads left-to-right
    * in recall. P = 0 yields an empty recall denominator — NULL, the
    * undefined-not-zero contract.
    */
  def prCurve(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val per = df
      .select(floor(scoreCol.cast(DoubleType) * 100d + 0.5d).cast(LongType).as("_qs"),
        labelCol.cast("boolean").as("_y"))
      .groupBy(col("_qs"))
      .agg(count(lit(1)).as("_cnt"), sum(when(col("_y"), 1L).otherwise(0L)).as("_np"))
    val wDesc = Window.orderBy(col("_qs").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    per
      .withColumn("tp", sum(col("_np")).over(wDesc))
      .withColumn("fp", sum(col("_cnt") - col("_np")).over(wDesc))
      .withColumn("_p", sum(col("_np")).over(wAll))
      .select(col("_qs").as("threshold_centi"), col("tp"), col("fp"),
        (col("tp").cast(DoubleType) / (col("tp") + col("fp"))).as("precision"),
        when(col("_p") > 0, col("tp").cast(DoubleType) / col("_p")).as("recall"))
      .orderBy(col("threshold_centi").desc)
  }

  /** Kolmogorov–Smirnov statistic between the positive and negative
    * score distributions: `KS = max_t |TPR(t) − FPR(t)|`, computed
    * EXACTLY as `max |tp·N − fp·P| / (P·N)` over the distinct
    * centi-score thresholds — integer cross-products, one double
    * division at the end, argmax threshold reported with
    * smallest-threshold tie-break so the row is total-order
    * deterministic. Output: one row
    * `(n_pos, n_neg, ks_threshold_centi, ks)`; NULL ks on a
    * single-class input (undefined, not 0). Same scale shape as
    * [[auc]]: the ordered window runs over the score DOMAIN frame.
    */
  def ks(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val per = df
      .select(floor(scoreCol.cast(DoubleType) * 100d + 0.5d).cast(LongType).as("_qs"),
        labelCol.cast("boolean").as("_y"))
      .groupBy(col("_qs"))
      .agg(count(lit(1)).as("_cnt"), sum(when(col("_y"), 1L).otherwise(0L)).as("_np"))
    val wDesc = Window.orderBy(col("_qs").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    per
      .withColumn("_tp", sum(col("_np")).over(wDesc))
      .withColumn("_fp", sum(col("_cnt") - col("_np")).over(wDesc))
      .withColumn("_p", sum(col("_np")).over(wAll))
      .withColumn("_n", sum(col("_cnt") - col("_np")).over(wAll))
      .withColumn("_d", abs(col("_tp").cast(D38) * col("_n") -
        col("_fp").cast(D38) * col("_p")))
      // argmax with smallest-threshold ties via one packed max (the
      // labelPropagation recipe): d·10¹⁹ + (10¹⁹−1−qs), qs ≥ 0; the
      // max numerator itself rides a second plain max — no unpack
      // division anywhere
      .agg(max(col("_d")).as("_dmax"),
        max(col("_d") * lit(BigDecimal("10000000000000000000")).cast(D38) +
          (lit(BigDecimal("5000000000000000000")).cast(D38) - col("_qs").cast(D38)))
          .as("_pk"),
        first(col("_p")).as("n_pos"), first(col("_n")).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        (lit(BigDecimal("5000000000000000000")).cast(D38) -
          col("_pk") % lit(BigDecimal("10000000000000000000")).cast(D38))
          .cast(LongType).as("ks_threshold_centi"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          col("_dmax").cast(DoubleType) /
            (col("n_pos").cast(D38) * col("n_neg").cast(D38)).cast(DoubleType))
          .as("ks"))
  }

  /** Expected calibration error with an EXACT integer numerator: with
    * milli-quantized probabilities and `bins` integer-assigned buckets
    * (as [[calibration]]), per-bin `|observed − predicted|` mass is
    * `|1000·pos_b − Σqp_b|`, so
    * `ECE = Σ_b |1000·pos_b − Σqp_b| / (1000·n)` — one integer sum,
    * one double division. Output: one row `(n, ece_num, ece)`.
    */
  def calibrationError(df: DataFrame, probCol: Column, labelCol: Column,
                       bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"calibrationError: bins in [2,1000], got $bins")
    df
      .select(floor(probCol.cast(DoubleType) * 1000d + 0.5d).cast(LongType).as("_qp"),
        labelCol.cast("boolean").as("_y"))
      .select(least(expr(s"_qp * $bins div 1000"), lit(bins - 1L)).as("_b"),
        col("_qp"), col("_y"))
      .groupBy(col("_b"))
      .agg(count(lit(1)).as("_n"), sum(col("_qp")).as("_sq"),
        sum(when(col("_y"), 1L).otherwise(0L)).as("_pos"))
      .agg(sum(col("_n")).as("n"),
        sum(abs(lit(1000) * col("_pos") - col("_sq"))).as("ece_num"))
      .select(col("n"), col("ece_num"),
        (col("ece_num").cast(DoubleType) / (col("n") * 1000)).as("ece"))
  }

  /** Brier score (mean squared probability error) with an exact
    * integer numerator: milli-quantized probabilities give
    * `Σ (qp − 1000·y)²` as one int sum (DECIMAL(38,0) — n·10⁶ per
    * term), `brier = num / (10⁶·n)` in one double division. The
    * calibration family's third leg beside [[calibration]] and
    * [[calibrationError]]. Output: one row `(n, brier_num, brier)`.
    * Scale shape: one scan, one 1-row aggregate.
    */
  def brier(df: DataFrame, probCol: Column, labelCol: Column): DataFrame = {
    val e = floor(probCol.cast(DoubleType) * 1000d + 0.5d).cast(LongType) -
      when(labelCol.cast("boolean"), 1000L).otherwise(0L)
    df.select((e * e).cast(D38).as("_e2"))
      .agg(count(lit(1)).as("n"), sum(col("_e2")).as("brier_num"))
      .select(col("n"), col("brier_num").cast(LongType).as("brier_num"),
        (col("brier_num").cast(DoubleType) / (col("n") * 1000000L)).as("brier"))
  }

  /** Quantized binary cross-entropy (log loss) — engine-exact via the
    * shared-integer-weight-table rule (the `ndcgWeights` /
    * `profile_benford` pattern): probabilities quantize to milli and
    * clamp into [1, 999] (the standard epsilon-clip), and
    * `⌊−log2(i/1000)·2^20⌋` lives in a 999-entry table embedded
    * identically in operator and oracle — no per-engine libm call
    * anywhere. Output: one row `(n, logloss_q)` where `logloss_q` is
    * the total quantized loss in 2^-20 log2-units (divide by n·2^20
    * for mean bits; exact integer, so hash-comparable).
    *
    * Scale shape: one scan, one 1-row aggregate; the 999-long table
    * rides the plan as a literal array.
    */
  def logLoss(df: DataFrame, probCol: Column, labelCol: Column): DataFrame = {
    val table = logLossWeights
    val tableCol = array(table.map(lit): _*)
    val qp = least(greatest(
      floor(probCol.cast(DoubleType) * 1000d + 0.5d).cast(LongType), lit(1L)), lit(999L))
    val idx = when(labelCol.cast("boolean"), qp).otherwise(lit(1000L) - qp)
    df.select(element_at(tableCol, idx.cast("int")).as("_w"))
      .agg(count(lit(1)).as("n"), sum(col("_w")).as("logloss_q"))
  }

  /** `w[i] = ⌊−log2(i/1000)·2^20⌋` for i = 1..999 — the spec constant
    * both engines share verbatim. */
  lazy val logLossWeights: IndexedSeq[Long] =
    (1 to 999).map(i =>
      math.floor(-math.log(i / 1000.0) / math.log(2.0) * (1L << 20)).toLong)

  /** Reliability-diagram calibration bins for a probability column:
    * probabilities quantize to milli (`floor(p·1000 + 0.5)`), bin
    * assignment is pure integer division `min(qp·bins div 1000,
    * bins−1)` (no float boundary ambiguity), and each bin reports its
    * count, exact mean predicted probability and observed positive
    * rate. Empty bins are absent (join against `range(bins)` to
    * densify if needed). Output: `(bin, n, mean_prob, frac_pos)`.
    *
    * Scale shape: one scan, one `bins`-bounded aggregate — no window,
    * no second pass.
    */
  def calibration(df: DataFrame, probCol: Column, labelCol: Column,
                  bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"calibration: bins in [2,1000], got $bins")
    df
      .select(floor(probCol.cast(DoubleType) * 1000d + 0.5d).cast(LongType).as("_qp"),
        labelCol.cast("boolean").as("_y"))
      .select(least(expr(s"_qp * $bins div 1000"), lit(bins - 1L)).as("bin"),
        col("_qp"), col("_y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        (sum(col("_qp")).cast(DoubleType) / (count(lit(1)) * 1000)).as("mean_prob"),
        (sum(when(col("_y"), 1L).otherwise(0L)).cast(DoubleType) / count(lit(1)))
          .as("frac_pos"))
      .orderBy("bin")
  }

  /** Threshold confusion counts with exact derived rates: predictions
    * are `centi(score) ≥ thresholdCenti` (quantized compare — no
    * float boundary), and precision/recall/F1 are single double
    * divisions of exact counts (NULL when the denominator is 0, the
    * undefined-not-zero contract). Output: one row
    * `(tp, fp, fn, tn, precision, recall, f1)`.
    *
    * Scale shape: one scan, one 1-row aggregate — entirely map-side
    * until the final combine.
    */
  def confusion(df: DataFrame, scoreCol: Column, labelCol: Column,
                thresholdCenti: Long): DataFrame = {
    val pred = floor(scoreCol.cast(DoubleType) * 100d + 0.5d)
      .cast(LongType) >= thresholdCenti
    val y = labelCol.cast("boolean")
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    df.agg(
        cnt(pred && y).as("tp"), cnt(pred && !y).as("fp"),
        cnt(!pred && y).as("fn"), cnt(!pred && !y).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") > 0,
          col("tp").cast(DoubleType) / (col("tp") + col("fp"))).as("precision"),
        when(col("tp") + col("fn") > 0,
          col("tp").cast(DoubleType) / (col("tp") + col("fn"))).as("recall"),
        when(lit(2) * col("tp") + col("fp") + col("fn") > 0,
          (lit(2) * col("tp")).cast(DoubleType) /
            (lit(2) * col("tp") + col("fp") + col("fn"))).as("f1"))
  }

  /** `floor(CDF_Poisson(1)(j) · 2²⁸)` for j = 0..6 — the inverse-CDF
    * threshold table for DETERMINISTIC Poisson(1) bootstrap weights.
    * Like the logLoss table, the constants are baked identically into
    * operator and oracle so no engine calls libm at runtime; a weight
    * is just how many thresholds a 28-bit row hash clears (capped at 7
    * — P(X>7) ≈ 1.02e-5, a documented truncation of the tail).
    */
  private[graft] val PoissonCdf28: Seq[Long] = Seq(
    98751885L, 197503771L, 246879713L, 263338361L,
    267453023L, 268275955L, 268413111L)

  /** Percentile-bootstrap confidence interval for the Brier score —
    * the error-bar face of [[brier]]. Classical bootstrap resampling
    * is RNG-driven and unreproducible across engines; this uses the
    * POISSON bootstrap (each row enters replica b with multiplicity
    * ~ Poisson(1) — the resampling scheme that needs no global n and
    * therefore distributes): the multiplicity is the number of
    * [[PoissonCdf28]] thresholds cleared by the 28-bit md5 hash of
    * `(row id, replica)`, so every weight — and hence the whole CI —
    * is a pure function of the data, bit-identical in the oracle.
    *
    * Output: one row `(n, brier, ci_lo, ci_hi)` — the full-sample
    * point estimate (same arithmetic as [[brier]]) and the percentile
    * band over `reps` replica means, rank `⌊(reps−1)·25/1000⌋ + 1`
    * from each end (2.5%/97.5%; at reps ≤ 40 that is the min/max —
    * a conservative band, use more replicas for tighter quantiles).
    * Replicas where every weight is 0 contribute no mean (NULL-safe:
    * they are dropped from the band, which can only widen it).
    *
    * Scale shape: one scan exploded ×reps feeding ONE map-side
    * combined aggregate (reps output rows); replica sums are exact
    * DECIMAL(38,0) (order-free at any partitioning); the band is a
    * `sort_array` over the reps-length array — no window, no second
    * scan of the data. Cost is reps× the [[brier]] scan; at 100 TB
    * run it on the eval slice, not the corpus.
    *
    * `idCol` must be UNIQUE per row — duplicate ids would give those
    * rows identical (fully correlated) resample weights, silently
    * narrowing the band. Same contract for [[aucBootstrapCi]].
    */
  def brierBootstrapCi(df: DataFrame, probCol: Column, labelCol: Column,
                       idCol: Column, reps: Int = 32): DataFrame = {
    require(reps >= 8 && reps <= 1024, s"brierBootstrapCi: reps=$reps (8..1024)")
    val e = floor(probCol.cast(DoubleType) * 1000d + 0.5d).cast(LongType) -
      when(labelCol.cast("boolean"), 1000L).otherwise(0L)
    val base = df.select(idCol.cast(StringType).as("_id"), (e * e).as("_e2"))
    val u = graft.plans.HashBucket(
      concat(col("_id"), lit("_"), col("_b").cast(StringType)), 1 << 28)
    val w = PoissonCdf28.map(t => when(u >= t, 1L).otherwise(0L))
      .reduce(_ + _)
    val rep = base
      .select(col("_id"), col("_e2"), explode(sequence(lit(0), lit(reps - 1))).as("_b"))
      .select(col("_e2"), col("_b"), w.as("_w"))
      .groupBy(col("_b"))
      .agg(sum(col("_w").cast(D38)).as("_nb"),
        sum((col("_w") * col("_e2")).cast(D38)).as("_numb"))
      .filter(col("_nb") > 0)
      // decimal → double DIRECTLY (the aucBootstrapCi rule): a long
      // intermediate would overflow to NULL silently past ~1.3e12 rows
      // under non-ANSI casts, against the loud-failure convention
      .select((col("_numb").cast(DoubleType) /
        (col("_nb").cast(DoubleType) * lit(1000000d))).as("_m"))
    val rLo = (reps - 1) * 25 / 1000 + 1
    val band = rep.agg(sort_array(collect_list(col("_m"))).as("_ms"))
      .select(try_element_at(col("_ms"), lit(rLo)).as("ci_lo"),
        try_element_at(col("_ms"), lit(-rLo)).as("ci_hi"))
    base.agg(count(lit(1)).as("n"), sum(col("_e2").cast(D38)).as("_num"))
      .select(col("n"),
        // double multiply, not n*1000000L: bit-identical below 2^53 and
        // immune to the int64 overflow past ~9.2e12 rows
        (col("_num").cast(DoubleType) /
          (col("n").cast(DoubleType) * lit(1000000d))).as("brier"))
      .crossJoin(band)
  }

  /** Percentile-bootstrap confidence interval for the exact ROC-AUC —
    * the same deterministic Poisson-bootstrap machinery as
    * [[brierBootstrapCi]] (per-(row, replica) multiplicities from the
    * [[PoissonCdf28]] threshold table, RNG-free and engine-exact)
    * applied to [[auc]]'s midrank rank-sum: within each replica the
    * per-distinct-score counts are WEIGHTED counts `(Σw, Σw·y)`, and
    * the weighted `S2 = Σ np·(2r + cnt + 1)` over the score-ascending
    * prefix sum is exactly the AUC of the resampled multiset. Replicas
    * missing a class drop from the band (undefined-not-zero, the
    * [[auc]] contract). Output: one row
    * `(n_pos, n_neg, auc, ci_lo, ci_hi)` — the point estimate is
    * bit-identical to [[auc]]'s.
    *
    * Scale shape: the explode ×reps lands on the DISTINCT-score frame
    * via one map-side-combined aggregate (reps × score-domain rows —
    * centi buckets, bounded); the prefix window partitions BY REPLICA
    * over that bounded frame (reps parallel bounded windows, never the
    * corpus); rank sums in DECIMAL(38,0).
    */
  def aucBootstrapCi(df: DataFrame, scoreCol: Column, labelCol: Column,
                     idCol: Column, reps: Int = 32): DataFrame = {
    require(reps >= 8 && reps <= 1024, s"aucBootstrapCi: reps=$reps (8..1024)")
    val base = df.select(idCol.cast(StringType).as("_id"),
      floor(scoreCol.cast(DoubleType) * 100d + 0.5d).cast(LongType).as("_qs"),
      labelCol.cast("boolean").as("_y"))
    val u = graft.plans.HashBucket(
      concat(col("_id"), lit("_"), col("_b").cast(StringType)), 1 << 28)
    val w = PoissonCdf28.map(t => when(u >= t, 1L).otherwise(0L))
      .reduce(_ + _)
    val win = Window.partitionBy(col("_b")).orderBy(col("_qs"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val rep = base
      .select(col("_id"), col("_qs"), col("_y"),
        explode(sequence(lit(0), lit(reps - 1))).as("_b"))
      .select(col("_qs"), col("_y"), col("_b"), w.as("_w"))
      .groupBy(col("_b"), col("_qs"))
      .agg(sum(col("_w")).as("_cnt"),
        sum(when(col("_y"), col("_w")).otherwise(0L)).as("_np"))
      .withColumn("_r", coalesce(sum(col("_cnt")).over(win), lit(0L)))
      .groupBy(col("_b"))
      .agg(sum(col("_np")).as("_p"),
        sum(col("_cnt") - col("_np")).as("_n"),
        sum(col("_np").cast(D38) *
          (lit(2) * col("_r") + col("_cnt") + 1).cast(D38)).as("_s2"))
      .filter(col("_p") > 0 && col("_n") > 0)
      .select(((col("_s2") - col("_p").cast(D38) * (col("_p").cast(D38) + 1))
        .cast(DoubleType) /
        (lit(2).cast(D38) * col("_p").cast(D38) * col("_n").cast(D38))
          .cast(DoubleType)).as("_m"))
    val rLo = (reps - 1) * 25 / 1000 + 1
    val band = rep.agg(sort_array(collect_list(col("_m"))).as("_ms"))
      .select(try_element_at(col("_ms"), lit(rLo)).as("ci_lo"),
        try_element_at(col("_ms"), lit(-rLo)).as("ci_hi"))
    auc(df, scoreCol, labelCol).crossJoin(band)
  }

  /** Cohen's kappa (Cohen 1960, "A coefficient of agreement for
    * nominal scales"): chance-corrected agreement between two
    * categorical ratings of the same items — the standard
    * inter-annotator agreement number for label quality audits, and
    * (with rating A = a classifier's prediction, rating B = the truth)
    * the chance-corrected cousin of plain accuracy. With n items,
    * `agree = Σ_items [a = b]`, and per-category marginals `r_k`
    * (rating A) and `c_k` (rating B):
    *
    *   κ = (n·agree − Σ_k r_k·c_k) / (n² − Σ_k r_k·c_k)
    *
    * — the cross-multiplied form of `(p_o − p_e)/(1 − p_e)`, exact
    * DECIMAL(38,0) end to end with ONE final IEEE division (plus the
    * two observed/expected-rate divisions reported alongside), so the
    * statistic replays bit-identically in any engine. κ is NULL when
    * both raters are constant (p_e = 1, the undefined case —
    * NULL-not-zero, the [[auc]] contract). NULL ratings participate as
    * a category of their own is NOT the convention here: rows where
    * either rating is NULL are excluded (agreement on missingness is
    * not agreement), and `n` reports the rows actually compared.
    *
    * Output: one row `(n, agree, po, pe, kappa)`.
    *
    * Scale shape: one scan partial-aggregates to the contingency-cell
    * frame (bounded by the category-domain product, not the corpus);
    * marginals and the Σ r_k·c_k join re-aggregate that bounded frame;
    * one row out, nothing collected. */
  def cohensKappa(df: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    val cells = df
      .select(raterA.cast(StringType).as("_a"), raterB.cast(StringType).as("_b"))
      .filter(col("_a").isNotNull && col("_b").isNotNull)
      .groupBy(col("_a"), col("_b")).agg(count(lit(1)).as("_c"))
    val tot = cells.agg(sum(col("_c")).as("n"),
      coalesce(sum(when(col("_a") === col("_b"), col("_c"))), lit(0L)).as("agree"))
    val rk = cells.groupBy(col("_a").as("_k")).agg(sum(col("_c")).as("_r"))
    val ck = cells.groupBy(col("_b").as("_k")).agg(sum(col("_c")).as("_cc"))
    val pe = rk.join(ck, Seq("_k"))
      .agg(coalesce(sum(col("_r").cast(D38) * col("_cc").cast(D38)),
        lit(0).cast(D38)).as("_pe"))
    tot.crossJoin(pe)
      .select(col("n"), col("agree"),
        (col("agree").cast(DoubleType) / col("n").cast(DoubleType)).as("po"),
        (col("_pe").cast(DoubleType) /
          (col("n").cast(D38) * col("n").cast(D38)).cast(DoubleType)).as("pe"),
        when(col("n").cast(D38) * col("n").cast(D38) =!= col("_pe"),
          (col("n").cast(D38) * col("agree").cast(D38) - col("_pe"))
            .cast(DoubleType) /
            (col("n").cast(D38) * col("n").cast(D38) - col("_pe"))
              .cast(DoubleType)).as("kappa"))
  }

  /** A/B conversion lift with a percentile-bootstrap confidence band —
    * the experimentation readout (treatment conversion over control,
    * "does the band clear 1?") built on the SAME deterministic Poisson
    * bootstrap as [[brierBootstrapCi]]: per-(row, replica)
    * multiplicities from the baked [[PoissonCdf28]] inverse-CDF
    * thresholds and the md5-28-bit hash of (id, replica) — RNG-free
    * and libm-free, a pure function of the data, so the whole CI
    * replays bit-identically in any engine. Within each replica the
    * lift is the fixed tree `(ΣwB·y/ΣwB) / (ΣwA·y/ΣwA)`; replicas
    * where either arm is empty or the CONTROL never converts drop from
    * the band (lift undefined there — undefined-not-zero, the [[auc]]
    * contract), and the point estimate applies the same rule to the
    * raw counts. `idCol` must be unique per row, and rows should be
    * the assignment unit (pre-aggregate to users first when users are
    * the unit — resampling events of one user independently would
    * understate the variance).
    *
    * Output: one row
    * `(n_a, n_b, conv_a, conv_b, lift, ci_lo, ci_hi)` — arm A =
    * control (`variantCol` false), arm B = treatment.
    *
    * Scale shape: one scan exploded ×reps into ONE map-side-combined
    * aggregate (reps output rows, 4 sums each); the band is a
    * `sort_array` over the reps-length array — no window, no second
    * data scan. */
  def liftBootstrapCi(df: DataFrame, variantCol: Column, convCol: Column,
                      idCol: Column, reps: Int = 32): DataFrame = {
    require(reps >= 8 && reps <= 1024, s"liftBootstrapCi: reps=$reps (8..1024)")
    val base = df.select(idCol.cast(StringType).as("_id"),
      variantCol.cast("boolean").as("_t"),
      when(convCol.cast("boolean"), 1L).otherwise(0L).as("_y"))
    val u = graft.plans.HashBucket(
      concat(col("_id"), lit("_"), col("_b").cast(StringType)), 1 << 28)
    val w = PoissonCdf28.map(t => when(u >= t, 1L).otherwise(0L))
      .reduce(_ + _)
    val rep = base
      .select(col("_id"), col("_t"), col("_y"),
        explode(sequence(lit(0), lit(reps - 1))).as("_b"))
      .select(col("_t"), col("_y"), col("_b"), w.as("_w"))
      .groupBy(col("_b"))
      .agg(sum(when(!col("_t"), col("_w")).otherwise(0L)).as("_na"),
        sum(when(!col("_t"), col("_w") * col("_y")).otherwise(0L)).as("_ca"),
        sum(when(col("_t"), col("_w")).otherwise(0L)).as("_nb"),
        sum(when(col("_t"), col("_w") * col("_y")).otherwise(0L)).as("_cb"))
      .filter(col("_na") > 0 && col("_nb") > 0 && col("_ca") > 0)
      .select(((col("_cb").cast(DoubleType) / col("_nb").cast(DoubleType)) /
        (col("_ca").cast(DoubleType) / col("_na").cast(DoubleType))).as("_m"))
    val rLo = (reps - 1) * 25 / 1000 + 1
    val band = rep.agg(sort_array(collect_list(col("_m"))).as("_ms"))
      .select(try_element_at(col("_ms"), lit(rLo)).as("ci_lo"),
        try_element_at(col("_ms"), lit(-rLo)).as("ci_hi"))
    base.agg(
        sum(when(!col("_t"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("_t"), col("_y")).otherwise(0L)).as("_sa"),
        sum(when(col("_t"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("_t"), col("_y")).otherwise(0L)).as("_sb"))
      .select(col("n_a"), col("n_b"),
        when(col("n_a") > 0,
          col("_sa").cast(DoubleType) / col("n_a").cast(DoubleType)).as("conv_a"),
        when(col("n_b") > 0,
          col("_sb").cast(DoubleType) / col("n_b").cast(DoubleType)).as("conv_b"),
        when(col("n_a") > 0 && col("n_b") > 0 && col("_sa") > 0,
          (col("_sb").cast(DoubleType) / col("n_b").cast(DoubleType)) /
            (col("_sa").cast(DoubleType) / col("n_a").cast(DoubleType)))
          .as("lift"))
      .crossJoin(band)
  }

  /** Matthews correlation coefficient at a centi threshold (Matthews
    * 1975) — the chance-corrected single number for IMBALANCED binary
    * classification, where accuracy and even F1 mislead (F1 ignores
    * true negatives entirely; MCC only saturates when all four
    * confusion cells are right). Completes [[confusion]]'s rate block
    * and [[cohensKappa]]'s agreement view:
    *
    *   MCC = (tp·tn − fp·fn) / √((tp+fp)(tp+fn)(tn+fp)(tn+fn))
    *
    * Counts are exact int64, the products DECIMAL(38,0) (each factor
    * ≤ n, the radicand ≤ n⁴ < 10^38 documented bound at n ≤ 3·10⁹ —
    * cast each factor to double BEFORE the product past that), and the
    * result is one fixed multiply/sqrt/divide double tree — engine-
    * exact. NULL when any marginal is empty (a constant predictor or
    * constant truth — undefined, the [[auc]] contract). Output: one
    * row `(tp, fp, fn, tn, mcc)`.
    *
    * Scale shape: ONE conditional aggregate over the scan, one row
    * out. */
  def mcc(df: DataFrame, scoreCol: Column, labelCol: Column,
          thresholdCenti: Long): DataFrame = {
    val pred = floor(scoreCol.cast(DoubleType) * 100d + 0.5d)
      .cast(LongType) >= thresholdCenti
    val y = labelCol.cast("boolean")
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    df.agg(cnt(pred && y).as("tp"), cnt(pred && !y).as("fp"),
        cnt(!pred && y).as("fn"), cnt(!pred && !y).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        when((col("tp") + col("fp")) > 0 && (col("tp") + col("fn")) > 0 &&
          (col("tn") + col("fp")) > 0 && (col("tn") + col("fn")) > 0,
          (col("tp").cast(D38) * col("tn").cast(D38) -
            col("fp").cast(D38) * col("fn").cast(D38)).cast(DoubleType) /
            sqrt(((col("tp") + col("fp")).cast(D38) *
              (col("tp") + col("fn")).cast(D38) *
              (col("tn") + col("fp")).cast(D38) *
              (col("tn") + col("fn")).cast(D38)).cast(DoubleType)))
          .as("mcc"))
  }

  /** Split-conformal prediction interval + coverage audit (Vovk et
    * al.; Lei et al. 2018 "Distribution-Free Predictive Inference for
    * Regression"): on the CALIBRATION slice take
    * `q̂ = the ⌈(n_cal+1)·(1−α)⌉-th smallest |prediction − actual|`,
    * then `prediction ± q̂` covers a fresh exchangeable point with
    * probability ≥ 1−α — distribution-free. The TEST slice reports the
    * realized coverage, the number a model-monitoring pipeline alarms
    * on. Caller supplies the calibration indicator column (the gate
    * uses the md5-bucket split; any leakage-safe split works —
    * [[graft.operators.Sampling#splitByCluster]] for near-dup data).
    *
    * Determinism: residuals quantize through the tie-free
    * `floor(x·100 + 0.5)` centi grid, the rank is pure integer
    * arithmetic, q̂ selection is a min over the value-counting frame,
    * and coverage is ONE division of exact counts — engine-exact. When
    * `⌈(n_cal+1)(1−α)⌉ > n_cal` (too few calibration rows for the
    * level) q̂ is the +∞ case and is reported as NULL with NULL
    * coverage — undefined-not-zero, the [[auc]] contract.
    *
    * Output: one row `(n_cal, n_test, qhat_c, coverage)` — qhat_c in
    * centi units.
    *
    * Scale shape: one scan partial-aggregates calibration residuals to
    * the DISTINCT centi-residual frame (value-domain-bounded, the
    * [[auc]] contract); one bounded prefix window picks q̂; the test
    * pass is one conditional aggregate against the broadcast q̂. */
  def splitConformal(df: DataFrame, predCol: Column, actualCol: Column,
                     calibCol: Column, alphaNum: Long, alphaDen: Long): DataFrame = {
    require(0 < alphaNum && alphaNum < alphaDen,
      s"splitConformal: need 0 < alpha < 1, got $alphaNum/$alphaDen")
    val r = abs(floor(predCol.cast(DoubleType) * 100d + 0.5d).cast(LongType) -
      floor(actualCol.cast(DoubleType) * 100d + 0.5d).cast(LongType))
    val base = df.select(r.as("_r"), calibCol.cast("boolean").as("_cal"))
    val cal = base.filter(col("_cal"))
    val nCal = cal.agg(count(lit(1)).as("n_cal"))
    // rank = ⌈(n_cal+1)·(aDen−aNum)/aDen⌉, pure integer ceil division
    // (exact double round-trip below 2^53)
    val rank = floor(((col("n_cal") + 1) * lit(alphaDen - alphaNum) +
      lit(alphaDen - 1)).cast(DoubleType) / lit(alphaDen.toDouble)).cast(LongType)
    val wv = Window.orderBy(col("_r"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val qhat = cal.groupBy(col("_r")).agg(count(lit(1)).as("_c"))
      .withColumn("_cum", sum(col("_c")).over(wv))
      .crossJoin(broadcast(nCal.select(rank.as("_rank"))))
      .filter(col("_cum") >= col("_rank"))
      .agg(min(col("_r")).as("qhat_c"))
    val test = base.filter(!col("_cal"))
      .crossJoin(broadcast(qhat))
      .agg(count(lit(1)).as("n_test"),
        // NULL-through on undefined q̂; otherwise a zero-coverage test
        // slice must read 0.0, not NULL
        sum(when(col("qhat_c").isNotNull,
          when(col("_r") <= col("qhat_c"), 1L).otherwise(0L))).as("_cov"))
    // qhat_c is carried from the calibration-side frame, NOT through
    // the test aggregate: q̂ is well-defined whenever calibration has
    // enough rows, even when the test slice is empty (n_test = 0 →
    // coverage NULL, qhat_c still reported)
    nCal.crossJoin(broadcast(qhat)).crossJoin(test)
      .select(col("n_cal"), col("n_test"), col("qhat_c"),
        (col("_cov").cast(DoubleType) / col("n_test").cast(DoubleType))
          .as("coverage"))
  }

  /** Per-cluster Davies–Bouldin worst-ratio (Davies & Bouldin 1979):
    * with scatter `S_i` = mean member distance to the own centroid and
    * `M_ij` = centroid separation, each cluster's
    * `R_i = max_{j≠i} (S_i + S_j)/M_ij` names its most-confusable
    * neighbor load — the DB index is the mean of this column, and the
    * per-cluster rows say WHICH clusters blur together (the actionable
    * face). Same determinism recipe as [[clusterSilhouette]]: quantized
    * integer centroids, per-row distances through a fixed
    * sqrt·2^20-floor tree into int64, scatter = floor(mean) over those
    * quantized units, centroid separations exact int64 squared
    * distances — every ratio is one division of engine-exact inputs.
    * Duplicate centroids (M_ij = 0, ratio undefined) drop from the max
    * rather than poisoning it with ∞; a cluster whose every peer
    * duplicates it reports NULL.
    *
    * Output: `(cluster, n, scatter_q, r_worst)` per cluster
    * (scatter_q in 2^-20 distance units). Lower r_worst = tighter,
    * better-separated cluster.
    *
    * Scale shape: one corpus scan with a k-row broadcast join for the
    * own-centroid distance, one per-cluster mean aggregate, then ALL
    * remaining work is on k-row frames (k² pair ratios) — corpus-size-
    * independent past the scatter pass. */
  def daviesBouldin(emb: DataFrame, clusterCol: String, dim: Int = 64,
                    vecCol: String = "embedding",
                    idCol: String = "vec_id"): DataFrame = {
    val S = 1L << 20
    val qv = transform(col(vecCol), x => floor(x.cast(DoubleType) * S).cast(LongType))
    val base = emb.select(col(clusterCol).cast(LongType).as("cluster"), qv.as("_qv"))
    val cents = base.groupBy(col("cluster"))
      .agg(array((0 until dim).map(i =>
        floor(sum(element_at(col("_qv"), i + 1)).cast(DoubleType) / count(lit(1)))
          .cast(LongType)): _*).as("_cv"))
    val sq = (a: Column, b: Column) => aggregate(
      zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)
    val dd = base.join(broadcast(cents), "cluster")
      .select(col("cluster"),
        floor(sqrt(sq(col("_qv"), col("_cv")).cast(DoubleType)) * lit(S.toDouble))
          .cast(LongType).as("_dq"))
    val scatter = dd.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        floor(sum(col("_dq").cast(D38)).cast(DoubleType) / count(lit(1)))
          .cast(LongType).as("scatter_q"))
    val f = scatter.join(cents, "cluster")
    val a = f.select(col("cluster"), col("n"), col("scatter_q"), col("_cv"))
    val b = f.select(col("cluster").as("_clb"), col("scatter_q").as("_sqb"),
      col("_cv").as("_cvb"))
    a.join(b, col("cluster") =!= col("_clb"))
      .select(col("cluster"), col("n"), col("scatter_q"),
        sq(col("_cv"), col("_cvb")).as("_m2"), col("_sqb"))
      // guard INSIDE the ratio: ANSI mode makes the m2 = 0 division a
      // hard error, not an inf the max could have ignored
      .select(col("cluster"), col("n"), col("scatter_q"),
        when(col("_m2") > 0,
          (col("scatter_q") + col("_sqb")).cast(DoubleType) /
            (lit(S.toDouble) * sqrt(col("_m2").cast(DoubleType)))).as("_ratio"))
      .groupBy(col("cluster"), col("n"), col("scatter_q"))
      .agg(max(col("_ratio")).as("r_worst"))
  }

  /** Per-cluster SIMPLIFIED silhouette (Rousseeuw 1987 via the
    * centroid approximation of Hruschka et al. 2004): for each vector,
    * `a` = distance to its OWN cluster centroid, `b` = distance to the
    * NEAREST OTHER centroid, `s = (b − a) / max(a, b)` (0 when both
    * are 0) — the O(n·k) cluster-quality score that replaces the exact
    * silhouette's O(n²) pairwise pass, the only form that survives a
    * 100 TB corpus. Centroids are the integer-quantized per-cluster
    * means (floor(Σ floor(x·2^20)/n) per dimension — the
    * [[graft.operators.Similarity#kmeansTrain]] update rule), squared
    * distances are exact int64 over those grids, and each `s` is a
    * fixed tree of correctly-rounded double ops (two sqrt — IEEE
    * correctly-rounded — one subtraction, one division), quantized to
    * `floor(s·2^20)` before the per-cluster mean so the aggregate is
    * order-free: every engine replays the result bit-identically.
    *
    * Output: `(cluster, n, mean_silhouette)` per cluster —
    * mean_silhouette ≈ +1 compact/separated, ≈ 0 on cluster borders,
    * < 0 misassigned.
    *
    * Scale shape: one cluster-sized centroid aggregate COLLECTED as
    * the fitted model (k·dim longs — the config-sized-model rule,
    * same as [[Sampling.temperatureSample]]'s group stats), then ONE
    * shuffle-free scan: own-centroid lookup and the min over other
    * centroids are per-row HOF folds over the k-entry literal, and the
    * per-cluster mean is one map-side-combined aggregate. Fails fast
    * when fewer than 2 clusters exist (b is undefined). */
  def clusterSilhouette(emb: DataFrame, clusterCol: String, dim: Int = 64,
                        vecCol: String = "embedding",
                        idCol: String = "vec_id"): DataFrame = {
    val S = 1L << 20
    val qv = transform(col(vecCol), x => floor(x.cast(DoubleType) * S).cast(LongType))
    val base = emb.select(col(idCol),
      col(clusterCol).cast(LongType).as("cluster"), qv.as("_qv"))
    val centRows = base.groupBy(col("cluster"))
      .agg(array((0 until dim).map(i =>
        floor(sum(element_at(col("_qv"), i + 1)).cast(DoubleType) / count(lit(1)))
          .cast(LongType)): _*).as("_cv"))
      .collect()
    require(centRows.length >= 2,
      s"clusterSilhouette: needs >= 2 clusters, got ${centRows.length} " +
        "(the nearest-other-centroid term is undefined)")
    val centsLit = array(centRows.sortBy(_.getLong(0)).map { r =>
      struct(lit(r.getLong(0)).as("cl"),
        array(r.getSeq[Long](1).map(lit): _*).as("cv"))
    }: _*)
    val sq = (cv: Column) => aggregate(
      zip_with(col("_qv"), cv, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)
    val withD = base.select(col("cluster"),
      sq(element_at(filter(centsLit, s => s.getField("cl") === col("cluster")), 1)
        .getField("cv")).as("_a2"),
      array_min(transform(filter(centsLit, s => s.getField("cl") =!= col("cluster")),
        s => sq(s.getField("cv")))).as("_b2"))
    val sil = withD.select(col("cluster"),
      when(greatest(sqrt(col("_a2").cast(DoubleType)), sqrt(col("_b2").cast(DoubleType))) === 0d,
        lit(0.0d))
        .otherwise((sqrt(col("_b2").cast(DoubleType)) - sqrt(col("_a2").cast(DoubleType))) /
          greatest(sqrt(col("_a2").cast(DoubleType)), sqrt(col("_b2").cast(DoubleType))))
        .as("_s"))
    sil.select(col("cluster"),
        floor(col("_s") * lit(S.toDouble)).cast(LongType).as("_sq"))
      .groupBy(col("cluster"))
      // D38 sum: |_sq| ≤ 2^20, so an int64 sum would overflow at
      // ~8.8e12 rows per cluster — decimal carries it to ~10^18
      .agg(count(lit(1)).as("n"),
        (sum(col("_sq").cast(D38)).cast(DoubleType) /
          (count(lit(1)).cast(DoubleType) * lit(S.toDouble))).as("mean_silhouette"))
  }
}
