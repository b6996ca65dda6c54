package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact per-group percent-rank WITHOUT a per-group sort of the corpus.
  *
  * `percent_rank() OVER (PARTITION BY g ORDER BY v)` is
  * `(rank-1)/(n-1)`, and rank gives ties the minimum rank — so every
  * row sharing `(g, v)` receives the SAME percent_rank:
  * `count(v' < v within g) / (n_g - 1)`. That makes percent_rank a
  * function of the (group, value) pair, computable from per-value
  * counts alone:
  *
  *   1. one partial-aggregated count per (g, v) — the only corpus-size
  *      shuffle, and it exchanges ≤ |value domain| rows per group;
  *   2. a running sum over each group's DISTINCT VALUES (a window whose
  *      partition is the value domain, NOT the corpus — bounded and
  *      constant in corpus size for integer metrics like token counts,
  *      byte sizes, or fixed-precision scores);
  *   3. a broadcast join of the tiny (g, v, pr) table back onto the
  *      rows — map-side, no exchange on the corpus.
  *
  * This replaces the single-task-per-group sort that an exact
  * percent_rank window costs at corpus scale (the round-3..7
  * weak-for-scale item on `text_filter_quantile`). For UNBOUNDED
  * continuous values, where distinct counts approach corpus size, use
  * the approximate-threshold route instead (`text_filter_thresholds`).
  */
object Quantile {

  /** The percent_rank every row with this (group, value) receives:
    * `(group, value, pr)` with one row per distinct pair. Bit-identical
    * to the window definition: both evaluate the same integer ratio in
    * one double division (single-row groups get 0.0, as SQL defines).
    */
  def percentRankOfValues(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol), col(valueCol)).agg(count(lit(1)).as("_c"))
    val byVal = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    val whole = Window.partitionBy(col(groupCol))
    counts
      .withColumn("_below", coalesce(
        sum(col("_c")).over(byVal.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_n", sum(col("_c")).over(whole))
      .select(col(groupCol), col(valueCol),
        when(col("_n") === 1L, lit(0.0))
          .otherwise(col("_below").cast(DoubleType) /
            (col("_n") - 1L).cast(DoubleType)).as("pr"))
  }

  /** Keep the rows whose per-group percent_rank of `valueCol` lies in
    * `[lo, hi]` — the quantile-band filter, exact, with the corpus never
    * sorted: ranks come from [[percentRankOfValues]] and rejoin via
    * broadcast. Output columns = input columns (pr is internal).
    * Null-safe on the group key (a NULL group is one partition to the
    * window formulation, so it must band-filter here too).
    */
  def percentRankBand(df: DataFrame, groupCol: String, valueCol: String,
                      lo: Double, hi: Double): DataFrame = {
    val pr = percentRankOfValues(df, groupCol, valueCol)
      .withColumnRenamed(groupCol, "_g").withColumnRenamed(valueCol, "_v")
    df.join(broadcast(pr),
        col(groupCol) <=> col("_g") && col(valueCol) <=> col("_v"))
      .filter(col("pr") >= lo && col("pr") <= hi)
      .select(df.columns.map(col): _*)
  }

  /** Equi-depth discretization: assign each row the bucket
    * `least(ceil(cume_dist * k) - 1, k - 1)` of its per-group
    * cumulative distribution — k bins of ~equal row mass (exact up to
    * ties: rows sharing `(group, value)` are inseparable and land in
    * one bin, the determinism SQL `ntile` lacks, since ntile splits
    * ties by arbitrary row order and never replays identically across
    * engines or runs). Same value-counting shape as
    * [[percentRankOfValues]]: the only corpus shuffle is the (g, v)
    * count; the window walks each group's DISTINCT values; bins
    * broadcast back onto the rows. Output = input columns + `binCol`.
    */
  def equiDepthBin(df: DataFrame, groupCol: String, valueCol: String, k: Int,
                   binCol: String = "bin"): DataFrame = {
    require(k > 0, s"equiDepthBin: k must be positive, got $k")
    val counts = df.groupBy(col(groupCol), col(valueCol)).agg(count(lit(1)).as("_c"))
    val byVal = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    val whole = Window.partitionBy(col(groupCol))
    val bins = counts
      .withColumn("_cum",
        sum(col("_c")).over(byVal.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("_n", sum(col("_c")).over(whole))
      .select(col(groupCol).as("_g"), col(valueCol).as("_v"),
        least(
          ceil(col("_cum").cast(DoubleType) / col("_n").cast(DoubleType) * k) - 1L,
          lit(k - 1L)).cast(LongType).as(binCol))
    df.join(broadcast(bins),
        col(groupCol) <=> col("_g") && col(valueCol) <=> col("_v"))
      .select(df.columns.map(col) :+ col(binCol): _*)
  }

  /** Winsorize: CLIP `valueCol` to the per-group [lo, hi] percent-rank
    * band edges instead of dropping rows ([[percentRankBand]]'s
    * sibling — outlier taming for features you still want to keep).
    * Edge values are the smallest value with pr ≥ lo and the largest
    * with pr ≤ hi, computed from the same value-counting ranks (the
    * only window runs over each group's distinct values; edges
    * broadcast back — corpus never sorted). A group whose rank mass
    * cannot reach the band (e.g. single-value groups at pr 0.0)
    * degrades to its own min/max, i.e. no clipping.
    */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                lo: Double, hi: Double, outCol: String = "winsorized"): DataFrame = {
    val edges = percentRankOfValues(df, groupCol, valueCol)
      .groupBy(col(groupCol).as("_g"))
      .agg(
        coalesce(min(when(col("pr") >= lo, col(valueCol))), min(col(valueCol))).as("_lov"),
        coalesce(max(when(col("pr") <= hi, col(valueCol))), max(col(valueCol))).as("_hiv"))
    df.join(broadcast(edges), col(groupCol) <=> col("_g"))
      .withColumn(outCol, least(greatest(col(valueCol), col("_lov")), col("_hiv")))
      .drop("_g", "_lov", "_hiv")
  }

  /** Exact per-group WEIGHTED quantile (type-1 / lower quantile): the
    * smallest value v whose cumulative weight reaches q of the group's
    * total weight, q given as the rational `qNum/qDen` so the
    * threshold test is pure integer arithmetic —
    * `qDen * cumWeight >= qNum * totalWeight` — with NO floating
    * multiply to disagree across engines (the no-libm rule the
    * tfidf/bm25/lm-score family follows). Weighted median =
    * (1, 2); p90 = (9, 10). Weights are cast to DECIMAL(28,6) so the
    * cumulative sums are exact (IEEE double sums would be
    * partitioning-ordered).
    *
    * Same value-counting shape as [[percentRankOfValues]], and the same
    * CONTRACT: `valueCol` must have a BOUNDED domain (quantity levels,
    * token counts, scores at fixed precision) — the distinct-value
    * window walks the domain, not the corpus. An unbounded continuous
    * value column degenerates it to a per-group sort; put the
    * continuous measure in `weightCol` (weights only aggregate). The
    * only corpus-size shuffle is the per-(group, value) weight
    * aggregate; output is one row per group — corpus never sorted.
    * Rows with NULL value or NULL weight are excluded (SQL aggregate
    * semantics); a group whose total weight is zero yields no row.
    */
  def weightedQuantile(df: DataFrame, groupCol: String, valueCol: String,
                       weightCol: String, qNum: Long, qDen: Long,
                       outCol: String = "wq"): DataFrame = {
    require(qDen > 0 && qNum > 0 && qNum <= qDen,
      s"weightedQuantile: need 0 < qNum/qDen <= 1, got $qNum/$qDen")
    val dec = DecimalType(28, 6)
    val counts = df
      .filter(col(valueCol).isNotNull && col(weightCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol))
      .agg(sum(col(weightCol).cast(dec)).as("_w"))
    val byVal = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    val whole = Window.partitionBy(col(groupCol))
    counts
      .withColumn("_cum",
        sum(col("_w")).over(byVal.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("_tot", sum(col("_w")).over(whole))
      .filter(col("_tot") > 0 && col("_cum") * qDen >= col("_tot") * qNum)
      .groupBy(col(groupCol))
      .agg(min(col(valueCol)).as(outCol))
  }

  /** Exact per-group Gini concentration coefficient (Gini 1912) of a
    * non-negative metric — the inequality/whale audit ("how
    * concentrated is spend across events / tokens across documents"),
    * [[graft.operators.Corpus#diversity]]'s ranked sibling for numeric
    * mass. Computed EXACTLY from the value-counting frame: a tied
    * group of `c` observations at value `x` after exclusive prefix `s`
    * occupies ranks `s+1..s+c`, so the doubled rank-weighted sum is
    * `S2 = Σ x·(2·c·s + c² + c)` — pure integers — and
    *
    *   G = (S2 − (n+1)·T) / (n·T)        (T = Σ x, centi units)
    *
    * is ONE final IEEE division of DECIMAL(38,0) exacts: bit-identical
    * on any engine at any partitioning. G = 0 for a constant metric,
    * → 1 as one observation carries all mass. Negative values fail
    * loudly in-plan (Gini is undefined below zero — the
    * [[graft.operators.Sampling#topMassByScore]] guard pattern); a
    * group with zero total mass reports NULL. Exact to |S2| < 10^38
    * (n ≤ ~10^12 at centi values ≤ 10^7, documented).
    *
    * Output: `(group, n, gini)`.
    *
    * Scale shape: the value-counting contract — one per-(group, value)
    * count shuffle; the rank walk windows over DISTINCT values per
    * group (value-domain-bounded — point this at quantized/bounded
    * metrics, not raw high-cardinality doubles); one row per group. */
  def giniCoefficient(df: DataFrame, groupCol: String,
                      valueCol: String): DataFrame = {
    val D38 = DecimalType(38, 0)
    val raw = (col(valueCol).cast(DecimalType(18, 2)) * 100).cast(LongType)
    // non-ANSI casts NULL silently past DECIMAL(18,2)'s 10^16 bound —
    // a non-NULL input that NULLed under the cast is an out-of-domain
    // value and must fail loudly (house loud-failure convention)
    val cent = when(col(valueCol).isNotNull && raw.isNull,
        raise_error(concat(lit("giniCoefficient: |value| exceeds the "
          + "DECIMAL(18,2)-safe 10^16 domain: "),
          col(valueCol).cast(StringType))).cast(LongType))
      .when(raw < 0,
        raise_error(concat(lit("giniCoefficient: negative value: "),
          col(valueCol).cast(StringType))).cast(LongType))
      .otherwise(raw)
    val counts = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), cent.as("_v"))
      .agg(count(lit(1)).as("_c"))
    val byVal = Window.partitionBy(col(groupCol)).orderBy(col("_v"))
    val whole = Window.partitionBy(col(groupCol))
    counts
      .withColumn("_s", coalesce(
        sum(col("_c")).over(byVal.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_n", sum(col("_c")).over(whole))
      .groupBy(col(groupCol))
      .agg(max(col("_n")).as("n"),
        sum(col("_v").cast(D38) *
          (lit(2).cast(D38) * col("_c").cast(D38) * col("_s").cast(D38) +
            col("_c").cast(D38) * col("_c").cast(D38) + col("_c").cast(D38)))
          .as("_s2"),
        sum(col("_v").cast(D38) * col("_c").cast(D38)).as("_t"))
      .select(col(groupCol), col("n"),
        when(col("_t") > 0,
          (col("_s2") - (col("n").cast(D38) + 1) * col("_t")).cast(DoubleType) /
            (col("n").cast(D38) * col("_t")).cast(DoubleType)).as("gini"))
  }

  /** Exact per-group symmetric trimmed mean: drop the lowest and
    * highest `⌊n·trimNum/trimDen⌋` observations BY RANK and average
    * the rest — the robust location estimate between the mean
    * ([[graft.operators.Features#standardize]]'s moments, dragged by
    * tails) and the median ([[graft.operators.Features#robustOutliers]],
    * discards too much). Rational trim fraction, the house no-libm
    * rule: with per-value counts `c`, exclusive prefix `s`, and the
    * rank window `[lo, n−lo)`, each distinct value contributes exactly
    * `min(s+c, n−lo) − max(s, lo)` (clamped ≥ 0) kept observations —
    * pure integer arithmetic, values in exact centi units, ONE final
    * IEEE division per group. NULL values are excluded. The
    * `trim < 1/2` require guarantees `kept = n − 2·⌊n·trim⌋ ≥ 1` for
    * every non-empty group, so the division can never be 0/0.
    *
    * Output: `(group, n, kept, trimmed_mean)`.
    *
    * Scale shape: the value-counting contract — the only corpus
    * shuffle is the per-(group, value) count; the rank walk windows
    * over DISTINCT values per group (value-domain-bounded), and the
    * kept-mass sum is one aggregate over that bounded frame. */
  def trimmedMean(df: DataFrame, groupCol: String, valueCol: String,
                  trimNum: Long, trimDen: Long): DataFrame = {
    require(trimDen > 0 && trimNum >= 0 && 2 * trimNum < trimDen,
      s"trimmedMean: need 0 <= trimNum/trimDen < 1/2, got $trimNum/$trimDen")
    val rawCent = (col(valueCol).cast(DecimalType(18, 2)) * 100).cast(LongType)
    // loud-failure guard: non-ANSI casts NULL silently past 10^16
    val cent = when(col(valueCol).isNotNull && rawCent.isNull,
        raise_error(concat(lit("trimmedMean: |value| exceeds the "
          + "DECIMAL(18,2)-safe 10^16 domain: "),
          col(valueCol).cast(StringType))).cast(LongType))
      .otherwise(rawCent)
    val counts = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), cent.as("_v"))
      .agg(count(lit(1)).as("_c"))
    val byVal = Window.partitionBy(col(groupCol)).orderBy(col("_v"))
    val whole = Window.partitionBy(col(groupCol))
    counts
      .withColumn("_s", coalesce(
        sum(col("_c")).over(byVal.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_n", sum(col("_c")).over(whole))
      // lo = ⌊n·trim⌋ via pure integer floor division (exact, then an
      // exact double→long round-trip below 2^53)
      .withColumn("_lo", ((col("_n") * trimNum - pmod(col("_n") * trimNum, lit(trimDen)))
        / trimDen).cast(LongType))
      .withColumn("_kept",
        greatest(least(col("_s") + col("_c"), col("_n") - col("_lo")) -
          greatest(col("_s"), col("_lo")), lit(0L)))
      .groupBy(col(groupCol))
      .agg(max(col("_n")).as("n"),
        sum(col("_kept")).cast(LongType).as("kept"),
        (sum((col("_v") * col("_kept")).cast(DecimalType(38, 0))).cast(DoubleType) /
          (sum(col("_kept")).cast(DoubleType) * lit(100.0d))).as("trimmed_mean"))
  }
}
