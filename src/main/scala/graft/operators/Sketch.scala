package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic cardinality / quantile sketches.
  *
  * The reference exposes RNG- or engine-specific approximations
  * (`nunique` exact everywhere, pandas `approx` paths engine-private);
  * Spark's own `approx_count_distinct` (HLL++) and `percentile_approx`
  * are engine-specific sketches whose exact outputs no other engine can
  * reproduce — which is why those two stayed unit-only extension rows
  * until now. These operators close that gap with sketches that are
  * PURE FUNCTIONS of the data: same estimate on any engine, any
  * partitioning, any retry — so they carry full DuckDB-oracle queries
  * AND give the production property a training pipeline needs
  * (re-running the corpus census yields byte-identical manifests).
  *
  * - [[kmvDistinct]]: k-minimum-values distinct-count estimator
  *   (Bar-Yossef et al. 2002): hash every value into a fixed 48-bit
  *   space, keep the k smallest distinct hashes, estimate
  *   `(k-1) * space / h_k` in exact int64 arithmetic.
  * - [[quantileSampled]]: quantile over a deterministic hash sample
  *   ([[Sampling.sampleHash]]) — discrete (lower) quantile, integer
  *   position arithmetic, no interpolation.
  */
object Sketch {

  /** 48-bit hash space: wide enough that estimates up to ~10^12
    * distinct values don't saturate, narrow enough that
    * `(k-1) * space` stays exact in int64 for any practical k
    * (k ≤ 2^14). */
  val KmvSpace: Long = 1L << 48

  /** md5-prefix hash into [0, 2^48): the same engine-portable digest
    * family as [[Sampling.hashBucket]], widened from bucket to full
    * 48-bit value (12 hex digits). One digest per row — the sketch IS a
    * full scan, nothing else. */
  def kmvHash(key: Column): Column =
    conv(substring(md5(key.cast(StringType)), 1, 12), 16, 10).cast(LongType)

  /** Per-group distinct-count estimate from the k smallest distinct
    * hashes. Output: (groupCols*, n_est).
    *
    * Scale shape: the pre-distinct on (group, hash) is a map-side
    * partial aggregate whose key space is capped at 2^48 regardless of
    * corpus size; the k-smallest selection is the bounded
    * [[graft.plans.TopKByScore]] partial aggregate (≤ k values per
    * group per map partition cross the exchange — never a per-group
    * sort). Groups with fewer than k distinct values return their EXACT
    * count (the sketch holds every hash).
    *
    * Estimator: `h_k` (the k-th smallest of n uniform draws on
    * [0, space)) ≈ k/n · space, so `n ≈ (k-1) · space / h_k` (the k−1
    * numerator is the standard unbiasing); relative error ~ 1/√k.
    * All arithmetic is exact int64 (`(k-1)·2^48 < 2^63` for k ≤ 2^14),
    * so every engine computes the identical estimate — the DuckDB
    * oracle replays it verbatim (`red_nunique_kmv`).
    */
  def kmvDistinct(df: DataFrame, key: Column, groupCols: Seq[String],
                  k: Int = 64): DataFrame = {
    require(k >= 2 && k <= (1 << 14), s"kmvDistinct: k must be in [2, 2^14], got $k")
    val g = groupCols.map(col)
    val distinctHashes = df.select((g :+ kmvHash(key).as("_h")): _*).distinct()
    // score = -h: TopKByScore keeps the k LARGEST scores = k smallest
    // hashes, array sorted score-desc = hash-ascending, so element k is
    // h_k. h < 2^48 round-trips the double score exactly.
    val mins = distinctHashes.groupBy(g: _*)
      .agg(graft.plans.TopKByScore(-col("_h").cast(DoubleType), col("_h"), k).as("_mins"))
    val est = when(size(col("_mins")) < k, size(col("_mins")).cast(LongType))
      .otherwise(expr(s"${(k - 1).toLong * KmvSpace}L div element_at(_mins, $k).c_id"))
    mins.select((g :+ est.as("n_est")): _*)
  }

  /** KMV MERGEABILITY, demonstrated as data: the whole-corpus estimate
    * recomputed from per-group SKETCHES ONLY (explode each group's k
    * smallest hashes, take the k smallest of that union) — never
    * touching the raw rows again — next to the direct whole-corpus
    * estimate. They are EXACTLY equal (the k smallest of the union of
    * per-group k-smallest sets is the global k-smallest set: any hash
    * among the global k smallest is necessarily within its own group's
    * k smallest), which is the property that lets a 1000-executor
    * fleet sketch partitions independently and a coordinator merge
    * k-sized states — the oracle computes only the direct estimate and
    * the hash match proves the law on real data. Output: one row,
    * (n_est_merged, n_est_direct).
    */
  def kmvMergeEstimate(df: DataFrame, key: Column, groupCols: Seq[String],
                       k: Int = 64): DataFrame = {
    require(k >= 2 && k <= (1 << 14), s"kmvMergeEstimate: k in [2, 2^14], got $k")
    require(groupCols.nonEmpty, "kmvMergeEstimate: at least one group column")
    val g = groupCols.map(col)
    val distinctHashes = df.select((g :+ kmvHash(key).as("_h")): _*).distinct()
    val groupMins = distinctHashes.groupBy(g: _*)
      .agg(graft.plans.TopKByScore(-col("_h").cast(DoubleType), col("_h"), k).as("_mins"))
    def est(minsCol: String): Column =
      when(size(col(minsCol)) < k, size(col(minsCol)).cast(LongType))
        .otherwise(expr(s"${(k - 1).toLong * KmvSpace}L div element_at($minsCol, $k).c_id"))
    // merge path: union of the per-group sketch states only
    val merged = groupMins
      .select(explode(col("_mins")).as("_e"))
      .select(col("_e.c_id").as("_h"))
      .distinct() // a hash can lead several groups' sketches
      .agg(graft.plans.TopKByScore(-col("_h").cast(DoubleType), col("_h"), k).as("_mins"))
      .select(est("_mins").as("n_est_merged"))
    val direct = distinctHashes.select(col("_h")).distinct()
      .agg(graft.plans.TopKByScore(-col("_h").cast(DoubleType), col("_h"), k).as("_mins"))
      .select(est("_mins").as("n_est_direct"))
    merged.crossJoin(direct)
  }

  /** Corpus-overlap estimate from two KMV sketches — the theta-sketch
    * set operation over the same 48-bit md5 space: take the k smallest
    * hashes of the UNION of the two sketch states (valid because any
    * hash among the union's k smallest is necessarily inside its own
    * side's k smallest — the [[kmvMergeEstimate]] law), let θ be the
    * k-th; every union hash ≤ θ is a uniform sample of A∪B, so the
    * fraction present in BOTH sketches estimates the Jaccard and
    * `|A∩B| ≈ c·|A∪B|/k`. The decontamination use: estimate shared
    * content between two corpora from two k-integer states without
    * ever joining the corpora. Underfull sketches (|A∪B| < k) hold
    * every hash, so all three outputs become EXACT counts through the
    * same formulas. All arithmetic exact int64 (one double ratio at
    * the end) — the oracle replays it verbatim.
    *
    * Output: one row `(n_union_est, n_inter_est, jaccard_est)`.
    *
    * Scale shape: each side is one scan → capped pre-distinct → one
    * bounded TopKByScore aggregate (k values per map partition cross
    * the wire); the set algebra runs on two k-length arrays in a
    * 1-row × 1-row cross join.
    */
  def kmvOverlap(a: DataFrame, b: DataFrame, key: Column,
                 k: Int = 64): DataFrame = {
    require(k >= 2 && k <= (1 << 14), s"kmvOverlap: k in [2, 2^14], got $k")
    def sketch(df: DataFrame, out: String) =
      df.select(kmvHash(key).as("_h")).distinct()
        .agg(graft.plans.TopKByScore(-col("_h").cast(DoubleType), col("_h"), k).as("_t"))
        .select(transform(col("_t"), x => x("c_id")).as(out))
    sketch(a, "_ha").crossJoin(sketch(b, "_hb"))
      .withColumn("_uall", array_sort(array_distinct(concat(col("_ha"), col("_hb")))))
      .withColumn("_m", least(lit(k), size(col("_uall"))).cast(LongType))
      .withColumn("_u", slice(col("_uall"), lit(1), col("_m")))
      // both-empty guard: _m = 0 would index element_at(_u, 0) (a
      // runtime error) — degenerate to the exact empty-set answer
      // (0, 0, NULL-jaccard: J(∅,∅) is undefined) instead
      .withColumn("_theta",
        when(col("_m") > 0, element_at(col("_u"), col("_m").cast(IntegerType))))
      .withColumn("_c", size(filter(col("_u"),
        h => array_contains(col("_ha"), h) && array_contains(col("_hb"), h))).cast(LongType))
      .withColumn("n_union_est",
        when(size(col("_uall")) < k, size(col("_uall")).cast(LongType))
          .otherwise(expr(s"${(k - 1).toLong * KmvSpace}L div _theta")))
      .select(col("n_union_est"),
        when(col("_m") > 0, expr("_c * n_union_est div _m"))
          .otherwise(lit(0L)).as("n_inter_est"),
        when(col("_m") > 0, col("_c").cast(DoubleType) / col("_m"))
          .as("jaccard_est"))
  }

  /** Per-group discrete quantile over a deterministic hash sample:
    * keep rows whose [[Sampling.sampleHash]] bucket survives `frac`,
    * sort the sample within each group, and take the value at position
    * `⌊q·(n−1)⌋` (0-based, q = qNum/qDen in exact integer arithmetic —
    * the lower discrete quantile, no interpolation). Output:
    * (groupCols*, n_sample, quantile).
    *
    * Scale shape: the sample filter is a codegen'd scan predicate (no
    * shuffle, no RNG state); the per-group window sort runs over the
    * SAMPLE only (frac·N rows), which is the entire point — the exact
    * per-group sort over the full corpus is what this operator avoids.
    * Error: standard order-statistic bound, ~1/√(frac·n) quantile
    * deviation. The value at a rank is deterministic even under ties
    * (the sorted multiset has one value per position), so the estimate
    * is a pure function of (data, frac, seed) and the DuckDB oracle
    * replays it exactly (`red_quantile_sampled`).
    */
  def quantileSampled(df: DataFrame, value: Column, key: Column,
                      groupCols: Seq[String], qNum: Int, qDen: Int,
                      frac: Double, seed: Long): DataFrame = {
    require(qDen > 0 && qNum >= 0 && qNum <= qDen,
      s"quantileSampled: q must be in [0, 1], got $qNum/$qDen")
    val g = groupCols.map(col)
    val sampled = Sampling.sampleHash(df, key, frac, seed)
      .select((g :+ value.as("_v")): _*)
    val byGroup = Window.partitionBy(g: _*)
    val rn = row_number().over(byGroup.orderBy(col("_v")))
    val n = count(lit(1)).over(byGroup)
    sampled.withColumn("_rn", rn).withColumn("_n", n)
      .filter(col("_rn") - 1 === expr(s"($qNum * (_n - 1)) div $qDen"))
      .select((g :+ col("_n").as("n_sample") :+ col("_v").as("quantile")): _*)
  }
}
