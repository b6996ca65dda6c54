package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic (hash-based) sampling for corpus curation — the
  * reproducible alternative to RNG sampling (`Table.sample` covers the
  * reference's `Sample`, whose RNG is engine-specific and therefore only
  * rows-checkable). Hashing the row KEY makes the sample a pure function
  * of the data: stable across runs, engines, partitionings, and
  * retries — which is what a training-data pipeline actually wants
  * (re-running the job must not change the corpus).
  *
  * The hash is md5-derived (like every fingerprint in
  * [[graft.functions.TextFunctions]]) so the exact same sample is
  * expressible in the DuckDB oracle — full differential coverage, not a
  * rows-only check.
  */
object Sampling {

  /** uniform bucket in [0, buckets) from the md5 of the key's decimal
    * string form — engine-portable, seed-free. Runs as the native
    * [[graft.plans.HashBucket]] kernel (one digest per row); the
    * composable `conv(substring(md5(x),1,7),16,10) % buckets` chain it
    * replaces materialized a 32-char hex string and a base-16 parse per
    * row — at 100 TB the sampler IS a full-corpus scan, so the per-row
    * constant is the whole cost. Bit-identical semantics
    * (property-tested), so the DuckDB oracle keeps the SQL form.
    */
  def hashBucket(key: Column, buckets: Int): Column =
    graft.plans.HashBucket(key.cast(StringType), buckets)

  /** keep rows whose hash bucket (out of 100) falls under the stratum's
    * percentage rate; `rates` maps stratum value → percent kept,
    * `defaultPct` applies to unlisted strata. Plan: a single codegen'd
    * filter directly over the scan — no shuffle, no RNG, no state.
    */
  def stratified(df: DataFrame, keyCol: String, strataCol: String,
                 rates: Map[String, Int], defaultPct: Int): DataFrame = {
    require((rates.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100),
      "stratified: rates are percentages in [0, 100]")
    val bucket = hashBucket(col(keyCol), 100)
    val pct = rates.foldLeft(lit(defaultPct)) { case (acc, (v, p)) =>
      when(col(strataCol) === v, lit(p)).otherwise(acc)
    }
    df.filter(bucket < pct)
  }

  /** Deterministic Bernoulli(frac) sample keyed on `key` — the
    * oracle-able counterpart of the reference's RNG `Sample(frac)`
    * (`collections.py:319-356`; `Table.sample` keeps the engine-RNG
    * parity surface). The seed is folded into the hashed key, so
    * different seeds draw INDEPENDENT samples while any single seed is a
    * pure function of the data: stable across runs, engines,
    * partitionings, and task retries — the property a training-data
    * pipeline needs from its subsampling step. Plan: one codegen'd
    * filter over the scan; no shuffle, no RNG state. Resolution 1e-6
    * (same bucket granularity as [[weighted]]).
    */
  def sampleHash(df: DataFrame, key: Column, frac: Double, seed: Long): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, "sampleHash: frac must be in [0, 1]")
    val M = 1000000
    df.filter(hashBucket(concat(key.cast(StringType), lit(":" + seed)), M)
      < math.floor(frac * M).toLong)
  }

  /** PER-ROW-weighted deterministic sampling: keep each row with
    * probability `weightCol` (clamped to [0, 1]) — e.g. a quality score,
    * so better documents are proportionally more likely to survive.
    * Same plan shape as [[stratified]] (pure codegen'd filter, no
    * shuffle/RNG/state), same subset property: raising a row's weight
    * can only ADD it, never swap it for a different row, so curriculum
    * reweighting between runs is monotone. Bucket granularity is 10^6
    * (weight resolution 1e-6).
    */
  def weighted(df: DataFrame, keyCol: String, weightCol: Column): DataFrame = {
    val M = 1000000
    val w = least(greatest(weightCol.cast(DoubleType), lit(0.0)), lit(1.0))
    // floor(w*M): a row needs bucket < floor — conservative at the edge,
    // and exactly mirrored in the oracle SQL (both engines floor the same
    // double product of the same inputs)
    df.filter(hashBucket(col(keyCol), M) < floor(w * M).cast(LongType))
  }

  /** Per-key frequency cap — the corpus-balancing operator (at most `n`
    * documents per domain/source/license, the standard web-corpus
    * mixing rule). The kept rows are a DETERMINISTIC uniform choice:
    * the `n` lowest md5 buckets of the id within each key (asc-id
    * tiebreak), so re-runs, engines, and partitionings all keep the
    * same rows, and raising the cap only ADDS rows (monotone, like
    * [[weighted]] — bucket rank is cap-independent).
    *
    * Plan shape (the reason this is not a window): keep-set =
    * [[graft.plans.TopKByScore]] — a BOUNDED partial aggregate (≤ n ids
    * of map-side state per key, one shuffle of ≤ n rows per key) — then
    * one semi join back on the id. A `row_number().over(partitionBy
    * (key))` formulation would funnel every row of a hot domain through
    * ONE task; a 100 TB crawl has million-document domains.
    */
  /** Leakage-safe train/test split: the split unit is the NEAR-DUP
    * CLUSTER, not the document — every member of a connected component
    * of the near-duplicate graph lands in the same split, so a
    * test document can never have a near-copy in train (the standard
    * eval-contamination failure of row-wise splits). Assignment hashes
    * the cluster label ([[hashBucket]] of `cluster_id:seed`), so the
    * split is deterministic across runs/engines/partitionings and
    * different seeds draw independent splits.
    *
    * Scale shape: clustering is [[Cluster.dedupClusters]] (O(log n)
    * Borůvka contraction rounds over the pair graph — pairs come from
    * LSH, never all-pairs); the split itself is one codegen'd projection
    * over the cluster table. Output: (idCol, cluster_id, split∈{train,test}).
    */
  def splitByCluster(docs: DataFrame, pairs: DataFrame, trainPct: Int,
                     seed: Long = 0L, idCol: String = "doc_id"): DataFrame = {
    require(trainPct >= 0 && trainPct <= 100,
      s"splitByCluster: trainPct must be in [0, 100], got $trainPct")
    val clusters = Cluster.dedupClusters(docs, pairs, idCol)
    val bucket = hashBucket(
      concat(col("cluster_id").cast(StringType), lit(":" + seed)), 100)
    clusters.select(col(idCol), col("cluster_id"),
      when(bucket < trainPct, "train").otherwise("test").as("split"))
  }

  /** Temperature-based mixture sampling (α = 0.5): rebalance a corpus
    * across its `mixCol` groups (languages, sources) so each group's
    * share of the ~`targetRows`-row output is proportional to
    * `√share` instead of `share` — the standard up-weighting of
    * low-resource groups when composing a training mix. Deterministic
    * end-to-end: group weights are `⌊√(n_g · N)⌋` (one correctly-
    * rounded IEEE sqrt, identical in every engine while the product
    * stays below 2^52 — beyond that the floor is still deterministic,
    * just not the exact integer root), per-group keep-rates are exact
    * int64 micro-fractions, and row selection is the same seed-keyed
    * md5 bucket as [[sampleHash]].
    *
    * Scale shape: one group-sized aggregate, rates computed DRIVER-side
    * from it (a mixture table is config-sized — the same "fitted model
    * on the driver" rule as the PQ/k-means trainers), then a single
    * codegen'd filter over the scan: no join, no shuffle, no RNG.
    * A group whose exact rate floors to zero micro-units is dropped
    * entirely — raise `targetRows` if every group must survive.
    * Output size concentrates near `targetRows` (hash-Bernoulli, not
    * exact-n; [[capPerKey]] is the exact-count alternative).
    */
  def temperatureSample(df: DataFrame, key: Column, mixCol: String,
                        targetRows: Long, seed: Long): DataFrame = {
    require(targetRows > 0, s"temperatureSample: targetRows must be positive")
    val M = 1000000L
    val stats = df.groupBy(col(mixCol)).agg(count(lit(1)).as("_n"))
      .collect().map(r => (r.get(0), r.getLong(1))).sortBy(_._1.toString)
    val n = stats.map(_._2).sum
    val w = stats.map { case (g, ns) =>
      (g, ns, math.floor(math.sqrt(ns.toDouble * n.toDouble)).toLong)
    }
    val sumW = w.map(_._3).sum
    // exact integer rate in micro-units; BigInt so the driver-side
    // product can never overflow (the plan only sees the final Long)
    val rates = w.map { case (g, ns, ws) =>
      (g, (BigInt(targetRows) * ws * M / (BigInt(sumW) * ns)).min(BigInt(M)).toLong)
    }
    val rate = rates.foldLeft(lit(0L)) { case (acc, (g, r)) =>
      when(col(mixCol) === lit(g), lit(r)).otherwise(acc)
    }
    df.filter(hashBucket(concat(key.cast(StringType), lit(":" + seed)), M.toInt)
      < rate)
  }

  /** Deterministic negative sampling for contrastive training: for
    * every row, `m` pseudo-random OTHER rows as negatives, reproducible
    * from (data, seed) alone. Composition of [[Layout.shuffled]]:
    * the seeded md5 shuffle assigns every row a dense position
    * `p ∈ [0, n)`; negative `i` of a row is the row at position
    * `(p + 1 + (seed + i·2654435761) mod (n−1)) mod n` — the `1 +
    * … mod (n−1)` keeps every offset in `[1, n−1]`, so a row is NEVER
    * its own negative. Distinct `i` can collide on an offset for
    * adversarial (seed, n); with m ≪ n that repeat is harmless for
    * training and kept for cross-engine reproducibility (the formula,
    * not a rejection loop, is the contract).
    *
    * Scale shape: one count job, the shuffle's balanced range exchange,
    * then ONE hash self-join on dense long positions (the anchor side
    * explodes its m offsets first). The position frame is a single
    * materialized RDD reused by both join sides — its exchange runs
    * once. Returns (idCol, neg_rank ∈ [1, m], neg_id).
    */
  def negatives(df: DataFrame, idCol: String, m: Int, seed: Long): DataFrame = {
    require(m > 0, s"negatives: m must be positive, got $m")
    val n = df.count()
    require(n >= 2, s"negatives: need at least 2 rows, got $n")
    val pos = Layout.shuffled(df.select(col(idCol)), Seq(col(idCol)), seed,
      posCol = "_p")
    val anchors = pos
      .withColumn("_i", explode(sequence(lit(1L), lit(m.toLong))))
      .withColumn("_tp",
        (col("_p") + 1L + (lit(seed) + col("_i") * 2654435761L) % (n - 1L)) % n)
    anchors.alias("a")
      .join(pos.select(col(idCol).as("neg_id"), col("_p").as("_np")).alias("b"),
        col("_tp") === col("_np"))
      .select(col(s"a.$idCol"), col("_i").as("neg_rank"), col("neg_id"))
  }

  def capPerKey(df: DataFrame, keyCol: String, idCol: String, n: Int): DataFrame = {
    require(n > 0, s"capPerKey: n must be positive, got $n")
    val M = 1000000
    // TopKByScore keeps HIGHEST score: negate the bucket so the kept set
    // is the n LOWEST buckets (ties to the lower id, its built-in order)
    val keep = df
      .select(col(keyCol), col(idCol),
        (-hashBucket(col(idCol), M)).cast(DoubleType).as("_s"))
      .groupBy(col(keyCol))
      .agg(graft.plans.TopKByScore(col("_s"), col(idCol), n).as("_top"))
      .select(explode(col("_top")).as("_e"))
      .select(col("_e.c_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Top-p MASS curation (the corpus-side analogue of nucleus/top-p
    * sampling): per group, keep the highest-`scoreCol` rows whose
    * cumulative score mass first reaches `pNum/pDen` of the group's
    * total mass — all rows tied at the cutoff value included
    * (tie-inclusive, so the kept set is a pure function of the data,
    * never of row order). "Keep the docs carrying the top half of the
    * quality mass per domain" in one operator. Scores must be
    * non-negative (mass must be monotone) — enforced in-plan with
    * `raise_error`, the [[graft.operators.Validate]] fail-loud rule.
    *
    * Exactness: p is a RATIONAL (`pDen·cum ≥ pNum·tot`, no float
    * multiply — the no-libm rule) and masses accumulate in
    * DECIMAL(28,6), immune to IEEE summation order. Scale shape = the
    * [[graft.operators.Quantile]] value-counting family: one
    * per-(group, value) mass aggregate (the only corpus shuffle), a
    * running sum over each group's DISTINCT values DESCENDING, the
    * per-group cutoff value broadcast back as a map-side filter.
    */
  def topMassByScore(df: DataFrame, groupCol: String, scoreCol: String,
                     pNum: Long, pDen: Long): DataFrame = {
    require(pDen > 0 && pNum > 0 && pNum <= pDen,
      s"topMassByScore: need 0 < pNum/pDen <= 1, got $pNum/$pDen")
    val dec = DecimalType(28, 6)
    val guarded = when(col(scoreCol) < 0,
      expr(s"raise_error('topMassByScore: negative score in $scoreCol')"))
      .otherwise(col(scoreCol))
    val mass = df.filter(col(scoreCol).isNotNull)
      .groupBy(col(groupCol), col(scoreCol).as("_v"))
      .agg(sum(guarded.cast(dec)).as("_m"))
    val byValDesc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("_v").desc)
    val whole = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    val cutoffs = mass
      .withColumn("_cum", sum(col("_m")).over(byValDesc.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("_tot", sum(col("_m")).over(whole))
      .filter(col("_tot") > 0 && col("_cum") * pDen >= col("_tot") * pNum)
      .groupBy(col(groupCol).as("_g"))
      .agg(max(col("_v")).as("_cut"))
    df.join(broadcast(cutoffs), col(groupCol) <=> col("_g"))
      .filter(col(scoreCol) >= col("_cut"))
      .select(df.columns.map(col): _*)
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every raw
    * document by how much more likely its hashed-bigram bag is under a
    * TARGET (clean/reference) corpus model than under the RAW corpus
    * model — the data-selection signal that upsamples
    * Wikipedia/books-like text out of a crawl. Both models are
    * add-one-smoothed multinomials over `dims` hash buckets; the
    * per-gram log-likelihood ratio uses the same quantized integer
    * `ilog2` arithmetic as [[graft.functions.TextFunctions.lmQualityScore]]
    * (no libm, ranking-grade, engine-exact):
    * `lr(b) = [ilog2(ct_b+1) − ilog2(Tt+dims)] − [ilog2(cr_b+1) − ilog2(Tr+dims)]`.
    * Output `(idCol, n_grams, dsir_q)` with `dsir_q = Σ_grams lr(bucket)`;
    * docs with fewer than two tokens have no grams and are absent
    * (the [[graft.functions.TextFunctions.lmQualityScore]] contract).
    * Select with [[topMassByScore]] / a top-k over `dsir_q`, or turn
    * the weights into sampling rates.
    *
    * Scale shape: each corpus contributes ONE explode pass folded into
    * a map-side-combined bucket count (the models are `dims`-bounded —
    * 16 K rows at the default — regardless of corpus size); totals are
    * aggregates OVER the count tables; scoring joins raw instances to
    * the broadcast model and aggregates per doc — the raw text itself
    * never shuffles, only (doc_id, bucket) pairs. The target corpus is
    * typically benchmark/reference-sized but may be arbitrarily large:
    * nothing here materializes it beyond its bucket counts.
    */
  def dsirWeights(raw: DataFrame, target: DataFrame, dims: Int = 16384,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(dims > 0 && dims <= (1 << 28), s"dsirWeights: dims=$dims")
    def ilog2(c: Column): Column = (length(bin(c)) - 1).cast(LongType)
    def buckets(docs: DataFrame) =
      graft.functions.TextFunctions.bigramInstances(docs, textCol, idCol)
        .select(col(idCol),
          graft.plans.HashBucket(concat_ws(" ", col("w1"), col("w2")), dims).as("_bk"))
    val ri = buckets(raw)
    val rc = ri.groupBy("_bk").agg(count(lit(1)).as("_cr"))
    val tc = buckets(target).groupBy("_bk").agg(count(lit(1)).as("_ct"))
    val model = rc.join(tc, Seq("_bk"), "left")
      .select(col("_bk"), col("_cr"), coalesce(col("_ct"), lit(0L)).as("_ct"))
      .crossJoin(broadcast(rc.agg(sum("_cr").as("_rt"))))
      .crossJoin(broadcast(tc.agg(coalesce(sum("_ct"), lit(0L)).as("_tt"))))
      .select(col("_bk"),
        (ilog2(col("_ct") + 1) - ilog2(col("_tt") + dims)
          - ilog2(col("_cr") + 1) + ilog2(col("_rt") + dims)).as("_lr"))
    ri.join(broadcast(model), "_bk")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("_lr")).as("dsir_q"))
  }
}
