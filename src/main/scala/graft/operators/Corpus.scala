package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus datasheet — the "data card" a training-data release ships
  * with (Gebru et al. 2018, "Datasheets for Datasets"): per-slice and
  * whole-corpus volume / length / duplication statistics, computed in
  * ONE pass. (Reference has no reporting surface; this is a north-star
  * training-pipeline extension like the rest of the curation family.)
  *
  * Scale shape: GROUPING SETS — every requested slice granularity plus
  * the corpus-total row come out of a SINGLE scan (Catalyst expands
  * the sets map-side), instead of one groupBy-scan per granularity.
  * The physical plan is the textbook two-exchange distinct-aggregate
  * cascade (plan-guarded in the unit suite): exchange 1 carries one
  * row per (slice, digest) — already partially aggregated map-side —
  * and exchange 2 one row per slice; nothing row-shaped ever crosses
  * the wire. The only per-row work is a token split and one md5.
  * `n_distinct_texts` is an EXACT distinct on the md5 digest —
  * dedup-rate up to 128-bit-collision quantization, the same trade as
  * [[Dedup.exact]] — and `dup_rate = 1 - distinct/docs` is the
  * headline duplication number a datasheet quotes.
  *
  * Output: one row per grouping set — slice columns (NULL outside
  * their set, the SQL GROUPING SETS contract), `n_docs`, `n_tokens`,
  * `n_chars`, `n_distinct_texts`, `dup_rate`, `avg_tokens`.
  */
object Corpus {

  def datasheet(docs: DataFrame, sliceCols: Seq[String],
                textCol: String = "text"): DataFrame = {
    require(sliceCols.nonEmpty, "datasheet: at least one slice column")
    val missing = sliceCols.filterNot(docs.columns.contains)
    require(missing.isEmpty, s"datasheet: no such column(s): ${missing.mkString(", ")}")
    val text = col(textCol)
    // the per-slice sets are PREFIXES (source, then source×lang, …) plus
    // the grand total — the rollup lattice, expressed as explicit sets so
    // callers get exactly the granularities they asked for
    val sets = sliceCols.indices.map(i => sliceCols.take(i + 1).map(col)) :+ Seq.empty
    docs.groupingSets(sets, sliceCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(graft.functions.TextFunctions.tokenCount(text)).as("n_tokens"),
        sum(length(text).cast(LongType)).as("n_chars"),
        countDistinct(md5(text)).as("n_distinct_texts"))
      .select((sliceCols.map(col) ++ Seq(
        col("n_docs"), col("n_tokens"), col("n_chars"), col("n_distinct_texts"),
        (lit(1.0) - col("n_distinct_texts").cast(DoubleType) / col("n_docs"))
          .as("dup_rate"),
        (col("n_tokens").cast(DoubleType) / col("n_docs")).as("avg_tokens"))): _*)
  }

  /** Per-group categorical diversity — the balance metrics a corpus
    * datasheet quotes for a slice column (is the `source` mix inside
    * each language collapsed or even?):
    *
    *  - `gini` — Gini impurity `1 − Σ(cᵢ/n)²`, computed as the EXACT
    *    rational `(n² − Σcᵢ²)/n²` with one final IEEE division — no
    *    float accumulation, replays bit-identically anywhere;
    *  - `entropy_qbits` — Shannon entropy in the engine-exact
    *    floor-log2 quantization the LM/PMI scorers use
    *    (`ilog2(c) = length(bin(c))−1`): `Σcᵢ·(ilog2(n) − ilog2(cᵢ))
    *    = n·ilog2(n) − Σcᵢ·ilog2(cᵢ)` — pure int64, NOT nats/bits of
    *    true entropy but ordered the same way and exactly comparable
    *    across engines and runs (the same no-libm rule as
    *    `lmQualityScore`: two engines' `log()` need not agree at the
    *    last ulp, integer quantization always does).
    *
    * Scale shape: one (group, category) count aggregate, then one
    * group aggregate over the (small) category counts — two exchanges,
    * nothing row-shaped past the first.
    */
  /** Training-mix plan — the budgeting step between corpus stats and
    * sampling: given relative target WEIGHTS per source and a total
    * document budget, how many docs each source must contribute
    * (`need = ⌊budget·w/Σw⌋`, exact int64), how many it CAN
    * (`take = min(need, n_docs)`), the sampling rate to apply
    * (`take/n_docs`, the one IEEE division), and the shortfall
    * (`deficit`) when a source is too small — the number an upstream
    * crawl planner acts on. Sources present in the corpus but absent
    * from the target mix plan to zero; targeted sources missing from
    * the corpus surface as pure deficit rows. Deterministic
    * throughout; pairs with [[graft.operators.Sampling.sampleHash]]
    * (rate → seeded hash filter) for the actual draw, and with
    * `Sampling.temperatureSample` when the mix should be α-smoothed
    * instead of pinned.
    *
    * Scale shape: one source-count aggregate joined to a |sources|-row
    * broadcast literal — nothing else touches the corpus.
    */
  def mixPlan(docs: DataFrame, sourceCol: String,
              weights: Seq[(String, Long)], budget: Long): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0) && weights.exists(_._2 > 0),
      "mixPlan: at least one positive weight")
    require(budget >= 0, s"mixPlan: budget >= 0, got $budget")
    require(weights.map(_._1).distinct.size == weights.size,
      "mixPlan: duplicate source in weights")
    val spark = docs.sparkSession
    import spark.implicits._
    val wSum = weights.map(_._2).sum
    val wDf = weights.toDF("source", "weight")
    val counts = docs.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
    counts.join(broadcast(wDf), Seq("source"), "full_outer")
      .select(col("source"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("weight"), lit(0L)).as("weight"))
      .withColumn("need", expr(s"(weight * ${budget}L) DIV ${wSum}L")) // exact int64 floor div
      .withColumn("take", least(col("need"), col("n_docs")))
      .select(col("source"), col("n_docs"), col("weight"), col("need"), col("take"),
        when(col("n_docs") > 0,
          col("take").cast(DoubleType) / col("n_docs").cast(DoubleType))
          .otherwise(lit(0.0)).as("rate"),
        (col("need") - col("take")).as("deficit"))
  }

  def diversity(docs: DataFrame, groupCols: Seq[String],
                catCol: String): DataFrame = {
    require(groupCols.nonEmpty, "diversity: at least one group column")
    val missing = (groupCols :+ catCol).filterNot(docs.columns.contains)
    require(missing.isEmpty, s"diversity: no such column(s): ${missing.mkString(", ")}")
    def ilog2(c: org.apache.spark.sql.Column) =
      (length(bin(c)) - 1).cast(LongType)
    val counts = docs.groupBy((groupCols :+ catCol).map(col): _*)
      .agg(count(lit(1)).as("_c"))
    counts.groupBy(groupCols.map(col): _*)
      .agg(sum(col("_c")).as("n"),
        count(lit(1)).as("n_categories"),
        sum(col("_c") * col("_c")).as("_s2"),
        sum(col("_c") * ilog2(col("_c"))).as("_cl"))
      .select(groupCols.map(col) ++ Seq(
        col("n"), col("n_categories"),
        ((col("n") * col("n") - col("_s2")).cast(DoubleType) /
          (col("n") * col("n")).cast(DoubleType)).as("gini"),
        (col("n") * ilog2(col("n")) - col("_cl")).as("entropy_qbits")): _*)
  }
}
