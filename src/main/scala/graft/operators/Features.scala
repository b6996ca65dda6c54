package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Feature-engineering operators for model-training pipelines:
  * one-hot encoding, the hashing trick, per-group standardization,
  * and equi-width histograms.
  *
  * The reference stops at reductions/grouping
  * (`blaze/expr/reductions.py`, `blaze/expr/split_apply_combine.py`);
  * these compose those primitives into the transforms a feature
  * pipeline needs. All are single-shuffle (or shuffle-free) and
  * codegen-only — no UDFs.
  */
object Features {

  /** One-hot encode a low-cardinality categorical column into `is_*`
    * 0/1 columns. Category discovery is a fit step (like Spark ML's
    * `StringIndexer.fit`): one small distinct-aggregate collected to
    * the driver — legitimate for a categorical by definition; the
    * encode itself is a shuffle-free per-row projection. Category →
    * column name is deterministic (sorted), NULL encodes to all-zeros.
    */
  def oneHot(df: DataFrame, catCol: String, prefix: String = "is_"): DataFrame = {
    val cats = df.select(catCol).distinct().collect()
      .map(_.getString(0)).filter(_ != null).sorted
    val safe = cats.map(c => c -> (prefix + c.toLowerCase.replaceAll("[^a-z0-9]+", "_")))
    safe.foldLeft(df) { case (d, (cat, name)) =>
      d.withColumn(name,
        when(col(catCol) === cat, 1).otherwise(0).cast("int"))
    }
  }

  /** Hashing-trick sparse features: tokenize `textCol` on whitespace,
    * route each token to `pmod(h(token), dims)` with the engine-portable
    * 28-bit md5-prefix hash (same family as [[Bloom]] probes — mirrored
    * verbatim in the DuckDB oracle), and emit one (id, dim, weight)
    * row per occupied dimension with weight = token count. Shuffle on
    * (id, dim) only; no vocabulary, no fit step — the point of the
    * hashing trick at 100 TB.
    */
  def hashingTrick(docs: DataFrame, dims: Int, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    require(dims > 0 && dims <= (1 << 28), s"hashingTrick: dims=$dims")
    val tok = explode(split(trim(col(textCol)), "\\s+")).as("token")
    docs
      .select(col(idCol), tok)
      .filter(col("token") =!= "")
      .select(col(idCol),
        pmod(conv(substring(md5(col("token")), 1, 7), 16, 10).cast("long"),
          lit(dims.toLong)).as("dim"))
      .groupBy(idCol, "dim")
      .agg(count(lit(1)).as("weight"))
  }

  /** Per-group z-score standardization with EXACT moments: sums run in
    * decimal (order-independent), the final (x - mean) / stddev_pop is
    * the only IEEE step — bit-identical across engines. Groups with
    * zero variance yield NULL (not ±Inf). One shuffle on the group key
    * (partial aggregation map-side); moments broadcast back via the
    * group-key join.
    */
  def standardize(df: DataFrame, valueCol: String, groupCols: Seq[String],
                  outCol: String = "zscore"): DataFrame = {
    val dec = DecimalType(18, 2)
    val moments = df.groupBy(groupCols.map(col): _*).agg(
      sum(col(valueCol).cast(dec)).cast(DoubleType).as("g_sx"),
      sum(col(valueCol).cast(dec) * col(valueCol).cast(dec))
        .cast(DoubleType).as("g_sx2"),
      count(col(valueCol)).cast(DoubleType).as("g_n"))
    val varPop = (col("g_sx2") - col("g_sx") * col("g_sx") / col("g_n")) / col("g_n")
    df.join(broadcast(moments), groupCols)
      .withColumn(outCol,
        when(varPop > 0,
          (col(valueCol) - col("g_sx") / col("g_n")) / sqrt(varPop)))
      .drop("g_sx", "g_sx2", "g_n")
  }

  /** Equi-width histogram: `bins` buckets over the observed [min, max],
    * bin i = floor((x - min) / width) clamped so x = max lands in the
    * last bin. Two jobs: a tiny min/max aggregate broadcast back, then
    * one groupBy(bin) count — the textbook two-pass distributed
    * histogram. Returns (bin, lo, hi, n) with IEEE-exact edges.
    */
  def histogram(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    require(bins > 0, s"histogram: bins=$bins")
    val mm = df.agg(min(col(valueCol)).as("h_min"), max(col(valueCol)).as("h_max"))
    val width = (col("h_max") - col("h_min")) / lit(bins.toDouble)
    df.join(broadcast(mm))
      .select(
        when(col("h_max") === col("h_min"), 0L)
          .otherwise(least(floor((col(valueCol) - col("h_min")) / width), lit(bins - 1)))
          .cast("long").as("bin"),
        col("h_min"), col("h_max"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        first(col("h_min")).as("h_min"), first(col("h_max")).as("h_max"))
      .select(col("bin"),
        (col("h_min") + col("bin").cast("double") * (col("h_max") - col("h_min")) / lit(bins.toDouble)).as("lo"),
        (col("h_min") + (col("bin") + 1).cast("double") * (col("h_max") - col("h_min")) / lit(bins.toDouble)).as("hi"),
        col("n"))
  }
}
