package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-quality validation gates — the admission checks a training
  * pipeline runs before a new dump joins the corpus (and the
  * engine-side analogue of the reference's construction-time schema
  * checks, e.g. join key promotion `expr/collections.py:753-762`, sort
  * key validation `collections.py:162-172` — extended from schema to
  * DATA). Each check returns a `(rule, n_violations)` table so gates
  * compose by union and alert thresholds stay declarative.
  *
  * Scale shapes:
  *  - [[checkRules]]: ALL row-level predicates fold into ONE
  *    conditional aggregate over a single scan — adding a rule adds a
  *    codegen'd counter, never a pass.
  *  - [[checkUnique]]: one (keys → count) partial/final aggregate;
  *    violations = rows carrying a key seen more than once.
  *  - [[checkForeignKey]]: dangling references via a join on the key —
  *    broadcast when the dimension is small, the usual shuffle
  *    co-location tools otherwise.
  */
object Validate {

  /** Row-level predicate rules, one scan for all of them. A NULL
    * predicate result counts as a VIOLATION (the conservative gate:
    * "not provably valid"), mirroring SQL constraint semantics is
    * explicitly NOT wanted here — a crawl gate must flag unknowns. */
  def checkRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "checkRules: at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      "checkRules: duplicate rule names")
    val counters = rules.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(name)
    }
    val one = df.agg(counters.head, counters.tail: _*)
    val pairs = rules.map { case (name, _) =>
      struct(lit(name).as("rule"), coalesce(col(name), lit(0L)).as("n_violations"))
    }
    one.select(explode(array(pairs: _*)).as("_r")).select("_r.rule", "_r.n_violations")
  }

  /** Key-uniqueness check: `n_violations` = number of ROWS whose key
    * occurs more than once (so two copies of one key count 2 — the
    * rows you would have to quarantine). */
  def checkUnique(df: DataFrame, keys: Seq[String], rule: String = ""): DataFrame = {
    require(keys.nonEmpty, "checkUnique: at least one key column")
    val name = if (rule.nonEmpty) rule else s"unique(${keys.mkString(",")})"
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_c"))
      .agg(coalesce(sum(when(col("_c") > 1, col("_c")).otherwise(0L)), lit(0L))
        .as("n_violations"))
      .select(lit(name).as("rule"), col("n_violations"))
  }

  /** Referential-integrity check: `n_violations` = fact rows whose
    * `fkCol` has no match in `dim(dimKey)` (NULL FKs excluded — add a
    * [[checkRules]] not-null rule when NULLs are themselves invalid). */
  def checkForeignKey(fact: DataFrame, fkCol: String, dim: DataFrame,
                      dimKey: String, rule: String = "",
                      broadcastDim: Boolean = true): DataFrame = {
    val name = if (rule.nonEmpty) rule else s"fk($fkCol->$dimKey)"
    val keys0 = dim.select(col(dimKey).as(fkCol)).distinct()
    val keys = if (broadcastDim) broadcast(keys0) else keys0
    fact.filter(col(fkCol).isNotNull)
      .join(keys, Seq(fkCol), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("rule"), col("n_violations"))
  }

  /** ANALYZE-style column profile: the statistics a pipeline records
    * about a new dump before setting gate thresholds — one row per
    * profiled column: (col_name, n_rows, n_nulls, null_frac,
    * n_distinct). `n_distinct` is EXACT (per-column count-distinct;
    * Catalyst expands multiple distinct aggregates over a single scan)
    * and, per SQL semantics, excludes NULLs; swap in
    * [[Sketch.kmvDistinct]] when an estimate suffices at extreme
    * cardinalities.
    *
    * Scale shape: ONE scan — every null counter is a codegen'd
    * conditional sum and the distinct counts share the expanded
    * aggregate; the result is |cols| rows however large the input.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile: at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columnProfile: no such column(s): ${missing.mkString(", ")}")
    val aggs = count(lit(1)).as("_n") +: cols.flatMap { c => Seq(
      sum(col(c).isNull.cast(LongType)).as(s"_nn_$c"),
      countDistinct(col(c)).as(s"_nd_$c")) }
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"),
        coalesce(col(s"_nn_$c"), lit(0L)).as("n_nulls"),
        col(s"_nd_$c").as("n_distinct"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("_n").as("n_rows"), explode(array(entries: _*)).as("_e"))
      .select(col("_e.col_name").as("col_name"), col("n_rows"),
        col("_e.n_nulls").as("n_nulls"),
        (col("_e.n_nulls").cast(DoubleType) / col("n_rows")).as("null_frac"),
        col("_e.n_distinct").as("n_distinct"))
  }

  /** Data-drift report between two dumps of the same table: the two
    * [[columnProfile]]s joined per column, with the deltas a
    * monitoring gate thresholds on — null-rate shift and cardinality
    * ratio. A new crawl whose null fraction jumps or whose distinct
    * count collapses gets quarantined BEFORE joining the corpus.
    * Output: (col_name, null_frac_a, null_frac_b, null_frac_delta,
    * n_distinct_a, n_distinct_b, distinct_ratio). Cost: the two
    * one-scan profiles + a |cols|-row join.
    */
  def profileDrift(a: DataFrame, b: DataFrame, cols: Seq[String]): DataFrame = {
    val pa = columnProfile(a, cols).select(col("col_name"),
      col("null_frac").as("null_frac_a"), col("n_distinct").as("n_distinct_a"))
    val pb = columnProfile(b, cols).select(col("col_name"),
      col("null_frac").as("null_frac_b"), col("n_distinct").as("n_distinct_b"))
    pa.join(pb, "col_name").select(col("col_name"),
      col("null_frac_a"), col("null_frac_b"),
      (col("null_frac_b") - col("null_frac_a")).as("null_frac_delta"),
      col("n_distinct_a"), col("n_distinct_b"),
      (col("n_distinct_b").cast(DoubleType) / col("n_distinct_a"))
        .as("distinct_ratio"))
  }

  /** k-anonymity / l-diversity audit over quasi-identifier columns —
    * the privacy gate a dataset passes before release (Sweeney 2002;
    * Machanavajjhala et al. 2007): every combination of
    * quasi-identifiers (the equivalence class) must contain at least
    * `k` records, and — l-diversity — at least `l` distinct values of
    * the sensitive attribute, or the class re-identifies individuals.
    * Output: one row per equivalence class with `class_size`,
    * `l_diversity` (exact distinct count of `sensitiveCol`), and the
    * two violation flags; release gates filter `violates_k OR
    * violates_l`, auditors keep the full report.
    *
    * Companion to [[graft.functions.TextFunctions.scrubPii]] (content
    * redaction) and [[Incremental.forget]] (deletion requests): this
    * is the STRUCTURAL leak check. Scale shape: one hash aggregate on
    * the quasi-identifier key — countDistinct is exact (the same
    * expand-based exact distinct every `nunique` here uses), no
    * second shuffle.
    */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                 k: Long, l: Long = 1L): DataFrame = {
    require(qiCols.nonEmpty, "kAnonymity: at least one quasi-identifier column")
    require(k >= 1 && l >= 1, s"kAnonymity: k and l must be >= 1, got k=$k l=$l")
    val missing = (qiCols :+ sensitiveCol).filterNot(df.columns.contains)
    require(missing.isEmpty, s"kAnonymity: no such column(s): ${missing.mkString(", ")}")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("l_diversity"))
      .select(qiCols.map(col) ++ Seq(col("class_size"), col("l_diversity"),
        (col("class_size") < k).as("violates_k"),
        (col("l_diversity") < l).as("violates_l")): _*)
  }

  /** Population-stability index between two snapshots of a discrete
    * column (the drift gate model-serving and dump-over-dump ingestion
    * both run; the numeric face bins first, e.g. `floor(value)`),
    * in the repo's floor-log2 quantization:
    * per category `contrib_q = (c_a·n_b − c_b·n_a) ·
    * (⌊log2 c_a·n_b⌋ − ⌊log2 c_b·n_a⌋)` with add-one smoothing over
    * the UNION of category domains (classic PSI is undefined on empty
    * bins) — both factors share sign, so contributions are ≥ 0 like
    * the real PSI terms, and everything is exact int64. The cross
    * products reach c·n ≤ n², exact while each snapshot stays under
    * ~3·10⁹ rows — beyond that, PSI a pre-aggregated/sampled slice
    * (drift gates run per partition-day, not per exabyte).
    * Output: one row per category `(category, c_a, c_b, contrib_q)`
    * plus the caller sums for the index; a large `contrib_q` names
    * WHICH category moved, which is what the alert needs anyway.
    *
    * Scale shape: one count aggregate per side (domain-bounded
    * outputs), a full outer join of the two small count tables, two
    * 1-row totals broadcast back. Raw rows are scanned once each.
    */
  def populationStability(a: DataFrame, b: DataFrame,
                          keyCol: String): DataFrame = {
    require(a.columns.contains(keyCol) && b.columns.contains(keyCol),
      s"populationStability: no such column: $keyCol")
    def counts(df: DataFrame, out: String) =
      df.groupBy(col(keyCol).as("category")).agg(count(lit(1)).as(out))
    def ilog2(c: Column) = (length(bin(c)) - 1).cast(LongType)
    val joined = counts(a, "_ca").join(counts(b, "_cb"), Seq("category"), "full_outer")
      .select(col("category"),
        (coalesce(col("_ca"), lit(0L)) + 1L).as("c_a"),
        (coalesce(col("_cb"), lit(0L)) + 1L).as("c_b"))
    val totals = joined.agg(sum(col("c_a")).as("_na"), sum(col("c_b")).as("_nb"))
    joined.crossJoin(broadcast(totals))
      .select(col("category"), col("c_a"), col("c_b"),
        ((col("c_a") * col("_nb") - col("c_b") * col("_na")) *
          (ilog2(col("c_a") * col("_nb")) - ilog2(col("c_b") * col("_na"))))
          .as("contrib_q"))
  }

  /** Benford weight table: `w_d = round(2^20 · log10(1 + 1/d))` for
    * leading digits 1..9 — computed once and embedded as literals in
    * both the operator and its oracle (the ndcgWeights pattern: the
    * law is a shared integer SPEC, never a per-engine libm log). */
  val BenfordWeights: Seq[Long] = (1 to 9).map(d =>
    math.round(1048576.0 * math.log10(1.0 + 1.0 / d)))

  /** Benford leading-digit audit of a positive 2-decimal metric — the
    * fabricated-data / unit-mixup screen: observed counts per leading
    * digit vs the Benford expectation, deviation as the exact integer
    * cross product `dev_q = c_d·2^20 − n·w_d` (positive = excess).
    * The leading digit comes from the CENTI-integer's decimal string —
    * no float log10 anywhere. Non-positive values are excluded (the
    * law only covers positive magnitudes). Output per digit:
    * `(digit, n_obs, dev_q)`.
    *
    * Scale shape: one scan → 9-row aggregate; the total re-aggregates
    * those 9 rows.
    */
  /** Two-sample Kolmogorov–Smirnov distance between the `valueCol`
    * distributions of two slices — the NUMERIC drift monitor beside
    * [[populationStability]]'s categorical one (has this metric's
    * whole distribution moved between snapshots / segments?). The
    * statistic is the sup-norm ECDF gap, computed EXACTLY in the
    * cross-multiplied form: over the union of distinct centi values,
    *
    *   D·n_a·n_b = max_v |cum_a(v)·n_b − cum_b(v)·n_a|
    *
    * with all counts exact integers (DECIMAL(38,0) products — n_a·n_b
    * overflows int64 past ~3·10⁹ rows per side), ONE final IEEE
    * division. Identical slices give exactly 0; NULL values are
    * excluded. Output: one row `(n_a, n_b, ks_d)`; NULL when either
    * side is empty (undefined, the [[Eval.auc]] contract).
    *
    * Scale shape: the value-counting contract — one per-(side, value)
    * count shuffle per slice; the running ECDFs window over the
    * DISTINCT-value union (value-domain-bounded, never the corpus);
    * one 1-row reduce. */
  def ksTwoSample(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val D38 = DecimalType(38, 0)
    def cent(df: DataFrame) = df
      .filter(col(valueCol).isNotNull)
      .select((col(valueCol).cast(DecimalType(18, 2)) * 100).cast(LongType).as("_v"))
    val ca = cent(a).groupBy(col("_v")).agg(count(lit(1)).as("_ca"))
      .withColumn("_cb", lit(0L))
    val cb = cent(b).groupBy(col("_v")).agg(count(lit(1)).as("_cb"))
      .withColumn("_ca", lit(0L))
    val pts = ca.select(col("_v"), col("_ca"), col("_cb"))
      .unionByName(cb.select(col("_v"), col("_ca"), col("_cb")))
      .groupBy(col("_v"))
      .agg(sum(col("_ca")).as("_ka"), sum(col("_cb")).as("_kb"))
    val w = Window.orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val whole = Window.partitionBy()
    pts
      .withColumn("_cuma", sum(col("_ka")).over(w))
      .withColumn("_cumb", sum(col("_kb")).over(w))
      .withColumn("_na", sum(col("_ka")).over(whole))
      .withColumn("_nb", sum(col("_kb")).over(whole))
      .agg(max(col("_na")).as("n_a"), max(col("_nb")).as("n_b"),
        max(abs(col("_cuma").cast(D38) * col("_nb").cast(D38) -
          col("_cumb").cast(D38) * col("_na").cast(D38))).as("_d"))
      .select(col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0,
          col("_d").cast(DoubleType) /
            (col("n_a").cast(DoubleType) * col("n_b").cast(DoubleType)))
          .as("ks_d"))
  }

  def benford(df: DataFrame, valueCol: String): DataFrame = {
    require(df.columns.contains(valueCol), s"benford: no such column: $valueCol")
    val centi = (col(valueCol).cast(DecimalType(18, 2)) * 100).cast(LongType)
    val digit = substring(centi.cast(StringType), 1, 1).cast(LongType)
    val wArr = array(BenfordWeights.map(lit): _*)
    val counts = df.filter(centi > 0)
      .groupBy(digit.as("digit"))
      .agg(count(lit(1)).as("n_obs"))
    val total = counts.agg(sum(col("n_obs")).as("_n"))
    counts.crossJoin(broadcast(total))
      .select(col("digit"), col("n_obs"),
        (col("n_obs") * lit(1048576L) -
          col("_n") * element_at(wArr, col("digit").cast(IntegerType)))
          .as("dev_q"))
  }

  /** t-closeness audit (Li, Li, Venkatasubramanian 2007) for a
    * CATEGORICAL sensitive attribute: per equivalence class (the
    * quasi-identifier combination), the total-variation distance
    * between the class's sensitive-value distribution and the global
    * one, `TV = ½ Σ_v |p_class(v) − p_global(v)|`, must stay ≤ t or
    * the class leaks the attribute even when k/l-anonymity hold.
    *
    * Exactness: the distance is computed entirely in cross-multiplied
    * integer arithmetic — with class counts `c_v` (class size n),
    * global counts `g_v` (total N):
    * `TV = (Σ_{v∈class} |c_v·N − g_v·n|  +  (N − Σ_{v∈class} g_v)·n) / (2·n·N)`
    * (the second term folds every value ABSENT from the class without
    * materializing the class × full-domain outer join). Products ride
    * DECIMAL(38,0), so the identity holds to corpus sizes far beyond
    * int64 (N ~ 1e12 squared would wrap a long).
    *
    * Scale shape: one aggregate per (class, value) — domain-bounded,
    * NOT row-bounded, after the first map-side combine — plus a
    * |domain|-row broadcast of the global counts and a 1-row total.
    * Nothing beyond the first partial aggregate is proportional to
    * input rows.
    */
  def tCloseness(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
                 t: Double): DataFrame = {
    require(qiCols.nonEmpty, "tCloseness: at least one quasi-identifier column")
    require(t >= 0 && t <= 1, s"tCloseness: t must be in [0,1], got $t")
    val missing = (qiCols :+ sensitiveCol).filterNot(df.columns.contains)
    require(missing.isEmpty, s"tCloseness: no such column(s): ${missing.mkString(", ")}")
    val B = DecimalType(38, 0)
    val global = df.groupBy(col(sensitiveCol).as("_v"))
      .agg(count(lit(1)).as("_gv"))
    val total = global.agg(sum(col("_gv")).as("_n_total"))
    val classValue = df.groupBy((qiCols.map(col) :+ col(sensitiveCol).as("_v")): _*)
      .agg(count(lit(1)).as("_cv"))
    val qiC = qiCols.map(col)
    // class sizes via a window over the ALREADY-AGGREGATED (class,
    // value) counts — domain-bounded rows, so the window is cheap and
    // saves a second scan-side aggregate
    val w = org.apache.spark.sql.expressions.Window.partitionBy(qiC: _*)
    classValue
      .withColumn("_n_class", sum(col("_cv")).over(w))
      .join(broadcast(global), "_v")
      .crossJoin(broadcast(total))
      .groupBy(qiC: _*)
      .agg(
        first(col("_n_class")).as("class_size"),
        sum(abs(col("_cv").cast(B) * col("_n_total").cast(B) -
          col("_gv").cast(B) * col("_n_class").cast(B))).as("_num_present"),
        sum(col("_gv")).as("_g_present"),
        first(col("_n_total")).as("_n_total"))
      .select(qiC ++ Seq(
        col("class_size"),
        ((col("_num_present") +
          (col("_n_total").cast(B) - col("_g_present").cast(B)) * col("class_size").cast(B))
          .cast(DoubleType) /
          (lit(2.0) * col("class_size") * col("_n_total"))).as("tv_distance")): _*)
      .withColumn("violates_t", col("tv_distance") > t)
  }
}
