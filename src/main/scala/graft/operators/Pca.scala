package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Principal-component extraction over an embedding column — the
  * dimensionality-reduction / whitening step an embedding pipeline runs
  * before indexing or clustering (reference has no array-analytics
  * analogue; this extends the engine's embedding family alongside
  * [[Similarity]] and [[Tensor]]).
  *
  * Determinism recipe (the [[Behavior.stationaryDist]] /
  * integer-power-iteration pattern, applied to eigenvectors):
  * embeddings quantize to integers (`floor(x · qscale)`), the scatter
  * matrix `S = n·Σ qqᵀ − ssᵀ` (n× the covariance, same eigenvectors)
  * is EXACT integer arithmetic, and each power-iteration round
  * renormalizes through the one operation both engines compute
  * identically: correctly-rounded integer→double conversion, an exact
  * power-of-two scale, one double division, `floor`. The result is
  * bit-reproducible on any engine/partitioning/retry — the same
  * property every other sketch in this repo buys with quantization.
  *
  * Scale shape: the DATA-proportional work is the Gram pass — a per-row
  * DOUBLE EXPLOSION of the quantized vector's upper triangle (d(d+1)/2
  * long products per row generated map-side, partial-aggregated to
  * ≤ d(d+1)/2 rows per partition; the symmetric mirror fills in on the
  * driver), so the ONLY exchange anywhere is the d×d-group final
  * aggregate. No join, no
  * shuffle of row-proportional data. The d×d scatter matrix (4096
  * entries at d=64, 1M at d=1024) is DIMENSION-bounded, not
  * data-bounded, so the driver-side power loop is the
  * broadcast-centroids pattern, not a collect of data.
  */
object Pca {

  /** one row per vector with the quantized array `_qv` (and `_id`):
    * the frame every pass derives from. */
  private def quantizeArr(emb: DataFrame, vecCol: String, idCol: String,
                          qscale: Long): DataFrame =
    emb.select(col(idCol).as("_id"),
      transform(col(vecCol), x =>
        floor(x.cast(DoubleType) * qscale).cast(LongType)).as("_qv"))

  /** the sign-fixed integer axis (|v| max-normalized to vscale), as the
    * driver-side array both public faces share. `qdf` = quantizeArr
    * output. */
  /** the exact-integer scatter matrix as a driver-side function
    * `(i, j) → S(i,j)`, plus the dimension. */
  private def scatterFn(qdf: DataFrame, n: Long): ((Int, Int) => BigInt, Int) = {
    val B = DecimalType(38, 0)
    // Gram via per-row explosion of the UPPER TRIANGLE only (slice from
    // _ai keeps j >= i): S is symmetric, so generating d(d+1)/2 rows per
    // vector instead of d² halves the dominant data-proportional pass;
    // the mirror entries fill in driver-side below. The per-row product
    // runs in LONG (exact: the quantize pass enforces |q| < 2^31.5, see
    // quantizeArr's guard path via countedUnique) and only the
    // ACCUMULATION is decimal — one decimal op per row instead of three.
    val upper = qdf
      .select(col("_qv"), posexplode(col("_qv")).as(Seq("_ai", "_aq")))
      .select(col("_ai"),
        posexplode(slice(col("_qv"), col("_ai") + 1,
          size(col("_qv")) - col("_ai"))).as(Seq("_boff", "_bq")),
        col("_aq"))
      .groupBy(col("_ai"), (col("_ai") + col("_boff")).cast(IntegerType).as("_bi"))
      .agg(sum((col("_aq") * col("_bq")).cast(B)).as("_g"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        BigInt(r.getDecimal(2).toBigInteger)).toMap
    val gram = upper ++ upper.map { case ((i, j), v) => (j, i) -> v }
    val sums = qdf.select(posexplode(col("_qv")).as(Seq("_i", "_q")))
      .groupBy(col("_i")).agg(sum(col("_q").cast(B)).as("_s"))
      .collect().map(r => r.getInt(0) -> BigInt(r.getDecimal(1).toBigInteger)).toMap
    val d = sums.keys.max + 1
    val bigN = BigInt(n)
    ((i, j) => bigN * gram.getOrElse((i, j), BigInt(0)) - sums(i) * sums(j), d)
  }

  private def powerVector(S: (Int, Int) => BigInt, d: Int, iters: Int,
                          vscale: Long): Array[BigInt] = {
    var v = Array.fill(d)(BigInt(vscale))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(d)(i =>
        (0 until d).foldLeft(BigInt(0))((acc, j) => acc + S(i, j) * v(j)))
      val m = w.map(x => math.abs(x.toDouble)).max
      require(m > 0, "Pca: zero scatter matrix (constant input)")
      // the renorm both engines replay identically: correctly-rounded
      // BigInt→double, exact 2^k scale, one division, floor
      v = w.map(x => BigInt(math.floor(x.toDouble * vscale / m).toLong))
    }
    val top = v.indices.maxBy(i => (v(i).abs, -i))
    if (v(top).signum < 0) v.map(-_) else v
  }

  /** row count with the unique-id precondition ENFORCED: the oracle's
    * `nn` CTE counts DISTINCT ids while the scatter matrices sum over
    * rows, so a duplicated id would silently skew the mean-centering
    * term on one side only — fail loudly instead (one aggregate job,
    * same cost as the plain count). */
  private def countedUnique(qdf: DataFrame, what: String): Long = {
    // one aggregate job enforces BOTH preconditions: unique ids, and
    // quantized magnitudes small enough that the Gram pass's per-row
    // LONG product q_i·q_j cannot overflow (|q| ≤ ⌊√(2^63−1)⌋). min and
    // max are tracked separately so Long.MinValue (a saturated cast)
    // fails the min check instead of hiding behind abs() wraparound.
    val r = qdf.agg(count(lit(1)), count_distinct(col("_id")),
      max(aggregate(col("_qv"), lit(Long.MinValue), (a, x) => greatest(a, x))),
      min(aggregate(col("_qv"), lit(Long.MaxValue), (a, x) => least(a, x)))).head()
    val (n, ids) = (r.getLong(0), r.getLong(1))
    require(n == ids,
      s"Pca.$what: ${n - ids} duplicate id rows — ids must be unique " +
        "(the scatter matrix and the distinct-id count would diverge)")
    val qBound = 3037000499L // floor(sqrt(2^63 - 1))
    if (n > 0 && !r.isNullAt(2)) {
      val (maxQ, minQ) = (r.getLong(2), r.getLong(3))
      require(maxQ <= qBound && minQ >= -qBound,
        s"Pca.$what: quantized component outside ±$qBound (got [$minQ, " +
          s"$maxQ]) — the exact long product in the Gram pass would " +
          "overflow; lower qscale for inputs of this magnitude")
    }
    n
  }

  private def axisVector(qdf: DataFrame, n: Long, iters: Int,
                         vscale: Long): Array[BigInt] = {
    val (s, d) = scatterFn(qdf, n)
    powerVector(s, d, iters, vscale)
  }

  /** Leading principal axis of `vecCol` (array<float/double>) as
    * `(d, loading)` rows, `loading = v_d / vscale` with `|v|`
    * max-normalized to vscale and the sign fixed so the
    * largest-|loading| component is positive (smallest index on ties).
    */
  def topComponent(emb: DataFrame, vecCol: String, idCol: String,
                   iters: Int = 8, qscale: Long = 1L << 20,
                   vscale: Long = 1L << 20): DataFrame = {
    require(iters > 0, s"Pca.topComponent: iters must be positive, got $iters")
    val spark = emb.sparkSession
    // the quantized frame feeds three jobs (gram, sums, count)
    val qdf = quantizeArr(emb, vecCol, idCol, qscale).cache()
    val n = countedUnique(qdf, "topComponent")
    require(n > 0, "Pca.topComponent: empty input")
    val v = try axisVector(qdf, n, iters, vscale) finally qdf.unpersist()
    val rows = v.indices.map(i => Row(i.toLong, v(i).toDouble / vscale))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("d", LongType, nullable = false),
        StructField("loading", DoubleType, nullable = false))))
  }

  /** second axis via deflation-by-orthogonalization: each round
    * power-iterates `w ← S·v₂`, renorms, then projects out v₁ EXACTLY
    * in integers — `w ← w·(v₁ᵀv₁) − v₁·(v₁ᵀw)` — and renorms again, so
    * v₂ converges to the second eigenvector while staying a
    * deterministic pure function of the data. The orthogonalization
    * runs on RENORMED (≤ vscale) vectors so every intermediate stays
    * ≤ ~2^66 — inside the oracle's 128-bit HUGEINT (orthogonalizing
    * the raw ~2^99 power-iterate would overflow it). v₂ seeds from the
    * all-ones vector orthogonalized the same way. */
  private def secondVector(S: (Int, Int) => BigInt, v1: Array[BigInt],
                           iters: Int, vscale: Long): Array[BigInt] = {
    val d = v1.length
    val v1n = v1.foldLeft(BigInt(0))((a, x) => a + x * x)
    def orth(w: Array[BigInt]): Array[BigInt] = {
      val dot = v1.indices.foldLeft(BigInt(0))((a, i) => a + v1(i) * w(i))
      Array.tabulate(d)(i => w(i) * v1n - v1(i) * dot)
    }
    def renorm(w: Array[BigInt]): Array[BigInt] = {
      val m = w.map(x => math.abs(x.toDouble)).max
      require(m > 0, "Pca: degenerate second component (rank-1 scatter)")
      w.map(x => BigInt(math.floor(x.toDouble * vscale / m).toLong))
    }
    var v = renorm(orth(Array.fill(d)(BigInt(vscale))))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(d)(i =>
        (0 until d).foldLeft(BigInt(0))((acc, j) => acc + S(i, j) * v(j)))
      v = renorm(orth(renorm(w)))
    }
    val top = v.indices.maxBy(i => (v(i).abs, -i))
    if (v(top).signum < 0) v.map(-_) else v
  }

  /** Top TWO principal axes as `(d, loading1, loading2)` — the 2-D
    * embedding-map coordinates (corpus visualization, coarse 2-D
    * binning). Same determinism recipe; the second axis deflates via
    * [[secondVector]]'s exact integer orthogonalization.
    */
  def topComponents2(emb: DataFrame, vecCol: String, idCol: String,
                     iters: Int = 8, qscale: Long = 1L << 20,
                     vscale: Long = 1L << 20): DataFrame = {
    require(iters > 0, s"Pca.topComponents2: iters must be positive, got $iters")
    val spark = emb.sparkSession
    val qdf = quantizeArr(emb, vecCol, idCol, qscale).cache()
    val n = countedUnique(qdf, "topComponents2")
    require(n > 0, "Pca.topComponents2: empty input")
    val (v1, v2) = try {
      val (s, d) = scatterFn(qdf, n)
      val first = powerVector(s, d, iters, vscale)
      (first, secondVector(s, first, iters, vscale))
    } finally qdf.unpersist()
    val rows = v1.indices.map(i =>
      Row(i.toLong, v1(i).toDouble / vscale, v2(i).toDouble / vscale))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("d", LongType, nullable = false),
        StructField("loading1", DoubleType, nullable = false),
        StructField("loading2", DoubleType, nullable = false))))
  }

  /** Project every vector onto the leading axis: `(id, score)` with
    * `score = Σᵢ qᵢ·vᵢ / (qscale·vscale)` — the 1-D embedding a
    * curriculum sampler or coarse index sorts by. The axis solves
    * driver-side as in [[topComponent]]; the projection itself is a
    * shuffle-free per-row array fold against the broadcast axis
    * (integer until the final exact power-of-two division, so
    * cross-engine bit-stable).
    */
  def projectTop(emb: DataFrame, vecCol: String, idCol: String,
                 iters: Int = 8, qscale: Long = 1L << 20,
                 vscale: Long = 1L << 20): DataFrame = {
    require(iters > 0, s"Pca.projectTop: iters must be positive, got $iters")
    val qdf = quantizeArr(emb, vecCol, idCol, qscale).cache()
    val n = countedUnique(qdf, "projectTop")
    require(n > 0, "Pca.projectTop: empty input")
    val v = try axisVector(qdf, n, iters, vscale) finally qdf.unpersist()
    // per-row fold over zip(qv, axis-literal): no explode, no join, no
    // shuffle — the projection runs at scan speed
    val axisLit = array(v.map(x => lit(x.toLong)): _*)
    qdf.select(col("_id").as(idCol),
      (aggregate(
        zip_with(col("_qv"), axisLit, (q, a) => q * a),
        lit(0L), (acc, x) => acc + x).cast(DoubleType) /
        (qscale.toDouble * vscale.toDouble)).as("score"))
  }
}
