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
  * Scale shape: the DATA-proportional work is one exploded self-join
  * per (id) producing d² partial products, partial-aggregated map-side
  * to the d×d Gram — the [[Tensor.tensordot]] self-contraction. The
  * d×d scatter matrix (4096 entries at d=64, 1M at d=1024) is
  * DIMENSION-bounded, not data-bounded, so the driver-side power loop
  * is the broadcast-centroids pattern, not a collect of data. Nothing
  * else leaves the executors.
  */
object Pca {

  /** Leading principal axis of `vecCol` (array<float/double>) as
    * `(d, loading)` rows, `loading = v_d / vscale` with `|v|`
    * max-normalized to vscale and the sign fixed so the
    * largest-|loading| component is positive (smallest index on ties).
    */
  /** quantized coordinate explosion shared by the axis solve and the
    * projection: (_id, _i, _q) with `_q = floor(x · qscale)`. */
  private def quantize(emb: DataFrame, vecCol: String, idCol: String,
                       qscale: Long): DataFrame =
    emb.select(col(idCol).as("_id"), posexplode(col(vecCol)))
      .select(col("_id"), col("pos").as("_i"),
        floor(col("col").cast(DoubleType) * qscale).cast(LongType).as("_q"))

  /** the sign-fixed integer axis (|v| max-normalized to vscale), as the
    * driver-side array both public faces share. */
  private def axisVector(coo: DataFrame, n: Long, iters: Int,
                         vscale: Long): Array[BigInt] = {
    val B = DecimalType(38, 0)
    val a = coo.select(col("_id"), col("_i").as("_ai"), col("_q").as("_aq"))
    val b = coo.select(col("_id"), col("_i").as("_bi"), col("_q").as("_bq"))
    val gram = a.join(b, "_id")
      .groupBy(col("_ai"), col("_bi"))
      .agg(sum((col("_aq").cast(B) * col("_bq").cast(B))).as("_g"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        BigInt(r.getDecimal(2).toBigInteger)).toMap
    val sums = coo.groupBy(col("_i")).agg(sum(col("_q").cast(B)).as("_s"))
      .collect().map(r => r.getInt(0) -> BigInt(r.getDecimal(1).toBigInteger)).toMap
    val d = sums.keys.max + 1
    val bigN = BigInt(n)
    def S(i: Int, j: Int): BigInt =
      bigN * gram.getOrElse((i, j), BigInt(0)) - sums(i) * sums(j)
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

  def topComponent(emb: DataFrame, vecCol: String, idCol: String,
                   iters: Int = 8, qscale: Long = 1L << 20,
                   vscale: Long = 1L << 20): DataFrame = {
    require(iters > 0, s"Pca.topComponent: iters must be positive, got $iters")
    val spark = emb.sparkSession
    val coo = quantize(emb, vecCol, idCol, qscale)
    val n = emb.count()
    require(n > 0, "Pca.topComponent: empty input")
    val v = axisVector(coo, n, iters, vscale)
    val rows = v.indices.map(i => Row(i.toLong, v(i).toDouble / vscale))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("d", LongType, nullable = false),
        StructField("loading", DoubleType, nullable = false))))
  }

  /** Project every vector onto the leading axis: `(id, score)` with
    * `score = Σᵢ qᵢ·vᵢ / (qscale·vscale)` — the 1-D embedding a
    * curriculum sampler or coarse index sorts by. The axis solves
    * driver-side as in [[topComponent]]; the projection itself is one
    * broadcast join of the d-row axis against the quantized explosion
    * + one partial-agg sum per id (integer until the final exact
    * power-of-two division, so cross-engine bit-stable).
    */
  def projectTop(emb: DataFrame, vecCol: String, idCol: String,
                 iters: Int = 8, qscale: Long = 1L << 20,
                 vscale: Long = 1L << 20): DataFrame = {
    require(iters > 0, s"Pca.projectTop: iters must be positive, got $iters")
    val spark = emb.sparkSession
    val coo = quantize(emb, vecCol, idCol, qscale)
    val n = emb.count()
    require(n > 0, "Pca.projectTop: empty input")
    val v = axisVector(coo, n, iters, vscale)
    val axis = spark.createDataFrame(
      spark.sparkContext.parallelize(
        v.indices.map(i => Row(i, v(i).toLong)), 1),
      StructType(Seq(StructField("_i", IntegerType, nullable = false),
        StructField("_v", LongType, nullable = false))))
    coo.join(broadcast(axis), "_i")
      .groupBy(col("_id"))
      // |q·v| ≤ 2^20·2^20·d — exact int64 for d up to 2^23
      .agg(sum(col("_q") * col("_v")).as("_sq"))
      .select(col("_id").as(idCol),
        (col("_sq").cast(DoubleType) /
          (qscale.toDouble * vscale.toDouble)).as("score"))
  }
}
