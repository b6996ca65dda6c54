package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`). North-star extension (BASELINE.json).
  *
  * Scale design:
  *  - [[bruteForceTopK]] is the exact baseline: |Q| × |corpus| partial
  *    work, distributed as a broadcast of the (small) query set against
  *    the corpus scan — linear in corpus size, no corpus self-shuffle.
  *  - [[lshTopK]] (random hyperplane signs) and [[ivfTopK]] (coarse
  *    partition) bound the candidate set per query, turning the scan
  *    into a bucket-local join — the 100 TB path.
  *
  * Dot products cast each float to double BEFORE multiplying and fold
  * left-to-right, so results are bit-identical across engines (oracle-
  * comparable without rounding).
  */
object Similarity {

  /** left-fold dot product in double precision — native codegen'd kernel
    * (bit-identical to the `zip_with`+`aggregate` HOF formulation, but
    * inside whole-stage codegen; see [[graft.plans.DotProduct]]).
    */
  def dot(a: Column, b: Column): Column = graft.plans.DotProduct(a, b)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** cosine similarity, single-pass native kernel (bit-identical to
    * dot/(‖a‖·‖b‖) with left-to-right double folds).
    */
  def cosine(a: Column, b: Column): Column = graft.plans.CosineSimilarity(a, b)

  /** two-stage distributed ranking shared by every search variant: a
    * bounded [[graft.plans.TopKByScore]] aggregate keeps the best k
    * candidates per query INSIDE the partial (map-side) aggregate, so
    * the exchange carries ≤ k rows per (query, map partition) and no
    * task ever sorts a query's full candidate set. The previous
    * `row_number().over(Window.partitionBy(q_id))` formulation funneled
    * every candidate for a query through ONE task — for brute force
    * that is a single-task sort of the whole corpus per query.
    * Candidates with NULL score (zero-norm / malformed vectors) are
    * dropped rather than ranked last; a query whose candidates ALL score
    * NULL (e.g. a zero-norm query vector) is therefore ABSENT from the
    * result, not emitted with null neighbors. Ids ride the aggregate
    * with their OWN type — integral or string both work (output c_id
    * mirrors the id type); integral surrogates remain the scale
    * preference (8 bytes/entry on the exchange vs a 36-byte UUID).
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("q_id"))
      .agg(graft.plans.TopKByScore(col("cos"), col("c_id"), k).as("_top"))
      .select(col("q_id"), posexplode(col("_top")))
      .select(col("q_id"), (col("pos") + 1).as("rank"),
        col("col.c_id").as("c_id"), col("col.cos").as("cos"))

  /** exact top-k cosine neighbors for each query id.
    * The query side is expected to be small → broadcast; the corpus is
    * scanned once; ranking is the bounded two-stage [[rankTopK]].
    */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, k: Int,
                     vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("qv")))
    val c = emb.select(col(idCol).as("c_id"), col(vecCol).as("cv"))
    val scored = q.join(c, col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), cosine(col("qv"), col("cv")).as("cos"))
    rankTopK(scored, k)
  }

  /** IVF-style coarse search: restrict candidates to the query's coarse
    * partition (here an existing cluster/label column; in a full system
    * the assignment comes from a trained coarse quantizer).
    */
  def ivfTopK(emb: DataFrame, queries: DataFrame, k: Int, coarseCol: String,
              vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("q_id"),
      col(coarseCol).as("q_blk"), col(vecCol).as("qv")))
    val c = emb.select(col(idCol).as("c_id"), col(coarseCol).as("c_blk"), col(vecCol).as("cv"))
    val scored = q.join(c, col("q_blk") === col("c_blk") && col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), cosine(col("qv"), col("cv")).as("cos"))
    rankTopK(scored, k)
  }

  /** Deterministic k-means (Lloyd's) coarse quantizer for IVF — the
    * "trained" path ([[ivfTopK]] then partitions on the learned
    * assignment instead of a pre-existing label).
    *
    * Determinism across engines/partitionings is engineered, not hoped
    * for: vectors are quantized to integers (`floor(x · 2^20)` in double,
    * exact for float inputs), so distances and centroid updates are pure
    * int64 arithmetic — no float-summation order sensitivity — and the
    * argmin tiebreaks on centroid id. That makes the whole training loop
    * expressible in the DuckDB oracle (differential-tested), which no
    * RNG-seeded trainer could be. Init = the first k vectors by id.
    *
    * Scale shape per iteration: centroids broadcast (k rows) against a
    * corpus scan, argmin via a `min_by` aggregate (the k candidate rows
    * per vector partial-aggregate to 1 MAP-SIDE, so the exchange moves N
    * rows — the earlier row_number-window form shuffled and sorted k×N),
    * and a k-group aggregate — no corpus self-join, no unbounded state.
    */
  def kmeansAssign(emb: DataFrame, k: Int, iters: Int, dim: Int,
                   vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame =
    kmeansTrain(emb, k, iters, dim, vecCol, idCol)._1

  /** [[kmeansAssign]] plus the centroids `(cid, cv)` the FINAL
    * assignment was computed against (each Lloyd's round assigns against
    * the incoming centroids, then updates them — the post-update set
    * describes no row's cell). `cv` is in the trainer's `floor(x·2^20)`
    * integer quantization, so probe-time distances ([[ivfTopKProbe]])
    * replay exactly the geometry that defined the cells.
    */
  def kmeansTrain(emb: DataFrame, k: Int, iters: Int, dim: Int,
                  vecCol: String = "embedding", idCol: String = "vec_id"): (DataFrame, DataFrame) = {
    require(k > 0 && iters > 0, "kmeansAssign: k and iters must be positive")
    val S = 1L << 20
    val qvExpr = transform(col(vecCol),
      x => floor(x.cast(DoubleType) * S).cast(LongType))
    val base = emb.select(col(idCol), qvExpr.as("qv"))
    // seeds = FIRST k vectors by id (TakeOrdered of k rows) — robust to
    // sparse/offset id spaces, where an `id < k` filter would silently
    // yield fewer than k (possibly zero) centroids (ADVICE r03). A corpus
    // with fewer than k vectors legitimately trains that many centroids.
    var cents = base.orderBy(col(idCol)).limit(k)
      .select(col(idCol).cast(LongType).as("cid"), col("qv").as("cv"))
    var assigned: DataFrame = base.select(col(idCol), col("qv"), lit(0L).as("cid"))
    // checkpoint retirement lags ONE round: the (lazy) `assigned` of round
    // i still references round i-1's centroid blocks, so only the round
    // i-2 checkpoint is garbage when round i completes. k tiny rows each,
    // but the no-leak pattern should match Cluster.connectedComponents.
    var retirable: DataFrame = null
    for (_ <- 1 to iters) {
      // pure-int64 squared distance, native kernel: exact in any engine
      // and any order (the unrolled element_at sum it replaces compiled a
      // dim-term expression tree per stage; same integers either way, so
      // the DuckDB oracle replay is untouched)
      val dist = graft.plans.QuantizedL2(col("qv"), col("cv"))
      // argmin over the k broadcast candidates; ordering struct is unique
      // per (vector, cid) so the cid-tiebreak is engine-deterministic
      assigned = base.crossJoin(broadcast(cents))
        .withColumn("_d", dist)
        .groupBy(col(idCol))
        .agg(min_by(struct(col("qv"), col("cid")), struct(col("_d"), col("cid"))).as("_b"))
        .select(col(idCol), col("_b.qv").as("qv"), col("_b.cid").as("cid"))
      // integer centroid update: floor(Σ qv / n) per dimension (sums fit
      // int64: |qv| < 2^21, so even 2^31 rows stay under 2^52; the double
      // division is exact below 2^53)
      val sums = (0 until dim).map(i =>
        floor(sum(element_at(col("qv"), i + 1)).cast(DoubleType) / count(lit(1)))
          .cast(LongType).as(s"_c$i"))
      val fresh = assigned.groupBy(col("cid"))
        .agg(sums.head, sums.tail: _*)
        .select(col("cid"), array((0 until dim).map(i => col(s"_c$i")): _*).as("cv"))
      // a centroid whose cluster went empty emits NO row from the update
      // aggregate; carry it forward unchanged (k-row left join) so k never
      // silently shrinks — reachable when duplicate vectors sit among the
      // seeds, since ties all break to the lowest cid
      val prev = cents
      cents = cents.select(col("cid"), col("cv").as("_prev"))
        .join(fresh.select(col("cid"), col("cv").as("_new")), Seq("cid"), "left")
        .select(col("cid"), coalesce(col("_new"), col("_prev")).as("cv"))
        // k tiny rows, but checkpointing them truncates the lineage so
        // the plan stays one round deep however many iterations run
        // (each round otherwise nests the previous crossJoin+agg)
        .localCheckpoint(true)
      if (retirable ne null) org.apache.spark.sql.GraftBridge.releaseCheckpoint(retirable)
      retirable = prev
    }
    // `retirable` holds the centroids the LAST assignment ran against
    // (the loop updates cents after assigning); non-null since iters ≥ 1
    (assigned.select(col(idCol), col("cid")), retirable)
  }

  /** Multi-probe IVF: each query searches its `nprobe` NEAREST coarse
    * cells instead of only the closest — the production recall knob for
    * IVF indexes. Scale shape: the probe assignment is a k-row broadcast
    * against the (small) query set, the corpus keeps its single
    * partition-cell assignment, and the candidate join stays
    * cell-local — candidates grow by at most nprobe×, never to a full
    * scan. Distances replay the trainer's exact integer quantization
    * (`floor(x·2^20)` + [[graft.plans.QuantizedL2]], cid tiebreak), so
    * the probe choice is engine-deterministic and oracle-replayable.
    */
  def ivfTopKProbe(emb: DataFrame, queries: DataFrame, k: Int, nprobe: Int,
                   centroids: DataFrame, coarseCol: String,
                   vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    require(nprobe > 0, "ivfTopKProbe: nprobe must be positive")
    val S = 1L << 20
    val qv = transform(col(vecCol), x => floor(x.cast(DoubleType) * S).cast(LongType))
    // rank the k centroids per query by exact integer L2 and keep
    // nprobe. A row_number window is fine HERE: the partition is k rows
    // per query on the already-broadcast-small query side, so the
    // "window funnels everything through one task" concern that bans
    // windows from corpus-side ranking does not apply.
    val qq = queries.select(col(idCol).as("q_id"), col(vecCol).as("qvf"), qv.as("qq"))
    val ranked = qq.crossJoin(broadcast(centroids))
      .withColumn("_d", graft.plans.QuantizedL2(col("qq"), col("cv")))
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("_d"), col("cid"))))
      .filter(col("_rn") <= nprobe)
      .select(col("q_id"), col("qvf"), col("cid").as("q_blk"))
    val c = emb.select(col(idCol).as("c_id"), col(coarseCol).as("c_blk"), col(vecCol).as("cv2"))
    val scored = broadcast(ranked).join(c,
        col("q_blk") === col("c_blk") && col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), cosine(col("qvf"), col("cv2")).as("cos"))
    rankTopK(scored, k)
  }

  /** deterministic pseudo-random hyperplanes (shared constants; public so
    * the DuckDB oracle SQL can be generated from the same values).
    */
  def hyperplane(seed: Int, dim: Int): Seq[Double] =
    (0 until dim).map { j =>
      // xorshift-free LCG on (seed, j): deterministic, engine-free (Scala-side)
      val x = (seed * 1103515245L + j * 12345L + 6789L) % 2147483647L
      (x.toDouble / 2147483647.0) * 2.0 - 1.0
    }

  /** sign-bit LSH bucket id per row: nBits hyperplane sign bits. */
  def lshBucket(vec: Column, dim: Int, nBits: Int): Column = {
    val bits = (0 until nBits).map { i =>
      val h = array(hyperplane(i + 1, dim).map(lit): _*)
      when(dot(vec, h) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** ANN via sign-LSH: candidates share the query's bucket. Recall is
    * tested against [[bruteForceTopK]] in the unit suite.
    */
  def lshTopK(emb: DataFrame, queries: DataFrame, k: Int, dim: Int, nBits: Int = 8,
              vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val withB = emb.select(col(idCol), col(vecCol),
      lshBucket(col(vecCol), dim, nBits).as("bucket"))
    val q = broadcast(withB.join(queries.select(col(idCol)), Seq(idCol))
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"), col("bucket")))
    val c = withB.select(col(idCol).as("c_id"), col(vecCol).as("cv"), col("bucket"))
    val scored = q.join(c, Seq("bucket")).filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), cosine(col("qv"), col("cv")).as("cos"))
    rankTopK(scored, k)
  }

  /** Multi-probe sign-LSH: each query also probes every bucket at
    * Hamming distance 1 from its own (bucket XOR one sign bit) — the
    * standard recall-vs-cost knob for sign LSH. A near neighbor that
    * landed on the wrong side of ONE hyperplane is recovered; the
    * candidate set grows by at most (nBits+1)× and stays bucket-local,
    * so the 100 TB shape is unchanged: the (small) query side explodes
    * to nBits+1 probe rows BEFORE the broadcast, the corpus is neither
    * re-bucketed nor re-scanned per probe, and each (query, candidate)
    * pair can match at most once (a candidate lives in exactly one
    * bucket). Recall ≥ single-probe [[lshTopK]] by construction
    * (probe set is a superset) — asserted in the unit suite.
    */
  def lshTopKProbe(emb: DataFrame, queries: DataFrame, k: Int, dim: Int,
                   nBits: Int = 8, vecCol: String = "embedding",
                   idCol: String = "vec_id"): DataFrame = {
    val withB = emb.select(col(idCol), col(vecCol),
      lshBucket(col(vecCol), dim, nBits).as("bucket"))
    val masks = array((lit(0L) +: (0 until nBits).map(i => lit(1L << i))): _*)
    val q = broadcast(withB.join(queries.select(col(idCol)), Seq(idCol))
      .select(col(idCol).as("q_id"), col(vecCol).as("qv"),
        explode(transform(masks, m => col("bucket").bitwiseXOR(m))).as("bucket")))
    val c = withB.select(col(idCol).as("c_id"), col(vecCol).as("cv"), col("bucket"))
    val scored = q.join(c, Seq("bucket")).filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), cosine(col("qv"), col("cv")).as("cos"))
    rankTopK(scored, k)
  }
}
