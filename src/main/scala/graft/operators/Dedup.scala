package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextFunctions._

/** Deduplication operators for training-data pipelines (north-star
  * extension; see BASELINE.json). Each variant is designed for 100 TB:
  *
  *  - exact: one hash-shuffle on a 128-bit digest — the canonical
  *    dedupe-by-content plan; group count scales with distinct keys.
  *  - minhash LSH: per-row signature (narrow, codegen'd), then a
  *    band-bucket shuffle whose fan-in is bounded by band-key
  *    collisions — never an all-pairs join. Candidates are verified
  *    with true jaccard before being declared duplicates.
  *  - simhash: per-row 28-bit signature; hamming-near pairs found by
  *    pigeonholed band equality, same bounded-shuffle property.
  *  - ngram-jaccard: exact pairwise within explicit blocks (use only
  *    with a blocking key that bounds block size).
  *  - embedding cosine: near-dup by vector similarity within blocks.
  *
  * All hashes are md5-derived (engine-portable) so every operator is
  * differentially tested against the DuckDB oracle at sf0.01.
  */
object Dedup {

  /** exact dedup: keep the smallest id per distinct normalized text.
    * Returns (fingerprint, keeper_id, n_copies).
    */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(fingerprintMd5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  // ---- MinHash LSH ----
  /** fixed permutation constants (mirrored into oracle SQL). */
  val MinhashP = 1000000007L
  val MinhashA: Seq[Long] = Seq(443, 971, 311, 653, 127, 811, 229, 577)
  val MinhashB: Seq[Long] = Seq(17, 89, 41, 233, 157, 11, 271, 97)
  val NumPerms = 8
  val BandRows = 2 // → 4 bands

  /** per-doc minhash signature over n-gram shingle hashes.
    * Output: idCol, sig array<long> of NumPerms values.
    */
  def minhashSignatures(docs: DataFrame, n: Int = 3,
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sh = array_distinct(shingles(col(textCol), n))
    val hs = transform(sh, t => tokenHash(t))
    val sigs = (0 until NumPerms).map { j =>
      array_min(transform(hs, h => (h * MinhashA(j) + MinhashB(j)) % MinhashP))
        .as(s"mh$j")
    }
    docs.select((col(idCol) +: sigs): _*)
  }

  /** LSH candidate pairs verified by true shingle-jaccard ≥ threshold.
    * Scale path: the only shuffles are (1) band-key exchange, (2) the
    * candidate join back to shingle sets — no all-pairs cross join.
    */
  def minhashPairs(docs: DataFrame, threshold: Double = 0.3, n: Int = 3,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sig = minhashSignatures(docs, n, textCol, idCol)
    val nBands = NumPerms / BandRows
    val bands = (0 until nBands).map { b =>
      val key = concat_ws("_",
        (0 until BandRows).map(r => col(s"mh${b * BandRows + r}")): _*)
      sig.select(col(idCol), lit(b).as("band"), key.as("bkey"))
    }.reduce(_ unionAll _)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
    val sh = docs.select(col(idCol),
      array_distinct(shingles(col(textCol), n)).as("sh"))
    cand
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b"))).cast(DoubleType)).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---- SimHash ----
  val SimhashBits = 28

  /** per-doc simhash over distinct-token hashes: bit i set iff the
    * majority of token hashes have bit i set.
    */
  def simhash(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val hs = transform(array_distinct(tokens(col(textCol))), t => tokenHash(t))
    val bits = (0 until SimhashBits).map { i =>
      when(aggregate(hs, lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)
      ) > 0, lit(1L << i)).otherwise(lit(0L))
    }
    docs.select(col(idCol), bits.reduce(_ + _).as("simhash"))
  }

  /** near-dup pairs with hamming(simhash) ≤ maxDist, found by pigeonhole:
    * split the signature into (maxDist+1) bands; equal band → candidate.
    */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sig = simhash(docs, textCol, idCol)
    val nBands = maxDist + 1
    val bandBits = SimhashBits / nBands
    val bands = (0 until nBands).map { b =>
      sig.select(col(idCol), lit(b).as("band"),
        shiftright(col("simhash"), b * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1)).as("bkey"),
        col("simhash"))
    }.reduce(_ unionAll _)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"),
        col("x.simhash").as("sh_a"), col("y.simhash").as("sh_b"))
      .distinct()
    // native codegen'd popcount(xor) — see graft.plans.HammingDistance
    cand.select(col("id_a"), col("id_b"),
        graft.plans.HammingDistance(col("sh_a"), col("sh_b")).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** exact n-gram jaccard pairs within blocks (blockCol bounds pair count). */
  def ngramJaccardPairs(docs: DataFrame, n: Int, threshold: Double, blockCol: String,
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sh = docs.select(col(idCol), col(blockCol),
      array_distinct(shingles(col(textCol), n)).as("sh"))
    sh.as("a").join(sh.as("b"),
        col(s"a.$blockCol") === col(s"b.$blockCol") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast(DoubleType) /
          size(array_union(col("a.sh"), col("b.sh"))).cast(DoubleType)).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** embedding near-dup: cosine ≥ threshold within a blocking key. */
  def embeddingNearDup(emb: DataFrame, threshold: Double, blockCol: String = "label",
                       vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(blockCol).as("blk"), col(vecCol).as("va"))
    val b = emb.select(col(idCol).as("id_b"), col(blockCol).as("blk"), col(vecCol).as("vb"))
    a.join(b, Seq("blk")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
