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
  *  - minhash LSH: per-row signature (narrow, codegen'd) computed ONCE,
  *    band keys emitted by a single `posexplode`, then one shuffle on
  *    (band, bkey); candidate pairs are generated inside each bucket —
  *    never an all-pairs join, never a per-band re-scan of the corpus.
  *    Candidates are verified with true jaccard before being declared
  *    duplicates.
  *  - simhash: per-row 28-bit signature; hamming-near pairs found by
  *    pigeonholed band equality, same single-pass/single-shuffle shape.
  *  - ngram-jaccard: exact jaccard verification over LSH-generated
  *    candidates (the scale-safe route); a blocked all-pairs variant
  *    exists only with an enforced block-size cap.
  *  - embedding cosine: near-dup via sign-LSH bucket candidates, then
  *    exact cosine verification — linear in corpus, not quadratic.
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
    * Output: idCol, mh0..mh{NumPerms-1}.
    */
  def minhashSignatures(docs: DataFrame, n: Int = 3,
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // materialize the shingle-hash array in its OWN projection: referenced
    // NumPerms times below, and Spark's CollapseProject refuses to inline a
    // non-cheap alias used more than once — so the tokenize→shingle→md5
    // chain runs ONCE per row instead of once per permutation.
    val hashed = docs.select(col(idCol),
      transform(array_distinct(shingles(col(textCol), n)), t => tokenHash(t)).as("_hs"))
    val sigs = (0 until NumPerms).map { j =>
      array_min(transform(col("_hs"), h => (h * MinhashA(j) + MinhashB(j)) % MinhashP))
        .as(s"mh$j")
    }
    hashed.select((col(idCol) +: sigs): _*)
  }

  /** candidate pairs from rows sharing any (band, bucket-key): one
    * shuffle on the bucket key, pairs generated inside each bucket from
    * the sorted member list — no self-join, so the upstream signature
    * pipeline runs exactly once. Bucket fan-in is bounded by band-key
    * collisions (tune bands/rows for the corpus; a pathological hot
    * bucket degrades this bucket only, not the whole plan).
    */
  private def bucketPairs(bands: DataFrame, idCol: String): DataFrame = {
    val buckets = bands.groupBy(col("band"), col("bkey"))
      .agg(array_sort(collect_set(col(idCol))).as("ids"))
      .filter(size(col("ids")) > 1)
    buckets.select(explode(flatten(transform(col("ids"),
        (a, i) => transform(slice(col("ids"), i + lit(2), size(col("ids"))),
          b => struct(a.as("id_a"), b.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
  }

  /** (id_a, id_b) candidate pairs via minhash banding — single pass. */
  def minhashCandidates(docs: DataFrame, n: Int = 3,
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sig = minhashSignatures(docs, n, textCol, idCol)
    val nBands = NumPerms / BandRows
    val bandArr = array((0 until nBands).map { b =>
      concat_ws("_", (0 until BandRows).map(r => col(s"mh${b * BandRows + r}")): _*)
    }: _*)
    val bands = sig.select(col(idCol), posexplode(bandArr).as(Seq("band", "bkey")))
    bucketPairs(bands, idCol)
  }

  /** exact n-gram jaccard over given candidate pairs (id_a, id_b). */
  def jaccardVerify(docs: DataFrame, cand: DataFrame, n: Int, threshold: Double,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
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

  /** LSH candidate pairs verified by true shingle-jaccard ≥ threshold.
    * Scale path: the only shuffles are (1) the band-bucket exchange,
    * (2) the candidate join back to shingle sets.
    */
  def minhashPairs(docs: DataFrame, threshold: Double = 0.3, n: Int = 3,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    jaccardVerify(docs, minhashCandidates(docs, n, textCol, idCol), n, threshold,
      textCol, idCol)

  /** exact n-gram jaccard near-dup with LSH candidate generation (the
    * 100 TB route: candidates come from minhash banding over the same
    * n-grams, never from an unbounded blocking key).
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, threshold: Double,
                        textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    minhashPairs(docs, threshold, n, textCol, idCol)

  /** blocked all-pairs jaccard — quadratic in block size, so the block
    * population is enforced: blocks larger than maxBlockSize are
    * rejected at runtime (fail fast rather than melt the cluster).
    * Prefer [[ngramJaccardPairs]] unless the blocking key is known
    * small (e.g. near-dup within a single page's revisions).
    */
  def blockedJaccardPairs(docs: DataFrame, n: Int, threshold: Double, blockCol: String,
                          maxBlockSize: Int = 1000,
                          textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sh = docs.select(col(idCol), col(blockCol),
      array_distinct(shingles(col(textCol), n)).as("sh"))
    // guard lives in a FILTER so Catalyst can't prune it away: any row in
    // an oversized block trips raise_error during evaluation
    val guarded = sh.withColumn("_bsz",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col(blockCol))))
      .filter(when(col("_bsz") > maxBlockSize,
        raise_error(concat(lit(s"blockedJaccardPairs: block over $maxBlockSize rows in "),
          col(blockCol).cast(StringType)))).otherwise(lit(true)))
      .drop("_bsz")
    guarded.as("a").join(guarded.as("b"),
        col(s"a.$blockCol") === col(s"b.$blockCol") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast(DoubleType) /
          size(array_union(col("a.sh"), col("b.sh"))).cast(DoubleType)).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---- SimHash ----
  val SimhashBits = 28

  /** per-doc simhash over distinct-token hashes: bit i set iff the
    * majority of token hashes have bit i set.
    */
  def simhash(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // same CollapseProject barrier as minhashSignatures: the hash array is
    // referenced SimhashBits times — materialize it once per row.
    val hashed = docs.select(col(idCol),
      transform(array_distinct(tokens(col(textCol))), t => tokenHash(t)).as("_hs"))
    val bits = (0 until SimhashBits).map { i =>
      when(aggregate(col("_hs"), lit(0L),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)
      ) > 0, lit(1L << i)).otherwise(lit(0L))
    }
    hashed.select(col(idCol), bits.reduce(_ + _).as("simhash"))
  }

  /** near-dup pairs with hamming(simhash) ≤ maxDist, found by pigeonhole:
    * split the signature into (maxDist+1) bands; equal band → candidate.
    * Single pass over the corpus (posexplode of band keys), one bucket
    * shuffle, signatures carried through the bucket so the hamming
    * verify needs no join back.
    */
  def simhashPairs(docs: DataFrame, maxDist: Int = 3,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sig = simhash(docs, textCol, idCol)
    val nBands = maxDist + 1
    val bandBits = SimhashBits / nBands
    def bandKey(sh: Column, b: Int): Column =
      shiftright(sh, b * bandBits).bitwiseAND(lit((1L << bandBits) - 1))
    val bandArr = array((0 until nBands).map(b => bandKey(col("simhash"), b)): _*)
    val bands = sig.select(struct(col(idCol), col("simhash")).as("rec"),
      posexplode(bandArr).as(Seq("band", "bkey")))
    val buckets = bands.groupBy(col("band"), col("bkey"))
      .agg(array_sort(collect_set(col("rec"))).as("recs"))
      .filter(size(col("recs")) > 1)
    val pairs = buckets.select(col("band"),
        explode(flatten(transform(col("recs"),
          (a, i) => transform(slice(col("recs"), i + lit(2), size(col("recs"))),
            b => struct(a(idCol).as("id_a"), b(idCol).as("id_b"),
              a("simhash").as("sh_a"), b("simhash").as("sh_b")))))).as("p"))
      .select(col("band"), col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        col("p.sh_a").as("sh_a"), col("p.sh_b").as("sh_b"))
    // first-matching-band dedup: a pair colliding in k bands appears in k
    // buckets — instead of a DISTINCT shuffle over millions of candidate
    // rows, keep the row only where `band` equals the FIRST band whose
    // keys collide (cheap codegen arithmetic on the carried signatures).
    val firstMatch = coalesce(((0 until nBands).map { b =>
      when(bandKey(col("sh_a"), b) === bandKey(col("sh_b"), b), lit(b))
    } :+ lit(-1)): _*)
    // native codegen'd popcount(xor) — see graft.plans.HammingDistance
    pairs.filter(col("band") === firstMatch)
      .select(col("id_a"), col("id_b"),
        graft.plans.HammingDistance(col("sh_a"), col("sh_b")).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** embedding near-dup: sign-LSH bucket candidates, exact cosine ≥
    * threshold verification. Linear in corpus size (one bucket shuffle);
    * raise nBits to shrink buckets as the corpus grows. Recall is that
    * of the LSH family (near-identical vectors share all sign bits with
    * high probability).
    */
  def embeddingNearDup(emb: DataFrame, threshold: Double, nBits: Int = 8, dim: Int = 64,
                       vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    // narrow bucketed table; the self-join is a codegen'd hash join on the
    // bucket key (both sides are the identical subplan → exchange reuse),
    // and the cosine verify is the native single-pass kernel. Wide-payload
    // pairs through a join beat an interpreted array explosion by ~10×.
    val withB = emb.select(col(idCol), col(vecCol),
      Similarity.lshBucket(col(vecCol), dim, nBits).as("bkey"))
    withB.as("a").join(withB.as("b"),
        col("a.bkey") === col("b.bkey") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        Similarity.cosine(col(s"a.$vecCol"), col(s"b.$vecCol")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
