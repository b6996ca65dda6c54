package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import graft.plans.{PigeonCountSketch, PigeonMinSum}

/** Soundness pins for the pigeonhole count sketch (the PPJoin
  * candidate killer): the bound must NEVER under-report |A∩B| —
  * an under-bound wired into the candidate prune would silently drop
  * true pairs, violating the completeness contract.
  */
class PigeonSketchSpec extends SparkSpec {
  import spark.implicits._

  /** deterministic pseudo-random distinct-hash sets (no Math.random in
    * tests either — failures must replay) */
  private def randSet(seed: Long, n: Int): Array[Long] = {
    var x = seed
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    while (out.size < n) {
      // splitmix64 step
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      out += (z ^ (z >>> 31))
    }
    out.toArray
  }

  test("sketch bound >= brute-force |A∩B| on random sets (codegen path)") {
    // pairs share a controlled overlap; bound must dominate it
    val rows = (0 until 40).map { i =>
      val shared = randSet(7L, 30 + i)
      val a = shared ++ randSet(1000L + i, 20)
      val b = shared.take(10 + i % 20) ++ randSet(5000L + i, 25)
      (i.toLong, a, b, a.toSet.intersect(b.toSet).size.toLong)
    }
    val df = rows.toDF("id", "a", "b", "truth")
    val got = df.select(col("id"), col("truth"),
        PigeonMinSum(PigeonCountSketch(col("a")), PigeonCountSketch(col("b")))
          .as("bound"),
        size(col("a")).as("sza"), size(col("b")).as("szb"))
      .collect()
    assert(got.length == 40)
    got.foreach { r =>
      val (truth, bound) = (r.getLong(1), r.getLong(2))
      assert(bound >= truth, s"id=${r.getLong(0)}: bound $bound < true ∩ $truth")
      // and it is a meaningful bound: never exceeds min(|A|,|B|)
      assert(bound <= math.min(r.getInt(3), r.getInt(4)))
    }
  }

  test("prune predicate is sound: never fires on a pair with jaccard >= t") {
    val (tNum, tDen) = (3L, 10L)
    val rows = (0 until 60).map { i =>
      val shared = randSet(11L * (i + 1), 10 + i)
      val a = shared ++ randSet(2000L + i, i % 15)
      val b = shared ++ randSet(9000L + i, (i * 3) % 20)
      (i.toLong, a, b)
    }
    val df = rows.toDF("id", "a", "b")
    val bad = df.select(col("id"),
        PigeonMinSum(PigeonCountSketch(col("a")), PigeonCountSketch(col("b")))
          .as("bound"),
        size(col("a")).cast("long").as("sza"), size(col("b")).cast("long").as("szb"),
        graft.plans.ArrayIntersectCount(col("a"), col("b")).as("i"))
      // pair is truly >= t  AND  the prune would kill it  → unsound
      .filter(col("i") * (tDen + tNum) >= lit(tNum) * (col("sza") + col("szb")) &&
        col("bound") * (tDen + tNum) < lit(tNum) * (col("sza") + col("szb")))
      .count()
    assert(bad == 0L, s"$bad qualifying pairs would be unsoundly pruned")
  }

  test("saturation returns NULL (callers must treat NULL as no-prune)") {
    // 256 distinct hashes all in bucket 0 → counter would pass 255
    val sat = (0 until 256).map(i => i.toLong << 6).toArray
    val ok = (0 until 255).map(i => i.toLong << 6).toArray
    val df = Seq((1L, sat), (2L, ok)).toDF("id", "a")
      .select(col("id"), PigeonCountSketch(col("a")).as("sk"))
      .orderBy("id").collect()
    assert(df(0).isNullAt(1), "saturated sketch must be NULL")
    assert(!df(1).isNullAt(1), "255 same-bucket entries is still in range")
    // NULL sketch propagates through minSum (null-safe → no prune)
    val ms = Seq((1L, sat, ok)).toDF("id", "a", "b")
      .select(PigeonMinSum(PigeonCountSketch(col("a")), PigeonCountSketch(col("b"))))
      .collect()
    assert(ms(0).isNullAt(0))
  }

  test("interpreted build() equals the codegen'd column result") {
    val a = randSet(42L, 100)
    val viaDf = Seq(Tuple1(a)).toDF("a")
      .select(PigeonCountSketch(col("a"))).collect()(0).getSeq[Long](0)
    val direct = PigeonCountSketch.build(new GenericArrayData(a))
    assert(direct != null && viaDf == direct.toLongArray().toSeq)
    // lane decode: per-bucket counts recoverable and sum to |A|
    val counts = viaDf.flatMap(w => (0 until 8).map(l => (w >>> (l * 8)) & 0xffL))
    assert(counts.sum == 100L && counts.length == 64)
  }

  test("minSum fails loudly on malformed sketch length") {
    val e = intercept[IllegalArgumentException] {
      PigeonMinSum.minSum(new GenericArrayData(Array(1L, 2L)),
        new GenericArrayData(Array.fill(8)(0L)))
    }
    assert(e.getMessage.contains("8-word"))
  }
}
