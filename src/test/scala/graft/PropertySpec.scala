package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.api.{Col, Table}
import graft.functions.TextFunctions
import graft.operators.{Pack, Sampling}

/** Property-based laws over generated inputs (SURVEY §5: the reference
  * has no property tests — this is our addition). Pattern: draw a
  * deterministic batch from a ScalaCheck generator (fixed seed, so
  * failures reproduce), push the whole batch through Spark ONCE, and
  * compare against a plain-JVM reference implementation element-wise.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def draw[A](g: Gen[A], n: Int, seed: Long = 42L): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(seed))

  // ---- generators ----
  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val email = for {
    u <- word; d <- word; tld <- Gen.oneOf("com", "org", "io")
  } yield s"$u@$d.$tld"
  private val phone = for {
    a <- Gen.choose(100, 999); b <- Gen.choose(100, 999); c <- Gen.choose(1000, 9999)
    sep <- Gen.oneOf("-", ".")
  } yield s"$a$sep$b$sep$c"
  private val ip = for {
    a <- Gen.choose(0, 255); b <- Gen.choose(0, 255)
    c <- Gen.choose(0, 255); d <- Gen.choose(0, 255)
  } yield s"$a.$b.$c.$d"
  private val number = Gen.choose(0L, 999999L).map(_.toString)
  private val text = Gen.listOf(Gen.oneOf(word, email, phone, ip, number))
    .map(_.mkString(" "))

  test("scrubPii: Spark == JVM regex fold, and is idempotent (500 random docs)") {
    val docs = draw(text, 500)
    def jvmScrub(s: String): String =
      TextFunctions.PiiPatterns.foldLeft(s) { case (acc, (re, repl)) =>
        acc.replaceAll(re, repl)
      }
    val got = docs.toDF("text")
      .select(TextFunctions.scrubPii(col("text"))).as[String].collect().toSeq
    assert(got == docs.map(jvmScrub))
    // idempotence: a scrubbed doc has nothing left to scrub
    assert(got.map(jvmScrub) == got)
  }

  test("floorDiv: floor of true division (exact-double domain)") {
    val pairs = draw(for {
      a <- Gen.choose(-1000000000L, 1000000000L)
      b <- Gen.choose(1L, 100000L)
      neg <- Gen.oneOf(1L, -1L)
    } yield (a, b * neg), 500)
    val got = pairs.toDF("a", "b")
      .select(Col(col("a")).floorDiv(Col(col("b"))).c).as[Long].collect().toSeq
    val exp = pairs.map { case (a, b) => Math.floorDiv(a, b) }
    assert(got == exp)
  }

  test("Div is always float64, even for exact integer ratios") {
    val r = Seq((10L, 5L)).toDF("a", "b").select((Col(col("a")) / Col(col("b"))).c)
    assert(r.schema.head.dataType == org.apache.spark.sql.types.DoubleType)
    assert(r.as[Double].head() == 2.0)
  }

  test("null laws: comparisons and StrCat propagate null (reference ?bool rule)") {
    val rows = Seq((Some(1L), Some("x")), (None, Some("y")), (Some(3L), None))
      .toDF("n", "s")
    val cmp = rows.select((Col(col("n")) < 2L).c).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    assert(cmp.toSeq == Seq(Some(true), None, Some(false)))
    val cat = rows.select(concat(col("s"), lit("_"), col("s")).isNull).as[Boolean]
    assert(cat.collect().toSeq == Seq(false, false, true))
  }

  test("hashBucket: in range, deterministic, and ~uniform over 100 buckets") {
    val ids = draw(Gen.choose(Long.MinValue / 2, Long.MaxValue / 2), 2000)
    val b1 = ids.toDF("id").select(Sampling.hashBucket(col("id"), 100)).as[Long].collect()
    val b2 = ids.toDF("id").select(Sampling.hashBucket(col("id"), 100)).as[Long].collect()
    assert(b1.toSeq == b2.toSeq)
    assert(b1.forall(b => b >= 0 && b < 100))
    val counts = b1.groupBy(identity).map(_._2.length)
    assert(counts.max < 60, s"hot bucket: ${counts.max} of 2000") // E[x]=20
  }

  test("packSequences invariants on random corpora") {
    val rows = draw(for {
      shard <- Gen.oneOf("s1", "s2", "s3")
      toks <- Gen.choose(0L, 300L)
    } yield (shard, toks), 400).zipWithIndex
      .map { case ((sh, tk), i) => (i.toLong, sh, tk) }
    val budget = 512L
    val got = rows.toDF("doc_id", "source", "n_toks")
      .transform(df => Pack.packSequences(df, budget, col("n_toks")))
      .select("doc_id", "source", "n_tokens", "tok_offset", "pack_id", "pack_pos")
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._2, r._1))
    // JVM reference: running offset per shard in doc_id order
    val offsets = scala.collection.mutable.Map.empty[String, Long]
    got.foreach { case (_, sh, n, off, packId, packPos) =>
      val expOff = offsets.getOrElse(sh, 0L)
      assert(off == expOff)
      assert(packId == Math.floorDiv(off, budget) && packPos == off % budget)
      assert(packPos >= 0 && packPos < budget)
      offsets(sh) = expOff + n
    }
  }
}
