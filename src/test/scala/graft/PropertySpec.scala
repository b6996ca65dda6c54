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

  test("Eval laws: AUC antisymmetry and KS reversal-invariance under score negation") {
    // midrank AUC maps U → PN−U under order reversal, so EXACTLY
    // auc(−s) = 1 − auc(s); the KS curve mirrors, so its max is
    // unchanged. Scores are drawn centi-exact so the floor(±x·100+0.5)
    // quantizations are exact mirrors (no half-cent boundary cases) —
    // laws a replay-oracle can never enforce, and any rank-sum or
    // cumulative-count bug breaks them.
    import graft.operators.Eval
    val rows = draw(for {
      c <- Gen.choose(-300, 300); y <- Gen.oneOf(true, false)
    } yield (c / 100.0, y), 400, seed = 9L)
    assert(rows.exists(_._2) && rows.exists(!_._2), "need both classes")
    val df = rows.toDF("s", "y")
    val neg = df.select((-col("s")).as("s"), col("y"))
    val a1 = Eval.auc(df, col("s"), col("y")).collect()(0).getDouble(2)
    val a2 = Eval.auc(neg, col("s"), col("y")).collect()(0).getDouble(2)
    assert(a1 + a2 == 1.0, s"antisymmetry: $a1 + $a2 != 1")
    val k1 = Eval.ks(df, col("s"), col("y")).collect()(0).getDouble(3)
    val k2 = Eval.ks(neg, col("s"), col("y")).collect()(0).getDouble(3)
    assert(k1 == k2, s"KS reversal: $k1 != $k2")
  }

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

  test("HashBucket native kernel == conv(substr(md5)) SQL form (oracle parity)") {
    // the native kernel digests UTF-8 bytes directly; the composable
    // chain is what the DuckDB oracle runs — they must agree bit-for-bit
    // on arbitrary strings (unicode included) and every bucket count
    val s = draw(Gen.oneOf(
      Gen.alphaNumStr, word.map(_ * 3),
      Gen.listOfN(5, Gen.choose(' ', '퟿')).map(_.mkString)), 1000)
    for (buckets <- Seq(2, 100, 1000000)) {
      val got = s.toDF("k")
        .select(graft.plans.HashBucket(col("k"), buckets)).as[Long].collect()
      val ref = s.toDF("k")
        .select((conv(substring(md5(col("k")), 1, 7), 16, 10)
          .cast("long") % buckets).as("b")).as[Long].collect()
      assert(got.toSeq == ref.toSeq, s"buckets=$buckets")
    }
    // null propagates
    assert(Seq(Option.empty[String]).toDF("k")
      .select(graft.plans.HashBucket(col("k"), 100)).collect()(0).isNullAt(0))
  }

  test("SortedPages.slice == funnel on random ranges (boundary consistency)") {
    // the round-9 fix pinned count and slice jobs to ONE materialized
    // RDD; this drives random ranges through one handle and checks each
    // against the LIMIT/OFFSET funnel over the same total order
    val orders = Table(spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey")))
    val n = orders.df.count()
    val expected = orders.df.select("o_orderkey").as[Long].collect().sorted.toSeq
    val pages = orders.paginateSorted(Seq(col("o_orderkey")))
    assert(pages.totalRows == n)
    val ranges = draw(for {
      a <- Gen.choose(0L, n + 10)
      len <- Gen.choose(0L, n / 2)
    } yield (a, a + len), 12)
    for ((start, stop) <- ranges) {
      val got = pages.slice(start, stop).df.select("o_orderkey")
        .as[Long].collect().sorted.toSeq
      val want = expected.slice(start.min(n).toInt, stop.min(n).toInt)
      assert(got == want, s"range [$start, $stop) of $n")
    }
  }

  test("capPerKey: cap respected, deterministic, monotone in n, no window in plan") {
    val rows = draw(for {
      key <- Gen.oneOf("a", "b", "c", "hot")
      id <- Gen.choose(0L, 100000L)
    } yield (id, key), 800).distinctBy(_._1)
    val df = rows.toDF("doc_id", "src")
    val capped = Sampling.capPerKey(df, "src", "doc_id", 25)
    val byKey = capped.groupBy("src").count().as[(String, Long)].collect().toMap
    val inputByKey = rows.groupBy(_._2).view.mapValues(_.size).toMap
    for ((k, cnt) <- inputByKey)
      assert(byKey.getOrElse(k, 0L) == math.min(cnt, 25), s"key $k")
    // deterministic: same keep set on re-run
    val ids1 = capped.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = Sampling.capPerKey(df, "src", "doc_id", 25)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
    // monotone: raising the cap only ADDS rows
    val ids3 = Sampling.capPerKey(df, "src", "doc_id", 50)
      .select("doc_id").as[Long].collect().toSet
    assert(ids1.toSet.subsetOf(ids3))
    // scale shape: bounded aggregate + semi join, never a window funnel
    val plan = capped.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(400))
    assert(plan.contains("LeftSemi"), plan.take(400))
  }

  test("replace(old, new, max): Spark == JVM reference on random strings") {
    // strings over a tiny alphabet maximize overlapping/consecutive matches
    val s = Gen.listOf(Gen.oneOf('a', 'b', '.', '*')).map(_.mkString)
    val cases = draw(for {
      str <- s
      old <- Gen.oneOf("a", "ab", "..", "*", "aba")
      nw <- Gen.oneOf("", "X", "ab", "aa")
      m <- Gen.choose(1, 4)
    } yield (str, old, nw, m), 300)
    // JVM reference: literal first-N replacement, left-to-right
    def jvmReplace(s: String, o: String, n: String, max: Int): String = {
      val sb = new StringBuilder; var i = 0; var done = 0
      while (i < s.length) {
        if (done < max && s.startsWith(o, i)) { sb ++= n; i += o.length; done += 1 }
        else { sb += s.charAt(i); i += 1 }
      }
      sb.toString
    }
    cases.zipWithIndex.foreach { case ((str, o, n, m), i) =>
      val got = Seq(str).toDF("x")
        .select(new graft.api.StrOps(col("x")).replace(o, n, m)).as[String].head()
      assert(got == jvmReplace(str, o, n, m),
        s"case $i: '$str'.replace('$o','$n',$m): got '$got' want '${jvmReplace(str, o, n, m)}'")
    }
  }

  test("topKBy: rank ordering, group bound, and membership on random groups") {
    val rows = draw(for {
      g <- Gen.oneOf("g1", "g2", "g3", "g4")
      sc <- Gen.choose(0, 1000)
    } yield (g, sc.toDouble), 600).zipWithIndex
      .map { case ((g, sc), i) => (i.toLong, g, sc) }
    val k = 5
    val got = rows.toDF("id", "g", "sc")
      .transform(df => Table(df).topKBy(Seq("g"), Col(col("sc")), "id", k).df)
      .as[(String, Long, Long, Double)].collect().toSeq
    val byId = rows.map(r => r._1 -> r).toMap
    got.groupBy(_._1).foreach { case (g, grp) =>
      assert(grp.size <= k)
      assert(grp.map(_._2).sorted == (1L to grp.size).toSeq, s"ranks not dense in $g")
      // rank order == (score desc, id asc); scores match the source rows
      val ordered = grp.sortBy(_._2)
      assert(ordered.map(r => (-r._4, r._3)) == ordered.map(r => (-r._4, r._3)).sorted)
      ordered.foreach { case (_, _, id, sc) => assert(byId(id)._3 == sc && byId(id)._2 == g) }
      // the k-th kept score dominates every dropped score in the group
      val dropped = rows.filter(r => r._2 == g && !grp.exists(_._3 == r._1))
      if (grp.size == k && dropped.nonEmpty) {
        val worstKept = ordered.last
        assert(dropped.forall(d => d._3 < worstKept._4 ||
          (d._3 == worstKept._4 && d._1 > worstKept._3)))
      }
    }
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

  test("heavyHitters: exact when capacity covers the key space (== groupBy)") {
    val rows = draw(Gen.oneOf("a", "b", "c", "d", "e", "f"), 2000)
    val got = rows.toDF("k").repartition(8)
      .agg(graft.plans.HeavyHitters(col("k"), 16).as("hh"))
      .select(explode(col("hh")).as("e")).select("e.key", "e.cnt")
      .as[(String, Long)].collect().toMap
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == exact)
  }

  test("heavyHitters: MG bounds under skew with tiny capacity") {
    // zipf-ish: one hot key ~50%, a long tail of rare keys
    val rows = draw(Gen.frequency(
      10 -> Gen.const("HOT"), 4 -> Gen.const("warm"),
      6 -> Gen.choose(0, 500).map(i => s"cold$i")), 4000)
    val n = rows.size.toLong
    val cap = 8
    val got = rows.toDF("k").repartition(8)
      .agg(graft.plans.HeavyHitters(col("k"), cap).as("hh"))
      .select(explode(col("hh")).as("e")).select("e.key", "e.cnt")
      .as[(String, Long)].collect().toMap
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.size <= cap)
    // reported counts are lower bounds within the n/(cap+1) slack
    got.foreach { case (k, c) =>
      assert(c <= exact(k), s"$k over-counted: $c > ${exact(k)}")
      assert(exact(k) - c <= n / (cap + 1), s"$k slack too large")
    }
    // no false negatives above the frequency threshold
    exact.filter(_._2 > n / (cap + 1)).keys.foreach { k =>
      assert(got.contains(k), s"heavy key $k missing")
    }
    assert(got.contains("HOT") && got.contains("warm"))
  }

  test("tensordot == plain-JVM sparse matmul on random sparse matrices") {
    import graft.operators.Tensor
    // random SPARSE coordinate matrices (some cells absent → implicit 0),
    // duplicate-free coordinates, integer values so sums are exact
    val coord = for {
      i <- Gen.choose(0L, 7L); k <- Gen.choose(0L, 9L)
      v <- Gen.choose(-50L, 50L)
    } yield ((i, k), v)
    val aCells = draw(coord, 40, seed = 7L).toMap   // ≤ 40 of 80 cells
    val bCells = draw(coord, 40, seed = 11L).toMap.map { case ((k, j), v) => ((k % 10, j % 8), v) }
    val a = aCells.toSeq.map { case ((i, k), v) => (i, k, v) }.toDF("i", "k", "v")
    val b = bCells.toSeq.map { case ((k, j), v) => (k, j, v) }.toDF("k", "j", "v")
    val got = Tensor.tensordot(a, b, Seq("i", "k"), Seq("k", "j"),
        Seq("k" -> "k"), "v", "v")
      .as[(Long, Long, Long)].collect().map(r => ((r._1, r._2), r._3)).toMap
    // reference: dense accumulate over the sparse cells
    val exp = (for {
      ((i, k), av) <- aCells.toSeq
      ((k2, j), bv) <- bCells.toSeq if k2 == k
    } yield ((i, j), av * bv))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(got == exp, s"got ${got.size} cells, expected ${exp.size}")
  }

  test("zValue: bijective bit interleave == JVM reference on random points") {
    import graft.operators.Layout
    val pt = for {
      x <- Gen.choose(0L, 255L); y <- Gen.choose(0L, 255L); z <- Gen.choose(0L, 255L)
    } yield (x, y, z)
    val pts = draw(pt, 300, seed = 13L)
    def jvmZ(cs: Seq[Long], bits: Int): Long =
      (for { (c, j) <- cs.zipWithIndex; i <- 0 until bits }
        yield ((c >> i) & 1L) << (i * cs.length + j)).sum
    val got = pts.toDF("x", "y", "z")
      .select(Layout.zValue(Seq(col("x"), col("y"), col("z")), 8))
      .as[Long].collect().toSeq
    assert(got == pts.map(p => jvmZ(Seq(p._1, p._2, p._3), 8)))
    // bijective on the masked domain: 300 distinct points → distinct zs
    assert(got.toSet.size == pts.toSet.size)
  }

  test("bloom: no false negative over random unicode keys at any fill level") {
    import graft.operators.Bloom
    // keys deliberately include collisions-in-spirit: shared prefixes,
    // empty-ish strings, unicode
    val key = Gen.oneOf(
      word, Gen.const(""), word.map(_ + "éß世"),
      Gen.listOfN(2, word).map(_.mkString(":")))
    val keys = draw(key, 600, seed = 23L).distinct
    val (a, b) = keys.splitAt(keys.length / 2)
    // tiny bitmap on purpose: heavy false-positive pressure, the
    // no-false-negative side must STILL hold exactly
    val (mBits, k) = (256, 4)
    val corpus = a.toDF("k")
    val words = Bloom.build(corpus, col("k"), mBits, k)
    val misses = corpus.filter(!Bloom.mightContain(words, mBits, k, col("k"))).count()
    assert(misses == 0, s"$misses false negatives")
    // filterNovel never passes a seen key (b may overlap a only if the
    // generator repeated — distinct() above rules that out)
    val novel = Bloom.filterNovel(b.toDF("k"), words, mBits, k, col("k"))
      .as[String].collect().toSet
    assert(novel.intersect(a.toSet).isEmpty)
  }

  test("pqEncode: codes are partitioning-invariant and stable (fixture embeddings)") {
    import graft.operators.Similarity
    val emb = Tables(spark, sf, "embeddings")
    val model = Similarity.pqTrain(emb, m = 4, ksub = 8, iters = 2, dim = 64)
    def codesOf(df: org.apache.spark.sql.DataFrame) =
      Similarity.pqEncode(df, model).collect()
        .map(r => (r.getLong(0), (1 to 4).map(r.getLong(_)))).toMap
    val c1 = codesOf(emb.repartition(1))
    val c13 = codesOf(emb.repartition(13))
    assert(c1 == c13, "codes differ across partitionings")
    // training itself is partitioning-invariant too (int64 argmin/update)
    val model13 = Similarity.pqTrain(emb.repartition(13), m = 4, ksub = 8, iters = 2, dim = 64)
    assert(model13 == model, "trained codebook differs across partitionings")
  }

  test("MergeAdjacent native kernel == aggregate-HOF fold on random token arrays") {
    // small alphabet so (a, b) pairs actually occur, including runs
    // that exercise the greedy non-overlap rule ("a a a" under (a,a))
    val tok = Gen.oneOf("a", "b", "c", "ab")
    val doc = Gen.listOf(tok).map(_.mkString(" "))
    val docs = draw(doc, 400)
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ts"))
    for ((a, b) <- Seq(("a", "a"), ("a", "b"), ("b", "c"), ("ab", "a"))) {
      val got = df.select(col("doc_id"),
          graft.plans.MergeAdjacent(col("ts"), a, b, a + "" + b).as("native"),
          graft.functions.Bpe.applyMergeHof(col("ts"), a, b, a + "" + b).as("hof"))
        .collect()
      got.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"doc ${r.getLong(0)} merge ($a,$b): ${r.getSeq[String](1)} vs ${r.getSeq[String](2)}")
      }
    }
  }

  test("percentRankOfValues == window percent_rank on random grouped data") {
    import graft.operators.Quantile
    import org.apache.spark.sql.expressions.Window
    val row = for {
      g <- Gen.oneOf("p", "q", "r", "s"); v <- Gen.choose(0L, 30L) // dense ties
    } yield (g, v)
    val df = draw(row, 400, seed = 17L).toDF("g", "v")
    val ref = df.withColumn("pr",
        percent_rank().over(Window.partitionBy(col("g")).orderBy(col("v"))))
      .select("g", "v", "pr").distinct()
      .as[(String, Long, Double)].collect().toSet
    val got = Quantile.percentRankOfValues(df, "g", "v")
      .as[(String, Long, Double)].collect().toSet
    assert(got == ref)
  }
}
