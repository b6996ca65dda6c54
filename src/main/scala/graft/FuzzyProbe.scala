package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the fuzzy (edit-distance) candidate routes — the
  * generic share-any-variant join vs the position-annotated d=1 split
  * route (anchor / substitution / deletion-probe streams). Prints, for
  * the gate's customer corpus at the chosen SF:
  *
  *  - candidate admit counts per route (the split route's whole point
  *    is killing the lev-2-by-deletion spurious class pre-DISTINCT);
  *  - end-to-end wall + shuffle write/read + spill per route;
  *  - a pair-set checksum equality verdict (sum/count over
  *    xxhash64(id_a, id_b, dist)) so a speedup can never be a silent
  *    semantics change.
  *
  * Not part of the gate or the record; readings land in BASELINE.md.
  */
object FuzzyProbe {
  private[graft] def run(spark: SparkSession, sfDir: String): Unit = {
    val shw = new java.util.concurrent.atomic.AtomicLong
    val shr = new java.util.concurrent.atomic.AtomicLong
    val spill = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val tm = te.taskMetrics
          if (tm != null) {
            shw.addAndGet(tm.shuffleWriteMetrics.bytesWritten)
            shr.addAndGet(tm.shuffleReadMetrics.totalBytesRead)
            spill.addAndGet(tm.diskBytesSpilled)
          }
        }
      })
    def timed[A](name: String)(f: => A): A = {
      org.apache.spark.sql.GraftBridge.drainListeners(spark)
      val (w0, r0, s0) = (shw.get, shr.get, spill.get)
      val t0 = System.nanoTime(); val r = f
      org.apache.spark.sql.GraftBridge.drainListeners(spark)
      val mb = 1024.0 * 1024
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s  " +
        f"shw=${(shw.get - w0) / mb}%.1fMB shr=${(shr.get - r0) / mb}%.1fMB " +
        f"spill=${(spill.get - s0) / mb}%.1fMB")
      r
    }
    import graft.operators.Dedup
    val recs = Tables(spark, sfDir, "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("name"))

    val candGen = timed("generic candidates (count)") {
      Dedup.fuzzyCandidatesGeneric(recs, 1, "name", "id").count()
    }
    println(s"[probe] generic candidate count: $candGen")
    val candSplit = timed("split-route candidates (count)") {
      Dedup.fuzzyCandidatesD1(recs, "name", "id").count()
    }
    println(s"[probe] split-route candidate count: $candSplit")
    // checksum = (count, XOR of row hashes): order-free set identity
    // over unique pair rows, immune to ANSI sum overflow at any count
    def sig(df: org.apache.spark.sql.DataFrame) = {
      val r = df.agg(count(lit(1)),
        expr("bit_xor(xxhash64(id_a, id_b, dist))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val sGen = timed("generic fuzzyPairs (checksum)") {
      sig(Dedup.fuzzyPairsGeneric(recs, 1))
    }
    val sSplit = timed("split-route fuzzyPairs (checksum)") {
      sig(Dedup.fuzzyPairs(recs, 1))
    }
    println(s"[probe] candidates: generic=$candGen split=$candSplit " +
      f"(kill rate ${(1.0 - candSplit.toDouble / math.max(1L, candGen)) * 100}%.1f%%)")
    println(s"[probe] pairs: generic=$sGen split=$sSplit " +
      s"equal=${sGen == sSplit}")
    require(sGen == sSplit,
      "fuzzy split route DIVERGED from the generic route — do not ship")

    // cross-table (fuzzyJoin) arm: the join_fuzzy gate corpus — a
    // dirty registry (6th char deleted, ids offset) linked against
    // the canonical one. Its generic candidate set is already ≈ the
    // match set (only the one deleted position collides), so this arm
    // measures whether the split route's extra streams cost more than
    // the (near-zero) spurious kill buys — the honest neutral case.
    val left = recs
    val right = Tables(spark, sfDir, "customer")
      .select((col("c_custkey") + 1000000L).as("id"),
        concat(substring(col("c_name"), 1, 5), substring(col("c_name"), 7, 1000))
          .as("name"))
    val jGen = timed("generic join candidates (count)") {
      Dedup.fuzzyJoinCandidatesGeneric(left, right, 1, "name", "id").count()
    }
    val jSplit = timed("split-route join candidates (count)") {
      Dedup.fuzzyJoinCandidatesD1(left, right, "name", "id").count()
    }
    println(s"[probe] join candidates: generic=$jGen split=$jSplit")
  }
}
