package graft

import org.apache.spark.sql.functions.col

/** Plan-shape budget over the WHOLE gate registry: every non-streaming
  * query's physical plan runs through [[graft.api.Advisor.advise]] and
  * the set of error-severity findings is PINNED. A change that
  * accidentally turns a bounded formulation into a corpus funnel — a
  * window losing its PARTITION BY, a join losing its condition — fails
  * this suite even though the oracle answer would still match.
  *
  * Streaming queries are skipped (their closures EXECUTE a streaming
  * job; plan inspection happens in their own specs), as are the two
  * write-roundtrip families whose closures have filesystem side
  * effects the sweep shouldn't repeat.
  *
  * The pinned entries are all DELIBERATE, documented funnels: windows
  * over frames that are bounded by construction (an aggregated
  * top-256 vocabulary slice, a 16-bucket growth curve, a ≤64-row
  * degree histogram, the distinct-centi-score domain) — the
  * `text_zipf` contract. Anything NEW showing up here must either be
  * fixed or explicitly justified and pinned.
  */
class AdvisorSweepSpec extends SparkSpec {

  private val skipPrefixes = Seq("stream_", "src_", "lay_")
  // (query, rule) pairs that are known, documented, and bounded
  private val pinned: Set[(String, String)] = Set(
    ("eval_auc", "single-partition-window"),        // distinct centi-score domain
    ("eval_auc_ci", "single-partition-window"),     // the point-estimate face reuses eval_auc's bounded domain window; the replica windows partition BY replica
    ("eval_pr", "single-partition-window"),         // same bounded domain, curve face
    ("eval_ks", "single-partition-window"),         // same bounded domain, KS face
    ("text_zipf", "single-partition-window"),       // top-256 vocabulary slice
    ("text_heaps", "single-partition-window"),      // 16-bucket growth curve
    ("sel_skyline", "single-partition-window"),     // pass 2 over local-skyline survivors (documented in Skyline)
    ("text_encode", "single-partition-window"),     // vocab id window over the top-k (=100) slice
    ("eval_conformal", "single-partition-window"),  // q̂ prefix window over the DISTINCT centi-residual domain (the eval_auc contract)
    ("eval_auc_ci_witness", "single-partition-window"),   // same operator as eval_auc_ci on a planted constant score: the domain window runs over ONE distinct bucket
    ("eval_conformal_witness", "single-partition-window"), // same operator as eval_conformal on a planted constant residual: the q̂ window runs over ONE distinct class
    ("profile_ks2", "single-partition-window")      // ECDF windows over the distinct-value union (value-domain-bounded)
  )

  test("no unexpected error-severity advisor findings across the gate registry") {
    val found = scala.collection.mutable.Set[(String, String)]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if !skipPrefixes.exists(name.startsWith)) {
      val df =
        try fn(spark, sf)
        catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      graft.api.Advisor.advise(df).filter(col("severity") === "error")
        .collect().foreach(r => found += ((name, r.getString(1))))
    }
    spark.catalog.clearCache()
    val unexpected = found.toSet -- pinned
    val stale = pinned -- found.toSet
    assert(unexpected.isEmpty,
      s"NEW corpus-funnel plans (fix or pin with justification): $unexpected")
    assert(stale.isEmpty,
      s"pinned findings no longer fire (remove from the pin): $stale")
  }
}
