package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: turn near-dup PAIRS (from any of the
  * [[Dedup]] candidate generators) into connected components, so a
  * pipeline can keep exactly one canonical document per cluster.
  * North-star extension; the reference has no graph surface.
  *
  * Algorithm: hash-min label propagation with per-round pointer
  * doubling — every node starts labeled with its own id; each round a
  * node takes the min label over itself and its neighbors (one shuffle
  * over the edge list), then every label is shortcut to its parent's
  * label (one node-sized self-join, the star-contraction move from the
  * two-phase CC literature, e.g. Kiveris et al. 2014). Propagation
  * alone needs O(diameter) rounds; the doubling compresses label
  * chains geometrically, so convergence is O(log diameter) — a
  * 10⁶-link path converges inside the default 25-round budget instead
  * of tripping the fail-fast. Near-dup clusters are shallow
  * (diameter ≪ 10 in practice) and pay one cheap extra join per round
  * for the guarantee.
  *
  * Lineage is truncated every round with `localCheckpoint` so the plan
  * doesn't grow exponentially across iterations; a production cluster
  * job would set a fault-tolerant `checkpoint` dir instead (the one-line
  * swap is noted inline).
  */
object Cluster {

  /** Connected components of an undirected graph.
    *
    * @param nodes one column `id` — every vertex (isolated vertices keep
    *              their own label)
    * @param edges columns `src`, `dst` — undirected (either orientation)
    * @return (id, label) where label = min node id in the component
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    // materialize the edge list BEFORE symmetrizing: a union of two
    // selects over the raw plan would execute the (possibly expensive)
    // pair-generation pipeline once per branch. The symmetrized view then
    // derives narrowly from the checkpointed rows.
    val e0 = edges.select(col("src"), col("dst"))
      .localCheckpoint(true) // production: .checkpoint() against a DFS dir
    val sym = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))

    // only nodes that appear in an edge can ever change label — iterate
    // over those alone. For a dedup workload this is the decisive bound:
    // the near-dup graph is a sliver of the corpus, so each round is
    // O(|E|), not O(|V|); the (huge) isolated remainder joins back once
    // at the end with label = id. Seed with min(self, neighbors): the
    // same shuffle a plain distinct would cost, but it fuses the first
    // propagation round — typical near-dup clusters (stars/pairs) arrive
    // already converged and the loop only runs its confirming round.
    var labels = sym.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("_m"))
      .select(col("id"), least(col("id"), col("_m")).as("label"))
      .localCheckpoint(true)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      // min over {self} ∪ {neighbor labels}: one shuffle on `id`. The
      // previous label rides the SAME aggregate (self rows carry it,
      // neighbor rows carry a typed null that min() ignores), so the
      // convergence test below needs no join back onto `labels` — just a
      // scan of the freshly materialized checkpoint blocks.
      val viaEdges = sym
        .join(labels.select(col("id").as("src"), col("label")), "src")
        .select(col("dst").as("id"), col("label"),
          when(lit(false), col("label")).as("prev"))
      val prop = labels.select(col("id"), col("label"), col("label").as("prev"))
        .unionByName(viaEdges)
        .groupBy(col("id"))
        .agg(min(col("label")).as("label"), min(col("prev")).as("prev"))
      // pointer doubling (star contraction on the label forest): replace
      // label(u) by label(label(u)). Labels always point at a smaller id
      // that itself appears in the edge-touched node set, so the parent
      // lookup is a node-sized self-join; the least() keeps monotone
      // descent even if the parent row were somehow missing. This is
      // what turns O(diameter) rounds into O(log diameter).
      val next = prop.alias("a")
        .join(prop.select(col("id").as("_pid"), col("label").as("_plab")).alias("b"),
          col("a.label") === col("_pid"), "left")
        .select(col("a.id").as("id"),
          least(col("a.label"), coalesce(col("_plab"), col("a.label"))).as("label"),
          col("a.prev").as("prev"))
        .localCheckpoint(true)
      converged = next.filter(col("label") < col("prev")).isEmpty
      // `next` is materialized (eager checkpoint), so the previous round's
      // blocks are garbage — release them or storage grows per iteration
      org.apache.spark.sql.GraftBridge.releaseCheckpoint(labels)
      labels = next
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: not converged after $maxIter rounds " +
          "(with pointer doubling that means component diameter > ~2^" +
          s"$maxIter — almost certainly a pair-generation bug upstream; " +
          "raise maxIter only if such a graph is truly intended)")
    // the converged labels no longer depend on the edge checkpoint
    org.apache.spark.sql.GraftBridge.releaseCheckpoint(e0)
    // isolated vertices: their own label, via one left join (no iteration)
    nodes.select(col("id"))
      .join(labels.select(col("id"), col("label")), Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("label"))
  }

  /** Cluster assignment for a document corpus from verified near-dup
    * pairs: (doc_id, cluster_id, is_canonical) for EVERY document —
    * singletons are their own canonical cluster. Downstream dedup keeps
    * `is_canonical` rows only.
    */
  def dedupClusters(docs: DataFrame, pairs: DataFrame,
                    idCol: String = "doc_id"): DataFrame =
    connectedComponents(
      docs.select(col(idCol).as("id")),
      pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      .select(col("id").as(idCol), col("label").as("cluster_id"),
        (col("label") === col("id")).as("is_canonical"))
}
