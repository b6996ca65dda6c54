package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Graph centrality for corpus curation — PageRank over a link/affinity
  * graph is the classic reference-free quality prior for web crawls
  * (rank domains by centrality, weight or threshold documents by their
  * domain's score). Complements [[Cluster.connectedComponents]] (the
  * other graph pass in the engine).
  *
  * Determinism is engineered the same way as the k-means trainer
  * ([[Similarity.kmeansTrain]]): ranks are int64 in units of
  * `1/scale`, per-edge contributions use floor division, and the
  * damping multiply stays below 2^53 so the double round-trips are
  * exact — every engine computes bit-identical ranks, which makes the
  * whole power iteration replayable in the DuckDB oracle (no float
  * summation order anywhere).
  *
  * Scale shape per iteration: one join of the edge list against the
  * (node, pr) table co-keyed on `src` — co-locatable by bucketing both
  * on the node key — then one `groupBy(dst)` partial/final aggregate;
  * rank state is 2 columns per node. `localCheckpoint` truncates the
  * per-iteration lineage exactly like the trainer loop (at petabyte
  * scale swap for a reliable checkpoint dir).
  */
object Graph {

  /** Simplified damped PageRank over a DIRECTED edge list `(src, dst)`
    * for `iters` power iterations (make the graph undirected upstream
    * by unioning reversed edges if affinity is symmetric — that also
    * removes dangling sinks, whose lost mass this simplified form does
    * not redistribute). Nodes = every id appearing as a `src` (an
    * undirected graph covers all nodes; a node with no outgoing edges
    * contributes nothing and, if never a `src`, is not ranked).
    *
    * pr_0 = scale; pr_{t+1}(v) = (scale − ⌊d·scale⌋) +
    * ⌊d · Σ_{u→v} ⌊pr_t(u)/outdeg(u)⌋⌋ with d = dampNum/dampDen.
    * Output: (id, pr) — pr in units of 1/scale, Σpr ≈ n·scale.
    */
  def pagerank(edges: DataFrame, iters: Int, scale: Long = 1000000L,
               dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iters > 0, s"pagerank: iters must be positive, got $iters")
    require(dampNum >= 0 && dampNum <= dampDen && dampDen > 0,
      s"pagerank: damping $dampNum/$dampDen outside [0, 1]")
    require(scale > 0, s"pagerank: scale must be positive, got $scale")
    // the edge list feeds every iteration — materialize it ONCE,
    // pre-partitioned on the join key (localCheckpoint preserves the
    // partitioning, so no iteration re-shuffles the edges; only the
    // node-sized contribution aggregate moves per round — the shape
    // that holds when edges outweigh nodes 100:1 on a real crawl)
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src")).sortWithinPartitions("src")
      .localCheckpoint(true)
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    val base = scale - dampNum * scale / dampDen
    // rank state carries outdeg so each round is ONE edge join + ONE
    // aggregate (a separate degree join would re-shuffle the edges)
    var st = deg.select(col("src").as("id"), col("outdeg"),
      lit(scale).as("pr"))
    // checkpoint retirement lags one round, as in Similarity.kmeansTrain
    // (the lazy next-round plan still references the previous blocks)
    var retirable: DataFrame = null
    for (_ <- 1 to iters) {
      // ⌊pr/outdeg⌋ then ⌊d·Σ⌋: all intermediates < 2^53 for corpora up
      // to ~10^9 nodes at the default scale, so the floor-of-double is
      // exact integer division in any engine
      val contrib = e.join(st, e("src") === st("id"))
        .select(col("dst"),
          floor(col("pr").cast(DoubleType) / col("outdeg").cast(DoubleType))
            .cast(LongType).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      val prev = st
      st = deg.join(contrib, deg("src") === contrib("dst"), "left")
        .select(col("src").as("id"), col("outdeg"),
          (lit(base) + floor((lit(dampNum) * coalesce(col("s"), lit(0L)))
            .cast(DoubleType) / lit(dampDen).cast(DoubleType)).cast(LongType))
            .as("pr"))
        .localCheckpoint(true)
      if (retirable ne null)
        org.apache.spark.sql.GraftBridge.releaseCheckpoint(retirable)
      retirable = prev
    }
    st.select(col("id"), col("pr"))
  }
}
