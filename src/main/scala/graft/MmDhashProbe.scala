package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-time probe for `mm_dhash_clusters` (VERDICT r12 #4 / r13 #7):
  * the gate query chains synth→decode→dHash→banded pairs→Borůvka
  * connected components; this main times each phase over a
  * MATERIALIZED previous phase (eager localCheckpoint between stages,
  * released as soon as the next stage lands) so the reading is the
  * phase's own cost, not its lineage's.
  */
object MmDhashProbe {
  private[graft] def run(spark: SparkSession, sfDir: String): Unit = {
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.operators.{Cluster, Multimodal}
    // the gate query's exact dims recipe (PipelineEntry mm_dhash_clusters)
    val dims = Tables(spark, sfDir, "documents").select(col("doc_id"),
      ((col("doc_id") % 60) * 131 + expr("doc_id DIV 60") % 4 +
        expr("doc_id DIV 1000000000") * 97).as("base"),
      ((col("doc_id") % 60) % 24 + 9).as("w"),
      ((col("doc_id") % 60) % 16 + 9).as("h"))

    val sigs = timed("phase 1: synth+decode+dhash") {
      val s = Multimodal.imageDHash(spark,
        Multimodal.synthesizePngSeeded(spark, dims, "doc_id", "base", "w", "h"))
        .localCheckpoint(true)
      println("[probe] sigs rows: " + s.count()); s
    }
    val pairs = timed("phase 2: banded hamming pairs") {
      val p = Multimodal.dhashPairs(sigs, maxDist = 3).localCheckpoint(true)
      println("[probe] pair rows: " + p.count()); p
    }
    timed("phase 3: Boruvka dedupClusters") {
      println("[probe] cluster rows: " +
        Cluster.dedupClusters(dims.select(col("doc_id")), pairs,
          idCol = "doc_id").count())
    }

  }
}
