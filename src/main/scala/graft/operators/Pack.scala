package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-batch assembly operators (north-star extension): map a
  * document corpus onto fixed token-budget packs — the concat-and-chunk
  * packing every LLM pre-training pipeline runs before tokenized
  * examples hit the trainer.
  *
  * Packing is SHARD-LOCAL by design: a global running total would be one
  * unpartitioned window (single task — the exact anti-pattern
  * [[graft.api.Table.shift]] guards against). Partitioning by a shard
  * key keeps every window partition independent, so the operator scales
  * with the number of shards; at 100 TB the shard key is whatever the
  * corpus is already organized by (dump file, crawl segment, source).
  */
object Pack {

  /** Assign each document a pack id under a token budget, shard-locally.
    *
    * Documents are laid end-to-end in (`orderCol`) order within each
    * shard; a document starts at running offset Σ tokens-before-it and
    * belongs to pack `offset div budget` (documents may straddle a pack
    * boundary — concat-and-chunk splits them, exactly like the trainer
    * does). Output: the input columns plus n_tokens, tok_offset,
    * pack_id, pack_pos (start position within its pack) — carrying the
    * input through lets the operator sit mid-pipeline.
    */
  def packSequences(docs: DataFrame, budget: Long, tokens: Column,
                    shardCol: String = "source", orderCol: String = "doc_id"): DataFrame = {
    require(budget > 0, s"packSequences: budget must be positive, got $budget")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("n_tokens", tokens)
      .withColumn("tok_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("pack_id", expr(s"tok_offset DIV $budget"))
      .withColumn("pack_pos", col("tok_offset") % budget)
  }
}
