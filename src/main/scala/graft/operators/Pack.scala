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

  /** Whole-document bin packing under a token budget, shard-locally —
    * the padding-efficiency sibling of [[packSequences]] for pipelines
    * that must NOT split a document across training examples (SFT /
    * contrastive batches, long-context eval sets): first-fit-decreasing
    * via [[graft.plans.FfdPack]] (sort by tokens DESC then id, place
    * into the lowest-indexed bin that fits, open a new bin otherwise;
    * oversized docs get a bin of their own). FFD packs within
    * 11/9·OPT + 1 bins — concat-and-chunk has zero padding but splits;
    * this keeps documents whole and minimizes the padding instead.
    *
    * Output: `(shardCol, idCol, n_tokens, bin_id)` — bin ids 1-based,
    * shard-local. Deterministic at any partitioning (the FFD order is
    * a total order), replayed row-for-row by the oracle's recursive
    * CTE.
    *
    * Scale shape: one map-side-collected aggregate per shard; the
    * shard's (n, id) pairs — 16 bytes each — are the aggregate state
    * (the documented sort-like memory contract), so the shard key must
    * keep shards executor-sized, exactly as [[packSequences]] already
    * requires for its windows.
    */
  def packBins(docs: DataFrame, budget: Long, tokens: Column,
               shardCol: String = "source", idCol: String = "doc_id"): DataFrame = {
    require(budget > 0, s"packBins: budget must be positive, got $budget")
    docs.select(col(shardCol), col(idCol).as("_id"),
        tokens.cast("long").as("_n"))
      .groupBy(col(shardCol))
      .agg(graft.plans.FfdPack(col("_n"), col("_id"), budget).as("_p"))
      .select(col(shardCol), explode(col("_p")).as("_e"))
      .select(col(shardCol), col("_e.id").as(idCol),
        col("_e.n_tokens").as("n_tokens"), col("_e.bin_id").as("bin_id"))
  }

  /** Overlapping token-window chunking: split each document into windows
    * of `window` whitespace tokens starting every `stride` tokens (the
    * context-window chunking step of RAG indexing / long-doc training
    * prep; stride < window gives overlap). One output row per chunk:
    * doc_id, chunk_idx, tok_start, n_tokens (≤ window — the tail chunk
    * may be short), chunk_text.
    *
    * Scale shape: a narrow generate-side op — tokenize, explode the
    * per-doc start sequence, slice — all inside one projection over the
    * scan, NO shuffle; per-row memory is bounded by the document itself.
    * Chunks-per-doc is ceil(n_tokens / stride), so output size is
    * ~(window/stride)× the corpus — the caller picks the overlap factor.
    */
  def chunkTokens(docs: DataFrame, window: Int, stride: Int,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(window > 0 && stride > 0,
      s"chunkTokens: window and stride must be positive, got $window/$stride")
    val toks = split(trim(col(textCol)), "\\s+")
    docs.select(col(idCol), toks.as("_ts"))
      .select(col(idCol), col("_ts"),
        posexplode(sequence(lit(0), size(col("_ts")) - 1, lit(stride))))
      .select(col(idCol),
        col("pos").cast("long").as("chunk_idx"),
        col("col").cast("long").as("tok_start"),
        size(slice(col("_ts"), col("col") + 1, lit(window))).cast("long").as("n_tokens"),
        concat_ws(" ", slice(col("_ts"), col("col") + 1, lit(window))).as("chunk_text"))
  }
}
