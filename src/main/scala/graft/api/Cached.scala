package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StructType

/** Expression→result memo — the reference's `CachedDataset`
  * (`blaze/cached.py:17-58`): computing the same expression against a
  * cached dataset reuses the previous result instead of recomputing.
  *
  * Spark analogue: the memo key is the CANONICALIZED analyzed plan PLUS
  * the output field names, so a re-issued equivalent construction (fresh
  * Column objects, different expression ids, commuted `&&` operands)
  * hits the same entry — the same contract the reference gets from
  * hash-consed expression interning. The names component matters because
  * Spark's canonicalization ERASES alias names: without it an
  * alias-only-different request (`v as x` vs `v as y`) would hit the
  * memo and come back with the FIRST caller's column names. With it,
  * relabels are distinct expressions — exactly the reference's contract,
  * where a relabel builds a new expr node (`blaze/expr/core.py`) — but
  * the recompute cost is still O(cached-scan), not O(recompute): the
  * relabeled plan's subtree `sameResult`s the persisted entry, so
  * Spark's CacheManager substitutes the InMemoryRelation underneath.
  * Operator-order cosmetics (filter-then-project vs project-then-filter)
  * are distinct analyzed plans and miss the memo deliberately: keying on
  * the OPTIMIZED plan would make the key depend on what is already
  * cached (cache substitution runs before optimization). On first touch
  * the result is `persist()`-ed, so even plan-level misses that share a
  * cached subtree benefit via Spark's own CacheManager.
  * `release()` unpersists everything — callers own the
  * memory lifecycle (see the misc_cached query for why leaving caches
  * behind skews everyone else).
  *
  * Not thread-safe by design (the reference's dict isn't either); wrap
  * externally if shared.
  */
final class Cached {
  private val memo =
    scala.collection.mutable.LinkedHashMap.empty[(LogicalPlan, StructType), DataFrame]

  /** memoized, persisted view of `df`. The names component is the FULL
    * schema, not just top-level field names: canonicalization erases
    * nested struct field aliases too (`struct(v as x)` vs
    * `struct(v as y)`), and keying on names alone would hand the second
    * caller the first caller's nested names back.
    */
  def apply(df: DataFrame): DataFrame = {
    val key = (df.queryExecution.analyzed.canonicalized, df.schema)
    memo.getOrElseUpdate(key, df.persist())
  }

  def size: Int = memo.size

  /** unpersist every memoized result and clear the memo. */
  def release(): Unit = {
    memo.values.foreach(_.unpersist())
    memo.clear()
  }
}
