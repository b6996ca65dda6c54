package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-D array algebra over the COORDINATE (COO) representation —
  * `Transpose` / `TensorDot` from the reference's array surface
  * (`blaze/expr/arrays.py:13-58` transpose with an axes permutation,
  * `:61-129` tensordot contracting paired axes; numpy backend
  * `blaze/compute/numpy.py:429,434`).
  *
  * The reference materializes dense ndarrays on one machine. At 100 TB
  * a dense N-D container doesn't exist; the distributed-native shape is
  * the coordinate table — one row per cell, one column per axis index,
  * one value column (exactly how sparse tensor engines and the
  * `embeddings` explode already model it). On that representation:
  *
  *  - '''transpose''' is a pure PROJECTION: reorder the index columns.
  *    Zero shuffle, zero data movement, streams at scan speed at any
  *    scale — the plan is a single whole-stage-codegen'd Project.
  *  - '''tensordot''' contracts paired axes with a shuffle JOIN on the
  *    contraction indices, then a SUM over the free indices — the
  *    textbook parallel sparse-matmul formulation. Both sides hash-
  *    partition on the contraction key (one exchange each), Catalyst's
  *    partial aggregation combines map-side before the final group
  *    exchange, AQE re-plans skewed contraction indices, and a
  *    dimension-sized side broadcasts (pass `broadcast(b)` — the
  *    operator is representation-only and leaves join strategy to the
  *    optimizer).
  *
  * Output axes are named positionally (`d0..dN`) — after a transpose or
  * a contraction the original axis names no longer describe positions,
  * and positional names compose (a transpose of a transpose, a matmul
  * of a matmul) without a rename layer.
  */
object Tensor {

  /** Permute the index columns of a coordinate tensor: output axis `k`
    * is input axis `axes(k)` (numpy `transpose(axes)`; default reversal
    * is `axes = idx.indices.reverse`). Output columns `d0..dN, value`.
    */
  def transpose(df: DataFrame, idx: Seq[String], axes: Seq[Int],
                value: String): DataFrame = {
    require(axes.sorted == idx.indices.toList,
      s"axes must be a permutation of 0..${idx.size - 1}, got $axes")
    val cols = axes.zipWithIndex.map { case (a, k) => col(idx(a)).as(s"d$k") } :+
      col(value)
    df.select(cols: _*)
  }

  /** numpy-default transpose: reverse all axes. */
  def transpose(df: DataFrame, idx: Seq[String], value: String): DataFrame =
    transpose(df, idx, idx.indices.reverse, value)

  /** Contract the paired axes of two coordinate tensors
    * (`tensordot(a, b, axes=[[...],[...]])`): for every pairing of free
    * indices, sum the products of matching cells. Output columns are
    * `d0..dN` (a's free axes in order, then b's) and `v`.
    *
    * Works as a self-contraction too (Gram matrix: pass the same plan
    * twice) — sides are alias-scoped so Spark's self-join ambiguity
    * rules don't bite.
    *
    * Missing cells are implicit zeros, so a pairing with no matching
    * rows yields NO output row (sparse semantics) — densify with a
    * spine join afterwards if dense-zero rows are required.
    */
  def tensordot(a: DataFrame, b: DataFrame,
                aIdx: Seq[String], bIdx: Seq[String],
                contract: Seq[(String, String)],
                aValue: String, bValue: String): DataFrame = {
    require(contract.nonEmpty, "tensordot needs at least one contraction axis pair")
    val aCon = contract.map(_._1)
    val bCon = contract.map(_._2)
    require(aCon.forall(aIdx.contains) && bCon.forall(bIdx.contains),
      s"contraction axes $contract must name index columns of their sides")
    val aFree = aIdx.filterNot(aCon.contains)
    val bFree = bIdx.filterNot(bCon.contains)
    val l = a.as("tl")
    val r = b.as("tr")
    val cond = contract.map { case (x, y) => col(s"tl.$x") === col(s"tr.$y") }
      .reduce(_ && _)
    val free =
      aFree.zipWithIndex.map { case (c, k) => col(s"tl.$c").as(s"d$k") } ++
        bFree.zipWithIndex.map { case (c, k) => col(s"tr.$c").as(s"d${aFree.size + k}") }
    val prod = sum(col(s"tl.$aValue") * col(s"tr.$bValue")).as("v")
    if (free.isEmpty) l.join(r, cond).agg(prod) // full contraction → scalar
    else l.join(r, cond).groupBy(free: _*).agg(prod)
  }
}
