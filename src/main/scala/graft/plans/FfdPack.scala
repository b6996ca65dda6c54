package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Shard-local FIRST-FIT-DECREASING bin packing as a typed aggregate:
  * collect the shard's `(n_tokens, id)` pairs, sort by (n DESC, id
  * ASC), and place each into the LOWEST-indexed bin whose remaining
  * token capacity fits it, opening a new bin otherwise — the classic
  * FFD heuristic (≤ 11/9·OPT + 1 bins), i.e. the padding-efficient
  * sibling of [[graft.operators.Pack.packSequences]]'s concat-and-chunk
  * for pipelines that must NOT split documents across examples.
  *
  * Determinism: the (n DESC, id ASC) total order and the
  * lowest-index-first placement make the assignment a pure function of
  * the data — replayed row-for-row by the DuckDB recursive-CTE oracle.
  * Oversized documents (n > budget) each open a bin of their own
  * (its remaining capacity goes negative, so nothing joins them);
  * NULL n or id rows are skipped.
  *
  * First-fit search is a leftmost-descent over a max segment tree of
  * bin capacities — O(log bins) per document, O(d log d) per shard
  * overall, NOT the O(d·bins) linear scan (which is quadratic-ish on
  * million-document shards).
  *
  * Memory contract (documented, like a sort): the aggregation buffer
  * holds the SHARD's (n, id) pairs — 16 bytes each — until finalize;
  * shard-local packing is the scale design (see Pack's scaladoc), so
  * the shard key must keep shards executor-sized (10⁶ docs ≈ 16 MB).
  *
  * Result: array<struct<id, n_tokens, bin_id>> with 1-based bin ids.
  */
case class FfdPack(
    n: Expression,
    id: Expression,
    budget: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Long)]] {

  require(budget > 0, s"FfdPack: budget must be positive, got $budget")

  override def children: Seq[Expression] = Seq(n, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("bin_id", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (n.dataType, id.dataType) match {
      case (ByteType | ShortType | IntegerType | LongType,
            ByteType | ShortType | IntegerType | LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"FfdPack expects (<integral n_tokens>, <integral id>), got $other")
    }

  override def createAggregationBuffer(): ArrayBuffer[(Long, Long)] =
    new ArrayBuffer[(Long, Long)](256)

  override def update(buf: ArrayBuffer[(Long, Long)], input: InternalRow): ArrayBuffer[(Long, Long)] = {
    val nv = n.eval(input)
    if (nv != null) {
      val iv = id.eval(input)
      if (iv != null) {
        val len = nv.asInstanceOf[Number].longValue
        require(len >= 0, s"FfdPack: negative n_tokens ($len) for id $iv")
        buf += ((len, iv.asInstanceOf[Number].longValue))
      }
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Long, Long)], other: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    buf ++= other
    buf
  }

  override def eval(buf: ArrayBuffer[(Long, Long)]): Any = {
    val docs = buf.sortWith { (a, b) =>
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    }
    val m = docs.length
    // max segment tree over bin remaining capacities; leftmost descent
    // answers "lowest-indexed bin with capacity >= len" in O(log bins)
    var size = 1
    while (size < math.max(m, 1)) size <<= 1
    val tree = Array.fill(2 * size)(Long.MinValue)
    def setCap(pos: Int, cap: Long): Unit = {
      var node = size + pos
      tree(node) = cap
      node >>= 1
      while (node >= 1) {
        tree(node) = math.max(tree(2 * node), tree(2 * node + 1))
        node >>= 1
      }
    }
    def firstFit(len: Long): Int =
      if (tree(1) < len) -1
      else {
        var node = 1
        while (node < size)
          node = if (tree(2 * node) >= len) 2 * node else 2 * node + 1
        node - size
      }
    var nbins = 0
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val (len, docId) = docs(i)
      var bin = firstFit(len)
      if (bin < 0) {
        bin = nbins
        nbins += 1
        setCap(bin, budget - len)
      } else {
        setCap(bin, tree(size + bin) - len)
      }
      out(i) = new GenericInternalRow(Array[Any](docId, len, (bin + 1).toLong))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: ArrayBuffer[(Long, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { case (a, b) => bb.putLong(a); bb.putLong(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val c = bb.getInt()
    val buf = new ArrayBuffer[(Long, Long)](c)
    var j = 0
    while (j < c) { buf += ((bb.getLong(), bb.getLong())); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FfdPack =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FfdPack =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FfdPack =
    copy(n = newChildren(0), id = newChildren(1))
}

object FfdPack {
  /** `FfdPack(n, id, budget)` as an aggregate Column (see class doc). */
  def apply(n: Column, id: Column, budget: Long): Column =
    GraftBridge.column(FfdPack(
      GraftBridge.expression(n),
      GraftBridge.expression(id), budget).toAggregateExpression())
}
