package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded distributed top-k aggregate: keeps the best k (score, id)
  * candidates per group with the buffer capped at a small multiple of k,
  * so the PARTIAL (map-side) aggregate already reduces each partition's
  * candidates to ≤ k before anything crosses the exchange.
  *
  * This is the scale-safe ranking primitive for similarity search: a
  * `row_number().over(Window.partitionBy(q_id).orderBy(score))` funnels
  * every candidate for a query through ONE task's sort (for brute-force
  * search that is the whole corpus per query); this aggregate shuffles
  * ≤ k rows per (query, map partition) and merges heaps — the classic
  * two-stage partial top-k, expressed in Catalyst's Partial/Final
  * aggregate modes so Spark plans it as an ObjectHashAggregate with
  * map-side combine.
  *
  * Ordering: higher score is better; ties break to the LOWER id — the
  * exact order of `orderBy(score.desc, id.asc)`, so results are
  * bit-identical to the window formulation (and to the DuckDB oracle's
  * `row_number() OVER (ORDER BY score DESC, id)`). NaN compares greater
  * than any real score (java.lang.Double.compare), matching Spark's
  * descending sort; NULL scores or ids are skipped.
  *
  * Result: array<struct<c_id: long, cos: double>> sorted best-first;
  * `posexplode` turns it into (rank, c_id, cos) rows.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  require(k > 0, "TopKByScore: k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("c_id", LongType, nullable = false),
      StructField("cos", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"TopKByScore expects (double, bigint), got $other")
    }

  // buffer is allowed to grow to 4k, then compacted back to k: amortized
  // O(log k) per insert, memory strictly O(k) per group per task
  private val compactAt = math.max(4 * k, 32)

  private def lt(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(b._1, a._1) // desc score
    c < 0 || (c == 0 && a._2 < b._2)             // asc id tiebreak
  }

  private def compact(buf: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    if (buf.length > k) {
      val sorted = buf.sortWith(lt)
      buf.clear()
      buf ++= sorted.take(k)
    }
    buf
  }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    new ArrayBuffer[(Double, Long)](math.min(compactAt, 256))

  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    if (s != null) {
      val i = id.eval(input)
      if (i != null) {
        buf += ((s.asInstanceOf[Double], i.asInstanceOf[Long]))
        if (buf.length >= compactAt) compact(buf)
      }
    }
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long)], other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    buf ++= other
    compact(buf)
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    val top = buf.sortWith(lt).take(k)
    new GenericArrayData(top.map { case (s, i) =>
      new GenericInternalRow(Array[Any](i, s)): Any
    }.toArray)
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    // final compact before the buffer crosses the exchange: update() only
    // compacts lazily at `compactAt`, so without this up to 4k-1 entries
    // per (group, partition) would ride the shuffle instead of ≤ k
    compact(buf)
    val bb = java.nio.ByteBuffer.allocate(4 + buf.length * 16)
    bb.putInt(buf.length)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new ArrayBuffer[(Double, Long)](n)
    var j = 0
    while (j < n) { buf += ((bb.getDouble(), bb.getLong())); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScore {
  /** `TopKByScore(score, id, k)` as an aggregate Column.
    *
    * `id` is cast to BIGINT: candidate ids must be (or losslessly cast
    * to) integral — a string/UUID id column would fail under ANSI mode.
    * The output `c_id` field is always bigint. Callers with non-numeric
    * ids should join a dense surrogate id first (the scale-safe move
    * anyway: an 8-byte id beats a 36-byte UUID across every exchange).
    */
  def apply(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(TopKByScore(
      GraftBridge.expression(score.cast(DoubleType)),
      GraftBridge.expression(id.cast(LongType)), k).toAggregateExpression())
}
