package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a distributed aggregate: find the
  * most frequent keys of a 100 TB column in ONE pass with bounded
  * memory — each map partition maintains at most `capacity` (key, count)
  * counters, the exchange carries ≤ capacity rows per partition, and the
  * final merge sums counts then truncates back to `capacity` (the
  * mergeable-summaries formulation: subtract the (capacity+1)-th largest
  * count from every survivor). A plain `groupBy(key).count.orderBy.limit`
  * answers the same question but shuffles EVERY distinct key — unbounded
  * reducer state when the key space is huge (URLs, n-grams, user ids).
  *
  * Guarantees (classic MG, preserved under this merge):
  *  - reported count is a LOWER bound; true_count − reported ≤ total_decrement,
  *    and total_decrement ≤ n / (capacity + 1);
  *  - every key with true frequency > n / (capacity + 1) is present in
  *    the output — no false negatives above the threshold.
  *  - EXACT REGIME: if the column has ≤ capacity distinct keys overall,
  *    no truncation ever triggers anywhere, and the output counts are
  *    exactly `groupBy(key).count` — which is what makes the operator
  *    differentially testable against a plain GROUP BY oracle
  *    (`misc_heavyhitters`); the approximation bounds are property-tested
  *    in the unit suite.
  *
  * Output: array<struct<key: string, cnt: long>> sorted by cnt desc then
  * key asc (deterministic under the exact regime; `posexplode` turns it
  * into rows). NULL keys are skipped, matching COUNT/GROUP BY-over-
  * non-null-key semantics for frequency mining.
  */
case class HeavyHitters(
    key: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0, "HeavyHitters: capacity must be positive")

  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    key.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"HeavyHitters expects a string key, got $other")
    }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    new mutable.HashMap[String, Long]()

  /** shrink to ≤ capacity entries by subtracting the (capacity+1)-th
    * largest count from everything and dropping ≤ 0 — the mergeable-MG
    * truncation (a no-op while the map fits, i.e. always in the exact
    * regime).
    */
  private def truncate(buf: mutable.HashMap[String, Long]): Unit = {
    if (buf.size <= capacity) return
    val counts = buf.values.toArray
    java.util.Arrays.sort(counts)
    val sub = counts(counts.length - capacity - 1) // (capacity+1)-th largest
    buf.filterInPlace((_, c) => c > sub)
    buf.mapValuesInPlace((_, c) => c - sub)
  }

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val k = key.eval(input)
    if (k != null) {
      val s = k.asInstanceOf[UTF8String].toString
      val cur = buf.getOrElse(s, 0L)
      if (cur > 0L || buf.size < capacity) buf.update(s, cur + 1L)
      else {
        // full and key absent: classic MG decrements every counter
        // instead of inserting (the count mass moves to the implicit
        // "everything else" bucket)
        buf.filterInPlace((_, c) => c > 1L)
        buf.mapValuesInPlace((_, c) => c - 1L)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long], other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    truncate(buf)
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val entries = buf.toArray
    // cnt desc, key asc: total order, deterministic in the exact regime
    java.util.Arrays.sort(entries, (a: (String, Long), b: (String, Long)) => {
      val c = java.lang.Long.compare(b._2, a._2)
      if (c != 0) c else a._1.compareTo(b._1)
    })
    new GenericArrayData(entries.map { case (k, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(k), c)): Any
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val keys = buf.toArray
    val bytes = keys.map { case (k, _) => k.getBytes(java.nio.charset.StandardCharsets.UTF_8) }
    var size = 4
    bytes.foreach(b => size += 4 + b.length + 8)
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(keys.length)
    var i = 0
    while (i < keys.length) {
      bb.putInt(bytes(i).length); bb.put(bytes(i)); bb.putLong(keys(i)._2); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new mutable.HashMap[String, Long]()
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val arr = new Array[Byte](len)
      bb.get(arr)
      val k = new String(arr, java.nio.charset.StandardCharsets.UTF_8)
      buf.update(k, bb.getLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(key = newChildren(0))
}

object HeavyHitters {
  /** `HeavyHitters(key, capacity)` as an aggregate Column (key cast to
    * string — frequency mining over a rendered key is the standard
    * shape; cast ints/dates explicitly upstream if a custom rendering
    * matters).
    */
  def apply(key: Column, capacity: Int): Column =
    GraftBridge.column(HeavyHitters(
      GraftBridge.expression(key.cast(StringType)), capacity).toAggregateExpression())
}
