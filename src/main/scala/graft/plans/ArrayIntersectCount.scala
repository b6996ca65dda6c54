package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: |A ∩ B| over two `array<bigint>` sets,
  * WITHOUT materializing the intersection. The built-in spelling
  * `size(array_intersect(a, b))` allocates the intersection array (and
  * its sibling `size(array_union(a, b))` a second, larger one) only to
  * take its length — on a similarity-join verify path evaluated
  * millions of times per query that is two throwaway allocations and
  * two hash builds per candidate pair. This kernel does one hash-set
  * build on the smaller side, one counting probe over the other, and
  * returns the count; the union size is then plain arithmetic
  * (`|A| + |B| − |A∩B|`) when inputs are distinct-element sets, as
  * every graft shingle/signature array is.
  *
  * Inputs are treated as SETS (duplicate elements in either input
  * would be counted once on the build side and per-occurrence on the
  * probe side) — callers pass distinct-element arrays, the documented
  * contract. Stays inside whole-stage codegen (SURVEY §7.3 extension
  * order). Used by [[graft.operators.Dedup.prefixJaccardPairs]].
  */
case class ArrayIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = ArrayType(LongType, containsNull = false)
    def fits(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (fits(left.dataType) && fits(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_intersect_count needs (ARRAY<BIGINT>, ARRAY<BIGINT>), " +
        s"got (${left.dataType}, ${right.dataType})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayIntersectCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.ArrayIntersectCount.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayIntersectCount =
    copy(left = newLeft, right = newRight)
}

object ArrayIntersectCount {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(ArrayIntersectCount(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** one hash build (smaller side) + one counting probe; no output
    * array. Called from generated code — keep the signature stable.
    */
  def count(a: ArrayData, b: ArrayData): Long = {
    val (small, large) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val n = small.numElements()
    val set = new java.util.HashSet[java.lang.Long](math.max(4, n * 2))
    var i = 0
    while (i < n) { set.add(small.getLong(i)); i += 1 }
    var c = 0L
    val m = large.numElements()
    var j = 0
    while (j < m) { if (set.contains(large.getLong(j))) c += 1L; j += 1 }
    c
  }
}
