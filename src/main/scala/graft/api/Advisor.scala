package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Static plan advisor — the 100 TB design checklist this library is
  * built around, applied MECHANICALLY to any query's physical plan and
  * returned as a table: (severity, rule, node, detail). The companion
  * to [[Profile.metrics]] (which reports what a plan DID; this reports
  * what a plan WOULD do wrong at scale, before running it).
  *
  * Rules — each one an anti-pattern the operator suite itself avoids:
  *  - `cartesian-product` (error): a join with no join condition at
  *    all — |L|·|R| work, never survivable at corpus scale.
  *  - `non-equi-join` (warn): BroadcastNestedLoopJoin — every row of
  *    the big side tests every broadcast row; fine for k-row models
  *    (the centroid/probe pattern), quadratic if both sides grow.
  *  - `single-partition-window` (error): a window function with no
  *    PARTITION BY — the entire input funnels through ONE task (the
  *    funnel this repo's TopKByScore / SortedPages exist to avoid).
  *  - `global-sort-no-limit` (warn): a global sort not absorbed into
  *    TakeOrderedAndProject — a full range exchange + sort paid for
  *    total order; legitimate exactly at write-layout time (zorderBy/
  *    sliceSorted pay it knowingly), accidental anywhere else.
  *  - `unpruned-wide-scan` (info): a columnar file scan reading every
  *    column of a wide relation — the projection never reached the
  *    reader (`ReadSchema` should shrink when the query needs less).
  *  - `sorted-wide-join` (warn): a sort-merge join whose streamed
  *    input carries array/map/binary columns — the sort spills the
  *    WIDEST relation in the plan (the round-10 sf10 rehearsal's
  *    dedup_prefix_pairs failure mode); a shuffled-hash hint streams
  *    it unsorted.
  *
  * Driver-side by construction, like [[Profile.metrics]]: cost is
  * bounded by plan NODE COUNT, not data size, and nothing executes.
  * A clean plan returns zero rows — asserted for the suite's own
  * operators in the unit tests (advice rules are plan-shape claims,
  * not data claims, so this is a unit-tested surface, not an oracle
  * query).
  */
object Advisor {

  private val WideScanCols = 12

  def advise(df: DataFrame): DataFrame = {
    def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case other => other +: other.children.flatMap(unwrap)
    }
    val nodes = unwrap(df.queryExecution.executedPlan)
    val out = Seq.newBuilder[(String, String, String, String)]
    nodes.foreach {
      case j: joins.CartesianProductExec =>
        out += (("error", "cartesian-product", j.nodeName,
          "join with no condition: |L|*|R| row pairs"))
      case j: joins.BroadcastNestedLoopJoinExec =>
        out += (("warn", "non-equi-join", j.nodeName,
          s"${j.joinType} nested-loop against a broadcast side; quadratic unless one side is model-sized"))
      case w: window.WindowExec if w.partitionSpec.isEmpty =>
        out += (("error", "single-partition-window", w.nodeName,
          "window with no PARTITION BY funnels every row through one task"))
      case w: window.WindowGroupLimitExec if w.partitionSpec.isEmpty =>
        out += (("error", "single-partition-window", w.nodeName,
          "window group-limit with no PARTITION BY funnels every row through one task"))
      case j: joins.SortMergeJoinExec
          if j.output.exists(a => a.dataType match {
            case _: org.apache.spark.sql.types.ArrayType |
                 _: org.apache.spark.sql.types.MapType |
                 org.apache.spark.sql.types.BinaryType => true
            case _ => false
          }) =>
        out += (("warn", "sorted-wide-join", j.nodeName,
          "sort-merge join over array/map/binary columns sorts (and spills) " +
            "the wide relation; a shuffle_hash hint streams it unsorted"))
      case s: SortExec if s.global =>
        out += (("warn", "global-sort-no-limit", s.nodeName,
          "global total order: range exchange + full sort (deliberate only for write layout / pagination)"))
      case f: FileSourceScanExec
          if f.requiredSchema.length >= WideScanCols &&
            f.requiredSchema.length == f.relation.dataSchema.length =>
        out += (("info", "unpruned-wide-scan", f.nodeName,
          s"scan reads all ${f.requiredSchema.length} columns; projection did not reach the reader"))
      case _ => ()
    }
    import df.sparkSession.implicits._
    out.result().toDF("severity", "rule", "node", "detail")
  }
}
