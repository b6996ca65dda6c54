package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Execution profiling — the reference server's
  * `/compute?profile=...` analogue (`server/server.py:578-692` wraps
  * `compute` in cProfile and ships the stats back with the result;
  * `server.py:640-667` mounts the profiler output). Spark already
  * collects the equivalent per-operator counters natively: every
  * `SparkPlan` node carries SQLMetrics (output rows, spill sizes,
  * shuffle bytes, scan time…). This surfaces them as a TABLE, the same
  * move as [[graft.sources.Spider]] for the spider endpoint — server
  * feature re-expressed as a queryable relation.
  *
  * Driver-side by construction: the metric set is bounded by plan NODE
  * COUNT, not data size. Timing-class metrics vary run to run, so this
  * is a unit-tested surface, not an oracle query — the deterministic
  * subset (e.g. `number of output rows`) is asserted in the suite.
  */
object Profile {

  /** Execute `df`'s OWN physical plan (not a derived count plan) and
    * return its populated metrics: (node_id, node, metric, value).
    * `node_id` is the preorder position in the final (post-AQE) plan.
    */
  def metrics(df: DataFrame): DataFrame = {
    // drive the exact plan so ITS metrics populate — a count() would
    // execute a different, aggregated plan and leave these at zero
    df.queryExecution.toRdd.count()
    def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case other => other +: other.children.flatMap(unwrap)
    }
    val nodes = unwrap(df.queryExecution.executedPlan)
    val rows = nodes.zipWithIndex.flatMap { case (n, i) =>
      n.metrics.toSeq.sortBy(_._1).map { case (key, m) =>
        (i.toLong, n.nodeName, m.name.getOrElse(key), m.value)
      }
    }
    import df.sparkSession.implicits._
    rows.toDF("node_id", "node", "metric", "value")
  }
}
