package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (pareto frontier, maximize both dimensions): the
  * distinct points (x, y) such that no other point is ≥ in both
  * dimensions and > in at least one.
  *
  * Distributed two-phase plan (domination is transitive, so a local
  * skyline pass can only drop globally-dominated points):
  *   1. bucket points arbitrarily (hash) and compute each bucket's
  *      local skyline with a per-bucket window — fully parallel,
  *      shrinks n to the survivor set;
  *   2. re-run the same window globally over the (small) survivors.
  * Both passes are the same codegen'd sort + running-max: ordered by
  * (x DESC, y DESC), a point survives iff the max y over strictly
  * preceding rows is NULL or < its own y. Preceding rows have either
  * x strictly greater (dominates if their y ≥ ours) or equal x with y
  * strictly greater (dominates outright) — so the running-max test is
  * exact, not a heuristic.
  *
  * The final pass is a single-partition window by construction —
  * acceptable because its input is the union of local skylines, not
  * the data; skylines of real-valued data are tiny relative to n.
  */
object Skyline {

  private def pass(points: DataFrame, buckets: Option[Int]): DataFrame = {
    val base = buckets match {
      case Some(b) => Window.partitionBy(pmod(hash(col("x"), col("y")), lit(b)))
      case None    => Window.partitionBy()
    }
    val w = base.orderBy(col("x").desc, col("y").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    points
      .withColumn("prev_max_y", max(col("y")).over(w))
      .filter(col("prev_max_y").isNull || col("prev_max_y") < col("y"))
      .drop("prev_max_y")
  }

  /** Skyline of the distinct (xCol, yCol) points, both maximized.
    * Returns columns (x, y). */
  def skyline2(df: DataFrame, xCol: String, yCol: String,
               buckets: Int = 32): DataFrame = {
    require(buckets > 0, s"skyline2: buckets=$buckets")
    val pts = df.select(col(xCol).as("x"), col(yCol).as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .distinct()
    pass(pass(pts, Some(buckets)), None)
  }
}
