package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and range joins — operators the reference and stock Spark both
  * lack, composed from built-ins per SURVEY §7.3 preference (a): the
  * semantics are fully expressible with a union + running `last` window
  * (as-of) and a bucketized equi-join (range), so no custom SparkPlan is
  * needed and everything stays inside codegen.
  */
object AsOf {

  /** as-of join: for every left row, attach `valCols` from the LATEST
    * right row with `right.ts <= left.ts` within the same `key` (nulls
    * when no prior right row exists).
    *
    * Plan shape (the 100 TB consideration): tag both inputs, UNION, one
    * shuffle on `key`, running `last(_, ignoreNulls)` over
    * (ts, tag)-ordered rows, keep left rows. This is one exchange +
    * one sort — the same cost as a sort-merge join — and never builds
    * the |left| × |right-per-key| intermediate a naive
    * `ts >= ts' AND rank = 1` formulation explodes into.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               valCols: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    require(!valCols.exists(lCols.contains), s"asofJoin: value columns $valCols collide with left")
    // right rows sort BEFORE left rows at equal ts (tag 0 < 1), so a
    // right row at exactly left.ts is visible to it (<= semantics).
    // Values ride inside ONE struct ("_rv"): the running last(ignoreNulls)
    // skips only the left-row padding (null struct), never a right row
    // whose value column is legitimately NULL — that row must win and
    // deliver its null, as DuckDB ASOF JOIN / pandas merge_asof do.
    val l = left.withColumn("_tag", lit(1))
    val taggedR = right.select(
      (Seq(col(key), col(tsCol), lit(0).as("_tag")) ++ valCols.map(col)): _*)
    val rvType = org.apache.spark.sql.types.StructType(
      valCols.map(v => taggedR.schema(v).copy(name = v)))
    val lPadded = l.select(
      (Seq(col(key), col(tsCol), col("_tag"),
        lit(null).cast(rvType).as("_rv")) ++
        lCols.filterNot(c => c == key || c == tsCol).map(col)): _*)
    val rPadded = taggedR.select(
      (Seq(col(key), col(tsCol), col("_tag"),
        struct(valCols.map(col): _*).as("_rv")) ++
        lCols.filterNot(c => c == key || c == tsCol)
          .map(c => lit(null).cast(l.schema(c).dataType).as(c))): _*)
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lPadded.unionByName(rPadded)
      .select((Seq(col(key), col(tsCol), col("_tag"),
        last(col("_rv"), ignoreNulls = true).over(w).as("_rv")) ++
        lCols.filterNot(c => c == key || c == tsCol).map(col)): _*)
    filled.filter(col("_tag") === 1)
      .select((lCols.map(col) ++ valCols.map(v => col("_rv")(v).as(v))): _*)
  }

  /** range join: pair each point row with every interval row of the same
    * `key` whose [startCol, endCol) contains the point.
    *
    * Plan shape: intervals are EXPLODED into fixed-width buckets
    * (`sequence` over bucket ids — one row per bucket the interval
    * overlaps), points map to their single bucket, then an EQUI-join on
    * (key, bucket) + exact containment filter. Join fan-in is bounded by
    * rows-per-bucket, never |points| × |intervals-per-key| — the
    * classic bucketized interval-join, pick `bucketWidth` ≈ typical
    * interval length.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
                ptCol: String, startCol: String, endCol: String,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "rangeJoin: bucketWidth must be positive")
    // last overlapped bucket of half-open [start, end) = ceil(end/w) - 1:
    // correct for FRACTIONAL coordinates too (floor((end-1)/w) misses the
    // final bucket when end is not integral). Empty/inverted intervals
    // are dropped first — sequence() would otherwise count DOWN and emit
    // one spurious bucket row per bucket below start.
    val ivb = intervals
      .filter(col(startCol) < col(endCol))
      .withColumn("_b",
        explode(sequence(
          floor(col(startCol).cast("double") / bucketWidth).cast("long"),
          (ceil(col(endCol).cast("double") / bucketWidth) - 1).cast("long"))))
    val ptb = points.withColumn("_b",
      floor(col(ptCol).cast("double") / bucketWidth).cast("long"))
    ptb.join(ivb, Seq(key, "_b"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("_b")
  }
}
