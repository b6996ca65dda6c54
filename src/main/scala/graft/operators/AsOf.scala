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

  /** as-of join: for every left row, attach `valCols` from the matching
    * right row within the same `key` (nulls when none matches) —
    * pandas `merge_asof` semantics:
    *
    *  - `direction = "backward"` (default): LATEST right with
    *    `right.ts <= left.ts`
    *  - `direction = "forward"`: EARLIEST right with `right.ts >= left.ts`
    *  - `direction = "nearest"`: whichever of the two is closer in time;
    *    exact ties go BACKWARD (pandas tie rule)
    *  - `tolerance`: maximum allowed |left.ts − right.ts| — a match
    *    farther away yields NULL (no fallback to the next candidate,
    *    matching pandas). Seconds for timestamp columns, the column's own
    *    units for numeric ones.
    *
    * Plan shape (the 100 TB consideration): tag both inputs, UNION, one
    * shuffle on `key`, running `last(_, ignoreNulls)` over
    * (ts, tag)-ordered rows, keep left rows. This is one exchange +
    * one sort per needed direction (two sorts, still one exchange, for
    * "nearest") — the same cost class as a sort-merge join — and never
    * builds the |left| × |right-per-key| intermediate a naive
    * `ts >= ts' AND rank = 1` formulation explodes into.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               valCols: Seq[String], direction: String = "backward",
               tolerance: Option[Double] = None): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"asofJoin: direction must be backward/forward/nearest, got $direction")
    require(tolerance.forall(_ > 0), "asofJoin: tolerance must be positive")
    val lCols = left.columns.toSeq
    require(!valCols.exists(lCols.contains), s"asofJoin: value columns $valCols collide with left")
    // right rows sort BEFORE left rows at equal ts (tag 0 < 1 ascending,
    // and tag stays ascending in the descending-ts window), so a right
    // row at exactly left.ts is visible in BOTH directions (<=' / '>='
    // semantics). Values ride inside ONE struct ("_rv") together with the
    // right row's ts ("_rts", needed for tolerance/nearest): the running
    // last(ignoreNulls) skips only the left-row padding (null struct),
    // never a right row whose value column is legitimately NULL — that
    // row must win and deliver its null, as DuckDB ASOF JOIN / pandas
    // merge_asof do.
    val l = left.withColumn("_tag", lit(1))
    val taggedR = right.select(
      (Seq(col(key), col(tsCol), lit(0).as("_tag")) ++ valCols.map(col)): _*)
    val rvType = org.apache.spark.sql.types.StructType(
      valCols.map(v => taggedR.schema(v).copy(name = v)) :+
        taggedR.schema(tsCol).copy(name = "_rts"))
    val lPadded = l.select(
      (Seq(col(key), col(tsCol), col("_tag"),
        lit(null).cast(rvType).as("_rv")) ++
        lCols.filterNot(c => c == key || c == tsCol).map(col)): _*)
    val rPadded = taggedR.select(
      (Seq(col(key), col(tsCol), col("_tag"),
        struct(valCols.map(col) :+ col(tsCol).as("_rts"): _*).as("_rv")) ++
        lCols.filterNot(c => c == key || c == tsCol)
          .map(c => lit(null).cast(l.schema(c).dataType).as(c))): _*)
    def running(ord: Column*) =
      last(col("_rv"), ignoreNulls = true).over(
        Window.partitionBy(col(key)).orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val needB = direction != "forward"
    val needF = direction != "backward"
    val cands =
      (if (needB) Seq(running(col(tsCol).asc, col("_tag").asc).as("_cb")) else Nil) ++
        (if (needF) Seq(running(col(tsCol).desc, col("_tag").asc).as("_cf")) else Nil)
    val filled = lPadded.unionByName(rPadded)
      .select((Seq(col(key), col(tsCol), col("_tag")) ++ cands ++
        lCols.filterNot(c => c == key || c == tsCol).map(col)): _*)
      .filter(col("_tag") === 1)
    // elapsed time, always non-negative by construction of each direction
    import org.apache.spark.sql.types.{TimestampType, TimestampNTZType, DoubleType}
    def secs(a: Column, b: Column): Column = taggedR.schema(tsCol).dataType match {
      case TimestampType | TimestampNTZType =>
        (unix_micros(a) - unix_micros(b)).cast(DoubleType) / 1e6
      case _ => a.cast(DoubleType) - b.cast(DoubleType)
    }
    def inTol(cand: Column, dist: Column): Column = tolerance match {
      case Some(t) => when(cand.isNotNull && dist <= t, cand)
      case None    => cand
    }
    val distB = secs(col(tsCol), col("_cb")("_rts"))
    val distF = secs(col("_cf")("_rts"), col(tsCol))
    val rv = direction match {
      case "backward" => inTol(col("_cb"), distB)
      case "forward"  => inTol(col("_cf"), distF)
      case "nearest" =>
        val cb = inTol(col("_cb"), distB)
        val cf = inTol(col("_cf"), distF)
        when(cb.isNull, cf).when(cf.isNull, cb)
          .when(distF < distB, cf).otherwise(cb) // tie → backward
    }
    filled.withColumn("_rv", rv)
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
