package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver fixture tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. Reads are plain
  * `spark.read.parquet` so Catalyst gets native column pruning and
  * predicate pushdown into the scan — at 100 TB these tables would be
  * multi-file/partitioned directories and the same call still applies.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts has shipped as BOTH parquet TIMESTAMP(NANOS) (older
    // driver fixtures; Spark rejects ns by default → read raw nanos via
    // nanosAsLong and integral-DIV to µs — `/` would round-trip ~1.7e18
    // epochs through double past 2^53) and TIMESTAMP(MICROS,
    // isAdjustedToUTC=false) (current fixtures → Spark reads
    // TIMESTAMP_NTZ; session timezone is UTC, so casting to
    // TimestampType preserves the same instants the ns path produced).
    // Dispatch on the loaded type so either vintage works.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      df.schema("ts").dataType match {
        case LongType => df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    } else df
  }

  /** Register every fixture as a temp view (for spark.sql use). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
