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
    // events.ts is parquet TIMESTAMP(NANOS), which Spark rejects by default;
    // read the raw nanos long and convert to a microsecond TimestampType.
    // (DuckDB reads the same column as TIMESTAMP_NS — oracle SQL must
    // truncate to µs when comparing raw ts values.)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      // integral DIV, not `/`: ns epochs (~1.7e18) exceed double's 2^53
      df.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
    else df
  }

  /** Register every fixture as a temp view (for spark.sql use). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
