package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface over the events schema (SURVEY §2.13:
  * an extension — the reference has no true streaming; its "streams" are
  * chunked iterators, which Spark batch already subsumes).
  *
  * Batch/stream parity: [[tumblingAgg]] over a stream produces the same
  * rows as [[graft.operators.Sessionize.tumbling]] over the equivalent
  * batch — asserted in the unit suite via MemoryStream.
  */
object StreamOps {

  /** event-time tumbling window aggregate with a watermark: the
    * streaming analogue of Sessionize.tumbling. State is bounded by the
    * watermark (late data beyond it is dropped) — the 100 TB/day design:
    * state size ∝ windows-in-flight × distinct event_type, not input.
    */
  def tumblingAgg(events: DataFrame, widthSeconds: Long,
                  watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), s"$widthSeconds seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  /** gap-based session windows (streaming native session_window). */
  def sessionAgg(events: DataFrame, gapSeconds: Long,
                 watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), s"$gapSeconds seconds"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** run a streaming query over a bounded source to completion into a
    * memory sink and return the result table (test/driver utility).
    */
  def runToMemory(spark: SparkSession, streaming: DataFrame, name: String,
                  outputMode: String = "complete"): DataFrame = {
    val q = streaming.writeStream
      .format("memory").queryName(name).outputMode(outputMode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
