package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream batch operators over the `events` table: tumbling
  * windows and gap-based sessionization (gaps-and-islands).
  *
  * Scale: both shuffle ONCE on `user_id` (window partition key); the
  * running-sum session assignment is per-partition sequential — the
  * standard distributed sessionization plan. The streaming equivalents
  * (window()/session_window over readStream) live in
  * [[graft.streaming.StreamOps]].
  */
object Sessionize {

  /** tumbling-window aggregate: count + sum(value) per (bucket, type). */
  def tumbling(events: DataFrame, widthSeconds: Long): DataFrame = {
    val w = widthSeconds * 1000000L // µs
    events
      .withColumn("bucket", expr(s"unix_micros(ts) DIV $w"))
      .groupBy(col("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .select(timestamp_micros(col("bucket") * w).as("window_start"),
        col("event_type"), col("n"), col("total"))
  }

  /** gap-based sessions per user: a new session starts when the gap to
    * the previous event exceeds gapSeconds. Returns one row per session.
    */
  def sessions(events: DataFrame, gapSeconds: Long): DataFrame = {
    val gapUs = gapSeconds * 1000000L
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val withGap = events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
    val withId = withGap.withColumn("session_id",
      sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    withId.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
  }
}
