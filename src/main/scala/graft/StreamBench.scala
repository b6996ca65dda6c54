package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming throughput faces, separated (VERDICT r10 "What's wrong" #5):
  * the gate's `stream_sessions` / `stream_interval_left` rows replay the
  * bounded fixture through a driver-side MemoryStream in event-time-ordered
  * micro-batches — the right CORRECTNESS harness (the watermark genuinely
  * advances, Append emits mid-stream) but a misleading THROUGHPUT probe:
  * the driver iterator feed + 4-5 state-store commit rounds dominate.
  *
  * This main times BOTH faces per operator so BASELINE.md can record
  * harness cost and operator cost side by side:
  *   - `*_file`: the OPERATOR face — a real file-source parquet stream
  *     (no driver feed, executor-parallel reads), one `processAllAvailable`
  *     pass. Stateful work (sort, state build/commit, join buffering) all
  *     happens; tail rows whose emit needs a later watermark stay in
  *     state, which is exactly the steady-state shape of a live job.
  *   - `*_replay`: the HARNESS face — the same lock-step MemoryStream
  *     replay the gate row uses, timed end-to-end for the delta.
  *
  * Prints one JSON line:
  *   {"metric":"stream_faces","sessions_file":s,"sessions_replay":s,
  *    "interval_left_file":s,"interval_left_replay":s,"sf":"…"}
  */
object StreamBench {
  private[graft] def run(spark: SparkSession, sfDir: String): Unit = {

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // one state-store instance commits per shuffle partition per
    // micro-batch — same 8-partition setting as the gate rows so the
    // file/replay delta isolates the FEED, not the partitioning
    def withStatePartitions[A](n: Int)(f: => A): A = {
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, n.toString)
      try f finally spark.conf.set(key, prev)
    }
    def runToCount(streaming: DataFrame, name: String,
                   mode: String = "append"): Unit = {
      val q = streaming.writeStream
        .format("memory").queryName(name).outputMode(mode).start()
      try { q.processAllAvailable() } finally q.stop()
      spark.table(name).count()
      spark.sql(s"DROP TABLE IF EXISTS $name")
    }

    // ---- sessions: operator face (file source, one pass) ----
    val sessionsFile = timed {
      withStatePartitions(8) {
        val src = PipelineEntry.eventsStream(spark, sfDir)
          .select(col("user_id"), col("ts"), col("value"))
        runToCount(
          graft.streaming.StreamOps
            .statefulSessions(spark, src, gapSeconds = 1800L,
              watermark = "1 second").toDF(),
          "sb_sessions_file")
      }
    }
    // ---- sessions: harness face (the gate's MemoryStream replay) ----
    val events = Tables(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("value"))
    val sessionsReplay = timed {
      graft.testkit.StreamReplay
        .replayStatefulSessions(spark, events, gapSeconds = 1800L,
          name = "sb_sessions_replay").count()
    }

    // ---- interval left join: operator face ----
    val intervalFile = timed {
      withStatePartitions(8) {
        def src() = PipelineEntry.eventsStream(spark, sfDir)
        val views = src().filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = src().filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        runToCount(
          graft.streaming.StreamOps.intervalJoinLeftOuter(
            views, purchases, "user_id", windowSeconds = 600L,
            watermark = "1 second"),
          "sb_interval_file")
      }
    }
    // ---- interval left join: harness face ----
    val intervalReplay = timed {
      val all = Tables(spark, sfDir, "events")
      val views = all.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = all.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.testkit.StreamReplay
        .replayIntervalJoinLeftOuter(spark, views, purchases, "user_id",
          windowSeconds = 600L, name = "sb_interval_replay").count()
    }

    // ---- CUSUM: operator face (file source, one pass) ----
    val cusumFile = timed {
      withStatePartitions(8) {
        val src = PipelineEntry.eventsStream(spark, sfDir)
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        runToCount(
          graft.streaming.StreamOps
            .cusumStream(spark, src, kCenti = 5000L, hCenti = 20000L).toDF(),
          "sb_cusum_file")
      }
    }
    // ---- CUSUM: harness face (the gate's MemoryStream replay) ----
    val cusumReplay = timed {
      graft.testkit.StreamReplay
        .replayCusum(spark,
          Tables(spark, sfDir, "events")
            .select(col("user_id"), col("event_id"), col("ts"), col("value")),
          kCenti = 5000L, hCenti = 20000L, name = "sb_cusum_replay").count()
    }

    // ---- anomaly / attribution / ewma / holt: both faces ----
    // (the remaining sf10-heavy gate rows — VERDICT r12 next-round #2:
    // the suite record needs operator-cost numbers with the harness
    // cost beside them, not MemoryStream-feed time masquerading as
    // operator cost)
    val anomalyFile = timed {
      withStatePartitions(8) {
        val src = PipelineEntry.eventsStream(spark, sfDir)
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        runToCount(
          graft.streaming.StreamOps.anomalyStream(spark, src, k = 5, z = 3L).toDF(),
          "sb_anomaly_file")
      }
    }
    val anomalyReplay = timed {
      graft.testkit.StreamReplay.replayAnomalies(spark,
        Tables(spark, sfDir, "events")
          .select(col("user_id"), col("event_id"), col("ts"), col("value")),
        k = 5, z = 3L, name = "sb_anomaly_replay").count()
    }
    val attributionFile = timed {
      withStatePartitions(8) {
        val src = PipelineEntry.eventsStream(spark, sfDir)
          .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
        runToCount(
          graft.streaming.StreamOps.attributionStream(spark, src,
            conversionType = "purchase",
            touchTypes = Seq("view", "click", "signup"),
            watermark = "1 second").toDF(),
          "sb_attribution_file")
      }
    }
    val attributionReplay = timed {
      graft.testkit.StreamReplay.replayAttribution(spark,
        Tables(spark, sfDir, "events")
          .select(col("user_id"), col("ts"), col("event_type"), col("event_id")),
        conversionType = "purchase",
        touchTypes = Seq("view", "click", "signup"),
        name = "sb_attribution_replay").count()
    }
    val ewmaFile = timed {
      withStatePartitions(8) {
        val src = PipelineEntry.eventsStream(spark, sfDir)
          .select(col("user_id"), col("ts"), col("value"))
        runToCount(
          graft.streaming.StreamOps.ewmaStream(spark, src, 1L, 5L).toDF(),
          "sb_ewma_file", mode = "update")
      }
    }
    val ewmaReplay = timed {
      graft.testkit.StreamReplay.replayEwma(spark,
        Tables(spark, sfDir, "events")
          .select(col("user_id"), col("ts"), col("value")),
        aNum = 1L, aDen = 5L, name = "sb_ewma_replay").count()
    }
    val holtFile = timed {
      withStatePartitions(8) {
        val src = PipelineEntry.eventsStream(spark, sfDir)
          .select(col("user_id"), col("ts"), col("value"))
        runToCount(
          graft.streaming.StreamOps.holtStream(spark, src, 2L, 10L, 3L, 10L).toDF(),
          "sb_holt_file", mode = "update")
      }
    }
    val holtReplay = timed {
      graft.testkit.StreamReplay.replayHolt(spark,
        Tables(spark, sfDir, "events")
          .select(col("user_id"), col("ts"), col("value")),
        2L, 10L, 3L, 10L, name = "sb_holt_replay").count()
    }

    // ---- engine floor (r17): a STATELESS pass-through through the
    // identical harness shape (file source → select → memory sink, one
    // processAllAvailable) — no state store, no watermark, no join.
    // Whatever this reads is pure streaming-engine machinery (query
    // start/stop, micro-batch planning, sink commit); the delta between
    // a stateful face and this floor is the operator's true cost. Run
    // twice so the second reading is JIT/footer-warm like the suite.
    def floorOnce(name: String): Double = timed {
      withStatePartitions(8) {
        runToCount(
          PipelineEntry.eventsStream(spark, sfDir)
            .select(col("user_id"), col("ts"), col("value")),
          name)
      }
    }
    val floorCold = floorOnce("sb_floor_1")
    val floorWarm = floorOnce("sb_floor_2")

    println(f"""{"metric":"stream_faces","floor_file_cold":$floorCold%.2f,"floor_file_warm":$floorWarm%.2f,"sessions_file":$sessionsFile%.2f,"sessions_replay":$sessionsReplay%.2f,"interval_left_file":$intervalFile%.2f,"interval_left_replay":$intervalReplay%.2f,"cusum_file":$cusumFile%.2f,"cusum_replay":$cusumReplay%.2f,"anomaly_file":$anomalyFile%.2f,"anomaly_replay":$anomalyReplay%.2f,"attribution_file":$attributionFile%.2f,"attribution_replay":$attributionReplay%.2f,"ewma_file":$ewmaFile%.2f,"ewma_replay":$ewmaReplay%.2f,"holt_file":$holtFile%.2f,"holt_replay":$holtReplay%.2f,"sf":"$sfDir"}""")

  }
}
