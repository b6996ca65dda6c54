package graft
import org.apache.spark.sql.SparkSession

/** Isolated re-time of named Bench rows (SPARK_GRAFT_ONLY), with
  * per-query shuffle-write / shuffle-read / disk-spill totals — the
  * exchange-volume measurement VERDICT-style audits ask for ("what
  * widens this row's exchange?") without the Spark UI.
  */
object MiniBench {
  private[graft] def run(spark: SparkSession, sfDir: String): Unit = {
    SparkEntry.queries("q1_agg")(spark, sfDir).count()
    val shw = new java.util.concurrent.atomic.AtomicLong
    val shr = new java.util.concurrent.atomic.AtomicLong
    val spill = new java.util.concurrent.atomic.AtomicLong
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val tm = te.taskMetrics
          if (tm != null) {
            shw.addAndGet(tm.shuffleWriteMetrics.bytesWritten)
            shr.addAndGet(tm.shuffleReadMetrics.totalBytesRead)
            spill.addAndGet(tm.diskBytesSpilled)
          }
          tasks.incrementAndGet()
        }
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          stages.incrementAndGet()
      })
    val names = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("q1_agg", "sim_ivf_trained", "sim_ivf_trained"))
    for (n <- names) {
      spark.catalog.clearCache()
      // drain in-flight listener events so the previous query's tasks
      // don't bleed into this query's counters
      org.apache.spark.sql.GraftBridge.drainListeners(spark)
      val (w0, r0, s0) = (shw.get, shr.get, spill.get)
      val (j0, g0, k0) = (jobs.get, stages.get, tasks.get)
      spark.sparkContext.setJobDescription(s"mini: $n") // guide §1.5
      val t0 = System.nanoTime()
      // clear in a finally (ADVICE r17): a throwing count() must not
      // bleed this query's description onto every later query's jobs
      try SparkEntry.queries(n)(spark, sfDir).count()
      finally spark.sparkContext.setJobDescription(null)
      org.apache.spark.sql.GraftBridge.drainListeners(spark)
      val mb = 1024.0 * 1024
      println(f"MINI $n ${(System.nanoTime() - t0) / 1e9}%.2f s  " +
        f"shw=${(shw.get - w0) / mb}%.1fMB shr=${(shr.get - r0) / mb}%.1fMB " +
        f"spill=${(spill.get - s0) / mb}%.1fMB " +
        s"jobs=${jobs.get - j0} stages=${stages.get - g0} tasks=${tasks.get - k0}")
    }
  }
}
