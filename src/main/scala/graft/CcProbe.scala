package graft

import org.apache.spark.sql.SparkSession

/** Job-level attribution of one connectedComponents call (r18): a
  * permuted-id chain (the adversarial O(log n)-rounds shape) through
  * [[graft.operators.Cluster.connectedComponents]] with a listener
  * printing every job's call site, so the per-round job floor can be
  * itemized instead of estimated. GRAFT_CC_N sets the chain length
  * (default 20000).
  */
object CcProbe {
  private[graft] def run(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val n = sys.env.get("GRAFT_CC_N").map(_.toLong).getOrElse(20000L)
    // permuted chain: node ids are a fixed pseudorandom permutation so
    // min-id propagation cannot shortcut along monotone runs
    val perm = spark.range(n)
      .select(col("id"), xxhash64(col("id")).as("h"))
      .orderBy("h").select(col("id"))
      .as[Long].collect()
    val edges = (1 until n.toInt).map(i => (perm(i - 1), perm(i)))
      .toDF("src", "dst")
    val nodes = spark.range(n).toDF("id")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          val site = Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
          println(s"[ccjob] ${js.jobId} stages=${js.stageInfos.size} $site")
        }
      })
    val t0 = System.nanoTime()
    val out = graft.operators.Cluster
      .connectedComponents(nodes, edges, maxIter = 40)
    val nLabels = out.select(countDistinct(col("label"))).as[Long].head()
    org.apache.spark.sql.GraftBridge.drainListeners(spark)
    println(f"[ccprobe] n=$n components=$nLabels jobs=${jobs.get} " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
  }
}
