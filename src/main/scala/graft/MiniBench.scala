package graft
import org.apache.spark.sql.SparkSession
object MiniBench {
  private[graft] def run(spark: SparkSession, sfDir: String): Unit = {
    SparkEntry.queries("q1_agg")(spark, sfDir).count()
    val names = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("q1_agg", "sim_ivf_trained", "sim_ivf_trained"))
    for (n <- names) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      println(f"MINI $n ${(System.nanoTime() - t0) / 1e9}%.2f")
    }
  }
}
