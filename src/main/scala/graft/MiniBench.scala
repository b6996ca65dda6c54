package graft
import org.apache.spark.sql.SparkSession
object MiniBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // FileStreamSink.hasMetadata probes every glob read path for a
    // streaming _spark_metadata dir and WARN-logs the (expected) miss
    // with a full FileNotFoundException stack - benign but alarming in
    // driver logs, so that one logger is quieted to ERROR
    org.apache.log4j.Logger
      .getLogger("org.apache.spark.sql.execution.streaming.sinks.FileStreamSink")
      .setLevel(org.apache.log4j.Level.ERROR)
    spark.range(1000000L).selectExpr("sum(id)").collect()
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
    spark.stop()
  }
}
