package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    gatePreflight()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // FileStreamSink.hasMetadata probes every glob read path for a
    // streaming _spark_metadata dir and WARN-logs the (expected) miss
    // with a full FileNotFoundException stack - benign but alarming in
    // driver logs, so that one logger is quieted to ERROR
    org.apache.log4j.Logger
      .getLogger("org.apache.spark.sql.execution.streaming.sinks.FileStreamSink")
      .setLevel(org.apache.log4j.Level.ERROR)
    new java.io.File(outDir).mkdirs()
    // optional comma-separated name filter for fast local iteration
    // (driver leaves it unset → full run)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }

  /** Oracle-gate preflight, wired into the run path so a fresh VM can't
    * silently regress: a few hundred DuckDB oracle queries in one process
    * accumulate ~54k memory maps, and the kernel default
    * vm.max_map_count=65530 makes them intermittently die with
    * OutOfMemoryException while RAM is free (the round-9 gate lost
    * 168/290 rows to exactly this). Verify runs immediately before the
    * driver's DuckDB compare, so this is the right hook: raise the cap
    * if possible (scripts/prepare_gate.sh recipe), else warn LOUDLY with
    * the remedy. Never fails the export itself — a missing sysctl must
    * not zero the round. Linux-only by construction (reads procfs). */
  private def gatePreflight(): Unit = {
    val p = Paths.get("/proc/sys/vm/max_map_count")
    if (!Files.exists(p)) return
    // NOT Files.readString: procfs reports size 0 and NIO's sized read
    // comes back truncated (observed: "1" for "1048576"); a plain
    // stream read returns the real content
    def cur(): Long = {
      val in = new java.io.FileInputStream(p.toFile)
      try new String(in.readAllBytes()).trim.toLong finally in.close()
    }
    val want = 1048576L
    if (cur() >= want) return
    try { // same remedy as scripts/prepare_gate.sh
      new ProcessBuilder("sysctl", "-w", s"vm.max_map_count=$want")
        .inheritIO().start().waitFor()
    } catch { case _: Exception => () }
    if (cur() < want)
      System.err.println(
        s"""[verify] WARNING: vm.max_map_count=${cur()} < $want — the DuckDB
           |[verify] oracle gate that follows this export is likely to lose
           |[verify] queries to spurious OutOfMemoryException (see BASELINE.md
           |[verify] "Oracle-harness reliability note"). Remedy before the
           |[verify] compare:  sh scripts/prepare_gate.sh""".stripMargin)
    else
      System.err.println(s"[verify] gate preflight: raised vm.max_map_count to $want")
  }
}
