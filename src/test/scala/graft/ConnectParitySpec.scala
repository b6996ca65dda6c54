package graft

import org.apache.spark.sql.SparkSession

/** Spark Connect PARITY SWEEP (VERDICT r12 #7, carried to r14): a
  * stratified sample of real gate queries — scan/agg, joins, windows,
  * strings, datetime, math, sets, sampling, event analytics, a
  * UDF-bearing query — executed over a remote `sc://` session and
  * compared row-for-row against the classic local session running the
  * SAME code. This is the reference's server story
  * (`blaze/server/server.py:578-692` ships expression trees to Flask)
  * re-expressed as Spark's native client/server split.
  *
  * Architecture findings this spec pins (the "limitations documented"
  * half of the verdict item):
  *  - Pure unified-API pipelines (`functions._`, windows, joins,
  *    groupBy, UDFs whose classes are on the server classpath) run
  *    UNCHANGED over Connect — the whole sampled surface below.
  *  - Native Catalyst kernels constructed CLIENT-side (GraftBridge
  *    wraps an `Expression` in a classic `ExpressionColumnNode`)
  *    cannot serialize to Connect proto — asserted below as a loud
  *    failure, not silent wrong answers. The cluster recipe is the
  *    SQL registry instead: start the server with
  *    `--conf spark.sql.extensions=graft.GraftExtensions` (as this
  *    spec's server does) and invoke kernels BY NAME through
  *    `spark.sql`/`expr` — parity for that path is asserted below
  *    (`normalized_md5`, `hamming_distance`, `shingles` round-trip
  *    through the server's codegen'd expressions).
  *  - Streaming gate rows and localCheckpoint-based iterative
  *    operators stay on the classic session (testkit MemoryStream is
  *    driver-side by design); not sampled here.
  */
class ConnectParitySpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private val port = 15003
  private def serverUp: Boolean =
    try {
      val s = new java.net.Socket()
      try { s.connect(new java.net.InetSocketAddress("localhost", port), 1000); true }
      finally s.close()
    } catch { case _: java.io.IOException => false }

  private val sbin = "/opt/spark/sbin"
  private var startedHere = false

  override def beforeAll(): Unit = {
    super.beforeAll()
    val start = new java.io.File(s"$sbin/start-connect-server.sh")
    val classes = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    if (!serverUp && start.canExecute) {
      val pb = new ProcessBuilder(start.getAbsolutePath,
        "--master", "local[4]",
        "--conf", s"spark.connect.grpc.binding.port=$port",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.sql.session.timeZone=UTC",
        // the graft kernels live on the SERVER: classpath + extensions
        // registry — the cluster deployment shape for Connect users
        "--conf", s"spark.driver.extraClassPath=$classes",
        "--conf", "spark.sql.extensions=graft.GraftExtensions",
        "--conf", "spark.ui.enabled=false")
      // separate pid namespace from ConnectSmokeSpec's 15002 instance
      pb.environment().put("SPARK_IDENT_STRING", "graft-parity")
      pb.redirectErrorStream(true)
        .redirectOutput(java.lang.ProcessBuilder.Redirect.DISCARD)
        .start().waitFor()
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (!serverUp && System.nanoTime() < deadline) Thread.sleep(1000)
      startedHere = serverUp
    }
  }

  override def afterAll(): Unit = {
    val stop = new java.io.File(s"$sbin/stop-connect-server.sh")
    if (startedHere && stop.canExecute) {
      val pb = new ProcessBuilder(stop.getAbsolutePath)
      pb.environment().put("SPARK_IDENT_STRING", "graft-parity")
      pb.redirectErrorStream(true)
        .redirectOutput(java.lang.ProcessBuilder.Redirect.DISCARD)
        .start().waitFor()
    }
    super.afterAll()
  }

  private def remoteSession(): SparkSession =
    SparkSession.builder()
      .config("spark.api.mode", "connect")
      .remote(s"sc://localhost:$port").create()

  /** canonical row rendering: sorted lines of toString — both sides run
    * identical code, so schemas and orderings match; the sort guards
    * the few queries without a total ORDER BY. */
  private def canon(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
    rows.map(_.toString).sorted.toSeq

  // stratified across SURVEY §2 families; every query here is the
  // EXACT gate query (same code object), not a re-derivation
  private val sample = Seq(
    "q1_agg", "q3_shipping",                       // TPC-H scan/agg/join
    "join_inner", "join_outer", "join_semi",       // join hows
    "by_pivot", "by_rollup", "by_having",          // grouping
    "win_rank", "win_rolling",                     // windows
    "str_basic", "str_like_find",                  // strings
    "dt_trunc", "dt_calendar",                     // datetime
    "math_funcs", "arith_ops",                     // math/arith
    "red_summary", "red_var_std",                  // reductions
    "set_bag_ops", "set_distinct_on",              // set ops
    "sort_head", "proj_relabel", "sel_filter",     // sort/proj/sel
    "sel_isin",                                    // semi-join filter
    "ev_funnel",                                   // event analytics
    "misc_map_udf")                                // UDF-bearing (server
                                                   // loads the lambda from
                                                   // extraClassPath)

  // gate queries whose plans embed a client-side native kernel
  // (TopKByScore / HashBucket — the ENTIRE sampling family rides the
  // deterministic HashBucket digest): over Connect these MUST fail
  // with the Unsupported-ColumnNode error, never silently mis-execute;
  // their Connect story is the SQL-registry path asserted in the next
  // test (`hash_bucket` is itself a registered SQL function)
  private val kernelBearing =
    Seq("by_topk", "sort_topn_group", "sample_stratified", "sample_cap_per_key")

  test(s"parity sweep: ${sample.size} gate queries over sc://localhost:$port") {
    assume(serverUp, s"no Spark Connect server on $port and none startable")
    val remote = remoteSession()
    try {
      val failures = sample.flatMap { name =>
        val fn = SparkEntry.queries(name)
        try {
          val got = canon(fn(remote, sf).collect())
          val exp = canon(fn(spark, sf).collect())
          if (got == exp && exp.nonEmpty) None
          else if (exp.isEmpty) Some(s"$name: empty local result — proves nothing")
          else Some(s"$name: ${got.size} remote vs ${exp.size} local rows, " +
            s"first diff remote=${got.diff(exp).headOption} local=${exp.diff(got).headOption}")
        } catch {
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName}: " +
              Option(e.getMessage).getOrElse("").take(120))
        }
      }
      assert(failures.isEmpty, s"${failures.size} parity failures:\n" +
        failures.mkString("\n"))
    } finally remote.stop()
  }

  test("native kernels over Connect: SQL-registry path has parity; client-side Column construction fails loudly") {
    assume(serverUp, s"no Spark Connect server on $port and none startable")
    val remote = remoteSession()
    try {
      // the cluster path: kernels by NAME via the server's extensions
      val sql = """SELECT normalized_md5('Hello  World') AS m,
                  |       hamming_distance(CAST(7 AS BIGINT), CAST(11 AS BIGINT)) AS h,
                  |       shingles('a b c d', 2) AS s""".stripMargin
      GraftFunctions.register(spark) // classic side: live-session registry
      val got = canon(remote.sql(sql).collect())
      val exp = canon(spark.sql(sql).collect())
      assert(got == exp && got.nonEmpty, s"kernel SQL parity: got=$got exp=$exp")

      // the documented limitation: a classic ExpressionColumnNode built
      // CLIENT-side cannot convert to Connect proto — it must FAIL, not
      // mis-execute (silent wrong answers would be the real hazard)
      val kernelCol = graft.plans.NormalizedMd5(
        org.apache.spark.sql.functions.lit("x"))
      val e = intercept[Throwable] {
        remote.range(1).select(kernelCol).collect()
      }
      assert(Option(e.getMessage).exists(_.contains("ColumnNode")),
        s"expected the Unsupported-ColumnNode failure, got: $e")
      // and the three kernel-bearing GATE queries fail the same loud way
      kernelBearing.foreach { name =>
        val k = intercept[Throwable] {
          SparkEntry.queries(name)(remote, sf).collect()
        }
        assert(Option(k.getMessage).exists(_.contains("ColumnNode")),
          s"$name: expected Unsupported-ColumnNode, got: $k")
      }
    } finally remote.stop()
  }

  test("pagination/index surface over Connect: unified-API slice has parity; RDD-backed SortedPages refuses loudly") {
    assume(serverUp, s"no Spark Connect server on $port and none startable")
    val remote = remoteSession()
    try {
      // LIMIT/OFFSET pagination (Table.slice / page — pure unified
      // API) runs unchanged over sc://
      val fn = SparkEntry.queries("sel_slice")
      val got = canon(fn(remote, sf).collect())
      val exp = canon(fn(spark, sf).collect())
      assert(got == exp && exp.nonEmpty,
        s"sel_slice parity: ${got.size} remote vs ${exp.size} local")
      // The exact two-job pagination (paginateSorted) is DRIVER-
      // COORDINATING by design: RangePartitioner boundaries + the
      // prefix-sum count pass must run over ONE materialized RDD
      // instance, and `Dataset.rdd` does not exist on a Connect
      // client. The riskiest wrong behavior would be a client-side
      // re-materialization with DIFFERENT partition boundaries
      // (silently inconsistent pages); this pins the actual behavior:
      // a loud refusal. Cluster recipe for Connect users: run the
      // pagination job server-side (a classic session / submitted
      // job), the same placement rule as the streaming gate rows.
      // the refusal is now an EXPLICIT engine-side guard in
      // Table.paginateSorted (ADVICE r15: the previous broad match —
      // any Throwable mentioning "rdd"/"not supported" — could be
      // satisfied by an unrelated transport error), so pin the exact
      // exception type and its message
      for (name <- Seq("sel_slice_sorted", "sel_slice_strided", "sel_with_index")) {
        val e = intercept[UnsupportedOperationException] {
          SparkEntry.queries(name)(remote, sf).collect()
        }
        assert(Option(e.getMessage).getOrElse("").contains("paginateSorted"),
          s"$name: expected the paginateSorted Connect guard, got: $e")
      }
    } finally remote.stop()
  }
}
