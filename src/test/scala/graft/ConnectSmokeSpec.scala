package graft

import org.apache.spark.sql.SparkSession
import graft.api.{Col, Table}

/** Spark Connect smoke: the whole `Table` surface is built on the
  * UNIFIED `SparkSession`/`Dataset`/`Column` API (spark-sql-api), so a
  * Column-only query must run unchanged against a remote
  * `sc://` session — the claim the README's blaze-server mapping table
  * makes (reference: `blaze/server/server.py:578-692` ships expression
  * trees to a Flask server; Connect is Spark's native version of that).
  *
  * The test needs a live server (`/opt/spark/sbin/start-connect-server.sh`,
  * gRPC port 15002) and is CANCELED, not failed, when none is listening —
  * the driver's `sbt test` gate stays hermetic while the smoke stays
  * runnable on demand.
  */
class ConnectSmokeSpec extends SparkSpec {

  private def connectServerUp: Boolean =
    try {
      val s = new java.net.Socket()
      try { s.connect(new java.net.InetSocketAddress("localhost", 15002), 1000); true }
      finally s.close()
    } catch { case _: java.io.IOException => false }

  // the same Column-only graft pipeline, against whichever session —
  // the point of the smoke is that this code has no idea whether it is
  // local or remote
  private def pipeline(s: SparkSession, dir: String): Seq[(Long, Long, Double)] =
    Table.data(s, s"$dir/orders.parquet")
      .filter(Col(org.apache.spark.sql.functions.col("o_orderstatus")) === "O")
      .merge("key_bucket" -> Col(org.apache.spark.sql.functions.col("o_custkey")) % 3L)
      .by("key_bucket",
        "n" -> Col(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1))),
        "total" -> Col(org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.sum("o_totalprice"), 2)))
      .sort("key_bucket")
      .df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("Column-only Table query runs unchanged over sc://localhost:15002") {
    assume(connectServerUp,
      "no Spark Connect server on 15002 — start with /opt/spark/sbin/start-connect-server.sh")
    // same fixture dir as every other suite (override for a server on
    // another machine whose data lives elsewhere)
    val dir = sys.env.getOrElse("GRAFT_CONNECT_DIR", sf)
    val remote = SparkSession.builder()
      .config("spark.api.mode", "connect")
      .remote(sys.env.getOrElse("GRAFT_CONNECT_URL", "sc://localhost:15002")).create()
    try {
      val got = pipeline(remote, dir)
      val exp = pipeline(spark, dir) // classic local session, same code path
      assert(got.nonEmpty && got == exp,
        s"remote/classic parity: got=$got exp=$exp")
    } finally remote.stop()
  }
}
