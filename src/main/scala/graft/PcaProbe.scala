package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-off profiling probe for the PCA Gram pass — compares the full
  * d² double-explosion (decimal multiply) against the upper-triangle
  * slice explosion (long multiply, decimal accumulate) with a value-
  * equality witness, so the scatter-pass shape is chosen by
  * measurement on the current box, not by allocation-count intuition
  * (slice() copies an array per (row, i); posexplode re-reads in
  * place — which effect wins is exactly what this measures).
  */
object PcaProbe {
  private[graft] def run(spark: SparkSession, sfDir: String): Unit = {
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val B = DecimalType(38, 0)
    val qscale = 1L << 20
    val qdf = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id").as("_id"),
        transform(col("embedding"), x =>
          floor(x.cast(DoubleType) * qscale).cast(LongType)).as("_qv"))
      .cache()
    println("[probe] rows: " + qdf.count())

    def fullGram(): Map[(Int, Int), BigInt] = qdf
      .select(col("_qv"), posexplode(col("_qv")).as(Seq("_ai", "_aq")))
      .select(col("_ai"), col("_aq"), posexplode(col("_qv")).as(Seq("_bi", "_bq")))
      .groupBy(col("_ai"), col("_bi"))
      .agg(sum(col("_aq").cast(B) * col("_bq").cast(B)).as("_g"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        BigInt(r.getDecimal(2).toBigInteger)).toMap

    def upperGram(): Map[(Int, Int), BigInt] = {
      val upper = qdf
        .select(col("_qv"), posexplode(col("_qv")).as(Seq("_ai", "_aq")))
        .select(col("_ai"),
          posexplode(slice(col("_qv"), col("_ai") + 1,
            size(col("_qv")) - col("_ai"))).as(Seq("_boff", "_bq")),
          col("_aq"))
        .groupBy(col("_ai"), (col("_ai") + col("_boff")).cast(IntegerType).as("_bi"))
        .agg(sum((col("_aq") * col("_bq")).cast(B)).as("_g"))
        .collect().map(r => (r.getInt(0), r.getInt(1)) ->
          BigInt(r.getDecimal(2).toBigInteger)).toMap
      upper ++ upper.map { case ((i, j), v) => (j, i) -> v }
    }

    // full d² with LONG multiply (no slice allocation, 2x the rows of
    // the triangle form but each row cheaper than the decimal multiply)
    def fullGramLong(): Map[(Int, Int), BigInt] = qdf
      .select(col("_qv"), posexplode(col("_qv")).as(Seq("_ai", "_aq")))
      .select(col("_ai"), col("_aq"), posexplode(col("_qv")).as(Seq("_bi", "_bq")))
      .groupBy(col("_ai"), col("_bi"))
      .agg(sum((col("_aq") * col("_bq")).cast(B)).as("_g"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        BigInt(r.getDecimal(2).toBigInteger)).toMap

    val g1 = timed("full d^2, decimal multiply")(fullGram())
    val g2 = timed("upper triangle, long multiply")(upperGram())
    val g3 = timed("full d^2, long multiply")(fullGramLong())
    // second timing of each after JIT warm
    timed("full d^2, decimal multiply (warm)")(fullGram())
    timed("upper triangle, long multiply (warm)")(upperGram())
    timed("full d^2, long multiply (warm)")(fullGramLong())
    println("[probe] g1 == g2: " + (g1 == g2))
    println("[probe] g1 == g3: " + (g1 == g3))

  }
}
