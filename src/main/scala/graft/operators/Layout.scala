package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-layout operators (north-star extension): at 100 TB the scan is
  * the dominant cost, and what a scan reads is decided at WRITE time by
  * row-group min/max footer statistics. Z-order clustering interleaves
  * the bits of several filter columns into one sort key, so sorting by
  * it makes every output file a hyper-rectangle-ish tile in the
  * multi-column space — min/max stats stay tight on ALL interleaved
  * columns at once, and a selective filter on any of them prunes most
  * files without reading them. (One-column sorts give perfect pruning on
  * that column and none on the others.)
  *
  * The z-value is plain codegen'd bit arithmetic (shift/and/or on
  * longs) — no UDF, fully pushed into whole-stage codegen, and simple
  * enough that the DuckDB oracle recomputes it from the same published
  * bit-interleaving definition.
  */
object Layout {

  /** Morton/z-value of `cols` (each masked to its low `bits` bits; the
    * caller maps columns onto a bounded non-negative integer range
    * first — rank, bucket id, truncated value). Bit i of column j lands
    * at output bit `i * cols.length + j`, the standard interleave.
    * `bits * cols.length` must stay ≤ 63 (sign-free long).
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits > 0 && bits * cols.length <= 63,
      s"zValue: need 0 < bits*${cols.length} <= 63, got bits=$bits")
    // In-plan range guard: a negative input would interleave its
    // two's-complement bits and an oversized one would be silently
    // masked — either way the clustering order is meaningless, so
    // violations fail loudly at evaluation. NULLs pass through (the
    // z-value is NULL, sorting them together — same as any sort key).
    val guarded = cols.map { c =>
      val lc = c.cast(LongType)
      when(lc < 0 || shiftrightunsigned(lc, bits) =!= 0,
        raise_error(concat(lit(s"zValue: input outside [0, 2^$bits): "),
          lc.cast(StringType))))
        .otherwise(lc)
    }
    val terms = for {
      (c, j) <- guarded.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)),
      i * cols.length + j)
    terms.reduce(_ + _)
  }

  /** Hilbert-curve sort key over two bounded non-negative columns — the
    * locality-better sibling of [[zValue]] for the common two-filter-
    * column case: consecutive key values are always grid NEIGHBORS
    * (the unit-step property, exhaustively asserted in the unit suite),
    * where the Morton curve jumps across the space at power-of-two
    * seams — so Hilbert tiles keep per-file min/max bounds tighter on
    * both columns. Same input contract and loud-failure guard as
    * [[zValue]]; NULL in → NULL key. Native codegen'd kernel
    * ([[graft.plans.HilbertValue]]), replayed level-by-level in the
    * DuckDB oracle.
    */
  def hilbertValue(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && 2 * bits <= 62,
      s"hilbertValue: need 0 < bits <= 31, got $bits")
    graft.plans.HilbertValue(x.cast(LongType), y.cast(LongType), bits)
  }

  /** Cluster `df` for writing: range-partition into `numFiles` splits of
    * the z-value over `cols`, sorted within each split — each output
    * file then covers one compact z-range (a spatial tile). Write the
    * result with a plain parquet writer; the layout, not the writer,
    * carries the skipping power. The z column is internal and dropped.
    */
  def zorderBy(df: DataFrame, cols: Seq[Column], bits: Int, numFiles: Int): DataFrame = {
    require(numFiles > 0, s"zorderBy: numFiles must be positive, got $numFiles")
    df.withColumn("_z", zValue(cols, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }

  /** [[zorderBy]]'s Hilbert sibling for the two-filter-column case:
    * range-partition + sort on [[hilbertValue]]. Each output file then
    * covers one contiguous Hilbert arc, which is also one CONNECTED
    * region of the (x, y) plane (the unit-step property) — per-file
    * min/max bounds stay tight on both columns with none of the Morton
    * seam jumps that stretch a z-file's bounding box across the space.
    */
  def hilbertBy(df: DataFrame, x: Column, y: Column, bits: Int, numFiles: Int): DataFrame = {
    require(numFiles > 0, s"hilbertBy: numFiles must be positive, got $numFiles")
    df.withColumn("_h", hilbertValue(x, y, bits))
      .repartitionByRange(numFiles, col("_h"))
      .sortWithinPartitions("_h")
      .drop("_h")
  }

  /** Deterministic hash key for a seeded global shuffle: `md5(seed ∥
    * 0x01 ∥ id₁ ∥ 0x01 ∥ …)`. md5 is chosen deliberately over the
    * cheaper xxhash64: it is bit-identical across engines (Spark,
    * DuckDB, Postgres all expose the same md5-of-string), so an
    * external system can INDEPENDENTLY recompute the exact training
    * order from (seed, keys) alone — the shuffle is reproducible
    * without access to this library.
    */
  def shuffleKey(seed: Long, idCols: Seq[Column]): Column = {
    require(idCols.nonEmpty, "shuffleKey: at least one id column")
    md5(concat_ws("\u0001",
      (lit(seed).cast(StringType) +: idCols.map(_.cast(StringType))): _*)
      .cast(BinaryType))
  }

  /** Seeded global shuffle for training-data export: every epoch of a
    * training run wants the corpus in a different — but REPRODUCIBLE —
    * random order. Rows are totally ordered by [[shuffleKey]] (md5 of
    * seed + key ⇒ uniform, collision-free for unique keys) and each row
    * is tagged with its exact global position `posCol` ∈ [0, n).
    *
    * Scale shape: the md5 keys are uniform by construction, so the
    * range exchange that sorts them is perfectly balanced — no skew,
    * no sampling surprises, no single-point funnel. The exact global
    * index uses the [[graft.api.SortedPages]] one-RDD two-job scheme
    * (count pass + prefix-sum of per-partition offsets), NOT a global
    * `row_number()` window (which Spark executes on ONE partition).
    * `idCols` must be a unique key for the order to be total; ties
    * beyond the hash are broken by the ids themselves.
    */
  def shuffled(df: DataFrame, idCols: Seq[Column], seed: Long,
               posCol: String = "shuffle_pos"): DataFrame = {
    val shufCol = "_graft_shuffle_key"
    val keyed = df.withColumn(shufCol, shuffleKey(seed, idCols))
    graft.api.Table(keyed)
      .paginateSorted(col(shufCol) +: idCols)
      .withIndex(posCol)
      .df.drop(shufCol)
  }

  /** Small-files compaction — the OTHER write-time layout problem: a
    * streaming sink or over-parallel job that left thousands of tiny
    * files makes every later scan pay per-file open/footer/scheduling
    * costs (and the 100 TB catalog lists them all). Rewrite a directory
    * into `ceil(rows / rowsPerFile)` files:
    *
    * one `count()` + one round-robin `repartition(n)` (NOT `coalesce`:
    * coalesce would chain the narrow read partitions onto few tasks —
    * no parallelism in the rewrite and skew-sized outputs; the shuffle
    * both parallelizes the write and evens file sizes). Ordered layouts
    * compose via [[zorderBy]] instead — compaction is for UNordered
    * data where only file count/size matters.
    */
  def compactTo(df: DataFrame, rowsPerFile: Long): DataFrame = {
    require(rowsPerFile > 0, s"compactTo: rowsPerFile must be positive, got $rowsPerFile")
    val n = math.max(1L, (df.count() + rowsPerFile - 1) / rowsPerFile)
    require(n <= Int.MaxValue, s"compactTo: $n output files")
    df.repartition(n.toInt)
  }

  /** read → compact → overwrite for a parquet directory (the in-place
    * form: materializes the rewrite to `path + ".compact.tmp"` first,
    * since Spark cannot overwrite a path it is reading). NOT atomic:
    * the delete→rename window can lose the directory if the driver
    * dies between the two — on a production object store, compact into
    * a NEW prefix and flip the table location/catalog pointer instead.
    */
  def compactParquetDir(spark: org.apache.spark.sql.SparkSession, path: String,
                        rowsPerFile: Long): Long = {
    val tmp = path + ".compact.tmp"
    compactTo(spark.read.parquet(path), rowsPerFile)
      .write.mode("overwrite").parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(path))
    spark.read.parquet(path).count()
  }
}
