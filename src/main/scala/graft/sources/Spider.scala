package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dataset auto-discovery over a directory tree — the engine-side
  * equivalent of the reference server's `spider`
  * (`server/spider.py:26-64`), which walks a data root and binds every
  * recognizable file to a named server dataset. Here the walk returns a
  * CATALOG TABLE instead of mutating server state: one row per
  * discovered dataset with its name (path relative to the root, '/'
  * joined by '.'), detected format, full path, and column count — the
  * schema comes from the same [[graft.api.Table.data]] reader router
  * queries use, so discovery and reads can never disagree on format
  * rules.
  *
  * Scale notes: the walk is a driver-side listing (same as the
  * reference server's), which is the right shape — a catalog scan is
  * metadata work, bounded by dataset COUNT, not data size; schema
  * discovery per dataset is lazy reader construction (parquet footer /
  * csv header sniff), never a data scan. Works against any Hadoop
  * filesystem (local, HDFS, S3A) since it goes through the
  * SparkContext's configured FS. A directory whose files look like a
  * parquet dataset (part-* members or *.parquet, the layout every
  * Spark writer emits) is bound as ONE dataset and not descended into;
  * unreadable or unrecognized entries are skipped, as in the
  * reference (`spider.py:40-47` swallows per-entry failures).
  */
object Spider {

  private val FileFormats =
    Seq("parquet", "csv", "json", "orc", "xml", "txt")

  /** Walk `root` and return the catalog: (dataset, format, path,
    * n_cols), sorted by dataset name. */
  def discover(spark: SparkSession, root: String): DataFrame = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootUri = fs.getFileStatus(rootPath).getPath // normalized

    def relName(p: Path): String =
      p.toString.stripPrefix(rootUri.toString).stripPrefix("/")
        .replace('/', '.')

    // a directory is ONE dataset when it holds writer-emitted members
    // (part-* files or *.parquet); its format is the members' extension
    // — Spark writes csv/json/txt datasets as DIRECTORIES of part-*.ext
    def memberFormat(dir: Path): Option[String] =
      fs.listStatus(dir).collectFirst {
        case st if st.isFile && st.getPath.getName.endsWith(".parquet") =>
          "parquet"
        case st if st.isFile && st.getPath.getName.startsWith("part-") &&
          FileFormats.exists(f => st.getPath.getName.endsWith("." + f)) =>
          val n = st.getPath.getName
          n.drop(n.lastIndexOf('.') + 1).toLowerCase
      }

    def walk(dir: Path): Seq[(String, String, String)] =
      fs.listStatus(dir).toSeq.flatMap { st =>
        val p = st.getPath
        val name = p.getName
        if (name.startsWith("_") || name.startsWith(".")) Nil
        else if (st.isDirectory) {
          memberFormat(p) match {
            case Some("parquet") => Seq((relName(p), "parquet", p.toString))
            // route through a glob so the reader dispatches on extension
            case Some(ext)       => Seq((relName(p), ext, s"$p/*.$ext"))
            case None            => walk(p)
          }
        } else {
          val ext = name.drop(name.lastIndexOf('.') + 1).toLowerCase
          if (name.contains('.') && FileFormats.contains(ext))
            Seq((relName(p).stripSuffix("." + ext), ext, p.toString))
          else Nil
        }
      }

    val rows = walk(rootUri).flatMap { case (name, fmt, path) =>
      // lazy reader construction only — a bad file is skipped, not fatal
      try Some((name, fmt, path,
        graft.api.Table.data(spark, path).df.schema.fields.length.toLong))
      catch { case _: Exception => None }
    }.sortBy(_._1)
    import spark.implicits._
    rows.toDF("dataset", "format", "path", "n_cols")
  }
}
