package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Driver-side parquet-footer reads for store METADATA questions that
  * a `spark.read.parquet(...)` answers with a whole Spark job (footer
  * inference is one job; a value question like "the register width"
  * is a second). A store lifecycle op asks these once per call, so at
  * ~100 ms of scheduling per local job the footers are the difference
  * between a lifecycle query dominated by scheduling and one dominated
  * by its writes (r22, guide §6 fewer jobs). Everything here reads
  * file METADATA (schema fields, column chunk statistics) through
  * parquet-hadoop on the driver — no task is launched, no row is read.
  */
object ParquetFooters {

  private def partFiles(spark: SparkSession, dir: String): Seq[Path] = {
    val d = new Path(dir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(d).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
  }

  private def withReader[A](spark: SparkSession, file: Path)(
      f: org.apache.parquet.hadoop.ParquetFileReader => A): A = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(file, spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try f(r) finally r.close()
  }

  /** Top-level column names of `dir`'s parquet files, from ONE
    * part-file footer. One suffices when the directory was written by
    * a single `write.parquet` (every store generation in this repo
    * is), whose parts share a schema by construction.
    */
  def columnNames(spark: SparkSession, dir: String): Set[String] = {
    val part = partFiles(spark, dir).headOption
      .getOrElse(sys.error(s"no parquet part files under $dir"))
    withReader(spark, part)(
      _.getFileMetaData.getSchema.getFields.asScala.map(_.getName).toSet)
  }

  /** (min, max) of an INT32 column across EVERY part file and row
    * group of `dir`, from column-chunk statistics. None when the
    * directory holds no rows. Fails loudly on missing stats or a
    * missing/non-int32 column rather than guessing.
    */
  def int32Range(spark: SparkSession, dir: String, column: String): Option[(Int, Int)] = {
    val ranges = partFiles(spark, dir).flatMap { part =>
      withReader(spark, part) { r =>
        r.getFooter.getBlocks.asScala.flatMap { b =>
          val cc = b.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .getOrElse(sys.error(s"$part has no column chunk for '$column'"))
          if (b.getRowCount == 0L) None
          else {
            val st = cc.getStatistics
            require(st != null && !st.isEmpty && st.hasNonNullValue,
              s"$part lacks statistics for '$column'")
            (st.genericGetMin, st.genericGetMax) match {
              case (lo: java.lang.Integer, hi: java.lang.Integer) =>
                Some((lo.intValue, hi.intValue))
              case other =>
                sys.error(s"'$column' in $part is not int32: $other")
            }
          }
        }.toSeq
      }
    }
    if (ranges.isEmpty) None
    else Some((ranges.map(_._1).min, ranges.map(_._2).max))
  }
}
