package graft

import org.apache.spark.sql.SparkSession

/** Flagship-entry smoke: runs [[SparkEntry.entry]] (the driver's
  * rows>0 contract) and prints `ENTRY_ROWS=<n>`. Used by the /verify
  * recipe.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(5, truncate = false)
    println(s"ENTRY_ROWS=${df.count()}")
    spark.stop()
  }
}
