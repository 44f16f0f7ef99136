package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support — the co-located-join lever at lake scale.
  *
  * A fact table bucketed (and sorted) by its join key joins another
  * table bucketed the same way with NO exchange and NO sort: Spark
  * matches `HashPartitioning(key, n)` on both sides at plan time. For
  * the adjustment engine that means bars ⋈ factor grids on `id`, or
  * unadjusted ⋈ adjusted series on (ticker) in the QA layer, shuffle
  * the 100 TB side zero times after the one-time bucketed write.
  *
  * Bucketing rides the session catalog (`saveAsTable`) — parquet files
  * plus bucket metadata; `option("path", ...)` keeps the data external
  * at a lake location.
  */
object Bucketed {

  /** One-time bucketed materialization of a lake table. */
  def write(
      df: DataFrame, table: String, path: String,
      buckets: Int, bucketCols: Seq[String],
      sortCols: Seq[String] = Nil): Unit = {
    val base = df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .option("compression", "zstd")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val sorted =
      if (sortCols.nonEmpty) base.sortBy(sortCols.head, sortCols.tail: _*)
      else base
    sorted.format("parquet").saveAsTable(table)
  }

  /** Read back a bucketed table (bucket metadata comes from the
    * catalog — reading the bare path would lose it).
    */
  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
