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

/** Small-file compaction for the hive lake — the operational answer to
  * drip-fed drops leaving hundreds of tiny files per partition (each
  * one a scan task + a namenode entry at 100 TB). Rewrites only the
  * named partitions, one output file per partition (the reference's
  * one-file-per-bucket policy, ingest.py:289-314), via dynamic
  * partition overwrite so untouched partitions are never rewritten.
  */
object Compact {

  /** Compact the given `ticker=X/year=Y/month=Z` partition paths of
    * `lakeRoot` down to one file each. Returns rows rewritten.
    */
  def partitions(spark: SparkSession, lakeRoot: String,
      partitionPaths: Seq[String]): Long = {
    import org.apache.spark.sql.functions.col
    val slice = spark.read.option("basePath", lakeRoot)
      .parquet(partitionPaths: _*)
    val n = slice.count()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      slice
        .repartition(col("ticker"), col("year"), col("month"))
        .sortWithinPartitions(col("datetime"))
        .write.mode(SaveMode.Overwrite)
        .option("compression", "zstd")
        .partitionBy("ticker", "year", "month")
        .parquet(lakeRoot)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    n
  }

  /** Partitions holding more than `maxFiles` parquet files — the
    * compaction work list.
    */
  def fragmented(spark: SparkSession, lakeRoot: String,
      maxFiles: Int = 4): Seq[String] = {
    import org.apache.spark.sql.functions._
    // project the file name first: non-deterministic expressions are
    // rejected inside aggregate arguments
    spark.read.parquet(lakeRoot)
      .withColumn("__file", input_file_name())
      .groupBy(col("ticker"), col("year"), col("month"))
      .agg(countDistinct(col("__file")).as("files"))
      .filter(col("files") > maxFiles)
      .collect()
      .map(r => s"$lakeRoot/ticker=${r.get(0)}/year=${r.get(1)}/month=${r.get(2)}")
      .toSeq
  }
}
