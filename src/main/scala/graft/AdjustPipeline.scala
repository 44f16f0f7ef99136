package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.adjust.Adjuster
import graft.ingest.BarsIngest
import graft.lake.LakeReader
import graft.query.Series

/** End-to-end adjusted-lake pipeline main — the `build_adjusted_lake.sh`
  * equivalent (reference: scripts/build_adjusted_lake.sh →
  * factor_builder.main): raw bar lake + refdata parquet dims → adjusted
  * lake + audit summary.
  *
  * Usage: runMain graft.AdjustPipeline <barsLakeRoot> <refdataDir> <outRoot>
  *   refdataDir must hold security_master.parquet, splits.parquet and
  *   dividends.parquet — all three files must exist (zero-row contents
  *   are fine); a missing file fails fast with PATH_NOT_FOUND.
  * Prints row counts and the per-id audit table.
  */
object AdjustPipeline {
  def main(args: Array[String]): Unit = {
    val Array(lakeRoot, refdataDir, outRoot) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-adjust")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bars = LakeReader.read(spark, lakeRoot)
    val sm = spark.read.parquet(s"$refdataDir/security_master.parquet")
    val splits = spark.read.parquet(s"$refdataDir/splits.parquet")
    val dividends = spark.read.parquet(s"$refdataDir/dividends.parquet")

    val adjusted = Adjuster.buildAdjusted(bars, sm, splits, dividends,
      Adjuster.MaterializeClose)
    adjusted
      .withColumn("year", year(col("datetime")))
      .withColumn("month", month(col("datetime")))
      .repartition(col("ticker"), col("year"), col("month"))
      .sortWithinPartitions(col("datetime"))
      .write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .partitionBy("ticker", "year", "month")
      .parquet(s"$outRoot/adjusted")

    val written = spark.read.parquet(s"$outRoot/adjusted")
    println(s"adjusted rows: ${written.count()}")
    Adjuster.auditSummary(written, splits, dividends)
      .orderBy(col("ticker"))
      .show(50, truncate = false)

    // QA invariants from the reference notebook: split piecewise jumps +
    // SA/TR return correlation
    val series = Series.loadSeries(
      LakeReader.read(spark, lakeRoot),
      written.withColumnRenamed("close_split", "close_sa"), "day")
    Series.splitPiecewiseJumps(series).show(20, truncate = false)
    Series.returnCorrelation(series).show(20, truncate = false)
    spark.stop()
  }
}
