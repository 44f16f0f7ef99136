package graft.ingest

import java.sql.Date

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Split-window backfill — the reference's incremental re-run scoping
  * (scripts/emit_split_backfill_cmds.py:21-40: re-process ±14 days
  * around every split's execution date), expressed as dynamic partition
  * overwrite instead of emitted shell commands: only the (ticker, year,
  * month) partitions whose window overlaps a split window are
  * recomputed and atomically replaced.
  */
object Backfill {

  /** The (ticker, year, month) partitions affected by splits ± window. */
  def affectedPartitions(splits: DataFrame, windowDays: Int = 14): DataFrame =
    splits
      .select(col("ticker"),
        explode(sequence(
          date_add(to_date(col("execution_date")), -windowDays),
          date_add(to_date(col("execution_date")), windowDays))).as("d"))
      .select(col("ticker"), year(col("d")).as("year"), month(col("d")).as("month"))
      .distinct()

  /** Overwrite only the affected partitions of `lakeRoot` with the
    * matching slice of `recomputed` (which must carry ticker/year/month
    * partition columns). Uses dynamic partition overwrite — untouched
    * partitions stay as-is, re-runs are idempotent.
    */
  def overwriteAffected(
      spark: SparkSession,
      recomputed: DataFrame,
      splits: DataFrame,
      lakeRoot: String,
      windowDays: Int = 14): Long = {
    val affected = broadcast(affectedPartitions(splits, windowDays))
    val slice = recomputed.join(affected, Seq("ticker", "year", "month"), "left_semi")
    val n = slice.count()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try slice
      .repartition(col("ticker"), col("year"), col("month"))
      .sortWithinPartitions(col("datetime"))
      .write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .partitionBy("ticker", "year", "month")
      .parquet(lakeRoot)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    n
  }
}
