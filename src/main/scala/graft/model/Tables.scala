package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated oracle tables (TESTDATA.md).
  * One parquet file per table under `/root/testdata/sf*`/.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = {
      if (name == "events") {
        // events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
        // reader rejects (PARQUET_TYPE_ILLEGAL); read it as epoch-nanos
        // long and convert. The underlying data is µs-precision, so the
        // ns→µs truncation is lossless and matches DuckDB's own ns→µs view.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      }
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
    if (name == "events")
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
}
