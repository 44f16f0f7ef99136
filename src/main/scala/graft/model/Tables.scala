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
        // Driver generations of events.ts have varied: TIMESTAMP(NANOS)
        // (which Spark's vectorized reader rejects — PARQUET_TYPE_ILLEGAL
        // — so it is read as epoch-nanos long under nanosAsLong and
        // converted; µs-precision data, ns→µs truncation lossless) vs
        // TIMESTAMP(MICROS, NTZ). Set the nanos escape hatch, then
        // normalize on whatever TYPE actually came back.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      }
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
    if (name == "events") normalizeEventTs(raw) else raw
  }

  /** Normalize the events `ts` column to a session-tz TIMESTAMP
    * regardless of the parquet generation that produced it: epoch-nanos
    * long (NANOS file under nanosAsLong) → truncate to µs; NTZ (MICROS
    * file) → reinterpret in the session tz (UTC everywhere in this
    * project, matching DuckDB's naive read); TIMESTAMP → as-is.
    */
  def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
}
