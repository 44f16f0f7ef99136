package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BucketedSpec extends SparkTestBase {
  import spark.implicits._

  test("co-bucketed join plans with zero Exchange on either side") {
    val dir = Files.createTempDirectory("bucketed").toString
    val bars = (1 to 1000).map(i => (s"id${i % 37}", i, i * 1.5))
      .toDF("id", "seq", "close")
    val factors = (0 until 37).map(i => (s"id$i", 1.0 + i * 0.01))
      .toDF("id", "factor")
    Bucketed.write(bars, "b_bars", s"$dir/bars", buckets = 8,
      bucketCols = Seq("id"), sortCols = Seq("id"))
    Bucketed.write(factors, "b_factors", s"$dir/factors", buckets = 8,
      bucketCols = Seq("id"), sortCols = Seq("id"))

    val joined = Bucketed.read(spark, "b_bars")
      .join(Bucketed.read(spark, "b_factors"), "id")
      .select(col("id"), col("seq"), (col("close") * col("factor")).as("adj"))
    // disable broadcast so the small side can't hide the exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(joined.count() === 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_bars")
      spark.sql("DROP TABLE IF EXISTS b_factors")
    }
  }

  test("bucket pruning: an equality filter touches one bucket's files") {
    val dir = Files.createTempDirectory("bucketed2").toString
    val df = (1 to 512).map(i => (s"T${i % 64}", i)).toDF("ticker", "v")
    Bucketed.write(df, "b_pruned", s"$dir/pruned", buckets = 16,
      bucketCols = Seq("ticker"))
    // the planner turns the bucketed scan off when no operator needs the
    // distribution; force it so the filter can prune to one bucket
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val q = Bucketed.read(spark, "b_pruned").filter(col("ticker") === "T7")
      // SelectedBucketsCount appears in the scan when pruning kicks in
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 16"), plan)
      assert(q.count() === 8)
    } finally {
      spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS b_pruned")
    }
  }
}
