package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed
  * (one ticker = half the volume, one user = half the events). AQE's
  * skew-join split handles sort-merge cases at runtime; explicit
  * salting remains the tool when the skewed side must hash-join against
  * a replicable right side.
  */
object Skew {

  private val SaltCol = "__salt"

  /** Salted equi-join: the left (large, skewed) side gets a
    * DETERMINISTIC salt in [0, buckets) — xxhash64 of the whole row
    * plus a fixed seed string — so each hot key spreads over `buckets`
    * reducers. A row hash (not rand(seed), which is partition-order-
    * dependent under retries/repartitioning) keeps the salt stable
    * across task retries and re-plans, matching the repo-wide salted-
    * hash determinism contract ([[graft.text.TextOps.stratifiedKeep]],
    * [[graft.text.Mixture.mixtureKeep]]). Within a hot key the spread
    * comes from the non-key columns; fully-identical duplicate rows
    * co-locate in one bucket, which only matters if the skew IS exact
    * duplicates — dedup first in that case. Semantics identical to
    * `left.join(right, keys, joinType)` for row-preserving join types
    * (inner / left_outer).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      buckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"salting preserves semantics only for inner/left joins, got $joinType")
    val salted = left.withColumn(SaltCol,
      pmod(xxhash64(lit("skew-salt") +: left.columns.map(col).toSeq: _*),
        lit(buckets.toLong)).cast("int"))
    val replicated = right.withColumn(SaltCol,
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ SaltCol, joinType).drop(SaltCol)
  }

  /** Hot-bucket guard for every banded candidate generator (MinHash /
    * SimHash / n-gram postings, hyperplane-LSH buckets): drop candidate
    * buckets holding more than `maxBucket` members from candidate
    * generation entirely (`maxBucket <= 0` = unlimited). A bucket with
    * B members emits B·(B-1)/2 candidate pairs, so ONE hot template
    * clique (boilerplate pages, near-empty docs, a degenerate embedding
    * cluster) turns the bucket equi-join quadratic at corpus scale —
    * the most likely real-world failure of the LSH family at 100 TB.
    * Deliberately an aggregate + left_anti equi-join (map-side-combining
    * hash agg, then an anti-join against the small oversized-key list),
    * NEVER a per-bucket row_number window: ranking inside the hot
    * bucket would itself pin the skewed partition on one task. Recall
    * trade, eyes open: a pair whose EVERY shared bucket is oversized is
    * lost — at realistic caps those are template cliques that
    * exact/token-set dedup already collapses; audit the trade with
    * [[graft.dedup.Dedup.minhashBandStats]] before choosing the cap.
    */
  def capBuckets(banded: DataFrame, keyCol: String,
      maxBucket: Int): DataFrame =
    if (maxBucket <= 0) banded
    else {
      val oversized = banded.groupBy(col(keyCol))
        .agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") > maxBucket)
        .select(col(keyCol))
      banded.join(oversized, Seq(keyCol), "left_anti")
    }

  /** Key histogram — pick salting candidates: keys holding more than
    * `threshold` of all rows.
    */
  def hotKeys(df: DataFrame, keys: Seq[String], threshold: Double = 0.05): DataFrame = {
    val total = df.count()
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("fraction", col("n") / total.toDouble)
      .filter(col("fraction") >= threshold)
      .orderBy(col("n").desc)
  }
}
