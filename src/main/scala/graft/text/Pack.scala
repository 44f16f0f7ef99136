package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pre-training: lay documents out in a
  * deterministic, content-independent order and assign each to a
  * fixed-token-budget bin by cumulative token count — the relational
  * form of concat-then-chop packing (a document belongs to the bin its
  * START offset falls in; a straddling document overflows its bin by
  * at most its own length, exactly like concatenated-context packing).
  *
  * Scale design: packing is SHARD-LOCAL — documents hash into `shards`
  * independent streams, each packed by one window partition, so there
  * is no global sort and the parallelism is chosen by the caller (one
  * shard per training data file is the usual shape). Bin ids are
  * (shard, bin) pairs; the order inside a shard is (hash, id) — fully
  * deterministic across runs and engines.
  */
object Pack {

  /** One row per document: its shard, bin within the shard, and start
    * offset inside the bin. `nTok` is any token-count column
    * (e.g. [[TextOps.tokenCountWs]] of the text).
    */
  def packBins(docs: DataFrame, idCol: String, nTok: Column,
      binTokens: Int, shards: Int = 32): DataFrame = {
    require(binTokens > 0 && shards > 0, "need positive binTokens/shards")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol), nTok.cast("long").as("n_tok"),
        TextOps.hash60(col(idCol).cast("string")).as("h"))
      .withColumn("shard", (col("h") % shards).cast("int"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      // start offset of the doc in its shard stream; bin = offset/budget
      .withColumn("start", col("cum") - col("n_tok"))
      .withColumn("bin",
        floor(col("start") / lit(binTokens.toDouble)).cast("long"))
      .withColumn("bin_offset", col("start") - col("bin") * binTokens)
      .select(col(idCol), col("n_tok"), col("shard"), col("bin"),
        col("bin_offset"))
  }
}
