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
      // (integral `div` — exact on longs unconditionally, where double
      // floor-division is exact only below 2^53 cumulative tokens)
      .withColumn("start", col("cum") - col("n_tok"))
      .withColumn("bin", expr(s"start div ${binTokens}L"))
      .withColumn("bin_offset", col("start") - col("bin") * binTokens)
      .select(col(idCol), col("n_tok"), col("shard"), col("bin"),
        col("bin_offset"))
  }

  /** Physically PACKED training sequences — the artifact a data loader
    * memory-maps: each shard's documents concatenated in the same
    * deterministic (hash, id) stream order as [[packBins]] and CHOPPED
    * into fixed `binTokens`-token sequences (GPT-2-style
    * concat-then-chop: documents straddle sequence boundaries, so
    * every sequence except a shard's last is exactly full).
    * [[packBins]] is the ASSIGNMENT form of this layout (a doc labeled
    * by the bin its start offset falls in); this is the
    * materialization. One row per (shard, bin): contributing-doc
    * count, token count (= binTokens except each shard's tail), and
    * the packed ids. Zero-token documents contribute nothing and are
    * dropped.
    *
    * `ids` is any integer-array column (e.g.
    * [[graft.functions.BpeEncode.bpe_token_ids]] of the text).
    *
    * Scale shape: the per-shard cumulative window is packBins' own
    * (shards = output files is the caller-chosen parallelism); each
    * document then explodes to ONLY the bins it overlaps (expansion
    * factor 1 + n_tok/binTokens) carrying a `slice` of its ids, so
    * corpus tokens cross the (shard, bin) exchange exactly once, as
    * int-array pieces never longer than binTokens; the assembly
    * aggregate holds <= binTokens ints per group, and bins are
    * uniformly full by construction — no skew. collect_list order is
    * made deterministic by sorting the (offset, piece) structs before
    * flattening (offsets are distinct within a bin).
    */
  def packSequences(docs: DataFrame, idCol: String, ids: Column,
      binTokens: Int, shards: Int = 32): DataFrame = {
    require(binTokens > 0 && shards > 0, "need positive binTokens/shards")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val L = binTokens.toLong
    docs
      .select(col(idCol), ids.as("__ids"),
        TextOps.hash60(col(idCol).cast("string")).as("h"))
      .withColumn("n_tok", size(col("__ids")).cast("long"))
      .withColumn("shard", (col("h") % shards).cast("int"))
      .withColumn("start", sum(col("n_tok")).over(w) - col("n_tok"))
      // zero-token docs drop HERE, not before the window: a filter on
      // n_tok below the window would be pushed through the projection
      // and re-derive the ids expression per row (the encode ran TWICE
      // in the optimized plan — measured); above the window it cannot
      // push (n_tok is not a partition column), and the empty docs
      // contribute +0 to every running sum, so offsets are unchanged
      .filter(col("n_tok") > 0)
      // bins this doc overlaps: start div L .. (end-1) div L (integral
      // `div`: exact on longs unconditionally, unlike double floor)
      .withColumn("bin", explode(sequence(
        expr(s"start div ${L}L"),
        expr(s"(start + n_tok - 1) div ${L}L"))))
      .withColumn("lo", greatest(col("bin") * L, col("start")))
      .withColumn("hi",
        least((col("bin") + 1) * L, col("start") + col("n_tok")))
      .withColumn("piece", slice(col("__ids"),
        (col("lo") - col("start") + 1).cast("int"),
        (col("hi") - col("lo")).cast("int")))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).cast("int").as("n_docs"),
        sum(col("hi") - col("lo")).cast("int").as("n_tok"),
        flatten(transform(
          array_sort(collect_list(struct(col("lo"), col("piece")))),
          x => x.getField("piece"))).as("ids"))
  }
}
