package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.WordNgramHashes
import graft.ops.Partitioning.spread

/** Train/eval n-gram decontamination — the GPT-3 appendix-C / Pile-style
  * overlap check a training pipeline runs before every release: flag
  * each training document that shares at least `minShared` distinct
  * word n-grams with ANY document of a held-out eval set, so
  * benchmark answers cannot leak into the training corpus.
  *
  * Scale design: per-doc distinct gram hashes come from the codegen
  * [[graft.functions.WordNgramHashes]] pass (60-bit md5-derived hashes,
  * engine-portable); candidates are an equi-join on the gram hash —
  * never a cross join — so shuffle volume is bounded by posting sizes.
  * The eval side is a fixed benchmark set, orders of magnitude smaller
  * than the corpus: it is deduped to a bare gram-hash column (8
  * bytes/gram) and broadcast by default. At lake scale pass
  * `broadcastEval = false` and the join shuffles on the hash instead.
  */
object Decontaminate {

  def contaminated(train: DataFrame, eval: DataFrame,
      textCol: String, idCol: String, n: Int = 8, minShared: Int = 1,
      broadcastEval: Boolean = true): DataFrame = {
    val tg = spread(train).select(col(idCol).as("train_id"),
      explode(WordNgramHashes.word_ngram_hashes(col(textCol), n)).as("g"))
    val eg = eval
      .select(explode(
        WordNgramHashes.word_ngram_hashes(col(textCol), n)).as("g"))
      .distinct()
    val egSide = if (broadcastEval) broadcast(eg) else eg
    // tg rows are distinct per (train_id, gram) — WordNgramHashes
    // dedups within the doc — so the post-join count IS the number of
    // distinct shared grams.
    tg.join(egSide, "g")
      .groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
      .filter(col("n_shared_grams") >= minShared)
  }
}
