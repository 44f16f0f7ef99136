package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.storage.StorageLevel

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

  /** Bloom pre-filtered lake decontamination — the third point on the
    * eval-size ladder. Broadcast JOIN ([[contaminated]] default) needs
    * the full eval gram TABLE on every executor; the shuffle arm
    * (`broadcastEval = false`) pays a full exchange of every corpus
    * gram. When the eval set outgrows the broadcast-join budget but its
    * Bloom SKETCH (bits, not rows — ~1.2 MB per million grams at 1%
    * fpp) still fits in a task, probe-side grams are pre-filtered by
    * Spark's native codegen [[BloomFilterMightContain]] BEFORE the
    * exchange, so the shuffle carries only true matches plus the fpp
    * margin instead of the whole corpus. The exact equi-join then
    * verifies survivors: false positives cannot reach the result and a
    * Bloom filter has no false negatives, so the output is
    * bit-identical to [[contaminated]] — which is why the driver oracle
    * (qt15) is the same SQL as qt9/qt13.
    *
    * EAGER construction — unlike every other operator in this library,
    * which returns a fully lazy plan, building this DataFrame RUNS two
    * Spark jobs up front (the eval-gram `count()` sizing the sketch and
    * the `bloomFilter` aggregation building it): the sketch must exist
    * as a plan literal before the probe-side filter can be planned.
    * Compose it accordingly (build once, reuse the returned plan), and
    * mind the cache lifecycle: the deduped eval gram table is persisted
    * (it is consumed by the sketch build AND the verify join); the
    * caller releases it after consuming the returned plan
    * (`spark.catalog.clearCache()`, as Bench does per query) — skipping
    * that leaks the cached gram table for the session's lifetime.
    *
    * `maxBits` caps the sketch (default 2^29 bits = 64 MiB, the same
    * order as Spark's own runtime-filter cap): past the gram count
    * where `fpp` would need more bits, the filter keeps its size and
    * the EFFECTIVE fpp degrades instead — more rows survive to the
    * verify join, never a wrong result. Without the cap a ~10^9-gram
    * eval side at 1% fpp would materialize a ~1.2 GB plan literal.
    */
  def contaminatedBloom(train: DataFrame, eval: DataFrame,
      textCol: String, idCol: String, n: Int = 8, minShared: Int = 1,
      fpp: Double = 0.01, maxBits: Long = 1L << 29): DataFrame = {
    val tg = spread(train).select(col(idCol).as("train_id"),
      explode(WordNgramHashes.word_ngram_hashes(col(textCol), n)).as("g"))
    val eg = eval
      .select(explode(
        WordNgramHashes.word_ngram_hashes(col(textCol), n)).as("g"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nGrams = math.max(eg.count(), 1L)
    val optimalBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(nGrams, fpp)
    val sketch = eg.stat.bloomFilter("g", nGrams,
      math.min(optimalBits, maxBits))
    val bytes = {
      val baos = new java.io.ByteArrayOutputStream()
      sketch.writeTo(baos)
      baos.toByteArray
    }
    val mightContain = ColumnBridge.column(BloomFilterMightContain(
      Literal(bytes), ColumnBridge.expression(col("g"))))
    tg.filter(mightContain)
      .join(eg, "g")
      .groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
      .filter(col("n_shared_grams") >= minShared)
  }
}
