package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Partitioning.spread

/** Dictionary-based document quality — the Gopher/C4-style "common
  * word" filter: derive the corpus's top-`n` vocabulary by occurrence
  * count, then score every document by the fraction of its tokens that
  * fall inside that vocabulary. Documents dominated by rare garbage
  * (binary spew, boilerplate markup, OCR noise) score low and are
  * dropped before training.
  *
  * Scale shape (the point at 100 TB): the corpus is scanned exactly
  * twice and nothing corpus-sized is ever held. Scan 1 builds the
  * vocabulary — tokenize, partial-aggregate map-side, one term-keyed
  * exchange whose width is the DISTINCT vocabulary (Zipf-bounded, not
  * corpus-bounded), then `TakeOrderedAndProject` for the top-n (per-
  * partition heaps, no global sort). Scan 2 re-tokenizes and scores:
  * the vocabulary is a broadcast left-join flag and the per-document
  * counts partial-aggregate before the doc-keyed exchange. The
  * exploded token stream is deliberately NOT persisted between the two
  * consumers — it is corpus-sized, and recomputing it costs a scan +
  * codegen with no shuffle underneath (the same call, with the same
  * reasoning, as [[Boilerplate]]'s segment stream; the opposite of the
  * vocab table itself, which IS reused and is tiny).
  *
  * Determinism (the QueryDef contract): the top-n cut is totally
  * ordered (count desc, term asc) so the vocabulary SET is engine-
  * reproducible, and the ratio is one division of two exact longs —
  * bit-identical in any IEEE engine.
  *
  * Reference basis: none — the reference has no quality-filter
  * surface; this is north-star training-data-pipeline capability
  * (SURVEY §2 extension family, like the dedup/decontamination
  * operators).
  */
object Vocab {

  /** The corpus's `n` most frequent whitespace tokens by total
    * occurrence count, tie-broken by term text: (term, n_occ), a
    * vocabulary-sized result safe to broadcast.
    */
  def topVocab(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"need n >= 1, got $n")
    spread(docs)
      .select(explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n_occ"))
      .orderBy(col("n_occ").desc, col("term"))
      .limit(n)
  }

  /** Per-document dictionary quality: the fraction of each document's
    * tokens found in the corpus top-`topN` vocabulary, plus a keep
    * verdict at `keepAt` (ratio >= threshold). Output:
    * (idCol, n_tok, n_common, common_ratio, keep), one row per input
    * document — `tokens` of the canonical text is never empty (the
    * empty string tokenizes to one empty token), so no document is
    * dropped by the explode.
    */
  def dictionaryQuality(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      topN: Int,
      keepAt: Double): DataFrame = {
    val vocab = topVocab(docs, textCol, topN)
      .select(col("term"), lit(true).as("in_vocab"))
    spread(docs)
      .select(col(idCol), explode(TextOps.tokens(col(textCol))).as("term"))
      .join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("in_vocab"), 1L).otherwise(0L)).as("n_common"))
      .select(col(idCol),
        col("n_tok").cast("int").as("n_tok"),
        col("n_common").cast("int").as("n_common"),
        (col("n_common").cast("double") / col("n_tok").cast("double"))
          .as("common_ratio"))
      .withColumn("keep", col("common_ratio") >= lit(keepAt))
  }
}
