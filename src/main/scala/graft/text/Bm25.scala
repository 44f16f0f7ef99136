package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.ops.Partitioning.spread

/** BM25 ranked retrieval over a document corpus — the inverted-index
  * scoring pass a training-data pipeline uses to pull topical slices
  * out of a crawl (and the standard lexical half of hybrid
  * lexical+embedding search next to [[graft.sim.Similarity]]).
  *
  * Scale shape (the point at 100 TB): the corpus is tokenized and
  * IMMEDIATELY filtered to the query's terms while still map-side, so
  * the single shuffle — the (doc, term) term-frequency aggregate —
  * carries only matching postings, not the corpus. Document frequency
  * is a query-terms-sized table (broadcast back), corpus stats (N,
  * total token count) are one row (broadcast cross join, the
  * established scalar-attach pattern), and the final top-k is
  * `TakeOrderedAndProject` — per-partition heaps, never a global sort.
  * Nothing in the plan is sized by the corpus except the initial scan.
  *
  * Determinism (the QueryDef contract): scoring uses the log-free
  * rational idf `(N - df + 0.5) / (df + 0.5) + 1` — the same
  * +,-,*,/-only doctrine as [[TextOps]], so a DuckDB oracle reproduces
  * every double bit-for-bit (swap in `log(...)` for classic
  * Robertson idf in production; it is monotone in df either way). The
  * per-document score is NOT an order-dependent double `sum`: each
  * term's score lands in a fixed column via conditional aggregation
  * and the total is a fixed left-to-right `+` chain over the query's
  * term order.
  *
  * Reference basis: none — the reference has no retrieval surface;
  * this is north-star training-data-pipeline capability (SURVEY §2
  * extension family, like the dedup/ANN operators).
  */
object Bm25 {

  /** Top-`k` documents by BM25 against `queryTerms`, scored with
    * parameters `k1` (term-frequency saturation) and `b` (length
    * normalization). Documents matching no query term score 0 and are
    * omitted — retrieval semantics, mirrored by the oracle. Output:
    * (idCol, bm25), ordered bm25 desc then idCol asc (total order).
    */
  def topK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct == queryTerms, "queryTerms must be distinct")
    require(k >= 1, "k must be >= 1")

    // Map-side: tokenize, keep only query-term occurrences, carry the
    // doc length so no second join against the corpus is ever needed.
    // Persisted: it feeds BOTH the scoring path and the df aggregate —
    // unpersisted, Catalyst computes the corpus scan + explode twice
    // (the qd7 double-subtree defect). Query-terms-sized (≤ |terms|
    // rows per matching doc), so MEMORY_AND_DISK is cheap; cache
    // lifecycle contract as on [[graft.dedup.Dedup]]: freed by the
    // session's cacheManager, not by this lazy operator.
    val postings = spread(docs)
      .select(col(idCol),
        TextOps.tokenCountWs(col(textCol)).as("dl"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // df per term: postings is already distinct on (doc, term), so a
    // plain count per term IS the document frequency. <= |queryTerms|
    // rows — broadcast.
    val dfreq = postings.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))

    // Corpus scalars as a one-row broadcast (no driver collect).
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      sum(TextOps.tokenCountWs(col(textCol))).cast("double").as("sum_dl"))

    // Expression shape mirrored token-for-token by the qt17 DuckDB
    // oracle (DataOpsQueries) — keep the parenthesization in sync.
    val scored = postings
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("s",
        ((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
          (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) +
              lit(b) * col("dl").cast("double") / (col("sum_dl") / col("n_docs")))))

    // Fixed-order pivot: one column per query term (each (doc, term)
    // has exactly one row, so max() is selection, not arithmetic),
    // summed left-to-right in queryTerms order.
    val termCols = queryTerms.zipWithIndex.map { case (t, i) =>
      max(when(col("term") === t, col("s"))).as(s"s_$i")
    }
    val total = queryTerms.indices
      .map(i => coalesce(col(s"s_$i"), lit(0.0)))
      .reduceLeft(_ + _)

    scored.groupBy(col(idCol))
      .agg(termCols.head, termCols.tail: _*)
      .withColumn("bm25", total)
      .select(col(idCol), col("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
  }

  /** Per-document TF-IDF keyword extraction: the top-`k` terms of each
    * document by normalized term frequency × rational idf — the
    * document-TAGGING pass (topic labels, index keys) next to [[topK]]'s
    * query-time retrieval. Unlike topK there is no query to filter by,
    * so document frequency is computed over the WHOLE vocabulary: the
    * df table is vocabulary-sized (not corpus-sized — map-side combine
    * collapses to distinct terms), joined back by term with the
    * broadcast decision left to AQE, and the top-k is a per-document
    * row_number window — partitioned by doc id, so state per task is
    * one document's vocabulary, never the corpus's.
    *
    * Determinism: score = (tf/dl) · idf is a single rational
    * expression on exactly-derived integers — no sum across terms at
    * all — and the window orders by (score desc, term), so ties break
    * identically in any engine. Same cache lifecycle contract as topK
    * for the persisted (doc, term, tf) table.
    *
    * Output: (idCol, rank, term, score), ordered idCol asc, rank asc.
    */
  def tfidfKeywords(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val tf = spread(docs)
      .select(col(idCol),
        TextOps.tokenCountWs(col(textCol)).as("dl"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    val stats = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val scored = tf
      .join(dfreq, Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("score",
        (col("tf").cast("double") / col("dl").cast("double")) *
          ((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("score"))
      .orderBy(col(idCol), col("rank"))
  }
}
