package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Partitioning.spread

/** Sub-document (segment-level) boilerplate removal — the
  * FineWeb/RefinedWeb-style curation pass that exact-dedup at DOCUMENT
  * granularity cannot express: a navigation bar, cookie banner, or
  * license footer repeats across thousands of otherwise-distinct pages,
  * so the repeated SEGMENT must be dropped while the documents around
  * it survive. Segments whose corpus-wide document frequency exceeds
  * `maxDf` are removed and each document's remaining text is
  * reassembled in original order.
  *
  * Segmentation is the engine's chunking convention
  * ([[TextOps.chunks]] with zero overlap — fixed `window`-token
  * spans), so the operator composes with the qt5 chunk family and
  * stays closed-form for the DuckDB oracle (the synthetic corpus has
  * no newlines; on real data the same pipeline runs over
  * newline-split lines instead).
  *
  * Scale shape: one explode (linear in corpus tokens), one
  * hash-aggregate on the 60-bit segment hash for document frequency
  * (map-side partial combine; the df table is vocabulary-sized, not
  * corpus-sized), one equi-join back on the hash (AQE broadcasts the
  * df table when it fits, shuffle-joins otherwise), and one per-doc
  * aggregate whose `collect_list` is bounded by the document's own
  * segment count — never corpus-wide state on any node.
  */
object Boilerplate {

  /** Per-doc output: (doc_id, n_seg, n_dropped, clean_text). Documents
    * made entirely of boilerplate survive with `clean_text = ""` —
    * dropping a row silently would corrupt downstream joins keyed on
    * doc_id.
    */
  def removeBoilerplate(docs: DataFrame, textCol: String, idCol: String,
      window: Int = 8, maxDf: Int = 2): DataFrame = {
    require(window >= 1 && maxDf >= 1, "need window >= 1 and maxDf >= 1")
    // segs is consumed twice (the df aggregate and the join probe) and
    // deliberately NOT persisted: the recomputed subtree is scan +
    // codegen map/explode only — no shuffle below it — so a second
    // scan is cheaper at scale than caching a corpus-sized exploded
    // intermediate (the opposite call from qd7's prefix table, whose
    // recomputed subtree contained an exchange + two windows).
    val segs = spread(docs).select(col(idCol).as("doc_id"),
        posexplode(TextOps.chunks(col(textCol), window, 0)))
      .select(col("doc_id"), col("pos"), col("col").as("seg"))
      .withColumn("h", TextOps.hash60(col("seg")))
    val docFreq = segs.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
    segs.join(docFreq, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_seg"),
        sum(when(col("df") > maxDf, 1).otherwise(0)).cast("int")
          .as("n_dropped"),
        // collect_list drops the nulls from the unmet `when`, so only
        // kept segments ride the struct sort; struct ordering is by
        // leading field = pos, preserving original segment order
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(col("df") <= maxDf, struct(col("pos"), col("seg"))))),
          _.getField("seg"))).as("clean_text"))
  }
}
