package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins [[Vocab]]'s dictionary-quality semantics on a hand corpus:
  * the totally-ordered top-n cut (count desc, term asc — the property
  * the engine-reproducible vocabulary SET depends on), exact ratio
  * arithmetic, the no-document-dropped explode guarantee, and the
  * keep threshold boundary.
  */
class VocabSpec extends SparkTestBase {
  import spark.implicits._

  // Token totals: common 5, shared 3, rare_a 3, rare_b 1, junk 1.
  // At n = 3 the cut falls on the (shared, rare_a) count tie — term
  // order must break it (both are in; junk/rare_b are out).
  private lazy val docs = Seq(
    (1L, "common common shared rare_a"),
    (2L, "common common shared rare_a"),
    (3L, "common shared rare_a junk"),
    (4L, "rare_b"),
    (5L, "")).toDF("doc_id", "text")

  test("topVocab cuts on (count desc, term asc)") {
    val v = Vocab.topVocab(docs, "text", n = 3)
      .as[(String, Long)].collect().toSeq
    assert(v == Seq(("common", 5L), ("rare_a", 3L), ("shared", 3L)))
  }

  test("dictionaryQuality: exact ratios, empty docs survive") {
    val q = Vocab.dictionaryQuality(docs, "doc_id", "text",
        topN = 3, keepAt = 0.75)
      .select($"doc_id", $"n_tok", $"n_common", $"common_ratio", $"keep")
      .as[(Long, Int, Int, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(q.size == 5, "every document must produce exactly one row")
    assert(q(1L) == ((1L, 4, 4, 1.0, true)))
    assert(q(3L) == ((3L, 4, 3, 0.75, true)), "threshold is inclusive")
    // rare_b is outside the vocabulary: ratio 0, dropped
    assert(q(4L) == ((4L, 1, 0, 0.0, false)))
    // empty text tokenizes to one empty token, which is NOT in the
    // top-3 vocabulary here — the doc still gets a (low) score row
    assert(q(5L) == ((5L, 1, 0, 0.0, false)))
  }
}
