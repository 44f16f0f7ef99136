package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dedup.Dedup

class WordNgramHashesSpec extends SparkTestBase {
  import spark.implicits._

  test("bit-compatible with the interpreted HOF chain, as a SET, n=1..3") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "  Mixed   CASE   and \t whitespace\nnoise  ",
      "the the the the",
      "alpha beta gamma alpha beta gamma").toDF("text")
    (1 to 3).foreach { n =>
      val rows = docs.select(
        array_sort(WordNgramHashes.word_ngram_hashes(col("text"), n)).as("fast"),
        array_sort(Dedup.tokenHashes(Dedup.wordNgrams(col("text"), n))).as("slow"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"n=$n")
      }
    }
  }

  test("fewer tokens than n yields empty; null yields null") {
    val out = Seq(Some("only two"), Some(""), None).toDF("text")
      .select(WordNgramHashes.word_ngram_hashes(col("text"), 3).as("gh"))
      .collect()
    assert(out(0).getSeq[Long](0).isEmpty)
    assert(out(1).getSeq[Long](0).isEmpty)
    assert(out(2).isNullAt(0))
  }

  test("participates in whole-stage codegen (no fallback in plan)") {
    // a real scan (literals get constant-folded into LocalTableScan)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(WordNgramHashes.word_ngram_hashes(col("text"), 2).as("gh"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [wordngramhashes"), plan)
    assert(df.count() === 500)
  }
}
