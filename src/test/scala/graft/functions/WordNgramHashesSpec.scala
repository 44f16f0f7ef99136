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
      "alpha beta gamma alpha beta gamma",
      // control bytes are NOT \s: they survive the collapse and Spark's
      // space-only trim keeps them as tokens — the kernel must agree
      // (Java String.trim would strip them and shift every position)
      "\u0001 alpha beta gamma delta",
      "alpha beta gamma \u0002",
      // sub-n documents must yield empty, not a descending sequence
      "one", "two words").toDF("text")
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

  test("positional variant aligns with TextOps.tokens indices") {
    // the excision operators index TextOps.tokens arrays by the
    // positions this kernel emits — position i MUST be the gram of
    // tokens[i..i+n-1], including on texts with edge control bytes
    // where a Java-trim normalization would shift everything by one
    val docs = Seq(
      "\u0001 alpha beta gamma delta",
      "  alpha\tbeta  gamma ",
      "plain text with no noise at all").toDF("text")
    val n = 2
    val rows = docs.select(
        WordNgramHashes.word_ngram_hashes_pos(col("text"), n).as("ph"),
        graft.text.TextOps.tokens(col("text")).as("toks"))
      .as[(Seq[Long], Seq[String])].collect()
    rows.foreach { case (ph, toks) =>
      assert(ph.length == math.max(0, toks.length - n + 1))
      ph.zipWithIndex.foreach { case (h, i) =>
        val gram = toks.slice(i, i + n).mkString(" ")
        val expect = BigInt(java.security.MessageDigest.getInstance("MD5")
          .digest(gram.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15), 16).toLong
        assert(h == expect, s"pos $i gram '$gram'")
      }
    }
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
