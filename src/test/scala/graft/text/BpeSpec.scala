package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.BpeEncode

/** Pins the BPE encoder's three-way semantics equivalence on the
  * bundled fixture table — heap (engine) ≡ rank-order sweep (oracle
  * semantics) ≡ naive min-rank rescan (the textbook GPT-2 loop) — plus
  * the concat invariant, normalization, and the codegen expression
  * path. The sweep≡canonical equivalence is what lets the DuckDB
  * oracle replay the encode as a `replace` chain; if a retrained merge
  * table ever violated it (a merge recreating an earlier pair), this
  * suite fails before any driver oracle does.
  */
class BpeSpec extends SparkTestBase {

  private val table = Bpe.fixture

  /** Textbook GPT-2 encode: rescan for the min-rank adjacent pair,
    * sweep-merge all its occurrences, repeat. O(n²) reference.
    */
  private def naiveEncode(s: String): Array[String] = {
    val rank = table.merges.zipWithIndex.toMap
    var toks: Array[String] =
      s.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    var done = false
    while (!done && toks.length > 1) {
      val present = toks.sliding(2).flatMap {
        case Array(a, b) => rank.get((a, b))
        case _           => None
      }.toSeq
      if (present.isEmpty) done = true
      else {
        val (l, r) = table.merges(present.min)
        val out = Array.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
            out += l + r; i += 2
          } else { out += toks(i); i += 1 }
        }
        toks = out.result()
      }
    }
    toks
  }

  private val alphabet = "abcdefghijklmnopqrstuvwxy ".toCharArray

  test("fixture table loads with 200 rank-ordered merges") {
    assert(table.merges.length === 200)
    // byte-level: some merges cross words (tokens containing spaces)
    assert(table.merges.exists { case (l, r) => (l + r).contains(" ") })
    assert(table.merges.forall { case (l, r) => l.nonEmpty && r.nonEmpty })
  }

  test("heap ≡ sweep ≡ naive min-rank on randomized corpus-alphabet text") {
    val rnd = new scala.util.Random(42)
    val cases = Seq("", "a", "aaaaaa", "the the the", "merge merge",
      "sort sort sort sort", "aa aa aa") ++
      (1 to 150).map { _ =>
        val len = rnd.nextInt(300)
        val sb = new StringBuilder
        (0 until len).foreach(_ => sb += alphabet(rnd.nextInt(alphabet.length)))
        sb.result().replaceAll("\\s+", " ").trim
      }
    cases.foreach { s =>
      val heap = table.tokenize(s)
      val sweep = table.tokenizeSweep(s)
      val naive = naiveEncode(s)
      assert(heap.toSeq === sweep.toSeq, s"heap vs sweep on '$s'")
      assert(heap.toSeq === naive.toSeq, s"heap vs naive on '$s'")
    }
  }

  test("concat invariant: tokens rejoin to the input; count = length") {
    val s = "the fast key order sort table scan merge part window"
    val toks = table.tokenize(s)
    assert(toks.mkString === s)
    assert(table.countTokens(s) === toks.length)
    // genuine compression on corpus-like text
    assert(toks.length < s.length / 2)
  }

  test("expression path: normalization + count/tokens agree with Table") {
    val df = spark.createDataFrame(Seq(
      (1L, "  The   FAST key "),
      (2L, "sort sort sort"),
      (3L, ""))).toDF("id", "text")
    val got = df.select(col("id"),
        BpeEncode.bpe_token_count(col("text")).as("n"),
        concat_ws("", BpeEncode.bpe_tokens(col("text"))).as("toks"))
      .orderBy(col("id")).collect()
    assert(got(0).getInt(1) === table.countTokens("the fast key"))
    assert(got(0).getString(2) ===
      table.tokenize("the fast key").mkString(""))
    assert(got(1).getInt(1) === table.countTokens("sort sort sort"))
    assert(got(2).getInt(1) === 0)
  }

  test("token ids: codepoint base vocab, IdBase+rank products, total") {
    val s = "the fast key order sort table scan merge part window"
    val toks = table.tokenize(s)
    val ids = table.tokenizeIds(s)
    assert(ids.length === toks.length)
    toks.zip(ids).foreach { case (tok, id) =>
      if (tok.codePointCount(0, tok.length) == 1) {
        assert(id === tok.codePointAt(0)) // base vocab: the codepoint
        assert(id < Bpe.IdBase)
      } else {
        // a product id decodes back to its producing merge's string
        val rank = id - Bpe.IdBase
        assert(rank >= 0 && rank < table.merges.length)
        val (l, r) = table.merges(rank)
        assert(l + r === tok)
        // and it is the LOWEST producing rank
        assert(table.merges.indexWhere(m => m._1 + m._2 == tok) === rank)
      }
    }
    // the compression is visible in the id stream too
    assert(ids.count(_ >= Bpe.IdBase) > 0)
  }

  test("ids decode back to the input on randomized corpus-alphabet text") {
    def decode(id: Int): String =
      if (id < Bpe.IdBase) new String(Character.toChars(id))
      else { val (l, r) = table.merges(id - Bpe.IdBase); l + r }
    val rnd = new scala.util.Random(7)
    val cases = Seq("", "a", "the the the", "aa aa aa") ++
      (1 to 100).map { _ =>
        val len = rnd.nextInt(300)
        val sb = new StringBuilder
        (0 until len).foreach(_ => sb += alphabet(rnd.nextInt(alphabet.length)))
        sb.result().replaceAll("\\s+", " ").trim
      }
    cases.foreach { s =>
      assert(table.tokenizeIds(s).map(decode).mkString === s, s"on '$s'")
    }
  }

  test("ids expression agrees with Table and joins back to tokens") {
    val df = spark.createDataFrame(Seq(
      (1L, "  The   FAST key "), (2L, ""))).toDF("id", "text")
    val got = df.select(col("id"),
        BpeEncode.bpe_token_ids(col("text")).as("ids"))
      .orderBy(col("id")).collect()
    assert(got(0).getSeq[Int](1) ===
      table.tokenizeIds("the fast key").toSeq)
    assert(got(1).getSeq[Int](1).isEmpty)
  }

  test("expression stays inside whole-stage codegen") {
    val df = spark.range(4).select(
      BpeEncode.bpe_token_count(concat(lit("merge sort "),
        col("id").cast("string"))).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), plan)
    assert(df.agg(sum(col("n"))).collect()(0).getLong(0) > 0)
  }
}
