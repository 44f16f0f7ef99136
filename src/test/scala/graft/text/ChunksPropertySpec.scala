package graft.text

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Randomized invariants for the token-window chunker: full coverage
  * (every token occurs at its position in some chunk), stride layout
  * (chunk i starts at token i·stride), and tail semantics (last chunk
  * short but never empty; short docs yield exactly one chunk).
  */
class ChunksPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new Random(77L)

  test("chunks cover all tokens at the declared stride") {
    (1 to 20).foreach { _ =>
      val n = 1 + rnd.nextInt(120)
      val toks = (0 until n).map(i => s"t$i")
      val chunkSize = 2 + rnd.nextInt(30)
      val overlap = rnd.nextInt(chunkSize - 1)
      val stride = chunkSize - overlap
      val out = Seq(toks.mkString(" ")).toDF("text")
        .select(TextOps.chunks(col("text"), chunkSize, overlap).as("c"))
        .head().getSeq[String](0)
      // expected chunk count
      val expected =
        if (n <= chunkSize) 1
        else (n - chunkSize + stride - 1) / stride + 1
      assert(out.length === expected, s"n=$n cs=$chunkSize ov=$overlap")
      // chunk i = tokens[i*stride, i*stride+chunkSize)
      out.zipWithIndex.foreach { case (chunk, i) =>
        val want = toks.slice(i * stride, i * stride + chunkSize).mkString(" ")
        assert(chunk === want, s"chunk $i of n=$n cs=$chunkSize ov=$overlap")
      }
      // coverage: the last chunk reaches the final token
      assert(out.last.endsWith(s"t${n - 1}"))
    }
  }
}
