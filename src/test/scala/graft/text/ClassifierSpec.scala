package graft.text

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ClassifierSpec extends SparkTestBase {
  import spark.implicits._

  private def bucketOf(token: String, dim: Int): Int = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"qc:$token".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) % dim).toInt
  }

  test("hashedClassifierScore: hand-computed mean of per-token weights") {
    val w = TextOps.stubQualityWeights(64)
    val toks = Seq("alpha", "beta", "alpha") // repeated token counts twice
    val expected = toks.map(t => w(bucketOf(t, 64)))
      .foldLeft(0.0)(_ + _) / 3
    val got = Seq((1L, "  Alpha BETA alpha ")) // norm lowers + collapses
      .toDF("doc_id", "text")
      .select(TextOps.hashedClassifierScore($"text", w).as("s"))
      .as[Double].collect().head
    assert(got === expected)
  }

  test("the weight vector IS the model: swapping weights moves the score") {
    val df = Seq((1L, "some fixed text here")).toDF("doc_id", "text")
    def score(w: Array[Double]): Double =
      df.select(TextOps.hashedClassifierScore($"text", w).as("s"))
        .as[Double].collect().head
    val up = score(Array.fill(32)(1.0))
    val down = score(Array.fill(32)(-1.0))
    assert(up === 1.0 && down === -1.0,
      "constant weights must surface as the exact mean")
    assert(score(TextOps.stubQualityWeights(32)) !== up)
  }
}
