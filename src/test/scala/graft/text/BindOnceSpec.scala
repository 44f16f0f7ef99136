package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[TextOps.bindOnce]] is a pure evaluation-count optimization — the
  * value must be EXACTLY what inlining the expression would produce,
  * for every consumer shape (scalar, array, nested lambda, null).
  */
class BindOnceSpec extends SparkTestBase {

  test("bindOnce(a)(f) ≡ f(a) for scalar, array, and nested-lambda bodies") {
    import spark.implicits._
    val df = Seq("a b c d", "x", "", "q r").toDF("text")

    def both(inline: org.apache.spark.sql.Column,
             bound: org.apache.spark.sql.Column): Unit = {
      val rows = df.select(inline.as("i"), bound.as("b")).collect()
      rows.foreach(r => assert(r.get(0) == r.get(1), rows.mkString("; ")))
    }

    // scalar body
    both(length(TextOps.norm($"text")),
      TextOps.bindOnce(TextOps.norm($"text"))(n => length(n)))
    // array body
    both(TextOps.tokens($"text"),
      TextOps.bindOnce(TextOps.tokens($"text"))(identity))
    // nested lambda referencing the bound variable (the wordBigrams /
    // chunks shape this helper exists for)
    both(
      transform(sequence(lit(1), size(TextOps.tokens($"text"))), i =>
        element_at(TextOps.tokens($"text"), i)),
      TextOps.bindOnce(TextOps.tokens($"text")) { toks =>
        transform(sequence(lit(1), size(toks)), i => element_at(toks, i))
      })
  }

  test("bindOnce propagates null like the inlined expression") {
    import spark.implicits._
    val df = Seq(Some("a b"), None).toDF("text")
    val rows = df.select(
      TextOps.wordBigrams($"text").as("b"),
      size(TextOps.tokens($"text")).as("n")).collect()
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
  }
}
