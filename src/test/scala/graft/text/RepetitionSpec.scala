package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Gopher-style repetition signals: duplicate-token fraction and the
  * non-distinct bigram counting form (qt8_repetition's building blocks).
  */
class RepetitionSpec extends SparkTestBase {
  import spark.implicits._

  test("dup-token fraction and counting bigrams, including degenerate docs") {
    val df = Seq(
      (1L, "a a a a"),          // 1 distinct of 4 tokens; bigrams "a a" x3
      (2L, "w x y z"),          // all distinct; 3 distinct bigrams
      (3L, "solo"))             // single token: no bigrams
      .toDF("doc_id", "text")
    val out = df.select($"doc_id",
        TextOps.dupTokenFraction($"text").as("dup"),
        TextOps.wordBigrams($"text").as("bg"))
      .as[(Long, Double, Seq[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((0.75, Seq("a a", "a a", "a a"))))
    assert(out(2L) == ((0.0, Seq("w x", "x y", "y z"))))
    assert(out(3L) == ((0.0, Seq.empty)))
  }

  test("top-bigram fraction aggregate (the qt8 relational shape)") {
    val df = Seq(
      (1L, "a a a b"),          // bigrams: "a a" x2, "a b" -> top 2/3
      (3L, "solo"))
      .toDF("doc_id", "text")
    val top = df.select($"doc_id",
        explode(TextOps.wordBigrams($"text")).as("bg"))
      .groupBy($"doc_id", $"bg").agg(count(lit(1)).as("n"))
      .groupBy($"doc_id")
      .agg((max($"n").cast("double") / sum($"n")).as("tb"))
    val joined = df.select($"doc_id")
      .join(top, Seq("doc_id"), "left")
      .withColumn("tb", coalesce($"tb", lit(0.0)))
      .as[(Long, Double)].collect().toMap
    assert(joined(1L) == 2.0 / 3.0)
    assert(joined(3L) == 0.0)   // no bigrams -> left-join null -> 0.0
  }
}
