package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class BoilerplateSpec extends SparkTestBase {
  import spark.implicits._

  // window = 2 tokens, maxDf = 2: a 2-token segment appearing in 3+
  // distinct docs is boilerplate
  private val footer = "cookie banner"

  test("segments repeated across >maxDf docs are dropped, text reassembles in order") {
    val docs = Seq(
      (1L, s"alpha beta $footer gamma delta"),
      (2L, s"epsilon zeta $footer eta theta"),
      (3L, s"iota kappa $footer lambda mu"),
      (4L, "unique words only here"))
      .toDF("doc_id", "text")
    val out = Boilerplate.removeBoilerplate(docs, "text", "doc_id",
        window = 2, maxDf = 2)
      .as[(Long, Int, Int, String)].collect()
      .map(r => r._1 -> r).toMap
    // each of docs 1-3: 3 segments, the footer one dropped (df = 3)
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out(id)._2 == 3 && out(id)._3 == 1, out(id))
      assert(!out(id)._4.contains("cookie"), out(id))
    }
    assert(out(1L)._4 == "alpha beta gamma delta")
    assert(out(2L)._4 == "epsilon zeta eta theta")
    // doc 4 untouched
    assert(out(4L) == ((4L, 2, 0, "unique words only here")))
  }

  test("all-boilerplate docs survive with empty clean_text") {
    val docs = Seq(
      (1L, footer), (2L, footer), (3L, footer))
      .toDF("doc_id", "text")
    val out = Boilerplate.removeBoilerplate(docs, "text", "doc_id",
        window = 2, maxDf = 2)
      .as[(Long, Int, Int, String)].collect()
    assert(out.length == 3) // no row silently dropped
    assert(out.forall { case (_, n, d, t) => n == 1 && d == 1 && t == "" })
  }

  test("reassembly identity: with maxDf >= ndocs nothing drops and clean_text == normalized text") {
    // randomized invariant over window sizes: segmentation + in-order
    // reassembly must reconstruct the normalized text exactly when no
    // segment qualifies as boilerplate — any ordering, off-by-one, or
    // separator bug in the collect_list/array_sort path breaks this
    val rnd = new scala.util.Random(4242L)
    val docs = (1L to 12L).map { id =>
      val n = 1 + rnd.nextInt(40)
      (id, (0 until n).map(_ => s"w${rnd.nextInt(8)}").mkString("  ", "   ", " "))
    }.toDF("doc_id", "text")
    Seq(1, 3, 8).foreach { w =>
      val out = Boilerplate.removeBoilerplate(docs, "text", "doc_id",
          window = w, maxDf = 1000)
        .as[(Long, Int, Int, String)].collect()
      assert(out.length == 12)
      val norm = docs.select($"doc_id",
          lower(trim(regexp_replace($"text", "\\s+", " "))).as("n"))
        .as[(Long, String)].collect().toMap
      out.foreach { case (id, _, dropped, clean) =>
        assert(dropped == 0, s"window=$w doc=$id")
        assert(clean == norm(id), s"window=$w doc=$id")
      }
    }
  }

  test("within-doc repetition alone is not boilerplate (df counts distinct docs)") {
    val docs = Seq(
      (1L, s"$footer $footer $footer"), // df = 1 despite 3 occurrences
      (2L, "other text entirely"))
      .toDF("doc_id", "text")
    val out = Boilerplate.removeBoilerplate(docs, "text", "doc_id",
        window = 2, maxDf = 2)
      .as[(Long, Int, Int, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3, 0, s"$footer $footer $footer")))
  }
}
