package graft.text

import graft.SparkTestBase

/** Pins [[Bm25.topK]] against an independent naive per-document scorer
  * (plain Scala loops — no pivot, no Spark) using the same rational-idf
  * formula, plus the retrieval-semantics edges: zero-match omission,
  * length normalization, k cut, and the deterministic tie order.
  */
class Bm25Spec extends SparkTestBase {

  private val corpus: Seq[(Long, String)] = Seq(
    1L -> "spark spark spark filter",
    2L -> "spark filter filter filter",
    3L -> "filter filter filter filter",
    4L -> "spark spark spark filter filter filter filter filter",
    5L -> "vector spark filter filter")

  private val terms = Seq("spark", "vector")

  /** Straight-line reimplementation: per-doc term loop, summed in
    * `terms` order — independent of the pivot/broadcast plan shape.
    */
  private def naive(k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+").toSeq
    }.toMap
    val n = corpus.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    corpus.flatMap { case (id, _) =>
      val dl = toks(id).size.toDouble
      val scores = terms.map { term =>
        val tf = toks(id).count(_ == term).toDouble
        if (tf == 0.0) 0.0
        else {
          val df = toks.values.count(_.contains(term)).toDouble
          val idf = (n - df + 0.5) / (df + 0.5) + 1.0
          idf * (tf * (k1 + 1.0)) /
            (tf + k1 * ((1.0 - b) + b * dl / avgdl))
        }
      }
      if (toks(id).exists(terms.contains)) Some(id -> scores.sum) else None
    }.toMap
  }

  private def run(k: Int): Seq[(Long, Double)] = {
    import spark.implicits._
    Bm25.topK(corpus.toDF("doc_id", "text"), "doc_id", "text", terms, k)
      .collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))
  }

  test("scores match the naive scorer and rank by score desc") {
    val got = run(k = 10)
    val want = naive().toSeq.sortBy { case (id, s) => (-s, id) }
    assert(got.map(_._1) == want.map(_._1))
    got.zip(want).foreach { case ((_, g), (_, w)) =>
      assert(approx(g, w, 1e-12), s"got $g want $w")
    }
  }

  test("documents matching no query term are omitted") {
    assert(!run(k = 10).map(_._1).contains(3L))
  }

  test("length normalization: same tf, longer doc scores lower") {
    val byId = run(k = 10).toMap
    assert(byId(4L) < byId(1L)) // both tf(spark)=3; dl 8 vs 4
  }

  test("k cuts after the deterministic (score desc, id asc) order") {
    val full = run(k = 10)
    assert(run(k = 2) == full.take(2))
  }

  test("tfidfKeywords matches a naive scorer, ranks and cuts per doc") {
    import spark.implicits._
    val got = Bm25.tfidfKeywords(corpus.toDF("doc_id", "text"),
        "doc_id", "text", k = 2)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))

    val toks = corpus.map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+").toSeq
    }.toMap
    val n = corpus.size.toDouble
    val want = corpus.flatMap { case (id, _) =>
      val dl = toks(id).size.toDouble
      toks(id).distinct.map { term =>
        val tf = toks(id).count(_ == term).toDouble
        val df = toks.values.count(_.contains(term)).toDouble
        val idf = (n - df + 0.5) / (df + 0.5) + 1.0
        (id, term, (tf / dl) * idf)
      }.sortBy { case (_, term, s) => (-s, term) }
        .take(2).zipWithIndex
        .map { case ((i, term, s), r) => (i, r + 1, term, s) }
    }.sortBy { case (id, r, _, _) => (id, r) }

    assert(got.map(t => (t._1, t._2, t._3)) == want.map(t => (t._1, t._2, t._3)))
    got.zip(want).foreach { case ((_, _, _, g), (_, _, _, w)) =>
      assert(approx(g, w, 1e-12), s"got $g want $w")
    }
  }

  test("rejects empty and duplicate query terms") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Bm25.topK(df, "doc_id", "text", Seq.empty, 5)
    }
    intercept[IllegalArgumentException] {
      Bm25.topK(df, "doc_id", "text", Seq("spark", "spark"), 5)
    }
  }
}
