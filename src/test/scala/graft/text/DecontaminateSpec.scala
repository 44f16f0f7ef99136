package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  private def doc(words: String*) = words.mkString(" ")

  test("train docs sharing an 8-gram with eval are flagged, others are not") {
    val shared = doc("one", "two", "three", "four", "five", "six", "seven", "eight")
    val train = Seq(
      (1L, shared + " tail tokens here"),          // contains the eval 8-gram
      (2L, doc("totally", "different", "words", "that", "never", "overlap",
        "with", "anything", "held", "out")),       // clean
      (3L, "short doc"))                           // < 8 tokens: no grams
      .toDF("doc_id", "text")
    val eval_ = Seq((100L, "prefix " + shared)).toDF("doc_id", "text")
    val out = Decontaminate.contaminated(train, eval_, "text", "doc_id", n = 8)
      .as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(1L))
    // train doc 1 windows: [one..eight], [two..tail], [three..here] —
    // only the first matches an eval window ([prefix..seven], [one..eight])
    assert(out(1L) == 1L)
  }

  test("longestSharedRun: exact run lengths, multiple maximal runs, negatives") {
    // train doc 1 shares two DISJOINT runs with eval 100: a 7-token run
    // (a1..a7) and a 5-token run (b1..b5); with anchor=4 both are found
    // and measured exactly. train 2 shares nothing >= 4 tokens.
    val run7 = doc("a1", "a2", "a3", "a4", "a5", "a6", "a7")
    val run5 = doc("b1", "b2", "b3", "b4", "b5")
    val train = Seq(
      (1L, run7 + " xx yy " + run5 + " zz"),
      (2L, doc("no", "overlap", "here", "at", "all", "whatsoever")),
      (3L, run5)) // exact-length doc: the run IS the doc
      .toDF("doc_id", "text")
    val eval_ = Seq((100L, "pre " + run7 + " mid " + run5 + " post"))
      .toDF("doc_id", "text")
    val out = Decontaminate.longestSharedRun(train, eval_, "text", "doc_id",
        anchor = 4)
      .as[(Long, Long, Int, Int, Int)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // 7-token run -> 4 anchors; 5-token run -> 2 anchors
    assert(out((1L, 100L)) === ((7, 2, 6)))
    assert(out((3L, 100L)) === ((5, 1, 2)))
    assert(!out.contains((2L, 100L)))
  }

  test("longestSharedRun: repeated tokens chain into one run, not many") {
    // "w w w w w w" shared: every anchor matches every eval position of
    // the same gram -> multiple diagonals; the LONGEST diagonal carries
    // the true 6-token run. Also pins max-run selection among diagonals.
    val rep = doc(Seq.fill(6)("w"): _*)
    val train = Seq((1L, rep + " tail")).toDF("doc_id", "text")
    val eval_ = Seq((9L, "head " + rep)).toDF("doc_id", "text")
    val out = Decontaminate.longestSharedRun(train, eval_, "text", "doc_id",
        anchor = 3)
      .select($"max_run_tok").as[Int].collect()
    assert(out.toSeq === Seq(6))
  }

  test("longestSharedRun: shuffle arm (broadcastEval=false) is identical") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("split",
        TextOps.hashSplit(col("doc_id"), Seq(90), Seq("train", "eval")))
    val tr = docs.filter($"split" === "train")
    val ev = docs.filter($"split" === "eval")
    val a = Decontaminate.longestSharedRun(tr, ev, "text", "doc_id", 5)
      .orderBy($"train_id", $"eval_id").collect().toSeq
    val b = Decontaminate.longestSharedRun(tr, ev, "text", "doc_id", 5,
        broadcastEval = false)
      .orderBy($"train_id", $"eval_id").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("leakage-safe split: every member of a dup group lands in one split") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ann = graft.dedup.Dedup.exactDupAnnotate(docs, "text", "doc_id")
      .select($"doc_id", $"canonical_id",
        TextOps.hashSplit(col("canonical_id"), Seq(80), Seq("train", "eval"))
          .as("split"))
    // groups are split atomically
    val mixed = ann.groupBy($"canonical_id")
      .agg(countDistinct($"split").as("n"))
      .filter($"n" > 1).count()
    assert(mixed == 0)
    // and the split is genuinely two-sided on this corpus
    val sides = ann.select($"split").distinct().as[String].collect().toSet
    assert(sides == Set("train", "eval"))
  }

  test("lake path (no broadcast) is result-identical") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("split",
        TextOps.hashSplit(col("doc_id"), Seq(80), Seq("train", "eval")))
    val tr = docs.filter($"split" === "train")
    val ev = docs.filter($"split" === "eval")
    def canon(b: Boolean) =
      Decontaminate.contaminated(tr, ev, "text", "doc_id", n = 3,
          broadcastEval = b)
        .orderBy("train_id").collect().toSeq
    val bc = canon(true)
    assert(bc.nonEmpty) // template corpus: 3-gram overlap must exist
    assert(canon(false) == bc)
  }

  test("bloom pre-filtered path is result-identical (exact verify join)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("split",
        TextOps.hashSplit(col("doc_id"), Seq(80), Seq("train", "eval")))
    val tr = docs.filter($"split" === "train")
    val ev = docs.filter($"split" === "eval")
    val bc = Decontaminate.contaminated(tr, ev, "text", "doc_id", n = 3)
      .orderBy("train_id").collect().toSeq
    assert(bc.nonEmpty)
    // even a deliberately sloppy sketch (50% fpp) must not change the
    // result: false positives die in the verify join, and a Bloom
    // filter has no false negatives
    Seq(0.01, 0.5).foreach { fpp =>
      val bloom = Decontaminate.contaminatedBloom(tr, ev, "text", "doc_id",
          n = 3, fpp = fpp)
        .orderBy("train_id").collect().toSeq
      assert(bloom == bc, s"fpp=$fpp")
      spark.catalog.clearCache()
    }
    // a maxBits cap far below the optimal size only degrades the
    // effective fpp (the 100 TB guard against giant plan literals) —
    // the verify join keeps the result bit-identical
    val capped = Decontaminate.contaminatedBloom(tr, ev, "text", "doc_id",
        n = 3, maxBits = 64)
      .orderBy("train_id").collect().toSeq
    assert(capped == bc, "maxBits cap changed the result")
    spark.catalog.clearCache()
  }

  test("bloom pre-filter runs as native codegen before the verify join") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Decontaminate.contaminatedBloom(
        docs, docs.filter($"doc_id" < 5), "text", "doc_id", n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
    spark.catalog.clearCache()
  }

  test("exciseSharedRuns: removes exactly the planted span, keeps the rest") {
    val run = doc("r1", "r2", "r3", "r4", "r5", "r6", "r7", "r8", "r9")
    val train = Seq(
      (1L, "alpha beta " + run + " gamma delta"), // 9-token run at pos 2
      (2L, "clean words only nothing shared here at all")
    ).toDF("doc_id", "text")
    val eval_ = Seq((100L, "pre " + run + " post")).toDF("doc_id", "text")
    val out = Decontaminate.exciseSharedRuns(train, eval_, "text", "doc_id",
        anchor = 5, minRun = 8)
      .orderBy("doc_id")
      .select("doc_id", "n_spans", "n_tok", "n_excised", "redacted_text")
      .as[(Long, Int, Int, Int, String)].collect().toSeq
    assert(out == Seq(
      (1L, 1, 13, 9, "alpha beta gamma delta"),
      (2L, 0, 8, 0, "clean words only nothing shared here at all")))
  }

  test("exciseSharedRuns: overlapping spans from two eval docs union") {
    // eval 100 shares tokens 0..9, eval 101 shares tokens 5..14 —
    // positions 5..9 are covered twice; the union excises 0..14 once
    val t15 = (1 to 15).map(i => s"t$i")
    val train = Seq((1L, t15.mkString(" ") + " tail1 tail2"))
      .toDF("doc_id", "text")
    val eval_ = Seq(
      (100L, t15.take(10).mkString(" ")),
      (101L, t15.drop(5).mkString(" "))).toDF("doc_id", "text")
    val out = Decontaminate.exciseSharedRuns(train, eval_, "text", "doc_id",
        anchor = 5, minRun = 8)
      .select("n_spans", "n_tok", "n_excised", "redacted_text")
      .as[(Int, Int, Int, String)].head()
    assert(out == ((2, 17, 15, "tail1 tail2")))
  }

  test("exciseSharedRuns: below-minRun runs leave the doc untouched") {
    val run6 = doc("s1", "s2", "s3", "s4", "s5", "s6")
    val train = Seq((1L, "x " + run6 + " y")).toDF("doc_id", "text")
    val eval_ = Seq((100L, run6)).toDF("doc_id", "text")
    val out = Decontaminate.exciseSharedRuns(train, eval_, "text", "doc_id",
        anchor = 5, minRun = 8)
      .select("n_spans", "n_excised", "redacted_text")
      .as[(Int, Int, String)].head()
    assert(out == ((0, 0, "x " + run6 + " y")))
  }

  test("exciseSharedRuns: every train row surfaces; spans match longestSharedRun") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("split",
        TextOps.hashSplit(col("doc_id"), Seq(90), Seq("train", "eval")))
    val tr = docs.filter($"split" === "train")
    val ev = docs.filter($"split" === "eval")
    val out = Decontaminate.exciseSharedRuns(tr, ev, "text", "doc_id")
    assert(out.count() == tr.count())
    // a doc has spans iff some pair reaches minRun in the run report
    val flagged = Decontaminate.longestSharedRun(tr, ev, "text", "doc_id")
      .filter($"max_run_tok" >= 8)
      .select($"train_id").distinct().as[Long].collect().toSet
    val excised = out.filter($"n_spans" > 0)
      .select($"doc_id").as[Long].collect().toSet
    assert(excised == flagged)
    assert(excised.nonEmpty) // the fixture genuinely trips
  }

  test("exciseRepeatedRuns: later copy excised, first kept, negatives " +
      "untouched") {
    val run9 = doc("w1", "w2", "w3", "w4", "w5", "w6", "w7", "w8", "w9")
    val docs = Seq(
      (1L, "alpha " + run9 + " mid " + run9 + " tail"), // repeat at 10
      (2L, "all these tokens appear exactly once in this document"),
      (3L, run9 + " " + run9 + " " + run9) // 3 copies -> keep first
    ).toDF("doc_id", "text")
    val out = Decontaminate.exciseRepeatedRuns(docs, "text", "doc_id",
        anchor = 5, minRun = 8)
      .orderBy("doc_id")
      .select("doc_id", "n_spans", "n_tok", "n_excised", "redacted_text")
      .as[(Long, Int, Int, Int, String)].collect().toSeq
    assert(out(0) == ((1L, 1, 21, 9, "alpha " + run9 + " mid tail")))
    assert(out(1)._2 == 0)
    assert(out(1)._5 ==
      "all these tokens appear exactly once in this document")
    // periodic doc: every later copy goes, exactly one survives
    assert(out(2)._1 == 3L && out(2)._4 == 18 && out(2)._5 == run9)
  }

  test("repeatedRunSpans: spans sit on LATER occurrences only") {
    val run8 = doc("p1", "p2", "p3", "p4", "p5", "p6", "p7", "p8")
    val docs = Seq((7L, run8 + " gap " + run8)).toDF("doc_id", "text")
    val spans = Decontaminate.repeatedRunSpans(docs, "text", "doc_id",
        anchor = 5, minRun = 8)
      .select($"span_id", $"s", $"e").as[(Long, Int, Int)].collect().toSeq
    assert(spans == Seq((7L, 9, 17))) // the second copy, never the first
  }

  test("exciseCrossDocRuns: later DOCUMENTS lose the shared run, lowest " +
      "id keeps it, chains collapse to one copy corpus-wide") {
    val run9 = doc("c1", "c2", "c3", "c4", "c5", "c6", "c7", "c8", "c9")
    val docs = Seq(
      (1L, "alpha " + run9 + " tail"),   // lowest id: keeps its copy
      (2L, "pre " + run9),               // later copy: excised
      (3L, run9 + " post"),              // later copy via d1 AND d2: once
      (4L, "nothing shared with anyone here at all"),
      (5L, doc("s1", "s2", "s3", "s4", "s5", "s6", "s7") + " " +
        doc("s1", "s2", "s3", "s4", "s5", "s6", "s7")) // intra-doc only
    ).toDF("doc_id", "text")
    val out = Decontaminate.exciseCrossDocRuns(docs, "text", "doc_id",
        anchor = 5, minRun = 8)
      .orderBy("doc_id")
      .select("doc_id", "n_spans", "n_tok", "n_excised", "redacted_text")
      .as[(Long, Int, Int, Int, String)].collect().toSeq
    assert(out(0) == ((1L, 0, 11, 0, "alpha " + run9 + " tail")))
    assert(out(1) == ((2L, 1, 10, 9, "pre")))
    assert(out(2) == ((3L, 1, 10, 9, "post")))
    assert(out(3)._2 == 0 && out(3)._4 == 0)
    // a WITHIN-doc repeat is qt38's operator, never flagged here
    assert(out(4)._2 == 0 && out(4)._4 == 0)
  }

  test("crossDocRunSpans: below-minRun shared runs are not spans; spans " +
      "land on the higher doc id only") {
    val run7 = doc("d1", "d2", "d3", "d4", "d5", "d6", "d7")
    val run8 = doc("e1", "e2", "e3", "e4", "e5", "e6", "e7", "e8")
    val docs = Seq(
      (10L, run7 + " xx " + run8),
      (20L, run7 + " yy " + run8)
    ).toDF("doc_id", "text")
    val spans = Decontaminate.crossDocRunSpans(docs, "text", "doc_id",
        anchor = 5, minRun = 8)
      .select($"span_id", $"s", $"e").as[(Long, Int, Int)].collect().toSeq
    assert(spans == Seq((20L, 8, 16)), spans) // run8 on doc 20; run7 too short
  }
}
