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
}
