package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RollingMinHashSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference implementation: explicit per-window polynomial. */
  private def oracle(s: String, w: Int): Option[Long] = {
    val cps = s.codePoints().toArray
    if (cps.length < w) None
    else Some((0 to cps.length - w).map { i =>
      (0 until w).foldLeft(0L)((h, j) => h * 31 + cps(i + j)) % 2147483647L
    }.min)
  }

  test("matches the explicit polynomial reference") {
    val texts = Seq("the quick brown fox", "aaaaaaaaaa", "spark engine graft",
      "12345678", "ab")
    val got = texts.toDF("s")
      .select($"s", RollingMinHash.rolling_min_hash($"s", 8).as("h"))
      .as[(String, Option[Long])].collect().toMap
    texts.foreach(t => assert(got(t) == oracle(t, 8), s"for '$t'"))
  }

  test("shorter than window yields null; exact-length yields one hash") {
    val got = Seq("abcdefg", "abcdefgh").toDF("s")
      .select(RollingMinHash.rolling_min_hash($"s", 8))
      .as[Option[Long]].collect()
    assert(got(0).isEmpty)
    assert(got(1) == oracle("abcdefgh", 8))
  }

  test("append/prepend keeps the fingerprint when the min window survives") {
    val base = "some stable core content here"
    val Some(h) = oracle(base, 8)
    val extended = oracle("PREFIX " + base + " SUFFIX", 8).get
    assert(extended <= h) // min can only decrease when windows are added
  }

  test("participates in whole-stage codegen (no fallback in plan)") {
    // a real scan (literals get constant-folded into LocalTableScan)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(RollingMinHash.rolling_min_hash($"text", 8).as("h"))
    // the "*(1)" stage marker is WholeStageCodegen in plan toString
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [rollingminhash"), plan)
    assert(df.count() == 500)
  }
}
