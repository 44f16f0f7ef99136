package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class StratifiedSampleSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = (0L until 200L)
    .map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "g")

  test("rate 100 keeps all, rate 0 keeps none, default rate applies") {
    val rows = docs.select($"g",
        TextOps.stratifiedKeep($"id", $"g", Map("a" -> 100, "b" -> 0), 50)
          .as("keep"))
      .as[(String, Boolean)].collect()
    assert(rows.filter(_._1 == "a").forall(_._2))
    assert(rows.filter(_._1 == "b").forall(!_._2))
    // unlisted group falls back to the default rate: roughly 30% of 200
    // ids (hash buckets are near-uniform; wide band to stay flake-free)
    val kept = docs.select(TextOps.stratifiedKeep($"id", lit("zz"),
        Map("a" -> 100), 30).as("keep"))
      .as[Boolean].collect().count(identity)
    assert(kept > 200 * 30 / 100 / 2 && kept < 200 * 30 / 100 * 2, kept)
  }

  test("sampling is deterministic and decorrelated from hashSplit") {
    def run() = docs.select($"id",
        TextOps.stratifiedKeep($"id", $"g", Map("a" -> 50), 50).as("keep"))
      .as[(Long, Boolean)].collect().toMap
    assert(run() == run())
    // the salt must decorrelate sample membership from hashSplit
    // buckets: among ids in the FIRST 50% split bucket, the 50% sample
    // must keep some and drop some (unsalted hashing would keep all)
    val both = docs.select($"id",
        TextOps.hashSplit($"id", Seq(50), Seq("lo", "hi")).as("split"),
        TextOps.stratifiedKeep($"id", lit("a"), Map("a" -> 50), 0).as("keep"))
      .as[(Long, String, Boolean)].collect()
    val lo = both.filter(_._2 == "lo")
    assert(lo.exists(_._3) && lo.exists(!_._3))
  }
}
