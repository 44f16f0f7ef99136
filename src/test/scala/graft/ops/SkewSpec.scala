package graft.ops

import graft.SparkTestBase

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val facts = (1 to 1000).map(i =>
    (if (i <= 900) "HOT" else s"K$i", i.toLong)).toDF("k", "v")
  private lazy val dim = Seq(("HOT", "hot-dim"), ("K950", "cold-dim"))
    .toDF("k", "label")

  test("salted join equals plain join (inner)") {
    val plain = facts.join(dim, Seq("k"), "inner")
      .select($"k", $"v", $"label").as[(String, Long, String)].collect().sorted
    val salted = Skew.saltedJoin(facts, dim, Seq("k"), buckets = 8)
      .select($"k", $"v", $"label").as[(String, Long, String)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.length == 901)
  }

  test("salted join equals plain join (left) incl. unmatched rows") {
    val plain = facts.join(dim, Seq("k"), "left")
      .select($"k", $"v", $"label").as[(String, Long, Option[String])]
      .collect().sortBy(r => (r._1, r._2))
    val salted = Skew.saltedJoin(facts, dim, Seq("k"), buckets = 4, "left")
      .select($"k", $"v", $"label").as[(String, Long, Option[String])]
      .collect().sortBy(r => (r._1, r._2))
    assert(salted.toSeq == plain.toSeq)
    assert(plain.length == 1000)
  }

  test("salt is deterministic across runs and spreads the hot key") {
    // the salt is a row hash, not rand(seed): re-running the same plan
    // (and re-partitioning the input) must produce the identical
    // bucket per row, and the hot key must still span many buckets
    import org.apache.spark.sql.functions._
    def salts(df: org.apache.spark.sql.DataFrame) = Skew
      .saltedJoin(df, dim, Seq("k"), buckets = 8)
      .select($"k", $"v").as[(String, Long)].collect().toSeq.sorted
    assert(salts(facts) == salts(facts.repartition(7)))
    val buckets = facts.filter($"k" === "HOT")
      .withColumn("b", pmod(xxhash64(lit("skew-salt"), $"k", $"v"), lit(8L)))
      .select($"b").distinct().count()
    assert(buckets >= 6, s"hot key spread over only $buckets of 8 buckets")
  }

  test("hotKeys flags the heavy hitter") {
    val hot = Skew.hotKeys(facts, Seq("k"), threshold = 0.05)
      .select($"k").as[String].collect()
    assert(hot.toSeq == Seq("HOT"))
  }
}
