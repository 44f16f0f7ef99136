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

  test("hotKeys flags the heavy hitter") {
    val hot = Skew.hotKeys(facts, Seq("k"), threshold = 0.05)
      .select($"k").as[String].collect()
    assert(hot.toSeq == Seq("HOT"))
  }
}
