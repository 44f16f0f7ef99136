package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MixtureSpec extends SparkTestBase {
  import spark.implicits._

  // skewed strata: a 100, b 40, c 10
  private lazy val docs = ((1 to 100).map(i => (i.toLong, "a")) ++
    (101 to 140).map(i => (i.toLong, "b")) ++
    (141 to 150).map(i => (i.toLong, "c"))).toDF("doc_id", "grp")

  test("targets honor the proportions and the binding stratum caps T") {
    // shares (a .5, b .2, c .3): caps = 200, 200, 33.3 -> c binds
    val out = Mixture.mixtureKeep(docs, "doc_id", "grp",
        Seq("a" -> 0.5, "b" -> 0.2, "c" -> 0.3))
      .select($"doc_id", $"grp", $"grp_n", $"target_n", $"keep")
      .as[(Long, String, Int, Int, Boolean)].collect()
    assert(out.length == 150, "one row per document")
    val tg = out.map(r => r._2 -> r._4).toMap
    val t = 10.0 / 0.3
    Seq("a" -> 0.5, "b" -> 0.2, "c" -> 0.3).foreach { case (g, w) =>
      assert(math.abs(tg(g) - w * t) < 1, s"$g target ${tg(g)} vs ${w * t}")
    }
    // targets never exceed availability
    val n = out.map(r => r._2 -> r._3).toMap
    tg.foreach { case (g, tgt) => assert(tgt <= n(g)) }
    // achieved keeps track the targets within hash noise (4 sigma)
    out.groupBy(_._2).foreach { case (g, rows) =>
      val kept = rows.count(_._5)
      val sd = math.sqrt(n(g).toDouble) / 2 + 1
      assert(math.abs(kept - tg(g)) <= 4 * sd,
        s"$g kept $kept vs target ${tg(g)}")
    }
  }

  test("strata absent from the shares are dropped (share zero)") {
    val out = Mixture.mixtureKeep(docs, "doc_id", "grp",
      Seq("a" -> 0.8, "b" -> 0.2))
    assert(out.filter($"grp" === "c").isEmpty)
    assert(out.count() == 140)
  }

  test("share validation rejects bad recipes") {
    intercept[IllegalArgumentException] {
      Mixture.mixtureKeep(docs, "doc_id", "grp", Seq("a" -> 0.5))
    }
    intercept[IllegalArgumentException] {
      Mixture.mixtureKeep(docs, "doc_id", "grp",
        Seq("a" -> 1.5, "b" -> -0.5))
    }
    intercept[IllegalArgumentException] {
      Mixture.mixtureKeep(docs, "doc_id", "grp",
        Seq("a" -> 0.5, "a" -> 0.5))
    }
  }
}
