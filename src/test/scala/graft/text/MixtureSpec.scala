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

  test("binding stratum is kept in full — exactly, not FP-probably") {
    // shares with 1/3-style doubles are where share*(n/share) can
    // round below n; the LEAST clamp guarantees target_n == grp_n for
    // the binding stratum regardless
    val third = 1.0 / 3.0
    val out = Mixture.mixtureKeep(docs, "doc_id", "grp",
        Seq("a" -> third, "b" -> third, "c" -> (1.0 - 2 * third)))
      .select($"grp", $"grp_n", $"target_n").distinct()
      .as[(String, Int, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    out.foreach { case (g, (n, tgt)) =>
      assert(tgt <= n, s"$g target $tgt exceeds availability $n") }
    // binding stratum = argmin n_g/w_g = b (40/.333=120 vs a 300, c 30/.333=90)
    // caps: a 300, b 120, c 90 -> c binds; c must be kept whole
    assert(out("c")._2 == out("c")._1,
      s"binding stratum subsampled: ${out("c")}")
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
