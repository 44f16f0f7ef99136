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

  test("temperature shares flatten the natural distribution (α = 1/2)") {
    val out = Mixture.temperatureMixtureKeep(docs, "doc_id", "grp")
      .select($"grp", $"grp_n", $"share", $"target_n").distinct()
      .as[(String, Int, Double, Int)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out.size == 3, "one share row per stratum")
    // shares reproduce the documented arithmetic: fixed-point sqrt
    // numerators over their exact long sum
    val nums = Map("a" -> 100, "b" -> 40, "c" -> 10).map { case (g, n) =>
      g -> math.floor(math.sqrt(n.toDouble) * 4294967296.0).toLong
    }
    val wsum = nums.values.sum
    out.foreach { case (g, (_, share, _)) =>
      assert(share == nums(g).toDouble / wsum.toDouble,
        s"$g share $share != derived ${nums(g).toDouble / wsum.toDouble}")
    }
    // flattening: the big stratum's derived share sits strictly below
    // its natural proportion, the small stratum's strictly above
    assert(out("a")._2 < 100.0 / 150.0, s"a not flattened: ${out("a")}")
    assert(out("c")._2 > 10.0 / 150.0, s"c not upweighted: ${out("c")}")
    // binding stratum = argmin n_g/w_g = argmin sqrt(n_g) = c, kept
    // in full — exactly (the LEAST clamp), not FP-probably
    assert(out("c")._3 == out("c")._1,
      s"binding stratum subsampled: ${out("c")}")
    // everyone else genuinely subsamples on this skew
    assert(out("a")._3 < out("a")._1, s"a not subsampled: ${out("a")}")
    assert(out("b")._3 < out("b")._1, s"b not subsampled: ${out("b")}")
  }

  test("temperature keep draw is deterministic and target-shaped") {
    val run1 = Mixture.temperatureMixtureKeep(docs, "doc_id", "grp")
      .select($"doc_id", $"keep").as[(Long, Boolean)].collect().toMap
    val run2 = Mixture.temperatureMixtureKeep(
        docs.repartition(7), "doc_id", "grp")
      .select($"doc_id", $"keep").as[(Long, Boolean)].collect().toMap
    assert(run1 == run2, "keep verdicts must not depend on partitioning")
    // achieved keeps track the targets within hash noise (4 sigma)
    val tg = Mixture.temperatureMixtureKeep(docs, "doc_id", "grp")
      .select($"grp", $"grp_n", $"target_n").distinct()
      .as[(String, Int, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val byGrp = docs.as[(Long, String)].collect().groupBy(_._2)
    byGrp.foreach { case (g, rows) =>
      val kept = rows.count(r => run1(r._1))
      val sd = math.sqrt(tg(g)._1.toDouble) / 2 + 1
      assert(math.abs(kept - tg(g)._2) <= 4 * sd,
        s"$g kept $kept vs target ${tg(g)._2}")
    }
  }

  test("binding stratum survives DOWNWARD FP rounding (tripping fixtures)") {
    // floor(share·(n/share)) rounds to n−1 on these pairs (found by
    // search — ~5% of random (n, share) pairs trip); the LEAST clamp
    // only repairs UPWARD rounding, so without the explicit
    // cap-equality branch the binding stratum loses a document.
    // Count form: strata (a=12, b=7), shares = natural proportions as
    // doubles — binding is b and floor(w_b·cap) = 6, not 7.
    val d2 = ((1 to 12).map(i => (i.toLong, "a")) ++
      (13 to 19).map(i => (i.toLong, "b"))).toDF("doc_id", "grp")
    val wa = 12.0 / 19.0
    val out = Mixture.mixtureKeep(d2, "doc_id", "grp",
        Seq("a" -> wa, "b" -> (1.0 - wa)))
      .select($"grp", $"grp_n", $"target_n").distinct()
      .as[(String, Int, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("b")._2 == out("b")._1, s"binding b subsampled: ${out("b")}")
    // Temperature form: sizes (a=2, b=10) — binding is a (smallest
    // sqrt) and floor(share_a·cap) = 1, not 2, before the branch.
    val d3 = ((1 to 2).map(i => (i.toLong, "a")) ++
      (3 to 12).map(i => (i.toLong, "b"))).toDF("doc_id", "grp")
    val tg = Mixture.temperatureTargets(d3, "grp")
      .map(t => t._1 -> (t._2, t._4)).toMap
    assert(tg("a")._2 == tg("a")._1, s"binding a subsampled: ${tg("a")}")
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
