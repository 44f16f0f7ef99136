package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PqSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("codes are m ids in [0, k)") {
    val model = Pq.fit(emb, "vec_id", "embedding", m = 4, k = 8)
    assert(model.m == 4 && model.k == 8 && model.subDim == 16)
    val c = emb.select(Pq.codes($"embedding", model).as("c"))
      .as[Array[Int]].collect()
    assert(c.forall(_.length == 4))
    assert(c.forall(_.forall(x => x >= 0 && x < 8)))
    // codebooks are actually used: more than one distinct code appears
    assert(c.flatten.distinct.length > 1)
  }

  test("seed vectors reconstruct to themselves exactly") {
    // each seed's own subvector sits in its subspace codebook at
    // distance 0, so the argmin picks it (or a bit-identical twin) —
    // reconstruction must be elementwise-equal to the original
    val model = Pq.fit(emb, "vec_id", "embedding", m = 4, k = 8)
    val seeds = emb.orderBy($"vec_id").limit(8)
    val rows = seeds
      .select($"vec_id", $"embedding",
        Pq.reconstruct($"embedding", model).as("re"))
      .as[(Long, Array[Float], Array[Float])].collect()
    assert(rows.length == 8)
    rows.foreach { case (id, v, r) =>
      assert(r.length == v.length, s"seed $id length ${r.length}")
      assert(v.sameElements(r), s"seed $id does not reconstruct exactly")
    }
  }

  test("non-seed reconstruction is full-dimension and lossy") {
    val model = Pq.fit(emb, "vec_id", "embedding", m = 4, k = 8)
    val rows = emb.filter($"vec_id" >= 8)
      .select($"vec_id", $"embedding",
        Pq.reconstruct($"embedding", model).as("re"))
      .as[(Long, Array[Float], Array[Float])].collect()
    assert(rows.forall(_._3.length == 64))
    // PQ at 64x compression must actually be lossy on real data
    assert(rows.exists { case (_, v, r) => !v.sameElements(r) })
  }

  test("fitLloyd with zero iterations is exactly the seed fit") {
    val seed = Pq.fit(emb, "vec_id", "embedding", m = 4, k = 8)
    val lloyd0 = Pq.fitLloyd(emb, "vec_id", "embedding", m = 4, k = 8,
      iters = 0)
    (0 until 4).foreach { j =>
      (0 until 8).foreach { c =>
        assert(seed.codebooks(j)(c).sameElements(lloyd0.codebooks(j)(c)))
      }
    }
    // one refinement step must actually move at least one centroid
    val lloyd1 = Pq.fitLloyd(emb, "vec_id", "embedding", m = 4, k = 8,
      iters = 1)
    assert((0 until 4).exists(j => (0 until 8).exists(c =>
      !seed.codebooks(j)(c).sameElements(lloyd1.codebooks(j)(c)))))
  }

  test("ADC cosine equals reconstruction cosine (rank-identical, 1e-12)") {
    // the production LUT-sum form regroups the dot per subspace, so
    // scores agree to rounding — the pin is rank-identity plus a 1e-12
    // relative band, per the contract in Pq's ADC scaladoc
    val model = Pq.fit(emb, "vec_id", "embedding", m = 16, k = 256)
    val q = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val qt = Pq.withAdcTables(q, "query_id", "qe", model)
    val pairs = emb
      .select($"vec_id", Pq.codes($"embedding", model).as("codes"),
        Pq.reconstruct($"embedding", model).as("re"))
      .crossJoin(broadcast(qt))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id",
        Pq.adcCosine($"codes", $"adc_lut", $"adc_qnsq", model).as("adc"),
        Similarity.cosine($"re", $"qe").as("rc"))
      .as[(Long, Long, Double, Double)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (qid, vid, adc, rc) =>
      assert(math.abs(adc - rc) <= 1e-12 * math.max(1.0, math.abs(rc)),
        s"($qid,$vid): adc $adc vs recon $rc")
    }
    // rank-identity per query under (score desc, id) ordering
    def ranks(score: ((Long, Long, Double, Double)) => Double) =
      pairs.groupBy(_._1).view.mapValues(_.sortBy(p => (-score(p), p._2))
        .map(_._2).toSeq).toMap
    assert(ranks(_._3) == ranks(_._4), "ADC and reconstruction rankings differ")
  }

  test("ADC L2 is bit-exact vs subspace-grouped reconstruction distance") {
    val model = Pq.fit(emb, "vec_id", "embedding", m = 16, k = 256)
    val q = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val qt = Pq.withAdcTables(q, "query_id", "qe", model)
    val rows = emb
      .select($"vec_id", Pq.codes($"embedding", model).as("codes"),
        Pq.reconstruct($"embedding", model).as("re"))
      .crossJoin(broadcast(qt))
      .select($"query_id", $"vec_id",
        Pq.adcL2Sq($"codes", $"adc_dist", model).as("adc"),
        $"re", $"qe")
      .as[(Long, Long, Double, Array[Float], Array[Float])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (qid, vid, adc, re, qe) =>
      // same grouping as the LUT: per-subspace ascending fold of
      // difference squares, then an ascending fold across subspaces
      val sub = model.subDim
      val expect = (0 until model.m).map { j =>
        var s = 0.0; var i = 0
        while (i < sub) {
          val d = qe(j * sub + i).toDouble - re(j * sub + i).toDouble
          s += d * d; i += 1
        }
        s
      }.reduceLeft(_ + _)
      assert(java.lang.Double.compare(adc, expect) == 0,
        s"($qid,$vid): adc $adc != grouped recon $expect")
    }
  }

  test("fit validates the subspace split") {
    intercept[IllegalArgumentException] {
      Pq.fit(emb, "vec_id", "embedding", m = 7, k = 8) // 64 % 7 != 0
    }
  }
}
