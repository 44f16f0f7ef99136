package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class IvfSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val queries = emb.filter($"vec_id" < 8)
    .select($"vec_id".as("qid"), $"embedding".as("qe"))

  test("nprobe == k cells reproduces brute-force exactly") {
    val model = Ivf.fit(emb, "vec_id", "embedding", k = 4, iters = 2)
    val ivf = Ivf.topK(emb, queries, "vec_id", "embedding", "qid", "qe",
        model, k = 5, nprobe = 4)
      .select($"qid", $"rank", $"neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val brute = Similarity.bruteTopK(emb, queries, "vec_id", "embedding",
        "qid", "qe", k = 5)
      .select($"qid", $"rank", $"neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(ivf == brute)
  }

  test("nprobe < cells trades recall, keeps useful accuracy") {
    val model = Ivf.fit(emb, "vec_id", "embedding", k = 8, iters = 3)
    val ivf = Ivf.topK(emb, queries, "vec_id", "embedding", "qid", "qe",
        model, k = 5, nprobe = 4)
      .select($"qid", $"neighbor_id").as[(Long, Long)].collect().toSet
    val brute = Similarity.bruteTopK(emb, queries, "vec_id", "embedding",
        "qid", "qe", k = 5)
      .select($"qid", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall")
    // every returned neighbor must carry the exact cosine rank order
    val ranks = Ivf.topK(emb, queries, "vec_id", "embedding", "qid", "qe",
        model, k = 5, nprobe = 4)
      .groupBy($"qid").agg(max($"rank").as("mx"), count(lit(1)).as("n"))
      .as[(Long, Int, Long)].collect()
    ranks.foreach { case (_, mx, n) => assert(mx == n) }
  }

  test("topKAdc ranks identically to topKOn over the reconstruction") {
    // the production code-only serving plan must return the same rows
    // in the same order as the reconstruction-shipping composition —
    // the ADC ≡ reconstruction contract applied end-to-end
    val pq = Pq.fit(emb, "vec_id", "embedding", m = 16, k = 256)
    val cells = Ivf.fit(emb, "vec_id", "embedding", k = 8, iters = 0)
    val q = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val adc = Ivf.topKAdc(emb, q, "vec_id", "embedding",
        "query_id", "qe", cells, pq, k = 5, nprobe = 4)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    val withRecon = emb.select($"vec_id", $"embedding",
      Pq.reconstruct($"embedding", pq).as("recon"))
    val recon = Ivf.topKOn(withRecon, q, "vec_id", "embedding", "recon",
        "query_id", "qe", cells, k = 5, nprobe = 4)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(adc.nonEmpty)
    assert(adc == recon, "ADC and reconstruction serving plans diverge")
  }

  test("balancedSample: one row per vector, smallest cell fully kept") {
    val model = Ivf.fit(emb, "vec_id", "embedding", k = 8, iters = 2)
    val s = Ivf.balancedSample(emb, "vec_id", "embedding", model)
      .select($"vec_id", $"cell", $"cell_n", $"keep")
      .as[(Long, Int, Int, Boolean)].collect()
    assert(s.length == emb.count(), "sampling must not drop or dup rows")
    assert(s.map(_._1).distinct.length == s.length)
    assert(s.forall { case (_, c, n, _) => c >= 0 && c < 8 && n > 0 })
    // cell_n is consistent per cell and matches the actual population
    val pop = s.groupBy(_._2).view.mapValues(_.length).toMap
    s.foreach { case (_, c, n, _) => assert(n == pop(c)) }
    // the smallest cell's keep rate is target/target = 1: every member
    // survives (hash % n < n always) — the balance anchor
    val minN = pop.values.min
    s.filter(_._3 == minN).foreach { case (id, _, _, keep) =>
      assert(keep, s"vector $id in a smallest cell must be kept")
    }
    // larger cells must actually subsample (kept strictly fewer than
    // population) whenever they are meaningfully bigger than target
    pop.filter(_._2 > 2 * minN).keys.foreach { c =>
      val kept = s.count(r => r._2 == c && r._4)
      assert(kept < pop(c), s"cell $c kept all ${pop(c)} rows")
    }
  }
}
