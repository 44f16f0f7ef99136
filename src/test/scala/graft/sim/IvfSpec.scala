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
}
