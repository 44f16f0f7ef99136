package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SimilaritySpec extends SparkTestBase {

  private lazy val e = spark.read
    .parquet("/root/testdata/sf0.01/embeddings.parquet")
  private lazy val q = e.filter(col("vec_id") < 8)
    .select(col("vec_id").as("query_id"), col("embedding").as("qe"))

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("multi-table LSH recall dominates single-table") {
    val brute = pairs(Similarity.bruteTopK(
      e, q, "vec_id", "embedding", "query_id", "qe", k = 5))
    val single = pairs(Similarity.lshTopK(
      e, q, "vec_id", "embedding", "query_id", "qe", k = 5, planes = 6))
    // these embeddings are weakly correlated (top cosines ~0.3), so the
    // per-plane agreement p is near 0.5 — recall needs shorter codes and
    // more tables: ~1-(1-p^4)^8
    val multi = pairs(Similarity.lshTopKMulti(
      e, q, "vec_id", "embedding", "query_id", "qe", k = 5, planes = 4, tables = 8))
    val rSingle = (single & brute).size.toDouble / brute.size
    val rMulti = (multi & brute).size.toDouble / brute.size
    assert(rMulti >= rSingle, s"multi $rMulti < single $rSingle")
    assert(rMulti >= 0.4, s"multi-table recall too low: $rMulti")
  }

  test("LSH near-dup pairs: subset of brute pairs, identical cosines, decent recall") {
    val brute = Similarity.brutePairs(e, "vec_id", "embedding", threshold = 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshNearDupPairs(e, "vec_id", "embedding",
        threshold = 0.45, planes = 4, tables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // no false positives: every emitted pair is a true above-threshold
    // pair and its cosine is the exact value (same codegen kernel)
    lsh.foreach { case (pair, cos) =>
      assert(brute.contains(pair), s"false positive $pair")
      assert(brute(pair) === cos, s"cosine mismatch on $pair")
    }
    val recall = lsh.size.toDouble / brute.size
    assert(recall >= 0.5, s"near-dup recall too low: $recall (${lsh.size}/${brute.size})")
  }

  test("multi-table candidates are deduped: at most k rows per query") {
    val multi = Similarity.lshTopKMulti(
      e, q, "vec_id", "embedding", "query_id", "qe", k = 5, planes = 4, tables = 8)
    val counts = multi.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n"), countDistinct(col("neighbor_id")).as("d"))
      .collect()
    counts.foreach { r =>
      assert(r.getLong(1) <= 5)
      assert(r.getLong(1) === r.getLong(2))
    }
  }
}
