package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The measured scale path of qt21_lang_quantile_trim: the driver query
  * uses exact `percentile` (oracle-able bit-for-bit against DuckDB's
  * `quantile_cont`), whose per-group sort state is one language's
  * values — fine at bench scale, unbounded at 100 TB. The documented
  * swap-in is `approx_percentile` (Greenwald-Khanna, bounded sketch
  * state, same plan shape). This spec MEASURES the contract of that
  * swap on the real testdata instead of assuming it: GK guarantees the
  * returned value's RANK is within n/accuracy of the target rank.
  */
class LangTrimScaleSpec extends SparkTestBase {
  import spark.implicits._

  test("approx_percentile per language honors its rank-error contract") {
    val acc = 100
    val d = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
      .select($"lang", $"n_chars".cast("double").as("v"))
    val cuts = d.groupBy($"lang").agg(
      expr(s"approx_percentile(v, 0.2, $acc)").as("ap"),
      count(lit(1)).as("n"))
    val ranks = d.join(broadcast(cuts), "lang")
      .groupBy($"lang")
      .agg(first($"n").as("n"),
        sum(when($"v" <= $"ap", 1L).otherwise(0L)).as("rank_ap"))
      .as[(String, Long, Long)].collect()
    assert(ranks.length >= 2, "expected several languages in testdata")
    ranks.foreach { case (lang, n, rank) =>
      val err = math.abs(rank - 0.2 * n)
      assert(err <= n.toDouble / acc + 1,
        s"lang=$lang: approx rank $rank vs target ${0.2 * n} (n=$n) " +
          s"breaks the n/$acc GK bound")
    }
  }
}
