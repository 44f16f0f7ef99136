package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PackSpec extends SparkTestBase {
  import spark.implicits._

  test("cumsum packing: bins fill in order, straddlers keep their start bin") {
    // single shard so the layout is one deterministic stream
    val docs = Seq(
      (1L, 40L), (2L, 40L), (3L, 10L), (4L, 100L), (5L, 4L))
      .toDF("doc_id", "len")
    val out = Pack.packBins(docs, "doc_id", col("len"),
        binTokens = 64, shards = 1)
      .select($"doc_id", $"shard", $"bin", $"bin_offset")
      .as[(Long, Int, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.values.forall(_._1 == 0))
    // stream order is (hash60(id), id): recompute it the same way
    val order = docs.select($"doc_id",
        TextOps.hash60($"doc_id".cast("string")).as("h"))
      .as[(Long, Long)].collect()
      .sortBy { case (id, h) => (h, id) }.map(_._1)
    val lens = Map(1L -> 40L, 2L -> 40L, 3L -> 10L, 4L -> 100L, 5L -> 4L)
    var cum = 0L
    order.foreach { id =>
      val start = cum
      val bin = start / 64
      assert(out(id) == ((0, bin, start - bin * 64)), s"doc $id")
      cum += lens(id)
    }
  }

  test("shards pack independently and partition the corpus") {
    val docs = (1L to 200L).map(i => (i, 7L)).toDF("doc_id", "len")
    val out = Pack.packBins(docs, "doc_id", col("len"),
        binTokens = 64, shards = 8)
      .select($"doc_id", $"shard", $"bin", $"bin_offset", $"n_tok")
      .as[(Long, Int, Long, Long, Long)].collect()
    assert(out.length == 200)
    assert(out.map(_._2).distinct.sorted.forall(s => s >= 0 && s < 8))
    // within each shard, offsets restart and stay under the budget
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.exists(r => r._3 == 0L && r._4 == 0L)) // stream starts at 0
      rows.foreach { r => assert(r._4 >= 0 && r._4 < 64) }
    }
  }

  // deterministic per-doc id arrays for the packSequences pins: doc i
  // carries (i*7+1) % 23 + 1 tokens of value i*1000+j — every id is
  // globally unique, so sequence equality checks are exact
  private def seqFixture(n: Int) = {
    val rows = (1L to n.toLong).map { i =>
      val len = ((i * 7 + 1) % 23 + 1).toInt
      (i, (0 until len).map(j => (i * 1000 + j).toInt))
    }
    (rows, rows.toDF("doc_id", "ids"))
  }

  test("packSequences: exact chop — interior bins full, conservation, " +
      "per-shard stream equality") {
    val (rows, docs) = seqFixture(60)
    val L = 16
    val out = Pack.packSequences(docs, "doc_id", col("ids"),
        binTokens = L, shards = 4)
      .select($"shard", $"bin", $"n_docs", $"n_tok", $"ids")
      .as[(Int, Long, Int, Int, Seq[Int])].collect()
    // every bin's payload length is its n_tok; interior bins exactly L
    out.groupBy(_._1).foreach { case (_, bins) =>
      val maxBin = bins.map(_._2).max
      bins.foreach { b =>
        assert(b._5.length === b._4)
        if (b._2 != maxBin) assert(b._4 === L, s"bin ${b._2} ragged")
        else assert(b._4 <= L)
      }
    }
    // conservation
    assert(out.map(_._4.toLong).sum === rows.map(_._2.length.toLong).sum)
    // per-shard: bins concatenated in bin order == docs concatenated in
    // the (hash60, id) stream order — the loader's replay contract
    val hs = docs.select($"doc_id",
        TextOps.hash60($"doc_id".cast("string")).as("h"))
      .as[(Long, Long)].collect().toMap
    val idsOf = rows.toMap
    out.groupBy(_._1).foreach { case (shard, bins) =>
      val got = bins.sortBy(_._2).flatMap(_._5).toSeq
      val want = rows.map(_._1)
        .filter(id => (hs(id) % 4).toInt == shard)
        .sortBy(id => (hs(id), id))
        .flatMap(idsOf)
      assert(got === want, s"shard $shard stream mismatch")
    }
    // n_docs: straddlers are counted in EVERY bin they touch
    val nDocsTotal = out.map(_._3.toLong).sum
    assert(nDocsTotal >= 60)
  }

  test("packSequences: zero-token docs drop; result is partitioning-" +
      "invariant") {
    val (_, docs) = seqFixture(40)
    val withEmpty = docs.union(
      Seq((9999L, Seq.empty[Int])).toDF("doc_id", "ids"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Pack.packSequences(df, "doc_id", col("ids"), binTokens = 16,
          shards = 4)
        .select($"shard", $"bin", $"n_docs", $"n_tok", $"ids")
        .as[(Int, Long, Int, Int, Seq[Int])].collect().sortBy(r => (r._1, r._2))
    val base = run(docs)
    assert(run(withEmpty) === base) // the empty doc contributes nothing
    assert(run(withEmpty.repartition(7)) === base)
  }
}
