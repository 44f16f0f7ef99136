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
}
