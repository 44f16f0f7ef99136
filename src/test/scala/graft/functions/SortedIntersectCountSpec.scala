package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SortedIntersectCountSpec extends SparkTestBase {
  import spark.implicits._

  test("merge-walk count matches array_intersect size") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 9L, 11L)),
      (Seq(1L, 2L), Seq(3L, 4L)),
      (Seq.empty[Long], Seq(1L)),
      (Seq(7L), Seq(7L)))
      .toDF("a", "b")
      .select(
        SortedIntersectCount.sorted_intersect_count($"a", $"b").as("fast"),
        size(array_intersect($"a", $"b")).as("ref"))
    df.as[(Int, Int)].collect().foreach { case (fast, ref) =>
      assert(fast == ref)
    }
  }

  test("SQL registration via GraftExtensions.registerTemp") {
    // withExtensions only applies at session construction; the shared
    // test session is already up -> use the runtime registration path
    graft.GraftExtensions.registerTemp(spark)
    val r = spark.sql(
      """SELECT graft_sorted_intersect_count(array(1L,2L,5L), array(2L,5L,9L)) c,
        |       graft_rolling_min_hash('abcdefghij', 8) h,
        |       graft_simhash60(array(7L)) sh,
        |       graft_cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) cs,
        |       graft_hyperplane_pack(array(1.0F, 0.5F), 8) hp,
        |       graft_hyperplane_pack(array(1.0F, 0.5F), 8, 1) hp1,
        |       graft_minhash_bands(array('a','b'), 16, 4) mb,
        |       graft_token_hashes60(array('a','b')) th""".stripMargin)
      .collect()(0)
    assert(r.getInt(0) == 2)
    assert(!r.isNullAt(1))
    assert(r.getLong(2) == 7L)
    assert(r.getDouble(3) == 1.0)
    assert(!r.isNullAt(4) && !r.isNullAt(5))
    assert(r.getLong(4) != r.getLong(5)) // independent table families
    assert(r.getSeq[Long](6).length == 4)
    assert(r.getSeq[Long](7).length == 2)
  }
}
