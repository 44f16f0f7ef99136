package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins [[Drift.triangular]]'s arithmetic on hand-computable
  * histograms: the exact term values and fold order, the both-zero
  * bin, the identical-distribution zero, the disjoint-support bound
  * of 2, and the arity guard.
  */
class DriftSpec extends SparkTestBase {

  import spark.implicits._

  private def d(counts: Seq[Long], ref: Array[Double]): Double = {
    val cols = counts.indices.map(i => lit(counts(i)))
    Seq(1).toDF("one")
      .select(Drift.triangular(cols, lit(counts.sum), ref).as("d"))
      .as[Double].collect().head
  }

  test("matches the hand computation, left-associated") {
    // counts (6, 2, 0, 0) of 8 vs ref (0.5, 0.5, 0, 0):
    // t0 = (0.75-0.5)^2/1.25, t1 = (0.25-0.5)^2/0.75, t2 = t3 = 0
    val t0 = (0.75 - 0.5) * (0.75 - 0.5) / (0.75 + 0.5)
    val t1 = (0.25 - 0.5) * (0.25 - 0.5) / (0.25 + 0.5)
    val want = ((t0 + t1) + 0.0) + 0.0
    assert(d(Seq(6L, 2L, 0L, 0L), Array(0.5, 0.5, 0.0, 0.0)) == want)
  }

  test("identical distributions measure exactly zero") {
    assert(d(Seq(2L, 2L, 4L), Array(0.25, 0.25, 0.5)) == 0.0)
  }

  test("disjoint supports hit the statistic's bound of 2") {
    // p lives entirely in bin 0, q entirely in bin 1:
    // t0 = 1/1, t1 = 1/1 -> D = 2 (the f-divergence's maximum)
    assert(d(Seq(8L, 0L), Array(0.0, 1.0)) == 2.0)
  }

  test("a bin empty on BOTH sides contributes exactly 0, never NaN") {
    val got = d(Seq(4L, 0L), Array(1.0, 0.0))
    assert(!got.isNaN && got == 0.0)
  }

  test("bin-arity mismatch is rejected") {
    intercept[IllegalArgumentException] {
      Drift.triangular(Seq(lit(1L)), lit(1L), Array(0.5, 0.5))
    }
  }
}
