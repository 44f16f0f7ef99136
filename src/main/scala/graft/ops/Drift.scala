package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Distribution-drift statistics over FIXED-arity histograms — the
  * monitoring layer's arithmetic (qst19's streamed quality-drift
  * monitor; reusable against any binned score/occupancy histogram).
  *
  * Triangular discrimination Σ_k (p_k − q_k)² / (p_k + q_k) is the
  * RATIONAL member of the f-divergence family: KL and PSI need log(),
  * which the measured libm/StrictMath divergence bars from any oracled
  * value path (SCALING.md log doctrine), while this statistic is
  * add/sub/mul/div only — every term a handful of single IEEE ops that
  * reproduce bit-for-bit in any engine. It is bounded in [0, 2],
  * symmetric, and zero iff the distributions match — the same
  * monotone "how far did the histogram move" signal PSI gives.
  *
  * Because the bin count is FIXED and small, no fixed-point device is
  * needed: the K-term sum is emitted as an explicit LEFT-ASSOCIATED
  * expression (((t0 + t1) + t2) + …), making the fold order part of
  * the cross-engine contract — the oracle writes the same chain
  * (`t0 + t1 + …` is left-associative in SQL). Cross-ROW sums of
  * unbounded arity stay on the floor(x·2^32) exact-long device.
  */
object Drift {

  /** Σ_k (p_k − q_k)² / (p_k + q_k) where p_k = counts(k)/n and q_k
    * is the frozen reference distribution (ref sums to 1; a
    * model-fit-sized driver collect embedded as literals — the
    * qt28/centroidsLit class). Bins where both sides are zero
    * contribute exactly 0.0. `counts` are the per-bin count columns
    * of ONE histogram row; `n` its total.
    */
  def triangular(counts: Seq[Column], n: Column,
      ref: Array[Double]): Column = {
    require(counts.length == ref.length,
      s"bin arity mismatch: ${counts.length} count columns vs " +
        s"${ref.length} reference bins")
    val nd = n.cast("double")
    val terms = counts.zip(ref).map { case (c, qk) =>
      val p = c.cast("double") / nd
      val q = lit(qk)
      when(p + q > lit(0.0), (p - q) * (p - q) / (p + q))
        .otherwise(lit(0.0))
    }
    terms.reduce(_ + _)
  }
}
