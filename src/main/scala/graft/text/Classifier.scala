package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine TRAINED hashed-BOW quality classifier — closes the one
  * "train it, don't import it" gap the quality stack had left: qt28's
  * serving shape ([[TextOps.hashedClassifierScore]]) ran a documented
  * STUB weight vector; this trains the real one, distributed, and the
  * stub becomes a spec fixture. The published shape is the
  * GPT-3/CCNet quality classifier (a linear model over hashed n-gram
  * features deciding keep/drop per document); here the training
  * LABELS distill a closed-form Gopher-style stopword-rate rule —
  * the standard bootstrap when no curated positive set exists, and
  * the only label a cross-engine-exact oracle can recompute.
  *
  * Training is K batch-gradient-descent steps of logistic regression,
  * engineered for the two contracts every trained-model row in this
  * repo carries:
  *
  *  - DISTRIBUTED: each step is one map-side-combinable aggregate
  *    (explode bucket → sum) whose exchange width is bounded by the
  *    distinct-token bucket count, never the corpus; the weight
  *    update touches a dim-bounded table on the driver (the Ivf/Pq
  *    model-fit collect class). K passes over the corpus is the
  *    textbook cost of batch GD — at 100 TB you persist the prepared
  *    (y, buckets, n) projection once and pay K slim scans, no
  *    per-step re-tokenization.
  *  - EXACT CROSS-ENGINE: the per-bucket gradient sum is accumulated
  *    as floor(g·2^32) fixed-point longs (order-independent BY
  *    CONSTRUCTION — the NgramLm device), the sigmoid is the rational
  *    Elliott curve 0.5·(1 + m/(1+|m|)) because the logistic exp() is
  *    barred by the measured libm/StrictMath divergence (SCALING.md
  *    log doctrine; every operation here is a single IEEE op), and
  *    the learning rate is a power of two so the weight update's
  *    scaling is exact. The DuckDB oracle replays all K steps as an
  *    unrolled materialized-CTE chain (the qs11/qt39 precedent) and
  *    matches bit-for-bit.
  *
  * Measured on the bench corpus (eta=128, K=8, dim=4096): training
  * accuracy 0.928 at sf0.01 / 0.816 at sf0.001 from the 0.48 all-zero
  * baseline — the rule is linearly separable in BOW-frequency space
  * (stop-ratio ≥ 3/50 ⟺ Σ_stop x_b − (3/50)·Σ_all x_b ≥ 0), so GD
  * genuinely converges and the gate genuinely trips.
  */
object Classifier {

  /** The engine-wide fixed-point scale ([[TextOps.FixedPoint]]). */
  val FixedPoint: Double = TextOps.FixedPoint

  /** Rational (Elliott 1993, "fast sigmoid") S-curve
    * 0.5·(1 + m/(1+|m|)): same range/monotonicity as the logistic,
    * but abs/add/div/mul are each single IEEE ops — bit-identical in
    * Spark and DuckDB, where exp() is not (SCALING.md log doctrine).
    */
  def elliott(m: Column): Column =
    lit(0.5) + lit(0.5) * (m / (lit(1.0) + abs(m)))

  /** The integer-exact Gopher-ish label rule: stopword count /
    * tokens ≥ 3/50, kept as 50·stops ≥ 3·n so no float threshold
    * exists for two engines to disagree on. This is the rule qt46
    * distills into weights and the target-slice definition qt47
    * resamples toward.
    */
  def stopwordLabel(toks: Column): Column =
    lit(50) * size(filter(toks, t => t.isin(TextOps.EnStopwords: _*))) >=
      lit(3) * size(toks)

  /** The doc-keyed training projection: integer-exact label y
    * ([[stopwordLabel]]), hashed-token bucket array bs (the qt28
    * salt, so the trained vector is drop-in for
    * [[TextOps.hashedClassifierScore]]), and token count n. Callers
    * persist this — it is consumed K+1 times.
    */
  def prepareQuality(docs: DataFrame, textCol: String, idCol: String,
      dim: Int = 4096, salt: String = "qc",
      carry: Seq[String] = Nil): DataFrame = {
    // `carry` threads caller columns through the projection unchanged
    // (a composite like qst23's admission stream prepares the SAME
    // y/n/bs features mid-pipeline without losing its verdict flags);
    // the feature expressions stay byte-identical either way
    require(carry.intersect(Seq("y", "n", "bs", "toks", idCol)).isEmpty &&
      carry.distinct.size == carry.size,
      s"carry collides with the projection's own output columns " +
        s"(y, n, bs, toks, $idCol) or repeats a name: " +
        carry.mkString(", "))
    docs.select(col(idCol) +: carry.map(col) :+
        TextOps.tokens(col(textCol)).as("toks"): _*)
      .select(col(idCol) +: carry.map(col) :+
        when(stopwordLabel(col("toks")), lit(1)).otherwise(lit(0))
          .cast("int").as("y") :+
        size(col("toks")).as("n") :+
        transform(graft.functions.TokenHashes60.token_hashes60(
            transform(col("toks"), t => concat(lit(salt + ":"), t))),
          h => (h % dim).cast("int")).as("bs"): _*)
  }

  /** Margin w·x over a bucket array: the [[TextOps
    * .hashedClassifierScore]] serving fold verbatim — 0.0-seeded
    * left-to-right accumulate of plan-literal weight lookups, divided
    * by the token count — just indexed by the precomputed bucket
    * instead of re-hashing the token (elementwise-identical values in
    * identical order, so the two folds are bit-equal;
    * ClassifierSpec pins that equivalence, which is what makes the
    * trained vector drop-in for qt28's serving shape).
    */
  def margin(bs: Column, n: Column, weights: Array[Double]): Column = {
    // ONE Literal node, not a 4096-child CreateArray: the values and
    // the element_at lookups are identical, but analysis/optimization/
    // codegen walk a single node — material when the expression is
    // re-planned per GD step (trainQuality re-plans K times)
    val wLit = typedlit(weights)
    aggregate(bs, lit(0.0), (acc, b) => acc + element_at(wLit, b + 1)) /
      n.cast("double")
  }

  /** K batch-gradient steps over a prepared (y, n, bs) table; returns
    * the trained weight vector. The (y, n, bs) projection is
    * materialized ONCE as a persisted primitive RDD; each step is one
    * `treeAggregate` into a dim-sized exact-long gradient array —
    * full map-side aggregation (guide §2.3: only dim·8 bytes per
    * partition cross the network, never the exploded gram stream),
    * no per-step Catalyst re-plan, no explode, no exchange, no AQE
    * micro-stages (measured: the previous explode→groupBy→collect
    * form paid ~0.2-0.3 s of planning plus 2 AQE jobs per step, ×8
    * steps × ~7 trains across the bench). The weight update
    * w_b += eta·((g/2^32)/N) stays on the driver — dim-bounded.
    *
    * BIT-EQUALITY (the oracle's unrolled-CTE contract): every per-doc
    * float op is the same IEEE op in the same order as the previous
    * Catalyst form and the DuckDB chain — margin = 0.0-seeded
    * left-to-right sum of w(b) over bs, / n; Elliott
    * 0.5 + 0.5·(m/(1+|m|)); q = floor(((y−p)/n)·2^32) cast long
    * (NaN→0, ±Inf→Long.{Min,Max} — .toLong matches Catalyst's cast);
    * per-bucket sums are exact longs, order-independent by
    * construction. Untouched buckets keep w verbatim (the oracle's
    * NULL-gradient arm); a touched bucket with g = 0 adds +0.0,
    * which is bit-identical to w because no update can produce -0.0
    * — so the g ≠ 0 guard below covers both cases exactly.
    * eta MUST be a power of two (exact scaling); step 0's
    * probability is exactly 0.5 (all-zero weights), so the first
    * step skips the margin fold entirely.
    */
  def trainQuality(prepared: DataFrame, dim: Int = 4096,
      eta: Double = 128.0, steps: Int = 8): Array[Double] = {
    require(eta > 0 && java.lang.Double.isFinite(eta) &&
      (java.lang.Double.doubleToLongBits(eta) & 0xfffffffffffffL) == 0L,
      s"eta must be a finite power of two for an exact weight update, " +
        s"got $eta")
    import prepared.sparkSession.implicits._
    // one slim deserialized materialization; K pure-compute passes
    // (the documented 100 TB posture: persist the prepared projection
    // once, pay K slim scans, never re-tokenize)
    val feats = prepared
      .select(col("y").as("_1"), col("n").as("_2"), col("bs").as("_3"))
      .as[(Int, Int, Array[Int])].rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nRows = feats.count()
      // Loud Long-range guard on the fixed-point gradient accumulate
      // (the Dsir rMax / Mixture wsum discipline): each occurrence
      // contributes floor((y−p)/n · 2^32) and a doc holds ≤ n
      // occurrences, so a bucket's exact-long sum is bounded by
      // nDocs · 2^32 — at nDocs ≥ 2^31 it can wrap, and the two engines
      // diverge silently (Spark wraps, DuckDB raises). Train on a
      // bounded sample (the CCNet posture — a quality classifier does
      // not need the whole corpus) past that bound.
      require(nRows < (1L << 31),
        s"$nRows training docs: the floor(g*2^32) per-bucket gradient " +
          "sum risks Long overflow at nDocs >= 2^31 - train on a sample")
      val nDocs = nRows.toDouble
      val w = Array.fill(dim)(0.0)
      var step = 0
      while (step < steps) {
        val isFirst = step == 0
        // snapshot for closure capture: tasks must see the step's
        // weights, never a concurrently-updated array
        val wStep = w.clone()
        val grad = feats.treeAggregate(new Array[Long](dim))(
          seqOp = { (acc, row) =>
            val (y, n, bs) = row
            val nD = n.toDouble
            val p = if (isFirst) 0.5
              else {
                var m = 0.0
                var i = 0
                while (i < bs.length) { m += wStep(bs(i)); i += 1 }
                m = m / nD
                0.5 + 0.5 * (m / (1.0 + math.abs(m)))
              }
            val q = math.floor((y.toDouble - p) / nD * FixedPoint).toLong
            var i = 0
            while (i < bs.length) { acc(bs(i)) += q; i += 1 }
            acc
          },
          combOp = { (a, b) =>
            var i = 0
            while (i < dim) { a(i) += b(i); i += 1 }
            a
          })
        var b = 0
        while (b < dim) {
          if (grad(b) != 0L)
            w(b) = w(b) + eta * (grad(b).toDouble / FixedPoint / nDocs)
          b += 1
        }
        step += 1
      }
      w
    } finally feats.unpersist()
  }
}
