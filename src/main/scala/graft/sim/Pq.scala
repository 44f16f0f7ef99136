package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.NearestCell

/** Product quantization — the production ANN compression beyond int8:
  * split each vector into `m` contiguous subspaces, learn a tiny
  * per-subspace codebook, and store each vector as `m` small code ids
  * (here 64 floats → 4 bytes at m=4, k=8). Serving scores queries
  * against the RECONSTRUCTION (codebook entry per subspace,
  * concatenated) — for L2 this is exactly the classic ADC lookup-table
  * sum, since ||q - x̂||² = Σ_j ||q_j - x̂_j||², and for cosine the
  * same reconstruction dot product.
  *
  * Scale shape (the point at 100 TB): codebooks are m·k·subDim doubles
  * — KBs — living in the plan as literals; encode and reconstruct are
  * per-row expressions riding the corpus scan (the per-subspace
  * nearest-code search is the same codegen [[NearestCell]] kernel the
  * IVF path uses, over a `slice` of the vector), so building the
  * compressed representation is map-only with no shuffle and no
  * driver-side corpus state.
  *
  * Determinism (the QueryDef contract): the fit is the seed-codebook
  * analogue of [[Ivf.fit]] with iters=0 — codebook j is the j-th
  * subvectors of the k lowest-id vectors, verbatim. Reconstruction
  * values are therefore original float32 corpus values (exactly
  * representable — no Lloyd averaging), which keeps the whole
  * encode → reconstruct → score chain closed-form in SQL. A
  * Lloyd-refined fit composes exactly like qs11/qs14's unrolled
  * oracle layers if wanted; the serving-path semantics measured here
  * do not depend on it.
  */
object Pq {

  /** Per-subspace codebooks: codebooks(j)(c) is the c-th code vector
    * of subspace j, length `subDim`.
    */
  case class Model(subDim: Int, codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def k: Int = codebooks.head.length
  }

  /** Seed-codebook fit: codebook j = the j-th subvectors of the `k`
    * lowest-id corpus vectors (deterministic, driver-sized — k full
    * vectors). Requires the dimension to split evenly into `m`.
    */
  def fit(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int): Model = {
    require(m >= 1 && k >= 1, s"need m, k >= 1, got m=$m k=$k")
    val spark = corpus.sparkSession
    import spark.implicits._
    val sample = corpus.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .orderBy(col(idCol)).limit(k).collect()
    require(sample.length >= k, s"need >= $k vectors to fit, got ${sample.length}")
    val dim = sample.head._2.length
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val subDim = dim / m
    val books = Array.tabulate(m) { j =>
      sample.map { case (_, v) =>
        v.slice(j * subDim, (j + 1) * subDim).map(_.toDouble)
      }
    }
    Model(subDim, books)
  }

  /** Lloyd-refined fit: seed codebooks ([[fit]]) refined by `iters`
    * k-means steps per subspace over a bounded sample (the `maxSample`
    * lowest-id vectors — deterministic, same contract as
    * [[Ivf.fit]]). Arithmetic mirrors Ivf.fit exactly so the oracle
    * can unroll it in SQL the qs11/qs14 way, per subspace: sequential
    * id-ordered float-into-double sums, one divide per dim, empty
    * codes keep their previous centroid.
    */
  def fitLloyd(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int, maxSample: Int = 4096): Model = {
    require(m >= 1 && k >= 1 && iters >= 0,
      s"need m, k >= 1 and iters >= 0, got m=$m k=$k iters=$iters")
    val spark = corpus.sparkSession
    import spark.implicits._
    val sample = corpus.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .orderBy(col(idCol)).limit(maxSample).collect()
    require(sample.length >= k, s"need >= $k vectors to fit, got ${sample.length}")
    val dim = sample.head._2.length
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val subDim = dim / m
    val books = Array.tabulate(m) { j =>
      val subs = sample.map { case (_, v) =>
        v.slice(j * subDim, (j + 1) * subDim)
      }
      var cents = subs.take(k).map(_.map(_.toDouble))
      (0 until iters).foreach { _ =>
        val sums = Array.fill(k)(new Array[Double](subDim))
        val counts = new Array[Int](k)
        subs.foreach { v =>
          val c = cents.indices.minBy(ci => (Ivf.l2sq(cents(ci), v), ci))
          counts(c) += 1
          var i = 0
          while (i < subDim) { sums(c)(i) += v(i); i += 1 }
        }
        cents = cents.indices.map { c =>
          if (counts(c) == 0) cents(c)
          else sums(c).map(_ / counts(c))
        }.toArray
      }
      cents
    }
    Model(subDim, books)
  }

  /** The `m` code ids of `vec` (array<int>, one nearest-code search
    * per subspace — each a codegen [[NearestCell]] over a slice).
    */
  def codes(vec: Column, model: Model): Column =
    array((0 until model.m).map { j =>
      NearestCell.nearest_cell(
        slice(vec, j * model.subDim + 1, model.subDim),
        model.codebooks(j))
    }: _*)

  /** The PQ reconstruction x̂ of `vec`: per subspace, the chosen code
    * vector (a literal-array lookup), concatenated back to full
    * dimension. Scoring queries against x̂ IS ADC for L2/dot.
    */
  def reconstruct(vec: Column, model: Model): Column = {
    val parts = (0 until model.m).map { j =>
      val book = array(model.codebooks(j).map(code =>
        array(code.map(x => lit(x.toFloat)): _*)): _*)
      element_at(book,
        NearestCell.nearest_cell(
          slice(vec, j * model.subDim + 1, model.subDim),
          model.codebooks(j)) + 1)
    }
    concat(parts: _*)
  }

  /** Corpus compressed for serving: (idCol, vecCol = reconstruction).
    * Drop-in for any scorer that took the float corpus.
    */
  def reconstructed(corpus: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame =
    graft.ops.Partitioning.spread(corpus)
      .select(col(idCol), reconstruct(col(vecCol), model).as(vecCol))
}
