package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The production retrieval composite the compression ladder implies:
  * stack the measured tiers (binary 8 B → PQ 16 B → float 256 B) into
  * one serving plan instead of choosing one.
  *
  *   1. COARSE: popcount over 64-bit center-thresholded sign codes
  *      (qs26's measured coarse-filter role — a 10% candidate scan
  *      keeps 0.8 of the true top-5 on the test corpus) cuts the
  *      corpus to `coarseK` candidates per query.
  *   2. SHORTLIST: ADC lookup-table scoring over the candidates' PQ
  *      codes (the qs24 scorer — m table lookups per candidate, KB
  *      query-side LUTs) cuts `coarseK` to `shortK`.
  *   3. RE-RANK: fetch the float vectors of the `shortK` survivors
  *      only (an equi-join on id against the float store — the single
  *      place full-width vectors are read) and rank exactly.
  *
  * Scale shape: the scan side of stage 1 carries 8 B codes + 16 B PQ
  * codes per row (both built in ONE corpus pass — the stored serving
  * artifact), queries broadcast; no stage shuffles anything wider than
  * (query, id, code) until the final `shortK`-sized float fetch. The
  * composite's recall is the PRODUCT of its stage retentions — each
  * cut is measured in its own driver row (qs26 coarse 0.8, qs24 ADC
  * 0.85) and qs29 measures the end-to-end point (0.65 at 50→20→5 on
  * the test corpus; widening shortK to coarseK recovers the stage-1
  * ceiling exactly, the property ServingSpec pins).
  */
object Serving {

  /** Stage 1 of [[twoStageTopK]], exposed for plan pinning: the
    * popcount coarse filter as a BOUNDED per-query top-k. The scan
    * side carries (id, 8 B sign code, 16 B PQ codes) against the
    * broadcast query codes — that popcount scan is the design. What
    * must NOT happen is ranking it with a per-query window: that
    * would shuffle all N·|Q| candidate rows on the query id and sort
    * each query's FULL corpus in one task. [[graft.ops.TopK]] replaces
    * the rank — map-side combine folds each task down to ≤ coarseK
    * entries per query before the one |Q|-keyed exchange, the final
    * merge touches ≤ coarseK·P pre-sorted entries, and the plan
    * contains an ObjectHashAggregate and no Window at all (ServingSpec
    * pins both the plan shape and rank-equivalence to the window
    * form). Order inside the aggregate is (dist asc, neighbor asc) —
    * exactly the window form's key, so qs29's oracle is unchanged.
    */
  def binaryCoarseCandidates(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      thresholds: Array[Double], pq: Pq.Model, coarseK: Int): DataFrame = {
    // the stored serving artifact: one corpus pass emits both code
    // columns (24 B/row total); float vectors stay in the base table
    // and are touched again only by the stage-3 fetch
    val art = graft.ops.Partitioning.spread(corpus)
      .select(col(idCol),
        Similarity.signBits(col(vecCol), thresholds).as("bincode"),
        Pq.codes(col(vecCol), pq).as("pqcodes"))
    val qBin = queries.select(col(qIdCol),
      Similarity.signBits(col(qVecCol), thresholds).as("qbin"))
    // carrying the 16-byte pqcodes through the scan (and the bounded
    // buffers) saves stage 2 a corpus join
    val tk = graft.ops.TopK.topK(coarseK)
    art.crossJoin(broadcast(qBin))
      .filter(col(idCol) =!= col(qIdCol))
      .select(col(qIdCol), col(idCol).as("neighbor_id"), col("pqcodes"),
        bit_count(col("bincode").bitwiseXOR(col("qbin"))).as("dist"))
      .groupBy(col(qIdCol))
      .agg(tk(col("dist").cast("double"), lit(0L), col("neighbor_id"),
        col("pqcodes")).as("tk"))
      .select(col(qIdCol), explode(col("tk")).as("e"))
      .select(col(qIdCol), col("e.id").as("neighbor_id"),
        col("e.pay").as("pqcodes"))
  }

  /** Binary-prefilter → ADC-shortlist → exact-re-rank top-k.
    *
    * @param thresholds per-dim centering thresholds
    *                   ([[Similarity.signThresholds]])
    * @param pq         PQ codebooks ([[Pq.fit]])
    * @param coarseK    stage-1 popcount candidates per query
    * @param shortK     stage-2 ADC survivors per query (<= coarseK)
    */
  def twoStageTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      thresholds: Array[Double], pq: Pq.Model,
      k: Int, coarseK: Int, shortK: Int): DataFrame = {
    require(k <= shortK && shortK <= coarseK,
      s"need k <= shortK <= coarseK, got $k / $shortK / $coarseK")
    val qTabs = Pq.withAdcTables(queries, qIdCol, qVecCol, pq)
      .select(col(qIdCol), col("adc_lut"), col("adc_qnsq"))
    // stage 1: one popcount per (corpus row, query), bounded top-k
    // per query via map-side-combining aggregate — never a window
    val coarse = binaryCoarseCandidates(corpus, queries,
      idCol, vecCol, qIdCol, qVecCol, thresholds, pq, coarseK)
    // stage 2: ADC fold over the candidates only — same scorer, same
    // tie order ((cosine desc, id)) as the qs24 serving plan
    val wShort = Window.partitionBy(col(qIdCol))
      .orderBy(col("adc_cosine").desc, col("neighbor_id"))
    val short = coarse.join(broadcast(qTabs), qIdCol)
      .select(col(qIdCol), col("neighbor_id"),
        Pq.adcCosine(col("pqcodes"), col("adc_lut"), col("adc_qnsq"), pq)
          .as("adc_cosine"))
      .withColumn("srank", row_number().over(wShort))
      .filter(col("srank") <= shortK)
    // stage 3: the only full-width read — fetch shortK float vectors
    // per query by equi-join (AQE broadcasts the shortlist side) and
    // rank exactly
    val floats = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("__nvec"))
    val qFloat = queries.select(col(qIdCol), col(qVecCol))
    val wFinal = Window.partitionBy(col(qIdCol))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    short.select(col(qIdCol), col("neighbor_id"))
      .join(floats, "neighbor_id")
      .join(broadcast(qFloat), qIdCol)
      .select(col(qIdCol), col("neighbor_id"),
        Similarity.cosine(col("__nvec"), col(qVecCol)).as("cosine"))
      .withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= k)
  }
}
