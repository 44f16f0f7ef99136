package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.storage.StorageLevel

import graft.functions.WordNgramHashes
import graft.ops.Partitioning.spread

/** Train/eval n-gram decontamination — the GPT-3 appendix-C / Pile-style
  * overlap check a training pipeline runs before every release: flag
  * each training document that shares at least `minShared` distinct
  * word n-grams with ANY document of a held-out eval set, so
  * benchmark answers cannot leak into the training corpus.
  *
  * Scale design: per-doc distinct gram hashes come from the codegen
  * [[graft.functions.WordNgramHashes]] pass (60-bit md5-derived hashes,
  * engine-portable); candidates are an equi-join on the gram hash —
  * never a cross join — so shuffle volume is bounded by posting sizes.
  * The eval side is a fixed benchmark set, orders of magnitude smaller
  * than the corpus: it is deduped to a bare gram-hash column (8
  * bytes/gram) and broadcast by default. At lake scale pass
  * `broadcastEval = false` and the join shuffles on the hash instead.
  */
object Decontaminate {

  def contaminated(train: DataFrame, eval: DataFrame,
      textCol: String, idCol: String, n: Int = 8, minShared: Int = 1,
      broadcastEval: Boolean = true): DataFrame = {
    val tg = spread(train).select(col(idCol).as("train_id"),
      explode(WordNgramHashes.word_ngram_hashes(col(textCol), n)).as("g"))
    val eg = eval
      .select(explode(
        WordNgramHashes.word_ngram_hashes(col(textCol), n)).as("g"))
      .distinct()
    val egSide = if (broadcastEval) broadcast(eg) else eg
    // tg rows are distinct per (train_id, gram) — WordNgramHashes
    // dedups within the doc — so the post-join count IS the number of
    // distinct shared grams.
    tg.join(egSide, "g")
      .groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
      .filter(col("n_shared_grams") >= minShared)
  }

  /** Bloom pre-filtered lake decontamination — the third point on the
    * eval-size ladder. Broadcast JOIN ([[contaminated]] default) needs
    * the full eval gram TABLE on every executor; the shuffle arm
    * (`broadcastEval = false`) pays a full exchange of every corpus
    * gram. When the eval set outgrows the broadcast-join budget but its
    * Bloom SKETCH (bits, not rows — ~1.2 MB per million grams at 1%
    * fpp) still fits in a task, probe-side grams are pre-filtered by
    * Spark's native codegen [[BloomFilterMightContain]] BEFORE the
    * exchange, so the shuffle carries only true matches plus the fpp
    * margin instead of the whole corpus. The exact equi-join then
    * verifies survivors: false positives cannot reach the result and a
    * Bloom filter has no false negatives, so the output is
    * bit-identical to [[contaminated]] — which is why the driver oracle
    * (qt15) is the same SQL as qt9/qt13.
    *
    * EAGER construction — unlike every other operator in this library,
    * which returns a fully lazy plan, building this DataFrame RUNS two
    * Spark jobs up front (the eval-gram `count()` sizing the sketch and
    * the `bloomFilter` aggregation building it): the sketch must exist
    * as a plan literal before the probe-side filter can be planned.
    * Compose it accordingly (build once, reuse the returned plan), and
    * mind the cache lifecycle: the deduped eval gram table is persisted
    * (it is consumed by the sketch build AND the verify join); the
    * caller releases it after consuming the returned plan
    * (`spark.catalog.clearCache()`, as Bench does per query) — skipping
    * that leaks the cached gram table for the session's lifetime.
    *
    * `maxBits` caps the sketch (default 2^29 bits = 64 MiB, the same
    * order as Spark's own runtime-filter cap): past the gram count
    * where `fpp` would need more bits, the filter keeps its size and
    * the EFFECTIVE fpp degrades instead — more rows survive to the
    * verify join, never a wrong result. Without the cap a ~10^9-gram
    * eval side at 1% fpp would materialize a ~1.2 GB plan literal.
    */
  def contaminatedBloom(train: DataFrame, eval: DataFrame,
      textCol: String, idCol: String, n: Int = 8, minShared: Int = 1,
      fpp: Double = 0.01, maxBits: Long = 1L << 29): DataFrame = {
    val tg = spread(train).select(col(idCol).as("train_id"),
      explode(WordNgramHashes.word_ngram_hashes(col(textCol), n)).as("g"))
    val eg = eval
      .select(explode(
        WordNgramHashes.word_ngram_hashes(col(textCol), n)).as("g"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nGrams = math.max(eg.count(), 1L)
    val optimalBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(nGrams, fpp)
    val sketch = eg.stat.bloomFilter("g", nGrams,
      math.min(optimalBits, maxBits))
    val bytes = {
      val baos = new java.io.ByteArrayOutputStream()
      sketch.writeTo(baos)
      baos.toByteArray
    }
    val mightContain = ColumnBridge.column(BloomFilterMightContain(
      Literal(bytes), ColumnBridge.expression(col("g"))))
    tg.filter(mightContain)
      .join(eg, "g")
      .groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
      .filter(col("n_shared_grams") >= minShared)
  }

  /** EXACT-substring decontamination — the suffix-array-class check the
    * n-gram family approximates (cf. Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better": exact substring
    * matching at a token threshold is the published standard for
    * train/eval hygiene). For every (train, eval) document pair
    * sharing any `anchor`-token run, reports the EXACT length of their
    * longest shared token run — so "no shared substring ≥ W tokens"
    * is enforced by `max_run_tok >= W` with `anchor <= W`, and the
    * audit sees true overlap lengths, not a fixed-n yes/no.
    *
    * Bucketed anchor-and-extend — NEVER all-pairs, never a corpus
    * sort: (1) POSITIONAL anchor grams ([[graft.functions
    * .WordNgramHashesPos]], one codegen pass) on both sides; (2) the
    * anchor equi-join (eval side benchmark-sized → broadcast by
    * default; `broadcastEval = false` shuffles on the hash at lake
    * scale) yields matches only — a shared run of length L ≥ anchor
    * contains exactly L−anchor+1 consecutive shared anchors, and every
    * shared anchor lies inside a shared run, so the join IS the
    * candidate set, complete by construction; (3) runs are recovered
    * relationally: along a diagonal d = tpos − epos, consecutive tpos
    * values chain — the islands trick (tpos − row_number) groups them
    * without any per-pair iteration, and each island of c anchors is a
    * maximal shared run of c + anchor − 1 tokens. The row_number
    * window is partitioned by (train, eval, diagonal) — bounded by a
    * single document's gram count, never corpus-wide.
    *
    * Posting posture (why no hot-anchor cap): this is the decon
    * family's EXACTNESS contract (qt9/qt13/qt15) — a capped anchor is
    * a silent false negative, i.e. a leak. A ubiquitous anchor gram is
    * by definition boilerplate; the pipeline order that bounds
    * postings is boilerplate removal FIRST ([[Boilerplate
    * .removeBoilerplate]], qt16), then decontamination — the same
    * clean-then-check order qx4 pins. Anchors are trusted 60-bit md5
    * hashes (the repo-wide fingerprint convention; pair-collision odds
    * are ~n²/2⁶¹ — at 10⁹ grams, ~10⁻³ per corpus, and a collision
    * only ever RAISES a run candidate, whose extension then requires
    * every overlapping anchor to collide too).
    *
    * Output: one row per (train_id, eval_id) pair sharing ≥1 anchor:
    * max_run_tok (exact longest shared run), n_runs (maximal runs),
    * n_anchors (shared anchor count).
    */
  def longestSharedRun(train: DataFrame, eval: DataFrame,
      textCol: String, idCol: String, anchor: Int = 5,
      broadcastEval: Boolean = true): DataFrame =
    maximalRuns(train, eval, textCol, idCol, anchor, broadcastEval)
      .groupBy(col("train_id"), col("eval_id"))
      .agg((max(col("n_anchor")) + (anchor - 1)).cast("int").as("max_run_tok"),
        count(lit(1)).cast("int").as("n_runs"),
        sum(col("n_anchor")).cast("int").as("n_anchors"))

  /** The shared chain of [[longestSharedRun]] / [[sharedRunSpans]]:
    * one row per MAXIMAL shared run — (train_id, eval_id, diag,
    * island) with the run's train-side start offset `s` (0-based
    * token position) and its shared-anchor count `n_anchor` (run
    * length in tokens = n_anchor + anchor − 1). Consumers that don't
    * read `s` lose nothing: Catalyst prunes the unused min from the
    * island aggregate.
    */
  private def maximalRuns(train: DataFrame, eval: DataFrame,
      textCol: String, idCol: String, anchor: Int,
      broadcastEval: Boolean): DataFrame = {
    require(anchor >= 1, s"anchor must be >= 1, got $anchor")
    import org.apache.spark.sql.expressions.Window
    val tg = spread(train).select(col(idCol).as("train_id"),
      posexplode(WordNgramHashes.word_ngram_hashes_pos(col(textCol), anchor))
        .as(Seq("tpos", "g")))
    val eg = eval.select(col(idCol).as("eval_id"),
      posexplode(WordNgramHashes.word_ngram_hashes_pos(col(textCol), anchor))
        .as(Seq("epos", "g")))
    val egSide = if (broadcastEval) broadcast(eg) else eg
    val m = tg.join(egSide, "g")
      .withColumn("diag", col("tpos") - col("epos"))
    val w = Window.partitionBy(col("train_id"), col("eval_id"), col("diag"))
      .orderBy(col("tpos"))
    m.withColumn("island", col("tpos") - row_number().over(w))
      .groupBy(col("train_id"), col("eval_id"), col("diag"), col("island"))
      .agg(min(col("tpos")).as("s"), count(lit(1)).as("n_anchor"))
  }

  /** Contaminated token SPANS per train document: every maximal shared
    * run of at least `minRun` tokens with ANY eval document, as
    * half-open 0-based token ranges [s, e) on the train side —
    * deduplicated across eval docs and diagonals. `minRun >= anchor`
    * is required for completeness (a run shorter than the anchor width
    * leaves no anchor to find).
    */
  def sharedRunSpans(train: DataFrame, eval: DataFrame,
      textCol: String, idCol: String, anchor: Int = 5, minRun: Int = 8,
      broadcastEval: Boolean = true): DataFrame = {
    require(minRun >= anchor,
      s"minRun must be >= anchor for completeness, got $minRun < $anchor")
    maximalRuns(train, eval, textCol, idCol, anchor, broadcastEval)
      .filter(col("n_anchor") + (anchor - 1) >= minRun)
      .select(col("train_id"), col("s").cast("int").as("s"),
        (col("s") + col("n_anchor") + (anchor - 1)).cast("int").as("e"))
      .distinct()
  }

  /** Span EXCISION — the surgical form of exact-substring
    * decontamination (Lee et al. 2022 apply the verdict this way:
    * drop the shared SPAN, keep the document — wholesale doc drops
    * waste the uncontaminated 90+% of a long page). One output row
    * per train document (the every-row contract, like qs31): span
    * count, token counts before/after, and the redacted text with
    * every token covered by any ≥ `minRun` shared run removed.
    *
    * Scale shape: spans ride [[sharedRunSpans]] (anchor equi-join +
    * per-(pair, diagonal) windows — nothing corpus-quadratic), fold to
    * one array per CONTAMINATED doc (bounded by that doc's own token
    * count), and attach by a doc-keyed left join that AQE sizes as a
    * broadcast (contaminated docs are the rare case). The excision
    * itself is a pure per-row expression — a positional lambda filter
    * against the span array (overlapping spans need no merge: position
    * membership is a disjunction) — riding the scan, no explode of
    * corpus tokens, no second shuffle.
    */
  def exciseSharedRuns(train: DataFrame, eval: DataFrame,
      textCol: String, idCol: String, anchor: Int = 5, minRun: Int = 8,
      broadcastEval: Boolean = true): DataFrame =
    exciseSpans(train,
      sharedRunSpans(train, eval, textCol, idCol, anchor, minRun,
        broadcastEval).withColumnRenamed("train_id", "span_id"),
      textCol, idCol)

  /** Maximal repeated token runs WITHIN each document — the
    * intra-document arm of the same ExactSubstr standard (Lee et al.
    * 2022 apply the dedup to ALL duplicated substrings, including a
    * substring repeating inside one document — boilerplate footers,
    * template loops, scraper stutter): every maximal run of >= `minRun`
    * tokens whose content already occurred EARLIER in the same
    * document, as half-open 0-based token ranges [s, e) over the
    * LATER occurrence — so excising them keeps exactly the first
    * occurrence. Output: (span_id = the doc id, s, e), deduplicated
    * across earlier-occurrence diagonals.
    *
    * Same anchor/diagonal/island machinery as [[maximalRuns]],
    * matched WITHIN each document in strict position order (j > i): a
    * repeat tokens[i..i+R) == tokens[j..j+R) yields anchor pairs
    * (i+k, j+k) all on diagonal j−i, whose consecutive later-side
    * positions chain into one island of R−anchor+1 anchors. Unlike
    * the cross-corpus form (two distinct slices, one equi-join), the
    * self pair needs NO join at all: the corpus is gram-encoded ONCE,
    * positions group per (doc, gram), and the ordered pairs unfold
    * from each group's sorted position array — a self-join of the
    * gram table would scan and encode the corpus twice (verified in
    * the executed plan: no exchange reuse materializes across the
    * posexplode sides). Windows are per (doc, diagonal) — bounded by
    * one document's grams. Posting posture matches
    * [[longestSharedRun]]: no per-gram occurrence cap BY CONTRACT (a
    * capped gram is a silent missed repeat); pathologically periodic
    * documents (m occurrences of one gram → m² pairs within that doc)
    * are the qt8 repetition gate's job to drop FIRST — the same
    * clean-then-check order as boilerplate-before-decontamination.
    */
  def repeatedRunSpans(docs: DataFrame, textCol: String, idCol: String,
      anchor: Int = 5, minRun: Int = 8): DataFrame = {
    require(minRun >= anchor,
      s"minRun must be >= anchor for completeness, got $minRun < $anchor")
    import org.apache.spark.sql.expressions.Window
    val g = spread(docs).select(col(idCol).as("span_id"),
      posexplode(WordNgramHashes.word_ngram_hashes_pos(col(textCol), anchor))
        .as(Seq("pos", "g")))
    // one shuffle on (doc, gram); aggregate state = that gram's
    // positions within one doc (the uncapped-contract bound)
    val occ = g.groupBy(col("span_id"), col("g"))
      .agg(sort_array(collect_list(col("pos"))).as("ps"))
      .filter(size(col("ps")) >= 2)
    // ordered pairs from the sorted positions: element j at 0-based
    // index idx pairs with every earlier position i = ps[0..idx)
    val pairs = occ.select(col("span_id"),
        explode(flatten(transform(col("ps"),
          (j, idx) => transform(slice(col("ps"), lit(1), idx),
            i => struct((j - i).as("diag"), j.as("jpos")))))).as("p"))
      .select(col("span_id"), col("p.diag").as("diag"),
        col("p.jpos").as("jpos"))
    val w = Window.partitionBy(col("span_id"), col("diag"))
      .orderBy(col("jpos"))
    pairs.withColumn("island", col("jpos") - row_number().over(w))
      .groupBy(col("span_id"), col("diag"), col("island"))
      .agg(min(col("jpos")).as("s2"), count(lit(1)).as("n_anchor"))
      .filter(col("n_anchor") + (anchor - 1) >= minRun)
      .select(col("span_id"), col("s2").cast("int").as("s"),
        (col("s2") + col("n_anchor") + (anchor - 1)).cast("int").as("e"))
      .distinct()
  }

  /** [[repeatedRunSpans]] applied surgically — one row per document
    * (the every-row contract): later occurrences of every >= `minRun`
    * within-document repeat removed, first occurrences kept. The same
    * positional-disjunction excision as [[exciseSharedRuns]].
    */
  def exciseRepeatedRuns(docs: DataFrame, textCol: String,
      idCol: String, anchor: Int = 5, minRun: Int = 8): DataFrame =
    exciseSpans(docs,
      repeatedRunSpans(docs, textCol, idCol, anchor, minRun),
      textCol, idCol)

  /** CROSS-document repeated-run spans — the train-train form of the
    * published ExactSubstr standard (Lee et al. 2022: remove every
    * >= minRun-token substring occurring verbatim in more than one
    * TRAINING document, keeping one copy), completing the family next
    * to train-eval ([[longestSharedRun]]/[[exciseSharedRuns]]) and
    * within-doc ([[repeatedRunSpans]]). Every maximal shared token run
    * >= `minRun` between two DISTINCT documents, as half-open 0-based
    * spans over the HIGHER-id document — excising them keeps exactly
    * the lowest-id occurrence corpus-wide (doc_id order is the
    * canonical "first", the same keep rule as the dedup families).
    *
    * Same ONE-gram-pass group-and-unfold as [[repeatedRunSpans]], with
    * positions grouped per gram ACROSS documents: the (doc, pos)-sorted
    * occurrence array unfolds into ordered cross-doc anchor pairs
    * (da < db strictly; same-doc pairs are qt38's operator and are
    * skipped here), islands chain per (da, db, diagonal) — windows
    * bounded by one PAIR's anchors, never a corpus dimension — and
    * spans dedup across earlier partners (d1<d2<d3 sharing one run
    * excises d2 and d3 once each). A gram-table self-join would
    * encode the corpus twice (the measured qt38 lesson).
    *
    * Posting posture — where the no-cap EXACTNESS contract meets skew:
    * a cross-doc posting is corpus-frequency sized (m occurrences
    * unfold to m² ordered pairs), hotter than qt38's within-doc
    * lists. The contract stands — a capped posting is a silently KEPT
    * duplicate — so the guard is upstream and measured, not a cap:
    * boilerplate (qt16) and repetition (qt8) gates run first
    * (clean-then-check), and qt41 audits the residual posting
    * distribution both scopes, both sides of the gate (the qd13
    * measure-the-guard discipline; raw fixture max posting: 4 at
    * sf0.1, Σm² = 278k — the unfold is candidate-bounded, not
    * corpus²).
    */
  def crossDocRunSpans(docs: DataFrame, textCol: String, idCol: String,
      anchor: Int = 5, minRun: Int = 8): DataFrame = {
    require(minRun >= anchor,
      s"minRun must be >= anchor for completeness, got $minRun < $anchor")
    import org.apache.spark.sql.expressions.Window
    val g = spread(docs).select(col(idCol).as("doc"),
      posexplode(WordNgramHashes.word_ngram_hashes_pos(col(textCol), anchor))
        .as(Seq("pos", "g")))
    val occ = g.groupBy(col("g"))
      .agg(sort_array(collect_list(struct(col("doc"), col("pos")))).as("os"))
      .filter(size(col("os")) >= 2)
    val pairs = occ.select(
        explode(flatten(transform(col("os"), (e, idx) =>
          transform(slice(col("os"), lit(1), idx), o =>
            struct(o.getField("doc").as("da"), e.getField("doc").as("db"),
              (e.getField("pos") - o.getField("pos")).as("diag"),
              e.getField("pos").as("jpos")))))).as("p"))
      .filter(col("p.da") =!= col("p.db"))
      .select(col("p.da").as("da"), col("p.db").as("db"),
        col("p.diag").as("diag"), col("p.jpos").as("jpos"))
    val w = Window.partitionBy(col("da"), col("db"), col("diag"))
      .orderBy(col("jpos"))
    pairs.withColumn("island", col("jpos") - row_number().over(w))
      .groupBy(col("da"), col("db"), col("diag"), col("island"))
      .agg(min(col("jpos")).as("s2"), count(lit(1)).as("n_anchor"))
      .filter(col("n_anchor") + (anchor - 1) >= minRun)
      .select(col("db").as("span_id"), col("s2").cast("int").as("s"),
        (col("s2") + col("n_anchor") + (anchor - 1)).cast("int").as("e"))
      .distinct()
  }

  /** [[crossDocRunSpans]] applied surgically — one row per document:
    * later copies of every cross-document >= `minRun` shared run
    * removed, the lowest-id document's copy kept. The shared
    * positional-disjunction excision.
    */
  def exciseCrossDocRuns(docs: DataFrame, textCol: String,
      idCol: String, anchor: Int = 5, minRun: Int = 8): DataFrame =
    exciseSpans(docs,
      crossDocRunSpans(docs, textCol, idCol, anchor, minRun),
      textCol, idCol)

  /** Shared excision attach: fold `spans` (span_id, s, e) to one array
    * per flagged doc, attach by a doc-keyed left join (AQE sizes it as
    * a broadcast — flagged docs are the rare case), excise by a pure
    * per-row positional lambda filter riding the scan. Overlapping
    * spans need no merge: position membership is a disjunction.
    */
  private def exciseSpans(docs: DataFrame, spans: DataFrame,
      textCol: String, idCol: String): DataFrame = {
    val spansAgg = spans
      .groupBy(col("span_id"))
      .agg(count(lit(1)).cast("int").as("n_spans"),
        collect_list(struct(col("s"), col("e"))).as("__spans"))
    // The tokenize chain and the lambda filter feed THREE output
    // columns, and codegen subexpression elimination skips
    // lambda-bearing trees — naively projecting n_tok / n_excised /
    // redacted_text re-runs the regex normalize+split ~4x and the
    // span-membership scan 2x per corpus row (the interpreted-HOF
    // re-evaluation class bindOnce exists for). So both are bound ONCE
    // per row (nested bindOnce) into a single struct, split in a
    // SECOND projection; CollapseProject keeps the split because
    // inlining would duplicate a non-cheap multi-referenced expression
    // (verified in the executed plan: one regexp_replace per arm).
    val stats = TextOps.bindOnce(TextOps.tokens(col(textCol))) { tk =>
      // null span array = clean doc: keep all tokens (avoids conjuring
      // a typed empty array); membership test is 0-based, matching tpos
      val keptArr = when(col("__spans").isNull, tk).otherwise(
        filter(tk, (_, i) => !exists(col("__spans"),
          r => i >= r.getField("s") && i < r.getField("e"))))
      TextOps.bindOnce(keptArr) { kp =>
        struct(size(tk).as("n_tok"),
          (size(tk) - size(kp)).as("n_excised"),
          concat_ws(" ", kp).as("redacted_text"))
      }
    }
    docs.join(spansAgg, col(idCol) === col("span_id"), "left")
      .select(col(idCol),
        coalesce(col("n_spans"), lit(0)).as("n_spans"),
        stats.as("__st"))
      .select(col(idCol), col("n_spans"),
        col("__st.n_tok").as("n_tok"),
        col("__st.n_excised").as("n_excised"),
        col("__st.redacted_text").as("redacted_text"))
  }
}
