package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.text.TextOps

/** Deduplication operators for large-scale document corpora: exact,
  * token-set, MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design: every candidate-generation path is an equi-join on a
  * bucket key (band hash / simhash band / shared shingle) — never an
  * O(n²) cross join — so the shuffle volume is bounded by bucket sizes,
  * not corpus size. The quadratic work happens only within candidate
  * groups, which LSH keeps small.
  *
  * == Cache lifecycle contract ==
  * [[minhashPairs]], [[simhashPairs]], [[ngramJaccardPairs]] and
  * [[incrementalDupFlags]] persist() slim intermediate tables (token
  * sets / fingerprints / prefix postings) that feed 2-3 consumers in
  * the returned LAZY plan, so the operator cannot unpersist them itself
  * — they must stay cached until the caller has run its action(s).
  * After consuming the result, the caller releases them with
  * `spark.catalog.clearCache()` (what Bench does between queries) or by
  * unpersisting via `spark.sharedState.cacheManager`. A long-lived
  * session that skips this accumulates MEMORY_AND_DISK blocks — a slow
  * memory leak, not a correctness issue (Spark evicts LRU under
  * pressure, at recompute cost).
  */
object Dedup {

  import graft.ops.Partitioning.spread

  /** Exact-duplicate annotation: md5 over normalized text; every doc gets
    * its group's canonical (min) id and group size.
    */
  def exactDupAnnotate(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val h = TextOps.fingerprintMd5(col(textCol))
    val byHash = Window.partitionBy(col("content_hash"))
    docs.withColumn("content_hash", h)
      .withColumn("canonical_id", min(col(idCol)).over(byHash))
      .withColumn("group_size", count(lit(1)).over(byHash))
  }

  private def isIntegral(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }

  /** Distinct sorted token array — the "bag of unique words" signature. */
  def tokenSet(textCol: Column): Column =
    array_sort(array_distinct(TextOps.tokens(textCol)))

  /** Token-set duplicate groups (docs that are permutations/repetitions
    * of the same vocabulary): groups of size >= 2 with canonical id and
    * sorted member list.
    *
    * Scale note: `member_ids` is AUDIT output — the one unbounded
    * per-group aggregate in this file (a boilerplate template
    * duplicated millions of times puts every member in one
    * collect_list buffer, the hot-clique shape [[capBuckets]] guards
    * elsewhere). The verdict fields (n_docs, canonical_id) are plain
    * partial-aggregable min/count; a lake-scale caller keeps those and
    * takes membership as rows by joining set_sig back — drop the list,
    * not the operator.
    */
  def tokenSetGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol),
        md5(concat_ws(" ", tokenSet(col(textCol)))).as("set_sig"))
      .groupBy(col("set_sig"))
      .agg(count(lit(1)).as("n_docs"),
        min(col(idCol)).as("canonical_id"),
        concat_ws(",", transform(array_sort(collect_list(col(idCol))),
          x => x.cast("string"))).as("member_ids"))
      .filter(col("n_docs") >= 2)

  /** MinHash signature: k independent 60-bit hash functions
    * h_i(t) = hash60(i || ":" || t), minimum over the doc's distinct
    * tokens. Pure array expressions — no explode, no shuffle. Kept as
    * the readable reference form; the pair pipeline uses the
    * bit-identical codegen [[graft.functions.MinhashBands]] (this HOF
    * chain evaluates k·|tokens| interpreted md5 lambdas per row).
    */
  def minhashSignature(tokens: Column, k: Int): Column =
    TextOps.bindOnce(tokens) { toks =>
      transform(sequence(lit(0), lit(k - 1)), i =>
        array_min(transform(toks, t =>
          TextOps.hash60(concat(i.cast("string"), lit(":"), t)))))
    }

  /** LSH band keys: the signature split into `bands` slices of `rows`
    * values, each md5-summarized. Docs sharing any band key are
    * near-duplicate candidates.
    */
  def lshBandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      md5(concat_ws(",",
        transform(slice(sig, b * lit(rows) + 1, lit(rows)),
          v => v.cast("string")))))

  /** Hot-bucket guard for every banded candidate generator — shared
    * with the embedding-LSH family; see [[graft.ops.Skew.capBuckets]]
    * for the full rationale (aggregate + left_anti, never a hot-bucket
    * window; recall trade audited via [[minhashBandStats]]).
    */
  private def capBuckets(banded: DataFrame, keyCol: String,
      maxBucket: Int): DataFrame =
    graft.ops.Skew.capBuckets(banded, keyCol, maxBucket)

  /** Per-bucket population of the MinHash band index — the skew-audit
    * companion to `maxBucket`: one row per band bucket (the folded
    * band-index⊕key long the pair join buckets on) with its member
    * count. Aggregate into a histogram (qd13) to see the clique mass a
    * cap would drop, or alert on `n_docs > cap` before the pair join.
    */
  def minhashBandStats(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 16, bands: Int = 4): DataFrame = {
    require(k % bands == 0,
      s"signature length k=$k must be divisible by bands=$bands")
    spread(docs)
      .select(col(idCol).as("doc"), tokenSet(col(textCol)).as("toks"))
      .select(col("doc"), explode(graft.functions.MinhashBands
        .minhash_bands(col("toks"), k, bands)).as("band"))
      .groupBy(col("band")).agg(count(lit(1)).as("n_docs"))
  }

  /** MinHash/LSH candidate pairs with exact-Jaccard verification.
    * Returns (id_a, id_b, jaccard) for pairs >= threshold, id_a < id_b.
    * Jaccard is an exact integer ratio — engine-portable bit-for-bit.
    * Persists the token-set table (see the cache lifecycle contract on
    * [[Dedup]]). `maxBucket`: see [[capBuckets]] — the qd12 arm runs
    * this guard driver-oracled.
    */
  def minhashPairs(
      docs: DataFrame, textCol: String, idCol: String,
      k: Int = 16, bands: Int = 4, threshold: Double = 0.6,
      broadcastSets: Boolean = true, maxBucket: Int = 0): DataFrame = {
    require(k % bands == 0,
      s"signature length k=$k must be divisible by bands=$bands " +
        "(trailing signature values would be silently excluded from every band)")
    val withSets = spread(docs)
      .select(col(idCol).as("doc"), tokenSet(col(textCol)).as("toks"))
      // intersections run on sorted 60-bit hashes: fixed 8-byte compares
      // instead of variable-length strings on the quadratic kernel
      .withColumn("toks_h", array_sort(tokenHashes(col("toks"))))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Slim candidate generation: the band self-join carries ONLY
    // (doc, 60-bit band key) — shipping token arrays through a join
    // whose output is quadratic in bucket size multiplies shuffle volume
    // by array width. The md5 band key is folded to a bigint (hash60 of
    // it): bucket equality is preserved (same slice values ⟺ same md5 ⟺
    // same fold), so the candidate set is unchanged, while the join and
    // the pair-dedup shuffle compare 8-byte keys instead of 32-char
    // strings. Token sets are re-attached afterwards via two broadcast
    // joins against the (small) per-doc set table.
    val banded = capBuckets(withSets.select(col("doc"),
      explode(graft.functions.MinhashBands
        .minhash_bands(col("toks"), k, bands)).as("band")),
      "band", maxBucket)
    val cands = banded.as("a")
      .join(banded.as("b"), col("a.band") === col("b.band") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    verifyJaccard(cands,
      withSets.select(col("doc").as("id_a"), col("toks_h").as("set_a")),
      withSets.select(col("doc").as("id_b"), col("toks_h").as("set_b")),
      threshold, broadcastSets)
  }

  /** Exact-Jaccard verification kernel shared by every candidate
    * generator (minhash / n-gram / incremental): attach each side's
    * SORTED 60-bit hash set, intersect with the codegen merge-walk
    * ([[graft.functions.SortedIntersectCount]] — array_intersect hashes
    * per row), and keep pairs at `inter / (|A| + |B| - inter) >=
    * threshold`. That ratio is the engine-portability contract with the
    * DuckDB oracles — ONE copy serves every operator. `broadcastSets`:
    * right when the per-doc set table fits an executor (bench scale);
    * at lake scale pass false and the candidate pairs shuffle-join the
    * set tables on id instead (AQE plans it).
    */
  private def verifyJaccard(cands: DataFrame,
      setsA: DataFrame, setsB: DataFrame,
      threshold: Double, broadcastSets: Boolean): DataFrame = {
    def maybeBc(df: DataFrame) = if (broadcastSets) broadcast(df) else df
    cands
      .join(maybeBc(setsA), "id_a")
      .join(maybeBc(setsB), "id_b")
      .withColumn("inter", graft.functions.SortedIntersectCount
        .sorted_intersect_count(col("set_a"), col("set_b")))
      .withColumn("jaccard", col("inter") /
        (size(col("set_a")) + size(col("set_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Incremental dedup: flag each BATCH doc against an EXISTING corpus
    * — the daily production shape at lake scale (dedup today's crawl
    * against the accumulated lake, never re-pairing the corpus with
    * itself). Two independent boolean flags per batch doc:
    * `dup_exact` (normalized-text md5 match — the qd1/qst1 key) and
    * `dup_near` (MinHash band candidate verified at exact Jaccard >=
    * threshold — the qd3 kernel, asymmetric batch×corpus instead of
    * self-join). The corpus side is touched ONLY through hash/band-key
    * equi-joins, so corpus cost is one scan + one band explode
    * regardless of history size; candidate volume is bounded by band
    * collisions exactly as in [[minhashPairs]], and `maxBucket` bounds
    * it further by capping the corpus-side band postings (see
    * [[capBuckets]] and the inline note). Persists both prepped sides
    * (see the cache lifecycle contract on [[Dedup]]).
    */
  def incrementalDupFlags(corpus: DataFrame, batch: DataFrame,
      textCol: String, idCol: String, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.6, broadcastSets: Boolean = true,
      maxBucket: Int = 0): DataFrame = {
    require(k % bands == 0,
      s"signature length k=$k must be divisible by bands=$bands")
    def prep(df: DataFrame) = spread(df)
      .select(col(idCol).as("doc"),
        TextOps.fingerprintMd5(col(textCol)).as("content_hash"),
        tokenSet(col(textCol)).as("toks"))
      .withColumn("toks_h", array_sort(tokenHashes(col("toks"))))
    val c = prep(corpus).persist(StorageLevel.MEMORY_AND_DISK)
    val b = prep(batch).persist(StorageLevel.MEMORY_AND_DISK)
    // left_semi already has set semantics — no distinct on the right
    val exact = b.join(c.select(col("content_hash")),
        Seq("content_hash"), "left_semi")
      .select(col("doc")).withColumn("dup_exact", lit(true))
    // slim band join: only (doc, folded 8-byte band key) rides it.
    // maxBucket caps the CORPUS side's buckets ([[capBuckets]]): the
    // accumulated corpus is the unbounded dimension (a hot template
    // posting grows with history), while the batch is one day's crawl —
    // capping the corpus posting bounds candidate volume at
    // |batch| · maxBucket. `dup_exact` is untouched by the cap.
    def banded(df: DataFrame) = df.select(col("doc"),
      explode(graft.functions.MinhashBands
        .minhash_bands(col("toks"), k, bands)).as("band"))
    val cands = banded(b).as("nb")
      .join(capBuckets(banded(c), "band", maxBucket).as("oc"),
        col("nb.band") === col("oc.band"))
      .select(col("nb.doc").as("batch_doc"), col("oc.doc").as("corpus_doc"))
      .dropDuplicates("batch_doc", "corpus_doc")
    val near = verifyJaccard(
        cands.select(col("batch_doc").as("id_a"), col("corpus_doc").as("id_b")),
        b.select(col("doc").as("id_a"), col("toks_h").as("set_a")),
        c.select(col("doc").as("id_b"), col("toks_h").as("set_b")),
        threshold, broadcastSets)
      .select(col("id_a").as("doc")).distinct()
      .withColumn("dup_near", lit(true))
    b.select(col("doc"))
      .join(exact, Seq("doc"), "left")
      .join(near, Seq("doc"), "left")
      .select(col("doc").as(idCol),
        coalesce(col("dup_exact"), lit(false)).as("dup_exact"),
        coalesce(col("dup_near"), lit(false)).as("dup_near"))
  }

  /** 60-bit SimHash over a column of PRE-HASHED token values (bigint
    * array): bit j of the fingerprint is the sign of sum over tokens of
    * ±1 on that hash bit. Delegates to the native codegen Expression
    * [[graft.functions.Simhash60]] — the HOF formulation evaluates
    * ~60·n interpreted lambdas per row.
    */
  def simhash60(tokenHashesCol: String): Column =
    graft.functions.Simhash60.simhash60(col(tokenHashesCol))

  /** hash60 of every token in an array column — codegen
    * ([[graft.functions.TokenHashes60]]); the HOF form walks one
    * interpreted md5 expression per element.
    */
  def tokenHashes(tokens: Column): Column =
    graft.functions.TokenHashes60.token_hashes60(tokens)

  /** SimHash near-dup pairs with Hamming distance <= maxHamming.
    * Candidates come from 4 bands of 15 bits (pigeonhole: any pair with
    * Hamming <= 3 shares at least one exact band), then the exact
    * bit_count(xor) filter — LSH-complete for maxHamming <= 3, never a
    * cross join. Persists the fingerprint table (see the cache
    * lifecycle contract on [[Dedup]]). `maxBucket`: see [[capBuckets]]
    * (applied to the packed 15-bit band buckets).
    */
  def simhashPairs(
      docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3, broadcastFingerprints: Boolean = true,
      maxBucket: Int = 0): DataFrame = {
    require(maxHamming <= 3, "4x15-bit banding is only complete for Hamming <= 3")
    // fingerprint table is persisted: it feeds the band join (twice) and
    // both verification attaches
    val sh = spread(docs)
      .select(col(idCol).as("doc"), tokenSet(col(textCol)).as("toks"))
      .withColumn("toks_h", tokenHashes(col("toks")))
      .withColumn("simhash", simhash60("toks_h"))
      .select(col("doc"), col("simhash"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Slim candidate stream: (doc, packed band-index·2^15 + band-key
    // long) only — carrying the two 8-byte fingerprints through the
    // quadratic pair dedup measured 3.5x slower. Fingerprints re-attach
    // after the dedup (broadcast by default; the (doc, long) table is
    // 16 bytes/doc, shuffle-join it at lake scale instead).
    val banded = capBuckets(sh
      .withColumn("band", explode(sequence(lit(0), lit(3))))
      .withColumn("band_key",
        expr("(shiftright(simhash, band * 15) & 32767)"))
      .select(col("doc"), (col("band") * 32768 + col("band_key")).as("bk")),
      "bk", maxBucket)
    val cands = banded.as("a")
      .join(banded.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    def maybeBc(df: DataFrame) = if (broadcastFingerprints) broadcast(df) else df
    cands
      .join(maybeBc(sh.select(col("doc").as("id_a"), col("simhash").as("sh_a"))), "id_a")
      .join(maybeBc(sh.select(col("doc").as("id_b"), col("simhash").as("sh_b"))), "id_b")
      .withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Duplicate-cluster assignment: connected components over an
    * undirected near-dup pair graph — one row per doc appearing in at
    * least one pair, with `cluster_id` = the minimum doc id reachable,
    * the cluster size, and an `is_canonical` flag on the cluster min.
    * This turns pairwise dedup output (minhashPairs / simhashPairs /
    * ngramJaccardPairs / lshNearDupPairs) into the keep/drop decision a
    * training pipeline actually needs.
    *
    * Algorithm: ONE star-contraction level, then min-label propagation
    * with pointer jumping on the contracted graph (cf. Kiveris et al.,
    * "Connected Components in MapReduce and Beyond" — star contraction
    * is their edge-shrinking primitive; pointer jumping gives the
    * O(log diameter) round bound).
    *
    *  - Contraction: every node takes label min(self, min neighbor) —
    *    one aggregate over the edge list — and edges are rewritten
    *    through that mapping (self-loops dropped, dedup'd). Near-dup
    *    graphs are clique-heavy (a template with n copies is a clique
    *    with n·(n-1)/2 pair edges), and one contraction collapses each
    *    clique to its min: at sf0.1 the 11.3M-row undirected edge list
    *    contracts to a few hundred edges, so the iterative loop never
    *    rescans the big table. At lake scale the rewrite is two
    *    equi-joins + a distinct — O(|E|) shuffle ONCE, not per round.
    *  - Loop: each round takes one hop (neighbor-min aggregate + label
    *    join) and then path-halves through the previous round's mapping
    *    (label <- prevLabel(label)), so the min label travels O(2^r)
    *    hops after r rounds. Worst case (a pure path, which contraction
    *    barely shrinks) still converges in ~log2(diameter)+1 rounds.
    *  - Compose: finalLabel(v) = loopLabel(contractionLabel(v)) — one
    *    small join. The label tables hold only docs that occur in
    *    pairs, never the corpus.
    *  - Quotient fast path: when the contracted edge list fits
    *    `driverEdgeCap` rows, the loop is replaced by driver-side
    *    min-rooted union-find over the quotient — bounded like the
    *    Ivf/Pq model fits, with the distributed loop as the
    *    unconditional over-cap fallback. Edges are collected as typed
    *    (Long, Long) tuples, ~48 B each on the heap with collect
    *    serialization on top — the default cap of 2^18 bounds the
    *    transient at ~12-25 MB (the measured sf0.1 quotient is a few
    *    HUNDRED edges; the cap is pure headroom, and a quotient still
    *    above it belongs in the loop anyway).
    *    `driverEdgeCap = 0` forces the loop (how DedupSpec pins
    *    fastpath ≡ loop).
    *
    * Every iteration product is cut from its lineage with an EAGER
    * `localCheckpoint()` before the next round builds on it. persist()
    * is NOT enough: caching substitutes InMemoryRelation only at
    * physical planning, while the analyzed LOGICAL plan keeps the full
    * self-referential tree — each round references the previous labels
    * three times (neighbor-min join, hop left-join, pointer-jump map),
    * so the logical plan grows ~3^rounds and the driver alone burns
    * hours canonicalizing it (measured: a 2.1e9-char plan string and a
    * 2301 s run at sf0.1 on KB-sized cached data). Checkpointing
    * collapses each round to a LogicalRDD leaf — the same per-N-rounds
    * lineage truncation GraphFrames' connected components uses. The
    * fixpoint test stays a full-scan action (count of changed rows) on
    * the checkpointed table, so every partition is materialized exactly
    * once per round.
    *
    * Cache lifecycle: no CacheManager entries are left behind;
    * checkpointed RDDs are slim (node, label) / (src, dst) long pairs,
    * stored MEMORY_AND_DISK, reclaimed by the ContextCleaner once the
    * superseded round's Dataset is unreferenced. On a real cluster use
    * reliable `checkpoint()` only if executor loss must be survivable
    * mid-computation; localCheckpoint is the right trade for an
    * iterative batch job.
    */
  def dupClusters(pairs: DataFrame, idACol: String = "id_a",
      idBCol: String = "id_b", maxIter: Int = 20,
      pairsMaterialized: Boolean = false,
      driverEdgeCap: Int = 1 << 18): DataFrame = {
    // Materialize the (possibly expensive) upstream pair pipeline ONCE,
    // as the slim directed list — 16 bytes/pair. The symmetric view is
    // derived lazily per scan (explode from the local RDD is cheap);
    // checkpointing the exploded form would double the write volume.
    // `pairsMaterialized = true` says the CALLER already cut the pair
    // lineage (localCheckpoint() / a lake read): skip the internal
    // checkpoint so a pipeline sharing the pair list across consumers
    // pays pair generation exactly once (the qx3 curation shape).
    // Ids must already be integral: a silent cast("long") would ANSI-
    // error mid-contraction on string ids (or null every edge with
    // ANSI off) — fail at plan-build with the remediation instead.
    // String-keyed corpora (UUIDs, URLs) hash to a long key first
    // (TextOps.hash60) and keep a (hash -> id) side table.
    Seq(idACol, idBCol).foreach { c =>
      val dt = pairs.schema(c).dataType
      require(isIntegral(dt),
        s"dupClusters needs integral ids, got $c: ${dt.simpleString} - " +
          "hash string ids to a long key (TextOps.hash60) first")
    }
    val p0 = pairs
      .select(col(idACol).cast("long").as("src"),
        col(idBCol).cast("long").as("dst"))
    val p = if (pairsMaterialized) p0 else p0.localCheckpoint()
    // Contraction labels: min(self, min neighbor), from TWO
    // half-aggregates over the directed list merged full-outer —
    // cheaper than symmetrizing first (that doubles every contraction
    // scan to 2|E| rows; here the explode happens only on the already
    // tiny contracted edge set below).
    val mIn = p.groupBy(col("dst").as("node")).agg(min(col("src")).as("mn_in"))
    val mOut = p.groupBy(col("src").as("node")).agg(min(col("dst")).as("mn_out"))
    val l0 = mIn.join(mOut, Seq("node"), "full_outer")
      .select(col("node"),
        least(col("node"), col("mn_in"), col("mn_out")).as("label"))
      .localCheckpoint()
    // Rewrite edges through l0 (symmetry of the quotient is restored by
    // the explode below). AQE broadcasts l0 when it is small; at lake
    // scale these are the two one-off O(|E|) shuffle joins.
    val lSrc = l0.select(col("node").as("ls_node"), col("label").as("ls_label"))
    val lDst = l0.select(col("node").as("ld_node"), col("label").as("ld_label"))
    var edges = p.join(lSrc, col("src") === col("ls_node"))
      .join(lDst, col("dst") === col("ld_node"))
      .select(col("ls_label").as("csrc"), col("ld_label").as("cdst"))
      .filter(col("csrc") =!= col("cdst"))
      .distinct()
      .select(explode(array(
        struct(col("csrc").as("src"), col("cdst").as("dst")),
        struct(col("cdst").as("src"), col("csrc").as("dst")))).as("ud"))
      .select(col("ud.src").as("src"), col("ud.dst").as("dst"))
      .distinct()
      .localCheckpoint()
    // Driver fast path on the QUOTIENT graph: star contraction collapses
    // each clique to its min, and near-dup graphs are clique-heavy by
    // construction — measured at sf0.1 the 11.3M-row undirected pair
    // list contracts to a few hundred edges. When the quotient fits a
    // bounded driver buffer (cap × 16 bytes; 1M edges = 16 MB), finish
    // it with min-rooted union-find in memory — the same KB/MB-bounded
    // model-fit class as the Ivf/Pq fits, never the pair list itself —
    // instead of paying per-round join + checkpoint + count latency in
    // the distributed loop (measured ~2 s of fixed cost at sf0.1 for a
    // quotient of a few hundred rows). The cap is a hard row-count
    // guard with the pointer-jumping loop as the unconditional
    // fallback, so the operator never DEPENDS on the quotient being
    // small; DedupSpec pins fastpath ≡ loop via driverEdgeCap = 0.
    // Collected as typed (Long, Long) tuples, not GenericRows with
    // boxed fields — at the cap the transient is ~12-25 MB rather
    // than the 100+ MB a Row collect materializes.
    val smallEdges: Array[(Long, Long)] =
      if (driverEdgeCap > 0)
        edges.limit(driverEdgeCap + 1)
          .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
            org.apache.spark.sql.Encoders.scalaLong,
            org.apache.spark.sql.Encoders.scalaLong))
          .collect()
      else Array.empty[(Long, Long)]
    val loopMap: DataFrame =
      if (driverEdgeCap > 0 && smallEdges.length <= driverEdgeCap) {
        // Union-find with path compression; unions always attach the
        // larger root under the smaller, so every root is its
        // component's MINIMUM node id — the same label the loop's
        // min-propagation converges to.
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          var p = parent.getOrElse(r, r)
          while (p != r) { r = p; p = parent.getOrElse(r, r) }
          var c = x
          while (c != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        smallEdges.foreach { case (s, d) =>
          val a = find(s); val b = find(d)
          if (a < b) parent(b) = a else if (b < a) parent(a) = b
        }
        // edges is symmetrized, so every quotient node occurs as src
        val nodes = smallEdges.iterator.map(_._1).toArray.distinct
        val spark = pairs.sparkSession
        import spark.implicits._
        broadcast(nodes.toSeq.map(n => (n, find(n)))
          .toDF("lp_node", "lp_label"))
      } else {
        var labels = edges.select(col("src").as("node")).distinct()
          .withColumn("label", col("node"))
          .localCheckpoint()
        var iter = 0
        var done = edges.isEmpty // fully contracted already (clique-only graph)
        while (!done && iter < maxIter) {
          val nbrMin = edges.join(labels, edges("dst") === labels("node"))
            .groupBy(col("src"))
            .agg(min(col("label")).as("nbr_label"))
          val hop = labels.join(nbrMin, col("node") === col("src"), "left")
            .select(col("node"), col("label").as("prev"),
              least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
          // pointer jump through the PREVIOUS round's (materialized) mapping:
          // label values are always node ids of the same component, so
          // prevLabel(label) is defined and monotonically no larger
          val prevMap = labels.select(col("node").as("pj_node"),
            col("label").as("pj_label"))
          val stepped = hop.join(prevMap, col("label") === col("pj_node"), "left")
            .select(col("node"), col("prev"),
              least(col("label"), coalesce(col("pj_label"), col("label"))).as("label"))
            .localCheckpoint() // eager: one materialization, flat lineage
          // full-scan fixpoint test over the checkpointed round
          done = stepped.filter(col("label") < col("prev")).count() == 0L
          labels = stepped.select(col("node"), col("label"))
          iter += 1
        }
        require(done,
          s"dupClusters did not converge in $maxIter rounds — component " +
            "diameter exceeds 2^maxIter (raise it)")
        labels.select(col("node").as("lp_node"), col("label").as("lp_label"))
      }
    // Compose contraction + loop labels. Contracted nodes with no edges
    // (components that collapsed to a star in one level) are absent from
    // the loop's label table — their l0 label is already final.
    val resolved = l0.join(loopMap, col("label") === col("lp_node"), "left")
      .select(col("node"),
        coalesce(col("lp_label"), col("label")).as("label"))
    val byCluster = Window.partitionBy(col("label"))
    resolved
      .withColumn("cluster_size", count(lit(1)).over(byCluster))
      .select(col("node").as("doc_id"), col("label").as("cluster_id"),
        col("cluster_size"),
        (col("node") === col("label")).as("is_canonical"))
  }

  /** Word n-grams (default bigrams) of the normalized text, distinct.
    * Documents with fewer than `n` tokens yield an empty array — the
    * [[graft.functions.WordNgramHashes]] contract; without the guard,
    * `sequence(1, size-(n-1))` DESCENDS for short docs (Spark's
    * sequence(1, 0) is [1, 0]) and element_at trips the ANSI
    * invalid-index error on the very first sub-n document.
    */
  def wordNgrams(text: Column, n: Int = 2): Column =
    TextOps.bindOnce(TextOps.tokens(text)) { toks =>
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(array_distinct(
          transform(sequence(lit(1), size(toks) - (n - 1)), i =>
            concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*))))
    }

  /** n-gram Jaccard near-dup pairs with PPJoin-style prefix + positional
    * filtering: output = all pairs with Jaccard >= threshold over
    * distinct word n-grams.
    *
    * Candidate generation indexes only each doc's PREFIX — its
    * |G| - ceil(t·|G|) + 1 rarest grams under a global
    * (document-frequency, hash) order. Prefix-filter theorem: any pair
    * with Jaccard >= t shares at least one prefix gram on BOTH sides,
    * so joining prefix postings is complete; rare-first ordering keeps
    * posting lists short. The join additionally applies PPJoin's
    * positional bound — overlap <= 1 + min(|A|-posA, |B|-posB), which
    * must reach ceil(t/(1+t)·(|A|+|B|)) at the first common prefix gram
    * of any qualifying pair — pruning candidates before the dedup
    * shuffle (it subsumes the |B| >= t·|A| length filter at pos=1).
    * Verification is the exact merge-walk intersect over sorted hash
    * arrays (broadcast-attached). The gram table is persisted: it feeds
    * the inverted index, the prefix ranking, and the verification sets,
    * and the tokenize→ngram→hash chain is the per-row hot path (see the
    * cache lifecycle contract on [[Dedup]]). `maxBucket`: see
    * [[capBuckets]] — here the cap drops postings whose document
    * frequency exceeds it from the prefix index (positions preserved,
    * so the positional bound stays valid on the survivors).
    *
    * The default `broadcastDocFreq = true` route is EAGER at plan
    * construction (it collects the (gram → df) vocabulary to the
    * driver and broadcasts it — the model-fit collect class, same as
    * contaminatedBloom's filter build) and typed on LONG doc ids; the
    * `false` (lake) route is fully lazy and id-type-agnostic. Both
    * produce the same rows — the require below makes the id contract
    * loud instead of an upcast AnalysisException mid-plan.
    */
  def ngramJaccardPairs(
      docs: DataFrame, textCol: String, idCol: String,
      n: Int = 2, threshold: Double = 0.5,
      broadcastSets: Boolean = true,
      broadcastDocFreq: Boolean = true,
      maxBucket: Int = 0): DataFrame = {
    require(!broadcastDocFreq || isIntegral(docs.schema(idCol).dataType),
      s"ngramJaccardPairs(broadcastDocFreq = true) needs an integral id, " +
        s"got $idCol: ${docs.schema(idCol).dataType.simpleString} - " +
        "use broadcastDocFreq = false (the lake route) for string ids")
    val grams = spread(docs).select(col(idCol).as("doc"),
      graft.functions.WordNgramHashes
        .word_ngram_hashes(col(textCol), n).as("gh")).persist(StorageLevel.MEMORY_AND_DISK)
    val inv = grams.select(col("doc"), explode(col("gh")).as("g"))
    // global rare-first order: (document frequency, gram hash)
    val df_ = inv.groupBy(col("g")).agg(count(lit(1)).as("df"))
    // prefix = the |G| - ceil(t·|G|) + 1 rarest grams of each doc,
    // with their rank and the doc's gram count (for the positional
    // bound). Two routes to the same rows:
    val prefix = if (broadcastDocFreq) {
      // vocabulary fits the driver (bench / dimension-sized corpora):
      // ship the (gram -> df) map and cut the prefix inside each doc's
      // array in one pass — no inverted-index join, no ranking window.
      val spark = grams.sparkSession
      import spark.implicits._
      val dfMap = spark.sparkContext.broadcast(
        df_.as[(Long, Long)].collect().toMap)
      grams.as[(Long, Array[Long])].flatMap { case (doc, gh) =>
        val m = dfMap.value
        val ng = gh.length
        val p = ng - math.ceil(ng * threshold).toInt + 1
        // the maxBucket cap drops HOT postings (df > cap) from the
        // index while keeping each survivor's original prefix position,
        // so the positional bound stays valid — same rows as the lake
        // route's df filter
        gh.map(g => (m(g), g)).sorted.iterator.take(p).zipWithIndex.collect {
          case ((d, g), i) if maxBucket <= 0 || d <= maxBucket =>
            (doc, g, i + 1, ng)
        }
      }.toDF("doc", "g", "pos", "ng")
    } else {
      // lake scale: vocabulary exceeds the driver — rank through the
      // inverted index (one aggregate shuffle + one window sort).
      // Persisted because the candidate self-join consumes it TWICE
      // (a and b sides): without materialization each side replays the
      // inverted-index shuffle + ranking window — the two most
      // expensive stages in the operator — and the planner does not
      // exchange-reuse across the self-join's differing aliases. The
      // prefix table is the SMALL end of the pipeline (≈(1-t)·|grams|
      // slim rows), so MEMORY_AND_DISK is safe at lake scale.
      val wDoc = Window.partitionBy(col("doc"))
      val ranked = inv.join(df_, "g")
        .withColumn("pos",
          row_number().over(wDoc.orderBy(col("df"), col("g"))))
        .withColumn("ng", count(lit(1)).over(wDoc))
        .filter(col("pos") <= col("ng") - ceil(col("ng") * threshold) + 1)
      // hot-posting cap AFTER prefix ranking (positions keep their
      // original values, see the broadcast route)
      (if (maxBucket > 0) ranked.filter(col("df") <= maxBucket) else ranked)
        .select(col("doc"), col("g"), col("pos"), col("ng"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    val minOverlap = ceil(lit(threshold / (1 + threshold)) *
      (col("a.ng") + col("b.ng")))
    val cands = prefix.as("a")
      .join(prefix.as("b"), col("a.g") === col("b.g") &&
        col("a.doc") < col("b.doc") &&
        (lit(1) + least(col("a.ng") - col("a.pos"),
          col("b.ng") - col("b.pos")) >= minOverlap))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val sortedSets = grams.select(col("doc"), array_sort(col("gh")).as("sh"))
    verifyJaccard(cands,
      sortedSets.select(col("doc").as("id_a"), col("sh").as("set_a")),
      sortedSets.select(col("doc").as("id_b"), col("sh").as("set_b")),
      threshold, broadcastSets)
  }
}
