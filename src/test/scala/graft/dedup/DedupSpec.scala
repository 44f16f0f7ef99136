package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sim.Similarity

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "dog lazy the over jumps fox brown quick the"),   // permutation of 1
    (4L, "completely different content about spark engines"),
    (5L, "the quick brown fox jumps over the lazy cat"))   // near dup of 1
    .toDF("doc_id", "text")

  test("exact dedup groups identical normalized text") {
    val out = Dedup.exactDupAnnotate(docs, "text", "doc_id")
      .select($"doc_id", $"canonical_id", $"group_size")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((1L, 2L)) && out(2L) == ((1L, 2L)))
    assert(out(3L)._2 == 1L && out(4L)._2 == 1L)
  }

  test("token-set dedup catches permutations") {
    val groups = Dedup.tokenSetGroups(docs, "text", "doc_id")
      .select($"canonical_id", $"n_docs", $"member_ids")
      .as[(Long, Long, String)].collect()
    assert(groups.length == 1)
    assert(groups(0) == ((1L, 3L, "1,2,3")))
  }

  test("minhash LSH finds high-Jaccard pairs and never fabricates them") {
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id", k = 16, bands = 4,
        threshold = 0.6)
      .as[(Long, Long, Double)].collect()
    val keys = pairs.map(p => (p._1, p._2)).toSet
    // identical token sets (jaccard 1.0) must always collide in LSH
    assert(keys.contains((1L, 2L)) && keys.contains((1L, 3L)) && keys.contains((2L, 3L)))
    pairs.foreach { case (_, _, j) => assert(j >= 0.6) }
    // jaccard(1,5) = 8/10 -> if banded as candidate, value must be exact
    pairs.find(p => (p._1, p._2) == ((1L, 5L)))
      .foreach { case (_, _, j) => assert(j == 0.8) }
  }

  test("simhash: identical token sets have distance 0 and pair up") {
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((1L, 2L)) == 0 && m((1L, 3L)) == 0 && m((2L, 3L)) == 0)
  }

  test("ngram jaccard: permutation is NOT a bigram dup, exact copy is") {
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 2,
        threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((1L, 2L)))   // identical bigrams
    assert(!keys.contains((1L, 3L)))  // shuffled word order breaks bigrams
  }

  test("lake paths (no broadcast) are result-identical to the bench paths") {
    // the 100 TB flags swap broadcast attaches for shuffle joins and the
    // driver doc-freq map for the inverted-index ranking — candidates,
    // verification, and output must not change, only the plan.
    // Real-corpus slice so prefixes/bands are non-trivial.
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id_a", "id_b").collect().toSeq
    assert(
      canon(Dedup.minhashPairs(corpus, "text", "doc_id", broadcastSets = false)) ==
      canon(Dedup.minhashPairs(corpus, "text", "doc_id", broadcastSets = true)))
    assert(
      canon(Dedup.simhashPairs(corpus, "text", "doc_id", broadcastFingerprints = false)) ==
      canon(Dedup.simhashPairs(corpus, "text", "doc_id", broadcastFingerprints = true)))
    assert(
      canon(Dedup.ngramJaccardPairs(corpus, "text", "doc_id",
        broadcastSets = false, broadcastDocFreq = false)) ==
      canon(Dedup.ngramJaccardPairs(corpus, "text", "doc_id",
        broadcastSets = true, broadcastDocFreq = true)))
  }

  test("maxBucket bounds a synthetic template clique's candidate volume") {
    // the hot-band failure mode at 100 TB: ~30% of the corpus is one
    // template. 30 identical docs share every band bucket (size 30);
    // distinct fillers land in small buckets. An 8-cap must drop every
    // clique bucket (so ZERO of the 435 quadratic clique pairs survive)
    // while leaving small-bucket pairs untouched — and the audit must
    // see the buckets it dropped.
    val clique = (1 to 30).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog"))
    val fillers = Seq(
      (100L, "alpha beta gamma delta"),
      (101L, "alpha beta gamma delta epsilon zeta"),
      (102L, "totally different content about distributed engines"))
    val skewed = (clique ++ fillers).toDF("doc_id", "text")
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select($"id_a", $"id_b").as[(Long, Long)].collect().toSet

    val uncapped = keys(Dedup.minhashPairs(skewed, "text", "doc_id",
      k = 16, bands = 4, threshold = 0.6))
    val capped = keys(Dedup.minhashPairs(skewed, "text", "doc_id",
      k = 16, bands = 4, threshold = 0.6, maxBucket = 8))
    val cliquePairs = uncapped.filter { case (a, b) => a <= 30 && b <= 30 }
    assert(cliquePairs.size == 435, s"clique must fully pair: ${cliquePairs.size}")
    assert(capped.subsetOf(uncapped))
    assert(capped.forall { case (a, b) => a > 30 || b > 30 },
      "no quadratic clique pair may survive the cap")
    assert(capped == uncapped -- cliquePairs,
      "small-bucket pairs must be untouched by the cap")

    // audit: the stats table sees the oversized buckets the cap dropped
    val oversized = Dedup.minhashBandStats(skewed, "text", "doc_id",
        k = 16, bands = 4)
      .filter($"n_docs" > 8).count()
    assert(oversized >= 1L)

    // same guard on the other two banded families
    val simCapped = keys(Dedup.simhashPairs(skewed, "text", "doc_id",
      maxHamming = 3, maxBucket = 8))
    assert(simCapped.forall { case (a, b) => a > 30 || b > 30 })
    val ngCapped = keys(Dedup.ngramJaccardPairs(skewed, "text", "doc_id",
      n = 2, threshold = 0.5, maxBucket = 8))
    assert(ngCapped.forall { case (a, b) => a > 30 || b > 30 })
    // lake route applies the same posting cap
    val ngCappedLake = keys(Dedup.ngramJaccardPairs(skewed, "text", "doc_id",
      n = 2, threshold = 0.5, broadcastSets = false, broadcastDocFreq = false,
      maxBucket = 8))
    assert(ngCappedLake == ngCapped)

    // incremental (daily-production) shape: corpus-side postings are
    // capped, so a batch doc whose only collisions are the hot template
    // loses dup_near — but dup_exact rides the hash join, untouched
    val corpus = skewed.filter($"doc_id" =!= 1L)
    val batch = skewed.filter($"doc_id" === 1L)
    val flags = Dedup.incrementalDupFlags(corpus, batch, "text", "doc_id",
        k = 16, bands = 4, threshold = 0.6, maxBucket = 8)
      .select($"doc_id", $"dup_exact", $"dup_near")
      .as[(Long, Boolean, Boolean)].head()
    assert(flags == ((1L, true, false)), flags)
    val flagsUncapped = Dedup.incrementalDupFlags(corpus, batch, "text",
        "doc_id", k = 16, bands = 4, threshold = 0.6)
      .select($"doc_id", $"dup_exact", $"dup_near")
      .as[(Long, Boolean, Boolean)].head()
    assert(flagsUncapped == ((1L, true, true)), flagsUncapped)
  }

  test("dupClusters: components, sizes, canonical flags — multi-hop path converges") {
    // component {1,2,3,4,5} is a PATH (worst case for label propagation:
    // min must walk 4 hops), {10,11} a pair, 20 isolated (absent)
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("id_a", "id_b")
    val out = Dedup.dupClusters(pairs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L, 10L, 11L))
    Seq(1L, 2L, 3L, 4L, 5L).foreach { n =>
      assert(out(n) == ((1L, 5L, n == 1L)), s"node $n -> ${out(n)}")
    }
    Seq(10L, 11L).foreach { n =>
      assert(out(n) == ((10L, 2L, n == 10L)), s"node $n -> ${out(n)}")
    }
  }

  test("dupClusters scale guardrail: log-round convergence, flat logical plan") {
    // Path graph of diameter 200 — the label-propagation worst case.
    // Two bounds, both of which the r4 persist()-only implementation
    // violated: (1) pointer jumping must converge within
    // ceil(log2 diameter)+2 rounds (maxIter below — the require() in
    // dupClusters fails the test otherwise); (2) the returned plan must
    // stay a few nodes over a LogicalRDD leaf. persist() alone leaves
    // the logical tree self-referential 3× per round (~3^rounds nodes,
    // measured 2.1e9-char plan strings at sf0.1) — only a per-round
    // lineage cut (localCheckpoint) keeps it flat. Teeth verified:
    // reverting the loop to persist() makes this test ABORT the suite
    // with a fatal plan-growth error before either assert is reached.
    val n = 200
    val pairs = (1 to n).map(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    val maxIter = math.ceil(math.log(n.toDouble) / math.log(2.0)).toInt + 2
    // driverEdgeCap = 0 forces the distributed loop — the path whose
    // round/plan bounds this test pins (the default quotient fast path
    // never iterates)
    val out = Dedup.dupClusters(pairs, maxIter = maxIter, driverEdgeCap = 0)
    val rows = out.select($"doc_id", $"cluster_id", $"cluster_size")
      .as[(Long, Long, Long)].collect()
    assert(rows.length == n + 1)
    assert(rows.forall { case (_, c, s) => c == 1L && s == n + 1L })
    val planLen = out.queryExecution.logical.treeString.length
    assert(planLen < 10000, s"logical plan blew up: $planLen chars")
  }

  test("dupClusters matches a union-find oracle on random graphs") {
    // The contraction + pointer-jump pipeline against a straightforward
    // driver union-find, over graph shapes a path/clique fixture misses:
    // sparse forests, dense blobs, rings, and singleton-free edge soups.
    val rnd = new scala.util.Random(20260812L)
    (1 to 8).foreach { trial =>
      val n = 30 + rnd.nextInt(120)
      val m = 1 + rnd.nextInt(3 * n)
      val edges = Seq.fill(m) {
        // ids sparse + shuffled so node id order carries no structure
        val a = rnd.nextInt(n) * 7919L + 13
        val b = rnd.nextInt(n) * 7919L + 13
        (a, b)
      }.filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = parent.keys.map(x => x -> find(x)).toMap
        // BOTH finishing strategies against the oracle: the default
        // quotient fast path (driver union-find) and the distributed
        // pointer-jumping loop (driverEdgeCap = 0) — fastpath ≡ loop ≡
        // oracle on every trial
        Seq(1 << 20, 0).foreach { cap =>
          val got = Dedup.dupClusters(edges.toDF("id_a", "id_b"),
              driverEdgeCap = cap)
            .select($"doc_id", $"cluster_id", $"cluster_size", $"is_canonical")
            .as[(Long, Long, Long, Boolean)].collect()
          assert(got.length == want.size, s"trial $trial cap $cap: node count")
          got.foreach { case (node, cid, size, canon) =>
            assert(cid == want(node), s"trial $trial cap $cap node $node")
            assert(size == want.values.count(_ == want(node)).toLong,
              s"trial $trial cap $cap node $node size")
            assert(canon == (node == cid),
              s"trial $trial cap $cap node $node canonical")
          }
        }
      }
    }
  }

  test("dupClusters: empty pair set yields empty output; maxIter bound enforced") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.dupClusters(empty).isEmpty)
    // self-loop input (never produced by the pair kernels, which enforce
    // id_a < id_b) degrades gracefully to a singleton cluster
    val self = Seq((7L, 7L)).toDF("id_a", "id_b")
    assert(Dedup.dupClusters(self).collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))) ==
      Seq((7L, 7L, 1L, true)))
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("id_a", "id_b")
    // the maxIter bound guards the LOOP path (the fast path never
    // iterates) — force it with driverEdgeCap = 0
    intercept[IllegalArgumentException] {
      Dedup.dupClusters(path, maxIter = 2, driverEdgeCap = 0).collect()
    }
  }

  test("incrementalDupFlags: batch flagged against corpus, both flag kinds") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "completely different content about spark engines"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (20L, "The quick brown  fox jumps over the lazy DOG"), // exact (normalized)
      // permutation: token SET equals corpus 10's (identical minhash
      // signature -> guaranteed band collision, jaccard 1.0) but the
      // normalized text differs -> near-dup only, deterministically
      (21L, "dog lazy the over jumps fox brown quick the"),
      (22L, "unrelated text with no counterpart anywhere"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalDupFlags(corpus, batch, "text", "doc_id",
        k = 16, bands = 4, threshold = 0.6)
      .as[(Long, Boolean, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(20L) == ((true, true)), out(20L))  // exact implies near too
    assert(out(21L) == ((false, true)), out(21L))
    assert(out(22L) == ((false, false)), out(22L))
    // corpus docs never appear in the output — only the batch is flagged
    assert(out.keySet == Set(20L, 21L, 22L))
    // shuffle (lake) arm is result-identical
    val lake = Dedup.incrementalDupFlags(corpus, batch, "text", "doc_id",
        k = 16, bands = 4, threshold = 0.6, broadcastSets = false)
      .as[(Long, Boolean, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(lake == out)
  }

  test("embedding cosine: brute top-k exact, LSH candidates agree where bucketed") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.1f)))
      .toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 0L)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val top = Similarity.bruteTopK(vecs, q, "vec_id", "embedding", "qid", "qe", k = 3)
      .orderBy($"rank").select($"neighbor_id").as[Long].collect()
    assert(top.toSeq == Seq(1L, 2L, 3L))
    val buckets = vecs.select($"vec_id",
        Similarity.lshBucketPacked("embedding", 8).as("b"))
      .as[(Long, Long)].collect().toMap
    // opposite vectors must land in different buckets (all signs flip)
    assert(buckets(0L) != buckets(3L))
  }
}
