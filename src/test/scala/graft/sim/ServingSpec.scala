package graft.sim

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ServingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val queries = emb.filter($"vec_id" < 8)
    .select($"vec_id".as("query_id"), $"embedding".as("qe"))

  test("shortK = coarseK degrades to exact re-rank over the coarse candidates") {
    // with the ADC cut widened to the full coarse set, the composite's
    // answer must be EXACTLY the brute-force ranking restricted to the
    // popcount top-coarseK — the stage-1-ceiling property: the two
    // middle stages may only ever reorder-then-cut, never add
    val thr = Similarity.signThresholds(emb, "vec_id", "embedding")
    val pq = Pq.fit(emb, "vec_id", "embedding", m = 16, k = 256)
    val got = Serving.twoStageTopK(emb, queries,
        "vec_id", "embedding", "query_id", "qe", thr, pq,
        k = 5, coarseK = 50, shortK = 50)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    // reference: popcount top-50 (same key order), then exact cosine
    val codes = emb.select($"vec_id",
      Similarity.signBits($"embedding", thr).as("code"))
    val qCodes = queries.select($"query_id",
      Similarity.signBits($"qe", thr).as("qcode"))
    val wC = Window.partitionBy($"query_id").orderBy($"dist", $"neighbor_id")
    val coarse = codes.crossJoin(broadcast(qCodes))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        bit_count($"code".bitwiseXOR($"qcode")).as("dist"))
      .withColumn("rk", row_number().over(wC)).filter($"rk" <= 50)
      .select($"query_id", $"neighbor_id")
    val wX = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"neighbor_id")
    val expected = coarse
      .join(emb.select($"vec_id".as("neighbor_id"),
        $"embedding".as("nvec")), "neighbor_id")
      .join(broadcast(queries), "query_id")
      .select($"query_id", $"neighbor_id",
        Similarity.cosine($"nvec", $"qe").as("cosine"))
      .withColumn("rank", row_number().over(wX)).filter($"rank" <= 5)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(got === expected)
  }

  test("widening shortK only improves the exact-cosine mass of the final top-k") {
    // the staged cuts are monotone: candidates(shortK=a) ⊆
    // candidates(shortK=b) for a <= b at fixed coarseK, and an exact
    // re-rank over a superset can only raise (never lower) the summed
    // cosine of the final top-k — the property that makes shortK a
    // safe recall knob at serve time
    val thr = Similarity.signThresholds(emb, "vec_id", "embedding")
    val pq = Pq.fit(emb, "vec_id", "embedding", m = 16, k = 256)
    def mass(shortK: Int): Map[Long, Double] =
      Serving.twoStageTopK(emb, queries, "vec_id", "embedding",
          "query_id", "qe", thr, pq, k = 5, coarseK = 50, shortK = shortK)
        .groupBy($"query_id").agg(sum($"cosine").as("m"))
        .as[(Long, Double)].collect().toMap
    val m10 = mass(10); val m20 = mass(20); val m50 = mass(50)
    m10.keys.foreach { q =>
      assert(m10(q) <= m20(q) + 1e-12 && m20(q) <= m50(q) + 1e-12,
        s"query $q: cosine mass must be non-decreasing in shortK")
    }
  }

  test("stage 1 plans as a bounded aggregate — no corpus-wide window sort") {
    // the coarse filter's popcount scan is the design; ranking it with
    // a per-query Window would shuffle all N·|Q| candidate rows and
    // sort each query's full corpus in ONE task. The bounded top-k
    // aggregate must appear as an ObjectHashAggregate (partial +
    // final — map-side combine), and stage 1's plan must contain no
    // Window node at all
    val thr = Similarity.signThresholds(emb, "vec_id", "embedding")
    val pq = Pq.fit(emb, "vec_id", "embedding", m = 16, k = 256)
    val plan = Serving.binaryCoarseCandidates(emb, queries,
        "vec_id", "embedding", "query_id", "qe", thr, pq, coarseK = 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"stage 1 must be the bounded top-k aggregate:\n$plan")
    assert(!plan.contains("Window"),
      s"stage 1 must not rank through a window:\n$plan")
  }

  test("stage 1 candidates are exactly the window-rank top-coarseK") {
    // the primitive ≡ window pin on the real corpus: same entries per
    // query, same (dist asc, neighbor asc) key — the bounded aggregate
    // may never change WHICH candidates survive the coarse cut
    val thr = Similarity.signThresholds(emb, "vec_id", "embedding")
    val pq = Pq.fit(emb, "vec_id", "embedding", m = 16, k = 256)
    val got = Serving.binaryCoarseCandidates(emb, queries,
        "vec_id", "embedding", "query_id", "qe", thr, pq, coarseK = 50)
      .select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().toSet
    val codes = emb.select($"vec_id",
      Similarity.signBits($"embedding", thr).as("code"))
    val qCodes = queries.select($"query_id",
      Similarity.signBits($"qe", thr).as("qcode"))
    val wC = Window.partitionBy($"query_id").orderBy($"dist", $"neighbor_id")
    val expected = codes.crossJoin(broadcast(qCodes))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        bit_count($"code".bitwiseXOR($"qcode")).as("dist"))
      .withColumn("rk", row_number().over(wC)).filter($"rk" <= 50)
      .select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().toSet
    assert(got === expected)
  }

  test("shortlistStream flushes exactly the batch composite's stage-2 shortlist") {
    // stream ≡ batch for the streamed portion: per query, the flushed
    // shortlist must be the batch plan's srank <= shortK survivors in
    // the same (adc cosine desc, id) order — the popcount scan, the
    // bounded coarse aggregate, and the Scala-side ADC fold must all
    // reproduce the column-expression arithmetic bit-for-bit
    import org.apache.spark.sql.streaming.Trigger
    import scala.jdk.CollectionConverters._
    val thr = Similarity.signThresholds(emb, "vec_id", "embedding")
    val pq = Pq.fit(emb, "vec_id", "embedding", m = 16, k = 256)
    // batch reference: stages 1-2 of twoStageTopK at shortK = k so the
    // final exact re-rank touches exactly the shortlist (its member
    // set per query IS the stage-2 cut)
    val batch = Serving.twoStageTopK(emb, queries,
        "vec_id", "embedding", "query_id", "qe", thr, pq,
        k = 20, coarseK = 50, shortK = 20)
      .select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val art = emb.select($"vec_id",
      Similarity.signBits($"embedding", thr).as("bincode"),
      Pq.codes($"embedding", pq).as("pqcodes"))
    val dir = java.nio.file.Files.createTempDirectory("short_stream")
    val ckpt = java.nio.file.Files.createTempDirectory("short_ckpt")
    try {
      val sent = Seq((-1L, Array.fill(64)(0.0f))).toDF("query_id", "qe")
        .select($"query_id", $"qe",
          timestamp_micros(lit(4102444800000000L)).as("ts"))
      queries.withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
        .unionByName(sent).coalesce(1)
        .write.mode("overwrite").parquet(dir.toString)
      val stream = spark.readStream
        .schema("query_id LONG, qe ARRAY<FLOAT>, ts TIMESTAMP")
        .parquet(dir.toString)
      val out = Serving.shortlistStream(art, stream, "vec_id",
        "query_id", "qe", "ts", thr, pq, coarseK = 50, shortK = 20)
      out.writeStream.format("memory").queryName("short_out")
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start().awaitTermination()
      val streamed = spark.table("short_out")
        .filter($"query_id" >= 0)
        .select($"query_id", $"shortlist")
        .as[(Long, Seq[Long])].collect().toMap
      spark.catalog.dropTempView("short_out")
      assert(streamed.nonEmpty)
      assert(streamed.keySet === batch.keySet)
      streamed.foreach { case (q, ids) =>
        assert(ids.size === 20, s"query $q shortlist must hold shortK ids")
        assert(ids.toSet === batch(q),
          s"query $q: streamed shortlist diverges from batch stage 2")
      }
    } finally {
      Seq(ckpt, dir).foreach { d =>
        java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }

  test("shortlistStream under out-of-order micro-batch delivery: late-but-" +
      "in-watermark queries flush with batch-identical shortlists") {
    // The OOO replay arm for the windowed bounded-TopK aggregate the
    // qst10/qst12 rows ride (the SessionizeSpec two-half pattern): the
    // file-replay pin above delivers every query in ONE micro-batch,
    // so the sentinel-flush assumption — a query arriving LATE (inside
    // the watermark) still lands its (window, query) state and flushes
    // once with the exact batch shortlist — had never been exercised.
    // Half the queries arrive at 10:30 first, the other half arrive
    // AFTERWARD timestamped 10:00 (late, admitted: watermark is 09:30
    // after batch 1), a far-future sentinel flushes.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val thr = Similarity.signThresholds(emb, "vec_id", "embedding")
    val pq = Pq.fit(emb, "vec_id", "embedding", m = 16, k = 256)
    val batch = Serving.twoStageTopK(emb, queries,
        "vec_id", "embedding", "query_id", "qe", thr, pq,
        k = 20, coarseK = 50, shortK = 20)
      .select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val art = emb.select($"vec_id",
      Similarity.signBits($"embedding", thr).as("bincode"),
      Pq.codes($"embedding", pq).as("pqcodes"))
    val qLocal = queries.as[(Long, Array[Float])].collect()
    def at(t: String)(qs: Array[(Long, Array[Float])]) =
      qs.map { case (id, v) => (id, v, java.sql.Timestamp.valueOf(t)) }
    val mem = MemoryStream[(Long, Array[Float], java.sql.Timestamp)]
    val out = Serving.shortlistStream(art,
      mem.toDS().toDF("query_id", "qe", "ts"),
      "vec_id", "query_id", "qe", "ts", thr, pq, coarseK = 50, shortK = 20)
    val q = out.writeStream.format("memory").queryName("short_ooo")
      .outputMode("append").start()
    try {
      mem.addData(at("2024-01-01 10:30:00")(qLocal.filter(_._1 < 4)).toSeq: _*)
      q.processAllAvailable()
      mem.addData(at("2024-01-01 10:00:00")(qLocal.filter(_._1 >= 4)).toSeq: _*)
      q.processAllAvailable()
      mem.addData((-1L, Array.fill(64)(0.0f),
        java.sql.Timestamp.valueOf("2100-01-01 00:00:00")))
      q.processAllAvailable()
      val streamed = spark.table("short_ooo")
        .filter($"query_id" >= 0)
        .select($"query_id", $"shortlist")
        .as[(Long, Seq[Long])].collect()
      spark.catalog.dropTempView("short_ooo")
      // each query flushed exactly once — a double emission would
      // collide in toMap silently, so check multiplicity first
      assert(streamed.length === batch.size,
        s"expected one flush per query, got ${streamed.length}")
      assert(streamed.map(_._1).toSet === batch.keySet)
      streamed.foreach { case (qid, ids) =>
        assert(ids.toSet === batch(qid),
          s"query $qid: OOO-delivered shortlist diverges from batch stage 2")
      }
    } finally q.stop()
  }

  test("shortlistStreamIvf flushes exactly the IVF composite's stage-2 shortlist") {
    // the stream ≡ batch pin for the cell-probed form: per query, the
    // flushed shortlist must be twoStageTopKIvf's stage-2 survivors —
    // the probe flatMap, the stream-static cell join, the bounded
    // aggregate, and the typed ADC fold all reproducing the batch
    // column arithmetic
    import org.apache.spark.sql.streaming.Trigger
    import scala.jdk.CollectionConverters._
    val thr = Similarity.signThresholds(emb, "vec_id", "embedding")
    val pq = Pq.fit(emb, "vec_id", "embedding", m = 16, k = 256)
    val cells = Ivf.fit(emb, "vec_id", "embedding", k = 8, iters = 0)
    val batch = Serving.twoStageTopKIvf(emb, queries,
        "vec_id", "embedding", "query_id", "qe", cells, thr, pq,
        k = 20, coarseK = 50, shortK = 20, nprobe = 4)
      .select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val index = Ivf.assign(emb, "vec_id", "embedding", cells)
      .select($"vec_id",
        Similarity.signBits($"embedding", thr).as("bincode"),
        Pq.codes($"embedding", pq).as("pqcodes"), $"cell")
    val dir = java.nio.file.Files.createTempDirectory("shorti_stream")
    val ckpt = java.nio.file.Files.createTempDirectory("shorti_ckpt")
    try {
      val sent = Seq((-1L, Array.fill(64)(0.0f))).toDF("query_id", "qe")
        .select($"query_id", $"qe",
          timestamp_micros(lit(4102444800000000L)).as("ts"))
      queries.withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
        .unionByName(sent).coalesce(1)
        .write.mode("overwrite").parquet(dir.toString)
      val stream = spark.readStream
        .schema("query_id LONG, qe ARRAY<FLOAT>, ts TIMESTAMP")
        .parquet(dir.toString)
      val out = Serving.shortlistStreamIvf(index, stream, "vec_id",
        "query_id", "qe", "ts", cells, thr, pq,
        coarseK = 50, shortK = 20, nprobe = 4)
      out.writeStream.format("memory").queryName("shorti_out")
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start().awaitTermination()
      val streamed = spark.table("shorti_out")
        .filter($"query_id" >= 0)
        .select($"query_id", $"shortlist")
        .as[(Long, Seq[Long])].collect().toMap
      spark.catalog.dropTempView("shorti_out")
      assert(streamed.nonEmpty && streamed.keySet === batch.keySet)
      streamed.foreach { case (q, ids) =>
        assert(ids.toSet === batch(q),
          s"query $q: streamed IVF shortlist diverges from batch stage 2")
      }
    } finally {
      Seq(ckpt, dir).foreach { d =>
        java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }

  test("twoStageTopKIvf at nprobe = all cells degrades to the scan form exactly") {
    // probing every cell makes the probe a no-op filter, so the
    // IVF-composed coarse tier must rank the identical candidate pool
    // under the identical (dist, id) order — the two composites may
    // then differ in nothing
    val thr = Similarity.signThresholds(emb, "vec_id", "embedding")
    val pq = Pq.fit(emb, "vec_id", "embedding", m = 16, k = 256)
    val cells = Ivf.fit(emb, "vec_id", "embedding", k = 8, iters = 0)
    val ivf = Serving.twoStageTopKIvf(emb, queries,
        "vec_id", "embedding", "query_id", "qe", cells, thr, pq,
        k = 5, coarseK = 50, shortK = 20, nprobe = 8)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    val scan = Serving.twoStageTopK(emb, queries,
        "vec_id", "embedding", "query_id", "qe", thr, pq,
        k = 5, coarseK = 50, shortK = 20)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(ivf.nonEmpty && ivf === scan)
  }

  test("twoStageTopKIvf plans no Cartesian/NLJ anywhere — unlike the scan form") {
    // the whole point of composing the binary tier inside the probe:
    // the scan form's stage 1 is a deliberate broadcast-nested-loop
    // over the code column (documented in PlanGuardSpec); the IVF form
    // replaces it with the standard cell equi-join, so its ENTIRE plan
    // must be free of quadratic join nodes
    val thr = Similarity.signThresholds(emb, "vec_id", "embedding")
    val pq = Pq.fit(emb, "vec_id", "embedding", m = 16, k = 256)
    val cells = Ivf.fit(emb, "vec_id", "embedding", k = 8, iters = 0)
    val plan = Serving.twoStageTopKIvf(emb, queries,
        "vec_id", "embedding", "query_id", "qe", cells, thr, pq,
        k = 5, coarseK = 50, shortK = 20, nprobe = 4)
      .queryExecution.executedPlan.toString
    Seq("CartesianProduct", "BroadcastNestedLoopJoin").foreach { bad =>
      assert(!plan.contains(bad), s"IVF two-stage plan contains $bad:\n$plan")
    }
  }

  test("stage widths must nest: k <= shortK <= coarseK") {
    val thr = Similarity.signThresholds(emb, "vec_id", "embedding")
    val pq = Pq.fit(emb, "vec_id", "embedding", m = 16, k = 256)
    intercept[IllegalArgumentException] {
      Serving.twoStageTopK(emb, queries, "vec_id", "embedding",
        "query_id", "qe", thr, pq, k = 5, coarseK = 20, shortK = 50)
    }
  }
}
