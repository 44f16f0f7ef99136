package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class IvfSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val queries = emb.filter($"vec_id" < 8)
    .select($"vec_id".as("qid"), $"embedding".as("qe"))

  test("nprobe == k cells reproduces brute-force exactly") {
    val model = Ivf.fit(emb, "vec_id", "embedding", k = 4, iters = 2)
    val ivf = Ivf.topK(emb, queries, "vec_id", "embedding", "qid", "qe",
        model, k = 5, nprobe = 4)
      .select($"qid", $"rank", $"neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val brute = Similarity.bruteTopK(emb, queries, "vec_id", "embedding",
        "qid", "qe", k = 5)
      .select($"qid", $"rank", $"neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(ivf == brute)
  }

  test("nprobe < cells trades recall, keeps useful accuracy") {
    val model = Ivf.fit(emb, "vec_id", "embedding", k = 8, iters = 3)
    val ivf = Ivf.topK(emb, queries, "vec_id", "embedding", "qid", "qe",
        model, k = 5, nprobe = 4)
      .select($"qid", $"neighbor_id").as[(Long, Long)].collect().toSet
    val brute = Similarity.bruteTopK(emb, queries, "vec_id", "embedding",
        "qid", "qe", k = 5)
      .select($"qid", $"neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall")
    // every returned neighbor must carry the exact cosine rank order
    val ranks = Ivf.topK(emb, queries, "vec_id", "embedding", "qid", "qe",
        model, k = 5, nprobe = 4)
      .groupBy($"qid").agg(max($"rank").as("mx"), count(lit(1)).as("n"))
      .as[(Long, Int, Long)].collect()
    ranks.foreach { case (_, mx, n) => assert(mx == n) }
  }

  test("topKAdc ranks identically to topKOn over the reconstruction") {
    // the production code-only serving plan must return the same rows
    // in the same order as the reconstruction-shipping composition —
    // the ADC ≡ reconstruction contract applied end-to-end
    val pq = Pq.fit(emb, "vec_id", "embedding", m = 16, k = 256)
    val cells = Ivf.fit(emb, "vec_id", "embedding", k = 8, iters = 0)
    val q = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val adc = Ivf.topKAdc(emb, q, "vec_id", "embedding",
        "query_id", "qe", cells, pq, k = 5, nprobe = 4)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    val withRecon = emb.select($"vec_id", $"embedding",
      Pq.reconstruct($"embedding", pq).as("recon"))
    val recon = Ivf.topKOn(withRecon, q, "vec_id", "embedding", "recon",
        "query_id", "qe", cells, k = 5, nprobe = 4)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(adc.nonEmpty)
    assert(adc == recon, "ADC and reconstruction serving plans diverge")
  }

  test("incremental index: old ∪ batch encodes serve identically to a whole-corpus encode") {
    // under FROZEN models, encoding arrivals separately and appending
    // must be indistinguishable from re-encoding everything — the
    // contract that makes index maintenance map-only append
    val old = emb.filter($"vec_id" % 8 =!= 0)
    val batch = emb.filter($"vec_id" % 8 === 0)
    val pq = Pq.fit(old, "vec_id", "embedding", m = 16, k = 256)
    val cells = Ivf.fit(old, "vec_id", "embedding", k = 8, iters = 0)
    def enc(df: org.apache.spark.sql.DataFrame) =
      Ivf.assign(df, "vec_id", "embedding", cells)
        .select($"vec_id", Pq.codes($"embedding", pq).as("codes"), $"cell")
    val q = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val incr = Ivf.topKAdcOnIndex(enc(old).unionByName(enc(batch)), q,
        "vec_id", "query_id", "qe", cells, pq, k = 5, nprobe = 4)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    val whole = Ivf.topKAdc(emb, q, "vec_id", "embedding",
        "query_id", "qe", cells, pq, k = 5, nprobe = 4)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(incr.nonEmpty)
    assert(incr == whole, "append-encoded index diverges from full re-encode")
  }

  test("tombstone serving: retracted ids never served, ≡ rebuild without them") {
    // deletion via tombstone anti-join must be indistinguishable from
    // the rebuild it avoids: serving (full index ∖ tombstones) equals
    // serving an index that never contained the retracted rows, under
    // the same frozen models — and no retracted id ever surfaces
    val pq = Pq.fit(emb, "vec_id", "embedding", m = 16, k = 256)
    val cells = Ivf.fit(emb, "vec_id", "embedding", k = 8, iters = 0)
    def enc(df: org.apache.spark.sql.DataFrame) =
      Ivf.assign(df, "vec_id", "embedding", cells)
        .select($"vec_id", Pq.codes($"embedding", pq).as("codes"), $"cell")
    val q = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val tomb = emb.filter($"vec_id" % 8 === 3).select($"vec_id")
    val served = Ivf.topKAdcOnIndexWithTombstones(enc(emb), tomb, q,
        "vec_id", "query_id", "qe", cells, pq, k = 5, nprobe = 4)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(served.nonEmpty)
    assert(!served.exists(_._2 % 8 == 3), "a tombstoned id was served")
    val rebuilt = Ivf.topKAdcOnIndex(enc(emb.filter($"vec_id" % 8 =!= 3)),
        q, "vec_id", "query_id", "qe", cells, pq, k = 5, nprobe = 4)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(served == rebuilt,
      "tombstone-serve diverges from the rebuild it stands in for")
  }

  test("compactTombstones: rewrites only affected cells, drops dead ones") {
    // the scheduled rebuild behind the serve-time anti-join: tombstoned
    // rows leave the lake, untouched cells keep their files, and a cell
    // whose EVERY row is tombstoned disappears entirely (dynamic
    // overwrite alone would leave its stale files behind)
    val tmp = java.nio.file.Files.createTempDirectory("ivf_compact")
    val lake = s"$tmp/index"
    try {
      val rows = (0L until 40L).map(i =>
        (i, Seq.fill(16)((i % 7).toInt), (i % 4).toInt))
      rows.toDF("vec_id", "codes", "cell")
        .write.partitionBy("cell").parquet(lake)
      // cell 2: fully tombstoned; cell 1: partially; cells 0/3 untouched
      val tomb = ((0L until 40L).filter(_ % 4 == 2) ++ Seq(1L, 5L))
        .toDF("vec_id")
      val untouchedBefore = new java.io.File(s"$lake/cell=0")
        .listFiles().map(f => (f.getName, f.lastModified)).toSet
      val removed = Ivf.compactTombstones(spark, lake, tomb, "vec_id")
      assert(removed === 12L)
      val back = spark.read.parquet(lake)
      assert(back.count() === 28L)
      assert(back.join(tomb, Seq("vec_id"), "left_semi").isEmpty,
        "a tombstoned row survived compaction")
      assert(!new java.io.File(s"$lake/cell=2").exists,
        "a fully-tombstoned cell must lose its partition directory")
      val untouchedAfter = new java.io.File(s"$lake/cell=0")
        .listFiles().map(f => (f.getName, f.lastModified)).toSet
      assert(untouchedAfter === untouchedBefore,
        "an unaffected cell was rewritten")
      // idempotent: a second pass finds nothing to do
      assert(Ivf.compactTombstones(spark, lake, tomb, "vec_id") === 0L)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("serveAdcStream serves the same rows as the batch topKAdc plan") {
    // the streaming deployment of the end-state serving plan must
    // return exactly the batch plan's rows: same probe set, same ADC
    // arithmetic, and the windowed collect+sort top-k must reproduce
    // row_number's (−cosine, neighbor) total order
    val pq = Pq.fit(emb, "vec_id", "embedding", m = 16, k = 256)
    val cells = Ivf.fit(emb, "vec_id", "embedding", k = 8, iters = 0)
    val index = Ivf.assign(emb, "vec_id", "embedding", cells)
      .select($"vec_id", Pq.codes($"embedding", pq).as("codes"), $"cell")
    val q = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val batch = Ivf.topKAdc(emb, q, "vec_id", "embedding",
        "query_id", "qe", cells, pq, k = 5, nprobe = 4)
      .select($"query_id", $"neighbor_id", $"rank".cast("int"))
      .as[(Long, Long, Int)].collect().toSet

    import org.apache.spark.sql.streaming.Trigger
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("serve_stream")
    val ckpt = java.nio.file.Files.createTempDirectory("serve_ckpt")
    try {
      val sent = Seq((-1L, Array.fill(64)(0.0f))).toDF("query_id", "qe")
        .select($"query_id", $"qe",
          timestamp_micros(lit(4102444800000000L)).as("ts"))
      q.withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
        .unionByName(sent).coalesce(1)
        .write.mode("overwrite").parquet(dir.toString)
      val stream = spark.readStream
        .schema("query_id LONG, qe ARRAY<FLOAT>, ts TIMESTAMP")
        .parquet(dir.toString)
      val out = Ivf.serveAdcStream(index, stream, "vec_id",
        "query_id", "qe", "ts", cells, pq, k = 5, nprobe = 4)
      out.writeStream.format("memory").queryName("serve_out")
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start().awaitTermination()
      val streamed = spark.table("serve_out")
        .filter($"query_id" >= 0)
        .select($"query_id", posexplode($"topk"))
        .select($"query_id", $"col.neighbor_id".as("neighbor_id"),
          ($"pos" + 1).cast("int").as("rank"))
        .as[(Long, Long, Int)].collect().toSet
      spark.catalog.dropTempView("serve_out")
      assert(streamed.nonEmpty)
      assert(streamed == batch, "stream and batch serving plans diverge")
    } finally {
      Seq(ckpt, dir).foreach { d =>
        java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
  }

  test("balancedSample: one row per vector, smallest cell fully kept") {
    val model = Ivf.fit(emb, "vec_id", "embedding", k = 8, iters = 2)
    val s = Ivf.balancedSample(emb, "vec_id", "embedding", model)
      .select($"vec_id", $"cell", $"cell_n", $"keep")
      .as[(Long, Int, Int, Boolean)].collect()
    assert(s.length == emb.count(), "sampling must not drop or dup rows")
    assert(s.map(_._1).distinct.length == s.length)
    assert(s.forall { case (_, c, n, _) => c >= 0 && c < 8 && n > 0 })
    // cell_n is consistent per cell and matches the actual population
    val pop = s.groupBy(_._2).view.mapValues(_.length).toMap
    s.foreach { case (_, c, n, _) => assert(n == pop(c)) }
    // the smallest cell's keep rate is target/target = 1: every member
    // survives (hash % n < n always) — the balance anchor
    val minN = pop.values.min
    s.filter(_._3 == minN).foreach { case (id, _, _, keep) =>
      assert(keep, s"vector $id in a smallest cell must be kept")
    }
    // larger cells must actually subsample (kept strictly fewer than
    // population) whenever they are meaningfully bigger than target
    pop.filter(_._2 > 2 * minN).keys.foreach { c =>
      val kept = s.count(r => r._2 == c && r._4)
      assert(kept < pop(c), s"cell $c kept all ${pop(c)} rows")
    }
  }
}
