package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkTestBase
import graft.text.TextOps

/** Out-of-order replay for qst23's admission chain SHAPE: the exact
  * collapse → join-back → frozen-gate pipeline (windowed
  * groupBy(window, fingerprintMd5) agg(min(doc_id), count) under a
  * watermark, stream-static equi-join to the stored corpus, then a
  * typed gate map over a broadcast sorted gram array — the same
  * WordNgramHashes.compute + binarySearch kernel qst23 runs), driven
  * with the recrawl copy arriving in a LATER micro-batch than the
  * original. WindowFlushSpec pins the generic windowed-aggregate
  * merge; this spec pins the admission chain's composition of it:
  * canonical = MIN(doc_id) regardless of arrival order, n_copies
  * counts both deliveries, and every downstream gate flag is computed
  * from the COLLAPSED canonical row — so the split delivery's output
  * is row-identical to the single-batch delivery's.
  */
class AdmissionReplaySpec extends SparkTestBase {
  import spark.implicits._

  private val sentinelTs = Timestamp.valueOf("2100-01-01 00:00:00")
  private val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
  private val t0late = Timestamp.valueOf("2024-01-01 10:20:00")

  // the stored corpus (canonical ids only — a recrawl copy's id is
  // never in the store, exactly qst23's join-back shape)
  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon"),
    (2L, "the quick brown fox jumps over"),
    (3L, "one two three four five six"),
    (4L, "red green blue cyan magenta yellow"))

  /** qst23's stage-1..3 chain over an arriving (doc_id, text, ts)
    * stream: collapse on content fingerprint inside the event-time
    * window, join back to the stored corpus, gate against the frozen
    * gram broadcast with the batch kernels.
    */
  private def admissionChain(arr: DataFrame, docs: DataFrame,
      evalGrams: Array[Long]): DataFrame = {
    val bc = spark.sparkContext.broadcast(evalGrams)
    val collapsed = arr
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"),
        TextOps.fingerprintMd5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"),
        count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"))
    collapsed
      .join(docs, Seq("doc_id"))
      .as[(Long, Long, String)]
      .map { case (id, nCopies, text) =>
        val grams = graft.functions.WordNgramHashes.compute(
          UTF8String.fromString(text), 3).toLongArray()
        val deconKeep = !grams.exists(g =>
          java.util.Arrays.binarySearch(bc.value, g) >= 0)
        val qualKeep = text.length >= 28
        (id, nCopies, deconKeep, qualKeep, deconKeep && qualKeep)
      }
      .toDF("doc_id", "n_copies", "decon_keep", "qual_keep", "admit")
  }

  /** Drive the chain over the given delivery schedule (each inner Seq
    * is one micro-batch), flush with the 2100 sentinel, return the
    * non-sentinel rows.
    */
  private def run(name: String,
      batches: Seq[Seq[(Long, String, Timestamp)]],
      evalGrams: Array[Long]): Set[(Long, Long, Boolean, Boolean, Boolean)] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val docs = corpus.toDF("doc_id", "text")
    val out = admissionChain(mem.toDF().toDF("doc_id", "text", "ts"),
      docs, evalGrams)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }
      // sentinel: advances the watermark so the 10:00 window flushes;
      // its own group (doc_id -1, not in the corpus) never surfaces —
      // the join-back drops it, the same double safety qst23 has
      mem.addData((-1L, "", sentinelTs))
      q.processAllAvailable()
      spark.table(name)
        .as[(Long, Long, Boolean, Boolean, Boolean)]
        .collect().toSet
    } finally q.stop()
  }

  test("recrawl copy in a LATER micro-batch collapses onto the original: " +
      "canonical = MIN(doc_id), n_copies = 2, gate flags identical to " +
      "the single-batch delivery") {
    // frozen decon artifact: doc 2's grams, so the decon gate
    // genuinely rejects one survivor
    val evalGrams = graft.functions.WordNgramHashes.compute(
      UTF8String.fromString(corpus(1)._2), 3).toLongArray().sorted
    val originals = corpus.map { case (id, tx) => (id, tx, t0) }
    // recrawl copies of docs 2 and 4 under fresh ids (+10000), the
    // qst23 device, both still inside the watermark and window
    val copies = Seq(
      (10002L, corpus(1)._2, t0late),
      (10004L, corpus(3)._2, t0late))

    val oneBatch = run("adm_one", Seq(originals ++ copies), evalGrams)
    val split = run("adm_split", Seq(originals, copies), evalGrams)

    // the OOO pin: split delivery ≡ single-batch delivery, row for row
    assert(split === oneBatch, s"split=$split one=$oneBatch")
    // canonical is the MIN doc_id (the original), never the copy's id
    assert(split.map(_._1) === Set(1L, 2L, 3L, 4L))
    // the collapse genuinely tripped across micro-batches
    val copies2 = split.filter(_._2 == 2L).map(_._1)
    assert(copies2 === Set(2L, 4L), split.toString)
    // per-gate flags computed from the canonical row: doc 2 is the
    // decon hit (admit=false) yet still collapsed to n_copies=2
    val d2 = split.find(_._1 == 2L).get
    assert(!d2._3 && !d2._5)
    assert(split.filter(_._1 != 2L).forall(_._3), split.toString)
  }

  test("a copy arriving AFTER its window flushed surfaces as its own " +
      "late canonical, not a silent drop — the watermark contract") {
    val evalGrams = Array.empty[Long]
    // batch 1: original; batch 2: far-future row advances the
    // watermark past the 10:00 window (flushes doc 1, n_copies=1);
    // batch 3: the copy, now LATE beyond the watermark — the engine
    // drops it (no state to merge into), so the output holds exactly
    // the flushed original. This is the boundary the 1-hour watermark
    // buys: inside it, the previous test's merge; beyond it, a
    // documented drop rather than a phantom second canonical.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val docs = corpus.toDF("doc_id", "text")
    val out = admissionChain(mem.toDF().toDF("doc_id", "text", "ts"),
      docs, evalGrams)
    val q = out.writeStream.format("memory").queryName("adm_late")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((1L, corpus.head._2, t0))
      q.processAllAvailable()
      mem.addData((-1L, "", Timestamp.valueOf("2024-06-01 00:00:00")))
      q.processAllAvailable()
      mem.addData((10001L, corpus.head._2, t0late)) // beyond watermark
      q.processAllAvailable()
      mem.addData((-2L, "x", sentinelTs))
      q.processAllAvailable()
      val got = spark.table("adm_late")
        .as[(Long, Long, Boolean, Boolean, Boolean)].collect().toSet
      assert(got.map(r => (r._1, r._2)) === Set((1L, 1L)), got.toString)
    } finally q.stop()
  }
}
