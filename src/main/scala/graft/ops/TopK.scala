package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** One candidate of the bounded top-k aggregate: ordered ascending by
  * the lexicographic key `(v, w, id)` — `v` a double primary key
  * (negate for descending score order), `w` an exact long secondary
  * key (zero when unused — doubles above 2^53 lose ties, so exact
  * 60-bit hash keys ride here), `id` the unique row id that makes the
  * order total, and `pay` an opaque int-array payload carried through
  * the aggregate (PQ codes; empty when unused).
  */
case class TopKEntry(v: Double, w: Long, id: Long, pay: Seq[Int])

/** Bounded per-group top-k as a typed [[Aggregator]] — the partial-
  * aggregable replacement for `row_number().over(Window.partitionBy
  * (group))` + `filter(rank <= k)` when the per-group candidate set
  * is corpus-sized. The window form shuffles EVERY candidate row on
  * the group key and sorts each group's full candidate set in one
  * task — at 10^11 candidate rows that is a single-task sort per
  * group, the scale-killer a toy bench never sees. This aggregate
  * keeps a k-bounded sorted buffer per (map task, group) instead:
  * map-side combine folds each task's candidates down to at most k
  * entries BEFORE the exchange, so the one shuffle carries P·|groups|
  * buffers of ≤ k entries (not N rows), the final merge per group
  * touches at most k·P pre-sorted entries, and no task ever sorts
  * more than it keeps. Top-k of a union being the merge of
  * per-partition top-k's, the result is EXACTLY the window form's
  * (TopKSpec pins the equivalence; merge order cannot matter because
  * the (v, w, id) order is total).
  *
  * Per-row cost after warm-up is one compare against the current
  * k-th entry (the common miss path allocates nothing); an insert is
  * an O(k) array rebuild, which only happens while the row still
  * belongs to the running top-k.
  *
  * Physical note: a typed Aggregator plans as ObjectHashAggregate,
  * which falls back to SORT-based object aggregation once a task sees
  * more than `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  * groups (default 128 — domain-cardinality consumers like
  * [[graft.text.Urls.domainCap]] cross it immediately). The fallback
  * keeps the contract that matters: partials are still folded per
  * task and the exchange still carries k-bounded buffers, never input
  * rows — the cost is one task-local, spillable sort by GROUP key
  * (not a within-group rank, so a hot group still never lands on one
  * task). Raise the threshold when group counts per task are modest
  * and profiling shows the fallback sort dominating.
  */
class BoundedTopK(k: Int)
    extends Aggregator[TopKEntry, Seq[TopKEntry], Seq[TopKEntry]] {
  require(k >= 1, s"k must be >= 1, got $k")

  private def lt(a: TopKEntry, b: TopKEntry): Boolean =
    a.v < b.v || (a.v == b.v && (a.w < b.w || (a.w == b.w && a.id < b.id)))

  /** Insert `a` into the sorted bounded buffer `b` (no-op when `b` is
    * full and `a` sorts after its last entry).
    */
  private def insert(b: Seq[TopKEntry], a: TopKEntry): Seq[TopKEntry] =
    if (b.size >= k && !lt(a, b.last)) b
    else {
      val pos = b.indexWhere(e => lt(a, e)) match {
        case -1 => b.size
        case p  => p
      }
      val grown = (b.take(pos) :+ a) ++ b.drop(pos)
      if (grown.size > k) grown.take(k) else grown
    }

  override def zero: Seq[TopKEntry] = Vector.empty

  override def reduce(b: Seq[TopKEntry], a: TopKEntry): Seq[TopKEntry] =
    insert(b, a)

  override def merge(b1: Seq[TopKEntry], b2: Seq[TopKEntry]): Seq[TopKEntry] =
    if (b1.isEmpty) b2
    else if (b2.isEmpty) b1
    else b2.foldLeft(b1)(insert)

  /** The group's top-k, ascending in (v, w, id) — element position + 1
    * IS the rank.
    */
  override def finish(b: Seq[TopKEntry]): Seq[TopKEntry] = b

  override def bufferEncoder: Encoder[Seq[TopKEntry]] =
    ExpressionEncoder[Seq[TopKEntry]]()
  override def outputEncoder: Encoder[Seq[TopKEntry]] =
    ExpressionEncoder[Seq[TopKEntry]]()
}

/** The bounded per-group top-k primitive, packaged for DataFrame use:
  * `df.groupBy(group).agg(TopK.topK(k)(v, w, id, pay).as("tk"))`
  * yields per group an `array<struct<v,w,id,pay>>` of its k smallest
  * `(v, w, id)` entries in rank order — `posexplode` recovers
  * (rank−1, entry) rows. Plan shape: ObjectHashAggregate with a
  * partial (map-side combine) stage — never a Window, never a
  * corpus-wide sort (ServingSpec and PlanGuardSpec watch the
  * consumers).
  *
  * Consumers: [[graft.sim.Serving.twoStageTopK]] stage 1 (v = Hamming
  * distance, pay = PQ codes) and [[graft.text.Urls.domainCap]]'s
  * per-domain keep threshold (w = 60-bit salted hash, id tiebreak).
  */
object TopK {
  def topK(k: Int): UserDefinedFunction = udaf(new BoundedTopK(k))
}
