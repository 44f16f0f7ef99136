package graft.adjust

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{AsOf, Cumulative}

/** Split / total-return factor construction — the analytic core of the
  * reference (legacy_scripts/factor_builder.py). The reference fans out
  * one OS process per security with dimension tables broadcast through
  * pool-initializer globals (factor_builder.py:21-27,355-412); here the
  * same math is a single lazy plan: broadcast dim joins + window
  * functions partitioned by security id — Spark's native form of that
  * parallelism, with no per-id driver loop to bottleneck at 100 TB.
  *
  * Semantics preserved (SURVEY.md §7.4 watch list):
  *  - forward as-of event alignment, exact matches allowed, events after
  *    the last trading day dropped (factor_builder.py:261-267,320-326);
  *  - same-day multi-events multiply BEFORE the cumulative product
  *    (factor_builder.py:269,328);
  *  - anchor-to-last: factors are divided by their final value so the
  *    adjusted series equals the raw series on the latest bar
  *    (factor_builder.py:273-276,335-336);
  *  - TR day factor g = (prior_base - amount)/prior_base, masked to
  *    amount AND prior present AND prior > 0, g may be <= 0
  *    (factor_builder.py:331-333) — handled by the sign-safe cumprod.
  */
object Factors {

  val NoFigiPrefix = "NOFIGI__"

  /** Event-table projection for [[selectEvents]]: ticker + the named
    * payload columns, carrying composite_figi through when the refdata
    * has it (factor_builder.py:204-208 tolerates its absence).
    *
    * Input contract (same philosophy as [[attachId]]): `ticker` must
    * already be canonical — the reference normalizes every ticker with
    * strip().upper() on load (factor_builder.py:203,225); this engine
    * does that once at ingest ([[graft.source.Normalize]]), not per
    * event selection, so case- or whitespace-divergent refdata must go
    * through Normalize first or its events select nothing.
    */
  def eventCols(events: DataFrame, payload: String*): DataFrame = {
    val keep = Seq("ticker") ++ payload ++
      (if (events.columns.contains("composite_figi")) Seq("composite_figi") else Nil)
    events.select(keep.map(col): _*)
  }

  /** Point-in-time identity attach (factor_builder.py:148-180): for each
    * bar pick the security-master row whose validity window
    * [effective_start, effective_end] contains the bar's day — NULL end
    * = open window — preferring in-window rows, then latest
    * effective_start; id falls back to NOFIGI__ticker when no in-window
    * FIGI exists.
    */
  def attachId(bars: DataFrame, securityMaster: DataFrame): DataFrame = {
    val sm = broadcast(securityMaster.select(
      col("ticker").as("sm_ticker"), col("composite_figi"),
      col("effective_start"), col("effective_end")))
    val withDay = bars.withColumn("event_day", to_date(col("datetime")))
    val joined = withDay.join(sm, withDay("ticker") === sm("sm_ticker"), "left")
      .withColumn("in_window",
        (col("effective_start").isNull || col("event_day") >= col("effective_start")) &&
          (col("effective_end").isNull || col("event_day") <= col("effective_end")))
    val w = Window.partitionBy(col("ticker"), col("datetime"))
      .orderBy(col("in_window").desc, col("effective_start").desc_nulls_last)
    joined
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .withColumn("id",
        when(col("in_window") && col("composite_figi").isNotNull, col("composite_figi"))
          .otherwise(concat(lit(NoFigiPrefix), col("ticker"))))
      .drop("sm_ticker", "effective_start", "effective_end", "in_window", "__rk",
        "composite_figi")
  }

  /** Distinct (id, ticker, event_day) trading-day grid. */
  def idDays(barsWithId: DataFrame): DataFrame =
    barsWithId.select(col("id"), col("ticker"), col("event_day")).distinct()

  /** One row per id group: the group's ticker = the FIRST trading day's
    * ticker (`gpx["ticker"].iloc[0]` in the reference workers,
    * factor_builder.py:247,307). [[selectEvents]] computes this from
    * `days` when not given; a caller running several selections over
    * the SAME day grid (split + dividend families, audit raw stats)
    * should compute it once, persist it (it is id-dim-sized), and pass
    * it down — the aggregate over the full day grid is the only
    * non-dim-sized work in event selection, and without reuse it runs
    * once per family per consumer.
    */
  def idGroups(days: DataFrame): DataFrame =
    days.groupBy(col("id"))
      .agg(min(struct(col("event_day"), col("ticker"))).as("__first"))
      .select(col("id"), col("__first").getField("ticker").as("__g_ticker"))

  /** Per-id-group event selection — exact reference parity with
    * factor_builder.py:247-251 (splits) / 307-311 (dividends). Events
    * carry `event_id` = composite_figi when present, else
    * NOFIGI__ticker (factor_builder.py:208,230). An id group takes the
    * events whose event_id equals its id; only when the id has NONE
    * does it fall back to ALL events of the group's ticker
    * (all-or-nothing per group, decided BEFORE alignment — a direct
    * event that later fails to snap does not re-trigger the fallback).
    * The same physical event can therefore serve several groups: its
    * own id's, plus any same-ticker group with no direct events — e.g.
    * a figi-less split dated in a NOFIGI__ prefix window applies to the
    * NOFIGI group directly AND to the FIGI suffix group via fallback.
    *
    * `days` is the (id, ticker, event_day) grid; the group ticker is
    * the FIRST trading day's ticker (`gpx["ticker"].iloc[0]` in the
    * reference workers). Null event dates/payloads are dropped like the
    * reference's post-selection `.dropna()`.
    *
    * Scale shape: events are refdata-dim-sized and ride broadcast
    * joins; the group table is one row per security id. Returns one row
    * per (group, event): `snap_id` (the group id), the event payload
    * columns, and `used_fallback`.
    */
  def selectEvents(events: DataFrame, days: DataFrame,
      groups: Option[DataFrame] = None): DataFrame = {
    val ev0 =
      if (events.columns.contains("composite_figi")) events
      else events.withColumn("composite_figi", lit(null).cast("string"))
    val payload = ev0.columns.toSeq.filterNot(Seq("ticker", "composite_figi").contains)
    val ev = ev0
      .na.drop("any", payload)
      .withColumn("__event_id",
        coalesce(col("composite_figi"), concat(lit(NoFigiPrefix), col("ticker"))))
      .select(col("ticker").as("__ev_ticker") +: col("__event_id") +: payload.map(col): _*)
    val grp = groups.getOrElse(idGroups(days))
    val evB = broadcast(ev)
    // all-or-nothing per group: union both match arms, then keep the
    // fallback arm only for groups with zero direct matches — a window
    // over the event×group-sized union instead of an anti-join, which
    // would need an extra broadcast wave (materialize direct ids) per
    // event family
    val direct = grp.join(evB, col("__event_id") === col("id"))
      .withColumn("used_fallback", lit(false))
    val fallback = grp.join(evB, col("__ev_ticker") === col("__g_ticker"))
      .withColumn("used_fallback", lit(true))
    val w = Window.partitionBy(col("id"))
    direct.unionByName(fallback)
      .withColumn("__has_direct",
        max(when(!col("used_fallback"), 1).otherwise(0)).over(w))
      .filter(!col("used_fallback") || col("__has_direct") === 0)
      .select(col("id").as("snap_id") +: payload.map(col) :+ col("used_fallback"): _*)
  }

  /** Forward-snap each group's selected events ([[selectEvents]]) onto
    * that group's own trading days: first event_day >= the event date
    * (exact match allowed); events landing after the group's last
    * trading day are dropped (factor_builder.py:261-267,320-326 —
    * merge_asof forward + dropna). Returns the selected event rows +
    * `snap_day` and `snap_id`.
    */
  def alignEvents(events: DataFrame, days: DataFrame, dateCol: String,
      groups: Option[DataFrame] = None): DataFrame =
    alignSelected(selectEvents(events, days, groups), days, dateCol)

  /** The alignment half of [[alignEvents]], for callers that already
    * hold the [[selectEvents]] result (e.g. an audit computing both
    * raw-date stats over the selection and aligned stats — one
    * selection, two consumers).
    */
  def alignSelected(selected: DataFrame, days: DataFrame,
      dateCol: String): DataFrame = {
    val sel = selected
      .withColumn(dateCol, to_date(col(dateCol)))
      .withColumnRenamed("snap_id", "id")
    val grid = days.select(col("id"), col("event_day")).distinct()
      .withColumn("snap_day", col("event_day"))
    AsOf.joinForward(sel, grid, keys = Seq("id"), lTime = dateCol,
        rTime = "event_day", valueCols = Seq("snap_day"))
      .filter(col("snap_day").isNotNull)
      .withColumnRenamed("id", "snap_id")
  }

  /** Day-edge extraction for gap detection (factor_builder.py:727-744
    * `_scan_day_edges`): first/last close of each (id, ticker,
    * event_day) plus the raw overnight gap — first close over the PRIOR
    * trading day's last close within the TICKER (reference parity: the
    * reference scans per-ticker files, so a split landing exactly on an
    * id/FIGI validity boundary — same ticker, new id overnight — still
    * produces a detectable gap; an id-partitioned lag would see null
    * there). The id tiebreak pins lag order on the rare day carrying
    * both sides of an intraday identity change. One aggregate + one
    * lag; the reference thread-pools per-file pandas reads.
    */
  def dayEdges(barsWithId: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ticker"))
      .orderBy(col("event_day"), col("id"))
    barsWithId
      .groupBy(col("id"), col("ticker"), col("event_day"))
      .agg(min_by(col("close"), col("datetime")).as("first_close"),
        max_by(col("close"), col("datetime")).as("last_close"))
      .withColumn("prev_last", lag(col("last_close"), 1).over(w))
      .withColumn("raw_gap", col("first_close") / col("prev_last"))
  }

  /** Split-ratio guess from a raw price gap (factor_builder.py:746-753
    * `_guess`): nearest of {2,3,4,5,10,20} to the gap (inverted when
    * < 1), accepted within 15% relative error; null otherwise
    * (non-positive / null / NaN gaps never match the comparisons).
    */
  def splitGapGuess(gap: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val cands = array(Seq(2.0, 3.0, 4.0, 5.0, 10.0, 20.0).map(lit): _*)
    val g2 = when(gap < 1.0, lit(1.0) / gap).otherwise(gap)
    // argmin by (|g2-c|, c): sort [err, cand] pairs lexicographically
    val best = element_at(array_sort(transform(cands, c => array(abs(g2 - c), c))), 1)
    when(gap.isNotNull && gap > 0.0 &&
      element_at(best, 1) / element_at(best, 2) <= 0.15, element_at(best, 2))
  }

  /** Split factor grid over every trading day of every id:
    * F = running product of day split ratios (non-event days ratio 1),
    * split_price_factor = F / F_final, split_volume_factor = F_final / F.
    * Ratios are > 0 so the log-sum running product is exact enough and
    * single-pass (the exact fold is the test oracle).
    *
    * `edges` (from [[dayEdges]]) switches on raw-gap detection
    * (factor_builder.py:789-814, CLI default unless
    * `--no-detect-split-gaps`): a day whose overnight gap rounds to a
    * clean split ratio but has NO similar refdata ratio within ±1
    * calendar day gets that guessed ratio (recovering splits missing
    * from refdata); when the similar refdata ratio sits on the NEXT
    * day, it is moved onto the gap day (refdata execution dates are
    * often one day late for minute lakes). Guesses apply sequentially
    * in day order per id — each sees earlier upserts/deletes, exactly
    * like the reference's loop (see [[gapOverride]]).
    */
  def splitFactorGrid(days: DataFrame, splits: DataFrame,
      exact: Boolean = false,
      edges: Option[DataFrame] = None,
      groups: Option[DataFrame] = None): DataFrame = {
    val aligned = alignEvents(
      eventCols(splits, "execution_date", "ratio"), days, "execution_date", groups)
    val refRatio = aligned
      .groupBy(col("snap_id").as("id"), col("snap_day").as("event_day"))
      .agg(Cumulative.productAgg(col("ratio"), col("ratio")).as("day_ratio"))
    val dayRatio = edges match {
      case None => refRatio
      case Some(e) => gapOverride(refRatio, e)
    }
    val w = Window.partitionBy(col("id")).orderBy(col("event_day"))
    val whole = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    days.select(col("id"), col("event_day"))
      .join(dayRatio, Seq("id", "event_day"), "left")
      .withColumn("r", coalesce(col("day_ratio"), lit(1.0)))
      .withColumn("F",
        if (exact) Cumulative.cumprodExact(col("r"), w)
        else Cumulative.cumprodLog(col("r"), w))
      .withColumn("F_last", last(col("F")).over(whole))
      .select(col("id"), col("event_day"),
        (col("F") / col("F_last")).as("split_price_factor"),
        (col("F_last") / col("F")).as("split_volume_factor"))
  }

  /** Gap-detection override of the refdata day-ratio grid — EXACT
    * sequential parity with factor_builder.py:789-814. Guesses are
    * applied per id in ascending day order, each one deciding against
    * the grid AS MODIFIED by earlier guesses (the reference mutates
    * `per_day` inside its loop, so two gap days within one calendar day
    * of each other interact):
    *  - "similar" = any CURRENT ratio r0 in [d-1, d+1] with
    *    |r0 / guess| in [0.85, 1.15];
    *  - no similar ratio → upsert the guess at d (refdata missed the
    *    split entirely);
    *  - similar ratio on d+1 within 15% of the guess → drop the d+1 row
    *    and re-date its event to d (late execution date).
    * Executed as `flatMapGroups` per id: the per-group state is
    * split-EVENT-sized (a handful of (day, ratio) entries per security,
    * never the bar history), so the sequential loop the semantics
    * require costs O(events) memory per group while staying fully
    * distributed across ids — the Spark-native shape of the reference's
    * per-ticker pandas loop.
    *
    * Tie-order note: same-day guesses sort by (day, guess value) — a
    * deterministic order. The reference applies them in its per-ticker
    * file SCAN order, which is filesystem-listing-dependent; when one
    * id carries two tickers gapping on the SAME day with different
    * guesses, the last-write-wins outcome can therefore differ from a
    * given reference run. Divergence accepted: the reference's own
    * order is not reproducible across machines, so this engine pins a
    * deterministic one instead.
    */
  private def gapOverride(refRatio: DataFrame, edges: DataFrame): DataFrame = {
    val spark = refRatio.sparkSession
    import spark.implicits._
    val g = edges
      .withColumn("guess", splitGapGuess(col("raw_gap")))
      .filter(col("guess").isNotNull)
      .select(col("id"), col("event_day"), col("guess").as("v"),
        lit(true).as("is_guess"))
    refRatio
      .select(col("id"), col("event_day"), col("day_ratio").as("v"),
        lit(false).as("is_guess"))
      .unionByName(g)
      .as[(String, java.sql.Date, Double, Boolean)]
      .groupByKey(_._1)
      .flatMapGroups { (id, it) =>
        val rows = it.toArray
        val ratios = scala.collection.mutable.TreeMap.empty[Long, Double]
        rows.iterator.filter(!_._4).foreach { case (_, d, v, _) =>
          ratios(d.toLocalDate.toEpochDay) = v
        }
        rows.iterator.filter(_._4)
          .map { case (_, d, v, _) => (d.toLocalDate.toEpochDay, v) }
          .toArray.sortBy(identity[(Long, Double)])
          .foreach { case (d, guess) =>
            val window = (d - 1 to d + 1).flatMap(ratios.get)
            val similar = window.exists { r0 =>
              val q = math.abs(r0 / guess); q >= 0.85 && q <= 1.15
            }
            if (!similar) ratios(d) = guess
            else ratios.get(d + 1) match {
              case Some(r1) if math.abs(r1 / guess - 1.0) <= 0.15 =>
                ratios.remove(d + 1)
                ratios(d) = guess
              case _ => ()
            }
          }
        ratios.iterator.map { case (ed, v) =>
          (id, java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(ed)), v)
        }
      }
      .toDF("id", "event_day", "day_ratio")
  }

  /** Dividend / total-return factor grid. `dayBase` must carry one row
    * per (id, ticker, event_day) with the split-adjusted close of that
    * day (`close_split`): prior_base = previous day's base within the id
    * (factor_builder.py:297-299), per-day cash is summed
    * (factor_builder.py:328), g masked like the reference, G = running
    * product of g (sign-safe), anchored to last.
    */
  def dividendFactorGrid(dayBase: DataFrame, dividends: DataFrame,
      exact: Boolean = false,
      groups: Option[DataFrame] = None): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("event_day"))
    val whole = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val aligned = alignEvents(
      eventCols(dividends, "ex_date", "cash_amount"),
      dayBase.select(col("id"), col("ticker"), col("event_day")), "ex_date", groups)
    val dayCash = aligned
      .groupBy(col("snap_id").as("id"), col("snap_day").as("event_day"))
      .agg(sum(col("cash_amount")).as("amount"))
    dayBase.select(col("id"), col("event_day"), col("close_split"))
      .join(dayCash, Seq("id", "event_day"), "left")
      .withColumn("prior_base", lag(col("close_split"), 1).over(w))
      .withColumn("g",
        when(col("amount").isNotNull && col("prior_base").isNotNull &&
          col("prior_base") > 0.0,
          (col("prior_base") - col("amount")) / col("prior_base"))
          .otherwise(lit(1.0)))
      .withColumn("G",
        if (exact) Cumulative.cumprodExact(col("g"), w)
        else Cumulative.cumprodSigned(col("g"), w))
      .withColumn("G_last", last(col("G")).over(whole))
      .select(col("id"), col("event_day"),
        (col("G") / col("G_last")).as("tr_price_factor"))
  }
}
