package graft.adjust

import java.sql.{Date, Timestamp}
import java.time.LocalDate

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Property-style invariants over randomized scenarios (SURVEY.md §5):
  * the split ratio is piecewise-constant and jumps only at aligned split
  * days; notional (close × volume) is conserved by split adjustment;
  * the latest bar is always unadjusted (anchor-to-last); adjustment
  * with empty event tables is the identity.
  */
class AdjustPropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new Random(20260812L)

  private case class Scenario(
      bars: Seq[(Timestamp, String, Float, Long)],
      splits: Seq[(String, Date, Double)],
      dividends: Seq[(String, Date, Double)])

  private def genScenario(): Scenario = {
    val tickers = Seq("AAA", "BBB").take(1 + rnd.nextInt(2))
    val start = LocalDate.of(2024, 1, 1).plusDays(rnd.nextInt(20))
    val days = (0 until 15 + rnd.nextInt(15))
      .map(start.plusDays(_)).filter(d => d.getDayOfWeek.getValue <= 5)
    val bars = for (t <- tickers; d <- days) yield
      (Timestamp.valueOf(s"$d 21:00:00"), t,
        (50 + rnd.nextInt(100) + rnd.nextFloat()).toFloat, 100L + rnd.nextInt(1000))
    val splits = tickers.flatMap { t =>
      (0 until rnd.nextInt(3)).map { _ =>
        val d = start.plusDays(rnd.nextInt(days.size + 10)) // may land after last day
        (t, Date.valueOf(d), Seq(2.0, 3.0, 10.0, 0.5)(rnd.nextInt(4)))
      }
    }
    val dividends = tickers.flatMap { t =>
      (0 until rnd.nextInt(2)).map { _ =>
        (t, Date.valueOf(start.plusDays(rnd.nextInt(days.size))), 0.25 + rnd.nextDouble())
      }
    }
    Scenario(bars, splits, dividends)
  }

  private def adjust(s: Scenario) = Adjuster.buildAdjusted(
    s.bars.toDF("datetime", "ticker", "close", "volume"),
    Seq.empty[(String, String, Date, Date)]
      .toDF("ticker", "composite_figi", "effective_start", "effective_end"),
    s.splits.toDF("ticker", "execution_date", "ratio"),
    s.dividends.toDF("ticker", "ex_date", "cash_amount"),
    Adjuster.MaterializeClose)

  test("randomized invariants hold over 15 scenarios") {
    (1 to 15).foreach { i =>
      val sc = genScenario()
      val adj = adjust(sc).cache()
      val rows = adj
        .select($"ticker", $"datetime", $"close".cast("double"),
          $"volume".cast("double"), $"close_split", $"volume_split", $"close_tr",
          $"split_price_factor", $"tr_price_factor")
        .as[(String, Timestamp, Double, Double, Double, Double, Double, Double, Double)]
        .collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2.getTime)).toMap

      rows.foreach { case (ticker, series) =>
        // anchor-to-last: the latest bar is unadjusted
        val lastRow = series.last
        assert(approx(lastRow._5, lastRow._3, 1e-6), s"[$i/$ticker] last close_split")
        assert(approx(lastRow._7, lastRow._5, 1e-9), s"[$i/$ticker] last close_tr == close_split")
        assert(approx(lastRow._8, 1.0, 1e-9) && approx(lastRow._9, 1.0, 1e-9),
          s"[$i/$ticker] last factors")

        // notional conservation: close_split*volume_split == close*volume
        series.foreach { r =>
          assert(approx(r._5 * r._6, r._3 * r._4, 1e-6),
            s"[$i/$ticker] notional ${r._5 * r._6} != ${r._3 * r._4}")
        }

        // piecewise-constant split ratio; jump days = aligned split days
        val ratios = series.map(r => BigDecimal(r._3 / r._5)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP))
        val jumps = ratios.zip(ratios.drop(1)).count { case (a, b) => a != b }
        val tradingDays = series.map(_._2.toLocalDateTime.toLocalDate).distinct.sorted
        val alignedSplitDays = sc.splits
          .filter(s => s._1 == ticker && s._3 != 1.0)
          .map(s => tradingDays.find(d => !d.isBefore(s._2.toLocalDate)))
          .collect { case Some(d) if d != tradingDays.head => d }
          .distinct
        assert(jumps == alignedSplitDays.size,
          s"[$i/$ticker] jumps $jumps != aligned splits ${alignedSplitDays.size}")
      }
      adj.unpersist()
    }
  }

  test("empty event tables are the identity adjustment") {
    val sc = genScenario().copy(splits = Nil, dividends = Nil)
    val adj = adjust(sc)
    val bad = adj.filter(
      abs($"close_split" - $"close") > 1e-6 ||
        abs($"close_tr" - $"close") > 1e-6 ||
        abs($"split_price_factor" - 1.0) > 1e-12 ||
        abs($"tr_price_factor" - 1.0) > 1e-12).count()
    assert(bad == 0)
  }
}
