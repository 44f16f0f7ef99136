package graft.ops

import java.sql.Date
import java.time.LocalDate

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Randomized properties for the as-of join and running products,
  * checked against straightforward Scala references.
  */
class OpsPropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new Random(424242L)

  test("forward/backward as-of match the set-definition reference") {
    (1 to 10).foreach { i =>
      val base = LocalDate.of(2024, 3, 1)
      val days = (0 until 40).filter(_ => rnd.nextBoolean())
        .map(o => Date.valueOf(base.plusDays(o)))
      val events = (0 until 15).map { e =>
        (e.toLong, Date.valueOf(base.plusDays(rnd.nextInt(50) - 5)))
      }
      if (days.nonEmpty) {
        val daysDf = days.map(d => ("K", d)).toDF("k", "day")
          .withColumn("snap", col("day"))
        val evDf = events.toDF("eid", "edate").withColumn("k", lit("K"))

        val fwd = AsOf.joinForward(evDf, daysDf, Seq("k"), "edate", "day", Seq("snap"))
          .select($"eid", $"snap").as[(Long, Option[Date])].collect().toMap
        val bwd = AsOf.joinBackward(evDf, daysDf, Seq("k"), "edate", "day", Seq("snap"))
          .select($"eid", $"snap").as[(Long, Option[Date])].collect().toMap

        events.foreach { case (eid, ed) =>
          val expF = days.filter(d => !d.before(ed)).sortBy(_.getTime).headOption
          val expB = days.filter(d => !d.after(ed)).sortBy(_.getTime).lastOption
          assert(fwd(eid) == expF, s"[$i] fwd eid=$eid $ed")
          assert(bwd(eid) == expB, s"[$i] bwd eid=$eid $ed")
        }
      }
    }
  }

  test("cumprodExact equals foldLeft prefix products; signed handles any sign") {
    (1 to 10).foreach { i =>
      val xs = (0 until 20).map(_ => (rnd.nextDouble() * 4 - 2) match {
        case v if math.abs(v) < 0.05 => 0.0 // force occasional exact zeros
        case v => v
      })
      val df = xs.zipWithIndex.map { case (v, idx) => ("g", idx, v) }
        .toDF("g", "i", "x")
      val w = Window.partitionBy($"g").orderBy($"i")
      val got = df.select($"i",
          Cumulative.cumprodExact($"x", w).as("e"),
          Cumulative.cumprodSigned($"x", w).as("s"))
        .orderBy($"i").as[(Int, Double, Double)].collect()
      val ref = xs.scanLeft(1.0)(_ * _).drop(1)
      got.zip(ref).foreach { case ((idx, e, s), r) =>
        assert(e == r, s"[$i] exact idx=$idx")
        assert(approx(s, r, 1e-9) || (r == 0.0 && s == 0.0), s"[$i] signed idx=$idx $s vs $r")
      }
    }
  }
}
