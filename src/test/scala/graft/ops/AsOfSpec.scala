package graft.ops

import java.sql.Date

import graft.SparkTestBase

class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  // trading days for one key, mirroring a weekday grid around a weekend
  private lazy val days = Seq(
    ("A", d("2024-01-04")), ("A", d("2024-01-05")),
    ("A", d("2024-01-08")), ("A", d("2024-01-09")),
    ("B", d("2024-01-04")))
    .toDF("k", "day")
    .withColumn("snap", org.apache.spark.sql.functions.col("day"))

  test("forward as-of: exact match allowed, weekend snaps forward, after-last dropped") {
    val events = Seq(
      ("A", d("2024-01-05"), "exact"),   // lands on a trading day
      ("A", d("2024-01-06"), "weekend"), // Saturday -> snaps to 01-08
      ("A", d("2024-01-10"), "late"),    // after last day -> null
      ("B", d("2024-01-01"), "early"))   // before first -> snaps to it
      .toDF("k", "edate", "tag")
    val out = AsOf.joinForward(events, days, Seq("k"), "edate", "day", Seq("snap"))
      .select($"tag", $"snap").as[(String, Option[Date])].collect().toMap
    assert(out("exact").contains(d("2024-01-05")))
    assert(out("weekend").contains(d("2024-01-08")))
    assert(out("late").isEmpty)
    assert(out("early").contains(d("2024-01-04")))
  }

  test("backward as-of: last value at-or-before") {
    val events = Seq(
      ("A", d("2024-01-06"), "sat"),    // -> 01-05
      ("A", d("2024-01-08"), "exact"),  // -> 01-08
      ("A", d("2024-01-01"), "early"))  // -> null
      .toDF("k", "edate", "tag")
    val out = AsOf.joinBackward(events, days, Seq("k"), "edate", "day", Seq("snap"))
      .select($"tag", $"snap").as[(String, Option[Date])].collect().toMap
    assert(out("sat").contains(d("2024-01-05")))
    assert(out("exact").contains(d("2024-01-08")))
    assert(out("early").isEmpty)
  }

  test("equal-time right rows resolve to the smallest value tuple, both directions") {
    // two right rows share (k, time); the tie must break deterministically
    // to the smallest value in BOTH directions
    val right = Seq(("A", d("2024-01-05"), "v2"), ("A", d("2024-01-05"), "v1"))
      .toDF("k", "day", "pick")
    val events = Seq(("A", d("2024-01-04"), "fwd"), ("A", d("2024-01-06"), "bwd"))
      .toDF("k", "edate", "tag")
    val fwd = AsOf.joinForward(events.filter($"tag" === "fwd"), right,
      Seq("k"), "edate", "day", Seq("pick")).select($"pick").as[String].head()
    val bwd = AsOf.joinBackward(events.filter($"tag" === "bwd"), right,
      Seq("k"), "edate", "day", Seq("pick")).select($"pick").as[String].head()
    assert(fwd == "v1" && bwd == "v1")
  }

  test("tied right rows with nulls carry over as ONE atomic row") {
    // row ("x1", null) vs (null, "y2"): the packed-struct pick must
    // return one of those rows whole — never the per-column mix
    // ("x1", "y2") the old per-column first/last could produce
    val right = Seq(("A", d("2024-01-05"), Some("x1"), None: Option[String]),
        ("A", d("2024-01-05"), None: Option[String], Some("y2")))
      .toDF("k", "day", "va", "vb")
    val events = Seq(("A", d("2024-01-04"))).toDF("k", "edate")
    val out = AsOf.joinForward(events, right, Seq("k"), "edate", "day",
        Seq("va", "vb"))
      .select($"va", $"vb").as[(Option[String], Option[String])].head()
    assert(out == ((None, Some("y2"))) || out == ((Some("x1"), None)))
    // struct asc, nulls-first: (null, "y2") is the smallest tuple
    assert(out == ((None, Some("y2"))))
  }

  test("unorderable value columns (map) no longer throw — atomic arbitrary pick") {
    val right = Seq(("A", d("2024-01-05"), Map("a" -> 1)))
      .toDF("k", "day", "m")
    val events = Seq(("A", d("2024-01-04"))).toDF("k", "edate")
    val out = AsOf.joinForward(events, right, Seq("k"), "edate", "day", Seq("m"))
      .select($"m").as[Map[String, Int]].head()
    assert(out == Map("a" -> 1))
  }

  test("keys do not leak matches across groups") {
    val events = Seq(("B", d("2024-01-05"), "bLate")).toDF("k", "edate", "tag")
    val out = AsOf.joinForward(events, days, Seq("k"), "edate", "day", Seq("snap"))
      .select($"tag", $"snap").as[(String, Option[Date])].collect().toMap
    // B's only day is 01-04; an event on 01-05 must NOT match A's days
    assert(out("bLate").isEmpty)
  }
}
