package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CumulativeSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val w = Window.partitionBy($"g").orderBy($"i")

  test("cumprodExact: running ordered product") {
    val df = Seq(("a", 1, 2.0), ("a", 2, 3.0), ("a", 3, 0.5), ("b", 1, 10.0))
      .toDF("g", "i", "x")
      .select($"g", $"i", Cumulative.cumprodExact($"x", w).as("p"))
    val a = df.filter($"g" === "a").orderBy($"i").select($"p").as[Double].collect()
    assert(a.toSeq == Seq(2.0, 6.0, 3.0))
    assert(df.filter($"g" === "b").select($"p").as[Double].head() == 10.0)
  }

  test("cumprodLog matches exact for positive inputs") {
    val vals = Seq(1.5, 0.2, 3.7, 1.0, 0.9, 2.25)
    val df = vals.zipWithIndex.map { case (v, i) => ("g", i, v) }.toDF("g", "i", "x")
      .select(
        Cumulative.cumprodExact($"x", w).as("e"),
        Cumulative.cumprodLog($"x", w).as("l"))
    df.as[(Double, Double)].collect().foreach { case (e, l) =>
      assert(approx(e, l, 1e-12), s"$e vs $l") }
  }

  test("cumprodSigned handles negatives and zeros") {
    val df = Seq(("a", 1, 2.0), ("a", 2, -3.0), ("a", 3, -0.5), ("a", 4, 4.0),
        ("z", 1, 2.0), ("z", 2, 0.0), ("z", 3, 5.0))
      .toDF("g", "i", "x")
      .select($"g", $"i", Cumulative.cumprodSigned($"x", w).as("p"))
    val a = df.filter($"g" === "a").orderBy($"i").select($"p").as[Double].collect()
    assert(approx(a(0), 2.0) && approx(a(1), -6.0) && approx(a(2), 3.0) && approx(a(3), 12.0),
      a.toSeq.toString)
    val z = df.filter($"g" === "z").orderBy($"i").select($"p").as[Double].collect()
    assert(approx(z(0), 2.0) && z(1) == 0.0 && z(2) == 0.0)
  }

  test("productAgg multiplies in the given order") {
    val df = Seq(("a", 3, 4.0), ("a", 1, 2.0), ("a", 2, 3.0))
      .toDF("g", "i", "x")
      .groupBy($"g").agg(Cumulative.productAgg($"x", $"i").as("p"))
    assert(df.select($"p").as[Double].head() == 24.0)
  }
}
