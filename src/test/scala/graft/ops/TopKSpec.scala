package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The bounded top-k aggregate must be RANK-IDENTICAL to the window
  * form it replaces — same entries, same order, same ties — while
  * planning as a partial-aggregable ObjectHashAggregate instead of a
  * per-group Window sort.
  */
class TopKSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic skewed fixture: 4 groups with very different sizes,
  // engineered v-ties (v = id % 7) so the (w, id) tiebreaks are
  // genuinely exercised, spread over many input partitions so the
  // map-side combine path and the cross-partition merge both run
  private lazy val fixture = spark.range(0, 500)
    .select(
      (col("id") % 4).as("g"),
      (col("id") % 7).cast("double").as("v"),
      ((col("id") * 31) % 5).as("w"),
      col("id"),
      array((col("id") % 3).cast("int"), lit(9).cast("int")).as("pay"))
    .filter(col("g") =!= 3 || col("id") < 40) // one small group
    .repartition(13)

  private def viaTopK(k: Int) = {
    val tk = TopK.topK(k)
    fixture.groupBy(col("g"))
      .agg(tk(col("v"), col("w"), col("id"), col("pay")).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("e.v").as("v"), col("e.w").as("w"), col("e.id").as("id"),
        col("e.pay").as("pay"))
  }

  private def viaWindow(k: Int) = {
    val w = Window.partitionBy(col("g"))
      .orderBy(col("v"), col("w"), col("id"))
    fixture.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("g"), col("rank").cast("long").as("rank"),
        col("v"), col("w"), col("id"), col("pay"))
  }

  test("aggregate is rank-identical to the per-group window form") {
    Seq(1, 5, 23).foreach { k =>
      val got = viaTopK(k)
        .as[(Long, Long, Double, Long, Long, Seq[Int])].collect().toSet
      val want = viaWindow(k)
        .as[(Long, Long, Double, Long, Long, Seq[Int])].collect().toSet
      assert(got === want, s"k=$k mismatch vs window rank")
    }
  }

  test("k past the group size returns the whole group, still ordered") {
    val got = viaTopK(10000)
      .as[(Long, Long, Double, Long, Long, Seq[Int])].collect()
    assert(got.length === fixture.count())
    got.groupBy(_._1).foreach { case (g, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(r => (r._3, r._4, r._5)).toSeq ===
        sorted.map(r => (r._3, r._4, r._5)).sortBy(identity).toSeq,
        s"group $g not in (v, w, id) order")
    }
  }

  test("payload survives the bounded buffers byte-for-byte") {
    val got = viaTopK(3).select(col("id"), col("pay"))
      .as[(Long, Seq[Int])].collect()
    got.foreach { case (id, pay) =>
      assert(pay === Seq((id % 3).toInt, 9), s"payload corrupted for id=$id")
    }
  }

  test("plan is a partial-combining aggregate, never a window") {
    val plan = viaTopK(5).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate in:\n$plan")
    assert(!plan.contains("Window"), s"unexpected Window in:\n$plan")
  }

  test("randomized: any reduce/merge tree equals global sort.take(k)") {
    // the aggregate's exactness claim as an executable property: for
    // random entries (with engineered key collisions), random k, a
    // random partitioning into partial buffers, and a random-order
    // merge of those partials, the finished buffer must equal the
    // plain sorted prefix — the algebra Spark relies on when it
    // combines map-side partials in arbitrary order. Pure object
    // level: no Spark session, so the property runs hundreds of
    // trees cheaply.
    val rnd = new scala.util.Random(13131313L)
    (1 to 300).foreach { trial =>
      val n = 1 + rnd.nextInt(120)
      val k = 1 + rnd.nextInt(12)
      val agg = new BoundedTopK(k)
      // small value domains force v/w ties so the id tiebreak works
      val entries = (0 until n).map { i =>
        TopKEntry(rnd.nextInt(4).toDouble, rnd.nextInt(3).toLong,
          i.toLong, Seq(i))
      }
      // random partitioning into partial buffers
      val parts = entries.groupBy(_ => rnd.nextInt(1 + rnd.nextInt(8)))
        .values.toList
      val partials = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      // random-order binary merge tree
      var bufs = rnd.shuffle(partials)
      while (bufs.size > 1) {
        val merged = agg.merge(bufs.head, bufs(1))
        bufs = rnd.shuffle(merged :: bufs.drop(2))
      }
      val got = agg.finish(bufs.headOption.getOrElse(agg.zero))
      val want = entries.sortBy(e => (e.v, e.w, e.id)).take(k)
      assert(got === want, s"trial $trial (n=$n, k=$k) diverged")
    }
  }

  test("result is invariant to input partitioning (merge order)") {
    val a = viaTopK(7).as[(Long, Long, Double, Long, Long, Seq[Int])]
      .collect().toSet
    val tk = TopK.topK(7)
    val b = fixture.repartition(1).groupBy(col("g"))
      .agg(tk(col("v"), col("w"), col("id"), col("pay")).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("e.v"), col("e.w"), col("e.id"), col("e.pay"))
      .as[(Long, Long, Double, Long, Long, Seq[Int])].collect().toSet
    assert(a === b)
  }
}
