package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class HyperplanePackSpec extends SparkTestBase {

  private lazy val e = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  /** The original interpreted HOF form the codegen expression replaced —
    * kept here as the derivation oracle: weights are md5 parity of
    * "p+table*1000:i", dot is a 0.0-seeded ascending fold, bit p set iff
    * dot > 0.
    */
  private def hofBucket(vecExpr: String, planes: Int, table: Int) = {
    val off = table * 1000
    expr(s"""aggregate(sequence(0, ${planes - 1}), 0L, (acc, p) ->
      acc + if(
        aggregate(zip_with($vecExpr, sequence(0, size($vecExpr) - 1), (x, i) ->
          cast(x as double) * if(bit_count(cast(conv(substring(md5(
            concat(cast(p + $off as string), ':', cast(i as string))), 1, 15), 16, 10) as bigint)) % 2 = 0,
            1.0D, -1.0D)),
        0.0D, (s, x) -> s + x) > 0.0D,
        shiftleft(1L, p), 0L))""")
  }

  test("codegen buckets match the md5-HOF derivation bit-for-bit") {
    for ((planes, table) <- Seq((6, 0), (4, 0), (4, 3), (8, 7))) {
      val mismatches = e.select(
          HyperplanePack.hyperplane_pack(col("embedding"), planes, table).as("fast"),
          hofBucket("embedding", planes, table).as("slow"))
        .filter(col("fast") =!= col("slow"))
        .count()
      assert(mismatches == 0, s"planes=$planes table=$table: $mismatches rows differ")
    }
  }

  test("planeWeights matches the SQL md5-parity arithmetic") {
    // spot-check the Scala derivation against Spark's own md5/conv/bit_count
    val w = HyperplanePack.planeWeights(planes = 3, table = 2, dim = 5)
    val sqlW = spark.sql("""SELECT p, i,
        if(bit_count(cast(conv(substring(md5(concat(cast(p + 2000 as string), ':', cast(i as string))), 1, 15), 16, 10) as bigint)) % 2 = 0, 1.0D, -1.0D) AS w
      FROM (SELECT explode(sequence(0, 2)) AS p) CROSS JOIN (SELECT explode(sequence(0, 4)) AS i)""")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    for (p <- 0 until 3; i <- 0 until 5)
      assert(w(p)(i) == sqlW((p, i)), s"weight($p,$i)")
  }

  test("double arrays bucket identically to their float originals") {
    val mismatches = e.select(
        HyperplanePack.hyperplane_pack(col("embedding"), 6, 0).as("f"),
        HyperplanePack.hyperplane_pack(
          expr("cast(embedding as array<double>)"), 6, 0).as("d"))
      .filter(col("f") =!= col("d")).count()
    assert(mismatches == 0)
  }

  test("null vector yields null bucket") {
    val df = spark.sql("SELECT cast(null as array<float>) AS v")
    val out = df.select(
      HyperplanePack.hyperplane_pack(col("v"), 4, 0).as("b")).collect()
    assert(out.head.isNullAt(0))
  }
}
