package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sim.Ivf

class CosineSimSpec extends SparkTestBase {

  private lazy val e = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("codegen cosine matches the HOF fold bit-for-bit") {
    // the original interpreted form — kept as the arithmetic oracle
    def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      val ad = transform(a, x => x.cast("double"))
      val bd = transform(b, x => x.cast("double"))
      val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      val na = sqrt(aggregate(transform(ad, x => x * x), lit(0.0), (acc, x) => acc + x))
      val nb = sqrt(aggregate(transform(bd, x => x * x), lit(0.0), (acc, x) => acc + x))
      dot / (na * nb)
    }
    val pairs = e.as("a").crossJoin(e.as("b").limit(10))
    val mismatches = pairs.select(
        CosineSim.cosine_sim(col("a.embedding"), col("b.embedding")).as("fast"),
        hofCosine(col("a.embedding"), col("b.embedding")).as("slow"))
      .filter(col("fast") =!= col("slow")) // bit-exact: no tolerance
      .count()
    assert(mismatches == 0)
  }

  test("null inputs yield null cosine") {
    val out = spark.sql(
      "SELECT cast(null as array<float>) AS a, array(1.0F, 2.0F) AS b")
    assert(out.select(CosineSim.cosine_sim(col("a"), col("b"))).head().isNullAt(0))
  }

  test("null vector ELEMENTS are rejected loudly, not read as garbage") {
    // the replaced HOF fold returned null for a null element; the codegen
    // kernels treat it as corruption and fail with a pointed message
    // (documented next to the length require) — silent 0.0/garbage reads
    // are the one unacceptable outcome
    val out = spark.sql(
      "SELECT array(1.0F, cast(null as float)) AS a, array(1.0F, 2.0F) AS b")
    val ex = intercept[Exception] {
      out.select(CosineSim.cosine_sim(col("a"), col("b"))).collect()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++
        Option(e.getCause).toSeq.flatMap(rootMessages))
    assert(rootMessages(ex).exists(_.contains("null vector element")), ex.getMessage)
    val ex2 = intercept[Exception] {
      out.select(HyperplanePack.hyperplane_pack(col("a"), 8)).collect()
    }
    assert(rootMessages(ex2).exists(_.contains("null vector element")), ex2.getMessage)
    val cells = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val ex3 = intercept[Exception] {
      out.select(NearestCell.nearest_cell(col("a"), cells)).collect()
    }
    assert(rootMessages(ex3).exists(_.contains("null vector element")), ex3.getMessage)
  }

  test("nearest_cell matches Model.nearest for every corpus vector") {
    import spark.implicits._
    val model = Ivf.fit(e, "vec_id", "embedding", k = 8)
    val fast = e.select(col("vec_id"),
        NearestCell.nearest_cell(col("embedding"), model.centroids).as("cell"))
      .as[(Long, Int)].collect().toMap
    e.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().foreach { case (id, v) =>
        assert(fast(id) == model.nearest(v, 1).head, s"vec $id")
      }
  }
}
