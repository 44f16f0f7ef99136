package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dedup.Dedup
import graft.text.TextOps

class MinhashBandsSpec extends SparkTestBase {

  test("codegen band keys match the HOF chain bit-for-bit on a real corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(Dedup.tokenSet(col("text")).as("toks"))
    val k = 16; val bands = 4
    val hof = transform(
      Dedup.lshBandKeys(Dedup.minhashSignature(col("toks"), k), bands, k / bands),
      (b, i) => TextOps.hash60(concat(i.cast("string"), lit(":"), b)))
    val mismatches = docs.select(
        MinhashBands.minhash_bands(col("toks"), k, bands).as("fast"),
        hof.as("slow"))
      .filter(col("fast") =!= col("slow")) // array equality, no tolerance
      .count()
    assert(mismatches == 0)
  }

  test("token_hashes60 matches the HOF hash60 map bit-for-bit") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(Dedup.tokenSet(col("text")).as("toks"))
    val bad = docs.select(
        TokenHashes60.token_hashes60(col("toks")).as("fast"),
        transform(col("toks"), t => TextOps.hash60(t)).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(bad == 0)
  }

  test("null token elements are rejected loudly (SQL-exposed surface)") {
    // graft_minhash_bands / graft_token_hashes60 are SQL-registered, so
    // arbitrary user arrays reach them — a null element must fail with
    // a pointed message, not an opaque NPE (same contract as the
    // vector kernels, CosineSimSpec)
    val out = spark.sql("SELECT array('a', cast(null as string)) AS toks")
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++
        Option(e.getCause).toSeq.flatMap(rootMessages))
    val ex = intercept[Exception] {
      out.select(MinhashBands.minhash_bands(col("toks"), 16, 4)).collect()
    }
    assert(rootMessages(ex).exists(_.contains("null token element")), ex.getMessage)
    val ex2 = intercept[Exception] {
      out.select(TokenHashes60.token_hashes60(col("toks"))).collect()
    }
    assert(rootMessages(ex2).exists(_.contains("null element")), ex2.getMessage)
  }

  test("odd shapes: single token, empty-string token, k=bands") {
    import spark.implicits._
    val df = Seq(Seq("solo"), Seq(""), Seq("a", "b", "c")).toDF("toks")
    Seq((16, 4), (8, 8), (6, 2)).foreach { case (k, b) =>
      val hof = transform(
        Dedup.lshBandKeys(Dedup.minhashSignature(col("toks"), k), b, k / b),
        (bk, i) => TextOps.hash60(concat(i.cast("string"), lit(":"), bk)))
      val bad = df.select(MinhashBands.minhash_bands(col("toks"), k, b).as("f"),
          hof.as("s"))
        .filter(col("f") =!= col("s")).count()
      assert(bad == 0, s"k=$k bands=$b")
    }
  }
}
