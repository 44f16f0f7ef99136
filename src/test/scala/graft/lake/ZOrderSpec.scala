package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("zValue interleaves bits exactly (hand-computed points)") {
    // z(x, y) puts x bit i at 2i and y bit i at 2i+1:
    // z(1,0)=1, z(0,1)=2, z(3,5) = x:11 y:101 -> 1+2+4+32 = 39
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L))
      .toDF("x", "y")
    val got = pts.select(ZOrder.zValue($"x", $"y", bits = 8).as("z"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 1L, 2L, 39L, 65535L))
  }

  test("zValue rejects out-of-domain keys loudly (strict default)") {
    // A silent mask wrap makes distant keys share buckets while every
    // result check stays green — the failure must be loud instead.
    val bad = Seq(((1L << 8) + 3L, 5L)).toDF("x", "y")
      .select(ZOrder.zValue($"x", $"y", bits = 8).as("z"))
    val err = intercept[Exception](bad.as[Long].head())
    assert(err.getMessage.contains("outside 8-bit domain") ||
      Option(err.getCause).exists(_.getMessage.contains("outside 8-bit domain")))
    val neg = Seq((-1L, 5L)).toDF("x", "y")
      .select(ZOrder.zValue($"x", $"y", bits = 8).as("z"))
    intercept[Exception](neg.as[Long].head())
  }

  test("zValue strict=false masks out-of-range keys (opt-in wrap)") {
    // 2^8 + 3 masked to 8 bits == 3 — same z as (3, 5)
    val z = Seq(((1L << 8) + 3L, 5L)).toDF("x", "y")
      .select(ZOrder.zValue($"x", $"y", bits = 8, strict = false).as("z"))
      .as[Long].head()
    assert(z == 39L)
  }

  test("layout refuses an input that already has a _z column") {
    val df = Seq((1L, 2L, 9L)).toDF("x", "y", "_z")
    val err = intercept[IllegalArgumentException](
      ZOrder.layout(df, "x", "y", bits = 4, numFiles = 2))
    assert(err.getMessage.contains("_z"))
  }

  test("prefix bucket bounds the span of BOTH dimensions") {
    // bits=8, prefixBits=4 fixes the top 2 bits of each dim, so within
    // any bucket: span < 2^6 = 64 in x AND in y — the pruning geometry.
    val pts = (0 until 256).flatMap(x => (0 until 256 by 7).map(y =>
      (x.toLong, y.toLong))).toDF("x", "y")
    val z = ZOrder.zValue($"x", $"y", bits = 8)
    val spans = pts
      .select($"x", $"y", ZOrder.prefixBucket(z, 8, 4).as("b"))
      .groupBy($"b")
      .agg((max($"x") - min($"x")).as("xs"), (max($"y") - min($"y")).as("ys"),
        count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long)].collect()
    assert(spans.length == 16) // 4 prefix bits over a full grid
    spans.foreach { case (b, xs, ys, _) =>
      assert(xs < 64, s"bucket $b x-span $xs >= 64")
      assert(ys < 64, s"bucket $b y-span $ys >= 64")
    }
  }

  test("layout write bounds per-file min/max in both dimensions") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val pts = (0 until 128).flatMap(x => (0 until 128 by 3).map(y =>
      (x.toLong, y.toLong))).toDF("x", "y")
    ZOrder.layout(pts, "x", "y", bits = 7, numFiles = 8)
      .write.mode("overwrite").parquet(dir)
    // project the file name BEFORE aggregating (Spark 4 rejects
    // input_file_name inside aggregate args)
    val perFile = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
      .groupBy($"f")
      .agg((max($"x") - min($"x")).as("xs"), (max($"y") - min($"y")).as("ys"))
      .as[(String, Long, Long)].collect()
    assert(perFile.length >= 4, "layout should spread across files")
    assert(spark.read.parquet(dir).count() == pts.count())
    // Aggregate locality: the mean per-file bounding box must be far
    // below the full domain (a single-key sorted write pins one dim's
    // span at ~the whole domain in EVERY file → mean area ~half the
    // domain). Per-file worst cases at range boundaries (two adjacent
    // z values straddling the curve centre) are legitimate, so the
    // claim is about the average, not each file.
    val domainArea = 128.0 * 128.0
    val meanArea = perFile.map { case (_, xs, ys) =>
      (xs + 1).toDouble * (ys + 1).toDouble }.sum / perFile.length
    assert(meanArea < domainArea / 2,
      s"mean per-file bbox area $meanArea not localized vs $domainArea")
  }

  test("measured pruning: z-order skips files a single-key sort cannot") {
    // The 100 TB claim, measured instead of asserted: write the same
    // grid (a) sorted by x only and (b) z-ordered, same file count,
    // then count the files whose min/max stats intersect a selective
    // predicate on the OTHER dimension (y). The x-sorted layout leaves
    // every file's y-span at ~the whole domain (zero pruning); the
    // z-ordered layout must actually skip files.
    val n = 16
    val pts = (0 until 256).flatMap(x => (0 until 256 by 2).map(y =>
      (x.toLong, y.toLong))).toDF("x", "y")
    def filesMatching(dir: String, yLo: Long, yHi: Long): (Int, Int) = {
      val stats = spark.read.parquet(dir)
        .withColumn("f", input_file_name())
        .groupBy($"f").agg(min($"y").as("ymin"), max($"y").as("ymax"))
        .as[(String, Long, Long)].collect()
      (stats.count { case (_, lo, hi) => lo <= yHi && hi >= yLo },
        stats.length)
    }
    val xDir = java.nio.file.Files.createTempDirectory("sortx").toString
    pts.repartitionByRange(n, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(xDir)
    val zDir = java.nio.file.Files.createTempDirectory("sortz").toString
    ZOrder.layout(pts, "x", "y", bits = 8, numFiles = n)
      .write.mode("overwrite").parquet(zDir)
    // a 16-value y-slice: 1/16 of the y domain
    val (xHit, xTotal) = filesMatching(xDir, 96, 111)
    val (zHit, zTotal) = filesMatching(zDir, 96, 111)
    assert(xTotal >= n / 2 && zTotal >= n / 2)
    // x-sorted: every file spans all of y -> nothing prunes
    assert(xHit == xTotal, s"x-sort unexpectedly pruned ($xHit/$xTotal)")
    // z-ordered: at most half the files can intersect a 1/16 y-slice
    assert(zHit <= zTotal / 2,
      s"z-order pruned too little: $zHit of $zTotal files intersect")
  }
}
