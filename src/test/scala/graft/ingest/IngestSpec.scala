package graft.ingest

import java.io.{BufferedWriter, FileOutputStream, OutputStreamWriter}
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.lake.LakeReader

class IngestSpec extends SparkTestBase {
  import spark.implicits._

  private def writeGz(path: String, lines: Seq[String]): Unit = {
    val w = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(new FileOutputStream(path)), "UTF-8"))
    try lines.foreach { l => w.write(l); w.newLine() } finally w.close()
  }

  private lazy val tmp = Files.createTempDirectory("graft_ingest").toString

  // Two months of daily bars, flat-file long-name header (the T/t short
  // names are REST-payload spellings; CSV headers use long names —
  // Spark's CSV reader would dedup case-colliding T/t to T0/t1 anyway),
  // epoch-millis timestamps.
  private lazy val lakeRoot: String = {
    val header = "ticker,window_start,open,high,low,close,volume,transactions,vwap"
    def epochMs(day: String) = java.sql.Timestamp.valueOf(s"$day 21:00:00").getTime
    val rows = Seq(
      s"aapl,${epochMs("2024-01-02")},1,2,0.5,1.5,100,5,1.2",
      s"aapl,${epochMs("2024-02-01")},2,3,1.5,2.5,200,6,2.2",
      s"msft,${epochMs("2024-01-02")},5,6,4.5,5.5,300,7,5.2")
    writeGz(s"$tmp/drop1.csv.gz", header +: rows)
    val root = s"$tmp/lake"
    BarsIngest.ingest(spark, s"$tmp/*.csv.gz", root, timeframe = "day")
    root
  }

  test("csv.gz -> partitioned lake roundtrip with normalization") {
    val lake = spark.read.parquet(lakeRoot)
    assert(lake.count() == 3)
    assert(lake.columns.contains("year") && lake.columns.contains("month"))
    val row = lake.filter($"ticker" === "AAPL" && $"month" === 1)
      .select($"close", $"volume").as[(Float, Long)].head()
    assert(row == ((1.5f, 100L)))
    // hive layout on disk
    assert(new java.io.File(s"$lakeRoot/ticker=AAPL/year=2024/month=1").exists())
  }

  test("manifest aggregates per-file min/max/rows") {
    val m = BarsIngest.manifest(spark, lakeRoot)
    assert(m.count() == 3) // one file per (ticker,year,month)
    val aapl = m.filter($"ticker" === "AAPL").agg(sum($"rows")).as[Long].head()
    assert(aapl == 2L)
  }

  test("incremental manifest merge equals a full rebuild after a re-drop") {
    // self-contained mini-lake (the shared fixture must stay unmutated)
    val root = s"$tmp/lake_mm"
    val header = "ticker,window_start,open,high,low,close,volume,transactions,vwap"
    def epochMs(day: String) = java.sql.Timestamp.valueOf(s"$day 21:00:00").getTime
    writeGz(s"$tmp/mm_drop1.csv.gz", Seq(header,
      s"aapl,${epochMs("2024-01-02")},1,2,0.5,1.5,100,5,1.2",
      s"aapl,${epochMs("2024-02-01")},2,3,1.5,2.5,200,6,2.2",
      s"msft,${epochMs("2024-01-02")},5,6,4.5,5.5,300,7,5.2"))
    BarsIngest.ingest(spark, s"$tmp/mm_drop1.csv.gz", root, timeframe = "day")
    val full0 = BarsIngest.manifest(spark, root).collect()
    val full0Df = spark.createDataFrame(
      spark.sparkContext.parallelize(full0.toSeq),
      BarsIngest.manifest(spark, root).schema)
    // re-drop via dynamic partition overwrite (the St3 mechanism):
    // AAPL 2024-01 is recomputed with an extra row; other partitions
    // stay untouched on disk
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.read.option("basePath", root).parquet(s"$root/ticker=AAPL/year=2024/month=1")
        .unionByName(spark.read.option("basePath", root)
          .parquet(s"$root/ticker=AAPL/year=2024/month=1")
          .withColumn("datetime",
            org.apache.spark.sql.functions.expr("datetime + INTERVAL 13 DAYS")))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("ticker", "year", "month").parquet(root)
    } finally {
      prevMode match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    val part = s"$root/ticker=AAPL/year=2024/month=1"
    val merged = BarsIngest.mergeManifest(spark, full0Df, root, Seq(part))
    val rebuilt = BarsIngest.manifest(spark, root)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"ticker", $"path", $"start", $"end", $"rows")
        .orderBy($"path").collect().toSeq
    assert(canon(merged) === canon(rebuilt))
    // the replaced AAPL-Jan file now counts 2 rows
    assert(merged.filter($"ticker" === "AAPL" && $"path".contains("month=1"))
      .agg(sum($"rows")).as[Long].head() === 2L)
  }

  test("manifest merge of month=1 does not evict month=10/11/12 entries") {
    // path-substring trap: "month=1" is a prefix of "month=10"; the
    // eviction match must stop at the directory boundary
    val root = s"$tmp/lake_mm2"
    val header = "ticker,window_start,open,high,low,close,volume,transactions,vwap"
    def epochMs(day: String) = java.sql.Timestamp.valueOf(s"$day 21:00:00").getTime
    writeGz(s"$tmp/mm2_drop1.csv.gz", Seq(header,
      s"aapl,${epochMs("2024-01-02")},1,2,0.5,1.5,100,5,1.2",
      s"aapl,${epochMs("2024-10-02")},2,3,1.5,2.5,200,6,2.2",
      s"aapl,${epochMs("2024-11-04")},3,4,2.5,3.5,300,7,3.2",
      s"aapl,${epochMs("2024-12-02")},4,5,3.5,4.5,400,8,4.2"))
    BarsIngest.ingest(spark, s"$tmp/mm2_drop1.csv.gz", root, timeframe = "day")
    val full0 = BarsIngest.manifest(spark, root).collect()
    val full0Df = spark.createDataFrame(
      spark.sparkContext.parallelize(full0.toSeq),
      BarsIngest.manifest(spark, root).schema)
    // merge a delta that touches ONLY month=1
    val part = s"$root/ticker=AAPL/year=2024/month=1"
    val merged = BarsIngest.mergeManifest(spark, full0Df, root, Seq(part))
    val rebuilt = BarsIngest.manifest(spark, root)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"ticker", $"path", $"start", $"end", $"rows")
        .orderBy($"path").collect().toSeq
    assert(canon(merged) === canon(rebuilt))
    // month=10/11/12 entries must survive the merge
    assert(merged.filter($"path".contains("month=10/")).count() === 1L)
    assert(merged.filter($"path".contains("month=11/")).count() === 1L)
    assert(merged.filter($"path".contains("month=12/")).count() === 1L)

    // a newPath pointing at a LEAF FILE (not a partition directory) must
    // evict exactly that file's stale entry — the old trailing-"/" match
    // never matched files, leaving a duplicate row after the merge
    val leaf = new java.io.File(part).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    val mergedLeaf = BarsIngest.mergeManifest(spark, full0Df, root, Seq(leaf))
    assert(canon(mergedLeaf) === canon(rebuilt))
    // scheme-qualified rendering of the same file normalizes identically
    val mergedUri = BarsIngest.mergeManifest(spark, full0Df, root,
      Seq(s"file:$leaf"))
    assert(canon(mergedUri) === canon(rebuilt))

    // a DELETED leaf file must be evicted, not survive as a stale row:
    // getFileStatus can no longer tell file from directory, so the merge
    // must drop both the exact-path row and any "p/"-prefixed rows (and
    // must not crash scanning the missing path). Reference semantics:
    // the full rebuild (ingest.py:345-422) can never go stale.
    val month10 = new java.io.File(s"$root/ticker=AAPL/year=2024/month=10")
    val leaf10 = month10.listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    assert(leaf10.delete(), s"could not delete fixture $leaf10")
    val mergedDel = BarsIngest.mergeManifest(spark, full0Df, root,
      Seq(leaf10.getAbsolutePath))
    assert(mergedDel.filter($"path".contains("month=10/")).count() === 0L)
    // untouched entries survive
    assert(mergedDel.filter($"path".contains("month=11/")).count() === 1L)
    assert(canon(mergedDel) === canon(BarsIngest.manifest(spark, root)))

    // a deleted partition DIRECTORY propagates the same way (the
    // dropped-partition maintenance case: remove dir, merge its path)
    val month11 = new java.io.File(s"$root/ticker=AAPL/year=2024/month=11")
    month11.listFiles().foreach(f => assert(f.delete()))
    assert(month11.delete(), s"could not delete fixture dir $month11")
    val mergedDelDir = BarsIngest.mergeManifest(spark, full0Df, root,
      Seq(month11.getAbsolutePath))
    assert(mergedDelDir.filter($"path".contains("month=11/")).count() === 0L)
    assert(mergedDelDir.filter($"path".contains("month=12/")).count() === 1L)
  }

  test("LakeReader prunes by ticker + range and pads missing columns") {
    val got = LakeReader.read(spark, lakeRoot,
      tickers = Seq("aapl"),
      start = Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      end = Some(java.sql.Timestamp.valueOf("2024-01-31 00:00:00")),
      endIsDateOnly = true,
      columns = Seq("close", "nonexistent_col"))
    val rows = got.collect()
    assert(rows.length == 1)
    assert(got.columns.toSeq == Seq("datetime", "ticker", "close", "nonexistent_col"))
    assert(rows(0).isNullAt(3))
    // partition pruning visible in the plan: only month=1 read
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("month=2") || plan.contains("PartitionFilters"))
  }
}
