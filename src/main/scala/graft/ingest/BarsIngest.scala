package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.source.Normalize

/** Flat-file ingest: CSV(.gz) drops → partitioned zstd parquet lake +
  * manifest. Collapses the reference's six-stage hand-parallelized
  * pipeline (SURVEY.md §3.1: file discovery, static month→worker hash
  * partitioning, process pool, per-worker chunked read, grouped bucket
  * writes, threaded manifest scan — ingest.py:425-545) into one lazy
  * Spark plan: the month→worker ownership trick IS a shuffle on the
  * partition key, and the `.inprogress`→rename commit is Spark's output
  * committer.
  *
  * Scale design: hive-style `ticker=…/year=…/month=…` partitioning gives
  * directory pruning for free; `repartition` by the partition key before
  * `partitionBy` produces one writer task per bucket (no small-file
  * explosion across 1000 executors); parquet zstd + footer min/max stats
  * replace the JSON manifest for pruning, with [[manifest]] kept as a
  * queryable audit artifact.
  */
object BarsIngest {

  /** Ingest a glob of CSV(.gz) bar drops into `lakeRoot`.
    *
    * @param timeframe "day" (partition ticker/year/month) or "minute"
    *                  (adds day) — mirrors the reference layouts
    *                  `<TICKER>/<YYYY>/<MM>[/<DD>].parquet` (ingest.py:9-11)
    * @param watchlist keep only these tickers when non-empty (P4)
    * @param only      single-ticker filter (P3, `--only`)
    */
  def ingest(
      spark: SparkSession,
      csvGlob: String,
      lakeRoot: String,
      timeframe: String = "day",
      watchlist: Seq[String] = Nil,
      only: Option[String] = None,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(timeframe == "day" || timeframe == "minute", s"bad timeframe $timeframe")
    val raw = spark.read
      .option("header", "true")
      .option("inferSchema", "false")
      .csv(csvGlob)
    val bars = Normalize.normalizeBars(raw)
      .transform(d => only.fold(d)(t => d.filter(col("ticker") === t.toUpperCase)))
      .transform(d => if (watchlist.isEmpty) d
        else d.filter(col("ticker").isin(watchlist.map(_.toUpperCase): _*)))
      .withColumn("year", year(col("datetime")))
      .withColumn("month", month(col("datetime")))
      .transform(d => if (timeframe == "minute")
        d.withColumn("day", dayofmonth(col("datetime"))) else d)
      .na.drop(Seq("year", "month"))
    val partCols = if (timeframe == "minute") Seq("ticker", "year", "month", "day")
      else Seq("ticker", "year", "month")
    bars
      .repartition(partCols.map(col): _*)
      .sortWithinPartitions(col("datetime"))
      .write
      .mode(mode)
      .option("compression", "zstd")
      .partitionBy(partCols: _*)
      .parquet(lakeRoot)
  }

  /** File-level manifest: per (ticker, file) min/max datetime + rows —
    * the reference's JSON zone-map (ingest.py:345-422) as a one-job
    * aggregate. Kept for audit; query pruning itself rides on hive
    * partitions + parquet footer stats.
    */
  def manifest(spark: SparkSession, lakeRoot: String): DataFrame =
    spark.read.parquet(lakeRoot)
      .groupBy(col("ticker"), input_file_name().as("path"))
      .agg(
        min(col("datetime")).as("start"),
        max(col("datetime")).as("end"),
        count(lit(1)).as("rows"))

  def writeManifest(spark: SparkSession, lakeRoot: String, out: String): Unit =
    manifest(spark, lakeRoot)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(out)

  /** Incremental manifest maintenance: scan ONLY the partition paths
    * touched by a new drop and merge into the previous manifest. Every
    * prior entry UNDER a touched path is evicted first — a dynamic
    * partition overwrite deletes the old files and writes new names, so
    * matching on file paths would leave stale entries for files that no
    * longer exist. At lake scale this turns the nightly manifest job
    * from a 100 TB rescan into a scan of the day's drop.
    */
  def mergeManifest(
      spark: SparkSession, prevManifest: DataFrame,
      lakeRoot: String, newPaths: Seq[String]): DataFrame = {
    // Resolve every touched path ONCE: qualified URI ("..", "//",
    // trailing slash collapsed — immune to file:/ vs file:///
    // rendering) plus its status — Some(isDir) if it exists, None if
    // deleted. Deleted paths still participate in EVICTION (that is how
    // a deletion propagates to the manifest) but are excluded from the
    // delta scan, which would otherwise fail on a missing path.
    val hconf = spark.sparkContext.hadoopConfiguration
    val resolved = newPaths.map { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(hconf)
      val q = fs.makeQualified(hp)
      val status =
        try Some(fs.getFileStatus(q).isDirectory)
        catch { case _: java.io.FileNotFoundException => None }
      (q, status)
    }
    val existing = resolved.collect { case (q, Some(_)) => q.toString }
    // basePath keeps the hive partition columns (ticker/year/month)
    // resolvable when reading partition subdirectories directly
    val delta = if (existing.isEmpty) prevManifest.limit(0)
      else spark.read.option("basePath", lakeRoot).parquet(existing: _*)
        .groupBy(col("ticker"), input_file_name().as("path"))
        .agg(
          min(col("datetime")).as("start"),
          max(col("datetime")).as("end"),
          count(lit(1)).as("rows"))
    // Eviction matches on NORMALIZED path components, both sides (the
    // manifest column gets its URI scheme+authority stripped).
    // Directories evict on the "/"-terminated prefix (a raw
    // ".../month=1" substring would also evict month=10..12 without
    // re-adding them); a leaf FILE path evicts exactly its own entry. A
    // path that no longer EXISTS (deleted partition dir or deleted leaf
    // file — getFileStatus cannot tell which it was) evicts BOTH forms,
    // so deletions always propagate instead of leaving a stale row
    // whose delta scan contributes nothing (reference semantics: the
    // rebuild in ingest.py:345-422 can never go stale).
    val manifestPath = regexp_replace(
      regexp_replace(col("path"), "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", ""),
      "^[a-zA-Z][a-zA-Z0-9+.-]*:", "")
    val underTouched = resolved.map { case (q, status) =>
      val uri = q.toUri.getPath
      status match {
        case Some(true)  => manifestPath.startsWith(uri + "/")
        case Some(false) => manifestPath === uri
        case None        => manifestPath.startsWith(uri + "/") || manifestPath === uri
      }
    }.reduce(_ || _)
    prevManifest.filter(!underTouched).unionByName(delta)
  }
}
