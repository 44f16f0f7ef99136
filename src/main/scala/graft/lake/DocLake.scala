package graft.lake

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a canonical-key document lake — the
  * corpus-side twin of the index lake's tombstone fold
  * ([[graft.sim.Ivf.compactTombstones]]): a crawl produces daily
  * arrival batches whose verdicts (qt31's incremental URL dedup) must
  * be FOLDED into the stored corpus, not just reported. Two cases:
  * a batch key already in the lake is a RECRAWL — its lake row is
  * refreshed in place (update columns from the batch; identity and
  * partition residence keep their lake values); a new key APPENDS.
  *
  * Scale shape (the ql3/ql6 discipline on the doc lake): affected-
  * partition discovery is one projection-pruned (key, partition) scan
  * joined against the broadcast batch keys (the batch is day-sized,
  * the lake is the corpus — never the other way around); only the
  * affected hive partitions are re-read (explicit paths = partition
  * pruning) and rewritten via dynamic partition overwrite; untouched
  * partitions are never opened for write. Appends go to their own
  * partitions as plain appends — except appends landing in a
  * partition being rewritten anyway, which ride the overwrite (two
  * writers to one partition would race the overwrite's delete).
  *
  * Lake invariant (caller-owned): one row per key — the initial lake
  * and every batch are canonical REPRESENTATIVES (qt30's min-doc_id
  * reps), so the refresh join is 1:1.
  */
object DocLake {

  /** This lake's partition-value contract: plain identifier-safe
    * values only. Hive percent-escapes anything else in directory
    * names, which would break both the affected-partition path
    * reconstruction and the string-vs-native isin routing. Enforced at
    * batch entry (so poison values never enter the lake) AND on values
    * read back during refresh (lakes that predate the entry guard).
    */
  val SafePartValue = "[A-Za-z0-9._-]+"

  /** Fold `batch` into the lake at `lakeRoot` (hive-partitioned by
    * `partCol`). `batch` carries the full lake schema; on refresh only
    * `updateCols` are taken from the batch — every other column,
    * including `partCol` (stable residence: a recrawl must not
    * migrate a row between partitions), keeps its lake value. New
    * keys append with their batch row as-is.
    * Returns (nRefreshed, nAppended).
    */
  def refreshAndAppend(spark: SparkSession, lakeRoot: String,
      batch: DataFrame, keyCol: String, partCol: String,
      updateCols: Seq[String]): (Long, Long) = {
    require(updateCols.nonEmpty, "refresh with no update columns is a no-op")
    require(!updateCols.contains(partCol) && !updateCols.contains(keyCol),
      "key and partition columns are lake-identity, not updatable")
    // The batch lineage feeds five consumers below (the entry guard,
    // the staging anti-join, broadcast key collects, the update
    // projection) — at the streaming call site it is a per-micro-batch
    // aggregation, so persist it once for the fold (day-sized;
    // released in the outer finally).
    // appends read the lake (anti join on its pruned key column) — they
    // must be materialized DURABLY before the overwrite invalidates the
    // file listing. persist() is not enough off the happy path: if an
    // executor dies after the overwrite, recomputation of a lost block
    // would re-scan the lake through a file index of now-deleted files.
    // Stage them as parquet under an underscore-prefixed dir (invisible
    // to every lake reader) and re-read — the append set is batch-sized,
    // so the extra write+read is day-batch cost, not corpus cost.
    val hadoopPath = new org.apache.hadoop.fs.Path(lakeRoot,
      "_staging_appends_" + java.util.UUID.randomUUID().toString.replace("-", ""))
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val b = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Everything after the persist sits in try/finally: a failure
    // mid-maintenance — INCLUDING a guard rejection — must not leak
    // the cached batch nor orphan the staging dir (invisible to
    // readers, but retried batches would otherwise accumulate one dead
    // _staging_appends_* dir per failure under the lake root,
    // unbounded).
    try {
    // Entry guard, run on the PERSISTED handle so the rows validated
    // are by construction the rows the fold consumes — a guard on the
    // raw lineage would re-execute it, and a non-deterministic batch
    // (the streaming call site's per-micro-batch aggregation) could
    // pass validation on one materialization and fold a different
    // one, reopening the silent-loss window the guard closes. Two
    // poison classes fail loudly here: (a) null key/partition values —
    // a null partition value nulls BOTH isin filters below, so the row
    // would be counted as an append yet written nowhere (silent loss);
    // (b) escape-unsafe partition values — hive would percent-escape
    // them in the directory name, and while the APPEND itself would
    // succeed, every future refresh touching that key would fail the
    // affected-partition require forever. The poison state must never
    // enter the lake, so the append path enforces the same regex the
    // refresh path checks; rejection unwinds through the finally,
    // which releases the cache.
    val badBatch = b.filter(col(keyCol).isNull || col(partCol).isNull ||
      !col(partCol).cast("string").rlike("^" + SafePartValue + "$"))
    require(badBatch.isEmpty,
      s"batch carries null or escape-unsafe $keyCol/$partCol values - a " +
        "document lake key and partition must be non-null and the " +
        s"partition value identifier-safe ($SafePartValue); filter or " +
        "canonicalize them upstream")
    val lk = spark.read.parquet(lakeRoot)
    val cols = lk.columns.toSeq
    val batchKeys = b.select(col(keyCol))
    b
      .join(lk.select(col(keyCol)), Seq(keyCol), "left_anti")
      .select(cols.map(col): _*)
      .write.parquet(hadoopPath.toString)
    // schema passed explicitly: a zero-append batch writes no part files
    val appends = spark.read.schema(lk.schema).parquet(hadoopPath.toString)
    val nAppend = appends.count()
    // affected partitions: pruned (key, part) scan x broadcast batch keys
    val affected = lk.select(col(keyCol), col(partCol))
      .join(broadcast(batchKeys), Seq(keyCol))
      .select(col(partCol)).distinct()
      .collect().map(_.get(0).toString).sorted
    // Affected-partition paths are built by interpolation below —
    // re-check values read back from the lake (pre-guard lakes may
    // already hold escape-unsafe partitions; see [[SafePartValue]]).
    require(affected.forall(_.matches(SafePartValue)),
      s"partition values of $partCol need hive escaping " +
        s"(${affected.filterNot(_.matches(SafePartValue)).take(3).mkString(", ")}) - " +
        "this lake requires identifier-safe partition values")
    var nRefresh = 0L
    if (affected.nonEmpty) {
      val paths = affected.map(p => s"$lakeRoot/$partCol=$p")
      val slice = spark.read.option("basePath", lakeRoot)
        .parquet(paths.toSeq: _*)
      val upd = b.select((keyCol +: updateCols).map(c =>
        col(c).as(s"__b_$c")): _*)
      // persisted: the count and the overwrite below both consume it
      // (batch-sized — only refreshed ROWS, never the slice), and the
      // count's materialization happens while the pre-overwrite files
      // are still in place, same read window as the overwrite job's
      // own scan
      val refreshed = slice
        .join(broadcast(upd), col(keyCol) === col(s"__b_$keyCol"))
        .select(cols.map(c =>
          (if (updateCols.contains(c)) col(s"__b_$c") else col(c)).as(c)): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      nRefresh = refreshed.count()
      val untouched = slice
        .join(broadcast(batchKeys), Seq(keyCol), "left_anti")
        .select(cols.map(col): _*)
      val ridingAppends = appends
        .filter(col(partCol).isin(affected.toSeq: _*))
      val writeSet = untouched.unionByName(refreshed)
        .unionByName(ridingAppends)
      // dynamic overwrite scoped to THIS write via the writer option —
      // mutating the session conf (the previous form) races any
      // concurrent writer on the same session: a static-mode overwrite
      // running in parallel would silently become dynamic, and two
      // concurrent folds could leave the session default flipped.
      try {
        writeSet.repartition(col(partCol))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(partCol).parquet(lakeRoot)
      } finally refreshed.unpersist()
    }
    val freshAppends = appends
      .filter(!col(partCol).isin(affected.toSeq: _*))
    if (!freshAppends.isEmpty) {
      freshAppends.repartition(col(partCol))
        .write.mode(SaveMode.Append)
        .partitionBy(partCol).parquet(lakeRoot)
    }
    (nRefresh, nAppend)
    } finally {
      fs.delete(hadoopPath, true)
      b.unpersist()
    }
  }
}
