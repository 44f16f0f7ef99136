package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins DocLake.refreshAndAppend's three contract claims on a tiny
  * lake: (1) refresh updates ONLY updateCols and keeps identity +
  * partition residence; (2) appends land — including into a partition
  * being rewritten in the same fold; (3) untouched partitions are
  * byte-identical — their files are not rewritten (the dynamic-
  * overwrite point: maintenance cost scales with affected partitions,
  * not lake size).
  */
class DocLakeSpec extends SparkTestBase {
  import spark.implicits._

  private def listFiles(root: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    Files.walk(java.nio.file.Paths.get(root)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis)
      .toMap
  }

  test("refresh in place, append, and leave untouched partitions alone") {
    val tmp = Files.createTempDirectory("doclake_spec")
    val lake = s"$tmp/docs"
    try {
      Seq(
        ("k1", 1L, "en", 1L),
        ("k2", 2L, "en", 2L),
        ("k3", 3L, "de", 3L),
        ("k4", 4L, "fr", 4L))
        .toDF("key", "doc_id", "lang", "last_fetch_id")
        .repartition(col("lang"))
        .write.partitionBy("lang").parquet(lake)
      val before = listFiles(lake)
      val batch = Seq(
        ("k1", 100L, "en", 100L), // refresh of an en key
        ("k5", 101L, "en", 101L), // append INTO the rewritten partition
        ("k6", 102L, "zh", 102L)) // append into a brand-new partition
        .toDF("key", "doc_id", "lang", "last_fetch_id")
      val (nRef, nApp) = DocLake.refreshAndAppend(spark, lake, batch,
        "key", "lang", updateCols = Seq("last_fetch_id"))
      assert(nRef === 1L && nApp === 2L)
      val after = spark.read.parquet(lake)
        .select($"key", $"doc_id", $"lang", $"last_fetch_id")
        .as[(String, Long, String, Long)].collect().toSet
      assert(after === Set(
        ("k1", 1L, "en", 100L), // identity kept, fetch id updated
        ("k2", 2L, "en", 2L),
        ("k3", 3L, "de", 3L),
        ("k4", 4L, "fr", 4L),
        ("k5", 101L, "en", 101L),
        ("k6", 102L, "zh", 102L)))
      // de and fr partitions: same files, same mtimes — never rewritten
      val post = listFiles(lake)
      val untouchedBefore = before.filter(f =>
        f._1.contains("lang=de") || f._1.contains("lang=fr"))
      assert(untouchedBefore.nonEmpty)
      untouchedBefore.foreach { case (f, ts) =>
        assert(post.get(f) === Some(ts), s"untouched partition file rewritten: $f")
      }
      // the en partition WAS rewritten (refresh + riding append)
      assert(before.keys.filter(_.contains("lang=en"))
        .forall(f => !post.contains(f)), "affected partition must be rewritten")
    } finally {
      import scala.jdk.CollectionConverters._
      Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }

  test("no-refresh batch appends without touching any existing file") {
    val tmp = Files.createTempDirectory("doclake_spec2")
    val lake = s"$tmp/docs"
    try {
      Seq(("k1", 1L, "en", 1L)).toDF("key", "doc_id", "lang", "last_fetch_id")
        .write.partitionBy("lang").parquet(lake)
      val before = listFiles(lake)
      val (nRef, nApp) = DocLake.refreshAndAppend(spark, lake,
        Seq(("k9", 9L, "de", 9L)).toDF("key", "doc_id", "lang", "last_fetch_id"),
        "key", "lang", updateCols = Seq("last_fetch_id"))
      assert(nRef === 0L && nApp === 1L)
      val post = listFiles(lake)
      before.foreach { case (f, ts) => assert(post.get(f) === Some(ts)) }
      assert(spark.read.parquet(lake).count() === 2L)
    } finally {
      import scala.jdk.CollectionConverters._
      Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }

  test("null identity values and escape-unsafe partitions fail LOUDLY") {
    val tmp = Files.createTempDirectory("doclake_guard")
    val lake = s"$tmp/docs"
    try {
      Seq(("k1", 1L, "en", 1L), ("k2", 2L, "pt:BR", 2L))
        .toDF("key", "doc_id", "lang", "last_fetch_id")
        .repartition(col("lang"))
        .write.partitionBy("lang").parquet(lake)
      // a null partition value nulls BOTH isin routing filters: the
      // row would be counted as an append yet written nowhere — the
      // fold must reject it at entry, not lose it silently
      intercept[IllegalArgumentException] {
        DocLake.refreshAndAppend(spark, lake,
          Seq(("k7", 7L, null: String, 7L))
            .toDF("key", "doc_id", "lang", "last_fetch_id"),
          "key", "lang", updateCols = Seq("last_fetch_id"))
      }
      // a recrawl of a hive-escaped partition value (pt:BR is stored
      // as lang=pt%3ABR) would rebuild a nonexistent path — loud
      // contract instead of path-not-found mid-overwrite
      intercept[IllegalArgumentException] {
        DocLake.refreshAndAppend(spark, lake,
          Seq(("k2", 2L, "pt:BR", 20L))
            .toDF("key", "doc_id", "lang", "last_fetch_id"),
          "key", "lang", updateCols = Seq("last_fetch_id"))
      }
      // the poison state must be unreachable through the APPEND path
      // too: a NEW escape-unsafe key used to append fine (hive escapes
      // the dir) and then fail every future refresh of that key forever
      val cachedBefore = spark.sparkContext.getPersistentRDDs.size
      intercept[IllegalArgumentException] {
        DocLake.refreshAndAppend(spark, lake,
          Seq(("k8", 8L, "zh:TW", 8L))
            .toDF("key", "doc_id", "lang", "last_fetch_id"),
          "key", "lang", updateCols = Seq("last_fetch_id"))
      }
      // rejected batches are guarded BEFORE the persist — no cached
      // DataFrame may leak for the session lifetime
      assert(spark.sparkContext.getPersistentRDDs.size === cachedBefore)
      // neither rejected fold may have touched the lake
      assert(spark.read.parquet(lake).count() === 2L)
    } finally {
      import scala.jdk.CollectionConverters._
      Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }
}
