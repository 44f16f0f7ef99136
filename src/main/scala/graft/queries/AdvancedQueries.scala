package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.model.Tables
import graft.multimodal.Multimodal
import graft.ops.Skew
import graft.sim.{Ivf, Similarity}

/** Driver-visible queries for the operators that live beyond plain SQL:
  * IVF / LSH approximate nearest neighbor, multimodal binary columns,
  * and skew-salted joins. Where the operator has an exact relational
  * contract (IVF at full probe ≡ brute force; salted join ≡ plain join;
  * format sniffing of constructed payloads) the oracle checks it
  * bit-for-bit; genuinely approximate paths (LSH buckets, partial-probe
  * IVF) are exposed rows-only.
  */
object AdvancedQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def dec4(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 4))

  /** Documents table dressed up as a media table: a real container magic
    * number (by doc_id mod 3) prepended to the utf-8 payload. Exercises
    * Spark's binary concat/substring path end-to-end without codecs.
    */
  private def mediaFromDocs(s: SparkSession, dir: String): DataFrame = {
    val png = lit(Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A))
    val jpg = lit(Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte))
    val mp3 = lit(Array[Byte](0x49, 0x44, 0x33))
    val magic = when(col("doc_id") % 3 === 0, png)
      .when(col("doc_id") % 3 === 1, jpg)
      .otherwise(mp3)
    t(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      concat(magic, encode(col("text"), "UTF-8")).as("bytes"))
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- IVF ANN at full probe: partition-then-search machinery must
    // reproduce the brute-force ranking exactly when every cell is
    // probed (nprobe == k). Oracle: brute-force cosine top-k in SQL. ----
    QueryDef("qs3_ivf_topk",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
          .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
        val model = Ivf.fit(e, "vec_id", "embedding", k = 8)
        Ivf.topK(e, q, "vec_id", "embedding", "query_id", "qe",
            model, k = 5, nprobe = 8)
          .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id >= 8 AND vec_id < 16),
        sc AS (
          SELECT q.query_id, e.vec_id AS neighbor_id,
            list_reduce(list_transform(range(1, len(e.embedding) + 1),
              i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)), (x, y) -> x + y)
            / (sqrt(list_reduce(list_transform(range(1, len(e.embedding) + 1),
                i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), (x, y) -> x + y))
             * sqrt(list_reduce(list_transform(range(1, len(q.qe) + 1),
                i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)), (x, y) -> x + y)))
            AS cosine
          FROM embeddings e, q WHERE e.vec_id <> q.query_id),
        r AS (SELECT query_id, neighbor_id, cosine,
          ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
          FROM sc)
        SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, cosine
        FROM r WHERE rank <= 5 ORDER BY query_id, rank""")),

    // ---- LSH ANN (hyperplane sign buckets): genuinely approximate —
    // rows-only check; recall vs brute force is asserted in SimSpec. ----
    QueryDef("qs4_lsh_topk",
      (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
        Similarity.lshTopK(e, q, "vec_id", "embedding", "query_id", "qe",
            k = 5, planes = 6)
          .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
          .orderBy(col("query_id"), col("rank"))
      },
      None),

    // ---- Multimodal: container-format sniffing over binary payloads
    // (magic numbers constructed from documents — see mediaFromDocs) ----
    QueryDef("qm1_media_sniff",
      (s, dir) => mediaFromDocs(s, dir)
        .select(col("media_id"),
          Multimodal.sniffFormat(col("bytes")).as("format"),
          length(col("bytes")).as("n_bytes"))
        .orderBy(col("media_id")),
      Some("""SELECT doc_id AS media_id,
          CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'mp3' END AS format,
          CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 8 ELSE 3 END + octet_length(encode(text)) AS n_bytes
          FROM documents ORDER BY media_id""")),

    // ---- Multimodal decode-stage plumbing: batched mapPartitions over
    // (id, bytes) with a deterministic stub decoder. The oracle mirrors
    // the stub's arithmetic, hash-checking the batch iteration path. ----
    QueryDef("qm2_decode_batch",
      (s, dir) => Multimodal.decodeStub(mediaFromDocs(s, dir))
        .select(col("media_id"), col("decoded_width"),
          col("decoded_height"), col("decoded_bytes"))
        .orderBy(col("media_id")),
      Some("""WITH m AS (SELECT doc_id AS media_id,
          CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 8 ELSE 3 END + octet_length(encode(text)) AS len
          FROM documents)
        SELECT media_id,
          CAST(16 + (len % 64) AS INT) AS decoded_width,
          CAST((16 + (len % 64)) // 2 AS INT) AS decoded_height,
          CAST(len AS BIGINT) AS decoded_bytes
        FROM m ORDER BY media_id""")),

    // ---- Skew-salted join: must be result-identical to the plain join
    // it replaces. Oracle: the plain SQL join + aggregate. ----
    QueryDef("qx1_salted_join",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val sup = t(s, dir, "supplier")
          .withColumnRenamed("s_suppkey", "l_suppkey")
        Skew.saltedJoin(li, sup, Seq("l_suppkey"), buckets = 8)
          .groupBy(col("s_nationkey"))
          .agg(sum(dec4(col("l_quantity"))).cast("double").as("sum_qty"),
            count(lit(1)).as("n_items"))
          .orderBy(col("s_nationkey"))
      },
      Some("""SELECT s_nationkey,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
          COUNT(*) AS n_items
          FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          GROUP BY s_nationkey ORDER BY s_nationkey"""))
  )
}
