package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{CosineSim, HyperplanePack, MinhashBands, RollingMinHash, Simhash60, SortedIntersectCount, TokenHashes60, WordNgramHashes}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) exposes them to pure-SQL
  * users:
  *
  *   SELECT graft_rolling_min_hash(text, 8), graft_simhash60(hashes),
  *          graft_sorted_intersect_count(a, b) ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  override def apply(ext: SparkSessionExtensions): Unit =
    builders.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, "", "", "", "",
          "", "", "built-in"), builder))
    }
}

object GraftExtensions {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.expressions.Expression

  private[graft] val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_rolling_min_hash",
      "graft_rolling_min_hash(str, window) - min Karp-Rabin rolling hash",
      (children: Seq[Expression]) => RollingMinHash(children.head,
        children(1).eval().asInstanceOf[Number].intValue())),
    ("graft_simhash60",
      "graft_simhash60(array<bigint>) - 60-bit simhash of token hashes",
      (children: Seq[Expression]) => Simhash60(children.head)),
    ("graft_sorted_intersect_count",
      "graft_sorted_intersect_count(a, b) - |a intersect b| for sorted distinct bigint arrays",
      (children: Seq[Expression]) => SortedIntersectCount(children.head, children(1))),
    ("graft_word_ngram_hashes",
      "graft_word_ngram_hashes(text, n) - distinct 60-bit hashes of word n-grams",
      (children: Seq[Expression]) => WordNgramHashes(children.head,
        children(1).eval().asInstanceOf[Number].intValue())),
    ("graft_minhash_bands",
      "graft_minhash_bands(tokens, k, bands) - MinHash-LSH band keys of a token array",
      (children: Seq[Expression]) => MinhashBands(children.head,
        children(1).eval().asInstanceOf[Number].intValue(),
        children(2).eval().asInstanceOf[Number].intValue())),
    ("graft_token_hashes60",
      "graft_token_hashes60(tokens) - 60-bit md5 hash of every array element",
      (children: Seq[Expression]) => TokenHashes60(children.head)),
    ("graft_cosine_sim",
      "graft_cosine_sim(a, b) - exact cosine of two float/double arrays",
      (children: Seq[Expression]) => CosineSim(children.head, children(1))),
    // NearestCell is intentionally NOT SQL-exposed: it closes over a
    // driver-fit centroid matrix, which has no SQL-literal form.
    ("graft_hyperplane_pack",
      "graft_hyperplane_pack(vec, planes[, table]) - packed sign-bit LSH bucket",
      (children: Seq[Expression]) => HyperplanePack(children.head,
        children(1).eval().asInstanceOf[Number].intValue(),
        if (children.length > 2) children(2).eval().asInstanceOf[Number].intValue()
        else 0)))

  /** Register into an ALREADY-RUNNING session (extensions only apply at
    * session construction) — the notebook / shared-session path.
    */
  def registerTemp(spark: SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
