package graft.dedup

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Randomized exactness properties for the candidate-pruned dedup
  * kernels. Unlike MinHash-LSH (sampling-approximate by design), these
  * two are COMPLETE by construction and must EQUAL brute force:
  *  - PPJoin prefix indexing: any pair with Jaccard >= t shares a
  *    prefix gram on both sides, so pruning loses nothing;
  *  - 4x15-bit SimHash banding: any pair with Hamming <= 3 differs in
  *    at most 3 of 4 bands, so it collides on at least one.
  * Small vocab + repeated templates force dense near-dup structure.
  */
class DedupPropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new Random(55511L)
  private val vocab = Array("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta")

  private def randomDocs(n: Int): Seq[(Long, String)] = {
    val templates = Seq.fill(4)(
      Seq.fill(8 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.length))))
    (1L to n).map { id =>
      val base = templates(rnd.nextInt(templates.length))
      // mutate a few positions so pairs span the threshold boundary
      val words = base.map(w =>
        if (rnd.nextDouble() < 0.15) vocab(rnd.nextInt(vocab.length)) else w)
      (id, words.mkString(" "))
    }
  }

  private def normToks(s: String): Array[String] =
    s.toLowerCase.trim.replaceAll("\\s+", " ").split(' ')

  private def bigramSet(s: String): Set[String] = {
    val t = normToks(s)
    t.sliding(2).map(_.mkString(" ")).toSet
  }

  test("ngramJaccardPairs equals brute force on random corpora (both paths)") {
    (1 to 3).foreach { trial =>
      val docs = randomDocs(30 + rnd.nextInt(20))
      val t = 0.5
      val brute = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        sa = bigramSet(ta); sb = bigramSet(tb)
        inter = (sa & sb).size
        j = inter.toDouble / (sa.size + sb.size - inter)
        if j >= t
      } yield (ia, ib)).toSet
      val df = docs.toDF("doc_id", "text")
      Seq(true, false).foreach { bc =>
        val got = Dedup.ngramJaccardPairs(df, "text", "doc_id", n = 2,
            threshold = t, broadcastSets = bc, broadcastDocFreq = bc)
          .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
        assert(got == brute,
          s"trial $trial bc=$bc: missing=${brute -- got} extra=${got -- brute}")
      }
    }
  }

  test("simhashPairs equals brute-force Hamming<=3 pairs on random corpora") {
    (1 to 3).foreach { trial =>
      val docs = randomDocs(30 + rnd.nextInt(20))
      val df = docs.toDF("doc_id", "text")
      // brute force over the SAME fingerprint the kernel computes
      val fpMap = df.select($"doc_id",
          graft.functions.Simhash60.simhash60(
            graft.dedup.Dedup.tokenHashes(
              Dedup.tokenSet($"text"))).as("sh"))
        .as[(Long, Long)].collect().toMap
      val brute = (for {
        (ia, _) <- docs; (ib, _) <- docs if ia < ib
        h = java.lang.Long.bitCount(fpMap(ia) ^ fpMap(ib))
        if h <= 3
      } yield (ia, ib)).toSet
      val got = Dedup.simhashPairs(df, "text", "doc_id", maxHamming = 3)
        .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
      assert(got == brute,
        s"trial $trial: missing=${brute -- got} extra=${got -- brute}")
    }
  }
}
