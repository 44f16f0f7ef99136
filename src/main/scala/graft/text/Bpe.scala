package graft.text

import java.util.PriorityQueue

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level BPE tokenization over a bundled merge table — the real
  * token denominator for every token-budgeted decision in a training
  * pipeline (sequence packing, mixture budgets, context-length stats).
  * Whitespace counts mis-size 4k-token packing bins by 20-40% on web
  * text; BPE counts are what the trainer actually consumes.
  *
  * Algorithm (the public BPE encode of Sennrich et al. 2016 / GPT-2):
  * start from one token per codepoint of the NORMALIZED text
  * ([[TextOps.norm]] semantics: lowercase, trim, whitespace collapsed —
  * the same preprocessing every other text operator here uses), then
  * repeatedly merge the adjacent pair with the lowest merge-table rank,
  * leftmost occurrence first, until no adjacent pair is in the table.
  * There is no pre-tokenizer: merges may cross spaces (space is a
  * codepoint like any other), the byte/codepoint-level formulation.
  *
  * Implementation is the O(n log n) linked-list + min-heap form — the
  * shape that stays linear-ish on book-length documents, where the
  * naive rescan-per-merge encode is O(n²). Entries are (rank, position)
  * pairs with lazy invalidation: a popped entry is applied only if its
  * pair still exists verbatim at that position (rank identifies the
  * pair uniquely, so one equality check is exact).
  *
  * Engine portability: for a TRAINER-PRODUCED merge table (each merge
  * fully applied to the corpus before the next is learned), min-rank-
  * first encoding is equivalent to applying each merge rank in order
  * with one left-to-right non-overlapping sweep — a merge can only
  * create pairs of HIGHER rank, so ranks never regress. The sweep form
  * is exactly what a SQL engine can replay with string `replace` over
  * a delimiter-encoded token string, which is how the DuckDB oracles
  * recompute these counts (tokens joined by `||` and flanked by `|`:
  * replacing `|l||r|` with `|lr|` is one BPE sweep, and `replace`'s
  * left-to-right non-overlapping scan is the sweep's own order).
  * [[Table.tokenizeSweep]] is that oracle semantics in Scala;
  * BpeSpec pins heap ≡ sweep ≡ naive-rescan on the bundled table over
  * corpus text and randomized inputs. For an adversarial (non-trainer)
  * table the two can diverge — a merge recreating an earlier pair —
  * which the equivalence spec would catch before any oracle does.
  *
  * The bundled fixture table (`graft/bpe/merges.tsv`, 200 merges) is
  * learned from the sf0.001 documents corpus by scripts/train_bpe.py —
  * deterministic greedy pair-count training, ties broken
  * lexicographically. A production deployment swaps in its real vocab
  * (GPT-2/tiktoken merge dumps are this exact format) — table size
  * only changes constants: the table is KBs-to-MBs, living once per
  * executor, never shuffled.
  *
  * Reference basis: none — north-star training-data-pipeline
  * capability (SURVEY §2 extension family); algorithm is public
  * (Sennrich et al. 2016, arXiv:1508.07909; GPT-2's encoder.py).
  */
object Bpe {

  /** Base of the merge-product id range: one past the Unicode
    * codepoint space, so `codepoint | (IdBase + rank)` is a collision-
    * free vocab id assignment (mirrored arithmetically by the DuckDB
    * oracles: 1114112 + rank).
    */
  val IdBase: Int = 0x110000

  /** A compiled merge table. `merges` is rank-ordered: merges(i) is the
    * pair learned at rank i. Serializable (ships in closures); the
    * rank index is rebuilt lazily per JVM.
    */
  final class Table(val merges: Array[(String, String)]) extends Serializable {
    require(merges.nonEmpty, "empty merge table")

    @transient private lazy val rank: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](merges.length * 2)
      var i = 0
      while (i < merges.length) {
        val k = merges(i)._1 + "\u0000" + merges(i)._2
        if (!m.containsKey(k)) m.put(k, Integer.valueOf(i))
        i += 1
      }
      m
    }

    private def rankOf(l: String, r: String): Int = {
      val v = rank.get(l + "\u0000" + r)
      if (v == null) Int.MaxValue else v.intValue()
    }

    @transient private lazy val prodId: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](merges.length * 2)
      var i = 0
      while (i < merges.length) {
        val p = merges(i)._1 + merges(i)._2
        if (!m.containsKey(p)) m.put(p, Integer.valueOf(Bpe.IdBase + i))
        i += 1
      }
      m
    }

    /** Vocab id of an emitted token. Single-codepoint tokens are their
      * codepoint (the byte/codepoint-level base vocab, ids [0,
      * 0x10FFFF]); merge products are [[Bpe.IdBase]] + the LOWEST rank
      * whose concatenation equals the string — a vocab assigns ids to
      * STRINGS, and two merges can concatenate to the same product
      * (("a","bc") and ("ab","c") both make "abc"), so first producer
      * wins, deterministically on both engine and oracle side. Total
      * on tokenize/tokenizeSweep output: a product has >= 2 codepoints
      * (both merge sides are non-empty), so the two id ranges cannot
      * collide, and every multi-codepoint token IS some merge's
      * product.
      */
    def idOf(tok: String): Int =
      if (tok.codePointCount(0, tok.length) == 1) tok.codePointAt(0)
      else {
        val v = prodId.get(tok)
        require(v != null, s"token not in vocab: '$tok'")
        v.intValue()
      }

    /** [[tokenize]] mapped through [[idOf]] — the int form a trainer
      * artifact stores (4 B/token vs the strings' UTF-8 bytes).
      */
    def tokenizeIds(normed: String): Array[Int] = {
      val toks = tokenize(normed)
      val out = new Array[Int](toks.length)
      var i = 0
      while (i < toks.length) { out(i) = idOf(toks(i)); i += 1 }
      out
    }

    /** Canonical min-rank-first BPE encode of an already-normalized
      * string. O(n log n): linked list over token slots + a min-heap of
      * (rank, leftmost-position) candidates with lazy invalidation.
      */
    def tokenize(normed: String): Array[String] = {
      if (normed.isEmpty) return Array.empty[String]
      val cps = normed.codePoints().toArray
      val n = cps.length
      val toks = new Array[String](n)
      var i = 0
      while (i < n) { toks(i) = new String(Character.toChars(cps(i))); i += 1 }
      if (n == 1) return toks
      val nxt = new Array[Int](n)
      val prv = new Array[Int](n)
      val alive = new Array[Boolean](n)
      i = 0
      while (i < n) {
        nxt(i) = if (i == n - 1) -1 else i + 1
        prv(i) = i - 1
        alive(i) = true
        i += 1
      }
      val heap = new PriorityQueue[java.lang.Long]()
      def push(p: Int): Unit = {
        val q = nxt(p)
        if (q != -1) {
          val r = rankOf(toks(p), toks(q))
          if (r != Int.MaxValue)
            heap.add(java.lang.Long.valueOf((r.toLong << 32) | p.toLong))
        }
      }
      i = 0
      while (i < n - 1) { push(i); i += 1 }
      var count = n
      while (!heap.isEmpty) {
        val e = heap.poll().longValue()
        val r = (e >>> 32).toInt
        val p = (e & 0xFFFFFFFFL).toInt
        // lazy invalidation: apply only if the rank-r pair still sits
        // verbatim at p (rank -> pair is unique, so this check is exact)
        if (alive(p)) {
          val q = nxt(p)
          if (q != -1 && rankOf(toks(p), toks(q)) == r) {
            toks(p) = toks(p) + toks(q)
            alive(q) = false
            nxt(p) = nxt(q)
            if (nxt(q) != -1) prv(nxt(q)) = p
            count -= 1
            push(p)
            if (prv(p) != -1) push(prv(p))
          }
        }
      }
      val out = new Array[String](count)
      var c = 0 // slot 0 is never a merge's right element, so it is the head
      var o = 0
      while (c != -1) { out(o) = toks(c); o += 1; c = nxt(c) }
      out
    }

    /** The ORACLE semantics: each merge rank applied once, in rank
      * order, as a single left-to-right non-overlapping sweep — what a
      * SQL `replace` chain computes. Equivalent to [[tokenize]] for
      * trainer-produced tables (see object doc); BpeSpec pins the
      * equivalence on the bundled table.
      */
    def tokenizeSweep(normed: String): Array[String] = {
      if (normed.isEmpty) return Array.empty[String]
      var toks: Array[String] =
        normed.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
      var r = 0
      while (r < merges.length) {
        val (l, rt) = merges(r)
        val out = Array.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == rt) {
            out += l + rt
            i += 2
          } else {
            out += toks(i)
            i += 1
          }
        }
        toks = out.result()
        r += 1
      }
      toks
    }

    def countTokens(normed: String): Int = tokenize(normed).length
  }

  /** Parse a merge table in the standard dump format: one merge per
    * line, left and right separated by a TAB (tokens may contain
    * spaces — byte-level merges cross words — never tabs/newlines).
    */
  def parse(lines: Iterator[String]): Table = {
    val merges = lines.filter(_.nonEmpty).map { line =>
      val t = line.indexOf('\t')
      require(t > 0, s"malformed merge line: '$line'")
      (line.substring(0, t), line.substring(t + 1))
    }.toArray
    new Table(merges)
  }

  def loadResource(path: String): Table = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing merge table resource $path")
    try parse(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  /** The bundled fixture table (200 merges learned from the sf0.001
    * corpus). Loaded once per JVM.
    */
  lazy val fixture: Table = loadResource("/graft/bpe/merges.tsv")

  /** Same normalization chain as [[TextOps.norm]] /
    * [[graft.functions.WordNgramHashes]]: \s+ -> " ", trim, lowercase
    * via UTF8String so case folding matches Spark's Lower exactly.
    */
  def normalize(text: UTF8String): String =
    UTF8String
      .fromString(text.toString.replaceAll("\\s+", " ").trim)
      .toLowerCase.toString

  /** Static entry points called from generated code. */
  def fixtureCount(text: UTF8String): Int =
    fixture.countTokens(normalize(text))

  def fixtureTokens(text: UTF8String): ArrayData = {
    val toks = fixture.tokenize(normalize(text))
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  def fixtureIds(text: UTF8String): ArrayData =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(fixture.tokenizeIds(normalize(text)))

  /** GPT-2-style PRE-TOKENIZED count under the SAME table: the
    * normalized text splits into space-attached pre-tokens (first word
    * bare, every later word carrying its preceding space — the Ġ
    * convention of GPT-2's encoder regex), each encoded independently,
    * so merges apply WITHIN pre-tokens and never cross a word
    * boundary. Space-containing merges still fire (the bundled table's
    * top merge IS (' ', 's')); only boundary-crossing runs change, so
    * count_pretok − count is exactly the word-boundary effect qt42
    * measures. A production pre-tokenized deployment would also TRAIN
    * pre-tokenized; applying the bundled table keeps the two arms'
    * difference attributable to application alone.
    */
  def fixtureCountPretok(text: UTF8String): Int = {
    val n = normalize(text)
    if (n.isEmpty) return 0
    var total = 0
    var start = 0
    while (start < n.length) {
      // the search from start+1 keeps the pre-token's LEADING space
      // attached (norm collapses runs, so spaces are single)
      var end = n.indexOf(' ', if (start == 0) 0 else start + 1)
      if (end < 0) end = n.length
      total += fixture.countTokens(n.substring(start, end))
      start = end
    }
    total
  }
}
