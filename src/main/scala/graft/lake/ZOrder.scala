package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) data layout — multi-dimensional clustering
  * for min/max pruning, the `OPTIMIZE ZORDER BY` analogue of lakehouse
  * table formats. Interleaving the bits of two scan keys gives every
  * file (or row-group) a BOUNDED span in BOTH dimensions, so parquet
  * min/max statistics prune selective predicates on EITHER key — a
  * single-key sort gives perfect pruning on one dimension and none on
  * the other.
  *
  * Scale shape (the point at 100 TB): the z-value is pure built-in bit
  * arithmetic (`shiftright`/`shiftleft`/bitwise and-or folded over a
  * FIXED bit count) — whole-stage-codegen'd, map-only, no UDF. The
  * layout write is one range exchange on the z-value plus an in-
  * partition sort (`repartitionByRange` + `sortWithinPartitions`),
  * i.e. exactly the cost of the single-key sorted write it replaces.
  * Nothing is driver-side; no dimension statistics are collected
  * beyond Spark's own range sampler.
  *
  * Geometry contract (what the spec pins): fixing the top `p` bits of
  * a `bits`-bit-per-dimension z-value fixes the top `ceil(p/2)` bits
  * of the y key and the top `floor(p/2)` bits of the x key, so within
  * one prefix bucket the x-span is < 2^(bits - floor(p/2)) and the
  * y-span < 2^(bits - ceil(p/2)). Both shrink as the prefix grows —
  * the curve trades a constant factor on each single dimension for
  * pruning on all of them.
  *
  * Reference basis: none — the reference stores one bars table sorted
  * by its partition path only (ingest_bars.py's date-keyed layout);
  * this is north-star lake-layout capability for the multi-key scan
  * patterns a 100 TB corpus actually serves.
  */
object ZOrder {

  /** Morton interleave of two non-negative integer columns, `bits`
    * low bits each (bit i of x → z bit 2i, bit i of y → z bit 2i+1).
    * With `strict = true` (the default) a key outside [0, 2^bits)
    * raises at execution time — a silent mask wrap would quietly void
    * the bounded-span property the layout exists for (distant keys
    * sharing a bucket) while staying invisible to any result check, so
    * the domain must fail loudly, not degrade. `strict = false` keeps
    * the masking behavior for callers that have pre-wrapped keys on
    * purpose. Codegen-friendly either way: a fixed fold of built-in
    * bit ops (plus one guarded branch when strict), no UDF.
    */
  def zValue(x: Column, y: Column, bits: Int,
      strict: Boolean = true): Column = {
    require(bits >= 1 && bits <= 31, s"need 1 <= bits <= 31, got $bits")
    val mask = (1L << bits) - 1
    def domain(c: Column, name: String): Column = {
      val v = c.cast("bigint")
      if (!strict) v.bitwiseAND(lit(mask))
      else when(v >= 0 && v <= mask, v).otherwise(raise_error(concat(
        lit(s"ZOrder.zValue: $name key outside $bits-bit domain [0, ${mask}]: "),
        v.cast("string"))))
    }
    val xs = domain(x, "x")
    val ys = domain(y, "y")
    (0 until bits).map { i =>
      shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Deterministic z-prefix bucket: the top `prefixBits` of a
    * `bits`-per-dimension z-value. Unlike a range partition (sampler-
    * dependent), the prefix is a pure function of the keys — this is
    * the bucket id the layout audit and its oracle both compute.
    */
  def prefixBucket(z: Column, bits: Int, prefixBits: Int): Column = {
    require(prefixBits >= 1 && prefixBits <= 2 * bits,
      s"need 1 <= prefixBits <= ${2 * bits}, got $prefixBits")
    shiftright(z, 2 * bits - prefixBits)
  }

  /** Z-ordered layout: range-partition on the interleaved key into
    * `numFiles` output partitions and sort within each — one exchange,
    * one local sort, same cost as a single-key sorted write. Each
    * output file's parquet min/max then bounds BOTH `xCol` and `yCol`.
    */
  def layout(df: DataFrame, xCol: String, yCol: String, bits: Int,
      numFiles: Int): DataFrame = {
    require(!df.columns.contains("_z"),
      "ZOrder.layout: input already has a '_z' column — rename it first " +
        "(the layout would silently overwrite and then drop it)")
    val z = zValue(col(xCol), col(yCol), bits)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }
}
