package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Grouped cumulative product and group product — the two aggregates the
  * reference leans on that Spark lacks natively (reference:
  * legacy_scripts/factor_builder.py:269-276 `ratio.cumprod()` for split
  * factors, :328-336 `g.cumprod()` for total-return factors; same-day
  * multi-event products at :269, :328).
  *
  * Two strategies:
  *  - `exact`: left-to-right multiply via the higher-order `aggregate`
  *    over a windowed `collect_list`. Bit-exact, sign-safe (TR day factors
  *    can be <= 0 when a dividend exceeds the prior base), but O(n²)
  *    buffer per group — fine for per-security daily factor series
  *    (≲ 10⁴ rows/group), not for unbounded groups.
  *  - `logSum`: exp(sum(log x)) over the running frame — single-pass,
  *    codegen-friendly, valid only for strictly positive inputs (split
  *    ratios are). Sign handling for the TR path: split out the sign via
  *    parity of the running negative count.
  */
object Cumulative {

  /** Exact running product over `spec` (caller supplies partition+order). */
  def cumprodExact(c: Column, spec: WindowSpec): Column =
    aggregate(
      collect_list(c).over(spec.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
      lit(1.0),
      (acc, x) => acc * x)

  /** Running product via exp·sum·log for strictly positive inputs. */
  def cumprodLog(c: Column, spec: WindowSpec): Column =
    exp(sum(log(c)).over(spec.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  /** Running product handling zeros and negatives: magnitude from logs of
    * |x|, zero once any zero seen, sign from parity of negatives so far.
    */
  def cumprodSigned(c: Column, spec: WindowSpec): Column = {
    val frame = spec.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val anyZero = max(when(c === 0.0, 1).otherwise(0)).over(frame)
    val negCount = sum(when(c < 0.0, 1).otherwise(0)).over(frame)
    val magnitude = exp(sum(log(abs(c))).over(frame))
    val sign = when(negCount % 2 === 0, 1.0).otherwise(-1.0)
    when(anyZero === 1, 0.0).otherwise(sign * magnitude)
  }

  /** Exact group product as an aggregate expression: multiply in the order
    * given by `orderCol` (deterministic ⇒ reproducible float result).
    * Usage: df.groupBy(k).agg(Cumulative.productAgg($"x", $"ord")).
    */
  def productAgg(c: Column, orderCol: Column): Column =
    aggregate(
      transform(array_sort(collect_list(struct(orderCol.as("o"), c.as("v")))),
        s => s.getField("v")),
      lit(1.0),
      (acc, x) => acc * x)

  /** Group product, order-insensitive positive inputs: exp(sum(ln)). */
  def productLog(c: Column): Column = exp(sum(log(c)))
}
