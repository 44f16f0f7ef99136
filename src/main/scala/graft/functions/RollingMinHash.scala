package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp-Rabin rolling-window minimum hash — a native Catalyst
  * `Expression` with whole-stage codegen (the preferred extension path
  * when built-ins can't express a function; SURVEY.md §2.10). Computes
  * the polynomial hash of every `window`-codepoint substring
  * (base 31, mod 2^31-1) and returns the minimum — a winnowing-style
  * document fingerprint robust to appends/prepends, O(n) via Horner.
  *
  * Deterministic integer math, so any engine reproduces it exactly
  * (DuckDB oracle: min over i of sum(codepoint*31^k) % 2147483647).
  * Returns null for strings shorter than the window.
  */
case class RollingMinHash(child: Expression, window: Int)
    extends UnaryExpression {

  // 31^(w-1) * maxCodepoint(0x10FFFF) * 31/30 must stay < 2^63:
  // holds through w=9 (31^8 * 1.11e6 * 1.034 ~ 9.8e17), overflows at w=10
  require(window >= 1 && window <= 9,
    "window must be in [1,9] so Horner stays within Long without modular steps")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val r = RollingMinHash.compute(input.asInstanceOf[UTF8String], window)
    if (r < 0) null else java.lang.Long.valueOf(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultVar = ctx.freshName("rmh")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |long $resultVar = graft.functions.RollingMinHash.compute($c, $window);
         |if ($resultVar < 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $resultVar;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

object RollingMinHash {

  val Base = 31L
  val Mod = 2147483647L // 2^31 - 1

  /** Min rolling hash over codepoints; -1 encodes null (too short).
    * Called from generated code — must stay a static-style method.
    */
  def compute(s: UTF8String, window: Int): Long = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < window) return -1L
    var min = Long.MaxValue
    var i = 0
    while (i + window <= n) {
      // Horner, no intermediate mod — safe for window <= 9 (see require)
      var h = 0L
      var j = 0
      while (j < window) { h = h * Base + cps(i + j); j += 1 }
      h = h % Mod
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Column API. */
  def rolling_min_hash(c: Column, window: Int): Column =
    ColumnBridge.column(RollingMinHash(ColumnBridge.expression(c), window))
}
