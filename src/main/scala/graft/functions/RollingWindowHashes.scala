package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: ALL 64-char-window Rabin-Karp hashes of
  * a string in one O(len) generated loop, as `array<bigint>`.
  *
  * Hash contract (identical to q66/q73's oracle fold): for window start
  * i, H(i) = fold(a = 7; a = (a·131 + c) mod 1e9+7) over the window's
  * code points — i.e. H = (7·131⁶⁴ + Σ c_j·131^{63−j}) mod p. The first
  * window folds directly; each next window rolls in O(1) by removing
  * the outgoing char's 131⁶³ term.
  *
  * This replaces q73's posexplode→prefix-sum→window pipeline (1.17M
  * per-char rows through two Window operators at sf0.1) with one
  * per-document array: the same linear work without shuffle-width
  * row blow-up, and whole-stage-codegen'd end to end.
  */
case class RollingWindowHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_win_hashes expects string, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "rolling_win_hashes"

  override def nullSafeEval(input: Any): Any =
    RollingWindowHashes.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingWindowHashes.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): RollingWindowHashes =
    copy(child = newChild)
}

object RollingWindowHashes {
  final val P = 1000000007L
  final val W = 64
  /** 131^63 mod p (outgoing-char weight) and 7·131^64 mod p (seed term). */
  final val Pow63: Long = BigInt(131).modPow(63, BigInt(P)).toLong
  final val Seed64: Long = (BigInt(7) * BigInt(131).modPow(64, BigInt(P)) % BigInt(P)).toLong

  /** One pass over the CODE POINTS (not UTF-16 units), so supplementary-
    * plane characters hash as one unit — matching both Spark `length()`
    * (UTF8String.numChars counts code points) and DuckDB's per-codepoint
    * `unicode()` fold. See RollingHashesSpec for the non-BMP parity case. */
  def compute(s: UTF8String): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < W) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - W + 1)
    var b = 0L
    var i = 0
    while (i < W) { b = (b * 131 + cps(i)) % P; i += 1 }
    out(0) = (Seed64 + b) % P
    var w = 1
    while (w <= n - W) {
      b = ((b - cps(w - 1).toLong * Pow63) % P + P) % P
      b = (b * 131 + cps(w + W - 1)) % P
      out(w) = (Seed64 + b) % P
      w += 1
    }
    new GenericArrayData(out)
  }
}
