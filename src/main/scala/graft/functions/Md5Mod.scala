package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `md5_mod(s, m)` ≡
  * `cast(conv(substr(md5(cast(s as binary)), 1, 15), 16, 10) as bigint) % m`
  * — the repo's deterministic-split/hash idiom (q58 and every
  * md5-keyed split, arm assignment, bucket and gram hash) collapsed
  * into ONE codegen'd call.
  *
  * Why native: the built-in chain materializes the full 32-char hex
  * string per row (Md5 → UTF8String), substrings it, then re-parses 15
  * hex digits through Conv's general base-conversion loop. This
  * expression digests the UTF8 bytes directly and assembles the same
  * 60-bit value from the first 8 digest bytes — first 15 hex chars =
  * nibbles 0–14 = (big-endian first-8-bytes >>> 4) — with zero
  * intermediate allocation beyond the 16-byte digest.
  *
  * Bit-parity contract: 15 hex digits < 2^60 so the value is
  * non-negative in a signed long; `% m` for positive operands is
  * identical in Java, Spark's Remainder, and DuckDB's `%` — swapping
  * this into an oracle-matched query changes the plan, not the bits
  * (asserted against the SQL chain in Md5ModSpec).
  *
  * Null contract: NULL in → NULL out (BinaryExpression default), and
  * m = 0 → NULL — matching the Remainder chain this expression claims
  * bit-parity with, which returns NULL on a zero divisor (non-ANSI)
  * where a bare Java `% 0` would throw. No current call site passes a
  * non-positive modulus, but the parity contract is total either way.
  */
case class Md5Mod(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  // implicit casts: md5_mod(s, 64) with an INT literal (the natural
  // spelling) and non-default-collation strings both coerce instead of
  // failing analysis the way an exact-type check would. Covariant
  // Seq[DataType] override — AbstractDataType is private[sql].
  override def inputTypes: Seq[DataType] = Seq(StringType, LongType)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "md5_mod"

  override def nullSafeEval(s: Any, m: Any): Any = {
    val mod = m.asInstanceOf[Long]
    if (mod == 0L) null
    else Md5Mod.hash(s.asInstanceOf[UTF8String].getBytes, mod)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, m) =>
      s"""
         |if ($m == 0L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.Md5Mod.hash($s.getBytes(), $m);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Md5Mod =
    copy(left = newLeft, right = newRight)
}

object Md5Mod {
  /** Per-thread digest instance — getInstance("MD5") per row would
    * dominate the hash itself. */
  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** (first 15 hex chars of md5(bytes) as base-16 long) % m. */
  def hash(bytes: Array[Byte], m: Long): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(bytes)
    var top = 0L
    var i = 0
    while (i < 8) { top = (top << 8) | (h(i) & 0xffL); i += 1 }
    (top >>> 4) % m
  }
}
