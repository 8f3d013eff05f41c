package graft.plans

import graft.functions.Md5Mod
import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, Literal, Md5, Remainder, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType}

/** Optimizer rule: rewrite the portable md5-hash-to-bigint SQL chain
  *
  * `cast(conv(substr(md5(cast(s as binary)), 1, 15), 16, 10) as bigint) % m`
  *
  * into the native codegen'd [[Md5Mod]] expression — so a user writing
  * the cross-engine spelling (the exact idiom this repo's DuckDB
  * oracles use) gets the fused, allocation-free implementation without
  * changing their query. Bit-parity of the rewrite is proven in
  * Md5ModSpec (codegen + interpreted vs a MessageDigest recompute and
  * vs the chain itself); the rewrite is applied ONLY when the modulus
  * is a non-zero literal, because ANSI `%` errors on a zero divisor
  * where md5_mod returns NULL — degenerate-modulus queries keep their
  * engine-native behavior.
  *
  * Injected by [[graft.GraftExtensions]] (`injectOptimizerRule`); in
  * an existing session it can be added via
  * `spark.experimental.extraOptimizations`.
  */
object RewriteMd5Chain extends Rule[LogicalPlan] {

  private def isIntLit(e: Expression, v: Long): Boolean = e match {
    case Literal(x: Int, IntegerType) => x.toLong == v
    case Literal(x: Long, LongType) => x == v
    case _ => false
  }

  /** Matches `cast(conv(substr(md5(cast(s as binary)), 1, 15), 16, 10)
    * as bigint)` and extracts the string expression `s`. */
  private object ChainTarget {
    def unapply(e: Expression): Option[Expression] = e match {
      case Cast(conv: Conv, LongType, _, _) =>
        conv.children match {
          case Seq(sub: Substring, from, to) if isIntLit(from, 16) && isIntLit(to, 10) =>
            sub.children match {
              case Seq(md: Md5, pos, len) if isIntLit(pos, 1) && isIntLit(len, 15) =>
                md.child match {
                  case Cast(s, BinaryType, _, _) if s.dataType.isInstanceOf[StringType] =>
                    Some(s)
                  case _ => None
                }
              case _ => None
            }
          case _ => None
        }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Remainder(ChainTarget(s), m @ Literal(mv: Long, LongType), _) if mv != 0L =>
      Md5Mod(s, m)
  }
}
