package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Scalar recompute for q358 (three-valued-logic surface). */
class Round9rSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("q358 null semantics match scalar 3VL and the NOT IN trap always fires") {
    val rows = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey")).collect()
      .map(r => (r.getLong(0), r.getInt(1) % 5))
      .map { case (ck, k) => (ck, if (k == 4) None else Some(k)) }
    val probe: Set[Option[Int]] =
      rows.filter(_._1 % 100 == 0).map(_._2).toSet + None // forced NULL
    val nNull = rows.count(_._2.isEmpty).toLong
    // NOT EXISTS semantics: survive iff no probe element EQUALS (3VL) the key
    val notExists = rows.count { case (_, k) =>
      !probe.exists(p => p.isDefined && k.isDefined && p == k)
    }.toLong
    // null-safe join: IS NOT DISTINCT FROM matches None to None
    val nsJoin = rows.map { case (_, k) => probe.count(_ == k).toLong }.sum
    val r = SparkEntry.queries("q358_null_semantics")(spark, sf).collect().head
    r.getAs[Long]("n_eq_null") shouldBe 0L          // x = NULL is UNKNOWN
    r.getAs[Long]("n_null_safe_null") shouldBe nNull
    r.getAs[Long]("n_not_in") shouldBe 0L           // the forced-NULL trap
    r.getAs[Long]("n_not_exists") shouldBe notExists
    r.getAs[Long]("n_null_safe_join") shouldBe nsJoin
    r.getAs[Long]("trap_gap") shouldBe notExists    // gap = everything NOT IN lost
    notExists should be > 0L // non-vacuous: the complement genuinely exists
  }
}
