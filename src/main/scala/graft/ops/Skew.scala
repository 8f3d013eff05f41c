package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's runtime skew-join split handles
  * most cases (left ON — see PLANS.md); `saltedJoin` is the manual
  * fallback for the case AQE can't fix: a hot key on the probe side of
  * a shuffle join whose build side is too large to broadcast. The big
  * side's rows scatter across `n` sub-keys; the small side replicates
  * ×n — hot-key partitions shrink by n at the cost of an n× blow-up of
  * the (small) build side.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted n ways. `saltSrc` must be
    * any column of `big` with per-row variety (a unique id is ideal);
    * the salt is a deterministic hash of it, so results are stable
    * across retries/partitionings. Join semantics are identical to
    * `big.join(small, key)` (asserted in SkewSpec).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltSrc: Column, n: Int): DataFrame = {
    require(n > 0, "salt fan-out must be positive")
    val b = big.withColumn("__salt", pmod(xxhash64(saltSrc), lit(n.toLong)))
    val s = small.withColumn("__salt",
      explode(array((0 until n).map(i => lit(i.toLong)): _*)))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
