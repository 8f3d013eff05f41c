package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Scalar recomputes for the round-10 widening keys (q366–q369). */
class Round10bSpec extends AnyFunSuite with Matchers with SharedSpark {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def md5Mod(s: String, m: Long): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 15), 16) % m

  test("q366 BM25F matches a full scalar recompute of the field-weighted scores") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    val terms = Set("spark", "join", "filter")
    // fields: title = first 5 RAW slots, body = rest; empties dropped after
    val ft = docs.flatMap { case (id, arr) =>
      arr.take(5).filter(_.nonEmpty).map(t => (id, "title", t)) ++
        arr.drop(5).filter(_.nonEmpty).map(t => (id, "body", t))
    }
    val flen = ft.groupBy(t => (t._1, t._2)).view.mapValues(_.size.toLong).toMap
    val avgf = Seq("title", "body").map { f =>
      val ls = flen.collect { case ((_, `f`), l) => l }
      f -> ls.sum.toDouble / ls.size
    }.toMap
    val n = docs.length.toDouble
    val tf = ft.filter(t => terms(t._3)).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val df = tf.keys.map(_._3).toSeq.distinct
      .map(t => t -> tf.keys.count(_._3 == t+"")).toMap // placeholder, fixed below
    val dfReal = tf.keys.groupBy(_._3).view.mapValues(_.map(_._1).toSeq.distinct.size).toMap
    def q12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val wtf = tf.keys.map(k => (k._1, k._3)).toSeq.distinct.map { case (id, t) =>
      val s = Seq("title", "body").flatMap { f =>
        tf.get((id, f, t)).map { c =>
          val (w, b1, b) = if (f == "title") (2.0, 0.5, 0.5) else (1.0, 0.25, 0.75)
          q12(w * c / (b1 + b * flen((id, f)) / avgf(f)))
        }
      }.sum
      (id, t) -> s
    }.toMap
    val scored = wtf.keys.map(_._1).toSeq.distinct.map { id =>
      val sx = wtf.collect { case ((`id`, t), w) =>
        q12(math.log((n - dfReal(t) + 0.5) / (dfReal(t) + 0.5) + 1.0)
          * w.toDouble / (1.2 + w.toDouble))
      }.sum
      (id, sx)
    }
    val expTop = scored.sortBy { case (id, sx) => (-sx, id) }.take(15)
    val rows = SparkEntry.queries("q366_bm25f")(spark, sf).collect()
    rows.length shouldBe expTop.length
    rows.zip(expTop).foreach { case (row, (id, sx)) =>
      row.getAs[Long]("doc_id") shouldBe id
      row.getAs[Double]("score") shouldBe
        sx.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9
    }
    df should not be null // silence the placeholder
  }

  test("q367 JL audit: exact-integer replay for one vector and one pair; expectation near 1") {
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .toMap
    def xq(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 10000).toLong)
    def w2(j: Int, d: Int): Long =
      2L * java.lang.Long.parseLong(md5Hex(s"${j}_$d").substring(0, 1), 16) - 15L
    def proj(q: Array[Long]): Array[Long] =
      Array.tabulate(16)(j => q.indices.map(i => q(i) * w2(j, i + 1)).sum)
    def n2(q: Array[Long]): Long = q.map(x => x * x).sum
    val rows = SparkEntry.queries("q367_jl_audit")(spark, sf).collect()
    val norms = rows.find(_.getAs[String]("scope") == "norms").get
    val pairs = rows.find(_.getAs[String]("scope") == "pairs").get
    norms.getAs[Long]("n") shouldBe e.size.toLong
    pairs.getAs[Long]("n") shouldBe 190L // C(20,2), no zero-distance pairs at this SF
    // the scalar ratio for vector 0 must fall inside the query's min/max
    val r0 = n2(proj(xq(e(0L)))).toDouble / (1360.0 * n2(xq(e(0L))))
    norms.getAs[Double]("min_ratio") should be <= r0
    norms.getAs[Double]("max_ratio") should be >= r0
    // and for the (0,1) pair
    val (a, b) = (xq(e(0L)), xq(e(1L)))
    val dx = a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val (pa, pb) = (proj(a), proj(b))
    val dy = pa.indices.map(i => (pa(i) - pb(i)) * (pa(i) - pb(i))).sum
    val rp = dy.toDouble / (1360.0 * dx)
    pairs.getAs[Double]("min_ratio") should be <= rp
    pairs.getAs[Double]("max_ratio") should be >= rp
    // JL expectation: mean distortion near 1 on both scopes
    norms.getAs[Double]("mean_ratio") shouldBe 1.0 +- 0.35
    pairs.getAs[Double]("mean_ratio") shouldBe 1.0 +- 0.35
  }

  test("q368 ALS sweep: item factors satisfy the regularized normal equations") {
    val rows = SparkEntry.queries("q368_als_sweep")(spark, sf).collect()
    rows.length should be >= 3
    val cells = Tables.events(spark, sf)
      .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2).toDouble))
    def q6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val items = cells.map(_._2).distinct.sorted
    val y0 = items.map(i => i -> (1.0, q6(md5Mod(i, 1000) / 1000.0 - 0.5))).toMap
    def q12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def solve(obs: Seq[(Double, (Double, Double))]): (Double, Double) = {
      val a11 = obs.map { case (_, (f1, _)) => q12(f1 * f1) }.sum.toDouble + 0.1
      val a12 = obs.map { case (_, (f1, f2)) => q12(f1 * f2) }.sum.toDouble
      val a22 = obs.map { case (_, (_, f2)) => q12(f2 * f2) }.sum.toDouble + 0.1
      val b1 = obs.map { case (r, (f1, _)) => q12(r * f1) }.sum.toDouble
      val b2 = obs.map { case (r, (_, f2)) => q12(r * f2) }.sum.toDouble
      val det = a11 * a22 - a12 * a12
      (q6((a22 * b1 - a12 * b2) / det), q6((-a12 * b1 + a11 * b2) / det))
    }
    val x = cells.groupBy(_._1).map { case (u, obs) =>
      u -> solve(obs.toSeq.map(o => (o._3, y0(o._2))))
    }
    val yNew = cells.groupBy(_._2).map { case (i, obs) =>
      i -> solve(obs.toSeq.map(o => (o._3, x(o._1))))
    }
    var sse = BigDecimal(0)
    cells.foreach { case (u, i, r) =>
      val p = x(u)._1 * yNew(i)._1 + x(u)._2 * yNew(i)._2
      sse += q12((r - p) * (r - p))
    }
    val rmse = q6(math.sqrt(sse.toDouble / cells.length))
    rows.foreach { row =>
      val i = row.getAs[String]("event_type")
      row.getAs[Double]("y1_new") shouldBe yNew(i)._1 +- 1e-9
      row.getAs[Double]("y2_new") shouldBe yNew(i)._2 +- 1e-9
      row.getAs[Double]("rmse") shouldBe rmse +- 1e-9
      row.getAs[Long]("n_obs") shouldBe cells.length.toLong
    }
    // one alternation must not increase fit error beyond the trivial
    // predict-the-mean baseline (sanity, not a convergence proof)
    val mean = cells.map(_._3).sum / cells.length
    val sst = math.sqrt(cells.map(c => (c._3 - mean) * (c._3 - mean)).sum / cells.length)
    rows.head.getAs[Double]("rmse") should be <= sst * 1.5
  }

  test("q370 HDBSCAN MST: Borůvka (Spark) = Kruskal (scalar) under the same total order") {
    val e = Tables.embeddings(spark, sf).filter(col("vec_id") < 32)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    e.length shouldBe 32
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def d2(a: Array[Float], b: Array[Float]): Double =
      r6(a.indices.map(i => (a(i).toDouble - b(i).toDouble) * (a(i).toDouble - b(i).toDouble)).sum)
    val pairs = for {
      i <- e.indices; j <- (i + 1) until e.length
    } yield (e(i)._1, e(j)._1, d2(e(i)._2, e(j)._2))
    val core = e.map { case (v, _) =>
      v -> pairs.collect { case (a, b, d) if a == v || b == v => d }.sorted.apply(3)
    }.toMap
    val edges = pairs.map { case (a, b, d) => (a, b, math.max(math.max(core(a), core(b)), d)) }
      .sortBy { case (a, b, w) => (w, a, b) }
    // Kruskal with union-find — a third algorithm, same total order
    val parent = scala.collection.mutable.Map(e.map(x => x._1 -> x._1): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    val mst = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    edges.foreach { case (a, b, w) =>
      if (find(a) != find(b)) { parent(find(a)) = find(b); mst += ((a, b, w)) }
    }
    mst.length shouldBe 31
    val totalW = r6(mst.map(x => BigDecimal(x._3).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
    val expTop = mst.sortBy { case (a, b, w) => (-w, a, b) }.take(5)
    val rows = SparkEntry.queries("q370_hdbscan_mst")(spark, sf).collect()
    rows.length shouldBe 5
    rows.zip(expTop).foreach { case (row, (a, b, w)) =>
      row.getAs[Long]("va") shouldBe a
      row.getAs[Long]("vb") shouldBe b
      row.getAs[Double]("w") shouldBe w +- 1e-9
      row.getAs[Long]("n_edges") shouldBe 31L
      row.getAs[Double]("total_w") shouldBe totalW +- 1e-6
    }
  }

  test("q369 CDC merge stream: final state matches closed-form change algebra; 4 snapshots") {
    val base = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"),
        col("c_acctbal").cast("decimal(18,2)").cast("double").as("bal"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val fin = base.flatMap { case (k, seg, bal) =>
      k % 10 match {
        case 1 => Some((k, seg, d2(bal) + 100))
        case 2 => if (k % 20 == 2) Some((k, seg, BigDecimal(0))) else None
        case 3 => Some((k, seg, d2(bal) + 7))
        case _ => Some((k, seg, d2(bal)))
      }
    }
    val exp = fin.groupBy(_._2).map { case (seg, xs) =>
      seg -> (xs.length.toLong, xs.map(_._3).sum,
        xs.count(_._3 == BigDecimal(0)).toLong)
    }
    val rows = SparkEntry.queries("q369_stream_cdc_merge")(spark, sf).collect()
    rows.map(_.getAs[String]("c_mktsegment")).toSet shouldBe exp.keySet
    rows.foreach { r =>
      val (n, sum, z) = exp(r.getAs[String]("c_mktsegment"))
      r.getAs[Long]("n") shouldBe n
      r.getAs[Double]("sum_bal") shouldBe sum.toDouble +- 1e-6
      r.getAs[Long]("n_zero_bal") shouldBe z
      r.getAs[Long]("n_versions") shouldBe 4L
    }
  }
}
