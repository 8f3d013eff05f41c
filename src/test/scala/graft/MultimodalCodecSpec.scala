package graft

import graft.ops.MultimodalCodec
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** q57's codec, from first principles: the decoder's statistics must
  * equal a direct recompute over the pixel formula (round trip), and a
  * corrupt payload must throw, never yield silent garbage features.
  */
class MultimodalCodecSpec extends AnyFunSuite with Matchers with SharedSpark {

  test("decode(encode(id)) statistics match a direct pixel recompute") {
    for (id <- Seq(0L, 1L, 23L, 24L, 499L, 575L, 4999L)) {
      val (w, h) = MultimodalCodec.dims(id)
      val px = Array.tabulate(w * h)(i => MultimodalCodec.pixel(id, i))
      val d = MultimodalCodec.decode(MultimodalCodec.encode(id))
      d.w shouldBe w
      d.h shouldBe h
      d.nPx shouldBe w.toLong * h
      d.sumPx shouldBe px.map(_.toLong).sum
      d.checksum shouldBe px.zipWithIndex
        .map { case (v, i) => v.toLong * (i + 1) }.sum % 1000000007L
      // maximal runs from first principles (same 255 cap as the encoder)
      val runs = px.foldLeft(List.empty[(Int, Int)]) {
        case ((v, n) :: t, x) if x == v && n < 255 => (v, n + 1) :: t
        case (acc, x) => (x, 1) :: acc
      }
      d.nRuns shouldBe runs.length.toLong
      d.maxRun shouldBe runs.map(_._2).max.toLong
    }
  }

  test("malformed payloads are rejected loudly") {
    val good = MultimodalCodec.encode(42L)
    an[IllegalArgumentException] should be thrownBy
      MultimodalCodec.decode(good.take(5)) // truncated header
    an[IllegalArgumentException] should be thrownBy
      MultimodalCodec.decode("XXXX".getBytes ++ good.drop(4)) // bad magic
    an[IllegalArgumentException] should be thrownBy
      MultimodalCodec.decode(good.dropRight(1)) // odd RLE tail
    val badVer = good.clone(); badVer(4) = 9
    an[IllegalArgumentException] should be thrownBy MultimodalCodec.decode(badVer)
    val badDim = good.clone(); badDim(6) = (badDim(6) + 1).toByte
    an[IllegalArgumentException] should be thrownBy
      MultimodalCodec.decode(badDim) // dims no longer match decoded count
  }

  test("q57 query surface equals the formula on dims for every document") {
    val rows = SparkEntry.queries("q57_multimodal_decode")(spark, sf).collect()
    rows.length should be > 0
    for (r <- rows) {
      val id = r.getAs[Long]("doc_id")
      val (w, h) = MultimodalCodec.dims(id)
      r.getAs[Long]("w") shouldBe w.toLong
      r.getAs[Long]("h") shouldBe h.toLong
      r.getAs[Long]("n_px") shouldBe w.toLong * h
    }
  }
}
