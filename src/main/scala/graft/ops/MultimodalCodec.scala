package graft.ops

/** Synthetic grayscale-image codec behind the multimodal decode stage
  * (q57): a REAL binary format with a real parser, standing in for
  * JPEG/PNG decode (no media libraries exist in this container — the
  * declared stub surface from rounds 2–5, now an actual codec).
  *
  * Format: magic "GRFT" (4 bytes) | version 0x01 | width u16 BE |
  * height u16 BE | RLE pairs (runLen u8 in 1..255, pixel u8), row-major.
  *
  * The encoder synthesizes the image deterministically from doc_id:
  * dims w = 8 + id % 24, h = 8 + (id/24) % 24 (so 64..961 px) and pixel
  * i = (id·2654435761 + (i/7)·40503) % 251 — 7-pixel blocks whose
  * adjacent values always differ (40503 % 251 = 92 ≠ 0 mod 251), so the
  * RLE genuinely compresses and run boundaries are non-trivial. Plain
  * integer arithmetic throughout so the DuckDB oracle can recompute
  * every decoded statistic cross-engine: the decoder reads ONLY payload
  * bytes, and the oracle matches iff the codec round-trips bit-exactly.
  */
object MultimodalCodec {
  final case class Decoded(w: Int, h: Int, nPx: Long, nRuns: Long,
      maxRun: Long, sumPx: Long, checksum: Long)

  def dims(id: Long): (Int, Int) =
    ((8 + id % 24).toInt, (8 + (id / 24) % 24).toInt)

  def pixel(id: Long, i: Int): Int =
    ((id * 2654435761L + (i / 7).toLong * 40503L) % 251L).toInt

  def encode(id: Long): Array[Byte] = {
    val (w, h) = dims(id)
    val n = w * h
    val out = new scala.collection.mutable.ArrayBuffer[Byte](9 + n / 2)
    out += 'G'; out += 'R'; out += 'F'; out += 'T'; out += 1
    out += (w >> 8).toByte; out += (w & 0xff).toByte
    out += (h >> 8).toByte; out += (h & 0xff).toByte
    var i = 0
    while (i < n) {
      val v = pixel(id, i)
      var run = 1
      while (i + run < n && run < 255 && pixel(id, i + run) == v) run += 1
      out += run.toByte; out += v.toByte
      i += run
    }
    out.toArray
  }

  /** Parses header + RLE payload. Every decoded statistic comes from
    * the BYTES, never re-derived from doc_id — that independence is
    * what makes the oracle a real round-trip check. Throws on bad
    * magic/version/truncation/dim mismatch: a malformed blob must fail
    * loudly, not yield silent garbage features.
    *
    * checksum = Σ pixel_i · (i+1) mod 1e9+7 (1-based positions), a
    * position-sensitive digest: any transposition or off-by-one in the
    * RLE expansion changes it even when sum/count survive.
    */
  def decode(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 9, s"payload truncated: ${bytes.length} bytes")
    require(bytes(0) == 'G' && bytes(1) == 'R' && bytes(2) == 'F' && bytes(3) == 'T',
      "bad magic")
    require(bytes(4) == 1, s"unsupported version ${bytes(4)}")
    val w = ((bytes(5) & 0xff) << 8) | (bytes(6) & 0xff)
    val h = ((bytes(7) & 0xff) << 8) | (bytes(8) & 0xff)
    require((bytes.length - 9) % 2 == 0, "odd RLE tail")
    var p = 9
    var nPx = 0L; var nRuns = 0L; var maxRun = 0L; var sumPx = 0L; var checksum = 0L
    while (p < bytes.length) {
      val run = bytes(p) & 0xff
      val v = (bytes(p + 1) & 0xff).toLong
      require(run >= 1, "zero-length run")
      nRuns += 1
      if (run > maxRun) maxRun = run
      var k = 0
      while (k < run) {
        nPx += 1
        sumPx += v
        checksum = (checksum + v * nPx) % 1000000007L
        k += 1
      }
      p += 2
    }
    require(nPx == w.toLong * h, s"decoded $nPx px for ${w}x$h")
    Decoded(w, h, nPx, nRuns, maxRun, sumPx, checksum)
  }

  /** Full pixel expansion of a payload (row-major), for the transform
    * stages that need the raster back (pooling q354). Bytes-only, like
    * [[decode]] — the formula is never consulted. */
  def decodePixels(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val d = decode(bytes) // validates magic/version/dims first
    val px = new Array[Int](d.nPx.toInt)
    var p = 9; var i = 0
    while (p < bytes.length) {
      val run = bytes(p) & 0xff
      val v = bytes(p + 1) & 0xff
      var k = 0
      while (k < run) { px(i) = v; i += 1; k += 1 }
      p += 2
    }
    (d.w, d.h, px)
  }

  final case class Pooled(w2: Int, h2: Int, nPx2: Long, sumPx2: Long,
      checksum2: Long)

  /** 2×2 average-pool (floor) of the decoded raster — the resize /
    * feature-extract step of a media pipeline, on the real bytes: odd
    * trailing row/column is dropped (standard floor pooling). The
    * pooled checksum is position-sensitive like [[decode]]'s. */
  def pool2x(bytes: Array[Byte]): Pooled = {
    val (w, h, px) = decodePixels(bytes)
    val w2 = w / 2; val h2 = h / 2
    var sum = 0L; var checksum = 0L; var j = 0
    var r = 0
    while (r < h2) {
      var c = 0
      while (c < w2) {
        val base = (2 * r) * w + 2 * c
        val v = (px(base) + px(base + 1) + px(base + w) + px(base + w + 1)) / 4
        j += 1
        sum += v
        checksum = (checksum + v.toLong * j) % 1000000007L
        c += 1
      }
      r += 1
    }
    Pooled(w2, h2, w2.toLong * h2, sum, checksum)
  }
}
