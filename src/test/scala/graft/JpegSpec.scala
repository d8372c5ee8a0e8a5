package graft

import org.apache.spark.sql.functions._
import graft.ops.{Jpeg, Multimodal}

/** Baseline JPEG codec pins (round 13): the flat-raster fixture
  * roundtrips EXACTLY (the DC-only closed form), restart framing
  * changes bytes but never pixels, the general AC path matches a
  * naive O(64²) spec-formula IDCT written independently here, 4:2:0
  * chroma subsampling upsamples by replication with the documented
  * integer colour convert, and everything outside the baseline
  * envelope degrades to None, never throws. */
class JpegSpec extends SparkSpec {

  test("jpeg: flat raster decode inverts synthesis exactly under " +
      "every restart framing") {
    for (seed <- Seq(0, 41, 82, 123, 164, 205, 246); dri <- Seq(0, 1, 3)) {
      val bytes = Jpeg.synthJpegRaster(32, 24, seed, dri)
      val px = Multimodal.decodePixels(bytes)
        .getOrElse(fail(s"seed $seed dri $dri did not decode"))
      assert(px.width == 32 && px.height == 24 && px.channels == 3)
      for (y <- 0 until 24; x <- 0 until 32; c <- 0 until 3)
        assert((px.data((y * 32 + x) * 3 + c) & 0xff) ==
          Jpeg.blockLuma(x / 8, y / 8, seed),
          s"seed $seed dri $dri pixel ($x,$y,$c)")
    }
  }

  test("jpeg: restart variants differ in bytes, collide in pixels " +
      "and perceptual hash") {
    val a = Jpeg.synthJpegRaster(32, 24, 41, dri = 0)
    val b = Jpeg.synthJpegRaster(32, 24, 41, dri = 1)
    assert(!java.util.Arrays.equals(a, b))
    val pa = Multimodal.decodePixels(a).get
    val pb = Multimodal.decodePixels(b).get
    assert(java.util.Arrays.equals(pa.data, pb.data))
    assert(Multimodal.dHash(pa) == Multimodal.dHash(pb))
  }

  /** Naive direct-form 2-D IDCT (T.81 A.3.3), written independently
    * of the decoder's separable pass. */
  private def naiveIdct(coef: Array[Int], quant: Array[Int])
      : Array[Int] = {
    def cc(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    Array.tabulate(64) { i =>
      val x = i % 8; val y = i / 8
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8)
        s += cc(u) * cc(v) / 4.0 * coef(v * 8 + u) * quant(v * 8 + u) *
          math.cos((2 * x + 1) * u * math.Pi / 16.0) *
          math.cos((2 * y + 1) * v * math.Pi / 16.0)
      val p = math.round(s).toInt + 128
      math.max(0, math.min(255, p))
    }
  }

  test("jpeg: AC coefficient path (runs, ZRL, EOB) matches the naive " +
      "spec IDCT on a grey image with crop") {
    // 20×13 grey: 3×2 padded block grid, right/bottom crop exercised.
    // Coefficients: a formula placing sparse ACs with long zero runs
    // (forces ZRL) and magnitudes ≤ 15 (the fixture AC table's size
    // cap), quant table with per-band values.
    val quant = Array.tabulate(64)(i => 1 + (i % 7))
    def coefBlock(bx: Int, by: Int): Array[Int] = {
      val b = new Array[Int](64)
      b(0) = (bx * 11 + by * 19) % 50 - 25
      b(1) = 7 - bx; b(8) = by - 3
      b(27) = if ((bx + by) % 2 == 0) 13 else -13
      b(63) = 5 // zigzag-last: a maximal run before it
      b
    }
    val bytes = Jpeg.encodeBaseline(20, 13, nComp = 1, hY = 1, vY = 1,
      quant, coefs = _ => coefBlock)
    val px = Multimodal.decodePixels(bytes).get
    assert(px.width == 20 && px.height == 13 && px.channels == 1)
    for (by <- 0 until 2; bx <- 0 until 3) {
      val ref = naiveIdct(coefBlock(bx, by), quant)
      for (y <- 0 until 8; x <- 0 until 8
           if bx * 8 + x < 20 && by * 8 + y < 13) {
        val got = px.data((by * 8 + y) * 20 + bx * 8 + x) & 0xff
        assert(math.abs(got - ref(y * 8 + x)) <= 1,
          s"block ($bx,$by) pixel ($x,$y): $got vs ${ref(y * 8 + x)}")
      }
    }
  }

  test("jpeg: 4:2:0 chroma subsampling upsamples by replication and " +
      "colour-converts per the documented formula") {
    // Y: flat per block; Cb/Cr: flat non-neutral constants — chroma
    // decode is DC-exact, so the expected RGB is closed-form.
    val quant = Array.fill(64)(8)
    val yOf = (bx: Int, by: Int) => 40 + bx * 30 + by * 50
    val bytes = Jpeg.encodeBaseline(16, 16, nComp = 3, hY = 2, vY = 2,
      quant, coefs = ci => (bx, by) => {
        val b = new Array[Int](64)
        b(0) = ci match {
          case 0 => yOf(bx, by) - 128
          case 1 => 160 - 128 // Cb
          case _ => 96 - 128 // Cr
        }
        b
      })
    val px = Multimodal.decodePixels(bytes).get
    assert(px.width == 16 && px.height == 16 && px.channels == 3)
    val cb = 160 - 128; val cr = 96 - 128
    for (y <- 0 until 16; x <- 0 until 16) {
      val yv = yOf(x / 8, y / 8).toDouble
      def clamp(d: Double) =
        math.max(0, math.min(255, math.round(d).toInt))
      val o = (y * 16 + x) * 3
      assert((px.data(o) & 0xff) == clamp(yv + 1.402 * cr))
      assert((px.data(o + 1) & 0xff) ==
        clamp(yv - 0.344136 * cb - 0.714136 * cr))
      assert((px.data(o + 2) & 0xff) == clamp(yv + 1.772 * cb))
    }
  }

  test("jpeg: out-of-envelope payloads degrade to None, never throw") {
    // progressive header stub (the undecodable mixed-fixture arm)
    assert(Multimodal.decodePixels(
      Multimodal.synthJpeg(16, 16, progressive = true)).isEmpty)
    // baseline header with no tables / scan
    assert(Multimodal.decodePixels(
      Multimodal.synthJpeg(16, 16, progressive = false)).isEmpty)
    // truncated entropy stream
    val full = Jpeg.synthJpegRaster(32, 24, 41)
    assert(Jpeg.decodePixels(full.dropRight(40)).isEmpty)
    // hostile dimensions are capped, not allocated
    assert(Jpeg.decodePixels(full, maxPixels = 100).isEmpty)
    // garbage
    assert(Jpeg.decodePixels("not a jpeg".getBytes).isEmpty)
    assert(Jpeg.decodePixels(Array.emptyByteArray).isEmpty)
  }

  test("jpeg: decode audit over the mixed corpus accounts the " +
      "partially-decodable jpeg arm loudly") {
    val s = spark
    import s.implicits._
    val docs = (0L until 64L).toDF("doc_id")
    val audit = Multimodal.decodeAudit(
      Multimodal.synthMixedMedia(docs, "doc_id"), "doc_id", "payload")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(audit("png") == ((32L, 32L, 0L)))
    // id%8==2 baseline + id%16==6 REAL progressive decode (r14);
    // the id%16==14 slot rotates over the NAMED variants (arith
    // mod 48 = 14, 12-bit = 30 — loud-skip stubs — and CMYK = 46, a
    // REAL Adobe raster decodable since r16) — one audit row per
    // variant, summing to the former (16, 12→13, 4→3) jpeg arm
    assert(audit("jpeg_baseline") == ((8L, 8L, 0L)))
    assert(audit("jpeg_progressive") == ((4L, 4L, 0L)))
    assert(audit("jpeg_arith") == ((2L, 0L, 2L)))
    assert(audit("jpeg_12bit") == ((1L, 0L, 1L)))
    assert(audit("jpeg_cmyk") == ((1L, 1L, 0L)))
    val jpeg = audit.collect { case (k, v) if k.startsWith("jpeg") => v }
    assert(jpeg.map(_._1).sum == 16L && jpeg.map(_._2).sum == 13L &&
      jpeg.map(_._3).sum == 3L)
    assert(audit("wav") == ((16L, 0L, 16L)))
  }

  test("jpeg: distributed phash over real baseline JPEGs matches the " +
      "block-formula dHash; same seed collides across framings") {
    val s = spark
    import s.implicits._
    val docs = (0L until 42L).toDF("doc_id")
    val out = Multimodal.imagePhash(
      Multimodal.synthJpegRasterMedia(docs, "doc_id"),
      "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out.size == 42)
    // driver recompute from the formula alone (9×7 grid over 32×24)
    def expected(id: Long): Long = {
      val seed = ((id % 7) * 41).toInt
      def lum(gx: Int, gy: Int): Int = {
        val sx = gx * 32 / 9; val sy = gy * 24 / 7
        3 * Jpeg.blockLuma(sx / 8, sy / 8, seed)
      }
      var h = 0L
      for (y <- 0 until 7; x <- 0 until 8)
        if (lum(x + 1, y) > lum(x, y)) h |= 1L << (y * 8 + x)
      h
    }
    for (id <- 0L until 42L)
      assert(out(id)._1 == expected(id), s"id $id")
    // 42 ids over 7 seeds -> 6 per seed, all colliding
    assert(out.values.forall(_._2 == 6L))
  }

  test("jpeg: Adobe CMYK raster decodes to the same blockLuma pixels " +
      "as the 3-component raster (APP14 inverse transform)") {
    for (seed <- Seq(0, 41, 205)) {
      val cmyk = Jpeg.synthJpegRasterCmyk(32, 24, seed)
      val px = Multimodal.decodePixels(cmyk)
        .getOrElse(fail(s"seed $seed cmyk did not decode"))
      assert(px.width == 32 && px.height == 24 && px.channels == 3)
      val rgb = Multimodal.decodePixels(
        Jpeg.synthJpegRaster(32, 24, seed)).get
      assert(java.util.Arrays.equals(px.data, rgb.data),
        s"seed $seed: cmyk pixels != 3-comp raster pixels")
      assert(Multimodal.jpegVariant(cmyk) == "jpeg_cmyk")
    }
  }

  test("jpeg: YCCK (APP14 transform 2) with neutral chroma inverts " +
      "to the stored grey; no-APP14 4-comp uses plain ink values") {
    def flat(v: Int => Int): Int => (Int, Int) => Array[Int] =
      ci => (_, _) => { val b = new Array[Int](64); b(0) = v(ci) - 128; b }
    // YCCK: stored Y=200, Cb=Cr=128 (neutral -> inverted CMY all 200),
    // K=255 -> RGB = 200*255/255 = 200 exactly
    val ycck = Jpeg.encodeBaseline(16, 8, 4, 1, 1,
      Array.fill(64)(8), flat(ci => if (ci == 3) 255
        else if (ci == 0) 200 else 128), app14Transform = Some(2))
    val py = Multimodal.decodePixels(ycck).get
    assert(py.channels == 3 && py.data.forall(b => (b & 0xff) == 200))
    // no APP14: plain (non-inverted) ink, C=M=Y=55, K=0 ->
    // RGB = (255-55)*(255-0)/255 = 200
    val plain = Jpeg.encodeBaseline(16, 8, 4, 1, 1,
      Array.fill(64)(8), flat(ci => if (ci == 3) 0 else 55))
    val pp = Multimodal.decodePixels(plain).get
    assert(pp.channels == 3 && pp.data.forall(b => (b & 0xff) == 200))
  }
}
