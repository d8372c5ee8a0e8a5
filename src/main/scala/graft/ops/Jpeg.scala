package graft.ops

import java.io.ByteArrayOutputStream

/** Baseline-sequential JPEG (ITU-T T.81 / JFIF) pixel codec — pure
  * public-format byte arithmetic, no codec libraries, closing the one
  * loudly-accounted hole in the multimodal chain (real crawls are
  * majority-JPEG; the header-only parse lived in
  * [[Multimodal.decode]]).
  *
  * Decoder scope (everything else degrades to None, never throws —
  * one corrupt blob cannot kill a 100 TB scan):
  *   - baseline DCT (SOF0), 8-bit precision, 1 (grey), 3 (YCbCr) or
  *     4 (Adobe CMYK/YCCK via the APP14 transform flag — r16)
  *     components, sampling factors 1..4, 8-bit DQT tables, DRI/RSTn
  *     restart intervals, 0xFF00 byte stuffing.
  *   - progressive (SOF2, T.81 §G.2): full multi-scan assembly —
  *     spectral selection, successive approximation (first + refine
  *     passes), EOBn run lengths — then the same dequant/IDCT tail
  *     as baseline (pinned pixel-equal to baseline on random
  *     coefficients by the unit suite).
  *   - the remaining SOF variants (arithmetic-coded SOF9+, 12-bit,
  *     lossless/hierarchical) are REJECTED and show up as skips in
  *     [[Multimodal.decodeAudit]] — accounted, not silent.
  *
  * Exactness contract the fixture arm builds on: a block whose only
  * nonzero coefficient is the DC term IDCTs to the flat value
  * dequant/8 in closed form (s(x,y) = F(0,0)/8 — every cosine at
  * u=v=0 is 1 and C(0)² /4 folds to 1/8), so with quantizer 8 the
  * roundtrip value→coefficient→value is EXACT despite JPEG being
  * lossy in general. [[synthJpegRaster]] exploits this: per-8×8-block
  * flat luma from a pure (bx, by, seed) formula, neutral chroma —
  * the DuckDB oracle recomputes the perceptual hash from the formula
  * alone while Spark decodes real entropy-coded bytes (Huffman,
  * dequant, dezigzag, IDCT, level shift, colour convert), the same
  * synthesis-inverts-decode pattern as the PNG raster fixture.
  *
  * Reference scope: upstream spark-df-profiling has no multimodal
  * support; this extends the training-data-pipeline surface
  * (SURVEY.md §2.2).
  */
object Jpeg {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 8) | u8(b, i + 1)

  /** Zig-zag order: ZigZag(k) = natural (row-major) index of the k-th
    * coefficient in transmission order (T.81 figure A.6). */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Separable 1-D IDCT basis with the normalization folded in:
    * T(u)(x) = C(u)/2 · cos((2x+1)uπ/16). Row pass then column pass
    * over this table is the 2-D IDCT; for a DC-only block the two
    * passes multiply to exactly 1/8 (see object Scaladoc). */
  private val IdctT: Array[Array[Double]] = Array.tabulate(8, 8) {
    (u, x) =>
      val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      c / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  private final class CorruptStream extends RuntimeException

  /** MSB-first entropy-stream bit reader with T.81 §F.1.2.3 byte
    * stuffing (0xFF 0x00 → literal 0xFF data byte). Running into a
    * real marker mid-coefficient means a truncated/corrupt scan. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    def readBit(): Int = {
      if (n == 0) {
        if (pos >= b.length) throw new CorruptStream
        var v = u8(b, pos); pos += 1
        if (v == 0xff) {
          if (pos >= b.length) throw new CorruptStream
          val m = u8(b, pos)
          if (m == 0x00) pos += 1 // stuffed data byte
          else throw new CorruptStream // marker inside a coefficient
        }
        acc = v; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def receive(len: Int): Int = {
      var v = 0; var i = 0
      while (i < len) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Restart boundary: discard the partial byte, consume the RSTm
      * marker (cycling m), leave the reader on the next entropy byte. */
    def restart(expect: Int): Unit = {
      n = 0
      if (pos + 1 >= b.length) throw new CorruptStream
      if (u8(b, pos) != 0xff || u8(b, pos + 1) != 0xd0 + expect)
        throw new CorruptStream
      pos += 2
    }
  }

  /** Canonical Huffman table per T.81 §C: `bits(l)` codes of length
    * l+1, values in `vals` in canonical order. Decode walks lengths
    * with the standard mincode/maxcode/valptr arrays (§F.2.2.3). */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    private val maxcode = Array.fill(17)(-1)
    private val mincode = new Array[Int](17)
    private val valptr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valptr(l) = k
          mincode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxcode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(r: BitReader): Int = {
      var l = 1
      var code = r.readBit()
      while (l < 16 && (maxcode(l) < 0 || code > maxcode(l))) {
        code = (code << 1) | r.readBit(); l += 1
      }
      if (maxcode(l) < 0 || code > maxcode(l)) throw new CorruptStream
      vals(valptr(l) + code - mincode(l))
    }
  }

  /** T.81 §F.2.2.1 EXTEND: map `v` (a `size`-bit magnitude field) to
    * the signed coefficient value. */
  private def extend(v: Int, size: Int): Int =
    if (size == 0) 0
    else if (v < (1 << (size - 1))) v - (1 << size) + 1
    else v

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var td: Int = 0 // DC huffman table (from SOS)
    var ta: Int = 0 // AC huffman table (from SOS)
  }

  /** Decode a baseline JPEG to interleaved pixels (grey → 1 channel,
    * YCbCr → RGB 3 channels). None for anything outside the supported
    * envelope or any corrupt/truncated stream. Dimension product is
    * capped so a hostile header cannot allocate unbounded memory on
    * an executor. */
  def decodePixels(p: Array[Byte], maxPixels: Long = 1L << 26)
      : Option[Multimodal.Pixels] =
    try decodeImpl(p, maxPixels)
    catch {
      case _: CorruptStream | _: ArrayIndexOutOfBoundsException |
          _: NegativeArraySizeException => None
    }

  private def decodeImpl(p: Array[Byte], maxPixels: Long)
      : Option[Multimodal.Pixels] = {
    if (p == null || p.length < 4) return None
    if (u8(p, 0) != 0xff || u8(p, 1) != 0xd8) return None // SOI
    val quant = new Array[Array[Int]](4) // zigzag order, as transmitted
    val huffDc = new Array[Huff](4)
    val huffAc = new Array[Huff](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var dri = 0
    var pos = 2
    var scanStart = -1
    // APP14 "Adobe" transform flag (None = no Adobe marker): 0 =
    // component values stored directly (4 comps ⇒ Adobe-INVERTED
    // CMYK), 2 = YCCK (YCbCr-transformed inverted CMY + K).
    var adobeTransform: Option[Int] = None
    while (scanStart < 0) {
      if (pos + 1 >= p.length) return None
      if (u8(p, pos) != 0xff) return None
      val m = u8(p, pos + 1)
      if (m == 0xff) { pos += 1 } // fill byte
      else if (m == 0xd9) return None // EOI before SOS
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) pos += 2
      else {
        if (pos + 3 >= p.length) return None
        val len = be16(p, pos + 2)
        if (len < 2 || pos + 2 + len > p.length) return None
        val seg = pos + 4 // first payload byte
        m match {
          case 0xdb => // DQT — possibly several tables per segment
            var q = seg
            while (q < pos + 2 + len) {
              val pq = u8(p, q) >> 4; val tq = u8(p, q) & 15
              if (pq != 0 || tq > 3) return None // 16-bit tables: out
              if (q + 65 > pos + 2 + len) return None
              quant(tq) = Array.tabulate(64)(i => u8(p, q + 1 + i))
              q += 65
            }
          case 0xc4 => // DHT — possibly several tables per segment
            var q = seg
            while (q < pos + 2 + len) {
              val tc = u8(p, q) >> 4; val th = u8(p, q) & 15
              if (tc > 1 || th > 3) return None
              val bits = Array.tabulate(16)(i => u8(p, q + 1 + i))
              val n = bits.sum
              if (q + 17 + n > pos + 2 + len) return None
              val vals = Array.tabulate(n)(i => u8(p, q + 17 + i))
              val t = new Huff(bits, vals)
              if (tc == 0) huffDc(th) = t else huffAc(th) = t
              q += 17 + n
            }
          case 0xc0 => // SOF0 baseline
            if (u8(p, seg) != 8) return None // precision
            h = be16(p, seg + 1); w = be16(p, seg + 3)
            val nc = u8(p, seg + 5)
            if (nc != 1 && nc != 3 && nc != 4) return None
            if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) return None
            comps = Array.tabulate(nc) { i =>
              val o = seg + 6 + 3 * i
              val c = Component(u8(p, o), u8(p, o + 1) >> 4,
                u8(p, o + 1) & 15, u8(p, o + 2))
              if (c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3)
                return None
              c
            }
            // a single-component scan is non-interleaved (T.81
            // §A.2.2): the MCU is ONE data unit and the declared
            // sampling factors do not replicate blocks
            if (nc == 1) comps(0) = comps(0).copy(h = 1, v = 1)
          case 0xc2 => // progressive DCT: the multi-scan path
            return decodeProgressive(p, maxPixels)
          case sof if sof >= 0xc1 && sof <= 0xcf && sof != 0xc4 &&
              sof != 0xc8 && sof != 0xcc =>
            return None // extended/lossless/arithmetic: skip
          case 0xdd => // DRI
            dri = be16(p, seg)
          case 0xee => // APP14 — Adobe colour-transform flag
            if (len >= 14 &&
                new String(p, seg, 5, "US-ASCII") == "Adobe")
              adobeTransform = Some(u8(p, seg + 11))
          case 0xda => // SOS
            if (comps == null) return None
            val ns = u8(p, seg)
            if (ns != comps.length) return None // single full scan only
            var i = 0
            while (i < ns) {
              val cid = u8(p, seg + 1 + 2 * i)
              val tt = u8(p, seg + 2 + 2 * i)
              val c = comps.find(_.id == cid).getOrElse(return None)
              c.td = tt >> 4; c.ta = tt & 15
              i += 1
            }
            scanStart = pos + 2 + len
          case _ => () // APPn / COM / others: skip
        }
        pos += 2 + len
      }
    }

    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // per-component plane, padded to whole MCUs
    val planeW = comps.map(c => mcusX * 8 * c.h)
    val planeH = comps.map(c => mcusY * 8 * c.v)
    val planes = Array.tabulate(comps.length)(i =>
      new Array[Byte](planeW(i) * planeH(i)))
    for (c <- comps) {
      if (quant(c.tq) == null) return None
      if (huffDc(c.td) == null || huffAc(c.ta) == null) return None
    }

    val r = new BitReader(p, scanStart)
    val dcPred = new Array[Int](comps.length)
    val coef = new Array[Double](64)
    val tmp = new Array[Double](64)
    var mcu = 0
    var rstCount = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (dri > 0 && mcu > 0 && mcu % dri == 0) {
          r.restart(rstCount % 8)
          rstCount += 1
          java.util.Arrays.fill(dcPred, 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val q = quant(c.tq)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              // ---- entropy-decode one block (natural order, dequantized)
              java.util.Arrays.fill(coef, 0.0)
              val t = huffDc(c.td).decode(r)
              if (t > 15) throw new CorruptStream
              dcPred(ci) += extend(r.receive(t), t)
              coef(0) = dcPred(ci).toDouble * q(0)
              var k = 1
              var eob = false
              while (!eob && k < 64) {
                val rs = huffAc(c.ta).decode(r)
                val run = rs >> 4; val size = rs & 15
                if (size == 0) {
                  if (run == 15) k += 16 else eob = true // ZRL / EOB
                } else {
                  k += run
                  if (k > 63) throw new CorruptStream
                  coef(ZigZag(k)) =
                    extend(r.receive(size), size).toDouble * q(k)
                  k += 1
                }
              }
              idctToPlane(coef, tmp, planes(ci), planeW(ci),
                (mx * c.h + bx) * 8, (my * c.v + by) * 8)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }

    assemblePixels(comps, planes, planeW, w, h, hmax, vmax,
      adobeTransform)
  }

  /** Separable 2-D IDCT of one dequantized block (natural order) into
    * a component plane at (px0, py0), with the +128 level shift and
    * [0, 255] clamp. `tmp` is the caller's scratch buffer, reused
    * across blocks. Shared by the baseline and progressive paths. */
  private def idctToPlane(coef: Array[Double], tmp: Array[Double],
      plane: Array[Byte], planeWidth: Int, px0: Int, py0: Int): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0; var u = 0
        while (u < 8) { s += coef(y * 8 + u) * IdctT(u)(x); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0; var v = 0
        while (v < 8) { s += tmp(v * 8 + x) * IdctT(v)(yy); v += 1 }
        val pix = math.round(s).toInt + 128
        val clamped = if (pix < 0) 0 else if (pix > 255) 255 else pix
        plane((py0 + yy) * planeWidth + px0 + x) = clamped.toByte
        yy += 1
      }
      x += 1
    }
  }

  /** Upsample (sample replication) + colour convert the decoded
    * component planes to interleaved output pixels. Shared by the
    * baseline and progressive paths.
    *
    * 4-component frames are print-pipeline CMYK (T.81 says nothing
    * about colour; the de-facto conventions are Adobe's): with an
    * APP14 Adobe marker the stored samples are INVERTED ink values
    * (Photoshop convention — 255 = no ink), so RGB = stored·K/255;
    * transform 2 (YCCK) first runs the YCbCr→RGB rotation over the
    * first three components, which lands on the same inverted CMY.
    * Without APP14 the samples are plain ink coverage:
    * RGB = (255−ink)(255−K)/255. Output is always 3-channel RGB so
    * downstream (dHash, resize) is colour-space-agnostic. */
  private def assemblePixels(comps: Array[Component],
      planes: Array[Array[Byte]], planeW: Array[Int], w: Int, h: Int,
      hmax: Int, vmax: Int, adobeTransform: Option[Int] = None)
      : Option[Multimodal.Pixels] = {
    if (comps.length == 1) {
      val out = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        System.arraycopy(planes(0), y * planeW(0), out, y * w, w)
        y += 1
      }
      Some(Multimodal.Pixels(w, h, 1, out))
    } else if (comps.length == 4) {
      val out = new Array[Byte](w * h * 3)
      val inverted = adobeTransform.isDefined
      val ycck = adobeTransform.contains(2)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          def s(i: Int): Int = planes(i)(
            (y * comps(i).v / vmax) * planeW(i) +
              x * comps(i).h / hmax) & 0xff
          def clampI(d: Double): Int = {
            val v = math.round(d).toInt
            if (v < 0) 0 else if (v > 255) 255 else v
          }
          val k = s(3)
          // channel values BEFORE the ink/K combination: for YCCK the
          // stored Y/Cb/Cr encode the (inverted) CMY through the same
          // YCbCr rotation as photographic JPEG
          val (c0, c1, c2) =
            if (ycck) {
              val yv = s(0).toDouble
              val cb = s(1) - 128; val cr = s(2) - 128
              (clampI(yv + 1.402 * cr),
                clampI(yv - 0.344136 * cb - 0.714136 * cr),
                clampI(yv + 1.772 * cb))
            } else (s(0), s(1), s(2))
          val o = (y * w + x) * 3
          if (inverted) {
            // Adobe-inverted: stored = 255 − ink, so
            // RGB = stored_channel · stored_K / 255 (round-half-up)
            out(o) = ((c0 * k + 127) / 255).toByte
            out(o + 1) = ((c1 * k + 127) / 255).toByte
            out(o + 2) = ((c2 * k + 127) / 255).toByte
          } else {
            out(o) = (((255 - c0) * (255 - k) + 127) / 255).toByte
            out(o + 1) = (((255 - c1) * (255 - k) + 127) / 255).toByte
            out(o + 2) = (((255 - c2) * (255 - k) + 127) / 255).toByte
          }
          x += 1
        }
        y += 1
      }
      Some(Multimodal.Pixels(w, h, 3, out))
    } else {
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yv = (planes(0)(
            (y * comps(0).v / vmax) * planeW(0) +
              x * comps(0).h / hmax) & 0xff).toDouble
          val cb = (planes(1)(
            (y * comps(1).v / vmax) * planeW(1) +
              x * comps(1).h / hmax) & 0xff) - 128
          val cr = (planes(2)(
            (y * comps(2).v / vmax) * planeW(2) +
              x * comps(2).h / hmax) & 0xff) - 128
          def clamp(d: Double): Byte = {
            val v = math.round(d).toInt
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          }
          val o = (y * w + x) * 3
          out(o) = clamp(yv + 1.402 * cr)
          out(o + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr)
          out(o + 2) = clamp(yv + 1.772 * cb)
          x += 1
        }
        y += 1
      }
      Some(Multimodal.Pixels(w, h, 3, out))
    }
  }

  // ------------------------------------------------------------------
  // Progressive (SOF2) decode — T.81 §G.2: every scan refines a
  // per-block coefficient store (spectral selection picks the zigzag
  // band, successive approximation the bit plane); dequant + IDCT run
  // once at the end over the assembled coefficients.
  // ------------------------------------------------------------------

  /** One block's AC band in a FIRST approximation scan (Ah = 0):
    * (run, size) symbols at bit position Al, with EOBn run-length
    * coding across blocks. Returns the updated EOB run. */
  private def acFirstBlock(r: BitReader, huff: Huff, blk: Array[Int],
      base: Int, ss: Int, se: Int, al: Int, eobrun0: Int): Int = {
    var eobrun = eobrun0
    if (eobrun > 0) return eobrun - 1
    var k = ss
    while (k <= se) {
      val rs = huff.decode(r)
      val run = rs >> 4; val size = rs & 15
      if (size == 0) {
        if (run == 15) k += 16 // ZRL
        else {
          eobrun = (1 << run) - 1 // EOBn: this block consumes one
          if (run > 0) eobrun += r.receive(run)
          return eobrun
        }
      } else {
        k += run
        if (k > se) throw new CorruptStream
        blk(base + ZigZag(k)) = extend(r.receive(size), size) << al
        k += 1
      }
    }
    eobrun
  }

  /** One block's AC band in a REFINEMENT scan (Ah = Al + 1): newly
    * nonzero coefficients arrive as ±1 at bit Al, and every
    * already-nonzero coefficient passed over contributes one
    * correction bit (§G.2.3). Returns the updated EOB run. */
  private def acRefineBlock(r: BitReader, huff: Huff, blk: Array[Int],
      base: Int, ss: Int, se: Int, al: Int, eobrun0: Int): Int = {
    val p1 = 1 << al
    val m1 = -1 << al
    var eobrun = eobrun0
    var k = ss
    if (eobrun == 0) {
      var atEob = false
      while (!atEob && k <= se) {
        val rs = huff.decode(r)
        var run = rs >> 4
        val size = rs & 15
        var sval = 0
        if (size != 0) {
          if (size != 1) throw new CorruptStream
          sval = if (r.readBit() == 1) p1 else m1
        } else if (run != 15) {
          eobrun = 1 << run
          if (run > 0) eobrun += r.receive(run)
          atEob = true // remaining coefficients handled below
        }
        // run==15 with size==0 is ZRL: skip 16 zero-history slots
        if (!atEob) {
          var placed = false
          while (!placed && k <= se) {
            val z = base + ZigZag(k)
            if (blk(z) != 0) {
              if (r.readBit() == 1 && (blk(z) & p1) == 0)
                blk(z) += (if (blk(z) >= 0) p1 else m1)
            } else if (run == 0) {
              if (sval != 0) blk(z) = sval
              placed = true
            } else run -= 1
            k += 1
          }
          if (!placed && sval != 0) throw new CorruptStream
        }
      }
    }
    if (eobrun > 0) {
      while (k <= se) { // correction bits under an EOB run
        val z = base + ZigZag(k)
        if (blk(z) != 0) {
          if (r.readBit() == 1 && (blk(z) & p1) == 0)
            blk(z) += (if (blk(z) >= 0) p1 else m1)
        }
        k += 1
      }
      eobrun -= 1
    }
    eobrun
  }

  private def decodeProgressive(p: Array[Byte], maxPixels: Long)
      : Option[Multimodal.Pixels] = {
    val quant = new Array[Array[Int]](4)
    val huffDc = new Array[Huff](4)
    val huffAc = new Array[Huff](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var dri = 0
    var hmax = 0; var vmax = 0; var mcusX = 0; var mcusY = 0
    // per-component coefficient store over the PADDED MCU block grid
    // (interleaved scans write dummy blocks; non-interleaved scans a
    // sub-grid), natural order within each 64-int block
    var store: Array[Array[Int]] = null
    var gridW: Array[Int] = null // padded grid width in blocks
    var compBw: Array[Int] = null // non-interleaved block cols (§A.2.2)
    var compBh: Array[Int] = null
    var sawScan = false
    var pos = 2
    var eoi = false
    while (!eoi) {
      if (pos + 1 >= p.length) return None
      if (u8(p, pos) != 0xff) return None
      val m = u8(p, pos + 1)
      if (m == 0xff) { pos += 1 } // fill byte
      else if (m == 0xd9) eoi = true
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) pos += 2
      else {
        if (pos + 3 >= p.length) return None
        val len = be16(p, pos + 2)
        if (len < 2 || pos + 2 + len > p.length) return None
        val seg = pos + 4
        m match {
          case 0xdb =>
            var q = seg
            while (q < pos + 2 + len) {
              val pq = u8(p, q) >> 4; val tq = u8(p, q) & 15
              if (pq != 0 || tq > 3) return None
              if (q + 65 > pos + 2 + len) return None
              quant(tq) = Array.tabulate(64)(i => u8(p, q + 1 + i))
              q += 65
            }
          case 0xc4 =>
            var q = seg
            while (q < pos + 2 + len) {
              val tc = u8(p, q) >> 4; val th = u8(p, q) & 15
              if (tc > 1 || th > 3) return None
              val bits = Array.tabulate(16)(i => u8(p, q + 1 + i))
              val n = bits.sum
              if (q + 17 + n > pos + 2 + len) return None
              val vals = Array.tabulate(n)(i => u8(p, q + 17 + i))
              val t = new Huff(bits, vals)
              if (tc == 0) huffDc(th) = t else huffAc(th) = t
              q += 17 + n
            }
          case 0xc2 =>
            if (comps != null) return None // one frame only
            if (u8(p, seg) != 8) return None
            h = be16(p, seg + 1); w = be16(p, seg + 3)
            val nc = u8(p, seg + 5)
            if (nc != 1 && nc != 3) return None
            if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) return None
            comps = Array.tabulate(nc) { i =>
              val o = seg + 6 + 3 * i
              val c = Component(u8(p, o), u8(p, o + 1) >> 4,
                u8(p, o + 1) & 15, u8(p, o + 2))
              if (c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 || c.tq > 3)
                return None
              c
            }
            hmax = comps.map(_.h).max
            vmax = comps.map(_.v).max
            mcusX = (w + 8 * hmax - 1) / (8 * hmax)
            mcusY = (h + 8 * vmax - 1) / (8 * vmax)
            gridW = comps.map(c => mcusX * c.h)
            compBw = comps.map(c =>
              ((w * c.h + hmax - 1) / hmax + 7) / 8)
            compBh = comps.map(c =>
              ((h * c.v + vmax - 1) / vmax + 7) / 8)
            val totalInts = comps.indices.map(i =>
              gridW(i).toLong * (mcusY * comps(i).v) * 64L).sum
            if (totalInts > (1L << 26)) return None // coef-store cap
            // store itself is allocated lazily at the first SOS —
            // header-only stubs (SOF2 + EOI, the audit's loud-skip
            // arm) must stay allocation-free
          case sof if sof >= 0xc0 && sof <= 0xcf && sof != 0xc4 &&
              sof != 0xc8 && sof != 0xcc =>
            return None // a second frame type inside the SOF2 path
          case 0xdd =>
            dri = be16(p, seg)
          case 0xda =>
            if (comps == null) return None
            if (store == null)
              store = Array.tabulate(comps.length)(i =>
                new Array[Int](totalIntsOf(gridW(i), mcusY * comps(i).v)))
            val ns = u8(p, seg)
            if (ns < 1 || ns > comps.length) return None
            val scomps = new Array[Int](ns) // component indices
            var i = 0
            while (i < ns) {
              val cid = u8(p, seg + 1 + 2 * i)
              val tt = u8(p, seg + 2 + 2 * i)
              val ci = comps.indexWhere(_.id == cid)
              if (ci < 0) return None
              comps(ci).td = tt >> 4
              comps(ci).ta = tt & 15
              scomps(i) = ci
              i += 1
            }
            val ss = u8(p, seg + 1 + 2 * ns)
            val se = u8(p, seg + 2 + 2 * ns)
            val aa = u8(p, seg + 3 + 2 * ns)
            val ah = aa >> 4; val al = aa & 15
            if (ss > 63 || se > 63 || se < ss) return None
            if (ss == 0 && se != 0) return None // DC scan is DC-only
            if (ss > 0 && ns != 1) return None // AC scans: one comp
            val r = new BitReader(p, pos + 2 + len)
            progressiveScan(r, comps, scomps, store, gridW, compBw,
              compBh, mcusX, mcusY, huffDc, huffAc, ss, se, ah, al, dri)
            sawScan = true
            // resync: skip entropy bytes to the next true marker
            // (stuffed 0xFF00 and stray RSTn are scan content)
            var q = r.pos
            while (q + 1 < p.length && !(u8(p, q) == 0xff && {
              val n2 = u8(p, q + 1)
              n2 != 0x00 && n2 != 0xff && !(n2 >= 0xd0 && n2 <= 0xd7)
            })) q += 1
            pos = q // the marker loop continues from the found marker
          case _ => ()
        }
        if (m != 0xda) pos += 2 + len
      }
    }
    if (comps == null || store == null || !sawScan) return None
    for (c <- comps) if (quant(c.tq) == null) return None
    // dequant + IDCT every block of every component plane
    val planeW = comps.indices.map(i => gridW(i) * 8).toArray
    val planes = Array.tabulate(comps.length)(i =>
      new Array[Byte](planeW(i) * (mcusY * comps(i).v) * 8))
    val coef = new Array[Double](64)
    val tmp = new Array[Double](64)
    var ci = 0
    while (ci < comps.length) {
      val q = quant(comps(ci).tq)
      val bh = mcusY * comps(ci).v
      val bw = gridW(ci)
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          val base = (by * bw + bx) * 64
          var k = 0
          while (k < 64) {
            // store holds natural-order coefficients; quant is in
            // zigzag (transmission) order like the baseline path
            coef(ZigZag(k)) =
              store(ci)(base + ZigZag(k)).toDouble * q(k)
            k += 1
          }
          idctToPlane(coef, tmp, planes(ci), planeW(ci), bx * 8, by * 8)
          bx += 1
        }
        by += 1
      }
      ci += 1
    }
    assemblePixels(comps, planes, planeW, w, h, hmax, vmax)
  }

  private def totalIntsOf(bw: Int, bh: Int): Int = bw * bh * 64

  /** One progressive scan over the coefficient store: interleaved MCU
    * order when the scan holds >1 component (DC scans only, padded
    * grid incl. dummy blocks), the component's own §A.2.2 block grid
    * when ns = 1. Restart markers reset DC predictors and the EOB
    * run. */
  private def progressiveScan(r: BitReader, comps: Array[Component],
      scomps: Array[Int], store: Array[Array[Int]], gridW: Array[Int],
      compBw: Array[Int], compBh: Array[Int], mcusX: Int, mcusY: Int,
      huffDc: Array[Huff], huffAc: Array[Huff], ss: Int, se: Int,
      ah: Int, al: Int, dri: Int): Unit = {
    val dcPred = new Array[Int](comps.length)
    var eobrun = 0
    var rstCount = 0
    var unit = 0 // MCUs (interleaved) or blocks (single-component)

    def decodeBlock(ci: Int, bx: Int, by: Int): Unit = {
      val c = comps(ci)
      val blkBase = (by * gridW(ci) + bx) * 64
      val blk = store(ci)
      if (ss == 0) {
        if (ah == 0) { // DC first
          val huff = huffDc(c.td)
          if (huff == null) throw new CorruptStream
          val t = huff.decode(r)
          if (t > 15) throw new CorruptStream
          dcPred(ci) += extend(r.receive(t), t)
          blk(blkBase) = dcPred(ci) << al
        } else { // DC refinement: one bit
          if (r.readBit() == 1) blk(blkBase) |= (1 << al)
        }
      } else {
        val huff = huffAc(c.ta)
        if (huff == null) throw new CorruptStream
        // the AC helpers address the block in place at its store
        // offset — no per-block copy in the decoder's hottest loop
        eobrun =
          if (ah == 0)
            acFirstBlock(r, huff, blk, blkBase, ss, se, al, eobrun)
          else acRefineBlock(r, huff, blk, blkBase, ss, se, al, eobrun)
      }
    }

    def maybeRestart(): Unit =
      if (dri > 0 && unit > 0 && unit % dri == 0) {
        r.restart(rstCount % 8)
        rstCount += 1
        java.util.Arrays.fill(dcPred, 0)
        eobrun = 0
      }

    if (scomps.length > 1) { // interleaved (DC) scan over MCUs
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          maybeRestart()
          var si = 0
          while (si < scomps.length) {
            val ci = scomps(si)
            val c = comps(ci)
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                decodeBlock(ci, mx * c.h + bx, my * c.v + by)
                bx += 1
              }
              by += 1
            }
            si += 1
          }
          unit += 1
          mx += 1
        }
        my += 1
      }
    } else { // non-interleaved: the component's own block grid
      val ci = scomps(0)
      var by = 0
      while (by < compBh(ci)) {
        var bx = 0
        while (bx < compBw(ci)) {
          maybeRestart()
          decodeBlock(ci, bx, by)
          unit += 1
          bx += 1
        }
        by += 1
      }
    }
  }

  // ------------------------------------------------------------------
  // Encoder — fixture synthesis in coefficient space. Compact custom
  // canonical Huffman tables (every DC category at length 4, every
  // (run, size≤4) AC symbol plus EOB/ZRL at length 7 — Kraft-feasible,
  // all-ones codes unused per §C.2) keep the DHT segments small while
  // the DECODER stays fully general: it builds whatever tables the
  // stream declares.
  // ------------------------------------------------------------------

  private val DcBits: Array[Int] =
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals: Array[Int] = (0 to 11).toArray
  // EOBn symbols (n = 1..14, code (n<<4)|0) extend the table for the
  // progressive encoder's cross-block EOB runs (≤ 32767); 80 codes at
  // length 7 remain Kraft-feasible (80·2⁻⁷ < 1, all-ones unused)
  private val AcBits: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 80, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcVals: Array[Int] =
    Array(0x00, 0xf0) ++
      (for (run <- 0 to 15; size <- 1 to 4) yield (run << 4) | size) ++
      (1 to 14).map(_ << 4)

  /** Canonical (code, length) assignment for a (bits, vals) table —
    * the same §C.2 procedure the decoder's mincode/maxcode walk
    * inverts, so encoder and DHT stay consistent by construction. */
  private def canonicalCodes(bits: Array[Int], vals: Array[Int])
      : Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val m = Map.newBuilder[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        m += vals(k) -> ((code, l)); code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    m.result()
  }

  private val DcCodes = canonicalCodes(DcBits, DcVals)
  private val AcCodes = canonicalCodes(AcBits, AcVals)

  private final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (§F.1.2.3). */
    def flush(): Unit =
      if (n > 0) { put(0xff, 8 - n); () }
  }

  private def magnitude(v: Int): Int = {
    var size = 0; var a = math.abs(v)
    while (a > 0) { size += 1; a >>= 1 }
    size
  }

  private def putCoef(bw: BitWriter, codes: Map[Int, (Int, Int)],
      run: Int, v: Int): Unit = {
    val size = magnitude(v)
    val (code, len) = codes((run << 4) | size)
    bw.put(code, len)
    if (size > 0) {
      val bitsVal = if (v < 0) v + (1 << size) - 1 else v
      bw.put(bitsVal, size)
    }
  }

  private def seg(out: ByteArrayOutputStream, marker: Int,
      payload: Array[Int]): Unit = {
    out.write(0xff); out.write(marker)
    val len = payload.length + 2
    out.write(len >> 8); out.write(len & 0xff)
    payload.foreach(out.write)
  }

  /** Encode a baseline JPEG from QUANTIZED coefficient blocks.
    * `coefs(comp)(bx, by)` returns the 64 quantized coefficients of
    * that component-plane block in NATURAL (row-major) order; block
    * coordinates run over the padded MCU grid. Components: 1 (grey)
    * or 3 (luma h×v = `hY`×`vY`, chroma 1×1). One shared 8-bit quant
    * table `quant` (natural order), one DC + one AC Huffman table.
    * `dri` > 0 emits a DRI segment and RSTn markers every `dri`
    * MCUs — byte-level framing variety with identical pixels. */
  def encodeBaseline(w: Int, h: Int, nComp: Int, hY: Int, vY: Int,
      quant: Array[Int], coefs: Int => (Int, Int) => Array[Int],
      dri: Int = 0, app14Transform: Option[Int] = None): Array[Byte] = {
    require(nComp == 1 || nComp == 3 || nComp == 4)
    require(hY >= 1 && hY <= 4 && vY >= 1 && vY <= 4)
    // grey scans are non-interleaved: one block per MCU (§A.2.2);
    // the 4-comp (CMYK) encoder stays 4:4:4:4
    require(nComp == 3 || (hY == 1 && vY == 1))
    require(quant.length == 64)
    val out = new ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    seg(out, 0xe0, Array( // APP0 JFIF v1.1, no density/thumbnail
      'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // APP14 Adobe marker: version 100, flags 0, transform byte last —
    // the colour-transform convention real print-pipeline CMYK JPEGs
    // carry (and [[decodePixels]] keys the inverse transform on)
    app14Transform.foreach(t => seg(out, 0xee,
      Array[Int]('A', 'd', 'o', 'b', 'e', 0, 100, 0, 0, 0, 0, t)))
    seg(out, 0xdb, 0 +: ZigZag.map(quant)) // DQT id 0, zigzag order
    seg(out, 0xc4, (0x00 +: DcBits) ++ DcVals) // DHT DC id 0
    seg(out, 0xc4, (0x10 +: AcBits) ++ AcVals) // DHT AC id 0
    val compSpec =
      if (nComp == 1) Array(1, (hY << 4) | vY, 0)
      else (1 to nComp).flatMap(id => Array(
        id, if (id == 1) (hY << 4) | vY else 0x11, 0)).toArray
    seg(out, 0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, nComp)
      ++ compSpec)
    if (dri > 0) seg(out, 0xdd, Array(dri >> 8, dri & 0xff))
    seg(out, 0xda,
      Array(nComp) ++ (1 to nComp).flatMap(id => Array(id, 0x00)) ++
        Array(0, 63, 0))
    val hmax = if (nComp == 1) hY else math.max(hY, 1)
    val vmax = if (nComp == 1) vY else math.max(vY, 1)
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val sampling = Array.tabulate(nComp)(i =>
      if (i == 0) (hY, vY) else (1, 1))
    val bw = new BitWriter(out)
    val dcPred = new Array[Int](nComp)
    var mcu = 0
    var rstCount = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (dri > 0 && mcu > 0 && mcu % dri == 0) {
          bw.flush()
          out.write(0xff); out.write(0xd0 + rstCount % 8)
          rstCount += 1
          java.util.Arrays.fill(dcPred, 0)
        }
        var ci = 0
        while (ci < nComp) {
          val (ch, cv) = sampling(ci)
          var by = 0
          while (by < cv) {
            var bx = 0
            while (bx < ch) {
              val block = coefs(ci)(mx * ch + bx, my * cv + by)
              val diff = block(0) - dcPred(ci)
              dcPred(ci) = block(0)
              val dSize = magnitude(diff)
              val (dCode, dLen) = DcCodes(dSize)
              bw.put(dCode, dLen)
              if (dSize > 0) {
                val bitsVal =
                  if (diff < 0) diff + (1 << dSize) - 1 else diff
                bw.put(bitsVal, dSize)
              }
              // AC run-length: walk zigzag positions 1..63
              var run = 0
              var k = 1
              while (k < 64) {
                val v = block(ZigZag(k))
                if (v == 0) run += 1
                else {
                  while (run > 15) { putCoef(bw, AcCodes, 15, 0); run -= 16 }
                  putCoef(bw, AcCodes, run, v)
                  run = 0
                }
                k += 1
              }
              if (run > 0) { // EOB
                val (eCode, eLen) = AcCodes(0x00)
                bw.put(eCode, eLen)
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** The luma formula the raster fixture embeds, per 8×8 block —
    * exposed so oracles and tests recompute pixels independently of
    * the codec (37/71 strides keep neighbouring blocks' brightness
    * order varied across the seven fixture seeds). */
  def blockLuma(bx: Int, by: Int, seed: Int): Int =
    ((bx * 37 + by * 71 + seed) % 256 + 256) % 256

  /** All-8 quantizer: the DC dequant 8·s/8 = s makes flat blocks
    * roundtrip exactly (object Scaladoc). */
  private val FlatQuant: Array[Int] = Array.fill(64)(8)

  /** A REAL baseline JPEG whose decoded pixels are the pure
    * [[blockLuma]] formula: 4:4:4 YCbCr, every 8×8 block flat
    * (DC-only) with Y = blockLuma(bx, by, seed) and neutral chroma
    * (Cb = Cr = 128 → R = G = B = Y exactly). `dri` varies the
    * restart framing — different BYTES, identical pixels, the
    * encoding-invariance axis of the perceptual-hash fixture. */
  def synthJpegRaster(w: Int, h: Int, seed: Int, dri: Int = 0)
      : Array[Byte] =
    encodeBaseline(w, h, nComp = 3, hY = 1, vY = 1, FlatQuant,
      coefs = ci => (bx, by) => {
        val b = new Array[Int](64)
        b(0) = if (ci == 0) blockLuma(bx, by, seed) - 128 else 0
        b
      }, dri = dri)

  /** A REAL 4-component Adobe CMYK baseline JPEG (APP14 transform 0)
    * whose decoded pixels are the SAME [[blockLuma]] formula as
    * [[synthJpegRaster]]: stored (Adobe-inverted) C = M = Y =
    * blockLuma and K = 255 (no black ink), so the inverse transform
    * stored·K/255 lands on R = G = B = blockLuma exactly — all
    * integer, every block DC-only. The print-pipeline arm of the
    * decode audit becomes decodable with the identical oracle. */
  def synthJpegRasterCmyk(w: Int, h: Int, seed: Int): Array[Byte] =
    encodeBaseline(w, h, nComp = 4, hY = 1, vY = 1, FlatQuant,
      coefs = ci => (bx, by) => {
        val b = new Array[Int](64)
        b(0) = (if (ci == 3) 255 else blockLuma(bx, by, seed)) - 128
        b
      }, app14Transform = Some(0))

  /** Encode a PROGRESSIVE (SOF2) JPEG from the same quantized
    * coefficient blocks as [[encodeBaseline]] — identical pixels,
    * multi-scan framing: DC first at Al=1 (interleaved) → per-
    * component AC first scans at Al=`acAl` with cross-block EOBn
    * run-length coding → DC refinement (the Al=1→0 bit) → with
    * `acAl` = 1, per-component AC refinement scans (the §G.2.3
    * correction-bit pass, libjpeg's BR-buffer emission order).
    * AC magnitudes after the point transform must fit the size≤4
    * table, as in the baseline encoder. */
  def encodeProgressive(w: Int, h: Int, nComp: Int, hY: Int, vY: Int,
      quant: Array[Int], coefs: Int => (Int, Int) => Array[Int],
      acAl: Int = 0): Array[Byte] = {
    require(nComp == 1 || nComp == 3)
    require(hY >= 1 && hY <= 4 && vY >= 1 && vY <= 4)
    require(nComp == 3 || (hY == 1 && vY == 1))
    require(acAl == 0 || acAl == 1)
    require(quant.length == 64)
    val out = new ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    seg(out, 0xe0, Array(
      'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(out, 0xdb, 0 +: ZigZag.map(quant))
    seg(out, 0xc4, (0x00 +: DcBits) ++ DcVals)
    seg(out, 0xc4, (0x10 +: AcBits) ++ AcVals)
    val compSpec =
      if (nComp == 1) Array(1, (hY << 4) | vY, 0)
      else Array(1, (hY << 4) | vY, 0, 2, 0x11, 0, 3, 0x11, 0)
    seg(out, 0xc2, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, nComp)
      ++ compSpec)
    val hmax = hY; val vmax = vY // chroma is 1×1
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    val sampling = Array.tabulate(nComp)(i =>
      if (i == 0) (hY, vY) else (1, 1))
    val bwOf = Array.tabulate(nComp) { i =>
      ((w * sampling(i)._1 + hmax - 1) / hmax + 7) / 8 }
    val bhOf = Array.tabulate(nComp) { i =>
      ((h * sampling(i)._2 + vmax - 1) / vmax + 7) / 8 }

    def sos(ids: Seq[(Int, Int)], ss: Int, se: Int, ah: Int,
        al: Int): Unit =
      seg(out, 0xda, Array(ids.length) ++
        ids.flatMap { case (id, tt) => Array(id, tt) } ++
        Array(ss, se, (ah << 4) | al))

    /** Interleaved MCU walk over all components (DC scans). */
    def dcScan(f: (BitWriter, Int, Int, Int) => Unit): Unit = {
      val bw = new BitWriter(out)
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          var ci = 0
          while (ci < nComp) {
            val (ch, cv) = sampling(ci)
            var by = 0
            while (by < cv) {
              var bx = 0
              while (bx < ch) {
                f(bw, ci, mx * ch + bx, my * cv + by)
                bx += 1
              }
              by += 1
            }
            ci += 1
          }
          mx += 1
        }
        my += 1
      }
      bw.flush()
    }

    // ---- scan 1: DC first, interleaved, Al = 1 (diff-coded dc >> 1)
    sos((1 to nComp).map(id => (id, 0x00)), 0, 0, 0, 1)
    locally {
      val dcPred = new Array[Int](nComp)
      dcScan { (bw, ci, bx, by) =>
        val dc = coefs(ci)(bx, by)(0) >> 1
        val diff = dc - dcPred(ci); dcPred(ci) = dc
        val dSize = magnitude(diff)
        val (dCode, dLen) = DcCodes(dSize)
        bw.put(dCode, dLen)
        if (dSize > 0)
          bw.put(if (diff < 0) diff + (1 << dSize) - 1 else diff, dSize)
      }
    }

    // ---- per component: AC first scan at Al = acAl, EOBn batching
    for (ci <- 0 until nComp) {
      sos(Seq((ci + 1, 0x00)), 1, 63, 0, acAl)
      val bw = new BitWriter(out)
      var eobrun = 0
      def flushEob(): Unit = if (eobrun > 0) {
        var n = 0
        while ((2 << n) <= eobrun) n += 1 // eobrun ≤ 32767 → n ≤ 14
        val (c, l) = AcCodes(n << 4)
        bw.put(c, l)
        if (n > 0) bw.put(eobrun - (1 << n), n)
        eobrun = 0
      }
      var by = 0
      while (by < bhOf(ci)) {
        var bx = 0
        while (bx < bwOf(ci)) {
          val blk = coefs(ci)(bx, by)
          val v = new Array[Int](64)
          var last = 0
          var k = 1
          while (k < 64) {
            val t0 = blk(ZigZag(k))
            v(k) = if (t0 >= 0) t0 >> acAl else -((-t0) >> acAl)
            if (v(k) != 0) last = k
            k += 1
          }
          if (last == 0) {
            eobrun += 1
            if (eobrun == 32767) flushEob()
          } else {
            flushEob()
            var run = 0
            k = 1
            while (k <= last) {
              if (v(k) == 0) run += 1
              else {
                while (run > 15) {
                  val (zc, zl) = AcCodes(0xf0); bw.put(zc, zl)
                  run -= 16
                }
                val size = magnitude(v(k))
                val (c2, l2) = AcCodes((run << 4) | size)
                bw.put(c2, l2)
                bw.put(if (v(k) < 0) v(k) + (1 << size) - 1 else v(k),
                  size)
                run = 0
              }
              k += 1
            }
            if (last < 63) eobrun = 1 // trailing zeros fold into EOB
          }
          bx += 1
        }
        by += 1
      }
      flushEob()
      bw.flush()
    }

    // ---- DC refinement: Ah = 1, Al = 0, one raw bit per block
    sos((1 to nComp).map(id => (id, 0x00)), 0, 0, 1, 0)
    dcScan { (bw, ci, bx, by) =>
      bw.put(coefs(ci)(bx, by)(0) & 1, 1)
    }

    // ---- per component: AC refinement (only when acAl = 1)
    if (acAl == 1) for (ci <- 0 until nComp) {
      sos(Seq((ci + 1, 0x00)), 1, 63, 1, 0)
      val bw = new BitWriter(out)
      val br = scala.collection.mutable.ArrayBuffer.empty[Int]
      def flushBr(): Unit = { br.foreach(b => bw.put(b, 1)); br.clear() }
      var by = 0
      while (by < bhOf(ci)) {
        var bx = 0
        while (bx < bwOf(ci)) {
          val blk = coefs(ci)(bx, by)
          // |v| at Al=0; newly-nonzero ⇔ |v| == 1 under the Al=1→0 chain
          val a = Array.tabulate(64) { k =>
            val t = blk(ZigZag(k)); if (t >= 0) t else -t }
          var eobPos = 0
          var k = 1
          while (k < 64) { if (a(k) == 1) eobPos = k; k += 1 }
          var run = 0
          k = 1
          while (k < 64) {
            val t = a(k)
            if (t == 0) run += 1
            else {
              // libjpeg emission order: ZRLs fold into EOB past the
              // last new coefficient; BR flushes after every symbol
              while (run > 15 && k <= eobPos) {
                val (zc, zl) = AcCodes(0xf0); bw.put(zc, zl)
                run -= 16
                flushBr()
              }
              if (t > 1) br += (blk(ZigZag(k)) & 1) // correction bit
              else {
                val (c2, l2) = AcCodes((run << 4) | 1)
                bw.put(c2, l2)
                bw.put(if (blk(ZigZag(k)) < 0) 0 else 1, 1)
                flushBr()
                run = 0
              }
            }
            k += 1
          }
          if (run > 0 || br.nonEmpty) {
            val (ec, el) = AcCodes(0x00) // per-block EOB (run of 1)
            bw.put(ec, el)
            flushBr()
          }
          bx += 1
        }
        by += 1
      }
      bw.flush()
    }

    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** A REAL progressive JPEG whose decoded pixels are the pure
    * [[blockLuma]] formula — the SOF2 twin of [[synthJpegRaster]]:
    * same flat DC-only blocks and quantizer, delivered across DC
    * first/refine and EOB-run AC scans. Pixel-identical to the
    * baseline encoding of the same (w, h, seed). */
  def synthJpegRasterProgressive(w: Int, h: Int, seed: Int)
      : Array[Byte] =
    encodeProgressive(w, h, nComp = 3, hY = 1, vY = 1, FlatQuant,
      coefs = ci => (bx, by) => {
        val b = new Array[Int](64)
        b(0) = if (ci == 0) blockLuma(bx, by, seed) - 128 else 0
        b
      })
}
