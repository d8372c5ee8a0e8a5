package graft.report

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

/** Pure-JVM PNG chart rendering for the report layer — the parity
  * path with the reference's matplotlib histograms, which arrive in
  * the HTML as base64 PNG data-URIs
  * (spark_df_profiling/base.py::histogram/mini_histogram ≈L340–395:
  * `plt.savefig(imgdata)` → `b64encode` → `data:image/png;base64,…`).
  * The default report keeps inline SVG (crisper, themeable via CSS);
  * [[ReportTemplates.pngHistograms]] swaps this renderer in for
  * byte-for-byte-reference-shaped output.
  *
  * The encoder emits minimal standard PNG: 8-bit truecolour (colour
  * type 2), filter 0 on every scanline, one zlib IDAT — exactly the
  * subset [[graft.ops.Multimodal.decodePixels]] reads back, so the
  * round-trip (encode → the engine's own decoder → pixels) is
  * unit-testable without any image library.
  */
object ChartPng {

  /** Tiny top-left-origin RGB raster; pixels as 0xRRGGBB. */
  final class Raster(val w: Int, val h: Int, background: Int = 0xffffff) {
    val px: Array[Int] = Array.fill(w * h)(background)
    def fillRect(x0: Int, y0: Int, rw: Int, rh: Int, rgb: Int): Unit = {
      var y = math.max(0, y0)
      val y1 = math.min(h, y0 + rh)
      val xa = math.max(0, x0)
      val xb = math.min(w, x0 + rw)
      while (y < y1) {
        var x = xa
        while (x < xb) { px(y * w + x) = rgb; x += 1 }
        y += 1
      }
    }
  }

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def be32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    be32(data.length)
    val tb = typ.getBytes("US-ASCII")
    out.write(tb); out.write(data)
    val crc = new CRC32()
    crc.update(tb); crc.update(data)
    be32(crc.getValue.toInt)
    out.toByteArray
  }

  /** Standard PNG bytes for an RGB raster (colour type 2, bit depth
    * 8, filter 0, non-interlaced). */
  def encode(r: Raster): Array[Byte] = {
    val ihdr = new Array[Byte](13)
    def putBe32(off: Int, v: Int): Unit = {
      ihdr(off) = ((v >>> 24) & 0xff).toByte
      ihdr(off + 1) = ((v >>> 16) & 0xff).toByte
      ihdr(off + 2) = ((v >>> 8) & 0xff).toByte
      ihdr(off + 3) = (v & 0xff).toByte
    }
    putBe32(0, r.w); putBe32(4, r.h)
    ihdr(8) = 8; ihdr(9) = 2 // bit depth 8, truecolour
    // raw scanlines: filter byte 0 + RGB triples
    val raw = new Array[Byte](r.h * (1 + r.w * 3))
    var y = 0
    while (y < r.h) {
      val base = y * (1 + r.w * 3)
      raw(base) = 0
      var x = 0
      while (x < r.w) {
        val p = r.px(y * r.w + x)
        raw(base + 1 + x * 3) = ((p >>> 16) & 0xff).toByte
        raw(base + 2 + x * 3) = ((p >>> 8) & 0xff).toByte
        raw(base + 3 + x * 3) = (p & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val defl = new Deflater()
    defl.setInput(raw); defl.finish()
    val zout = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) zout.write(buf, 0, defl.deflate(buf))
    defl.end()
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    out.write(chunk("IHDR", ihdr))
    out.write(chunk("IDAT", zout.toByteArray))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  def dataUri(png: Array[Byte]): String =
    "data:image/png;base64," +
      java.util.Base64.getEncoder.encodeToString(png)

  /** Bar colour matching the SVG renderer's `.hist .bar` fill. */
  val BarRgb = 0x337ab7

  /** Histogram bars as an `<img>` data-URI — same geometry as the
    * SVG renderer (16 px per bin, 14 px bars, 64 px tall, counts
    * scaled to 60 px with a 1 px floor) so the two renderers are
    * visually interchangeable. */
  def histogramImg(h: Seq[(Long, Long)]): String = {
    if (h.isEmpty) return ""
    val maxBin = h.map(_._1).max.toInt
    val r = new Raster(maxBin * 16 + 16, 64)
    val maxC = math.max(1L, h.map(_._2).max)
    h.foreach { case (bin, cnt) =>
      val hgt = math.max(1L, (cnt * 60) / maxC).toInt
      r.fillRect(bin.toInt * 16, 62 - hgt, 14, hgt, BarRgb)
    }
    s"""<img class="hist" src="${dataUri(encode(r))}" alt="histogram"/>"""
  }
}
