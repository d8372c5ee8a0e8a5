package graft.ops

import java.io.ByteArrayOutputStream
import java.util.zip.CRC32

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column support: image/audio/video payloads ride as opaque
  * `binary` columns; typed metadata is extracted by a batched
  * per-partition decode stage that parses the real container headers.
  *
  * The decode is pure public-format byte arithmetic — no codec
  * libraries:
  *   - PNG: 8-byte signature + IHDR chunk (width/height as big-endian
  *     u32 at offsets 16/20, colour type at 25 → channel count), plus
  *     an `acTL` chunk scan for APNG frame counts. Layout per the W3C
  *     PNG spec / RFC 2083.
  *   - JPEG: marker-segment walk from SOI, skipping each segment by
  *     its big-endian length, until a start-of-frame marker
  *     (SOF0..SOF15 minus DHT/JPG/DAC) yields height/width (u16 at
  *     +5/+7) and component count (+9). Layout per ITU-T T.81 §B.
  *   - WAV: RIFF/WAVE chunk walk; `fmt ` yields channels (LE u16),
  *     sample rate (LE u32) and block align; `data` size / block
  *     align = audio frame count. Layout per the Microsoft RIFF spec.
  *
  * Everything around the parse — the binary column schema, the
  * Dataset[T] encoder boundary, the mapPartitions batch-shaped
  * execution (mirroring how an Arrow-batch decode runs per executor
  * core), and the downstream aggregability of the result — is the
  * same plumbing a full pixel/sample decoder would use: decode cost
  * scales per row, no shuffle, no driver involvement. Pixel/sample
  * decoding itself (not header metadata) would swap in at the same
  * boundary.
  *
  * Reference scope: upstream spark-df-profiling has no multimodal
  * support at all; this is part of the training-data-pipeline
  * extension surface (SURVEY.md §2.2).
  */
object Multimodal {

  /** Per-payload metadata. Image fields (`width`/`height`) and audio
    * fields (`sample_rate`) are null for the other modality;
    * `n_frames` is APNG/video frames for images (1 for stills) and
    * PCM frame count (samples per channel) for audio. */
  case class MediaMeta(doc_id: Long, format: String, n_bytes: Long,
      width: Option[Long], height: Option[Long], n_frames: Option[Long],
      sample_rate: Option[Long], channels: Option[Long])

  /** Decoder output before the id/byte-count wrapper is attached. */
  case class Decoded(format: String, width: Option[Long],
      height: Option[Long], nFrames: Option[Long],
      sampleRate: Option[Long], channels: Option[Long])

  private val Unknown = Decoded("unknown", None, None, None, None, None)

  // ---- unsigned byte readers (Array[Byte] is signed in JVM) ----
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Long =
    ((u8(b, i) << 8) | u8(b, i + 1)).toLong
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong
  private def le16(b: Array[Byte], i: Int): Long =
    ((u8(b, i + 1) << 8) | u8(b, i)).toLong
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i + 3).toLong << 24) | (u8(b, i + 2).toLong << 16) |
      (u8(b, i + 1).toLong << 8) | u8(b, i).toLong
  private def ascii(b: Array[Byte], i: Int, n: Int): String =
    new String(b, i, n, "US-ASCII")

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Parse the container header of a payload. Never throws: anything
    * unparseable degrades to format "unknown" / null fields, so one
    * corrupt blob can't kill a 100 TB scan. */
  def decode(p: Array[Byte]): Decoded =
    if (p == null) Unknown
    else if (p.length >= 33 && p.view.take(8).sameElements(PngSig) &&
      ascii(p, 12, 4) == "IHDR") decodePng(p)
    else if (p.length >= 4 && u8(p, 0) == 0xff && u8(p, 1) == 0xd8 &&
      u8(p, 2) == 0xff) decodeJpeg(p)
    else if (p.length >= 12 && ascii(p, 0, 4) == "RIFF" &&
      ascii(p, 8, 4) == "WAVE") decodeWav(p)
    else Unknown

  /** PNG: IHDR is mandated to be the first chunk, so width/height sit
    * at fixed offsets; the chunk walk afterwards only looks for acTL
    * (APNG animation control — frame count precedes the first IDAT). */
  private def decodePng(p: Array[Byte]): Decoded = {
    val w = be32(p, 16)
    val h = be32(p, 20)
    val channels = u8(p, 25) match { // colour type -> samples per pixel
      case 0 => 1L; case 2 => 3L; case 3 => 1L
      case 4 => 2L; case 6 => 4L; case _ => 0L
    }
    var frames = 1L
    var pos = 8
    var done = false
    while (!done && pos + 8 <= p.length) {
      val len = be32(p, pos)
      val typ = ascii(p, pos + 4, 4)
      if (typ == "acTL" && pos + 12 <= p.length) frames = be32(p, pos + 8)
      if (typ == "IEND" || len < 0 || len > Int.MaxValue - 12) done = true
      else pos += 12 + len.toInt // len + type + data + CRC
    }
    Decoded("png", Some(w), Some(h), Some(frames), None,
      if (channels == 0L) None else Some(channels))
  }

  /** JPEG start-of-frame markers: C0..CF minus C4 (DHT), C8 (JPG
    * extension), CC (DAC) — covers baseline, progressive, lossless,
    * arithmetic variants. */
  private def isSof(m: Int): Boolean =
    m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

  private def decodeJpeg(p: Array[Byte]): Decoded = {
    val none = Decoded("jpeg", None, None, None, None, None)
    var pos = 2
    while (pos + 1 < p.length) {
      if (u8(p, pos) != 0xff) return none // misaligned stream
      val m = u8(p, pos + 1)
      if (m == 0xff) pos += 1 // fill byte before a marker
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) pos += 2 // bare
      else if (m == 0xd9) return none // EOI before any SOF
      else if (pos + 3 >= p.length) return none
      else if (isSof(m)) {
        if (pos + 9 >= p.length) return none
        return Decoded("jpeg", Some(be16(p, pos + 7)),
          Some(be16(p, pos + 5)), Some(1L), None,
          Some(u8(p, pos + 9).toLong))
      } else pos += 2 + be16(p, pos + 2).toInt // length includes itself
    }
    none
  }

  /** Finer-grained JPEG taxonomy for the decode audit: the SOF
    * marker + frame-header fields name WHICH real-crawl variant a
    * payload is, so a skip is attributed ("jpeg_arith"), never
    * lumped into a bare "jpeg". Shares [[decodeJpeg]]'s marker walk;
    * anything without a parseable SOF is "jpeg_other"
    * (truncated/misaligned streams). Precedence: the entropy coder
    * (arithmetic, SOF9+ — unsupported regardless of anything else),
    * then sample precision (12-bit), then the 4-component
    * Adobe-CMYK/YCCK shape, then the frame type. */
  def jpegVariant(p: Array[Byte]): String = {
    var pos = 2
    while (pos + 1 < p.length) {
      if (u8(p, pos) != 0xff) return "jpeg_other"
      val m = u8(p, pos + 1)
      if (m == 0xff) pos += 1
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) pos += 2
      else if (m == 0xd9) return "jpeg_other"
      else if (pos + 3 >= p.length) return "jpeg_other"
      else if (isSof(m)) {
        if (pos + 9 >= p.length) return "jpeg_other"
        val precision = u8(p, pos + 4)
        val nComp = u8(p, pos + 9)
        return if (m >= 0xc9) "jpeg_arith"
        else if (precision != 8) "jpeg_12bit"
        else if (nComp == 4) "jpeg_cmyk"
        else m match {
          case 0xc0 => "jpeg_baseline"
          case 0xc1 => "jpeg_extseq"
          case 0xc2 => "jpeg_progressive"
          case _ => "jpeg_lossless"
        }
      } else pos += 2 + be16(p, pos + 2).toInt
    }
    "jpeg_other"
  }

  private def decodeWav(p: Array[Byte]): Decoded = {
    var channels, sampleRate, blockAlign = Option.empty[Long]
    var dataSize = Option.empty[Long]
    var pos = 12
    var done = false
    while (!done && pos + 8 <= p.length) {
      val id = ascii(p, pos, 4)
      val size = le32(p, pos + 4)
      if (id == "fmt " && pos + 24 <= p.length) {
        channels = Some(le16(p, pos + 10))
        sampleRate = Some(le32(p, pos + 12))
        blockAlign = Some(le16(p, pos + 20))
      } else if (id == "data") dataSize = Some(size)
      if (size < 0 || size > Int.MaxValue - 9) done = true
      else pos += 8 + size.toInt + (size.toInt & 1) // chunks pad to even
    }
    val frames = for { d <- dataSize; ba <- blockAlign if ba > 0 }
      yield d / ba
    Decoded("wav", None, None, frames, sampleRate, channels)
  }

  /** Batched metadata extraction over a binary column. `batchSize`
    * shapes the inner loop the way an Arrow-batch decoder would see
    * it (decode libraries amortize setup per batch, not per row). */
  def mediaMeta(df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 256): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    // rows with a null id/payload cannot be decoded — skip them (one
    // null row would otherwise poison the whole partition's batch)
    df.where(col(idCol).isNotNull && col(binCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch "decoder init" would live here
          batch.iterator.map { case (id, payload) =>
            val d = decode(payload)
            MediaMeta(id, d.format, payload.length.toLong, d.width,
              d.height, d.nFrames, d.sampleRate, d.channels)
          }
        }
      }
  }

  // ------------------------------------------------------------------
  // PNG pixel decode + resize — REAL raster processing with zero
  // external dependencies: zlib inflate via java.util.zip.Inflater
  // and the five PNG scanline filters per the W3C spec §9 (None/Sub/
  // Up/Average/Paeth). Supports 8-bit depth, colour types 0 (grey),
  // 2 (RGB), 4 (grey+alpha), 6 (RGBA), non-interlaced — the standard
  // shapes; anything else returns None rather than throwing.
  // ------------------------------------------------------------------

  /** Decoded raster: `data` holds rows top-to-bottom, `channels`
    * bytes per pixel. */
  case class Pixels(width: Int, height: Int, channels: Int,
      data: Array[Byte])

  def decodePixels(p: Array[Byte]): Option[Pixels] = {
    val d = decode(p)
    if (d.format == "jpeg") return Jpeg.decodePixels(p)
    if (d.format != "png") return None
    if (u8(p, 24) != 8) return None // bit depth
    if (u8(p, 26) != 0 || u8(p, 28) != 0) return None // compression/interlace
    val w = d.width.get.toInt
    val h = d.height.get.toInt
    val ch = d.channels.getOrElse(0L).toInt
    if (w <= 0 || h <= 0 || ch == 0) return None
    if (u8(p, 25) == 3) return None // palette needs PLTE handling
    // concatenate IDAT payloads
    val idat = new ByteArrayOutputStream()
    var pos = 8
    var done = false
    while (!done && pos + 8 <= p.length) {
      val len = be32(p, pos)
      val typ = ascii(p, pos + 4, 4)
      if (typ == "IDAT" && pos + 8 + len <= p.length)
        idat.write(p, pos + 8, len.toInt)
      if (typ == "IEND" || len < 0 || len > Int.MaxValue - 12) done = true
      else pos += 12 + len.toInt
    }
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val stride = w * ch
    val raw = new Array[Byte]((stride + 1) * h)
    try {
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      if (off < raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // unfilter scanlines (spec §9: recon from left/up/upper-left)
    val out = new Array[Byte](stride * h)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val pp = a + b - c
      val pa = math.abs(pp - a); val pb = math.abs(pp - b)
      val pc = math.abs(pp - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xff
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + x) & 0xff
        val left = if (x >= ch) out(rowOut + x - ch) & 0xff else 0
        val up = if (y > 0) out(rowOut - stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= ch) out(rowOut - stride + x - ch) & 0xff
                 else 0
        val recon = ft match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => cur + paeth(left, up, ul)
          case _ => return None
        }
        out(rowOut + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Some(Pixels(w, h, ch, out))
  }

  /** Nearest-neighbor resize — the real thing, over real decoded
    * pixels: output (x, y) samples source
    * (⌊x·W/outW⌋, ⌊y·H/outH⌋). */
  def resizeNearest(px: Pixels, outW: Int, outH: Int): Pixels = {
    require(outW > 0 && outH > 0)
    val out = new Array[Byte](outW * outH * px.channels)
    var y = 0
    while (y < outH) {
      val sy = (y.toLong * px.height / outH).toInt
      var x = 0
      while (x < outW) {
        val sx = (x.toLong * px.width / outW).toInt
        var c = 0
        while (c < px.channels) {
          out((y * outW + x) * px.channels + c) =
            px.data((sy * px.width + sx) * px.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Pixels(outW, outH, px.channels, out)
  }

  /** Distributed thumbnail/stat pass over a binary PNG column: decode
    * real pixels, resize to `thumbW`×`thumbH`, emit per-channel mean
    * pixel values of the thumbnail plus a content hash — the resize /
    * feature-extract stage of an image pipeline, same batched
    * mapPartitions shape as [[mediaMeta]]. Non-PNG / undecodable rows
    * are dropped (a corrupt blob cannot kill the scan). */
  case class ThumbStats(doc_id: Long, width: Long, height: Long,
      thumb_means: Array[Double], thumb_hash: Long)

  def thumbStats(df: DataFrame, idCol: String, binCol: String,
      thumbW: Int = 8, thumbH: Int = 8, batchSize: Int = 256)
      : Dataset[ThumbStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull && col(binCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, payload) =>
            decodePixels(payload).map { px =>
              val t = resizeNearest(px, thumbW, thumbH)
              val sums = new Array[Double](t.channels)
              var i = 0
              while (i < t.data.length) {
                sums(i % t.channels) += t.data(i) & 0xff
                i += 1
              }
              val nPix = (thumbW * thumbH).toDouble
              var hsh = 1125899906842597L // deterministic FNV-ish fold
              i = 0
              while (i < t.data.length) {
                hsh = hsh * 31 + (t.data(i) & 0xff)
                i += 1
              }
              ThumbStats(id, px.width.toLong, px.height.toLong,
                sums.map(_ / nPix), hsh)
            }
          }
        }
      }
  }

  /** Difference hash (dHash) over REAL decoded pixels: resize to a
    * (gw × gh) grid (nearest — integer index math, no float), take
    * the channel-sum luminance, and set bit (y·(gw−1)+x) iff the
    * right neighbor is strictly brighter — the standard perceptual
    * fingerprint that is invariant to the ENCODING of the image
    * (filter type, compression level) because it sees only pixels.
    * Default grid 9×7 → 56 bits: DuckDB refuses 1<<63, and 56 bits
    * keeps the hash a non-negative BIGINT in every engine. */
  def dHash(px: Pixels, gw: Int = 9, gh: Int = 7): Long = {
    require((gw - 1) * gh <= 63, "hash must fit in a signed 64-bit")
    val t = resizeNearest(px, gw, gh)
    def lum(x: Int, y: Int): Int = {
      val base = (y * gw + x) * t.channels
      var s = 0; var c = 0
      while (c < t.channels) { s += t.data(base + c) & 0xff; c += 1 }
      s
    }
    var h = 0L
    var y = 0
    while (y < gh) {
      var x = 0
      while (x < gw - 1) {
        if (lum(x + 1, y) > lum(x, y)) h |= 1L << (y * (gw - 1) + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** Per-image perceptual hash + visually-identical group size: the
    * image-dedup primitive (two payloads with different PNG filter
    * types / compression but the same pixels collide exactly; near
    * dups differ in few bits — band the 56 bits like SimHash for
    * candidate pairs at corpus scale). mapPartitions only at the
    * codec byte boundary, then an 8-byte groupBy for the group
    * sizes — the exact-dedup shuffle shape. Undecodable rows are
    * dropped, never fatal. */
  def imagePhash(df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val hashes = df
      .where(col(idCol).isNotNull && col(binCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, payload) =>
            decodePixels(payload).map(px => (id, dHash(px)))
          }
        }
      }.toDF("doc_id", "phash")
    val groups = hashes.groupBy("phash")
      .agg(count(lit(1)).as("n_same"))
    hashes.join(groups, Seq("phash"))
      .select(col("doc_id"), col("phash"), col("n_same"))
      .orderBy("doc_id")
  }

  /** Banded Hamming near-dup pairs over perceptual hashes — the
    * image twin of SimHash dedup: the 56-bit dHash splits into 4
    * 14-bit bands; by pigeonhole any pair within Hamming distance 3
    * agrees on at least one band, so band-equality joins are a
    * RECALL-COMPLETE candidate generator at maxDist ≤ 3 and the
    * bit_count(xor) verify is exact. A pair agreeing on several
    * bands is kept only at its FIRST agreeing band (decidable from
    * the two hashes post-join — no distinct over the pair set). Scale
    * shape: explode ×4, shuffle on the 2-byte band value, per-band
    * buckets are the candidate sets; identical-image clusters (the
    * common case) cost |cluster|² pairs per band bucket, the true
    * answer size. */
  def phashNearDupPairs(hashes: DataFrame, idCol: String,
      hashCol: String, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4-band pigeonhole guarantees recall only to 3")
    def band(h: Column, i: Int): Column =
      shiftrightunsigned(h, i * 14) bitwiseAND lit(16383L)
    val ex = hashes.select(col(idCol).as("id"), col(hashCol).as("h"))
      .select(col("id"), col("h"),
        explode(typedLit(List(0, 1, 2, 3))).as("bi"))
      .withColumn("bv",
        element_at(array((0 until 4).map(i => band(col("h"), i)): _*),
          col("bi") + 1))
    val firstAgree = (0 until 4).map { i =>
      when(lit(i) < col("a.bi"),
        band(col("a.h"), i) =!= band(col("b.h"), i)).otherwise(lit(true))
    }.reduce(_ && _)
    ex.as("a").join(ex.as("b"),
        col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
          col("a.id") < col("b.id"))
      .where(bit_count(col("a.h").bitwiseXOR(col("b.h"))) <= maxDist &&
        firstAgree)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.h").bitwiseXOR(col("b.h"))).cast("long")
          .as("hamming"))
      .orderBy("id_a", "id_b")
  }

  /** Raster-image fixture column for the declared phash query: a
    * REAL filtered+deflated PNG per row whose pixels are the pure
    * id-derived formula of [[synthPngRaster]] — seed (id%7)·41
    * (seven visually distinct images; the ·41 pushes the pixel ramp
    * across mod-256 wraps so neighbor comparisons actually vary —
    * a small seed leaves the ramp monotone and every dHash bit set),
    * filter id%5 (five different ENCODINGS of each). The decoder
    * sees only bytes; an oracle recomputing the hash from the pixel
    * formula checks the whole inflate→unfilter→resize→hash chain. */
  def synthRasterMedia(df: DataFrame, idCol: String,
      w: Int = 16, h: Int = 12): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .map(id => (id,
        synthPngRaster(w, h, ((id % 7L) * 41L).toInt, (id % 5L).toInt)))
      .toDF("doc_id", "payload")
  }

  /** Per-payload byte-distribution features: a `bins`-bucket
    * histogram over byte values (bucket = unsigned byte / (256/bins))
    * plus the Shannon entropy of the full 256-symbol distribution in
    * bits [0, 8]. The feature-extraction stage of the multimodal
    * pipeline — REAL computation over the payload bytes (compressed
    * media ≈ 8 bits/byte, text/headers much lower), the standard
    * cheap signal for format drift, truncation, and
    * mislabeled-modality detection at corpus scale. Same batched
    * mapPartitions shape as [[mediaMeta]]: O(len) per row, no
    * shuffle, no driver involvement. */
  case class ByteFeatures(doc_id: Long, n_bytes: Long,
      byte_hist: Array[Long], entropy: Double)

  def byteFeatures(df: DataFrame, idCol: String, binCol: String,
      bins: Int = 16, batchSize: Int = 256): Dataset[ByteFeatures] = {
    require(bins > 0 && 256 % bins == 0, "bins must divide 256")
    val spark = df.sparkSession
    import spark.implicits._
    val width = 256 / bins
    df.where(col(idCol).isNotNull && col(binCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, payload) =>
            val full = new Array[Long](256)
            var i = 0
            while (i < payload.length) {
              full(payload(i) & 0xff) += 1
              i += 1
            }
            val hist = new Array[Long](bins)
            var b = 0
            while (b < 256) { hist(b / width) += full(b); b += 1 }
            val n = payload.length.toDouble
            var h = 0.0
            b = 0
            while (b < 256) {
              if (full(b) > 0) {
                val p = full(b) / n
                h -= p * (math.log(p) / math.log(2.0))
              }
              b += 1
            }
            ByteFeatures(id, payload.length.toLong, hist, h)
          }
        }
      }
  }

  /** Frame sampling: one output row per sampled frame index (every
    * `stride`-th frame), the shape a video-frame extractor produces.
    * Frame "content hash" is a deterministic stand-in. */
  def frameSample(meta: Dataset[MediaMeta], stride: Long = 2L)
      : DataFrame =
    meta.toDF()
      .where(col("n_frames").isNotNull && col("n_frames") >= 1)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        xxhash64(col("doc_id"), col("frame_idx")).as("frame_hash"))
      .orderBy("doc_id", "frame_idx")

  // ------------------------------------------------------------------
  // Fixture synthesis: REAL minimal container bytes (valid signatures,
  // chunk CRCs, marker segments) whose header parameters are a pure
  // function of the id. The decoder above knows nothing about these
  // formulas — it parses the bytes — so the oracle re-deriving the
  // same parameters from the id independently checks the parse.
  // ------------------------------------------------------------------

  private def be32b(v: Long): Array[Byte] = Array(
    (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def be16b(v: Long): Array[Byte] =
    Array((v >> 8).toByte, v.toByte)
  private def le32b(v: Long): Array[Byte] = Array(
    v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def le16b(v: Long): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte)

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    be32b(data.length.toLong) ++ t ++ data ++ be32b(crc.getValue)
  }

  /** Minimal PNG: signature, IHDR (8-bit truecolour), optional acTL
    * when animated, an 8-byte IDAT filler, IEND. CRCs are real.
    * Sizes: 65 bytes still, 85 animated. */
  def synthPng(w: Long, h: Long, frames: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(PngSig)
    out.write(pngChunk("IHDR",
      be32b(w) ++ be32b(h) ++ Array[Byte](8, 2, 0, 0, 0)))
    if (frames > 1)
      out.write(pngChunk("acTL", be32b(frames) ++ be32b(0L)))
    out.write(pngChunk("IDAT",
      Array(0x78, 0x9c, 0x63, 0x60, 0x00, 0x00, 0x00, 0x02)
        .map(_.toByte)))
    out.write(pngChunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** PNG with REAL raster content: deterministic RGB pixels
    * (a pure function of (x, y, seed)), each scanline filtered with
    * `filterType` (0–4, applying the spec's difference predictor) and
    * the whole stream zlib-compressed with java.util.zip.Deflater.
    * [[decodePixels]] must invert both stages exactly — synthesis and
    * decode share no code path beyond the filter definitions'
    * spec. */
  def synthPngRaster(w: Int, h: Int, seed: Int,
      filterType: Int = 0): Array[Byte] = {
    val ch = 3
    val stride = w * ch
    def pix(x: Int, y: Int, c: Int): Int =
      (x * 3 + y * 5 + c * 7 + seed) % 256
    val raw = new Array[Byte]((stride + 1) * h)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val pp = a + b - c
      val pa = math.abs(pp - a); val pb = math.abs(pp - b)
      val pc = math.abs(pp - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val plain = Array.tabulate(h, stride) { (y, i) =>
      pix(i / ch, y, i % ch)
    }
    for (y <- 0 until h) {
      raw(y * (stride + 1)) = filterType.toByte
      for (i <- 0 until stride) {
        val cur = plain(y)(i)
        val left = if (i >= ch) plain(y)(i - ch) else 0
        val up = if (y > 0) plain(y - 1)(i) else 0
        val ul = if (y > 0 && i >= ch) plain(y - 1)(i - ch) else 0
        val enc = filterType match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw(y * (stride + 1) + 1 + i) = (enc & 0xff).toByte
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val comp = new ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) comp.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val out = new ByteArrayOutputStream()
    out.write(PngSig)
    out.write(pngChunk("IHDR",
      be32b(w.toLong) ++ be32b(h.toLong) ++ Array[Byte](8, 2, 0, 0, 0)))
    out.write(pngChunk("IDAT", comp.toByteArray))
    out.write(pngChunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** The reference pixel formula [[synthPngRaster]] embeds — exposed
    * so tests can check decoded pixels against it independently. */
  def rasterPixel(x: Int, y: Int, c: Int, seed: Int): Int =
    (x * 3 + y * 5 + c * 7 + seed) % 256

  /** Minimal JPEG: SOI, JFIF APP0, one SOF segment (baseline SOF0 or
    * progressive SOF2 — both must parse), EOI. 41 bytes. */
  def synthJpeg(w: Long, h: Long, progressive: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array(0xff, 0xd8).map(_.toByte)) // SOI
    out.write(Array(0xff, 0xe0, 0x00, 0x10).map(_.toByte)) // APP0 len 16
    out.write("JFIF".getBytes("US-ASCII"))
    out.write(Array(0x00, 0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01,
      0x00, 0x00).map(_.toByte)) // v1.1, no density, no thumbnail
    out.write(Array(0xff, if (progressive) 0xc2 else 0xc0, 0x00, 0x11)
      .map(_.toByte)) // SOF, len 17 = 8 + 3 components x 3
    out.write(8.toByte) // sample precision
    out.write(be16b(h)); out.write(be16b(w))
    out.write(3.toByte) // components: Y 2x2, Cb 1x1, Cr 1x1
    out.write(Array(0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11,
      0x01).map(_.toByte))
    out.write(Array(0xff, 0xd9).map(_.toByte)) // EOI
    out.toByteArray
  }

  /** Header-only JPEG stub for a named real-crawl variant the pixel
    * decoder REJECTS — the loud-skip arms of the decode audit:
    * `marker` picks the SOF type (0xc9 = extended sequential with
    * ARITHMETIC entropy coding; 0xc1 + `precision` 12 = 12-bit;
    * 0xc0 + `nComp` 4 = Adobe CMYK/YCCK). Parseable by [[decode]]
    * and [[jpegVariant]] (so the variant is attributed with
    * width/height accounted) but carries no scan data — undecodable
    * BY CONSTRUCTION, exactly what the audit must report. */
  def synthJpegStub(w: Long, h: Long, marker: Int, precision: Int,
      nComp: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array(0xff, 0xd8).map(_.toByte)) // SOI
    out.write(Array(0xff, 0xe0, 0x00, 0x10).map(_.toByte)) // APP0
    out.write("JFIF".getBytes("US-ASCII"))
    out.write(Array(0x00, 0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01,
      0x00, 0x00).map(_.toByte)) // v1.1, no density, no thumbnail
    out.write(Array(0xff, marker, 0x00, 8 + 3 * nComp).map(_.toByte))
    out.write(precision.toByte)
    out.write(be16b(h)); out.write(be16b(w))
    out.write(nComp.toByte)
    for (i <- 1 to nComp) { // id, sampling, quant-table id
      out.write(i.toByte)
      out.write((if (i == 1) 0x22 else 0x11).toByte)
      out.write((if (i == 1) 0x00 else 0x01).toByte)
    }
    out.write(Array(0xff, 0xd9).map(_.toByte)) // EOI
    out.toByteArray
  }

  /** Minimal PCM WAV: RIFF/WAVE, 16-byte fmt chunk, zero-filled data
    * chunk of `frames` samples x `channels` x 16-bit. 44 + data bytes. */
  def synthWav(sampleRate: Long, channels: Long, frames: Long)
      : Array[Byte] = {
    val blockAlign = channels * 2
    val dataSize = frames * blockAlign
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32b(36 + dataSize))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    out.write(le32b(16L)) // PCM fmt chunk size
    out.write(le16b(1L)) // audio format 1 = PCM
    out.write(le16b(channels))
    out.write(le32b(sampleRate))
    out.write(le32b(sampleRate * blockAlign)) // byte rate
    out.write(le16b(blockAlign))
    out.write(le16b(16L)) // bits per sample
    out.write("data".getBytes("US-ASCII"))
    out.write(le32b(dataSize))
    out.write(new Array[Byte](dataSize.toInt))
    out.toByteArray
  }

  /** Deterministic id→payload mapping used by the declared query and
    * its oracle (`queries/Extensions.multimodalMetaSql` re-derives
    * these parameters in SQL). id mod 3 picks the modality. */
  def synthPayload(docId: Long): Array[Byte] = (docId % 3) match {
    case 0 => synthPng(16 + docId % 317, 16 + (docId * 7) % 211,
      1 + docId % 5)
    case 1 => synthJpeg(8 + (docId * 13) % 509, 8 + (docId * 11) % 387,
      progressive = docId % 2 == 1)
    case _ =>
      val rate = (docId % 4) match {
        case 0 => 8000L; case 1 => 16000L; case 2 => 22050L
        case _ => 44100L
      }
      synthWav(rate, 1 + docId % 2, 16 + docId % 257)
  }

  /** Attach a synthesized real-format payload per id: the fixture
    * generator for the multimodal query path. Runs distributed (typed
    * map, no shuffle) so the fixture scales with the table. */
  def synthMedia(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .map(id => (id, synthPayload(id)))
      .toDF(idCol, "payload")
  }

  // ------------------------------------------------------------------
  // WAV PCM sample decode — the audio twin of decodePixels: REAL
  // byte-level signal extraction (16-bit LE PCM per the RIFF spec),
  // no codec libraries. The feature stage every audio-corpus pipeline
  // runs first: energy / peak / zero-crossing screening before any
  // model sees the clip.
  // ------------------------------------------------------------------

  /** All PCM samples (interleaved across channels) of a 16-bit PCM
    * WAV; None for non-WAV, non-PCM, or non-16-bit payloads. The
    * chunk walk records the FIRST data chunk's extent and decodes it
    * after the walk, once fmt has validated — RIFF does not mandate
    * fmt-before-data ordering, and a spec-valid data-first file must
    * decode rather than be silently dropped by audioStats. A chunk
    * with a corrupt size ends the walk (nothing past it is
    * reachable); whatever fmt/data were seen before it still count. */
  def decodeSamples(p: Array[Byte]): Option[Array[Int]] = {
    if (p.length < 12 || ascii(p, 0, 4) != "RIFF" ||
      ascii(p, 8, 4) != "WAVE") return None
    var fmtOk = false
    var dataPos = -1
    var dataLen = 0
    var pos = 12
    var walking = true
    while (walking && pos + 8 <= p.length) {
      val id = ascii(p, pos, 4)
      val size = le32(p, pos + 4)
      if (id == "fmt " && pos + 24 <= p.length)
        fmtOk = le16(p, pos + 8) == 1L && le16(p, pos + 22) == 16L
      else if (id == "data" && dataPos < 0) {
        dataPos = pos + 8
        dataLen = math.min(size, (p.length - pos - 8).toLong).toInt
      }
      if (size < 0 || size > Int.MaxValue - 9) walking = false
      else pos += 8 + size.toInt + (size.toInt & 1)
    }
    if (!fmtOk || dataPos < 0) return None
    val n = dataLen / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      // signed 16-bit little-endian
      out(i) = ((p(dataPos + 2 * i) & 0xff) |
        (p(dataPos + 1 + 2 * i) << 8)).toShort.toInt
      i += 1
    }
    Some(out)
  }

  /** Per-clip signal screen: sample count, peak |s|, sig5-rounded
    * RMS, zero crossings (strict sign flips). */
  final case class AudioStats(doc_id: Long, n_samples: Long,
      peak: Long, rms: Double, n_zero_cross: Long)

  /** Batched PCM feature extraction over a binary column — same
    * mapPartitions codec boundary as [[mediaMeta]]; clips that don't
    * decode are dropped (screening semantics). */
  def audioStats(df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 256): Dataset[AudioStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull && col(binCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, payload) =>
            decodeSamples(payload).filter(_.nonEmpty).map { s =>
              var peak = 0L
              var sumSq = 0.0
              var zc = 0L
              var i = 0
              while (i < s.length) {
                val v = s(i)
                if (math.abs(v.toLong) > peak) peak = math.abs(v.toLong)
                sumSq += v.toDouble * v.toDouble
                if (i > 0 && ((v < 0) != (s(i - 1) < 0))) zc += 1
                i += 1
              }
              AudioStats(id, s.length.toLong, peak,
                graft.det.Sig.sig5(math.sqrt(sumSq / s.length)), zc)
            }
          }
        }
      }
  }

  /** Deterministic 16-bit PCM tone: sample k (interleaved stream
    * order) is ((seed + 7·k) mod 4096) − 2048 — pure integer
    * arithmetic any engine re-derives exactly. */
  def synthWavTone(sampleRate: Long, channels: Long, frames: Long,
      seed: Long): Array[Byte] = {
    val n = (frames * channels).toInt
    val blockAlign = channels * 2
    val dataSize = frames * blockAlign
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32b(36 + dataSize))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    out.write(le32b(16L))
    out.write(le16b(1L))
    out.write(le16b(channels))
    out.write(le32b(sampleRate))
    out.write(le32b(sampleRate * blockAlign))
    out.write(le16b(blockAlign))
    out.write(le16b(16L))
    out.write("data".getBytes("US-ASCII"))
    out.write(le32b(dataSize))
    var k = 0
    while (k < n) {
      val s = ((seed + 7L * k) % 4096L - 2048L).toInt
      out.write(s & 0xff)
      out.write((s >> 8) & 0xff)
      k += 1
    }
    out.toByteArray
  }

  /** 56-bit audio perceptual fingerprint — the PCM twin of [[dHash]]
    * and the missing half of modality-parity dedup (images got
    * dHash + banded near-dup in round 10): slice the sample stream
    * into 57 equal time bands, sum each band's energy (Σs² — exact
    * integer, 16-bit samples keep it far from Long overflow), and
    * set bit j iff band j+1 is strictly more energetic than band j.
    * Like dHash it sees only the SIGNAL — container metadata (sample
    * rate header, chunk layout) never reaches the hash — and its
    * 56 bits drop straight into [[phashNearDupPairs]]'s 4×14-band
    * machinery. Empty trailing bands (clips shorter than `bands`
    * samples) hold energy 0, deterministically. */
  def audioFingerprint(samples: Array[Int], bands: Int = 57): Long = {
    require((bands - 1) <= 63, "fingerprint must fit a signed 64-bit")
    val e = new Array[Long](bands)
    val n = samples.length
    var k = 0
    while (k < n) {
      val b = ((k.toLong * bands) / n).toInt
      val s = samples(k).toLong
      e(b) += s * s
      k += 1
    }
    var h = 0L
    var j = 0
    while (j < bands - 1) {
      if (e(j + 1) > e(j)) h |= 1L << j
      j += 1
    }
    h
  }

  /** Per-clip fingerprint + identical-signal group size — the audio
    * twin of [[imagePhash]]: mapPartitions only at the codec byte
    * boundary, then an 8-byte groupBy for group sizes. Undecodable
    * or empty clips are dropped, never fatal. */
  def audioPhash(df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val hashes = df
      .where(col(idCol).isNotNull && col(binCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, payload) =>
            decodeSamples(payload).filter(_.nonEmpty)
              .map(s => (id, audioFingerprint(s)))
          }
        }
      }.toDF("doc_id", "afp")
    val groups = hashes.groupBy("afp").agg(count(lit(1)).as("n_same"))
    hashes.join(groups, Seq("afp"))
      .select(col("doc_id"), col("afp"), col("n_same"))
      .orderBy("doc_id")
  }

  /** Near-dup audio fixture — the [[synthRasterMedia]] precedent in
    * the audio domain: seven distinct tones (seed (id%7)·293), each
    * under five different CONTAINER encodings (the sample-rate
    * header varies with id%5 but the samples don't), fixed 200
    * mono frames. Same-tone clips must fingerprint identically
    * whatever the header says. */
  def synthAudioVariants(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .map(id => (id, synthWavTone(8000L + 1000L * (id % 5), 1L, 200L,
        (id % 7) * 293L)))
      .toDF(idCol, "payload")
  }

  /** Per-format decode accounting — the corrupt-record-accounting
    * pattern from Sources applied to the pixel path: the raster
    * decode covers PNG and baseline + progressive JPEG ([[Jpeg]]);
    * the remaining JPEG variants and non-image payloads are skipped,
    * and any phash run over a mixed corpus must say LOUDLY what it
    * skipped rather than silently hashing the decodable subset.
    * JPEG payloads are accounted per VARIANT ([[jpegVariant]] —
    * arithmetic-coded, 12-bit, CMYK, lossless each get their own
    * row), so the audit names every real-crawl encoding it does not
    * decode. One mapPartitions classify (container sniff +
    * pixel-decode attempt) + one O(formats) aggregation. */
  def decodeAudit(df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull && col(binCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (_, payload) =>
            val fmt = decode(payload).format match {
              case "jpeg" => jpegVariant(payload)
              case f => f
            }
            (fmt, if (decodePixels(payload).isDefined) 1L else 0L)
          }
        }
      }.toDF("format", "dec")
      .groupBy("format")
      .agg(count(lit(1)).as("n_payloads"),
        sum("dec").as("n_decoded"),
        (count(lit(1)) - sum("dec")).as("n_skipped"))
      .select(col("format"), col("n_payloads"), col("n_decoded"),
        col("n_skipped"),
        graft.det.Sig.sig5(col("n_decoded").cast("double") /
          col("n_payloads")).as("decode_rate"))
      .orderBy("format")
  }

  /** Mixed-modality fixture: half real PNG rasters (the
    * [[synthRasterMedia]] formula, pixel-decodable), a quarter JPEGs
    * — baseline rasters (id ≡ 2 mod 8), REAL progressive (SOF2)
    * rasters of the SAME luma formula (id ≡ 6 mod 16, decodable
    * since r14's multi-scan decoder), and the id ≡ 14 (mod 16) slot
    * rotated over three NAMED real-crawl variants: arithmetic-coded
    * SOF9 (id ≡ 14 mod 48) and 12-bit extended sequential
    * (id ≡ 30 mod 48) as undecodable [[synthJpegStub]] loud-skip
    * rows, plus a REAL 4-component Adobe CMYK raster
    * (id ≡ 46 mod 48, [[Jpeg.synthJpegRasterCmyk]] — decodable since
    * r16, same blockLuma formula) — and a quarter WAVs (wrong
    * modality for the pixel path): the corpus the decode audit and
    * the mixed phash queries run over, with a partially-decodable
    * jpeg arm like a real crawl. */
  def synthMixedMedia(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .map { id =>
        val payload = (id % 4) match {
          case 0 | 1 => synthPngRaster(16, 12,
            ((id % 7L) * 41L).toInt, (id % 5L).toInt)
          case 2 =>
            if (id % 8 == 2)
              Jpeg.synthJpegRaster(32, 24, ((id % 7L) * 41L).toInt,
                dri = (id % 3L).toInt)
            else if (id % 16 == 6)
              Jpeg.synthJpegRasterProgressive(32, 24,
                ((id % 7L) * 41L).toInt)
            else (id % 48) match {
              case 14 => synthJpegStub(8 + (id * 13) % 509,
                8 + (id * 11) % 387, 0xc9, 8, 3)
              case 30 => synthJpegStub(8 + (id * 13) % 509,
                8 + (id * 11) % 387, 0xc1, 12, 3)
              case _ => // REAL Adobe CMYK raster — decodable since r16
                Jpeg.synthJpegRasterCmyk(32, 24, ((id % 7L) * 41L).toInt)
            }
          case _ => synthWavTone(8000L, 1L, 16L + id % 65, id % 997)
        }
        (id, payload)
      }
      .toDF(idCol, "payload")
  }

  /** JPEG-raster fixture column for the jpeg phash query: a REAL
    * entropy-coded baseline JPEG per row whose decoded pixels are
    * the pure [[Jpeg.blockLuma]] block formula (seed (id%7)·41 —
    * seven distinct images), framed with restart interval id%3
    * (three byte-different ENCODINGS of each, identical pixels). The
    * decoder sees only bytes; the oracle recomputes the hash from
    * the formula, checking the whole huffman→dequant→IDCT→colour→
    * resize→hash chain. */
  def synthJpegRasterMedia(df: DataFrame, idCol: String,
      w: Int = 32, h: Int = 24): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .map(id => (id, Jpeg.synthJpegRaster(w, h,
        ((id % 7L) * 41L).toInt, dri = (id % 3L).toInt)))
      .toDF("doc_id", "payload")
  }

  /** Tone-payload fixture: every id gets a WAV whose samples are a
    * closed-form function of the id (rate/channels/frames formulas
    * match [[synthPayload]]'s WAV arm; seed = id mod 997). */
  def synthAudio(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .map { id =>
        val rate = (id % 4) match {
          case 0 => 8000L; case 1 => 16000L; case 2 => 22050L
          case _ => 44100L
        }
        (id, synthWavTone(rate, 1 + id % 2, 16 + id % 257, id % 997))
      }
      .toDF(idCol, "payload")
  }
}
