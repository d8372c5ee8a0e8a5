package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.det.Sig
import graft.ops._
import graft.pipeline.CorpusPipeline

/** Multimodal (image / audio / binary payload) queries. Split from the monolithic Extensions
  * registry (round 11) — pure move, zero behavior; every
  * query keeps its DuckDB oracle. */
object MultimodalQueries {

  import Shared._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- multimodal ----
    // real container-header decode: each doc_id gets a synthesized
    // minimal PNG/JPEG/WAV payload (real signatures, chunk CRCs, SOF
    // segments), the decoder parses the actual bytes, and the oracle
    // re-derives the embedded parameters from doc_id independently —
    // a wrong parse offset fails the hash compare
    "multimodal_meta" -> ((s, dir) =>
      Multimodal.mediaMeta(
        Multimodal.synthMedia(t(s, dir, "documents"), "doc_id"),
        "doc_id", "payload").toDF().orderBy("doc_id")),
    // frame sampling over the REAL decoded frame counts (stride 2):
    // the oracle re-derives n_frames from the embedded header params
    // and generates the same index sequence — checks the decode →
    // explode(sequence) chain end-to-end (frame_hash is xxhash64-
    // bound, so the declared projection stops at the indices)
    "multimodal_frames" -> ((s, dir) =>
      Multimodal.frameSample(
        Multimodal.mediaMeta(
          Multimodal.synthMedia(t(s, dir, "documents"), "doc_id"),
          "doc_id", "payload"), stride = 2L)
        .select("doc_id", "frame_idx")
        .orderBy("doc_id", "frame_idx")),
    // REAL audio decode: every doc gets a 16-bit PCM WAV whose
    // samples are a closed-form function of doc_id; the decoder
    // parses the actual bytes back and the oracle re-derives peak /
    // RMS / zero-crossings from the formula — a wrong byte offset,
    // endianness, or sign extension fails the hash compare
    "multimodal_audio" -> ((s, dir) =>
      Multimodal.audioStats(
        Multimodal.synthAudio(t(s, dir, "documents"), "doc_id"),
        "doc_id", "payload").toDF().orderBy("doc_id")),
    // perceptual image hash over REAL deflated/filtered PNG rasters:
    // the oracle recomputes the 56-bit dHash from the pixel FORMULA,
    // so the whole inflate→unfilter→resize→hash chain is checked;
    // five encodings of each of seven images collide exactly
    "multimodal_phash" -> ((s, dir) =>
      Multimodal.imagePhash(
        Multimodal.synthRasterMedia(t(s, dir, "documents"), "doc_id"),
        "doc_id", "payload")),
    // image near-dup pairs: 4-band pigeonhole over the 56-bit dHash
    // (recall-complete at Hamming ≤ 3), exact bit_count verify,
    // first-agreeing-band dedup — the oracle is the NAIVE all-pairs
    // Hamming join, so the banding must be result-invisible
    "multimodal_near_dup" -> ((s, dir) =>
      Multimodal.phashNearDupPairs(
        Multimodal.imagePhash(
          Multimodal.synthRasterMedia(
            t(s, dir, "documents").where(col("doc_id") < 100),
            "doc_id"),
          "doc_id", "payload"),
        "doc_id", "phash", maxDist = 3)),
    // image DEDUP GROUPS: the near-dup pairs closed into connected
    // components by the dedup family's star machinery — the
    // keep-one-per-group unit an image pipeline actually deletes by
    "multimodal_phash_clusters" -> ((s, dir) =>
      Dedup.duplicateClustersStar(
        Multimodal.phashNearDupPairs(
          Multimodal.imagePhash(
            Multimodal.synthRasterMedia(
              t(s, dir, "documents").where(col("doc_id") < 100),
              "doc_id"),
            "doc_id", "payload"),
          "doc_id", "phash", maxDist = 3))
        .orderBy("doc_id")),
    // audio perceptual fingerprint over REAL decoded PCM: 57 time
    // bands, sign of adjacent band-energy deltas → 56 bits; the
    // oracle replays the tone formula band-for-band, so a wrong
    // sample offset, band split, or energy overflow fails the hash
    "multimodal_audio_fp" -> ((s, dir) =>
      Multimodal.audioPhash(
        Multimodal.synthAudio(t(s, dir, "documents"), "doc_id"),
        "doc_id", "payload")),
    // audio near-dup pairs: same 4×14-band pigeonhole machinery as
    // the image twin, over seven tones × five container encodings
    // (sample-rate header varies, samples don't) — encoding variants
    // must collide exactly; oracle is the naive all-pairs join
    "multimodal_audio_near_dup" -> ((s, dir) =>
      Multimodal.phashNearDupPairs(
        Multimodal.audioPhash(
          Multimodal.synthAudioVariants(
            t(s, dir, "documents").where(col("doc_id") < 100),
            "doc_id"),
          "doc_id", "payload"),
        "doc_id", "afp", maxDist = 3)),
    // per-VARIANT decode accounting over a corpus where the jpeg arm
    // is PARTIALLY decodable (real baseline + progressive + Adobe
    // CMYK rasters, the latter decodable since r16) and the
    // undecodable slots are NAMED real-crawl variants — arithmetic-
    // coded SOF9 and 12-bit stubs each get their own loud-skip audit
    // row — while WAV is the wrong modality:
    // the pixel path must report skips LOUDLY per variant; the
    // oracle re-derives the per-format decoded/skipped counts from
    // the fixture arithmetic, so a silent drop or a crash both fail
    "multimodal_decode_audit" -> ((s, dir) =>
      Multimodal.decodeAudit(
        Multimodal.synthMixedMedia(t(s, dir, "documents"), "doc_id"),
        "doc_id", "payload")),
    // phash over the SAME mixed corpus: output must be exactly the
    // PNG arm's hashes PLUS the baseline-jpeg arm's (group sizes
    // over the decoded union) — the undecodable rest degrades to
    // absence plus the audit row, never to wrong hashes
    "multimodal_phash_mixed" -> ((s, dir) =>
      Multimodal.imagePhash(
        Multimodal.synthMixedMedia(t(s, dir, "documents"), "doc_id"),
        "doc_id", "payload")),
    // perceptual hash over REAL entropy-coded baseline JPEGs: the
    // oracle recomputes the 56-bit dHash from the flat-block luma
    // FORMULA (Jpeg.blockLuma — DC-only blocks roundtrip exactly),
    // so the whole huffman→dequant→IDCT→colour→resize→hash chain is
    // checked; three restart framings of each of seven images
    // collide exactly
    "multimodal_phash_jpeg" -> ((s, dir) =>
      Multimodal.imagePhash(
        Multimodal.synthJpegRasterMedia(t(s, dir, "documents"),
          "doc_id"),
        "doc_id", "payload"))
  )

  val multimodalMetaSql: String =
    """SELECT doc_id,
      |CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav'
      |  END AS format,
      |CAST(CASE doc_id % 3
      |  WHEN 0 THEN CASE WHEN doc_id % 5 = 0 THEN 65 ELSE 85 END
      |  WHEN 1 THEN 41
      |  ELSE 44 + (16 + doc_id % 257) * (1 + doc_id % 2) * 2
      |  END AS BIGINT) AS n_bytes,
      |CAST(CASE doc_id % 3 WHEN 0 THEN 16 + doc_id % 317
      |  WHEN 1 THEN 8 + (doc_id * 13) % 509 ELSE NULL
      |  END AS BIGINT) AS width,
      |CAST(CASE doc_id % 3 WHEN 0 THEN 16 + (doc_id * 7) % 211
      |  WHEN 1 THEN 8 + (doc_id * 11) % 387 ELSE NULL
      |  END AS BIGINT) AS height,
      |CAST(CASE doc_id % 3 WHEN 0 THEN 1 + doc_id % 5 WHEN 1 THEN 1
      |  ELSE 16 + doc_id % 257 END AS BIGINT) AS n_frames,
      |CAST(CASE WHEN doc_id % 3 = 2 THEN
      |    CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
      |      WHEN 2 THEN 22050 ELSE 44100 END
      |  ELSE NULL END AS BIGINT) AS sample_rate,
      |CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + doc_id % 2 ELSE 3
      |  END AS BIGINT) AS channels
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Stride-2 frame indices from the same per-doc frame counts the
    * container headers embed (see [[multimodalMetaSql]]): Spark's
    * sequence(0, n−1, 2) over the DECODED count must equal DuckDB's
    * range(0, n, 2) over the re-derived one. */
  /** [[graft.ops.Multimodal.imagePhash]] mirror — the dHash replayed
    * from the PIXEL FORMULA (pix(x,y,c) = (3x+5y+7c+seed) mod 256,
    * seed = (doc_id mod 7)·41), nearest-resize 16×12 → 9×7 via the same
    * integer floor indices, channel-sum luminance, bit (y·8+x) set
    * iff the right neighbor is brighter. The Spark side hashes
    * pixels obtained by inflating and unfiltering real PNG bytes, so
    * agreement checks the whole decode chain. All-integer — exact. */
  /** The dHash-from-pixel-formula CTE chain (ids→g→l→hsh), shared by
    * the phash profile oracle and the near-dup pair oracle. `pred`
    * filters the doc population. */

  private def phashCtes(pred: String): String =
    s"""ids AS (SELECT doc_id, (doc_id % 7) * 41 AS seed
       |  FROM documents WHERE $pred),
       |g AS (SELECT doc_id, seed, x, y,
       |    (x * 16) // 9 AS sx, ((x + 1) * 16) // 9 AS sx1,
       |    (y * 12) // 7 AS sy
       |  FROM ids, range(0, 8) tx(x), range(0, 7) ty(y)),
       |l AS (SELECT doc_id, x, y,
       |    ((sx * 3 + sy * 5 + seed) % 256)
       |      + ((sx * 3 + sy * 5 + 7 + seed) % 256)
       |      + ((sx * 3 + sy * 5 + 14 + seed) % 256) AS l0,
       |    ((sx1 * 3 + sy * 5 + seed) % 256)
       |      + ((sx1 * 3 + sy * 5 + 7 + seed) % 256)
       |      + ((sx1 * 3 + sy * 5 + 14 + seed) % 256) AS l1
       |  FROM g),
       |hsh AS (SELECT doc_id, bit_or(CASE WHEN l1 > l0
       |    THEN 1::BIGINT << CAST(y * 8 + x AS INTEGER)
       |    ELSE 0::BIGINT END) AS phash
       |  FROM l GROUP BY doc_id)""".stripMargin

  val multimodalPhashSql: String =
    s"""WITH ${phashCtes("TRUE")},
       |grp AS (SELECT phash, count(*) AS n_same FROM hsh GROUP BY phash)
       |SELECT hsh.doc_id, hsh.phash, grp.n_same
       |FROM hsh JOIN grp ON grp.phash = hsh.phash
       |ORDER BY doc_id""".stripMargin

  /** Per-format decode accounting re-derived from the mixed-fixture
    * arithmetic ([[graft.ops.Multimodal.synthMixedMedia]]: id%4 ≤ 1
    * png raster, =2 jpeg — baseline raster iff id%8=2, progressive
    * raster iff id%16=6, Adobe CMYK raster iff id%48=46, loud-skip
    * stubs otherwise —, else wav; png, baseline, progressive and
    * CMYK jpeg pixel-decode). */

  val multimodalDecodeAuditSql: String =
    s"""WITH m AS (SELECT doc_id,
       |    CASE WHEN doc_id % 4 <= 1 THEN 'png'
       |         WHEN doc_id % 4 = 3 THEN 'wav'
       |         WHEN doc_id % 8 = 2 THEN 'jpeg_baseline'
       |         WHEN doc_id % 16 = 6 THEN 'jpeg_progressive'
       |         WHEN doc_id % 48 = 14 THEN 'jpeg_arith'
       |         WHEN doc_id % 48 = 30 THEN 'jpeg_12bit'
       |         ELSE 'jpeg_cmyk' END
       |      AS format,
       |    CASE WHEN doc_id % 4 <= 1 OR doc_id % 8 = 2
       |              OR doc_id % 16 = 6 OR doc_id % 48 = 46 THEN 1
       |      ELSE 0 END AS dec
       |  FROM documents),
       |a AS (SELECT format, count(*) AS n_payloads,
       |    CAST(sum(dec) AS BIGINT) AS n_decoded,
       |    CAST(count(*) - sum(dec) AS BIGINT) AS n_skipped,
       |    CAST(sum(dec) AS DOUBLE) / count(*) AS rt
       |  FROM m GROUP BY format)
       |SELECT format, n_payloads, n_decoded, n_skipped,
       |  ${sig("rt")} AS decode_rate
       |FROM a ORDER BY format""".stripMargin

  /** [[graft.ops.Multimodal.synthJpegRasterMedia]] mirror — the
    * dHash replayed from the flat-BLOCK luma formula
    * (Jpeg.blockLuma(bx, by, seed) = (37bx + 71by + seed) mod 256,
    * seed = (doc_id mod 7)·41, every channel equal so luminance =
    * 3·blockLuma), nearest-resize 32×24 → 9×7 via the same integer
    * floor indices, block index = source pixel // 8. The Spark side
    * hashes pixels obtained by huffman-decoding, dequantizing and
    * IDCT-ing real baseline JPEG bytes (restart interval doc_id%3
    * varies the framing), so agreement checks the whole decode
    * chain; DC-only blocks make it all-integer — exact. */
  private def jpegPhashCtes(pred: String): String =
    s"""jids AS (SELECT doc_id, (doc_id % 7) * 41 AS seed
       |  FROM documents WHERE $pred),
       |jg AS (SELECT doc_id, seed, x, y,
       |    ((x * 32) // 9) // 8 AS bx, (((x + 1) * 32) // 9) // 8 AS bx1,
       |    ((y * 24) // 7) // 8 AS by
       |  FROM jids, range(0, 8) tx(x), range(0, 7) ty(y)),
       |jl AS (SELECT doc_id, x, y,
       |    3 * ((bx * 37 + by * 71 + seed) % 256) AS l0,
       |    3 * ((bx1 * 37 + by * 71 + seed) % 256) AS l1
       |  FROM jg),
       |jhsh AS (SELECT doc_id, bit_or(CASE WHEN l1 > l0
       |    THEN 1::BIGINT << CAST(y * 8 + x AS INTEGER)
       |    ELSE 0::BIGINT END) AS phash
       |  FROM jl GROUP BY doc_id)""".stripMargin

  val multimodalPhashJpegSql: String =
    s"""WITH ${jpegPhashCtes("TRUE")},
       |grp AS (SELECT phash, count(*) AS n_same FROM jhsh GROUP BY phash)
       |SELECT jhsh.doc_id, jhsh.phash, grp.n_same
       |FROM jhsh JOIN grp ON grp.phash = jhsh.phash
       |ORDER BY doc_id""".stripMargin

  /** The mixed-corpus phash mirror: the png arm's hashes plus the
    * baseline-jpeg arm's — group sizes computed over the DECODED
    * union only. */

  val multimodalPhashMixedSql: String =
    s"""WITH ${phashCtes("doc_id % 4 <= 1")},
       |${jpegPhashCtes(
      "doc_id % 8 = 2 OR doc_id % 16 = 6 OR doc_id % 48 = 46")},
       |uni AS (SELECT doc_id, phash FROM hsh
       |        UNION ALL SELECT doc_id, phash FROM jhsh),
       |grp AS (SELECT phash, count(*) AS n_same FROM uni GROUP BY phash)
       |SELECT uni.doc_id, uni.phash, grp.n_same
       |FROM uni JOIN grp ON grp.phash = uni.phash
       |ORDER BY doc_id""".stripMargin

  /** [[graft.ops.Multimodal.phashNearDupPairs]] mirror: the NAIVE
    * all-pairs Hamming join — the 4-band pigeonhole candidate
    * generation plus first-agreeing-band dedup must be
    * result-invisible at maxDist ≤ 3. */

  val multimodalNearDupSql: String =
    s"""WITH ${phashCtes("doc_id < 100")}
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
       |FROM hsh a JOIN hsh b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.phash, b.phash)) <= 3
       |ORDER BY id_a, id_b""".stripMargin

  /** The near-dup pairs closed into components with the standard
    * recursive reach — the dedup_clusters oracle pattern over the
    * phash pair derivation. */
  val multimodalPhashClustersSql: String =
    s"""WITH RECURSIVE ${phashCtes("doc_id < 100")},
       |prs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM hsh a JOIN hsh b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.phash, b.phash)) <= 3),
       |und AS (SELECT id_a AS a, id_b AS b FROM prs
       |        UNION SELECT id_b, id_a FROM prs),
       |reach(a, b) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM und)
       |  UNION
       |  SELECT e.a, r.b FROM und e JOIN reach r ON r.a = e.b),
       |cl AS (SELECT a AS doc_id, min(b) AS cluster_id
       |       FROM reach GROUP BY a)
       |SELECT doc_id, cluster_id FROM cl ORDER BY doc_id""".stripMargin

  /** Band-energy fingerprint CTEs over the closed-form tone samples:
    * `par` supplies (doc_id, n, seed), the rest re-derives the 57
    * time-band energies densely (empty bands are 0) and folds the 56
    * adjacent-delta sign bits into `afp` — mirrors
    * [[graft.ops.Multimodal.audioFingerprint]] integer-for-integer. */

  private def audioFpCtes(par: String): String =
    s"""par AS ($par),
       |sam AS (SELECT doc_id, n, k,
       |    (seed + 7 * k) % 4096 - 2048 AS v,
       |    (k * 57) // n AS b
       |  FROM par, LATERAL unnest(range(0, n)) t(k)),
       |eb AS (SELECT doc_id, b, sum(CAST(v AS BIGINT) * v) AS e
       |       FROM sam GROUP BY doc_id, b),
       |dense AS (SELECT p.doc_id, g.b, coalesce(eb.e, 0) AS e
       |  FROM (SELECT DISTINCT doc_id FROM par) p
       |  CROSS JOIN (SELECT unnest(range(0, 57)) AS b) g
       |  LEFT JOIN eb ON eb.doc_id = p.doc_id AND eb.b = g.b),
       |dl AS (SELECT doc_id, b, e, lead(e) OVER (
       |         PARTITION BY doc_id ORDER BY b) AS en FROM dense),
       |hs AS (SELECT doc_id, CAST(coalesce(sum(
       |    CASE WHEN en > e THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER))
       |    END), 0) AS BIGINT) AS afp
       |  FROM dl WHERE b < 56 GROUP BY doc_id)""".stripMargin

  val multimodalAudioFpSql: String =
    s"""WITH ${audioFpCtes(
      """SELECT doc_id,
        |    (16 + doc_id % 257) * (1 + doc_id % 2) AS n,
        |    doc_id % 997 AS seed FROM documents""".stripMargin)},
       |g AS (SELECT afp, count(*) AS n_same FROM hs GROUP BY afp)
       |SELECT hs.doc_id, hs.afp, g.n_same
       |FROM hs JOIN g USING (afp) ORDER BY doc_id""".stripMargin

  val multimodalAudioNearDupSql: String =
    s"""WITH ${audioFpCtes(
      """SELECT doc_id, 200 AS n, (doc_id % 7) * 293 AS seed
        |FROM documents WHERE doc_id < 100""".stripMargin)}
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.afp, b.afp)) AS BIGINT) AS hamming
       |FROM hs a JOIN hs b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.afp, b.afp)) <= 3
       |ORDER BY id_a, id_b""".stripMargin

  val multimodalFramesSql: String =
    """WITH nf AS (SELECT doc_id,
      |  CAST(CASE doc_id % 3 WHEN 0 THEN 1 + doc_id % 5 WHEN 1 THEN 1
      |    ELSE 16 + doc_id % 257 END AS BIGINT) AS n_frames
      |  FROM documents)
      |SELECT doc_id, CAST(unnest(range(0, n_frames, 2)) AS BIGINT)
      |  AS frame_idx
      |FROM nf ORDER BY doc_id, frame_idx""".stripMargin

  val multimodalAudioSql: String =
    s"""WITH par AS (SELECT doc_id,
       |    (16 + doc_id % 257) * (1 + doc_id % 2) AS n,
       |    doc_id % 997 AS seed FROM documents),
       |s AS (SELECT doc_id, n, k,
       |    (seed + 7 * k) % 4096 - 2048 AS v,
       |    CASE WHEN k > 0 THEN (seed + 7 * (k - 1)) % 4096 - 2048
       |      END AS pv
       |  FROM par, LATERAL unnest(range(0, n)) t(k))
       |SELECT doc_id, CAST(min(n) AS BIGINT) AS n_samples,
       |CAST(max(abs(v)) AS BIGINT) AS peak,
       |${sig("sqrt(sum(CAST(v AS DOUBLE) * v) / min(n))")} AS rms,
       |CAST(sum(CASE WHEN k > 0 AND ((v < 0) <> (pv < 0)) THEN 1
       |  ELSE 0 END) AS BIGINT) AS n_zero_cross
       |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Manifest re-derived; token counts via string_split like the
    * other token oracles. */

  val oracle: Map[String, String] = Map(
    "multimodal_audio" -> multimodalAudioSql,
    "multimodal_meta" -> multimodalMetaSql,
    "multimodal_frames" -> multimodalFramesSql,
    "multimodal_phash" -> multimodalPhashSql,
    "multimodal_near_dup" -> multimodalNearDupSql,
    "multimodal_phash_clusters" -> multimodalPhashClustersSql,
    "multimodal_audio_fp" -> multimodalAudioFpSql,
    "multimodal_audio_near_dup" -> multimodalAudioNearDupSql,
    "multimodal_decode_audit" -> multimodalDecodeAuditSql,
    "multimodal_phash_mixed" -> multimodalPhashMixedSql,
    "multimodal_phash_jpeg" -> multimodalPhashJpegSql
  )
}
