package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata extracted by a batched
  * per-partition decode stage.
  *
  * The decode itself is STUBBED (no codec libraries in this
  * environment): `decodeStub` derives deterministic fake dimensions
  * from the payload bytes. Everything around it — the binary column
  * schema, the Dataset[T] encoder boundary, the mapPartitions
  * batch-shaped execution (mirroring how a Pandas-UDF/Arrow batch
  * decode would run per executor core), and the downstream
  * aggregability of the result — is real Spark plumbing and is what
  * the tests exercise. Swap `decodeStub` for a real codec call and
  * the operator is production-shaped: decode cost scales per row,
  * no shuffle, no driver involvement.
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
      height: Long, n_frames: Long)

  /** Deterministic fake decode: metadata as a pure function of the
    * payload length (stands in for parsing a real container header). */
  def decodeStub(payload: Array[Byte]): (Long, Long, Long) = {
    val len = payload.length.toLong
    (64L + len % 193L, 64L + (len * 31L) % 157L, 1L + len % 7L)
  }

  /** Batched metadata extraction over a binary column. `batchSize`
    * shapes the inner loop the way an Arrow-batch decoder would see
    * it (decode libraries amortize setup per batch, not per row). */
  def mediaMeta(df: DataFrame, idCol: String, binCol: String,
      batchSize: Int = 256): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    // rows with a null id/payload cannot be decoded — skip them (one
    // null row would otherwise NPE the whole job inside decodeStub)
    df.where(col(idCol).isNotNull && col(binCol).isNotNull)
      .select(col(idCol).cast("long"), col(binCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch "decoder init" would live here
          batch.iterator.map { case (id, payload) =>
            val (w, h, f) = decodeStub(payload)
            MediaMeta(id, payload.length.toLong, w, h, f)
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
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        xxhash64(col("doc_id"), col("frame_idx")).as("frame_hash"))
      .orderBy("doc_id", "frame_idx")
}
