package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata extracted by a partition-wise
  * decoder. The Spark-side shape is real — schema, encoders, partition
  * batching via mapPartitions — while the actual media decode is a STUB
  * (this container ships no image/audio libraries): `FakeDecoder` derives
  * deterministic pseudo-metadata from the bytes. Swap `Decoder` for a real
  * JNI/javacv implementation without touching the pipeline.
  *
  * Scale notes: decode is embarrassingly parallel (mapPartitions, no
  * shuffle); payloads stay off the driver; one decoder instance per
  * partition amortizes decoder init (the expensive part with real codecs).
  */
object Multimodal {

  /** A binary payload row entering the decoder. */
  case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Typed metadata a decoder extracts. */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long,
                       channels: Long, format: String)

  trait Decoder extends Serializable {
    def decode(rows: Iterator[MediaRow]): Iterator[MediaMeta]
  }

  /** STUB decoder — deterministic fake dimensions from byte length. A real
    * implementation would parse the container header / frames here. */
  object FakeDecoder extends Decoder {
    def decode(rows: Iterator[MediaRow]): Iterator[MediaMeta] = rows.map { r =>
      val n = r.payload.length.toLong
      MediaMeta(r.doc_id, n,
        width = 64L + n % 577L,
        height = 64L + (n * 31L) % 417L,
        channels = 3L,
        format = if (r.doc_id % 3 == 0) "png" else "jpeg")
    }
  }

  /** Attach a binary payload column (here synthesized from text — the
    * harness tables carry no media; a real source would read files/blobs)
    * and run the partition-wise decoder. */
  def decodeMeta(docs: DataFrame, decoder: Decoder = FakeDecoder): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // null payloads (null text) are DROPPED, the same contract as
    // frameSample — a decoder must never see a null buffer (oracles carry
    // the matching IS NOT NULL)
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
      .mapPartitions(decoder.decode _)
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Frame sampling: every `stride`-th frame of each payload becomes a row
    * (the explode shape a video pipeline needs — per-frame rows fan out of
    * per-asset rows WITHOUT shuffling; frame decode itself is the stubbed
    * part). Frame count/offsets are derived deterministically from payload
    * length (fake container: 1 "frame" per 16 bytes). */
  def frameSample(docs: DataFrame, stride: Int = 4): DataFrame = {
    val nFrames = (length(col("payload")) / 16 + 1).cast("long")
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .select(col("doc_id"), col("payload"), nFrames.as("n_frames"))
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong)))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * 16L).as("offset_bytes"),
        md5(concat_ws(":", col("doc_id"), col("frame_idx"))).as("frame_key"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Resize planning: compute target dimensions preserving aspect ratio with
    * a max-side bound — pure column arithmetic over decoded metadata; the
    * pixel work would live in the partition-wise decoder. */
  def resizePlan(meta: DataFrame, maxSide: Int = 256): DataFrame = {
    val scale = least(
      lit(maxSide.toDouble) / col("width"),
      lit(maxSide.toDouble) / col("height"), lit(1.0))
    meta.select(col("doc_id"), col("width"), col("height"),
        floor(col("width") * scale).cast("long").as("out_w"),
        floor(col("height") * scale).cast("long").as("out_h"))
      .orderBy(col("doc_id"))
  }
}
