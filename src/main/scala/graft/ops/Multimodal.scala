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
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
      .mapPartitions(decoder.decode _)
      .toDF()
      .orderBy(col("doc_id"))
  }
}
