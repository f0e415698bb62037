package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted partition-wise in fixed-size
  * batches (the shape a real image/audio decoder needs — amortize codec
  * init per batch, bounded memory per task).
  *
  * The decode itself is a STUB — this container has no image/audio codecs
  * — implemented as a deterministic fake: metadata is derived from the md5
  * of the payload bytes, so the pipeline is fully testable end-to-end and
  * byte-for-byte reproducible. Swap [[decodeStub]] for a real codec call
  * (JNI/ffmpeg/javax.imageio) without touching any of the surrounding
  * plumbing: schema, batching, partitioning and encoders stay identical.
  *
  * Scale: `mapPartitions` keeps the decode distributed (no collect), the
  * batch iterator is lazy (one batch in memory per task), and upstream
  * partitioning is whatever the source had — repartition by size before
  * this stage if payloads are skewed.
  */
object MultimodalOps {

  val metaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("byte_len", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("n_frames", LongType),
    StructField("codec", StringType)))

  /** Deterministic fake decode: 60 bits of md5(payload) fan out into
    * plausible media dimensions. Replace with a real codec at will. */
  def decodeStub(docId: Long, payload: Array[Byte]): Row = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    Row(docId,
      payload.length.toLong,
      64L + h % 1024L,
      64L + (h >> 10) % 1024L,
      1L + h % 30L,
      (h % 3L) match { case 0 => "jpeg"; case 1 => "png"; case _ => "webp" })
  }

  /** documents → (doc_id, payload binary) → batched decode → typed
    * metadata. `batchSize` models the codec's vectorization width.
    */
  def decodeMeta(docs: DataFrame, batchSize: Int = 32): DataFrame = {
    val binary = docs.select(
      col("doc_id"),
      col("text").cast(BinaryType).as("payload"))
    implicit val enc = RowEncoder.encoderFor(metaSchema)
    binary.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup would init the codec once here
        batch.iterator.map(r => decodeStub(r.getLong(0), r.getAs[Array[Byte]](1)))
      }
    }
  }
}
