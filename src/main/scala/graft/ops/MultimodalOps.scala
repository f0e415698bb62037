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

  val audioSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("window_idx", LongType),
    StructField("rms", DoubleType),
    StructField("zcr", DoubleType)))

  /** Windowed audio features — the audio leg of the pipeline: each media
    * payload decodes to a (stubbed) duration, which is cut into
    * `windowMs`-millisecond analysis windows; every window yields
    * RMS-energy and zero-crossing-rate features (deterministic md5 stubs
    * of payload:window — swap for a real PCM decoder + DSP without
    * touching the batching/schema plumbing, exactly like [[decodeMeta]] /
    * [[frameFeatures]]). One row per (doc, window): array-free for the
    * oracle, and the window loop is lazy per task.
    */
  def audioWindows(docs: DataFrame, windowMs: Int = 250,
                   batchSize: Int = 32): DataFrame = {
    val src = docs.select(col("doc_id"), col("text"))
    implicit val enc = RowEncoder.encoderFor(audioSchema)
    src.mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5") // the per-task "decoder"
      def h60(s: String): Long = java.lang.Long.parseLong(
        md.digest(s.getBytes(StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString.substring(0, 15), 16)
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val id = r.getLong(0)
          val text = r.getString(1)
          val durMs = 200L + h60(text) % 2000L
          val nWin = (durMs + windowMs - 1) / windowMs
          (0L until nWin).iterator.map { w =>
            val hw = h60(s"$text:w$w")
            Row(id, w, (hw % 1000L) / 1000.0, ((hw >> 10) % 1000L) / 1000.0)
          }
        }
      }
    }.orderBy("doc_id", "window_idx")
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", LongType),
    StructField("dim_j", LongType),
    StructField("feat", DoubleType)))

  /** Frame sampling + per-frame feature extraction — the video leg of the
    * pipeline: every `every`-th frame of each media payload yields a
    * `dim`-dimensional feature row. Same mapPartitions shape as
    * [[decodeMeta]] (per-task codec init, lazy iterators, no collect);
    * frame count reuses [[decodeStub]]'s metadata hash so the two stages
    * agree on media geometry. The "features" are the deterministic stub
    * tier (md5 of payload:frame fanned into [0,1) doubles) — swap the
    * inner loop for a real decoder+embedder; schema, batching and
    * partitioning stay as they are. Output is one scalar row per
    * (doc, frame, dim) so the oracle comparison stays array-free.
    */
  def frameFeatures(docs: DataFrame, every: Int = 4, dim: Int = 4,
                    batchSize: Int = 32): DataFrame = {
    val src = docs.select(col("doc_id"), col("text"))
    implicit val enc = RowEncoder.encoderFor(frameSchema)
    src.mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5") // the per-task "codec"
      def h60(s: String): Long = java.lang.Long.parseLong(
        md.digest(s.getBytes(StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString.substring(0, 15), 16)
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val id = r.getLong(0)
          val text = r.getString(1)
          val nFrames = 1L + h60(text) % 30L
          (0L until nFrames by every.toLong).iterator.flatMap { f =>
            val h = h60(s"$text:$f")
            (0 until dim).iterator.map(j =>
              Row(id, f, j.toLong, ((h >>> (8 * j)) % 1000L) / 1000.0))
          }
        }
      }
    }.orderBy("doc_id", "frame_idx", "dim_j")
  }
}
