package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * as opaque `binary` columns with typed metadata, processed in per-partition
  * batches (the Scala analogue of PySpark's mapInPandas batch shape).
  *
  * The actual media decoding is STUBBED — this container has no image/audio
  * codecs — behind [[MediaDecoder]]: a deterministic fake that parses the
  * 16-byte header convention below. Everything around the stub is real and
  * tested: schema, Dataset encoders, per-partition decoder lifecycle
  * (expensive init once per partition, not per row), batch iteration, and
  * the downstream feature columns.
  *
  * Scale notes (100 TB of media):
  *  - binary payloads ride in their own column; feature extraction projects
  *    them away immediately after decode, so downstream stages shuffle only
  *    fixed-width features, never media bytes.
  *  - decode is map-only; `spark.sql.files.maxPartitionBytes` (and, for
  *    pathological skew, a repartition on id) bounds per-task memory.
  *
  * Fake header convention (deterministic stand-in for magic bytes):
  * bytes[0..3] = width (BE int), bytes[4..7] = height, bytes[8] = channels,
  * bytes[9] = media kind (0 image, 1 audio, 2 video), rest = payload.
  */
object Multimodal {

  case class MediaRecord(
      media_id: Long,
      uri: String,
      media_type: String,
      content: Array[Byte],
      meta: Map[String, String])

  case class ImageFeatures(
      media_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      size_bytes: Long,
      ahash: Long)

  case class FrameSample(media_id: Long, frame_idx: Int, frame_hash: Long)

  /** Decoder interface — the seam where a real codec (javax.imageio, ffmpeg
    * bindings, ...) would plug in. Implementations must be cheap to call per
    * row but may be expensive to construct (model load): construct once per
    * partition via [[decodeImages]].
    */
  trait MediaDecoder extends Serializable {
    def decodeImage(bytes: Array[Byte]): ImageFeatures0
    def sampleFrames(bytes: Array[Byte], everyN: Int): Iterator[Long]
  }
  case class ImageFeatures0(width: Int, height: Int, channels: Int, ahash: Long)

  /** STUB decoder: deterministic fake parse of the 16-byte header; the
    * "average hash" is an FNV over the payload — NOT a real perceptual hash.
    */
  final class StubDecoder extends MediaDecoder {
    private def beInt(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

    override def decodeImage(bytes: Array[Byte]): ImageFeatures0 = {
      require(bytes.length >= 10, s"media payload too short: ${bytes.length}")
      var h = 0xcbf29ce484222325L
      var i = 10
      while (i < bytes.length) { h ^= bytes(i); h *= 0x100000001b3L; i += 1 }
      ImageFeatures0(beInt(bytes, 0), beInt(bytes, 4), bytes(8) & 0xff, h)
    }

    override def sampleFrames(bytes: Array[Byte], everyN: Int): Iterator[Long] = {
      val payload = bytes.drop(10)
      payload.grouped(math.max(1, everyN)).map { chunk =>
        var h = 0xcbf29ce484222325L
        chunk.foreach { b => h ^= b; h *= 0x100000001b3L }
        h
      }
    }
  }

  /** Encode the fake header + payload (used by tests / the demo query to
    * fabricate deterministic media bytes from any seed payload).
    */
  def fakeMediaBytes(width: Int, height: Int, channels: Int, kind: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](10 + payload.length)
    out(0) = (width >>> 24).toByte; out(1) = (width >>> 16).toByte
    out(2) = (width >>> 8).toByte; out(3) = width.toByte
    out(4) = (height >>> 24).toByte; out(5) = (height >>> 16).toByte
    out(6) = (height >>> 8).toByte; out(7) = height.toByte
    out(8) = channels.toByte; out(9) = kind.toByte
    System.arraycopy(payload, 0, out, 10, payload.length)
    out
  }

  /** Per-partition batch decode: decoder constructed ONCE per partition
    * (expensive-init lifecycle), then streamed over the rows — the batch
    * shape a real codec/model needs. Projects media bytes away.
    */
  def decodeImages(
      media: Dataset[MediaRecord],
      mkDecoder: () => MediaDecoder = () => new StubDecoder): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = mkDecoder() // once per partition, not per row
      rows.map { r =>
        val f = decoder.decodeImage(r.content)
        ImageFeatures(r.media_id, f.width, f.height, f.channels, r.content.length.toLong, f.ahash)
      }
    }
  }

  /** Frame sampling (one row per sampled frame), same lifecycle. */
  def sampleFrames(
      media: Dataset[MediaRecord],
      everyN: Int,
      mkDecoder: () => MediaDecoder = () => new StubDecoder): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val decoder = mkDecoder()
      rows.flatMap { r =>
        decoder.sampleFrames(r.content, everyN).zipWithIndex.map {
          case (h, i) => FrameSample(r.media_id, i, h)
        }
      }
    }
  }

  /** Demo corpus: deterministic fake media fabricated from the documents
    * table (payload = text bytes; dims derived from doc_id).
    */
  def fakeMediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, source) =>
        val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        MediaRecord(
          media_id = id,
          uri = s"fake://$source/$id.img",
          media_type = "image/fake",
          content = fakeMediaBytes(
            width = (id % 64 + 1).toInt * 16,
            height = (id % 48 + 1).toInt * 16,
            channels = 3, kind = 0, payload = payload),
          meta = Map("source" -> source))
      }
  }
}
