package nelspark.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata a real decoder would emit for one media object. */
case class MediaMeta(
    media_id: Long, kind: String, n_bytes: Long,
    width: Int, height: Int, n_frames: Int, sample_rate: Int)

/** One decoded-feature row per media object (fixed-length feature vec). */
case class MediaFeatures(media_id: Long, features: Array[Float])

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary`
 * columns with typed metadata. The Spark side — schema, partition-wise
 * batched processing (mapPartitions, one decoder init per partition, the
 * same batch shape a JNI/FFmpeg/Pillow binding needs), feature schema —
 * is real and tested; the byte-level decode itself is a clearly-marked
 * STUB (no media libraries ship in this container): it derives
 * deterministic pseudo-metadata/features from the bytes so the
 * distributed plumbing is exercisable end-to-end.
 */
object MediaOps {

  /** STUB DECODER — replace with a real binding (e.g. libvips/ffmpeg via
    * JNI) in production. Deterministic in the input bytes. */
  private[media] def decodeStub(kind: String, bytes: Array[Byte]): (Int, Int, Int, Int) = {
    val h = nelspark.expr.Kernels.hashBytes(bytes, 0x4D454449L) // "MEDI"
    def f(shift: Int, mod: Int, off: Int) =
      (Math.floorMod(h >>> shift, mod.toLong) + off).toInt
    kind match {
      case "image" => (f(0, 3840, 16), f(12, 2160, 16), 1, 0)
      case "video" => (f(0, 1920, 16), f(12, 1080, 16), f(24, 100000, 1), 0)
      case "audio" => (0, 0, 0, Seq(8000, 16000, 22050, 44100, 48000)(f(0, 5, 0)))
      case _ => (0, 0, 0, 0)
    }
  }

  /**
   * Decode metadata partition-wise. Input: (media_id long, kind string,
   * payload binary). One decoder context per partition (the `it =>` scope)
   * — the shape a native decoder requires; per-row lambda UDFs would
   * re-init per value and break batch locality.
   */
  def decodeMeta(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // real impl: val decoder = NativeDecoder.open() ... it.map{..}.closing(decoder)
        it.map { case (id, kind, bytes) =>
          val (w, h, nf, sr) = decodeStub(kind, bytes)
          MediaMeta(id, kind, bytes.length.toLong, w, h, nf, sr)
        }
      }
  }

  /** Feature extraction stub: fixed-length deterministic pseudo-embedding
    * per media object (batched per partition like decodeMeta). */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val fs = Array.tabulate(dim) { i =>
            val h = nelspark.expr.Kernels.hashBytes(bytes, 0xFEA7L + i)
            (h.toDouble / Long.MaxValue).toFloat // STUB: model forward pass
          }
          MediaFeatures(id, fs)
        }
      }
  }

  /** Frame sampling plan for video rows: deterministic frame indices
    * (every `stride`-th frame capped at `maxFrames`) — the partition-
    * friendly explode shape a real frame extractor consumes. */
  def frameSamplePlan(meta: Dataset[MediaMeta], stride: Int = 30,
      maxFrames: Int = 16): DataFrame = {
    meta.toDF()
      .filter(col("kind") === "video" && col("n_frames") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0),
          least(col("n_frames") - 1, lit((maxFrames - 1).toLong * stride)),
          lit(stride.toLong))).as("frame_idx"))
  }
}
