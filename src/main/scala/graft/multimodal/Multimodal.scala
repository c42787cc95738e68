package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: media as opaque BINARY columns + typed
  * metadata, with decode / feature-extraction / resize / frame-sample
  * operators running per-partition in bounded batches.
  *
  * The decode kernels are STUBS — this container has no image/audio
  * codecs, so `decodeStub` derives deterministic pseudo-features from
  * the raw bytes. Everything AROUND the kernel is the real engine
  * surface and is what these operators exercise:
  *
  *  - schema: (id, kind, bytes BINARY, meta STRUCT<...>) — the media
  *    table layout; bytes stay opaque to Catalyst, metadata columns
  *    prune/push down normally;
  *  - execution: `Dataset.mapPartitions` with an explicit batch size —
  *    the Scala analog of `mapInPandas`' arrow-batch shape. Kernels
  *    see a bounded Iterator[Seq[_]] so peak memory is
  *    batchSize × max(blob) regardless of partition size;
  *  - partitioning: blobs repartition by id range so a 100 TB media
  *    set spreads by row count, not by byte skew (a handful of 4 GB
  *    videos won't pin one executor);
  *  - swap-in point: replace [[MediaKernels.decodeStub]] with a real
  *    JNI/codec call and nothing else changes.
  */
object Multimodal {

  final case class MediaMeta(kind: String, width: Int, height: Int, sampleRate: Int)
  final case class MediaRow(id: Long, bytes: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(id: Long, nBytes: Long, f0: Double, f1: Double, f2: Double)

  val DefaultBatchSize = 64

  /** Build a media table from any (id, payload) source — here text
    * bytes stand in for decoded media blobs. */
  def mediaFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      encode(col(textCol), "UTF-8").as("bytes"),
      struct(
        lit("image/fake").as("kind"),
        lit(64).as("width"), lit(64).as("height"),
        lit(0).as("sampleRate")).as("meta"))

  /** Feature extraction over batched partitions. Deterministic stub
    * kernel: [n_bytes, first byte, last byte] — chosen so a SQL oracle
    * can recompute it; a real embedding model slots into the same
    * batch loop. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      batchSize: Int = DefaultBatchSize): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // batch-shaped kernel call: one invocation per ≤batchSize rows,
          // mirroring mapInPandas' per-arrow-batch UDF signature
          MediaKernels.decodeStub(batch)
        }
      }
  }

  /** Deterministic frame sampling: n offsets evenly spaced over the
    * blob — the video-frame-sample shape (every selected "frame" is a
    * fixed-size byte slice). */
  def frameSample(media: DataFrame, n: Int, frameBytes: Int = 16): DataFrame =
    media.select(col("id"), col("bytes"),
      expr(s"transform(sequence(0, $n - 1), " +
        s"i -> substring(bytes, cast(1 + i * greatest(octet_length(bytes) - $frameBytes, 0) / greatest($n - 1, 1) AS INT), $frameBytes))")
        .as("frames"))
      .drop("bytes")

  /** Resize stub: truncate/pad the blob to exactly `target` bytes —
    * stands in for image resize (output shape is fixed regardless of
    * input size, which is the property downstream batching relies on). */
  def resizeStub(media: DataFrame, target: Int): DataFrame =
    media.withColumn("bytes",
      expr(s"rpad(substring(bytes, 1, $target), $target, X'00')"))
}

object MediaKernels {
  import Multimodal.MediaFeatures

  /** STUB decoder — deterministic features from raw bytes. Swap for a
    * real codec/model; the signature (batch in, features out) is the
    * contract the executor-side loop depends on. */
  def decodeStub(batch: Seq[(Long, Array[Byte])]): Seq[MediaFeatures] =
    batch.map { case (id, bytes) =>
      val n = bytes.length.toLong
      val first = if (n > 0) (bytes(0) & 0xff).toDouble else 0.0
      val last = if (n > 0) (bytes(bytes.length - 1) & 0xff).toDouble else 0.0
      MediaFeatures(id, n, n.toDouble, first, last)
    }
}
