package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.multimodal.MediaKernels

/** InternalRow-level media kernels (r15 optimization, guide §4 "prefer
  * built-in/JVM expressions over opaque row boundaries"): the multimodal
  * query family previously round-tripped every row through the typed
  * Dataset boundary — `as[(Long, Array[Byte])]` / case-class results —
  * paying a DeserializeToObject + SerializeFromObject pair per
  * mapPartitions stage (two pairs per query: synthesis, then
  * probe/decode). These expressions run the SAME compiled kernels
  * (`MediaKernels.*`, byte-identical output) directly on InternalRow
  * values: BINARY children arrive as `Array[Byte]` with no encoder, and
  * struct results are built as `GenericInternalRow`s — no object
  * ser/de, no extra projection stages, and Catalyst column pruning
  * stays intact around them.
  *
  * CodegenFallback is the right trade here (same reasoning as
  * [[CdcBounds]]): the kernels are per-row-heavy codec walks (ImageIO,
  * RIFF/BMFF parsing) that dominate any dispatch cost; what matters is
  * eliminating the per-row encoder work and plan barriers, not inlining
  * the codec into generated code.
  */
private[functions] abstract class MediaStructExpr
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BINARY, got $other")
  }
}

/** `synthetic_media(id, kind)` → BINARY: the deterministic test-media
  * generators (PNG/AVI/WAV/MP4 synthesis, pure arithmetic on the id) as
  * one expression — the per-row generator side of the multimodal
  * round-trip gates. `kind` is a constant discriminator so one class
  * covers the family. */
case class SyntheticMedia(child: Expression, kind: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"synthetic_media expects BIGINT, got $other")
  }
  override protected def nullSafeEval(input: Any): Any = {
    val id = input.asInstanceOf[Long]
    kind match {
      case "png" => MediaKernels.syntheticPng(id)
      case "avi" => MediaKernels.syntheticAvi(id)
      case "wav" => MediaKernels.syntheticWav(id)
      case "mp4" => MediaKernels.syntheticMp4(id)
      case other => throw new IllegalArgumentException(
        s"synthetic_media: unknown kind '$other'")
    }
  }
  override protected def withNewChildInternal(newChild: Expression): SyntheticMedia =
    copy(child = newChild)
  override def prettyName: String = s"synthetic_$kind"
}

/** `decode_image(bytes)` → STRUCT<ok, width, height, mean_luma>: the
  * ImageIO decode kernel ([[MediaKernels.decodeImage]] single-row form);
  * corrupt bytes degrade to ok=false rows, same contract. */
case class DecodeImageExpr(child: Expression) extends MediaStructExpr {
  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false)))
  override protected def nullSafeEval(input: Any): Any = {
    val f = MediaKernels
      .decodeImage(Seq((0L, input.asInstanceOf[Array[Byte]]))).head
    InternalRow(f.ok, f.width, f.height, f.meanLuma)
  }
  override protected def withNewChildInternal(newChild: Expression): DecodeImageExpr =
    copy(child = newChild)
  override def prettyName: String = "decode_image"
}

/** `probe_png(bytes)` → STRUCT<ok, width, height, bit_depth, color_type,
  * interlace, chunks, crc_ok>: the CRC-verifying PNG chunk walk. */
case class ProbePngExpr(child: Expression) extends MediaStructExpr {
  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("bit_depth", IntegerType, nullable = false),
    StructField("color_type", IntegerType, nullable = false),
    StructField("interlace", IntegerType, nullable = false),
    StructField("chunks", StringType, nullable = false),
    StructField("crc_ok", BooleanType, nullable = false)))
  override protected def nullSafeEval(input: Any): Any =
    MediaKernels.probePng(input.asInstanceOf[Array[Byte]]) match {
      case Some(p) => InternalRow(true, p.width, p.height, p.bitDepth,
        p.colorType, p.interlace, UTF8String.fromString(p.chunks), p.crcOk)
      case None => InternalRow(false, -1, -1, -1, -1, -1,
        UTF8String.fromString(""), false)
    }
  override protected def withNewChildInternal(newChild: Expression): ProbePngExpr =
    copy(child = newChild)
  override def prettyName: String = "probe_png"
}

/** `probe_mp4(bytes)` → STRUCT<ok, brand, timescale, duration, n_tracks,
  * width, height, codec>: the ISO-BMFF metadata box walk. */
case class ProbeMp4Expr(child: Expression) extends MediaStructExpr {
  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("brand", StringType, nullable = false),
    StructField("timescale", LongType, nullable = false),
    StructField("duration", LongType, nullable = false),
    StructField("n_tracks", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("codec", StringType, nullable = false)))
  override protected def nullSafeEval(input: Any): Any =
    (try MediaKernels.probeMp4(input.asInstanceOf[Array[Byte]])
     catch { case _: Exception => None }) match {
      case Some(p) => InternalRow(true, UTF8String.fromString(p.brand),
        p.timescale, p.duration, p.nTracks, p.width, p.height,
        UTF8String.fromString(p.codec))
      case None => InternalRow(false, UTF8String.fromString(""), -1L, -1L,
        -1, -1, -1, UTF8String.fromString(""))
    }
  override protected def withNewChildInternal(newChild: Expression): ProbeMp4Expr =
    copy(child = newChild)
  override def prettyName: String = "probe_mp4"
}

/** `analyze_wav(bytes)` → STRUCT<ok, channels, sample_rate, bits,
  * n_samples, sum_samples, peak_abs>: RIFF/WAVE probe + PCM-16 stats. */
case class AnalyzeWavExpr(child: Expression) extends MediaStructExpr {
  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("sum_samples", LongType, nullable = false),
    StructField("peak_abs", LongType, nullable = false)))
  override protected def nullSafeEval(input: Any): Any = {
    val a = MediaKernels
      .analyzeWav(Seq((0L, input.asInstanceOf[Array[Byte]]))).head
    InternalRow(a.ok, a.channels, a.sampleRate, a.bitsPerSample,
      a.nSamples, a.sumSamples, a.peakAbs)
  }
  override protected def withNewChildInternal(newChild: Expression): AnalyzeWavExpr =
    copy(child = newChild)
  override def prettyName: String = "analyze_wav"
}

/** `avi_frame_lumas(bytes)` → STRUCT<ok, width, height, n_frames,
  * f0_luma, flast_luma>: the RIFF/AVI walk fused with the ImageIO luma
  * decode of the first and last sampled frame chunks — exactly the
  * multimodal_video_frames pipeline (sampleVideoFrames(n=2) followed by
  * a per-frame decodeImage), collapsed into one expression so neither
  * the frame byte arrays nor the intermediate case classes ever cross
  * an encoder boundary. Non-AVI bytes degrade to ok=false with -1
  * lumas (the declared query filters nothing and the synthetic corpus
  * is all-valid, so the degradation row shape is unobserved either
  * way). */
case class AviFrameLumasExpr(child: Expression) extends MediaStructExpr {
  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("f0_luma", DoubleType, nullable = false),
    StructField("flast_luma", DoubleType, nullable = false)))
  override protected def nullSafeEval(input: Any): Any = {
    val vf = MediaKernels
      .sampleAviFrames(Seq((0L, input.asInstanceOf[Array[Byte]])), n = 2).head
    if (!vf.ok || vf.frames.isEmpty)
      InternalRow(false, -1, -1, -1L, -1.0, -1.0)
    else {
      def luma(b: Array[Byte]): Double =
        MediaKernels.decodeImage(Seq((0L, b))).head.meanLuma
      InternalRow(true, vf.width, vf.height, vf.nFrames.toLong,
        luma(vf.frames.head), luma(vf.frames.last))
    }
  }
  override protected def withNewChildInternal(newChild: Expression): AviFrameLumasExpr =
    copy(child = newChild)
  override def prettyName: String = "avi_frame_lumas"
}
