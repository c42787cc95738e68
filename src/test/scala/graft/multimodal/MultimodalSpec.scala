package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: schema, batch shape, determinism, fixed-size
  * resize, frame sampling. */
class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("multimodal-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def sampleMedia() = {
    val ss = spark
    import ss.implicits._
    Multimodal.mediaFromText(
      (0 until 10).map(i => (i.toLong, s"doc-$i-payload")).toDF("doc_id", "text"),
      "doc_id", "text")
  }

  test("media schema: opaque binary + typed metadata struct") {
    val m = sampleMedia()
    val f = m.schema("bytes")
    assert(f.dataType.typeName == "binary")
    val meta = m.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Seq("kind", "width", "height", "sampleRate"))
  }

  test("feature extraction is deterministic and batch-shaped") {
    val out = Multimodal.extractFeatures(spark, sampleMedia(), batchSize = 3)
      .collect().sortBy(_.id)
    assert(out.length == 10)
    val r0 = out.head
    assert(r0.nBytes == "doc-0-payload".length)
    assert(r0.f1 == 'd'.toDouble)
    assert(r0.f2 == 'd'.toDouble)
    // batch size must not change results (pure kernel over batches)
    val big = Multimodal.extractFeatures(spark, sampleMedia(), batchSize = 1000)
      .collect().sortBy(_.id)
    assert(out.toSeq == big.toSeq)
  }

  test("kernel sees bounded batches") {
    val batches = (1 to 10).grouped(3).map(_.size).toSeq
    assert(batches == Seq(3, 3, 3, 1)) // grouped() contract the loop relies on
    val fed = MediaKernels.decodeStub(Seq((1L, Array[Byte](65, 66))))
    assert(fed.head.f1 == 65.0 && fed.head.f2 == 66.0)
  }

  test("real ImageIO decode recovers dimensions and channel mean from PNG bytes") {
    val ss = spark
    import ss.implicits._
    val media = Seq(5L, 12L, 300L)
      .toDS().map(id => (id, MediaKernels.syntheticPng(id)))
      .toDF("id", "bytes")
    val out = Multimodal.decodeImages(spark, media).collect().sortBy(_.id)
    assert(out.forall(_.ok))
    assert(out.map(f => (f.id, f.width, f.height, f.meanLuma)).toSeq == Seq(
      (5L, 13, 13, 5.0), (12L, 20, 12, 12.0), (300L, 20, 12, 44.0)))
  }

  test("corrupt bytes degrade to an ok=false row, not a task failure") {
    val ss = spark
    import ss.implicits._
    val media = Seq(
      (1L, MediaKernels.syntheticPng(1L)),
      (2L, Array[Byte](1, 2, 3, 4, 5)),        // garbage
      (3L, Array.emptyByteArray))              // empty blob
      .toDF("id", "bytes")
    val out = Multimodal.decodeImages(spark, media).collect().sortBy(_.id)
    assert(out.map(f => (f.id, f.ok)).toSeq == Seq((1L, true), (2L, false), (3L, false)))
    val bad = out.filter(!_.ok)
    assert(bad.forall(f => f.width == -1 && f.height == -1))
  }

  test("resize stub yields fixed-size blobs") {
    val resized = Multimodal.resizeStub(sampleMedia(), target = 8)
      .select("bytes").collect().map(_.getAs[Array[Byte]](0))
    assert(resized.forall(_.length == 8))
  }

  test("frame sample emits n slices per row") {
    val frames = Multimodal.frameSample(sampleMedia(), n = 4, frameBytes = 4)
      .select("frames").collect().map(_.getSeq[Array[Byte]](0))
    assert(frames.forall(_.size == 4))
    assert(frames.forall(_.forall(_.length <= 4)))
  }

  test("AVI probe reads geometry and frame chunks from real container bytes") {
    val avi = MediaKernels.syntheticAvi(12L) // nf=2, w=20, h=12
    val p = MediaKernels.probeAvi(avi)
    assert(p.isDefined)
    assert(p.get.width == 20 && p.get.height == 12)
    assert(p.get.totalFrames == 2 && p.get.frames.length == 2)
    assert(p.get.usPerFrame == 40000)
    // each extracted chunk is a decodable PNG with frame-i arithmetic
    val (off0, sz0) = p.get.frames.head
    val f0 = java.util.Arrays.copyOfRange(avi, off0, off0 + sz0)
    val dec = MediaKernels.decodeImage(Seq((0L, f0))).head
    assert(dec.ok && dec.width == 20 && dec.height == 12 && dec.meanLuma == 12.0)
  }

  test("AVI probe rejects non-container and truncated bytes, never throws") {
    assert(MediaKernels.probeAvi(Array.emptyByteArray).isEmpty)
    assert(MediaKernels.probeAvi("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    assert(MediaKernels.probeAvi(MediaKernels.syntheticPng(5L)).isEmpty)
    val truncated = MediaKernels.syntheticAvi(7L).take(40)
    assert(MediaKernels.probeAvi(truncated).isEmpty)
  }

  test("AVI probe terminates on malformed chunk sizes (negative u32)") {
    // corrupt the first LIST's size field to 0xFFFFFFF8 (-8 as Int):
    // before size validation this made the chunk walk advance by 0 —
    // a non-throwing infinite loop no catch could break
    val avi = MediaKernels.syntheticAvi(3L)
    avi(16) = 0xf8.toByte; avi(17) = 0xff.toByte
    avi(18) = 0xff.toByte; avi(19) = 0xff.toByte
    assert(MediaKernels.probeAvi(avi).isEmpty)
    // zero-size unknown chunks also advance (by the 8-byte header)
    val pad = "RIFF".getBytes("US-ASCII") ++ Array[Byte](100, 0, 0, 0) ++
      "AVI JUNK".getBytes("US-ASCII") ++ Array.fill[Byte](92)(0)
    assert(MediaKernels.probeAvi(pad).isEmpty)
  }

  test("WAV probe parses real RIFF/WAVE bytes and decodes PCM-16 samples") {
    val wav = MediaKernels.syntheticWav(5L) // 2 ch, 12000 Hz, n = 69*2
    val p = MediaKernels.probeWav(wav)
    assert(p.isDefined)
    assert(p.get.audioFormat == 1 && p.get.channels == 2)
    assert(p.get.sampleRate == 12000 && p.get.bitsPerSample == 16)
    assert(p.get.dataSize == 2 * 138)
    val stats = MediaKernels.analyzeWav(Seq((5L, wav))).head
    assert(stats.ok && stats.nSamples == 138)
    val expected = (0 until 138).map(i => (5 * 31 + i * 17) % 2001 - 1000)
    assert(stats.sumSamples == expected.sum)
    assert(stats.peakAbs == expected.map(math.abs).max)
  }

  test("WAV probe rejects non-audio, truncated, and malformed-size bytes") {
    assert(MediaKernels.probeWav(Array.emptyByteArray).isEmpty)
    assert(MediaKernels.probeWav(MediaKernels.syntheticAvi(3L)).isEmpty)
    assert(MediaKernels.probeWav(MediaKernels.syntheticWav(8L).take(30)).isEmpty)
    val wav = MediaKernels.syntheticWav(2L)
    wav(16) = 0xf8.toByte; wav(17) = 0xff.toByte // fmt size -> -8
    wav(18) = 0xff.toByte; wav(19) = 0xff.toByte
    assert(MediaKernels.probeWav(wav).isEmpty)
    // non-PCM-16 streams degrade at the analyze layer, not the probe
    val wav2 = MediaKernels.syntheticWav(2L)
    wav2(20) = 2 // audioFormat = ADPCM
    assert(MediaKernels.probeWav(wav2).isDefined)
    assert(!MediaKernels.analyzeWav(Seq((2L, wav2))).head.ok)
  }

  test("video frame sampling degrades per row and picks first/last") {
    val ss = spark
    import ss.implicits._
    val media = Seq(
      (9L, MediaKernels.syntheticAvi(9L)),     // nf = 2 + 9%3 = 2
      (10L, MediaKernels.syntheticAvi(10L)),   // nf = 3
      (11L, Array[Byte](9, 9, 9)))             // garbage
      .toDF("id", "bytes")
    val out = Multimodal.sampleVideoFrames(spark, media, n = 2)
      .collect().sortBy(_.id)
    assert(out.map(v => (v.id, v.ok, v.nFrames)).toSeq ==
      Seq((9L, true, 2), (10L, true, 3), (11L, false, -1)))
    // id 10: sampled frames are chunk 0 and chunk 2 (= last), whose
    // decoded lumas are (10+0)%256 and (10+2)%256
    val v10 = out.find(_.id == 10L).get
    val lumas = v10.frames.map(b => MediaKernels.decodeImage(Seq((0L, b))).head.meanLuma)
    assert(lumas == Seq(10.0, 12.0))
  }

  test("MP4 probe reads brand, movie header and video track from real box trees") {
    // id=14: even → version-0 mvhd; timescale 600*(1+14%3)=1800,
    // duration 1000+14=1014, tracks 1+14%2=1, geometry 30×30... w=16+14=30, h=16+14%16=30
    val p = MediaKernels.probeMp4(MediaKernels.syntheticMp4(14L))
    assert(p.isDefined, p)
    assert(p.get == MediaKernels.Mp4Probe("isom", 1800L, 1014L, 1, 30, 30, "avc1"))
    // id=13: odd → version-1 (64-bit) mvhd and a second 'soun' track;
    // the video track's geometry must still come from track 1
    val q = MediaKernels.probeMp4(MediaKernels.syntheticMp4(13L))
    assert(q.isDefined, q)
    assert(q.get == MediaKernels.Mp4Probe("isom", 1200L, 1013L, 2, 29, 29, "avc1"))
  }

  test("MP4 probe accepts a 64-bit largesize box and rejects a lying one") {
    val mp4 = MediaKernels.syntheticMp4(6L)
    // rewrite the trailing mdat (8+8 bytes) as size==1 + largesize==16:
    // spec-legal encoding the walk must traverse without desync
    val mdatOff = mp4.length - 16
    assert(new String(mp4, mdatOff + 4, 4, "US-ASCII") == "mdat")
    val big = mp4.clone()
    big(mdatOff) = 0; big(mdatOff + 1) = 0; big(mdatOff + 2) = 0; big(mdatOff + 3) = 1
    val withLarge = big.take(mdatOff + 8) ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 24) ++ big.drop(mdatOff + 8)
    assert(MediaKernels.probeMp4(withLarge).isDefined)
    // largesize overrunning the buffer must fail the whole probe
    val lying = withLarge.clone()
    lying(mdatOff + 15) = 127
    assert(MediaKernels.probeMp4(lying).isEmpty)
  }

  test("MP4 probe rejects non-BMFF and corrupt boxes, never throws or stalls") {
    assert(MediaKernels.probeMp4(Array.emptyByteArray).isEmpty)
    assert(MediaKernels.probeMp4(MediaKernels.syntheticAvi(3L)).isEmpty)
    assert(MediaKernels.probeMp4(MediaKernels.syntheticPng(5L)).isEmpty)
    assert(MediaKernels.probeMp4(MediaKernels.syntheticMp4(9L).take(40)).isEmpty)
    // corrupt the moov size to 7 (< header): must bail, not clamp
    val bad = MediaKernels.syntheticMp4(4L)
    bad(16) = 0; bad(17) = 0; bad(18) = 0; bad(19) = 7
    assert(MediaKernels.probeMp4(bad).isEmpty)
    // batch kernel degrades per-row: one corrupt blob, one ok=false row
    val out = MediaKernels.probeMp4Batch(Seq(
      (1L, MediaKernels.syntheticMp4(1L)), (2L, Array[Byte](1, 2, 3))))
    assert(out.map(m => m.id -> m.ok) == Seq(1L -> true, 2L -> false))
  }

  test("PNG probe walks real encoder output and verifies every chunk CRC") {
    for (id <- Seq(0L, 7L, 123L)) {
      val p = MediaKernels.probePng(MediaKernels.syntheticPng(id)).get
      assert(p.width == 8 + (id % 16).toInt && p.height == 8 + (id % 8).toInt)
      assert(p.bitDepth == 8 && p.colorType == 2 && p.interlace == 0)
      assert(p.chunks == "IHDR|IDAT|IEND" && p.crcOk)
    }
  }

  test("PNG probe degradation ladder: bad sig / truncation / lying length / CRC") {
    val good = MediaKernels.syntheticPng(5L)
    val badSig = good.clone(); badSig(0) = 0x00
    assert(MediaKernels.probePng(badSig).isEmpty, "wrong signature must reject")
    assert(MediaKernels.probePng(good.take(good.length - 6)).isEmpty,
      "truncation (no IEND reachable) must reject")
    // lying length on the first chunk: walk desynchronizes → reject
    val lying = good.clone(); lying(8) = 0x7f
    assert(MediaKernels.probePng(lying).isEmpty, "overflowing length must reject")
    // a flipped CRC byte parses (structure intact) but fails verification
    val badCrc = good.clone()
    badCrc(good.length - 2) = (badCrc(good.length - 2) ^ 0xff).toByte
    val p1 = MediaKernels.probePng(badCrc).get
    assert(!p1.crcOk && p1.width == 13, "flipped CRC byte must fail verify only")
    // bit-rot inside IDAT data: CRC catches what a decoder might not
    val rot = good.clone(); rot(60) = (rot(60) ^ 0x01).toByte
    assert(!MediaKernels.probePng(rot).get.crcOk, "payload bit-rot must fail CRC")
    // batch contract: corrupt rows degrade, good rows survive
    val out = MediaKernels.probePngBatch(Seq(
      (1L, MediaKernels.syntheticPng(1L)), (2L, Array[Byte](9, 9, 9))))
    assert(out.map(m => m.id -> m.ok) == Seq(1L -> true, 2L -> false))
  }
}
