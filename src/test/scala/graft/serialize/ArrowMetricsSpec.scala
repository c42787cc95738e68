package graft.serialize

import org.apache.arrow.vector.compression.CompressionUtil
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Arrow stream counters/gauges parity (reference arrow_metrics.hpp:
  * 22-46) — every [[ArrowWire.stream]] reports requests, batches,
  * rows, vector vs wire bytes, duration, and active/peak gauges.
  * No SparkSession needed: the wire sink takes plain Rows. */
class ArrowMetricsSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  private def rows(n: Int): Iterator[Row] =
    (1 to n).iterator.map(i => Row(i.toLong, s"row_$i"))

  test("a successful stream counts request, batches, rows, and both byte totals") {
    ArrowMetrics.reset()
    val bytes = ArrowWire.serialize(schema, rows(250), batchRows = 100)
    val s = ArrowMetrics.snapshot
    assert(s.totalRequests == 1 && s.successfulRequests == 1 && s.failedRequests == 0)
    assert(s.totalBatches == 3, s)   // 100 + 100 + 50
    assert(s.totalRows == 250, s)
    assert(s.totalBytesWritten > 0, s)
    assert(s.totalBytesCompressed == bytes.length.toLong, s)
    assert(s.compressionRequests == 0, s)
    assert(s.activeStreams == 0 && s.peakActiveStreams == 1, s)
    assert(s.maxDurationUs >= s.minDurationUs && s.totalDurationUs >= s.maxDurationUs, s)
  }

  test("compressed streams bump the compression counter and shrink wire bytes") {
    ArrowMetrics.reset()
    val plain = ArrowWire.serialize(schema, rows(5000))
    val packed = ArrowWire.serialize(schema, rows(5000),
      codec = Some(CompressionUtil.CodecType.ZSTD))
    val s = ArrowMetrics.snapshot
    assert(s.totalRequests == 2 && s.compressionRequests == 1, s)
    assert(packed.length < plain.length,
      s"compression did not shrink the wire: ${packed.length} vs ${plain.length}")
    assert(s.totalBytesCompressed == plain.length.toLong + packed.length.toLong, s)
  }

  test("a failed stream counts as failed and releases the active gauge") {
    ArrowMetrics.reset()
    val boom = new java.io.OutputStream {
      override def write(b: Int): Unit = throw new java.io.IOException("wire down")
    }
    intercept[Exception] {
      ArrowWire.stream(schema, rows(10), boom)
    }
    val s = ArrowMetrics.snapshot
    assert(s.totalRequests == 1 && s.failedRequests == 1 && s.successfulRequests == 0, s)
    assert(s.activeStreams == 0, s"active gauge leaked: $s")
  }

  test("snapshot serializes to the metrics-endpoint JSON shape") {
    ArrowMetrics.reset()
    ArrowWire.serialize(schema, rows(3))
    val j = ArrowMetrics.snapshot.toJson
    Seq("total_requests", "successful_requests", "total_batches",
      "total_rows", "active_streams", "peak_active_streams",
      "max_duration_us").foreach(k => assert(j.contains("\"" + k + "\":"), j))
  }
}
