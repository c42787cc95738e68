package graft.serialize

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Point-in-time Arrow serving metrics (reference arrow_metrics.hpp:
  * ArrowCounters + ArrowGauges + duration histogram mins/maxes). */
final case class ArrowMetricsSnapshot(
    totalRequests: Long, successfulRequests: Long, failedRequests: Long,
    totalBatches: Long, totalRows: Long,
    totalBytesWritten: Long, totalBytesCompressed: Long,
    compressionRequests: Long,
    activeStreams: Int, peakActiveStreams: Int,
    minDurationUs: Long, maxDurationUs: Long, totalDurationUs: Long) {

  def toJson: String =
    s"""{"total_requests":$totalRequests,"successful_requests":$successfulRequests,""" +
      s""""failed_requests":$failedRequests,"total_batches":$totalBatches,""" +
      s""""total_rows":$totalRows,"total_bytes_written":$totalBytesWritten,""" +
      s""""total_bytes_compressed":$totalBytesCompressed,""" +
      s""""compression_requests":$compressionRequests,""" +
      s""""active_streams":$activeStreams,"peak_active_streams":$peakActiveStreams,""" +
      s""""min_duration_us":${if (minDurationUs == Long.MaxValue) 0 else minDurationUs},""" +
      s""""max_duration_us":$maxDurationUs,"total_duration_us":$totalDurationUs}"""
}

/** Per-stream counters and gauges for the Arrow IPC sink (reference
  * /root/reference/src/include/arrow_metrics.hpp:22-46 — the r9
  * "Telemetry is start/stop-level only" parity gap). All-atomic,
  * contention-free on the serving path: [[ArrowWire.stream]] calls
  * streamStarted/batchWritten/streamfinished around its writer loop,
  * and the snapshot is served read-only (Telemetry / config surface).
  * Process-global like the reference's singleton registry. */
object ArrowMetrics {

  private val totalRequests = new AtomicLong
  private val successfulRequests = new AtomicLong
  private val failedRequests = new AtomicLong
  private val totalBatches = new AtomicLong
  private val totalRows = new AtomicLong
  private val totalBytesWritten = new AtomicLong   // pre-compression vector bytes
  private val totalBytesCompressed = new AtomicLong // bytes on the wire
  private val compressionRequests = new AtomicLong
  private val activeStreams = new AtomicInteger
  private val peakActiveStreams = new AtomicInteger
  private val minDurationUs = new AtomicLong(Long.MaxValue)
  private val maxDurationUs = new AtomicLong
  private val totalDurationUs = new AtomicLong

  private[serialize] def streamStarted(compressed: Boolean): Unit = {
    totalRequests.incrementAndGet()
    if (compressed) compressionRequests.incrementAndGet()
    val active = activeStreams.incrementAndGet()
    peakActiveStreams.accumulateAndGet(active, math.max)
    ()
  }

  private[serialize] def batchWritten(rows: Long, vectorBytes: Long): Unit = {
    totalBatches.incrementAndGet()
    totalRows.addAndGet(rows)
    totalBytesWritten.addAndGet(vectorBytes)
    ()
  }

  private[serialize] def streamFinished(
      ok: Boolean, wireBytes: Long, durationUs: Long): Unit = {
    activeStreams.decrementAndGet()
    if (ok) successfulRequests.incrementAndGet()
    else failedRequests.incrementAndGet()
    totalBytesCompressed.addAndGet(wireBytes)
    minDurationUs.accumulateAndGet(durationUs, math.min)
    maxDurationUs.accumulateAndGet(durationUs, math.max)
    totalDurationUs.addAndGet(durationUs)
    ()
  }

  def snapshot: ArrowMetricsSnapshot = ArrowMetricsSnapshot(
    totalRequests.get, successfulRequests.get, failedRequests.get,
    totalBatches.get, totalRows.get,
    totalBytesWritten.get, totalBytesCompressed.get,
    compressionRequests.get,
    activeStreams.get, peakActiveStreams.get,
    minDurationUs.get, maxDurationUs.get, totalDurationUs.get)

  /** Test isolation only — the serving process never resets. */
  def reset(): Unit = {
    Seq(totalRequests, successfulRequests, failedRequests, totalBatches,
      totalRows, totalBytesWritten, totalBytesCompressed,
      compressionRequests, maxDurationUs, totalDurationUs).foreach(_.set(0))
    minDurationUs.set(Long.MaxValue)
    activeStreams.set(0)
    peakActiveStreams.set(0)
  }
}
