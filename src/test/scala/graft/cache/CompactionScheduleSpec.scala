package graft.cache

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.config.{CacheConfig, EndpointConfig}

/** Scheduled compaction parity (reference heartbeat_worker.cpp:121-158:
  * a daily walk merging adjacent files per cached table). compactAll is
  * the walk; RefreshScheduler.start wires it at the configured
  * interval next to the endpoint refresh tasks. */
class CompactionScheduleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var mgr: CacheManager = _

  private val ep = EndpointConfig(
    urlPath = "/compaction-probe",
    templateSource = "probe.sql",
    requestFieldsValidation = false,
    cache = CacheConfig(enabled = true, table = "compact_probe"))

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("compaction-schedule-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ss = spark
    import ss.implicits._
    (1L to 100L).map(i => (i, s"row_$i")).toDF("id", "name")
      .createOrReplaceTempView("compact_src")
    mgr = new CacheManager(spark,
      Files.createTempDirectory("graft_compact_sched").toString)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // REPARTITION hint: a tiny sorted result coalesces to one file,
  // which the needs-compaction guard would rightly skip — force the
  // fragmented layout the daily walk exists to merge
  private val template =
    "SELECT /*+ REPARTITION(4) */ id, name FROM compact_src"

  test("compactAll merges files, audits the event, and skips empty tables") {
    // a never-refreshed table is skipped, not an error
    assert(mgr.compactAll(Seq(ep)) == 0)
    mgr.refresh(ep, template)
    assert(mgr.table(ep.cache).liveFileCount > 1, "fixture should fragment")
    val before = mgr.table(ep.cache).read().orderBy("id").collect().toSeq
    // 4 shuffle partitions -> multiple files; compaction rewrites to 1
    assert(mgr.compactAll(Seq(ep)) == 1)
    val after = mgr.table(ep.cache).read().orderBy("id").collect().toSeq
    assert(after == before, "compaction must not change the row set")
    val events = mgr.syncEvents()
      .filter("sync_type = 'compaction'").collect()
    assert(events.exists(_.getAs[String]("status") == "success"),
      events.mkString(","))
    // the compacted snapshot is current and readable through the view
    assert(mgr.table(ep.cache).currentDataDirs.nonEmpty)
    // needs-compaction guard: a second walk over the merged table is a
    // NO-OP — no rewrite, no new snapshot, no burned retention slot
    val snapBefore = mgr.table(ep.cache).currentSnapshotId
    assert(mgr.compactAll(Seq(ep)) == 0)
    assert(mgr.table(ep.cache).currentSnapshotId == snapBefore,
      "no-op compaction must not publish a snapshot")
  }

  test("scheduler drives the compaction walk at the configured interval") {
    // re-fragment the table (the previous test merged it to one file)
    mgr.refresh(ep, template)
    assert(mgr.table(ep.cache).liveFileCount > 1, "fixture should fragment")
    val scheduler = new RefreshScheduler(mgr)
    try {
      val countBefore = mgr.syncEvents()
        .filter("sync_type = 'compaction'").count()
      // no endpoint has cache.schedule, so refresh-task count is 0 —
      // the compaction task still schedules (infrastructure task)
      assert(scheduler.start(Seq(ep), _ => template,
        compactionEvery = Some("1s")) == 0)
      val deadline = System.currentTimeMillis() + 15000
      var after = countBefore
      while (after <= countBefore && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        after = mgr.syncEvents().filter("sync_type = 'compaction'").count()
      }
      assert(after > countBefore,
        s"scheduled compaction never fired ($countBefore -> $after)")
    } finally scheduler.stop()
  }

  test("interval grammar covers the reference's daily default") {
    assert(RefreshScheduler.parseIntervalSeconds("1d").contains(86400L))
    assert(RefreshScheduler.parseIntervalSeconds("12h").contains(43200L))
    assert(RefreshScheduler.parseIntervalSeconds("nope").isEmpty)
  }
}
