package graft.server

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

import graft.streaming.Streaming

/** One configured drift monitor (the `monitors:` block of the project
  * yaml — see [[GraftBootstrap.parseProject]]). `source` is a parquet
  * directory the monitor streams (the cursor-append/crawl-drop layout
  * every ingest stream in this engine consumes); `checkpoint` owns the
  * stream offsets AND the [[graft.streaming.BatchLedger]] payload that
  * carries the monitor's whole standing state, so the verdict survives
  * any restart. The reference has no stream engine — this is the
  * Spark-native extension of its scheduled-refresh model (SURVEY
  * §2.12), promoted from library code to served product the same way
  * the r12 scan-budget rule was. */
final case class MonitorConfig(
    name: String,
    tpe: String, // psi | cusum | srm | quantile
    source: String,
    checkpoint: String,
    typeCol: String = "event_type",
    tsCol: String = "ts",
    userCol: String = "user_id",
    /** quantile only: the value column the digest summarizes. */
    valueCol: String = "n_chars",
    /** embedding only: label + vector columns. */
    labelCol: String = "label",
    vecCol: String = "embedding",
    /** embedding only: parquet dir of the known-good window whose
      * per-label centroids freeze as the baseline (computed once at
      * manager construction — one aggregation job, boot-warmup cost). */
    baselineFrom: String = "",
    /** PSI: the frozen known-good mix (type -> count);
      * quantile: the frozen baseline deciles (decile "1".."9" -> value). */
    baseline: Map[String, Long] = Map.empty,
    /** PSI only: trailing event-time days scored as "recent". */
    trailingWindows: Int = 7,
    /** CUSUM only: event-time hours kept un-folded. */
    horizonHours: Int = 720,
    /** quantile only: when non-empty, each drained batch's digest is
      * persisted there in the stored-summary parquet form and the
      * standing digest rebuilds through the `qdigest_merge` SQL
      * aggregate — the stored-artifact deployment path running in the
      * served product (yaml key `summary-store`). */
    summaryStore: String = "") {
  /** The quantile monitor's baseline, keys parsed as decile indices. */
  def baselineDeciles: Map[Int, Long] =
    baseline.map { case (k, v) => k.trim.toInt -> v }
}

/** A monitor's latest standing verdict as the serving surface reports
  * it. `stats` keys depend on the type: psi → psi_micro_cumulative /
  * psi_micro_windowed; cusum → peak; srm → control / treatment;
  * quantile → drift_ppm_cumulative / drift_ppm_windowed; embedding →
  * drift_u6. */
final case class MonitorVerdict(
    name: String,
    tpe: String,
    batchId: Long,
    alert: Boolean,
    stats: Map[String, Long],
    updatedAtMs: Long) {
  def toJson: String = {
    import MonitorVerdict.esc
    val statJson = stats.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":$v""" }.mkString("{", ",", "}")
    s"""{"name":"${esc(name)}","type":"${esc(tpe)}","batch_id":$batchId,""" +
      s""""alert":$alert,"stats":$statJson,"updated_at_ms":$updatedAtMs}"""
  }
}

object MonitorVerdict {
  private[server] def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
}

/** Runs the streaming monitor trio (PSI mix drift, CUSUM rate drift,
  * SRM assignment drift) as SERVED infrastructure: [[drain]] runs one
  * catch-up pass per monitor (Trigger.AvailableNow — the production
  * cadence of every ingest stream here: run per crawl drop, resume
  * from the checkpoint), live callbacks land each absorbed batch's
  * verdict in the registry, and [[seed]] recovers every standing
  * verdict from the persisted ledger payloads WITHOUT running a
  * stream — so a freshly restarted server serves the last verdict
  * immediately, even before (or without) its first drain. The server
  * exposes [[toJson]] on `GET /mcp/monitors` (read-only statistics,
  * the health/metrics auth policy).
  *
  * PSI alert rule: the WINDOWED statistic over the conventional 0.25
  * "shifted" threshold (250 000 micro-units) — the cumulative value is
  * reported alongside but does not gate, because it dilutes late
  * drift (the r12 verdict's design-debt finding; the windowed monitor
  * exists to fix exactly that). CUSUM/SRM alert rules are the
  * monitors' own deterministic verdicts.
  *
  * 100 TB shape: per drain, each monitor does one batch-sized
  * aggregation per micro-batch plus an O(types·K)/O(horizon)/O(1)
  * driver fold; standing state is ledger-payload-sized (bounded by
  * type/window/horizon/sketch cardinality, never stream age or
  * volume). The registry holds |monitors| small records. */
final class MonitorManager(spark: SparkSession, configs: Seq[MonitorConfig]) {

  private val verdicts = new ConcurrentHashMap[String, MonitorVerdict]()

  // per-monitor drain failure counter, surfaced on /mcp/metrics (r13
  // verdict #5): a permanently-failing source is an OBSERVABLE gauge,
  // not just a stderr line. Never reset — operators watch the rate.
  private val drainErrors = new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  private def bumpDrainError(name: String): Unit = {
    drainErrors.computeIfAbsent(name,
      _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
    ()
  }

  // per-monitor SOURCE schema, inferred once and cached (r13 verdict
  // #5: re-inferring per drain tick is a directory listing per monitor
  // per tick). computeIfAbsent — a source that does not exist yet at
  // construction simply retries on the next drain tick and caches on
  // first success (the ingest dir may be created by the first crawl
  // drop AFTER boot).
  private val schemaCache = new ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()
  private def sourceSchema(source: String): org.apache.spark.sql.types.StructType =
    schemaCache.computeIfAbsent(source, s => spark.read.parquet(s).schema)

  configs.foreach { c =>
    require(Set("psi", "cusum", "srm", "quantile", "embedding").contains(c.tpe),
      s"monitor '${c.name}': unknown type '${c.tpe}' (psi|cusum|srm|quantile|embedding)")
    if (c.tpe == "psi") require(c.baseline.values.sum > 0,
      s"monitor '${c.name}': psi needs a non-empty baseline")
    if (c.tpe == "quantile") require(c.baselineDeciles.nonEmpty,
      s"monitor '${c.name}': quantile needs baseline deciles (keys 1..9)")
    if (c.tpe == "embedding") require(c.baselineFrom.nonEmpty,
      s"monitor '${c.name}': embedding needs baseline-from (a parquet dir)")
  }

  // frozen per-label centroids, computed ONCE (boot-warmup cost — one
  // aggregation job over the known-good window per embedding monitor).
  // GUARDED per monitor: a missing/unreadable baseline dir must not
  // abort the whole boot — that would cost every endpoint and every
  // OTHER monitor's ledger-seeded verdict (review catch; the same
  // per-monitor failure isolation seed()/drain() enforce). A monitor
  // whose baseline failed is skipped with a logged reason.
  private val embeddingBaselines: Map[String, Map[String, (Long, Array[Long])]] =
    configs.filter(_.tpe == "embedding").flatMap { c =>
      try Some(c.name -> Streaming.embeddingBaseline(
        spark.read.parquet(c.baselineFrom), c.labelCol, c.vecCol))
      catch { case e: Exception =>
        System.err.println(
          s"[monitors] baseline for '${c.name}' failed (${c.baselineFrom}): ${e.getMessage}")
        None
      }
    }.toMap

  private def record(name: String, tpe: String, batchId: Long,
      alert: Boolean, stats: Map[String, Long]): Unit = {
    verdicts.put(name, MonitorVerdict(name, tpe, batchId, alert, stats,
      System.currentTimeMillis()))
    ()
  }

  /** Recover every monitor's standing verdict from its persisted
    * ledger state (no stream runs). Monitors whose checkpoint has
    * never committed a batch stay absent from the registry. */
  def seed(): Unit = configs.foreach { c =>
    try c.tpe match {
      case "psi" =>
        Streaming.windowedPsiStanding(spark, c.checkpoint, c.baseline)
          .foreach { case (id, cum, win, _) =>
            record(c.name, "psi", id, win > 250000L,
              Map("psi_micro_cumulative" -> cum, "psi_micro_windowed" -> win))
          }
      case "cusum" =>
        Streaming.cusumStanding(spark, c.checkpoint).foreach {
          case (id, peak, det) =>
            record(c.name, "cusum", id, det, Map("peak" -> peak))
        }
      case "srm" =>
        Streaming.srmStanding(spark, c.checkpoint).foreach {
          case (id, ctl, trt, det) =>
            record(c.name, "srm", id, det,
              Map("control" -> ctl, "treatment" -> trt))
        }
      case "quantile" =>
        Streaming.quantileStanding(spark, c.checkpoint, c.baselineDeciles)
          .foreach { case (id, dc, dw, det) =>
            record(c.name, "quantile", id, det,
              Map("drift_ppm_cumulative" -> dc, "drift_ppm_windowed" -> dw))
          }
      case "embedding" =>
        embeddingBaselines.get(c.name).foreach { b =>
          Streaming.embeddingDriftStanding(spark, c.checkpoint, b)
            .foreach { case (id, drift, det) =>
              record(c.name, "embedding", id, det, Map("drift_u6" -> drift))
            }
        }
    } catch { case e: Exception =>
      System.err.println(s"[monitors] seed '${c.name}' failed: ${e.getMessage}")
    }
  }

  /** One catch-up pass per monitor: stream whatever landed in each
    * source since the checkpoint, absorb it, update the registry.
    * Blocking (the boot path runs it once, like cache warmup);
    * failures are per-monitor and logged — one bad source must not
    * take down serving. */
  def drain(timeoutMs: Long = 300000): Unit = configs.foreach { c =>
    try {
      val stream = spark.readStream.schema(sourceSchema(c.source)).parquet(c.source)
      val q = c.tpe match {
        case "psi" =>
          Streaming.windowedPsiMonitorStream(stream, c.checkpoint,
            c.baseline, c.typeCol, c.tsCol, c.trailingWindows) {
            (id, cum, win, _) =>
              record(c.name, "psi", id, win > 250000L,
                Map("psi_micro_cumulative" -> cum, "psi_micro_windowed" -> win))
          }
        case "cusum" =>
          Streaming.cusumMonitorStream(stream, c.checkpoint,
            c.tsCol, c.horizonHours) { (id, peak, det) =>
            record(c.name, "cusum", id, det, Map("peak" -> peak))
          }
        case "srm" =>
          Streaming.srmMonitorStream(stream, c.checkpoint, c.userCol) {
            (id, ctl, trt, det) =>
              record(c.name, "srm", id, det,
                Map("control" -> ctl, "treatment" -> trt))
          }
        case "quantile" =>
          Streaming.quantileMonitorStream(stream, c.checkpoint,
            c.baselineDeciles, c.valueCol,
            summaryStore = Some(c.summaryStore).filter(_.nonEmpty)) {
            (id, dc, dw, det) =>
              record(c.name, "quantile", id, det,
                Map("drift_ppm_cumulative" -> dc, "drift_ppm_windowed" -> dw))
          }
        case "embedding" =>
          val b = embeddingBaselines.getOrElse(c.name,
            throw new IllegalStateException(
              s"monitor '${c.name}': baseline unavailable — skipping drain"))
          Streaming.embeddingDriftMonitorStream(stream, c.checkpoint,
            b, c.labelCol, c.vecCol) { (id, drift, det) =>
            record(c.name, "embedding", id, det, Map("drift_u6" -> drift))
          }
      }
      try {
        if (!q.awaitTermination(timeoutMs)) {
          bumpDrainError(c.name)
          System.err.println(s"[monitors] drain '${c.name}' timed out")
        }
      } finally if (q.isActive) q.stop()
    } catch { case e: Exception =>
      bumpDrainError(c.name)
      System.err.println(s"[monitors] drain '${c.name}' failed: ${e.getMessage}")
    }
  }

  def snapshot: Seq[MonitorVerdict] = {
    import scala.jdk.CollectionConverters._
    verdicts.values.asScala.toSeq.sortBy(_.name)
  }

  /** `{"<name>": <drain error count>, ...}` over ALL configured
    * monitors (zero when never failed) — the /mcp/metrics gauge. */
  def drainErrorsJson: String =
    configs.map { c =>
      val n = Option(drainErrors.get(c.name)).map(_.get()).getOrElse(0L)
      s""""${MonitorVerdict.esc(c.name)}":$n"""
    }.mkString("{", ",", "}")

  // ---- scheduled drains ----------------------------------------------------
  // Boot-only drains leave a served monitor whose verdict never moves
  // until the next restart — the scheduler is the crank that keeps the
  // /mcp/monitors surface current as new crawl drops land (the
  // RefreshScheduler discipline: a daemon thread, interval-paced,
  // failures logged per tick and never fatal to serving).
  @volatile private var schedulerThread: Option[Thread] = None
  // interrupt alone cannot stop the loop: an interrupt landing DURING
  // drain() is swallowed by its per-monitor catch (clearing the flag),
  // so the loop would keep re-draining after server shutdown — and a
  // replacement server in the same JVM would then run a second
  // streaming query against the SAME checkpoints (review catch). The
  // explicit flag is the authoritative stop signal.
  @volatile private var schedulerStop = false

  /** Re-drain every monitor each `intervalSeconds` until [[stop]].
    * Idempotent: a second start is a no-op while one runs. */
  def startScheduler(intervalSeconds: Int): Unit = synchronized {
    require(intervalSeconds > 0, "drain interval must be positive")
    if (schedulerThread.isEmpty) {
      schedulerStop = false
      val t = new Thread(() => {
        try {
          while (!schedulerStop) {
            Thread.sleep(intervalSeconds * 1000L)
            if (!schedulerStop)
              try drain()
              catch { case e: Exception =>
                System.err.println(s"[monitors] scheduled drain failed: ${e.getMessage}")
              }
          }
        } catch { case _: InterruptedException => () }
      }, "graft-monitor-drain")
      t.setDaemon(true)
      t.start()
      schedulerThread = Some(t)
    }
  }

  /** Stop the scheduler (server shutdown). Safe when never started. */
  def stop(): Unit = synchronized {
    schedulerStop = true
    schedulerThread.foreach(_.interrupt())
    schedulerThread = None
  }

  /** Configured monitors with no committed batch yet report
    * `batch_id: -1` rather than disappearing — an operator must see
    * the monitor EXISTS before its first data arrives. The placeholder
    * is the SAME MonitorVerdict shape, so the two JSON forms cannot
    * drift (review catch). */
  def toJson: String = {
    val rows = configs.map { c =>
      Option(verdicts.get(c.name)).getOrElse(
        MonitorVerdict(c.name, c.tpe, -1L, alert = false, Map.empty, 0L))
        .toJson
    }
    s"""{"monitors":[${rows.mkString(",")}]}"""
  }
}
