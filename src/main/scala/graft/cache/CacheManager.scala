package graft.cache

import java.util.concurrent.{Executors, ScheduledExecutorService, ScheduledFuture, TimeUnit}
import scala.util.matching.Regex

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.TemplatePipeline
import graft.config.{CacheConfig, EndpointConfig}

/** Cache refresh orchestration — the Spark re-expression of the
  * reference's CacheManager + HeartbeatWorker
  * (/root/reference/src/cache_manager.cpp:58-139, heartbeat_worker.cpp).
  *
  * The reference renders a cache TEMPLATE into DuckLake DDL/DML
  * (CTAS / INSERT / MERGE) and executes it. Here the cache template
  * renders to the SOURCE SELECT (it may use `{{cache.*}}` context —
  * mode, snapshot ids, cursor column, cursor high-water — in Mustache
  * sections for incremental predicates) and the engine routes the
  * resulting DataFrame into [[SnapshotTable]] under the resolved mode.
  * Declarative select + engine-managed materialization is the
  * Spark-native equivalent of the textual CTAS: Catalyst still owns
  * pushdown/pruning of the source query, and the snapshot layer owns
  * atomicity.
  */
final class CacheManager(spark: SparkSession, warehouseRoot: String) {

  /** Warehouse root (config-tool introspection). */
  def warehouse: String = warehouseRoot

  // ---- C1: mode resolution (cache_manager.cpp:134-139) ------------------
  def determineMode(c: CacheConfig): String =
    if (!c.hasCursor) "full"
    else if (c.hasPrimaryKey) "merge"
    else "append"

  // one SnapshotTable INSTANCE per (schema, table): the table's
  // refresh methods synchronize on the instance, so concurrent
  // refreshes (refresh-on-write racing the scheduler or a config-tool
  // trigger) serialize instead of colliding on the same snapshot id
  private val tableInstances =
    scala.collection.concurrent.TrieMap.empty[(String, String), SnapshotTable]

  def table(c: CacheConfig): SnapshotTable =
    tableInstances.getOrElseUpdate((c.schema, c.table), buildTable(c))

  private def buildTable(c: CacheConfig): SnapshotTable =
    new SnapshotTable(spark, s"$warehouseRoot/${c.schema}", c.table)

  // ---- C2/C9: {{cache.*}} parameter injection ---------------------------
  /** Build the cache params the reference injects
    * (cache_manager.cpp:74-105), plus `cursorLastValue` — the cursor
    * high-water mark from the live snapshot, which incremental
    * templates use as `WHERE {{cache.cursorColumn}} >
    * {{cache.cursorLastValue}}`. */
  def cacheParams(c: CacheConfig, t: SnapshotTable): Map[String, String] = {
    val base = Map(
      "cacheCatalog" -> "graft",
      "cacheSchema" -> c.schema,
      "cacheTable" -> c.table,
      "cacheMode" -> determineMode(c))
    val sched = c.schedule.map("cacheSchedule" -> _)
    val snaps = t.latestTwo() match {
      case Seq() => Map.empty[String, String]
      case Seq((id, ts)) =>
        Map("cacheSnapshotId" -> id.toString, "cacheSnapshotTimestamp" -> ts.toString)
      case Seq((id, ts), (pid, pts), _*) =>
        Map("cacheSnapshotId" -> id.toString, "cacheSnapshotTimestamp" -> ts.toString,
          "previousSnapshotId" -> pid.toString, "previousSnapshotTimestamp" -> pts.toString)
    }
    val cursor = c.cursor.map { cur =>
      Map("cursorColumn" -> cur.column, "cursorType" -> cur.tpe) ++
        cursorHighWater(t, cur.column).map("cursorLastValue" -> _)
    }.getOrElse(Map.empty)
    val pks =
      if (c.hasPrimaryKey) Map("primaryKeys" -> c.primaryKeys.mkString(","))
      else Map.empty[String, String]
    base ++ sched ++ snaps ++ cursor ++ pks
  }

  /** max(cursor) over the live snapshot — absent on first refresh. */
  private def cursorHighWater(t: SnapshotTable, column: String): Option[String] =
    t.currentSnapshotId.flatMap { _ =>
      val row = t.read().agg(max(col(column))).collect().head
      if (row.isNullAt(0)) None else Some(row.get(0).toString)
    }

  // ---- C2: refresh ------------------------------------------------------
  /** Render the endpoint's cache template with `{{cache.*}}` context,
    * run it, and materialize under the resolved mode. Records a sync
    * event either way (C8). Returns the new snapshot id. */
  def refresh(
      endpoint: EndpointConfig,
      cacheTemplate: String,
      params: Map[String, String] = Map.empty,
      connProps: Map[String, String] = Map.empty): Long = {
    val c = endpoint.cache
    require(c.enabled && c.table.nonEmpty, s"${endpoint.urlPath}: cache not enabled")
    val t = table(c)
    val mode = determineMode(c)
    try {
      // system-initiated render: the cache template binds cache.* and
      // conn.* context, not user request params — the endpoint's
      // request-field requirements must not apply (a required REST
      // param would otherwise block every scheduled/boot refresh)
      val sysEndpoint = endpoint.copy(
        requestFields = Nil, requestFieldsValidation = false)
      val df0 = TemplatePipeline.run(spark, sysEndpoint, cacheTemplate,
        params ++ cacheParams(c, t), connProps)
      // optional z-order layout (C-layout): physical placement only —
      // the row set is untouched, so every downstream read/gate is
      // unaffected while filtered scans prune to a band of files
      val df = c.zorderBy match {
        case Seq(x, y) => graft.operators.ZOrderLayout(df0, x, y)
        case Nil => df0
        case other => throw new IllegalArgumentException(
          s"${endpoint.urlPath}: zorder-by needs exactly 2 columns, got $other")
      }
      val id = mode match {
        case "full" => t.refreshFull(df)
        case "append" => t.refreshAppend(df)
        case "merge" => t.refreshMerge(df, c.primaryKeys)
      }
      recordSyncEvent(endpoint, c, mode, "success", "Cache refreshed successfully")
      // ORDER MATTERS: swap the serve view to the new snapshot and drop
      // cached plans BEFORE expiring old snapshot dirs — a read landing
      // between an expire and the view swap would scan deleted files
      registerServeView(c)
      graft.api.PlanCache.invalidateAll()
      c.retention.keepLastSnapshots.foreach(t.expireSnapshots)
      id
    } catch {
      case e: Exception =>
        recordSyncEvent(endpoint, c, mode, "error", String.valueOf(e.getMessage))
        throw e
    }
  }

  /** Catalog view `<schema>.<table>` over the current snapshot, so
    * serve-time read templates query `{{cache.schema}}.{{cache.table}}`
    * exactly like the reference's DuckLake-attached tables (the serving
    * shell injects the cache namespace per
    * cache_manager.cpp:addQueryCacheParamsIfNecessary). Re-registered
    * after every refresh; the plan-cache generation bump right after
    * guarantees no stale plan survives the swap. */
  private def registerServeView(c: CacheConfig): Unit = {
    val dirs = table(c).currentDataDirs
    if (dirs.nonEmpty) {
      spark.sql(s"CREATE DATABASE IF NOT EXISTS `${c.schema}`")
      // A positional UNION ALL breaks the moment a schema-widening
      // merge leaves narrow untouched dirs next to the widened rewrite
      // (column counts differ). Project every arm to the MERGED column
      // list instead, NULL-filling each dir's missing columns — the
      // view then serves union-by-name semantics identical to
      // SnapshotTable.read's mergeSchema read.
      val merged = spark.read.option("mergeSchema", "true")
        .parquet(dirs: _*).schema
      val body = dirs.map { d =>
        val have = spark.read.parquet(d).schema.fieldNames.toSet
        val cols = merged.fields.map { f =>
          if (have(f.name)) s"`${f.name}`"
          else s"CAST(NULL AS ${f.dataType.sql}) AS `${f.name}`"
        }.mkString(", ")
        s"SELECT $cols FROM parquet.`$d`"
      }.mkString(" UNION ALL ")
      spark.sql(s"CREATE OR REPLACE VIEW `${c.schema}`.`${c.table}` AS $body")
    }
  }

  // ---- C7: warmup -------------------------------------------------------
  /** Refresh every cache-enabled endpoint once (boot-time warmup;
    * cache_manager.cpp:23-40). `templates` resolves an endpoint's
    * cache template source. */
  def warmUp(endpoints: Seq[EndpointConfig], templates: EndpointConfig => String): Unit =
    endpoints.filter(e => e.cache.enabled && e.cache.table.nonEmpty)
      .foreach(e => refresh(e, templates(e)))

  // ---- scheduled compaction (heartbeat_worker.cpp:121-158) --------------
  /** Merge each cache-enabled endpoint's snapshot files — the
    * reference's daily `ducklake_merge_adjacent_files` walk
    * (performDuckLakeCompaction): per-table errors are recorded in the
    * sync-event audit and swallowed so the walk continues; tables with
    * no snapshot yet are skipped. The serve view swaps to the compacted
    * snapshot and cached plans drop, in that order (the refresh()
    * discipline). Returns the number of tables compacted. */
  def compactAll(endpoints: Seq[EndpointConfig], targetFiles: Int = 1): Int = {
    var done = 0
    endpoints.filter(e => e.cache.enabled && e.cache.table.nonEmpty).foreach { e =>
      val c = e.cache
      try {
        // needs-compaction guard (r10 review): an already-merged table
        // is a NO-OP — without it the daily walk pays a full rewrite
        // per table per day, drops every endpoint's cached plans, and
        // burns a keepLastSnapshots retention slot on an empty change
        if (table(c).currentSnapshotId.isDefined &&
            table(c).liveFileCount > targetFiles) {
          table(c).compact(targetFiles)
          registerServeView(c)
          recordSyncEvent(e, c, "compaction", "success", "Merged adjacent files")
          done += 1
        }
      } catch {
        case ex: Exception =>
          recordSyncEvent(e, c, "compaction", "error", String.valueOf(ex.getMessage))
      }
    }
    // one plan-cache drop for the whole maintenance pass (r10 ADVICE:
    // the per-table invalidateAll inside the walk dropped every
    // endpoint's cached plans N times for one pass); the per-table
    // serve-view swap above already re-points reads at the compacted
    // snapshot before any plan could recompile against it
    if (done > 0) graft.api.PlanCache.invalidateAll()
    done
  }

  // ---- C8: sync-event audit table ---------------------------------------
  private def auditDir = s"$warehouseRoot/audit/sync_events"

  def recordSyncEvent(endpoint: EndpointConfig, c: CacheConfig,
                      syncType: String, status: String, message: String): Unit = {
    import spark.implicits._
    Seq((java.util.UUID.randomUUID().toString, endpoint.urlPath, c.table,
        syncType, status, message, new java.sql.Timestamp(System.currentTimeMillis())))
      .toDF("event_id", "endpoint", "table_name", "sync_type", "status", "message", "created_at")
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(auditDir)
  }

  def syncEvents(): DataFrame = spark.read.parquet(auditDir)
}

/** C6: interval-scheduled refresh — `schedule: 5m`-style config parsed
  * with the reference's regex (cache_manager.cpp:340-366) and run on a
  * single daemon scheduler thread (heartbeat_worker.cpp:56-117). */
object RefreshScheduler {
  private val IntervalRe: Regex = """(\d+)\s*([smhd])""".r

  /** "90s" / "5m" / "2h" / "1d" → seconds. */
  def parseIntervalSeconds(s: String): Option[Long] = s.trim match {
    case IntervalRe(n, unit) =>
      val mult = unit match {
        case "s" => 1L; case "m" => 60L; case "h" => 3600L; case "d" => 86400L
      }
      Some(n.toLong * mult)
    case _ => None
  }
}

final class RefreshScheduler(manager: CacheManager) {
  private val exec: ScheduledExecutorService =
    Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-cache-refresh"); t.setDaemon(true); t
    })
  @volatile private var tasks: List[ScheduledFuture[_]] = Nil

  /** Schedule every endpoint with `cache.schedule`; malformed intervals
    * are skipped (the reference logs and continues). Also schedules the
    * daily compaction walk (heartbeat_worker.cpp:121-123
    * shouldRunCompaction: every 24h) — `compactionEvery` takes the same
    * "1d"/"12h" interval grammar, None disables it. Returns the number
    * of refresh tasks scheduled (compaction is infrastructure, not an
    * endpoint task). */
  def start(endpoints: Seq[EndpointConfig], templates: EndpointConfig => String,
      compactionEvery: Option[String] = Some("1d")): Int = {
    val scheduled = for {
      e <- endpoints
      if e.cache.enabled && e.cache.table.nonEmpty
      spec <- e.cache.schedule
      secs <- RefreshScheduler.parseIntervalSeconds(spec)
    } yield exec.scheduleAtFixedRate(
      () => try manager.refresh(e, templates(e))
            catch { case _: Exception => () }, // recorded by the audit table
      secs, secs, TimeUnit.SECONDS)
    val compaction = for {
      spec <- compactionEvery.toList
      secs <- RefreshScheduler.parseIntervalSeconds(spec)
    } yield exec.scheduleAtFixedRate(
      () => try { manager.compactAll(endpoints); () }
            catch { case _: Exception => () }, // per-table errors audited
      secs, secs, TimeUnit.SECONDS)
    tasks = (scheduled ++ compaction).toList
    scheduled.size
  }

  def stop(): Unit = { tasks.foreach(_.cancel(false)); exec.shutdown() }
}
