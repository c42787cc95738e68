package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, QuerySet, Tables}
import graft.cache.{CacheManager, SnapshotTable}
import graft.config._

/** Correctness entries for the cache/snapshot layer (C1-C3, C9, C10,
  * S9): each query builds a fresh snapshot table from driver testdata,
  * runs full / append / merge refreshes through the CacheManager's
  * template path, and reads the result back — hash-compared against a
  * DuckDB oracle that recomputes the same final state directly from
  * the source parquet. Time travel reads the pre-append snapshot.
  */
object CacheQueries extends QuerySet {

  /** One build per (table, source-dir) per JVM: the gated queries time
    * the READ path — a parquet scan of the snapshot dirs — not the
    * build (r3 verdict: the timed region was delete-dir + two template
    * refreshes + manifest writes per invocation, which measures
    * materialization, not serving; a real deployment refreshes on a
    * schedule and serves many reads per build). The build still runs
    * inside the first (cold) invocation, so correctness covers it.
    */
  // keyed on the session object (SessionMemo): a second session in the
  // same JVM (test suites stop/rebuild sessions) must not receive a
  // table bound to a stopped session, and a fresh session can never
  // alias a GC'd one
  private val built = new graft.operators.SessionMemo[(String, String), SnapshotTable]()
  private def memo(s: SparkSession, tag: String, dir: String)(
      build: => SnapshotTable): SnapshotTable =
    built.getOrElseUpdate(s, (tag, dir))(build)

  private def freshRoot(tag: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_cache", tag)
    val dir = p.toFile
    if (dir.exists()) {
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
    }
    p.toString
  }

  private def ordersCols = Seq("o_orderkey", "o_custkey", "o_totalprice")

  /** full refresh via the cache template path, then append the next
    * cursor increment via {{cache.cursorLastValue}}. Returns the table
    * for reading at any version. */
  private def buildAppendTable(s: SparkSession, dir: String, tag: String): SnapshotTable = {
    Tables.register(s, dir)
    val mgr = new CacheManager(s, freshRoot(s"${tag}_${math.abs(dir.hashCode)}"))
    val cursorCfg = CacheConfig(enabled = true, table = "orders_cache",
      cursor = Some(CursorConfig("o_orderkey", "int")))
    val ep = EndpointConfig(urlPath = "/orders-cache", templateSource = "orders_cache.sql",
      cache = cursorCfg)
    // Incremental template: first run has no cursorLastValue (section
    // falsy) → full slice; later runs append strictly-after rows.
    val template =
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderkey <= {{conn.upper_bound}}
        |{{#cache.cursorLastValue}}
        |  AND o_orderkey > {{cache.cursorLastValue}}
        |{{/cache.cursorLastValue}}""".stripMargin
    mgr.refresh(ep, template, connProps = Map("upper_bound" -> "1000"))
    mgr.refresh(ep, template, connProps = Map("upper_bound" -> "2000"))
    mgr.table(cursorCfg)
  }

  // S9 + C2 (full): CTAS-equivalent materialization, read back.
  private val cacheFull = QueryDef(
    "cache_full_read",
    Some("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
           |FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""".stripMargin),
    (s, dir) => {
      val t = memo(s, "full", dir) {
        Tables.register(s, dir)
        val mgr = new CacheManager(s, freshRoot(s"full_${math.abs(dir.hashCode)}"))
        val cfg = CacheConfig(enabled = true, table = "orders_full")
        val ep = EndpointConfig(urlPath = "/orders-full",
          templateSource = "orders_full.sql", cache = cfg)
        mgr.refresh(ep,
          "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey <= 1000")
        mgr.table(cfg)
      }
      t.read()
        .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("price"))
        .orderBy("o_orderkey")
    })

  // C2 (append): cursor increment lands as new files only; the read is
  // the union of the chained snapshot dirs.
  private val cacheAppend = QueryDef(
    "cache_append_read",
    Some("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
           |FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin),
    (s, dir) =>
      memo(s, "append", dir)(buildAppendTable(s, dir, "append")).read()
        .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("price"))
        .orderBy("o_orderkey"))

  // C10 (time travel): the pre-append snapshot is still readable.
  private val cacheTravel = QueryDef(
    "cache_time_travel",
    Some("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
           |FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey""".stripMargin),
    (s, dir) =>
      memo(s, "travel", dir)(buildAppendTable(s, dir, "travel")).read(Some(1L))
        .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("price"))
        .orderBy("o_orderkey"))

  // C2 (merge): PK upsert — rows 50-150 arrive updated (+1000 balance),
  // anti-join keeps unmatched current rows, delta wins on collision.
  private val cacheMerge = QueryDef(
    "cache_merge_read",
    Some("""SELECT c_custkey,
           |  round(CASE WHEN c_custkey BETWEEN 50 AND 150
           |             THEN c_acctbal + 1000 ELSE c_acctbal END, 2) AS acctbal
           |FROM customer WHERE c_custkey <= 150 ORDER BY c_custkey""".stripMargin),
    (s, dir) => {
      val t = memo(s, "merge", dir) {
        Tables.register(s, dir)
        val mgr = new CacheManager(s, freshRoot(s"merge_${math.abs(dir.hashCode)}"))
        val cfg = CacheConfig(enabled = true, table = "cust_merge",
          primaryKeys = Seq("c_custkey"),
          cursor = Some(CursorConfig("c_custkey", "int")))
        val ep = EndpointConfig(urlPath = "/cust-merge",
          templateSource = "cust_merge.sql", cache = cfg)
        // seed: plain balances ≤100; delta: updated balances 50-150
        val template =
          """SELECT c_custkey,
            |  {{#cache.cursorLastValue}} c_acctbal + 1000 {{/cache.cursorLastValue}}
            |  {{^cache.cursorLastValue}} c_acctbal {{/cache.cursorLastValue}} AS c_acctbal
            |FROM customer
            |{{#cache.cursorLastValue}} WHERE c_custkey BETWEEN 50 AND 150 {{/cache.cursorLastValue}}
            |{{^cache.cursorLastValue}} WHERE c_custkey <= 100 {{/cache.cursorLastValue}}""".stripMargin
        mgr.refresh(ep, template)
        mgr.refresh(ep, template)
        mgr.table(cfg)
      }
      t.read()
        .select(col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"))
        .orderBy("c_custkey")
    })

  // C4/C5 end-to-end under the serve path: three cursor appends, then
  // retention (keep 2 — chained append ancestors' dirs must survive
  // the manifest drop), then compaction into one dir, then aggressive
  // retention (keep 1 — now the pre-compaction dirs really delete).
  // The gated fact is row parity of the final read against the source
  // recomputed in DuckDB: if compaction lost or duplicated rows, or
  // expiry deleted a dir the live snapshot still references, the hash
  // breaks.
  private val cacheMaint = QueryDef(
    "cache_maintenance_read",
    Some("""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
           |FROM orders WHERE o_orderkey <= 3000 ORDER BY o_orderkey""".stripMargin),
    (s, dir) => {
      val t = memo(s, "maint", dir) {
        Tables.register(s, dir)
        val mgr = new CacheManager(s, freshRoot(s"maint_${math.abs(dir.hashCode)}"))
        val cursorCfg = CacheConfig(enabled = true, table = "orders_maint",
          cursor = Some(CursorConfig("o_orderkey", "int")))
        val ep = EndpointConfig(urlPath = "/orders-maint",
          templateSource = "orders_maint.sql", cache = cursorCfg)
        val template =
          """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            |WHERE o_orderkey <= {{conn.upper_bound}}
            |{{#cache.cursorLastValue}}
            |  AND o_orderkey > {{cache.cursorLastValue}}
            |{{/cache.cursorLastValue}}""".stripMargin
        mgr.refresh(ep, template, connProps = Map("upper_bound" -> "1000"))
        mgr.refresh(ep, template, connProps = Map("upper_bound" -> "2000"))
        mgr.refresh(ep, template, connProps = Map("upper_bound" -> "3000"))
        val tbl = mgr.table(cursorCfg)
        tbl.expireSnapshots(keepLast = 2)
        tbl.compact(targetFiles = 1)
        tbl.expireSnapshots(keepLast = 1)
        tbl
      }
      t.read()
        .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("price"))
        .orderBy("o_orderkey")
    })

  // Right-to-be-forgotten: PK-addressed delete through the same
  // file-pruned machinery as merge. The build seeds a merge-mode table
  // (bucketed, stat-bearing dirs), then runs a compliance sweep of two
  // deletes: an ABSENT key (publishes a no-op version over the same
  // dirs — the audit-trail-only case a real sweep mostly hits) and a
  // real key range (rewrites only the buckets whose PK range matches;
  // the rest carry by reference — SnapshotTableSpec proves the
  // byte-identity). The gated fact is the final state: seeded rows
  // minus the deleted range, recomputed by DuckDB from source.
  private val cacheDelete = QueryDef(
    "cache_delete_read",
    Some("""SELECT c_custkey, round(c_acctbal, 2) AS acctbal
           |FROM customer
           |WHERE c_custkey <= 300 AND c_custkey NOT BETWEEN 101 AND 150
           |ORDER BY c_custkey""".stripMargin),
    (s, dir) => {
      val t = memo(s, "delete", dir) {
        Tables.register(s, dir)
        val mgr = new CacheManager(s, freshRoot(s"delete_${math.abs(dir.hashCode)}"))
        val cfg = CacheConfig(enabled = true, table = "cust_delete",
          primaryKeys = Seq("c_custkey"))
        val ep = EndpointConfig(urlPath = "/cust-delete",
          templateSource = "cust_delete.sql", cache = cfg)
        mgr.refresh(ep,
          "SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey <= 300")
        val tbl = mgr.table(cfg)
        tbl.deleteByKeys(
          s.sql("SELECT CAST(999999 AS BIGINT) AS c_custkey"), Seq("c_custkey"))
        tbl.deleteByKeys(
          Tables.table(s, dir, "customer")
            .filter(col("c_custkey").between(101, 150)).select("c_custkey"),
          Seq("c_custkey"))
        tbl
      }
      t.read()
        .select(col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"))
        .orderBy("c_custkey")
    })

  // Snapshot DIFF — the change-data readout between two table versions
  // (what Iceberg calls an incremental scan): rows removed and added
  // between the seed snapshot and the post-delete head, as counts plus
  // a key digest so the hash gate pins WHICH rows moved, not just how
  // many. Shares the delete table's memoized build; both sides of the
  // diff are PK anti joins over snapshot reads — at scale these read
  // only the dirs the manifests reference, and a merge/delete history
  // means most dirs are SHARED between the two versions (carried by
  // reference), so the diff work is bounded by the rewritten buckets.
  private val cacheDiff = QueryDef(
    "cache_snapshot_diff",
    Some("""SELECT CAST(50 AS BIGINT) AS removed_n,
           |  CAST((SELECT sum(c_custkey) FROM customer WHERE c_custkey BETWEEN 101 AND 150) AS BIGINT) AS removed_key_sum,
           |  CAST(0 AS BIGINT) AS added_n,
           |  CAST(0 AS BIGINT) AS added_key_sum""".stripMargin),
    (s, dir) => {
      val t = memo(s, "delete", dir) {
        Tables.register(s, dir)
        val mgr = new CacheManager(s, freshRoot(s"delete_${math.abs(dir.hashCode)}"))
        val cfg = CacheConfig(enabled = true, table = "cust_delete",
          primaryKeys = Seq("c_custkey"))
        val ep = EndpointConfig(urlPath = "/cust-delete",
          templateSource = "cust_delete.sql", cache = cfg)
        mgr.refresh(ep,
          "SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey <= 300")
        val tbl = mgr.table(cfg)
        tbl.deleteByKeys(
          s.sql("SELECT CAST(999999 AS BIGINT) AS c_custkey"), Seq("c_custkey"))
        tbl.deleteByKeys(
          Tables.table(s, dir, "customer")
            .filter(col("c_custkey").between(101, 150)).select("c_custkey"),
          Seq("c_custkey"))
        tbl
      }
      val v1 = t.read(Some(1L)).select("c_custkey")
      val head = t.read().select("c_custkey")
      val removed = v1.join(head, Seq("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("removed_n"),
          coalesce(sum("c_custkey"), lit(0L)).cast("long").as("removed_key_sum"))
      val added = head.join(v1, Seq("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("added_n"),
          coalesce(sum("c_custkey"), lit(0L)).cast("long").as("added_key_sum"))
      removed.crossJoin(added)
        .select(col("removed_n"), col("removed_key_sum"),
          col("added_n"), col("added_key_sum"))
    })

  // C3: snapshot introspection — ids/modes/row counts are deterministic
  // (timestamps are not, so the digest excludes them). Oracle is the
  // expected manifest as inline VALUES.
  private val cacheMeta = QueryDef(
    "cache_snapshots_meta",
    Some("""SELECT 1::BIGINT AS snapshot_id, 'append' AS mode,
           |  (SELECT count(*) FROM orders WHERE o_orderkey <= 1000)::BIGINT AS row_count
           |UNION ALL
           |SELECT 2::BIGINT, 'append',
           |  (SELECT count(*) FROM orders WHERE o_orderkey <= 2000)::BIGINT
           |ORDER BY snapshot_id""".stripMargin),
    (s, dir) =>
      memo(s, "meta", dir)(buildAppendTable(s, dir, "meta")).snapshots()
        .select("snapshot_id", "mode", "row_count")
        .orderBy("snapshot_id"))

  override val defs: Seq[QueryDef] =
    Seq(cacheFull, cacheAppend, cacheTravel, cacheMerge, cacheDelete,
      cacheDiff, cacheMaint, cacheMeta)
}
