package graft.cache

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** Snapshot-versioned parquet table — the Spark-side analog of the
  * reference's DuckLake cache catalog (SURVEY §4.3; refresh modes per
  * /root/reference/src/cache_manager.cpp:58-139, snapshots/time travel
  * per docs/spec/components/caching.md:113-261).
  *
  * Layout:
  * {{{
  *   <root>/<name>/
  *     snapshots/s<id>/        parquet data written by snapshot <id>
  *     _meta/                  parquet manifest table:
  *                             (snapshot_id, committed_at, mode,
  *                              row_count, dirs ARRAY<STRING>,
  *                              dir_stats ARRAY<STRUCT<dir, pk_sig,
  *                                pk_min, pk_max, rows>>)
  *     _current                text file holding the live snapshot id
  *                             (advanced by ATOMIC_MOVE rename)
  * }}}
  *
  * A snapshot's state is the UNION of its manifest `dirs` — so:
  *  - `full` writes one new dir and references only it;
  *  - `append` writes ONLY the new rows and references the parent's
  *    dirs + its own — no rewrite of existing data, which is the only
  *    design that survives a 100 TB cursor-append cache (DuckLake adds
  *    files the same way);
  *  - `merge` is file-pruned copy-on-write: the manifest carries
  *    per-dir PK min/max stats, the delta's keys are tested against
  *    them (one map-side aggregate over the delta), ONLY the dirs
  *    whose key range can match are anti-joined + rewritten, and
  *    untouched dirs are carried into the new snapshot BY REFERENCE —
  *    so a 0.1% daily delta into a 100 TB table rewrites ~0.1% of the
  *    files, not the table (DuckLake's file-level MERGE,
  *    docs/spec/components/caching.md:113-170). Rewritten data is
  *    range-partitioned on the PK into bucket subdirs so the NEXT
  *    merge can prune within this one's output too;
  *  - time travel = read an older manifest; expiry = drop manifests
  *    and any data dir no retained manifest references; compaction =
  *    rewrite the live state into one dir and publish it as a new
  *    snapshot (ducklake_merge_adjacent_files analog,
  *    heartbeat_worker.cpp:121-158).
  *
  * Readers see only published snapshots: data dirs are invisible until
  * the manifest row + `_current` pointer land, and the pointer swap is
  * an atomic rename — the reference's ACID-read guarantee. Writers
  * race optimistically: the snapshot dir create is the atomic claim,
  * and a loser re-reads the manifest head and retries under the fresh
  * id (see `withFreshId`), so two drivers sharing a warehouse both
  * land their refreshes.
  *
  * The manifest is persistent state in a TABLE (restart-safe, readable
  * by any engine), but each public operation loads it exactly once —
  * it is a few rows, and extra Spark jobs per refresh would dominate
  * small-cache latency. Row counts come from the parquet footers of
  * the WRITTEN data (never by re-running the source query).
  */
final class SnapshotTable(spark: SparkSession, root: String, val name: String) {

  private val tableDir: Path = Paths.get(root, name)
  private val snapDir: Path = tableDir.resolve("snapshots")
  private val metaDir: Path = tableDir.resolve("_meta")
  private val currentFile: Path = tableDir.resolve("_current")

  Files.createDirectories(snapDir)

  /** Per-data-dir pruning stats: min/max of the canonical PK prune
    * key over the dir's rows (nulls excluded — a NULL PK component
    * never equi-matches a delta row, so null-only dirs are never
    * touched), plus the dir's row count. `pkSig` records WHICH key
    * columns the stats were computed over; a merge with a different
    * key set treats the dir as unprunable and rewrites it. */
  private[cache] final case class DirStat(
      dir: String, pkSig: String,
      pkMin: Option[String], pkMax: Option[String], rows: Long)

  private val statSchema = StructType(Seq(
    StructField("dir", StringType, nullable = false),
    StructField("pk_sig", StringType, nullable = false),
    StructField("pk_min", StringType, nullable = true),
    StructField("pk_max", StringType, nullable = true),
    StructField("rows", LongType, nullable = false)))

  private val metaSchema = StructType(Seq(
    StructField("snapshot_id", LongType, nullable = false),
    StructField("committed_at", TimestampType, nullable = false),
    StructField("mode", StringType, nullable = false),
    StructField("row_count", LongType, nullable = false),
    StructField("dirs", ArrayType(StringType), nullable = false),
    // nullable: manifests written before the stats column existed (or
    // by stat-less modes) read back as null → dirs treated unprunable
    StructField("dir_stats", ArrayType(statSchema), nullable = true)))

  private final case class Manifest(
      id: Long, committedAt: java.sql.Timestamp, mode: String,
      rowCount: Long, dirs: Seq[String], stats: Seq[DirStat])

  // ---- manifest ---------------------------------------------------------

  /** One metadata read per operation; newest first. */
  private def loadManifests(): Seq[Manifest] =
    if (!Files.exists(metaDir)) Nil
    else spark.read.schema(metaSchema).parquet(metaDir.toString)
      .collect().toSeq.map { r =>
        val stats = Option(r.getSeq[Row](5)).getOrElse(Seq.empty).map { s =>
          DirStat(s.getString(0), s.getString(1),
            Option(s.getString(2)), Option(s.getString(3)), s.getLong(4))
        }
        Manifest(r.getLong(0), r.getTimestamp(1), r.getString(2),
          r.getLong(3), r.getSeq[String](4), stats)
      }.sortBy(-_.id)

  /** All snapshot manifests as a DataFrame (C3 introspection; analog
    * of the ducklake_snapshots() table function). */
  def snapshots(): DataFrame = {
    val rows = loadManifests().map(m =>
      Row(m.id, m.committedAt, m.mode, m.rowCount, m.dirs,
        m.stats.map(s => Row(s.dir, s.pkSig, s.pkMin.orNull, s.pkMax.orNull, s.rows))))
    spark.createDataFrame(rows.asJava, metaSchema)
  }

  def currentSnapshotId: Option[Long] =
    if (Files.exists(currentFile))
      Some(new String(Files.readAllBytes(currentFile), "UTF-8").trim.toLong)
    else None

  /** (current, previous) snapshot (id, committed_at), newest first —
    * what the reference injects as cacheSnapshotId/previousSnapshotId. */
  def latestTwo(): Seq[(Long, java.sql.Timestamp)] =
    loadManifests().take(2).map(m => (m.id, m.committedAt))

  private def manifestFor(ms: Seq[Manifest], id: Long): Manifest =
    ms.find(_.id == id).getOrElse(
      throw new IllegalArgumentException(s"snapshot $id does not exist for table $name"))

  /** Raised when `_current` points past the manifest view a publish
    * body loaded — another driver published in between. Retryable via
    * withFreshId (re-read, recompute), unlike a genuinely missing
    * snapshot id which stays a loud IllegalArgumentException. */
  private final class StaleViewException extends RuntimeException(
    s"manifest view of table $name went stale under a concurrent publish")

  /** manifestFor a publish body: the id coming from `_current` being
    * AHEAD of `ms` is staleness, not corruption. */
  private def parentManifest(ms: Seq[Manifest], id: Long): Manifest =
    ms.find(_.id == id).getOrElse {
      if (ms.headOption.forall(_.id < id)) throw new StaleViewException
      throw new IllegalArgumentException(s"snapshot $id does not exist for table $name")
    }

  private def publish(id: Long, mode: String, rowCount: Long, dirs: Seq[String],
      stats: Seq[DirStat] = Seq.empty): Unit = {
    val row = Row(id, new java.sql.Timestamp(System.currentTimeMillis()),
      mode, rowCount, dirs,
      stats.map(s => Row(s.dir, s.pkSig, s.pkMin.orNull, s.pkMax.orNull, s.rows)))
    spark.createDataFrame(java.util.List.of(row), metaSchema)
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(metaDir.toString)
    val tmp = tableDir.resolve(s"_current.tmp$id")
    Files.write(tmp, id.toString.getBytes("UTF-8"))
    Files.move(tmp, currentFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def writeData(id: Long, df: DataFrame): String = {
    val dir = s"s$id"
    val target = snapDir.resolve(dir)
    // Atomic claim: `createDirectory` is atomic on a POSIX warehouse —
    // exactly one of two racing drivers creates the dir, the loser
    // throws FileAlreadyExistsException BEFORE any data lands. A
    // SaveMode.ErrorIfExists write is NOT that: its existence check
    // and its write are separate steps, so two drivers can both pass
    // the check and interleave part files into one snapshot dir. The
    // data write is then Append INTO the claimed (empty) dir — Append
    // never deletes the path, so the claim is never released mid-write
    // the way Overwrite's delete-then-recreate would.
    Files.createDirectory(target)
    // a failed DATA write (source query error, executor loss) must
    // release the claim: leaving the dir would make every later
    // refresh recompute the same head+1, collide on it, and wedge the
    // table until an operator deletes the orphan by hand
    try df.write.mode(SaveMode.Append).parquet(target.toString)
    catch { case e: Throwable => deleteRecursively(target); throw e }
    dir
  }

  /** Row count of a written snapshot dir — parquet footer metadata, no
    * data scan and no re-execution of the source query. */
  private def writtenCount(dir: String): Long =
    spark.read.parquet(snapDir.resolve(dir).toString).count()

  private def dataPath(dir: String): String = snapDir.resolve(dir).toString

  // ---- refresh modes (C1/C2) -------------------------------------------

  /** Optimistic cross-process concurrency. `synchronized` serializes
    * writers within ONE handle; two drivers (or two handles) sharing a
    * warehouse can still race to the same next id. `writeData`'s
    * `ErrorIfExists` makes the loser throw instead of corrupting the
    * winner's dir — here the loser is caught, the manifest head
    * re-read, and the publish retried under the fresh id (bounded
    * attempts), so a scheduled refresh that loses the race lands on
    * the next attempt instead of staying failed until its next tick —
    * the reference's ACID-append contract
    * (docs/spec/components/caching.md:113-170). The body re-derives
    * everything (parent manifests, merge inputs) from the re-read
    * state, so a retry appends/merges onto the WINNER's snapshot. */
  private val MaxPublishAttempts = 3
  private val CollisionWaitMillis = 30000L
  private val CollisionPollMillis = 250L

  private def isIdCollision(e: Throwable, id: Long): Boolean = e match {
    case f: java.nio.file.FileAlreadyExistsException =>
      Option(f.getFile).exists(_.endsWith(s"s$id"))
    case _ =>
      val m = Option(e.getMessage).getOrElse("")
      (m.contains("already exists") || m.contains("PATH_ALREADY_EXISTS")) &&
        m.contains(s"s$id")
  }

  /** Cheap progress fingerprint of another writer's claimed snapshot
    * dir: (entry count, latest mtime, total size). Changing between
    * polls = the writer is alive and writing. */
  private def claimSignature(id: Long): (Long, Long, Long) = {
    val p = snapDir.resolve(s"s$id")
    if (!Files.exists(p)) (-1L, -1L, -1L)
    else {
      var n = 0L; var mtime = 0L; var size = 0L
      Files.walk(p).iterator().asScala.foreach { f =>
        n += 1
        mtime = math.max(mtime, Files.getLastModifiedTime(f).toMillis)
        if (Files.isRegularFile(f)) size += Files.size(f)
      }
      (n, mtime, size)
    }
  }

  private def withFreshId(body: (Seq[Manifest], Long) => Long): Long = {
    var attempt = 1
    var ms = loadManifests()
    while (true) {
      val id = ms.headOption.fold(1L)(_.id + 1)
      try return body(ms, id)
      catch {
        case _: StaleViewException if attempt < MaxPublishAttempts =>
          // another driver published between our manifest read and the
          // body's `_current` read: the head has ALREADY advanced, so
          // re-read and retry immediately (no claim was taken yet)
          attempt += 1
          ms = loadManifests()
        case e: Exception if isIdCollision(e, id) && attempt < MaxPublishAttempts =>
          attempt += 1
          // The winner holds the dir claim but may still be writing
          // data: retrying immediately would just collide on the same
          // id again and exhaust the attempts. Poll until the winner's
          // manifest lands (head advances past the collided id). A
          // LIVE slow writer must not be mistaken for a crashed one,
          // so the wait is progress-aware: as long as the claimed
          // dir's contents keep advancing (file count / mtimes /
          // sizes), keep waiting — the stall clock only runs while
          // the claim shows NO progress for CollisionWaitMillis. A
          // genuinely dead claimer stops producing progress, the
          // stall deadline fires, the next attempt collides again,
          // and the failure propagates loudly after
          // MaxPublishAttempts — operator intervention territory,
          // not silent corruption.
          var cur = loadManifests()
          var lastSig = claimSignature(id)
          var lastProgress = System.currentTimeMillis()
          while (cur.headOption.fold(0L)(_.id) < id &&
              System.currentTimeMillis() - lastProgress < CollisionWaitMillis) {
            Thread.sleep(CollisionPollMillis)
            val sig = claimSignature(id)
            if (sig != lastSig) { lastSig = sig; lastProgress = System.currentTimeMillis() }
            cur = loadManifests()
          }
          ms = cur
      }
    }
    -1L // unreachable
  }

  /** full: materialize the query result as a brand-new state. */
  def refreshFull(df: DataFrame): Long = synchronized {
    withFreshId { (_, id) =>
      val dir = writeData(id, df)
      publish(id, "full", writtenCount(dir), Seq(dir))
      id
    }
  }

  /** append: write ONLY the new rows; the manifest chains the parent
    * dirs. The caller filters by cursor high-water (CacheManager). */
  def refreshAppend(newRows: DataFrame): Long = synchronized {
    withFreshId { (ms, id) =>
      val parent = currentSnapshotId.map(parentManifest(ms, _))
      val dir = writeData(id, newRows)
      publish(id, "append",
        parent.fold(0L)(_.rowCount) + writtenCount(dir),
        parent.fold(Seq.empty[String])(_.dirs) :+ dir)
      id
    }
  }

  /** Canonical sortable prune key for a PK tuple: each component cast
    * to string, joined with \u0001; NULL if ANY component is null (a
    * null component never equi-matches, so such rows can neither
    * touch a dir nor contribute to its stats). Min/max of THIS
    * encoding per dir is what the manifest stores — containment is
    * exact by construction (the same tuple always encodes to the same
    * string, which lies within its dir's [min,max]), so pruning can
    * only over-approximate, never miss a matching row. */
  private def pruneKey(pks: Seq[String]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val anyNull = pks.map(col(_).isNull).reduce(_ || _)
    when(anyNull, lit(null: String))
      .otherwise(concat_ws("\u0001", pks.map(col(_).cast("string")): _*))
  }

  private def pkSig(pks: Seq[String]): String = pks.mkString(",")

  private val BucketCol = "__graft_bucket"

  /** Which of the parent's dirs can contain a PK present in the delta.
    * Dirs with no stats / a different key signature / time-of-write
    * unknowable content are unprunable → touched. Stat-bearing dirs
    * are tested with ONE aggregate over the delta (a per-dir
    * `max(when(key between min and max, 1))` flag — map-side partial
    * agg, no join, no collect of delta rows). */
  private def touchedDirs(
      delta: DataFrame, pks: Seq[String], parent: Manifest): Set[String] = {
    import org.apache.spark.sql.functions._
    val sig = pkSig(pks)
    val statsByDir = parent.stats.map(s => s.dir -> s).toMap
    val (checkable, blind) = parent.dirs.partition(d =>
      statsByDir.get(d).exists(s =>
        s.pkSig == sig && s.pkMin.isDefined && s.pkMax.isDefined))
    val hits: Set[String] =
      if (checkable.isEmpty) Set.empty
      else {
        val k = pruneKey(pks)
        val flags = checkable.map { d =>
          val s = statsByDir(d)
          max(when(k.between(lit(s.pkMin.get), lit(s.pkMax.get)), 1))
        }
        val row = delta.agg(flags.head, flags.tail: _*).collect().head
        checkable.zipWithIndex.collect {
          case (d, i) if !row.isNullAt(i) => d
        }.toSet
      }
    hits ++ blind
  }

  /** Write merge output range-partitioned on the prune key into
    * `buckets` subdirs of s<id>, and compute each subdir's stats from
    * a column-pruned read-back of just the PK columns. Returns
    * (manifest dir entries, their stats); empty when the data is
    * empty (the claim dir then stays unreferenced and is reaped by a
    * later expire). Range partitioning (not hash) is deliberate:
    * contiguous key ranges per dir keep a key-local delta (a date, an
    * id window) touching O(1) dirs on the NEXT merge, where hash
    * buckets would all span the full range and never prune. */
  private def writeMergeData(
      id: Long, df: DataFrame, pks: Seq[String], buckets: Int): (Seq[String], Seq[DirStat]) = {
    import org.apache.spark.sql.functions._
    val dirName = s"s$id"
    val target = snapDir.resolve(dirName)
    Files.createDirectory(target) // atomic claim, see writeData
    try {
      df.repartitionByRange(math.max(buckets, 1), pruneKey(pks))
        // evaluated AFTER the exchange, so it names the range bucket;
        // partitionBy then encodes it in the subdir path (not in the
        // files) — each task writes straight into its own subdir, no
        // second shuffle
        .withColumn(BucketCol, spark_partition_id())
        .write.mode(SaveMode.Append).partitionBy(BucketCol)
        .parquet(target.toString)
    } catch { case e: Throwable => deleteRecursively(target); throw e }
    val subdirs = Files.list(target).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith(BucketCol + "=")).toList
    if (subdirs.isEmpty) (Seq.empty, Seq.empty)
    else {
      val k = pruneKey(pks)
      val stats = spark.read.parquet(target.toString)
        .groupBy(col(BucketCol))
        .agg(min(k).as("mn"), max(k).as("mx"), count(lit(1)).as("n"))
        .collect().toSeq.map { r =>
          DirStat(s"$dirName/$BucketCol=${r.get(0)}", pkSig(pks),
            Option(r.getString(1)), Option(r.getString(2)), r.getLong(3))
        }.sortBy(_.dir)
      (stats.map(_.dir), stats)
    }
  }

  /** merge: upsert by primary key, file-pruned. The delta's keys are
    * tested against the manifest's per-dir stats; only dirs whose key
    * range can match are read, anti-joined and rewritten — untouched
    * dirs (and their stats) are carried into the new snapshot by
    * reference, files unrewritten. An all-new-keys delta therefore
    * writes only itself; a point update rewrites one bucket. Dirs
    * without stats (pre-stats manifests, full/append/compact output,
    * or stats under a different key set) are unprunable and rewrite
    * once, after which the output is bucketed + stat-bearing. */
  def refreshMerge(newRows: DataFrame, primaryKeys: Seq[String],
      mergeBuckets: Int = 4): Long = synchronized {
    require(primaryKeys.nonEmpty, "merge mode requires primary keys")
    withFreshId { (ms, id) =>
      currentSnapshotId.map(parentManifest(ms, _)) match {
        case None =>
          val (dirs, stats) = writeMergeData(id, newRows, primaryKeys, mergeBuckets)
          publish(id, "merge", stats.map(_.rows).sum, dirs, stats)
        case Some(parent) =>
          val touched = touchedDirs(newRows, primaryKeys, parent)
          val untouched = parent.dirs.filterNot(touched)
          val merged =
            if (touched.isEmpty) newRows
            else spark.read.parquet(touched.toSeq.map(dataPath): _*)
              .join(newRows, primaryKeys, "left_anti")
              // schema evolution on merge: a delta that ADDS columns
              // widens the table (carried rows read NULL for the new
              // columns), and a delta missing table columns keeps them
              // (its rows read NULL) — the additive evolution contract
              // Delta/Iceberg mergeSchema has. Untouched dirs keep
              // their narrower files; the multi-schema read is safe
              // because parquet union-reads by name with missing
              // columns as NULL when the frames union this way.
              .unionByName(newRows, allowMissingColumns = true)
          val (newDirs, newStats) = writeMergeData(id, merged, primaryKeys, mergeBuckets)
          // every untouched dir has stats by construction (stat-less
          // dirs are always touched), so carried row counts are exact
          val carried = untouched.flatMap(d => parent.stats.find(_.dir == d))
          publish(id, "merge",
            carried.map(_.rows).sum + newStats.map(_.rows).sum,
            untouched ++ newDirs, carried ++ newStats)
      }
      id
    }
  }

  /** delete: remove every row whose primary key appears in `keys` —
    * the right-to-be-forgotten path. File-pruned exactly like merge:
    * the key set is tested against the manifest's per-dir stats, only
    * dirs whose key range can match are read, anti-joined and
    * rewritten; untouched dirs (and their stats) carry into the new
    * snapshot by reference. A delete of keys the table never held
    * publishes a new version over the SAME dirs (the audit trail
    * records that the request was processed — at 100 TB that
    * no-op-with-provenance is the common case for compliance sweeps).
    * Old snapshots still contain the rows until retention expires
    * them — full erasure = deleteByKeys + expireSnapshots(1), the
    * same two-step contract DuckLake/Iceberg erasure has. */
  def deleteByKeys(keys: DataFrame, primaryKeys: Seq[String],
      mergeBuckets: Int = 4): Long = synchronized {
    require(primaryKeys.nonEmpty, "delete requires primary keys")
    withFreshId { (ms, id) =>
      val parent = currentSnapshotId.map(parentManifest(ms, _)).getOrElse(
        throw new IllegalStateException(s"table $name has no snapshots to delete from"))
      val touched = touchedDirs(keys, primaryKeys, parent)
      val untouched = parent.dirs.filterNot(touched)
      if (touched.isEmpty) {
        publish(id, "delete", parent.rowCount, parent.dirs, parent.stats)
      } else {
        val kept = spark.read.parquet(touched.toSeq.map(dataPath): _*)
          .join(keys, primaryKeys, "left_anti")
        val (newDirs, newStats) = writeMergeData(id, kept, primaryKeys, mergeBuckets)
        // every untouched dir has stats by construction (stat-less
        // dirs are always touched), so carried row counts are exact
        val carried = untouched.flatMap(d => parent.stats.find(_.dir == d))
        publish(id, "delete",
          carried.map(_.rows).sum + newStats.map(_.rows).sum,
          untouched ++ newDirs, carried ++ newStats)
      }
      id
    }
  }

  // ---- reads (C9/C10) ---------------------------------------------------

  /** Read the live state, or a specific snapshot (time travel). */
  def read(version: Option[Long] = None): DataFrame = {
    val id = version.orElse(currentSnapshotId).getOrElse(
      throw new IllegalStateException(s"table $name has no snapshots"))
    val dirs = manifestFor(loadManifests(), id).dirs.map(dataPath)
    // mergeSchema: after a schema-widening merge the snapshot's dirs
    // legitimately carry different parquet schemas (untouched narrow
    // dirs ride by reference next to the widened rewrite); the merged
    // read unions columns by name with NULL for a dir's missing ones.
    // Cost is one footer read per file at planning — the same price
    // Delta/Iceberg pay for their schema logs.
    spark.read.option("mergeSchema", "true").parquet(dirs: _*)
  }

  /** Data dirs of the CURRENT snapshot — the serve-view registration
    * (CacheManager) builds a catalog view over them so templates can
    * query `{{cache.schema}}.{{cache.table}}` directly. Empty when no
    * snapshot exists yet. */
  def currentDataDirs: Seq[String] =
    currentSnapshotId.toSeq.flatMap(id =>
      manifestFor(loadManifests(), id).dirs.map(dataPath))

  // ---- maintenance (C4/C5) ---------------------------------------------

  /** Retention: keep the newest `keepLast` snapshots (the live one is
    * always kept). Drops manifests, then deletes any data dir no
    * retained manifest references (append chains keep ancestors'
    * dirs alive). In-flight CLAIMS (dirs named past the manifest head)
    * are never reaped — see the filter below. The manifest REWRITE
    * itself assumes one maintenance owner per table (the scheduler
    * role, like DuckLake's heartbeat worker): refresh publishes race
    * safely against each other, but not against a concurrent
    * rewriteMeta. */
  def expireSnapshots(keepLast: Int): Seq[Long] = synchronized {
    val ms = loadManifests() // newest first
    val keep = ms.take(math.max(keepLast, 1)).map(_.id).toSet ++ currentSnapshotId
    val drop = ms.map(_.id).filterNot(keep)
    if (drop.nonEmpty) {
      val retained = ms.filter(m => keep.contains(m.id))
      rewriteMeta(retained)
      // manifest dirs may be bucket SUBDIRS ("s5/__graft_bucket=0"),
      // so liveness is judged at the top-level snapshot dir
      val live = retained.flatMap(_.dirs).map(_.takeWhile(_ != '/')).toSet
      // Only reap snapshot dirs at or below the manifest head we
      // read: a dir named past the head is another driver's CLAIMED,
      // not-yet-published snapshot (writeData's createDirectory) —
      // deleting it under the writer would silently drop part files
      // from a snapshot that then publishes. Dirs ≤ head that no
      // retained manifest references are genuinely dead. Entries that
      // are not snapshot dirs at all (a killed write's _temporary
      // leftovers and the like) are garbage and reaped too; a claim
      // stuck PAST the head (its writer crashed before publishing) is
      // logged so an operator sees it instead of it silently
      // accumulating forever.
      val head = ms.headOption.fold(0L)(_.id)
      Files.list(snapDir).iterator().asScala.toList
        .filterNot(p => live.contains(p.getFileName.toString))
        .foreach { p =>
          val n = p.getFileName.toString
          val isSnapDir = n.startsWith("s") && n.length > 1 && n.drop(1).forall(_.isDigit)
          if (!isSnapDir) deleteRecursively(p)
          else if (n.drop(1).toLong <= head) deleteRecursively(p)
          else {
            val age = System.currentTimeMillis() -
              Files.getLastModifiedTime(p).toMillis
            System.err.println(s"[graft] table $name: snapshot claim $n is " +
              s"ahead of manifest head $head and ${age / 1000}s old — " +
              "in-flight writer or orphan of a crashed one; not reaped")
          }
        }
    }
    drop
  }

  /** Compaction: rewrite the live state into `targetFiles` files and
    * publish it as a new snapshot (merge-adjacent-files analog). The
    * read MUST union by name (mergeSchema): after an additive
    * schema-evolution merge the live state is a widened rewrite NEXT TO
    * narrow untouched dirs, and a footer-schema read would silently
    * drop the widened columns from the compacted snapshot — permanent
    * loss once retention expires the pre-compaction snapshot
    * (r10 review finding; gated in SnapshotTableSpec). */
  def compact(targetFiles: Int = 1): Long = synchronized {
    withFreshId { (ms, id) =>
      val cur = currentSnapshotId.getOrElse(
        throw new IllegalStateException(s"table $name has no snapshots"))
      val dirs = parentManifest(ms, cur).dirs.map(dataPath)
      val df = spark.read.option("mergeSchema", "true").parquet(dirs: _*)
        .repartition(targetFiles)
      val dir = writeData(id, df)
      publish(id, "compact", writtenCount(dir), Seq(dir))
      id
    }
  }

  /** Parquet file count across the live snapshot's data dirs — the
    * needs-compaction readout the scheduled walk checks before paying a
    * rewrite (a table already merged to `targetFiles` must be a no-op,
    * not a daily full rewrite burning a retention slot). */
  def liveFileCount: Int = currentDataDirs.map { d =>
    val p = java.nio.file.Paths.get(d)
    if (!Files.isDirectory(p)) 0
    else {
      val s = Files.list(p)
      try s.iterator().asScala.count(_.getFileName.toString.endsWith(".parquet"))
      finally s.close()
    }
  }.sum

  private def rewriteMeta(retained: Seq[Manifest]): Unit = {
    val rows = retained.map(m => Row(m.id, m.committedAt, m.mode, m.rowCount, m.dirs,
      m.stats.map(s => Row(s.dir, s.pkSig, s.pkMin.orNull, s.pkMax.orNull, s.rows))))
    val tmp = tableDir.resolve("_meta_new")
    spark.createDataFrame(rows.asJava, metaSchema)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val old = tableDir.resolve("_meta_old")
    if (Files.exists(metaDir)) Files.move(metaDir, old)
    Files.move(tmp, metaDir)
    deleteRecursively(old)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
    }

  /** Test/tooling helper: remove everything under this table. */
  def drop(): Unit = synchronized { deleteRecursively(tableDir) }
}
