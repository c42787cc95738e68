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
  *                              row_count, dirs ARRAY<STRING>)
  *     _current                text file holding the live snapshot id
  *                             (advanced by ATOMIC_MOVE rename)
  * }}}
  *
  * A snapshot's state is the UNION of its manifest `dirs` — so:
  *  - `full` and `merge` write one new dir and reference only it;
  *  - `append` writes ONLY the new rows and references the parent's
  *    dirs + its own — no rewrite of existing data, which is the only
  *    design that survives a 100 TB cursor-append cache (DuckLake adds
  *    files the same way);
  *  - `merge` is PK anti-join + union rewrite (v1 rewrites the full
  *    state; the scale refinement is copy-on-write of only the
  *    affected partition dirs — the manifest design already permits
  *    per-dir replacement);
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

  private val metaSchema = StructType(Seq(
    StructField("snapshot_id", LongType, nullable = false),
    StructField("committed_at", TimestampType, nullable = false),
    StructField("mode", StringType, nullable = false),
    StructField("row_count", LongType, nullable = false),
    StructField("dirs", ArrayType(StringType), nullable = false)))

  private final case class Manifest(
      id: Long, committedAt: java.sql.Timestamp, mode: String,
      rowCount: Long, dirs: Seq[String])

  // ---- manifest ---------------------------------------------------------

  /** One metadata read per operation; newest first. */
  private def loadManifests(): Seq[Manifest] =
    if (!Files.exists(metaDir)) Nil
    else spark.read.schema(metaSchema).parquet(metaDir.toString)
      .collect().toSeq.map { r =>
        Manifest(r.getLong(0), r.getTimestamp(1), r.getString(2),
          r.getLong(3), r.getSeq[String](4))
      }.sortBy(-_.id)

  /** All snapshot manifests as a DataFrame (C3 introspection; analog
    * of the ducklake_snapshots() table function). */
  def snapshots(): DataFrame = {
    val rows = loadManifests().map(m =>
      Row(m.id, m.committedAt, m.mode, m.rowCount, m.dirs))
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

  private def publish(id: Long, mode: String, rowCount: Long, dirs: Seq[String]): Unit = {
    val row = Row(id, new java.sql.Timestamp(System.currentTimeMillis()),
      mode, rowCount, dirs)
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
          // manifest lands (head advances past the collided id) before
          // recomputing; if the claimer died mid-write the head never
          // advances, the next attempt collides again, and the failure
          // propagates loudly after MaxPublishAttempts — operator
          // intervention territory, not silent corruption.
          val deadline = System.currentTimeMillis() + CollisionWaitMillis
          var cur = loadManifests()
          while (cur.headOption.fold(0L)(_.id) < id &&
              System.currentTimeMillis() < deadline) {
            Thread.sleep(CollisionPollMillis)
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

  /** merge: upsert by primary key — keep current rows with no matching
    * PK in the delta (anti-join), union the delta, publish as a full
    * rewrite. The anti-join shuffles both sides on the PK columns,
    * which is the minimal movement for an upsert without a partitioned
    * layout; with one, only affected partitions would rewrite. */
  def refreshMerge(newRows: DataFrame, primaryKeys: Seq[String]): Long = synchronized {
    require(primaryKeys.nonEmpty, "merge mode requires primary keys")
    withFreshId { (ms, id) =>
      val merged = currentSnapshotId match {
        case None => newRows
        case Some(cur) =>
          val dirs = parentManifest(ms, cur).dirs.map(dataPath)
          spark.read.parquet(dirs: _*)
            .join(newRows, primaryKeys, "left_anti")
            .unionByName(newRows)
      }
      val dir = writeData(id, merged)
      publish(id, "merge", writtenCount(dir), Seq(dir))
      id
    }
  }

  // ---- reads (C9/C10) ---------------------------------------------------

  /** Read the live state, or a specific snapshot (time travel). */
  def read(version: Option[Long] = None): DataFrame = {
    val id = version.orElse(currentSnapshotId).getOrElse(
      throw new IllegalStateException(s"table $name has no snapshots"))
    val dirs = manifestFor(loadManifests(), id).dirs.map(dataPath)
    spark.read.parquet(dirs: _*)
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
      val live = retained.flatMap(_.dirs).toSet
      // Only reap dirs at or below the manifest head we read: a dir
      // named past the head is another driver's CLAIMED, not-yet-
      // published snapshot (writeData's createDirectory) — deleting it
      // under the writer would silently drop part files from a
      // snapshot that then publishes. Dirs ≤ head that no retained
      // manifest references are genuinely dead.
      val head = ms.headOption.fold(0L)(_.id)
      Files.list(snapDir).iterator().asScala.toList
        .filterNot(p => live.contains(p.getFileName.toString))
        .filter { p =>
          val n = p.getFileName.toString
          n.startsWith("s") && n.drop(1).forall(_.isDigit) &&
            n.drop(1).toLong <= head
        }
        .foreach(deleteRecursively)
    }
    drop
  }

  /** Compaction: rewrite the live state into `targetFiles` files and
    * publish it as a new snapshot (merge-adjacent-files analog). */
  def compact(targetFiles: Int = 1): Long = synchronized {
    withFreshId { (ms, id) =>
      val cur = currentSnapshotId.getOrElse(
        throw new IllegalStateException(s"table $name has no snapshots"))
      val dirs = parentManifest(ms, cur).dirs.map(dataPath)
      val df = spark.read.parquet(dirs: _*).repartition(targetFiles)
      val dir = writeData(id, df)
      publish(id, "compact", writtenCount(dir), Seq(dir))
      id
    }
  }

  private def rewriteMeta(retained: Seq[Manifest]): Unit = {
    val rows = retained.map(m => Row(m.id, m.committedAt, m.mode, m.rowCount, m.dirs))
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
