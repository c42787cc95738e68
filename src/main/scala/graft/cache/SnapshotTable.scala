package graft.cache

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

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
  * an atomic rename — the reference's ACID-read guarantee at the
  * single-writer granularity flapi itself has.
  */
final class SnapshotTable(spark: SparkSession, root: String, val name: String) {

  private val tableDir: Path = Paths.get(root, name)
  private val snapDir: Path = tableDir.resolve("snapshots")
  private val metaDir: Path = tableDir.resolve("_meta")
  private val currentFile: Path = tableDir.resolve("_current")

  Files.createDirectories(snapDir)

  // ---- manifest ---------------------------------------------------------

  /** All snapshot manifests (C3 introspection; analog of the
    * ducklake_snapshots() table function). */
  def snapshots(): DataFrame = {
    if (!Files.exists(metaDir)) emptyMeta()
    else spark.read.parquet(metaDir.toString)
  }

  private def emptyMeta(): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("snapshot_id", LongType),
        StructField("committed_at", TimestampType),
        StructField("mode", StringType),
        StructField("row_count", LongType),
        StructField("dirs", ArrayType(StringType)))))
  }

  def currentSnapshotId: Option[Long] =
    if (Files.exists(currentFile))
      Some(new String(Files.readAllBytes(currentFile), "UTF-8").trim.toLong)
    else None

  /** (current, previous) manifest rows, newest first — what the
    * reference injects as cacheSnapshotId/previousSnapshotId. */
  def latestTwo(): Seq[(Long, java.sql.Timestamp)] =
    snapshots().orderBy(col("snapshot_id").desc).limit(2)
      .select("snapshot_id", "committed_at")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getTimestamp(1)))

  private def manifestDirs(id: Long): Seq[String] = {
    val rows = snapshots().filter(col("snapshot_id") === id)
      .select("dirs").collect()
    require(rows.nonEmpty, s"snapshot $id does not exist for table $name")
    rows.head.getSeq[String](0)
  }

  private def nextId: Long = {
    val existing = snapshots().agg(max("snapshot_id")).collect().head
    if (existing.isNullAt(0)) 1L else existing.getLong(0) + 1L
  }

  private def publish(id: Long, mode: String, rowCount: Long, dirs: Seq[String]): Unit = {
    import spark.implicits._
    Seq((id, new java.sql.Timestamp(System.currentTimeMillis()), mode, rowCount, dirs))
      .toDF("snapshot_id", "committed_at", "mode", "row_count", "dirs")
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(metaDir.toString)
    val tmp = tableDir.resolve(s"_current.tmp$id")
    Files.write(tmp, id.toString.getBytes("UTF-8"))
    Files.move(tmp, currentFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def writeData(id: Long, df: DataFrame): String = {
    val dir = s"s$id"
    df.write.mode(SaveMode.ErrorIfExists).parquet(snapDir.resolve(dir).toString)
    dir
  }

  // ---- refresh modes (C1/C2) -------------------------------------------

  /** full: materialize the query result as a brand-new state. */
  def refreshFull(df: DataFrame): Long = synchronized {
    val id = nextId
    val dir = writeData(id, df)
    publish(id, "full", countOf(df), Seq(dir))
    id
  }

  /** append: write ONLY the new rows; the manifest chains the parent
    * dirs. The caller filters by cursor high-water (CacheManager). */
  def refreshAppend(newRows: DataFrame): Long = synchronized {
    val id = nextId
    val (parentDirs, parentRows) = currentSnapshotId match {
      case None => (Nil, 0L)
      case Some(cur) =>
        val m = snapshots().filter(col("snapshot_id") === cur)
          .select("dirs", "row_count").collect().head
        (m.getSeq[String](0), m.getLong(1))
    }
    val dir = writeData(id, newRows)
    publish(id, "append", parentRows + countOf(newRows), parentDirs :+ dir)
    id
  }

  /** merge: upsert by primary key — keep current rows with no matching
    * PK in the delta (anti-join), union the delta, publish as a full
    * rewrite. The anti-join shuffles both sides on the PK columns,
    * which is the minimal movement for an upsert without a partitioned
    * layout; with one, only affected partitions would rewrite. */
  def refreshMerge(newRows: DataFrame, primaryKeys: Seq[String]): Long = synchronized {
    require(primaryKeys.nonEmpty, "merge mode requires primary keys")
    val id = nextId
    val merged = currentSnapshotId match {
      case None => newRows
      case Some(cur) =>
        read(Some(cur)).join(newRows, primaryKeys, "left_anti").unionByName(newRows)
    }
    val dir = writeData(id, merged)
    publish(id, "merge", countOf(merged), Seq(dir))
    id
  }

  private def countOf(df: DataFrame): Long = df.count()

  // ---- reads (C9/C10) ---------------------------------------------------

  /** Read the live state, or a specific snapshot (time travel). */
  def read(version: Option[Long] = None): DataFrame = {
    val id = version.orElse(currentSnapshotId).getOrElse(
      throw new IllegalStateException(s"table $name has no snapshots"))
    val dirs = manifestDirs(id).map(d => snapDir.resolve(d).toString)
    spark.read.parquet(dirs: _*)
  }

  // ---- maintenance (C4/C5) ---------------------------------------------

  /** Retention: keep the newest `keepLast` snapshots (the live one is
    * always kept). Drops manifests, then deletes any data dir no
    * retained manifest references (append chains keep ancestors'
    * dirs alive). */
  def expireSnapshots(keepLast: Int): Seq[Long] = synchronized {
    val all = snapshots().orderBy(col("snapshot_id").desc)
      .select("snapshot_id").collect().map(_.getLong(0)).toSeq
    val keep = all.take(math.max(keepLast, 1)).toSet ++ currentSnapshotId
    val drop = all.filterNot(keep)
    if (drop.nonEmpty) {
      val retained = snapshots().filter(col("snapshot_id").isin(keep.toSeq: _*))
      rewriteMeta(retained)
      val live = snapshots().select(explode(col("dirs"))).collect()
        .map(_.getString(0)).toSet
      Files.list(snapDir).iterator().asScala.toList
        .filterNot(p => live.contains(p.getFileName.toString))
        .foreach(deleteRecursively)
    }
    drop
  }

  /** Compaction: rewrite the live state into `targetFiles` files and
    * publish it as a new snapshot (merge-adjacent-files analog). */
  def compact(targetFiles: Int = 1): Long = synchronized {
    val id = nextId
    val df = read().repartition(targetFiles)
    val dir = writeData(id, df)
    publish(id, "compact", countOf(df), Seq(dir))
    id
  }

  private def rewriteMeta(retained: DataFrame): Unit = {
    val tmp = tableDir.resolve("_meta_new")
    retained.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
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
