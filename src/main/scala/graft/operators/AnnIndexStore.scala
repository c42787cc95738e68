package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF-flat+PQ index layout — the filesystem half of the ANN
  * serving story: the coded corpus (vec_id, cell, v, nrm, code_0..7
  * from EmbeddingQueries.codedIndex) written `partitionBy(cell)`, so a
  * probe's candidate scan PRUNES to its nprobe cells' DIRECTORIES.
  * At 100 TB this is the difference between "the probe joins a
  * cell-filtered scan of everything" and "the probe opens nprobe/K of
  * the index files": Spark's partition pruning turns the
  * `cell IN (...)` predicate into PartitionFilters, and zero data
  * files outside the probed cells are touched (AnnIndexStoreSpec
  * asserts this from the executed scan's numFiles metric; PlanSpec
  * locks it on the served ann_ivf_topk / ann_ivfpq_adc plans, which
  * read this store since r11). Column pruning is the other half: the
  * ADC stage selects only the code bytes, the flat/rerank stages the
  * vector — the same files serve both without reading the other's
  * columns.
  *
  * The layout lands under the session warehouse with the same per-JVM
  * nonce + shutdown-cleanup discipline as [[BucketedTables]] (shared
  * storage on a cluster; concurrent JVMs never clobber each other;
  * this JVM's copies are removed on exit), plus a SESSION token in the
  * path: two sessions in one JVM over the same dir each build their
  * own copy, so a second session's overwrite can never rewrite a
  * directory the first is still probing (r10 ADVICE). One write-time
  * pass amortized over every probe; the write clusters by cell
  * (repartition on the partition key) so each cell directory holds a
  * bounded file count rather than one file per input partition — at
  * deployment scale the repartition key widens to (cell, fileBucket)
  * to hold file sizes constant as the corpus grows.
  */
object AnnIndexStore {

  private val built = new DirMemo[String]()

  private lazy val jvmNonce = {
    val user = String.valueOf(System.getProperty("user.name", "u"))
      .replaceAll("[^A-Za-z0-9_]", "_")
    s"${user}_${ProcessHandle.current().pid()}"
  }

  private val createdRoots =
    new java.util.concurrent.ConcurrentLinkedQueue[(org.apache.hadoop.fs.Path,
      org.apache.hadoop.conf.Configuration)]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      createdRoots.forEach { case (root, conf) =>
        try root.getFileSystem(conf).delete(root, true)
        catch { case _: Throwable => () } // best-effort on teardown
      }
    }, "graft-annindex-cleanup"))
  }

  /** Ensure the partitioned index exists for `dir`; returns its path.
    * Written once per (session, source dir) — the path carries the
    * session token, so concurrent sessions in one JVM never share (or
    * clobber) a directory. */
  def ensure(spark: SparkSession, dir: String): String =
    built.getOrElseUpdate(spark, dir) {
      // generation in the tag: a mid-session rewrite of `dir` lands a
      // FRESH index directory (the DirMemo key already misses), so a
      // probe holding the old frame never races the rebuild
      val tag = java.security.MessageDigest.getInstance("SHA-256")
        .digest(dir.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString +
        "_" + SessionMemo.generationOf(spark, dir)
      val sess = SessionMemo.sessionToken(spark).take(8)
      val warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", spark.sessionState.conf.warehousePath)
      val root = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(warehouse), s"graft_annindex/$jvmNonce/$sess/$tag")
      createdRoots.add((root, spark.sparkContext.hadoopConfiguration))
      graft.queries.EmbeddingQueries.codedIndex(spark, dir)
        .repartition(col("cell")) // cluster by the partition key: bounded
                                  // files per cell dir, not files × cells
        .write.mode("overwrite").partitionBy("cell")
        .parquet(root.toString)
      root.toString
    }

  private val frames = new DirMemo[DataFrame]()

  /** Codes for the probed cells only — the pruned candidate scan a
    * serving probe runs. The `cell IN (...)` predicate resolves at
    * PLANNING time against the partition directories. The analyzed
    * frame is memoized per (session, dir, cells): file listing and
    * footer schema inference run once per session, not once per query
    * invocation — every execution still runs the real pruned
    * FileSourceScan (nothing is persisted in memory; the plan locks
    * see the scan). */
  def probeCodes(spark: SparkSession, dir: String, cells: Seq[Int]): DataFrame = {
    // the INDEX root's own generation joins the key (on top of the
    // source-dir generation DirMemo already folds in): streaming
    // appendBatch writes land under the index root, not the source
    // dir, so without it a session that had already probed would pin
    // the pre-ingest file listing and silently skip streamed vectors
    val root = ensure(spark, dir)
    frames.getOrElseUpdate(spark, dir,
      SessionMemo.generationOf(spark, root) + "|" + cells.sorted.mkString(",")) {
      spark.read.parquet(root).filter(col("cell").isin(cells: _*))
    }
  }

  /** The standing index, unfiltered — for consumers that need a
    * non-probe view (e.g. the doc → cell map for cluster labeling);
    * memoized like the pruned frames so listing/schema resolve once. */
  def fullIndex(spark: SparkSession, dir: String): DataFrame = {
    val root = ensure(spark, dir)
    frames.getOrElseUpdate(spark, dir,
      SessionMemo.generationOf(spark, root) + "|*") {
      spark.read.parquet(root)
    }
  }

  /** Append a CODED batch (vec_id, cell, label, v, nrm, code_*,
    * code8_* — EmbeddingQueries.codeBatch output) to `dir`'s standing
    * index: new files land inside the existing cell partition
    * directories, so every later pruned probe covers the ingested
    * vectors with the same `cell IN (…)` partition filter. This is the
    * continuous-ingest half of the index lifecycle ("search now,
    * compact later"): batches are coded with the index's FROZEN
    * quantizers; re-training and file merge are compaction-time
    * events.
    *
    * Delivery is AT-LEAST-ONCE under streaming replay (a re-delivered
    * batch appends its rows again — parquet appends are not
    * idempotent); the ingest contract is the snapshot-append stream's:
    * dedup at read (keep-latest on vec_id) or at compaction. Readers
    * that memoized a pruned frame BEFORE the append keep their
    * snapshot (Spark relations pin their file listing); a serving
    * session sees ingested rows on its next fresh read — the spec
    * drives one explicitly.
    *
    * Takes the resolved index PATH, not the source dir: streaming
    * micro-batches execute on a CLONED session whose memos are empty —
    * resolving `ensure` there would build (and append into) a second
    * index under the clone's session token. The caller resolves the
    * path once on the driver session at stream construction. */
  def appendBatch(path: String, coded: DataFrame): Unit =
    coded.write.mode("append").partitionBy("cell").parquet(path)

  /** Compact an ingested index: merge each cell's accumulated append
    * files and resolve the at-least-once duplicates — KEEP-LATEST per
    * vec_id by the file modification time each row arrived in (the
    * `_metadata` file source column; a replayed batch's rows are
    * bit-identical so any survivor is correct, a re-embedded vector's
    * newer row wins). Writes a NEW root (cell-clustered, one file per
    * cell directory) and returns its path — compaction never rewrites
    * files a concurrent probe may hold open; a deployment swaps its
    * serving pointer to the returned path the way SnapshotTable swaps
    * snapshots (pointer update, old files expire later). The window
    * sort runs per cell partition at maintenance time, off the serving
    * path — at 100 TB this is the scheduled CacheManager.compactAll
    * discipline applied to the vector index. */
  def compact(spark: SparkSession, path: String): String = {
    val df = spark.read.parquet(path)
      .withColumn("__mt", col("_metadata.file_modification_time"))
      .withColumn("__fp", col("_metadata.file_path"))
    // file_path breaks mtime ties (filesystems with 1 s mtime
    // granularity make same-tick appends common): the pick among tied
    // files is then DETERMINISTIC across compaction runs — replayed
    // duplicates are bit-identical so any survivor is correct, and a
    // re-embedded vector landing in the same tick keeps a stable
    // winner instead of a run-dependent one
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("__mt").desc, col("__fp").desc)
    val out = new org.apache.hadoop.fs.Path(
      path + "_compact_" + java.util.UUID.randomUUID().toString.take(8))
    createdRoots.add((out, spark.sparkContext.hadoopConfiguration))
    df.withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("__rn") === 1).drop("__mt", "__fp", "__rn")
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(out.toString)
    out.toString
  }
}
