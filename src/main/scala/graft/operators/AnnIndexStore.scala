package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index layout — the filesystem half of the ANN
  * serving story the in-session operators assume: the coded corpus
  * (vec_id, cell, code_0..7 from EmbeddingQueries.codedIndex) written
  * `partitionBy(cell)`, so a probe's candidate scan PRUNES to its
  * nprobe cells' DIRECTORIES. At 100 TB this is the difference between
  * "the probe joins a cell-filtered scan of everything" and "the probe
  * opens nprobe/K of the index files": Spark's partition pruning turns
  * the `cell IN (...)` predicate into PartitionFilters, and zero data
  * files outside the probed cells are touched (AnnIndexStoreSpec
  * asserts this from `inputFiles`, not from plan text alone).
  *
  * The layout lands under the session warehouse with the same per-JVM
  * nonce + shutdown-cleanup discipline as [[BucketedTables]] (shared
  * storage on a cluster; concurrent JVMs never clobber each other;
  * this JVM's copies are removed on exit). One write-time shuffle-free
  * pass amortized over every probe — the write IS map-side because the
  * coded frame is already materialized.
  */
object AnnIndexStore {

  private val built = new SessionMemo[String, String]()

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
    * Written once per (session, source dir). */
  def ensure(spark: SparkSession, dir: String): String =
    built.getOrElseUpdate(spark, dir) {
      val tag = java.security.MessageDigest.getInstance("SHA-256")
        .digest(dir.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
      val warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", spark.sessionState.conf.warehousePath)
      val root = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(warehouse), s"graft_annindex/$jvmNonce/$tag")
      createdRoots.add((root, spark.sparkContext.hadoopConfiguration))
      graft.queries.EmbeddingQueries.codedIndex(spark, dir)
        .write.mode("overwrite").partitionBy("cell")
        .parquet(root.toString)
      root.toString
    }

  /** Codes for the probed cells only — the pruned candidate scan a
    * serving probe runs. The `cell IN (...)` predicate resolves at
    * PLANNING time against the partition directories. */
  def probeCodes(spark: SparkSession, dir: String, cells: Seq[Int]): DataFrame =
    spark.read.parquet(ensure(spark, dir))
      .filter(col("cell").isin(cells: _*))
}
