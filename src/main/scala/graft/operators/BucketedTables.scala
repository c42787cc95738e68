package graft.operators

import org.apache.spark.sql.SparkSession

import graft.Tables

/** Bucketed copies of the fact/dim tables for shuffle-free co-located
  * joins.
  *
  * At 100 TB the orders↔customer equi join is the minimal-movement plan
  * only if BOTH sides must move; when the same join key is hit by many
  * queries (exactly the reference's serving pattern — every customer
  * endpoint joins on custkey, flapi caches materialize per endpoint,
  * /root/reference/src/cache_manager.cpp), pre-bucketing both tables on
  * the key makes every subsequent join exchange-free: Spark's bucketed
  * scan exposes HashPartitioning(custkey, n) so SortMergeJoin needs no
  * Exchange and (with sortBy) no Sort. One write-time shuffle amortized
  * over every future query — the same trade the reference makes with
  * its DuckDB cache tables, re-expressed as Spark physical layout.
  *
  * Tables are written once per (session, source-dir) as EXTERNAL
  * bucketed parquet tables under the session's WAREHOUSE dir — on a
  * cluster java.io.tmpdir is per-node local disk (the layout must land
  * on shared storage to serve other executors), and a fixed /tmp path
  * is both raceable between JVMs sharing a source dir and
  * pre-creatable by other users on a multi-tenant host. The path also
  * carries a per-JVM nonce (user + pid), so concurrent JVMs each build
  * their own layout instead of overwriting each other mid-query; the
  * one-time write is per-JVM-amortized, which is the serving pattern
  * anyway (one long-lived session per server).
  */
object BucketedTables {

  val NumBuckets = 8

  private val built = new DirMemo[(String, String)]()

  private lazy val jvmNonce = {
    val user = String.valueOf(System.getProperty("user.name", "u"))
      .replaceAll("[^A-Za-z0-9_]", "_")
    s"${user}_${ProcessHandle.current().pid()}"
  }

  // The pid nonce keeps concurrent JVMs from clobbering each other,
  // but without cleanup each restart would strand a full table copy on
  // shared storage. A shutdown hook deletes THIS JVM's nonce dirs
  // (only ever our own — no cross-JVM race); hard kills can still
  // strand a copy, so roots carry the nonce pattern an operator (or a
  // maintenance job) can sweep by dead pid.
  private val createdRoots =
    new java.util.concurrent.ConcurrentLinkedQueue[(org.apache.hadoop.fs.Path,
      org.apache.hadoop.conf.Configuration)]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      createdRoots.forEach { case (root, conf) =>
        try root.getFileSystem(conf).delete(root, true)
        catch { case _: Throwable => () } // best-effort on teardown
      }
    }, "graft-bucketed-cleanup"))
  }

  /** Ensure bucketed `orders`/`customer` tables exist for `dir`; returns
    * their catalog names. */
  def ensure(spark: SparkSession, dir: String): (String, String) =
    built.getOrElseUpdate(spark, dir) {
      Tables.register(spark, dir)
      // full-width content hash: String.hashCode is 32-bit and
      // collision-prone, and a collision here silently points two
      // source dirs at the same table files
      val tag = java.security.MessageDigest.getInstance("SHA-256")
        .digest(dir.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString +
        "_" + SessionMemo.generationOf(spark, dir)
      val ordersT = s"graft_b_orders_$tag"
      val custT = s"graft_b_customer_$tag"
      // Hadoop Path, not java.nio: the warehouse dir is a URI and may
      // point at hdfs:// or s3a:// on a real deployment
      val warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", spark.sessionState.conf.warehousePath)
      val root = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(warehouse), s"graft_bucketed/$jvmNonce/$tag")
      createdRoots.add((root,
        new org.apache.hadoop.conf.Configuration(
          spark.sparkContext.hadoopConfiguration)))
      write(spark, "orders", ordersT, "o_custkey",
        new org.apache.hadoop.fs.Path(root, "orders").toString)
      write(spark, "customer", custT, "c_custkey",
        new org.apache.hadoop.fs.Path(root, "customer").toString)
      (ordersT, custT)
    }

  private def write(spark: SparkSession, view: String, table: String,
      key: String, path: String): Unit = {
    // drop a stale catalog entry (e.g. a previous session's) before
    // overwriting; the data dir itself is replaced by mode("overwrite")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.table(view)
      .write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(NumBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }
}
