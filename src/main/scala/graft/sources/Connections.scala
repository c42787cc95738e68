package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.config.ConnectionConfig
import graft.write.SqlSplitter

/** Connection initialization — the Spark analog of the reference's
  * per-connection init SQL + ATTACH model (SURVEY §2.1; reference
  * examples/flapi.yaml:30-36 attaches sqlite northwind, init SQL at
  * database_manager.cpp:272-302).
  *
  * A connection's `properties` drive what gets registered on the
  * session, keyed by `type`:
  *
  *  - `parquet`: `path` → one temp view per parquet table/dir;
  *  - `jdbc`: `url` (+ driver/user/password) and `tables` (comma
  *    list) → each table registered as `<prefix>_<table>` via the
  *    JDBC source. Spark pushes filters and prunes columns into the
  *    remote query; partitioned reads (partitionColumn/lowerBound/
  *    upperBound/numPartitions properties) fan a big table across
  *    executors instead of one connection;
  *  - object storage: any path with a scheme (s3a://, gs://, abfss://)
  *    goes straight to the Hadoop FS layer; `fs.*` properties are
  *    applied to the session's hadoopConfiguration (credentials,
  *    endpoints) — the equivalent of the reference's httpfs secrets.
  *
  * `init-sql` runs statement-by-statement through the quote-aware
  * splitter, like the reference executes connection init scripts.
  */
object Connections {

  def init(spark: SparkSession, conn: ConnectionConfig): Unit = {
    // credential resolution first (reference credential_manager.cpp):
    // environment discovery + typed per-connection credential props →
    // Hadoop conf; explicit raw fs.* below still wins (applied after)
    val cm = new CredentialManager()
    cm.loadFromEnvironment()
    typedCredentials(conn, cm)
    cm.configureHadoop(spark.sparkContext.hadoopConfiguration)
    // apply fs.* settings (object-storage credentials/endpoints);
    // values may be env:/file: refs so secrets stay out of the YAML
    conn.properties.foreach {
      case (k, v) if k.startsWith("fs.") =>
        spark.sparkContext.hadoopConfiguration.set(k, CredentialManager.resolveRef(v))
      case _ => ()
    }
    conn.properties.get("type") match {
      case Some("jdbc") => registerJdbc(spark, conn)
      case Some("parquet") =>
        conn.properties.get("path").foreach(p => registerParquetPath(spark, conn.name, p))
      case Some("csv") =>
        conn.properties.get("path").foreach(p => registerFilePath(spark, conn, "csv", p))
      case Some("json") =>
        conn.properties.get("path").foreach(p => registerFilePath(spark, conn, "json", p))
      case Some("orc") =>
        // columnar like parquet (predicate pushdown + column pruning
        // come from Spark's native ORC reader), registered through the
        // same per-file view mechanics as csv/json
        conn.properties.get("path").foreach(p => registerFilePath(spark, conn, "orc", p))
      case _ => ()
    }
    conn.initSql.foreach { sql =>
      SqlSplitter.split(sql).foreach(stmt => spark.sql(stmt).collect())
    }
  }

  /** Typed per-connection credential properties (the reference's
    * connection-level credential config): `s3-*` / `gcs-*` / `azure-*`
    * keys override environment discovery for THIS session. Values may
    * be `env:NAME` / `file:/path` references. */
  private def typedCredentials(conn: ConnectionConfig, cm: CredentialManager): Unit = {
    def p(k: String): String =
      conn.properties.get(k).map(CredentialManager.resolveRef(_)).getOrElse("")
    if (p("s3-access-key-id").nonEmpty || p("s3-endpoint").nonEmpty ||
        conn.properties.get("s3-auth").contains("instance_profile"))
      cm.setS3Credentials(S3Credentials(
        accessKeyId = p("s3-access-key-id"),
        secretAccessKey = p("s3-secret-access-key"),
        region = p("s3-region"),
        sessionToken = p("s3-session-token"),
        endpoint = p("s3-endpoint"),
        useSsl = !conn.properties.get("s3-use-ssl").contains("false"),
        credentialType =
          if (conn.properties.get("s3-auth").contains("instance_profile"))
            CredentialType.InstanceProfile
          else CredentialType.Environment))
    if (p("gcs-key-file").nonEmpty)
      cm.setGcsCredentials(GcsCredentials(
        serviceAccountKeyFile = p("gcs-key-file"), projectId = p("gcs-project")))
    if (p("azure-connection-string").nonEmpty)
      cm.setAzureCredentials(AzureCredentials(
        connectionString = p("azure-connection-string"),
        credentialType = CredentialType.ConnectionString))
    else if (p("azure-account-name").nonEmpty && p("azure-account-key").nonEmpty)
      cm.setAzureCredentials(AzureCredentials(
        accountName = p("azure-account-name"), accountKey = p("azure-account-key")))
  }

  /** Register `tables` from a JDBC source as `<name>_<table>` views. */
  def registerJdbc(spark: SparkSession, conn: ConnectionConfig): Unit = {
    val url = conn.properties.getOrElse("url",
      throw new IllegalArgumentException(s"jdbc connection ${conn.name}: missing url"))
    val tables = conn.properties.getOrElse("tables", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    tables.foreach { t =>
      var reader = spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", t)
      Seq("driver", "user", "password", "partitionColumn", "lowerBound",
        "upperBound", "numPartitions", "fetchsize").foreach { k =>
        // user/password may be env:/file: refs (credential manager) so
        // database credentials never sit inline in the YAML
        conn.properties.get(k).foreach(v => reader = reader.option(k,
          if (k == "user" || k == "password") CredentialManager.resolveRef(v) else v))
      }
      reader.load().createOrReplaceTempView(
        claimView(spark, viewName(conn.name, t), s"${conn.name}.$t"))
    }
  }

  /** `nw.Products` in reference templates → `nw_Products` view here
    * (temp views have no catalog dots). Both halves are sanitized: a
    * file-derived table like `daily-extract` or a dotted `my.data`, or
    * a dashed connection name, must yield a valid identifier instead
    * of failing createOrReplaceTempView at connection init. */
  private[sources] def ident(s: String): String = {
    val cleaned = s.replaceAll("[^A-Za-z0-9_]", "_")
    if (cleaned.isEmpty || cleaned.head.isDigit) "t_" + cleaned else cleaned
  }

  // Sanitization can collide ('prod-db' and 'prod.db' both map to
  // prod_db) and createOrReplaceTempView replaces silently — two
  // differently-named sources would quietly read each other's data.
  // Registration therefore records which ORIGINAL name owns each
  // sanitized view per session and fails init loudly on a clash.
  // Keyed on the session object itself through a WeakHashMap
  // (SparkSession keeps identity equals), so ownership lives exactly
  // as long as the session: no identityHashCode reuse after GC, no
  // unbounded growth in long-lived multi-session JVMs.
  private val viewOwners =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, String]]()

  private[sources] def claimView(
      spark: SparkSession, view: String, original: String): String = {
    val owners = viewOwners.synchronized {
      viewOwners.computeIfAbsent(spark,
        _ => scala.collection.concurrent.TrieMap.empty[String, String])
    }
    val owner = owners.getOrElseUpdate(view, original)
    if (owner != original)
      throw new IllegalArgumentException(
        s"view name collision: '$original' and '$owner' both sanitize to '$view'")
    view
  }

  def viewName(connName: String, table: String): String =
    s"${ident(connName)}_${table.replaceAll("[^A-Za-z0-9_]", "_")}"

  /** A directory (local or object-storage URI) of `<table>.parquet`
    * entries: register each as `<name>_<table>`. */
  def registerParquetPath(spark: SparkSession, name: String, path: String): Unit = {
    val dir = new java.io.File(path)
    if (dir.isDirectory) {
      dir.listFiles().filter(f => f.getName.endsWith(".parquet"))
        .foreach { f =>
          val table = f.getName.stripSuffix(".parquet")
          spark.read.parquet(f.getAbsolutePath)
            .createOrReplaceTempView(
              claimView(spark, viewName(name, table), s"$name.$table"))
        }
    } else {
      // single table or object-storage glob — Hadoop FS resolves it
      spark.read.parquet(path).createOrReplaceTempView(
        claimView(spark, ident(name), name))
    }
  }

  /** CSV/JSON sources (DuckDB's read_csv/read_json surface in the
    * reference's init SQL; here they're first-class connection types).
    * Reader options pass through as `option-<name>` connection
    * properties (e.g. `option-header: "true"`, `option-delimiter: ;`,
    * `option-multiLine: "true"`). Directory → one view per file,
    * single file / object-storage glob → one view. Schema inference is
    * a boot-time cost only; at 100 TB prefer an explicit `schema`
    * property (DDL string) so registration never scans data. */
  def registerFilePath(spark: SparkSession, conn: ConnectionConfig,
      format: String, path: String): Unit = {
    val opts = conn.properties.collect {
      case (k, v) if k.startsWith("option-") => k.stripPrefix("option-") -> v
    }
    def reader = {
      var r = spark.read.format(format).options(opts)
      conn.properties.get("schema").foreach(ddl => r = r.schema(ddl))
      // inference only when the caller gave no schema: csv needs it to
      // type columns at all; an explicit DDL schema always wins
      if (format == "csv" && !conn.properties.contains("schema"))
        r = r.option("inferSchema", "true")
      r
    }
    val ext = "." + format
    val dir = new java.io.File(path)
    if (dir.isDirectory) {
      dir.listFiles().filter(_.getName.endsWith(ext)).foreach { f =>
        val table = f.getName.stripSuffix(ext)
        reader.load(f.getAbsolutePath)
          .createOrReplaceTempView(
            claimView(spark, viewName(conn.name, table), s"${conn.name}.$table"))
      }
    } else {
      reader.load(path).createOrReplaceTempView(
        claimView(spark, ident(conn.name), conn.name))
    }
  }

  def table(spark: SparkSession, connName: String, tableName: String): DataFrame =
    spark.table(viewName(connName, tableName))
}
