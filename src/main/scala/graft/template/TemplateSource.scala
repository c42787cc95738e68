package graft.template

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Template/config source resolution (reference
  * sql_template_processor.cpp:64-110 + vfs_adapter.cpp): a template
  * source may be an inline-relative name, an absolute local path, or a
  * remote URI (s3://, gs://, hdfs://, https://…).
  *
  * Spark-first: the Hadoop FileSystem API IS the VFS the reference
  * builds by hand — the same `fs.s3a.*` credentials plumbed by
  * Connections.init for data reads serve template reads, so operators
  * configure object storage once. http(s) URIs read via JDK streams
  * (no Hadoop scheme registered for them by default).
  */
object TemplateSource {

  private val RemoteScheme = "^[A-Za-z][A-Za-z0-9+.-]*://.*$".r

  def isRemote(path: String): Boolean = RemoteScheme.matches(path)

  /** Resolve a template source against an optional base path, mirroring
    * getFullTemplatePath: remote/absolute sources pass through; a
    * source already carrying the base prefix is not re-joined. */
  def resolve(source: String, basePath: Option[String]): String = {
    if (isRemote(source)) return source
    if (Paths.get(source).isAbsolute) return source
    basePath.filter(_.nonEmpty) match {
      case None => source
      case Some(base) =>
        val sep = if (base.endsWith("/")) base else base + "/"
        if (source.startsWith(sep)) source
        else sep + source
    }
  }

  /** Read the resolved source's content. Scheme dispatch:
    * http(s) → JDK URL stream; any other `scheme://` → Hadoop
    * FileSystem (file, hdfs, s3a, gs… — whatever the session's Hadoop
    * conf can bind); bare path → local filesystem. */
  def load(spark: SparkSession, source: String, basePath: Option[String] = None): String = {
    // path_validator.cpp parity: decode-then-check traversal rejection
    // and the remote scheme allowlist run before any I/O — template
    // sources are operator-settable at runtime (config API / MCP tools)
    PathValidator.validate(source, basePath) match {
      case Left(reason) =>
        throw new SecurityException(s"template source rejected: $reason")
      case Right(_) => ()
    }
    val full = resolve(source, basePath)
    if (full.startsWith("http://") || full.startsWith("https://")) {
      val conn = new java.net.URL(full).openConnection()
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(30000)
      val in = conn.getInputStream
      try new String(in.readAllBytes(), UTF_8) finally in.close()
    } else if (isRemote(full)) {
      val uri = java.net.URI.create(full)
      val fs = FileSystem.get(uri, spark.sparkContext.hadoopConfiguration)
      val in = fs.open(new HPath(uri))
      try new String(in.readAllBytes(), UTF_8) finally in.close()
    } else {
      val p = Paths.get(full)
      if (!Files.exists(p))
        throw new java.io.FileNotFoundException(s"Template file not found: $full")
      new String(Files.readAllBytes(p), UTF_8)
    }
  }
}
