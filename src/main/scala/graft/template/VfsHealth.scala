package graft.template

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Storage-backend health probe (reference vfs_health_checker.cpp):
  * per-backend accessibility + latency for the paths serving depends
  * on (config dir, template dir, remote template URIs), surfaced
  * through the config service so operators see a broken mount or
  * expired object-store credential as a named finding, not a 500 on
  * the next template reload.
  *
  * Scheme dispatch mirrors TemplateSource.load: http(s) probes with a
  * HEAD-ish open, other `scheme://` paths ask the Hadoop FileSystem
  * (whatever the session's conf can bind — s3a, gs, hdfs…), bare
  * paths check the local filesystem. Directories count as accessible
  * when they exist; a probe failure is captured as the backend's
  * error string with the elapsed latency (timeouts included).
  */
object VfsHealth {

  final case class BackendStatus(
      name: String, path: String, scheme: String,
      accessible: Boolean, latencyMs: Long, error: String)

  final case class StorageHealth(
      healthy: Boolean, totalLatencyMs: Long, backends: Seq[BackendStatus])

  def scheme(path: String): String =
    if (path.startsWith("https://")) "https"
    else if (path.startsWith("http://")) "http"
    else if (TemplateSource.isRemote(path)) path.takeWhile(_ != ':').toLowerCase
    else "local"

  def checkPath(spark: SparkSession, name: String, path: String): BackendStatus = {
    val sch = if (path.isEmpty) "local" else scheme(path)
    if (path.isEmpty)
      return BackendStatus(name, path, sch, accessible = false, 0L, "Path is empty")
    val t0 = System.nanoTime()
    def elapsed = (System.nanoTime() - t0) / 1000000L
    try {
      val ok = sch match {
        case "http" | "https" =>
          val conn = new java.net.URL(path).openConnection()
            .asInstanceOf[java.net.HttpURLConnection]
          conn.setRequestMethod("HEAD")
          conn.setConnectTimeout(5000)
          conn.setReadTimeout(5000)
          val code = conn.getResponseCode
          conn.disconnect()
          code < 400
        case "local" =>
          Files.exists(Paths.get(path))
        case _ =>
          val uri = java.net.URI.create(path)
          val fs = FileSystem.get(uri, spark.sparkContext.hadoopConfiguration)
          fs.exists(new HPath(uri))
      }
      BackendStatus(name, path, sch, ok, elapsed,
        if (ok) "" else "Path not found or not accessible")
    } catch {
      case e: Exception =>
        BackendStatus(name, path, sch, accessible = false, elapsed,
          Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
    }
  }

  /** healthy ⇔ every named backend is accessible. */
  def checkHealth(spark: SparkSession, paths: Seq[(String, String)]): StorageHealth = {
    val backends = paths.map { case (n, p) => checkPath(spark, n, p) }
    StorageHealth(backends.forall(_.accessible), backends.map(_.latencyMs).sum, backends)
  }
}
