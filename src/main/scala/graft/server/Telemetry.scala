package graft.server

/** Application start/stop telemetry (reference flapi_telemetry.cpp):
  * a pluggable backend fired at server start/stop, disabled either
  * programmatically or via the `GRAFT_DISABLE_TELEMETRY` environment
  * variable (same 1/true/yes spelling as the reference's
  * DATAZOO_DISABLE_TELEMETRY). The default backend appends events to
  * a local JSONL file — this build has zero egress; a network backend
  * (the reference posts to PostHog) would implement the same trait.
  * Failures are swallowed: telemetry must never break serving.
  */
trait TelemetryBackend {
  def captureStart(appName: String, version: String): Unit
  def captureStop(appName: String, version: String): Unit
}

/** Local JSONL sink (append-only; queryable with spark.read.json like
  * the request audit log). */
final class FileBackend(path: java.nio.file.Path) extends TelemetryBackend {
  private def write(event: String, app: String, version: String): Unit =
    try {
      val line = s"""{"event":"$event","app":"$app","version":"$version","ts":${System.currentTimeMillis()}}""" + "\n"
      java.nio.file.Files.writeString(path, line,
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    } catch { case _: Exception => () }
  override def captureStart(app: String, version: String): Unit = write("start", app, version)
  override def captureStop(app: String, version: String): Unit = write("stop", app, version)
}

final class Telemetry(
    backend: TelemetryBackend,
    enabled: Boolean = true,
    env: String => Option[String] = n => sys.env.get(n)) {

  val AppName = "graft"

  def disabled: Boolean =
    !enabled || env("GRAFT_DISABLE_TELEMETRY")
      // case-insensitive: TRUE/Yes must honor the privacy opt-out too
      .map(_.toLowerCase).exists(v => v == "1" || v == "true" || v == "yes")

  def notifyStart(version: String): Unit =
    if (!disabled) try backend.captureStart(AppName, version)
    catch { case _: Exception => () }

  def notifyStop(version: String): Unit =
    if (!disabled) try backend.captureStop(AppName, version)
    catch { case _: Exception => () }
}
