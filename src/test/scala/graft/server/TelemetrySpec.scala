package graft.server

import org.scalatest.funsuite.AnyFunSuite

class TelemetrySpec extends AnyFunSuite {

  private final class Recorder extends TelemetryBackend {
    val events = scala.collection.mutable.ListBuffer.empty[String]
    override def captureStart(app: String, v: String): Unit = events += s"start:$app:$v"
    override def captureStop(app: String, v: String): Unit = events += s"stop:$app:$v"
  }

  test("start/stop captured when enabled") {
    val r = new Recorder
    val t = new Telemetry(r, enabled = true, env = _ => None)
    t.notifyStart("0.1"); t.notifyStop("0.1")
    assert(r.events.toList == List("start:graft:0.1", "stop:graft:0.1"))
  }

  test("env opt-out (1/true/yes) and programmatic disable suppress events") {
    Seq("1", "true", "yes").foreach { v =>
      val r = new Recorder
      new Telemetry(r, enabled = true,
        env = n => if (n == "GRAFT_DISABLE_TELEMETRY") Some(v) else None)
        .notifyStart("0.1")
      assert(r.events.isEmpty, s"opt-out value '$v' did not suppress")
    }
    // "0" does NOT disable (same parsing as the reference)
    val r0 = new Recorder
    new Telemetry(r0, enabled = true,
      env = n => if (n == "GRAFT_DISABLE_TELEMETRY") Some("0") else None)
      .notifyStart("0.1")
    assert(r0.events.nonEmpty)
    val rOff = new Recorder
    new Telemetry(rOff, enabled = false, env = _ => None).notifyStart("0.1")
    assert(rOff.events.isEmpty)
  }

  test("file backend appends queryable JSONL; backend failure never propagates") {
    val p = java.nio.file.Files.createTempFile("graft_telemetry", ".jsonl")
    val t = new Telemetry(new FileBackend(p), enabled = true, env = _ => None)
    t.notifyStart("0.1"); t.notifyStop("0.1")
    val lines = java.nio.file.Files.readAllLines(p)
    assert(lines.size() == 2)
    assert(lines.get(0).contains("\"event\":\"start\""))
    // a throwing backend is swallowed
    val boom = new TelemetryBackend {
      override def captureStart(a: String, v: String): Unit = throw new RuntimeException("x")
      override def captureStop(a: String, v: String): Unit = throw new RuntimeException("x")
    }
    new Telemetry(boom, enabled = true, env = _ => None).notifyStart("0.1") // must not throw
  }
}
