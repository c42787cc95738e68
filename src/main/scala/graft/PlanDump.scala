package graft

/** Dev/judge artifact helper: writes `.explain("formatted")` output for the
  * named queries (or all) to <outDir>/<name>.txt. Used to produce the
  * committed plans/rNN/<query>_{before,after}.txt evidence files.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> [suffix] [names...]
  *
  * If suffix ends in "_executed", the query is additionally EXECUTED
  * (noop sink) and the dump is the post-execution adaptive plan
  * (`queryExecution.executedPlan` after AQE finalization) — the
  * artifact that shows runtime stage reuse (ReusedExchange /
  * shared ShuffleQueryStage ids), which a static explain cannot.
  *
  * Exits nonzero when ANY requested dump fails (r14 ADVICE: a silent
  * total failure must not look like a clean run), and stops the
  * session in a finally.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = if (args.length > 2) args(2) else ""
    val executed = suffix.endsWith("_executed")
    val only = args.drop(3).toSet
    val spark = GraftSession.build("graft-plandump")
    new java.io.File(outDir).mkdirs()
    var failures = 0
    try {
      SparkEntry.queries
        .filter { case (name, _) => only.isEmpty || only(name) }
        .foreach { case (name, fn) =>
          try {
            val df = fn(spark, sfDir)
            val plan =
              if (executed) {
                // force THIS QueryExecution (a noop write would plan a
                // separate one and leave this plan unexecuted/initial);
                // toRdd stays on InternalRows — no conversion cost
                df.queryExecution.toRdd.count()
                df.queryExecution.executedPlan.toString
              } else df.queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$outDir/$name$suffix.txt"), plan)
          } catch { case e: Throwable =>
            failures += 1
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
          }
        }
    } finally spark.stop()
    if (failures > 0) {
      System.err.println(s"[plandump] $failures dump(s) failed")
      sys.exit(1)
    }
  }
}
