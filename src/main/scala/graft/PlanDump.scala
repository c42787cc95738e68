package graft

/** Dev/judge artifact helper: writes `.explain("formatted")` output for the
  * named queries (or all) to <outDir>/<name>.txt. Used to produce the
  * committed plans/r14/<query>_{before,after}.txt evidence files.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> [suffix] [names...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = if (args.length > 2) args(2) else ""
    val only = args.drop(3).toSet
    val spark = GraftSession.build("graft-plandump")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/$name$suffix.txt"), plan)
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
