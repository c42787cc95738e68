package graft

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{name:sec,...}}.
  *
  * Each query is forced end-to-end with the noop sink (full computation,
  * no collect-to-driver, no disk write) — the honest analog of a cluster
  * job's full pipeline cost.
  *
  * The JSON line is printed to stdout AND written to BENCH.json (or
  * $SPARK_GRAFT_BENCH_OUT) so the driver can extract it without scraping
  * sbt log tails. A failed query is reported as -1 in "queries", counted
  * in "failures", still contributes nothing to the total, and makes the
  * process exit nonzero — a broken round can never post a faster total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-bench")

    def force(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.allDefs.map(_.name)
    // one warmup to pay session/codegen startup outside the measurement
    names.headOption.foreach(force)
    val results = names.map(n => n -> force(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failures = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$failures,"sf":"$sfDir"}"""
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
