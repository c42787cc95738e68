package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The persisted ANN index's pruning contract: a probe over
  * `partitionBy(cell)` files opens ONLY its probed cells'
  * directories — asserted from the actual `inputFiles` the scan
  * resolves, not just plan text. This is the evidence behind every
  * "a probe prunes to nprobe cells' files" claim in the ANN
  * operators' 100 TB notes. */
class AnnIndexStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("ann-index-store-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(graft.functions.GraftFunctions.register)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("probe scan opens only the probed cells' files and matches the in-session index") {
    val full = graft.queries.EmbeddingQueries.codedIndex(spark, sf)
    val cells = full.select("cell").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(cells.size >= 4, s"fixture should spread cells: $cells")
    val probed = cells.take(2)

    val scan = AnnIndexStore.probeCodes(spark, sf, probed)
    // file-level pruning, measured from the EXECUTED scan's metrics
    // (DataFrame.inputFiles lists the unpruned relation, so it cannot
    // witness pruning)
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect() // drive THIS queryExecution so its metric populates
                   // (count() would execute a separate aggregate plan)
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan // AQE wrapper has no children; unwrap the final plan
        case p => p
      }
      plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head.metrics("numFiles").value
    }
    val prunedFiles = scannedFiles(scan)
    val allFiles = scannedFiles(AnnIndexStore.probeCodes(spark, sf, cells))
    assert(prunedFiles > 0)
    assert(prunedFiles < allFiles,
      s"pruning opened as many files as a full scan ($prunedFiles vs $allFiles)")
    // the plan carries the partition predicate, not a post-scan filter
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"no partition filter in the probe plan:\n$plan")

    // row-level equivalence with the in-session coded index
    val got = scan.select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val want = full.filter(col("cell").isin(probed: _*))
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == want)
    // codes round-trip bit-identically through the layout
    val codesGot = scan.orderBy("vec_id").select("code_0", "code_7").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    val codesWant = full.filter(col("cell").isin(probed: _*))
      .orderBy("vec_id").select("code_0", "code_7").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(codesGot == codesWant)
  }

  test("ensure is write-once per (session, dir)") {
    val p1 = AnnIndexStore.ensure(spark, sf)
    val p2 = AnnIndexStore.ensure(spark, sf)
    assert(p1 == p2)
  }

  test("compact resolves at-least-once duplicates keep-latest and re-clusters cells") {
    val s2 = spark
    import s2.implicits._
    // an isolated corpus dir so the shared-session index for `sf` is untouched
    val dir = java.nio.file.Files.createTempDirectory("ann_compact").toString
    (0 until 200).map(i => (i.toLong, i % 4,
        Array.tabulate(64)(d => ((i * 17 + d * 3) % 23 - 11).toFloat / 11f)))
      .toDF("vec_id", "label", "embedding")
      .write.parquet(s"$dir/embeddings.parquet")
    val path = AnnIndexStore.ensure(spark, dir)
    val base = spark.read.parquet(path)

    // a replayed append (bit-identical rows for ids 0-9) plus a
    // RE-EMBEDDED vector: id 5 arrives again with different codes
    val replay = base.filter(col("vec_id") < 10)
    Thread.sleep(1100) // distinct file mtime even on coarse filesystems
    AnnIndexStore.appendBatch(path, replay)
    val updated5 = base.filter(col("vec_id") === 5)
      .withColumn("code_0", lit(99))
    Thread.sleep(1100)
    AnnIndexStore.appendBatch(path, updated5)

    assert(spark.read.parquet(path).count() == 200 + 10 + 1)
    val compacted = AnnIndexStore.compact(spark, path)
    val c = spark.read.parquet(compacted)
    assert(c.count() == 200, "compaction must keep one row per vec_id")
    // keep-LATEST: the re-embedded row wins
    assert(c.filter(col("vec_id") === 5).select("code_0")
      .collect().head.getInt(0) == 99)
    // re-clustered: one file per live cell directory, pruning intact
    val cells = c.select("cell").distinct().count()
    assert(c.inputFiles.length == cells,
      s"${c.inputFiles.length} files for $cells cells after compaction")
    val pruned = spark.read.parquet(compacted).filter(col("cell") === c
      .select("cell").head().getInt(0))
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
  }
}
