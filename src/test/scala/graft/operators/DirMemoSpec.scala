package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The generation-token staleness fix (r10 verdict #5): dir-keyed
  * memos previously served a checkpointed frame of DEAD data if the
  * directory was rewritten under the same path mid-session. DirMemo
  * folds [[SessionMemo.generationOf]] into the key, so a rewrite makes
  * the next read miss and rebuild — proven here in both directions
  * (unchanged dir → cached; rewritten dir → fresh), plus end-to-end on
  * AnnIndexStore (a rewrite lands a fresh index directory with the new
  * data, never overwriting the one an old probe may still hold). */
class DirMemoSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("dir-memo-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(graft.functions.GraftFunctions.register)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("rewriting a dir mid-session invalidates the memo; an untouched dir stays cached") {
    val dir = Files.createTempDirectory("dirmemo").toString
    Files.writeString(java.nio.file.Paths.get(dir, "data.txt"), "one")
    val memo = new DirMemo[Int]()
    var builds = 0
    def get(): Int = memo.getOrElseUpdate(spark, dir) { builds += 1; builds }

    assert(get() == 1 && get() == 1 && builds == 1,
      "unchanged dir must serve the cached value")
    // rewrite with different content/length — the generation changes
    Files.writeString(java.nio.file.Paths.get(dir, "data.txt"), "two-longer")
    assert(get() == 2 && builds == 2,
      "rewritten dir must miss and rebuild")
    assert(get() == 2 && builds == 2, "new generation caches again")
    // a NEW file (append-style ingest) also advances the generation
    Files.writeString(java.nio.file.Paths.get(dir, "extra.txt"), "x")
    assert(get() == 3 && builds == 3)
  }

  test("generation TTL bounds the walk rate; default 0 stays always-fresh") {
    val dir = Files.createTempDirectory("genttl").toString
    Files.writeString(java.nio.file.Paths.get(dir, "a.txt"), "one")
    val g1 = SessionMemo.generationOf(spark, dir)
    spark.conf.set("spark.graft.generation.ttlMs", "60000")
    try {
      val g2 = SessionMemo.generationOf(spark, dir) // computes + caches
      assert(g2 == g1)
      Files.writeString(java.nio.file.Paths.get(dir, "a.txt"), "two-longer")
      val g3 = SessionMemo.generationOf(spark, dir)
      assert(g3 == g2,
        "within the TTL the cached token is reused — the documented trade")
    } finally spark.conf.set("spark.graft.generation.ttlMs", "0")
    val g4 = SessionMemo.generationOf(spark, dir)
    assert(g4 != g1, "with the TTL off the rewrite is visible immediately")
  }

  test("AnnIndexStore rebuilds a FRESH index path when the source dir is rewritten") {
    val s2 = spark
    import s2.implicits._
    val dir = Files.createTempDirectory("dirmemo_ann").toString
    def writeCorpus(n: Int): Unit =
      (0 until n).map(i => (i.toLong, i % 3,
          Array.tabulate(64)(d => ((i * 31 + d) % 17 - 8).toFloat / 8f)))
        .toDF("vec_id", "label", "embedding")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    writeCorpus(120)
    val p1 = AnnIndexStore.ensure(spark, dir)
    val n1 = spark.read.parquet(p1).count()
    assert(n1 == 120)

    writeCorpus(150) // rewrite in place, same dir, more rows
    val p2 = AnnIndexStore.ensure(spark, dir)
    assert(p2 != p1, "rewrite must land a fresh index directory")
    assert(spark.read.parquet(p2).count() == 150,
      "rebuilt index must reflect the NEW data")
    // the old index directory is untouched (an in-flight probe holding
    // the old frame keeps reading consistent data until session end)
    assert(spark.read.parquet(p1).count() == 120)
  }
}
