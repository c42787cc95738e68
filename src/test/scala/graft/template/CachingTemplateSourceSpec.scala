package graft.template

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Remote-file TTL cache parity (reference caching_file_provider.cpp):
  * remote sources cache for the TTL and evict LRU past the byte
  * budget; local sources always read through. file:// is a remote
  * scheme under the VFS dispatch, so the whole behavior tests offline
  * with a fake clock — no sleeping, no network. */
class CachingTemplateSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("caching-template-source-spec")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("remote loads cache within TTL, expire after it, and pick up the edit") {
    val dir = Files.createTempDirectory("graft_tmplcache")
    val f = dir.resolve("t.sql")
    Files.writeString(f, "SELECT 1")
    var now = 0L
    val c = new CachingTemplateSource(
      FileCacheConfig(ttlSeconds = 10), clock = () => now)
    val uri = s"file://$f"
    assert(c.load(spark, uri) == "SELECT 1")
    // edit the underlying file: within the TTL the CACHED content serves
    Files.writeString(f, "SELECT 2")
    assert(c.load(spark, uri) == "SELECT 1")
    assert(c.stats.hits == 1 && c.stats.misses == 1)
    // past the TTL the edit is picked up — the reference's remote-edit
    // pickup semantics, no reload call involved
    now = 11L * 1000000000L
    assert(c.load(spark, uri) == "SELECT 2")
    assert(c.stats.misses == 2)
  }

  test("local paths never cache (always fresh), shouldCache gates on scheme") {
    val dir = Files.createTempDirectory("graft_tmplcache_local")
    val f = dir.resolve("l.sql")
    Files.writeString(f, "SELECT 1")
    val c = new CachingTemplateSource()
    assert(!c.shouldCache(f.toString))
    assert(c.shouldCache(s"file://$f") && c.shouldCache("s3://b/t.sql"))
    assert(c.load(spark, f.toString) == "SELECT 1")
    Files.writeString(f, "SELECT 2")
    assert(c.load(spark, f.toString) == "SELECT 2") // no stale serve
    assert(c.stats.hits == 0 && c.stats.misses == 0 && c.stats.entries == 0)
  }

  test("byte budget evicts least-recently-used entries first") {
    val dir = Files.createTempDirectory("graft_tmplcache_lru")
    val a = dir.resolve("a.sql"); Files.writeString(a, "A" * 40)
    val b = dir.resolve("b.sql"); Files.writeString(b, "B" * 40)
    val big = dir.resolve("big.sql"); Files.writeString(big, "C" * 60)
    var now = 0L
    val c = new CachingTemplateSource(
      FileCacheConfig(ttlSeconds = 1000, maxSizeBytes = 100), clock = () => now)
    c.load(spark, s"file://$a"); now += 1
    c.load(spark, s"file://$b"); now += 1
    c.load(spark, s"file://$a"); now += 1 // refresh a's recency
    c.load(spark, s"file://$big")          // needs 60 -> evicts b (LRU), keeps a
    val st = c.stats
    assert(st.evictions == 1, st)
    assert(st.entries == 2 && st.sizeBytes == 100, st)
    // a still cached (hit), b gone (miss)
    val hitsBefore = c.stats.hits
    c.load(spark, s"file://$a")
    assert(c.stats.hits == hitsBefore + 1)
    val missesBefore = c.stats.misses
    c.load(spark, s"file://$b")
    assert(c.stats.misses == missesBefore + 1)
  }

  test("invalidate drops one path; an over-budget file serves uncached") {
    val dir = Files.createTempDirectory("graft_tmplcache_inv")
    val f = dir.resolve("t.sql"); Files.writeString(f, "SELECT 1")
    val c = new CachingTemplateSource(FileCacheConfig(maxSizeBytes = 4))
    // 8 bytes > 4-byte budget: served but not cached (reference keeps
    // over-budget files uncached rather than evicting everything)
    assert(c.load(spark, s"file://$f") == "SELECT 1")
    assert(c.stats.entries == 0)
    val c2 = new CachingTemplateSource()
    c2.load(spark, s"file://$f")
    assert(c2.stats.entries == 1)
    c2.invalidate(s"file://$f")
    assert(c2.stats.entries == 0)
  }
}
