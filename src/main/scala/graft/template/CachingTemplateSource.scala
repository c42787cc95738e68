package graft.template

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession

/** Remote-file cache policy (reference caching_file_provider.hpp
  * FileCacheConfig: enabled + TTL + byte budget). */
final case class FileCacheConfig(
    enabled: Boolean = true,
    ttlSeconds: Long = 300,
    maxSizeBytes: Long = 10L * 1024 * 1024)

/** Observable cache state (reference CacheStats counters). */
final case class FileCacheStats(
    hits: Long, misses: Long, evictions: Long,
    entries: Int, sizeBytes: Long)

/** TTL + size-bounded LRU cache over [[TemplateSource.load]] for
  * REMOTE sources — the reference's CachingFileProvider semantics
  * (/root/reference/src/caching_file_provider.cpp:17-60): only remote
  * paths cache (`shouldCache` — local reads are cheap and always
  * fresh), an entry expires `ttl` after it was fetched, and inserting
  * past the byte budget evicts least-recently-used entries first.
  *
  * This closes the r9 "remote-file TTL cache" parity gap: the
  * bootstrap loads templates once and an explicit reload re-resolves
  * them, which covers the hot path but not TTL-based pickup of remote
  * edits — with this wrapper an edited s3://… template is re-fetched
  * at most `ttl` after the edit, without an operator reload call.
  *
  * Single-lock design mirroring the reference's mutex-protected map:
  * template fetches are boot/reload-frequency operations, never the
  * per-request serve path (rendered templates live on the endpoint),
  * so a contended lock is impossible in practice and the simple
  * invariant — stats and map always agree — is worth more than
  * lock-free reads. The injected `clock` (nanos) makes TTL behavior
  * testable without sleeping. */
final class CachingTemplateSource(
    cfg: FileCacheConfig = FileCacheConfig(),
    clock: () => Long = () => System.nanoTime()) {

  private final case class Entry(
      content: String, sizeBytes: Long, expiresAt: Long, var lastAccess: Long)

  private val cache = scala.collection.mutable.HashMap.empty[String, Entry]
  private var hits = 0L
  private var misses = 0L
  private var evictions = 0L

  /** Only remote paths cache (caching_file_provider.cpp:17-20). */
  def shouldCache(fullPath: String): Boolean =
    cfg.enabled && TemplateSource.isRemote(fullPath)

  /** Read through the cache; non-cacheable sources delegate straight
    * to [[TemplateSource.load]]. */
  def load(spark: SparkSession, source: String,
      basePath: Option[String] = None): String = {
    val full = TemplateSource.resolve(source, basePath)
    if (!shouldCache(full)) return TemplateSource.load(spark, source, basePath)
    val now = clock()
    synchronized {
      cache.get(full) match {
        case Some(e) if now < e.expiresAt =>
          hits += 1
          e.lastAccess = now
          return e.content
        case Some(_) => cache.remove(full) // expired — refetch below
        case None => ()
      }
    }
    // fetch OUTSIDE the lock (a slow remote read must not block other
    // loads); a racing fetch of the same path just overwrites equally
    val content = TemplateSource.load(spark, source, basePath)
    val size = content.getBytes(UTF_8).length.toLong
    synchronized {
      misses += 1
      if (size <= cfg.maxSizeBytes) {
        evictLRU(size)
        cache.put(full,
          Entry(content, size, now + cfg.ttlSeconds * 1000000000L, now))
      } // an over-budget single file serves uncached, like the reference
    }
    content
  }

  /** Evict oldest-accessed entries until `needed` bytes fit inside the
    * budget (caching_file_provider.cpp evictLRU). Caller holds the lock. */
  private def evictLRU(needed: Long): Unit = {
    var current = cache.valuesIterator.map(_.sizeBytes).sum
    val target = math.max(0L, cfg.maxSizeBytes - needed)
    if (current <= target) return
    cache.toSeq.sortBy(_._2.lastAccess).foreach { case (path, e) =>
      if (current > target) {
        cache.remove(path)
        current -= e.sizeBytes
        evictions += 1
      }
    }
  }

  /** Drop one path (post-write invalidation). */
  def invalidate(source: String, basePath: Option[String] = None): Unit =
    synchronized { cache.remove(TemplateSource.resolve(source, basePath)); () }

  def clear(): Unit = synchronized { cache.clear() }

  def stats: FileCacheStats = synchronized {
    FileCacheStats(hits, misses, evictions, cache.size,
      cache.valuesIterator.map(_.sizeBytes).sum)
  }
}
