package graft.operators

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Per-session memoization keyed on the session OBJECT.
  *
  * The `(System.identityHashCode(session), ...)` key pattern the
  * memoizers used before has two defects the ADVICE review called on
  * `Connections.viewOwners` (and that apply equally here): identity
  * hashes are not unique and can be REUSED after a session is GC'd —
  * so a supposedly-cold fresh session could silently read a dead
  * session's cached work (which would quietly defeat Slope's
  * fresh-session cold-measurement methodology) — and entries are
  * never evicted. Keying a WeakHashMap on the SparkSession itself
  * (identity equals — SparkSession doesn't override equals) fixes the
  * aliasing for good, but the r7 ADVICE review showed it does NOT fix
  * eviction for exactly the heavyweight caches: a DataFrame or
  * SnapshotTable VALUE strongly references its SparkSession, so the
  * weak KEY stays strongly reachable through the map's own value and
  * the entry can never clear. GC-based eviction is structurally
  * impossible for such values — so eviction here is EXPLICIT instead:
  * every memo registers itself, and the first touch of a
  * SparkContext installs a listener that purges all entries of all
  * memos for that context's sessions on application end
  * (`SparkSession.stop()` stops the context, so the common
  * session-per-JVM / session-per-run lifecycles are fully covered).
  * For a long-lived JVM that churns `newSession()` clones over one
  * context, `SessionMemo.invalidate(session)` drops a session's
  * entries eagerly. The weak keying is kept for what it IS good for:
  * lightweight values that don't reference the session (tokens,
  * centroid seqs, path strings) still clear on their own.
  *
  * Two caveats callers who memoize DataFrames keyed by (session, dir)
  * accept (r9 ADVICE, documented deliberately rather than "fixed" —
  * both are the right trade for this serving harness):
  *  - STALENESS: the key carries no data-generation token, so a table
  *    rewritten under the same dir mid-session keeps serving the old
  *    checkpoint until `invalidate(session)` (the TemplatePipeline
  *    cache-generation pattern is the cluster-grade fix: fold a
  *    generation/snapshot id into the key);
  *  - DURABILITY: `localCheckpoint` blocks live on executors — an
  *    executor loss makes every downstream read of that frame fail for
  *    the session's remainder. A cluster deployment should use
  *    reliable `checkpoint()` (HDFS/object-store backed) or rebuild
  *    via invalidate-on-failure; local[n] has no partial-executor
  *    failure mode, so the cheap variant is correct here. */
final class SessionMemo[K, V] {
  private val maps = new java.util.WeakHashMap[SparkSession,
    scala.collection.concurrent.TrieMap[K, V]]()

  SessionMemo.register(this)

  private def forSession(s: SparkSession): scala.collection.concurrent.TrieMap[K, V] = {
    SessionMemo.hookContext(s.sparkContext)
    maps.synchronized {
      maps.computeIfAbsent(s, _ => scala.collection.concurrent.TrieMap.empty[K, V])
    }
  }

  def getOrElseUpdate(s: SparkSession, key: K)(build: => V): V =
    forSession(s).getOrElseUpdate(key, build)

  /** Atomic check-and-replace per session (register-style use). */
  def compute(s: SparkSession, key: K)(f: Option[V] => V): V = {
    val m = forSession(s)
    m.synchronized {
      val next = f(m.get(key))
      m.put(key, next)
      next
    }
  }

  /** Drop one session's entries (explicit eviction for values that
    * strongly reference the session and so can never weak-clear). */
  def invalidateSession(s: SparkSession): Unit =
    maps.synchronized { maps.remove(s); () }

  /** Live session-entry count (observability for the eviction spec). */
  def liveSessions: Int = maps.synchronized(maps.size)

  private[operators] def invalidateContext(sc: SparkContext): Unit =
    maps.synchronized {
      val it = maps.entrySet().iterator()
      while (it.hasNext) {
        val k = it.next().getKey
        if (k != null && (k.sparkContext eq sc)) it.remove()
      }
    }
}

object SessionMemo {
  private val ids = new java.util.WeakHashMap[SparkSession, String]()

  // All live memos (they're static singletons in practice; a strong
  // list is the intended lifetime).
  private val registry =
    new java.util.concurrent.CopyOnWriteArrayList[SessionMemo[_, _]]()

  // Contexts that already carry the purge listener. Weak keys: a
  // stopped, unreferenced context must not be pinned by this set.
  private val hooked = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SparkContext, java.lang.Boolean]())

  private[operators] def register(m: SessionMemo[_, _]): Unit =
    registry.add(m)

  private[operators] def hookContext(sc: SparkContext): Unit = {
    val fresh = hooked.synchronized(hooked.add(sc))
    if (fresh) sc.addSparkListener(new SparkListener {
      override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
        registry.forEach(_.invalidateContext(sc))
        ids.synchronized {
          val it = ids.entrySet().iterator()
          while (it.hasNext) {
            val k = it.next().getKey
            if (k != null && (k.sparkContext eq sc)) it.remove()
          }
        }
      }
    })
  }

  /** Eagerly drop one session's entries across every memo — for JVMs
    * that churn `newSession()` clones over one long-lived context,
    * where the context-end purge would come too late. */
  def invalidate(s: SparkSession): Unit =
    registry.forEach(_.invalidateSession(s))

  /** A unique, never-reused token per live session — for caches that
    * need a session component inside a VALUE key (e.g. a bounded LRU)
    * rather than a per-session map. identityHashCode is not this: it
    * can be recycled onto a new session after GC. */
  def sessionToken(s: SparkSession): String =
    ids.synchronized(
      ids.computeIfAbsent(s, _ => java.util.UUID.randomUUID().toString))

  /** Generation token for a data directory: a digest of its recursive
    * (path, length, modificationTime) listing — the
    * data-generation-in-the-key pattern (TemplatePipeline's cache
    * generation) that closes the STALENESS caveat above: a table
    * rewritten under the same dir mid-session produces a NEW token, so
    * dir-keyed memos miss and rebuild instead of serving the dead
    * checkpoint (DirMemoSpec proves both directions). One filesystem
    * LIST per call — cheap on a local/HDFS namenode; an object-store
    * deployment that can't afford per-query LISTs should thread an
    * explicit snapshot id instead (SnapshotTable's pointer IS that id
    * for managed tables), or bound the walk rate with
    * `spark.graft.generation.ttlMs`: a token computed within the TTL
    * is reused, trading at most that much staleness for one LIST per
    * dir per TTL window instead of several per query (a served ANN
    * probe consults ~6 dir-keyed memos). Default 0 = always fresh —
    * the DirMemoSpec freshness contract unchanged. A missing dir
    * digests to a constant — the (dir-appears-later) transition still
    * changes the token. */
  // keyed by the session TOKEN (a string), not the session object, so
  // this strong map never pins a stopped SparkSession; dead-session
  // entries are bounded by sessions × dirs, both small
  private val genCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), (String, Long)]()

  def generationOf(s: SparkSession, dir: String): String = {
    val ttlMs =
      try s.conf.get("spark.graft.generation.ttlMs", "0").toLong
      catch { case _: NumberFormatException => 0L }
    if (ttlMs <= 0) computeGeneration(s, dir)
    else {
      val key = (sessionToken(s), dir)
      val now = System.nanoTime()
      val cached = genCache.get(key)
      if (cached != null && (now - cached._2) < ttlMs * 1000000L) cached._1
      else {
        val g = computeGeneration(s, dir)
        genCache.put(key, (g, now))
        g
      }
    }
  }

  private def computeGeneration(s: SparkSession, dir: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    try {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      def walk(path: org.apache.hadoop.fs.Path): Unit =
        fs.listStatus(path).sortBy(_.getPath.toString).foreach { st =>
          if (st.isDirectory) walk(st.getPath)
          else md.update(
            s"${st.getPath}|${st.getLen}|${st.getModificationTime}\n"
              .getBytes("UTF-8"))
        }
      if (fs.exists(p)) walk(p)
    } catch { case _: java.io.IOException => md.update("unlistable".getBytes) }
    md.digest().take(8).map(b => f"$b%02x").mkString
  }
}

/** A [[SessionMemo]] keyed by a DATA DIRECTORY with the directory's
  * generation folded into the key — the staleness fix the plain
  * dir-string keying documented as a caveat: rewriting the data under
  * the same path mid-session changes [[SessionMemo.generationOf]], so
  * the next read misses and rebuilds rather than serving a checkpoint
  * of the dead data. Entries for superseded generations linger until
  * session end (bounded by the number of rewrites — rewrite-heavy
  * deployments should also call `SessionMemo.invalidate`). */
final class DirMemo[V] {
  private val inner = new SessionMemo[(String, String, String), V]()

  def getOrElseUpdate(s: SparkSession, dir: String)(build: => V): V =
    getOrElseUpdate(s, dir, "")(build)

  /** Variant with an extra key component (e.g. an operating point). */
  def getOrElseUpdate(s: SparkSession, dir: String, extra: String)(build: => V): V =
    inner.getOrElseUpdate(s,
      (dir, SessionMemo.generationOf(s, dir), extra))(build)
}
