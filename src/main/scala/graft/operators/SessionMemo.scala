package graft.operators

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
  * never evicted, growing without bound in long-lived multi-session
  * JVMs. A WeakHashMap keyed on the SparkSession itself (identity
  * equals — SparkSession doesn't override equals) fixes both: the
  * entry lives exactly as long as the session, and a new session can
  * never alias a dead one. */
final class SessionMemo[K, V] {
  private val maps = new java.util.WeakHashMap[SparkSession,
    scala.collection.concurrent.TrieMap[K, V]]()

  private def forSession(s: SparkSession): scala.collection.concurrent.TrieMap[K, V] =
    maps.synchronized {
      maps.computeIfAbsent(s, _ => scala.collection.concurrent.TrieMap.empty[K, V])
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
}

object SessionMemo {
  private val ids = new java.util.WeakHashMap[SparkSession, String]()

  /** A unique, never-reused token per live session — for caches that
    * need a session component inside a VALUE key (e.g. a bounded LRU)
    * rather than a per-session map. identityHashCode is not this: it
    * can be recycled onto a new session after GC. */
  def sessionToken(s: SparkSession): String =
    ids.synchronized(
      ids.computeIfAbsent(s, _ => java.util.UUID.randomUUID().toString))
}
