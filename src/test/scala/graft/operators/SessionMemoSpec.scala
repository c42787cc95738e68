package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Eviction semantics of SessionMemo (ADVICE r7, medium): a DataFrame
  * value strongly references its SparkSession, so the WeakHashMap key
  * can never weak-clear for exactly the heavyweight caches — eviction
  * must be explicit. These tests pin the two explicit paths: the
  * context-end purge listener and `SessionMemo.invalidate(session)`. */
class SessionMemoSpec extends AnyFunSuite {

  private def freshSession(): SparkSession =
    SparkSession.builder()
      .master("local[2]").appName("session-memo-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  test("context stop purges entries whose values pin the session") {
    val memo = new SessionMemo[String, DataFrame]()
    val spark = freshSession()
    try {
      val df = memo.getOrElseUpdate(spark, "k")(spark.range(10).toDF())
      assert(df.count() == 10)
      assert(memo.liveSessions == 1)
      // the value references the session: weak-clearing alone could
      // never drop this entry no matter how hard GC tries
      spark.stop()
      // the purge listener runs on the bus; sc.stop() drains it before
      // returning, but poll defensively against bus-thread scheduling
      val deadline = System.nanoTime() + 10_000_000_000L
      while (memo.liveSessions != 0 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(memo.liveSessions == 0,
        "context-end listener did not purge the session's memo entries")
    } finally if (!spark.sparkContext.isStopped) spark.stop()
  }

  test("explicit invalidate drops one session across every memo") {
    val memo = new SessionMemo[String, DataFrame]()
    val spark = freshSession()
    try {
      memo.getOrElseUpdate(spark, "k")(spark.range(3).toDF())
      assert(memo.liveSessions == 1)
      // the newSession-churn path: one long-lived context, clones come
      // and go — invalidate is the eager eviction for a retired clone
      SessionMemo.invalidate(spark)
      assert(memo.liveSessions == 0)
      // token identity survives — invalidate evicts cached WORK, it
      // does not recycle the session's identity
      val t1 = SessionMemo.sessionToken(spark)
      SessionMemo.invalidate(spark)
      assert(SessionMemo.sessionToken(spark) == t1)
    } finally spark.stop()
  }
}
