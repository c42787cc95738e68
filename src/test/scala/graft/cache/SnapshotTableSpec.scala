package graft.cache

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot table + scheduler units: refresh modes, manifest chaining,
  * time travel, retention expiry keeping live append ancestors,
  * compaction, interval parsing. (The full/append/merge read results
  * are additionally oracle-checked in CacheQueries.) */
class SnapshotTableSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var root: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").appName("snapshot-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    root = Files.createTempDirectory("graft_snap").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def df(range: Range) = {
    val ss = spark
    import ss.implicits._
    range.map(i => (i.toLong, s"v$i")).toDF("id", "val")
  }

  test("full refresh publishes and reads back") {
    val t = new SnapshotTable(spark, root, "t_full")
    val id = t.refreshFull(df(1 to 10))
    assert(id == 1L)
    assert(t.currentSnapshotId.contains(1L))
    assert(t.read().count() == 10)
    val id2 = t.refreshFull(df(1 to 3))
    assert(id2 == 2L)
    assert(t.read().count() == 3)
    assert(t.read(Some(1L)).count() == 10) // time travel
  }

  test("append chains dirs without rewriting") {
    val t = new SnapshotTable(spark, root, "t_app")
    t.refreshAppend(df(1 to 5))
    t.refreshAppend(df(6 to 8))
    assert(t.read().count() == 8)
    // snapshot 2's manifest references snapshot 1's dir
    val dirs = t.snapshots().filter("snapshot_id = 2")
      .select("dirs").collect().head.getSeq[String](0)
    assert(dirs == Seq("s1", "s2"))
    assert(t.read(Some(1L)).count() == 5)
  }

  test("merge upserts by primary key, delta wins") {
    val ss = spark
    import ss.implicits._
    val t = new SnapshotTable(spark, root, "t_merge")
    t.refreshFull(df(1 to 5))
    t.refreshMerge(Seq((3L, "NEW3"), (9L, "NEW9")).toDF("id", "val"), Seq("id"))
    val out = t.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "v1", 2L -> "v2", 3L -> "NEW3", 4L -> "v4", 5L -> "v5", 9L -> "NEW9"))
  }

  test("merge is file-pruned: a 1-row delta rewrites only the bucket whose PK range matches") {
    val ss = spark
    import ss.implicits._
    val t = new SnapshotTable(spark, root, "t_prune")
    // s1: stat-less full snapshot → the first merge must rewrite it...
    t.refreshFull(df(1 to 100))
    // s2: ...into 4 range buckets, each with PK min/max stats
    t.refreshMerge(Seq((200L, "n200")).toDF("id", "val"), Seq("id"), mergeBuckets = 4)
    val dirsOf = (id: Long) => t.snapshots().filter(s"snapshot_id = $id")
      .select("dirs").collect().head.getSeq[String](0)
    val s2dirs = dirsOf(2L)
    assert(s2dirs.size == 4 && s2dirs.forall(_.startsWith("s2/")), s2dirs)
    assert(t.read().count() == 101)

    // fingerprint every s2 bucket's files before the next merge
    def fileBytes(dir: String): Map[String, Long] = {
      val p = java.nio.file.Paths.get(root, "t_prune", "snapshots", dir)
      Files.list(p).iterator().asScala
        .map(f => f.getFileName.toString -> Files.size(f)).toMap
    }
    def fileMtimes(dir: String): Map[String, Long] = {
      val p = java.nio.file.Paths.get(root, "t_prune", "snapshots", dir)
      Files.list(p).iterator().asScala
        .map(f => f.getFileName.toString -> Files.getLastModifiedTime(f).toMillis).toMap
    }
    val before = s2dirs.map(d => d -> (fileBytes(d), fileMtimes(d))).toMap

    // s3: update ONE existing key — exactly one s2 bucket may rewrite
    t.refreshMerge(Seq((37L, "UPD")).toDF("id", "val"), Seq("id"), mergeBuckets = 4)
    val s3dirs = dirsOf(3L)
    val carried = s3dirs.filter(_.startsWith("s2/"))
    assert(carried.size == 3, s"expected 3 carried s2 buckets, got $s3dirs")
    // the rewritten bucket is the one whose stats range contains "37"
    val stats = t.snapshots().filter("snapshot_id = 2")
      .selectExpr("explode(dir_stats) st").selectExpr("st.dir", "st.pk_min", "st.pk_max")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val matching = stats.filter { case (_, mn, mx) => mn <= "37" && "37" <= mx }.map(_._1)
    assert(matching.length == 1 && !carried.contains(matching.head),
      s"stats say $matching should rewrite; carried=$carried")
    // carried dirs are BY-REFERENCE: same files, same sizes, same mtimes
    carried.foreach { d =>
      assert((fileBytes(d), fileMtimes(d)) == before(d), s"carried dir $d was rewritten")
    }
    val out = t.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 101 && out(37L) == "UPD" && out(1L) == "v1" && out(200L) == "n200")

    // s4: all-NEW keys, lexically past every bucket's pk_max ("998" >
    // "99") → zero buckets touched, delta written alone
    t.refreshMerge(Seq((998L, "n998"), (999L, "n999")).toDF("id", "val"), Seq("id"),
      mergeBuckets = 4)
    val s4dirs = dirsOf(4L)
    assert(s4dirs.count(_.startsWith("s4/")) >= 1)
    assert(s4dirs.filterNot(_.startsWith("s4/")).toSet == s3dirs.toSet,
      s"all prior dirs must carry: $s4dirs vs $s3dirs")
    assert(t.read().count() == 103)
    // time travel still reassembles older merge snapshots from shared dirs
    assert(t.read(Some(2L)).count() == 101)
    assert(t.read(Some(3L)).collect().map(r => r.getLong(0) -> r.getString(1)).toMap.apply(37L) == "UPD")
  }

  test("deleteByKeys is file-pruned; an absent key publishes a no-op version") {
    val ss = spark
    import ss.implicits._
    val t = new SnapshotTable(spark, root, "t_del")
    t.refreshFull(df(1 to 100))
    // s2: bucket + stats pass (stat-less s1 rewrites into 4 ranges)
    t.refreshMerge(Seq((200L, "n200")).toDF("id", "val"), Seq("id"), mergeBuckets = 4)
    val dirsOf = (id: Long) => t.snapshots().filter(s"snapshot_id = $id")
      .select("dirs").collect().head.getSeq[String](0)
    val s2dirs = dirsOf(2L)
    assert(s2dirs.size == 4 && t.read().count() == 101)

    def fp(dir: String): Map[String, (Long, Long)] = {
      val p = java.nio.file.Paths.get(root, "t_del", "snapshots", dir)
      Files.list(p).iterator().asScala.map(f => f.getFileName.toString ->
        (Files.size(f), Files.getLastModifiedTime(f).toMillis)).toMap
    }
    val before = s2dirs.map(d => d -> fp(d)).toMap

    // s3: delete a key lexically past every bucket's pk_max — zero
    // dirs touched; the version still publishes (compliance audit row)
    t.deleteByKeys(Seq(999999L).toDF("id"), Seq("id"))
    assert(dirsOf(3L).toSet == s2dirs.toSet, "no-op delete must carry all dirs")
    assert(t.read().count() == 101)

    // s4: delete ONE present key — exactly one bucket rewrites
    t.deleteByKeys(Seq(37L).toDF("id"), Seq("id"))
    val s4dirs = dirsOf(4L)
    val carried = s4dirs.filter(_.startsWith("s2/"))
    assert(carried.size == 3, s"expected 3 carried s2 buckets, got $s4dirs")
    carried.foreach(d => assert(fp(d) == before(d), s"carried dir $d was rewritten"))
    val out = t.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 100 && !out.contains(37L) && out(200L) == "n200")
    // erasure is two-step: the old snapshot still holds the row until
    // retention expires it (time travel proves the pre-delete state)
    assert(t.read(Some(2L)).count() == 101)
    t.expireSnapshots(keepLast = 1)
    assert(t.read().count() == 100)
  }

  test("schema-widening merge: carried narrow dirs read NULL for new columns") {
    val ss = spark
    import ss.implicits._
    val t = new SnapshotTable(spark, root, "t_widen")
    t.refreshFull(df(1 to 100))
    t.refreshMerge(Seq((200L, "n200")).toDF("id", "val"), Seq("id"), mergeBuckets = 4)
    // widening delta: adds a `score` column and touches ONE existing key
    t.refreshMerge(Seq((37L, "UPD", 9L), (300L, "n300", 5L)).toDF("id", "val", "score"),
      Seq("id"), mergeBuckets = 4)
    val out = t.read().collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(r.fieldIndex("score"))) None else Some(r.getLong(r.fieldIndex("score")))))
      .toMap
    assert(out.size == 102)
    assert(out(37L) == ("UPD", Some(9L)), "delta row must carry the new column")
    assert(out(300L) == ("n300", Some(5L)))
    assert(out(1L) == ("v1", None), "carried narrow rows read NULL for the new column")
    assert(out(200L)._2.isEmpty)
    // narrowing direction: a later delta MISSING the new column keeps it
    t.refreshMerge(Seq((38L, "UPD38")).toDF("id", "val"), Seq("id"), mergeBuckets = 4)
    val out2 = t.read().collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(r.fieldIndex("score"))) None
        else Some(r.getLong(r.fieldIndex("score"))))).toMap
    assert(out2(37L) == Some(9L), "widened value must survive a narrow delta")
    assert(out2(38L).isEmpty)
    // compaction over the mixed-schema live state must union by NAME:
    // a footer-schema read would silently drop `score` from the
    // compacted snapshot — permanent loss once retention expires the
    // pre-compaction snapshot (r10 review finding)
    t.compact()
    val out3 = t.read().collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(r.fieldIndex("score"))) None
        else Some(r.getLong(r.fieldIndex("score"))))).toMap
    assert(out3.size == 102)
    assert(out3(37L) == Some(9L),
      "compaction dropped the schema-widened column")
    assert(out3(300L) == Some(5L))
    assert(out3(1L).isEmpty)
  }

  test("merge row_count stays exact across carried dirs and expiry keeps shared buckets") {
    val ss = spark
    import ss.implicits._
    val t = new SnapshotTable(spark, root, "t_prune_ret")
    t.refreshFull(df(1 to 40))
    t.refreshMerge(Seq((5L, "a")).toDF("id", "val"), Seq("id"), mergeBuckets = 3)   // s2 rewrite-all
    t.refreshMerge(Seq((6L, "b")).toDF("id", "val"), Seq("id"), mergeBuckets = 3)   // s3 pruned
    t.refreshMerge(Seq((99L, "c")).toDF("id", "val"), Seq("id"), mergeBuckets = 3)  // s4 new key
    val counts = t.snapshots().select("snapshot_id", "row_count").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 40L, 2L -> 40L, 3L -> 40L, 4L -> 41L), counts)
    // expire everything but the live snapshot: s2 buckets still
    // referenced by s4 must survive, the rest reaped
    t.expireSnapshots(keepLast = 1)
    assert(t.read().count() == 41)
    val live = t.read().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(live(5L) == "a" && live(6L) == "b" && live(99L) == "c" && live(7L) == "v7")
  }

  test("retention drops old manifests but keeps dirs live appends reference") {
    val t = new SnapshotTable(spark, root, "t_ret")
    t.refreshAppend(df(1 to 4))   // s1
    t.refreshAppend(df(5 to 6))   // s2 refs s1,s2
    t.refreshAppend(df(7 to 7))   // s3 refs s1,s2,s3
    val dropped = t.expireSnapshots(keepLast = 2)
    assert(dropped == Seq(1L))
    // snapshot 1 gone from manifests, but its data dir survives
    // because snapshots 2 and 3 chain it — live read stays complete.
    assert(t.snapshots().count() == 2)
    assert(t.read().count() == 7)
    intercept[IllegalArgumentException](t.read(Some(1L)))
  }

  test("compaction rewrites live state as one new snapshot") {
    val t = new SnapshotTable(spark, root, "t_comp")
    t.refreshAppend(df(1 to 4))
    t.refreshAppend(df(5 to 9))
    val cid = t.compact(targetFiles = 1)
    assert(t.currentSnapshotId.contains(cid))
    assert(t.read().count() == 9)
    val m = t.snapshots().filter(s"snapshot_id = $cid")
      .select("mode", "dirs").collect().head
    assert(m.getString(0) == "compact")
    assert(m.getSeq[String](1) == Seq(s"s$cid"))
  }

  test("two drivers racing refreshFull on one shared dir both land") {
    // Two handles over the SAME table dir, on two sessions — the
    // in-JVM stand-in for two drivers sharing a warehouse. Each
    // instance's `synchronized` covers only itself, so the pair race
    // the same next id: the snapshot-dir create is the atomic claim,
    // the loser polls for the winner's manifest and retries under the
    // fresh id. Both snapshots must land, the pointer must end at the
    // higher id, and each snapshot must read back exactly its own
    // rows (no interleaved part files).
    val a = new SnapshotTable(spark, root, "t_race")
    val b = new SnapshotTable(spark.newSession(), root, "t_race")
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def racer(t: SnapshotTable, rows: Range): Thread = {
      val th = new Thread(() =>
        try { barrier.await(); t.refreshFull(df(rows)) }
        catch { case e: Throwable => errors.add(e) })
      th.start(); th
    }
    for (round <- 1 to 3) {
      val t1 = racer(a, 1 to 100)
      val t2 = racer(b, 1 to 50)
      t1.join(120000); t2.join(120000)
      assert(errors.isEmpty, s"round $round: ${errors.asScala.map(_.toString)}")
      val ids = a.snapshots().select("snapshot_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == (1L to 2L * round), s"round $round ids: $ids")
      assert(a.currentSnapshotId.contains(2L * round))
      // every snapshot is exactly one racer's dataset, never a mix
      ids.foreach { id =>
        val n = a.read(Some(id)).count()
        assert(n == 100 || n == 50, s"snapshot $id has $n rows (interleaved write?)")
      }
    }
  }

  test("interval parsing: reference regex (\\d+)[smhd]") {
    assert(RefreshScheduler.parseIntervalSeconds("90s").contains(90L))
    assert(RefreshScheduler.parseIntervalSeconds("5m").contains(300L))
    assert(RefreshScheduler.parseIntervalSeconds("2h").contains(7200L))
    assert(RefreshScheduler.parseIntervalSeconds("1d").contains(86400L))
    assert(RefreshScheduler.parseIntervalSeconds("nope").isEmpty)
  }
}
