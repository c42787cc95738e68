package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** A session built WITHOUT graft's SparkSessionExtensions must still
  * run every query: Tables.register installs UDF fallbacks under the
  * same names, computing identical values to the native expressions. */
class FallbackSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var plain: SparkSession = _

  override def beforeAll(): Unit = {
    plain = SparkSession.builder()
      .master("local[2]").appName("fallback-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate() // note: no .withExtensions
    plain.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (plain != null) plain.stop()

  test("extension-less session runs the native-function queries") {
    val dir = "/root/testdata/sf0.001"
    val sim = graft.SparkEntry.queries("simhash_fingerprint")(plain, dir)
    assert(sim.count() > 0)
    val win = graft.SparkEntry.queries("winnow_fingerprint")(plain, dir)
    assert(win.count() > 0)
    val nd = graft.SparkEntry.queries("neardup_minhash_lsh")(plain, dir)
    assert(nd.count() >= 0) // plan executes; sf0.001 may have no pairs
    val qz = graft.SparkEntry.queries("embedding_quantize_int8")(plain, dir)
    assert(qz.count() > 0)
    val ds = graft.SparkEntry.queries("dsir_importance")(plain, dir)
    assert(ds.count() > 0)
    val bl = graft.SparkEntry.queries("bloom_contamination")(plain, dir)
    assert(bl.count() >= 0) // plan executes; sf0.001 may have no hits
  }

  test("quantize_u8 fallback equals the expression arithmetic") {
    graft.Tables.register(plain, "/root/testdata/sf0.001") // installs fallbacks
    val r = plain.sql(
      "SELECT quantize_u8(array(0.0D, 1.0D, 0.5D)) AS d, " +
        "quantize_u8(array(2.0D, 2.0D)) AS degenerate").collect().head
    val d = r.getStruct(0)
    assert(d.getDouble(0) == 0.0 && d.getDouble(1) == 1.0)
    // codes: 0, 255, round(0.5*255)=128 → qsum 383; recon of 0.5 is
    // 128/255 ≈ 0.50196 so the cosine is high but below 1
    assert(d.getLong(2) == 383L)
    assert(d.getDouble(3) > 0.999 && d.getDouble(3) < 1.0)
    assert(r.isNullAt(1)) // constant vector has no scale → NULL
  }

  test("UDF fallback values equal the expression path") {
    // minhash: shared loop is the same code; sanity-check a known input
    val viaPlain = GraftFunctions.minhashPlain(Seq("a b c", "b c d"), 4).toSeq
    val df = plain.sql("SELECT minhash_sig(array('a b c', 'b c d'), 4) AS s")
    assert(df.collect().head.getSeq[Long](0) == viaPlain)
  }

  test("term_counts and pair_pack fallbacks match the kernel semantics") {
    graft.Tables.register(plain, "/root/testdata/sf0.001") // installs fallbacks
    val r = plain.sql(
      "SELECT term_counts(array('b', 'a', 'b', '', 'a', 'b')) AS tc, " +
        "pair_pack(array(1L, 2L, 5L)) AS pk").collect().head
    val tc = r.getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getString(0), x.getLong(1))).toMap
    assert(tc == Map("a" -> 2L, "b" -> 3L, "" -> 1L))
    assert(r.getSeq[Long](1) == Seq((1L << 32) | 2L, (1L << 32) | 5L, (2L << 32) | 5L))
  }

  test("tokens_in_set counts WITH multiplicity, like size(filter(t IN …))") {
    graft.Tables.register(plain, "/root/testdata/sf0.001") // installs fallbacks
    val r = plain.sql(
      "SELECT tokens_in_set(array('the','cat','the','a',NULL), array('the','a')) AS c, " +
        "tokens_in_set(array('x'), array('the','a')) AS z").collect().head
    assert(r.getInt(0) == 3) // 'the' twice + 'a' once; NULL token ignored
    assert(r.getInt(1) == 0)
  }
}
