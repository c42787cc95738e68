package graft.serialize

import java.io.ByteArrayInputStream

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowStreamReader
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval
import org.scalatest.funsuite.AnyFunSuite

/** Wire-format specs mirroring the reference's serializer behavior
  * (SURVEY §1.2 table; query_executor.cpp type dispatch,
  * request_handler.cpp escapeCSV). */
class WireSpec extends AnyFunSuite {

  private def js(dt: DataType, v: Any): String = {
    val b = new StringBuilder
    JsonWire.appendValue(b, dt, v)
    b.toString
  }

  // ---- JSON ----

  test("scalars serialize as JSON numbers/bools/null") {
    assert(js(IntegerType, 42) == "42")
    assert(js(LongType, -7L) == "-7")
    assert(js(BooleanType, true) == "true")
    assert(js(DoubleType, 1.5) == "1.5")
    assert(js(IntegerType, null) == "null")
  }

  test("NaN and infinities have no JSON rendering -> null") {
    assert(js(DoubleType, Double.NaN) == "null")
    assert(js(FloatType, Float.PositiveInfinity) == "null")
  }

  test("huge integral decimals emit as strings (HUGEINT rule)") {
    val big = new java.math.BigDecimal("170141183460469231731687303715884105727")
    assert(js(DecimalType(38, 0), big) == "\"170141183460469231731687303715884105727\"")
    val small = new java.math.BigDecimal("123")
    assert(js(DecimalType(38, 0), small) == "123")
    val scaled = new java.math.BigDecimal("12345.67")
    assert(js(DecimalType(10, 2), scaled) == "12345.67")
  }

  test("date and timestamp canonical formats") {
    assert(js(DateType, java.sql.Date.valueOf("2024-03-15")) == "\"2024-03-15\"")
    val ts = java.sql.Timestamp.valueOf("2024-03-15 13:45:07.123")
    assert(js(TimestampType, ts) == "\"2024-03-15T13:45:07.123Z\"")
  }

  test("string escaping and control characters") {
    assert(js(StringType, "a\"b\\c\nd") == "\"a\\\"b\\\\c\\nd\"")
    assert(js(StringType, "\u0001") == "\"\\u0001\"")
  }

  test("blob printable + \\xNN escapes") {
    val bytes = Array[Byte]('A', 0, '\\', 0x7f.toByte, ' ')
    assert(JsonWire.escapeBlob(bytes) == "A\\x00\\\\\\x7F ")
  }

  test("array, struct, map nest; map keys stringify") {
    assert(js(ArrayType(IntegerType), Seq(1, 2, null)) == "[1,2,null]")
    val st = StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType)))
    assert(js(st, Row(1, "x")) == "{\"a\":1,\"b\":\"x\"}")
    assert(js(MapType(IntegerType, StringType), Map(5 -> "v")) == "{\"5\":\"v\"}")
  }

  test("interval months:days.millis") {
    assert(js(CalendarIntervalType, new CalendarInterval(2, 3, 4500000L)) == "\"2:3.4500\"")
  }

  test("JSON-alias column embeds nested; malformed degrades to string") {
    val meta = new MetadataBuilder().putBoolean(JsonWire.JsonAliasKey, true).build()
    val schema = StructType(Seq(StructField("j", StringType, metadata = meta)))
    assert(JsonWire.row(schema, Row("""{"k": 1}""")) == """{"j":{"k": 1}}""")
    assert(JsonWire.row(schema, Row("{oops")) == """{"j":"{oops"}""")
  }

  test("TIME convention: micros-since-midnight long emits HH:MM:SS.mmm") {
    val meta = new MetadataBuilder().putBoolean(JsonWire.TimeAliasKey, true).build()
    val schema = StructType(Seq(StructField("t", LongType, metadata = meta)))
    // 13:45:30.123 = 13h*3600 + 45m*60 + 30.123456s in micros
    val micros = (13L * 3600 + 45 * 60 + 30) * 1000000L + 123456L
    assert(JsonWire.row(schema, Row(micros)) == """{"t":"13:45:30.123"}""")
    assert(JsonWire.row(schema, Row(0L)) == """{"t":"00:00:00.000"}""")
    assert(JsonWire.row(schema, Row(null)) == """{"t":null}""")
    // out of the day's range: fail safe, not a nonsense clock reading
    assert(JsonWire.row(schema, Row(86400000000L)) == """{"t":null}""")
  }

  test("UNION convention: tagged struct emits only the active member") {
    val st = StructType(Seq(
      StructField("tag", ByteType),
      StructField("num", IntegerType),
      StructField("str", StringType)))
    val meta = new MetadataBuilder().putBoolean(JsonWire.UnionAliasKey, true).build()
    val schema = StructType(Seq(StructField("u", st, metadata = meta)))
    // tag 0 selects member child 1 (num); the inactive member is absent
    assert(JsonWire.row(schema, Row(Row(0.toByte, 42, null))) == """{"u":{"num":42}}""")
    assert(JsonWire.row(schema, Row(Row(1.toByte, null, "x"))) == """{"u":{"str":"x"}}""")
    // null union row, null tag, and out-of-range tag all fail safe
    assert(JsonWire.row(schema, Row(null)) == """{"u":null}""")
    assert(JsonWire.row(schema, Row(Row(null, 1, "x"))) == """{"u":null}""")
    assert(JsonWire.row(schema, Row(Row(9.toByte, 1, "x"))) == """{"u":null}""")
    // WITHOUT the metadata the same struct emits generically — the
    // union reading is opt-in, never inferred from shape
    val plain = StructType(Seq(StructField("u", st)))
    assert(JsonWire.row(plain, Row(Row(0.toByte, 42, null))) ==
      """{"u":{"tag":0,"num":42,"str":null}}""")
  }

  test("VARIANT convention: rendered string re-parses as JSON, else plain string") {
    val meta = new MetadataBuilder().putBoolean(JsonWire.VariantAliasKey, true).build()
    val schema = StructType(Seq(StructField("v", StringType, metadata = meta)))
    // JSON renderings embed typed — object, array, and BARE SCALARS
    // (a variant holding 42 emits the number 42, per the reference's
    // re-parse rule at query_executor.cpp:760-767)
    assert(JsonWire.row(schema, Row("""{"a": 1}""")) == """{"v":{"a": 1}}""")
    assert(JsonWire.row(schema, Row("[1,2]")) == """{"v":[1,2]}""")
    assert(JsonWire.row(schema, Row("42")) == """{"v":42}""")
    assert(JsonWire.row(schema, Row("true")) == """{"v":true}""")
    // DuckDB's SQL-ish rendering is NOT JSON → plain string, and null
    // stays null
    assert(JsonWire.row(schema, Row("{'a': 1}")) == """{"v":"{'a': 1}"}""")
    assert(JsonWire.row(schema, Row(null)) == """{"v":null}""")
    // WITHOUT the tag the same content is an ordinary escaped string —
    // opt-in, never inferred
    val plain = StructType(Seq(StructField("v", StringType)))
    assert(JsonWire.row(plain, Row("42")) == """{"v":"42"}""")
  }

  test("native VariantType emits typed JSON via the variant binary") {
    // build real VariantVals through Spark's parse_json, then serialize
    // the collected rows through the wire path (getOrCreate: WireSpec
    // is otherwise session-free; a later suite's lifecycle owns stop)
    val ss = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("wire-variant-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import ss.implicits._
    val df = Seq("""{"a": 1, "b": [2, 3]}""", """42""", """"s"""")
      .toDF("j").selectExpr("parse_json(j) AS v")
    val rows = df.collect()
    val schema = df.schema
    assert(JsonWire.row(schema, rows(0)) == """{"v":{"a":1,"b":[2,3]}}""")
    assert(JsonWire.row(schema, rows(1)) == """{"v":42}""")
    assert(JsonWire.row(schema, rows(2)) == """{"v":"s"}""")
  }

  test("full row object") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    assert(JsonWire.row(schema, Row(7L, "x")) == """{"id":7,"name":"x"}""")
  }

  // ---- CSV ----

  test("escapeCSV quotes only when needed and doubles quotes") {
    assert(CsvWire.escapeCSV("plain") == "plain")
    assert(CsvWire.escapeCSV("a,b") == "\"a,b\"")
    assert(CsvWire.escapeCSV("say \"hi\"") == "\"say \"\"hi\"\"\"")
    assert(CsvWire.escapeCSV("line\nbreak") == "\"line\nbreak\"")
  }

  test("csv serialization: header + JSON-dumped cells") {
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType)))
    val out = CsvWire.serialize(schema, Iterator(Row(1, "alice"), Row(2, null)))
    assert(out == "id,name\n1,\"alice\"\n2,null\n")
  }

  // ---- Arrow IPC ----

  test("arrow stream round-trips flat schema") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("price", DoubleType), StructField("ok", BooleanType),
      StructField("d", DateType), StructField("ts", TimestampType),
      StructField("bin", BinaryType)))
    val rows = Seq(
      Row(1L, "a", 1.5, true, java.sql.Date.valueOf("2024-01-02"),
        java.sql.Timestamp.valueOf("2024-01-02 03:04:05.0"), Array[Byte](1, 2)),
      Row(2L, null, null, false, null, null, null))
    val bytes = ArrowWire.serialize(schema, rows.iterator, batchRows = 1)

    val alloc = new RootAllocator()
    val reader = new ArrowStreamReader(new ByteArrayInputStream(bytes), alloc)
    try {
      val root = reader.getVectorSchemaRoot
      assert(root.getSchema.getFields.size() == 7)
      assert(reader.loadNextBatch())
      assert(root.getRowCount == 1)
      assert(root.getVector("id").getObject(0) == 1L)
      assert(root.getVector("name").getObject(0).toString == "a")
      assert(reader.loadNextBatch())
      assert(root.getVector("name").isNull(0))
      assert(!reader.loadNextBatch())
    } finally { reader.close(); alloc.close() }
  }

  test("arrow: one nesting level maps natively (list + struct vectors)") {
    val schema = StructType(Seq(
      StructField("arr", ArrayType(IntegerType)),
      StructField("st", StructType(Seq(
        StructField("k", LongType), StructField("s", StringType)))),
      StructField("names", ArrayType(StringType))))
    val rows = Seq(
      Row(Seq(1, 2, 3), Row(7L, "x"), Seq("a", "b")),
      Row(Seq(4, null), Row(8L, null), null))
    val bytes = ArrowWire.serialize(schema, rows.iterator)
    val alloc = new RootAllocator()
    val reader = new ArrowStreamReader(new ByteArrayInputStream(bytes), alloc)
    try {
      assert(reader.loadNextBatch())
      val root = reader.getVectorSchemaRoot
      assert(root.getVector("arr").getObject(0).toString == "[1,2,3]")
      assert(root.getVector("arr").getObject(1).toString == "[4,null]")
      assert(root.getVector("st").getObject(0).toString == """{"k":7,"s":"x"}""")
      assert(root.getVector("names").getObject(0).toString == "[\"a\",\"b\"]")
      assert(root.getVector("names").isNull(1))
    } finally { reader.close(); alloc.close() }
  }

  test("arrow: deep nesting degrades to JSON utf8") {
    val schema = StructType(Seq(
      StructField("aa", ArrayType(ArrayType(IntegerType)))))
    val bytes = ArrowWire.serialize(schema, Iterator(Row(Seq(Seq(1), Seq(2, 3)))))
    val alloc = new RootAllocator()
    val reader = new ArrowStreamReader(new ByteArrayInputStream(bytes), alloc)
    try {
      assert(reader.loadNextBatch())
      val v = reader.getVectorSchemaRoot.getVector("aa")
      assert(v.getObject(0).toString == "[[1],[2,3]]")
    } finally { reader.close(); alloc.close() }
  }

  test("arrow: empty result still writes schema") {
    val schema = StructType(Seq(StructField("x", IntegerType)))
    val bytes = ArrowWire.serialize(schema, Iterator.empty)
    val alloc = new RootAllocator()
    val reader = new ArrowStreamReader(new ByteArrayInputStream(bytes), alloc)
    try {
      val root = reader.getVectorSchemaRoot
      assert(root.getSchema.getFields.size() == 1)
    } finally { reader.close(); alloc.close() }
  }

  test("arrow: multi-batch compressed streams round-trip (lz4 + zstd)") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val rows = (0 until 25).map(i => Row(i.toLong, s"name-$i"))
    for (codecName <- Seq("lz4", "zstd")) {
      // batchRows = 10 over 25 rows → exactly 3 record batches
      val bytes = ArrowWire.serialize(schema, rows.iterator,
        batchRows = 10, codec = Some(ArrowWire.codecOf(codecName)))
      val alloc = new RootAllocator()
      val reader = new ArrowStreamReader(new ByteArrayInputStream(bytes), alloc,
        org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE)
      try {
        val root = reader.getVectorSchemaRoot
        var batches = 0
        var total = 0L
        var last: AnyRef = null
        while (reader.loadNextBatch()) {
          batches += 1
          total += root.getRowCount
          if (root.getRowCount > 0)
            last = root.getVector("name").getObject(root.getRowCount - 1)
        }
        assert(batches == 3, s"$codecName: expected 3 batches, got $batches")
        assert(total == 25)
        assert(last.toString == "name-24")
      } finally { reader.close(); alloc.close() }
    }
  }

  test("arrow codec names parse; unknown rejected") {
    import org.apache.arrow.vector.compression.CompressionUtil
    assert(ArrowWire.codecOf("LZ4") == CompressionUtil.CodecType.LZ4_FRAME)
    assert(ArrowWire.codecOf("zstd") == CompressionUtil.CodecType.ZSTD)
    intercept[IllegalArgumentException](ArrowWire.codecOf("snappy"))
  }

  test("arrow wire efficiency: compressed IPC is several times smaller than JSON (BASELINE row)") {
    // BASELINE.md: reference targets ~10x size for 100K rows x 10 cols
    // of mixed types. Same shape at 100K rows, zstd-compressed batches.
    val schema = StructType((1 to 5).flatMap(i => Seq(
      StructField(s"l$i", LongType), StructField(s"d$i", DoubleType))))
    def rows = Iterator.tabulate(100000)(i =>
      Row.fromSeq((1 to 5).flatMap(k => Seq[Any](i.toLong * k, i * 1.000001 * k))))
    val arrow = ArrowWire.serialize(schema, rows,
      batchRows = 122880, codec = Some(ArrowWire.codecOf("zstd"))).length
    val json = JsonWire.rows(schema, rows).map(_.length + 1).sum
    assert(arrow * 3 < json,
      s"arrow $arrow bytes not ≥3x smaller than json $json bytes")
  }

  test("csv stream writes identical bytes to serialize") {
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType)))
    val rows = Seq(Row(1, "alice"), Row(2, null))
    val out = new java.io.ByteArrayOutputStream()
    CsvWire.stream(schema, rows.iterator, out)
    assert(out.toString("UTF-8") == CsvWire.serialize(schema, rows.iterator))
  }
}
