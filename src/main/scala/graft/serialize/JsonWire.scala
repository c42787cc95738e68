package graft.serialize

import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Row → JSON wire serializer implementing the reference's type→JSON
  * contract (SURVEY §1.2; reference dispatch at
  * /root/reference/src/query_executor.cpp:229-774):
  *
  *  - numbers emit as JSON numbers; integers wider than 2^53 (HUGEINT
  *    analog: DecimalType with 0 scale and > 15 digits of magnitude)
  *    emit as decimal STRINGS so precision survives JavaScript readers
  *    (query_executor.cpp:480-509);
  *  - DATE → YYYY-MM-DD; TIMESTAMP → ISO-8601 with milliseconds + Z
  *    (single canonical format, :387-397);
  *  - BLOB → printable ASCII kept, everything else \xNN-escaped
  *    (:511-545);
  *  - MAP → JSON object with keys stringified (:683-711); STRUCT →
  *    object; ARRAY → array;
  *  - a StringType column whose metadata carries `graft.json = true`
  *    is a JSON logical alias: its value embeds as NESTED JSON, not an
  *    escaped string; malformed content degrades to the raw string
  *    (:218-227, :338-343);
  *  - NaN / ±Infinity have no JSON rendering → null (reference emits
  *    via double-to-string which JSON parsers reject; null is the safe
  *    wire form and what its HTTP layer effectively produces);
  *  - CalendarInterval → "months:days.millis" string (:415-421);
  *  - TIME: no Spark TIME type — the wire convention is a LongType
  *    column carrying micros-since-midnight with metadata `graft.time
  *    = true`, emitted as `HH:MM:SS.mmm` (:407-413);
  *  - UNION: no Spark union type — the convention is a StructType of
  *    (tag: integral, member1, ..., memberN) with metadata
  *    `graft.union = true`: only the member selected by the row's tag
  *    emits, as `{memberName: value}` (:647-681 — the reference reads
  *    the physical union the same way: child 0 is the tag, member i
  *    lives at child i+1; an out-of-range tag fails safe to null);
  *  - VARIANT (:760-767): the reference takes the variant's string
  *    form and re-parses it as JSON where possible (so a variant
  *    holding 42 emits the NUMBER 42, one holding an object emits the
  *    object), degrading to a plain string for non-JSON renderings
  *    (DuckDB's SQL-ish `{'a': 1}`). Two wire forms here: Spark 4's
  *    native `VariantType` emits via `VariantVal.toJson` (always
  *    valid JSON — the parse can't fail, only a corrupt binary can,
  *    which degrades to the escaped string form), and a StringType
  *    column tagged `graft.variant = true` carries a pre-rendered
  *    variant string with the reference's exact parse-else-string
  *    rule (a distinct tag from `graft.json` because the SEMANTIC
  *    differs — variant content is any type's rendering, routinely a
  *    bare scalar, where a json alias declares the column IS JSON).
  */
object JsonWire {

  /** Metadata key marking a string column as JSON-typed. */
  val JsonAliasKey = "graft.json"

  /** Metadata key marking a LongType column as TIME (micros since
    * midnight) — emitted as HH:MM:SS.mmm. */
  val TimeAliasKey = "graft.time"

  /** Metadata key marking a (tag, members...) struct as a UNION —
    * only the tag-selected member is emitted. */
  val UnionAliasKey = "graft.union"

  /** Metadata key marking a StringType column as a rendered VARIANT —
    * embedded as nested JSON where the content parses (including bare
    * scalars), emitted as a plain string otherwise. */
  val VariantAliasKey = "graft.variant"

  private val tsFormat =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").withZone(ZoneOffset.UTC)

  def rows(schema: StructType, it: Iterator[Row]): Iterator[String] =
    it.map(r => row(schema, r))

  def row(schema: StructType, r: Row): String = {
    val b = new StringBuilder("{")
    var i = 0
    while (i < schema.length) {
      if (i > 0) b.append(',')
      val f = schema(i)
      appendString(b, f.name)
      b.append(':')
      appendValue(b, f.dataType, r.get(i), f.metadata)
      i += 1
    }
    b.append('}').toString
  }

  private def flag(m: Metadata, key: String): Boolean =
    m.contains(key) && m.getBoolean(key)

  def appendValue(b: StringBuilder, dt: DataType, v: Any,
      meta: Metadata = Metadata.empty): Unit = {
    if (v == null) { b.append("null"); return }
    val jsonAlias = flag(meta, JsonAliasKey)
    if (flag(meta, TimeAliasKey)) { appendTime(b, v); return }
    dt match {
      case st: StructType if flag(meta, UnionAliasKey) =>
        appendUnion(b, st, v.asInstanceOf[Row])
        return
      case _ =>
    }
    dt match {
      case BooleanType => b.append(v.toString)
      case ByteType | ShortType | IntegerType | LongType => b.append(v.toString)
      case FloatType =>
        val f = v.asInstanceOf[Float]
        if (f.isNaN || f.isInfinite) b.append("null") else b.append(f.toString)
      case DoubleType =>
        val d = v.asInstanceOf[Double]
        if (d.isNaN || d.isInfinite) b.append("null") else b.append(d.toString)
      case t: DecimalType =>
        val dec = v.asInstanceOf[java.math.BigDecimal]
        // HUGEINT rule: integral decimals beyond double-exact range go
        // out as strings; everything else as a plain number.
        if (t.scale == 0 && dec.abs.compareTo(new java.math.BigDecimal(1L << 53)) > 0)
          appendString(b, dec.toPlainString)
        else b.append(dec.toPlainString)
      case StringType =>
        val s = v.toString
        if ((jsonAlias || flag(meta, VariantAliasKey)) && embedsAsJson(s))
          b.append(s.trim)
        else appendString(b, s)
      case VariantType =>
        // native Spark 4 variant: toJson is the reference's "re-parse
        // as JSON" made total — the binary IS typed, so no string
        // round-trip; a corrupt value degrades to the string form
        try b.append(v.asInstanceOf[org.apache.spark.unsafe.types.VariantVal]
          .toJson(ZoneOffset.UTC))
        catch { case _: Exception => appendString(b, v.toString) }
      case DateType =>
        appendString(b, v.toString) // java.sql.Date / LocalDate both print YYYY-MM-DD
      case TimestampType | TimestampNTZType =>
        val inst = v match {
          case t: java.sql.Timestamp => t.toInstant
          case t: java.time.Instant => t
          case t: java.time.LocalDateTime => t.toInstant(ZoneOffset.UTC)
          case other => java.sql.Timestamp.valueOf(other.toString).toInstant
        }
        appendString(b, tsFormat.format(inst))
      case BinaryType =>
        appendString(b, escapeBlob(v.asInstanceOf[Array[Byte]]))
      case CalendarIntervalType =>
        val ci = v.asInstanceOf[org.apache.spark.unsafe.types.CalendarInterval]
        appendString(b, s"${ci.months}:${ci.days}.${ci.microseconds / 1000}")
      case ArrayType(et, _) =>
        b.append('[')
        val seq = v.asInstanceOf[scala.collection.Seq[Any]]
        var i = 0
        seq.foreach { e =>
          if (i > 0) b.append(',')
          appendValue(b, et, e)
          i += 1
        }
        b.append(']')
      case MapType(_, vt, _) =>
        // keys stringified per the reference's MAP contract
        b.append('{')
        val m = v.asInstanceOf[scala.collection.Map[Any, Any]]
        var i = 0
        m.foreach { case (k, mv) =>
          if (i > 0) b.append(',')
          appendString(b, String.valueOf(k))
          b.append(':')
          appendValue(b, vt, mv)
          i += 1
        }
        b.append('}')
      case st: StructType =>
        val r = v.asInstanceOf[Row]
        b.append('{')
        var i = 0
        while (i < st.length) {
          if (i > 0) b.append(',')
          appendString(b, st(i).name)
          b.append(':')
          appendValue(b, st(i).dataType, r.get(i), st(i).metadata)
          i += 1
        }
        b.append('}')
      case _ =>
        appendString(b, v.toString) // VARIANT/unknown: ToString fallback
    }
  }

  /** TIME convention: micros-since-midnight → HH:MM:SS.mmm
    * (query_executor.cpp:407-413 emits exactly this shape). */
  private def appendTime(b: StringBuilder, v: Any): Unit = v match {
    case n: Number =>
      val micros = n.longValue()
      if (micros < 0L || micros >= 86400000000L) { b.append("null"); return }
      val h = micros / 3600000000L
      val m = micros / 60000000L % 60
      val s = micros / 1000000L % 60
      val ms = micros / 1000L % 1000
      appendString(b, f"$h%02d:$m%02d:$s%02d.$ms%03d")
    case other => appendString(b, other.toString)
  }

  /** UNION convention: struct child 0 is the integral tag, member i
    * lives at child i+1; emit ONLY the active member as {name: value}.
    * Out-of-range tags fail safe to null rather than reading a
    * different member (query_executor.cpp:655-681). */
  private def appendUnion(b: StringBuilder, st: StructType, r: Row): Unit = {
    val tagOk = st.length >= 2 && !r.isNullAt(0) &&
      (r.get(0) match { case _: Number => true; case _ => false })
    if (!tagOk) { b.append("null"); return }
    val member = r.get(0).asInstanceOf[Number].intValue() + 1
    if (member < 1 || member >= st.length) { b.append("null"); return }
    b.append('{')
    appendString(b, st(member).name)
    b.append(':')
    appendValue(b, st(member).dataType, r.get(member), st(member).metadata)
    b.append('}')
  }

  /** A JSON alias embeds raw iff it parses as a JSON object/array/
    * scalar; cheap validation via jackson (malformed → escaped string,
    * matching the reference's degradation). */
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def embedsAsJson(s: String): Boolean =
    try { mapper.readTree(s); s.trim.nonEmpty }
    catch { case _: Exception => false }

  def appendString(b: StringBuilder, s: String): Unit = {
    b.append('"')
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => b.append("\\\"")
        case '\\' => b.append("\\\\")
        case '\b' => b.append("\\b")
        case '\f' => b.append("\\f")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case '\t' => b.append("\\t")
        case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
        case c => b.append(c)
      }
      i += 1
    }
    b.append('"')
  }

  /** BLOB escape: printable ASCII verbatim, backslash doubled, the rest
    * as \xNN (reference query_executor.cpp:511-545). */
  def escapeBlob(bytes: Array[Byte]): String = {
    val b = new StringBuilder(bytes.length)
    bytes.foreach { by =>
      val c = by & 0xff
      if (c == '\\') b.append("\\\\")
      else if (c >= 0x20 && c < 0x7f) b.append(c.toChar)
      else b.append(f"\\x${c}%02X")
    }
    b.toString
  }
}
