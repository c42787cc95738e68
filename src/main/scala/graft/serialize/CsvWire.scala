package graft.serialize

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** CSV result sink matching the reference's converter
  * (/root/reference/src/request_handler.cpp:578-630):
  *
  *  - header = column names passed through escapeCSV (quote + double
  *    embedded quotes only when the name contains , " or newline);
  *  - data cells = the JSON rendering of each value (the reference
  *    dumps the crow JSON value per cell — strings arrive JSON-quoted
  *    with JSON escapes, nested values as inline JSON). Faithful
  *    reproduction keeps CSV output byte-compatible for consumers of
  *    the reference.
  */
object CsvWire {

  def escapeCSV(s: String): String =
    if (!s.exists(c => c == ',' || c == '"' || c == '\n')) s
    else "\"" + s.replace("\"", "\"\"") + "\""

  def header(schema: StructType): String =
    schema.fieldNames.map(escapeCSV).mkString(",")

  def line(schema: StructType, r: Row): String = {
    val b = new StringBuilder
    var i = 0
    while (i < schema.length) {
      if (i > 0) b.append(',')
      val f = schema(i)
      // cell = JSON value dump, exactly like serializeObjectToCsvLine
      JsonWire.appendValue(b, f.dataType, r.get(i))
      i += 1
    }
    b.toString
  }

  /** Serialize a full (already-limited) result. Collect happens on the
    * caller's terms — paginated endpoint results are ≤ limit rows. */
  def serialize(schema: StructType, rows: Iterator[Row]): String = {
    val b = new StringBuilder
    b.append(header(schema)).append('\n')
    rows.foreach(r => b.append(line(schema, r)).append('\n'))
    b.toString
  }

  /** Stream rows to `out` without materializing the result: one line
    * at a time from the iterator (feed it `df.toLocalIterator()` so
    * driver memory is bounded by one partition, not the result). */
  def stream(schema: StructType, rows: Iterator[Row],
             out: java.io.OutputStream): Unit = {
    out.write((header(schema) + "\n").getBytes("UTF-8"))
    rows.foreach { r =>
      out.write((line(schema, r) + "\n").getBytes("UTF-8"))
    }
  }
}
