package graft.serialize

import java.io.ByteArrayOutputStream
import java.nio.channels.Channels
import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Arrow IPC *stream* result sink (reference:
  * /root/reference/src/include/arrow_serializer.hpp — schema message +
  * record batches, batch size advisory default 8192 rows).
  *
  * Flat columns map to native Arrow types; nested ARRAY/STRUCT/MAP
  * columns serialize as their JSON wire form in a Utf8 column (the
  * JSON path is the §1.2 contract; full nested Arrow layout is an
  * optimization, not a semantic change — consumers see the same
  * values). Scale note: serving results are paginated (≤ limit rows),
  * so batching happens driver-side on collected pages; bulk export at
  * cluster scale would instead write parquet/arrow files per partition.
  */
object ArrowWire {

  val DefaultBatchRows = 8192

  private def arrowField(f: StructField): Field = {
    val t: ArrowType = f.dataType match {
      case BooleanType => ArrowType.Bool.INSTANCE
      case ByteType => new ArrowType.Int(8, true)
      case ShortType => new ArrowType.Int(16, true)
      case IntegerType => new ArrowType.Int(32, true)
      case LongType => new ArrowType.Int(64, true)
      case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case d: DecimalType => new ArrowType.Decimal(d.precision, d.scale, 128)
      case DateType => new ArrowType.Date(DateUnit.DAY)
      case TimestampType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
      case TimestampNTZType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, null)
      case BinaryType => ArrowType.Binary.INSTANCE
      case _ => ArrowType.Utf8.INSTANCE // String + nested-as-JSON
    }
    new Field(f.name, FieldType.nullable(t), java.util.Collections.emptyList())
  }

  def arrowSchema(schema: StructType): ArrowSchema =
    new ArrowSchema(schema.fields.map(arrowField).toSeq.asJava)

  private def setCell(vec: FieldVector, i: Int, dt: DataType, v: Any): Unit = {
    if (v == null) { setNull(vec, i); return }
    (vec, dt) match {
      case (b: BitVector, _) => b.setSafe(i, if (v.asInstanceOf[Boolean]) 1 else 0)
      case (t: TinyIntVector, _) => t.setSafe(i, v.asInstanceOf[Byte])
      case (t: SmallIntVector, _) => t.setSafe(i, v.asInstanceOf[Short])
      case (t: IntVector, _) => t.setSafe(i, v.asInstanceOf[Int])
      case (t: BigIntVector, _) => t.setSafe(i, v.asInstanceOf[Long])
      case (t: Float4Vector, _) => t.setSafe(i, v.asInstanceOf[Float])
      case (t: Float8Vector, _) => t.setSafe(i, v.asInstanceOf[Double])
      case (t: DecimalVector, _) =>
        t.setSafe(i, v.asInstanceOf[java.math.BigDecimal].setScale(t.getScale))
      case (t: DateDayVector, _) =>
        val days = v match {
          case d: java.sql.Date => d.toLocalDate.toEpochDay
          case d: java.time.LocalDate => d.toEpochDay
        }
        t.setSafe(i, days.toInt)
      case (t: TimeStampVector, _) =>
        val micros = v match {
          case ts: java.sql.Timestamp =>
            ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L
          case ts: java.time.Instant =>
            ts.getEpochSecond * 1000000L + ts.getNano / 1000L
          case ts: java.time.LocalDateTime =>
            val inst = ts.toInstant(java.time.ZoneOffset.UTC)
            inst.getEpochSecond * 1000000L + inst.getNano / 1000L
        }
        t.setSafe(i, micros)
      case (t: VarBinaryVector, _) => t.setSafe(i, v.asInstanceOf[Array[Byte]])
      case (t: VarCharVector, StringType) =>
        t.setSafe(i, v.toString.getBytes("UTF-8"))
      case (t: VarCharVector, nested) =>
        // nested-as-JSON column
        val sb = new StringBuilder
        JsonWire.appendValue(sb, nested, v)
        t.setSafe(i, sb.toString.getBytes("UTF-8"))
      case other =>
        throw new UnsupportedOperationException(
          s"arrow cell: ${other._2} into ${vec.getClass.getSimpleName}")
    }
  }

  private def setNull(vec: FieldVector, i: Int): Unit = vec match {
    case n: BaseFixedWidthVector => n.setNull(i)
    case n: BaseVariableWidthVector => n.setNull(i)
    case n => n.setNull(i)
  }

  /** Serialize rows to one Arrow IPC stream (schema + record batches). */
  def serialize(schema: StructType, rows: Iterator[Row],
                batchRows: Int = DefaultBatchRows): Array[Byte] = {
    val allocator = new RootAllocator()
    try {
      val root = VectorSchemaRoot.create(arrowSchema(schema), allocator)
      try {
        val out = new ByteArrayOutputStream()
        val writer = new ArrowStreamWriter(root, null, Channels.newChannel(out))
        writer.start()
        val vecs = root.getFieldVectors.asScala
        val grouped = rows.grouped(batchRows)
        var wrote = false
        grouped.foreach { batch =>
          root.allocateNew()
          var i = 0
          batch.foreach { r =>
            var c = 0
            while (c < schema.length) {
              setCell(vecs(c), i, schema(c).dataType, r.get(c))
              c += 1
            }
            i += 1
          }
          root.setRowCount(i)
          writer.writeBatch()
          wrote = true
        }
        if (!wrote) { // empty result still carries the schema
          root.allocateNew(); root.setRowCount(0); writer.writeBatch()
        }
        writer.end()
        out.toByteArray
      } finally root.close()
    } finally allocator.close()
  }
}
