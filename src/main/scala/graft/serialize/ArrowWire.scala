package graft.serialize

import java.io.{ByteArrayOutputStream, OutputStream}
import java.nio.channels.Channels
import scala.jdk.CollectionConverters._

import org.apache.arrow.compression.CommonsCompressionFactory
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.compression.CompressionUtil
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.arrow.vector.ipc.message.IpcOption
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Arrow IPC *stream* result sink (reference:
  * /root/reference/src/include/arrow_serializer.hpp — schema message +
  * record batches, LZ4/ZSTD frame compression, documented batch-size
  * default 122,880 rows).
  *
  * Flat columns map to native Arrow types; nested ARRAY/STRUCT/MAP
  * columns serialize as their JSON wire form in a Utf8 column (the
  * JSON path is the §1.2 contract; full nested Arrow layout is an
  * optimization, not a semantic change — consumers see the same
  * values).
  *
  * Scale: [[stream]] consumes a row ITERATOR and emits one record
  * batch per `batchRows` rows directly to the output stream — driver
  * memory is bounded by one batch regardless of result size (feed it
  * `df.toLocalIterator()`, which pulls one partition at a time). Bulk
  * export at cluster scale would instead write arrow/parquet files per
  * partition; this is the serving wire, not the export path.
  */
object ArrowWire {

  /** The reference's documented batch-size default (arrow_serializer.hpp:34). */
  val DefaultBatchRows = 122880

  /** Wire codec names accepted on the serving config ("lz4", "zstd"). */
  def codecOf(name: String): CompressionUtil.CodecType = name.toLowerCase match {
    case "lz4" | "lz4_frame" => CompressionUtil.CodecType.LZ4_FRAME
    case "zstd" => CompressionUtil.CodecType.ZSTD
    case other => throw new IllegalArgumentException(
      s"unknown arrow codec '$other' (lz4|zstd)")
  }

  private def scalarArrowType(dt: DataType): Option[ArrowType] = dt match {
    case BooleanType => Some(ArrowType.Bool.INSTANCE)
    case ByteType => Some(new ArrowType.Int(8, true))
    case ShortType => Some(new ArrowType.Int(16, true))
    case IntegerType => Some(new ArrowType.Int(32, true))
    case LongType => Some(new ArrowType.Int(64, true))
    case FloatType => Some(new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE))
    case DoubleType => Some(new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE))
    case d: DecimalType => Some(new ArrowType.Decimal(d.precision, d.scale, 128))
    case DateType => Some(new ArrowType.Date(DateUnit.DAY))
    case TimestampType => Some(new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC"))
    case TimestampNTZType => Some(new ArrowType.Timestamp(TimeUnit.MICROSECOND, null))
    case BinaryType => Some(ArrowType.Binary.INSTANCE)
    case StringType => Some(ArrowType.Utf8.INSTANCE)
    case _ => None
  }

  private def arrowField(f: StructField): Field = f.dataType match {
    // one nesting level maps natively: List<scalar> and Struct<scalar>
    case ArrayType(et, _) if scalarArrowType(et).isDefined =>
      val child = new Field("element",
        FieldType.nullable(scalarArrowType(et).get),
        java.util.Collections.emptyList())
      new Field(f.name, FieldType.nullable(ArrowType.List.INSTANCE),
        java.util.List.of(child))
    case st: StructType if st.fields.forall(sf => scalarArrowType(sf.dataType).isDefined) =>
      val children = st.fields.map(sf => new Field(sf.name,
        FieldType.nullable(scalarArrowType(sf.dataType).get),
        java.util.Collections.emptyList())).toSeq
      new Field(f.name, FieldType.nullable(ArrowType.Struct.INSTANCE),
        children.asJava)
    case dt =>
      val t = scalarArrowType(dt).getOrElse(ArrowType.Utf8.INSTANCE) // deep nesting: JSON
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
      case (lv: org.apache.arrow.vector.complex.ListVector, ArrayType(et, _)) =>
        val child = lv.getDataVector
        val seq = v.asInstanceOf[scala.collection.Seq[Any]]
        val start = lv.startNewValue(i)
        var j = 0
        seq.foreach { e =>
          if (e == null) setNull(child, start + j)
          else setCell(child, start + j, et, e)
          j += 1
        }
        lv.endValue(i, j)
      case (sv: org.apache.arrow.vector.complex.StructVector, st: StructType) =>
        val row = v.asInstanceOf[Row]
        sv.setIndexDefined(i)
        var c = 0
        while (c < st.length) {
          val childVec = sv.getChild(st(c).name)
          if (row.isNullAt(c)) setNull(childVec, i)
          else setCell(childVec, i, st(c).dataType, row.get(c))
          c += 1
        }
      case (t: VarCharVector, nested) =>
        // deep nesting beyond one level: JSON wire form
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

  /** Serialize rows to one in-memory Arrow IPC stream (small results /
    * tests); the serving path uses [[stream]]. */
  def serialize(schema: StructType, rows: Iterator[Row],
                batchRows: Int = DefaultBatchRows,
                codec: Option[CompressionUtil.CodecType] = None): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    stream(schema, rows, out, batchRows, codec)
    out.toByteArray
  }

  /** Stream rows as Arrow IPC record batches to `out`, one batch per
    * `batchRows` rows, optionally LZ4/ZSTD frame-compressed. Memory is
    * bounded by one batch: each batch's vectors are filled, written,
    * and reset before the next is pulled from the iterator. Every
    * stream reports to [[ArrowMetrics]] (requests, batches, rows,
    * vector vs wire bytes, duration, active/peak gauges — the
    * reference's arrow_metrics.hpp counters). */
  def stream(schema: StructType, rows: Iterator[Row], out: OutputStream,
             batchRows: Int = DefaultBatchRows,
             codec: Option[CompressionUtil.CodecType] = None): Unit = {
    val t0 = System.nanoTime()
    ArrowMetrics.streamStarted(codec.isDefined)
    var ok = false
    val counted = new java.io.FilterOutputStream(out) {
      var bytes = 0L
      override def write(b: Int): Unit = { bytes += 1; out.write(b) }
      override def write(b: Array[Byte], off: Int, len: Int): Unit = {
        bytes += len; out.write(b, off, len)
      }
    }
    try {
      val allocator = new RootAllocator()
      try {
        val root = VectorSchemaRoot.create(arrowSchema(schema), allocator)
        try {
          val ch = Channels.newChannel(counted)
          val writer = codec match {
            case Some(c) => new ArrowStreamWriter(root, null, ch,
              IpcOption.DEFAULT, CommonsCompressionFactory.INSTANCE, c)
            case None => new ArrowStreamWriter(root, null, ch)
          }
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
            ArrowMetrics.batchWritten(i.toLong,
              vecs.map(_.getBufferSize.toLong).sum)
            writer.writeBatch()
            wrote = true
          }
          if (!wrote) { // empty result still carries the schema
            root.allocateNew(); root.setRowCount(0); writer.writeBatch()
            ArrowMetrics.batchWritten(0L, 0L)
          }
          writer.end()
          ok = true
        } finally root.close()
      } finally allocator.close()
    } finally ArrowMetrics.streamFinished(ok, counted.bytes,
      (System.nanoTime() - t0) / 1000)
  }
}
