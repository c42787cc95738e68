package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `mg_topk(term, k)` — Misra–Gries heavy-hitters summary as a native
  * [[TypedImperativeAggregate]]: the deterministic-GUARANTEE sibling of
  * the CMS sketch family (cms_heavy_hitters): a Misra–Gries summary of
  * capacity k NEVER drops an item whose true frequency exceeds
  * n/(k+1) — no false negatives, the property CMS cannot give — and
  * per-item undercount is bounded by the same n/(k+1).
  *
  * Spark-native shape: partial summaries build map-side (each update
  * is O(1) amortized; the decrement step's O(k) amortizes against the
  * insertions that paid for it), MERGE exactly (counts add, then the
  * (k+1)-th largest count subtracts from all — the standard mergeable
  * form, Agarwal et al. 2013, "Mergeable summaries"), and only
  * k-entry buffers cross the exchange — the aggregate's shuffle
  * payload is O(k · partitions) regardless of corpus size.
  * ObjectHashAggregate executes it exactly like the built-in sketch
  * aggregates (hll_sketch_agg); serialize/deserialize is a flat
  * (count, entries) byte image.
  *
  * The CANDIDATE SET a summary returns is order-dependent (which
  * below-threshold stragglers survive depends on merge order) — exact
  * results come from the standard two-pass protocol the gated query
  * applies: MG narrows to ≤ k candidates, an exact count pass verifies
  * against the true threshold. The superset theorem makes the verified
  * output exact and deterministic; MgTopKSpec gates it under
  * adversarial splits.
  */
case class MisraGriesTopK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1 && k <= 4096, s"mg_topk: capacity k must be in [1, 4096], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mg_topk expects a STRING column, got $other")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    // UTF8String may view a reused backing buffer — copy to a String key
    val key = v.asInstanceOf[UTF8String].toString
    buf.get(key) match {
      case Some(c) => buf.update(key, c + 1)
      case None if buf.size < k => buf.update(key, 1L)
      case None =>
        // classic MG decrement: one shared -1 across all k counters
        // stands in for the unstored new item; zeros evict
        val dead = mutable.ArrayBuffer.empty[String]
        buf.foreach { case (t, c) =>
          if (c <= 1L) dead += t else buf.update(t, c - 1) }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
    MisraGriesTopK.mergeInto(buf, other, k)

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toSeq.sortBy { case (t, c) => (-c, t) }.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c) }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    // length-prefixed raw UTF-8, NOT writeUTF: writeUTF caps a string
    // at 65535 encoded bytes and raw corpus tokens (base64 blobs,
    // minified JS) can exceed it — a shuffle-time serialize crash
    buf.foreach { case (t, c) =>
      val b = t.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesTopK =
    copy(child = newChildren.head)

  override def prettyName: String = "mg_topk"
}

object MisraGriesTopK {
  /** The exact mergeable-summaries combine (Agarwal et al. 2013):
    * counts add, the (k+1)-th largest subtracts from all, non-positive
    * entries evict — ≤ k survivors and the error bounds SUM across
    * merges. Shared by the aggregate's shuffle merge and the streaming
    * standing-summary maintenance
    * ([[graft.streaming.Streaming.mgSummaryStream]]'s driver-side
    * absorb), so the two paths cannot drift. */
  def mergeInto(buf: mutable.HashMap[String, Long],
      other: collection.Map[String, Long], k: Int): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) =>
      buf.update(t, buf.getOrElse(t, 0L) + c) }
    if (buf.size > k) {
      val cut = buf.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.foreach { case (t, c) =>
        if (c - cut <= 0L) dead += t else buf.update(t, c - cut) }
      dead.foreach(buf.remove)
    }
    buf
  }
}
