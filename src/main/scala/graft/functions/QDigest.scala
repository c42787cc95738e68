package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `qdigest(value, k, b)` — q-digest mergeable quantile summary as a
  * native [[TypedImperativeAggregate]] (Shrivastava et al. 2004,
  * "Medians and beyond"; mergeability per Agarwal et al. 2013,
  * "Mergeable summaries") — the second member of this library's
  * native-aggregate class next to [[MisraGriesTopK]], chosen over
  * KLL/GK deliberately: q-digest is fully DETERMINISTIC (no random
  * sampling — same inputs, same summary, the integer-determinism
  * discipline every gated artifact here follows) and its merge is
  * plain nodewise count addition + recompress.
  *
  * Model: values are non-negative integers clamped to the universe
  * [0, 2^b); each value is a leaf of the implicit complete binary tree
  * over the universe (root id 1, children 2i/2i+1, leaf for v at
  * 2^b + v). Compression folds a node and its sibling into their
  * parent while count(v)+count(sibling)+count(parent) ≤ ⌊n/k⌋,
  * giving ≤ 3k stored nodes and the RANK guarantee: any value's rank
  * estimated off the digest is within b·⌊n/k⌋ of the true rank —
  * ε = b/k relative error, independent of merge order or data
  * distribution (QDigestSpec gates the bound under adversarial
  * repartitionings).
  *
  * Spark-native shape: partial digests build map-side (O(1) leaf
  * increments, compression amortized), only ≤ 3k-entry buffers cross
  * the exchange (compressed again in `serialize`, so the shuffle
  * payload is O(k · partitions) regardless of corpus size), and
  * ObjectHashAggregate executes it like the built-in sketch
  * aggregates. The exchange payload replaces the full value-frequency
  * table — at 100 TB the difference between a bounded-state
  * aggregation and a corpus-sized shuffle.
  *
  * Like the MG summary, the digest's ESTIMATES are rank-bounded, not
  * exact — exact results come from the two-pass protocol the gated
  * consumer applies ([[graft.queries.TextQueries]]
  * `qdigest_verified_deciles`): the digest brackets each quantile's
  * value window, an exact pass re-scans ONLY that window (a
  * pushed-down range filter) and resolves the true quantile.
  */
/** Everything the two q-digest aggregates share — buffer lifecycle,
  * the mergeable combine, output shape, and the compress-before-ship
  * serialization — ONE implementation so the build and merge paths
  * cannot drift (the library's one-implementation discipline; review
  * catch: the first spelling copy-pasted ~60 lines). Subclasses
  * supply only their input contract (`update` + type check). */
abstract class QDigestAggBase
    extends TypedImperativeAggregate[mutable.HashMap[Long, Long]] {
  def k: Int
  def b: Int

  // parameter-range validation lives in the SUBCLASS bodies, not here:
  // this abstract class is the first non-Serializable superclass, so
  // Java deserialization on the executor runs ITS constructor with the
  // fields still unset — a constructor-time require on k/b fails every
  // deserialized task with k=0 (found the hard way)
  protected final def validateParams(): Unit = {
    require(k >= 8 && k <= 65536,
      s"$prettyName: compression k must be in [8, 65536], got $k")
    require(b >= 1 && b <= 40,
      s"$prettyName: universe log2 b must be in [1, 40], got $b")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("node", LongType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[Long, Long] =
    mutable.HashMap.empty

  override def merge(buf: mutable.HashMap[Long, Long],
      other: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] =
    QDigest.mergeInto(buf, other, k, b)

  override def eval(buf: mutable.HashMap[Long, Long]): Any = {
    QDigest.compress(buf, k, b)
    // the emitted image leads with the header pseudo-node carrying
    // (k, b), so a later qdigest_merge can verify BOTH parameters in
    // BOTH directions (r13 advice: the depth check alone rejects only
    // larger-b digests — a smaller-b digest's leaves reinterpret as
    // internal nodes and corrupt silently). id 0 sorts first and is
    // outside the node-id space (ids start at the root, 1).
    val header = InternalRow(QDigest.HeaderNode, QDigest.headerCount(k, b))
    val rows = header +: buf.toSeq.sortBy(_._1)
      .map { case (id, c) => InternalRow(id, c) }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[Long, Long]): Array[Byte] = {
    // compress BEFORE shipping: the exchange carries ≤ 3k entries
    QDigest.compress(buf, k, b)
    QDigest.encode(buf)
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Long, Long] = {
    val m = mutable.HashMap.empty[Long, Long]
    QDigest.decode(bytes).foreach { case (id, c) => m.update(id, c) }
    m
  }
}

case class QDigestAgg(
    child: Expression,
    k: Int,
    b: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends QDigestAggBase {

  validateParams()

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"qdigest expects an integral column, got $other")
  }

  override def update(buf: mutable.HashMap[Long, Long],
      input: InternalRow): mutable.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val leaf = QDigest.leafOf(v.asInstanceOf[Number].longValue(), b)
    buf.update(leaf, buf.getOrElse(leaf, 0L) + 1L)
    // amortized compaction: past 6k live nodes, one compress pass pays
    // for the ≥ 3k insertions since the last one
    if (buf.size > 6 * k) QDigest.compress(buf, k, b)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QDigestAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "qdigest"
}

/** `qdigest_merge(digest, k, b)` — re-aggregates STORED q-digest
  * summaries (the `array<struct<node,cnt>>` image `qdigest` emits):
  * the `hll_union_agg` analog for the quantile sketch, and the piece
  * that makes the digest a first-class STORED artifact at 100 TB — a
  * pipeline sketches each ingest partition/day once, persists the
  * ≤ 3k-node summaries next to the data, and any later rollup (per
  * source, per month, whole corpus) merges the summaries WITHOUT
  * touching the rows. Merge is nodewise addition + recompress (the
  * mergeable-summaries rule), so the rank guarantee survives any
  * rollup tree. Hash-gated end-to-end by `qdigest_rollup_deciles`:
  * a per-source sketch layer merged through this aggregate must
  * reproduce the EXACT corpus deciles through the verified two-pass. */
case class QDigestMergeAgg(
    child: Expression,
    k: Int,
    b: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends QDigestAggBase {

  validateParams()

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fields), _)
        if fields.length == 2 &&
          fields.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"qdigest_merge expects array<struct<node: bigint, cnt: bigint>>, got $other")
  }

  override def update(buf: mutable.HashMap[Long, Long],
      input: InternalRow): mutable.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var i = 0
    while (i < arr.numElements()) {
      // null elements/fields skip like null inputs everywhere else
      // (review catch: getStruct returns null for a null element)
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val id = row.getLong(0)
          if (id == QDigest.HeaderNode) {
            // the header pseudo-node carries the digest's own (k, b):
            // verify BOTH parameters, BOTH directions (a smaller-b
            // digest's leaves would reinterpret as internal nodes over
            // ranges scaled by 2^(b-b') — plausible, silently wrong)
            val (sk, sb) = QDigest.headerParams(row.getLong(1))
            require(sk == k && sb == b,
              s"qdigest_merge: the stored digests were sketched with " +
                s"(k=$sk, b=$sb) but this merge was called with " +
                s"(k=$k, b=$b); merge with the parameters they were " +
                "sketched at")
          } else {
            // legacy headerless digests still get the one-directional
            // depth check: an id deeper than b means a LARGER sketch b
            // (the smaller-b direction is undetectable without the
            // header — headered digests, i.e. anything this library
            // emits, are verified both ways above). Directed error
            // over silent corruption (1L << negative wraps).
            require(id >= 1L && QDigest.depth(id) <= b,
              s"qdigest_merge: node id $id exceeds universe log2 b=$b — " +
                "the stored digests were built with different (k, b) " +
                "parameters; merge with the b they were sketched at")
            buf.update(id, buf.getOrElse(id, 0L) + row.getLong(1))
          }
        }
      }
      i += 1
    }
    if (buf.size > 6 * k) QDigest.compress(buf, k, b)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QDigestMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QDigestMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QDigestMergeAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "qdigest_merge"
}

/** Driver-side q-digest arithmetic, shared by the aggregate's merge,
  * the gated two-pass consumer, and the streaming quantile monitor —
  * one implementation so the paths cannot drift (the MisraGriesTopK
  * .mergeInto discipline). All rank arithmetic is integer/BigInt —
  * no double ever enters a verdict. */
object QDigest {

  /** Header pseudo-node id in the EMITTED image (`eval` output only —
    * never in a live buffer, the shuffle image, or a ledger payload):
    * real node ids start at the root, 1, so 0 is free. Its `cnt`
    * packs the sketch parameters so [[QDigestMergeAgg]] can verify a
    * stored digest's (k, b) in both directions. */
  val HeaderNode: Long = 0L

  /** (k ≤ 65536 in bits 8+, b ≤ 40 in the low byte) — matches the
    * validateParams ranges. */
  def headerCount(k: Int, b: Int): Long = (k.toLong << 8) | b.toLong

  def headerParams(cnt: Long): (Int, Int) =
    (((cnt >> 8) & 0x1FFFFL).toInt, (cnt & 0xFFL).toInt)

  /** Entry map from the aggregate's emitted `array<struct<node,cnt>>`
    * rows, header stripped — THE parse for every driver-side consumer
    * (gated two-pass, streaming monitor, specs), so none can forget
    * the header and double-count it in [[totalOf]]. */
  def entriesOfRows(rows: Seq[org.apache.spark.sql.Row]): Map[Long, Long] =
    rows.iterator.map(r => r.getLong(0) -> r.getLong(1))
      .filter(_._1 != HeaderNode).toMap

  /** Depth of node id (root = 0, leaves = b). */
  @inline def depth(id: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(id)

  /** Leaf id for a value, clamped into the universe [0, 2^b). */
  def leafOf(v: Long, b: Int): Long = {
    val max = (1L << b) - 1L
    val c = if (v < 0L) 0L else if (v > max) max else v
    (1L << b) + c
  }

  /** Inclusive value range [lo, hi] covered by node id. */
  def rangeOf(id: Long, b: Int): (Long, Long) = {
    val d = depth(id)
    val width = 1L << (b - d)
    val lo = (id - (1L << d)) * width
    (lo, lo + width - 1L)
  }

  /** In-place bottom-up compression: while a node, its sibling, and
    * its parent together carry ≤ ⌊n/k⌋, they fold into the parent.
    * Deterministic (levels bottom-up, ids ascending). Post-condition:
    * ≤ 3k live nodes (the standard q-digest size argument). */
  def compress(buf: mutable.HashMap[Long, Long], k: Int, b: Int): Unit = {
    var n = 0L
    buf.valuesIterator.foreach(n += _)
    val t = n / k
    // below k items the threshold is 0 and NOTHING folds — the digest
    // is exact (≤ n < k leaves live), which is also what keeps small
    // partial digests from losing precision before their merge
    if (t == 0L) return
    var level = b
    while (level >= 1) {
      val ids = buf.keysIterator.filter(depth(_) == level).toArray
      java.util.Arrays.sort(ids)
      ids.foreach { id =>
        buf.get(id).foreach { c => // sibling may already have folded us
          val sib = id ^ 1L
          val par = id >> 1
          val tot = c + buf.getOrElse(sib, 0L) + buf.getOrElse(par, 0L)
          if (tot <= t) {
            buf.remove(id); buf.remove(sib)
            buf.update(par, tot)
          }
        }
      }
      level -= 1
    }
  }

  /** Nodewise-additive merge + recompress — the exact mergeable-
    * summaries combine. Shared by the aggregate's shuffle merge and
    * the streaming standing-digest maintenance. */
  def mergeInto(buf: mutable.HashMap[Long, Long],
      other: collection.Map[Long, Long], k: Int, b: Int): mutable.HashMap[Long, Long] = {
    other.foreach { case (id, c) => buf.update(id, buf.getOrElse(id, 0L) + c) }
    compress(buf, k, b)
    buf
  }

  /** Total count carried by a digest (= exact input row count: every
    * non-null row lands in exactly one node). */
  def totalOf(entries: collection.Map[Long, Long]): Long = {
    var n = 0L
    entries.valuesIterator.foreach(n += _)
    n
  }

  /** Value whose digest-estimated rank first reaches `targetRank`
    * (1-based): nodes walk in postorder (ascending hi, then narrower
    * ranges first — a child precedes its ancestor), counts accumulate,
    * and the first node reaching the target reports its range's hi.
    * The reported value's TRUE rank is within b·⌊n/k⌋ of targetRank
    * (the digest guarantee, spec-gated). */
  def valueAtRank(entries: collection.Map[Long, Long], b: Int,
      targetRank: Long): Long = {
    val sorted = entries.toSeq.map { case (id, c) =>
      val (lo, hi) = rangeOf(id, b); (hi, lo, c)
    }.sortBy { case (hi, lo, _) => (hi, -lo) }
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._3
      if (cum >= targetRank) return sorted(i)._1
      i += 1
    }
    if (sorted.nonEmpty) sorted.last._1 else 0L
  }

  /** φ-quantile estimate (φ = num/den) at the discrete-rank
    * convention target = ⌈φ·n⌉. */
  def quantile(entries: collection.Map[Long, Long], b: Int,
      num: Long, den: Long): Long = {
    val n = totalOf(entries)
    if (n == 0L) return 0L
    val target = ((BigInt(num) * n + den - 1) / den).toLong
    valueAtRank(entries, b, math.max(1L, target))
  }

  /** Lower-bound rank estimate of `v`: total count of nodes whose
    * whole range is ≤ v. True rank(v) ∈ [est, est + b·⌊n/k⌋]. */
  def rankLowerBound(entries: collection.Map[Long, Long], b: Int, v: Long): Long = {
    var r = 0L
    entries.foreach { case (id, c) => if (rangeOf(id, b)._2 <= v) r += c }
    r
  }

  /** Conservative value window guaranteed to contain the TRUE value of
    * rank `targetRank`: the digest values at targetRank ∓ slack where
    * slack = b·⌊n/k⌋ + 1 ≥ the digest's worst-case rank error. The
    * gated consumer's exact pass scans ONLY this window. */
  def valueWindow(entries: collection.Map[Long, Long], b: Int, k: Int,
      targetRank: Long): (Long, Long) = {
    val n = totalOf(entries)
    val slack = b.toLong * math.max(1L, n / k) + 1L
    val lo = valueAtRank(entries, b, math.max(1L, targetRank - slack))
    val hi = valueAtRank(entries, b, math.min(n, targetRank + slack))
    (lo, hi)
  }

  /** Flat (size, (node, cnt)*) byte image — the aggregate's shuffle
    * form and the streaming monitor's ledger payload. */
  def encode(entries: collection.Map[Long, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(entries.size)
    entries.toSeq.sortBy(_._1).foreach { case (id, c) =>
      out.writeLong(id); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  def decode(bytes: Array[Byte]): Seq[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    (0 until n).map(_ => (in.readLong(), in.readLong()))
  }
}
