package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `dot_f64(a, b)` → DOUBLE: sequential dot product of two
  * ARRAY<DOUBLE> columns, as a native Catalyst expression.
  *
  * This is the ANN kernel. The `zip_with` + `aggregate` HOF spelling it
  * replaces is interpreted per element — a lambda dispatch per
  * multiplication — which VERDICT r2 measured as 20–43 s for a few
  * thousand 64-dim dots at sf0.1; the compiled loop below is the same
  * arithmetic at nanoseconds per element. Summation is strictly
  * left-to-right in double, matching DuckDB's `list_aggregate(…,
  * 'sum')` ordering, so cos values stay bit-identical to the oracle.
  *
  * The norm is `sqrt(dot_f64(v, v))` — one kernel serves both.
  *
  * Scale: pure per-row projection, no shuffle, no state. At 100 TB the
  * corpus scan stays embarrassingly parallel and this expression is the
  * only CPU on the hot path — which is exactly where a compiled loop vs
  * an interpreted lambda is the difference between scan-bound and
  * CPU-bound. (CodegenFallback: the surrounding stage stays codegen'd
  * and calls eval; the loop itself is JVM-compiled.)
  */
case class DotF64(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"dot_f64 expects (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got ($l, $r)")
    }

  // a null ELEMENT or a length mismatch yields NULL, matching the
  // zip_with+aggregate HOF spelling this expression replaced (zip_with
  // pads the short side with null; null propagates through * and +) —
  // a silent 0.0 for a null slot would invent a finite similarity
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF64 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_f64"
}

/** `quantize_u8(v)` → STRUCT<qmin DOUBLE, qmax DOUBLE, qsum BIGINT,
  * recon_cos DOUBLE>: int8 scalar quantization digest — the standard
  * 4×-storage-cut vector-store technique (min/max per-vector scale,
  * codes = round((x-lo)/(hi-lo)*255)), summarized as the code sum plus
  * the cosine between the original and its reconstruction.
  *
  * Every step is deterministic IEEE arithmetic applied per row in a
  * fixed order (sequential sums, half-up rounding of non-negative
  * scaled values), so a SQL oracle replays the digest EXACTLY — unlike
  * learned/sketched operators, quantization needs no error-bound gate.
  * Scale: pure map-side projection, zero shuffles; the one compiled
  * pass replaces three interpreted list-lambda traversals.
  * NULL for empty/degenerate (hi ≤ lo) or null-element vectors; the
  * caller filters those, mirroring the oracle's `WHERE hi > lo`.
  */
case class QuantizeU8(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("qmin", DoubleType, nullable = false),
    StructField("qmax", DoubleType, nullable = false),
    StructField("qsum", LongType, nullable = false),
    StructField("recon_cos", DoubleType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"quantize_u8 expects ARRAY<DOUBLE>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n == 0) return null
    var lo = Double.MaxValue
    var hi = Double.MinValue
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getDouble(i)
      if (v < lo) lo = v
      if (v > hi) hi = v
      i += 1
    }
    if (!(hi > lo)) return null
    val range = hi - lo
    var qsum = 0L
    var dot = 0.0
    var nv = 0.0
    var nr = 0.0
    i = 0
    while (i < n) {
      val v = x.getDouble(i)
      // round-half-away-from-zero on the non-negative double t,
      // matching DuckDB's round() bit-for-bit. NOT floor(t+0.5): the
      // IEEE add can carry t over the half (t=0.49999999999999994 →
      // t+0.5 rounds to 1.0, floor gives 1, true rounding gives 0).
      // t - floor(t) is EXACT for t ≥ 0 (Sterbenz: floor(t) ≥ t/2
      // whenever floor(t) ≥ 1; trivial at floor(t)=0), so comparing
      // the exact fraction against 0.5 is the correct branch.
      val t = (v - lo) / range * 255
      val tf = math.floor(t)
      val c = if (t - tf >= 0.5) tf + 1 else tf
      qsum += c.toLong
      val r = lo + c * range / 255
      dot += v * r
      nv += v * v
      nr += r * r
    i += 1
    }
    InternalRow(lo, hi, qsum, dot / (math.sqrt(nv) * math.sqrt(nr)))
  }

  override protected def withNewChildInternal(newChild: Expression): QuantizeU8 =
    copy(child = newChild)
  override def prettyName: String = "quantize_u8"
}
