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

/** `pq_code_u6(sub, books, c2)` → INT: product-quantization code
  * assignment — the argmin over codebook cells of the integer
  * micro-unit ADC distance `round((‖c‖² − 2·sub·c)·1e6)` (ties to the
  * lower cell id), as ONE native expression instead of a K-branch
  * struct-sort expression tree.
  *
  * Why it exists: the literal-folded `array_sort(array(struct(…)×K))`
  * spelling the K=16 path uses grows its expression tree LINEARLY in
  * K — at K=256 (standard 8-bit PQ codes) that is ~2048 dot/round
  * branches per row, past whole-stage-codegen method limits and into
  * per-branch interpreted dispatch. Here `books`/`c2` are foldable
  * literals materialized ONCE into primitive arrays, and assignment is
  * a tight compiled loop (CodegenFallback: the surrounding projection
  * stays codegen'd and calls eval; the loop itself is JVM-compiled —
  * the dot_f64 story).
  *
  * Exactness: the returned code must be BIT-IDENTICAL to the SQL
  * oracle's `row_number() ORDER BY CAST(round((c2 − 2·dot)·1e6) AS
  * BIGINT), cid` — so near-ties are resolved by the EXACT half-up
  * rounding (BigDecimal.valueOf, the shortest-decimal semantics Spark's
  * `round` and DuckDB's `round` share), applied only to the cells whose
  * raw scaled distance is within 1.0 of the raw minimum (rounding moves
  * a value by ≤ 0.5, so no cell outside that window can win after
  * rounding — the window keeps the exact-decimal work at O(ties), not
  * O(K)).
  */
case class PqCodeU6(sub: Expression, books: Expression, c2: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with CodegenFallback {

  override def first: Expression = sub
  override def second: Expression = books
  override def third: Expression = c2

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (sub.dataType, books.dataType, c2.dataType) match {
      case (ArrayType(DoubleType, _),
            ArrayType(ArrayType(DoubleType, _), _),
            ArrayType(DoubleType, _)) =>
        // the codebook operands bind once against an empty row (lazy
        // val below) — a per-row column there would silently freeze
        // its first evaluation for ALL rows; reject it at analysis
        if (!books.foldable || !c2.foldable)
          TypeCheckResult.TypeCheckFailure(
            "pq_code_u6 expects literal (foldable) codebooks for its " +
              "2nd and 3rd arguments — per-row columns are not supported")
        else TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"pq_code_u6 expects (ARRAY<DOUBLE>, ARRAY<ARRAY<DOUBLE>>, ARRAY<DOUBLE>), got ($a, $b, $c)")
    }

  // books/c2 are foldable codebook literals: materialize to primitive
  // arrays once per expression instance (lazy val is synchronized)
  private lazy val booksArr: Array[Array[Double]] = {
    val a = books.eval(InternalRow.empty).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements()) { c =>
      val cv = a.getArray(c)
      Array.tabulate(cv.numElements())(cv.getDouble)
    }
  }
  private lazy val c2Arr: Array[Double] = {
    val a = c2.eval(InternalRow.empty).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements())(a.getDouble)
  }

  private def u6(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  override protected def nullSafeEval(s: Any, b: Any, c: Any): Any = {
    val x = s.asInstanceOf[ArrayData]
    val n = x.numElements()
    val xs = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      xs(i) = x.getDouble(i)
      i += 1
    }
    val k = booksArr.length
    // pass 1: raw scaled distances + raw minimum
    val scaled = new Array[Double](k)
    var minRaw = Double.MaxValue
    var ci = 0
    while (ci < k) {
      val cv = booksArr(ci)
      var dot = 0.0
      var d = 0
      while (d < n) { dot += xs(d) * cv(d); d += 1 }
      val v = (c2Arr(ci) - 2.0 * dot) * 1000000.0
      scaled(ci) = v
      if (v < minRaw) minRaw = v
      ci += 1
    }
    // pass 2: exact half-up rounding on the tie window only
    var bestU6 = Long.MaxValue
    var bestCid = -1
    ci = 0
    while (ci < k) {
      if (scaled(ci) <= minRaw + 1.0) {
        val u = u6(scaled(ci))
        if (u < bestU6) { bestU6 = u; bestCid = ci }
      }
      ci += 1
    }
    bestCid
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqCodeU6 =
    copy(sub = newFirst, books = newSecond, c2 = newThird)
  override def prettyName: String = "pq_code_u6"
}
