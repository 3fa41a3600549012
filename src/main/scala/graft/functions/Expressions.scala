package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom codegen-friendly Catalyst expressions for the engine's hot
  * scalar loops (SURVEY.md §7.1.3 reserved this budget for exactly
  * this case: profiling showed the higher-order-function forms —
  * `aggregate(transform(...))` — dominate the dedup/similarity
  * families, because they materialize a boxed intermediate array per
  * row per call).
  *
  * Both expressions participate in whole-stage codegen via
  * `defineCodeGen` (a single static-method call per row, no
  * interpreted fallback on the hot path) and keep '''bit-identical'''
  * results to their DuckDB-oracle formulations: the fold order is the
  * same left-to-right IEEE/int64 sequence.
  */
object GraftExpressions {

  /** Polynomial rolling hash of a string's code points:
    * `acc = (acc * 31 + codepoint) % (2^31 - 1)`, left to right —
    * the codegen'd twin of the `aggregate(transform(split(c, '')))`
    * form and of DuckDB's `list_reduce(list_transform(string_split(...)))`.
    */
  def polyHash(c: Column): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c)))

  /** Σ a[i]·b[i] over two numeric arrays (float or double elements),
    * each product computed in double, accumulated left to right —
    * the codegen'd twin of the `aggregate(transform(sequence(...)))`
    * index fold and of DuckDB's `list_reduce(list_transform(range(...)))`.
    */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** `Math.floorDiv(a, b)` over longs — floored (toward −∞) integer
    * division, exact at any magnitude. Spark's `floor(a / b)` detours
    * through doubles (inexact past 2^53) and `div` truncates toward
    * zero; DuckDB's `//` floors, so this is the cross-engine-stable
    * form. Used by [[graft.plans.RangeJoinBinning]] to derive bin ids.
    */
  def floorDiv(a: Column, b: Column): Column =
    ColumnBridge.column(FloorDiv(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Morton/z-order interleave of two 31-bit keys ([[ZOrder]]):
    * `a`'s bits land at even positions, `b`'s at odd. Sorting or
    * range-partitioning by the result clusters rows that are close in
    * BOTH dimensions — the Delta/Iceberg `ZORDER BY` primitive that
    * makes parquet min/max row-group pruning effective for
    * multi-dimensional predicates.
    */
  def zorder(a: Column, b: Column): Column =
    ColumnBridge.column(ZOrder(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** SQ8 affine per-dimension quantization of a vector
    * ([[graft.queries.SimilarityQueries.s09_knn_sq8]]):
    * `out[i] = clamp(floor((v[i] − lo[i]) · 255 / rng[i]), 0, 255)`
    * (0 where `rng[i] = 0`), returned as array<double> so the
    * codegen'd [[dot]] scores the codes directly. One expression with
    * a RUNTIME loop over the dimensions — the unrolled per-dim
    * `array(least(greatest(floor(...))))` form generated ~13k lines
    * of Java for dim=64 and blew janino's 64 KB method limit, so the
    * whole encode stage silently fell back to interpreted projection
    * (observed r17); this is the expression-split rule the PolyHash/
    * DotProduct scaladoc states, applied to the third hot loop.
    * Bit-identical to the unrolled form for non-NaN inputs: the same
    * ((x − lo) · 255) / rng double sequence, floor, then the 0/255
    * clamp.
    */
  def sq8(v: Column, lo: Array[Double], rng: Array[Double]): Column =
    ColumnBridge.column(Sq8Encode(ColumnBridge.expression(v), lo, rng))

  /** URI-percent-decode of a path fragment — what reconciles
    * `input_file_name()` (which renders the file's URI, so a
    * hive-escaped directory like `c=a b` appears as `c=a%20b`) with
    * the raw `FileStatus` names a [[graft.sources.ZoneMapFileIndex]]
    * builds its keys from. `java.net.URI`'s path decoding, NOT
    * `URLDecoder` (form decoding would corrupt a literal `+` into a
    * space). An unparseable fragment passes through unchanged.
    */
  def uriDecode(c: Column): Column =
    ColumnBridge.column(UriDecode(ColumnBridge.expression(c)))

  /** Bloom filter of a key column as a 1-row aggregate — the BUILD
    * half of explicit runtime row filtering (the row-level sibling of
    * q48's partition-level DPP). Keys go through `xxhash64` first,
    * the same convention Spark's own `InjectRuntimeFilter` uses, so
    * [[bloomMightContain]] probes with the identical hash. The result
    * is one binary blob sized by `expectedItems` (~1.2 bytes/item at
    * the default FPP) — broadcastable at any corpus size because it
    * scales with the DIM's keys, not the fact table.
    *
    * `expectedItems` is NOT an unbounded dial: Spark's
    * `BloomFilterAggregate` rejects values above
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` (default
    * 4M) at analysis time, so sizing to a dim bigger than that
    * requires raising the conf IN TANDEM — this builder therefore
    * validates eagerly and says so, instead of surfacing Spark's
    * analysis error at first use. Past ~100M keys prefer a semi-join
    * pre-aggregation anyway: the filter's ~1.2 bytes/item broadcast
    * stops being the cheap side.
    */
  def bloomAgg(key: Column, expectedItems: Long): Column = {
    val session = org.apache.spark.sql.SparkSession.active
    val maxItems = session.conf
      .get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000")
      .toLong
    require(expectedItems > 0 && expectedItems <= maxItems,
      s"bloomAgg expectedItems=$expectedItems must be in (0, $maxItems]; " +
        "raise spark.sql.optimizer.runtime.bloomFilter.maxNumItems together " +
        "with the estimate when the dim's key count exceeds it")
    ColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(
          ColumnBridge.expression(xxhash64(key)), expectedItems)
        .toAggregateExpression())
  }

  /** Probe of [[bloomAgg]]'s filter: true if `key` MIGHT be in the
    * built set (false positives at the filter's FPP, never false
    * negatives) — so a `filter(bloomMightContain(...))` before a
    * shuffle join is a superset-pass: the join's output is unchanged,
    * but the fact side's exchange carries ~selectivity·rows instead
    * of everything.
    */
  def bloomMightContain(bloom: Column, key: Column): Column =
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        ColumnBridge.expression(bloom),
        ColumnBridge.expression(xxhash64(key))))
}

case class PolyHash(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash needs a string input, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  private val P = 2147483647L

  /** Iterates unicode code points — same element sequence as splitting
    * into single-character strings and taking `ascii()` of each.
    */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_dot needs array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private lazy val leftIsFloat = elemType(left).contains(FloatType)
  private lazy val rightIsFloat = elemType(right).contains(FloatType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotProduct.dot($a, $b, $leftIsFloat, $rightIsFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Left-to-right fold; each term is double(a[i]) * double(b[i]).
    * Array elements are assumed non-null (enforced by the engine's
    * vector columns); lengths follow the left operand.
    */
  def dot(a: ArrayData, b: ArrayData, af: Boolean, bf: Boolean): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}

/** See [[GraftExpressions.uriDecode]]. One static call per row under
  * whole-stage codegen, like every expression here.
  */
case class UriDecode(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_uridecode needs a string input, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_uridecode"

  override protected def nullSafeEval(input: Any): Any =
    UriDecode.decode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UriDecode.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): UriDecode =
    copy(child = newChild)
}

object UriDecode {
  /** URI path decoding (`%20` → space, `%25` → `%`), literal `+`
    * preserved; a fragment `java.net.URI` rejects passes through
    * unchanged (fail-open — an undecodable key can at worst miss a
    * sidecar match, never corrupt one).
    */
  def decode(s: UTF8String): UTF8String = {
    val raw = s.toString
    val out = try {
      val p = new java.net.URI(raw).getPath
      if (p == null) raw else p
    } catch { case _: java.net.URISyntaxException => raw }
    UTF8String.fromString(out)
  }
}

/** See [[GraftExpressions.sq8]]. `lo`/`rng` ride along as reference
  * objects (driver-collected per-dim stats, 2·dim doubles — the
  * planeWeights literal pattern), so the generated code is one static
  * call per row regardless of dimensionality.
  */
case class Sq8Encode(child: Expression, lo: Seq[Double], rng: Seq[Double])
    extends UnaryExpression {

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      if (lo.length == rng.length) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_sq8 lo/rng lengths differ: ${lo.length} vs ${rng.length}")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_sq8 needs array<float|double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_sq8"

  private lazy val loArr = lo.toArray
  private lazy val rngArr = rng.toArray

  override protected def nullSafeEval(input: Any): Any =
    Sq8Encode.encode(input.asInstanceOf[ArrayData], loArr, rngArr,
      elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val loRef = ctx.addReferenceObj("sq8lo", loArr, "double[]")
    val rngRef = ctx.addReferenceObj("sq8rng", rngArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Sq8Encode.encode($c, $loRef, $rngRef, $elemIsFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): Sq8Encode =
    copy(child = newChild)
}

object Sq8Encode {
  /** Per dim: t = ((x − lo)·255)/rng, floored, clamped to [0,255];
    * 0 where rng = 0 — the exact double sequence of the unrolled
    * least/greatest/floor form (non-NaN inputs). A NULL element
    * (containsNull=true inputs) encodes as the defined sentinel 0.0
    * rather than reading the null slot's garbage bytes (r17 advice) —
    * the engine's vector columns never carry null elements, so this
    * is a guard rail, not a hot branch.
    */
  def encode(v: ArrayData, lo: Array[Double], rng: Array[Double],
             isFloat: Boolean): ArrayData = {
    val n = math.min(v.numElements(), lo.length)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (rng(i) == 0.0 || v.isNullAt(i)) out(i) = 0.0
      else {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        var t = Math.floor((x - lo(i)) * 255.0 / rng(i))
        if (t < 0.0) t = 0.0
        if (t > 255.0) t = 255.0
        out(i) = t
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Floored long division (`Math.floorDiv`): rounds toward −∞, so
  * consecutive width-`w` bins tile the full long line with no
  * double-width bin straddling zero (the defect of truncating `div`).
  * Divisor 0 raises, as in `//` on the oracle side; the binning rule
  * only ever constructs positive literal divisors.
  */
case class FloorDiv(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_floordiv needs (bigint, bigint), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_floordiv"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Math.floorDiv(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Math.floorDiv($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloorDiv =
    copy(left = newLeft, right = newRight)
}

/** Morton (z-order) bit interleave of two non-negative 31-bit longs:
  * output bit 2i = a's bit i, bit 2i+1 = b's bit i — a 62-bit
  * space-filling-curve key whose sort order clusters 2-D-close rows.
  *
  * Inputs outside [0, 2³¹) RAISE rather than silently truncate (the
  * BitmapDistinct no-silent-drops stance); callers range-reduce first
  * (q42 mods its dims down). 31 bits per dim keeps every intermediate
  * of the magic-mask spread below 2⁶³, so the DuckDB oracle replicates
  * the exact shift/mask chain without tripping its signed-overflow
  * checks — the evaluation is the standard 5-step parallel bit spread,
  * one static call per row under whole-stage codegen.
  */
case class ZOrder(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zorder needs (bigint, bigint), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrder.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder =
    copy(left = newLeft, right = newRight)
}

object ZOrder {
  val MaxKey: Long = (1L << 31) - 1

  /** Spread the low 31 bits of `v` to even bit positions 0,2,…,60. */
  def spread(v: Long): Long = {
    var x = v
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(a: Long, b: Long): Long = {
    if (a < 0 || a > MaxKey || b < 0 || b > MaxKey)
      throw new IllegalArgumentException(
        s"graft_zorder key out of [0, 2^31): ($a, $b) — range-reduce first")
    spread(a) | (spread(b) << 1)
  }
}
