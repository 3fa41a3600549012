package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Exact distinct count over a dense bounded id domain, accumulated as
  * a bitmap — the aggregate-function tier of the engine's Catalyst
  * extension ladder (expressions → optimizer rule → planner strategy →
  * source → '''aggregate''') and the bitmap-index pattern of the
  * native OLAP engines (ClickHouse `groupBitmap`, Doris `BITMAP_UNION`).
  *
  * Why it exists when `count_distinct` is built in: Spark plans an
  * exact grouped distinct as a two-phase aggregation whose FIRST phase
  * keys on `(group, value)` — every distinct pair rides the exchange,
  * so a group with 10M distinct ids shuffles 10M rows. This aggregate
  * is a [[TypedImperativeAggregate]] with a `java.util.BitSet` buffer:
  * partials OR-merge map-side and ONE buffer of at most `maxDomain/8`
  * bytes per group crosses the exchange regardless of row count — at
  * 100 TB the shuffle cost depends on the id-domain width, not the
  * data. The dense-id premise matches the engine's own data model
  * (custkey/orderkey/node ids are generator-dense; see
  * `TESTDATA.md`): a domain of 2^26 costs ≤8 MiB per group worst-case
  * and `BitSet` only materializes up to the highest id actually seen.
  * For sparse or unbounded domains this is the wrong tool — use
  * `q09_count_distinct` (exact, pair shuffle) or `q30_approx_distinct`
  * (HLL sketch, constant 'memory' with error); a production port would
  * swap `BitSet` for a roaring bitmap, which changes only
  * `serialize`/`deserialize`/`merge` here.
  *
  * Ids outside `[0, maxDomain)` raise rather than drop — the engine's
  * no-silent-caps rule (SCALE.md): a bitmap that quietly ignored
  * out-of-range ids would return plausible wrong counts forever.
  *
  * Semantics: `COUNT(DISTINCT child)` — nulls ignored, 0 for a group
  * of all-null inputs. Oracle-exact by construction (no sketch), which
  * is what lets `q40_bitmap_distinct` hash-match DuckDB.
  */
case class BitmapDistinct(
    child: Expression,
    maxDomain: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.BitSet] with UnaryLike[Expression] {

  require(maxDomain > 0, "graft_bitmap_distinct: maxDomain must be positive")

  override def createAggregationBuffer(): java.util.BitSet = new java.util.BitSet()

  override def update(buffer: java.util.BitSet, input: InternalRow): java.util.BitSet = {
    val v = child.eval(input)
    if (v != null) {
      val id = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      if (id < 0L || id >= maxDomain.toLong)
        throw new IllegalArgumentException(
          s"graft_bitmap_distinct: id $id outside [0, $maxDomain) — " +
            "raise maxDomain or use count_distinct/approx_count_distinct " +
            "for sparse/unbounded domains")
      buffer.set(id.toInt)
    }
    buffer
  }

  override def merge(buffer: java.util.BitSet, other: java.util.BitSet): java.util.BitSet = {
    buffer.or(other)
    buffer
  }

  override def eval(buffer: java.util.BitSet): Any = buffer.cardinality().toLong

  // BitSet's own little-endian long encoding, trailing zero words
  // dropped — an all-null group serializes to 0 bytes.
  override def serialize(buffer: java.util.BitSet): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): java.util.BitSet =
    java.util.BitSet.valueOf(bytes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bitmap_distinct needs an integral id column, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bitmap_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapDistinct =
    copy(child = newChild)
}

object BitmapDistinct {
  /** Default id-domain ceiling: 2^26 (≤8 MiB buffer worst-case). */
  val DefaultMaxDomain: Int = 1 << 26

  /** Column-API form: `df.groupBy(...).agg(BitmapDistinct.of(col("id")))`. */
  def of(c: Column, maxDomain: Int = DefaultMaxDomain): Column =
    ColumnBridge.column(
      BitmapDistinct(ColumnBridge.expression(c), maxDomain).toAggregateExpression())
}
