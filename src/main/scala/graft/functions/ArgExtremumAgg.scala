package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.DataType

/** Typed argmax/argmin: the payload of the row whose `ord` value is the
  * group's extremum, as a single-slot TypedImperativeAggregate.
  *
  * Spark's own `max_by`/`min_by`/`min(struct(...))` are
  * DeclarativeAggregates whose buffer holds the struct itself; a struct
  * buffer is not UnsafeRow-mutable, so HashAggregateExec rejects the
  * plan and every such aggregate runs as SORT-based aggregation — each
  * task sorts its whole input by the grouping key just to keep one row
  * per group (the r18 serve-family constant; VERDICT r18 #6). This
  * buffer form plans as ObjectHashAggregate, which with the session's
  * raised fallback threshold stays HASH-based at any group count: one
  * O(1) compare-and-swap per row, nothing sorted.
  *
  * Value semantics are exactly `max_by(payload, ord)` / `min_by(...)`
  * under Spark's ordering for `ord`'s type (struct = field-
  * lexicographic, double = NaN-greatest total order — both via
  * catalyst's interpreted ordering, the same one the declarative
  * forms compare with). Ties keep the first-seen row, which is only
  * deterministic when `ord` is unique per group — every internal call
  * site guarantees that (and the declarative forms are equally
  * arrival-order-dependent on ties, so results cannot diverge where
  * they were well-defined). Null `ord` rows are ignored, like
  * max_by's; a group with no non-null `ord` yields NULL. */
final case class ArgExtremumAgg(
    payload: Expression,
    ord: Expression,
    findMax: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArgExtremumAgg.Buffer] {

  override def children: Seq[Expression] = Seq(payload, ord)
  override def nullable: Boolean = true
  override def dataType: DataType = payload.dataType
  override def prettyName: String =
    if (findMax) "argmax_agg" else "argmin_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(ord.dataType, prettyName)

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(ord.dataType)

  /** true when `a` beats `b` under the configured extremum. Strict, so
    * ties keep the incumbent (first seen). */
  private def better(a: Any, b: Any): Boolean = {
    val c = ordering.compare(a, b)
    if (findMax) c > 0 else c < 0
  }

  override def createAggregationBuffer(): ArgExtremumAgg.Buffer =
    new ArgExtremumAgg.Buffer

  override def update(buf: ArgExtremumAgg.Buffer,
      input: InternalRow): ArgExtremumAgg.Buffer = {
    val o = ord.eval(input)
    if (o != null && (buf.ord == null || better(o, buf.ord))) {
      // copy: eval results may view a reused row/batch buffer
      buf.ord = InternalRow.copyValue(o)
      val p = payload.eval(input)
      buf.payload = if (p == null) null else InternalRow.copyValue(p)
    }
    buf
  }

  override def merge(b1: ArgExtremumAgg.Buffer,
      b2: ArgExtremumAgg.Buffer): ArgExtremumAgg.Buffer = {
    if (b2.ord != null && (b1.ord == null || better(b2.ord, b1.ord))) {
      b1.ord = b2.ord
      b1.payload = b2.payload
    }
    b1
  }

  override def eval(buf: ArgExtremumAgg.Buffer): Any =
    if (buf.ord == null) null else buf.payload

  // (ord, payload) through one UnsafeProjection — a stable byte form
  // for any pair of types, including structs and arrays
  @transient private lazy val serProj =
    UnsafeProjection.create(Array(ord.dataType, payload.dataType))

  override def serialize(buf: ArgExtremumAgg.Buffer): Array[Byte] =
    serProj(InternalRow(buf.ord, buf.payload)).getBytes

  override def deserialize(bytes: Array[Byte]): ArgExtremumAgg.Buffer = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    val buf = new ArgExtremumAgg.Buffer
    if (!row.isNullAt(0)) {
      buf.ord = InternalRow.copyValue(row.get(0, ord.dataType))
      buf.payload =
        if (row.isNullAt(1)) null
        else InternalRow.copyValue(row.get(1, payload.dataType))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArgExtremumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArgExtremumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(payload = newChildren(0), ord = newChildren(1))
}

object ArgExtremumAgg {

  /** One-slot buffer: the best ord seen and its payload, already
    * copied out of any reused input row. */
  final class Buffer {
    var ord: Any = null
    var payload: Any = null
  }

  /** `max_by(payload, ord)` as a hash-friendly typed aggregate. */
  def maxByAgg(payload: Column, ord: Column): Column =
    Bridge.column(ArgExtremumAgg(
      Bridge.expression(payload), Bridge.expression(ord), findMax = true)
      .toAggregateExpression(isDistinct = false))

  /** `min_by(payload, ord)` as a hash-friendly typed aggregate. */
  def minByAgg(payload: Column, ord: Column): Column =
    Bridge.column(ArgExtremumAgg(
      Bridge.expression(payload), Bridge.expression(ord), findMax = false)
      .toAggregateExpression(isDistinct = false))
}
