package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregate over (score: double, id: long) pairs,
  * ordered by (score DESC, id ASC) — map-side partial top-k.
  *
  * The window formulation (`row_number() OVER (PARTITION BY g ORDER BY
  * s DESC)` then `<= k`) must SHUFFLE AND SORT every row of every
  * group before discarding all but k. This aggregate keeps a k-element
  * buffer per group on the map side, so the shuffle carries at most
  * k·|groups| rows and nothing is ever globally sorted — the
  * difference between "top 3 orders per customer" costing a full-table
  * sort and costing a pass. Buffers merge associatively, so partial
  * aggregation and AQE work as for any sum.
  *
  * Determinism: the (score DESC, id ASC) order is total whenever ids
  * are distinct, so results are identical at any parallelism and match
  * a window-based SQL oracle exactly. */
final case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKAgg.Buffer]
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {

  require(k >= 1, "k must be >= 1")

  // update() reads the evaluated children as raw Double/Long; without a
  // declared input contract a DECIMAL score or INT id analyzes fine and
  // then throws ClassCastException mid-task. The (bridged) implicit-cast
  // contract makes the analyzer insert the numeric casts
  // (DECIMAL→DOUBLE, INT→BIGINT) and reject non-numeric inputs at
  // ANALYSIS time.
  override def declaredInputTypes: Seq[DataType] = Seq(DoubleType, LongType)

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_agg"

  override def createAggregationBuffer(): TopKAgg.Buffer =
    new TopKAgg.Buffer(k)

  override def update(buf: TopKAgg.Buffer, input: InternalRow): TopKAgg.Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(b1: TopKAgg.Buffer, b2: TopKAgg.Buffer): TopKAgg.Buffer = {
    var i = 0
    while (i < b2.size) { b1.offer(b2.scores(i), b2.ids(i)); i += 1 }
    b1
  }

  override def eval(buf: TopKAgg.Buffer): Any = {
    val rows = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      rows(i) = InternalRow(buf.scores(i), buf.ids(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKAgg.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKAgg.Buffer(k)
    var i = 0
    while (i < n) { buf.offer(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {

  /** Sorted bounded buffer: elements held in (score DESC, id ASC)
    * order; k is small, so linear insertion beats heap constants. */
  final class Buffer(k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var size = 0

    /** Descending score compare under Spark's DoubleType total order
      * (NaN greater than every double and equal to itself, -0.0 ==
      * 0.0). A bare primitive `>`/`==` is NOT total under NaN — every
      * comparison with it is false, so a NaN entering a not-yet-full
      * buffer both lands out of order and stops later candidates'
      * insertion walks early, making results arrival-order dependent.
      * Internal call sites filter NaN scores, but the SQL-registered
      * topk_agg cannot assume that; with this order a NaN score ranks
      * first, exactly as the `ORDER BY s DESC` window oracle ranks it. */
    @inline private def cmpS(a: Double, b: Double): Int =
      if (a < b) -1
      else if (a > b) 1
      else if (a == b) 0 // includes -0.0 vs 0.0: equal, as in Spark
      else {             // at least one NaN
        val an = java.lang.Double.isNaN(a)
        val bn = java.lang.Double.isNaN(b)
        if (an && bn) 0 else if (an) 1 else -1
      }

    /** true if (s1, i1) ranks strictly before (s2, i2). */
    @inline private def before(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
      val c = cmpS(s1, s2)
      c > 0 || (c == 0 && i1 < i2)
    }

    def offer(s: Double, i: Long): Unit = {
      if (size == k && !before(s, i, scores(size - 1), ids(size - 1))) return
      // find insertion point (first slot the candidate ranks before)
      var p = if (size == k) size - 1 else size
      while (p > 0 && before(s, i, scores(p - 1), ids(p - 1))) p -= 1
      // shift down and place
      var q = math.min(size, k - 1)
      while (q > p) { scores(q) = scores(q - 1); ids(q) = ids(q - 1); q -= 1 }
      scores(p) = s; ids(p) = i
      if (size < k) size += 1
    }
  }

  /** Aggregate column: top-k (score, id) structs per group. */
  def topkAgg(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKAgg(
      Bridge.expression(score), Bridge.expression(id), k)
      .toAggregateExpression(isDistinct = false))
}
