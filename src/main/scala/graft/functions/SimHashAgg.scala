package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash as ONE custom aggregate: buffer = 60 signed bit-votes,
  * update adds ±1 per bit of the (already 60-bit) input hash, merge is
  * element-wise addition, eval assembles the majority-vote bits.
  *
  * Replaces the 60-column `sum(CASE WHEN (h >> b) & 1 ...)` aggregate:
  * one buffer object and one tight loop per row instead of 60 generated
  * update expressions — and a demonstration of the
  * TypedImperativeAggregate extension point (partial aggregation +
  * binary buffer serialization across the shuffle both work, which the
  * test suite exercises through the LSH pipeline). */
final case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]]
    with org.apache.spark.sql.graftbridge.DeclaredInputTypes {

  // update() casts the evaluated child straight to Long — same
  // mid-task ClassCastException hazard (an INT or DECIMAL hash column
  // analyzes fine) the contract on TopKAgg exists for; the analyzer
  // now coerces INT→BIGINT / rejects non-numeric at analysis time
  override def declaredInputTypes: Seq[DataType] = Seq(LongType)

  private val bits = 60

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < bits) {
        buf(b) += (((h >>> b) & 1L).toInt << 1) - 1
        b += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var i = 0
    while (i < bits) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = {
    var out = 0L
    var b = 0
    while (b < bits) {
      if (buf(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bits * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bits)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object SimHashAgg {
  /** Aggregate column: 60-bit simhash of a group of 60-bit hashes. */
  def simhashAgg(h: Column): Column =
    Bridge.column(SimHashAgg(Bridge.expression(h))
      .toAggregateExpression(isDistinct = false))
}
