package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a string column against a pre-built Bloom
  * filter, inside whole-stage codegen.
  *
  * The scale story (q60): a decontamination screen joins every corpus
  * shingle against the benchmark-probe shingle set. The probe SET can
  * outgrow broadcastability long before its Bloom sketch does (a
  * 10M-shingle set is GBs of strings; its 1%-fpp Bloom is ~12 MB), at
  * which point the exact join must shuffle the FULL exploded corpus.
  * Prefiltering each corpus shingle through this expression drops the
  * overwhelming non-colliding majority before the shuffle; Bloom
  * false POSITIVES are then removed by the exact join that follows,
  * so the composed result is exactly the unfiltered answer. False
  * negatives cannot occur — membership of every inserted item is
  * guaranteed by the sketch.
  *
  * The filter bytes ride the serialized expression to executors
  * (`readFrom` is lazy, once per executor); codegen references the
  * deserialized filter object directly, so the hot loop is one
  * `mightContainBinary` call on the UTF8String's bytes — the same
  * byte form `DataFrameStatFunctions.bloomFilter` inserts for string
  * columns, which the exact-equality spec and the shared q53 oracle
  * both pin.
  */
final case class BloomMightContain(child: Expression,
    bloomBytes: Array[Byte])
    extends UnaryExpression {

  // STRICT string check, deliberately NOT the implicit-cast contract
  // the other expressions here use: a numeric probe column would be
  // silently coerced to its decimal-string bytes, while a filter built
  // from that column inserted LONG bytes (putLong) — every probe would
  // miss, and the "false negatives cannot occur" guarantee above would
  // fail invisibly (rows dropped before the exact join). Rejecting at
  // analysis forces the caller to probe the same representation the
  // filter was built from.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires a STRING probe column (the filter " +
          s"bytes were built from string insertions); got " +
          s"${child.dataType.catalogString} — probing a cast's bytes " +
          "would yield false negatives")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
