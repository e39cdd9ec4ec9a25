package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** The executing task's ATTEMPT id (globally unique per attempt,
  * constant within one; -1 on the driver, where no task is running).
  *
  * Exists for [[graft.sql.SqlSink]]'s exactly-once append: rows staged
  * by the JDBC writer are tagged per attempt so a re-run of an
  * already-committed partition (speculation, post-commit task death)
  * shows up as a second complete tag group the finalize statement can
  * collapse — the partition-id column alone cannot distinguish two
  * committed copies. Same structure as Spark's own `SparkPartitionID`
  * expression (a Nondeterministic leaf initialized once per partition,
  * codegen'd to a mutable-state read), which exposes the task's
  * partition but not its attempt.
  */
final case class TaskAttemptId()
    extends LeafExpression with Nondeterministic {

  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "task_attempt_id"

  @transient private[this] var attemptId: Long = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    attemptId = Option(org.apache.spark.TaskContext.get())
      .map(_.taskAttemptId()).getOrElse(-1L)

  override protected def evalInternal(input: InternalRow): Any = attemptId

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val idTerm = ctx.addMutableState(CodeGenerator.JAVA_LONG, "taskAttemptId")
    ctx.addPartitionInitializationStatement(
      s"$idTerm = org.apache.spark.TaskContext.get() == null ? -1L : " +
        "org.apache.spark.TaskContext.get().taskAttemptId();")
    ev.copy(code = code"final long ${ev.value} = $idTerm;",
      isNull = FalseLiteral)
  }
}
