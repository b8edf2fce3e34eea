package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** Native Catalyst expression: codec-free byte statistics of a binary
  * payload — (payload_len, n_distinct_bytes, byte_sum) in ONE pass
  * over the raw bytes.
  *
  * The declarative form (hex → transform → aggregate with a conv per
  * element) runs the higher-order-function lambdas interpreted: ~2
  * expression evaluations per BYTE per row, measured 6.7 s at sf0.1
  * for what is one linear scan. This expression does the same
  * arithmetic in a tight loop inside whole-stage codegen — the
  * preference-order case for a custom Expression: built-ins can
  * express the semantics but not the per-byte loop.
  */
case class ByteStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"byte_stats requires binary, got ${other.catalogString}")
    }

  override def dataType: DataType = ByteStats.schema
  override def prettyName: String = "byte_stats"

  override protected def nullSafeEval(input: Any): Any =
    ByteStats.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ByteStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): ByteStats =
    copy(child = newChild)
}

object ByteStats {
  val schema: StructType = StructType(Seq(
    StructField("payload_len", LongType, nullable = false),
    StructField("n_distinct_bytes", IntegerType, nullable = false),
    StructField("byte_sum", LongType, nullable = false)))

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(bytes: Array[Byte]): InternalRow = {
    val seen = new Array[Boolean](256)
    var sum = 0L
    var distinct = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sum += b
      if (!seen(b)) { seen(b) = true; distinct += 1 }
      i += 1
    }
    new GenericInternalRow(Array[Any](bytes.length.toLong, distinct, sum))
  }

  /** Column-level byte stats backed by the native expression. */
  def of(payload: Column): Column =
    ColumnShim.column(ByteStats(ColumnShim.expression(payload)))
}
