package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** Native Catalyst expression: channel statistics of a raw
  * interleaved-RGB pixel buffer (the body of a binary PPM / P6 file —
  * uncompressed 8-bit triplets, so a REAL pixel decode needs no codec
  * library) — (n_pixels, sum_r, sum_g, sum_b) in one pass.
  *
  * Only COMPLETE triplets count: a trailing 1-2 bytes (a truncated
  * final pixel — the fixture bodies are synthesized from text and are
  * not multiple-of-3 in general) are ignored, and the DuckDB oracle
  * states the same floor(len/3) bound. Same rationale as
  * [[ByteStats]]: the per-byte loop is the one thing built-ins can
  * only express as an interpreted higher-order lambda (~2 expression
  * evals per byte); here it runs as a tight generated loop inside
  * whole-stage codegen, map-only, embarrassingly parallel at 100 TB.
  */
case class PixelStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pixel_stats requires binary, got ${other.catalogString}")
    }

  override def dataType: DataType = PixelStats.schema
  override def prettyName: String = "pixel_stats"

  override protected def nullSafeEval(input: Any): Any =
    PixelStats.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PixelStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): PixelStats =
    copy(child = newChild)
}

object PixelStats {
  val schema: StructType = StructType(Seq(
    StructField("n_pixels", LongType, nullable = false),
    StructField("sum_r", LongType, nullable = false),
    StructField("sum_g", LongType, nullable = false),
    StructField("sum_b", LongType, nullable = false)))

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(bytes: Array[Byte]): InternalRow = {
    val n = bytes.length / 3
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    while (i < n * 3) {
      r += bytes(i) & 0xff
      g += bytes(i + 1) & 0xff
      b += bytes(i + 2) & 0xff
      i += 3
    }
    new GenericInternalRow(Array[Any](n.toLong, r, g, b))
  }

  /** Column-level pixel stats backed by the native expression. */
  def of(body: Column): Column =
    ColumnShim.column(PixelStats(ColumnShim.expression(body)))
}
