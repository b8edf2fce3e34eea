package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** Native Catalyst expression: per-channel statistics of a raw
  * interleaved 8-bit PCM buffer (the body of a NIST SPHERE file after
  * its ASCII header — uncompressed unsigned samples, so a REAL audio
  * decode needs no codec library) — (n_frames, sum_c0, sum_c1) in one
  * pass. The audio twin of [[PixelStats]], with the channel STRIDE as
  * a second child instead of pixels' fixed 3: mono and stereo bodies
  * share one expression.
  *
  * Only COMPLETE frames count (floor(len/ch) — a truncated final
  * frame is ignored, and the DuckDB oracle states the same bound);
  * sum_c1 is 0 for mono, and the caller derives the null mean from
  * the channel count. A non-positive channel count degrades to zero
  * frames — the honest "header inconsistent" result, never a throw
  * out of the scan (the I-14 error-isolation rule). Same rationale as
  * [[ByteStats]]: the per-byte loop is the one thing built-ins can
  * only express as an interpreted higher-order lambda; here it runs
  * as a tight generated loop inside whole-stage codegen, map-only,
  * embarrassingly parallel at 100 TB.
  */
case class PcmStats(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pcm_stats requires (binary, int), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = PcmStats.schema
  override def prettyName: String = "pcm_stats"

  override protected def nullSafeEval(body: Any, channels: Any): Any =
    PcmStats.compute(body.asInstanceOf[Array[Byte]], channels.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, ch) =>
      s"${ev.value} = graft.functions.PcmStats.compute($b, $ch);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PcmStats =
    copy(left = newLeft, right = newRight)
}

object PcmStats {
  val schema: StructType = StructType(Seq(
    StructField("n_frames", LongType, nullable = false),
    StructField("sum_c0", LongType, nullable = false),
    StructField("sum_c1", LongType, nullable = false)))

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(bytes: Array[Byte], channels: Int): InternalRow = {
    if (channels <= 0)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val n = bytes.length / channels
    var s0 = 0L
    var s1 = 0L
    var f = 0
    while (f < n) {
      s0 += bytes(f * channels) & 0xff
      if (channels >= 2) s1 += bytes(f * channels + 1) & 0xff
      f += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, s0, s1))
  }

  /** Column-level PCM stats backed by the native expression. */
  def of(body: Column, channels: Column): Column =
    ColumnShim.column(PcmStats(
      ColumnShim.expression(body), ColumnShim.expression(channels)))
}
