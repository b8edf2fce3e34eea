package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** Native Catalyst expression: per-channel statistics of a raw
  * interleaved PCM buffer (the body of a NIST SPHERE file after its
  * ASCII header — uncompressed samples, so a REAL audio decode needs
  * no codec library) — (n_frames, sum_c0, sum_c1) in one pass. The
  * audio twin of [[PixelStats]], with the channel STRIDE and the
  * SAMPLE FORMAT as children instead of pixels' fixed 3×u8: mono and
  * stereo, 8-bit and 16-bit bodies all share one expression.
  *
  * `fmt` selects the sample width and byte order the SPHERE header
  * declares (`sample_n_bytes` / `sample_byte_format`):
  * 1 = unsigned 8-bit, 2 = signed 16-bit little-endian ("01"),
  * 3 = signed 16-bit big-endian ("10") — TIMIT-era corpora are
  * "10"/2-byte, modern resamples "01". Any other code degrades to
  * zero frames: an undeclared byte order must never be guessed (a
  * wrong guess reads every sample byte-swapped — plausible numbers,
  * silently wrong), and a non-positive channel count degrades the
  * same way — the honest "header inconsistent" result, never a throw
  * out of the scan (the I-14 error-isolation rule).
  *
  * Only COMPLETE frames count (floor(len/(ch·width)) — a truncated
  * final frame is ignored, and the DuckDB oracle states the same
  * bound); sum_c1 is 0 for mono, and the caller derives the null mean
  * from the channel count. 16-bit sums are SIGNED (two's complement,
  * like every real PCM corpus) — the callers' ×100 integer means stay
  * differential because Spark's `div` and DuckDB's `//` both truncate
  * toward zero. Same rationale as [[ByteStats]]: the per-byte loop is
  * the one thing built-ins can only express as an interpreted
  * higher-order lambda; here it runs as a tight generated loop inside
  * whole-stage codegen, map-only, embarrassingly parallel at 100 TB.
  */
case class PcmStats(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"pcm_stats requires (binary, int, int), got " +
          s"(${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  override def dataType: DataType = PcmStats.schema
  override def prettyName: String = "pcm_stats"

  override protected def nullSafeEval(body: Any, channels: Any, fmt: Any): Any =
    PcmStats.compute(body.asInstanceOf[Array[Byte]],
      channels.asInstanceOf[Int], fmt.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, ch, fmt) =>
      s"${ev.value} = graft.functions.PcmStats.compute($b, $ch, $fmt);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PcmStats =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PcmStats {
  val schema: StructType = StructType(Seq(
    StructField("n_frames", LongType, nullable = false),
    StructField("sum_c0", LongType, nullable = false),
    StructField("sum_c1", LongType, nullable = false)))

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(bytes: Array[Byte], channels: Int, fmt: Int): InternalRow = {
    val width = fmt match {
      case 1     => 1
      case 2 | 3 => 2
      case _     => 0
    }
    if (channels <= 0 || width == 0)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val stride = channels * width
    val n = bytes.length / stride
    var s0 = 0L
    var s1 = 0L
    var f = 0
    if (fmt == 1) {
      while (f < n) {
        val off = f * stride
        s0 += bytes(off) & 0xff
        if (channels >= 2) s1 += bytes(off + 1) & 0xff
        f += 1
      }
    } else {
      // signed 16-bit: assemble the two bytes in declared order, then
      // one short cast gives two's-complement sign extension
      val lo = if (fmt == 2) 0 else 1 // little-endian: low byte first
      val hi = 1 - lo
      while (f < n) {
        val off = f * stride
        s0 += (((bytes(off + hi) & 0xff) << 8) | (bytes(off + lo) & 0xff)).toShort
        if (channels >= 2) {
          val o1 = off + width
          s1 += (((bytes(o1 + hi) & 0xff) << 8) | (bytes(o1 + lo) & 0xff)).toShort
        }
        f += 1
      }
    }
    new GenericInternalRow(Array[Any](n.toLong, s0, s1))
  }

  /** Column-level PCM stats backed by the native expression. */
  def of(body: Column, channels: Column, fmt: Column): Column =
    ColumnShim.column(PcmStats(
      ColumnShim.expression(body), ColumnShim.expression(channels),
      ColumnShim.expression(fmt)))
}
