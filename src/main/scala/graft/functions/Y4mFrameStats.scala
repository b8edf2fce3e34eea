package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** Native Catalyst expression: per-frame plane statistics of a raw
  * YUV4MPEG2 body (everything after the stream's ASCII parameter
  * line) — one `(sum_y, sum_u, sum_v)` struct per COMPLETE frame, in
  * one pass. The video member of the [[PixelStats]]/[[PcmStats]]
  * family: Y4M frames are uncompressed 4:2:0 planes behind a 6-byte
  * `FRAME\n` marker, so REAL per-frame sample decode needs no codec
  * library — exactly like P6 pixels and SPHERE PCM.
  *
  * Body layout per frame (C420, the Y4M default): `FRAME\n`, then
  * w·h luma bytes, then (w/2)·(h/2) bytes each of U and V. Only
  * complete, correctly-MARKED frames count: a truncated final frame
  * is ignored (the PCM floor-division rule), and a frame whose marker
  * bytes don't match stops the walk — bytes past a framing error are
  * garbage, and decoding them as plausible planes would be a silently
  * wrong answer (the same never-guess rule as PcmStats' byte order).
  * Odd or non-positive dims degrade to zero frames (4:2:0 requires
  * even dims; the honest header-inconsistent result). One tight
  * generated loop inside whole-stage codegen; map-only,
  * embarrassingly parallel at 100 TB.
  */
case class Y4mFrameStats(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"y4m_frame_stats requires (binary, int, int), got " +
          s"(${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  override def dataType: DataType = ArrayType(Y4mFrameStats.frameSchema, containsNull = false)
  override def prettyName: String = "y4m_frame_stats"

  override protected def nullSafeEval(body: Any, w: Any, h: Any): Any =
    Y4mFrameStats.compute(body.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, w, h) =>
      s"${ev.value} = graft.functions.Y4mFrameStats.compute($b, $w, $h);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Y4mFrameStats =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object Y4mFrameStats {
  val frameSchema: StructType = StructType(Seq(
    StructField("sum_y", LongType, nullable = false),
    StructField("sum_u", LongType, nullable = false),
    StructField("sum_v", LongType, nullable = false)))

  private val Marker = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(body: Array[Byte], w: Int, h: Int): ArrayData = {
    if (w <= 0 || h <= 0 || w % 2 != 0 || h % 2 != 0)
      return new GenericArrayData(Array.empty[Any])
    val luma = w * h
    val chroma = (w / 2) * (h / 2)
    val frameSize = Marker.length + luma + 2 * chroma
    val out = new java.util.ArrayList[AnyRef]()
    var off = 0
    while (off + frameSize <= body.length && markerAt(body, off)) {
      var sy = 0L
      var su = 0L
      var sv = 0L
      var i = off + Marker.length
      val yEnd = i + luma
      while (i < yEnd) { sy += body(i) & 0xff; i += 1 }
      val uEnd = i + chroma
      while (i < uEnd) { su += body(i) & 0xff; i += 1 }
      val vEnd = i + chroma
      while (i < vEnd) { sv += body(i) & 0xff; i += 1 }
      out.add(new GenericInternalRow(Array[Any](sy, su, sv)))
      off += frameSize
    }
    new GenericArrayData(out.toArray)
  }

  private def markerAt(body: Array[Byte], off: Int): Boolean = {
    var i = 0
    while (i < Marker.length) {
      if (body(off + i) != Marker(i)) return false
      i += 1
    }
    true
  }

  /** Column-level per-frame Y4M plane stats backed by the native
    * expression. */
  def of(body: Column, w: Column, h: Column): Column =
    ColumnShim.column(Y4mFrameStats(
      ColumnShim.expression(body), ColumnShim.expression(w),
      ColumnShim.expression(h)))
}
