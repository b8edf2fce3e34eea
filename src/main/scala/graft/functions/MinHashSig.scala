package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: per-row MinHash signature of a token
  * array — k Kirsch–Mitzenmacher double-hash minima over the row's
  * 3-word shingles.
  *
  * Bit-identical to the declarative twin
  * [[graft.ops.Dedup.perRowMinhashSig]] (and therefore to the batch
  * [[graft.ops.Dedup.minhashSignature]] aggregate and the DuckDB
  * oracles): ONE md5 per shingle supplies two 52-bit integers —
  * h1 = hex chars 1-13 (the digest's top 52 bits), h2 = chars 14-26 —
  * and the j-th signature position is min over shingles of h1 + j·h2.
  * Shingle construction mirrors [[graft.ops.TextAnalysis.shingles]]'s
  * `concat_ws(" ", t[i], t[i+1], t[i+2])` exactly (`UTF8String
  * .concatWs` — the same null-skip semantics); the twin's
  * `array_distinct` is dropped because duplicate shingles cannot
  * change a minimum. Fewer than 3 tokens yields NULL (the twin's
  * shingle window is empty/undefined there; callers filter first).
  *
  * Why native: the declarative form nests the shingle-hash transform
  * INSIDE the k-iteration lambda, so interpreted HOF evaluation
  * re-digested every shingle k times per row — measured ~9 ms/doc at
  * sf0.1, which made each micro-batch of the streaming near-dup
  * matcher a multi-second stall (the batch pipeline never noticed
  * because its signature is a shuffle aggregate materialized once via
  * SharedCaches). This loop digests each shingle once and stays inside
  * whole-stage codegen: one virtual call per row.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires k > 0, got $k")
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires array<string>, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashSig.compute($c, $k);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  private val Space = UTF8String.fromString(" ")

  // MessageDigest is stateful and not thread-safe; one per executor
  // thread (the SimHash64 pattern)
  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Static entry point shared by interpreted eval and generated code.
    * Returns null for < 3 tokens (no 3-gram shingles exist). */
  def compute(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < 3) return null
    val md = digests.get()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i <= n - 3) {
      val s = UTF8String.concatWs(Space,
        tokens.getUTF8String(i), tokens.getUTF8String(i + 1), tokens.getUTF8String(i + 2))
      md.reset()
      val d = md.digest(s.getBytes)
      val hi =
        ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      val lo =
        ((d(8) & 0xffL) << 56) | ((d(9) & 0xffL) << 48) |
        ((d(10) & 0xffL) << 40) | ((d(11) & 0xffL) << 32) |
        ((d(12) & 0xffL) << 24) | ((d(13) & 0xffL) << 16) |
        ((d(14) & 0xffL) << 8) | (d(15) & 0xffL)
      // hex chars 1-13 = the digest's top 52 bits; chars 14-26 = the
      // next 52 (3 low nibbles of `hi` ++ 10 high nibbles of `lo`) —
      // exactly conv(substring(md5(s), 1|14, 13), 16, 10)
      val h1 = hi >>> 12
      val h2 = ((hi & 0xfffL) << 40) | (lo >>> 24)
      var j = 0
      while (j < k) {
        val v = h1 + j * h2
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    ArrayData.toArrayData(mins)
  }

  /** Column-API entry point. */
  def of(tokens: Column, k: Int): Column =
    ColumnShim.column(MinHashSig(ColumnShim.expression(tokens), k))

  /** Convenience for driver-side expectation checks (PureProps pins
    * this against an independent hex-string computation of the same
    * KM spec). Null when fewer than 3 tokens. */
  def ofTokens(tokens: Seq[String], k: Int): Option[Seq[Long]] = {
    val arr = ArrayData.toArrayData(tokens.map(UTF8String.fromString).toArray)
    Option(compute(arr, k)).map(_.toLongArray().toSeq)
  }
}
