package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 60-bit SimHash of a token array.
  *
  * SimHash (Charikar 2002; used by near-dup detection in large-scale
  * web/LLM corpora): each token hashes to `Bits` bits; per bit
  * position, +1 if set else -1, summed over tokens; the output bit is
  * 1 iff the sum is >= 0. Documents within small Hamming distance are
  * near-duplicates.
  *
  * There is ONE simhash in this engine. The per-token hash is the
  * md5-derived 60-bit value `conv(substring(md5(token), 1, 15), 16,
  * 10)` — the first 15 hex chars (= top 60 bits) of the token's MD5 —
  * computed here as a native digest loop. That makes this expression
  * bit-identical to the pure-DataFrame twin
  * [[graft.ops.Dedup.simhashSigsMd5]] AND to the DuckDB oracle's
  * `('0x' || substr(md5(tok), 1, 15))::BIGINT`, so the registry's
  * `dedup_simhash` is hash-checked end to end (it was rows-only when
  * this expression used MurmurHash3, which has no DuckDB form —
  * round-12 verdict task 2). 60 bits rather than 64 keeps the packed
  * signature inside a non-negative BIGINT in both engines, where bit
  * 63 would read as a sign flip on the DuckDB side.
  *
  * Implemented as a custom `Expression` with `doGenCode` (not a Scala
  * UDF) so it stays inside whole-stage codegen: one virtual call per
  * row, no Encoder round-trip, null-safe — and ONE digest per token,
  * where the DataFrame twin pays explode + shuffle of a 60-column
  * vote aggregate (the twin exists as the differential mirror, not
  * the fast path).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash64 requires array<string>, got ${other.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Signature width: 15 md5 hex chars = 60 bits (see class doc). */
  final val Bits = 60

  // MessageDigest is stateful and not thread-safe; one per executor
  // thread amortizes the allocation across every row the task hashes
  private val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** The per-token 60-bit hash: top 60 bits of the MD5 digest's first
    * 8 bytes — exactly `('0x' || substr(md5(tok), 1, 15))::BIGINT`. */
  private def tokenHash(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    val top64 =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top64 >>> 4
  }

  /** Static entry point shared by interpreted eval and generated code.
    * Vote rule: bit set iff the ±1 sum is >= 0 (ties set the bit) —
    * the twin's `WHEN s >= 0` branch, kept identical so an empty or
    * tie-heavy doc hashes the same everywhere. */
  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](Bits)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = tokenHash(tokens.getUTF8String(i).getBytes)
        var b = 0
        while (b < Bits) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < Bits) {
      if (counts(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Convenience hash for driver-side expectation checks. */
  def ofTokens(tokens: Seq[String]): Long = {
    val arr = ArrayData.toArrayData(tokens.map(UTF8String.fromString).toArray)
    compute(arr)
  }
}

/** Native-function descriptors. Session wiring lives in the engine's
  * single extensions entry point ([[graft.plans.GraftExtensions]]);
  * [[GraftFunctions.register]] is the runtime fallback for sessions
  * created without the config. */
object GraftFunctions {
  /** Arity check shared by the SQL function builders: a bare
    * `children.head` on an empty argument list would surface as a
    * NoSuchElementException at planning (and extra arguments would be
    * silently dropped) — fail with the expected signature instead. */
  private[graft] def exactArgs(fn: String, n: Int)(
      children: Seq[Expression]): Seq[Expression] = {
    if (children.size != n)
      throw new IllegalArgumentException(
        s"$fn expects exactly $n argument${if (n == 1) "" else "s"}, got ${children.size}")
    children
  }

  private[graft] val simhash64Descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash64"),
    new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
    (children: Seq[Expression]) => SimHash64(exactArgs("simhash64", 1)(children).head)
  )

  private[graft] val byteStatsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("byte_stats"),
    new ExpressionInfo(classOf[ByteStats].getName, "byte_stats"),
    (children: Seq[Expression]) => ByteStats(exactArgs("byte_stats", 1)(children).head)
  )

  private[graft] val tokenStatsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("token_stats"),
    new ExpressionInfo(classOf[TokenStats].getName, "token_stats"),
    (children: Seq[Expression]) => TokenStats(exactArgs("token_stats", 1)(children).head)
  )

  private[graft] val ngramRepStatsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("ngram_rep_stats"),
    new ExpressionInfo(classOf[NgramRepStats].getName, "ngram_rep_stats"),
    (children: Seq[Expression]) =>
      NgramRepStats(exactArgs("ngram_rep_stats", 1)(children).head)
  )

  /** `minhash_sig(tokens, k)` — k must be a foldable integer literal
    * (it sizes the output array; a column-valued k has no meaning). */
  private[graft] val minhashSigDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
    (children: Seq[Expression]) => {
      val Seq(toks, kExpr) = exactArgs("minhash_sig", 2)(children)
      val k = kExpr match {
        case e if e.foldable && e.dataType == org.apache.spark.sql.types.IntegerType =>
          e.eval().asInstanceOf[Int]
        case other => throw new IllegalArgumentException(
          s"minhash_sig's k must be an integer literal, got $other")
      }
      MinHashSig(toks, k)
    }
  )

  /** Idempotent registration into an already-running session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", simhash64Descriptor._3, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f64", VectorExprs.dotF64Descriptor._3, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "byte_stats", byteStatsDescriptor._3, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_stats", tokenStatsDescriptor._3, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", minhashSigDescriptor._3, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ngram_rep_stats", ngramRepStatsDescriptor._3, "scala_udf")
  }
}
