package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit SimHash of a token array.
  *
  * SimHash (Charikar 2002; used by near-dup detection in large-scale
  * web/LLM corpora): each token hashes to 64 bits; per bit position,
  * +1 if set else -1, summed over tokens; the output bit is 1 iff the
  * sum is positive. Documents within small Hamming distance are
  * near-duplicates.
  *
  * Implemented as a custom `Expression` with `doGenCode` (not a Scala
  * UDF) so it stays inside whole-stage codegen: one virtual call per
  * row, no Encoder round-trip, null-safe. The per-token 64-bit hash is
  * two seeded MurmurHash3 32-bit runs over the UTF-8 bytes —
  * deterministic across JVMs and partitions.
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
  private final val Seed1 = 0x9747b28c
  private final val Seed2 = 0x5bd1e995

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val bytes = tokens.getUTF8String(i).getBytes
        val h1 = scala.util.hashing.MurmurHash3.bytesHash(bytes, Seed1).toLong
        val h2 = scala.util.hashing.MurmurHash3.bytesHash(bytes, Seed2).toLong
        val h = (h1 << 32) | (h2 & 0xffffffffL)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
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

  /** Idempotent registration into an already-running session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", simhash64Descriptor._3, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f64", VectorExprs.dotF64Descriptor._3, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "byte_stats", byteStatsDescriptor._3, "scala_udf")
  }
}
