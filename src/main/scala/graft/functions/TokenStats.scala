package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the token-array statistics
  * [[graft.ops.TextAnalysis.quality]] needs — (n_tokens, n_distinct,
  * n_stop) — in ONE pass over the array.
  *
  * The declarative form pays twice: `array_distinct` materializes a
  * second array per row, and `size(filter(toks, isInCollection(...)))`
  * is a higher-order function whose lambda evaluates INTERPRETED (the
  * fingerprint/byte_stats lesson — one boxed expression evaluation per
  * token per row). Measured at the sf1 tier the quality projection was
  * the whole cost of `text_quality` and 3× of it the cost of the
  * token-budget entries (each union branch re-evaluates the shared
  * subtree). This expression does the same counting in a tight
  * codegen'd loop: one UTF8String hash-set insert and one 5-entry
  * stop-set probe per token — byte-equality semantics identical to
  * `array_distinct`/`isInCollection` on strings.
  *
  * Null elements cannot occur from `split()` (the engine's only token
  * source) but are handled to the declarative form's semantics anyway:
  * a null token counts toward n_tokens, is one distinct value, and is
  * never a stopword. */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"token_stats requires array<string>, got ${other.catalogString}")
    }

  override def dataType: DataType = TokenStats.schema
  override def prettyName: String = "token_stats"

  override protected def nullSafeEval(input: Any): Any =
    TokenStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false)))

  /** The engine-wide stopword list as a byte-equality probe set —
    * single owner stays [[graft.ops.TextAnalysis.stopwords]]. */
  private val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    graft.ops.TextAnalysis.stopwords.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val seen = new java.util.HashSet[UTF8String](math.max(16, n * 2))
    var sawNull = false
    var distinct = 0
    var stop = 0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) sawNull = true
      else {
        val t = arr.getUTF8String(i)
        if (stopSet.contains(t)) stop += 1
        if (seen.add(t)) distinct += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](n, distinct + (if (sawNull) 1 else 0), stop))
  }

  /** Column-level token stats backed by the native expression. */
  def of(toks: Column): Column =
    ColumnShim.column(TokenStats(ColumnShim.expression(toks)))
}
