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

/** Native Catalyst expression: the per-document bigram/trigram
  * repetition counters [[graft.ops.Curation.repetitionStats]] needs —
  * (bi_total, bi_max, bi_distinct, tri_total, tri_distinct) — in ONE
  * pass over the token array.
  *
  * The declarative form was two explode → groupBy(doc_id, ngram) →
  * groupBy(doc_id) pipelines: structurally sound (map-side combined,
  * doc-keyed), but the first combine's hash table is keyed by the
  * n-gram STRINGS, so every bigram and trigram byte crosses the
  * aggregation machinery — measured at the sf1 tier this was the whole
  * 5.8 s cost of `text_repetition` (7.4× its sf0.1 time, scaling with
  * token count). Yet the counters are a pure PER-ROW property: no
  * n-gram is ever compared across documents. This expression computes
  * them where they live — a tight codegen'd loop with two per-row hash
  * maps — turning the operator into a map-only projection with zero
  * shuffle at any corpus size (the [[TokenStats]] lesson applied to
  * n-grams).
  *
  * Semantics are byte-identical to the declarative pipeline over
  * `concat_ws(" ", ...)` n-grams: tokens come from `split(text, ' ')`
  * so they never contain the joiner, making the joined-string key
  * collision-free. Token arrays shorter than 3 return null (the
  * declarative form's inner join dropped those docs); null ELEMENTS
  * cannot occur from split, but a future caller feeding another
  * tokenizer gets concat_ws's exact rule anyway — nulls are SKIPPED
  * inside the join (UTF8String.concatWs's native behavior), never
  * substituted with a literal token the twin would not produce. */
case class NgramRepStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ngram_rep_stats requires array<string>, got ${other.catalogString}")
    }

  override def dataType: DataType = NgramRepStats.schema
  override def nullable: Boolean = true
  override def prettyName: String = "ngram_rep_stats"

  override protected def nullSafeEval(input: Any): Any =
    NgramRepStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.NgramRepStats.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): NgramRepStats =
    copy(child = newChild)
}

object NgramRepStats {
  val schema: StructType = StructType(Seq(
    StructField("bi_total", LongType, nullable = false),
    StructField("bi_max", LongType, nullable = false),
    StructField("bi_distinct", LongType, nullable = false),
    StructField("tri_total", LongType, nullable = false),
    StructField("tri_distinct", LongType, nullable = false)))

  /** Static entry point shared by interpreted eval and generated code.
    * Returns null for arrays with < 3 tokens — no trigram exists, the
    * declarative pipeline's join semantics. */
  private val Space = UTF8String.fromString(" ")

  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    if (n < 3) return null
    // stay in UTF8String space end to end: the byte-level concat and
    // hash avoid the UTF-16 decode a java.lang.String key would pay
    // per n-gram (measured ~25% of the pass at the sf1 tier). A null
    // element stays null — concatWs skips nulls, which is exactly
    // concat_ws's semantics in the declarative twin
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    // bigrams need the max occurrence count → a count map; trigrams
    // need only the distinct count → a set
    val bi = new java.util.HashMap[UTF8String, Int](math.max(16, n * 2))
    var biMax = 0
    i = 0
    while (i < n - 1) {
      val g = UTF8String.concatWs(Space, toks(i), toks(i + 1))
      val c = bi.merge(g, 1, Integer.sum)
      if (c > biMax) biMax = c
      i += 1
    }
    val tri = new java.util.HashSet[UTF8String](math.max(16, n * 2))
    i = 0
    while (i < n - 2) {
      tri.add(UTF8String.concatWs(Space, toks(i), toks(i + 1), toks(i + 2))): Unit
      i += 1
    }
    new GenericInternalRow(Array[Any](
      (n - 1).toLong, biMax.toLong, bi.size.toLong,
      (n - 2).toLong, tri.size.toLong))
  }

  /** Column-level n-gram repetition stats backed by the native
    * expression. */
  def of(toks: Column): Column =
    ColumnShim.column(NgramRepStats(ColumnShim.expression(toks)))
}
