package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Nearest-centroid cell id for an `array<double>` vector against a
  * constant k×d centroid matrix: argmin over c of −2·v·c + |c|², ties
  * to the FIRST minimal index (strict `<` in the scan loop — the same
  * winner as `array_position(scores, array_min(scores))`, and the same
  * `ORDER BY s, cell` tie-break the DuckDB oracles use).
  *
  * Why an expression and not k inlined dot-product columns: the
  * declarative formulation (`array(-2·dot(v, [64 literals]) + |c|², …)`
  * then argmin) embeds k·d literal doubles into the plan, and each
  * appears ~4× (filter + project, position + min). At the corpus-scaled
  * k SemDeDup needs (k = n/1000 — 60 cells at a 60k-vector tier) the
  * generated method grows past the JIT's huge-method limit and the
  * whole scan stage silently runs INTERPRETED — measured ~1 ms/row,
  * ~100× slow, before this expression existed. Here the matrix rides
  * the plan as ONE referenced object (`ctx.addReferenceObj`), the
  * generated code is a fixed ~15-line double loop regardless of k, and
  * the stage stays inside whole-stage codegen at any cell count. The
  * k·d·8-byte matrix ships once per task binary — fine to k ~ 10⁴; a
  * billion-vector corpus takes the two-level quantizer described on
  * [[graft.ops.Similarity.sampledCentroids]] without changing this
  * expression.
  *
  * Null vector → null cell; elements assumed non-null (embeddings),
  * matching [[DotProductF64]]. Summation per centroid is sequential in
  * index order and |c|² is the left-to-right Σx² — bit-identical to
  * the oracle's `list_dot_product`.
  */
case class NearestCellF64(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_cell requires array<double>, got ${t.catalogString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_cell"
  // keep explain output readable: k×d doubles have no place in a plan string
  override def toString: String =
    s"nearest_cell($child, k=${centroids.length})"

  @transient private lazy val k = centroids.length
  @transient private lazy val dim = if (centroids.isEmpty) 0 else centroids.head.length
  @transient private lazy val flat: Array[Double] = centroids.flatten.toArray
  @transient private lazy val c2: Array[Double] =
    centroids.map(_.foldLeft(0.0)((s, x) => s + x * x)).toArray

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(dim, a.numElements())
    var best = -1
    var bestS = Double.PositiveInfinity
    var c = 0
    while (c < k) {
      val off = c * dim
      var dot = 0.0
      var i = 0
      while (i < n) { dot += flat(off + i) * a.getDouble(i); i += 1 }
      val s = -2.0 * dot + c2(c)
      if (s < bestS) { bestS = s; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("cellMatrix", flat, "double[]")
    val nrm2 = ctx.addReferenceObj("cellNorms", c2, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val best = ctx.freshName("best")
      val bestS = ctx.freshName("bestS")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $best = -1;
         |double $bestS = Double.POSITIVE_INFINITY;
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |for (int $c = 0; $c < $k; $c++) {
         |  int $off = $c * $dim;
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $m[$off + $i] * $v.getDouble($i);
         |  }
         |  double $s = -2.0 * $dot + $nrm2[$c];
         |  if ($s < $bestS) { $bestS = $s; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellF64 =
    copy(child = newChild)
}

object NearestCell {
  /** Column-level nearest-centroid assignment backed by the native
    * expression. */
  def apply(v: Column, centroids: Array[Array[Double]]): Column =
    ColumnShim.column(NearestCellF64(
      ColumnShim.expression(v), centroids.map(_.toIndexedSeq).toIndexedSeq))
}
