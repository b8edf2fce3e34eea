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

/** The top-`nProbe` nearest cells for an `array<double>` vector against
  * a constant k×d centroid matrix, ordered by (score, cell) ascending —
  * [[NearestCellF64]]'s argmin generalized to the probe side's arg-top-n
  * (`ORDER BY s, cell LIMIT nProbe`, the DuckDB oracles' exact ranking;
  * ties resolve to the LOWER cell because the scan visits cells
  * ascending and only a strictly smaller score displaces).
  *
  * Why this exists: the declarative probe formulation built an
  * `array(...)` of k scored columns — k·d literal doubles inlined into
  * the plan — then struct-sorted and sliced it. That is exactly the
  * inlined-literal shape whose generated method outgrows the JIT's
  * huge-method limit past a few dozen cells (see [[NearestCellF64]]'s
  * measurement), and at corpus-scaled k (⌈√n⌉ ≈ 31k cells at 10⁹
  * vectors) the expression TREE itself becomes a planning/driver-memory
  * cost before execution even starts. Here the matrix rides the plan as
  * ONE referenced object and the generated code is a fixed call
  * regardless of k — the JIT-safety property the serving path's scaladoc
  * promises now actually holds on the probe side too.
  *
  * The selection buffer is nProbe-sized insertion into a sorted pair of
  * arrays: O(k·d + k·log-ish nProbe) per row with zero allocation
  * beyond the output, exactly the partial-selection loop a native ANN
  * library's probe uses. Null vector → null output; summation order and
  * |c|² match [[NearestCellF64]] bit for bit. */
case class NearestCellsF64(child: Expression, centroids: Seq[Seq[Double]],
                           nProbe: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if nProbe > 0 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells requires nProbe > 0, got $nProbe")
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells requires array<double>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"
  override def toString: String =
    s"nearest_cells($child, k=${centroids.length}, nProbe=$nProbe)"

  @transient private lazy val dim = if (centroids.isEmpty) 0 else centroids.head.length
  @transient private lazy val flat: Array[Double] = centroids.flatten.toArray
  @transient private lazy val c2: Array[Double] =
    centroids.map(_.foldLeft(0.0)((s, x) => s + x * x)).toArray

  override protected def nullSafeEval(v: Any): Any =
    NearestCellsF64.compute(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      flat, c2, dim, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("cellMatrix", flat, "double[]")
    val nrm2 = ctx.addReferenceObj("cellNorms", c2, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.NearestCellsF64.compute($v, $m, $nrm2, $dim, $nProbe);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellsF64 =
    copy(child = newChild)
}

object NearestCellsF64 {
  /** Static entry point shared by interpreted eval and generated code:
    * the nProbe (score, cell)-ascending nearest cells as an int array. */
  def compute(a: org.apache.spark.sql.catalyst.util.ArrayData,
              flat: Array[Double], c2: Array[Double],
              dim: Int, nProbe: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val k = c2.length
    val n = math.min(dim, a.numElements())
    val np = math.min(nProbe, k)
    val bestS = new Array[Double](np)
    val bestC = new Array[Int](np)
    java.util.Arrays.fill(bestS, Double.PositiveInfinity)
    var c = 0
    while (c < k) {
      val off = c * dim
      var dot = 0.0
      var i = 0
      while (i < n) { dot += flat(off + i) * a.getDouble(i); i += 1 }
      val s = -2.0 * dot + c2(c)
      // strict <: an equal score never displaces an earlier (lower)
      // cell — the (s, cell)-ascending tie-break of the oracles
      if (s < bestS(np - 1)) {
        var j = np - 1
        while (j > 0 && s < bestS(j - 1)) {
          bestS(j) = bestS(j - 1); bestC(j) = bestC(j - 1); j -= 1
        }
        bestS(j) = s; bestC(j) = c
      }
      c += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(bestC)
  }
}

object NearestCell {
  /** Column-level nearest-centroid assignment backed by the native
    * expression. */
  def apply(v: Column, centroids: Array[Array[Double]]): Column =
    ColumnShim.column(NearestCellF64(
      ColumnShim.expression(v), centroids.map(_.toIndexedSeq).toIndexedSeq))

  /** Column-level top-nProbe probe cells backed by the native
    * expression — the probe-side twin of [[apply]]. */
  def top(v: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    ColumnShim.column(NearestCellsF64(
      ColumnShim.expression(v), centroids.map(_.toIndexedSeq).toIndexedSeq, nProbe))
}
