package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen dot product over two `array<double>` columns.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) allocates a zipped
  * array and evaluates interpreted lambdas per element — measured
  * ~40 s for 125k 64-dim pairs at sf0.1. This expression is a tight
  * generated loop (no allocation, no virtual calls), keeping
  * similarity search inside whole-stage codegen. Summation is
  * sequential in index order — bit-identical to the DuckDB oracle's
  * `list_dot_product`.
  *
  * Null handling: null array → null result; elements are assumed
  * non-null (embedding vectors), matching primitive `getDouble`.
  */
case class DotProductF64(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_f64 requires (array<double>, array<double>), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f64"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProductF64 =
    copy(left = newLeft, right = newRight)
}

/** Native codegen PQ asymmetric-distance fold: given a row's
  * `array<int>` PQ codes and a query's FLATTENED m×ksub inner-product
  * table (`array<double>`, subspace-major), the approximate dot is
  * `Σ_j tbl[j·ksub + codes[j]]` — m gather-lookups and m−1 adds per
  * (row, query) pair, the per-pair hot path of
  * [[graft.ops.Similarity.topKPq]]/[[graft.ops.Similarity.topKIvfPq]].
  * The interpreted `element_at(element_at(...))` chain twin evaluates
  * ~35 expression nodes per pair inside the candidate join; this is
  * one generated loop. Ascending-j summation from 0.0 — same values
  * as the oracle's explicit chain (a leading +0.0 can only flip a
  * zero's sign, which compares equal). Null codes/table → null. */
case class PqAdcF64(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc requires (array<int>, array<double>), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val tbl = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var s = 0.0
    var j = 0
    while (j < m) { s += tbl.getDouble(j * ksub + codes.getInt(j)); j += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      s"""
         |int $m = $a.numElements();
         |double $s = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  $s += $b.getDouble($j * $ksub + $a.getInt($j));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PqAdcF64 =
    copy(left = newLeft, right = newRight)
}

/** Write-time nibble packer for stored PQ codes: `array<int>` codes in
  * [0, 16) → `binary` at 2 codes/byte — code j lands in byte j/2, low
  * nibble for even j. This is what makes the stored index's
  * "4 bits/dim" byte bound PHYSICAL: parquet stores the packed column
  * as m/2 bytes + offsets per row instead of ~4 B/code element ints.
  * Even m only (the [[graft.ops.AnnIndex.PqM]] layout); values are
  * masked to 4 bits — callers guarantee codes < 16 (the ksub = 16
  * codebook-stride `require`s in [[graft.ops.Similarity]]). Decode
  * never materializes: [[PqAdcPackedF64]] shifts/masks inside its
  * gather loop. */
case class NibblePack(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.IntegerType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nibble_pack requires array<int>, got ${t.catalogString}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "nibble_pack"

  override protected def nullSafeEval(a: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val m = codes.numElements()
    // even m is load-bearing, not stylistic: [[PqAdcPackedF64]]
    // derives m as packed.length · 2, so an odd code array would make
    // the fold read a phantom code 0 at j = m and index the query
    // table at m·ksub — out of bounds on UnsafeArrayData, silently
    // wrong scores. Fail loudly at pack time instead.
    if ((m & 1) != 0) throw new IllegalArgumentException(
      s"nibble_pack requires an even number of codes, got $m")
    val out = new Array[Byte]((m + 1) / 2)
    var j = 0
    while (j < m) {
      out(j >> 1) = (out(j >> 1) | ((codes.getInt(j) & 0xF) << ((j & 1) << 2))).toByte
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      s"""
         |int $m = $a.numElements();
         |if (($m & 1) != 0) {
         |  throw new IllegalArgumentException(
         |    "nibble_pack requires an even number of codes, got " + $m);
         |}
         |byte[] $out = new byte[($m + 1) / 2];
         |for (int $j = 0; $j < $m; $j++) {
         |  $out[$j >> 1] |= (byte)(($a.getInt($j) & 0xF) << (($j & 1) << 2));
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NibblePack =
    copy(child = newChild)
}

/** [[PqAdcF64]] over NIBBLE-PACKED codes (`binary`, [[NibblePack]]'s
  * layout): the approximate dot is still `Σ_j tbl[j·ksub + code_j]`,
  * with code_j decoded by one shift/mask inside the generated gather
  * loop — same IEEE summation sequence as the unpacked fold, so the
  * stored-index entries keep hash-checking against the same oracle
  * while the codes column shrinks ~8×. m = 2 · packed length (even m
  * by the pack contract). */
case class PqAdcPackedF64(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.BinaryType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_packed requires (binary, array<double>), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_packed"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[Array[Byte]]
    val tbl = b.asInstanceOf[ArrayData]
    val m = codes.length * 2
    var s = 0.0
    var j = 0
    while (j < m) {
      val c = (codes(j >> 1) >> ((j & 1) << 2)) & 0xF
      s += tbl.getDouble(j * ksub + c)
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      s"""
         |int $m = $a.length * 2;
         |double $s = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  int $c = ($a[$j >> 1] >> (($j & 1) << 2)) & 0xF;
         |  $s += $b.getDouble($j * $ksub + $c);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PqAdcPackedF64 =
    copy(left = newLeft, right = newRight)
}

/** Residual against a constant centroid matrix: `v − C[cell]`
  * elementwise, as `array<double>` — the encode-side half of
  * IVF×residual-PQ ([[graft.ops.Similarity.topKIvfRpq]]). The matrix
  * rides the plan as ONE reference object (the [[NearestCellF64]]
  * argument: a k×d `element_at(typedlit(...))` twin would drag k·d
  * doubles into the plan string and the expression tree), and the
  * generated loop is fixed-size regardless of k. Elementwise
  * subtraction has no summation order — nothing to diverge from the
  * oracle's `list_transform(range(...), i -> v[i] - ctr[i])`. Null
  * vector/cell → null. */
case class VecMinusCellF64(left: Expression, right: Expression,
                           centroids: Seq[Seq[Double]]) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), org.apache.spark.sql.types.IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_minus_cell requires (array<double>, int), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_minus_cell"
  override def toString: String =
    s"vec_minus_cell($left, $right, k=${centroids.length})"

  @transient private lazy val dim = if (centroids.isEmpty) 0 else centroids.head.length
  @transient private lazy val flat: Array[Double] = centroids.flatten.toArray

  override protected def nullSafeEval(v: Any, c: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val cell = c.asInstanceOf[Int]
    val n = math.min(dim, a.numElements())
    val off = cell * dim
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = a.getDouble(i) - flat(off + i); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("cellMatrix", flat, "double[]")
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val n = ctx.freshName("n")
      val off = ctx.freshName("off")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |int $off = $c * $dim;
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $v.getDouble($i) - $m[$off + $i];
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VecMinusCellF64 =
    copy(left = newLeft, right = newRight)
}

/** Dot product of a vector against one row of a constant centroid
  * matrix selected by a cell column: `Σ_i v[i]·C[cell][i]`, ascending
  * from 0.0 — the decode-side centroid term of IVF×residual-PQ
  * (`<q, centroid(cell)>` per probed cell). Same reference-object
  * matrix argument and IEEE summation sequence as [[NearestCellF64]]'s
  * inner loop, so the value matches the oracle's
  * `list_dot_product(qv, ctr)` exactly. Null vector/cell → null. */
case class DotCellF64(left: Expression, right: Expression,
                      centroids: Seq[Seq[Double]]) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), org.apache.spark.sql.types.IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_cell requires (array<double>, int), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_cell"
  override def toString: String =
    s"dot_cell($left, $right, k=${centroids.length})"

  @transient private lazy val dim = if (centroids.isEmpty) 0 else centroids.head.length
  @transient private lazy val flat: Array[Double] = centroids.flatten.toArray

  override protected def nullSafeEval(v: Any, c: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val cell = c.asInstanceOf[Int]
    val n = math.min(dim, a.numElements())
    val off = cell * dim
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * flat(off + i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("cellMatrix", flat, "double[]")
    nullSafeCodeGen(ctx, ev, (v, c) => {
      val n = ctx.freshName("n")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |int $off = $c * $dim;
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $v.getDouble($i) * $m[$off + $i];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotCellF64 =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Column-level dot product backed by the native expression. */
  def dotF64(a: Column, b: Column): Column =
    ColumnShim.column(DotProductF64(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Column-level residual `v − centroids[cell]`. */
  def vecMinusCell(v: Column, cell: Column,
                   centroids: Array[Array[Double]]): Column =
    ColumnShim.column(VecMinusCellF64(
      ColumnShim.expression(v), ColumnShim.expression(cell),
      centroids.map(_.toSeq).toSeq))

  /** Column-level `<v, centroids[cell]>`. */
  def dotCell(v: Column, cell: Column,
              centroids: Array[Array[Double]]): Column =
    ColumnShim.column(DotCellF64(
      ColumnShim.expression(v), ColumnShim.expression(cell),
      centroids.map(_.toSeq).toSeq))

  /** Column-level PQ/ADC fold backed by the native expression. */
  def pqAdc(codes: Column, qtblFlat: Column, ksub: Int): Column =
    ColumnShim.column(PqAdcF64(
      ColumnShim.expression(codes), ColumnShim.expression(qtblFlat), ksub))

  /** Column-level nibble packer (array<int> codes → 2-codes/byte
    * binary) — the stored index's write-time PQ layout. */
  def nibblePack(codes: Column): Column =
    ColumnShim.column(NibblePack(ColumnShim.expression(codes)))

  /** Column-level ADC fold over nibble-packed codes. */
  def pqAdcPacked(codes: Column, qtblFlat: Column, ksub: Int): Column =
    ColumnShim.column(PqAdcPackedF64(
      ColumnShim.expression(codes), ColumnShim.expression(qtblFlat), ksub))

  private[graft] val dotF64Descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_f64"),
    new ExpressionInfo(classOf[DotProductF64].getName, "dot_f64"),
    (children: Seq[Expression]) => {
      val cs = GraftFunctions.exactArgs("dot_f64", 2)(children)
      DotProductF64(cs.head, cs(1))
    }
  )
}
