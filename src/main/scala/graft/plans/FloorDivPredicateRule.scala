package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Predicate transposition through invertible floor-division
  * derivations.
  *
  * The EVM surface derives `block_number = floor(event_id / 10)` at
  * read time ([[graft.evm.EvmDerive]]); a user filter
  * `block_number >= 100` therefore reaches the parquet scan as
  * `FLOOR(event_id / 10.0) >= 100` — an expression the data source
  * cannot use, so every row group is read (`PushedFilters:
  * [IsNotNull(event_id)]`). The reference gets the equivalent pruning
  * for free from its B-tree on the *stored* block_number column
  * (`init.sql:24`); on derived columns Spark needs the algebra done
  * for it.
  *
  * For integer `a`, positive integer `c`, floor division satisfies
  * `floor(a/c) = k  ⟺  k·c ≤ a < (k+1)·c`, which transposes every
  * comparison:
  *
  *   - `floor(a/c) ≥ k` ⟺ `a ≥ k·c`
  *   - `floor(a/c) > k` ⟺ `a ≥ (k+1)·c`
  *   - `floor(a/c) ≤ k` ⟺ `a ≤ (k+1)·c − 1`
  *   - `floor(a/c) < k` ⟺ `a ≤ k·c − 1`
  *   - `floor(a/c) = k` ⟹ both `≥ k·c` and `≤ k·c+c−1`
  *
  * The rule ADDS the transposed conjunct next to the original
  * predicate (never replaces it — the original stays load-bearing for
  * correctness, the plain-column copy exists to be pushed into the
  * scan, where parquet row-group min/max stats can finally prune).
  * Overflow guard: k·c and (k+1)·c are computed with Math.*Exact and
  * the rewrite is skipped on overflow.
  *
  * Registered through [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`).
  */
object FloorDivPredicateRule extends Rule[LogicalPlan] {

  /** Matches `FLOOR(CAST(a AS DOUBLE) / c)` (optionally the whole
    * floor cast back to long) where `a` is an integral attribute and
    * `c` a positive integral double literal.
    *
    * Precision caveat: Spark evaluates the matched predicate in DOUBLE
    * (`floor(cast(a as double) / c)`), while the injected conjunct is
    * exact integer math. The two agree only while the cast of `a` and
    * the quotient stay exactly representable; near 2^53 the
    * double-based floor can accept a row the integer conjunct rejects
    * (e.g. a = 10^17−1, c = 10). [[transpose]] therefore refuses any
    * rewrite whose transposed bound exceeds 2^51 in magnitude (two
    * bits of slack below 2^53) — see [[exactRange]].
    */
  private object FloorDivCol {
    def unapply(e: Expression): Option[(Attribute, Long)] = e match {
      case Cast(FloorDivCol(a, c), LongType, _, _) => Some((a, c))
      case Floor(Divide(Cast(a: Attribute, DoubleType, _, _), Literal(c: Double, DoubleType), _))
        if c > 0 && c == math.rint(c) && c <= Long.MaxValue.toDouble =>
        Some((a, c.toLong))
      case _ => None
    }
  }

  private object IntegralLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, _) => Some(v)
      case Literal(v: Int, _)  => Some(v.toLong)
      case Cast(IntegralLit(v), _, _, _) => Some(v)
      case _ => None
    }
  }

  private def geq(a: Attribute, v: Long) = GreaterThanOrEqual(a, Literal(v, a.dataType match {
    case LongType => LongType
    case other    => other
  }))

  private def leq(a: Attribute, v: Long) = LessThanOrEqual(a, Literal(v, a.dataType match {
    case LongType => LongType
    case other    => other
  }))

  /** Largest bound magnitude the rewrite accepts. For any injected
    * bound v with |v| ≤ 2^51, every row the integer conjunct rejects
    * is also rejected by Spark's double-based original predicate:
    * a failing row for `a ≥ v` satisfies a < v ≤ 2^51, so
    * cast(a as double) is exact and the quotient's rounding error
    * (≤ (a/c)·2^-53 < 1/(2c)) cannot bridge the ≥ 1/c gap to the next
    * integer; a failing row for `a ≤ v` has exact quotient at least
    * (a−v)/c above the threshold, again beyond rounding reach once
    * v ≤ 2^51. Beyond that the rewrite is skipped — the original
    * predicate alone remains, correct but not pushed down. */
  private val exactRange: Long = 1L << 51

  private def exact(v: Long): Long =
    if (math.abs(v) <= exactRange) v
    else throw new ArithmeticException("transposed bound outside double-exact range")

  /** The transposed plain-column conjuncts implied by one predicate. */
  private def transpose(pred: Expression): Seq[Expression] = {
    def safe(f: => Seq[Expression]): Seq[Expression] =
      try f catch { case _: ArithmeticException => Nil }
    pred match {
      case GreaterThanOrEqual(FloorDivCol(a, c), IntegralLit(k)) if a.dataType == LongType =>
        safe(Seq(geq(a, exact(Math.multiplyExact(k, c)))))
      case GreaterThan(FloorDivCol(a, c), IntegralLit(k)) if a.dataType == LongType =>
        safe(Seq(geq(a, exact(Math.multiplyExact(Math.addExact(k, 1L), c)))))
      case LessThanOrEqual(FloorDivCol(a, c), IntegralLit(k)) if a.dataType == LongType =>
        safe(Seq(leq(a, Math.subtractExact(exact(Math.multiplyExact(Math.addExact(k, 1L), c)), 1L))))
      case LessThan(FloorDivCol(a, c), IntegralLit(k)) if a.dataType == LongType =>
        safe(Seq(leq(a, Math.subtractExact(exact(Math.multiplyExact(k, c)), 1L))))
      case EqualTo(FloorDivCol(a, c), IntegralLit(k)) if a.dataType == LongType =>
        safe(Seq(geq(a, exact(Math.multiplyExact(k, c))),
          leq(a, Math.subtractExact(exact(Math.multiplyExact(Math.addExact(k, 1L), c)), 1L))))
      // literal-on-the-left mirror images
      case GreaterThanOrEqual(IntegralLit(k), fd @ FloorDivCol(_, _)) => transpose(LessThanOrEqual(fd, Literal(k)))
      case GreaterThan(IntegralLit(k), fd @ FloorDivCol(_, _))        => transpose(LessThan(fd, Literal(k)))
      case LessThanOrEqual(IntegralLit(k), fd @ FloorDivCol(_, _))    => transpose(GreaterThanOrEqual(fd, Literal(k)))
      case LessThan(IntegralLit(k), fd @ FloorDivCol(_, _))           => transpose(GreaterThan(fd, Literal(k)))
      case EqualTo(IntegralLit(k), fd @ FloorDivCol(_, _))            => transpose(EqualTo(fd, Literal(k)))
      case _ => Nil
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val derived = conjuncts.flatMap(transpose)
        .filterNot(d => conjuncts.exists(_.semanticEquals(d)))
        .distinct
      if (derived.isEmpty) f
      else Filter((conjuncts ++ derived).reduce(And), child)
  }

  private def splitConjunctivePredicates(condition: Expression): Seq[Expression] =
    condition match {
      case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other     => Seq(other)
    }
}

/** The engine's single session-extension entry point
  * (`.config("spark.sql.extensions", "graft.plans.GraftExtensions")`):
  * the optimizer rules plus the native SQL functions (`simhash64`,
  * `dot_f64`, `byte_stats`, `token_stats`, `minhash_sig`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => FloorDivPredicateRule)
    // analyzer-stage: must see the store's metadata-marked alias before
    // pushdown/pruning rewrite it away (see BucketPruneRule doc)
    ext.injectResolutionRule(_ => BucketPruneRule)
    ext.injectFunction(graft.functions.GraftFunctions.simhash64Descriptor)
    ext.injectFunction(graft.functions.VectorExprs.dotF64Descriptor)
    ext.injectFunction(graft.functions.GraftFunctions.byteStatsDescriptor)
    ext.injectFunction(graft.functions.GraftFunctions.tokenStatsDescriptor)
    ext.injectFunction(graft.functions.GraftFunctions.minhashSigDescriptor)
    ext.injectFunction(graft.functions.GraftFunctions.ngramRepStatsDescriptor)
  }
}
