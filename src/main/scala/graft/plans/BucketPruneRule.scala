package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, Metadata, MetadataBuilder}

/** Partition pruning through the chain store's bucket layout.
  *
  * [[graft.ingest.ChainStore]] partitions each table by
  * `bucket = block_number div bucketSize` (its substitute for the
  * reference's B-tree on block_number, `init.sql:24`). A reader's
  * height predicate (`block_number = h`, `block_number BETWEEN lo AND
  * hi`) says nothing to Spark about the `bucket` partition column, so
  * the scan lists and footer-reads every bucket of the chain — O(chain
  * length) filesystem work per point lookup, exactly what the layout
  * exists to avoid.
  *
  * `ChainStore.read` marks its `bucket` column with metadata recording
  * the invariant (source column name + bucket size). This rule finds
  * a Filter whose child carries such a marked column, transposes every
  * literal `block_number` bound into the implied `bucket` bound
  * (`block_number ≥ v ⟹ bucket ≥ ⌊v/B⌋`, etc. — heights are
  * non-negative by the store contract, so truncating and flooring
  * division agree on stored values), and ANDs the derived conjunct in.
  * The standard pushdown rules then drive it through the projection
  * onto the partition column, where `PruneFileSourcePartitions` turns
  * it into directory-level pruning (visible as `PartitionFilters` in
  * the scan node).
  *
  * Registered as an ANALYZER rule (`injectResolutionRule`), not an
  * optimizer rule: extended optimizer rules run after PushDownPredicate
  * and ColumnPruning within each operator-optimization iteration, by
  * which point the filter has been rewritten onto the raw relation
  * attribute (no metadata) and the marked alias may have been pruned
  * away entirely. At analysis time the user's filter still sits
  * directly above the store's aliasing projection, metadata intact.
  *
  * Like [[FloorDivPredicateRule]], the rule only ever ADDS conjuncts —
  * the original predicate stays load-bearing; the derived bound is
  * redundant on rows and exists purely to prune partitions. Overflow
  * in the ±1 adjustments skips the rewrite.
  */
object BucketPruneRule extends Rule[LogicalPlan] {

  val BucketOfKey = "graft.bucketOf"
  val BucketSizeKey = "graft.bucketSize"

  /** Metadata for [[graft.ingest.ChainStore]] to stamp on its bucket
    * column: `bucket = srcColumn div bucketSize`, srcColumn ≥ 0. */
  def bucketMetadata(srcColumn: String, bucketSize: Long): Metadata =
    new MetadataBuilder()
      .putString(BucketOfKey, srcColumn)
      .putLong(BucketSizeKey, bucketSize)
      .build()

  /** The source attribute must come from the SAME table as the marked
    * bucket column: after a join of two store tables, resolving the
    * source by name over the whole joined output could pick the other
    * table's block_number and derive a bound for the wrong bucket —
    * silently wrong (typically empty) results. Descend to the
    * innermost subtree still producing the bucket attribute (the
    * store's own projection) and resolve the name there; a predicate
    * on any other table's column then simply never matches it. */
  private def srcFor(child: LogicalPlan, bucket: Attribute): Option[Attribute] = {
    def owner(p: LogicalPlan): LogicalPlan =
      p.children.find(_.outputSet.contains(bucket)).map(owner).getOrElse(p)
    owner(child).output.find(_.name == bucket.metadata.getString(BucketOfKey))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) if f.resolved =>
      val marked = child.output.filter(_.metadata.contains(BucketOfKey)).flatMap { bucket =>
        val b = bucket.metadata.getLong(BucketSizeKey)
        srcFor(child, bucket)
          .filter(_ => b > 0).map(src => (bucket, src, b))
      }
      if (marked.isEmpty) f
      else {
        val conjuncts = splitConjunctivePredicates(cond)
        val derived = marked.flatMap { case (bucket, src, b) =>
          conjuncts.flatMap(p => transpose(p, src, bucket, b))
        }.filterNot(d => conjuncts.exists(_.semanticEquals(d))).distinct
        if (derived.isEmpty) f
        else Filter((conjuncts ++ derived).reduce(And), child)
      }
  }

  /** Foldable integral bound, taken by EVALUATING the expression
    * rather than unwrapping casts syntactically. This rule runs at
    * analysis time, BEFORE constant folding, so a narrowing cast like
    * `lit(300L).cast("byte")` still appears as Cast(Literal(300L)) —
    * whose runtime value is 44, not 300. Unwrapping to the inner
    * literal would derive a bucket bound for the wrong value and prune
    * away matching rows; eval() always yields the value the comparison
    * actually uses. */
  private object IntegralLit {
    def unapply(e: Expression): Option[Long] =
      if (!e.foldable) None
      else try e.eval() match {
        case v: Long  => Some(v)
        case v: Int   => Some(v.toLong)
        case v: Short => Some(v.toLong)
        case v: Byte  => Some(v.toLong)
        case _        => None
        // an eval that throws (e.g. ANSI cast overflow) must surface at
        // execution, not break analysis — just skip the rewrite
      } catch { case _: Exception => None }
  }

  /** Bucket-typed literal (partition discovery usually infers
    * IntegerType for `bucket=N` directories); None when the bound
    * cannot be represented in the column's type. */
  private def blit(bucket: Attribute, v: Long): Option[Literal] = bucket.dataType match {
    case LongType => Some(Literal(v, LongType))
    case IntegerType if v >= Int.MinValue && v <= Int.MaxValue =>
      Some(Literal(v.toInt, IntegerType))
    case _ => None
  }

  /** The bucket conjuncts implied by one predicate on the source
    * column. `Math.floorDiv` keeps lower bounds conservative and upper
    * bounds consistent for any literal sign (stored values are ≥ 0). */
  private def transpose(pred: Expression, src: Attribute, bucket: Attribute,
                        b: Long): Seq[Expression] = {
    def safe(f: => Option[Expression]): Seq[Expression] =
      try f.toSeq catch { case _: ArithmeticException => Nil }
    pred match {
      case GreaterThanOrEqual(a: Attribute, IntegralLit(v)) if a.semanticEquals(src) =>
        safe(blit(bucket, Math.floorDiv(v, b)).map(GreaterThanOrEqual(bucket, _)))
      case GreaterThan(a: Attribute, IntegralLit(v)) if a.semanticEquals(src) =>
        safe(blit(bucket, Math.floorDiv(Math.addExact(v, 1L), b)).map(GreaterThanOrEqual(bucket, _)))
      case LessThanOrEqual(a: Attribute, IntegralLit(v)) if a.semanticEquals(src) =>
        safe(blit(bucket, Math.floorDiv(v, b)).map(LessThanOrEqual(bucket, _)))
      case LessThan(a: Attribute, IntegralLit(v)) if a.semanticEquals(src) =>
        safe(blit(bucket, Math.floorDiv(Math.subtractExact(v, 1L), b)).map(LessThanOrEqual(bucket, _)))
      case EqualTo(a: Attribute, IntegralLit(v)) if a.semanticEquals(src) =>
        safe(blit(bucket, Math.floorDiv(v, b)).map(EqualTo(bucket, _)))
      // literal-on-the-left mirror images
      case GreaterThanOrEqual(IntegralLit(v), a: Attribute) if a.semanticEquals(src) =>
        transpose(LessThanOrEqual(a, Literal(v)), src, bucket, b)
      case GreaterThan(IntegralLit(v), a: Attribute) if a.semanticEquals(src) =>
        transpose(LessThan(a, Literal(v)), src, bucket, b)
      case LessThanOrEqual(IntegralLit(v), a: Attribute) if a.semanticEquals(src) =>
        transpose(GreaterThanOrEqual(a, Literal(v)), src, bucket, b)
      case LessThan(IntegralLit(v), a: Attribute) if a.semanticEquals(src) =>
        transpose(GreaterThan(a, Literal(v)), src, bucket, b)
      case EqualTo(IntegralLit(v), a: Attribute) if a.semanticEquals(src) =>
        transpose(EqualTo(a, Literal(v)), src, bucket, b)
      case _ => Nil
    }
  }

  private def splitConjunctivePredicates(condition: Expression): Seq[Expression] =
    condition match {
      case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other     => Seq(other)
    }
}
