package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.api.{GetLogsFilter, LogsQuery}
import graft.evm.EvmDerive

/** The floor-div predicate-transposition rule
  * ([[graft.plans.FloorDivPredicateRule]]): block_number filters on the
  * derived logs table must reach the parquet scan as plain event_id
  * bounds, and must never change results.
  */
class FloorDivRuleSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def pushedFilters(df: org.apache.spark.sql.DataFrame): String = {
    val plan = df.queryExecution.executedPlan.toString
    plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
  }

  test("block range filter pushes transposed event_id bounds into the scan") {
    val df = LogsQuery.plan(EvmDerive.logs(spark, sfDir),
      GetLogsFilter(fromBlock = Some(10), toBlock = Some(19), pageSize = Some(100)))
    val pushed = pushedFilters(df)
    // block_number ∈ [10,19] ⟺ event_id ∈ [100,199]
    assert(pushed.contains("GreaterThanOrEqual(event_id,100)"), pushed)
    assert(pushed.contains("LessThanOrEqual(event_id,199)"), pushed)
  }

  test("equality on derived block_number pushes a closed event_id interval") {
    val df = EvmDerive.logs(spark, sfDir).filter(col("block_number") === 7)
    val pushed = pushedFilters(df)
    assert(pushed.contains("GreaterThanOrEqual(event_id,70)"), pushed)
    assert(pushed.contains("LessThanOrEqual(event_id,79)"), pushed)
  }

  test("transposition is semantics-preserving, including negatives and edges") {
    import spark.implicits._
    // Math.floorDiv is mathematical floor for longs — the ground truth
    // the rule must agree with on every comparison shape.
    val vals = (-25L to 25L) ++ Seq(Long.MaxValue / 10, Long.MinValue / 10)
    val df = vals.toDF("a").withColumn("d", floor(col("a") / 3).cast("long"))
    def expect(p: Long => Boolean): Set[Long] =
      vals.filter(v => p(Math.floorDiv(v, 3L))).toSet
    def got(c: org.apache.spark.sql.Column): Set[Long] =
      df.filter(c).select("a").as[Long].collect().toSet
    assert(got(col("d") >= 2) == expect(_ >= 2))
    assert(got(col("d") > -3) == expect(_ > -3))
    assert(got(col("d") <= -2) == expect(_ <= -2))
    assert(got(col("d") < 4) == expect(_ < 4))
    assert(got(col("d") === -1) == expect(_ == -1))
    assert(got(lit(2) <= col("d")) == expect(_ >= 2))
  }

  test("rewrite refused beyond the double-exact range: no row dropped near 2^53") {
    import spark.implicits._
    // Counterexample the guard exists for: a = 10^17−1, c = 10. The
    // double cast rounds a up to 10^17 (spacing is 16 there), so
    // Spark's floor(cast(a as double)/10) = 10^16 and `d >= 10^16`
    // accepts the row — while an exact integer conjunct `a >= 10^17`
    // would drop it. Bounds beyond 2^51 must refuse the rewrite and
    // leave the original predicate alone.
    val a = 100000000000000000L - 1 // 10^17 − 1
    val df = Seq(a, 5L).toDF("a").withColumn("d", floor(col("a") / 10).cast("long"))
    val kept = df.filter(col("d") >= 10000000000000000L) // 10^16
    assert(kept.select("a").as[Long].collect().toSeq == Seq(a),
      "row accepted by double-semantics floor must survive the optimizer")
    // and the plan must carry no transposed bound on `a`
    val optimized = kept.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("100000000000000000"),
      s"guard must refuse the 10^17 conjunct:\n$optimized")
  }

  test("rule-on and rule-off plans return identical rows") {
    val filter = GetLogsFilter(fromBlock = Some(5), toBlock = Some(30),
      topic0 = Some(EvmDerive.topicOf("click")), pageSize = Some(100))
    val withRule = LogsQuery.plan(EvmDerive.logs(spark, sfDir), filter).collect()
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.FloorDivPredicateRule")
    try {
      val without = LogsQuery.plan(EvmDerive.logs(spark, sfDir), filter)
      assert(!pushedFilters(without).contains("GreaterThanOrEqual(event_id,50)"))
      assert(withRule.toSeq == without.collect().toSeq)
    } finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }
}
