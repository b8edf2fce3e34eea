package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.tables.Bucketed

/** Machine-checks the co-located-join claim in [[graft.tables.Bucketed]]:
  * with both sides bucketed on the join key into the same bucket count,
  * the executed plan contains NO shuffle exchange — the write-time
  * layout replaced the run-time shuffle. Also checks the join result is
  * identical to the plain parquet join, so the layout is a pure
  * physical optimization.
  */
class BucketedJoinSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def resetTable(name: String): Unit =
    graft.tables.Bucketed.resetTable(spark, name)

  /** Run `body` with broadcast disabled (so the small fixture doesn't
    * trivially broadcast away the join) and AQE off (so the final plan
    * is inspectable pre-execution), restoring prior values after. */
  private def withJoinConf[A](body: => A): A = {
    val prior = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed lineitem ⋈ orders: no shuffle exchange, same result as the plain join") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    Seq("b_lineitem", "b_orders").foreach(resetTable)
    Bucketed.writeBucketed(li, "b_lineitem", "l_orderkey", nBuckets = 4)
    Bucketed.writeBucketed(ord, "b_orders", "o_orderkey", nBuckets = 4)
    withJoinConf {
      val joined = Bucketed.cooperativeJoin(spark, "b_lineitem", "l_orderkey",
        "b_orders", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
      // identical result to the plain (shuffled) parquet join
      val expected = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      assert(joined.count() == expected.count())
      val gotSum = joined.agg(sum(col("l_quantity").cast("long"))).head.getLong(0)
      val expSum = expected.agg(sum(col("l_quantity").cast("long"))).head.getLong(0)
      assert(gotSum == expSum)
    }
  }

  test("AQE leaves the bucketed join shuffle-free (no exchange introduced at runtime)") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    Seq("b_lineitem", "b_orders").foreach(resetTable)
    Bucketed.writeBucketed(li, "b_lineitem", "l_orderkey", nBuckets = 4)
    Bucketed.writeBucketed(ord, "b_orders", "o_orderkey", nBuckets = 4)
    // AQE ON this time: adaptive re-planning (coalescing, join swaps)
    // must not reintroduce an exchange the bucket layout paid to avoid
    val prior = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val joined = Bucketed.cooperativeJoin(spark, "b_lineitem", "l_orderkey",
        "b_orders", "o_orderkey")
      // collect() (not count()) — count() builds a DERIVED aggregation
      // QueryExecution, leaving this Dataset's own adaptive plan
      // unexecuted; collect() finalizes the plan under inspection
      assert(joined.collect().nonEmpty)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"expected a finalized adaptive plan:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ under AQE:\n$plan")
      assert(!plan.contains("Exchange") && !plan.contains("ShuffleQueryStage"),
        s"AQE must not add a shuffle to the co-located join:\n$plan")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("mismatched bucket counts fall back to a shuffle (the invariant is the layout, not magic)") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    // self-contained: (re)create both sides so this test does not
    // depend on the other test having run first
    Seq("b_lineitem", "b_orders_8").foreach(resetTable)
    Bucketed.writeBucketed(li, "b_lineitem", "l_orderkey", nBuckets = 4)
    Bucketed.writeBucketed(ord, "b_orders_8", "o_orderkey", nBuckets = 8)
    withJoinConf {
      val joined = Bucketed.cooperativeJoin(spark, "b_lineitem", "l_orderkey",
        "b_orders_8", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      // one side must repartition to the other's bucketing (or both
      // shuffle) — the point: co-location only holds when counts match
      assert(plan.contains("Exchange"), s"expected a shuffle with 4 vs 8 buckets:\n$plan")
      assert(joined.count() > 0)
    }
  }
}
