package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SkewJoin

/** [[graft.ops.SkewJoin.saltedJoin]]: row-identical to the plain join,
  * and the shuffle actually happens on (key, salt) so the hot key is
  * spread across `salts` reducers instead of one. */
class SkewJoinSpec extends AnyFunSuite with SparkSpec {

  test("salted join == plain join on a 90%-hot-key fact table (multiplicities included)") {
    import spark.implicits._
    // 900 rows of the hot key 7, 100 spread over keys 0..9; dim has
    // TWO rows for key 7 so the test catches duplicate or lost matches
    val facts = ((1 to 900).map(i => (7L, s"hot$i")) ++
      (1 to 100).map(i => (i % 10L, s"cold$i"))).toDF("k", "payload")
    val dim = (Seq((7L, "seven-a"), (7L, "seven-b")) ++
      (0L to 9L).filter(_ != 7L).map(k => (k, s"dim$k"))).toDF("k", "attr")
    val plain = facts.join(dim, "k")
      .select("k", "payload", "attr").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val salted = SkewJoin.saltedJoin(facts, dim, "k", salts = 8)
      .select("k", "payload", "attr").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(salted == plain)
  }

  test("the shuffle key includes the salt (the hot key is actually spread)") {
    import spark.implicits._
    val facts = (1 to 100).map(i => (7L, i)).toDF("k", "v")
    val dim = Seq((7L, "x")).toDF("k", "attr")
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val priorBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = SkewJoin.saltedJoin(facts, dim, "k", salts = 4)
        .queryExecution.executedPlan.toString
      assert(plan.contains("_salt"), s"salt column must reach the physical plan:\n$plan")
      assert("hashpartitioning\\(k#\\d+L, _salt".r.findFirstIn(plan).isDefined,
        s"shuffle must be keyed on (k, _salt):\n$plan")
      // distinct salts actually assigned to the fact rows: > 1 proves
      // the hot key's rows no longer land on a single reducer key
      val salts = facts.withColumn("_salt",
        pmod(xxhash64(facts.columns.map(col): _*), lit(4L)))
        .select("_salt").distinct().count()
      assert(salts > 1, "the hot key's rows must spread over multiple salts")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorBc)
    }
  }

  test("salt is recompute-deterministic; identical duplicates share it (documented); multiplicity exact") {
    import spark.implicits._
    // 400 IDENTICAL fact rows: they deliberately share one salt (a
    // row-unique salt would corrupt output under stage retry — see
    // saltedJoin's doc); multiplicity must survive exactly
    val facts = (1 to 400).map(_ => (7L, "same-payload")).toDF("k", "payload")
    val dim = Seq((7L, "seven")).toDF("k", "attr")
    val saltCol = pmod(xxhash64(facts.columns.map(col): _*), lit(8L))
    val assigned = facts.withColumn("_salt", saltCol).select("_salt").distinct().collect()
    assert(assigned.length == 1, "identical rows share a deterministic salt by design")
    // and the same plan re-evaluated assigns the same salt (retry-safe)
    assert(facts.withColumn("_salt", saltCol).select("_salt").distinct().collect()
      .toSeq == assigned.toSeq)
    // multiplicity preserved: 400 identical output rows, not 1, not 3200
    assert(SkewJoin.saltedJoin(facts, dim, "k", salts = 8).count() == 400)
  }

  test("AQE keeps the salted shuffle keyed on (k, _salt) in the final adaptive plan") {
    import spark.implicits._
    // AQE re-plans joins at runtime (e.g. SMJ→broadcast, skew splits);
    // this pins that the salt survives re-planning — the shuffle that
    // actually executed was keyed on (k, _salt), not collapsed back to
    // a single hot reducer. Broadcast stays off: a broadcast dim would
    // remove the fact-side shuffle entirely and the salt with it,
    // which is fine at runtime but not what this test pins.
    val facts = (1 to 500).map(i => (7L, i)).toDF("k", "v")
    val dim = ((0L to 9L).map(k => (k, s"dim$k"))).toDF("k", "attr")
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val priorBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = SkewJoin.saltedJoin(facts, dim, "k", salts = 4)
      // collect() (not count()) — count() builds a DERIVED aggregation
      // QueryExecution, leaving this Dataset's own adaptive plan
      // unexecuted; collect() finalizes the plan under inspection
      assert(joined.collect().length == 500)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"expected a finalized adaptive plan:\n$plan")
      assert("hashpartitioning\\(k#\\d+L, _salt".r.findFirstIn(plan).isDefined,
        s"the executed shuffle must stay keyed on (k, _salt) under AQE:\n$plan")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorBc)
    }
  }

  test("a pre-existing _salt column is rejected instead of silently overwritten") {
    import spark.implicits._
    val facts = Seq((7L, 1L)).toDF("k", "_salt")
    val dim = Seq((7L, "x")).toDF("k", "attr")
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(facts, dim, "k", salts = 4)
    }
  }
}
