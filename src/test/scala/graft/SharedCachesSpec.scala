package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SharedCaches

/** The shared-cache budget ([[graft.ops.SharedCaches]]): the round-9
  * lesson was that session-shared persisted bases accumulate without
  * bound and can evict each other under the block manager — this spec
  * pins the mechanism that replaces that accident with an explicit
  * LRU over a sized budget.
  */
class SharedCachesSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def range(n: Int) = spark.range(n).toDF("v")

  private def withCap[T](n: Int)(body: => T): T = {
    spark.conf.set("spark.graft.cache.maxEntries", n.toString)
    try body
    finally {
      spark.conf.unset("spark.graft.cache.maxEntries")
      SharedCaches.releaseAll()
    }
  }

  test("re-acquiring the same canonical plan is one entry, and the registered frame comes back") {
    withCap(8) {
      SharedCaches.releaseAll()
      val a = SharedCaches.shared(range(10).filter(col("v") > 2), "t")
      val before = SharedCaches.trackedCount
      // a DIFFERENT DataFrame object, same canonical plan
      val b = SharedCaches.shared(range(10).filter(col("v") > 2), "t")
      assert(SharedCaches.trackedCount == before, "same plan must not add an entry")
      assert(b eq a, "re-acquisition returns the registered (cached) frame")
      assert(a.storageLevel != StorageLevel.NONE)
    }
  }

  test("entries beyond the cap evict least-recently-acquired first; a touch refreshes") {
    withCap(3) {
      SharedCaches.releaseAll()
      val dfs = (0 until 3).map(i => SharedCaches.shared(range(100 + i), "t"))
      // touch dfs(0) so dfs(1) becomes the LRU
      SharedCaches.shared(range(100), "t")
      val d4 = SharedCaches.shared(range(200), "t")
      assert(SharedCaches.trackedCount == 3)
      assert(dfs(1).storageLevel == StorageLevel.NONE, "LRU (untouched) entry must evict")
      assert(dfs(0).storageLevel != StorageLevel.NONE, "touched entry must survive")
      assert(d4.storageLevel != StorageLevel.NONE)
    }
  }

  test("sharedCut: one eager checkpoint cut per plan, distinct from a same-plan shared persist") {
    withCap(8) {
      SharedCaches.releaseAll()
      val plan = range(30).filter(col("v") % 3 === 0)
      val a = SharedCaches.sharedCut(plan, "t")
      // the cut is EAGER (already materialized) and TRUNCATED: the
      // stored frame scans a checkpoint, not the original plan
      assert(a.queryExecution.analyzed.collectLeaves()
        .forall(_.getClass.getSimpleName.contains("LogicalRDD")),
        "sharedCut must return a plan-truncated (LogicalRDD) frame")
      val before = SharedCaches.trackedCount
      val b = SharedCaches.sharedCut(range(30).filter(col("v") % 3 === 0), "t")
      assert(b eq a, "same input plan → the SAME materialized cut, no re-checkpoint")
      assert(SharedCaches.trackedCount == before)
      // a shared() acquisition of the same input plan is a different
      // artifact — it must not collide with (or return) the cut
      val c = SharedCaches.shared(range(30).filter(col("v") % 3 === 0), "t")
      assert(!(c eq a), "persist and cut of one plan are distinct entries")
      assert(SharedCaches.trackedCount == before + 1)
      assert(a.collect().map(_.getLong(0)).sorted.toSeq ==
        c.collect().map(_.getLong(0)).sorted.toSeq)
    }
  }

  test("releaseFamily unpersists exactly its family; releaseAll empties the registry") {
    withCap(8) {
      SharedCaches.releaseAll()
      val a = SharedCaches.shared(range(11), "famA")
      val b = SharedCaches.shared(range(12), "famB")
      SharedCaches.releaseFamily("famA")
      assert(a.storageLevel == StorageLevel.NONE)
      assert(b.storageLevel != StorageLevel.NONE)
      assert(SharedCaches.trackedCount("famA") == 0 && SharedCaches.trackedCount("famB") == 1)
      SharedCaches.releaseAll()
      assert(SharedCaches.trackedCount == 0)
      assert(b.storageLevel == StorageLevel.NONE)
    }
  }

  test("budget and eviction are per session: a small-capped tenant cannot drain another's caches") {
    withCap(8) {
      SharedCaches.releaseAll()
      val mine = SharedCaches.shared(range(41), "famA")
      val tenant = spark.newSession()
      tenant.conf.set("spark.graft.cache.maxEntries", "1")
      // the tenant churns well past ITS cap — only its own entries may
      // cycle; ours must stay persisted and registered
      (50 until 54).foreach(i =>
        SharedCaches.shared(tenant.range(i).toDF("v"), "famB"))
      assert(mine.storageLevel != StorageLevel.NONE,
        "another session's eviction churn must not unpersist our cache")
      assert(SharedCaches.trackedCount("famA") == 1)
      assert(SharedCaches.trackedCount("famB") == 1,
        "the tenant's own cap must still hold for the tenant")
    }
  }

  test("the cache-heavy registry families stay under the default budget end to end") {
    SharedCaches.releaseAll()
    val preexistingRdds = spark.sparkContext.getPersistentRDDs.size
    // every query that acquires shared caches, the way a bench sweep
    // runs them: the dedup family (shingle base, bands, pairs,
    // incremental intermediates), the substring family, the segment
    // families, and the composed pipelines on top
    val cacheHeavy = Seq("dedup_minhash", "dedup_apply", "dedup_inc",
      "dedup_inc_apply", "dedup_banded",
      "substr_spans", "substr_inc", "substr_apply",
      "text_bp", "text_bp_apply", "text_bp_lines",
      "pipeline_curate", "curate_inc")
    cacheHeavy.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
    }
    assert(SharedCaches.trackedCount <= SharedCaches.DefaultMaxEntries,
      s"tracked ${SharedCaches.trackedCount} shared caches — over the " +
        s"${SharedCaches.DefaultMaxEntries} budget; a family is leaking entries")
    // the RDD-level view agrees: materialized cache RDDs born in this
    // sweep stay under the budget too (entries not yet materialized
    // don't appear, which only makes the bound tighter)
    assert(spark.sparkContext.getPersistentRDDs.size - preexistingRdds
      <= SharedCaches.DefaultMaxEntries,
      "persisted-RDD count grew past the shared-cache budget")
    // and the budget actually BOUND something: the sweep exercised
    // several distinct shared plans, not a trivial one or two
    assert(SharedCaches.highWater >= 5, "sweep should have exercised the registry caches")
    SharedCaches.releaseAll()
    assert(SharedCaches.trackedCount == 0)
  }
}
