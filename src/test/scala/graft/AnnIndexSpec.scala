package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{AnnIndex, Similarity}
import graft.tables.{Bucketed, Fixtures}

/** Pins the persisted-ANN-index claims in [[graft.ops.AnnIndex]]:
  * the probe result is identical to the inline IVF pipeline, and the
  * index scan is bucket-pruned — only the probed cells' buckets are
  * read, which is the property that makes the serving shape
  * O(nProbe/cells) of the corpus at scale.
  */
class AnnIndexSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("probe over the persisted index == inline IVF probe (same centroids)") {
    Bucketed.resetTable(spark, AnnIndex.tableFor(sf))
    val indexed = AnnIndex.topK(spark, sf, maxQueryId = 8, k = 5, nProbe = 2)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val inline = Similarity.topKIvfKmeans(Fixtures.embeddings(spark, sf),
        maxQueryId = 8, k = 5, nCells = 8, nProbe = 2,
        centroids = Some(Similarity.fixedCentroids(8, 64)))
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(indexed.nonEmpty && indexed == inline,
      "persisting the assignment must be a pure physical optimization")
  }

  test("the index scan reads only the probed buckets (SelectedBucketsCount)") {
    AnnIndex.ensureBuilt(spark, sf)
    // two queries probe at most 4 of the 8 cells — pruning must show
    val plan = AnnIndex.topK(spark, sf, maxQueryId = 2, k = 5, nProbe = 2)
      .queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"expected a bucket-pruned scan:\n$plan")
    val (selected, total) = (m.get.group(1).toInt, m.get.group(2).toInt)
    assert(total == AnnIndex.NCells && selected <= 4,
      s"expected <=4 of $total buckets read, got $selected")
  }

  test("build is write-once: a second ensureBuilt reuses the table") {
    val t = AnnIndex.ensureBuilt(spark, sf)
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, t)
    val before = loc.listFiles().map(f => f.getName -> f.lastModified()).toMap
    assert(AnnIndex.ensureBuilt(spark, sf) == t)
    val after = loc.listFiles().map(f => f.getName -> f.lastModified()).toMap
    assert(after == before, "second ensureBuilt must not rewrite the table")
  }
}
