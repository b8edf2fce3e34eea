package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.{Bucketed, Fixtures}

/** Persisted ANN index: the IVF cell assignment written ONCE as a
  * bucketed table, probed many times — the production serving shape
  * for approximate-nearest-neighbor at scale.
  *
  * [[Similarity.topKIvfKmeans]] recomputes the corpus→cell assignment
  * inside every query; that is fine for a one-shot batch job but wrong
  * for a serving system answering many top-k queries against the same
  * corpus. Here the assignment (`vec_id, v, nrm, cell`) is written once
  * via [[Bucketed.writeBucketed]] bucketed on `cell`, and each probe
  * issues a literal `cell IN (...)` filter, so the scan reads ONLY the
  * buckets holding the probed cells (`SelectedBucketsCount` in the
  * plan — machine-checked by `AnnIndexSpec`). At 100 TB with thousands
  * of cells and nProbe≪cells, a query touches nProbe/cells of the
  * corpus bytes; everything else is never read.
  *
  * The probe-cell computation collects the query vectors to the driver
  * first — deliberately: queries are few (a serving request), the
  * collect is O(queries·dim) like the centroid collects in
  * [[Similarity.kmeansCentroids]], and only a driver-side literal cell
  * list lets the scan prune buckets at plan time.
  */
object AnnIndex {

  val NCells = 8
  val Dim = 64

  /** One index table per source directory (sf0.01 and sf0.1 runs in
    * the same warehouse must never read each other's index). */
  def tableFor(dir: String): String =
    "ann_cells_" + graft.evm.EvmDerive.md5hex(dir).take(8)

  /** Build the cell-assignment table if this session/warehouse does
    * not have it yet; returns the table name. Idempotent — the
    * "write once" of write-once-probe-many. */
  def ensureBuilt(spark: SparkSession, dir: String): String = synchronized {
    val t = tableFor(dir)
    if (!spark.catalog.tableExists(t)) {
      // an orphaned location from a previous JVM is stale, not
      // reusable: the in-memory catalog lost its bucketing metadata,
      // so clear and rebuild deterministically
      Bucketed.resetTable(spark, t)
      val cs = Similarity.fixedCentroids(NCells, Dim)
      val assigned = Similarity
        .assignCells(Similarity.prepared(Fixtures.embeddings(spark, dir)), cs)
        .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
      Bucketed.writeBucketed(assigned, t, "cell", nBuckets = NCells)
    }
    t
  }

  /** Top-k probe over the persisted index: compute each query's
    * `nProbe` nearest cells driver-side, scan only those buckets
    * (literal IN filter → bucket pruning), rank by exact cosine. */
  def topK(spark: SparkSession, dir: String, maxQueryId: Long,
           k: Int = 5, nProbe: Int = 2): DataFrame = {
    val t = ensureBuilt(spark, dir)
    val cs = Similarity.fixedCentroids(NCells, Dim)
    val queries = Similarity.prepared(Fixtures.embeddings(spark, dir))
      .filter(col("vec_id") < maxQueryId)
    val probes = Similarity.probeQueries(queries, cs, nProbe)
    // driver-sized: maxQueryId × nProbe ints — the literal list that
    // buys bucket pruning on the index scan
    val cells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val index = spark.table(t).filter(col("cell").isin(cells.map(Int.box): _*))
    Similarity.probeIndex(index, probes, k)
  }
}
