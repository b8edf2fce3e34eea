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
  * Two sizing decisions are corpus-tracked, not constants — the same
  * fixed-k / off-data-centroid anti-patterns the scale tiers caught on
  * SemDeDup (SCALING.md, beyond-the-knee section) apply to IVF:
  *
  *  - **Cell count** = [[annCellsFor]] ≈ ⌈√n⌉ (classic IVF-flat
  *    sizing): a probe reads nProbe·n/k vectors and selecting probe
  *    cells costs k score computations, so k ~ √n balances the two and
  *    both grow as √n instead of one of them growing as n.
  *  - **Centroids** = [[Similarity.sampledCentroids]]: data-sampled
  *    cells stay occupancy-balanced as the corpus grows, which for a
  *    serving index is a TAIL-LATENCY property — with the fixed
  *    off-data matrix the measured hottest cell holds ~9% of the
  *    corpus at every n, so any query probing it reads 9% of the
  *    corpus instead of 1/k.
  *
  * The probe-cell computation runs driver-side over the collected
  * query vectors — deliberately: queries are few (a serving request),
  * the collect is O(queries·dim) like the centroid collects in
  * [[Similarity.kmeansCentroids]], and only a driver-side literal cell
  * list lets the scan prune buckets at plan time. (It also sidesteps
  * the inlined-literal probe expression, which stops being
  * JIT-compilable at corpus-scaled k — the same generated-code limit
  * `nearest_cell` exists for.) The score arithmetic and (score, cell)
  * tie-break are identical to the cluster-side assignment and to the
  * DuckDB oracle's ROW_NUMBER form, so the registry entry stays
  * hash-differential.
  */
/** [[AnnIndex.requantizeAdvice]]'s measurement: corpus size, cell
  * count, hottest-cell and mean occupancy, and the two documented
  * triggers. `needed` = either trigger fired. */
final case class RequantizeAdvice(nVectors: Long, nCells: Int, occMax: Long,
                                  occMean: Long, knee: Boolean, skewed: Boolean) {
  def needed: Boolean = knee || skewed
}

object AnnIndex {

  val Dim = 64

  /** Corpus-tracked IVF cell count: the smallest k with k² ≥ n
    * (⌈√n⌉), found by integer-exact search so the DuckDB oracle can
    * run the same loop with no floating sqrt whose rounding could
    * diverge between engines. Capped at 65535 (n > ~4.3B vectors);
    * past the cap the standard two-level quantizer applies (see
    * [[Similarity.sampledCentroids]]). */
  def annCellsFor(n: Long): Int =
    (1 until 65536).find(x => x.toLong * x >= n).getOrElse(65535)

  /** One index table per source directory (sf0.01 and sf0.1 runs in
    * the same warehouse must never read each other's index). */
  def tableFor(dir: String): String =
    "ann_cells_" + graft.evm.EvmDerive.md5hex(dir).take(8)

  /** The quantizer stored BESIDE the assignment table: (cell,
    * centroid) — k rows. The quantizer is part of the index, not a
    * derivable property of the corpus: a probe must score against the
    * exact centroids that assigned the cells, and re-deriving them
    * from the LIVE corpus silently decoheres the moment the corpus
    * grows past the build (count → different k → different sample →
    * probes scan the wrong buckets with no error). Storing k rows also
    * removes two full-corpus jobs (count + md5-ranked sample) from
    * every serving query — the write-once/probe-many claim made real. */
  def quantizerTableFor(dir: String): String = tableFor(dir) + "_q"

  /** Build the cell-assignment table + its quantizer if this
    * session/warehouse does not have them yet; returns the assignment
    * table name. Idempotent — the "write once" of
    * write-once-probe-many. */
  def ensureBuilt(spark: SparkSession, dir: String): String = synchronized {
    val t = tableFor(dir)
    val qt = quantizerTableFor(dir)
    if (!spark.catalog.tableExists(t) || !spark.catalog.tableExists(qt)) {
      // an orphaned location from a previous JVM is stale, not
      // reusable: the in-memory catalog lost its bucketing metadata,
      // so clear and rebuild deterministically — the quantizer
      // location too (saveAsTable dies on a leftover directory the
      // in-memory catalog no longer knows about), and any stage/old
      // generation a crashed [[requantize]] left behind (recovery
      // contract: a crash mid-swap rebuilds from the source corpus;
      // appended batches re-enter through their producer's ledger,
      // the same source-of-truth rule ChainStore's replay makes)
      Seq(t, qt, t + "__stage", qt + "__stage", t + "__old", qt + "__old")
        .foreach(Bucketed.resetTable(spark, _))
      val emb = Fixtures.embeddings(spark, dir)
      val prep = Similarity.prepared(emb)
      val k = annCellsFor(emb.count())
      val cs = Similarity.sampledCentroids(prep, k)
      val assigned = Similarity.assignCells(prep, cs)
        .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
      Bucketed.writeBucketed(assigned, t, "cell", nBuckets = k)
      import spark.implicits._
      cs.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cell", "centroid")
        .write.mode("overwrite").saveAsTable(qt)
    }
    t
  }

  /** The stored quantizer read back as the centroid matrix (k·dim —
    * bounded, same contract as the build-time collect). */
  def storedQuantizer(spark: SparkSession, dir: String): Array[Array[Double]] =
    spark.table(quantizerTableFor(dir))
      .select(col("cell"), col("centroid")).orderBy(col("cell")).collect()
      .map(_.getSeq[Double](1).toArray)

  /** MAINTENANCE half of write-once/probe-many: append a fresh vector
    * batch to the existing index WITHOUT a rebuild. The batch is
    * assigned against the STORED quantizer — the exact centroids every
    * existing row was assigned with, so probe coherence is preserved
    * by construction — and appended into the bucketed table with the
    * build's bucket count (= quantizer rows, the build invariant), so
    * bucket pruning keeps working: each append adds one file per
    * touched bucket and a probe still reads only its cells' files.
    * Cost is O(batch): one batch-sized assignment + write, no corpus
    * scan. Caller contract: `fresh` carries embeddings-schema rows
    * with vec_ids not already in the index (the ingest layer's
    * idempotent-insert anti-join is the place to enforce that, as in
    * [[graft.ingest.Ingest]]).
    *
    * Appends intentionally do NOT touch the quantizer: cell sizing
    * (⌈√n⌉) and centroid placement decay as the corpus grows, which is
    * a QUALITY decay (hotter cells → bigger probe reads), never a
    * correctness one. [[requantizeAdvice]] is the trigger for when to
    * pay the full rebuild; [[requantize]] executes it.
    *
    * Synchronized on the mutator lock (O(batch) work, so holding it is
    * cheap): an append racing [[requantize]] would otherwise land in
    * the generation snapshotted BEFORE the batch and be silently
    * dropped when the old generation is — serializing mutators makes
    * every append either fully inside the rebuilt corpus or fully
    * after it. */
  def appendBatch(spark: SparkSession, dir: String, fresh: DataFrame): Unit = synchronized {
    val t = ensureBuilt(spark, dir)
    val cs = storedQuantizer(spark, dir)
    val assigned = Similarity.assignCells(Similarity.prepared(fresh), cs)
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    assigned.write.mode("append").format("parquet")
      .bucketBy(cs.length, "cell").sortBy("cell")
      .saveAsTable(t)
  }

  /** When to pay the re-quantize ([[requantize]]): advice, not
    * automation — the rebuild is a corpus-wide job the operator
    * schedules.
    *
    * Trigger (a) — KNEE: the corpus has outgrown the cell count.
    * ⌈√n⌉ sizing balances probe reads (n/k) against probe-cell
    * selection (k); once annCellsFor(n) > 2·k the corpus is ≥ ~4× the
    * build size and every probe reads ≥ ~2× the bytes an optimally
    * sized index would.
    * Trigger (b) — SKEW: the hottest cell holds > `skewBound`× the
    * mean occupancy. Sampled centroids keep cells balanced for the
    * corpus they were sampled FROM (SCALING.md's occ_max
    * measurements); a drifted append distribution concentrates in few
    * cells, and a probe of a hot cell reads skew× the expected bytes
    * — the exact tail-latency pathology the sampled quantizer exists
    * to prevent. One map-side-combined groupBy(cell) over the index
    * measures it. */
  def requantizeAdvice(spark: SparkSession, dir: String,
                       skewBound: Long = 8L): RequantizeAdvice = {
    val t = ensureBuilt(spark, dir)
    val k = storedQuantizer(spark, dir).length
    val occ = spark.table(t).groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n")).as("total"), max(col("n")).as("occMax")).collect()(0)
    val n = occ.getAs[Long]("total")
    val occMax = occ.getAs[Long]("occMax")
    val occMean = math.max(1L, n / k)
    RequantizeAdvice(n, k, occMax, occMean,
      knee = annCellsFor(n) > 2 * k,
      skewed = occMax > skewBound * occMean)
  }

  /** Execute the rebuild [[requantizeAdvice]] recommends: re-fit the
    * quantizer over the CURRENT corpus (build rows ∪ every appended
    * batch — the live assignment table is the one place they all
    * exist), reassign everything, and swap the new generation in.
    *
    * Sizing and sampling are exactly [[ensureBuilt]]'s — k =
    * [[annCellsFor]](n) over the grown n, centroids =
    * [[Similarity.sampledCentroids]] over the grown corpus — so a
    * probe after the rebuild is bit-identical to an inline IVF
    * pipeline built fresh from the combined corpus (`AnnIndexSpec`'s
    * requantize-cycle test pins exactly this, and the
    * `topk_requantized` registry entry hash-checks the rebuilt index
    * against the oracle's inline IVF SQL): the index stays a pure
    * physical optimization across its whole build → append →
    * requantize lifecycle.
    *
    * Commit protocol = temp-write-then-swap at table granularity (the
    * [[graft.ingest.ChainStore]] `swapBucket` pattern): the new
    * generation is fully written BESIDE the live pair (readers keep
    * serving the old index during the corpus-wide reassignment — no
    * downtime window the length of a rebuild), then swapped in via
    * catalog renames. Rename ORDER is load-bearing: the live
    * assignment table is renamed aside FIRST and the staged one
    * promoted LAST, so every crash point inside the window leaves the
    * assignment table ABSENT — which is exactly the state
    * [[ensureBuilt]]'s orphan sweep detects and heals (rebuild from
    * the source corpus; append producers replay from their ledger —
    * documented there). Promoting the assignment table before the
    * quantizer swap would open a silent-wrong-buckets window (both
    * tables present but from different generations, so no sweep
    * triggers and probes scan wrong cells with no error); this
    * ordering makes that state unreachable. Mutators ([[appendBatch]],
    * this method) serialize on this object's lock, the same
    * single-maintainer contract as the store's write lock — an append
    * can therefore never land in the old generation mid-swap and be
    * dropped with it. Probes call [[ensureBuilt]] (same lock), so an
    * in-JVM probe issued during the swap blocks until commit; a probe
    * that planned BEFORE the swap can still see a mixed view — run
    * requantize in the maintenance window, like any index rebuild.
    *
    * Clears the KNEE trigger by construction and the SKEW trigger
    * whenever skew came from quantizer drift (appends the old sample
    * never saw). A literal point-mass — thousands of identical
    * vectors — cannot be split by ANY quantizer; the advice keeps
    * flagging it, correctly: that cell IS hot, and the fix is
    * upstream dedup, not a rebuild.
    *
    * Returns the post-rebuild advice so the caller sees the cleared
    * (or legitimately persisting) triggers. */
  def requantize(spark: SparkSession, dir: String,
                 skewBound: Long = 8L): RequantizeAdvice = synchronized {
    val t = ensureBuilt(spark, dir)
    val qt = quantizerTableFor(dir)
    val live = spark.table(t).select(col("vec_id"), col("v"), col("nrm"))
    val n = live.count()
    require(n > 0, s"cannot requantize an empty index ($t)")
    val k = annCellsFor(n)
    val cs = Similarity.sampledCentroids(live, k)
    // stage the new generation beside the live one
    val tStage = t + "__stage"
    val qtStage = qt + "__stage"
    Bucketed.resetTable(spark, tStage)
    Bucketed.resetTable(spark, qtStage)
    Bucketed.writeBucketed(
      Similarity.assignCells(live, cs)
        .select(col("vec_id"), col("v"), col("nrm"), col("cell")),
      tStage, "cell", nBuckets = k)
    import spark.implicits._
    cs.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .write.mode("overwrite").saveAsTable(qtStage)
    // commit: rename the live pair aside, promote the stage — each
    // rename is one atomic catalog+dir move, and the ASSIGNMENT table
    // is promoted LAST so any crash inside the window leaves it
    // absent (ensureBuilt's rebuild trigger), never a mixed
    // new-assignment/old-quantizer pair (see scaladoc)
    val tOld = t + "__old"
    val qtOld = qt + "__old"
    Bucketed.resetTable(spark, tOld)
    Bucketed.resetTable(spark, qtOld)
    spark.sql(s"ALTER TABLE $t RENAME TO $tOld")
    spark.sql(s"ALTER TABLE $qt RENAME TO $qtOld")
    spark.sql(s"ALTER TABLE $qtStage RENAME TO $qt")
    spark.sql(s"ALTER TABLE $tStage RENAME TO $t")
    Bucketed.resetTable(spark, tOld)
    Bucketed.resetTable(spark, qtOld)
    requantizeAdvice(spark, dir, skewBound)
  }

  /** Top-k probe over the persisted index: compute each query's
    * `nProbe` nearest cells driver-side against the STORED quantizer
    * (k rows — no corpus-wide job at serving time), scan only those
    * buckets (literal IN filter → bucket pruning), rank by exact
    * cosine. */
  def topK(spark: SparkSession, dir: String, maxQueryId: Long,
           k: Int = 5, nProbe: Int = 2): DataFrame = {
    val t = ensureBuilt(spark, dir)
    val prep = Similarity.prepared(Fixtures.embeddings(spark, dir))
    val cs: Array[Array[Double]] = storedQuantizer(spark, dir)
    val c2 = cs.map(_.foldLeft(0.0)((s, x) => s + x * x))
    // driver-sized: maxQueryId vectors in, maxQueryId × nProbe probe
    // rows out — the literal cell list that buys bucket pruning on
    // the index scan. Same −2·v·c + |c|² scores and (score, cell)
    // tie-break as assignCells/the oracle, in plain Scala doubles
    // (sequential sums — the bit-identical order both engines use).
    val probes = prep.filter(col("vec_id") < maxQueryId)
      .select(col("vec_id"), col("v"), col("nrm")).collect()
      .flatMap { r =>
        val id = r.getLong(0)
        val v = r.getSeq[Double](1).toArray
        val nrm = r.getDouble(2)
        val scored = cs.indices.map { c =>
          val ctr = cs(c)
          var dot = 0.0
          var i = 0
          val n = math.min(ctr.length, v.length)
          while (i < n) { dot += ctr(i) * v(i); i += 1 }
          (-2.0 * dot + c2(c), c)
        }
        scored.sorted.take(nProbe).map { case (_, c) => (c, id, v.toSeq, nrm) }
      }
    import spark.implicits._
    val probesDf = probes.toSeq.toDF("cell", "q_id", "qv", "qn")
    val cells = probes.map(_._1).distinct.sorted
    val index = spark.table(t).filter(col("cell").isin(cells.map(Int.box): _*))
    Similarity.probeIndex(index, probesDf, k)
  }
}
