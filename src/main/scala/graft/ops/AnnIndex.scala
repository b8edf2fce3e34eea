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
  * corpus. Here the assignment (`vec_id, v, nrm, cell, codes`) is
  * written once via [[Bucketed.writeBucketed]] bucketed on `cell`, and
  * each probe issues a literal `cell IN (...)` filter, so the scan
  * reads ONLY the buckets holding the probed cells
  * (`SelectedBucketsCount` in the plan — machine-checked by
  * `AnnIndexSpec`). The `codes` column is the row's SQ8 quantization
  * (~1 bit-packed byte/dim), giving the index BOTH scale dimensions:
  * cell pruning bounds WHICH rows a probe touches, and [[topKSq]]'s
  * code-only candidate scan bounds the BYTES each touched row costs.
  * At 100 TB with thousands of cells and nProbe≪cells, a query touches
  * nProbe/cells of the corpus bytes — at ~1/8 the bytes per row when
  * probing through the codes.
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

  /** The SQ8 scalar-quantization parameters stored BESIDE the
    * quantizer: (dim, mn, mx) — d rows. Like the centroids, the params
    * are part of the index, not a derivable property of the corpus:
    * every stored code was produced with exactly these (mn, mx), and a
    * probe's approximate dot must decode against the SAME affine terms
    * or candidate ranking silently decoheres as the corpus grows past
    * the build (the quantizer-drift argument, applied to the code
    * book). Storing d rows also removes the posexplode min/max corpus
    * job from every serving query. */
  def sqTableFor(dir: String): String = tableFor(dir) + "_sq"

  /** Build the cell-assignment table + its quantizer if this
    * session/warehouse does not have them yet; returns the assignment
    * table name. Idempotent — the "write once" of
    * write-once-probe-many. */
  def ensureBuilt(spark: SparkSession, dir: String): String = synchronized {
    val t = tableFor(dir)
    val qt = quantizerTableFor(dir)
    val sqt = sqTableFor(dir)
    if (!spark.catalog.tableExists(t) || !spark.catalog.tableExists(qt) ||
        !spark.catalog.tableExists(sqt)) {
      // an orphaned location from a previous JVM is stale, not
      // reusable: the in-memory catalog lost its bucketing metadata,
      // so clear and rebuild deterministically — the quantizer and
      // SQ-param locations too (saveAsTable dies on a leftover
      // directory the in-memory catalog no longer knows about), and
      // any stage/old generation a crashed [[requantize]] left behind
      // (recovery contract: a crash mid-swap rebuilds from the source
      // corpus; appended batches re-enter through their producer's
      // ledger, the same source-of-truth rule ChainStore's replay
      // makes)
      Seq(t, qt, sqt).flatMap(x => Seq(x, x + "__stage", x + "__old"))
        .foreach(Bucketed.resetTable(spark, _))
      val emb = Fixtures.embeddings(spark, dir)
      val prep = Similarity.prepared(emb)
      val k = annCellsFor(emb.count())
      val cs = Similarity.sampledCentroids(prep, k)
      // SQ8 codes are the index's physical read path for approximate
      // scoring — quantized ONCE here at write time (the probe side
      // only ever scans the bit-packed code column, ~1 byte/dim,
      // instead of the 8-byte doubles of `v`)
      val (mns, mxs) = Similarity.sqParamsOf(prep, Dim)
      val assigned = Similarity.assignCells(prep, cs)
        .select(col("vec_id"), col("v"), col("nrm"), col("cell"),
          Similarity.sqCodesCol(col("v"), mns, mxs).as("codes"))
      Bucketed.writeBucketed(assigned, t, "cell", nBuckets = k)
      import spark.implicits._
      cs.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cell", "centroid")
        .write.mode("overwrite").saveAsTable(qt)
      mns.indices.map(i => (i, mns(i), mxs(i)))
        .toDF("dim", "mn", "mx")
        .write.mode("overwrite").saveAsTable(sqt)
    }
    t
  }

  /** The stored quantizer read back as the centroid matrix (k·dim —
    * bounded, same contract as the build-time collect). */
  def storedQuantizer(spark: SparkSession, dir: String): Array[Array[Double]] =
    spark.table(quantizerTableFor(dir))
      .select(col("cell"), col("centroid")).orderBy(col("cell")).collect()
      .map(_.getSeq[Double](1).toArray)

  /** The stored SQ8 params read back as the (mns, mxs) pair (2·d
    * doubles — bounded, same contract as the quantizer collect). */
  def storedSqParams(spark: SparkSession, dir: String): (Array[Double], Array[Double]) = {
    val rows = spark.table(sqTableFor(dir))
      .select(col("dim"), col("mn"), col("mx")).orderBy(col("dim")).collect()
    (rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

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
    // codes are encoded with the STORED params — the exact affine
    // terms every existing code row used, the same coherence rule as
    // the centroids (drifted mins/maxs are a quality decay cleared by
    // [[requantize]], never a correctness one: a batch value outside
    // the stored range clamps to 0/255 and the exact rerank still
    // scores it full-precision)
    val (mns, mxs) = storedSqParams(spark, dir)
    val assigned = Similarity.assignCells(Similarity.prepared(fresh), cs)
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"),
        Similarity.sqCodesCol(col("v"), mns, mxs).as("codes"))
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
    val sqt = sqTableFor(dir)
    val live = spark.table(t).select(col("vec_id"), col("v"), col("nrm"))
    val n = live.count()
    require(n > 0, s"cannot requantize an empty index ($t)")
    val k = annCellsFor(n)
    val cs = Similarity.sampledCentroids(live, k)
    // SQ params refresh with the quantizer: drifted mins/maxs are the
    // same decay class as drifted centroids (appended values outside
    // the stored range clamp, widening the range restores code
    // resolution), and the rebuild re-encodes every row so the whole
    // generation shares one code book
    val (mns, mxs) = Similarity.sqParamsOf(live, Dim)
    // stage the new generation beside the live one
    val tStage = t + "__stage"
    val qtStage = qt + "__stage"
    val sqtStage = sqt + "__stage"
    Seq(tStage, qtStage, sqtStage).foreach(Bucketed.resetTable(spark, _))
    Bucketed.writeBucketed(
      Similarity.assignCells(live, cs)
        .select(col("vec_id"), col("v"), col("nrm"), col("cell"),
          Similarity.sqCodesCol(col("v"), mns, mxs).as("codes")),
      tStage, "cell", nBuckets = k)
    import spark.implicits._
    cs.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .write.mode("overwrite").saveAsTable(qtStage)
    mns.indices.map(i => (i, mns(i), mxs(i)))
      .toDF("dim", "mn", "mx")
      .write.mode("overwrite").saveAsTable(sqtStage)
    // commit: rename the live generation aside, promote the stage —
    // each rename is one atomic catalog+dir move, and the ASSIGNMENT
    // table is renamed aside FIRST and promoted LAST so any crash
    // inside the window leaves it absent (ensureBuilt's rebuild
    // trigger), never a mixed new-assignment/old-quantizer(-params)
    // combination (see scaladoc)
    val tOld = t + "__old"
    val qtOld = qt + "__old"
    val sqtOld = sqt + "__old"
    Seq(tOld, qtOld, sqtOld).foreach(Bucketed.resetTable(spark, _))
    spark.sql(s"ALTER TABLE $t RENAME TO $tOld")
    spark.sql(s"ALTER TABLE $qt RENAME TO $qtOld")
    spark.sql(s"ALTER TABLE $sqt RENAME TO $sqtOld")
    spark.sql(s"ALTER TABLE $sqtStage RENAME TO $sqt")
    spark.sql(s"ALTER TABLE $qtStage RENAME TO $qt")
    spark.sql(s"ALTER TABLE $tStage RENAME TO $t")
    Seq(tOld, qtOld, sqtOld).foreach(Bucketed.resetTable(spark, _))
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
    val (probesDf, cells) = probeFrame(spark, dir, maxQueryId, nProbe)
    val index = spark.table(t).filter(col("cell").isin(cells.map(Int.box): _*))
    Similarity.probeIndex(index, probesDf, k)
  }

  /** The driver-side probe computation shared by [[topK]] and
    * [[topKSq]]: each query's `nProbe` nearest cells against the
    * STORED quantizer, returned as a (cell, q_id, qv, qn) frame plus
    * the distinct cell-id literal list that buys bucket pruning.
    *
    * Driver-sized by construction: maxQueryId vectors in,
    * maxQueryId × nProbe probe rows out. Same −2·v·c + |c|² scores and
    * (score, cell) tie-break as assignCells/the oracle, in plain Scala
    * doubles (sequential sums — the bit-identical order both engines
    * use). */
  private def probeFrame(spark: SparkSession, dir: String, maxQueryId: Long,
                         nProbe: Int,
                         quantizer: Option[Array[Array[Double]]] = None): (DataFrame, Array[Int]) = {
    val prep = Similarity.prepared(Fixtures.embeddings(spark, dir))
    val cs: Array[Array[Double]] = quantizer.getOrElse(storedQuantizer(spark, dir))
    val c2 = cs.map(_.foldLeft(0.0)((s, x) => s + x * x))
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
    (probes.toSeq.toDF("cell", "q_id", "qv", "qn"),
      probes.map(_._1).distinct.sorted)
  }

  /** IVF × SQ8 probe over the persisted index — the stored form of
    * [[Similarity.topKIvfSq]] and the index's production read path:
    * the candidate pass scans ONLY the probed cells' buckets
    * (bucket-pruned literal IN filter) and ONLY the code column
    * (parquet column pruning: ~1 bit-packed byte/dim instead of the
    * 8-byte doubles of `v`), ranks by the decomposed approximate
    * cosine, and the exact rerank joins the `rerank` survivors per
    * query back to full vectors — still inside the probed buckets, so
    * both scans prune. All quantization artifacts (centroids, SQ
    * params, codes) are READ, not derived: a probe costs zero
    * corpus-wide jobs, the write-once/probe-many claim extended to the
    * byte-bounded read path.
    *
    * Identical results to the inline [[Similarity.topKIvfSq]] over the
    * same corpus by construction (same stored-vs-derived coherence
    * argument as [[topK]] vs the inline IVF) — `AnnIndexSpec` pins it,
    * and the `topk_indexed_sq` registry entry hash-checks the whole
    * stored stack against the inline oracle SQL. */
  // ---- the persisted TWO-LEVEL index (billion-vector tier) ---------

  /** One two-level index per source directory, beside (not replacing)
    * the flat index: the flat layout is the right answer while
    * k = ⌈√n⌉ centroids fit a driver collect and a plan literal; this
    * one is for the tier past that knee (k ~ 10⁶ at a billion
    * vectors), where ONLY the ~n^¼ coarse quantizer is ever collected
    * (178 rows at 10⁹) and the fine quantizer stays a TABLE probed by
    * coarse-cell literals — nothing k-sized touches the driver or the
    * plan at any corpus size. */
  def table2For(dir: String): String =
    "ann2_" + graft.evm.EvmDerive.md5hex(dir).take(8)
  def coarseQuantizerTableFor(dir: String): String = table2For(dir) + "_qc"
  def fineQuantizerTableFor(dir: String): String = table2For(dir) + "_qf"

  /** Build the two-level index if absent: assignment
    * (vec_id, ccell, v, nrm, fcell) bucketed on the COARSE cell (kc
    * buckets — the probe's pruning key), the n^¼-row coarse quantizer,
    * and the (ccell, fcell, fv, f2) fine-quantizer relation stored as
    * a table (≈ Σ⌈√occ⌉ rows — data, never a literal). Same
    * write-once idempotence and orphan-sweep recovery contract as
    * [[ensureBuilt]]. */
  def ensureBuilt2(spark: SparkSession, dir: String): String = synchronized {
    val t = table2For(dir)
    val qc = coarseQuantizerTableFor(dir)
    val qf = fineQuantizerTableFor(dir)
    if (!spark.catalog.tableExists(t) || !spark.catalog.tableExists(qc) ||
        !spark.catalog.tableExists(qf)) {
      Seq(t, qc, qf).flatMap(x => Seq(x, x + "__stage", x + "__old"))
        .foreach(Bucketed.resetTable(spark, _))
      val emb = Fixtures.embeddings(spark, dir)
      val prep = Similarity.prepared(emb)
      writeGeneration2(spark, prep, emb.count(), t, qc, qf)
    }
    t
  }

  /** Stage one full two-level generation into the three named tables
    * — shared by the build (straight into the live names) and
    * [[requantize2]] (into the `__stage` names). */
  private def writeGeneration2(spark: SparkSession, prep: DataFrame, n: Long,
                               t: String, qc: String, qf: String): Unit = {
    val (coarse, fine, asg) = Similarity.ivf2StructureOf(prep, n)
    Bucketed.writeBucketed(
      asg.select(col("vec_id"), col("v"), col("nrm"), col("ccell"), col("fcell")),
      t, "ccell", nBuckets = coarse.length)
    import spark.implicits._
    coarse.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("ccell", "centroid")
      .write.mode("overwrite").saveAsTable(qc)
    fine.write.mode("overwrite").saveAsTable(qf)
  }

  /** The stored coarse quantizer (~n^¼ · dim doubles — the ONLY
    * quantizer collect this index ever performs). */
  def storedCoarseQuantizer(spark: SparkSession, dir: String): Array[Array[Double]] =
    spark.table(coarseQuantizerTableFor(dir))
      .select(col("ccell"), col("centroid")).orderBy(col("ccell")).collect()
      .map(_.getSeq[Double](1).toArray)

  /** Append a fresh batch against BOTH stored quantizers — coarse
    * assignment from the collected n^¼ matrix, fine assignment via a
    * broadcast join against the stored fine relation with the same
    * map-side `min_by` argmin the build uses. O(batch); probe
    * coherence by construction, exactly [[appendBatch]]'s contract one
    * level down. */
  def appendBatch2(spark: SparkSession, dir: String, fresh: DataFrame): Unit = synchronized {
    val t = ensureBuilt2(spark, dir)
    val coarse = storedCoarseQuantizer(spark, dir)
    val fine = spark.table(fineQuantizerTableFor(dir))
    val casg = Similarity.assignCells(Similarity.prepared(fresh), coarse)
      .withColumnRenamed("cell", "ccell")
    val assigned = casg.join(broadcast(fine), Seq("ccell"))
      .withColumn("s",
        lit(-2.0) * Similarity.dot(col("v"), col("fv")) + col("f2"))
      .groupBy(col("vec_id")).agg(
        first(col("ccell")).as("ccell"),
        first(col("v")).as("v"), first(col("nrm")).as("nrm"),
        min_by(col("fcell"), struct(col("s"), col("fcell"))).as("fcell"))
    assigned.select(col("vec_id"), col("v"), col("nrm"), col("ccell"), col("fcell"))
      .write.mode("append").format("parquet")
      .bucketBy(coarse.length, "ccell").sortBy("ccell")
      .saveAsTable(t)
  }

  /** Re-fit BOTH quantizer levels over the live corpus and swap the
    * generation in — [[requantize]]'s commit protocol verbatim (stage
    * beside live, assignment renamed aside FIRST and promoted LAST so
    * every crash point leaves it absent for [[ensureBuilt2]]'s sweep).
    * Same triggers as the flat index ([[requantizeAdvice]]'s knee/skew
    * classes — here the knee is the COARSE count n^¼ outgrowing the
    * build and fine cells re-size per cell automatically). */
  def requantize2(spark: SparkSession, dir: String): Unit = synchronized {
    val t = ensureBuilt2(spark, dir)
    val qc = coarseQuantizerTableFor(dir)
    val qf = fineQuantizerTableFor(dir)
    val live = spark.table(t).select(col("vec_id"), col("v"), col("nrm"))
    val n = live.count()
    require(n > 0, s"cannot requantize an empty index ($t)")
    Seq(t, qc, qf).foreach(x => Bucketed.resetTable(spark, x + "__stage"))
    writeGeneration2(spark, live, n, t + "__stage", qc + "__stage", qf + "__stage")
    Seq(t, qc, qf).foreach(x => Bucketed.resetTable(spark, x + "__old"))
    spark.sql(s"ALTER TABLE $t RENAME TO ${t}__old")
    spark.sql(s"ALTER TABLE $qc RENAME TO ${qc}__old")
    spark.sql(s"ALTER TABLE $qf RENAME TO ${qf}__old")
    spark.sql(s"ALTER TABLE ${qf}__stage RENAME TO $qf")
    spark.sql(s"ALTER TABLE ${qc}__stage RENAME TO $qc")
    spark.sql(s"ALTER TABLE ${t}__stage RENAME TO $t")
    Seq(t, qc, qf).foreach(x => Bucketed.resetTable(spark, x + "__old"))
  }

  /** Top-k probe over the persisted two-level index: coarse probe
    * cells computed driver-side against the STORED n^¼ quantizer
    * (literal list → bucket pruning on the ccell-bucketed assignment
    * AND the fine-quantizer scan), then the shared
    * [[Similarity.probeIvf2From]] rank+join half — identical results
    * to the inline [[Similarity.topKIvf2]] by construction, and zero
    * corpus-wide jobs at serving time. */
  def topK2(spark: SparkSession, dir: String, maxQueryId: Long,
            k: Int = 5, nProbeCoarse: Int = 2, nProbeFine: Int = 3): DataFrame = {
    val t = ensureBuilt2(spark, dir)
    val coarse = storedCoarseQuantizer(spark, dir)
    val (qcFrame, cells) =
      probeFrame(spark, dir, maxQueryId, nProbeCoarse, quantizer = Some(coarse))
    val cellLits = cells.map(Int.box)
    val fine = spark.table(fineQuantizerTableFor(dir))
      .filter(col("ccell").isin(cellLits: _*))
    val asg = spark.table(t).filter(col("ccell").isin(cellLits: _*))
    Similarity.probeIvf2From(qcFrame.withColumnRenamed("cell", "ccell"),
      fine, asg, k, nProbeFine)
  }

  def topKSq(spark: SparkSession, dir: String, maxQueryId: Long,
             k: Int = 5, nProbe: Int = 2, rerank: Int = 15): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = ensureBuilt(spark, dir)
    val (probesDf, cells) = probeFrame(spark, dir, maxQueryId, nProbe)
    val (mns, mxs) = storedSqParams(spark, dir)
    val (steps, basis) = Similarity.sqTerms(mns, mxs)
    val stepL = array(steps.map(lit): _*)
    val basisL = array(basis.map(lit): _*)
    val probes = probesDf
      .withColumn("qbasis", Similarity.dot(col("qv"), basisL))
      .withColumn("t", zip_with(col("qv"), stepL, (a, b) => a * b))
    val idx = spark.table(t).filter(col("cell").isin(cells.map(Int.box): _*))
    val wA = Window.partitionBy(col("q_id"))
      .orderBy(col("approx").desc, col("vec_id").asc)
    val cands = idx.select(col("vec_id"), col("nrm"), col("cell"), col("codes"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("approx",
        (col("qbasis") + Similarity.dot(col("t"), col("codes").cast("array<double>"))) /
          (col("nrm") * col("qn")))
      .withColumn("crn", row_number().over(wA))
      .filter(col("crn") <= rerank)
      .select(col("q_id"), col("vec_id"), col("qv"), col("qn"))
    val wF = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    idx.select(col("vec_id"), col("v"), col("nrm"))
      .join(broadcast(cands), Seq("vec_id"))
      .withColumn("score",
        round(Similarity.cosine(col("v"), col("nrm"), col("qv"), col("qn")), 4))
      .withColumn("rn", row_number().over(wF))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("rn"), col("vec_id"), col("score"))
  }
}
