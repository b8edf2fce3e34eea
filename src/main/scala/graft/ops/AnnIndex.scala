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
  * Probe-cell selection runs IN-PLAN ([[Similarity.probeQueries]]
  * against the stored quantizer): query vectors are scored against the
  * k centroids on executors, never collected — only the DISTINCT
  * probed cell ids (≤ queries · nProbe ints) come back to the driver,
  * because only a driver-side literal cell list lets the scan prune
  * buckets at plan time. At a batch-serving load (10⁵ queries ×
  * √(10⁹) cells × d dims) the scoring is the expensive half of a probe
  * and it stays distributed; the literal stays O(queries · nProbe)
  * regardless of corpus size. The quantizer itself (k·d doubles) is
  * collected once per probe — the same bounded contract as
  * [[Similarity.kmeansCentroids]] — and rides the plan as one
  * referenced constant ([[graft.functions.NearestCellF64]]'s
  * JIT-safety argument).
  *
  * DELETE / RETIRE ([[removeBatch]]): a curation pipeline's whole
  * output is retired documents, so the serving index must drop
  * vectors WITHOUT the full rebuild. Deletions are TOMBSTONES — a
  * (vec_id, cell) table stored beside the index, bucketed on `cell`
  * with the assignment's bucket count so a probe's tombstone scan
  * prunes to the probed cells exactly like the index scan. Probes
  * anti-join the (pruned, bounded) tombstone set; [[requantize]]
  * compacts tombstoned rows away and resets the table; and
  * [[requantizeAdvice]] gains a dead-fraction trigger so tombstones
  * never accumulate past a bounded share of the index. Removing an id
  * never rewrites an index bucket — the write-once layout and every
  * probe's bucket pruning survive deletion untouched.
  */
/** [[AnnIndex.requantizeAdvice]]'s measurement: corpus size, cell
  * count, hottest-cell and mean occupancy, tombstone count, and the
  * three documented triggers. `needed` = any trigger fired. */
final case class RequantizeAdvice(nVectors: Long, nCells: Int, occMax: Long,
                                  occMean: Long, knee: Boolean, skewed: Boolean,
                                  tombstoned: Long = 0L, dead: Boolean = false) {
  def needed: Boolean = knee || skewed || dead
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

  /** One index table per (source directory, tag): sf0.01 and sf0.1
    * runs in the same warehouse must never read each other's index,
    * and a tagged generation (e.g. the registry's deletion entry)
    * must never mutate the shared untagged one. */
  def tableFor(dir: String, tag: String = ""): String =
    "ann_cells_" + graft.evm.EvmDerive.md5hex(dir + "#" + tag).take(8)

  /** The quantizer stored BESIDE the assignment table: (cell,
    * centroid) — k rows. The quantizer is part of the index, not a
    * derivable property of the corpus: a probe must score against the
    * exact centroids that assigned the cells, and re-deriving them
    * from the LIVE corpus silently decoheres the moment the corpus
    * grows past the build (count → different k → different sample →
    * probes scan the wrong buckets with no error). Storing k rows also
    * removes two full-corpus jobs (count + md5-ranked sample) from
    * every serving query — the write-once/probe-many claim made real. */
  def quantizerTableFor(dir: String, tag: String = ""): String =
    tableFor(dir, tag) + "_q"

  /** The SQ8 scalar-quantization parameters stored BESIDE the
    * quantizer: (dim, mn, mx) — d rows. Like the centroids, the params
    * are part of the index, not a derivable property of the corpus:
    * every stored code was produced with exactly these (mn, mx), and a
    * probe's approximate dot must decode against the SAME affine terms
    * or candidate ranking silently decoheres as the corpus grows past
    * the build (the quantizer-drift argument, applied to the code
    * book). Storing d rows also removes the posexplode min/max corpus
    * job from every serving query. */
  def sqTableFor(dir: String, tag: String = ""): String =
    tableFor(dir, tag) + "_sq"

  /** The tombstone table stored BESIDE the index: (vec_id, cell) —
    * one row per retired vector, bucketed on `cell` with the
    * assignment's bucket count so a probe's tombstone scan prunes to
    * the probed cells (the anti-join's build side is bounded by the
    * probed cells' dead rows, never the full tombstone set). Part of
    * the index's existence set: a crash that loses it triggers
    * [[ensureBuilt]]'s source-rebuild sweep, and delete producers
    * replay from their ledger — the same source-of-truth recovery
    * contract appends follow. */
  def tombstoneTableFor(dir: String, tag: String = ""): String =
    tableFor(dir, tag) + "_ts"

  /** PQ layout constants — part of the stored index's identity like
    * [[Dim]]: every `pqcodes` row was produced with exactly this
    * subspace split against the stored codebook, so the reader's
    * geometry must match the writer's. */
  val PqM = 8
  val PqKsub = 16

  /** The PQ codebook stored BESIDE the quantizer: (i, centroid) —
    * ksub FULL-dim rows (subspace j's centroid i = row i's j-th
    * slice). Same coherence rule as the SQ params: every stored
    * `pqcodes` row was assigned against exactly these rows, appends
    * encode with them, [[requantize]] refreshes them with the
    * generation. */
  def pqTableFor(dir: String, tag: String = ""): String =
    tableFor(dir, tag) + "_pq"

  // NOTE: the tombstone table must stay LAST — healTombstoneSwap's
  // delete-crash detection keys on tables.last
  private def allTables(dir: String, tag: String): Seq[String] =
    Seq(tableFor(dir, tag), quantizerTableFor(dir, tag),
      sqTableFor(dir, tag), pqTableFor(dir, tag), tombstoneTableFor(dir, tag))

  /** Build the cell-assignment table + its quantizer + an EMPTY
    * tombstone table if this session/warehouse does not have them yet;
    * returns the assignment table name. Idempotent — the "write once"
    * of write-once-probe-many.
    *
    * `learnedPq` selects the PQ codebook the generation stores:
    * `false` (default) = the md5-sampled rows (deterministic,
    * single-statement-SQL-expressible — the registry's oracle-checked
    * shape); `true` = [[Similarity.learnedPqCodebook]]'s per-subspace
    * Lloyd fit (SCALING.md's first recall dial, +0.05-0.08 recall at
    * identical serving cost). Serving needs ZERO changes either way:
    * every stored-probe path reads the STORED codebook, so the flag
    * only matters at build/requantize time — a probe against an index
    * built with either book is coherent by construction. */
  def ensureBuilt(spark: SparkSession, dir: String, tag: String = "",
                  learnedPq: Boolean = false): String = synchronized {
    val t = tableFor(dir, tag)
    healTombstoneSwap(spark, allTables(dir, tag))
    if (allTables(dir, tag).exists(!spark.catalog.tableExists(_))) {
      // an orphaned location from a previous JVM is stale, not
      // reusable: the in-memory catalog lost its bucketing metadata,
      // so clear and rebuild deterministically — the quantizer,
      // SQ-param, and tombstone locations too (saveAsTable dies on a
      // leftover directory the in-memory catalog no longer knows
      // about), and any stage/old generation a crashed [[requantize]]
      // or [[removeBatch]] left behind (recovery contract: a crash
      // mid-swap rebuilds from the source corpus; appended batches and
      // deletions re-enter through their producer's ledger, the same
      // source-of-truth rule ChainStore's replay makes)
      allTables(dir, tag).flatMap(x => Seq(x, x + "__stage", x + "__old"))
        .foreach(Bucketed.resetTable(spark, _))
      // a rebuild writes a NEW generation under the same names — any
      // artifacts cached from a previous incarnation are stale
      invalidateArtifacts(spark, allTables(dir, tag))
      val emb = Fixtures.embeddings(spark, dir)
      val prep = Similarity.prepared(emb)
      val k = annCellsFor(emb.count())
      // ONE md5-ranked sample serves both stored artifacts: the
      // quantizer is its k-prefix and the default PQ codebook its
      // ksub-prefix. The ranking is a deterministic total order
      // (h, vec_id), so the prefixes are bit-identical to two
      // independent sampledCentroids calls at one corpus scan's cost.
      val sample = Similarity.sampledCentroids(prep, math.max(k, PqKsub))
      val cs = sample.take(k)
      // SQ8 codes are the index's physical read path for approximate
      // scoring — quantized ONCE here at write time (the probe side
      // only ever scans the bit-packed code column, ~1 byte/dim,
      // instead of the 8-byte doubles of `v`)
      val (mns, mxs) = Similarity.sqParamsOf(prep, Dim)
      // the PQ codebook joins the layout: pqcodes (nibble-packed
      // binary, a PHYSICAL 4 bits/dim — the sub-byte candidate
      // metric) beside the SQ8 codes, both
      // quantized ONCE at write time against artifacts stored with
      // the generation; the learned-Lloyd book is the opt-in quality
      // dial (see the method scaladoc)
      val pqCb =
        if (learnedPq) Similarity.learnedPqCodebookOf(prep, PqM, PqKsub, Dim)
        else sample.take(PqKsub)
      val assigned = Similarity.assignCells(prep, cs)
        .select(col("vec_id"), col("v"), col("nrm"), col("cell"),
          Similarity.sqCodesCol(col("v"), mns, mxs).as("codes"),
          graft.functions.VectorExprs.nibblePack(
            Similarity.pqCodesCol(col("v"), pqCb, PqM)).as("pqcodes"))
      Bucketed.writeBucketed(assigned, t, "cell", nBuckets = k)
      import spark.implicits._
      cs.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cell", "centroid")
        .write.mode("overwrite").saveAsTable(quantizerTableFor(dir, tag))
      mns.indices.map(i => (i, mns(i), mxs(i)))
        .toDF("dim", "mn", "mx")
        .write.mode("overwrite").saveAsTable(sqTableFor(dir, tag))
      pqCb.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("i", "centroid")
        .write.mode("overwrite").saveAsTable(pqTableFor(dir, tag))
      // the EMPTY tombstone table writes with ONE bucket: bucket
      // pruning only matters once tombstones exist, and removeBatch
      // rewrites with the quantizer's bucket count then — a k-bucket
      // empty write costs k file-creation tasks per build/requantize
      // for zero benefit (measured ~1 s of topk_requant's r16
      // recording before this)
      writeTombstones(spark, emptyTombstones(spark),
        tombstoneTableFor(dir, tag), 1)
    }
    t
  }

  /** Narrow the DELETE-crash blast radius (it used to be a full source
    * rebuild): [[removeBatch]]'s two-rename window is the ONLY state
    * that leaves exactly the TOMBSTONE table absent while every other
    * generation table is live — [[requantize]]/[[requantize2]] rename
    * the ASSIGNMENT aside first and promote it last, so all of their
    * crash states have the assignment absent too and fall through to
    * the full-rebuild sweep as before. Inside removeBatch's window the
    * staged merged tombstone table is already fully written (the stage
    * write strictly precedes the first rename), so promoting it
    * recovers EVERYTHING, in-flight batch included; if only the
    * renamed-aside live table survives (a state no removeBatch crash
    * point produces, but cheap to tolerate), restoring it recovers
    * every previously committed tombstone and loses only the in-flight
    * batch — which the producer's ledger replays. A routine O(batch)
    * delete therefore never carries a corpus-rebuild cost. */
  private def healTombstoneSwap(spark: SparkSession, tables: Seq[String]): Unit = {
    val tst = tables.last
    if (!spark.catalog.tableExists(tst) &&
        tables.init.forall(spark.catalog.tableExists)) {
      if (spark.catalog.tableExists(tst + "__stage")) {
        spark.sql(s"ALTER TABLE ${tst}__stage RENAME TO $tst")
        Bucketed.resetTable(spark, tst + "__old")
      } else if (spark.catalog.tableExists(tst + "__old")) {
        spark.sql(s"ALTER TABLE ${tst}__old RENAME TO $tst")
      }
    }
  }

  private def emptyTombstones(spark: SparkSession, cellCol: String = "cell"): DataFrame =
    spark.range(0).select(col("id").as("vec_id"), lit(0).as(cellCol))

  private def writeTombstones(spark: SparkSession, ts: DataFrame,
                              table: String, nBuckets: Int,
                              cellCol: String = "cell"): Unit =
    ts.select(col("vec_id").cast("long"), col(cellCol).cast("int"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, cellCol).sortBy(cellCol)
      .saveAsTable(table)

  // ---- session-scoped stored-artifact cache --------------------------
  //
  // Every probe needs the SMALL stored artifacts (quantizer centroids,
  // SQ affine params, PQ codebook — k·dim / 2·d / ksub·dim doubles) as
  // driver-side arrays, and each read is a separate Spark collect job.
  // At serving cadence those collects dominate the driver round-trip
  // count of a probe (guide §5: the driver should do almost no data
  // work — and no REPEATED data work either). The artifacts are
  // immutable for the lifetime of a generation by the index's own
  // coherence contract (append/delete never touch them; only a
  // build/requantize writes new ones), so a session can hold them in
  // memory like any open index handle and re-read only when the
  // generation swaps. Keyed by (session, table): tables live in the
  // session's catalog, so cross-session staleness is impossible, and
  // the generation-swap paths ([[ensureBuilt]]'s rebuild branch,
  // [[requantize]]/[[requantize2]]) invalidate their tables explicitly.
  // Entries of stopped sessions are swept on any miss (same rule as
  // [[SharedCaches]]).
  private val artifactCache =
    scala.collection.mutable.Map.empty[(SparkSession, String), AnyRef]

  private def cachedArtifact[T <: AnyRef](spark: SparkSession, table: String)(
      load: => T): T = {
    val key = (spark, table)
    artifactCache.synchronized(artifactCache.get(key)) match {
      case Some(v) => v.asInstanceOf[T]
      case None =>
        val v = load // the collect runs OUTSIDE the lock (SharedCaches' rule)
        artifactCache.synchronized {
          artifactCache.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
          artifactCache.getOrElseUpdate(key, v)
        }.asInstanceOf[T]
    }
  }

  /** Drop the cached artifacts of this generation's tables — called by
    * every path that writes a NEW generation under the same names. */
  private def invalidateArtifacts(spark: SparkSession, tables: Seq[String]): Unit =
    artifactCache.synchronized {
      tables.foreach(t => artifactCache.remove((spark, t)))
    }

  /** The stored quantizer read back as the centroid matrix (k·dim —
    * bounded, same contract as the build-time collect). Session-cached:
    * one collect per generation, not per probe. */
  def storedQuantizer(spark: SparkSession, dir: String, tag: String = ""): Array[Array[Double]] =
    cachedArtifact(spark, quantizerTableFor(dir, tag)) {
      spark.table(quantizerTableFor(dir, tag))
        .select(col("cell"), col("centroid")).orderBy(col("cell")).collect()
        .map(_.getSeq[Double](1).toArray)
    }

  /** The stored SQ8 params read back as the (mns, mxs) pair (2·d
    * doubles — bounded, same contract as the quantizer collect). */
  def storedSqParams(spark: SparkSession, dir: String, tag: String = ""): (Array[Double], Array[Double]) =
    readSqParams(spark, sqTableFor(dir, tag))

  /** [[storedSqParams]] for the two-level generation. */
  def storedSqParams2(spark: SparkSession, dir: String, tag: String = ""): (Array[Double], Array[Double]) =
    readSqParams(spark, sq2TableFor(dir, tag))

  /** The stored PQ codebook read back as ksub full-dim rows
    * ([[PqKsub]]·[[Dim]] doubles — bounded, same contract as the
    * quantizer collect). Session-cached per generation. */
  def storedPqCodebook(spark: SparkSession, dir: String, tag: String = ""): Array[Array[Double]] =
    cachedArtifact(spark, pqTableFor(dir, tag)) {
      spark.table(pqTableFor(dir, tag))
        .select(col("i"), col("centroid")).orderBy(col("i")).collect()
        .map(_.getSeq[Double](1).toArray)
    }

  private def readSqParams(spark: SparkSession,
                           table: String): (Array[Double], Array[Double]) =
    cachedArtifact(spark, table) {
      val rows = spark.table(table)
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
    * [[graft.ingest.Ingest]]). A TOMBSTONED vec_id stays retired: the
    * probe-side anti-join filters it until [[requantize]] compacts —
    * re-adding a retired id is an explicit un-retire the delete
    * producer must issue by clearing its ledger entry first.
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
  def appendBatch(spark: SparkSession, dir: String, fresh: DataFrame,
                  tag: String = ""): Unit = synchronized {
    val t = ensureBuilt(spark, dir, tag)
    val cs = storedQuantizer(spark, dir, tag)
    // codes are encoded with the STORED params — the exact affine
    // terms every existing code row used, the same coherence rule as
    // the centroids (drifted mins/maxs are a quality decay cleared by
    // [[requantize]], never a correctness one: a batch value outside
    // the stored range clamps to 0/255 and the exact rerank still
    // scores it full-precision)
    val (mns, mxs) = storedSqParams(spark, dir, tag)
    // PQ codes follow the same stored-artifact rule: assigned against
    // the build's codebook, never a re-sample
    val pqCb = storedPqCodebook(spark, dir, tag)
    val assigned = Similarity.assignCells(Similarity.prepared(fresh), cs)
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"),
        Similarity.sqCodesCol(col("v"), mns, mxs).as("codes"),
        graft.functions.VectorExprs.nibblePack(
            Similarity.pqCodesCol(col("v"), pqCb, PqM)).as("pqcodes"))
    assigned.write.mode("append").format("parquet")
      .bucketBy(cs.length, "cell").sortBy("cell")
      .saveAsTable(t)
  }

  /** RETIRE half of the lifecycle: tombstone a batch of vec_ids —
    * O(batch ⋈ tombstones), never a bucket rewrite. The ids are
    * resolved to their stored cells (one batch-sized semi-join against
    * the index, so the tombstone table carries the probe's pruning
    * key), merged with the existing tombstone set (distinct — a
    * re-delete is idempotent, which also makes the registry's
    * deletion entry re-runnable), and committed under the same
    * stage→rename-aside→promote protocol as [[requantize]]: the live
    * tombstone table is renamed aside and the staged one promoted, so
    * every crash point inside the window leaves the table ABSENT —
    * a state [[ensureBuilt]] detects and heals CHEAPLY via
    * [[healTombstoneSwap]] (the staged merged table is complete before
    * the first rename, so promoting it recovers everything including
    * the in-flight batch; a routine delete never carries the full
    * source-rebuild cost, which remains the fallback only when no
    * tombstone generation survives — then the delete producer replays
    * its ledger, [[replayDeleteLedger]]). Ids not present in the index
    * resolve to no cell and are dropped — retiring an unknown id is a
    * no-op, not an error.
    *
    * Deleted rows stay physically in the assignment buckets until
    * [[requantize]] compacts them (probes filter them out via the
    * cell-pruned anti-join); [[requantizeAdvice]]'s dead-fraction
    * trigger bounds how long that debt can accumulate. */
  def removeBatch(spark: SparkSession, dir: String, ids: DataFrame,
                  tag: String = ""): Unit = synchronized {
    val t = ensureBuilt(spark, dir, tag)
    val ts = tombstoneTableFor(dir, tag)
    // idempotent fast path, CHEAP side first: a batch already fully
    // tombstoned (the at-least-once delete producer's replay, or a
    // re-run registry entry) must not pay the table swap — and
    // deciding that needs only ids ∖ tombstones (batch-sized against
    // the pruned tombstone scan), never the k-bucket index scan the
    // cell resolution costs. Only genuinely fresh ids pay the resolve;
    // the merged set is unchanged because a tombstoned id's
    // (vec_id, cell) row is already in ts (rows leave the assignment
    // only at requantize, which resets the tombstones with them).
    val freshIds = ids.select(col("vec_id"))
      .join(spark.table(ts).select(col("vec_id")), Seq("vec_id"), "left_anti")
    if (!freshIds.isEmpty) {
      val k = storedQuantizer(spark, dir, tag).length
      val resolved = spark.table(t).select(col("vec_id"), col("cell"))
        .join(freshIds, Seq("vec_id"), "left_semi")
      // ids not present in the index resolve to no cell — retiring an
      // unknown id stays a no-op, never a table swap
      if (!resolved.isEmpty) {
        val merged = spark.table(ts).select(col("vec_id"), col("cell"))
          .unionByName(resolved).distinct()
        val tsStage = ts + "__stage"
        val tsOld = ts + "__old"
        Seq(tsStage, tsOld).foreach(Bucketed.resetTable(spark, _))
        writeTombstones(spark, merged, tsStage, k)
        spark.sql(s"ALTER TABLE $ts RENAME TO $tsOld")
        spark.sql(s"ALTER TABLE $tsStage RENAME TO $ts")
        Bucketed.resetTable(spark, tsOld)
      }
    }
  }

  /** The replayable delete LEDGER stored beside the index — the
    * source-of-truth feed [[removeBatch]]'s crash contract names
    * ("delete producers replay their ledgers"): one row per retired
    * vec_id, append-only, written BEFORE the tombstone commit so a
    * crash anywhere after the ledger append loses nothing. */
  def deleteLedgerTableFor(dir: String, tag: String = ""): String =
    tableFor(dir, tag) + "_ledger"

  /** The CURATION → INDEX seam, closed: persist a curation output's
    * retired ids to the ledger (the commit point), then tombstone the
    * batch. This is the producer the scaladocs promised — a near-dup
    * pass's losers, [[graft.ops.Dedup.applyNearDedup]]'s drops, or a
    * streaming matcher's hit feed flow through here and the serving
    * index stays coherent with the curated corpus.
    *
    * Ordering is the whole contract: LEDGER FIRST. A crash between the
    * ledger append and the tombstone commit leaves the batch durably
    * recorded and un-applied — exactly the state
    * [[replayDeleteLedger]] heals; and since [[removeBatch]] is
    * idempotent (distinct merge + the fast path for fully-tombstoned
    * batches), at-least-once delivery is free: re-running a batch or
    * replaying the whole ledger can only converge. The tombstone call
    * passes the BATCH, not the ledger — O(batch) per retire (the
    * fast-path note in the round-16 verdict: high-frequency producers
    * batch their ledger); the full-ledger pass is the recovery path.
    *
    * Ledger rows are distinct per batch but duplicates ACROSS batches
    * are allowed (at-least-once replay writes them) — removeBatch's
    * distinct merge absorbs them, so the ledger needs no coordination
    * beyond the append. The caller's `ids` plan is evaluated exactly
    * ONCE — for the ledger append; the tombstone pass reads the
    * just-written batch BACK from the ledger (each append carries a
    * monotone `batch` id), so even a nondeterministic producer cannot
    * ledger one id set and tombstone another: what was durably
    * recorded is precisely what retires, structurally. */
  def retireBatch(spark: SparkSession, dir: String, ids: DataFrame,
                  tag: String = ""): Unit = synchronized {
    ensureBuilt(spark, dir, tag)
    retireVia(spark, deleteLedgerTableFor(dir, tag), ids,
      removeBatch(spark, dir, _, tag))
  }

  /** [[retireBatch]] for the two-level generation — same ledger-first
    * contract, one level down. */
  def retireBatch2(spark: SparkSession, dir: String, ids: DataFrame,
                   tag: String = ""): Unit = synchronized {
    ensureBuilt2(spark, dir, tag)
    retireVia(spark, deleteLedger2TableFor(dir, tag), ids,
      removeBatch2(spark, dir, _, tag))
  }

  /** Gen-2 ledger table — [[deleteLedgerTableFor]] beside the
    * two-level index. */
  def deleteLedger2TableFor(dir: String, tag: String = ""): String =
    table2For(dir, tag) + "_ledger"

  private def retireVia(spark: SparkSession, ledger: String, ids: DataFrame,
                        remove: DataFrame => Unit): Unit = {
    val mig = ledger + "__mig"
    val lold = ledger + "__old"
    // heal a half-done migration swap FIRST (the two-rename window
    // below): the staged __mig is complete before the first rename, so
    // if the ledger name is absent promoting it recovers everything;
    // if only the renamed-aside __old survives (no crash point here
    // produces that alone, but cheap to tolerate) restoring it
    // recovers the pre-migration history. Without this heal a crash
    // inside the window would read as fresh=true below and strand the
    // migrated batch-0 rows — replay history silently lost.
    if (!spark.catalog.tableExists(ledger)) {
      if (spark.catalog.tableExists(mig)) {
        spark.sql(s"ALTER TABLE $mig RENAME TO $ledger")
        Bucketed.resetTable(spark, lold)
      } else if (spark.catalog.tableExists(lold)) {
        spark.sql(s"ALTER TABLE $lold RENAME TO $ledger")
      }
    } else if (spark.catalog.tableExists(lold)) {
      // completed swap that crashed before dropping the aside copy
      Bucketed.resetTable(spark, lold)
    }
    // a ledger LOCATION without a catalog entry is a previous JVM's
    // orphan (the in-memory catalog forgot it): under this harness's
    // recovery contract the index itself was already rebuilt from
    // source by ensureBuilt's sweep — the stale ledger describes
    // tombstones that no longer exist, so it resets with the same rule
    // (a durable-metastore deployment never hits this branch: its
    // catalog remembers the table and the append just appends)
    val fresh = !spark.catalog.tableExists(ledger)
    if (fresh) Bucketed.resetTable(spark, ledger)
    // backward compatibility with the pre-batch ledger shape (vec_id
    // only — written before the read-back protocol): against a durable
    // metastore an old-schema ledger would fail the max(batch) read
    // AND the widened append, so migrate it once — existing rows
    // become batch 0 (they were already applied or are replayable; 0
    // never collides with the monotone ids starting at 1). Commit =
    // the rename-aside protocol the tombstone swap uses (never
    // DROP-then-RENAME: a crash between those two loses the ledger
    // name with no heal state): stage __mig fully, rename the live
    // ledger aside, promote the stage, drop the aside copy — every
    // crash point leaves either the live name or a healable pair.
    if (!fresh && !spark.table(ledger).columns.contains("batch")) {
      Bucketed.resetTable(spark, mig)
      spark.table(ledger).select(col("vec_id").cast("long"))
        .withColumn("batch", lit(0L))
        .write.mode("overwrite").format("parquet").saveAsTable(mig)
      Bucketed.resetTable(spark, lold)
      spark.sql(s"ALTER TABLE $ledger RENAME TO $lold")
      spark.sql(s"ALTER TABLE $mig RENAME TO $ledger")
      Bucketed.resetTable(spark, lold)
    }
    // monotone per-append batch id: one bounded max() over the ledger
    // (O(ledger rows read, 1 row returned) — a table the producer
    // keeps batch-bounded by contract)
    val nextBatch: Long =
      if (fresh) 1L
      else spark.table(ledger)
        .agg(coalesce(max(col("batch")), lit(0L)).as("b"))
        .head().getLong(0) + 1L
    ids.select(col("vec_id").cast("long")).distinct()
      .withColumn("batch", lit(nextBatch))
      .write.mode("append").format("parquet").saveAsTable(ledger)
    // tombstone from the just-written batch READ BACK — the single
    // evaluation of the caller's plan is the parquet on disk, so the
    // ledger and the tombstones cannot diverge even for a
    // nondeterministic producer
    remove(spark.table(ledger).filter(col("batch") === nextBatch)
      .select(col("vec_id")))
  }

  /** Recovery half of [[retireBatch]]: replay the FULL ledger into the
    * tombstones. Safe to run any number of times (removeBatch is
    * idempotent; a fully-applied ledger takes the emptiness fast
    * path) — the producer's answer to every crash the removeBatch
    * scaladoc enumerates, including the tombstone-table rebuild. */
  def replayDeleteLedger(spark: SparkSession, dir: String, tag: String = ""): Unit = {
    val ledger = deleteLedgerTableFor(dir, tag)
    if (spark.catalog.tableExists(ledger))
      removeBatch(spark, dir, spark.table(ledger), tag)
  }

  /** [[replayDeleteLedger]] for the two-level generation. */
  def replayDeleteLedger2(spark: SparkSession, dir: String, tag: String = ""): Unit = {
    val ledger = deleteLedger2TableFor(dir, tag)
    if (spark.catalog.tableExists(ledger))
      removeBatch2(spark, dir, spark.table(ledger), tag)
  }

  /** The probe-side tombstone filter: anti-join the index rows against
    * the tombstone rows OF THE PROBED CELLS ONLY — the tombstone scan
    * bucket-prunes on the same literal cell list as the index scan, so
    * the anti-join's build side is the probed cells' dead rows (a
    * bounded fraction of a bounded read), never the full tombstone
    * set. Broadcast is therefore safe at any corpus size: the
    * dead-fraction advice keeps per-cell tombstones a bounded share of
    * per-cell occupancy, which the probe already reads in full. */
  private def dropTombstoned(spark: SparkSession, dir: String, tag: String,
                             index: DataFrame,
                             cellLits: Seq[Integer]): DataFrame = {
    val ts = spark.table(tombstoneTableFor(dir, tag))
      .filter(col("cell").isin(cellLits: _*)).select(col("vec_id"))
    index.join(broadcast(ts), Seq("vec_id"), "left_anti")
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
    * measures it.
    * Trigger (c) — DEAD: tombstones exceed 1/`deadBound` of the stored
    * rows. Every probe reads the dead rows (they sit inside the probed
    * buckets) and then filters them — paying bytes for vectors it can
    * never return; compaction reclaims them. */
  def requantizeAdvice(spark: SparkSession, dir: String,
                       skewBound: Long = 8L, deadBound: Long = 5L,
                       tag: String = ""): RequantizeAdvice = {
    val t = ensureBuilt(spark, dir, tag)
    val k = storedQuantizer(spark, dir, tag).length
    val occ = spark.table(t).groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n")).as("total"), max(col("n")).as("occMax")).collect()(0)
    val n = occ.getAs[Long]("total")
    val occMax = occ.getAs[Long]("occMax")
    val occMean = math.max(1L, n / k)
    val tombstoned = spark.table(tombstoneTableFor(dir, tag)).count()
    RequantizeAdvice(n, k, occMax, occMean,
      knee = annCellsFor(n) > 2 * k,
      skewed = occMax > skewBound * occMean,
      tombstoned = tombstoned,
      dead = tombstoned * deadBound >= math.max(1L, n))
  }

  /** Execute the rebuild [[requantizeAdvice]] recommends: re-fit the
    * quantizer over the CURRENT corpus (build rows ∪ every appended
    * batch, MINUS the tombstoned rows — compaction happens here, and
    * the tombstone table resets to empty in the same commit), reassign
    * everything, and swap the new generation in.
    *
    * Sizing and sampling are exactly [[ensureBuilt]]'s — k =
    * [[annCellsFor]](n) over the surviving n, centroids =
    * [[Similarity.sampledCentroids]] over the surviving corpus — so a
    * probe after the rebuild is bit-identical to an inline IVF
    * pipeline built fresh from the surviving corpus (`AnnIndexSpec`'s
    * requantize-cycle test pins exactly this, and the
    * `topk_requant` registry entry hash-checks the rebuilt index
    * against the oracle's inline IVF SQL): the index stays a pure
    * physical optimization across its whole build → append → remove →
    * advice → requantize lifecycle.
    *
    * Commit protocol = temp-write-then-swap at table granularity (the
    * [[graft.ingest.ChainStore]] `swapBucket` pattern): the new
    * generation is fully written BESIDE the live tables (readers keep
    * serving the old index during the corpus-wide reassignment — no
    * downtime window the length of a rebuild), then swapped in via
    * catalog renames. Rename ORDER is load-bearing: the live
    * assignment table is renamed aside FIRST and the staged one
    * promoted LAST, so every crash point inside the window leaves the
    * assignment table ABSENT — which is exactly the state
    * [[ensureBuilt]]'s orphan sweep detects and heals (rebuild from
    * the source corpus; append/delete producers replay from their
    * ledger — documented there). Promoting the assignment table before
    * the quantizer swap would open a silent-wrong-buckets window (both
    * tables present but from different generations, so no sweep
    * triggers and probes scan wrong cells with no error); this
    * ordering makes that state unreachable. Mutators ([[appendBatch]],
    * [[removeBatch]], this method) serialize on this object's lock,
    * the same single-maintainer contract as the store's write lock —
    * an append can therefore never land in the old generation mid-swap
    * and be dropped with it. Probes call [[ensureBuilt]] (same lock),
    * so an in-JVM probe issued during the swap blocks until commit; a
    * probe that planned BEFORE the swap can still see a mixed view —
    * run requantize in the maintenance window, like any index rebuild.
    *
    * Clears the KNEE trigger by construction, the DEAD trigger always
    * (compaction), and the SKEW trigger whenever skew came from
    * quantizer drift (appends the old sample never saw). A literal
    * point-mass — thousands of identical vectors — cannot be split by
    * ANY quantizer; the advice keeps flagging it, correctly: that cell
    * IS hot, and the fix is upstream dedup, not a rebuild.
    *
    * Returns the post-rebuild advice so the caller sees the cleared
    * (or legitimately persisting) triggers. */
  def requantize(spark: SparkSession, dir: String,
                 skewBound: Long = 8L, tag: String = "",
                 learnedPq: Boolean = false): RequantizeAdvice = synchronized {
    val t = ensureBuilt(spark, dir, tag)
    val qt = quantizerTableFor(dir, tag)
    val sqt = sqTableFor(dir, tag)
    val pqt = pqTableFor(dir, tag)
    val tst = tombstoneTableFor(dir, tag)
    // compaction: tombstoned rows leave the corpus here — the rebuild
    // is the one corpus-wide job of the lifecycle, so the anti-join
    // rides it for free (vec_id-keyed, never wider than the reassign
    // scan that follows)
    val live = spark.table(t).select(col("vec_id"), col("v"), col("nrm"))
      .join(spark.table(tst).select(col("vec_id")), Seq("vec_id"), "left_anti")
    val n = live.count()
    require(n > 0, s"cannot requantize an empty index ($t)")
    val k = annCellsFor(n)
    // one ranked sample for quantizer + default PQ codebook — the
    // build's prefix argument (see ensureBuilt), applied to the rebuild
    val sample = Similarity.sampledCentroids(live, math.max(k, PqKsub))
    val cs = sample.take(k)
    // SQ params refresh with the quantizer: drifted mins/maxs are the
    // same decay class as drifted centroids (appended values outside
    // the stored range clamp, widening the range restores code
    // resolution), and the rebuild re-encodes every row so the whole
    // generation shares one code book
    val (mns, mxs) = Similarity.sqParamsOf(live, Dim)
    // the PQ codebook refreshes with the generation (the same decay
    // class as the centroids/SQ params) and every row re-encodes —
    // one code book per generation; learnedPq re-fits the Lloyd book
    // over the SURVIVING corpus (the build flag, carried through the
    // rebuild so a learned index stays learned)
    val pqCb =
      if (learnedPq) Similarity.learnedPqCodebookOf(live, PqM, PqKsub, Dim)
      else sample.take(PqKsub)
    // stage the new generation beside the live one
    val stages = allTables(dir, tag).map(_ + "__stage")
    val Seq(tStage, qtStage, sqtStage, pqtStage, tstStage) = stages
    stages.foreach(Bucketed.resetTable(spark, _))
    Bucketed.writeBucketed(
      Similarity.assignCells(live, cs)
        .select(col("vec_id"), col("v"), col("nrm"), col("cell"),
          Similarity.sqCodesCol(col("v"), mns, mxs).as("codes"),
          graft.functions.VectorExprs.nibblePack(
            Similarity.pqCodesCol(col("v"), pqCb, PqM)).as("pqcodes")),
      tStage, "cell", nBuckets = k)
    import spark.implicits._
    cs.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .write.mode("overwrite").saveAsTable(qtStage)
    mns.indices.map(i => (i, mns(i), mxs(i)))
      .toDF("dim", "mn", "mx")
      .write.mode("overwrite").saveAsTable(sqtStage)
    pqCb.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("i", "centroid")
      .write.mode("overwrite").saveAsTable(pqtStage)
    // the new generation starts with NO tombstones: compaction just
    // removed every retired row physically
    writeTombstones(spark, emptyTombstones(spark), tstStage, 1)
    // commit: rename the live generation aside, promote the stage —
    // each rename is one atomic catalog+dir move, and the ASSIGNMENT
    // table is renamed aside FIRST and promoted LAST so any crash
    // inside the window leaves it absent (ensureBuilt's rebuild
    // trigger), never a mixed new-assignment/old-quantizer(-params)
    // combination (see scaladoc)
    val olds = allTables(dir, tag).map(_ + "__old")
    olds.foreach(Bucketed.resetTable(spark, _))
    spark.sql(s"ALTER TABLE $t RENAME TO ${t}__old")
    spark.sql(s"ALTER TABLE $qt RENAME TO ${qt}__old")
    spark.sql(s"ALTER TABLE $sqt RENAME TO ${sqt}__old")
    spark.sql(s"ALTER TABLE $pqt RENAME TO ${pqt}__old")
    spark.sql(s"ALTER TABLE $tst RENAME TO ${tst}__old")
    spark.sql(s"ALTER TABLE $tstStage RENAME TO $tst")
    spark.sql(s"ALTER TABLE $pqtStage RENAME TO $pqt")
    spark.sql(s"ALTER TABLE $sqtStage RENAME TO $sqt")
    spark.sql(s"ALTER TABLE $qtStage RENAME TO $qt")
    spark.sql(s"ALTER TABLE $tStage RENAME TO $t")
    olds.foreach(Bucketed.resetTable(spark, _))
    // the generation swapped: cached artifacts describe the OLD one
    invalidateArtifacts(spark, allTables(dir, tag))
    requantizeAdvice(spark, dir, skewBound, tag = tag)
  }

  /** Top-k probe over the persisted index: probe cells selected
    * in-plan against the STORED quantizer (k rows — no corpus-wide job
    * at serving time), scan only those buckets (literal IN filter →
    * bucket pruning), drop tombstoned rows, rank by exact cosine. */
  def topK(spark: SparkSession, dir: String, maxQueryId: Long,
           k: Int = 5, nProbe: Int = 2, tag: String = ""): DataFrame = {
    val t = ensureBuilt(spark, dir, tag)
    val (probesDf, cells) = probeFrame(spark, dir, maxQueryId, nProbe, tag = tag)
    val cellLits = cells.map(Int.box).toSeq
    val index = dropTombstoned(spark, dir, tag,
      spark.table(t).filter(col("cell").isin(cellLits: _*)), cellLits)
    Similarity.probeIndex(index, probesDf, k)
  }

  /** The probe computation shared by [[topK]], [[topKSq]], and (at the
    * coarse level) [[topK2]]: each query's `nProbe` nearest cells
    * against the STORED quantizer, as a (cell, q_id, qv, qn) frame
    * plus the distinct cell-id literal list that buys bucket pruning.
    *
    * Scoring runs IN-PLAN — [[Similarity.probeQueries]]'s codegen'd
    * scored-array slice over the query-side scan, the same expression
    * the inline pipelines use, so the two paths cannot drift — and the
    * only driver materialization is the DISTINCT probed cell list
    * (≤ queries · nProbe ints, needed as a plan-time literal for
    * bucket pruning). Query vectors are never collected: at a
    * batch-serving load the queries × cells × dim scoring is the
    * expensive half of a probe, and it stays on executors.
    * [[Similarity.probeQueries]]'s (s, cell)-ascending struct sort is
    * the same (score, cell) first-min tie-break as assignCells and the
    * DuckDB oracle's ROW_NUMBER, so the registry entries stay
    * hash-differential. */
  private def probeFrame(spark: SparkSession, dir: String, maxQueryId: Long,
                         nProbe: Int,
                         quantizer: Option[Array[Array[Double]]] = None,
                         tag: String = ""): (DataFrame, Array[Int]) =
    probeFrameFor(spark, dir, _.filter(col("vec_id") < maxQueryId),
      nProbe, quantizer, tag)

  /** [[probeFrame]] over an arbitrary query selection — the fixture
    * entries' id-prefix filter is just one instance; [[topKIds]]
    * passes a semi-join against a caller-supplied id frame. */
  private def probeFrameFor(spark: SparkSession, dir: String,
                            select: DataFrame => DataFrame, nProbe: Int,
                            quantizer: Option[Array[Array[Double]]] = None,
                            tag: String = ""): (DataFrame, Array[Int]) = {
    val prep = Similarity.prepared(Fixtures.embeddings(spark, dir))
    val cs: Array[Array[Double]] = quantizer.getOrElse(storedQuantizer(spark, dir, tag))
    val probes = Similarity.probeQueries(select(prep), cs, nProbe)
    val cells = probes.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    (probes, cells)
  }

  /** [[topK]] for an EXPLICIT query-id set — the call a real serving
    * caller makes (query ids are rarely an id prefix): the query side
    * is a broadcast semi-join of the corpus scan against `queryIds`,
    * so the probe stays in-plan and bucket-pruned exactly like the
    * prefix form. `queryIds` needs a `vec_id` column; ids not in the
    * corpus probe nothing. */
  def topKIds(spark: SparkSession, dir: String, queryIds: DataFrame,
              k: Int = 5, nProbe: Int = 2, tag: String = ""): DataFrame = {
    val t = ensureBuilt(spark, dir, tag)
    val (probesDf, cells) = probeFrameFor(spark, dir,
      _.join(broadcast(queryIds.select(col("vec_id"))), Seq("vec_id"), "left_semi"),
      nProbe, tag = tag)
    val cellLits = cells.map(Int.box).toSeq
    val index = dropTombstoned(spark, dir, tag,
      spark.table(t).filter(col("cell").isin(cellLits: _*)), cellLits)
    Similarity.probeIndex(index, probesDf, k)
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
  def table2For(dir: String, tag: String = ""): String =
    "ann2_" + graft.evm.EvmDerive.md5hex(dir + "#" + tag).take(8)
  def coarseQuantizerTableFor(dir: String, tag: String = ""): String =
    table2For(dir, tag) + "_qc"
  def fineQuantizerTableFor(dir: String, tag: String = ""): String =
    table2For(dir, tag) + "_qf"

  /** Generation-2 tombstones: (vec_id, ccell), bucketed on the COARSE
    * cell — the same probe-time pruning key and recovery contract as
    * the flat index's [[tombstoneTableFor]]. */
  def tombstone2TableFor(dir: String, tag: String = ""): String =
    table2For(dir, tag) + "_ts"

  /** Generation-2 SQ8 params: (dim, mn, mx) beside the two-level
    * index — [[sqTableFor]]'s contract one level down. The two-level
    * tier IS the billion-vector tier, the one whose probes must be
    * byte-frugal: without codes every probed fine cell pays 8
    * bytes/dim of full-precision vectors where the flat tier pays ~1.
    * Same stored-params coherence rule: every code row was produced
    * with exactly these (mn, mx), appends encode with them, and
    * [[requantize2]] refreshes them with the generation. */
  def sq2TableFor(dir: String, tag: String = ""): String =
    table2For(dir, tag) + "_sq"

  /** Generation-2 PQ codebook: [[pqTableFor]]'s contract one level
    * down — the billion-vector tier is exactly where 4-bit codes
    * matter most (a probed fine cell at ~0.5 byte/dim instead of
    * SQ8's ~1 or the vectors' 8). Every `pqcodes` row in the gen-2
    * assignment was assigned against these rows; appends encode with
    * them; [[requantize2]] refreshes them with the generation. */
  def pq2TableFor(dir: String, tag: String = ""): String =
    table2For(dir, tag) + "_pq"

  // NOTE: tombstones LAST here too — healTombstoneSwap keys on .last
  private def allTables2(dir: String, tag: String): Seq[String] =
    Seq(table2For(dir, tag), coarseQuantizerTableFor(dir, tag),
      fineQuantizerTableFor(dir, tag), sq2TableFor(dir, tag),
      pq2TableFor(dir, tag), tombstone2TableFor(dir, tag))

  /** Build the two-level index if absent: assignment
    * (vec_id, ccell, v, nrm, fcell) bucketed on the COARSE cell (kc
    * buckets — the probe's pruning key), the n^¼-row coarse quantizer,
    * and the (ccell, fcell, fv, f2) fine-quantizer relation stored as
    * a table (≈ Σ⌈√occ⌉ rows — data, never a literal). Same
    * write-once idempotence and orphan-sweep recovery contract as
    * [[ensureBuilt]]. */
  def ensureBuilt2(spark: SparkSession, dir: String, tag: String = "",
                   learnedPq: Boolean = false): String = synchronized {
    val t = table2For(dir, tag)
    healTombstoneSwap(spark, allTables2(dir, tag))
    if (allTables2(dir, tag).exists(!spark.catalog.tableExists(_))) {
      allTables2(dir, tag).flatMap(x => Seq(x, x + "__stage", x + "__old"))
        .foreach(Bucketed.resetTable(spark, _))
      invalidateArtifacts(spark, allTables2(dir, tag))
      val emb = Fixtures.embeddings(spark, dir)
      val prep = Similarity.prepared(emb)
      writeGeneration2(spark, prep, emb.count(), t,
        coarseQuantizerTableFor(dir, tag), fineQuantizerTableFor(dir, tag),
        sq2TableFor(dir, tag), pq2TableFor(dir, tag),
        tombstone2TableFor(dir, tag), learnedPq)
    }
    t
  }

  /** Stage one full two-level generation into the named tables —
    * shared by the build (straight into the live names) and
    * [[requantize2]] (into the `__stage` names). The assignment rows
    * carry SQ8 `codes` quantized ONCE here at write time with the
    * generation's own params — the byte-bounded read path
    * [[ensureBuilt]] gave the flat tier, now on the tier that needs it
    * most (a billion-vector probe's fine cells at ~1 byte/dim instead
    * of 8). */
  private def writeGeneration2(spark: SparkSession, prep: DataFrame, n: Long,
                               t: String, qc: String, qf: String,
                               sqt: String, pqt: String, tst: String,
                               learnedPq: Boolean = false): Unit = {
    val (coarse, fine, asg) = Similarity.ivf2StructureOf(prep, n)
    val (mns, mxs) = Similarity.sqParamsOf(prep, Dim)
    // the PQ codebook joins the gen-2 layout exactly as it joined the
    // flat one: pqcodes quantized ONCE at write time against rows
    // stored with the generation; learnedPq = the Lloyd-fit book
    // ([[ensureBuilt]]'s flag, one level down — the billion-vector
    // tier's first recall dial)
    val pqCb =
      if (learnedPq) Similarity.learnedPqCodebookOf(prep, PqM, PqKsub, Dim)
      else Similarity.sampledCentroids(prep, PqKsub)
    Bucketed.writeBucketed(
      asg.select(col("vec_id"), col("v"), col("nrm"), col("ccell"), col("fcell"),
        Similarity.sqCodesCol(col("v"), mns, mxs).as("codes"),
        graft.functions.VectorExprs.nibblePack(
            Similarity.pqCodesCol(col("v"), pqCb, PqM)).as("pqcodes")),
      t, "ccell", nBuckets = coarse.length)
    import spark.implicits._
    coarse.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("ccell", "centroid")
      .write.mode("overwrite").saveAsTable(qc)
    fine.write.mode("overwrite").saveAsTable(qf)
    mns.indices.map(i => (i, mns(i), mxs(i)))
      .toDF("dim", "mn", "mx")
      .write.mode("overwrite").saveAsTable(sqt)
    pqCb.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("i", "centroid")
      .write.mode("overwrite").saveAsTable(pqt)
    writeTombstones(spark, emptyTombstones(spark, "ccell"), tst, 1, "ccell")
  }

  /** The stored gen-2 PQ codebook — [[storedPqCodebook]] one level
    * down (ksub·dim doubles, bounded collect). */
  def storedPqCodebook2(spark: SparkSession, dir: String, tag: String = ""): Array[Array[Double]] =
    cachedArtifact(spark, pq2TableFor(dir, tag)) {
      spark.table(pq2TableFor(dir, tag))
        .select(col("i"), col("centroid")).orderBy(col("i")).collect()
        .map(_.getSeq[Double](1).toArray)
    }

  /** The stored coarse quantizer (~n^¼ · dim doubles — the ONLY
    * quantizer collect this index ever performs). Session-cached per
    * generation. */
  def storedCoarseQuantizer(spark: SparkSession, dir: String,
                            tag: String = ""): Array[Array[Double]] =
    cachedArtifact(spark, coarseQuantizerTableFor(dir, tag)) {
      spark.table(coarseQuantizerTableFor(dir, tag))
        .select(col("ccell"), col("centroid")).orderBy(col("ccell")).collect()
        .map(_.getSeq[Double](1).toArray)
    }

  /** Append a fresh batch against BOTH stored quantizers — coarse
    * assignment from the collected n^¼ matrix, fine assignment via a
    * broadcast join against the stored fine relation with the same
    * map-side `min_by` argmin the build uses. O(batch); probe
    * coherence by construction, exactly [[appendBatch]]'s contract one
    * level down. */
  def appendBatch2(spark: SparkSession, dir: String, fresh: DataFrame,
                   tag: String = ""): Unit = synchronized {
    val t = ensureBuilt2(spark, dir, tag)
    val coarse = storedCoarseQuantizer(spark, dir, tag)
    val fine = spark.table(fineQuantizerTableFor(dir, tag))
    // codes encode with the STORED gen-2 params — [[appendBatch]]'s
    // coherence rule one level down (out-of-range batch values clamp;
    // the exact rerank still scores them full-precision)
    val (mns, mxs) = storedSqParams2(spark, dir, tag)
    // PQ codes encode with the STORED gen-2 codebook — the same
    // artifact-coherence rule as the SQ params
    val pqCb = storedPqCodebook2(spark, dir, tag)
    val casg = Similarity.assignCells(Similarity.prepared(fresh), coarse)
      .withColumnRenamed("cell", "ccell")
    val assigned = casg.join(broadcast(fine), Seq("ccell"))
      .withColumn("s",
        lit(-2.0) * Similarity.dot(col("v"), col("fv")) + col("f2"))
      .groupBy(col("vec_id")).agg(
        first(col("ccell")).as("ccell"),
        first(col("v")).as("v"), first(col("nrm")).as("nrm"),
        min_by(col("fcell"), struct(col("s"), col("fcell"))).as("fcell"))
    assigned.select(col("vec_id"), col("v"), col("nrm"), col("ccell"), col("fcell"),
        Similarity.sqCodesCol(col("v"), mns, mxs).as("codes"),
        graft.functions.VectorExprs.nibblePack(
            Similarity.pqCodesCol(col("v"), pqCb, PqM)).as("pqcodes"))
      .write.mode("append").format("parquet")
      .bucketBy(coarse.length, "ccell").sortBy("ccell")
      .saveAsTable(t)
  }

  /** [[requantizeAdvice]]'s two-level counterpart, measured at the
    * COARSE level — the level whose occupancy a probe's bucket reads
    * and whose count must track n^¼ (fine cells re-size per coarse
    * cell automatically at rebuild, so they carry no independent
    * trigger). KNEE: annCellsFor(annCellsFor(n)) > 2·kc — the corpus
    * has outgrown the coarse count the way the flat index outgrows
    * ⌈√n⌉. SKEW: the hottest coarse cell holds > skewBound× the mean —
    * a drifted append distribution concentrates coarse reads exactly
    * like the flat case. DEAD: the flat index's tombstone-fraction
    * trigger, over [[removeBatch2]]'s set. */
  def requantizeAdvice2(spark: SparkSession, dir: String,
                        skewBound: Long = 8L, deadBound: Long = 5L,
                        tag: String = ""): RequantizeAdvice = {
    val t = ensureBuilt2(spark, dir, tag)
    val kc = storedCoarseQuantizer(spark, dir, tag).length
    val occ = spark.table(t).groupBy(col("ccell")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n")).as("total"), max(col("n")).as("occMax")).collect()(0)
    val n = occ.getAs[Long]("total")
    val occMax = occ.getAs[Long]("occMax")
    val occMean = math.max(1L, n / kc)
    val tombstoned = spark.table(tombstone2TableFor(dir, tag)).count()
    RequantizeAdvice(n, kc, occMax, occMean,
      knee = annCellsFor(annCellsFor(n)) > 2 * kc,
      skewed = occMax > skewBound * occMean,
      tombstoned = tombstoned,
      dead = tombstoned * deadBound >= math.max(1L, n))
  }

  /** RETIRE on the two-level index — [[removeBatch]]'s contract one
    * level down: ids resolve to their stored COARSE cells (the probe's
    * pruning key), merge distinct with the existing set, and commit
    * under the same stage→rename-aside→promote protocol (a crash
    * leaves the tombstone table absent → [[ensureBuilt2]]'s sweep
    * heals; delete producers replay their ledger). */
  def removeBatch2(spark: SparkSession, dir: String, ids: DataFrame,
                   tag: String = ""): Unit = synchronized {
    val t = ensureBuilt2(spark, dir, tag)
    val ts = tombstone2TableFor(dir, tag)
    // same idempotent fast path as [[removeBatch]], cheap side first:
    // the fully-tombstoned re-run decides on ids ∖ tombstones alone,
    // never the index scan
    val freshIds = ids.select(col("vec_id"))
      .join(spark.table(ts).select(col("vec_id")), Seq("vec_id"), "left_anti")
    if (!freshIds.isEmpty) {
      val kc = storedCoarseQuantizer(spark, dir, tag).length
      val resolved = spark.table(t).select(col("vec_id"), col("ccell"))
        .join(freshIds, Seq("vec_id"), "left_semi")
      if (!resolved.isEmpty) {
        val merged = spark.table(ts).select(col("vec_id"), col("ccell"))
          .unionByName(resolved).distinct()
        val tsStage = ts + "__stage"
        val tsOld = ts + "__old"
        Seq(tsStage, tsOld).foreach(Bucketed.resetTable(spark, _))
        writeTombstones(spark, merged, tsStage, kc, "ccell")
        spark.sql(s"ALTER TABLE $ts RENAME TO $tsOld")
        spark.sql(s"ALTER TABLE $tsStage RENAME TO $ts")
        Bucketed.resetTable(spark, tsOld)
      }
    }
  }

  /** Re-fit BOTH quantizer levels over the live corpus and swap the
    * generation in — [[requantize]]'s commit protocol verbatim (stage
    * beside live, assignment renamed aside FIRST and promoted LAST so
    * every crash point leaves it absent for [[ensureBuilt2]]'s sweep).
    * [[requantizeAdvice2]] is the trigger. */
  def requantize2(spark: SparkSession, dir: String, tag: String = "",
                  learnedPq: Boolean = false): Unit = synchronized {
    val t = ensureBuilt2(spark, dir, tag)
    val qc = coarseQuantizerTableFor(dir, tag)
    val qf = fineQuantizerTableFor(dir, tag)
    val sqt = sq2TableFor(dir, tag)
    val pqt = pq2TableFor(dir, tag)
    val tst = tombstone2TableFor(dir, tag)
    // compaction: tombstoned rows leave here, exactly [[requantize]]
    val live = spark.table(t).select(col("vec_id"), col("v"), col("nrm"))
      .join(spark.table(tst).select(col("vec_id")), Seq("vec_id"), "left_anti")
    val n = live.count()
    require(n > 0, s"cannot requantize an empty index ($t)")
    val all = Seq(t, qc, qf, sqt, pqt, tst)
    all.foreach(x => Bucketed.resetTable(spark, x + "__stage"))
    writeGeneration2(spark, live, n, t + "__stage", qc + "__stage",
      qf + "__stage", sqt + "__stage", pqt + "__stage", tst + "__stage",
      learnedPq)
    all.foreach(x => Bucketed.resetTable(spark, x + "__old"))
    // assignment aside FIRST, promoted LAST — the crash-window
    // invariant [[requantize]] documents; the SQ params swap with the
    // generation (every code row re-encoded against the refreshed
    // (mn, mx), one code book per generation)
    all.foreach(x => spark.sql(s"ALTER TABLE $x RENAME TO ${x}__old"))
    all.reverse.foreach(x => spark.sql(s"ALTER TABLE ${x}__stage RENAME TO $x"))
    all.foreach(x => Bucketed.resetTable(spark, x + "__old"))
    // the generation swapped: cached artifacts describe the OLD one
    invalidateArtifacts(spark, allTables2(dir, tag))
  }

  /** Top-k probe over the persisted two-level index: coarse probe
    * cells selected in-plan against the STORED n^¼ quantizer (only the
    * distinct cell ids reach the driver, as the literal list that
    * bucket-prunes the ccell-bucketed assignment AND the
    * fine-quantizer scan), then the shared [[Similarity.probeIvf2From]]
    * rank+join half — identical results to the inline
    * [[Similarity.topKIvf2]] by construction, and zero corpus-wide
    * jobs at serving time. */
  def topK2(spark: SparkSession, dir: String, maxQueryId: Long,
            k: Int = 5, nProbeCoarse: Int = 2, nProbeFine: Int = 3,
            tag: String = ""): DataFrame = {
    val t = ensureBuilt2(spark, dir, tag)
    val coarse = storedCoarseQuantizer(spark, dir, tag)
    val (qcFrame, cells) =
      probeFrame(spark, dir, maxQueryId, nProbeCoarse, quantizer = Some(coarse))
    val cellLits = cells.map(Int.box).toSeq
    val fine = spark.table(fineQuantizerTableFor(dir, tag))
      .filter(col("ccell").isin(cellLits: _*))
    // tombstones anti-joined COARSE-pruned, the flat probe's rule
    val ts = spark.table(tombstone2TableFor(dir, tag))
      .filter(col("ccell").isin(cellLits: _*)).select(col("vec_id"))
    val asg = spark.table(t).filter(col("ccell").isin(cellLits: _*))
      .join(broadcast(ts), Seq("vec_id"), "left_anti")
    Similarity.probeIvf2From(qcFrame.withColumnRenamed("cell", "ccell"),
      fine, asg, k, nProbeFine)
  }

  /** IVF² × SQ8 probe over the persisted two-level index — the
    * billion-vector serving read path with the byte bound it was
    * missing: coarse probe cells selected in-plan against the stored
    * n^¼ quantizer (only the distinct cell-id literals reach the
    * driver), fine cells ranked per query across the probed coarse
    * cells (the [[Similarity.probeIvf2From]] ranking, verbatim), and
    * the CANDIDATE pass scans only the probed fine cells' CODE rows —
    * bucket-pruned on ccell AND column-pruned to ~1 bit-packed
    * byte/dim (the plan's ReadSchema excludes `v`; `AnnIndexSpec`
    * pins it). The exact rerank re-reads full vectors for
    * queries×rerank rows only, still inside the probed buckets.
    * Tombstones anti-join coarse-pruned, [[topK2]]'s rule. All
    * quantization artifacts (both centroid levels, SQ params, codes)
    * are READ, never derived — zero corpus-wide jobs at serving time,
    * [[topKSq]]'s contract one level down. */
  def topK2Sq(spark: SparkSession, dir: String, maxQueryId: Long,
              k: Int = 5, nProbeCoarse: Int = 2, nProbeFine: Int = 3,
              rerank: Int = 10, tag: String = ""): DataFrame = {
    val t = ensureBuilt2(spark, dir, tag)
    val coarse = storedCoarseQuantizer(spark, dir, tag)
    topK2SqFrom(spark, dir, tag, t,
      probeFrame(spark, dir, maxQueryId, nProbeCoarse, quantizer = Some(coarse)),
      k, nProbeFine, rerank)
  }

  /** [[topKIdsSq]] one level down — the composed billion-vector
    * serving call: explicit query ids ([[topK2Ids]]'s broadcast
    * semi-join side) over the gen-2 SQ8 codes scan ([[topK2Sq]]'s byte
    * bound) with the coarse-pruned tombstone anti-join. Shares
    * [[topK2SqFrom]] with the prefix form, so the two cannot drift. */
  def topK2IdsSq(spark: SparkSession, dir: String, queryIds: DataFrame,
                 k: Int = 5, nProbeCoarse: Int = 2, nProbeFine: Int = 3,
                 rerank: Int = 10, tag: String = ""): DataFrame = {
    val t = ensureBuilt2(spark, dir, tag)
    val coarse = storedCoarseQuantizer(spark, dir, tag)
    topK2SqFrom(spark, dir, tag, t,
      probeFrameFor(spark, dir,
        _.join(broadcast(queryIds.select(col("vec_id"))), Seq("vec_id"), "left_semi"),
        nProbeCoarse, quantizer = Some(coarse), tag = tag),
      k, nProbeFine, rerank)
  }

  /** The coarse-probe → fine-probe → codes-scan → rerank half shared
    * by [[topK2Sq]] and [[topK2IdsSq]]. */
  private def topK2SqFrom(spark: SparkSession, dir: String, tag: String,
                          t: String, pf: (DataFrame, Array[Int]),
                          k: Int, nProbeFine: Int, rerank: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (qcFrame, cells) = pf
    val cellLits = cells.map(Int.box).toSeq
    val (mns, mxs) = storedSqParams2(spark, dir, tag)
    val (steps, basis) = Similarity.sqTerms(mns, mxs)
    val stepL = array(steps.map(lit): _*)
    val basisL = array(basis.map(lit): _*)
    // per-query SQ terms ride the tiny broadcast side, as in [[topKSq]]
    val qc = qcFrame.withColumnRenamed("cell", "ccell")
      .withColumn("qbasis", Similarity.dot(col("qv"), basisL))
      .withColumn("t", zip_with(col("qv"), stepL, (a, b) => a * b))
    val fine = spark.table(fineQuantizerTableFor(dir, tag))
      .filter(col("ccell").isin(cellLits: _*))
    // fine probe: nProbeFine best (s, ccell, fcell) across the probed
    // coarse cells — the exact probeIvf2From ranking, qbasis/t carried
    val wQ = Window.partitionBy(col("q_id"))
      .orderBy(col("s"), col("ccell"), col("fcell"))
    val probes = qc.join(broadcast(fine), Seq("ccell"))
      .withColumn("s",
        lit(-2.0) * Similarity.dot(col("qv"), col("fv")) + col("f2"))
      .withColumn("prn", row_number().over(wQ))
      .filter(col("prn") <= nProbeFine)
      .select(col("ccell"), col("fcell"), col("q_id"), col("qv"), col("qn"),
        col("qbasis"), col("t"))
    val ts = spark.table(tombstone2TableFor(dir, tag))
      .filter(col("ccell").isin(cellLits: _*)).select(col("vec_id"))
    val idx = spark.table(t).filter(col("ccell").isin(cellLits: _*))
      .join(broadcast(ts), Seq("vec_id"), "left_anti")
    val wA = Window.partitionBy(col("q_id"))
      .orderBy(col("approx").desc, col("vec_id").asc)
    val cands = idx.select(col("vec_id"), col("nrm"), col("ccell"),
        col("fcell"), col("codes"))
      .join(broadcast(probes), Seq("ccell", "fcell"))
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

  /** IVF² × PQ probe over the persisted two-level index — the
    * sub-byte billion-vector read path ([[topKIdxPq]]'s contract one
    * level down, on the tier where 4-bit codes matter most): coarse
    * probe cells selected in-plan against the stored n^¼ quantizer,
    * fine cells ranked per query across the probed coarse cells (the
    * [[Similarity.probeIvf2From]] ranking, qtbl carried), and the
    * CANDIDATE pass scans only the probed fine cells' `pqcodes` rows —
    * bucket-pruned on ccell AND column-pruned to m/2 nibble-packed
    * bytes (a PHYSICAL 4 bits/dim — 16× below the SQ8 row, 128× below
    * the vectors) — ranked by the
    * native ADC fold against per-query tables built from the STORED
    * gen-2 codebook. Exact rerank re-reads full vectors for
    * queries×rerank rows only; tombstones anti-join coarse-pruned. */
  def topK2Pq(spark: SparkSession, dir: String, maxQueryId: Long,
              k: Int = 5, nProbeCoarse: Int = 2, nProbeFine: Int = 3,
              rerank: Int = 24, tag: String = ""): DataFrame = {
    val t = ensureBuilt2(spark, dir, tag)
    val coarse = storedCoarseQuantizer(spark, dir, tag)
    topK2PqFrom(spark, dir, tag, t,
      probeFrame(spark, dir, maxQueryId, nProbeCoarse, quantizer = Some(coarse)),
      k, nProbeFine, rerank)
  }

  /** [[topKIdsPq]] one level down — explicit query ids over the gen-2
    * packed `pqcodes` scan with the coarse-pruned tombstone anti-join:
    * the composed sub-byte billion-vector serving call. Shares
    * [[topK2PqFrom]] with the prefix form, so the two cannot drift. */
  def topK2IdsPq(spark: SparkSession, dir: String, queryIds: DataFrame,
                 k: Int = 5, nProbeCoarse: Int = 2, nProbeFine: Int = 3,
                 rerank: Int = 24, tag: String = ""): DataFrame = {
    val t = ensureBuilt2(spark, dir, tag)
    val coarse = storedCoarseQuantizer(spark, dir, tag)
    topK2PqFrom(spark, dir, tag, t,
      probeFrameFor(spark, dir,
        _.join(broadcast(queryIds.select(col("vec_id"))), Seq("vec_id"), "left_semi"),
        nProbeCoarse, quantizer = Some(coarse), tag = tag),
      k, nProbeFine, rerank)
  }

  /** The coarse-probe → fine-probe → packed-ADC-scan → rerank half
    * shared by [[topK2Pq]] and [[topK2IdsPq]]. */
  private def topK2PqFrom(spark: SparkSession, dir: String, tag: String,
                          t: String, pf: (DataFrame, Array[Int]),
                          k: Int, nProbeFine: Int, rerank: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (qcFrame, cells) = pf
    val cellLits = cells.map(Int.box).toSeq
    val cb = storedPqCodebook2(spark, dir, tag)
    require(cb.length == PqKsub,
      s"stored gen-2 PQ codebook has ${cb.length} rows, need exactly $PqKsub")
    // per-query ADC tables ride the tiny broadcast side, as in
    // [[topK2SqFrom]]'s qbasis/t terms
    val qc = Similarity.pqQueryTbl(
      qcFrame.withColumnRenamed("cell", "ccell"), cb, PqM)
    val fine = spark.table(fineQuantizerTableFor(dir, tag))
      .filter(col("ccell").isin(cellLits: _*))
    val wQ = Window.partitionBy(col("q_id"))
      .orderBy(col("s"), col("ccell"), col("fcell"))
    val probes = qc.join(broadcast(fine), Seq("ccell"))
      .withColumn("s",
        lit(-2.0) * Similarity.dot(col("qv"), col("fv")) + col("f2"))
      .withColumn("prn", row_number().over(wQ))
      .filter(col("prn") <= nProbeFine)
      .select(col("ccell"), col("fcell"), col("q_id"), col("qv"), col("qn"),
        col("qtbl"))
    val ts = spark.table(tombstone2TableFor(dir, tag))
      .filter(col("ccell").isin(cellLits: _*)).select(col("vec_id"))
    val idx = spark.table(t).filter(col("ccell").isin(cellLits: _*))
      .join(broadcast(ts), Seq("vec_id"), "left_anti")
    val wA = Window.partitionBy(col("q_id"))
      .orderBy(col("approx").desc, col("vec_id").asc)
    val cands = idx.select(col("vec_id"), col("nrm"), col("ccell"),
        col("fcell"), col("pqcodes"))
      .join(broadcast(probes), Seq("ccell", "fcell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("approx",
        graft.functions.VectorExprs.pqAdcPacked(col("pqcodes"), col("qtbl"), PqKsub) /
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

  /** [[topKIds]] for the two-level index — the explicit-query-id
    * serving call one level down: same broadcast semi-join query side,
    * same coarse-pruned scans and tombstone anti-join as [[topK2]]. */
  def topK2Ids(spark: SparkSession, dir: String, queryIds: DataFrame,
               k: Int = 5, nProbeCoarse: Int = 2, nProbeFine: Int = 3,
               tag: String = ""): DataFrame = {
    val t = ensureBuilt2(spark, dir, tag)
    val coarse = storedCoarseQuantizer(spark, dir, tag)
    val (qcFrame, cells) = probeFrameFor(spark, dir,
      _.join(broadcast(queryIds.select(col("vec_id"))), Seq("vec_id"), "left_semi"),
      nProbeCoarse, quantizer = Some(coarse), tag = tag)
    val cellLits = cells.map(Int.box).toSeq
    val fine = spark.table(fineQuantizerTableFor(dir, tag))
      .filter(col("ccell").isin(cellLits: _*))
    val ts = spark.table(tombstone2TableFor(dir, tag))
      .filter(col("ccell").isin(cellLits: _*)).select(col("vec_id"))
    val asg = spark.table(t).filter(col("ccell").isin(cellLits: _*))
      .join(broadcast(ts), Seq("vec_id"), "left_anti")
    Similarity.probeIvf2From(qcFrame.withColumnRenamed("cell", "ccell"),
      fine, asg, k, nProbeFine)
  }

  def topKSq(spark: SparkSession, dir: String, maxQueryId: Long,
             k: Int = 5, nProbe: Int = 2, rerank: Int = 15,
             tag: String = ""): DataFrame = {
    val t = ensureBuilt(spark, dir, tag)
    topKSqFrom(spark, dir, tag, t,
      probeFrame(spark, dir, maxQueryId, nProbe, tag = tag), k, rerank)
  }

  /** The COMPOSED production serving call on the flat tier: explicit
    * query ids ([[topKIds]]'s broadcast semi-join query side) over the
    * SQ8 codes-only candidate scan ([[topKSq]]'s byte bound) with the
    * tombstone anti-join — the three serving optimizations a real
    * retrieval service wants at once. Identical plan shape to
    * [[topKSq]] past the probe frame (the shared [[topKSqFrom]] half),
    * so the explicit-id path cannot drift from the hash-checked
    * prefix path. */
  def topKIdsSq(spark: SparkSession, dir: String, queryIds: DataFrame,
                k: Int = 5, nProbe: Int = 2, rerank: Int = 15,
                tag: String = ""): DataFrame = {
    val t = ensureBuilt(spark, dir, tag)
    topKSqFrom(spark, dir, tag, t,
      probeFrameFor(spark, dir,
        _.join(broadcast(queryIds.select(col("vec_id"))), Seq("vec_id"), "left_semi"),
        nProbe, tag = tag), k, rerank)
  }

  /** IVF × PQ probe over the persisted index — the stored form of
    * [[Similarity.topKIvfPq]] and the sub-byte serving read path: the
    * candidate pass scans ONLY the probed cells' buckets (bucket-pruned
    * literal IN filter) and ONLY the `pqcodes` column (m/2
    * nibble-packed bytes — a PHYSICAL 4 bits/dim, 16× below the SQ8
    * row and 128× below the vectors), ranks by the native m-lookup
    * ADC fold (nibbles decoded by shift/mask inside the gather loop)
    * ([[graft.functions.PqAdcF64]]) against per-query tables built from
    * the STORED codebook, and the exact rerank re-reads full vectors
    * for queries×rerank rows only — still inside the probed buckets.
    * Tombstones anti-join cell-pruned, [[topK]]'s rule. Every
    * quantization artifact (centroids, codebook, codes) is READ, never
    * derived: zero corpus-wide jobs at serving time, [[topKSq]]'s
    * contract at the next compression tier. */
  def topKIdxPq(spark: SparkSession, dir: String, maxQueryId: Long,
                k: Int = 5, nProbe: Int = 2, rerank: Int = 30,
                tag: String = ""): DataFrame = {
    val t = ensureBuilt(spark, dir, tag)
    topKPqFrom(spark, dir, tag, t,
      probeFrame(spark, dir, maxQueryId, nProbe, tag = tag), k, rerank)
  }

  /** [[topKIdsPq]] — the explicit-query-id serving call over the
    * stored PQ codes: [[topKIds]]' broadcast semi-join query side
    * composed with [[topKIdxPq]]'s pqcodes-only ADC candidate scan and
    * the tombstone anti-join — the sub-byte tier of the composed
    * production serving call ([[topKIdsSq]]'s contract at 4 bits/dim).
    * Shares [[topKPqFrom]] with the prefix form, so the explicit-id
    * path cannot drift from the hash-checked one. */
  def topKIdsPq(spark: SparkSession, dir: String, queryIds: DataFrame,
                k: Int = 5, nProbe: Int = 2, rerank: Int = 30,
                tag: String = ""): DataFrame = {
    val t = ensureBuilt(spark, dir, tag)
    topKPqFrom(spark, dir, tag, t,
      probeFrameFor(spark, dir,
        _.join(broadcast(queryIds.select(col("vec_id"))), Seq("vec_id"), "left_semi"),
        nProbe, tag = tag), k, rerank)
  }

  /** The codebook-read → ADC-scan → rerank half shared by [[topKIdxPq]]
    * (prefix queries) and [[topKIdsPq]] (explicit ids). */
  private def topKPqFrom(spark: SparkSession, dir: String, tag: String,
                         t: String, pf: (DataFrame, Array[Int]),
                         k: Int, rerank: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (probesDf, cells) = pf
    val cellLits = cells.map(Int.box).toSeq
    val cb = storedPqCodebook(spark, dir, tag)
    // the stored codebook must carry exactly PqKsub rows — the ADC
    // fold's gather stride; a truncated/mismatched artifact would read
    // out of bounds silently (same guard as Similarity.pqPieces)
    require(cb.length == PqKsub,
      s"stored PQ codebook has ${cb.length} rows, need exactly $PqKsub")
    val probes = Similarity.pqQueryTbl(probesDf, cb, PqM)
    val idx = dropTombstoned(spark, dir, tag,
      spark.table(t).filter(col("cell").isin(cellLits: _*)), cellLits)
    val wA = Window.partitionBy(col("q_id")).orderBy(col("approx").desc, col("vec_id").asc)
    val cands = idx.select(col("vec_id"), col("nrm"), col("cell"), col("pqcodes"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("approx",
        graft.functions.VectorExprs.pqAdcPacked(col("pqcodes"), col("qtbl"), PqKsub) /
          (col("nrm") * col("qn")))
      .withColumn("crn", row_number().over(wA))
      .filter(col("crn") <= rerank)
      .select(col("q_id"), col("vec_id"), col("qv"), col("qn"))
    val wF = Window.partitionBy(col("q_id")).orderBy(col("score").desc, col("vec_id").asc)
    idx.select(col("vec_id"), col("v"), col("nrm"))
      .join(broadcast(cands), Seq("vec_id"))
      .withColumn("score",
        round(Similarity.cosine(col("v"), col("nrm"), col("qv"), col("qn")), 4))
      .withColumn("rn", row_number().over(wF))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("rn"), col("vec_id"), col("score"))
  }

  /** The quantize→scan→rerank half shared by [[topKSq]] (prefix
    * queries) and [[topKIdsSq]] (explicit ids): per-query SQ terms ride
    * the broadcast side, candidates rank by the decomposed approximate
    * cosine over the bucket-pruned CODE scan, exact rerank re-reads
    * full vectors for queries×rerank rows only. */
  private def topKSqFrom(spark: SparkSession, dir: String, tag: String,
                         t: String, pf: (DataFrame, Array[Int]),
                         k: Int, rerank: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (probesDf, cells) = pf
    val cellLits = cells.map(Int.box).toSeq
    val (mns, mxs) = storedSqParams(spark, dir, tag)
    val (steps, basis) = Similarity.sqTerms(mns, mxs)
    val stepL = array(steps.map(lit): _*)
    val basisL = array(basis.map(lit): _*)
    val probes = probesDf
      .withColumn("qbasis", Similarity.dot(col("qv"), basisL))
      .withColumn("t", zip_with(col("qv"), stepL, (a, b) => a * b))
    val idx = dropTombstoned(spark, dir, tag,
      spark.table(t).filter(col("cell").isin(cellLits: _*)), cellLits)
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
