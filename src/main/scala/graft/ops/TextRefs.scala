package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.tables.{Bucketed, Fixtures}

/** Stored scoring references: the corpus-wide statistics BM25 and the
  * bigram-LM scorer need — document frequencies, corpus stats, the
  * conditional-bigram and unigram tables — written ONCE per corpus as
  * warehouse tables and probed by every subsequent scoring batch.
  *
  * This is the [[AnnIndex.ensureBuilt]] write-once/serve-many pattern
  * applied to the text family: the inline forms
  * ([[TextAnalysis.searchBm25]] / [[TextAnalysis.lmScore]] with no
  * refs) recompute the corpus aggregations inside every query — fine
  * for a one-shot batch, wrong for a serving system answering many
  * queries against one corpus. With the refs stored, a scoring plan
  * carries NO corpus-wide aggregation at all: BM25 touches the
  * term-matched tokens plus |terms| stored-df rows (the 1-row stats
  * table collapses to driver literals), the LM scorer probes two
  * K-row broadcasts — O(batch) per query, machine-checked by
  * `PlanAuditSpec`'s aggregate-count pins. Staleness contract: a
  * stats table one ingest batch behind shifts every score by the same
  * hair, so rankings degrade gracefully between refresh builds
  * (re-run ensure* after a corpus rewrite; the tables are per-corpus,
  * keyed by the source directory like the ANN index).
  */
object TextRefs {

  /** One table set per source directory (sf0.01 and sf0.1 runs in the
    * same warehouse must never read each other's refs). */
  private def refTable(dir: String, kind: String): String =
    s"text_${kind}_" + graft.evm.EvmDerive.md5hex(dir).take(8)

  def bm25DfTable(dir: String): String = refTable(dir, "bm25df")
  def bm25StatsTable(dir: String): String = refTable(dir, "bm25st")
  def lmTable(dir: String): String = refTable(dir, "lmbi")
  def lmUniTable(dir: String): String = refTable(dir, "lmuni")

  /** Build the BM25 refs (full-vocabulary df + 1-row corpus stats) if
    * this session/warehouse does not have them yet. Idempotent. */
  def ensureBm25(spark: SparkSession, dir: String): Unit = synchronized {
    val dfT = bm25DfTable(dir)
    val stT = bm25StatsTable(dir)
    if (!spark.catalog.tableExists(dfT) || !spark.catalog.tableExists(stT)) {
      Bucketed.resetTable(spark, dfT)
      Bucketed.resetTable(spark, stT)
      val docs = Fixtures.documents(spark, dir)
      TextAnalysis.bm25DfRef(docs).write.saveAsTable(dfT)
      TextAnalysis.bm25StatsRef(docs).write.saveAsTable(stT)
    }
  }

  /** Build the LM model tables (top-K conditional bigrams + top-K
    * unigram backoff) if absent. The Ks are part of the model identity
    * — a caller scoring against these tables gets exactly the model
    * they encode, regardless of what K it would have trained inline. */
  def ensureLm(spark: SparkSession, dir: String, topK: Int = 500,
               topUni: Int = 100): Unit = synchronized {
    val biT = lmTable(dir)
    val uniT = lmUniTable(dir)
    if (!spark.catalog.tableExists(biT) || !spark.catalog.tableExists(uniT)) {
      Bucketed.resetTable(spark, biT)
      Bucketed.resetTable(spark, uniT)
      val docs = Fixtures.documents(spark, dir)
      val pairs = TextAnalysis.sharedBigramRows(docs)
      TextAnalysis.lmRef(docs, topK, pairsIn = Some(pairs)).write.saveAsTable(biT)
      TextAnalysis.commonnessRef(docs, topUni).write.saveAsTable(uniT)
    }
  }

  /** [[TextAnalysis.searchBm25]] serving from the stored refs: the
    * scoring plan scans the corpus once (term-filtered before any
    * shuffle) and the df table once — zero corpus-wide aggregation. */
  def searchBm25Stored(spark: SparkSession, dir: String, terms: Seq[String],
                       topN: Int = 20): DataFrame = {
    ensureBm25(spark, dir)
    TextAnalysis.searchBm25(Fixtures.documents(spark, dir), terms, topN = topN,
      dfRef = Some(spark.table(bm25DfTable(dir))),
      statsRef = Some(spark.table(bm25StatsTable(dir))))
  }

  /** [[TextAnalysis.lmScore]] serving from the stored model: the
    * scoring plan is the per-batch bigram stream probing two K-row
    * broadcasts — its only aggregation is the per-doc mean. */
  def lmScoreStored(spark: SparkSession, dir: String): DataFrame = {
    ensureLm(spark, dir)
    val docs = Fixtures.documents(spark, dir)
    TextAnalysis.lmScore(docs,
      ref = Some(spark.table(lmTable(dir))),
      uniRef = Some(spark.table(lmUniTable(dir))))
  }

  def classifierTable(dir: String): String = refTable(dir, "clsw")

  /** Build the trained-classifier weight table
    * ([[TextAnalysis.classifierTrainNb]]: NB log-odds over the hashed
    * feature buckets, `lang = 'en'` supervision on the even-doc_id
    * split) if absent. Train ONCE, store the dim-row table — the
    * labeled-corpus training scan must not re-run inside every scoring
    * batch (it was 6.1 s per invocation at sf1). The supervision
    * column and split are part of the model identity, like the LM's
    * Ks. */
  def ensureClassifier(spark: SparkSession, dir: String,
                       dim: Int = 1024): Unit = synchronized {
    val t = classifierTable(dir)
    if (!spark.catalog.tableExists(t)) {
      Bucketed.resetTable(spark, t)
      val docs = Fixtures.documents(spark, dir)
      TextAnalysis.classifierTrainNb(docs, col("lang") === "en", dim)
        .write.saveAsTable(t)
    }
  }

  /** [[TextAnalysis.classifierScoreWeighted]] serving from the stored
    * trained weights: the scoring plan is one corpus token scan
    * broadcast-joined to the dim-row weight table — its only
    * aggregation is the per-doc (count, sum), zero training
    * aggregations (PlanAuditSpec-pinned). */
  def classifierScoreStored(spark: SparkSession, dir: String,
                            dim: Int = 1024): DataFrame = {
    ensureClassifier(spark, dir, dim)
    TextAnalysis.classifierScoreWeighted(Fixtures.documents(spark, dir),
      spark.table(classifierTable(dir)), dim)
  }
}
