package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scale police for the whole query registry: every registered query's
  * physical plan is audited for the operators that do not survive a
  * 100× scale-up. A new query that sneaks in an unbounded cartesian or
  * a driver-side collect fails here, not in production.
  */
class PlanAuditSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** `topk` broadcasts a LIMIT-bounded query set (q rows,
    * `vec_id < maxQueryId`) against the corpus — a BroadcastNestedLoop
    * shape, but O(q·n) with q fixed, not O(n²); its IVF twins
    * (`topk_ivf`/`_kmeans`) are the sub-linear scale path. `topk_sq`
    * is the same query-bounded scan over the 8-bit CODE table (the
    * point of SQ8: the per-query pass reads ~4× fewer bytes, and
    * composes with the IVF cell key when sub-linear candidate
    * selection is wanted); its rerank join is queries×rerank rows
    * broadcast against an equi-join on vec_id — bounded.
    * Nothing data-sized-by-data-sized is allowlisted anymore: the
    * former `embed_neardup` cartesian baseline now lives only in
    * OpsSpec as the LSH recall yardstick. */
  private val queryBoundedScans =
    Set("topk", "topk_sq", "topk_pq")

  /** Cross-joins whose inputs are single-row scalar aggregates by
    * construction (1×1×1) — `Lookups.stats` combines three global
    * counts; the nested-loop shape is over one row per side. */
  private val scalarCombines = Set("evm_stats")

  test("no registered query plans a cartesian / nested-loop join over data-sized inputs") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val physical = q(spark, sfDir).queryExecution.executedPlan.toString
      val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
        .filter(physical.contains)
      if (bad.nonEmpty && !queryBoundedScans(name) && !scalarCombines(name))
        Some(name -> bad)
      else None
    }
    assert(offenders.isEmpty,
      s"unbounded join shapes outside the baseline allowlist: $offenders")
  }

  test("no registered query runs a global (unpartitioned) window over non-aggregated data") {
    // An empty partitionSpec moves ALL rows to one partition — fatal at
    // 100 TB unless the input is already cardinality-bounded by an
    // aggregation below it (e.g. qbudget's ≤10001-row bin frame).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    // ReusedExchangeExec is a leaf pointing at an exchange planned
    // elsewhere — chase the reference or a reused aggregate looks
    // unbounded (qbudget's bin frame plans exactly this way).
    def hasAggBelow(p: SparkPlan): Boolean =
      p.collectFirst { case a: BaseAggregateExec => a }.isDefined ||
        p.collect { case r: ReusedExchangeExec => r }.exists(r => hasAggBelow(r.child))
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // plain tree, collectable statically
    try {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
        val plan = q(spark, sfDir).queryExecution.executedPlan
        val bad = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty && !hasAggBelow(w.child) => w
        }
        if (bad.nonEmpty) Some(name) else None
      }
      assert(offenders.isEmpty,
        s"global window over unbounded input (single-partition at scale): $offenders")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("mm_decode plans as a pure codegen'd projection — no object-serialization boundary") {
    // the decode is md5 + bounded-head regexp over a scan: any
    // mapPartitions/typed hop would show up as (De)SerializeFromObject
    // and break whole-stage codegen right where 100 TB of payload
    // bytes stream through
    val physical = SparkEntry.queries("mm_decode")(spark, sfDir)
      .queryExecution.executedPlan.toString
    for (op <- Seq("MapPartitions", "SerializeFromObject", "DeserializeToObject", "AppendColumns"))
      assert(!physical.contains(op),
        s"mm_decode must stay declarative; found $op in:\n$physical")
    // without the registry entry's deterministic output sort, the op
    // itself is one codegen'd shuffle-free stage: scan → project (AQE
    // off so the printed plan shows the codegen spans statically)
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val raw = graft.ops.Multimodal.decodeFeaturesExpr(
        graft.ops.Multimodal.withPayload(
          graft.tables.Fixtures.documents(spark, sfDir)))
        .queryExecution.executedPlan.toString
      assert(!raw.contains("Exchange"), s"decode is map-only — no shuffle:\n$raw")
      // toString renders a whole-stage-codegen span as the `*(n)` prefix
      assert(raw.startsWith("*("),
        s"decode projection must run inside whole-stage codegen:\n$raw")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }

  test("stored-ref scoring plans carry no corpus-wide aggregation — the O(batch) serving claim") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    // the corpus is read path-based (no catalog entry); the stored
    // refs are catalog tables — that difference classifies every leaf
    def corpusScans(p: LogicalPlan): Int = p.collectLeaves().count {
      case r: LogicalRelation => r.catalogTable.isEmpty
      case _ => false
    }
    def tableScan(p: LogicalPlan, prefix: String): Boolean =
      p.collectLeaves().exists {
        case r: LogicalRelation =>
          r.catalogTable.exists(_.identifier.table.startsWith(prefix))
        case _ => false
      }
    // BM25 from stored refs: the plan's ONLY aggregations are the
    // term-filtered (doc, term) tf count and the per-doc score sum —
    // the corpus-wide df and stats aggregations are gone (df is a
    // stored-table probe; stats collapse to driver literals from the
    // stored 1-row table). The corpus itself is scanned exactly once.
    val bm25 = SparkEntry.queries("bm25_stored")(spark, sfDir)
      .queryExecution.optimizedPlan
    val bmAggs = bm25.collect { case a: Aggregate => a }
    assert(bmAggs.size == 2,
      s"bm25 stored-ref plan must aggregate only tf + per-doc score, found ${bmAggs.size}:\n$bm25")
    assert(corpusScans(bm25) == 1,
      s"bm25 stored-ref plan must scan the corpus once, found ${corpusScans(bm25)}:\n$bm25")
    assert(tableScan(bm25, "text_bm25df_"),
      "the stored df table must appear in the scoring plan")

    // LM score from the stored model: the only aggregation is the
    // per-doc mean; the pair/prev/unigram/total counts are stored-table
    // broadcasts. The corpus appears twice by design (bigram stream +
    // the left join that scores pairless docs 0) — both O(batch) scans.
    val lm = SparkEntry.queries("text_lm_stored")(spark, sfDir)
      .queryExecution.optimizedPlan
    val lmAggs = lm.collect { case a: Aggregate => a }
    assert(lmAggs.size == 1,
      s"lm stored-model plan must aggregate only the per-doc mean, found ${lmAggs.size}:\n$lm")
    assert(corpusScans(lm) <= 2,
      s"lm stored-model plan must scan the batch at most twice, found ${corpusScans(lm)}:\n$lm")
    assert(tableScan(lm, "text_lmbi_") && tableScan(lm, "text_lmuni_"),
      "both stored model tables must appear in the scoring plan")

    // Trained classifier from stored weights: the only aggregation is
    // the per-doc (count, sum) — the training pass (per-class bucket
    // counts + class totals) is gone, replaced by the dim-row weight
    // table probe. One corpus scan: the batch being scored.
    val cls = SparkEntry.queries("clf_stored")(spark, sfDir)
      .queryExecution.optimizedPlan
    val clsAggs = cls.collect { case a: Aggregate => a }
    assert(clsAggs.size == 1,
      s"classifier stored-weights plan must aggregate only per-doc, found ${clsAggs.size}:\n$cls")
    assert(corpusScans(cls) == 1,
      s"classifier stored-weights plan must scan the batch once, found ${corpusScans(cls)}:\n$cls")
    assert(tableScan(cls, "text_clsw_"),
      "the stored weight table must appear in the scoring plan")
  }

  test("the query-bounded scans still have their scale-path twins registered") {
    // pins that the LSH/IVF twins exist and stay oracle-checked
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q("embed_lsh") && o("embed_lsh"))
    assert(q("topk_ivf") && o("topk_ivf"))
    assert(q("topk_kmeans") && o("topk_kmeans"))
  }

  test("every registered query has a DuckDB oracle") {
    // no rows-only exemptions: every entry is hash-checked (the former
    // dedup_simhash exemption was dead — it has carried a real oracle
    // since round 13, and a live exemption would mask its deletion)
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without an oracle: $missing")
    val stale = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"oracles without a query: $stale")
  }
}
