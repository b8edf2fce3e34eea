package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}
import graft.tables.Fixtures

/** Sub-document curation operators: boilerplate segment removal
  * (RefinedWeb/CCNet-style line dedup), cross-document duplicated
  * substring spans (the suffix-array use case of Lee et al. 2021,
  * re-expressed as distributed rolling-shingle islands), and the
  * fastText-shaped hashed linear quality classifier.
  *
  * Every data-dependent decision is md5-derived integer arithmetic, so
  * each query carries a full DuckDB differential oracle — including
  * the span merge, whose lag + cumulative-sum island windows are
  * partitioned by doc_id in both engines.
  */
object SpanQueries {

  private val SegTokens = 5
  private val MinDocs = 3
  private val SpanTokens = 8
  // public: Bench's prelude warms the shared feature base at THIS dim
  // so the warmed plan and the served plan cannot drift (the cache is
  // keyed by the canonicalized plan — a literal mismatch is a miss)
  val ClassifierDim = 1024

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the corpus's recurring segments (the fixture's near-dup docs
    // supply the recurrence a crawl's nav bars / cookie banners
    // would); both boilerplate entries draw from the session-shared
    // persisted segment base, like the span family's shingle base
    "text_bp" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      TextAnalysis.boilerplateSegments(docs, SegTokens, MinDocs,
        segments = Some(TextAnalysis.sharedSegmentRows(docs, SegTokens)))
        .orderBy(col("n_docs").desc, col("seg_hash"))
    }),

    // APPLY: every doc rebuilt without its boilerplate segments
    // (row-sized md5 proof of the scrubbed text, piiScrub convention)
    "text_bp_apply" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      TextAnalysis.scrubBoilerplate(docs, SegTokens, MinDocs,
        segments = Some(TextAnalysis.sharedSegmentRows(docs, SegTokens)))
        .orderBy(col("doc_id"))
    }),

    // duplicated runs INSIDE otherwise-unique documents — doc-level
    // dedup can't see these; positions let a scrubber cut the span.
    // All three span entries draw from the session-shared persisted
    // shingle base (cache-manager keyed on the canonical plan), so
    // the explode+md5 stage materializes once per session.
    // spans and apply share ONE session-cached span frame
    // (sharedDuplicatedSpans) on top of the shared shingle base — the
    // duplicated-hash aggregation runs once per session, not per entry
    "substr_spans" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      Dedup.sharedDuplicatedSpans(docs, SpanTokens)
        .orderBy(col("doc_id"), col("span_start"))
    }),

    // the daily-batch form: spans for the fresh fifth of the corpus
    // only, duplicated against corpus ∪ fresh via the storable
    // per-hash count table — the corpus text is never re-shingled
    // when the counts are stored (here both sides filter the shared
    // shingle base: shingling is row-local, so filter and shingle
    // commute)
    "substr_inc" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      val base = Dedup.sharedPositionedShingleRows(docs, SpanTokens)
      // the per-hash corpus count table is the operator's own storable
      // artifact ("computed once and STORED" — its scaladoc); the
      // session-shared cache is the registry's stand-in for that
      // store, so repeated batches never re-aggregate the corpus side
      val corpusCounts = graft.ops.SharedCaches.sharedCut(
        base.filter(col("doc_id") % 5 =!= 0)
          .groupBy(col("h")).agg(countDistinct(col("doc_id")).as("n_corpus")),
        "substring")
      Dedup.incrementalDuplicatedSpans(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0),
        SpanTokens, minDocs = 2,
        corpusShingleCounts = Some(corpusCounts),
        freshShingles = Some(base.filter(col("doc_id") % 5 === 0)))
        .orderBy(col("doc_id"), col("span_start"))
    }),

    // APPLY: every doc rebuilt with its duplicated spans cut out
    // (row-sized md5 proof; span-less docs pass through unchanged)
    "substr_apply" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      Dedup.scrubSpans(docs, SpanTokens, minDocs = 2,
        spansIn = Some(Dedup.sharedDuplicatedSpans(docs, SpanTokens)))
        .orderBy(col("doc_id"))
    }),

    // the production crawl boundary: newline-split line segments
    // (RefinedWeb/CCNet's actual line-dedup unit). The fixture docs
    // are single-line, so each doc is one whole-text line and
    // "recurring segment" degenerates to exact-dup text — a boundary
    // case the operator and oracle must (and do) agree on.
    "text_bp_lines" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      TextAnalysis.scrubBoilerplate(docs, minDocs = MinDocs,
        segments = Some(TextAnalysis.lineSegmentRows(docs)), joinWith = "\n")
        .orderBy(col("doc_id"))
    }),

    // hashed-BOW linear classifier score per doc, exact integer sum.
    // The (doc_id, bucket) hashed-token stream is the SAME feature
    // space DSIR consumes (featBucket has one owner), so the whole
    // classifier family projects the session-cached sharedFeatureRows
    // materialization instead of re-paying tokenize+md5 per entry
    "clf" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      TextAnalysis.classifierScore(docs, ClassifierDim,
          bucketRows = Some(graft.ops.Curation.sharedFeatureRows(docs, ClassifierDim)))
        .orderBy(col("doc_id"))
    }),

    // the TRAINED-model path: the same score via a stored (bucket,
    // weight) table broadcast into a per-token equi-join — here fed
    // the md5-derived weights as the table, so the join path is
    // differential-checked against the same closed-form oracle family
    "clf_weighted" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      TextAnalysis.classifierScoreWeighted(docs,
        TextAnalysis.classifierWeightsRef(docs, ClassifierDim), ClassifierDim,
        bucketRows = Some(graft.ops.Curation.sharedFeatureRows(docs, ClassifierDim)))
        .orderBy(col("doc_id"))
    }),

    // the model LEARNED, not a stand-in: closed-form Naive Bayes
    // log-odds (integer ppb + bin-length floor-log₂, the DSIR
    // engine-exact primitives) fit on the even-doc_id half with
    // lang='en' as supervision, then scored through the SAME stored-
    // table broadcast join as _weighted — train swaps the table, the
    // serving plan is untouched. Both the training scan and the
    // scoring scan project the shared hashed-token base (it carries
    // `lang`, the supervision column)
    "clf_trained" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      val fb = graft.ops.Curation.sharedFeatureRows(docs, ClassifierDim)
      TextAnalysis.classifierScoreWeighted(docs,
        TextAnalysis.classifierTrainNb(docs, col("lang") === "en", ClassifierDim,
          bucketRows = Some(fb)),
        ClassifierDim, bucketRows = Some(fb))
        .orderBy(col("doc_id"))
    }),

    // the PRODUCTION serving shape for the trained model: weights
    // written once as a warehouse table (TextRefs.ensureClassifier),
    // scoring is the same broadcast join with ZERO training
    // aggregations in the plan (PlanAuditSpec-pinned) — train once,
    // serve O(batch). Oracle = classifier_trained's verbatim: the
    // stored table must hold exactly the model the inline train fits.
    "clf_stored" -> ((s, dir) =>
      graft.ops.TextRefs.classifierScoreStored(s, dir, ClassifierDim)
        .orderBy(col("doc_id"))),

    // the training loop CLOSED with a measured quality number: the
    // stored weights score the deterministic md5-bucket holdout
    // (splitAssign's valid + test bands — disjoint from nothing by
    // construction, but UNSEEN label-wise for every odd doc_id since
    // training reads only the even half) and the entry emits integer
    // confusion counts per split. actual = the supervision label
    // (lang = 'en'), predicted = the serving rule (feat_sum >= 0).
    // Every primitive (md5 split bands, NB ppb weights, per-doc sums)
    // is engine-exact, so the confusion matrix itself is hash-checked
    // — a training or serving regression moves a count, not a vibe.
    // Docs absent from the scored stream (null/empty text) drop from
    // the eval in both engines identically (inner join).
    "clf_eval" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      val scored = graft.ops.TextRefs.classifierScoreStored(s, dir, ClassifierDim)
      val split = graft.ops.Curation.splitAssign(docs)
        .select(col("doc_id"), col("split"))
      val actual = docs.select(col("doc_id"), (col("lang") === "en").as("pos"))
      scored.join(split, "doc_id").join(actual, "doc_id")
        .filter(col("split") =!= "train")
        .groupBy(col("split")).agg(
          sum(when(col("keep") && col("pos"), 1L).otherwise(0L)).as("tp"),
          sum(when(col("keep") && !col("pos"), 1L).otherwise(0L)).as("fp"),
          sum(when(!col("keep") && col("pos"), 1L).otherwise(0L)).as("fn"),
          sum(when(!col("keep") && !col("pos"), 1L).otherwise(0L)).as("tn"),
          count(lit(1)).as("n"))
        .withColumn("accuracy_bp", expr("(tp + tn) * 10000 div n"))
        .orderBy(col("split"))
    })
  )

  /** Shared segment CTE: non-overlapping SegTokens-token windows, the
    * last segment keeping the short tail — mirrors
    * [[TextAnalysis.segmentRows]] exactly (0-based seg_idx, clamped
    * slice). Window indices come from DuckDB's LIST-valued range()
    * unnested per row, so the bound derives from each doc's own token
    * count — no constant superset for a regenerated fixture's longer
    * docs to outgrow. Null text coalesces to '' on both engines
    * (segmentRows applies the same coalesce). */
  private val segCte =
    s"""WITH toks AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t FROM documents),
       |seg0 AS (SELECT doc_id, t,
       |  unnest(range(0, (len(t)+${SegTokens - 1})//$SegTokens)) AS i FROM toks),
       |seg AS (SELECT doc_id, i AS seg_idx,
       |  array_to_string(t[(i*$SegTokens+1):((i+1)*$SegTokens)], ' ') AS seg FROM seg0),
       |""".stripMargin

  /** Shared positioned-shingle CTE: one row per (doc_id, token
    * position p), h = md5 of the SpanTokens tokens starting there —
    * mirrors [[Dedup.positionedShingleRows]] (0-based p, docs shorter
    * than the span window produce an empty range, i.e. no rows, which
    * is exactly the operator's size() filter). Same lateral-bound /
    * null-coalesce discipline as [[segCte]]. */
  private val shingleCte =
    s"""WITH toks AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t FROM documents),
       |sh0 AS (SELECT doc_id, t,
       |  unnest(range(0, len(t)-${SpanTokens - 1})) AS p FROM toks),
       |sh AS (SELECT doc_id, p,
       |  md5(array_to_string(t[(p+1):(p+$SpanTokens)], ' ')) AS h FROM sh0),
       |""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "text_bp" -> (segCte +
      s"""cnt AS (SELECT md5(seg) AS seg_hash, min(seg) AS seg,
         |  COUNT(DISTINCT doc_id)::BIGINT AS n_docs, COUNT(*)::BIGINT AS n_hits
         |  FROM seg GROUP BY md5(seg))
         |SELECT seg_hash, seg, n_docs, n_hits FROM cnt WHERE n_docs >= $MinDocs
         |ORDER BY n_docs DESC, seg_hash""".stripMargin),

    "text_bp_apply" -> (segCte +
      s"""bp AS (SELECT md5(seg) AS seg_hash FROM seg
         |  GROUP BY md5(seg) HAVING COUNT(DISTINCT doc_id) >= $MinDocs),
         |kept AS (SELECT s.doc_id,
         |  string_agg(s.seg, ' ' ORDER BY s.seg_idx) AS clean_text,
         |  COUNT(*)::BIGINT AS n_kept
         |  FROM seg s LEFT JOIN bp ON md5(s.seg) = bp.seg_hash
         |  WHERE bp.seg_hash IS NULL GROUP BY s.doc_id),
         |base AS (SELECT doc_id,
         |  ((len(string_split(coalesce(text, ''), ' '))+${SegTokens - 1})//$SegTokens)::BIGINT AS n_segs
         |  FROM documents)
         |SELECT b.doc_id, md5(coalesce(k.clean_text, '')) AS clean_md5,
         |  b.n_segs, (b.n_segs - coalesce(k.n_kept, 0))::BIGINT AS n_removed
         |FROM base b LEFT JOIN kept k ON b.doc_id = k.doc_id
         |ORDER BY b.doc_id""".stripMargin),

    "substr_spans" -> (shingleCte +
      s"""dup AS (SELECT h FROM sh GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
         |hits AS (SELECT doc_id, p FROM sh JOIN dup USING (h)),
         |lagged AS (SELECT doc_id, p,
         |  lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev FROM hits),
         |marked AS (SELECT doc_id, p,
         |  CASE WHEN prev IS NULL OR p - prev > $SpanTokens THEN 1 ELSE 0 END AS ns
         |  FROM lagged),
         |island AS (SELECT doc_id, p,
         |  SUM(ns) OVER (PARTITION BY doc_id ORDER BY p ROWS UNBOUNDED PRECEDING) AS g
         |  FROM marked)
         |SELECT doc_id, CAST(MIN(p) AS BIGINT) AS span_start,
         |  CAST(MAX(p)+${SpanTokens - 1} AS BIGINT) AS span_end,
         |  CAST(MAX(p)+$SpanTokens-MIN(p) AS BIGINT) AS span_tokens,
         |  COUNT(*)::BIGINT AS n_dup_shingles
         |FROM island GROUP BY doc_id, g ORDER BY doc_id, span_start""".stripMargin),

    // fresh/corpus doc sets are disjoint, so the union distinct-doc
    // count the operator forms as n_fresh + n_corpus is stated here
    // directly as the all-docs count, with hits restricted to fresh
    "substr_inc" -> (shingleCte +
      s"""dup AS (SELECT h FROM sh GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
         |hits AS (SELECT doc_id, p FROM sh JOIN dup USING (h) WHERE doc_id % 5 = 0),
         |lagged AS (SELECT doc_id, p,
         |  lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev FROM hits),
         |marked AS (SELECT doc_id, p,
         |  CASE WHEN prev IS NULL OR p - prev > $SpanTokens THEN 1 ELSE 0 END AS ns
         |  FROM lagged),
         |island AS (SELECT doc_id, p,
         |  SUM(ns) OVER (PARTITION BY doc_id ORDER BY p ROWS UNBOUNDED PRECEDING) AS g
         |  FROM marked)
         |SELECT doc_id, CAST(MIN(p) AS BIGINT) AS span_start,
         |  CAST(MAX(p)+${SpanTokens - 1} AS BIGINT) AS span_end,
         |  CAST(MAX(p)+$SpanTokens-MIN(p) AS BIGINT) AS span_tokens,
         |  COUNT(*)::BIGINT AS n_dup_shingles
         |FROM island GROUP BY doc_id, g ORDER BY doc_id, span_start""".stripMargin),

    "substr_apply" -> (shingleCte +
      s"""dup AS (SELECT h FROM sh GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
         |hits AS (SELECT doc_id, p FROM sh JOIN dup USING (h)),
         |lagged AS (SELECT doc_id, p,
         |  lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev FROM hits),
         |marked AS (SELECT doc_id, p,
         |  CASE WHEN prev IS NULL OR p - prev > $SpanTokens THEN 1 ELSE 0 END AS ns
         |  FROM lagged),
         |island AS (SELECT doc_id, p,
         |  SUM(ns) OVER (PARTITION BY doc_id ORDER BY p ROWS UNBOUNDED PRECEDING) AS g
         |  FROM marked),
         |spans AS (SELECT doc_id, MIN(p) AS s, MAX(p)+${SpanTokens - 1} AS e
         |  FROM island GROUP BY doc_id, g),
         |tp0 AS (SELECT doc_id, t, unnest(range(1, len(t)+1)) AS i FROM toks),
         |tokpos AS (SELECT doc_id, i-1 AS pos, t[i] AS tok FROM tp0),
         |kept AS (SELECT tp.doc_id, tp.pos, tp.tok FROM tokpos tp
         |  WHERE NOT EXISTS (SELECT 1 FROM spans s
         |    WHERE s.doc_id = tp.doc_id AND tp.pos BETWEEN s.s AND s.e)),
         |agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean,
         |  COUNT(*)::BIGINT AS n_kept FROM kept GROUP BY doc_id),
         |base AS (SELECT doc_id, len(string_split(coalesce(text, ''), ' '))::BIGINT AS n_tokens
         |  FROM documents)
         |SELECT b.doc_id, md5(coalesce(a.clean, '')) AS clean_md5, b.n_tokens,
         |  (b.n_tokens - coalesce(a.n_kept, 0))::BIGINT AS n_cut_tokens
         |FROM base b LEFT JOIN agg a ON b.doc_id = a.doc_id
         |ORDER BY b.doc_id""".stripMargin),

    // line-boundary twin of text_bp_apply: chr(10) split,
    // 1-based list index i → 0-based seg_idx, newline re-join
    "text_bp_lines" ->
      s"""WITH lt AS (SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS ls FROM documents),
         |s0 AS (SELECT doc_id, ls, unnest(range(1, len(ls)+1)) AS i FROM lt),
         |seg AS (SELECT doc_id, i-1 AS seg_idx, ls[i] AS seg FROM s0),
         |bp AS (SELECT md5(seg) AS seg_hash FROM seg
         |  GROUP BY md5(seg) HAVING COUNT(DISTINCT doc_id) >= $MinDocs),
         |kept AS (SELECT s.doc_id,
         |  string_agg(s.seg, chr(10) ORDER BY s.seg_idx) AS clean_text,
         |  COUNT(*)::BIGINT AS n_kept
         |  FROM seg s LEFT JOIN bp ON md5(s.seg) = bp.seg_hash
         |  WHERE bp.seg_hash IS NULL GROUP BY s.doc_id),
         |base AS (SELECT doc_id,
         |  len(string_split(coalesce(text, ''), chr(10)))::BIGINT AS n_segs
         |  FROM documents)
         |SELECT b.doc_id, md5(coalesce(k.clean_text, '')) AS clean_md5,
         |  b.n_segs, (b.n_segs - coalesce(k.n_kept, 0))::BIGINT AS n_removed
         |FROM base b LEFT JOIN kept k ON b.doc_id = k.doc_id
         |ORDER BY b.doc_id""".stripMargin,

    "clf" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
         |  FROM documents),
         |w AS (SELECT doc_id,
         |  ('0x'||substr(md5('w:' ||
         |     (('0x'||substr(md5('feat:'||token),1,8))::BIGINT % $ClassifierDim)::VARCHAR
         |   ),1,8))::BIGINT - 2147483648 AS wt
         |  FROM toks),
         |s AS (SELECT doc_id, COUNT(*)::BIGINT AS n_tokens,
         |  CAST(SUM(wt) AS BIGINT) AS feat_sum FROM w GROUP BY doc_id)
         |SELECT doc_id, n_tokens, feat_sum, feat_sum >= 0 AS keep
         |FROM s ORDER BY doc_id""".stripMargin,

    // the weight table stated as an explicit range(dim) CTE and joined
    // on the bucket id — the closed-form md5 weights materialized the
    // way a trained model's would be stored (commonnessRef pattern)
    "clf_weighted" ->
      s"""WITH wtab AS (SELECT i AS bucket,
         |  ('0x'||substr(md5('w:'||i::VARCHAR),1,8))::BIGINT - 2147483648 AS weight
         |  FROM range(0, $ClassifierDim) r(i)),
         |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
         |  FROM documents),
         |tb AS (SELECT doc_id,
         |  ('0x'||substr(md5('feat:'||token),1,8))::BIGINT % $ClassifierDim AS bucket
         |  FROM toks),
         |j AS (SELECT t.doc_id, coalesce(w.weight, 0) AS weight
         |  FROM tb t LEFT JOIN wtab w USING (bucket)),
         |s AS (SELECT doc_id, COUNT(*)::BIGINT AS n_tokens,
         |  CAST(SUM(weight) AS BIGINT) AS feat_sum FROM j GROUP BY doc_id)
         |SELECT doc_id, n_tokens, feat_sum, feat_sum >= 0 AS keep
         |FROM s ORDER BY doc_id""".stripMargin,

    // the TRAINING is mirrored too: even-doc_id labeled split, per-
    // class bucket counts, (c+1)·10⁹ // (total+dim) Laplace ppb, and
    // length(bin(x)) floor-log₂ — every step integer-exact in both
    // engines, so the learned weight table (not just the scoring join)
    // is hash-checked. Shared verbatim by classifier_stored: the
    // stored table holds the SAME model trained once, so "identical
    // scores" is precisely the differential claim.
    "clf_trained" -> classifierTrainedOracleSql,
    "clf_stored" -> classifierTrainedOracleSql,

    // the trained-score CTEs chained into the split + confusion
    // aggregation — every stage already engine-exact, so the holdout
    // quality numbers themselves are differential
    "clf_eval" -> (classifierScoreCtes +
      s""",
         |sp AS (SELECT doc_id,
         |  CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR || ':split'), 1, 13))::BIGINT % 1000 < 980 THEN 'train'
         |       WHEN ('0x' || substr(md5(doc_id::VARCHAR || ':split'), 1, 13))::BIGINT % 1000 < 990 THEN 'valid'
         |       ELSE 'test' END AS split FROM documents),
         |act AS (SELECT doc_id, lang = 'en' AS pos FROM documents),
         |ev AS (SELECT s.doc_id, s.feat_sum >= 0 AS keep, sp.split, act.pos
         |  FROM s JOIN sp USING (doc_id) JOIN act USING (doc_id)
         |  WHERE sp.split <> 'train'),
         |agg AS (SELECT split,
         |  CAST(SUM(CASE WHEN keep AND pos THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |  CAST(SUM(CASE WHEN keep AND NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |  CAST(SUM(CASE WHEN NOT keep AND pos THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |  CAST(SUM(CASE WHEN NOT keep AND NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS tn,
         |  COUNT(*)::BIGINT AS n FROM ev GROUP BY split)
         |SELECT split, tp, fp, fn, tn, n,
         |  ((tp + tn) * 10000 // n)::BIGINT AS accuracy_bp
         |FROM agg ORDER BY split""".stripMargin)
  )

  /** The shared train + score CTE chain (everything up to the per-doc
    * score relation `s`) — classifier_trained/_stored append the
    * per-doc projection, classifier_eval the holdout confusion
    * aggregation, so the three oracles can never drift onto different
    * models. */
  private lazy val classifierScoreCtes =
    s"""WITH lab AS (SELECT doc_id, lang = 'en' AS pos, text
       |  FROM documents WHERE doc_id % 2 = 0),
       |ltk AS (SELECT pos,
       |  ('0x'||substr(md5('feat:'||token),1,8))::BIGINT % $ClassifierDim AS bucket
       |  FROM (SELECT pos, unnest(string_split(text, ' ')) AS token FROM lab)),
       |cnt AS (SELECT bucket,
       |  CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS cp,
       |  CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS cn
       |  FROM ltk GROUP BY bucket),
       |tot AS (SELECT coalesce(SUM(cp), 0)::BIGINT AS tp,
       |  coalesce(SUM(cn), 0)::BIGINT AS tn FROM cnt),
       |wtab AS (SELECT i AS bucket,
       |  (length(bin((coalesce(cp, 0) + 1) * 1000000000 // (tp + $ClassifierDim)))
       |   - length(bin((coalesce(cn, 0) + 1) * 1000000000 // (tn + $ClassifierDim))))::BIGINT AS weight
       |  FROM range(0, $ClassifierDim) r(i) LEFT JOIN cnt ON i = cnt.bucket, tot),
       |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
       |  FROM documents),
       |tb AS (SELECT doc_id,
       |  ('0x'||substr(md5('feat:'||token),1,8))::BIGINT % $ClassifierDim AS bucket
       |  FROM toks),
       |j AS (SELECT t.doc_id, coalesce(w.weight, 0) AS weight
       |  FROM tb t LEFT JOIN wtab w USING (bucket)),
       |s AS (SELECT doc_id, COUNT(*)::BIGINT AS n_tokens,
       |  CAST(SUM(weight) AS BIGINT) AS feat_sum FROM j GROUP BY doc_id)""".stripMargin

  private lazy val classifierTrainedOracleSql =
    classifierScoreCtes +
      """
        |SELECT doc_id, n_tokens, feat_sum, feat_sum >= 0 AS keep
        |FROM s ORDER BY doc_id""".stripMargin
}
