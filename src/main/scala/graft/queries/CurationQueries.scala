package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Curation, Export, Similarity}
import graft.tables.Fixtures

/** Corpus-curation operators as driver-verified queries: Gopher-style
  * repetition filters, benchmark decontamination, deterministic
  * stratified sampling, weighted source mixing, sequence packing,
  * SemDeDup, PII scrubbing ([[graft.ops.Curation]]).
  *
  * Every entry is DuckDB-oracle-checked: the md5 hash-gate / integer
  * basis-point determinism contract makes each pipeline bit-exact in
  * both engines, including the sampling and mixing draws.
  */
object CurationQueries {

  /** Demo stratum rates (basis points kept per language). */
  private val SampleRates = Map("en" -> 5000, "de" -> 2500, "es" -> 2500, "fr" -> 1000)
  /** Demo mix weights (epochs × 1000 per source). */
  private val MixWeights = Map("src0" -> 2500, "src1" -> 1500, "src2" -> 1000)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_repetition" -> ((s, dir) =>
      Curation.repetitionStats(Fixtures.documents(s, dir))
        .orderBy(col("doc_id"))),

    "decontaminate" -> ((s, dir) =>
      Curation.decontaminate(Fixtures.documents(s, dir))
        .orderBy(col("doc_id"))),

    "sample_strat" -> ((s, dir) =>
      Curation.sampleStratified(Fixtures.documents(s, dir), SampleRates)
        .orderBy(col("doc_id"))),

    // deterministic hash split (98/1/1 permille): membership is a pure
    // function of doc_id, so the holdout survives re-crawls and
    // repartitions — the md5 bucket arithmetic is mirrored verbatim
    // in the oracle
    "split_assign" -> ((s, dir) =>
      Curation.splitAssign(Fixtures.documents(s, dir))
        .orderBy(col("doc_id"))),

    // per-source cap (the Gopher/RefinedWeb per-domain cap): best 10
    // docs per source by quality score, rank-pushdown window
    "source_cap" -> ((s, dir) =>
      Curation.sourceCap(Fixtures.documents(s, dir), cap = 10)
        .orderBy(col("source"), col("source_rank"))),

    "mix_weighted" -> ((s, dir) =>
      Curation.mixWeighted(Fixtures.documents(s, dir), MixWeights)
        .orderBy(col("doc_id"), col("copy_idx"))),

    "pack_sequences" -> ((s, dir) =>
      Curation.packSequences(Fixtures.documents(s, dir))
        .orderBy(col("source"), col("doc_id"), col("pack_id"))),

    // cell count tracks the corpus (semdedupCellsFor): fixed cells
    // make the within-cell pair join quadratic in n — with k = n/1000
    // the per-cell term is bounded and total cosine work is n·500,
    // linear. The count() is a parquet-metadata job.
    "semdedup_pairs" -> ((s, dir) => {
      val e = Fixtures.embeddings(s, dir)
      Curation.semdedupPairs(e, threshold = 0.4,
          nCells = Curation.semdedupCellsFor(e.count(), targetCellSize = 1000L))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "semdedup_prune" -> ((s, dir) => {
      val e = Fixtures.embeddings(s, dir)
      Curation.semdedupSurvivors(e, threshold = 0.4,
          nCells = Curation.semdedupCellsFor(e.count(), targetCellSize = 1000L))
        .orderBy(col("vec_id"))
    }),

    "text_pii_scrub" -> ((s, dir) =>
      Curation.piiScrub(Curation.withPii(Fixtures.documents(s, dir)))
        .orderBy(col("doc_id"))),

    // snapshot bookkeeping: old = docs without the %7 residue, new =
    // docs without the %5 residue with %13 texts rewritten — yielding
    // all three statuses deterministically from the one fixture
    // DSIR importance weights: target = the English slice, raw = the
    // full pool; both hashed-feature distributions (storable dim-row
    // tables) and the integer floor-log2 score are mirrored verbatim
    // in the oracle — the whole selection signal is hash-checked
    "dsir_weights" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      val fb = Curation.sharedFeatureRows(docs)
      Curation.importanceWeights(docs,
          Curation.dsirBucketPpm(docs, bucketRows = Some(fb.filter(col("lang") === "en"))),
          Curation.dsirBucketPpm(docs, bucketRows = Some(fb)),
          bucketRows = Some(fb))
        .orderBy(col("doc_id"))
    }),

    // ...and the selection step: the 100 most target-like documents
    "dsir_resample" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      val fb = Curation.sharedFeatureRows(docs)
      Curation.importanceResample(docs,
          Curation.dsirBucketPpm(docs, bucketRows = Some(fb.filter(col("lang") === "en"))),
          Curation.dsirBucketPpm(docs, bucketRows = Some(fb)),
          topN = 100, bucketRows = Some(fb))
        .orderBy(col("doc_id"))
    }),

    "snapshot_diff" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      val old = docs.filter(col("doc_id") % 7 =!= 0)
      val neu = docs.filter(col("doc_id") % 5 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
      Curation.snapshotDiff(old, neu).orderBy(col("doc_id"))
    }),

    // the tokenize+score base rides the session cache (one per-doc
    // materialization serves both plan legs AND the by-lang sibling —
    // the sharedFeatureRows arrangement; it was recomputed per leg,
    // 2× the per-token pass inside every budget entry at sf1)
    "qbudget" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      Curation.tokenBudgetSelect(docs, budget = TokenBudget,
          scoredIn = Some(Curation.sharedQualityRows(docs)))
        .orderBy(col("doc_id"))
    }),

    "export_shards" -> ((s, dir) =>
      Export.shardAssignments(Fixtures.documents(s, dir), nShards = ExportShards)
        .orderBy(col("doc_id"))),

    "export_manifest" -> ((s, dir) =>
      Export.shardManifest(Fixtures.documents(s, dir), nShards = ExportShards)
        .orderBy(col("shard"))),

    "qbudget_lang" -> ((s, dir) => {
      val docs = Fixtures.documents(s, dir)
      Curation.tokenBudgetSelectByStratum(docs,
          budgets = StratumBudgets, defaultBudget = 500L,
          scoredIn = Some(Curation.sharedQualityRows(docs)))
        .orderBy(col("doc_id"))
    })
  )

  /** Fixture per-language budgets; each cuts mid-stratum at sf0.01
    * (en 11.8k / de 3.5k / es 4.0k tokens total; fr + zh fall to the
    * 500-token default). */
  private val StratumBudgets = Map("en" -> 5000L, "de" -> 1500L, "es" -> 2000L)

  /** Fixture token budget: cuts mid-corpus at sf0.01 (27k tokens
    * total) so the boundary-bin path is exercised by the driver. */
  private val TokenBudget = 12000L
  /** Fixture shard count; production sizes shards to ~1 GB each. */
  private val ExportShards = 8

  /** Shared SemDeDup assignment CTEs, corpus-scaled like the Spark
    * side: k is derived from count(*) with semdedupCellsFor's exact
    * integer formula, and the centroids are the same deterministic
    * DATA SAMPLE the Spark literals come from — the k vectors ranking
    * first by (md5('seed:' || vec_id), vec_id), cell index = rank−1
    * (both engines order the same lowercase-hex strings byte-wise and
    * read the same parquet floats, so the centroid VALUES are
    * bit-identical; float→double widening is exact). Sampling from
    * the corpus, not a fixed random matrix, is what keeps cell
    * occupancy flat as n grows — see [[graft.ops.Similarity.sampledCentroids]]
    * and SCALING.md's beyond-the-knee table for the measured skew the
    * fixed matrix produced. list_dot_product(ctr,ctr) reproduces
    * Scala's left-to-right Σx² literal; ROW_NUMBER over (score, cell)
    * = argmin with first-position tie-break, identical to Spark's
    * array_position-over-min. */
  /** Shared DSIR CTEs: hashed-feature buckets over the token stream
    * (the classifier's md5 feature space, mirrored verbatim), add-one
    * smoothed ppm distributions for the target (lang='en') and raw
    * pools over the FULL range(1024), and the per-doc floor-log2
    * importance score — `length(bin(x))` is the same binary-digit
    * count in both engines. */
  private lazy val dsirCte: String =
    """WITH tk AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |bk AS (SELECT doc_id, lang,
      |  ('0x'||substr(md5('feat:'||token),1,8))::BIGINT % 1024 AS bucket FROM tk),
      |tt AS (SELECT count(*) AS c FROM bk WHERE lang = 'en'),
      |rt AS (SELECT count(*) AS c FROM bk),
      |tp AS (SELECT r.range AS bucket,
      |  ((coalesce(c.c, 0) + 1) * 1000000) // ((SELECT c FROM tt) + 1024) AS p_ppm
      |  FROM range(1024) r LEFT JOIN
      |    (SELECT bucket, count(*) AS c FROM bk WHERE lang = 'en' GROUP BY bucket) c
      |    ON r.range = c.bucket),
      |qp AS (SELECT r.range AS bucket,
      |  ((coalesce(c.c, 0) + 1) * 1000000) // ((SELECT c FROM rt) + 1024) AS q_ppm
      |  FROM range(1024) r LEFT JOIN
      |    (SELECT bucket, count(*) AS c FROM bk GROUP BY bucket) c
      |    ON r.range = c.bucket),
      |sc AS (SELECT bk.doc_id, count(*) AS n_tokens,
      |  CAST(sum(length(bin(tp.p_ppm)) - length(bin(qp.q_ppm))) AS BIGINT) AS dsir_score
      |  FROM bk JOIN tp USING (bucket) JOIN qp USING (bucket)
      |  GROUP BY bk.doc_id)
      |""".stripMargin

  private lazy val semdedupCte: String =
    s"""WITH n AS (SELECT vec_id, embedding::DOUBLE[] v,
       |  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) nrm
       |  FROM embeddings),
       |prm AS (SELECT greatest(1,
       |  ((SELECT count(*) FROM embeddings) + 999) // 1000)::INT AS k),
       |cen AS (SELECT (rnk - 1)::INT AS cell, v AS ctr FROM
       |  (SELECT v, ROW_NUMBER() OVER (ORDER BY md5('seed:' || vec_id), vec_id) AS rnk
       |   FROM n) s, prm WHERE s.rnk <= prm.k),
       |sc AS (SELECT n.vec_id, n.v, n.nrm, cen.cell,
       |  -2.0 * list_dot_product(n.v, cen.ctr) + list_dot_product(cen.ctr, cen.ctr) AS s
       |  FROM n, cen),
       |asg AS (SELECT vec_id, v, nrm, cell FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s, cell) rn FROM sc)
       |  WHERE rn = 1),
       |p AS (SELECT a.cell, a.vec_id AS id_a, b.vec_id AS id_b,
       |  round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS score
       |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id)
       |""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |bg AS (SELECT doc_id, unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS g FROM t),
        |bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
        |bs AS (SELECT doc_id, sum(c)::BIGINT AS total, max(c)::BIGINT AS mx,
        |  count(*)::BIGINT AS dst FROM bc GROUP BY doc_id),
        |tg AS (SELECT doc_id, unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)]) AS g FROM t),
        |tc AS (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY doc_id, g),
        |ts AS (SELECT doc_id, sum(c)::BIGINT AS total, count(*)::BIGINT AS dst FROM tc GROUP BY doc_id)
        |SELECT b.doc_id,
        |  ((b.mx * 10000) // b.total) AS top_bigram_bp,
        |  (((b.total - b.dst) * 10000) // b.total) AS dup_bigram_bp,
        |  (((t2.total - t2.dst) * 10000) // t2.total) AS dup_trigram_bp,
        |  (((b.mx * 10000) // b.total) <= 2000
        |    AND (((t2.total - t2.dst) * 10000) // t2.total) <= 2000) AS passes_repetition
        |FROM bs b JOIN ts t2 USING (doc_id) ORDER BY doc_id""".stripMargin,

    "decontaminate" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |g AS (SELECT doc_id, unnest(list_distinct([t[i] || ' ' || t[i+1] for i in range(1, len(t))])) AS g FROM t),
        |bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0),
        |train AS (SELECT doc_id, g FROM g WHERE doc_id % 97 <> 0),
        |sz AS (SELECT doc_id, count(*)::BIGINT AS n_grams FROM train GROUP BY doc_id),
        |ov AS (SELECT t.doc_id, count(*)::BIGINT AS n_overlap
        |  FROM train t JOIN bench b ON t.g = b.g GROUP BY t.doc_id)
        |SELECT doc_id, n_grams, n_overlap,
        |  ((n_overlap * 10000) // n_grams) AS contamination_bp,
        |  (((n_overlap * 10000) // n_grams) >= 5000) AS is_contaminated
        |FROM sz JOIN ov USING (doc_id) ORDER BY doc_id""".stripMargin,

    "sample_strat" ->
      """SELECT * FROM (
        |  SELECT doc_id, lang,
        |    ('0x' || substr(md5(doc_id::VARCHAR || ':sample'), 1, 13))::BIGINT % 10000 AS sample_bp,
        |    (CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2500 WHEN 'es' THEN 2500
        |      WHEN 'fr' THEN 1000 ELSE 500 END)::BIGINT AS rate_bp
        |  FROM documents)
        |WHERE sample_bp < rate_bp ORDER BY doc_id""".stripMargin,

    "split_assign" ->
      """SELECT doc_id, split_bucket,
        |  CASE WHEN split_bucket < 980 THEN 'train'
        |       WHEN split_bucket < 990 THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |  ('0x' || substr(md5(doc_id::VARCHAR || ':split'), 1, 13))::BIGINT % 1000 AS split_bucket
        |  FROM documents) ORDER BY doc_id""".stripMargin,

    // the quality CTEs restate text_quality's integer formula; the
    // rank filter mirrors the operator's row_number <= cap
    "source_cap" ->
      """WITH t AS (SELECT doc_id, source, n_chars, string_split(text, ' ') ts FROM documents),
        |m AS (SELECT doc_id, source, n_chars, len(ts)::INT n_tokens,
        |  len(list_distinct(ts))::INT n_distinct,
        |  len(list_filter(ts, x -> x IN ('the','a','of','and','is')))::INT n_stop FROM t),
        |s AS (SELECT doc_id, source,
        |  ((4 * ((n_distinct * 10000) // n_tokens) + 3 * ((n_stop * 10000) // n_tokens)
        |      + 3 * least(10000, n_tokens * 100)) // 10)::BIGINT AS quality_score_bp FROM m),
        |r AS (SELECT doc_id, source, quality_score_bp,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY quality_score_bp DESC NULLS LAST, doc_id) AS source_rank FROM s)
        |SELECT doc_id, source, quality_score_bp, source_rank::BIGINT AS source_rank
        |FROM r WHERE source_rank <= 10 ORDER BY source, source_rank""".stripMargin,

    "mix_weighted" ->
      """WITH d AS (SELECT doc_id, source,
        |  (CASE source WHEN 'src0' THEN 2500 WHEN 'src1' THEN 1500 WHEN 'src2' THEN 1000
        |    ELSE 500 END)::BIGINT AS w,
        |  ('0x' || substr(md5(doc_id::VARCHAR || ':mix'), 1, 13))::BIGINT % 1000 AS frac_draw
        |  FROM documents),
        |c AS (SELECT doc_id, source,
        |  (w // 1000 + CASE WHEN frac_draw < w % 1000 THEN 1 ELSE 0 END)::BIGINT AS n_copies
        |  FROM d)
        |SELECT doc_id, source, n_copies, unnest(range(1, n_copies + 1))::BIGINT AS copy_idx
        |FROM c WHERE n_copies >= 1 ORDER BY doc_id, copy_idx""".stripMargin,

    "pack_sequences" ->
      """WITH d AS (SELECT doc_id, source, len(string_split(text, ' '))::INT AS n_tokens FROM documents),
        |c AS (SELECT doc_id, source, n_tokens,
        |  sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING)::BIGINT AS end_off
        |  FROM d)
        |SELECT source, doc_id, n_tokens, (end_off - n_tokens)::BIGINT AS start_off,
        |  unnest(range((end_off - n_tokens) // 512, ((end_off - 1) // 512) + 1))::BIGINT AS pack_id
        |FROM c ORDER BY source, doc_id, pack_id""".stripMargin,

    "semdedup_pairs" -> (semdedupCte +
      """SELECT cell, id_a, id_b, score FROM p WHERE score >= 0.4
        |ORDER BY id_a, id_b""".stripMargin),

    "semdedup_prune" -> (semdedupCte +
      """, pruned AS (SELECT DISTINCT id_b FROM p WHERE score >= 0.4)
        |SELECT vec_id, cell FROM asg
        |WHERE NOT EXISTS (SELECT 1 FROM pruned WHERE pruned.id_b = asg.vec_id)
        |ORDER BY vec_id""".stripMargin),

    // every stage mirrored: md5 feature buckets, add-one-smoothed ppm
    // over the FULL range(dim) (absent buckets carry the floor), and
    // the floor-log2 magnitude as length(bin(x)) — identical binary
    // rendering in both engines, including bin(0) = '0'
    "dsir_weights" -> (dsirCte +
      """SELECT doc_id, n_tokens, dsir_score FROM sc ORDER BY doc_id""".stripMargin),

    "dsir_resample" -> (dsirCte +
      """, top AS (SELECT doc_id, n_tokens, dsir_score FROM sc
        |  ORDER BY dsir_score DESC, doc_id ASC LIMIT 100)
        |SELECT d.doc_id, d.lang, d.source, t.n_tokens, t.dsir_score
        |FROM documents d JOIN top t USING (doc_id) ORDER BY d.doc_id""".stripMargin),

    "snapshot_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS old_fp FROM documents WHERE doc_id % 7 <> 0),
        |n AS (SELECT doc_id,
        |  md5(CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END) AS new_fp
        |  FROM documents WHERE doc_id % 5 <> 0),
        |j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, old_fp, new_fp
        |  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id),
        |d AS (SELECT doc_id,
        |  CASE WHEN old_fp IS NULL THEN 'added'
        |       WHEN new_fp IS NULL THEN 'removed'
        |       WHEN old_fp <> new_fp THEN 'changed' END AS status,
        |  old_fp, new_fp FROM j)
        |SELECT doc_id, status, old_fp, new_fp FROM d
        |WHERE status IS NOT NULL ORDER BY doc_id""".stripMargin,

    "text_pii_scrub" ->
      """WITH t1 AS (SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0
        |    THEN text || ' contact user' || doc_id::VARCHAR || '@example.com'
        |    ELSE text END AS t FROM documents),
        |t2 AS (SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0
        |    THEN t || ' call 555-' || (doc_id % 9000 + 1000)::VARCHAR
        |    ELSE t END AS text FROM t1),
        |r AS (SELECT doc_id,
        |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::INT AS n_emails,
        |  len(regexp_extract_all(text, '\b\d{3}-\d{4}\b'))::INT AS n_phones,
        |  regexp_replace(
        |    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS red
        |  FROM t2)
        |SELECT doc_id, n_emails, n_phones, md5(red) AS redacted_md5, length(red)::INT AS redacted_len
        |FROM r ORDER BY doc_id""".stripMargin,

    // The oracle states the SPEC (one global ordered cumulative sum);
    // the Spark plan reaches the same set via the bin-prefix two-pass,
    // so this check proves the decomposition equals the naive form.
    "qbudget" ->
      """WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') ts FROM documents),
        |m AS (SELECT doc_id, len(ts)::BIGINT n_tokens,
        |  len(list_distinct(ts))::BIGINT n_distinct,
        |  len(list_filter(ts, x -> x IN ('the','a','of','and','is')))::BIGINT n_stop,
        |  n_chars FROM t),
        |q AS (SELECT doc_id, n_tokens,
        |  ((4 * ((n_distinct * 10000) // n_tokens) + 3 * ((n_stop * 10000) // n_tokens)
        |    + 3 * least(10000, n_tokens * 100)) // 10)::BIGINT AS quality_score_bp FROM m),
        |r AS (SELECT doc_id, quality_score_bp, n_tokens,
        |  (sum(n_tokens) OVER (ORDER BY quality_score_bp DESC, doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT - n_tokens AS start_off
        |  FROM q)
        |SELECT doc_id, quality_score_bp, n_tokens FROM r
        |WHERE start_off < 12000 ORDER BY doc_id""".stripMargin,

    "export_shards" ->
      """WITH b AS (SELECT doc_id, len(string_split(text, ' '))::INT AS n_tokens,
        |  ('0x' || substr(md5(doc_id::VARCHAR || ':shard'), 1, 13))::BIGINT % 8 AS shard
        |  FROM documents)
        |SELECT doc_id, n_tokens, shard,
        |  (row_number() OVER (PARTITION BY shard ORDER BY doc_id))::INT AS position
        |FROM b ORDER BY doc_id""".stripMargin,

    "qbudget_lang" ->
      """WITH t AS (SELECT doc_id, lang, n_chars, string_split(text, ' ') ts FROM documents),
        |m AS (SELECT doc_id, lang, len(ts)::BIGINT n_tokens,
        |  len(list_distinct(ts))::BIGINT n_distinct,
        |  len(list_filter(ts, x -> x IN ('the','a','of','and','is')))::BIGINT n_stop FROM t),
        |q AS (SELECT doc_id, lang, n_tokens,
        |  ((4 * ((n_distinct * 10000) // n_tokens) + 3 * ((n_stop * 10000) // n_tokens)
        |    + 3 * least(10000, n_tokens * 100)) // 10)::BIGINT AS quality_score_bp,
        |  (CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 1500 WHEN 'es' THEN 2000
        |    ELSE 500 END)::BIGINT AS budget FROM m),
        |r AS (SELECT doc_id, lang, quality_score_bp, n_tokens, budget,
        |  (sum(n_tokens) OVER (PARTITION BY lang ORDER BY quality_score_bp DESC, doc_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT - n_tokens AS start_off
        |  FROM q)
        |SELECT doc_id, lang, quality_score_bp, n_tokens FROM r
        |WHERE start_off < budget ORDER BY doc_id""".stripMargin,

    "export_manifest" ->
      """WITH b AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens,
        |  ('0x' || substr(md5(doc_id::VARCHAR || ':shard'), 1, 13))::BIGINT % 8 AS shard,
        |  ('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::BIGINT AS doc_h
        |  FROM documents)
        |SELECT shard, count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS total_tokens,
        |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
        |  bit_xor(doc_h) AS ids_fp
        |FROM b GROUP BY shard ORDER BY shard""".stripMargin
  )
}
