package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: tokenization, shingling, language ID, quality
  * scoring, token statistics, fingerprinting.
  *
  * Everything is a narrow per-row projection (higher-order array
  * functions, fully codegen'd) followed by at most one grouped
  * aggregation — the 100 TB shape is "scan, transform in place,
  * small shuffle only where a global ranking is asked for".
  */
object TextAnalysis {

  /** Whitespace tokens. Fixture texts are single-space separated. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct n-word shingles (1-based positions, mirrors the DuckDB
    * comprehension `[t[i]||' '||...  for i in range(1, len(t)-n+2)]`). */
  def shingles(toks: Column, n: Int = 3): Column =
    array_distinct(transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)))

  /** Per-language marker (stopword) lists for the n-gram-free
    * heuristic language ID. Alphabetical language order is the
    * tie-break priority. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "les", "de", "et", "un"),
    "zh" -> Seq("de5", "shi4", "bu4", "le5", "zai4"))

  /** The argmax-with-alphabetical-tie-break CASE chain over per-lang
    * scores — shared by [[langId]] (scores as named columns) and
    * [[predictedLang]] (scores inlined) so the two can't drift. */
  private def argmaxLang(score: String => Column): Column = {
    val langs = langMarkers.map(_._1)
    langs.init.foldRight(lit(langs.last): Column) { (l, rest) =>
      val isMax = langs.filter(_ != l).map(o => score(l) >= score(o)).reduce(_ && _)
      when(isMax, lit(l)).otherwise(rest)
    }
  }

  /** Language ID: distinct-marker-hit score per language, argmax with
    * alphabetical tie-break (deterministic, oracle-mirrored as a CASE
    * chain). */
  def langId(docs: DataFrame): DataFrame = {
    val toksD = array_distinct(tokens(col("text")))
    val scored = docs.select(
      (col("doc_id") +: col("lang") +: langMarkers.map { case (l, ms) =>
        size(array_intersect(toksD, array(ms.map(lit): _*))).as(s"s_$l")
      }): _*)
    scored.withColumn("predicted_lang", argmaxLang(l => col(s"s_$l")))
  }

  /** [[langId]]'s prediction as a single Column over the text — the
    * passthrough form for pipelines (streaming included) that must keep
    * their other columns. Codegen's common-subexpression elimination
    * dedups the repeated intersect scores. */
  def predictedLang(text: Column): Column = {
    val toksD = array_distinct(tokens(text))
    val markers = langMarkers.toMap
    argmaxLang(l => size(array_intersect(toksD, array(markers(l).map(lit): _*))))
  }

  /** Stopword list shared by [[quality]] and [[withQuality]]. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "is")

  /** Quality metrics: token counts, type-token ratio, average token
    * length, stopword ratio, composite score. Ratios are emitted as
    * integer basis points (integer `div`, exact in every engine) —
    * cross-engine double rounding disagrees on .00005 boundaries, so
    * floats never leave this operator. */
  def quality(docs: DataFrame): DataFrame = {
    // the three array stats come from ONE native codegen'd pass
    // (graft.functions.TokenStats) — the old size/array_distinct/
    // filter(isInCollection) triple ran the filter lambda interpreted
    // and re-walked the array three times; bit-identical outputs,
    // OpsSpec parity-pinned
    docs.select(col("doc_id"), col("n_chars"),
        graft.functions.TokenStats.of(tokens(col("text"))).as("ts"))
      .select(
        col("doc_id"), col("n_chars"),
        col("ts.n_tokens").as("n_tokens"),
        col("ts.n_distinct").as("n_distinct"),
        col("ts.n_stop").as("n_stop"))
      .select(
        col("doc_id"), col("n_chars"), col("n_tokens"), col("n_distinct"),
        expr("(n_distinct * 10000) div n_tokens").as("ttr_bp"),
        expr("((n_chars - (n_tokens - 1)) * 100) div n_tokens").as("avg_token_len_x100"),
        expr("(n_stop * 10000) div n_tokens").as("stopword_bp"))
      .withColumn("quality_score_bp",
        expr("(4 * ttr_bp + 3 * stopword_bp + 3 * least(10000, n_tokens * 100)) div 10"))
  }

  /** [[quality]]'s score as a passthrough: ADDS n_tokens and
    * quality_score_bp (identical arithmetic — `QualityParitySpec`-style
    * check in OpsSpec pins it) and keeps every input column, so it
    * composes into streaming pipelines where the text must flow on to
    * the next stage. Stateless per-row projections only. */
  def withQuality(docs: DataFrame): DataFrame =
    docs
      .withColumn("q_ts", graft.functions.TokenStats.of(tokens(col("text"))))
      .withColumn("n_tokens", col("q_ts.n_tokens"))
      .withColumn("quality_score_bp",
        expr("(4 * ((q_ts.n_distinct * 10000) div n_tokens) " +
          "+ 3 * ((q_ts.n_stop * 10000) div n_tokens) " +
          "+ 3 * least(10000, n_tokens * 100)) div 10"))
      .drop("q_ts")

  /** Global token frequencies, top N (count desc, token asc). */
  def tokenCounts(docs: DataFrame, topN: Int = 20): DataFrame =
    docs.select(explode(tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(topN)

  /** Corpus-relative token commonness — the integer-exact stand-in
    * for a CCNet-style unigram-LM quality filter. The corpus's `topK`
    * most frequent tokens (ties broken by token — deterministic across
    * engines) form the reference distribution, each carrying its
    * relative frequency in parts-per-million (integer div, exact);
    * a document scores the integer mean of its tokens' ppm (tokens
    * outside the top-K score 0). High = built from the corpus's common
    * vocabulary (low "perplexity"), low = rare-token-heavy. Floats
    * never appear, so the score is bit-identical in every engine —
    * unlike a real log-prob LM score, whose libm rounding diverges
    * cross-engine.
    *
    * Scale: the reference table is one map-side-combined count + top-K
    * (driver-bounded at K rows), broadcast to a per-token equi-join —
    * the corpus shuffles once on the token key, never on doc pairs.
    * Building it inline costs two extra token scans (total + counts);
    * production computes it ONCE with [[commonnessRef]], stores it
    * beside the corpus like the dedup band tables, and passes it as
    * `ref` — then scoring any batch is a single scan. */
  def commonness(docs: DataFrame, topK: Int = 1000,
                 ref: Option[DataFrame] = None): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val refTable = ref.getOrElse(commonnessRef(docs, topK))
    toks.join(broadcast(refTable), Seq("token"), "left")
      .na.fill(0L, Seq("ppm"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        expr("sum(ppm) div count(1)").as("commonness_ppm"))
  }

  /** The (token, ppm) reference distribution for [[commonness]]:
    * top-K tokens by corpus frequency, relative frequency in integer
    * parts-per-million. K rows — store it beside the corpus and reuse
    * it for every batch (and for streams, where a static broadcast
    * table is the only corpus-wide state a stateless stage can use). */
  def commonnessRef(docs: DataFrame, topK: Int = 1000): DataFrame = {
    val toks = docs.select(explode(tokens(col("text"))).as("token"))
    val total = toks.count()
    toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(topK)
      .select(col("token"), expr(s"(n * 1000000) div $total").as("ppm"))
  }

  /** One row per adjacent token pair: (doc_id, prev, token) — the
    * bigram stream [[lmRef]] trains on and [[lmScore]] scores over.
    * Built per-row with codegen'd array HOFs and exploded (map-only,
    * nothing shuffles here); single-token docs emit no pairs, and the
    * `size >= 2` guard keeps `sequence` away from its descending
    * start>stop form. */
  def bigramRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("toks")) - 1),
          i => struct(element_at(col("toks"), i).as("prev"),
            element_at(col("toks"), i + 1).as("token")))).as("pr"))
      .select(col("doc_id"), col("pr.prev"), col("pr.token"))

  /** [[bigramRows]], persisted — [[lmScore]] with an inline model
    * references the bigram stream from three plan legs (pair counts,
    * prev counts, the scoring probe), and the session-shared cache
    * makes them one materialization (the [[Dedup.sharedShingleRows]]
    * pattern, LRU-bounded by [[SharedCaches]]). Production with
    * stored model tables scores in a single scan and skips this. */
  def sharedBigramRows(docs: DataFrame): DataFrame =
    // checkpoint cut: flat-scan plan legs for every LM consumer
    SharedCaches.sharedCut(bigramRows(docs), "text")

  /** The trained bigram model for [[lmScore]]: the corpus's `topK`
    * most frequent bigrams (ties broken by (prev, token) —
    * deterministic across engines), each carrying its CONDITIONAL
    * relative frequency `P(token | prev)` in integer parts-per-million
    * (exact `div`; the denominator is `prev`'s occurrence count in
    * first-of-pair position, the stupid-backoff MLE denominator).
    * K rows — store it beside the corpus like [[commonnessRef]] and
    * score every future batch with a single scan.
    *
    * Scale: two map-side-combined aggregations over the bigram stream
    * (pair counts + prev counts), one broadcast-sized join between
    * them, top-K driver-bounded. The corpus shuffles on token keys
    * only, never on doc pairs. */
  def lmRef(docs: DataFrame, topK: Int = 1000,
            pairsIn: Option[DataFrame] = None): DataFrame = {
    val pairs = pairsIn.getOrElse(bigramRows(docs))
    val prevCounts = pairs.groupBy(col("prev")).agg(count(lit(1)).as("np"))
    pairs.groupBy(col("prev"), col("token")).agg(count(lit(1)).as("nb"))
      .join(prevCounts, Seq("prev"))
      .orderBy(col("nb").desc, col("prev").asc, col("token").asc)
      .limit(topK)
      .select(col("prev"), col("token"),
        expr("(nb * 1000000) div np").as("cond_ppm"))
  }

  /** Bigram-LM document score with stupid backoff — the integer-exact
    * upgrade of [[commonness]]'s unigram stand-in to a real CCNet-style
    * LM quality filter. Each adjacent pair scores its conditional
    * frequency `P(token | prev)` from the top-`topK` bigram table;
    * pairs outside it back off to `unigram_ppm div 10` (stupid backoff,
    * α = 0.1 as an exact integer div) from the top-`topUni` unigram
    * table; tokens outside both score 0. A document's `lm_ppm` is the
    * integer mean over its pairs — high = the corpus's common word
    * SEQUENCES (low perplexity), low = incoherent or rare-sequence
    * text, which unigram commonness cannot distinguish (a scrambled
    * document keeps its unigram score but loses its bigram score).
    * Floats never appear, so the score is bit-identical in every
    * engine — a real log-prob LM diverges on libm rounding.
    *
    * Scale: both model tables are K-bounded broadcasts probed by
    * per-pair equi-joins; the only shuffle is the final per-doc
    * aggregation, partial map-side. Production trains ONCE
    * ([[lmRef]] + [[commonnessRef]], stored beside the corpus like the
    * dedup band tables) and passes them as `ref`/`uniRef` — scoring
    * any batch is then a single scan, O(batch) not O(corpus).
    * Single-token docs have no pairs and score (0, 0) via the corpus
    * left join, mirrored by the oracle. */
  def lmScore(docs: DataFrame, topK: Int = 1000, topUni: Int = 1000,
              ref: Option[DataFrame] = None,
              uniRef: Option[DataFrame] = None,
              pairsIn: Option[DataFrame] = None): DataFrame = {
    val pairs = pairsIn.getOrElse(bigramRows(docs))
    val model = ref.getOrElse(lmRef(docs, topK, pairsIn = Some(pairs)))
    val uni = uniRef.getOrElse(commonnessRef(docs, topUni))
      .withColumnRenamed("ppm", "uni_ppm")
    val scored = pairs
      .join(broadcast(model), Seq("prev", "token"), "left")
      .join(broadcast(uni), Seq("token"), "left")
      .withColumn("s",
        coalesce(col("cond_ppm"), expr("uni_ppm div 10"), lit(0L)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(s) div count(1)").as("lm_ppm"))
    docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_ppm"), lit(0L)).as("lm_ppm"))
  }

  /** [[searchBm25]]'s storable corpus statistics: one row (n, tot) —
    * doc count and total token count. Store beside the corpus; a
    * stale-by-one-batch stats row shifts every score identically, so
    * rankings degrade gracefully between refreshes. */
  def bm25StatsRef(docs: DataFrame): DataFrame =
    docs.select(tokens(col("text")).as("ts"))
      .agg(count(lit(1)).as("n"), sum(size(col("ts"))).as("tot"))

  /** [[searchBm25]]'s storable document-frequency table: (token, df)
    * over the FULL vocabulary — O(vocab) rows, one map-side-combined
    * distinct count, computed once and probed per query by the terms
    * filter. Identical semantics to the inline per-query df (distinct
    * docs containing the token). */
  def bm25DfRef(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))

  /** [[lmScore]]'s per-row Column form — the STREAMING gate shape: a
    * stateless projection usable before any stateful stage (the
    * [[classifierFeatSum]] pattern; a streaming explode + groupBy
    * would turn the scorer into keyed state it doesn't need). The
    * K-bounded model travels as two map LITERALS — one `typedlit`
    * each, O(1) plan size — built from STORED [[lmRef]] /
    * [[commonnessRef]] tables via [[lmModelLiterals]] (the bounded
    * driver-collect precedent of `Similarity.fixedCentroids`). Bigram
    * keys are LENGTH-PREFIXED — `"<len(prev)>:" + prev + token` — so
    * no token content can forge another pair's key (tokens are only
    * whitespace-split: a separator character could be smuggled inside
    * one, but the length prefix decodes the split point uniquely,
    * keeping this form bit-identical to the batch (prev, token)
    * equi-join on adversarial text too); `uniBackoffPpm` carries
    * `ppm div 10` pre-divided, so the row expression only probes and
    * sums. The `aggregate` lambda evaluates interpreted — the wrong
    * trade for batch (use [[lmScore]]'s exploded codegen form there),
    * fine at ingest rates where the trigger bounds the batch. Docs
    * with < 2 tokens (null included) score 0, matching [[lmScore]]'s
    * corpus left join. */
  def lmPpm(text: Column, bigramPpm: Map[String, Long],
            uniBackoffPpm: Map[String, Long]): Column = {
    val bi = typedlit(bigramPpm)
    val un = typedlit(uniBackoffPpm)
    val toks = tokens(text)
    val pairSum = aggregate(
      sequence(lit(1), size(toks) - 1), lit(0L), (acc, i) =>
        acc + coalesce(
          element_at(bi, concat(
            length(element_at(toks, i)).cast("string"), lit(":"),
            element_at(toks, i), element_at(toks, i + 1))),
          element_at(un, element_at(toks, i + 1)),
          lit(0L)))
    when(size(toks) >= 2, call_function("div", pairSum, size(toks) - 1))
      .otherwise(lit(0L))
  }

  /** Collect stored [[lmRef]] + [[commonnessRef]] tables into
    * [[lmPpm]]'s literal maps. Bounded by construction (both tables
    * are top-K); the unigram side is pre-divided to its backoff value
    * (`ppm div 10`, α = 0.1) here so the per-row expression stays a
    * pure probe-and-sum. */
  def lmModelLiterals(ref: DataFrame,
                      uniRef: DataFrame): (Map[String, Long], Map[String, Long]) = (
    ref.collect().map { r =>
      val prev = r.getAs[String]("prev")
      (s"${prev.length}:$prev" + r.getAs[String]("token")) ->
        r.getAs[Long]("cond_ppm")
    }.toMap,
    uniRef.collect().map(r =>
      r.getAs[String]("token") -> (r.getAs[Long]("ppm") / 10)).toMap)

  /** BM25-shaped keyword relevance: top-N documents for a fixed term
    * set, integer-exact so the whole ranking is bit-identical in every
    * engine. Two deliberate deviations from textbook BM25, both forced
    * by the no-floats rule and both rank-preserving here: idf is the
    * LOG-FREE inverse frequency `(N * 1000) div df` (monotone in 1/df;
    * the log only dampens — with a handful of query terms the ranking
    * is driven by the same ordering), and the tf saturation
    * `tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))` is evaluated in
    * scaled integer arithmetic (k1 = k1_x100/100, b = b_x100/100,
    * every division an exact `div` mirrored verbatim in the oracle).
    *
    * Overflow contract: the saturation term is computed FIRST, at
    * ×1000 scale — it is bounded by (k1+1)·1000 ≈ 2200 REGARDLESS of
    * tf (numerator tf·(k1+1)·10⁵ over denominator ≥ tf·100), so the
    * subsequent idf multiply is ≤ N·1000·2200 < 2^63 out to ~4·10^12
    * docs with NO assumption on tf or document length. (The previous
    * form multiplied idf·tf·220 before the saturation divide — at
    * N = 10^12 with df = 1, any tf ≥ 42 silently wrapped.)
    *
    * Scale: the exploded token stream is filtered to the query terms
    * BEFORE anything shuffles — a 3-term query over 100 TB moves only
    * the matching tokens (`O(matches)`, usually a vanishing fraction)
    * into one map-side-combined (doc, term) count that carries dl
    * along (no second join against a doc-length table). The df table
    * is |terms| rows (broadcast), corpus stats are one bounded
    * 1-row aggregate collected to literals (the commonnessRef total
    * pattern), and the result is a driver-bounded top-N. */
  def searchBm25(docs: DataFrame, terms: Seq[String],
                 k1X100: Int = 120, bX100: Int = 75,
                 topN: Int = 20,
                 dfRef: Option[DataFrame] = None,
                 statsRef: Option[DataFrame] = None): DataFrame = {
    // `dfRef`/`statsRef`: the production path — [[bm25DfRef]] /
    // [[bm25StatsRef]] computed ONCE over the corpus and stored beside
    // it (the commonnessRef pattern); a query then touches only the
    // matching tokens and |terms| stored-df rows, O(matches) per
    // query with zero corpus-wide aggregation.
    val toks = tokens(col("text"))
    // empty corpus (or a stats table recorded from one): zero hits,
    // not a divide-by-zero out of the avgdl literal
    val stats = statsRef.getOrElse(bm25StatsRef(docs)).collect().headOption
    val nDocs = stats.map(_.getAs[Long]("n")).getOrElse(0L)
    if (nDocs == 0)
      return docs.limit(0).select(col("doc_id"),
        lit(0L).as("n_terms_matched"), lit(0L).as("score_x1000"))
    val avgdlX100 = stats.get.getAs[Long]("tot") * 100 / nDocs
    val termArr = array(terms.map(lit): _*)
    val tf = docs
      .select(col("doc_id"), size(toks).as("dl"),
        explode(filter(toks, t => array_contains(termArr, t))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val df = dfRef.map(_.filter(col("token").isInCollection(terms)))
      .getOrElse(tf.groupBy(col("token")).agg(count(lit(1)).as("df")))
    tf.join(broadcast(df), Seq("token"))
      .withColumn("term_score", expr(
        s"((${nDocs}L * 1000) div df) * ((tf * ${(100 + k1X100) * 1000}) div " +
          s"(tf * 100 + ($k1X100 * ((100 - $bX100) + " +
          s"($bX100 * dl * 100) div ${avgdlX100}L)) div 100)) div 1000"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_matched"),
        sum(col("term_score")).as("score_x1000"))
      .orderBy(col("score_x1000").desc, col("doc_id").asc)
      .limit(topN)
      .select(col("doc_id"), col("n_terms_matched"), col("score_x1000"))
  }

  /** Document frequency per token, top N. */
  def docFrequency(docs: DataFrame, topN: Int = 20): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token").asc)
      .limit(topN)

  /** Exact + HLL distinct token counts (the approx path is the one
    * that scales; exact kept for the sanity bound). */
  def distinctStats(docs: DataFrame): DataFrame =
    docs.select(explode(tokens(col("text"))).as("token"))
      .agg(
        countDistinct(col("token")).as("exact_distinct"),
        approx_count_distinct(col("token")).as("approx_distinct"))

  /** Rolling-hash-style document fingerprint: minimum md5 over the
    * 3-word shingle set (1-min-sketch; identical fingerprint ⟺ likely
    * shared content prefix region).
    *
    * Explode + grouped min keeps md5 inside codegen (the
    * `array_min(transform(...))` per-row form runs interpreted — 13 s
    * at sf0.1 vs ~1 s for this shape) and distributes the shingle
    * work instead of serializing it per document. */
  def fingerprint(docs: DataFrame): DataFrame =
    Dedup.shingleRows(docs)
      .groupBy(col("doc_id"))
      .agg(min(md5(col("shingle"))).as("fingerprint"),
        count(lit(1)).cast("int").as("n_shingles"))
      .select(col("doc_id"), col("fingerprint"), col("n_shingles"))

  /** Whitespace vs BPE-ish token counting: the BPE-ish count adds
    * punctuation marks as their own tokens (regex split analog). */
  def tokenCountModes(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).as("n_ws_tokens"),
      (length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", "")))
        .as("n_punct"))
      .withColumn("n_bpe_ish", col("n_ws_tokens") + col("n_punct"))

  // ---------------------------------------------------------------
  // Boilerplate segment removal (RefinedWeb/CCNet-style line dedup)
  // ---------------------------------------------------------------

  /** One row per document segment: (doc_id, seg_idx, seg). The
    * production segmenter is "split on newline"; the fixture corpus is
    * single-line, so the default segmenter is non-overlapping
    * `segTokens`-token windows (the last segment keeps the short tail)
    * — same operator, different boundary function. Map-only: the
    * segment list is built per row with codegen'd array HOFs and
    * exploded; nothing shuffles until the caller aggregates. Null text
    * coalesces to '' (one empty segment) — the SAME rule the DuckDB
    * oracles apply, so a null-text fixture row cannot make the two
    * engines disagree on segment totals. */
  def segmentRows(docs: DataFrame, segTokens: Int = 5): DataFrame = {
    val toks = tokens(coalesce(col("text"), lit("")))
    val k = segTokens
    docs.select(col("doc_id"), toks.as("toks"))
      .withColumn("n_seg", expr(s"(size(toks) + ${k - 1}) div $k"))
      .filter(col("n_seg") >= 1)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), col("n_seg") - 1),
          i => array_join(slice(col("toks"), i * k + 1, lit(k)), " "))))
      .withColumnRenamed("pos", "seg_idx").withColumnRenamed("col", "seg")
  }

  /** [[segmentRows]], persisted — the boilerplate detector and its
    * apply step reference the segment base from multiple plan legs
    * (detection agg, anti-join, per-doc totals), and Spark's cache
    * manager keys on the canonical plan, so every caller passing the
    * same docs shares one materialization (the
    * [[Dedup.sharedShingleRows]] pattern). */
  def sharedSegmentRows(docs: DataFrame, segTokens: Int): DataFrame =
    // checkpoint cut: flat-scan plan legs for every segment consumer
    SharedCaches.sharedCut(segmentRows(docs, segTokens), "text")

  /** The production segmenter: one row per (doc_id, seg_idx, seg) by
    * newline split — a crawl's page lines, the boundary RefinedWeb/
    * CCNet line-dedup actually uses. Interchangeable with
    * [[segmentRows]] everywhere a `segments` frame is accepted. */
  def lineSegmentRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(split(coalesce(col("text"), lit("")), "\n")))
      .withColumnRenamed("pos", "seg_idx").withColumnRenamed("col", "seg")

  /** The corpus's boilerplate segments: segments whose text recurs in
    * at least `minDocs` DISTINCT documents (headers, nav bars, cookie
    * banners — in this fixture, the shared runs of near-duplicate
    * docs). One map-side-combined aggregation keyed on the segment
    * hash; the result is tiny (recurring segments only), so the apply
    * step can broadcast it. Never all-pairs, never a window.
    * `segments` swaps the boundary function (e.g.
    * [[lineSegmentRows]]); the default is the k-token fixture
    * segmenter. */
  def boilerplateSegments(docs: DataFrame, segTokens: Int = 5,
                          minDocs: Int = 3,
                          segments: Option[DataFrame] = None): DataFrame =
    segments.getOrElse(segmentRows(docs, segTokens))
      .groupBy(md5(col("seg")).as("seg_hash"))
      .agg(min(col("seg")).as("seg"),
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_hits"))
      .filter(col("n_docs") >= minDocs)

  /** APPLY step: rebuild each document with its boilerplate segments
    * removed. The boilerplate table carries NO broadcast hint: it is
    * usually small (recurring segments only), but on a real crawl the
    * set of segments appearing in ≥minDocs docs is corpus-dependent —
    * CCNet-style line-dedup tables run to billions of lines — so a
    * hard `broadcast()` would OOM the driver exactly when the operator
    * matters most. AQE decides at runtime from the table's MEASURED
    * size: broadcast-anti-join when it fits the threshold, shuffled
    * anti-join when it doesn't (OpsSpec pins result equality through
    * the forced-shuffle plan). Then one groupBy(doc_id) whose
    * per-group state is the document's own segments. Emits the
    * scrubbed text's md5 (row-sized proof, same convention as
    * [[Curation.piiScrub]]) plus kept/removed counts; a left join from
    * the corpus keeps fully-boilerplate docs as empty-text rows. */
  def scrubBoilerplate(docs: DataFrame, segTokens: Int = 5,
                       minDocs: Int = 3,
                       ref: Option[DataFrame] = None,
                       segments: Option[DataFrame] = None,
                       joinWith: String = " "): DataFrame = {
    // `ref`: a stored [[boilerplateSegments]] table (the commonnessRef
    // pattern) — production computes the segment table ONCE over the
    // corpus and scrubs every batch against it with a single scan.
    // `segments`/`joinWith`: the boundary function and its inverse —
    // ([[lineSegmentRows]], "\n") for real crawl pages.
    val segs = segments.getOrElse(segmentRows(docs, segTokens))
    val bp = ref.getOrElse(boilerplateSegments(docs, segTokens, minDocs,
        segments = Some(segs)))
      .select(col("seg_hash"))
    val kept = segs
      .join(bp, md5(col("seg")) === col("seg_hash"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
          s => s.getField("seg")), joinWith).as("clean_text"),
        count(lit(1)).as("n_kept"))
    val totals = segs.groupBy(col("doc_id")).agg(count(lit(1)).as("n_segs"))
    // n_segs coalesce: every doc emits ≥1 segment post-coalesce (null
    // text → one '' segment), so the 0 arm only covers a `segments`
    // override that dropped docs — and the oracle's base CTE computes
    // the same coalesced count, keeping the two engines aligned.
    docs.select(col("doc_id"))
      .join(totals, Seq("doc_id"), "left")
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        md5(coalesce(col("clean_text"), lit(""))).as("clean_md5"),
        coalesce(col("n_segs"), lit(0L)).as("n_segs"),
        (coalesce(col("n_segs"), lit(0L)) - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  // ---------------------------------------------------------------
  // Hashed linear quality classifier (fastText-style filter)
  // ---------------------------------------------------------------

  /** fastText-shaped quality classifier: hashed bag-of-words features
    * against a deterministic linear model. Each token hashes to one of
    * `dim` buckets (md5-derived, like every data-dependent decision in
    * this engine) and each bucket carries a fixed pseudo-weight —
    * a 32-bit md5-derived integer centered on zero, so the document
    * score is an exact BIGINT sum (no floats: cross-engine libm
    * rounding can't diverge, and 2^31-bounded weights keep the sum
    * overflow-free below ~2^32 tokens per document). A real deployment
    * swaps the md5 weight lookup for a broadcast trained-weight table
    * keyed on the same bucket ids — the plan shape (map-only scan, no
    * shuffle at all) is identical.
    *
    * keep = (feat_sum >= 0): the classifier's decision boundary.
    *
    * Shape: explode + groupBy(doc_id) rather than a per-row `aggregate`
    * HOF — higher-order lambdas evaluate interpreted (the [[fingerprint]]
    * lesson: 13 s vs ~1 s at sf0.1), while the exploded form keeps both
    * md5 calls inside whole-stage codegen. The groupBy partial-aggregates
    * map-side, so the exploded token rows never cross the network —
    * the shuffle carries one partial (sum, count) per doc per mapper. */
  /** The engine-wide hashed-feature bucket: first 8 md5 hex chars of
    * "feat:"+token, mod dim — non-negative, codegen'd, and mirrored
    * verbatim by every oracle that consumes it (classifier, DSIR).
    * ONE owner so the classifier and the importance-resampling family
    * can never drift onto different feature spaces. */
  def featBucket(t: Column, dim: Int): Column =
    conv(substring(md5(concat(lit("feat:"), t)), 1, 8), 16, 10)
      .cast("long") % dim

  /** The (doc_id, bucket) hashed-token stream the classifier family
    * consumes — derivable per call, or passed in as a shared
    * materialization ([[graft.ops.Curation.sharedFeatureRows]], which
    * carries the identical [[featBucket]] space: the registry's
    * classifier AND DSIR entries all project one cached tokenize+md5
    * pass instead of paying it per entry — 3 full-corpus hash scans
    * saved per registry sweep at sf1). */
  private def bucketRowsOr(docs: DataFrame, dim: Int,
                           bucketRows: Option[DataFrame]): DataFrame =
    bucketRows.map(_.select(col("doc_id"), col("bucket"))).getOrElse(
      docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
        .select(col("doc_id"), featBucket(col("token"), dim).as("bucket")))

  def classifierScore(docs: DataFrame, dim: Int = 1024,
                      bucketRows: Option[DataFrame] = None): DataFrame = {
    // bucket(t) = featBucket; weight(b) = first 8 md5 hex chars of
    // "w:"+b, centered on 2^31
    def weight(bucket: Column): Column =
      conv(substring(md5(concat(lit("w:"), bucket.cast("string"))), 1, 8), 16, 10)
        .cast("long") - 2147483648L
    bucketRowsOr(docs, dim, bucketRows)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(weight(col("bucket"))).as("feat_sum"))
      .withColumn("keep", col("feat_sum") >= 0)
  }

  /** [[classifierScore]]'s per-row Column form — the STREAMING gate
    * shape: a stateless projection usable before any stateful stage
    * (a streaming groupBy(doc_id) would otherwise turn the classifier
    * into keyed state with watermark semantics it doesn't need). The
    * `aggregate` lambda evaluates interpreted, which is the wrong
    * trade for batch scoring (use [[classifierScore]]'s exploded
    * codegen form there) but fine at ingest rates where the per-batch
    * row count is bounded by the trigger. SpanOpsSpec pins bit-exact
    * parity with the batch form. */
  def classifierFeatSum(text: Column, dim: Int = 1024): Column = {
    def weight(t: Column): Column = {
      val bucket = conv(substring(md5(concat(lit("feat:"), t)), 1, 8), 16, 10)
        .cast("long") % dim
      conv(substring(md5(concat(lit("w:"), bucket.cast("string"))), 1, 8), 16, 10)
        .cast("long") - 2147483648L
    }
    aggregate(tokens(text), lit(0L), (acc, t) => acc + weight(t))
  }

  /** [[classifierScore]]'s production path: the weight table is a
    * DataFrame (bucket: long, weight: long) — a TRAINED model's
    * weights, stored beside the corpus — broadcast into a per-token
    * equi-join on the bucket id (the commonness-scoring shape).
    * Buckets absent from the table weigh 0, so a sparse model is
    * stored sparsely. `ClassifierParitySpec`-style check in
    * SpanOpsSpec: with the md5-derived weights materialized as a
    * table, this path reproduces [[classifierScore]] bit-for-bit. */
  def classifierScoreWeighted(docs: DataFrame, weights: DataFrame,
                              dim: Int = 1024,
                              bucketRows: Option[DataFrame] = None): DataFrame = {
    val toks = bucketRowsOr(docs, dim, bucketRows)
    toks.join(broadcast(weights), Seq("bucket"), "left")
      .na.fill(0L, Seq("weight"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("weight")).as("feat_sum"))
      .withColumn("keep", col("feat_sum") >= 0)
  }

  /** The md5-derived pseudo-weights of [[classifierScore]] as a
    * (bucket, weight) table — dim rows, storable, and the parity
    * input for [[classifierScoreWeighted]]. */
  def classifierWeightsRef(docs: DataFrame, dim: Int = 1024): DataFrame = {
    val spark = docs.sparkSession
    spark.range(dim).select(col("id").as("bucket"),
      (conv(substring(md5(concat(lit("w:"), col("id").cast("string"))), 1, 8), 16, 10)
        .cast("long") - 2147483648L).as("weight"))
  }

  /** A LEARNED weight table for [[classifierScoreWeighted]] — the
    * trained-model producer the md5 stand-in was a placeholder for:
    * closed-form Naive Bayes log-odds over the hashed feature buckets,
    * fit on the labeled half of the corpus (`doc_id % 2 = 0` — a
    * deterministic split both engines derive identically) with
    * `posLabel` as the supervision signal.
    *
    * weight(b) = ⌊log₂ p̂(b|pos)⌋ − ⌊log₂ p̂(b|neg)⌋, with each class
    * distribution Laplace-smoothed to integer parts-per-BILLION
    * (`(c+1)·10⁹ div (total+dim)` — [[graft.ops.Curation.dsirBucketPpm]]'s
    * recipe at 1000× the resolution) and the floor-log₂ computed as
    * `length(bin(x))` — the DSIR binary-digit-count trick,
    * bit-identical in Spark and DuckDB, so training is ENGINE-EXACT
    * where textbook `ln` ratios would drift on libm rounding. A
    * document's `feat_sum = Σ weight(bucket)` is then the NB
    * log-likelihood ratio in bits (class prior omitted —
    * `keep = feat_sum ≥ 0` is the equal-prior decision boundary), and
    * scoring reuses the stored-table broadcast join unchanged: swap
    * the table, keep the plan.
    *
    * Resolution window (the reason for ppb over ppm): the integer
    * density floors to 0 — collapsing a rare bucket's log-odds to the
    * smoothing value — once a class's labeled token total exceeds the
    * scale constant, so 10⁹ moves the flattening ceiling from 10⁶ to
    * ~10⁹ labeled tokens per class. The Long headroom bounds the other
    * side: `(c+1)·10⁹` overflows past c ≈ 9.2·10⁹. A training split
    * outside [0, ~9·10⁹] tokens per class needs the next constant
    * revision (10⁹ → 10⁶ of a wider type, or a per-shard train +
    * count merge); the window is documented here so an operator sizing
    * a split knows where the arithmetic's fidelity ends.
    *
    * Scale: one labeled-corpus token scan with map-side combine into
    * ≤dim (bucket, cp, cn) rows, one bounded dim-row aggregate for the
    * totals — the [[graft.ops.Curation.dsirBucketPpm]] cost shape, and
    * training data 1000× larger changes nothing structural. */
  def classifierTrainNb(docs: DataFrame, posLabel: Column,
                        dim: Int = 1024,
                        bucketRows: Option[DataFrame] = None): DataFrame = {
    val spark = docs.sparkSession
    // bucketRows (when shared) must carry the label column posLabel
    // reads — sharedFeatureRows carries `lang`, the registry's
    // supervision signal
    val counts = bucketRows
      .map(_.filter(col("doc_id") % 2 === 0).withColumn("pos", posLabel)
        .select(col("pos"), col("bucket")))
      .getOrElse(docs.filter(col("doc_id") % 2 === 0).withColumn("pos", posLabel)
        .select(col("pos"), explode(tokens(col("text"))).as("token"))
        .select(col("pos"), featBucket(col("token"), dim).as("bucket")))
      .groupBy(col("bucket"))
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("cp"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("cn"))
    // class totals = sums of the ≤dim bucket counts (bounded, never a
    // second corpus scan — the dsirBucketPpm contract)
    val tot = counts
      .agg(coalesce(sum(col("cp")), lit(0L)), coalesce(sum(col("cn")), lit(0L)))
      .collect()(0)
    val (tp, tn) = (tot.getLong(0), tot.getLong(1))
    spark.range(dim).select(col("id").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .na.fill(0L, Seq("cp", "cn"))
      .select(col("bucket"),
        (length(bin(expr(s"((cp + 1) * 1000000000) div (${tp}L + $dim)"))) -
          length(bin(expr(s"((cn + 1) * 1000000000) div (${tn}L + $dim)"))))
          .cast("long").as("weight"))
  }
}
