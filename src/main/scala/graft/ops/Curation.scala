package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for a training-data pipeline: the steps a
  * real 100 TB pretraining-data build runs between raw crawl and
  * tokenized shards, beyond dedup/similarity ([[Dedup]],
  * [[Similarity]]) — repetition-based quality filters (Gopher-style),
  * benchmark decontamination, deterministic stratified sampling,
  * weighted source mixing, sequence packing, and PII scrubbing.
  *
  * Determinism contract (same as the rest of the engine): every
  * data-dependent decision derives from md5 arithmetic or integer
  * basis points, so each operator has a bit-exact DuckDB oracle —
  * no RNG, no floats in predicates.
  *
  * Scale shapes: sampling / mixing / PII are pure per-row projections
  * (map-only, codegen'd, no shuffle); repetition and decontamination
  * are explode + map-side-combined groupBy on doc_id; packing shuffles
  * once on the shard key; SemDeDup bounds its quadratic term by the
  * coarse cell.
  */
object Curation {

  /** Deterministic uniform value in [0, m) per id: 52 bits of
    * md5(id:tag) mod m. The tag decorrelates operators that hash the
    * same id (sampling vs mixing must not select the same docs).
    * Mirrors the oracle's `('0x' || substr(md5(...), 1, 13))::BIGINT`.
    */
  def hashMod(id: Column, tag: String, m: Int): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":" + tag))), 1, 13), 16, 10)
      .cast("long") % m

  /** Exploded (doc_id, ngram) rows, duplicates KEPT — repetition
    * metrics need occurrence counts, unlike [[Dedup.shingleRows]]'
    * distinct shingles. Map-only: the n-gram array is built inside the
    * row and exploded, no shuffle until the caller aggregates. */
  def ngramRows(docs: DataFrame, n: Int): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    docs.select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("toks")) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(col("toks"), i + k)): _*)))
        .as("ngram"))
  }

  /** Gopher-style repetition quality signals (Rae et al. 2021, public):
    * the fraction of bigram occurrences taken by the single most
    * frequent bigram, plus duplicate-bigram and duplicate-trigram
    * occurrence fractions — the standard "remove boilerplate /
    * degenerate repetition" gate. Integer basis points throughout.
    *
    * Shape: ONE map-only projection — the counters are a per-document
    * property, so they are computed where the document lives, in a
    * single codegen'd pass over the token array
    * ([[graft.functions.NgramRepStats]]). Zero shuffle at any corpus
    * size. The former explode → groupBy pipelines (kept as
    * [[repetitionStatsDeclarative]], the spec's cross-check twin) were
    * doc-keyed and map-side combined but still pushed every n-gram
    * STRING through the aggregation hash tables — the whole 5.8 s of
    * this entry at sf1. Docs with < 3 tokens (no trigram) are dropped,
    * mirroring the oracle's `len(t) >= 3`. */
  def repetitionStats(docs: DataFrame,
                      maxTopBigramBp: Int = 2000,
                      maxDupTrigramBp: Int = 2000): DataFrame =
    docs.select(col("doc_id"),
        graft.functions.NgramRepStats.of(TextAnalysis.tokens(col("text"))).as("s"))
      .filter(col("s").isNotNull)
      .select(col("doc_id"),
        expr("(s.bi_max * 10000) div s.bi_total").as("top_bigram_bp"),
        expr("((s.bi_total - s.bi_distinct) * 10000) div s.bi_total").as("dup_bigram_bp"),
        expr("((s.tri_total - s.tri_distinct) * 10000) div s.tri_total").as("dup_trigram_bp"))
      .withColumn("passes_repetition",
        col("top_bigram_bp") <= maxTopBigramBp &&
          col("dup_trigram_bp") <= maxDupTrigramBp)

  /** The declarative twin of [[repetitionStats]] — two explode →
    * groupBy(doc_id, ngram) → groupBy(doc_id) pipelines joined on
    * doc_id — kept as the cross-check the native expression is pinned
    * against (CurationSpec), exactly the [[TextAnalysis.quality]] /
    * TokenStats twin arrangement. */
  private[graft] def repetitionStatsDeclarative(docs: DataFrame,
                                                maxTopBigramBp: Int = 2000,
                                                maxDupTrigramBp: Int = 2000): DataFrame = {
    def stats(n: Int, pre: String): DataFrame =
      ngramRows(docs, n)
        .groupBy(col("doc_id"), col("ngram")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(
          sum(col("c")).as(s"${pre}_total"),
          max(col("c")).as(s"${pre}_max"),
          count(lit(1)).as(s"${pre}_distinct"))
    stats(2, "bi").join(stats(3, "tri"), "doc_id")
      .select(col("doc_id"),
        expr("(bi_max * 10000) div bi_total").as("top_bigram_bp"),
        expr("((bi_total - bi_distinct) * 10000) div bi_total").as("dup_bigram_bp"),
        expr("((tri_total - tri_distinct) * 10000) div tri_total").as("dup_trigram_bp"))
      .withColumn("passes_repetition",
        col("top_bigram_bp") <= maxTopBigramBp &&
          col("dup_trigram_bp") <= maxDupTrigramBp)
  }

  /** Benchmark decontamination: flag training docs whose n-gram sets
    * overlap a held-out benchmark/eval set (here: docs with
    * doc_id % benchMod == 0 stand in for the benchmark; a real
    * pipeline passes the eval corpus as `bench`). The standard
    * decontamination join (e.g. GPT-3 appendix C, public): distinct
    * n-grams per doc, overlap counted against the benchmark's n-gram
    * set.
    *
    * Scale: the benchmark n-gram set is tiny relative to the corpus
    * (benchmarks are thousands of docs, the corpus billions), so it is
    * explicitly `broadcast` — the contamination check is a map-side
    * hash probe plus one map-side-combined groupBy(doc_id); the corpus
    * never shuffles on the n-gram key. Emits only docs with at least
    * one overlapping n-gram (the interesting rows); `is_contaminated`
    * applies the removal threshold. */
  def decontaminate(docs: DataFrame, benchMod: Long = 97, n: Int = 2,
                    flagBp: Int = 5000): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    val grams = docs.select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        explode(TextAnalysis.shingles(col("toks"), n)).as("ngram"))
    val bench = grams.filter(col("doc_id") % benchMod === 0)
      .select(col("ngram")).distinct()
    // ONE train-side gram pass: the broadcast probe is a LEFT join
    // whose hit marker feeds both counts of one map-side-combined
    // aggregation (the former two-leg form — an inner-join overlap
    // count inner-joined back to a separate size count — tokenized and
    // shingled the corpus twice for the same two integers; measured
    // ~40% of the entry's sf1 wall)
    val train = docs.filter(col("doc_id") % benchMod =!= 0)
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        explode(TextAnalysis.shingles(col("toks"), n)).as("ngram"))
    train.join(broadcast(bench.withColumn("_hit", lit(1))), Seq("ngram"), "left")
      .groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_grams"),
        count(col("_hit")).as("n_overlap"))
      .filter(col("n_overlap") > 0)
      .select(col("doc_id"), col("n_grams"), col("n_overlap"),
        expr("(n_overlap * 10000) div n_grams").as("contamination_bp"))
      .withColumn("is_contaminated", col("contamination_bp") >= flagBp)
  }

  /** Deterministic stratified sampling: keep a doc iff its md5-derived
    * uniform draw lands under its stratum's rate (basis points). The
    * hash-gate form is the only sampling that is reproducible across
    * engines, runs, AND repartitions — `df.sample()` is none of those.
    * Map-only; the filter is codegen'd and pushes nothing across the
    * network. At 100 TB this is how you cut a 5% slice per language
    * without a shuffle or a seed-ordering hazard. */
  def sampleStratified(docs: DataFrame, rates: Map[String, Int],
                       defaultBp: Int = 500): DataFrame = {
    val rate = rates.foldLeft(lit(defaultBp).cast("long"): Column) {
      case (acc, (l, bp)) => when(col("lang") === l, lit(bp.toLong)).otherwise(acc)
    }
    docs.select(col("doc_id"), col("lang"),
        hashMod(col("doc_id"), "sample", 10000).as("sample_bp"),
        rate.as("rate_bp"))
      .filter(col("sample_bp") < col("rate_bp"))
  }

  /** Deterministic train/valid/test split: each doc's md5-derived
    * permille bucket assigns its split, so membership at FIXED
    * permilles is a pure function of doc_id — stable across runs,
    * engines, repartitions, AND corpus growth (new docs land in
    * splits without moving any existing doc, the property a random
    * split lacks and the reason held-out sets stay uncontaminated as
    * the corpus is re-crawled). The holdout permilles claim the TOP
    * of the bucket range, so GROWING a holdout only promotes docs
    * toward it: no test doc ever returns to train or valid, and no
    * train doc skips into the band above (valid may promote to test
    * as the expanding test band overtakes its buckets — spec-pinned).
    * SHRINKING a holdout, by construction, returns its upper buckets
    * to train — do that only if previously-held-out data may enter
    * training. Map-only, codegen'd, zero shuffle at any scale. */
  def splitAssign(docs: DataFrame, validPermille: Int = 10,
                  testPermille: Int = 10): DataFrame =
    docs.select(col("doc_id"),
        hashMod(col("doc_id"), "split", 1000).as("split_bucket"))
      .withColumn("split",
        when(col("split_bucket") < 1000 - validPermille - testPermille, "train")
          .when(col("split_bucket") < 1000 - testPermille, "valid")
          .otherwise("test"))

  /** Per-source document cap — the Gopher/RefinedWeb per-domain cap:
    * keep at most `cap` docs per source, highest [[TextAnalysis
    * .quality]] score first (doc_id breaks ties deterministically),
    * so one hot domain cannot dominate the training mix. The window
    * is PARTITIONED BY source (per-source state only), and the
    * `row_number <= cap` filter triggers Spark's WindowGroupLimit
    * rank pushdown: every map task pre-limits its partial groups to
    * `cap` rows BEFORE the shuffle, so a 100 TB hot domain ships
    * O(tasks·cap) rows to its reducer, not its full document count
    * (CurationSpec pins the WindowGroupLimit in the physical plan).
    * The score comes from [[TextAnalysis.withQuality]] — a stateless
    * per-row projection — so the whole operator is scan → project →
    * rank-limited window: no self-join, ONE shuffle (the window's). */
  def sourceCap(docs: DataFrame, cap: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // desc_nulls_last EXPLICITLY: a null-text doc scores a null
    // quality and must rank below every scored doc in both engines.
    // Spark's .desc and DuckDB's DESC both default to nulls-last, but
    // the cross-engine agreement is a RULE of this operator, not a
    // coincidence of two engines' defaults — both sides spell it out.
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality_score_bp").desc_nulls_last, col("doc_id"))
    TextAnalysis.withQuality(docs)
      .select(col("doc_id"), col("source"), col("quality_score_bp"))
      .withColumn("source_rank", row_number().over(w).cast("long"))
      .filter(col("source_rank") <= cap)
  }

  /** Weighted source mixing: replicate each doc `weight/1000` times
    * (training-mix epochs per source), with the fractional part
    * resolved by a deterministic per-doc hash draw — so a 2.5×
    * source emits 2 copies of every doc plus a third copy of a
    * hash-selected half. Output is (doc, copy_idx) rows, the shape a
    * downstream shuffle-shard step consumes.
    *
    * Map-only explode: each row expands to its own copies in place —
    * no shuffle, no skew (the expansion factor is bounded by the mix
    * weight, uniform within a source). */
  def mixWeighted(docs: DataFrame, weightsX1000: Map[String, Int],
                  defaultX1000: Int = 500): DataFrame = {
    val w = weightsX1000.foldLeft(lit(defaultX1000).cast("long"): Column) {
      case (acc, (s, x)) => when(col("source") === s, lit(x.toLong)).otherwise(acc)
    }
    docs.select(col("doc_id"), col("source"), w.as("w"),
        hashMod(col("doc_id"), "mix", 1000).as("frac_draw"))
      .withColumn("n_copies",
        expr("w div 1000") + when(col("frac_draw") < col("w") % 1000, 1L).otherwise(0L))
      // Spark's sequence(1, 0) generates DESCENDING [1, 0] instead of
      // empty, so zero-copy docs must be filtered out before the
      // explode (the oracle's range(1, n+1) is half-open and empties
      // naturally).
      .filter(col("n_copies") >= 1)
      .select(col("doc_id"), col("source"), col("n_copies"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy_idx"))
  }

  /** Sequence packing (concat-and-chunk): concatenate each shard's
    * docs in doc_id order and cut every `ctx` tokens — the standard
    * pretraining packing. A doc whose token span straddles a cut
    * appears in every pack it touches: pack ids
    * `floor(start/ctx) .. floor((end-1)/ctx)` from its running-sum
    * span.
    *
    * The running sum is windowed PER SHARD (`source` here; a hash
    * bucket in production) — a global cumulative sum would serialize
    * the corpus through one partition, while per-shard windows shuffle
    * once on the shard key and scan each shard in parallel, which is
    * exactly how real pipelines pack (shard-local order, not global).
    */
  def packSequences(docs: DataFrame, ctx: Int = 512): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    docs.select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).as("n_tokens"))
      .withColumn("end_off", sum(col("n_tokens")).over(w))
      .withColumn("start_off", col("end_off") - col("n_tokens"))
      .select(col("source"), col("doc_id"), col("n_tokens"), col("start_off"),
        explode(sequence(expr(s"start_off div $ctx"), expr(s"(end_off - 1) div $ctx")))
          .as("pack_id"))
  }

  /** SemDeDup (Abbas et al. 2023, public): semantic dedup over
    * embeddings — assign every vector to a coarse cell, then find
    * near-duplicate pairs ONLY within a cell. The cell assignment
    * bounds the quadratic term: at 100 TB each cell's pair join is
    * corpus/k wide, and cells process in parallel — the cluster-then-
    * dedup structure is the whole point of the method.
    *
    * Centroids are [[Similarity.sampledCentroids]] — a deterministic
    * md5-ordered sample FROM the corpus (oracle-expressible). This is
    * load-bearing, not cosmetic: the embeddings scale tiers measured
    * the earlier fixed md5 matrix leaving ~9% of the corpus in one
    * cell at every n, which turns this operator's per-cell term
    * quadratic no matter what k says (SCALING.md, beyond-the-knee
    * table). Sampled centroids hold candidates at ~n·target/2 flat. A
    * production fit can still swap in [[Similarity.kmeansCentroids]]
    * without touching the plan.
    *
    * `nCells` is the scale dial and must TRACK THE CORPUS: the
    * within-cell join does ~(n/k)² comparisons per cell, so a fixed k
    * silently reverts to all-pairs as n grows. Size it with
    * [[semdedupCellsFor]] (k = n / targetCellSize) — the default 8 is
    * a fixture setting, sized for the test corpus, not a constant.
    *
    * Returns (cell, id_a, id_b, score) with id_a < id_b and cosine >=
    * threshold. */
  def semdedupPairs(embeddings: DataFrame, threshold: Double,
                    nCells: Int = 8): DataFrame = {
    val prep = Similarity.prepared(embeddings)
    semdedupPairsWith(prep, threshold, Similarity.sampledCentroids(prep, nCells))
  }

  /** [[semdedupPairs]] over an already-prepared frame and an
    * already-drawn centroid sample — the seam [[semdedupSurvivors]]
    * shares so one deterministic sample (a full-corpus md5-rank job)
    * serves both the pair join and the survivor-side assignment
    * instead of being drawn twice. */
  private def semdedupPairsWith(prep: DataFrame, threshold: Double,
                                centroids: Array[Array[Double]]): DataFrame = {
    val e = Similarity.assignCells(prep, centroids)
      // Explicit-N repartition on the join key, for two reasons the
      // tiers measured (SCALING.md). (1) Broadcasting the O(n)
      // assignment table is a toy-scale accident that pins the
      // per-pair work to the scan's partition count (a megabyte file
      // scans as ONE partition). (2) Subtler: this join's OUTPUT is
      // quadratic in cell occupancy while its map-side INPUT is a few
      // MB/10⁵ rows, and AQE coalescing sizes reducers on INPUT bytes
      // — at the 60k-vector tier it folded the pair stage to a single
      // task (one core, 16+ min, 31 idle). An exploding join must pin
      // its reducer count; REPARTITION_BY_NUM is exactly the origin
      // AQE leaves alone, and the merge join below reuses the
      // distribution, so the corpus still crosses the network once.
      .repartition(
        prep.sparkSession.sessionState.conf.numShufflePartitions,
        col("cell"))
    val a = e.select(col("cell"), col("vec_id").as("id_a"),
      col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("cell"), col("vec_id").as("id_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    a.hint("merge").join(b.hint("merge"), Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("raw", Similarity.cosine(col("va"), col("na"), col("vb"), col("nb")))
      // Two-stage threshold: round() on DoubleType routes every value
      // through BigDecimal.setScale — fine on output-sized data, the
      // dominant per-candidate cost when evaluated on all ~n·target/2
      // in-cell pairs. The raw-cosine pre-filter is a strict superset
      // of the rounded filter (round-half-up at 4 decimals can lift a
      // value by at most 5e-5, so any pair with round(raw) ≥ t has
      // raw ≥ t − 1e-4), so the cheap double compare prunes ~99.9% of
      // candidates and the exact rounded filter — unchanged semantics,
      // same oracle — runs on survivors only.
      .filter(col("raw") >= threshold - 1e-4)
      .withColumn("score", round(col("raw"), 4))
      .filter(col("score") >= threshold)
      .select(col("cell"), col("id_a"), col("id_b"), col("score"))
  }

  /** nCells sized so the within-cell pair join stays bounded as the
    * corpus grows: k = ceil(corpus / targetCellSize), making each
    * cell's quadratic term ~targetCellSize² regardless of n. At 100 TB
    * pass the corpus count (or a cheap approx_count_distinct) here
    * rather than reusing a fixture constant; per the SemDeDup paper
    * the cluster count is the knob that keeps the method linear. */
  def semdedupCellsFor(corpusSize: Long, targetCellSize: Long = 10000L): Int = {
    require(corpusSize >= 0 && targetCellSize > 0)
    math.max(1L, math.min(Int.MaxValue.toLong,
      (corpusSize + targetCellSize - 1) / targetCellSize)).toInt
  }

  /** The SemDeDup prune: survivors after removing, from every
    * near-dup pair, the larger id (min-id-wins — deterministic, and a
    * chain a<b<c keeps exactly a). Anti-join against the pruned-id
    * set; the pair set is small (near-dups above a high threshold), so
    * AQE broadcasts it. */
  def semdedupSurvivors(embeddings: DataFrame, threshold: Double,
                        nCells: Int = 8): DataFrame = {
    // ONE centroid draw serves both legs: the sample is deterministic,
    // but drawing it twice costs a second full-corpus md5-rank job
    val prep = Similarity.prepared(embeddings)
    val cs = Similarity.sampledCentroids(prep, nCells)
    val pruned = semdedupPairsWith(prep, threshold, cs)
      .select(col("id_b").as("vec_id")).distinct()
    Similarity.assignCells(prep, cs)
      .join(pruned, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cell"))
  }

  /** Token-budget selection: rank the corpus by quality (best first,
    * doc_id ties ascending) and keep docs until the cumulative token
    * count reaches `budget` — the "take the best N tokens" cut every
    * pretraining mix ends with. A doc is kept iff the tokens BEFORE it
    * in rank order total < budget (so the cut doc itself is kept and
    * may overshoot — the standard greedy prefix rule).
    *
    * The naive plan is a cumulative sum over a global ORDER BY, which
    * serializes the corpus through one window partition. Instead:
    * quality is an integer in [0, 10000] basis points, so
    *   1. aggregate token totals per score bin (map-side combined;
    *      output ≤ 10001 rows regardless of corpus size),
    *   2. prefix-sum the BIN totals best-first — a window over the
    *      tiny aggregated frame, never the corpus,
    *   3. broadcast-join the bin prefixes back: bins that fit entirely
    *      under budget keep all their docs with a map-only filter; at
    *      most ONE bin straddles the cut, and only ITS rows (filtered
    *      first, ~corpus/10001) pay an intra-bin ordered window.
    * At 100 TB every doc crosses the network zero times for the
    * decision; the only sorted window runs on the single boundary bin.
    */
  /** The (doc_id, quality_score_bp, n_tokens) scoring base shared by
    * the token-budget family through the session cache registry —
    * the [[sharedFeatureRows]] arrangement applied to quality: the
    * tokenize+score pass is per-TOKEN work, every consumer's plan
    * references the base from two legs (bin aggregation + the join
    * back), and the budget entries share one corpus. One
    * materialization of per-DOC rows serves all of them. */
  def sharedQualityRows(docs: DataFrame): DataFrame =
    // a checkpoint CUT (not a lazy persist): consumers reference the
    // scoring base from two legs, and the cut keeps the per-token
    // quality pipeline out of every consumer's analyzed tree — the
    // plan-size/driver-rendering rationale of Dedup.sharedMinhashPairs
    SharedCaches.sharedCut(
      TextAnalysis.quality(docs)
        .select(col("doc_id"), col("quality_score_bp"), col("n_tokens").cast("long")),
      "quality")

  def tokenBudgetSelect(docs: DataFrame, budget: Long,
                        scoredIn: Option[DataFrame] = None): DataFrame = {
    val scored = scoredIn.getOrElse(TextAnalysis.quality(docs)
      .select(col("doc_id"), col("quality_score_bp"), col("n_tokens").cast("long")))
    val bins = scored.groupBy(col("quality_score_bp"))
      .agg(sum(col("n_tokens")).as("bin_tokens"))
    // ≤ 10001 rows: the unpartitioned window is over the aggregated
    // bin frame only, not the corpus.
    val wb = Window.orderBy(col("quality_score_bp").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binPrefix = bins
      .withColumn("prefix_before", sum(col("bin_tokens")).over(wb) - col("bin_tokens"))
    val withBin = scored.join(broadcast(binPrefix), Seq("quality_score_bp"))
    val fullyKept = withBin
      .filter(col("prefix_before") + col("bin_tokens") <= budget)
    // The one bin straddling the budget: rank its docs by doc_id and
    // keep while the exclusive running total stays under budget.
    val wBoundary = Window.partitionBy(col("quality_score_bp")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundaryKept = withBin
      .filter(col("prefix_before") < budget &&
        col("prefix_before") + col("bin_tokens") > budget)
      .withColumn("start_off",
        col("prefix_before") + sum(col("n_tokens")).over(wBoundary) - col("n_tokens"))
      .filter(col("start_off") < budget)
    fullyKept.select(col("doc_id"), col("quality_score_bp"), col("n_tokens"))
      .unionByName(
        boundaryKept.select(col("doc_id"), col("quality_score_bp"), col("n_tokens")))
  }

  /** [[tokenBudgetSelect]] with a budget per stratum (language here —
    * the shape of a real pretraining mix: "300B tokens of English,
    * 50B of German, …"). The same bin-prefix decomposition, one level
    * down: bin totals per (stratum, score) [≤ strata × 10001 rows],
    * bin prefix-sums windowed PER STRATUM (so even that tiny window is
    * partitioned), and at most one boundary bin per stratum pays an
    * intra-bin ordered window — after a filter that keeps only those
    * bins' rows. Strata missing from `budgets` get `defaultBudget`. */
  def tokenBudgetSelectByStratum(docs: DataFrame, budgets: Map[String, Long],
                                 defaultBudget: Long = 0L,
                                 scoredIn: Option[DataFrame] = None): DataFrame = {
    val scored = scoredIn.getOrElse(TextAnalysis.quality(docs)
        .select(col("doc_id"), col("quality_score_bp"), col("n_tokens").cast("long")))
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val budget = budgets.foldLeft(lit(defaultBudget).cast("long"): Column) {
      case (acc, (l, b)) => when(col("lang") === l, lit(b)).otherwise(acc)
    }
    val bins = scored.groupBy(col("lang"), col("quality_score_bp"))
      .agg(sum(col("n_tokens")).as("bin_tokens"))
    val wb = Window.partitionBy(col("lang")).orderBy(col("quality_score_bp").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binPrefix = bins
      .withColumn("prefix_before", sum(col("bin_tokens")).over(wb) - col("bin_tokens"))
    val withBin = scored.join(broadcast(binPrefix), Seq("lang", "quality_score_bp"))
      .withColumn("budget", budget)
    val fullyKept = withBin
      .filter(col("prefix_before") + col("bin_tokens") <= col("budget"))
    val wBoundary = Window.partitionBy(col("lang"), col("quality_score_bp"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundaryKept = withBin
      .filter(col("prefix_before") < col("budget") &&
        col("prefix_before") + col("bin_tokens") > col("budget"))
      .withColumn("start_off",
        col("prefix_before") + sum(col("n_tokens")).over(wBoundary) - col("n_tokens"))
      .filter(col("start_off") < col("budget"))
    val cols = Seq(col("doc_id"), col("lang"), col("quality_score_bp"), col("n_tokens"))
    fullyKept.select(cols: _*).unionByName(boundaryKept.select(cols: _*))
  }

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** Deterministic PII injection for the scrub fixture: the synthetic
    * corpus contains no contact strings, so (like
    * [[Multimodal.withPayload]]'s fake binary) a derived email lands
    * on every 5th doc and a phone-shaped token on every 7th — making
    * the scrubber's find/replace paths exercisable and
    * oracle-checkable. Clearly a fixture shim, not part of the
    * operator. */
  def withPii(docs: DataFrame): DataFrame =
    docs
      .withColumn("text",
        when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com")))
          .otherwise(col("text")))
      .withColumn("text",
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" call 555-"),
            (col("doc_id") % 9000 + 1000).cast("string")))
          .otherwise(col("text")))

  /** PII scrub: count and redact email / phone patterns. Pure per-row
    * regex projections — codegen'd, map-only, the cheapest possible
    * shape for a full-corpus pass. The regexes are in the common
    * Java/RE2 dialect subset so the oracle applies the identical
    * patterns. Emits the redacted text's md5 (stable row-sized proof
    * of the rewrite) rather than the text itself. */
  def piiScrub(docs: DataFrame): DataFrame = {
    // literal gates in front of the regex engine: both patterns
    // REQUIRE a literal ('@' / '-'), so a text without it cannot match
    // and the regex pass — the expensive per-start-position class walk
    // — is skipped behind a codegen'd contains() scan. On the fixture
    // only 1/5 of docs carry an email and 1/7 a phone; the gate cut
    // the sf1 wall 7.0 → 1.8 s with bit-identical output (the `when`
    // is negated so a NULL text still flows into the regex functions
    // and keeps their native null-propagation)
    val hasAt = col("text").contains("@")
    val hasDash = col("text").contains("-")
    val emailScrubbed = when(!hasAt, col("text"))
      .otherwise(regexp_replace(col("text"), EmailRe, "<EMAIL>"))
    val redacted = when(!hasDash, emailScrubbed)
      .otherwise(regexp_replace(emailScrubbed, PhoneRe, "<PHONE>"))
    docs.select(col("doc_id"),
      when(!hasAt, lit(0L)).otherwise(regexp_count(col("text"), lit(EmailRe)))
        .cast("int").as("n_emails"),
      when(!hasDash, lit(0L)).otherwise(regexp_count(col("text"), lit(PhoneRe)))
        .cast("int").as("n_phones"),
      md5(redacted).as("redacted_md5"),
      length(redacted).as("redacted_len"))
  }

  /** Snapshot diff between two corpus versions: which docs were added,
    * removed, or changed content — the bookkeeping operator that feeds
    * incremental reprocessing (added ∪ changed = what must re-enter
    * the dedup/curation pipeline; removed = what to retract from
    * derived tables). Content identity is the text md5, so a
    * metadata-only rewrite does not trigger reprocessing. One full
    * outer join on doc_id — the single unavoidable shuffle for a diff;
    * co-locate it for free by storing snapshots bucketed on doc_id
    * ([[graft.tables.Bucketed]]). Unchanged docs (the overwhelming
    * majority at scale) are filtered out before anything downstream. */
  def snapshotDiff(old: DataFrame, neu: DataFrame): DataFrame = {
    val o = old.select(col("doc_id"), md5(col("text")).as("old_fp"))
    val n = neu.select(col("doc_id"), md5(col("text")).as("new_fp"))
    o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_fp").isNull, "added")
          .when(col("new_fp").isNull, "removed")
          .when(col("old_fp") =!= col("new_fp"), "changed"))
      .filter(col("status").isNotNull)
      .select(col("doc_id"), col("status"), col("old_fp"), col("new_fp"))
  }

  /** DSIR-style hashed-feature distribution: the add-one-smoothed
    * bucket frequencies of a corpus's tokens over `dim` md5 buckets
    * ([[TextAnalysis.featBucket]] — the classifier's feature space),
    * in integer parts-per-million: `ppm_b = (count_b + 1)·10⁶ div
    * (total + dim)`. The table is exactly `dim` rows (absent buckets
    * carry the smoothed floor), storable beside the corpus like
    * [[TextAnalysis.commonnessRef]], and is the model half of
    * importance resampling (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): estimate the target
    * and raw feature distributions once, then score any batch against
    * the two stored tables.
    *
    * Integer contract: ppm arithmetic is overflow-safe to ~9·10^12
    * token occurrences; a bucket whose smoothed ppm floors to 0 (a
    * corpus past 10⁶ tokens with a near-empty bucket) is
    * well-defined downstream — the magnitude measure `length(bin(x))`
    * gives 0 and 1 the same magnitude in both engines.
    *
    * Scale: one map-side-combined bucket count (tokens shuffle only
    * as dim-bounded partials), a `dim`-row left join to fill absent
    * buckets, one bounded total. */
  /** The hashed-feature stream (doc_id, lang, bucket) every DSIR leg
    * consumes — tokenize + md5-hash ONCE per session via the shared
    * cache: the target distribution (a lang filter of it), the raw
    * distribution, and the scoring probe are all projections of this
    * one materialization (the [[TextAnalysis.sharedBigramRows]]
    * pattern; without it the family pays ~5 tokenize scans per
    * query). */
  def sharedFeatureRows(docs: DataFrame, dim: Int = 1024): DataFrame =
    // a checkpoint CUT: the classifier/DSIR family references this
    // base from up to three legs per query (target dist, raw dist,
    // scoring probe), so the cut both materializes once and keeps the
    // tokenize+hash lineage out of every consumer's analyzed tree
    SharedCaches.sharedCut(
      docs.select(col("doc_id"), col("lang"),
          explode(TextAnalysis.tokens(col("text"))).as("token"))
        .select(col("doc_id"), col("lang"),
          TextAnalysis.featBucket(col("token"), dim).as("bucket")),
      "curation")

  def dsirBucketPpm(docs: DataFrame, dim: Int = 1024,
                    bucketRows: Option[DataFrame] = None): DataFrame = {
    val bk = bucketRows.getOrElse(
      docs.select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .select(TextAnalysis.featBucket(col("token"), dim).as("bucket")))
    val counts = bk.groupBy(col("bucket")).agg(count(lit(1)).as("c"))
    // the total token count IS the sum of the dim-bounded bucket
    // counts — one bounded aggregate over ≤dim rows, never a second
    // corpus scan (empty corpus → 0, the smoothing floor still holds)
    val total = counts.agg(coalesce(sum(col("c")), lit(0L)).as("t"))
      .collect()(0).getLong(0)
    docs.sparkSession.range(dim).select(col("id").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .na.fill(0L, Seq("c"))
      .select(col("bucket"),
        expr(s"((c + 1) * 1000000) div (${total}L + $dim)").as("ppm"))
  }

  /** Per-document DSIR importance score against stored target/raw
    * feature distributions: `Σ_tokens (log₂⌊p_ppm⌋ − log₂⌊q_ppm⌋)`,
    * with the integer floor-log₂ computed as `length(bin(x))` — the
    * binary-digit count, bit-identical in Spark and DuckDB, so the
    * whole importance weight is engine-exact where the textbook
    * log-ratio would drift on libm rounding. High = the document's
    * hashed features look more like the TARGET corpus than like the
    * raw pool — the signal DSIR resamples on.
    *
    * Scale: the batch explodes to tokens (map-only), probes two
    * `dim`-row broadcasts, and aggregates per doc with map-side
    * combine — O(batch) with stored distributions, the
    * commonness/classifier serving shape. */
  def importanceWeights(raw: DataFrame, targetPpm: DataFrame,
                        rawPpm: DataFrame, dim: Int = 1024,
                        bucketRows: Option[DataFrame] = None): DataFrame =
    bucketRows.map(_.select(col("doc_id"), col("bucket"))).getOrElse(
        raw.select(col("doc_id"),
            explode(TextAnalysis.tokens(col("text"))).as("token"))
          .withColumn("bucket", TextAnalysis.featBucket(col("token"), dim))
          .select(col("doc_id"), col("bucket")))
      .join(broadcast(targetPpm.select(col("bucket"), col("ppm").as("p_ppm"))), Seq("bucket"))
      .join(broadcast(rawPpm.select(col("bucket"), col("ppm").as("q_ppm"))), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum((length(bin(col("p_ppm"))) - length(bin(col("q_ppm"))))
          .cast("long")).as("dsir_score"))

  /** [[importanceWeights]]'s per-row Column form — the STREAMING gate
    * shape (the [[TextAnalysis.lmPpm]] / `classifierFeatSum` pattern):
    * the two stored distributions travel as dim-entry map LITERALS
    * (every bucket present by construction, so no null branch), and
    * the score is a stateless projection usable before any stateful
    * stage. The `aggregate` lambda evaluates interpreted — the wrong
    * trade for batch (use [[importanceWeights]]'s exploded codegen
    * form there), fine at ingest rates where the trigger bounds the
    * batch. Addition commutes, so the per-row sum is bit-identical to
    * the batch groupBy's `dsir_score` (spec-pinned). */
  def dsirScorePerRow(text: Column, pPpm: Map[Long, Long],
                      qPpm: Map[Long, Long], dim: Int = 1024): Column = {
    // `element_at` on a map literal yields null for an absent bucket,
    // and that null would propagate through the whole aggregate —
    // every row's score silently null (and a minDsirScore gate then
    // drops every doc). A truncated or hand-built ppm table must fail
    // HERE, loudly, not downstream as an empty corpus.
    require(pPpm.size == dim && pPpm.keySet == (0L until dim.toLong).toSet,
      s"target ppm table must cover all $dim buckets exactly (got ${pPpm.size})")
    require(qPpm.size == dim && qPpm.keySet == (0L until dim.toLong).toSet,
      s"raw ppm table must cover all $dim buckets exactly (got ${qPpm.size})")
    val p = typedlit(pPpm)
    val q = typedlit(qPpm)
    aggregate(TextAnalysis.tokens(text), lit(0L), (acc, t) => {
      val b = TextAnalysis.featBucket(t, dim)
      acc + (length(bin(element_at(p, b))) - length(bin(element_at(q, b)))).cast("long")
    })
  }

  /** Collect stored [[dsirBucketPpm]] tables into [[dsirScorePerRow]]'s
    * literal maps — dim-bounded by construction (the
    * `lmModelLiterals` precedent). */
  def dsirModelLiterals(targetPpm: DataFrame,
                        rawPpm: DataFrame): (Map[Long, Long], Map[Long, Long]) = {
    def toMap(df: DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("ppm")).toMap
    (toMap(targetPpm), toMap(rawPpm))
  }

  /** The selection step: keep the `topN` raw documents most
    * target-like by importance score (desc, doc_id tiebreak), with
    * their metadata. TopN is driver-bounded; a production variant
    * thresholds on score instead (same plan minus the limit) or
    * samples Gumbel-perturbed scores — the ranking this computes is
    * the input to either. */
  def importanceResample(raw: DataFrame, targetPpm: DataFrame,
                         rawPpm: DataFrame, topN: Int,
                         dim: Int = 1024,
                         bucketRows: Option[DataFrame] = None): DataFrame = {
    val w = importanceWeights(raw, targetPpm, rawPpm, dim, bucketRows)
      .orderBy(col("dsir_score").desc, col("doc_id").asc)
      .limit(topN)
    raw.join(w, Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_tokens"), col("dsir_score"))
  }
}
