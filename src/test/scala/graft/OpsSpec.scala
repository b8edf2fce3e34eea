package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GraftFunctions, SimHash64}
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Pipeline-operator semantics on handcrafted inputs. */
class OpsSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", s"src${id % 2}", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("dedup_exact groups identical texts, keeps min doc_id") {
    val d = docs(1L -> "a b c", 2L -> "a b c", 3L -> "x y z")
    val out = Dedup.exact(d).collect().map(r =>
      r.getAs[Long]("keep_doc_id") -> r.getAs[Long]("n_copies")).toMap
    assert(out == Map(1L -> 2L, 3L -> 1L))
  }

  test("minhash LSH finds planted near-dup, skips unrelated docs") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = base.replace("w7", "changed")
    val other = (1 to 30).map(i => s"z$i").mkString(" ")
    val d = docs(1L -> base, 2L -> nearDup, 3L -> other)
    val pairs = Dedup.minhashPairs(d, threshold = 0.5).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("incremental minhash: fresh-touching pairs only — corpus x corpus never re-reported") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val freshBase = (1 to 30).map(i => s"f$i").mkString(" ")
    val corpus = docs(
      1L -> base,
      2L -> base.replace("w7", "changed"), // corpus-internal near-dup: settled, must NOT reappear
      8L -> (1 to 30).map(i => s"q$i").mkString(" "))
    val fresh = docs(
      3L -> base.replace("w9", "tweaked"), // duplicates corpus doc 1
      4L -> (1 to 30).map(i => s"z$i").mkString(" "), // novel
      5L -> freshBase,
      6L -> freshBase.replace("f3", "altered")) // fresh x fresh dup
    val got = Dedup.incrementalMinhashPairs(corpus, fresh).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(got.contains((1L, 3L)), "fresh doc duplicating the corpus must be caught")
    assert(got.contains((5L, 6L)), "dupes within the increment must be caught")
    assert(!got.exists(p => Set(1L, 2L, 8L).contains(p._1) && Set(1L, 2L, 8L).contains(p._2)),
      "corpus x corpus pairs are not this operator's business")
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L), "novel doc has no pair")
    // agrees with the full-corpus run restricted to fresh-touching pairs
    val full = Dedup.minhashPairs(corpus.unionByName(fresh)).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val freshIds = Set(3L, 4L, 5L, 6L)
    assert(got == full.filter(p => freshIds(p._1) || freshIds(p._2)))
    // the APPLY: 3 dropped (duplicates corpus doc 1), 6 dropped (5 < 6
    // within the batch), 4 and 5 survive
    val kept = Dedup.applyIncrementalDedup(
      fresh, Dedup.incrementalMinhashPairs(corpus, fresh))
      .collect().map(_.getAs[Long]("doc_id")).sorted
    assert(kept.toSeq == Seq(4L, 5L))
  }

  test("corpus band table round-trips through parquet across sessions") {
    // the production contract of incrementalMinhashPairs(corpusBands=…):
    // bands computed in a PREVIOUS run, stored beside the corpus, and
    // read back cold — must give the same pairs as recomputing them.
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val corpus = docs(
      1L -> base,
      8L -> (1 to 30).map(i => s"q$i").mkString(" "))
    val fresh = docs(3L -> base.replace("w9", "tweaked"))
    val bandDir = java.nio.file.Files.createTempDirectory("bands").toString
    Dedup.minhashBands(Dedup.minhashSignature(Dedup.shingleRows(corpus)))
      .write.mode("overwrite").parquet(bandDir)
    // a cold read has no lineage to this session's plans — only the
    // on-disk bytes; any schema/type drift through parquet would show
    val reloaded = spark.read.parquet(bandDir)
    val viaStored = Dedup.incrementalMinhashPairs(corpus, fresh,
        corpusBands = Some(reloaded))
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("jaccard_bp"))).toSet
    val recomputed = Dedup.incrementalMinhashPairs(corpus, fresh)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("jaccard_bp"))).toSet
    assert(viaStored == recomputed && viaStored.map(p => (p._1, p._2)) == Set((1L, 3L)))
  }

  test("incremental embedding LSH == full run restricted to fresh-touching pairs; stored bands agree") {
    import org.apache.spark.sql.functions.col
    val e = graft.tables.Fixtures.embeddings(spark, "/root/testdata/sf0.001")
    val corpus = e.filter(col("vec_id") % 5 =!= 0)
    val fresh = e.filter(col("vec_id") % 5 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("score"))).toSet
    val got = pairs(Similarity.incrementalNearDupLsh(corpus, fresh, threshold = 0.4))
    val full = pairs(Similarity.nearDupPairsLsh(e, threshold = 0.4))
    val expected = full.filter(p => p._1 % 5 == 0 || p._2 % 5 == 0)
    assert(got == expected && got.nonEmpty)
    assert(got != full, "corpus x corpus pairs must be excluded (they exist in the fixture)")
    // production shape: corpus band table stored beside the corpus,
    // read back cold, same pairs
    val bandDir = java.nio.file.Files.createTempDirectory("lshbands").toString
    Similarity.lshBanded(corpus).write.mode("overwrite").parquet(bandDir)
    val viaStored = pairs(Similarity.incrementalNearDupLsh(corpus, fresh, threshold = 0.4,
      corpusBands = Some(spark.read.parquet(bandDir))))
    assert(viaStored == expected)
  }

  test("applyIncrementalDedup: corpus always wins regardless of id order; greedy chain over-drops") {
    import spark.implicits._
    val fresh = Seq(10L, 11L, 12L, 13L).toDF("doc_id")
    // 10-11-12 is a fresh chain; 13 duplicates corpus doc 99 (99 > 13:
    // the corpus doc still wins — it is the already-kept set)
    val pairs = Seq((10L, 11L), (11L, 12L), (13L, 99L)).toDF("doc_a", "doc_b")
    val kept = Dedup.applyIncrementalDedup(fresh, pairs)
      .collect().map(_.getLong(0)).sorted
    // greedy: 11 drops via 10, 12 drops via the already-dropped 11
    // (documented over-drop — never keeps two near-dups), 13 drops via
    // the corpus partner
    assert(kept.toSeq == Seq(10L))
  }

  test("simhash expression: codegen result matches direct compute; near-dup pair close") {
    GraftFunctions.register(spark)
    val d = docs(1L -> "alpha beta gamma delta", 2L -> "alpha beta gamma epsilon",
      3L -> "totally different words here")
    val got = d.select(col("doc_id"), expr("simhash64(split(text, ' '))").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == SimHash64.ofTokens(Seq("alpha", "beta", "gamma", "delta")))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(got(1L), got(2L)) < hamming(got(1L), got(3L)))
  }

  test("nearest_cell expression: codegen == interpreted == declarative argmin, at a k past the literal form's limit") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, array_min, array_position, expr, lit}
    // 40 centroids × 16 dims from the md5 draw, 300 deterministic
    // vectors — large enough k that the retired k-inlined-literals
    // formulation is the shape this expression exists to replace
    val dim = 16
    val cs = Array.tabulate(40, dim)((c, d) => Similarity.md5Unit(s"nc:$c:$d"))
    val emb = (0 until 300).map { i =>
      (i.toLong, Array.tabulate(dim)(d => Similarity.md5Unit(s"ncv:$i:$d").toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    val prep = Similarity.prepared(emb)
    def collectCells(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.select(col("vec_id"), col("cell")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val native = collectCells(Similarity.assignCells(prep, cs))
    // the declarative reference: k score columns, argmin via
    // array_position-over-min (the formulation assignCells used before
    // the native expression)
    val scores = array(cs.map { c =>
      lit(-2.0) * Similarity.dot(col("v"), array(c.map(lit): _*)) + lit(c.map(x => x * x).sum)
    }: _*)
    val declarative = collectCells(prep.withColumn("cs_", scores)
      .withColumn("cell", (expr("array_position(cs_, array_min(cs_))").cast("int") - 1)))
    assert(native == declarative)
    // interpreted eval path (the non-codegen fallback) agrees too
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val vecs = prep.select(col("vec_id"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val interpCells = vecs.map { case (id, v) =>
      id -> graft.functions.NearestCellF64(
        Literal.create(v, ArrayType(DoubleType)),
        cs.map(_.toIndexedSeq).toIndexedSeq).eval(null).asInstanceOf[Int]
    }
    assert(interpCells == native)
    // ties break to the FIRST minimal cell: duplicate centroids
    val dup = Array(cs(7), cs(7), cs(3))
    val tied = collectCells(Similarity.assignCells(prep, dup))
    assert(tied.values.forall(c => c == 0 || c == 2), s"tie must pick cell 0 over 1: $tied")
  }

  test("similarity topK ranks by cosine (orthogonal basis vectors)") {
    import spark.implicits._
    val e = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),
      (1L, Array(0.9f, 0.1f, 0f, 0f), 0),
      (2L, Array(0f, 1f, 0f, 0f), 1),
      (3L, Array(0f, 0f, 1f, 0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val top = Similarity.topK(e, maxQueryId = 1, k = 2).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("rn")))
    assert(top.toSeq == Seq((1L, 1), (2L, 2)))
  }

  test("commonness: hand-computed ppm means; rare-token doc scores below common-token doc") {
    // corpus tokens: "a" x4, "b" x2, "z" x1, "q" x1 → total 8
    // ppm: a = 4*1e6/8 = 500000, b = 250000, z = q = 125000
    val d = docs(1L -> "a a b", 2L -> "a a b z", 3L -> "q")
    val got = graft.ops.TextAnalysis.commonness(d, topK = 10).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("commonness_ppm")))).toMap
    assert(got(1L) == ((3L, (500000L + 500000L + 250000L) / 3)))
    assert(got(2L) == ((4L, (500000L + 500000L + 250000L + 125000L) / 4)))
    assert(got(3L) == ((1L, 125000L)))
    assert(got(3L)._2 < got(1L)._2, "rare-vocabulary doc must score lower")
    // topK cut: with only the single most frequent token in the
    // reference table, tokens outside it contribute 0
    val cut = graft.ops.TextAnalysis.commonness(d, topK = 1).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("commonness_ppm")).toMap
    assert(cut(3L) == 0L && cut(1L) == (500000L * 2) / 3)
    // production shape: the ref table stored and read back cold scores
    // identically to the inline build
    val refDir = java.nio.file.Files.createTempDirectory("commonref").toString
    graft.ops.TextAnalysis.commonnessRef(d, topK = 10)
      .write.mode("overwrite").parquet(refDir)
    val viaStored = graft.ops.TextAnalysis.commonness(d,
        ref = Some(spark.read.parquet(refDir))).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("commonness_ppm")).toMap
    assert(viaStored == got.map { case (k, v) => k -> v._2 })
  }

  test("commonness plan broadcasts the reference table (the corpus never shuffles on token)") {
    val d = graft.tables.Fixtures.documents(spark, "/root/testdata/sf0.001")
    val plan = graft.ops.TextAnalysis.commonness(d, topK = 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      s"K-row ref table must broadcast, not shuffle the corpus:\n${plan.take(2000)}")
  }

  test("searchBm25: hand-computed integer ranking; unmatched docs absent; rare term outranks common") {
    // N=4, tot=17, avgdl_x100 = 425; norm(dl=4) = 25 + 30000 div 425 = 95
    // denom(tf) = tf*100 + (120*95) div 100 = tf*100 + 114
    // idf_x1000: hash = 4000 div 2 = 2000; join = merge = 4000
    // saturation-first (overflow-safe) order: sat = tf*220000 div denom
    // doc1: hash tf2 → sat = 440000 div 314 = 1401, 2000*1401 div 1000 = 2802
    //       join tf1 → sat = 220000 div 214 = 1028, 4000*1028 div 1000 = 4112
    // doc2: merge tf1 → 4112; doc4: hash tf1 → 2000*1028 div 1000 = 2056
    val d = docs(
      1L -> "hash join hash scan",
      2L -> "merge sort loop x",
      3L -> "alpha beta gamma delta epsilon",
      4L -> "hash x y z")
    val got = TextAnalysis.searchBm25(d, Seq("hash", "join", "merge")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_terms_matched"),
        r.getAs[Long]("score_x1000")))
    assert(got.toSeq == Seq((1L, 2L, 2802L + 4112L), (2L, 1L, 4112L), (4L, 1L, 2056L)),
      s"got ${got.toSeq}")
    // the rare term (join, df=1) outranks the common one (hash, df=2)
    // at equal tf — the inverse-frequency weighting is live
    assert(got(1)._3 > got(2)._3)
    // topN clamps the result
    assert(TextAnalysis.searchBm25(d, Seq("hash", "join", "merge"), topN = 1)
      .collect().map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
    // production shape: stored stats + full-vocab df tables read back
    // cold score identically to the inline build
    val refDir = java.nio.file.Files.createTempDirectory("bm25ref").toString
    TextAnalysis.bm25StatsRef(d).write.mode("overwrite").parquet(s"$refDir/stats")
    TextAnalysis.bm25DfRef(d).write.mode("overwrite").parquet(s"$refDir/df")
    val viaStored = TextAnalysis.searchBm25(d, Seq("hash", "join", "merge"),
        dfRef = Some(spark.read.parquet(s"$refDir/df")),
        statsRef = Some(spark.read.parquet(s"$refDir/stats")))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_terms_matched"),
        r.getAs[Long]("score_x1000")))
    assert(viaStored.toSeq == got.toSeq)
    // empty corpus (or an empty/zero stats table): zero hits, not a
    // divide-by-zero out of the avgdl literal
    val none = d.filter(col("doc_id") < 0)
    assert(TextAnalysis.searchBm25(none, Seq("hash")).collect().isEmpty)
    assert(TextAnalysis.searchBm25(none, Seq("hash"),
      statsRef = Some(TextAnalysis.bm25StatsRef(none))).collect().isEmpty)
    assert(TextAnalysis.searchBm25(d, Seq("hash"),
      statsRef = Some(TextAnalysis.bm25StatsRef(d).limit(0))).collect().isEmpty)
  }

  test("applyNearDedupBy keeps each cluster's best-metric member; ties fall to min id; singletons survive") {
    import spark.implicits._
    val d = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val scored = Seq((1L, 10L), (2L, 50L), (3L, 7L), (4L, 7L), (5L, 3L))
      .toDF("doc_id", "metric")
    val got = graft.ops.Dedup.applyNearDedupBy(d, pairs, scored)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster"), r.getAs[Long]("cluster_size"), r.getAs[Long]("metric"))))
      .toMap
    assert(got == Map(
      2L -> ((1L, 2L, 50L)), // best metric wins over the min-id rule
      3L -> ((3L, 2L, 7L)),  // metric tie -> min doc_id
      5L -> ((5L, 1L, 3L))), // singleton survives as its own cluster
      s"got $got")
  }

  test("applyNearDedupBy partial metric coverage: unscored members rank last, " +
      "all-unscored clusters keep their min-id survivor (never vanish)") {
    import spark.implicits._
    val d = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    // cluster {1,2}: only 1 scored -> the scored member beats the unscored
    // cluster {3,4}: nobody scored  -> min-id 3 survives with null metric
    // singleton 5:   unscored       -> survives
    val scored = Seq((1L, 10L)).toDF("doc_id", "metric")
    val got = graft.ops.Dedup.applyNearDedupBy(d, pairs, scored)
      .collect().map { r =>
        val m = if (r.isNullAt(r.fieldIndex("metric"))) None
                else Some(r.getAs[Long]("metric"))
        r.getAs[Long]("doc_id") -> ((r.getAs[Long]("cluster_size"), m))
      }.toMap
    assert(got == Map(
      1L -> ((2L, Some(10L))),
      3L -> ((2L, None)),
      5L -> ((1L, None))), s"got $got")
  }

  test("searchBm25 survives planet-scale stats without Long overflow (forged N=10^12 refs)") {
    // The stored-ref seam lets the scorer run against corpus stats far
    // beyond what a fixture can materialize. N=10^12, df=1, tf=50 is
    // exactly the regime where the previous idf·tf·220-first order
    // wrapped past 2^63 (any tf >= 42 at that N/df) and, non-ANSI,
    // silently corrupted the ranking with a negative score. The
    // saturation-first order keeps the product at N·1000·sat ≤ 2.2e18.
    // Hand-computed: avgdl_x100 = 400; dl = 50; norm = 25 + 937 = 962;
    // denom = 5000 + (120*962) div 100 = 6154; sat = 11000000 div 6154
    // = 1787; score = 10^15 * 1787 div 1000 = 1787 * 10^12.
    import spark.implicits._
    val d = docs(1L -> Seq.fill(50)("hash").mkString(" "))
    val stats = Seq((1000000000000L, 4000000000000L)).toDF("n", "tot")
    val dfTab = Seq(("hash", 1L)).toDF("token", "df")
    val got = TextAnalysis.searchBm25(d, Seq("hash"),
        dfRef = Some(dfTab), statsRef = Some(stats)).collect()
    assert(got.length == 1)
    val score = got(0).getAs[Long]("score_x1000")
    assert(score == 1787L * 1000000000000L, s"got $score")
  }

  test("searchBm25 plan: the token stream is filtered to the query terms before the shuffle") {
    val d = graft.tables.Fixtures.documents(spark, "/root/testdata/sf0.001")
    val plan = TextAnalysis.searchBm25(d, Seq("hash", "join", "merge"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      s"the |terms|-row df table must broadcast:\n${plan.take(2000)}")
    // the generate stage emits only matching tokens: the filter is a
    // lambda INSIDE the projection, so no full-token-stream exchange
    // exists — weaker structural proof: exactly the agg shuffles appear
    assert(!plan.contains("CartesianProduct"))
  }

  test("lmScore: hand-computed conditional ppm; backoff fires only outside the bigram table") {
    // pairs: (a,b)x4, (b,a)x1, (b,c)x1, (c,a)x1; prev counts a=4 b=2 c=1
    // cond_ppm: (a,b)=1000000, (b,a)=(b,c)=500000, (c,a)=1000000
    // unigrams: a=4 b=4 c=2 z=1 of 11 → ppm 363636/363636/181818/90909
    val d = docs(1L -> "a b a b c", 2L -> "a b", 3L -> "z", 4L -> "c a b")
    def collect(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("lm_ppm")))).toMap
    val full = collect(TextAnalysis.lmScore(d, topK = 10, topUni = 10))
    assert(full(1L) == ((4L, (1000000L + 500000L + 1000000L + 500000L) / 4)))
    assert(full(2L) == ((1L, 1000000L)))
    assert(full(3L) == ((0L, 0L)), "pairless doc scores (0,0) via the corpus left join")
    assert(full(4L) == ((2L, 1000000L)))
    // topK=1 keeps only (a,b); the rest back off to uni_ppm div 10 of
    // the SECOND token: (b,a)→36363, (b,c)→18181, (c,a)→36363
    val cut = collect(TextAnalysis.lmScore(d, topK = 1, topUni = 10))
    assert(cut(1L) == ((4L, (1000000L + 36363L + 1000000L + 18181L) / 4)))
    assert(cut(4L) == ((2L, (36363L + 1000000L) / 2)))
    // topUni=1 keeps only 'a' (count tie with b, token asc): the
    // (b,c) backoff now misses both tables and scores 0
    val cutU = collect(TextAnalysis.lmScore(d, topK = 1, topUni = 1))
    assert(cutU(1L) == ((4L, (1000000L + 36363L + 1000000L + 0L) / 4)))
    // a scrambled doc keeps its unigram commonness but loses its
    // bigram score — the signal unigram commonness cannot see. Model
    // trained on a coherent corpus ("a b" sequences only); the two
    // scored docs are unigram-identical anagram twins.
    val corpus = docs(1L -> "a b a b a b a b")
    val lm = collect(TextAnalysis.lmScore(
      docs(10L -> "a b a b", 11L -> "a a b b"),
      ref = Some(TextAnalysis.lmRef(corpus, topK = 10)),
      uniRef = Some(TextAnalysis.commonnessRef(corpus, topK = 10))))
    assert(lm(11L)._2 < lm(10L)._2, "scrambled sequence must score below coherent one")
    // production shape: stored model tables score identically cold
    val refDir = java.nio.file.Files.createTempDirectory("lmref").toString
    TextAnalysis.lmRef(d, topK = 10).write.mode("overwrite").parquet(s"$refDir/bi")
    TextAnalysis.commonnessRef(d, topK = 10).write.mode("overwrite").parquet(s"$refDir/uni")
    val viaStored = collect(TextAnalysis.lmScore(d,
      ref = Some(spark.read.parquet(s"$refDir/bi")),
      uniRef = Some(spark.read.parquet(s"$refDir/uni"))))
    assert(viaStored == full)
  }

  test("lmPpm per-row form matches lmScore bit-for-bit against stored model tables") {
    val d = docs(1L -> "a b a b c", 2L -> "a b", 3L -> "z", 4L -> "c a b")
    val ref = TextAnalysis.lmRef(d, topK = 10)
    val uni = TextAnalysis.commonnessRef(d, topK = 10)
    def scores(base: org.apache.spark.sql.DataFrame) = {
      val batch = TextAnalysis.lmScore(base, ref = Some(ref), uniRef = Some(uni))
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("lm_ppm")).toMap
      val (bi, un) = TextAnalysis.lmModelLiterals(ref, uni)
      val perRow = base.select(col("doc_id"),
          TextAnalysis.lmPpm(col("text"), bi, un).as("lm_ppm"))
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("lm_ppm")).toMap
      (batch, perRow)
    }
    val (batch, perRow) = scores(d)
    assert(perRow == batch, "per-row gate form must be bit-identical to the batch plan")
    assert(batch(3L) == 0L, "single-token doc scores 0 in both forms")
    // the whole sf0.001 fixture through both forms, model trained there
    val fx = graft.tables.Fixtures.documents(spark, "/root/testdata/sf0.001")
    val fxRef = TextAnalysis.lmRef(fx, topK = 200)
    val fxUni = TextAnalysis.commonnessRef(fx, topK = 100)
    val fb = TextAnalysis.lmScore(fx, ref = Some(fxRef), uniRef = Some(fxUni))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("lm_ppm")).toMap
    val (fbi, fun) = TextAnalysis.lmModelLiterals(fxRef, fxUni)
    val fr = fx.select(col("doc_id"), TextAnalysis.lmPpm(col("text"), fbi, fun).as("lm_ppm"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("lm_ppm")).toMap
    assert(fr == fb)
    // null text scores 0 (the batch corpus left join, mirrored per-row)
    import spark.implicits._
    val z = Seq((9L, null: String)).toDF("doc_id", "text")
      .select(TextAnalysis.lmPpm(col("text"), Map("1:ab" -> 1L),
        Map("b" -> 1L)).as("s")).head.getAs[Long]("s")
    assert(z == 0L)
    // adversarial tokens: a separator-bearing token must NOT forge
    // another pair's key — the length prefix decodes the split point,
    // so per-row stays bit-identical to the batch (prev, token) join
    // trained values DIFFER across the would-collide pairs: under a
    // plain separator key both rows would share one map slot and one
    // of the two docs would probe the other's cond_ppm
    val evil = docs(
      20L -> "a b\u0001c a d",        // (a, "b\u0001c") cond = 500000
      21L -> "a\u0001b c x y z w q") // ("a\u0001b", c) cond = 1000000
    val eRef = TextAnalysis.lmRef(evil, topK = 10)
    val eUni = TextAnalysis.commonnessRef(evil, topK = 10)
    val eBatch = TextAnalysis.lmScore(evil, ref = Some(eRef), uniRef = Some(eUni))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("lm_ppm")).toMap
    val (eBi, eUn) = TextAnalysis.lmModelLiterals(eRef, eUni)
    val ePerRow = evil.select(col("doc_id"),
        TextAnalysis.lmPpm(col("text"), eBi, eUn).as("lm_ppm"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("lm_ppm")).toMap
    assert(ePerRow == eBatch,
      s"separator-forged key must not collide: perRow=$ePerRow batch=$eBatch")
  }

  test("lmScore plan broadcasts both model tables (the corpus never shuffles on pair keys)") {
    val d = graft.tables.Fixtures.documents(spark, "/root/testdata/sf0.001")
    val plan = TextAnalysis.lmScore(d, topK = 100, topUni = 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      s"K-row model tables must broadcast:\n${plan.take(2000)}")
  }

  test("snapshotDiff: added/removed/changed statuses; metadata-only rewrite is silent") {
    import spark.implicits._
    val old = Seq((1L, "alpha", "en"), (2L, "beta", "en"), (3L, "gamma", "en"))
      .toDF("doc_id", "text", "lang")
    val neu = Seq((1L, "alpha", "de"), (2L, "beta CHANGED", "en"), (4L, "delta", "en"))
      .toDF("doc_id", "text", "lang")
    val got = graft.ops.Curation.snapshotDiff(old, neu).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    // doc 1: text identical, only lang changed → NOT reported
    assert(got == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("language id picks the language with most marker hits") {
    val d = docs(
      1L -> "the cat of a house is big",
      2L -> "el gato de la casa que y",
      3L -> "le chat de les maisons et un")
    val out = TextAnalysis.langId(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted_lang")).toMap
    assert(out == Map(1L -> "en", 2L -> "es", 3L -> "fr"))
  }

  test("native byte_stats expression: hand-computed case + reference fold over varied payloads") {
    import spark.implicits._
    val rows = Seq(1L -> "ab", 2L -> "aaaa", 3L -> "the quick brown fox", 4L -> "Ünïcødé!")
    val d = rows.toDF("doc_id", "text")
      .select(col("doc_id"), lit("image").as("media_type"),
        col("text").cast("binary").as("payload"))
    val got = graft.ops.Multimodal.byteStats(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("payload_len"), r.getAs[Int]("n_distinct_bytes"),
          r.getAs[Long]("mean_byte_x100")))).toMap
    // reference: plain Scala fold over the UTF-8 bytes
    rows.foreach { case (id, s) =>
      val bytes = s.getBytes("UTF-8")
      val expected = (bytes.length.toLong,
        bytes.map(_ & 0xff).distinct.length,
        bytes.map(b => (b & 0xff).toLong).sum * 100 / bytes.length)
      assert(got(id) == expected, s"doc $id")
    }
    // the hand case: "ab" = bytes 97,98 → len 2, distinct 2, mean 9750
    assert(got(1L) == ((2L, 2, 9750L)))
    // registered SQL form resolves through the session extensions
    val viaSql = spark.sql(
      "SELECT byte_stats(cast('ab' as binary)).n_distinct_bytes AS n").head.getInt(0)
    assert(viaSql == 2)
    // empty payload: every stat defined (no division blow-up) — len 0,
    // 0 distinct bytes, null mean
    val empty = graft.ops.Multimodal.byteStats(
      Seq((9L, "image", Array.empty[Byte])).toDF("doc_id", "media_type", "payload"))
      .collect().head
    assert(empty.getAs[Long]("payload_len") == 0L)
    assert(empty.getAs[Int]("n_distinct_bytes") == 0)
    assert(empty.isNullAt(empty.fieldIndex("mean_byte_x100")))
    // wrong arity fails with the signature, not NoSuchElementException
    Seq("SELECT byte_stats()", "SELECT simhash64()",
        "SELECT byte_stats(cast('a' as binary), cast('b' as binary))").foreach { q =>
      val e = intercept[Exception](spark.sql(q).collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("expects exactly 1 argument")),
        s"$q: ${msgs(e)}")
    }
  }

  test("quality basis points are exact integers") {
    val d = docs(1L -> "a a b c") // 4 tokens, 3 distinct, 1 stopword 'a' twice
    val r = TextAnalysis.quality(d).collect().head
    assert(r.getAs[Long]("ttr_bp") == 7500L)
    assert(r.getAs[Long]("stopword_bp") == 5000L)
    // 7 chars, 4 tokens: (7-3)*100 div 4 = 100
    assert(r.getAs[Long]("avg_token_len_x100") == 100L)
    // (4*7500 + 3*5000 + 3*least(10000, 400)) div 10 = (30000+15000+1200)/10
    assert(r.getAs[Long]("quality_score_bp") == 4620L)
  }

  test("multimodal decode: dims/frames PARSED from real headers, magic-sniffed, md5 over all bytes") {
    // doc 3 → image (PPM), doc 4 → audio (no header), doc 5 → video (Y4M)
    val d = docs(3L -> "hello world", 4L -> "audio body", 5L -> "vid body")
    val out = Multimodal.decodeFeatures(spark, Multimodal.withPayload(d)).collect()
      .map(f => f.doc_id -> f).toMap
    // image: "hello world" = 11 chars → planted w=75 h=141 inside a
    // genuine Netpbm P6 header; the decoder must read them back out
    val ppm = "P6\n75 141\n255\nhello world"
    assert(out(3L).media_type == "image")
    assert(out(3L).n_bytes == ppm.length.toLong)
    assert(out(3L).checksum == graft.evm.EvmDerive.md5hex(ppm))
    assert(out(3L).width == 75L && out(3L).height == 141L && out(3L).frames == 1L)
    // audio: NIST SPHERE container — "audio body" = 10 bytes → planted
    // rate 8010, mono; visual dims are honestly absent (0×0×1)
    val sphereBody =
      "sample_count -i 10\nsample_rate -i 8010\nchannel_count -i 1\nend_head\n"
    val sphere = "NIST_1A\n" + f"${sphereBody.length + 17}%8d" + "\n" +
      sphereBody + "audio body"
    assert(out(4L).media_type == "audio")
    assert(out(4L).n_bytes == sphere.length.toLong)
    assert(out(4L).checksum == graft.evm.EvmDerive.md5hex(sphere))
    assert(out(4L).width == 0L && out(4L).height == 0L && out(4L).frames == 1L)
    // video: "vid body" = 8 chars → w=72 h=120 f=9 in a Y4M header
    val y4m = "YUV4MPEG2 W72 H120 F25:1 XNFRAMES=9\nvid body"
    assert(out(5L).media_type == "video")
    assert(out(5L).n_bytes == y4m.length.toLong)
    assert(out(5L).checksum == graft.evm.EvmDerive.md5hex(y4m))
    assert(out(5L).width == 72L && out(5L).height == 120L && out(5L).frames == 9L)
  }

  test("multimodal parseHeader: format from bytes not column; malformed headers degrade to unknown") {
    def p(s: String) = Multimodal.parseHeader(s.getBytes("UTF-8"))
    assert(p("P6\n640 480\n255\ndata") == ((640L, 480L, 1L)))
    assert(p("YUV4MPEG2 W1920 H1080 F30:1 XNFRAMES=300\nFRAME") == ((1920L, 1080L, 300L)))
    // Y4M without the vendor frame count: dims parse, frames default 1
    assert(p("YUV4MPEG2 W64 H64 F25:1\n") == ((64L, 64L, 1L)))
    assert(p("") == ((0L, 0L, 1L)))
    assert(p("plain text that is no media at all") == ((0L, 0L, 1L)))
    assert(p("P6 but not a real header") == ((0L, 0L, 1L)))
    assert(p("YUV4MPEG2 WxH garbage\n") == ((0L, 0L, 1L)))
    // a SPHERE container is recognized but has no visual dims
    assert(p("NIST_1A\n      84\nsample_rate -i 8000\nend_head\n") == ((0L, 0L, 1L)))
    // overlong numerals (> Long range) degrade to unknown, never throw
    assert(p("P6\n99999999999999999999 5\n255\nx") == ((0L, 0L, 1L)))
    assert(p("YUV4MPEG2 W99999999999999999999 H5 F25:1\n") == ((0L, 5L, 1L)))
    // a zero frame count clamps to 1 so the frame sampler's
    // sequence(0, frames-1) can never see a negative bound
    assert(p("YUV4MPEG2 W64 H64 F25:1 XNFRAMES=0\n") == ((64L, 64L, 1L)))
    // header split across the 96-byte sniff window still parses: the
    // PPM header itself is tiny, the body can be anything
    assert(p("P6\n9 9\n255\n" + "x" * 500) == ((9L, 9L, 1L)))
  }

  test("decodePixels: channel sums from the BODY bytes; truncated pixel ignored; empty body null; magic-gated") {
    import spark.implicits._
    // 3 complete RGB triplets + 2 stray bytes that must not count
    val px = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 1, 2)
    val img = "P6\n2 2\n255\n".getBytes("UTF-8") ++ px
    val empty = "P6\n5 5\n255\n".getBytes("UTF-8") // header only, no body
    val notPpm = "NIST_1A\nnot pixels".getBytes("UTF-8")
    val d = Seq((1L, "image", img), (2L, "image", empty), (3L, "audio", notPpm))
      .toDF("doc_id", "media_type", "payload")
    val out = Multimodal.decodePixels(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(1L, 2L), "non-PPM rows are magic-gated out")
    val r1 = out(1L)
    assert(r1.getAs[Long]("width") == 2L && r1.getAs[Long]("height") == 2L)
    assert(r1.getAs[Long]("n_pixels") == 3L, "floor(11/3) complete pixels")
    assert(r1.getAs[Long]("mean_r_x100") == 4000L) // (10+40+70)*100 div 3
    assert(r1.getAs[Long]("mean_g_x100") == 5000L)
    assert(r1.getAs[Long]("mean_b_x100") == 6000L)
    assert(r1.getAs[Long]("brightness_x100") == 5000L) // 450*100 div 9
    val r2 = out(2L)
    assert(r2.getAs[Long]("n_pixels") == 0L)
    assert(r2.isNullAt(r2.fieldIndex("mean_r_x100")) &&
      r2.isNullAt(r2.fieldIndex("brightness_x100")),
      "zero-pixel body yields explicit null means")
    // high-bit bytes must read unsigned (a signed-byte bug would go
    // negative): one pixel of 0xFF 0x80 0x00
    val hi = "P6\n1 1\n255\n".getBytes("UTF-8") ++ Array[Byte](-1, -128, 0)
    val rh = Multimodal.decodePixels(
      Seq((9L, "image", hi)).toDF("doc_id", "media_type", "payload")).collect()(0)
    assert(rh.getAs[Long]("mean_r_x100") == 25500L)
    assert(rh.getAs[Long]("mean_g_x100") == 12800L)
    assert(rh.getAs[Long]("mean_b_x100") == 0L)
  }

  test("audioPcm: per-channel sums from BODY bytes; truncated frame ignored; lying header gated; unsigned read") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // hand-built stereo SPHERE: 3 complete frames + 1 stray byte that
    // must not count (floor(7/2) frames); c0 = 10,30,50 c1 = 20,40,60
    def sphere(fields: String, body: Array[Byte]): Array[Byte] = {
      val f = fields + "end_head\n"
      ("NIST_1A\n" + "%8d".format(f.length + 17) + "\n" + f).getBytes("UTF-8") ++ body
    }
    val stereo = sphere("sample_rate -i 16000\nchannel_count -i 2\n",
      Array[Byte](10, 20, 30, 40, 50, 60, 99))
    // mono with high-bit samples: unsigned read or the sum goes negative
    val mono = sphere("sample_rate -i 8000\nchannel_count -i 1\n",
      Array[Byte](-1, -128, 0))
    // size-lying header (declared size > payload) must be gated out,
    // not slice a negative body; non-SPHERE bytes are magic-gated
    val lying = {
      val p = sphere("sample_rate -i 8000\nchannel_count -i 1\n", Array[Byte](1))
      val decl = "%8d".format(9999)
      p.take(8) ++ decl.getBytes("UTF-8") ++ p.drop(16)
    }
    val notAudio = "P6\n1 1\n255\nabc".getBytes("UTF-8")
    val out = Multimodal.audioPcm(
        Seq((1L, "audio", stereo), (2L, "audio", mono),
          (3L, "audio", lying), (4L, "image", notAudio))
          .toDF("doc_id", "media_type", "payload"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.keySet == Set(1L, 2L),
      "magic-gating and header-consistency must drop rows 3 and 4")
    val r1 = out(1L)
    assert(r1.getAs[Long]("channel_count") == 2L && r1.getAs[Long]("n_frames") == 3L)
    assert(r1.getAs[Long]("mean_c0_x100") == 3000L) // (10+30+50)*100 div 3
    assert(r1.getAs[Long]("mean_c1_x100") == 4000L)
    assert(r1.getAs[Long]("mean_all_x100") == 3500L)
    val r2 = out(2L)
    assert(r2.getAs[Long]("n_frames") == 3L)
    assert(r2.getAs[Long]("mean_c0_x100") == 12766L) // (255+128+0)*100 div 3
    assert(r2.isNullAt(r2.fieldIndex("mean_c1_x100")), "mono has no channel 1")
    // the planted-payload round trip: the decoded stats equal the
    // closed-form formulas the oracle states, per doc — n_frames comes
    // from the BYTES (len/ch), not the sample_count field
    val docs = graft.tables.Fixtures.documents(spark, "/root/testdata/sf0.001").limit(12)
    val decoded = Multimodal.audioPcm(Multimodal.audioPcmPayload(spark, docs))
      .orderBy(col("doc_id")).collect()
    assert(decoded.length == 12)
    decoded.foreach { r =>
      val did = r.getAs[Long]("doc_id")
      val frames = Multimodal.pcmFrames(did)
      val ch = Multimodal.pcmChannelCount(did)
      val s = Array(0L, 0L)
      (0 until frames * ch).foreach(j => s(j % ch) += Multimodal.pcmByte(did, j))
      assert(r.getAs[Long]("n_frames") == frames.toLong, s"doc $did frames")
      assert(r.getAs[Long]("sample_rate") == Multimodal.pcmRate(did).toLong)
      assert(r.getAs[Long]("mean_c0_x100") == s(0) * 100 / frames, s"doc $did c0")
      if (ch == 2) assert(r.getAs[Long]("mean_c1_x100") == s(1) * 100 / frames)
      else assert(r.isNullAt(r.fieldIndex("mean_c1_x100")))
    }
  }

  test("audioPcm 16-bit: sign extension, both byte orders, format gates, mixed-width scan") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def sphere(fields: String, body: Array[Byte]): Array[Byte] = {
      val f = fields + "end_head\n"
      ("NIST_1A\n" + "%8d".format(f.length + 17) + "\n" + f).getBytes("UTF-8") ++ body
    }
    def le(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def be(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    // s16le stereo, 2 complete frames + 1 stray byte (ignored):
    // c0 = 100, 300; c1 = -200, -400 — negative sums exercise sign
    // extension AND the truncating mean on a negative dividend
    val sLe = sphere(
      "sample_rate -i 16000\nchannel_count -i 2\nsample_n_bytes -i 2\nsample_byte_format -s2 01\n",
      le(100) ++ le(-200) ++ le(300) ++ le(-400) ++ Array[Byte](7))
    // s16be mono across the full range: -32768 + 32767 + 1 = 0
    val sBe = sphere(
      "sample_rate -i 8000\nchannel_count -i 1\nsample_n_bytes -i 2\nsample_byte_format -s2 10\n",
      be(-32768) ++ be(32767) ++ be(1))
    // 2-byte row with NO declared byte order: must not guess an order
    val sNo = sphere(
      "sample_rate -i 8000\nchannel_count -i 1\nsample_n_bytes -i 2\n",
      le(5) ++ le(6))
    // 3-channel 8-bit: c0/c1 means stay exact, the overall mean (which
    // PcmStats cannot compute past 2 channels) must be null
    val s3 = sphere("sample_rate -i 8000\nchannel_count -i 3\n",
      Array[Byte](10, 20, 30, 40, 50, 60))
    val out = Multimodal.audioPcm(
        Seq((1L, "audio", sLe), (2L, "audio", sBe), (3L, "audio", sNo),
          (4L, "audio", s3)).toDF("doc_id", "media_type", "payload"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("sample_n_bytes") == 2L && r1.getAs[Long]("n_frames") == 2L)
    assert(r1.getAs[Long]("mean_c0_x100") == 20000L) // 400*100 div 2
    assert(r1.getAs[Long]("mean_c1_x100") == -30000L) // -600*100 div 2
    assert(r1.getAs[Long]("mean_all_x100") == -5000L) // -200*100 div 4
    val r2 = out(2L)
    assert(r2.getAs[Long]("n_frames") == 3L && r2.getAs[Long]("mean_c0_x100") == 0L)
    val r3 = out(3L)
    assert(r3.getAs[Long]("n_frames") == 0L &&
      r3.isNullAt(r3.fieldIndex("mean_c0_x100")),
      "an undeclared 16-bit byte order must degrade, never be guessed")
    val r4 = out(4L)
    assert(r4.getAs[Long]("n_frames") == 2L)
    assert(r4.getAs[Long]("mean_c0_x100") == 2500L) // (10+40)*100 div 2
    assert(r4.getAs[Long]("mean_c1_x100") == 3500L)
    assert(r4.isNullAt(r4.fieldIndex("mean_all_x100")),
      ">2-channel overall mean must be null, not silently understated")
    // mixed-width corpus: 8-bit and 16-bit containers decoded in ONE
    // scan, each per its own header — a real fleet is never homogeneous
    val docs8 = graft.tables.Fixtures.documents(spark, "/root/testdata/sf0.001").limit(6)
    val mixed = Multimodal.audioPcmPayload(spark, docs8)
      .unionByName(Multimodal.audioPcm16Payload(spark,
        docs8.select((col("doc_id") + 1000000L).as("doc_id"))))
    val decoded = Multimodal.audioPcm(mixed).orderBy(col("doc_id")).collect()
    assert(decoded.length == 12)
    decoded.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      if (id < 1000000L) {
        val frames = Multimodal.pcmFrames(id)
        val ch = Multimodal.pcmChannelCount(id)
        val s = Array(0L, 0L)
        (0 until frames * ch).foreach(j => s(j % ch) += Multimodal.pcmByte(id, j))
        assert(r.getAs[Long]("sample_n_bytes") == 1L)
        assert(r.getAs[Long]("n_frames") == frames.toLong, s"doc $id frames")
        assert(r.getAs[Long]("mean_c0_x100") == s(0) * 100 / frames, s"doc $id c0")
      } else {
        val frames = Multimodal.pcm16Frames(id)
        val ch = Multimodal.pcm16ChannelCount(id)
        val s = Array(0L, 0L)
        (0 until frames * ch).foreach(j => s(j % ch) += Multimodal.pcm16Sample(id, j))
        assert(r.getAs[Long]("sample_n_bytes") == 2L)
        assert(r.getAs[Long]("n_frames") == frames.toLong, s"doc $id frames16")
        assert(r.getAs[Long]("mean_c0_x100") == s(0) * 100 / frames, s"doc $id c0/16")
        if (ch == 2) assert(r.getAs[Long]("mean_c1_x100") == s(1) * 100 / frames)
      }
    }
  }

  test("NearestCellsF64: (score, cell)-ascending top-n == brute force, incl. exact ties") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // cells 1 and 3 are identical — an exact score tie on every query;
    // the (s, cell) order must keep the LOWER cell and exclude the
    // higher one when only one tie partner fits the top-n
    val cs = Array(Array(1.0, 0.0), Array(0.5, 0.5), Array(0.0, 1.0),
      Array(0.5, 0.5), Array(-1.0, 0.0))
    val vs = Seq(Array(1.0, 0.0), Array(0.0, 1.0), Array(0.4, 0.6),
      Array(-0.3, -0.7), Array(0.5, 0.5))
    val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("id", "v")
      .select(col("id"), col("v").cast("array<double>").as("v"))
    (1 to 4).foreach { np =>
      val out = df.select(col("id"),
          graft.functions.NearestCell.top(col("v"), cs, np).as("cells"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      vs.zipWithIndex.foreach { case (v, i) =>
        val brute = cs.zipWithIndex.map { case (c, ci) =>
          val d = c.zip(v).map { case (a, b) => a * b }.sum
          (-2.0 * d + c.map(x => x * x).sum, ci)
        }.sortBy(identity).take(np).map(_._2).toSeq
        assert(out(i.toLong) == brute, s"row $i nProbe $np")
      }
    }
  }

  test("videoPixels: FRAME-marked 4:2:0 planes decoded from BODY bytes; truncation/framing/geometry gates") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val M = "FRAME\n".getBytes("UTF-8")
    def hdr(w: Int, h: Int) = s"YUV4MPEG2 W$w H$h F25:1 C420\n".getBytes("UTF-8")
    // 2×2: 4 luma + 1 U + 1 V per frame
    def frame(y: Seq[Int], u: Int, v: Int) =
      M ++ (y.map(_.toByte) :+ u.toByte :+ v.toByte).toArray
    val good = hdr(2, 2) ++ frame(Seq(10, 20, 30, 40), 50, 60) ++
      frame(Seq(1, 2, 3, 4), 5, 6) ++ Array[Byte](9, 9, 9, 9, 9) // stray: no 3rd frame
    val badMarker = hdr(2, 2) ++ frame(Seq(10, 20, 30, 40), 50, 60) ++
      ("FRUME\n".getBytes("UTF-8") ++ Array[Byte](1, 2, 3, 4, 5, 6))
    val oddDims = hdr(3, 2) ++ frame(Seq(10, 20, 30, 40), 50, 60)
    val notVideo = "P6\n1 1\n255\nabc".getBytes("UTF-8")
    val out = Multimodal.videoPixels(
        Seq((1L, "video", good), (2L, "video", badMarker),
          (3L, "video", oddDims), (4L, "image", notVideo))
          .toDF("doc_id", "media_type", "payload"))
      .orderBy(col("doc_id"), col("frame_idx")).collect()
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    assert(!byDoc.contains(3L) && !byDoc.contains(4L),
      "odd 4:2:0 dims and non-Y4M magic must emit no rows")
    val g = byDoc(1L)
    assert(g.length == 2 && g.forall(_.getAs[Long]("n_frames") == 2L),
      "the stray trailing bytes must not count as a frame")
    assert(g(0).getAs[Long]("mean_y_x100") == 2500L &&
      g(0).getAs[Long]("mean_u_x100") == 5000L &&
      g(0).getAs[Long]("mean_v_x100") == 6000L)
    assert(g(1).getAs[Long]("mean_y_x100") == 250L)
    val b = byDoc(2L)
    assert(b.length == 1 && b(0).getAs[Long]("n_frames") == 1L,
      "a framing error must stop the walk, not guess past it")
    // planted round-trip: decoded per-frame means equal the closed-form
    // formulas the oracle states, per doc and frame
    val docs = graft.tables.Fixtures.documents(spark, "/root/testdata/sf0.001").limit(9)
    val decoded = Multimodal.videoPixels(Multimodal.videoPayload(spark, docs))
      .orderBy(col("doc_id"), col("frame_idx")).collect()
    decoded.foreach { r =>
      val did = r.getAs[Long]("doc_id")
      val (w, h) = Multimodal.y4mDims(did)
      val f = r.getAs[Int]("frame_idx")
      val luma = w * h
      val chroma = (w / 2) * (h / 2)
      val sy = (0 until luma).map(i => Multimodal.y4mY(did, f, i).toLong).sum
      val su = (0 until chroma).map(j => Multimodal.y4mU(did, f, j).toLong).sum
      val sv = (0 until chroma).map(j => Multimodal.y4mV(did, f, j).toLong).sum
      assert(r.getAs[Long]("n_frames") == Multimodal.y4mFrameCount(did).toLong)
      assert(r.getAs[Long]("mean_y_x100") == sy * 100 / luma, s"doc $did f $f y")
      assert(r.getAs[Long]("mean_u_x100") == su * 100 / chroma, s"doc $did f $f u")
      assert(r.getAs[Long]("mean_v_x100") == sv * 100 / chroma, s"doc $did f $f v")
    }
    assert(decoded.nonEmpty)
  }

  test("audioMeta and audioPcm share ONE SPHERE header parse (parity pin)") {
    import org.apache.spark.sql.functions.col
    // both consumers now route through the same sphereParsed primitive;
    // this pins that the header fields they report can never drift —
    // a header-format fix lands in both or the sets diverge here
    val docs = graft.tables.Fixtures.documents(spark, "/root/testdata/sf0.001").limit(8)
    val mixed = Multimodal.audioPcmPayload(spark, docs)
      .unionByName(Multimodal.audioPcm16Payload(spark,
        docs.select((col("doc_id") + 1000000L).as("doc_id"))))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("sample_rate"), col("channel_count"))
        .collect().map(_.toString).toSet
    assert(key(Multimodal.audioMeta(mixed)) == key(Multimodal.audioPcm(mixed)),
      "the two SPHERE consumers must parse identical header fields")
  }

  test("multimodal declarative decode == typed decode (the expression form is the registry path)") {
    import org.apache.spark.sql.functions.col
    // mixed formats + a null text: every branch of the parse
    import spark.implicits._
    val d = Seq((3L, Option("img body")), (4L, Option("audio body")),
      (5L, Option("video body")), (6L, None), (7L, None), (8L, None))
      .toDF("doc_id", "text")
    val media = Multimodal.withPayload(d)
    val typed = Multimodal.decodeFeatures(spark, media).toDF()
      .orderBy(col("doc_id")).collect().map(_.toString).toSeq
    val exprs = Multimodal.decodeFeaturesExpr(media)
      .orderBy(col("doc_id")).collect().map(_.toString).toSeq
    assert(exprs == typed,
      "decodeFeaturesExpr must reproduce the typed decode row for row")
  }

  test("multimodal parsers: boundary-cut and adversarial headers degrade to unknown in BOTH forms") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // a Y4M parameter line whose newline falls OUTSIDE the 96-byte
    // sniff window, cut exactly mid-parameter: XNFRAMES=300 truncates
    // to XNFRAMES=3 at byte 96 — a parser trusting the cut window
    // would silently parse frames=3; the newline guard must degrade
    // the whole parse to unknown instead
    val cut = "YUV4MPEG2 W64 H64 F25:1 " + " " * 62 + "XNFRAMES=300\nFRAME..."
    assert(cut.indexOf("XNFRAMES=300") == 86, "fixture must straddle byte 96")
    assert(Multimodal.parseHeader(cut.getBytes("UTF-8")) == ((0L, 0L, 1L)))
    // same line with the newline in-window parses normally
    val ok = "YUV4MPEG2 W64 H64 F25:1 XNFRAMES=300\nFRAME..."
    assert(Multimodal.parseHeader(ok.getBytes("UTF-8")) == ((64L, 64L, 300L)))

    // the EXPRESSION form must agree on every adversarial shape,
    // under the session's (ANSI) cast semantics — nothing may throw
    val adversarial = Seq(
      1L -> cut,
      2L -> ok,
      3L -> "P6\n640 480\n255\ndata",
      4L -> ("P6\n99999999999999999999 5\n255\nx"),      // overlong digits
      5L -> "YUV4MPEG2 W99999999999999999999 H5 F25:1\n", // overlong digits
      6L -> "YUV4MPEG2 W64 H64 F25:1 XNFRAMES=0\n",       // zero clamps
      7L -> "P6 but not a real header",
      8L -> "",
      9L -> "YUV4MPEG2 WxH garbage\n",
      10L -> "YUV4MPEG2 W64\tH64 F25:1\n", // tab-glued token: one NON-numeric param
      11L -> "P6\n640 480\n1234567890\ndata", // 10-digit maxval: accepted by both (matched, never cast)
      12L -> "YUV4MPEG2 W1234567890 H5 F25:1\n") // 10-digit W degrades in both
    val media = adversarial.toDF("doc_id", "s")
      .select(col("doc_id"), org.apache.spark.sql.functions.lit("x").as("media_type"),
        col("s").cast("binary").as("payload"))
    val got = Multimodal.decodeFeaturesExpr(media).orderBy(col("doc_id"))
      .select("width", "height", "frames").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = adversarial.map { case (_, s) => Multimodal.parseHeader(s.getBytes("UTF-8")) }
    assert(got == want, "expression parse must equal the imperative parse on adversarial bytes")
  }

  test("multimodal audioMeta: size-lying / corrupt / truncated SPHERE headers degrade, never throw") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val body = "sample_count -i 10\nsample_rate -i 8010\nchannel_count -i 1\nend_head\n"
    def sphere(size: String) = "NIST_1A\n" + size + "\n" + body + "audio body"
    val adversarial = Seq(
      1L -> sphere(f"${body.length + 17}%8d"),  // honest header (control)
      2L -> sphere("99999999"),                 // size-lying: declared >> payload
      3L -> sphere("  12ab56"),                 // corrupt size field
      4L -> ("NIST_1A\n" + "      84"),          // truncated before the size newline
      5L -> "NIST_1A\nxxxxxxxx\n")              // no parseable fields at all
    val media = adversarial.toDF("doc_id", "s")
      .select(col("doc_id"), org.apache.spark.sql.functions.lit("audio").as("media_type"),
        col("s").cast("binary").as("payload"))
    val rows = Multimodal.audioMeta(media).orderBy(col("doc_id")).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 3L, 4L, 5L),
      "every magic-bearing row must survive the parse (degrade, not drop/throw)")
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Long]("data_bytes") == 10L)
    // size-lying: header_bytes parses but data_bytes must be null, never negative
    assert(byId(2L).getAs[Long]("header_bytes") == 99999999L)
    assert(byId(2L).isNullAt(byId(2L).fieldIndex("data_bytes")))
    // corrupt size: header_bytes AND data_bytes null, fields still parse
    assert(byId(3L).isNullAt(byId(3L).fieldIndex("header_bytes")))
    assert(byId(3L).isNullAt(byId(3L).fieldIndex("data_bytes")))
    assert(byId(3L).getAs[Long]("sample_rate") == 8010L)
    // truncation: whatever the window holds parses, the rest is null
    assert(byId(4L).isNullAt(byId(4L).fieldIndex("sample_rate")))
    assert(byId(5L).isNullAt(byId(5L).fieldIndex("header_bytes")))
  }

  test("multimodal audioMeta: SPHERE fields parsed from bytes; magic routes, media_type doesn't") {
    import org.apache.spark.sql.functions.col
    val d = docs(3L -> "img text", 4L -> "audio body", 5L -> "vid")
    val out = Multimodal.audioMeta(Multimodal.withPayload(d)).collect()
    // only the SPHERE-magic row (doc 4) may appear — the PPM and Y4M
    // rows carry different magics even though all three have payloads
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(4L))
    val r = out.head
    // "audio body" = 10 bytes → header body 67 chars, declared 84
    assert(r.getAs[Long]("header_bytes") == 84L)
    assert(r.getAs[Long]("sample_rate") == 8010L)
    assert(r.getAs[Long]("channel_count") == 1L)
    assert(r.getAs[Long]("sample_count") == 10L)
    assert(r.getAs[Long]("data_bytes") == 10L)
    // the parse survives a doctored media_type: routing is by magic
    val doctored = Multimodal.withPayload(d)
      .withColumn("media_type", org.apache.spark.sql.functions.lit("image"))
    assert(Multimodal.audioMeta(doctored).select(col("doc_id")).collect()
      .map(_.getLong(0)).toSeq == Seq(4L))
  }

  test("multimodal: null text coalesces to an empty body — decode and audioMeta never see a null payload") {
    import spark.implicits._
    // doc 6 (image), 7 (audio), 8 (video) — all with NULL text
    val d = Seq((6L, Option.empty[String]), (7L, Option.empty[String]),
      (8L, Option.empty[String])).toDF("doc_id", "text")
    val media = Multimodal.withPayload(d)
    assert(media.filter(col("payload").isNull).count() == 0L,
      "payload must never be null (the coalesce rule)")
    // decode runs (no NPE) and parses the headers built over the '' body
    val feats = Multimodal.decodeFeatures(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats(6L).width == 64L && feats(6L).height == 64L)  // len 0 plants 64x64
    assert(feats(7L).width == 0L && feats(7L).frames == 1L)
    assert(feats(8L).frames == 1L)                              // 1 + 0 % 30
    // the audio row keeps its SPHERE header: zero samples, zero body
    val am = Multimodal.audioMeta(media).collect()
    assert(am.map(_.getAs[Long]("doc_id")).toSeq == Seq(7L))
    assert(am.head.getAs[Long]("sample_count") == 0L)
    assert(am.head.getAs[Long]("data_bytes") == 0L)
  }

  test("applyNearDedup: chains collapse to min-id representative, singletons survive") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val d = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("doc_id")
    // chain 1-2-3 and pair 4-5; 9 is a singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val labels = graft.ops.Dedup.clusterLabels(d, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 9L -> 9L))
    val kept = graft.ops.Dedup.applyNearDedup(d, pairs)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(kept.toSeq == Seq((1L, 3L), (4L, 2L), (9L, 1L)))
  }

  test("embedding LSH near-dup vs the brute-force yardstick: perfect precision, pinned recall") {
    // The O(n²) brute form was evicted from the timed registry (a
    // cartesian has no place there at any scale) — this is where it
    // earns its keep, as ground truth for the banded LSH scale path.
    val emb = graft.tables.Fixtures.embeddings(spark, "/root/testdata/sf0.001")
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val brute = pairs(Similarity.nearDupPairs(emb, threshold = 0.4))
    val lsh = pairs(Similarity.nearDupPairsLsh(emb, threshold = 0.4))
    // candidates are exact-cosine verified, so LSH can never emit a
    // pair brute force wouldn't — precision is 1.0 by construction
    assert(lsh.subsetOf(brute), s"false positives: ${lsh -- brute}")
    // the default 16-plane/4-band config: a pair AT the 0.4 cut has
    // bit-match prob 1-acos(0.4)/pi ~= 0.63, band-collision prob
    // 1-(1-0.63^4)^4 ~= 0.50 — so ~half of borderline pairs is the
    // EXPECTED recall at the dial's cheap end, not a regression
    assert(lsh.size * 10 >= brute.size * 4,
      s"LSH recall collapsed: ${lsh.size}/${brute.size}")
    assert(brute.size == 66 && lsh.size == 31, // fixture sentinels
      s"fixture drifted: brute=${brute.size} lsh=${lsh.size}")
    // the recall/cost dial: doubling the planes (8 bands of 4) must
    // strictly tighten the miss set on the same ground truth
    val lsh32 = pairs(Similarity.nearDupPairsLsh(emb, threshold = 0.4, nPlanes = 32))
    assert(lsh32.subsetOf(brute), s"false positives: ${lsh32 -- brute}")
    assert(lsh32.size > lsh.size && lsh32.size * 10 >= brute.size * 6,
      s"32-plane recall should clear 60%: ${lsh32.size}/${brute.size}")
    assert(lsh32.size == 45, s"fixture drifted: lsh32=${lsh32.size}")
  }

  test("kmeans IVF: planted clusters recovered, probe beats cell-blind recall") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // three tight clusters around orthogonal axes in 4-d
    def around(axis: Int, delta: Float): Seq[Float] =
      (0 until 4).map(d => (if (d == axis) 1f else 0f) + (if (d == (axis + 1) % 4) delta else 0f))
    val rows = for {
      axis <- 0 until 3
      j <- 0 until 5
    } yield (axis * 5L + j, around(axis, j * 0.05f), axis)
    val emb = rows.toDF("vec_id", "embedding", "label")

    val cs = Similarity.kmeansCentroids(emb, k = 3, iters = 3)
    val cells = Similarity.assignCells(Similarity.prepared(emb), cs)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every planted cluster lands in exactly one learned cell
    (0 until 3).foreach { axis =>
      val cluster = (0 until 5).map(j => cells(axis * 5L + j))
      assert(cluster.distinct.size == 1, s"cluster $axis split: $cluster")
    }

    // IVF top-3 for query 0 must match brute force (its cluster is a cell)
    val brute = Similarity.topK(emb, maxQueryId = 1, k = 3).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("rn")))
    val ivf = Similarity.topKIvfKmeans(emb, maxQueryId = 1, k = 3,
      nCells = 3, nProbe = 1, centroids = Some(cs)).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("rn")))
    assert(ivf.toSeq == brute.toSeq)
  }

  test("two-level IVF: literal stays n^¼, fine cells occupancy-sized, recall holds vs brute") {
    import org.apache.spark.sql.functions.col
    val emb = graft.tables.Fixtures.embeddings(spark, "/root/testdata/sf0.001")
    val n = emb.count()
    val (coarse, fine, asg) = Similarity.ivf2Structure(emb)
    // the CAPACITY claim: the only centroid literal in any plan is the
    // coarse matrix, sized annCellsFor(annCellsFor(n)) ~ n^¼ — at a
    // billion vectors that is ~178 rows where single-level IVF would
    // need a ~31623-row literal
    val kc = graft.ops.AnnIndex.annCellsFor(graft.ops.AnnIndex.annCellsFor(n))
    assert(coarse.length == kc, s"coarse literal must be n^¼-sized: ${coarse.length} vs $kc")
    // the fine quantizer is DATA, not plan: exactly ⌈√occ⌉ centroids
    // per coarse cell (the same corpus-tracked sizing, per cell)
    val occ = asg.groupBy(col("ccell")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val fineCounts = fine.groupBy(col("ccell")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    def sqrtCeil(x: Long): Long = (1L to x).find(s => s * s >= x).get
    fineCounts.foreach { case (c, nf) =>
      assert(nf == sqrtCeil(occ(c)),
        s"cell $c: $nf fine centroids for occupancy ${occ(c)} (want ${sqrtCeil(occ(c))})")
    }
    // every vector holds a valid (ccell, fcell) — nothing dropped by
    // the two-stage assignment
    assert(asg.count() == n)
    val orphans = asg.join(fine, Seq("ccell", "fcell"), "left_anti").count()
    assert(orphans == 0, s"$orphans vectors assigned to a nonexistent fine cell")
    // recall is the nProbe dial, same contract as single-level IVF:
    // the cheap dial keeps a pinned floor, widening the fine probe
    // strictly helps, and probing EVERYTHING recovers brute force
    // exactly — the structure prunes bytes, never corrupts scores
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val brute = hits(Similarity.topK(emb, maxQueryId = 6, k = 5))
    val cheap = hits(Similarity.topKIvf2(emb, maxQueryId = 6, k = 5,
      nProbeCoarse = 2, nProbeFine = 3))
    val recallCheap = (brute & cheap).size.toDouble / brute.size
    // the fixture is ~200 near-random vectors in 4 coarse cells: the
    // 2-coarse/3-fine dial reads ~1/10 of the corpus, so ~1/3 recall
    // is the EXPECTED cheap end here, not a regression
    assert(recallCheap >= 0.25, s"cheap-dial recall collapsed: $recallCheap")
    val wide = hits(Similarity.topKIvf2(emb, maxQueryId = 6, k = 5,
      nProbeCoarse = 3, nProbeFine = 9))
    val recallWide = (brute & wide).size.toDouble / brute.size
    assert(recallWide > recallCheap,
      s"widening the probe must raise recall: $recallCheap -> $recallWide")
    val totalFine = fine.count().toInt
    val full = hits(Similarity.topKIvf2(emb, maxQueryId = 6, k = 5,
      nProbeCoarse = kc, nProbeFine = totalFine))
    assert(full == brute,
      s"full probe must equal brute force: missing ${brute -- full}, extra ${full -- brute}")
  }

  test("token_stats and minhash_sig resolve as SQL functions and match their Column-API forms") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.tables.Fixtures.documents(spark, "/root/testdata/sf0.001")
      .filter(size(TextAnalysis.tokens(col("text"))) >= 3).limit(50)
    docs.createOrReplaceTempView("fn_docs")
    val sql = spark.sql(
      """SELECT doc_id, token_stats(split(text, ' ')) AS ts,
        |       minhash_sig(split(text, ' '), 12) AS sig
        |FROM fn_docs""".stripMargin)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getStruct(1).getInt(0), r.getStruct(1).getInt(1), r.getStruct(1).getInt(2)),
          r.getSeq[Long](2))).toMap
    val api = docs.select(col("doc_id"),
        graft.functions.TokenStats.of(TextAnalysis.tokens(col("text"))).as("ts"),
        graft.functions.MinHashSig.of(TextAnalysis.tokens(col("text")), 12).as("sig"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getStruct(1).getInt(0), r.getStruct(1).getInt(1), r.getStruct(1).getInt(2)),
          r.getSeq[Long](2))).toMap
    assert(sql.nonEmpty && sql == api)
    spark.catalog.dropTempView("fn_docs")
    // a column-valued k is rejected at resolution, not silently wrong
    val err = intercept[Exception](
      spark.sql("SELECT minhash_sig(array('a','b','c'), cast(id AS INT)) FROM range(1)")
        .collect())
    assert(err.getMessage.contains("integer literal"), err.getMessage)
  }

  test("TokenStats native expression == the declarative size/array_distinct/filter triple, every fixture document") {
    import org.apache.spark.sql.functions._
    val docs = graft.tables.Fixtures.documents(spark, "/root/testdata/sf0.001")
    val toks = TextAnalysis.tokens(col("text"))
    val stop = TextAnalysis.stopwords
    val both = docs.select(col("doc_id"),
        graft.functions.TokenStats.of(toks).as("ts"),
        size(toks).as("d_tokens"),
        size(array_distinct(toks)).as("d_distinct"),
        size(filter(toks, t => t.isInCollection(stop))).as("d_stop"))
      .select(col("doc_id"),
        (col("ts.n_tokens") === col("d_tokens")).as("eq_n"),
        (col("ts.n_distinct") === col("d_distinct")).as("eq_d"),
        (col("ts.n_stop") === col("d_stop")).as("eq_s"))
      .collect()
    assert(both.nonEmpty)
    val bad = both.filterNot(r => r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3))
    assert(bad.isEmpty, s"native != declarative at docs ${bad.map(_.getLong(0)).take(5).toSeq}")
    // edge frames the fixture can't produce: empty array, duplicates,
    // a null element (counts toward n_tokens, is one distinct value,
    // never a stopword — the declarative semantics)
    import spark.implicits._
    val edge = Seq(
      (1L, Seq[String]()),
      (2L, Seq("the", "the", "the")),
      (3L, Seq("a", null, "a", null))).toDF("id", "toks")
      .select(col("id"), graft.functions.TokenStats.of(col("toks")).as("ts"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    assert(edge(1L).getInt(0) == 0 && edge(1L).getInt(1) == 0 && edge(1L).getInt(2) == 0)
    assert(edge(2L).getInt(0) == 3 && edge(2L).getInt(1) == 1 && edge(2L).getInt(2) == 3)
    assert(edge(3L).getInt(0) == 4 && edge(3L).getInt(1) == 2 && edge(3L).getInt(2) == 2,
      s"null-element frame: ${edge(3L)}")
  }

  test("SQ8: codes bounded and midpoint-faithful, full rerank recovers brute force, cheap rerank keeps recall") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val emb = graft.tables.Fixtures.embeddings(spark, "/root/testdata/sf0.001")
    val n = emb.count().toInt
    val (mns, mxs) = Similarity.sqParams(emb)
    val codes = Similarity.sqQuantize(emb, mns, mxs)
      .select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(_.forall(c => c >= 0 && c <= 255)))
    // midpoint reconstruction error is bounded by half a quantization
    // step per dimension — THE property that makes 8-bit codes a safe
    // candidate metric (the eps absorbs the floor's boundary ulp)
    val full = Similarity.prepared(emb).select(col("vec_id"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    full.foreach { case (id, v) =>
      v.indices.foreach { i =>
        val step = (mxs(i) - mns(i)) / 255.0
        val xhat = mns(i) + (codes(id)(i) + 0.5) * step
        assert(math.abs(xhat - v(i)) <= step / 2.0 + 1e-12,
          s"vec $id dim $i: |$xhat - ${v(i)}| > step/2 = ${step / 2}")
      }
    }
    // a constant dimension quantizes to 0 instead of dividing by zero
    val const = Seq((0L, Array(1f, 5f, 0f, 2f), 0), (1L, Array(2f, 5f, 0f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
    val (cmn, cmx) = Similarity.sqParams(const, dim = 4)
    val ccodes = Similarity.sqQuantize(const, cmn, cmx)
      .select(col("codes")).collect().map(_.getSeq[Int](0))
    assert(ccodes.forall(cs => cs(1) == 0 && cs(2) == 0),
      s"constant dims must code to 0: ${ccodes.map(_.mkString(",")).mkString(" | ")}")
    // reranking EVERY candidate is brute force exactly — quantization
    // prunes candidates, it never touches the emitted scores
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long, Double)] =
      df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rn"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("score"))).toSet
    val brute = hits(Similarity.topK(emb, maxQueryId = 5, k = 10))
    val fullRerank = hits(Similarity.topKSq(emb, maxQueryId = 5, k = 10, rerank = n))
    assert(fullRerank == brute,
      s"rerank=n must equal brute: missing ${brute -- fullRerank}, extra ${fullRerank -- brute}")
    // the production dial: 20 candidates from the code scan, 10 kept —
    // 255 levels/dim keep the approximate ranking close enough that
    // recall stays high on the fixture (and every EMITTED score is
    // exact by construction, so errors are only ever omissions)
    val cheap = hits(Similarity.topKSq(emb, maxQueryId = 5, k = 10, rerank = 20))
    val pairs = (s: Set[(Long, Int, Long, Double)]) => s.map(t => (t._1, t._3))
    val recall = (pairs(brute) & pairs(cheap)).size.toDouble / brute.size
    assert(recall >= 0.9, s"SQ8 rerank-20 recall collapsed: $recall")
    // the IVF composition: probing EVERY cell with rerank=n recovers
    // brute force exactly — cell pruning and code scanning only ever
    // drop candidates, never corrupt an emitted score
    val kc = graft.ops.AnnIndex.annCellsFor(n.toLong)
    val ivfFull = hits(Similarity.topKIvfSq(emb, maxQueryId = 5, k = 10,
      nProbe = kc, rerank = n))
    assert(ivfFull == brute,
      s"IVF-SQ full probe+rerank must equal brute: missing ${brute -- ivfFull}")
    // the production dial keeps recall on the probed-cell candidates
    val ivfCheap = hits(Similarity.topKIvfSq(emb, maxQueryId = 5, k = 10,
      nProbe = math.max(2, kc / 2), rerank = 30))
    val ivfRecall = (pairs(brute) & pairs(ivfCheap)).size.toDouble / brute.size
    assert(ivfRecall >= 0.3, s"IVF-SQ cheap-dial recall collapsed: $ivfRecall")
  }

  test("PQ/ADC: full rerank recovers brute force, production dial keeps recall, " +
      "4-bit codes genuinely coarser than SQ8") {
    import org.apache.spark.sql.functions.col
    val emb = graft.tables.Fixtures.embeddings(spark, "/root/testdata/sf0.001")
    val n = emb.count().toInt
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long, Double)] =
      df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rn"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("score"))).toSet
    val brute = hits(Similarity.topK(emb, maxQueryId = 5, k = 10))
    // reranking EVERY candidate is brute force exactly — the ADC table
    // only ever prunes candidates, emitted scores are exact cosine
    val fullRerank = hits(Similarity.topKPq(emb, maxQueryId = 5, k = 10, rerank = n))
    assert(fullRerank == brute,
      s"PQ rerank=n must equal brute: missing ${brute -- fullRerank}, " +
        s"extra ${fullRerank -- brute}")
    // the registry dial (m=8, ksub=16 → 4 bits/dim, rerank=50): 32 B
    // of code per 256 B vector must still surface most of the true
    // top-10 ON THE WORST-CASE near-uniform fixture (SCALING.md: no
    // neighborhood structure — every quantizer's recall floor) —
    // errors are omissions only, never corrupted scores
    val pairs = (s: Set[(Long, Int, Long, Double)]) => s.map(t => (t._1, t._3))
    val cheap = hits(Similarity.topKPq(emb, maxQueryId = 5, k = 10, rerank = 50))
    val recall = (pairs(brute) & pairs(cheap)).size.toDouble / brute.size
    assert(recall >= 0.5, s"PQ rerank-50 recall collapsed: $recall")
    // the dials are monotone: a wider codebook at the same rerank must
    // not collapse recall (measured 0.42→0.56 at rerank 30, 0.58→0.62
    // at rerank 50 for ksub 16→32 on this fixture)
    val wide = hits(Similarity.topKPq(emb, maxQueryId = 5, k = 10,
      ksub = 32, rerank = 50))
    val recallWide = (pairs(brute) & pairs(wide)).size.toDouble / brute.size
    assert(recallWide >= recall - 0.100001,
      s"wider codebook must not collapse recall: $recallWide vs $recall")
    // the IVF composition: probing EVERY cell with rerank=n recovers
    // brute force exactly — cell pruning and the ADC fold only ever
    // drop candidates, never corrupt an emitted score
    val kc = graft.ops.AnnIndex.annCellsFor(n.toLong)
    val ivfFull = hits(Similarity.topKIvfPq(emb, maxQueryId = 5, k = 10,
      nProbe = kc, rerank = n))
    assert(ivfFull == brute,
      s"IVF-PQ full probe+rerank must equal brute: missing ${brute -- ivfFull}")
  }

  test("learned PQ codebook: Lloyd never increases per-subspace SSE vs the sampled seed, " +
      "deterministic, full-rerank still exact, and the learning genuinely moves centroids") {
    val emb = graft.tables.Fixtures.embeddings(spark, "/root/testdata/sf0.001")
    val n = emb.count().toInt
    val m = 8; val ksub = 16; val dim = 64; val dsub = dim / m
    val vecs = Similarity.prepared(emb)
      .select(org.apache.spark.sql.functions.col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    // per-subspace quantization SSE of a codebook, computed in plain
    // Scala on the collected fixture (exact, engine-free)
    def sse(cb: Array[Array[Double]]): Double =
      vecs.map { v =>
        (0 until m).map { j =>
          (0 until ksub).map { i =>
            (0 until dsub).map { t =>
              val d = v(j * dsub + t) - cb(i)(j * dsub + t); d * d
            }.sum
          }.min
        }.sum
      }.sum
    val seed = Similarity.sampledCentroids(Similarity.prepared(emb), ksub)
    val learned = Similarity.learnedPqCodebook(emb, m, ksub, dim, iters = 2)
    assert(learned.length == ksub && learned.forall(_.length == dim))
    // determinism: no RNG anywhere in the pass
    val again = Similarity.learnedPqCodebook(emb, m, ksub, dim, iters = 2)
    assert(learned.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // Lloyd monotonicity: each iteration's assignment+mean cannot
    // increase the objective, so learned SSE <= seed SSE — and on this
    // fixture the improvement must be real, not epsilon
    val (s0, s1) = (sse(seed), sse(learned))
    assert(s1 <= s0 + 1e-9, s"k-means must not increase SSE: $s0 -> $s1")
    assert(s1 < s0 * 0.999, s"learning must genuinely move centroids: $s0 -> $s1")
    // the exactness contract survives the alternate codebook: rerank=n
    // over learned-ADC candidates is still brute force exactly
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val brute = hits(Similarity.topK(emb, maxQueryId = 3, k = 10))
    val full = hits(Similarity.topKPq(emb, maxQueryId = 3, k = 10, rerank = n,
      codebookIn = Some(learned)))
    assert(full == brute, "learned-codebook PQ at rerank=n must equal brute force")
  }

  test("residual-PQ: the rseed codebook is non-degenerate (the shared-seed zero-residual trap), " +
      "and full probe + full rerank == brute force") {
    val emb = graft.tables.Fixtures.embeddings(spark, "/root/testdata/sf0.001")
    val e = Similarity.prepared(emb)
    val n = emb.count().toInt
    val kc = graft.ops.AnnIndex.annCellsFor(n.toLong)
    val cs = Similarity.sampledCentroids(e, kc)
    // a "seed:"-tagged sample IS the quantizer's row set, so every
    // seed's residual to its own nearest cell is identically zero —
    // the bug the recall probe caught (and the differential check
    // could not: the oracle computed the same zeros). The "rseed:"
    // sample must residualize to a codebook that is nearly all
    // non-zero (a chance collision with a centroid row may zero a
    // stray entry, never the book).
    def zeroRows(tag: String): Int =
      Similarity.sampledRowsBy(e, 16, tag).count { row =>
        val c = cs(Similarity.nearestCellIdx(row, cs))
        row.indices.forall(d => row(d) == c(d))
      }
    assert(zeroRows("seed:") == 16,
      "precondition: the shared tag degenerates the whole book (the trap is real)")
    assert(zeroRows("rseed:") <= 2,
      s"rseed residual codebook degenerated: ${zeroRows("rseed:")} of 16 rows are zero")
    // exactness contract, as for every PQ form: ADC only RANKS
    // candidates — full probe width + rerank=n is brute force exactly
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val brute = hits(Similarity.topK(emb, maxQueryId = 3, k = 10))
    val full = hits(Similarity.topKIvfRpq(emb, maxQueryId = 3, k = 10,
      nProbe = kc, rerank = n))
    assert(full == brute, "residual-PQ full probe + full rerank must equal brute force")
  }

  test("learned residual codebook: Lloyd never increases residual SSE vs the rseed seed, " +
      "deterministic, and the codebookIn probe stays exact at full rerank") {
    val emb = graft.tables.Fixtures.embeddings(spark, "/root/testdata/sf0.001")
    val e = Similarity.prepared(emb)
    val n = emb.count().toInt
    val m = 8; val ksub = 16; val dim = 64; val dsub = dim / m
    val kc = graft.ops.AnnIndex.annCellsFor(n.toLong)
    val cs = Similarity.sampledCentroids(e, kc)
    // plain-Scala residuals of the whole fixture (engine-free truth)
    val resVecs = e.select(org.apache.spark.sql.functions.col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
      .map { v =>
        val c = cs(Similarity.nearestCellIdx(v, cs))
        Array.tabulate(v.length)(d => v(d) - c(d))
      }
    def sse(cb: Array[Array[Double]]): Double =
      resVecs.map { rv =>
        (0 until m).map { j =>
          (0 until ksub).map { i =>
            (0 until dsub).map { t =>
              val d = rv(j * dsub + t) - cb(i)(j * dsub + t); d * d
            }.sum
          }.min
        }.sum
      }.sum
    val seed = Similarity.sampledRowsBy(e, ksub, "rseed:").map { row =>
      val c = cs(Similarity.nearestCellIdx(row, cs))
      Array.tabulate(row.length)(d => row(d) - c(d))
    }
    val learned = Similarity.learnedResidualCodebook(emb, m, ksub, dim, iters = 2)
    assert(learned.length == ksub && learned.forall(_.length == dim))
    val again = Similarity.learnedResidualCodebook(emb, m, ksub, dim, iters = 2)
    assert(learned.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "no RNG anywhere in the residual Lloyd pass")
    val (s0, s1) = (sse(seed), sse(learned))
    assert(s1 <= s0 + 1e-9, s"k-means must not increase residual SSE: $s0 -> $s1")
    assert(s1 < s0 * 0.999, s"learning must genuinely move residual centroids: $s0 -> $s1")
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val brute = hits(Similarity.topK(emb, maxQueryId = 3, k = 10))
    val full = hits(Similarity.topKIvfRpq(emb, maxQueryId = 3, k = 10,
      nProbe = kc, rerank = n, codebookIn = Some(learned)))
    assert(full == brute,
      "learned-residual-codebook probe at full width/rerank must equal brute force")
  }

  test("PNG codec round-trip: decoded stats equal the planted ground truth; corrupt payloads cost only their row") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val d = docs(0L -> "a", 3L -> "b", 7L -> "c", 12L -> "d")
    val media = Multimodal.pngPayload(spark, d)
    // payloads are REAL PNGs (magic + zlib body), not labeled stubs
    val magics = media.select(col("payload")).collect()
      .map(_.getAs[Array[Byte]](0).take(4).toSeq)
    assert(magics.forall(_ == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)))
    val got = Multimodal.decodeImage(spark, media).collect()
      .map(s => s.doc_id -> s).toMap
    // ground truth from the planted formulas, computed in plain Scala
    Seq(0L, 3L, 7L, 12L).foreach { did =>
      val (w, h) = Multimodal.pngDims(did)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (x <- 0 until w; y <- 0 until h) {
        val (r, g, b) = Multimodal.pngChannels(did, x, y)
        sr += r; sg += g; sb += b
      }
      val np = w.toLong * h
      val s = got(did)
      assert((s.width, s.height, s.n_pixels) == ((w.toLong, h.toLong, np)))
      assert((s.mean_r_x100, s.mean_g_x100, s.mean_b_x100, s.brightness_x100) ==
        ((sr * 100 / np, sg * 100 / np, sb * 100 / np, (sr + sg + sb) * 100 / (np * 3))),
        s"doc $did channel stats survived the codec wrong")
    }
    // error isolation: a truncated stream and plain garbage decode to
    // NO row; the healthy rows in the same batch are untouched
    val corrupt = media.as[graft.ops.MediaRow].map { r =>
      if (r.doc_id == 3L) graft.ops.MediaRow(r.doc_id, r.media_type, r.payload.take(20))
      else if (r.doc_id == 7L) graft.ops.MediaRow(r.doc_id, r.media_type, "not a png".getBytes)
      else r
    }.toDF()
    val survivors = Multimodal.decodeImage(spark, corrupt).collect().map(_.doc_id).sorted
    assert(survivors.toSeq == Seq(0L, 12L),
      s"corrupt rows must be skipped, healthy rows kept: ${survivors.toSeq}")
  }

  test("JPEG codec round-trip: dims lossless, channel means inside the tolerance margin; corrupt payloads cost only their row") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ids = Seq(0L, 3L, 7L, 12L, 25L, 38L)
    val d = docs(ids.map(i => i -> s"doc$i"): _*)
    val media = Multimodal.jpegPayload(spark, d)
    // payloads are REAL JPEGs (SOI + JFIF marker), not labeled stubs
    val magics = media.select(col("payload")).collect()
      .map(_.getAs[Array[Byte]](0).take(2).toSeq)
    assert(magics.forall(_ == Seq(0xff.toByte, 0xd8.toByte)))
    val got = Multimodal.decodeImage(spark, media).collect()
      .map(s => s.doc_id -> s).toMap
    // the x100 mean error the lossy round-trip actually produces, per
    // channel, vs plain-Scala ground truth — must sit WELL inside the
    // claims entry's 500 tolerance (headroom is the contract: codec
    // rounding wobbles a few units, a decode bug shifts tens)
    var worst = 0L
    ids.foreach { did =>
      val (w, h) = Multimodal.pngDims(did)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (x <- 0 until w; y <- 0 until h) {
        val (r, g, b) = Multimodal.jpegChannels(did, x, y)
        sr += r; sg += g; sb += b
      }
      val np = w.toLong * h
      val s = got(did)
      assert((s.width, s.height, s.n_pixels) == ((w.toLong, h.toLong, np)),
        s"dims must survive any codec losslessly (doc $did)")
      val errs = Seq(s.mean_r_x100 - sr * 100 / np, s.mean_g_x100 - sg * 100 / np,
        s.mean_b_x100 - sb * 100 / np,
        s.brightness_x100 - (sr + sg + sb) * 100 / (np * 3)).map(math.abs)
      worst = math.max(worst, errs.max)
    }
    info(s"worst JPEG mean error: $worst x100 units (claims tolerance 500)")
    assert(worst <= 300, s"lossy margin too wide for the 500 claim: $worst")
    // and the claims entry itself, over the FULL sf0.01 doc_id range
    // (the planted formulas depend only on doc_id, so this pins the
    // tolerance at driver-fixture scale, not a lucky sample)
    val wide = docs((0L until 500L).map(i => i -> s"w$i"): _*)
    val claims = Multimodal.jpegPixelClaims(spark, wide).collect()
    assert(claims.length == 500)
    claims.foreach { r =>
      Seq("r_close", "g_close", "b_close", "brightness_close").foreach(c =>
        assert(r.getAs[Boolean](c), s"claim $c false for doc ${r.getAs[Long]("doc_id")}"))
    }
    // error isolation, JPEG flavor: truncated entropy stream + garbage
    val corrupt = media.as[graft.ops.MediaRow].map { r =>
      if (r.doc_id == 3L) graft.ops.MediaRow(r.doc_id, r.media_type, r.payload.take(24))
      else if (r.doc_id == 7L) graft.ops.MediaRow(r.doc_id, r.media_type, "not a jpeg".getBytes)
      else r
    }.toDF()
    val survivors = Multimodal.decodeImage(spark, corrupt).collect().map(_.doc_id).sorted
    assert(survivors.toSeq == Seq(0L, 12L, 25L, 38L),
      s"corrupt rows must be skipped, healthy rows kept: ${survivors.toSeq}")
  }

  test("multimodal resize: aspect ratio preserved, small media untouched") {
    import org.apache.spark.sql.functions.col
    val d = docs(2L -> ("x" * 600), 3L -> "tiny")
    val feats = Multimodal.decodeFeatures(spark, Multimodal.withPayload(d)).toDF()
    val out = Multimodal.resizeMeta(feats).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("scale_pm"), r.getAs[Long]("out_width"), r.getAs[Long]("out_height"))).toMap
    // doc 2: 600 chars → width 64+600%576=88, height 64+4200%416=104 → no shrink
    assert(out(2L) == ((1000L, 88L, 104L)))
    // doc 3: 4 chars → under the box, untouched
    assert(out(3L)._1 == 1000L)
    val bigger = Multimodal.resizeMeta(feats, maxSide = 60L)
      .filter(col("doc_id") === 2L).collect().head
    // longest side 104 → scale 60000/104=576‰, out 88*576/1000=50, 104*576/1000=59
    assert(bigger.getAs[Long]("scale_pm") == 576L &&
      bigger.getAs[Long]("out_width") == 50L &&
      bigger.getAs[Long]("out_height") == 59L)
  }

  test("multimodal frame sampling strides video frames, single frame otherwise") {
    val d = docs(2L -> ("y" * 25), 3L -> "img")
    val feats = Multimodal.decodeFeatures(spark, Multimodal.withPayload(d)).toDF()
    val frames = Multimodal.frameSample(feats, stride = 10).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_idx")))
    // doc 2 is video with frames = 1 + 25 % 30 = 26 → indices 0,10,20
    assert(frames.filter(_._1 == 2L).map(_._2).sorted.toSeq == Seq(0L, 10L, 20L))
    // doc 3 is image → the single frame 0
    assert(frames.filter(_._1 == 3L).map(_._2).toSeq == Seq(0L))
  }

  test("ngram jaccard is blocked by source (cross-source pairs excluded)") {
    val t = (1 to 20).map(i => s"w$i").mkString(" ")
    // doc 1 and 3 share source (odd/even split in docs()), 1 and 2 do not
    val d = docs(1L -> t, 2L -> t, 3L -> t)
    val pairs = Dedup.ngramJaccardPairs(d, threshold = 0.5).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("jaccard_bp")))
    assert(pairs.toSeq == Seq((1L, 3L, 10000L)))
  }

  test("hammingBands: maxHamming+1 contiguous chunks cover every bit (pigeonhole invariant)") {
    for (bits <- Seq(60, 64); m <- Seq(0, 3, 12, bits - 1)) {
      val bands = Dedup.hammingBands(bits, m)
      assert(bands.length == m + 1)
      assert(bands.map(_._2).sum == bits, s"chunks must cover all $bits bits")
      assert(bands.head._1 == 0)
      bands.sliding(2).foreach {
        case Seq((s1, w1), (s2, _)) => assert(s2 == s1 + w1, "chunks must be contiguous")
        case _ =>
      }
      assert(bands.forall(_._2 >= 1))
    }
    intercept[IllegalArgumentException](Dedup.hammingBands(60, 60))
  }

  test("md5-simhash twin finds the planted near-dup and nothing else") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = base.replace("w7", "changed")
    val other = (1 to 40).map(i => s"z$i").mkString(" ")
    val d = docs(1L -> base, 2L -> nearDup, 3L -> other)
    val pairs = Dedup.simhashPairsMd5(d, maxHamming = 12).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("hamming")))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)))
    assert(pairs.head._3 > 0, "one changed token must flip some bits")
  }

  test("banded ngram jaccard: one dominant source stays ~linear, planted near-dup still found") {
    import spark.implicits._
    // every doc shares a 3-token prefix, so EVERY pair in the block is
    // co-shingled: the raw (source, shingle) self-join materializes all
    // n(n+1)/2 pairs of the dominant source — the quadratic hot
    // partition the banded path exists to avoid
    val prefix = "the quick brown"
    val n = 120
    val base = (1 to n).map { i =>
      val tail = (1 to 20).map(j => s"u${i}x$j").mkString(" ")
      (i.toLong, s"$prefix $tail", "en", "bigsrc", 0L)
    }
    // plant one true near-dup of doc 1 (one token changed)
    val nearDup = (1000L,
      s"$prefix " + (1 to 20).map(j => if (j == 7) "changed" else s"u1x$j").mkString(" "),
      "en", "bigsrc", 0L)
    val d = (base :+ nearDup).toDF("doc_id", "text", "lang", "source", "n_chars")
    val quadratic = (n + 1L) * n / 2 // what the raw join's hot partition holds
    val banded = Dedup.bandedCandidates(d, "source").count()
    assert(banded <= quadratic / 10,
      s"band-collision candidates must stay ~linear under a dominant source: $banded vs $quadratic")
    val pairs = Dedup.ngramJaccardPairsBanded(d, threshold = 0.5).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.toSeq == Seq((1L, 1000L)), "planted near-dup must survive the banding")
  }

  test("banded ngram jaccard on the fixture corpus: subset of raw, full recall at the default threshold") {
    val d = graft.tables.Fixtures.documents(spark, "/root/testdata/sf0.001")
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_a"),
        r.getAs[Long]("doc_b"), r.getAs[Long]("jaccard_bp"))).toSet
    val raw = pairSet(Dedup.ngramJaccardPairs(d))
    val banded = pairSet(Dedup.ngramJaccardPairsBanded(d))
    assert(banded.subsetOf(raw), "banding can only restrict the candidate set")
    // on the synthetic corpus the duplicated docs are near-identical,
    // so every qualifying pair band-collides: recall is total here
    assert(banded == raw, s"missed pairs on fixture data: ${raw -- banded}")
  }
}
