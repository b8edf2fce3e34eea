package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Curation, Export}

/** Independent checks for the [[graft.ops.Curation]] operators.
  *
  * The registry queries are differentially checked against DuckDB, but
  * both sides of that check were authored together — a bug mirrored in
  * the oracle SQL would sail through. Every test here recomputes the
  * expected result from the operator's CONTRACT (plain Scala folds over
  * handcrafted rows, or the documented md5 arithmetic), so the Spark
  * plan is checked against a third, independently-derived answer.
  */
class CurationSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String, String, String)*) = {
    import spark.implicits._
    rows.map { case (id, text, lang, source) => (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def md5hex(s: String): String = graft.evm.EvmDerive.md5hex(s)

  // ---------------------------------------------------------------
  // sourceCap: per-source cap semantics + rank-pushdown plan shape
  // ---------------------------------------------------------------

  test("sourceCap keeps the cap best-quality docs per source; ties break by doc_id") {
    // srcA: 3 docs with distinct quality (token counts 30/20/10 —
    // quality_score_bp grows with n_tokens at these sizes);
    // srcB: 2 IDENTICAL texts (tied score) plus one longer doc
    val d = docs(
      (1L, toks(10, "a"), "en", "srcA"), (2L, toks(30, "b"), "en", "srcA"),
      (3L, toks(20, "c"), "en", "srcA"), (4L, toks(15, "d"), "en", "srcB"),
      (5L, toks(15, "d"), "en", "srcB"), (6L, toks(25, "e"), "en", "srcB"))
    val out = Curation.sourceCap(d, cap = 2).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("source_rank"),
        r.getAs[Long]("doc_id")))
      .sortBy(t => (t._1, t._2))
    // srcA: 30-token doc 2 first, then 20-token doc 3; the 10-token
    // doc 1 is cut. srcB: 25-token doc 6 first, then the TIE between
    // docs 4 and 5 resolves to the lower doc_id.
    assert(out.toSeq == Seq(("srcA", 1L, 2L), ("srcA", 2L, 3L),
      ("srcB", 1L, 6L), ("srcB", 2L, 4L)))
  }

  test("sourceCap plans a WindowGroupLimit (map-side pre-limit before the shuffle)") {
    val d = docs((1L to 20L).map(i =>
      (i, toks(5 + i.toInt, "w"), "en", s"src${i % 4}")): _*)
    val plan = Curation.sourceCap(d, cap = 3).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter must push a group limit below the window exchange:\n$plan")
  }

  /** The operator contract's hash draw, recomputed from scratch:
    * 52 bits (13 hex chars) of md5("<id>:<tag>") mod m. */
  private def hashModRef(id: Long, tag: String, m: Long): Long =
    java.lang.Long.parseLong(md5hex(s"$id:$tag").substring(0, 13), 16) % m

  /** Synthetic text of n single-space-separated tokens. */
  private def toks(n: Int, pre: String = "t"): String =
    (1 to n).map(i => s"$pre$i").mkString(" ")

  // ---------------------------------------------------------------
  // packSequences: coverage property
  // ---------------------------------------------------------------

  test("packSequences: pinned small case — straddling doc lands in every pack it touches") {
    val d = docs(
      (1L, toks(5), "en", "s0"),   // s0: [0, 5)   → pack 0
      (2L, toks(12), "en", "s0"),  // s0: [5, 17)  → packs 0,1,2 (straddles two cuts)
      (3L, toks(3), "en", "s0"),   // s0: [17, 20) → pack 2
      (4L, toks(8), "en", "s1"))   // s1: [0, 8)   → pack 0
    val got = Curation.packSequences(d, ctx = 8).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("n_tokens"), r.getAs[Long]("start_off"), r.getAs[Long]("pack_id"))).toSet
    val expected = Set(
      ("s0", 1L, 5, 0L, 0L),
      ("s0", 2L, 12, 5L, 0L), ("s0", 2L, 12, 5L, 1L), ("s0", 2L, 12, 5L, 2L),
      ("s0", 3L, 3, 17L, 2L),
      ("s1", 4L, 8, 0L, 0L))
    assert(got == expected)
  }

  test("packSequences: every token offset in exactly one doc span; pack range = floor(start/ctx)..floor((end-1)/ctx)") {
    val ctx = 16
    // varied token counts (deterministic, includes ctx-sized, tiny, and
    // multi-pack straddlers), spread over two shards
    val counts = Seq(3, 16, 1, 40, 7, 16, 33, 2, 5, 19, 8, 1, 64, 10, 4)
    val rows = counts.zipWithIndex.map { case (n, i) =>
      ((i + 1).toLong, toks(n), "en", s"s${i % 2}")
    }
    val got = Curation.packSequences(docs(rows: _*), ctx).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("n_tokens"), r.getAs[Long]("start_off"), r.getAs[Long]("pack_id")))

    // independent reference: fold the running offsets per shard in Scala
    val bySource = rows.groupBy(_._4)
    val expected = bySource.flatMap { case (src, rs) =>
      var off = 0L
      rs.sortBy(_._1).flatMap { case (id, text, _, _) =>
        val n = text.split(" ").length
        val start = off
        val end = off + n
        off = end
        (start / ctx to (end - 1) / ctx).map(p => (src, id, n, start, p))
      }
    }.toSet
    assert(got.toSet == expected)

    // coverage: per shard, doc spans tile [0, total) with no gap/overlap
    got.groupBy(_._1).foreach { case (src, g) =>
      val spans = g.map(r => (r._2, r._4, r._4 + r._3)).distinct.sortBy(_._2).toSeq
      assert(spans.head._2 == 0L, s"$src must start at offset 0")
      spans.sliding(2).foreach {
        case Seq((_, _, e1), (_, s2, _)) => assert(s2 == e1, s"$src spans must be contiguous")
        case _ =>
      }
      // every pack id between 0 and the last cut appears (no empty pack)
      val total = spans.last._3
      val packs = g.map(_._5).distinct.sorted
      assert(packs.toSeq == (0L to (total - 1) / ctx).toSeq, s"$src pack ids must be gap-free")
    }
  }

  // ---------------------------------------------------------------
  // mixWeighted: copy counts vs weights
  // ---------------------------------------------------------------

  test("mixWeighted: per-doc copies match the md5 draw; totals match the weight expectation") {
    val weights = Map("src0" -> 2500, "src1" -> 1500)
    val rows = (1L to 60L).map(i => (i, toks(3), "en", s"src${i % 3}")) // src2 → default 500
    val got = Curation.mixWeighted(docs(rows: _*), weights).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_copies"), r.getAs[Long]("copy_idx")))

    // independent reference from the documented contract
    val expected = rows.flatMap { case (id, _, _, src) =>
      val w = weights.getOrElse(src, 500).toLong
      val n = w / 1000 + (if (hashModRef(id, "mix", 1000) < w % 1000) 1L else 0L)
      (1L to n).map(c => (id, src, n, c))
    }.toSet
    assert(got.toSet == expected)

    // aggregate sanity: every src0 doc emits 2 or 3 copies, never 0 rows
    val bySrc = got.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size).toMap
    assert(bySrc("src0") == rows.count(_._4 == "src0"),
      "weight 2.5 means every src0 doc appears (floor = 2 copies minimum)")
    got.filter(_._2 == "src0").foreach(r => assert(r._3 == 2L || r._3 == 3L))
    // default-weight source (0.5) keeps only the hash-selected half: docs
    // with draw >= 500 must be entirely absent
    val absent = rows.filter(r => r._4 == "src2" && hashModRef(r._1, "mix", 1000) >= 500)
    assert(absent.nonEmpty, "fixture must exercise the zero-copy path")
    absent.foreach { case (id, _, _, _) =>
      assert(!got.exists(_._1 == id), s"doc $id (draw >= 500) must emit no copies")
    }
  }

  // ---------------------------------------------------------------
  // decontaminate: planted-overlap recall
  // ---------------------------------------------------------------

  test("decontaminate: planted benchmark overlap is recalled with exact counts; clean docs absent") {
    val d = docs(
      (0L, "b1 b2 b3 b4", "en", "s0"),            // bench (0 % 97 == 0)
      (97L, "c1 c2 c3", "en", "s0"),              // bench
      (1L, "b1 b2 b3 x1", "en", "s0"),            // 2 of 3 bigrams overlap → 6666 bp
      (2L, "b1 b2 y1 y2 y3 y4 y5", "en", "s0"),   // 1 of 6 overlap → 1666 bp
      (3L, "z1 z2 z3", "en", "s0"))               // clean → absent
    val got = Curation.decontaminate(d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_overlap"), r.getAs[Long]("contamination_bp"),
        r.getAs[Boolean]("is_contaminated"))).toSet
    assert(got == Set(
      (1L, 3L, 2L, 6666L, true),
      (2L, 6L, 1L, 1666L, false)))
  }

  test("decontaminate: recall property — every train doc sharing a bigram with the bench set is flagged") {
    // bench doc carries bigrams "m1 m2" ... "m9 m10"; half the train
    // docs embed one of them at a varying position, half are clean
    val bench = (0L, toks(10, "m"), "en", "s0")
    val train = (1 to 20).map { i =>
      val id = i.toLong
      val body =
        if (i % 2 == 0) s"${toks(4, s"u${i}x")} m${i % 9 + 1} m${i % 9 + 2} ${toks(3, s"u${i}y")}"
        else toks(8, s"u${i}z")
      (id, body, "en", "s0")
    }
    val flagged = Curation.decontaminate(docs((bench +: train): _*)).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val planted = train.filter(_._1 % 2 == 0).map(_._1).toSet
    assert(flagged == planted,
      s"planted overlaps must all be recalled and nothing else: missing=${planted -- flagged} extra=${flagged -- planted}")
  }

  // ---------------------------------------------------------------
  // sampleStratified: hash gate per stratum
  // ---------------------------------------------------------------

  test("splitAssign: buckets match the documented md5 arithmetic; splits partition; holdouts nest") {
    import java.security.MessageDigest
    val ids = spark.range(2000).select(col("id").as("doc_id"))
    val got = Curation.splitAssign(ids).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("split_bucket"), r.getAs[String]("split")))).toMap
    // independent reference: first 13 hex chars of md5("<id>:split") mod 1000
    def refBucket(id: Long): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(s"$id:split".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(13), 16) % 1000
    }
    (0L until 2000L).foreach { id =>
      val b = refBucket(id)
      val want = if (b < 980) "train" else if (b < 990) "valid" else "test"
      assert(got(id) == ((b, want)), s"doc $id")
    }
    // every doc in exactly one split; holdouts within 3 binomial sds
    assert(got.size == 2000)
    val byCounts = got.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byCounts.values.sum == 2000)
    assert(byCounts.getOrElse("valid", 0) > 2 && byCounts("valid") < 45)
    assert(byCounts.getOrElse("test", 0) > 2 && byCounts("test") < 45)
    // widening the holdout only promotes docs toward the holdout end:
    // no test doc ever returns to train/valid, no train doc jumps to test
    // past the valid band boundaries
    val wide = Curation.splitAssign(ids, validPermille = 50, testPermille = 50)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    (0L until 2000L).foreach { id =>
      (got(id)._2, wide(id)) match {
        case ("test", w)  => assert(w == "test")
        case ("valid", w) => assert(w == "valid" || w == "test")
        case _            => // train may promote anywhere
      }
    }
    // corpus growth never moves an existing doc (pure function of id)
    val subset = Curation.splitAssign(ids.filter(col("doc_id") < 500))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    subset.foreach { case (id, s) => assert(s == got(id)._2) }
  }

  test("sampleStratified: kept set is exactly the md5-draw-under-rate set per language") {
    val rates = Map("en" -> 5000, "de" -> 1000)
    val rows = (1L to 80L).map { i =>
      (i, toks(2), Seq("en", "de", "fr")(i.toInt % 3), "s0") // fr → default 500
    }
    val got = Curation.sampleStratified(docs(rows: _*), rates).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("sample_bp"), r.getAs[Long]("rate_bp")))
    val expected = rows.flatMap { case (id, _, lang, _) =>
      val draw = hashModRef(id, "sample", 10000)
      val rate = rates.getOrElse(lang, 500).toLong
      if (draw < rate) Some((id, draw, rate)) else None
    }.toSet
    assert(got.toSet == expected)
    assert(got.nonEmpty && got.size < rows.size, "fixture must exercise both keep and drop")
  }

  // ---------------------------------------------------------------
  // repetitionStats: hand-computed basis points
  // ---------------------------------------------------------------

  test("repetitionStats: degenerate repetition flagged, diverse text passes (hand-computed bp)") {
    val d = docs(
      // tokens a b a b a b c → bigrams: ab ba ab ba ab bc (total 6, max 3,
      // distinct 3); trigrams: aba bab aba bab abc (total 5, distinct 3)
      (10L, "a b a b a b c", "en", "s0"),
      // 7 all-distinct tokens → 6 distinct bigrams (max 1), 5 distinct trigrams
      (11L, toks(7, "d"), "en", "s0"))
    val got = Curation.repetitionStats(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("top_bigram_bp"), r.getAs[Long]("dup_bigram_bp"),
          r.getAs[Long]("dup_trigram_bp"), r.getAs[Boolean]("passes_repetition")))).toMap
    assert(got(10L) == ((5000L, 5000L, 4000L, false)))
    assert(got(11L) == ((1666L, 0L, 0L, true)))
  }

  test("repetitionStats: native one-pass == declarative explode/groupBy twin on the fixture corpus") {
    // the map-only NgramRepStats projection must be bit-identical to
    // the shuffle-based pipeline it replaced — the TokenStats twin
    // arrangement, over real fixture text plus edge docs (< 3 tokens
    // dropped by both; exactly 3 tokens kept)
    import org.apache.spark.sql.functions.{col, lit, concat}
    val fixture = graft.tables.Fixtures.documents(spark, "/root/testdata/sf0.001")
    val edges = docs(
      (900001L, "one two", "en", "s0"),
      (900002L, "a a a", "en", "s0"),
      (900003L, "solo", "en", "s0"))
    val d = fixture.select(col("doc_id"), col("text"), col("lang"), col("source"))
      .unionByName(edges.select(col("doc_id"), col("text"), col("lang"), col("source")))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("top_bigram_bp"),
        r.getAs[Long]("dup_bigram_bp"), r.getAs[Long]("dup_trigram_bp"),
        r.getAs[Boolean]("passes_repetition"))).toSet
    val native = rows(Curation.repetitionStats(d))
    val twin = rows(Curation.repetitionStatsDeclarative(d))
    assert(native.nonEmpty && native == twin,
      s"native vs twin: only-native=${(native -- twin).take(3)} " +
        s"only-twin=${(twin -- native).take(3)}")
    assert(!native.exists(r => r._1 == 900001L || r._1 == 900003L),
      "docs without a trigram must be dropped by both forms")
    assert(native.exists(_._1 == 900002L))
    // and the projection genuinely is map-only: no shuffle anywhere
    val plan = Curation.repetitionStats(d).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"repetitionStats must plan with zero shuffles:\n$plan")
  }

  test("NgramRepStats: a null token element follows concat_ws semantics (skipped, never a literal)") {
    // split() output never carries nulls, but the expression's rule
    // for a foreign tokenizer must be concat_ws's exactly: a null
    // element is SKIPPED inside the join, so (a, null) and (null, a)
    // both key "a" — a literal "null" substitution would diverge
    import org.apache.spark.sql.functions.{array, col, lit}
    import spark.implicits._
    val d = Seq(1L).toDF("id").select(col("id"),
      array(lit("a"), lit(null).cast("string"), lit("a"), lit("b"))
        .as("toks"))
    val r = d.select(graft.functions.NgramRepStats.of(col("toks")).as("st"))
      .select(col("st.*")).collect()(0)
    // bigrams: (a,null)->"a", (null,a)->"a", (a,b)->"a b":
    // total 3, max 2 ("a"), distinct 2; trigrams: (a,null,a)->"a a",
    // (null,a,b)->"a b": total 2, distinct 2
    assert(r.getAs[Long]("bi_total") == 3L && r.getAs[Long]("bi_max") == 2L &&
      r.getAs[Long]("bi_distinct") == 2L && r.getAs[Long]("tri_total") == 2L &&
      r.getAs[Long]("tri_distinct") == 2L, s"got $r")
  }

  // ---------------------------------------------------------------
  // piiScrub: regex edges
  // ---------------------------------------------------------------

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  test("piiScrub: multiple hits per doc, word-boundary and TLD edges") {
    val d = docs(
      (1L, "reach a@b.co or c.d-e@f.org now", "en", "s0"),     // 2 emails
      (2L, "call 555-1234 or 555-9999 today", "en", "s0"),     // 2 phones
      // digit-flanked candidates fail \b; 1-letter TLD fails {2,}
      (3L, "x555-12345 and 1555-1234 and a@b.c", "en", "s0"),
      (4L, "end 555-1234. mail u@v.com.", "en", "s0"))         // punctuation IS a boundary
    val got = Curation.piiScrub(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_emails"), r.getAs[Int]("n_phones"),
          r.getAs[String]("redacted_md5"), r.getAs[Int]("redacted_len")))).toMap

    assert((got(1L)._1, got(1L)._2) == ((2, 0)))
    assert((got(2L)._1, got(2L)._2) == ((0, 2)))
    assert((got(3L)._1, got(3L)._2) == ((0, 0)), "boundary/TLD edge cases must NOT match")
    assert((got(4L)._1, got(4L)._2) == ((1, 1)))

    // the redaction itself, recomputed independently with Java's regex
    val texts = Map(
      1L -> "reach a@b.co or c.d-e@f.org now",
      2L -> "call 555-1234 or 555-9999 today",
      3L -> "x555-12345 and 1555-1234 and a@b.c",
      4L -> "end 555-1234. mail u@v.com.")
    texts.foreach { case (id, t) =>
      val red = t.replaceAll(EmailRe, "<EMAIL>").replaceAll(PhoneRe, "<PHONE>")
      assert(got(id)._3 == md5hex(red), s"doc $id redacted md5")
      assert(got(id)._4 == red.length, s"doc $id redacted length")
    }
  }

  test("withPii fixture shim: injection lands on exactly the 5/7 residue classes") {
    val rows = (1L to 35L).map(i => (i, toks(2), "en", "s0"))
    val out = Curation.piiScrub(Curation.withPii(docs(rows: _*))).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_emails"), r.getAs[Int]("n_phones")))
    out.foreach { case (id, e, p) =>
      assert(e == (if (id % 5 == 0) 1 else 0), s"doc $id email count")
      assert(p == (if (id % 7 == 0) 1 else 0), s"doc $id phone count")
    }
  }

  // ---------------------------------------------------------------
  // semdedup: min-id-wins prune
  // ---------------------------------------------------------------

  test("semdedupCellsFor: cell count tracks the corpus so per-cell work stays bounded") {
    assert(Curation.semdedupCellsFor(0L) == 1)
    assert(Curation.semdedupCellsFor(1L) == 1)
    assert(Curation.semdedupCellsFor(10000L) == 1)
    assert(Curation.semdedupCellsFor(10001L) == 2)
    assert(Curation.semdedupCellsFor(1000000L, targetCellSize = 100L) == 10000)
    // ceil division: per-cell size never exceeds the target
    (1L to 50L).foreach { n =>
      val k = Curation.semdedupCellsFor(n, targetCellSize = 7L)
      assert((n + k - 1) / k <= 7L, s"n=$n k=$k overfills cells")
    }
    // clamps instead of overflowing on absurd inputs
    assert(Curation.semdedupCellsFor(Long.MaxValue, 1L) == Int.MaxValue)
  }

  test("semdedupSurvivors: duplicate vector pruned (min id wins), dissimilar vectors survive") {
    import spark.implicits._
    def basis(axis: Int): Array[Float] =
      Array.tabulate(64)(d => if (d == axis) 1f else 0f)
    val e = Seq(
      (1L, basis(0), 0),
      (2L, basis(0), 0),  // identical to 1 → same cell, cosine 1.0 → pruned
      (3L, basis(5), 0))  // orthogonal → cosine 0 with both → survives
      .toDF("vec_id", "embedding", "label")
    val pairs = Curation.semdedupPairs(e, threshold = 0.4).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("score")))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)))
    assert(pairs.head._3 == 1.0)
    val surv = Curation.semdedupSurvivors(e, threshold = 0.4).collect()
      .map(_.getAs[Long]("vec_id")).sorted
    assert(surv.toSeq == Seq(1L, 3L))
  }

  /** A dense-blob corpus — the distribution that breaks off-data
    * centroids: every vector sits near e0 with a small deterministic
    * jitter, so all of them are nearest the single fixed centroid that
    * happens to fall closest to the blob. */
  private def blobEmbeddings(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      val v = Array.tabulate(64) { d =>
        val base = if (d == 0) 1.0 else 0.0
        (base + 0.1 * graft.ops.Similarity.md5Unit(s"jit:$i:$d")).toFloat
      }
      (i.toLong, v, 0)
    }.toDF("vec_id", "embedding", "label")
  }

  test("sampled centroids split a dense blob that fixed centroids leave quadratic") {
    import graft.ops.Similarity
    val n = 600
    val target = 50L
    val k = Curation.semdedupCellsFor(n.toLong, target)
    val prep = Similarity.prepared(blobEmbeddings(n))
    def candidates(centroids: Array[Array[Double]]): Long =
      Similarity.assignCells(prep, centroids)
        .groupBy(col("cell")).agg(count(lit(1)).as("occ"))
        .agg(sum(col("occ") * (col("occ") - 1)).cast("long")).collect()(0).getLong(0) / 2
    // off-data centroids: the whole blob lands in one cell — the
    // within-cell term is n²/2 no matter what k says (this is the
    // shape the embeddings scale tiers measured at 9% of the corpus
    // in one cell, SCALING.md beyond-the-knee table)
    val fixedCand = candidates(Similarity.fixedCentroids(k, 64))
    assert(fixedCand > n.toLong * n / 4,
      s"expected the blob to collapse into few fixed cells; candidates=$fixedCand")
    // sampled-from-the-data centroids sit inside the blob and split
    // it: candidate pairs stay within a small factor of the
    // n·target/2 linear budget the cell formula assumes
    val sampledCand = candidates(Similarity.sampledCentroids(prep, k))
    assert(sampledCand <= 4L * n * target / 2,
      s"sampled centroids left a hot cell: candidates=$sampledCand (budget ${n * target / 2})")
  }

  test("sampledCentroids: deterministic md5-ranked sample, k capped by corpus size") {
    import graft.ops.Similarity
    val prep = Similarity.prepared(blobEmbeddings(20))
    val c1 = Similarity.sampledCentroids(prep, 5)
    val c2 = Similarity.sampledCentroids(prep, 5)
    assert(c1.length == 5 && c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    // more cells than vectors: every vector becomes a centroid, no
    // padding, no failure (the oracle's WHERE rnk <= k does the same)
    assert(Similarity.sampledCentroids(prep, 100).length == 20)
  }

  test("semdedupPairs pins its reducer count — AQE cannot fold the exploding join to one task") {
    // The pair join's OUTPUT is quadratic in cell occupancy while its
    // map-side input is tiny; AQE coalescing sizes reducers on input
    // bytes, so without an explicit-N repartition it folds the whole
    // pair stage to one task (measured: one core 16+ min at the
    // 60k-vector tier). REPARTITION_BY_NUM is the shuffle origin AQE
    // must leave alone.
    val df = Curation.semdedupPairs(blobEmbeddings(200), threshold = 0.9, nCells = 4)
    df.write.mode("overwrite").format("noop").save()
    val plan = df.queryExecution.executedPlan.toString
    val n = spark.sessionState.conf.numShufflePartitions
    val exchange = s"hashpartitioning\\(cell#\\d+L?, $n\\), REPARTITION_BY_NUM".r
    assert(exchange.findFirstIn(plan).isDefined,
      s"expected an explicit-N repartition on cell feeding the pair join:\n$plan")
    assert(plan.contains("SortMergeJoin"),
      s"pair join must stay a shuffled merge join (no broadcast of the O(n) assignment):\n$plan")
  }

  // ---------------------------------------------------------------
  // tokenBudgetSelect: two-pass plan equals the naive prefix rule
  // ---------------------------------------------------------------

  /** Independent reference for the budget contract: a plain fold over
    * the (score desc, doc_id asc) total order keeping docs whose
    * exclusive running token total is under budget. */
  private def budgetRef(rows: Seq[(Long, Long, Long)], budget: Long): Set[Long] = {
    var acc = 0L
    val kept = Set.newBuilder[Long]
    for ((id, _, n) <- rows.sortBy { case (id, s, _) => (-s, id) }) {
      if (acc < budget) kept += id
      acc += n
    }
    kept.result()
  }

  test("tokenBudgetSelect: equals the fold reference and actually cuts inside a bin") {
    // Three score strata (token count determines the quality score for
    // same-shaped texts): several docs share each score, so some budget
    // must cut INSIDE a bin — the path the bin-prefix decomposition has
    // to get right.
    val d = docs((1L to 12L).map { id =>
      val n = if (id <= 4) 30 else if (id <= 9) 20 else 5
      (id, toks(n, s"d$id"), "en", "s0")
    }: _*)
    val scored = graft.ops.TextAnalysis.quality(d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("quality_score_bp"),
        r.getAs[Int]("n_tokens").toLong)).toSeq
    assert(scored.map(_._2).distinct.size == 3) // the planted strata hold
    for (budget <- Seq(0L, 1L, 45L, 100L, 170L, 185L, 10000L)) {
      val got = Curation.tokenBudgetSelect(d, budget).collect()
        .map(_.getAs[Long]("doc_id")).toSet
      assert(got == budgetRef(scored, budget), s"budget=$budget")
    }
    // Prove the boundary path ran for some budget: a score bin split
    // between kept and dropped docs.
    val kept170 = Curation.tokenBudgetSelect(d, 170L).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val byScore = scored.groupBy(_._2)
    assert(byScore.values.exists(bin =>
      bin.exists(r => kept170(r._1)) && bin.exists(r => !kept170(r._1))))
  }

  test("tokenBudgetSelect: exact bin-edge budget keeps whole bins and drops the rest") {
    val d = docs((1L to 6L).map { id =>
      val n = if (id <= 3) 10 else 4
      (id, toks(n, s"e$id"), "en", "s0")
    }: _*)
    // budget == the high-score stratum's exact token total: all of it
    // kept, none of the next bin (its prefix_before == budget).
    val highTotal = 30L
    val kept = Curation.tokenBudgetSelect(d, highTotal).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val scored = graft.ops.TextAnalysis.quality(d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("quality_score_bp"),
        r.getAs[Int]("n_tokens").toLong)).toSeq
    assert(kept == budgetRef(scored, highTotal))
    assert(Curation.tokenBudgetSelect(d, 0L).count() == 0)
  }

  test("tokenBudgetSelectByStratum: per-lang cuts match the per-lang fold reference") {
    // two langs, shared score strata, budgets that cut each lang at a
    // different depth; fr gets only the default budget
    val rows = (1L to 18L).map { id =>
      val lang = if (id % 3 == 0) "de" else if (id % 3 == 1) "en" else "fr"
      val n = if (id <= 9) 20 else 8
      (id, toks(n, s"s$id"), lang, "s0")
    }
    val d = docs(rows: _*)
    val budgets = Map("en" -> 50L, "de" -> 30L)
    val scored = graft.ops.TextAnalysis.quality(d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("quality_score_bp"),
        r.getAs[Int]("n_tokens").toLong)).toSeq
    val langOf = rows.map(r => r._1 -> r._3).toMap
    val expected = scored.groupBy(r => langOf(r._1)).flatMap { case (lang, rs) =>
      budgetRef(rs, budgets.getOrElse(lang, 7L))
    }.toSet
    val got = Curation.tokenBudgetSelectByStratum(d, budgets, defaultBudget = 7L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got == expected)
    // at least one stratum must have split a bin (mid-bin cut exercised)
    val gotByLang = got.groupBy(langOf)
    assert(gotByLang.nonEmpty && gotByLang.forall(_._2.nonEmpty))
  }

  test("tokenBudgetSelect: seeded random corpora match the fold reference at many budgets") {
    // Deterministic LCG so the "random" corpora are reproducible; token
    // counts 1..60 give colliding and unique score bins alike.
    var seed = 0x5DEECE66DL
    def next(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    for (round <- 1 to 3) {
      val nDocs = 15 + next(25)
      val rows = (1L to nDocs.toLong).map(id => (id, toks(1 + next(60), s"r${round}d$id"), "en", "s0"))
      val d = docs(rows: _*)
      val scored = graft.ops.TextAnalysis.quality(d).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("quality_score_bp"),
          r.getAs[Int]("n_tokens").toLong)).toSeq
      val total = scored.map(_._3).sum
      val budgets = Seq(0L, 1L, total / 4, total / 2, total - 1, total, total + 100)
        .distinct ++ Seq.fill(3)(next(total.toInt.max(1)).toLong)
      for (budget <- budgets) {
        val got = Curation.tokenBudgetSelect(d, budget).collect()
          .map(_.getAs[Long]("doc_id")).toSet
        assert(got == budgetRef(scored, budget), s"round=$round budget=$budget")
      }
    }
  }

  // ---------------------------------------------------------------
  // Export: shard partition properties + manifest integrity
  // ---------------------------------------------------------------

  test("shardAssignments: every doc exactly once, hash-determined shard, contiguous positions") {
    val d = docs((1L to 40L).map(id => (id, toks((id % 7).toInt + 1, s"x$id"), "en", "s0")): _*)
    val got = Export.shardAssignments(d, nShards = 4).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"), r.getAs[Int]("position")))
    assert(got.map(_._1).sorted.toSeq == (1L to 40L))
    got.foreach { case (id, shard, _) =>
      assert(shard == hashModRef(id, "shard", 4), s"doc $id")
    }
    got.groupBy(_._2).foreach { case (shard, rows) =>
      val byId = rows.sortBy(_._1)
      assert(byId.map(_._3).toSeq == (1 to rows.length), s"shard $shard positions")
    }
  }

  test("shardAssignments: membership is invariant to input partitioning") {
    val d = docs((1L to 25L).map(id => (id, toks(3, s"p$id"), "en", "s0")): _*)
    def assign(df: org.apache.spark.sql.DataFrame) =
      Export.shardAssignments(df, nShards = 5).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"), r.getAs[Int]("position")))
        .toSet
    assert(assign(d) == assign(d.repartition(7)))
  }

  test("writeShards: per-shard directories hold exactly the assigned docs, in doc_id order") {
    val d = docs((1L to 35L).map(id => (id, toks((id % 6).toInt + 1, s"w$id"), "en", "s0")): _*)
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    Export.writeShards(d, out, nShards = 4)
    val expected = Export.shardAssignments(d, nShards = 4).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard")))
      .groupBy(_._2).view.mapValues(_.map(_._1).sorted.toSeq).toMap
    expected.foreach { case (shard, ids) =>
      val got = spark.read.parquet(s"$out/shard=$shard")
        .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
      assert(got == ids, s"shard $shard content/order")
    }
    val total = spark.read.parquet(out).count()
    assert(total == 35L)
  }

  test("writeShardsJsonl: same placement and manifest as parquet, loader-readable lines") {
    val d = docs((1L to 30L).map(id => (id, toks((id % 4).toInt + 2, s"j$id"), "en", "s0")): _*)
    val out = java.nio.file.Files.createTempDirectory("jshards").toString
    Export.writeShardsJsonl(d, out, nShards = 3)
    // verifies against the SAME manifest as the parquet form
    val manifest = Export.shardManifest(d, nShards = 3)
    assert(Export.verifyShards(spark, out, manifest, format = "json").count() == 0)
    // rows round-trip: identical (doc_id, text, n_tokens) set
    val back = spark.read.json(out)
      .select(col("doc_id"), col("text"), col("n_tokens")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"), r.getAs[Long]("n_tokens")))
      .toSet
    val expected = d.select(col("doc_id"), col("text"),
        org.apache.spark.sql.functions.size(
          graft.ops.TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(back == expected)
    // and the files really are JSON lines a non-Spark loader can read
    val aShard = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard=")).head
    val firstLine = aShard.listFiles().filter(_.getName.endsWith(".json"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines().toSeq).head
    assert(firstLine.startsWith("{") && firstLine.contains("\"doc_id\""))
  }

  test("verifyShards: clean export verifies empty; a lost shard is reported") {
    val d = docs((1L to 30L).map(id => (id, toks((id % 4).toInt + 2, s"v$id"), "en", "s0")): _*)
    val out = java.nio.file.Files.createTempDirectory("vshards").toString
    Export.writeShards(d, out, nShards = 3)
    val manifest = Export.shardManifest(d, nShards = 3)
    assert(Export.verifyShards(spark, out, manifest).count() == 0,
      "a clean export must verify against its manifest")
    // lose a shard directory: the verifier must flag exactly that shard
    val lost = manifest.select(col("shard")).head.getLong(0)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(out, s"shard=$lost"))
    val bad = Export.verifyShards(spark, out, manifest).collect()
      .map(_.getAs[Long]("shard")).toSet
    assert(bad == Set(lost), s"expected the lost shard flagged: $bad")
  }

  test("shardManifest: totals and fingerprint agree with the assignments") {
    val d = docs((1L to 30L).map(id => (id, toks((id % 5).toInt + 2, s"m$id"), "en", "s0")): _*)
    val asg = Export.shardAssignments(d, nShards = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("n_tokens"), r.getAs[Long]("shard")))
    val man = Export.shardManifest(d, nShards = 3).collect()
      .map(r => r.getAs[Long]("shard") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
          r.getAs[Long]("min_doc_id"), r.getAs[Long]("max_doc_id"),
          r.getAs[Long]("ids_fp")))).toMap
    // the fingerprint contract, recomputed from scratch: XOR of each
    // id's 52-bit md5 slice — order-independent by commutativity
    def docH(id: Long): Long =
      java.lang.Long.parseLong(md5hex(id.toString).substring(0, 13), 16)
    val byShard = asg.groupBy(_._3)
    assert(man.keySet == byShard.keySet)
    byShard.foreach { case (shard, rows) =>
      val ids = rows.map(_._1).sorted
      val (nDocs, total, minId, maxId, idsFp) = man(shard)
      assert(nDocs == rows.length.toLong)
      assert(total == rows.map(_._2.toLong).sum)
      assert(minId == ids.head && maxId == ids.last)
      assert(idsFp == ids.map(docH).reduce(_ ^ _), s"shard $shard fingerprint")
    }
  }

  test("DSIR importance: identical target/raw scores 0 everywhere; an English target ranks English up") {
    import graft.ops.Curation
    val docs = graft.tables.Fixtures.documents(spark, "/root/testdata/sf0.001")
    // invariant 1: target == raw → p_ppm == q_ppm bucket for bucket →
    // every log-ratio term is 0 and every document scores exactly 0
    val pool = Curation.dsirBucketPpm(docs)
    val self = Curation.importanceWeights(docs, pool, pool).collect()
    assert(self.nonEmpty && self.forall(_.getAs[Long]("dsir_score") == 0L),
      "importance against the corpus's own distribution must be identically 0")
    // invariant 2: the distribution table is exactly dim rows and
    // smoothed ppm mass ~ 1e6 (floor losses only)
    val ppm = pool.collect()
    assert(ppm.length == 1024)
    val mass = ppm.map(_.getAs[Long]("ppm")).sum
    assert(mass > 900000L && mass <= 1000000L, s"smoothed ppm mass $mass")
    // validity: with the English slice as target, English documents
    // must outscore the non-Latin slice on average — the signal DSIR
    // actually selects on (language here is a stand-in for any
    // target-vs-pool distribution shift)
    val scored = Curation.importanceWeights(docs,
        Curation.dsirBucketPpm(docs.filter(col("lang") === "en")), pool)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("dsir_score"))
    def mean(l: String) = { val v = scored.filter(_._1 == l).map(_._2); v.sum.toDouble / v.length }
    assert(mean("en") > mean("zh"),
      s"en mean ${mean("en")} must exceed zh mean ${mean("zh")} under an en target")
    // the resample step keeps the top-N by (score desc, id): verify
    // against an independent sort of the full weight set
    val full = Curation.importanceWeights(docs,
        Curation.dsirBucketPpm(docs.filter(col("lang") === "en")), pool)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dsir_score")))
    val expectIds = full.sortBy { case (id, s) => (-s, id) }.take(50).map(_._1).toSet
    val got = Curation.importanceResample(docs,
        Curation.dsirBucketPpm(docs.filter(col("lang") === "en")), pool, topN = 50)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got == expectIds, "resample must keep exactly the top-N by (score, id)")
    // the per-row streaming form over the collected literal maps is
    // bit-identical to the batch groupBy score (addition commutes)
    val (pm, qm) = Curation.dsirModelLiterals(
      Curation.dsirBucketPpm(docs.filter(col("lang") === "en")), pool)
    val perRow = docs.select(col("doc_id"),
        Curation.dsirScorePerRow(col("text"), pm, qm).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perRow == full.toMap,
      "dsirScorePerRow must reproduce importanceWeights' dsir_score exactly")
  }

  test("dsirScorePerRow rejects ppm tables that do not cover every bucket " +
      "(a truncated table must fail loudly, not null every score)") {
    val full = (0L until 1024L).map(_ -> 1000L).toMap
    val truncated = full - 7L
    val e = intercept[IllegalArgumentException] {
      Curation.dsirScorePerRow(col("text"), truncated, full)
    }
    assert(e.getMessage.contains("target ppm"))
    intercept[IllegalArgumentException] {
      Curation.dsirScorePerRow(col("text"), full, truncated)
    }
    // a re-keyed table of the right SIZE but wrong bucket ids is just
    // as poisonous — coverage is by key set, not cardinality
    val shifted = (1L until 1025L).map(_ -> 1000L).toMap
    intercept[IllegalArgumentException] {
      Curation.dsirScorePerRow(col("text"), shifted, full)
    }
  }
}
