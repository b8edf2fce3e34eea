package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, TextAnalysis}

/** Semantics of the sub-document curation operators (boilerplate
  * segment removal, duplicated substring spans, hashed linear
  * classifier) on handcrafted inputs — the planted cases the DuckDB
  * differential check can't express intent for. */
class SpanOpsSpec extends AnyFunSuite with SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", s"src${id % 2}", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  private val md5Of: String => String = s =>
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Scala brute-force ground truth for [[Dedup.duplicatedSpans]]:
    * owner sets per L-gram, then island-merge of duplicated positions
    * (consecutive hits more than L apart start a new span). */
  private def bruteSpans(corpus: Map[Long, Array[String]], L: Int): Set[(Long, Long, Long, Long, Long)] = {
    val owners = scala.collection.mutable.Map[String, scala.collection.mutable.Set[Long]]()
    for ((id, t) <- corpus; i <- 0 to t.length - L)
      owners.getOrElseUpdate(t.slice(i, i + L).mkString(" "),
        scala.collection.mutable.Set()) += id
    corpus.toSeq.flatMap { case (id, t) =>
      val hits = (0 to t.length - L)
        .filter(i => owners(t.slice(i, i + L).mkString(" ")).size >= 2)
      val islands = hits.foldLeft(List.empty[List[Int]]) {
        case (Nil, p) => List(List(p))
        case (cur :: done, p) =>
          if (p - cur.head > L) List(p) :: cur :: done else (p :: cur) :: done
      }.map(_.reverse).reverse
      islands.map(is => (id, is.head.toLong, (is.last + L - 1).toLong,
        (is.last + L - is.head).toLong, is.size.toLong))
    }.toSet
  }

  test("segmentRows: non-overlapping k-token windows, short tail kept") {
    val d = docs(1L -> "a b c d e f g")   // 7 tokens, k=3 -> "a b c","d e f","g"
    val segs = TextAnalysis.segmentRows(d, segTokens = 3).collect()
      .map(r => r.getAs[Int]("seg_idx") -> r.getAs[String]("seg")).sortBy(_._1)
    assert(segs.toSeq == Seq(0 -> "a b c", 1 -> "d e f", 2 -> "g"))
  }

  test("boilerplateSegments flags a segment recurring in >= minDocs distinct docs") {
    val banner = "accept all cookies now please"        // 5 tokens = 1 segment
    val d = docs(
      1L -> s"$banner ${words("a", 10)}",
      2L -> s"$banner ${words("b", 10)}",
      3L -> s"$banner ${words("c", 10)}",
      4L -> words("d", 15))
    val bp = TextAnalysis.boilerplateSegments(d, segTokens = 5, minDocs = 3).collect()
    assert(bp.length == 1)
    assert(bp.head.getAs[String]("seg") == banner)
    assert(bp.head.getAs[Long]("n_docs") == 3L)
    assert(bp.head.getAs[Long]("n_hits") == 3L)
  }

  test("scrubBoilerplate removes only the recurring segment; untouched docs keep their text md5") {
    val banner = "accept all cookies now please"
    val tail1 = words("a", 10)
    val d = docs(
      1L -> s"$banner $tail1",
      2L -> s"$banner ${words("b", 10)}",
      3L -> s"$banner ${words("c", 10)}",
      4L -> words("d", 15))
    val out = TextAnalysis.scrubBoilerplate(d, segTokens = 5, minDocs = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_md5"), r.getAs[Long]("n_segs"), r.getAs[Long]("n_removed"))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    // doc 1: banner segment dropped, the two 5-token tail segments remain
    val md5Of: String => String = s =>
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(out(1L) == ((md5Of(tail1), 3L, 1L)))
    // doc 4 has no boilerplate: reconstruction == original text
    assert(out(4L) == ((md5Of(words("d", 15)), 3L, 0L)))
  }

  test("newline segmenter: a recurring LINE is flagged and scrubbed, rebuilt with newlines") {
    val banner = "accept all cookies"
    val d = docs(
      1L -> s"$banner\nunique line one\nanother line",
      2L -> s"$banner\ndifferent body here",
      3L -> s"$banner\nthird doc text",
      4L -> "no banner at all\njust content")
    val segs = TextAnalysis.lineSegmentRows(d)
    val bp = TextAnalysis.boilerplateSegments(d, minDocs = 3, segments = Some(segs))
      .collect()
    assert(bp.length == 1 && bp.head.getAs[String]("seg") == banner)
    val md5Of: String => String = s =>
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val out = TextAnalysis.scrubBoilerplate(d, minDocs = 3,
      segments = Some(segs), joinWith = "\n").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_md5"), r.getAs[Long]("n_segs"), r.getAs[Long]("n_removed"))))
      .toMap
    assert(out(1L) == ((md5Of("unique line one\nanother line"), 3L, 1L)))
    assert(out(4L) == ((md5Of("no banner at all\njust content"), 2L, 0L)))
  }

  test("fully-boilerplate doc survives as an empty-text row") {
    val banner = "accept all cookies now please"
    val d = docs(1L -> banner, 2L -> banner, 3L -> banner)
    val out = TextAnalysis.scrubBoilerplate(d, segTokens = 5, minDocs = 3).collect()
    assert(out.length == 3)
    val empty = java.security.MessageDigest.getInstance("MD5").digest("".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out.forall(_.getAs[String]("clean_md5") == empty))
    assert(out.forall(_.getAs[Long]("n_removed") == 1L))
  }

  test("duplicatedSpans finds a copied run inside otherwise-unique docs, merged to one span") {
    val copied = words("c", 20)                         // 20-token copied run
    val d = docs(
      1L -> s"${words("a", 15)} $copied ${words("x", 12)}",
      2L -> s"${words("b", 9)} $copied ${words("y", 7)}",
      3L -> words("z", 40))
    val spans = Dedup.duplicatedSpans(d, spanTokens = 8, minDocs = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("span_tokens")))
      .sortBy(_._1)
    // one maximal span per doc covering exactly the copied run
    assert(spans.toSeq == Seq(
      (1L, 15L, 34L, 20L),
      (2L, 9L, 28L, 20L)))
  }

  test("duplicatedSpans: hits farther apart than L stay separate spans") {
    val runA = words("p", 10)
    val runB = words("q", 10)
    val d = docs(
      1L -> s"$runA ${words("m", 20)} $runB",
      2L -> s"$runA ${words("n", 20)} $runB")
    val spans = Dedup.duplicatedSpans(d, spanTokens = 8, minDocs = 2).collect()
    assert(spans.count(_.getAs[Long]("doc_id") == 1L) == 2,
      "two separated copied runs must not merge across the unique gap")
  }

  test("incrementalDuplicatedSpans: fresh-only spans, corpus-internal dups invisible, full-op parity") {
    val copied = words("c", 15)
    val corpusRun = words("k", 15)
    val corpus = docs(
      1L -> s"${words("a", 10)} $copied",
      6L -> s"$corpusRun ${words("m", 10)}",   // corpus-internal dup pair:
      11L -> s"$corpusRun ${words("n", 10)}")  // settled, must NOT be reported
    val fresh = docs(
      5L -> s"${words("f", 5)} $copied ${words("g", 5)}", // duplicates corpus doc 1
      10L -> words("u", 30))                              // novel
    val got = Dedup.incrementalDuplicatedSpans(corpus, fresh, spanTokens = 8)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_tokens"))).toSet
    assert(got == Set((5L, 5L, 15L)),
      s"only the fresh doc's copied run may be reported: $got")
    // parity: the full operator over corpus ∪ fresh, restricted to
    // fresh docs, is the same answer (disjoint doc sets → count sum
    // == union distinct count)
    val full = Dedup.duplicatedSpans(corpus.unionByName(fresh), spanTokens = 8)
      .filter(org.apache.spark.sql.functions.col("doc_id").isin(5L, 10L))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_tokens"))).toSet
    assert(full == got)
    // and the stored-counts path is the same plan fed from a table
    val counts = Dedup.positionedShingleRows(corpus, 8)
      .groupBy(org.apache.spark.sql.functions.col("h"))
      .agg(org.apache.spark.sql.functions.countDistinct(
        org.apache.spark.sql.functions.col("doc_id")).as("n_corpus"))
    val stored = Dedup.incrementalDuplicatedSpans(corpus, fresh, spanTokens = 8,
      corpusShingleCounts = Some(counts))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_tokens"))).toSet
    assert(stored == got)
  }

  test("scrubSpans cuts exactly the duplicated run; span-less docs keep their text md5") {
    val copied = words("c", 20)
    val tail1 = words("a", 15)
    val head1 = words("x", 12)
    val d = docs(
      1L -> s"$tail1 $copied $head1",
      2L -> s"${words("b", 9)} $copied ${words("y", 7)}",
      3L -> words("z", 40))
    val md5Of: String => String = s =>
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val out = Dedup.scrubSpans(d, spanTokens = 8, minDocs = 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_md5"), r.getAs[Long]("n_tokens"), r.getAs[Long]("n_cut_tokens"))))
      .toMap
    assert(out(1L) == ((md5Of(s"$tail1 $head1"), 47L, 20L)))
    assert(out(3L) == ((md5Of(words("z", 40)), 40L, 0L)), "span-less doc must pass through")
  }

  test("classifierScoreWeighted with the md5 weight table reproduces classifierScore exactly") {
    val d = docs(
      1L -> words("alpha", 12),
      2L -> "the quick brown fox jumps over the lazy dog",
      3L -> words("zeta", 30))
    val direct = TextAnalysis.classifierScore(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("feat_sum"), r.getAs[Boolean]("keep")))).toMap
    val weighted = TextAnalysis.classifierScoreWeighted(d,
      TextAnalysis.classifierWeightsRef(d)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("feat_sum"), r.getAs[Boolean]("keep")))).toMap
    assert(direct == weighted)
  }

  test("trained NB classifier separates planted junk the md5 stand-in cannot") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 40 docs in interleaved blocks of 4 so BOTH classes appear in the
    // training half (even doc_ids) and the held-out half (odd):
    // i%4<2 → quality docs (lang=en, 'alpha…' vocabulary), else junk
    // (lang=xx, 'zork…' vocabulary). Per-doc salt tokens make each
    // text distinct, so the stand-in can't luck into a constant answer.
    val rows = (0L until 40L).map { i =>
      val pos = i % 4 < 2
      val text =
        if (pos) s"alpha beta gamma delta alpha beta gamma delta e$i"
        else s"zork grue smog blat zork grue smog blat j$i"
      (i, text, if (pos) "en" else "xx", "s", text.length.toLong)
    }
    val d = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val labels = rows.map { case (i, _, lang, _, _) => i -> (lang == "en") }.toMap
    val heldOut = labels.keySet.filter(_ % 2 == 1)
    def keeps(df: org.apache.spark.sql.DataFrame): Map[Long, Boolean] =
      df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    // trained on the even half only, the NB log-odds must classify
    // every UNSEEN odd doc by its vocabulary — including the unseen
    // salt tokens, which Laplace smoothing scores neutrally
    val trained = keeps(TextAnalysis.classifierScoreWeighted(d,
      TextAnalysis.classifierTrainNb(d, col("lang") === "en")))
    heldOut.foreach { i =>
      assert(trained(i) == labels(i),
        s"trained classifier misclassified held-out doc $i (${labels(i)})")
    }
    // the md5 stand-in has never seen a label — its keep bit is a
    // deterministic hash artifact, and on 20 held-out docs it cannot
    // match the planted ground truth everywhere
    val standIn = keeps(TextAnalysis.classifierScore(d))
    assert(heldOut.exists(i => standIn(i) != labels(i)),
      "the label-blind stand-in should not separate the planted classes")
    // the classifier_eval FLOOR on planted separation: the registry
    // entry's confusion aggregation (keep vs lang='en'), run over the
    // held-out half of this separable corpus, must score a perfect
    // 10000 bp — the fixture corpus's low holdout accuracy is a
    // property of its synthetic text, not of the eval machinery, and
    // this floor is what pins the machinery itself
    import org.apache.spark.sql.functions.{count => fcount, lit, sum, when, expr}
    val evalRow = TextAnalysis.classifierScoreWeighted(d,
        TextAnalysis.classifierTrainNb(d, col("lang") === "en"))
      .join(d.select(col("doc_id"), (col("lang") === "en").as("pos")), "doc_id")
      .filter(col("doc_id") % 2 === 1)
      .agg(
        sum(when(col("keep") && col("pos"), 1L).otherwise(0L)).as("tp"),
        sum(when(!col("keep") && !col("pos"), 1L).otherwise(0L)).as("tn"),
        fcount(lit(1)).as("n"))
      .withColumn("accuracy_bp", expr("(tp + tn) * 10000 div n"))
      .collect()(0)
    assert(evalRow.getAs[Long]("n") == 20L &&
      evalRow.getAs[Long]("accuracy_bp") == 10000L,
      s"planted separation floor: $evalRow")
  }

  test("classifierFeatSum (streaming per-row form) matches classifierScore bit-for-bit") {
    val d = docs(
      1L -> words("alpha", 25),
      2L -> "the quick brown fox jumps over the lazy dog",
      3L -> words("mix", 40))
    val batch = TextAnalysis.classifierScore(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("feat_sum")).toMap
    val perRow = d.select(org.apache.spark.sql.functions.col("doc_id"),
      TextAnalysis.classifierFeatSum(org.apache.spark.sql.functions.col("text")).as("fs"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fs")).toMap
    assert(batch == perRow)
  }

  test("differential: random corpora match Scala brute-force spans, boilerplate, classifier") {
    val md5Hex = md5Of

    def bruteClassifier(t: Array[String]): Long =
      t.map { tok =>
        val bucket = java.lang.Long.parseLong(md5Hex(s"feat:$tok").take(8), 16) % 1024
        java.lang.Long.parseLong(md5Hex(s"w:$bucket").take(8), 16) - 2147483648L
      }.sum

    for (seed <- Seq(7, 21, 1009)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Array("aa", "bb", "cc", "dd", "ee")
      // random docs plus planted copied runs so long spans exist
      val run = Array.fill(12)(vocab(rnd.nextInt(vocab.length)))
      val corpus: Map[Long, Array[String]] = (0L until 40L).map { id =>
        val body = Array.fill(20 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.length)))
        val t = if (id % 7 == 0) body.take(10) ++ run ++ body.drop(10) else body
        id -> t
      }.toMap
      val d = docs(corpus.toSeq.sortBy(_._1).map { case (id, t) => id -> t.mkString(" ") }: _*)

      val L = 4
      val gotSpans = Dedup.duplicatedSpans(d, spanTokens = L, minDocs = 2).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
          r.getAs[Long]("span_end"), r.getAs[Long]("span_tokens"),
          r.getAs[Long]("n_dup_shingles"))).toSet
      assert(gotSpans == bruteSpans(corpus, L), s"span mismatch at seed $seed")
      // invariants: spans inside doc bounds, strictly separated
      gotSpans.groupBy(_._1).foreach { case (id, spans) =>
        val sorted = spans.toSeq.sortBy(_._2)
        sorted.foreach { case (_, s, e, w, _) =>
          assert(s >= 0 && e < corpus(id).length && w == e - s + 1)
        }
        sorted.sliding(2).foreach {
          case Seq((_, _, e1, _, _), (_, s2, _, _, _)) => assert(s2 > e1)
          case _ =>
        }
      }

      val gotCls = TextAnalysis.classifierScore(d).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("feat_sum")).toMap
      assert(gotCls == corpus.map { case (id, t) => id -> bruteClassifier(t) },
        s"classifier mismatch at seed $seed")

      // boilerplate: brute segment recurrence count (k-token windows,
      // tail kept) matches the operator's flagged set
      val k = 3
      val segOwners = scala.collection.mutable.Map[String, scala.collection.mutable.Set[Long]]()
      for ((id, t) <- corpus; g <- t.grouped(k).zipWithIndex)
        segOwners.getOrElseUpdate(g._1.mkString(" "),
          scala.collection.mutable.Set()) += id
      val expectBp = segOwners.filter(_._2.size >= 3).keySet.map(md5Hex)
      val gotBp = TextAnalysis.boilerplateSegments(d, segTokens = k, minDocs = 3)
        .collect().map(_.getAs[String]("seg_hash")).toSet
      assert(gotBp == expectBp, s"boilerplate mismatch at seed $seed")
    }
  }

  test("duplicatedSpans island merges at adversarial widths L in {2, 8, 32}") {
    for (l <- Seq(2, 8, 32)) {
      // planted structure per width: ADJACENT copied runs that must
      // merge into one span (doc 1), a gap just over L that must NOT
      // merge (doc 2), a gap of exactly L that MUST merge (doc 3, the
      // boundary case), and a copy OVERLAPPING doc 1's run junction
      // (doc 4) so duplicated shingles straddle the runA/runB seam.
      // Scala brute force is ground truth for all of it.
      val runA = Array.tabulate(l + 4)(i => s"a$i")
      val runB = Array.tabulate(l + 4)(i => s"b$i")
      val runC = Array.tabulate(l)(i => s"c$i") // minimal run: exactly one shingle
      def fill(p: String, n: Int) = Array.tabulate(n)(i => s"$p$i")
      val corpus: Map[Long, Array[String]] = Map(
        1L -> (fill("u", l + 3) ++ runA ++ runB ++ fill("v", 5)),
        2L -> (fill("w", 4) ++ runA ++ fill("x", l + 1) ++ runC),
        3L -> (runB ++ fill("y", l) ++ runC),
        4L -> (runA.drop(2) ++ runB.take(2) ++ fill("z", 6)),
        5L -> fill("q", l + 10))
      val d = docs(corpus.toSeq.sortBy(_._1)
        .map { case (id, t) => id -> t.mkString(" ") }: _*)
      val got = Dedup.duplicatedSpans(d, spanTokens = l, minDocs = 2).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
          r.getAs[Long]("span_end"), r.getAs[Long]("span_tokens"),
          r.getAs[Long]("n_dup_shingles"))).toSet
      assert(got == bruteSpans(corpus, l), s"span mismatch at L=$l")
      // invariants survive the adversarial layout: in-bounds, merged
      // spans strictly separated by more than the merge distance
      got.groupBy(_._1).foreach { case (id, spans) =>
        val sorted = spans.toSeq.sortBy(_._2)
        sorted.foreach { case (_, s, e, w, _) =>
          assert(s >= 0 && e < corpus(id).length && w == e - s + 1, s"L=$l doc=$id")
        }
        sorted.sliding(2).foreach {
          case Seq((_, _, e1, _, _), (_, s2, _, _, _)) => assert(s2 > e1, s"L=$l doc=$id")
          case _ =>
        }
      }
    }
  }

  test("scrubBoilerplate through the forced shuffle-join plan (no broadcast) matches the default plan") {
    val banner = "accept all cookies now please"
    val d = docs(
      1L -> s"$banner ${words("a", 10)}",
      2L -> s"$banner ${words("b", 10)}",
      3L -> s"$banner ${words("c", 10)}",
      4L -> words("d", 15))
    def snapshot() = TextAnalysis.scrubBoilerplate(d, segTokens = 5, minDocs = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("clean_md5"),
        r.getAs[Long]("n_segs"), r.getAs[Long]("n_removed"))).toSet
    val default = snapshot()
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // the 100 TB case: the recurring-segment table exceeds every
      // broadcast bound, so the anti-join must degrade to a shuffled
      // join — same answer, no driver-side collect of the table
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = TextAnalysis.scrubBoilerplate(d, segTokens = 5, minDocs = 3)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"scrub must not hard-hint a broadcast:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffled anti-join in the forced plan:\n$plan")
      assert(df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("clean_md5"),
        r.getAs[Long]("n_segs"), r.getAs[Long]("n_removed"))).toSet == default)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
    }
  }

  test("null text coalesces to '' in the segment/span operators (the oracle's rule)") {
    import spark.implicits._
    val d = Seq((1L, Option(words("n", 12))), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    // segmenter: null -> one empty segment, same as DuckDB's
    // string_split(coalesce(text,''), ' ')
    val segs = TextAnalysis.segmentRows(d, segTokens = 5)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 2L).collect()
    assert(segs.map(r => (r.getAs[Int]("seg_idx"), r.getAs[String]("seg"))).toSeq
      == Seq((0, "")))
    val scrub = TextAnalysis.scrubBoilerplate(d, segTokens = 5, minDocs = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_md5"), r.getAs[Long]("n_segs"), r.getAs[Long]("n_removed"))))
      .toMap
    assert(scrub(2L) == ((md5Of(""), 1L, 0L)))
    // span shingler: '' is shorter than any window -> no rows, and the
    // apply step reports the one coalesced token, zero cut
    assert(Dedup.positionedShingleRows(d, 8)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 2L).count() == 0L)
    val spansApply = Dedup.scrubSpans(d, spanTokens = 8, minDocs = 2).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_md5"), r.getAs[Long]("n_tokens"), r.getAs[Long]("n_cut_tokens"))))
      .toMap
    assert(spansApply(2L) == ((md5Of(""), 1L, 0L)))
    // line segmenter: null -> one empty line
    assert(TextAnalysis.lineSegmentRows(d)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 2L).collect()
      .map(r => (r.getAs[Int]("seg_idx"), r.getAs[String]("seg"))).toSeq == Seq((0, "")))
  }

  test("classifierScore is deterministic, exact, and n_tokens-complete") {
    val d = docs(1L -> "alpha beta gamma", 2L -> "alpha beta gamma", 3L -> "delta")
    val out = TextAnalysis.classifierScore(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("feat_sum"), r.getAs[Boolean]("keep"))))
      .toMap
    assert(out(1L) == out(2L), "identical text must score identically")
    assert(out(1L)._1 == 3L && out(3L)._1 == 1L)
    // exact integer reference for one token, computed independently:
    // bucket = int(md5('feat:delta')[:8], 16) % 1024
    // weight = int(md5('w:'+bucket)[:8], 16) - 2^31
    val md5Hex: String => String = s =>
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val bucket = java.lang.Long.parseLong(md5Hex("feat:delta").take(8), 16) % 1024
    val weight = java.lang.Long.parseLong(md5Hex(s"w:$bucket").take(8), 16) - 2147483648L
    assert(out(3L)._2 == weight)
    assert(out(3L)._3 == (weight >= 0))
  }
}
