package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{AnnIndex, Similarity}
import graft.tables.{Bucketed, Fixtures}

/** Pins the persisted-ANN-index claims in [[graft.ops.AnnIndex]]:
  * the probe result is identical to the inline IVF pipeline, and the
  * index scan is bucket-pruned — only the probed cells' buckets are
  * read, which is the property that makes the serving shape
  * O(nProbe/cells) of the corpus at scale.
  */
class AnnIndexSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("annCellsFor: integer-exact ceil-sqrt, corpus-tracked, capped") {
    assert(AnnIndex.annCellsFor(0L) == 1)
    assert(AnnIndex.annCellsFor(1L) == 1)
    assert(AnnIndex.annCellsFor(2L) == 2)
    assert(AnnIndex.annCellsFor(4L) == 2)
    assert(AnnIndex.annCellsFor(5L) == 3)
    assert(AnnIndex.annCellsFor(2000L) == 45)
    assert(AnnIndex.annCellsFor(65535L * 65535L) == 65535)
    assert(AnnIndex.annCellsFor(Long.MaxValue) == 65535)
  }

  test("probe over the persisted index == inline IVF probe (same corpus-derived quantizer)") {
    // also cross-checks AnnIndex's driver-side probe-cell arithmetic
    // against probeQueries' DataFrame formulation — the two must rank
    // (score, cell) identically
    Bucketed.resetTable(spark, AnnIndex.tableFor(sf))
    val indexed = AnnIndex.topK(spark, sf, maxQueryId = 8, k = 5, nProbe = 2)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val emb = Fixtures.embeddings(spark, sf)
    val kc = AnnIndex.annCellsFor(emb.count())
    val cs = Similarity.sampledCentroids(Similarity.prepared(emb), kc)
    val inline = Similarity.topKIvfKmeans(emb,
        maxQueryId = 8, k = 5, nCells = kc, nProbe = 2, centroids = Some(cs))
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(indexed.nonEmpty && indexed == inline,
      "persisting the assignment must be a pure physical optimization")
  }

  test("the index scan reads only the probed buckets (SelectedBucketsCount)") {
    AnnIndex.ensureBuilt(spark, sf)
    // two queries probe at most 4 of the corpus-scaled cells — pruning
    // must show
    val kc = AnnIndex.annCellsFor(Fixtures.embeddings(spark, sf).count())
    val plan = AnnIndex.topK(spark, sf, maxQueryId = 2, k = 5, nProbe = 2)
      .queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"expected a bucket-pruned scan:\n$plan")
    val (selected, total) = (m.get.group(1).toInt, m.get.group(2).toInt)
    assert(total == kc && selected <= 4,
      s"expected <=4 of $total buckets read, got $selected")
  }

  test("probes stay coherent with the stored quantizer after the corpus grows past the build") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("ann-drift").toString
    val embDir = Paths.get(dir, "embeddings.parquet")
    Files.createDirectories(embDir)
    Files.copy(Paths.get(sf, "embeddings.parquet"),
      embDir.resolve("part-00000.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val before = AnnIndex.topK(spark, dir, maxQueryId = 5, k = 4, nProbe = 2)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(before.nonEmpty)
    // the corpus grows past the next cell knee: a live re-derivation
    // would use a DIFFERENT k and centroid sample than the build did —
    // the stored quantizer must keep probes coherent with the stored
    // assignment (the index is a snapshot; new vectors join at rebuild)
    val staging = Files.createTempDirectory("ann-drift-extra").toString
    Fixtures.embeddings(spark, dir)
      .withColumn("vec_id", col("vec_id") + 100000L)
      .write.mode("overwrite").parquet(staging)
    Files.list(Paths.get(staging)).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .zipWithIndex.foreach { case (p, i) =>
        Files.copy(p, embDir.resolve(f"part-grown-$i%05d.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
      }
    val grown = Fixtures.embeddings(spark, dir).count()
    assert(AnnIndex.annCellsFor(grown) !=
      AnnIndex.annCellsFor(grown / 2),
      "sanity: the growth actually crosses a cell knee")
    val after = AnnIndex.topK(spark, dir, maxQueryId = 5, k = 4, nProbe = 2)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(after == before,
      "a grown corpus must not decohere probes from the stored index")
  }

  /** A throwaway corpus dir seeded from the sf0.001 embeddings, so
    * index-mutation tests never touch the shared fixture's index. */
  private def tempCorpus(tag: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory(s"ann-$tag").toString
    val embDir = Paths.get(dir, "embeddings.parquet")
    Files.createDirectories(embDir)
    Files.copy(Paths.get(sf, "embeddings.parquet"),
      embDir.resolve("part-00000.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  test("stored-artifact session cache: one collect per generation, invalidated by requantize") {
    val dir = tempCorpus("artcache")
    AnnIndex.ensureBuilt(spark, dir, tag = "ac")
    // a re-read inside one generation is the CACHED driver-side array
    // (reference identity = no second collect job ran)
    val q1 = AnnIndex.storedQuantizer(spark, dir, tag = "ac")
    assert(AnnIndex.storedQuantizer(spark, dir, tag = "ac") eq q1,
      "same generation must serve the cached quantizer instance")
    val sq1 = AnnIndex.storedSqParams(spark, dir, tag = "ac")
    assert(AnnIndex.storedSqParams(spark, dir, tag = "ac") eq sq1)
    val pq1 = AnnIndex.storedPqCodebook(spark, dir, tag = "ac")
    assert(AnnIndex.storedPqCodebook(spark, dir, tag = "ac") eq pq1)
    // a generation swap must drop every cached artifact: after a
    // knee-crossing requantize the quantizer is re-sized, and the
    // re-read must reflect the NEW stored table, not the old array
    val emb = Fixtures.embeddings(spark, dir)
    (1 to 4).foreach(r => AnnIndex.appendBatch(spark, dir,
      emb.withColumn("vec_id", col("vec_id") + lit(r * 100000L)), tag = "ac"))
    AnnIndex.requantize(spark, dir, tag = "ac")
    val q2 = AnnIndex.storedQuantizer(spark, dir, tag = "ac")
    assert(!(q2 eq q1) && q2.length > q1.length,
      s"requantize must invalidate the cached quantizer (${q1.length} -> ${q2.length})")
    assert(q2.length == spark.table(AnnIndex.quantizerTableFor(dir, "ac")).count(),
      "the re-read must match the stored table of the new generation")
  }

  test("appendBatch: stored-quantizer assignment, probes coherent, buckets still pruned") {
    val dir = tempCorpus("append")
    AnnIndex.ensureBuilt(spark, dir)
    val cs = AnnIndex.storedQuantizer(spark, dir)
    val before = spark.table(AnnIndex.tableFor(dir)).count()
    // the batch clones existing vectors under fresh ids: each clone
    // lands in ITS original's cell (same vector, same stored quantizer
    // => same assignment), so a query must now find its own clone at
    // cosine 1.0 — appended vectors are provably SERVED, not just rows
    val emb = Fixtures.embeddings(spark, dir)
    AnnIndex.appendBatch(spark, dir,
      emb.withColumn("vec_id", col("vec_id") + 500000L))
    assert(spark.table(AnnIndex.tableFor(dir)).count() == before * 2)
    val probed = AnnIndex.topK(spark, dir, maxQueryId = 5, k = 4, nProbe = 2)
    val plan = probed.queryExecution.executedPlan.toString
    assert("SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan).isDefined,
      s"append must keep the scan bucket-pruned:\n$plan")
    val rows = probed.orderBy(col("q_id"), col("rn")).collect()
    (0L until 5L).foreach { q =>
      val top = rows.filter(_.getAs[Long]("q_id") == q).minBy(_.getAs[Int]("rn"))
      assert(top.getAs[Long]("vec_id") == q + 500000L &&
        top.getAs[Double]("score") == 1.0,
        s"query $q must find its appended clone at cosine 1.0, got $top")
    }
    // and the appended index is exactly what assigning (corpus ∪
    // batch) against the stored quantizer would build — the append is
    // a pure physical optimization, like the build itself
    val unionAssigned = Similarity.assignCells(
        Similarity.prepared(emb.union(emb.withColumn("vec_id", col("vec_id") + 500000L))), cs)
      .select(col("vec_id"), col("cell"))
      .orderBy(col("vec_id")).collect().toSeq
    val stored = spark.table(AnnIndex.tableFor(dir))
      .select(col("vec_id"), col("cell"))
      .orderBy(col("vec_id")).collect().toSeq
    assert(stored == unionAssigned,
      "appended assignment must match the inline stored-quantizer assignment")
  }

  test("requantizeAdvice: fresh build clean; knee fires on 5x growth; skew fires on a hot cell") {
    val dir = tempCorpus("advice")
    AnnIndex.ensureBuilt(spark, dir)
    val fresh0 = AnnIndex.requantizeAdvice(spark, dir)
    assert(!fresh0.needed, s"a just-built index must not advise a rebuild: $fresh0")
    // 4 appended replicas => n = 5 * n0; annCellsFor(2500) = 50 > 2*23
    val emb = Fixtures.embeddings(spark, dir)
    (1 to 4).foreach(r => AnnIndex.appendBatch(spark, dir,
      emb.withColumn("vec_id", col("vec_id") + lit(r * 100000L))))
    val grown = AnnIndex.requantizeAdvice(spark, dir)
    assert(grown.knee && grown.needed,
      s"a corpus past 4x the build size must advise re-quantize: $grown")

    // skew in isolation: a drifted batch concentrating in one cell
    val dir2 = tempCorpus("skew")
    AnnIndex.ensureBuilt(spark, dir2)
    val one = Fixtures.embeddings(spark, dir2).orderBy(col("vec_id")).limit(1)
      .select(col("embedding").cast("array<double>")).collect()(0).getSeq[Double](0)
    import spark.implicits._
    val hot = (0 until 600).map(i => (700000L + i, one, "hot"))
      .toDF("vec_id", "embedding", "label")
    AnnIndex.appendBatch(spark, dir2, hot)
    val skewed = AnnIndex.requantizeAdvice(spark, dir2)
    assert(!skewed.knee, s"growth alone must not be the trigger here: $skewed")
    assert(skewed.skewed && skewed.needed,
      s"600 identical vectors in one cell must trip the skew bound: $skewed")
  }

  test("requantize cycle: append past the knee fires advice, rebuild clears it, probes == inline IVF on the combined corpus") {
    val dir = tempCorpus("requant")
    AnnIndex.ensureBuilt(spark, dir)
    val emb = Fixtures.embeddings(spark, dir)
    val k0 = AnnIndex.storedQuantizer(spark, dir).length
    // 4 appended replicas push n to 5× the build size — past the
    // annCellsFor knee (advice spec above pins the trigger itself)
    (1 to 4).foreach(r => AnnIndex.appendBatch(spark, dir,
      emb.withColumn("vec_id", col("vec_id") + lit(r * 100000L))))
    assert(AnnIndex.requantizeAdvice(spark, dir).knee, "sanity: growth crosses the knee")
    val after = AnnIndex.requantize(spark, dir)
    assert(!after.knee,
      s"requantize must resize cells to the grown corpus and clear the knee: $after")
    // the combined corpus = build rows ∪ every appended batch; the
    // rebuilt index must be bit-identical to an inline IVF pipeline
    // built fresh from it — k resized, centroids re-sampled
    val combined = (0 to 4).map(r =>
      emb.withColumn("vec_id", col("vec_id") + lit(r * 100000L))).reduce(_ union _)
    val k = AnnIndex.annCellsFor(combined.count())
    assert(k > k0 && AnnIndex.storedQuantizer(spark, dir).length == k,
      s"quantizer must be re-sized to the grown corpus ($k0 -> $k)")
    val indexed = AnnIndex.topK(spark, dir, maxQueryId = 8, k = 5, nProbe = 2)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val cs = Similarity.sampledCentroids(Similarity.prepared(combined), k)
    val inline = Similarity.topKIvfKmeans(combined, maxQueryId = 8, k = 5,
        nCells = k, nProbe = 2, centroids = Some(cs))
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(indexed.nonEmpty && indexed == inline,
      "the requantized index must stay a pure physical optimization")
    // the commit left no stage/old generation behind
    Seq("__stage", "__old").foreach { sfx =>
      assert(!spark.catalog.tableExists(AnnIndex.tableFor(dir) + sfx) &&
        !spark.catalog.tableExists(AnnIndex.quantizerTableFor(dir) + sfx) &&
        !spark.catalog.tableExists(AnnIndex.sqTableFor(dir) + sfx),
        s"generation leftovers ($sfx) must be dropped at commit")
    }
  }

  test("stored IVF×SQ probe == inline topKIvfSq (codes + params read back, never re-derived)") {
    Seq(AnnIndex.tableFor(sf), AnnIndex.quantizerTableFor(sf), AnnIndex.sqTableFor(sf))
      .foreach(graft.tables.Bucketed.resetTable(spark, _))
    val stored = AnnIndex.topKSq(spark, sf, maxQueryId = 7, k = 4, nProbe = 2, rerank = 12)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val inline = Similarity.topKIvfSq(Fixtures.embeddings(spark, sf),
        maxQueryId = 7, k = 4, nProbe = 2, rerank = 12)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(stored.nonEmpty && stored == inline,
      "persisting codes + SQ params must be a pure physical optimization")
  }

  test("the SQ candidate scan is bucket-pruned and reads codes, not full vectors") {
    AnnIndex.ensureBuilt(spark, sf)
    val plan = AnnIndex.topKSq(spark, sf, maxQueryId = 2, k = 4, nProbe = 2, rerank = 12)
      .queryExecution.executedPlan.toString
    val prunes = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findAllMatchIn(plan).toSeq
    // candidate scan + rerank scan, plus the cell-pruned tombstone
    // scans feeding their anti-joins — every one of them must prune
    assert(prunes.size >= 2,
      s"both the candidate scan and the rerank scan must bucket-prune:\n$plan")
    prunes.foreach(m => assert(m.group(1).toInt <= 4,
      s"expected <=4 of ${m.group(2)} buckets read, got ${m.group(1)}"))
    // parquet column pruning: the candidate pass must NOT read `v` —
    // that is the bytes-per-row claim SQ8 exists for
    assert(plan.contains("ReadSchema: struct<vec_id:bigint,nrm:double,cell:int,codes:array<int>>"),
      s"candidate scan must read only (vec_id, nrm, cell, codes):\n$plan")
    assert(plan.contains("ReadSchema: struct<vec_id:bigint,v:array<double>,nrm:double,cell:int>"),
      s"rerank scan must read full vectors for candidates only:\n$plan")
  }

  test("SQ8 costs zero recall at rerank = 2k: stored SQ probe == full-precision probe, row for row") {
    // the quantize-then-rerank contract, measured (AnnRecallProbe
    // sweeps it at three tiers — recall identical to the
    // full-precision probe at every nProbe): with rerank = 2k the SQ
    // approximation only reorders candidates BELOW the rerank cut, and
    // the exact rerank restores the top — so the result ROWS (ranks
    // and exact scores included) must match, not just overlap. A code
    //-book regression (bad params, clamped codes, decode drift) pushes
    // a true neighbor below the cut and breaks equality here.
    AnnIndex.ensureBuilt(spark, sf)
    val full = AnnIndex.topK(spark, sf, maxQueryId = 8, k = 5, nProbe = 4)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val sq = AnnIndex.topKSq(spark, sf, maxQueryId = 8, k = 5, nProbe = 4, rerank = 10)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(full.nonEmpty && sq == full,
      "SQ8 + exact rerank must reproduce the full-precision probe exactly")
  }

  test("SQ probe stays a pure physical optimization across the append -> requantize cycle") {
    val dir = tempCorpus("sq-cycle")
    AnnIndex.ensureBuilt(spark, dir)
    val emb = Fixtures.embeddings(spark, dir)
    // push past the knee so the rebuild genuinely resizes; the LAST
    // replica is scaled 1.5×, WIDENING every dimension's range, so the
    // stored SQ params must visibly refresh at requantize (its codes
    // clamp under the OLD params until then — a quality decay the
    // exact rerank absorbs, per the appendBatch contract)
    def replica(r: Int) = {
      val shifted = emb.withColumn("vec_id", col("vec_id") + lit(r * 100000L))
      if (r < 4) shifted
      else shifted.withColumn("embedding",
        transform(col("embedding"), x => (x * lit(1.5)).cast("float")))
    }
    (1 to 4).foreach(r => AnnIndex.appendBatch(spark, dir, replica(r)))
    val (mns0, mxs0) = AnnIndex.storedSqParams(spark, dir)
    AnnIndex.requantize(spark, dir)
    val combined = (0 to 4).map(replica).reduce(_ union _)
    // params refreshed over the grown corpus = the inline derivation
    val (mns1, mxs1) = AnnIndex.storedSqParams(spark, dir)
    val (mnsI, mxsI) = Similarity.sqParamsOf(Similarity.prepared(combined))
    assert(mns1.toSeq == mnsI.toSeq && mxs1.toSeq == mxsI.toSeq,
      "requantize must refresh SQ params from the combined corpus")
    assert(mxs1.toSeq != mxs0.toSeq,
      "the widened range must actually move the stored params")
    // and the stored probe equals the inline IVF×SQ over the combined
    // corpus — quantizer, params, and codes all from the new generation
    val stored = AnnIndex.topKSq(spark, dir, maxQueryId = 6, k = 4, nProbe = 2, rerank = 12)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val inline = Similarity.topKIvfSq(combined, maxQueryId = 6, k = 4,
        nProbe = 2, rerank = 12)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(stored.nonEmpty && stored == inline,
      "the requantized SQ index must reproduce the inline IVF×SQ pipeline")
  }

  test("stored IVF×PQ probe == inline topKIvfPq; candidate scan reads pqcodes only, bucket-pruned") {
    AnnIndex.ensureBuilt(spark, sf)
    val stored = AnnIndex.topKIdxPq(spark, sf, maxQueryId = 6, k = 5,
        nProbe = 2, rerank = 30)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val inline = Similarity.topKIvfPq(Fixtures.embeddings(spark, sf),
        maxQueryId = 6, k = 5, nProbe = 2, rerank = 30)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(stored.nonEmpty && stored == inline,
      "persisting pqcodes + the codebook must be a pure physical optimization")
    // the sub-byte bound: the candidate scan reads pqcodes — not the
    // vectors, not even the SQ8 codes — and both scans bucket-prune
    val plan = AnnIndex.topKIdxPq(spark, sf, maxQueryId = 2, k = 4,
        nProbe = 2, rerank = 24)
      .queryExecution.executedPlan.toString
    val prunes = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findAllMatchIn(plan).toSeq
    assert(prunes.size >= 2,
      s"both the candidate scan and the rerank scan must bucket-prune:\n$plan")
    prunes.foreach(m => assert(m.group(1).toInt <= 4,
      s"expected <=4 of ${m.group(2)} buckets read, got ${m.group(1)}"))
    assert(plan.contains("ReadSchema: struct<vec_id:bigint,nrm:double,cell:int,pqcodes:binary>"),
      s"candidate scan must read only (vec_id, nrm, cell, pqcodes) at the packed layout:\n$plan")
    assert(plan.contains("ReadSchema: struct<vec_id:bigint,v:array<double>,nrm:double,cell:int>"),
      s"rerank scan must read full vectors for candidates only:\n$plan")
  }

  test("pqcodes is PHYSICALLY 4 bits/dim: binary column at exactly m/2 bytes per row, " +
      "nibble decode round-trips the inline assignment bit for bit") {
    AnnIndex.ensureBuilt(spark, sf)
    val t = AnnIndex.tableFor(sf)
    assert(spark.table(t).schema("pqcodes").dataType ==
      org.apache.spark.sql.types.BinaryType,
      "the stored codes column must be binary, not array<int>")
    val cb = AnnIndex.storedPqCodebook(spark, sf)
    val inline = Similarity.prepared(Fixtures.embeddings(spark, sf))
      .select(col("vec_id"),
        Similarity.pqCodesCol(col("v"), cb, AnnIndex.PqM).as("codes"))
    val rows = spark.table(t).select(col("vec_id"), col("pqcodes"))
      .join(inline, Seq("vec_id")).limit(200).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val packed = r.getAs[Array[Byte]]("pqcodes")
      assert(packed.length == AnnIndex.PqM / 2,
        s"each packed row must hold exactly m/2 = ${AnnIndex.PqM / 2} bytes, " +
          s"got ${packed.length} — the 4-bit/dim bound must be physical")
      val codes = r.getSeq[Int](2)
      val decoded = codes.indices.map(j => (packed(j >> 1) >> ((j & 1) << 2)) & 0xF)
      assert(decoded == codes,
        s"nibble decode must round-trip the inline assignment: $decoded vs $codes")
    }
  }

  test("PQ probe stays a pure physical optimization across the append -> requantize cycle") {
    val dir = tempCorpus("pq-cycle")
    AnnIndex.ensureBuilt(spark, dir)
    val emb = Fixtures.embeddings(spark, dir)
    val cb0 = AnnIndex.storedPqCodebook(spark, dir)
    assert(cb0.length == AnnIndex.PqKsub && cb0.head.length == AnnIndex.Dim)
    // append a clone of vec 0 under a fresh id: encoded with the
    // STORED codebook, it must be findable through the stored PQ probe
    // at cosine 1.0 (identical vector → identical codes → top ADC rank)
    val clone = emb.filter(col("vec_id") === 0)
      .withColumn("vec_id", lit(424242L))
    AnnIndex.appendBatch(spark, dir, clone)
    val hits = AnnIndex.topKIdxPq(spark, dir, maxQueryId = 1, k = 3,
        nProbe = 2, rerank = 10)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("score")))
    assert(hits.contains((424242L, 1.0)),
      s"an appended clone must be served by the stored PQ probe: ${hits.toSeq}")
    // requantize refreshes the codebook with the generation and the
    // stored probe equals the inline IVF×PQ over the combined corpus
    AnnIndex.requantize(spark, dir)
    val combined = emb.union(clone)
    val stored = AnnIndex.topKIdxPq(spark, dir, maxQueryId = 6, k = 4,
        nProbe = 2, rerank = 24)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val inline = Similarity.topKIvfPq(combined, maxQueryId = 6, k = 4,
        nProbe = 2, rerank = 24)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(stored.nonEmpty && stored == inline,
      "the requantized PQ index must reproduce the inline IVF×PQ pipeline")
  }

  test("a crash inside the rename window is healed: t is absent at every crash point, ensureBuilt sweeps and rebuilds") {
    val dir = tempCorpus("crash")
    val t = AnnIndex.ensureBuilt(spark, dir)
    val qt = AnnIndex.quantizerTableFor(dir)
    val before = AnnIndex.topK(spark, dir, maxQueryId = 5, k = 4, nProbe = 2)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(before.nonEmpty)
    // Simulate the DEEPEST mid-window crash the reordered commit can
    // produce: live pair renamed aside AND the new quantizer already
    // promoted, but the assignment promotion (the LAST rename) never
    // ran — t absent, qt present, stage + old leftovers on disk. Under
    // the pre-fix order (assignment promoted first) this state was
    // instead both-tables-present-but-mismatched, which no sweep could
    // detect; the reorder makes "t absent" the invariant of EVERY
    // crash point, so one detection rule heals them all.
    spark.sql(s"ALTER TABLE $t RENAME TO ${t}__old")
    spark.sql(s"ALTER TABLE $qt RENAME TO ${qt}__old")
    import spark.implicits._
    Seq((0, Seq(0.0))).toDF("cell", "centroid")
      .write.mode("overwrite").saveAsTable(qt) // the promoted new-gen quantizer
    spark.range(3).toDF("junk").write.mode("overwrite").saveAsTable(t + "__stage")
    assert(!spark.catalog.tableExists(t) && spark.catalog.tableExists(qt))
    // first probe after the crash: ensureBuilt detects the missing
    // assignment table, sweeps every generation, rebuilds from the
    // source corpus — and the probes come back identical
    val healed = AnnIndex.topK(spark, dir, maxQueryId = 5, k = 4, nProbe = 2)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(healed == before,
      "the healed index must serve identical probes (deterministic rebuild)")
    Seq(t + "__stage", t + "__old", qt + "__old").foreach(n =>
      assert(!spark.catalog.tableExists(n), s"orphan $n must be swept"))
  }

  test("persisted two-level index: stored probe == inline topKIvf2, both stored scans bucket-pruned") {
    Seq(AnnIndex.table2For(sf), AnnIndex.coarseQuantizerTableFor(sf),
      AnnIndex.fineQuantizerTableFor(sf))
      .foreach(graft.tables.Bucketed.resetTable(spark, _))
    val probed = AnnIndex.topK2(spark, sf, maxQueryId = 5, k = 4,
      nProbeCoarse = 2, nProbeFine = 3)
    val stored = probed.orderBy(col("q_id"), col("rn")).collect().toSeq
    val inline = Similarity.topKIvf2(Fixtures.embeddings(spark, sf),
        maxQueryId = 5, k = 4, nProbeCoarse = 2, nProbeFine = 3)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(stored.nonEmpty && stored == inline,
      "persisting the two-level structure must be a pure physical optimization")
    // the assignment scan prunes on the probed coarse cells (the fine
    // quantizer table is unbucketed — its literal filter row-skips)
    val plan = probed.queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"expected a bucket-pruned assignment scan:\n$plan")
    assert(m.get.group(1).toInt <= 4,
      s"expected <=4 of ${m.get.group(2)} coarse buckets read, got ${m.get.group(1)}")
  }

  test("two-level append -> requantize cycle: stored probe tracks the inline pipeline on the combined corpus") {
    val dir = tempCorpus("ivf2-cycle")
    AnnIndex.ensureBuilt2(spark, dir)
    val emb = Fixtures.embeddings(spark, dir)
    // appended clones must be FOUND (cosine 1.0 at rank 1): both
    // stored quantizers assigned them exactly like their originals
    AnnIndex.appendBatch2(spark, dir,
      emb.withColumn("vec_id", col("vec_id") + 500000L))
    val rows = AnnIndex.topK2(spark, dir, maxQueryId = 4, k = 3,
        nProbeCoarse = 2, nProbeFine = 3)
      .orderBy(col("q_id"), col("rn")).collect()
    (0L until 4L).foreach { q =>
      val top = rows.filter(_.getAs[Long]("q_id") == q).minBy(_.getAs[Int]("rn"))
      assert(top.getAs[Long]("vec_id") == q + 500000L &&
        top.getAs[Double]("score") == 1.0,
        s"query $q must find its appended clone at cosine 1.0, got $top")
    }
    // requantize re-fits both levels over the combined corpus — the
    // stored probe must equal the inline pipeline built fresh from it
    AnnIndex.requantize2(spark, dir)
    val combined = emb.union(emb.withColumn("vec_id", col("vec_id") + 500000L))
    val stored = AnnIndex.topK2(spark, dir, maxQueryId = 5, k = 4,
        nProbeCoarse = 2, nProbeFine = 3)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val inline = Similarity.topKIvf2(combined, maxQueryId = 5, k = 4,
        nProbeCoarse = 2, nProbeFine = 3)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(stored.nonEmpty && stored == inline,
      "the requantized two-level index must stay a pure physical optimization")
    Seq("__stage", "__old").foreach { sfx =>
      Seq(AnnIndex.table2For(dir), AnnIndex.coarseQuantizerTableFor(dir),
        AnnIndex.fineQuantizerTableFor(dir)).foreach(n =>
        assert(!spark.catalog.tableExists(n + sfx),
          s"generation leftovers ($n$sfx) must be dropped at commit"))
    }
  }

  test("two-level SQ probe: zero loss at rerank = 2k; candidate scan reads codes, not full vectors") {
    AnnIndex.ensureBuilt2(spark, sf)
    // the flat tier's quantize-then-rerank contract, one level down:
    // with rerank = 2k the SQ approximation only reorders candidates
    // below the cut, so the result ROWS must equal the full-precision
    // two-level probe — a gen-2 code-book regression breaks equality
    val full = AnnIndex.topK2(spark, sf, maxQueryId = 6, k = 4,
        nProbeCoarse = 2, nProbeFine = 3)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val sq = AnnIndex.topK2Sq(spark, sf, maxQueryId = 6, k = 4,
        nProbeCoarse = 2, nProbeFine = 3, rerank = 8)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(full.nonEmpty && sq == full,
      "gen-2 SQ8 + exact rerank must reproduce the full-precision two-level probe")
    // the BYTE-BOUND claim, plan-pinned: the candidate pass must read
    // the bit-packed codes and NEVER the 8-byte/dim full vectors —
    // this is the entire reason gen-2 codes exist (the billion-vector
    // tier's probes are the byte-frugal ones); the rerank scan alone
    // reads v, and both scans bucket-prune on the probed coarse cells
    val plan = AnnIndex.topK2Sq(spark, sf, maxQueryId = 2, k = 4,
        nProbeCoarse = 2, nProbeFine = 3, rerank = 8)
      .queryExecution.executedPlan.toString
    val prunes = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findAllMatchIn(plan).toSeq
    assert(prunes.size >= 2,
      s"both the candidate scan and the rerank scan must bucket-prune:\n$plan")
    prunes.foreach(m => assert(m.group(1).toInt <= 4,
      s"expected <=4 of ${m.group(2)} coarse buckets read, got ${m.group(1)}"))
    assert(plan.contains(
      "ReadSchema: struct<vec_id:bigint,nrm:double,ccell:int,fcell:int,codes:array<int>>"),
      s"candidate scan must read only (vec_id, nrm, ccell, fcell, codes):\n$plan")
    assert(plan.contains(
      "ReadSchema: struct<vec_id:bigint,v:array<double>,nrm:double,ccell:int>"),
      s"rerank scan must read full vectors for candidates only:\n$plan")
  }

  test("gen-2 SQ params refresh across the append -> requantize2 cycle") {
    val dir = tempCorpus("ivf2-sq-cycle")
    AnnIndex.ensureBuilt2(spark, dir)
    val emb = Fixtures.embeddings(spark, dir)
    // the appended replica is scaled 1.5×, widening every dimension's
    // range: its codes clamp under the STORED params until requantize2
    // refreshes them with the generation (the appendBatch2 coherence
    // contract — a quality decay the exact rerank absorbs, never a
    // correctness one)
    val widened = emb.withColumn("vec_id", col("vec_id") + 500000L)
      .withColumn("embedding",
        transform(col("embedding"), x => (x * lit(1.5)).cast("float")))
    AnnIndex.appendBatch2(spark, dir, widened)
    val (_, mxs0) = AnnIndex.storedSqParams2(spark, dir)
    AnnIndex.requantize2(spark, dir)
    val (mns1, mxs1) = AnnIndex.storedSqParams2(spark, dir)
    val combined = emb.union(widened)
    val (mnsI, mxsI) = Similarity.sqParamsOf(Similarity.prepared(combined))
    assert(mns1.toSeq == mnsI.toSeq && mxs1.toSeq == mxsI.toSeq,
      "requantize2 must refresh gen-2 SQ params from the combined corpus")
    assert(mxs1.toSeq != mxs0.toSeq,
      "the widened range must actually move the stored gen-2 params")
    // and the SQ probe over the rebuilt generation is still zero-loss
    // against the full-precision probe of the same generation
    val full = AnnIndex.topK2(spark, dir, maxQueryId = 5, k = 4,
        nProbeCoarse = 2, nProbeFine = 3)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val sq = AnnIndex.topK2Sq(spark, dir, maxQueryId = 5, k = 4,
        nProbeCoarse = 2, nProbeFine = 3, rerank = 8)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(full.nonEmpty && sq == full,
      "the requantized gen-2 code book must keep the rerank contract")
  }

  test("the probe side is distributed: query vectors are never collected to a local relation") {
    AnnIndex.ensureBuilt(spark, sf)
    // the probe frame must derive from the query-side parquet scan —
    // a driver-computed probe list would plan as a LocalTableScan of
    // (cell, q_id, qv, qn) rows (the pre-r16 shape); only the distinct
    // probed CELL IDS may reach the driver (as the bucket-pruning
    // literal). The same holds for the SQ and two-level probes, which
    // share probeFrame.
    Seq(
      AnnIndex.topK(spark, sf, maxQueryId = 4, k = 3, nProbe = 2),
      AnnIndex.topKSq(spark, sf, maxQueryId = 4, k = 3, nProbe = 2, rerank = 8),
      { AnnIndex.ensureBuilt2(spark, sf)
        AnnIndex.topK2(spark, sf, maxQueryId = 4, k = 3) },
      AnnIndex.topK2Sq(spark, sf, maxQueryId = 4, k = 3)
    ).foreach { probed =>
      val plan = probed.queryExecution.executedPlan.toString
      assert(!plan.contains("LocalTableScan"),
        s"probe plan must not materialize query rows driver-side:\n$plan")
      assert("SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan).isDefined,
        s"the distributed probe must keep bucket pruning:\n$plan")
    }
  }

  test("removeBatch: tombstoned vectors are never returned; results genuinely change; unknown ids are no-ops") {
    val dir = tempCorpus("delete")
    AnnIndex.ensureBuilt(spark, dir)
    val before = AnnIndex.topK(spark, dir, maxQueryId = 6, k = 4, nProbe = 2)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(before.nonEmpty)
    // retire exactly the ids the registry entry retires — the set must
    // intersect the undeleted top-k or the entry is vacuous (residue 7
    // was chosen because it appears in the top-4 at EVERY fixture tier)
    assert(before.exists(_.getAs[Long]("vec_id") % 10 == 7),
      "sanity: the deletion set must intersect the pre-delete results")
    val emb = Fixtures.embeddings(spark, dir)
    AnnIndex.removeBatch(spark, dir,
      emb.select(col("vec_id")).filter(col("vec_id") % 10 === 7))
    val after = AnnIndex.topK(spark, dir, maxQueryId = 6, k = 4, nProbe = 2)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(after.forall(_.getAs[Long]("vec_id") % 10 != 7),
      s"a tombstoned vector leaked back into the probe: $after")
    assert(after != before, "deletion must visibly change the results")
    // the SQ read path filters the same tombstones
    val afterSq = AnnIndex.topKSq(spark, dir, maxQueryId = 6, k = 4,
        nProbe = 2, rerank = 12)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(afterSq.nonEmpty && afterSq.forall(_.getAs[Long]("vec_id") % 10 != 7))
    // deletion == the inline probe over the SURVIVING corpus with the
    // BUILD quantizer (deletion never re-fits) and the FULL query set
    // (probes are external callers, not corpus members)
    val cs = AnnIndex.storedQuantizer(spark, dir)
    val inline = Similarity.probeIndex(
        Similarity.assignCells(
          Similarity.prepared(emb.filter(col("vec_id") % 10 =!= 7)), cs),
        Similarity.probeQueries(
          Similarity.prepared(emb).filter(col("vec_id") < 6), cs, 2),
        k = 4)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(after == inline,
      "tombstone filtering must equal the surviving-corpus inline probe")
    // re-deleting is idempotent; deleting an unknown id is a no-op
    val tsCount = spark.table(AnnIndex.tombstoneTableFor(dir)).count()
    AnnIndex.removeBatch(spark, dir,
      emb.select(col("vec_id")).filter(col("vec_id") % 10 === 7))
    import spark.implicits._
    AnnIndex.removeBatch(spark, dir, Seq(987654321L).toDF("vec_id"))
    assert(spark.table(AnnIndex.tombstoneTableFor(dir)).count() == tsCount,
      "re-deletes and unknown ids must not grow the tombstone set")
    assert(AnnIndex.topK(spark, dir, maxQueryId = 6, k = 4, nProbe = 2)
      .orderBy(col("q_id"), col("rn")).collect().toSeq == after)
  }

  test("append after delete: fresh vectors served, tombstoned ids stay retired") {
    val dir = tempCorpus("del-append")
    AnnIndex.ensureBuilt(spark, dir)
    val emb = Fixtures.embeddings(spark, dir)
    AnnIndex.removeBatch(spark, dir,
      emb.select(col("vec_id")).filter(col("vec_id") % 10 === 7))
    // append clones under fresh ids: each query must find its clone at
    // cosine 1.0 (served), while the tombstoned tenth stays invisible
    AnnIndex.appendBatch(spark, dir,
      emb.withColumn("vec_id", col("vec_id") + 500000L))
    val rows = AnnIndex.topK(spark, dir, maxQueryId = 5, k = 4, nProbe = 2)
      .orderBy(col("q_id"), col("rn")).collect()
    (0L until 5L).foreach { q =>
      val top = rows.filter(_.getAs[Long]("q_id") == q).minBy(_.getAs[Int]("rn"))
      assert(top.getAs[Long]("vec_id") == q + 500000L &&
        top.getAs[Double]("score") == 1.0,
        s"query $q must find its appended clone at cosine 1.0, got $top")
    }
    assert(rows.forall(r => !(r.getAs[Long]("vec_id") < 500000L &&
      r.getAs[Long]("vec_id") % 10 == 7)),
      "original tombstoned ids must stay retired across appends")
  }

  test("requantize compacts tombstones: dead trigger fires, rebuild physically drops retired rows and clears it") {
    val dir = tempCorpus("compact")
    AnnIndex.ensureBuilt(spark, dir)
    val emb = Fixtures.embeddings(spark, dir)
    // retire 30% — past the deadBound=5 (20%) trigger
    AnnIndex.removeBatch(spark, dir,
      emb.select(col("vec_id")).filter(col("vec_id") % 10 < 3))
    val advice = AnnIndex.requantizeAdvice(spark, dir)
    assert(advice.tombstoned > 0 && advice.dead && advice.needed,
      s"a 30% dead fraction must advise compaction: $advice")
    val after = AnnIndex.requantize(spark, dir)
    assert(after.tombstoned == 0 && !after.dead,
      s"compaction must clear the tombstone set: $after")
    // retired rows are physically gone and the rebuilt index equals an
    // inline pipeline over the surviving corpus (fresh k + sample) —
    // with the FULL query set: probes are external callers, so deleted
    // ids still query even though they can no longer be returned
    val surviving = emb.filter(col("vec_id") % 10 >= 3)
    assert(spark.table(AnnIndex.tableFor(dir)).count() == surviving.count(),
      "compaction must drop exactly the tombstoned rows")
    val k = AnnIndex.annCellsFor(surviving.count())
    val cs = Similarity.sampledCentroids(Similarity.prepared(surviving), k)
    val indexed = AnnIndex.topK(spark, dir, maxQueryId = 8, k = 5, nProbe = 2)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val inline = Similarity.probeIndex(
        Similarity.assignCells(Similarity.prepared(surviving), cs),
        Similarity.probeQueries(
          Similarity.prepared(emb).filter(col("vec_id") < 8), cs, 2),
        k = 5)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(indexed.nonEmpty && indexed == inline,
      "the compacted index must equal the surviving-corpus inline pipeline")
  }

  test("a crash inside removeBatch's rename window is healed by the sweep") {
    val dir = tempCorpus("del-crash")
    AnnIndex.ensureBuilt(spark, dir)
    val emb = Fixtures.embeddings(spark, dir)
    AnnIndex.removeBatch(spark, dir,
      emb.select(col("vec_id")).filter(col("vec_id") % 10 === 7))
    val afterDelete = AnnIndex.topK(spark, dir, maxQueryId = 5, k = 4, nProbe = 2)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val ts = AnnIndex.tombstoneTableFor(dir)
    import spark.implicits._
    // THE crash window removeBatch can actually produce: live table
    // renamed aside, staged merged table (committed ∪ in-flight batch)
    // fully written but not yet promoted. The heal must promote the
    // stage — recovering EVERYTHING, in-flight batch included — at
    // O(rename), never the old full-source-rebuild blast radius.
    val k = AnnIndex.storedQuantizer(spark, dir).length
    val inFlight = spark.table(AnnIndex.tableFor(dir))
      .select(col("vec_id"), col("cell"))
      .filter(col("vec_id") % 10 === 8)
      .unionByName(spark.table(ts).select(col("vec_id"), col("cell")))
    Seq(ts + "__stage", ts + "__old").foreach(Bucketed.resetTable(spark, _))
    inFlight.write.mode("overwrite").format("parquet")
      .bucketBy(k, "cell").sortBy("cell").saveAsTable(ts + "__stage")
    spark.sql(s"ALTER TABLE $ts RENAME TO ${ts}__old")
    assert(!spark.catalog.tableExists(ts))
    val assignmentFiles = spark.table(AnnIndex.tableFor(dir))
      .inputFiles.toSet
    val healed = AnnIndex.topK(spark, dir, maxQueryId = 5, k = 4, nProbe = 2)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(healed.forall { r =>
      val id = r.getAs[Long]("vec_id"); id % 10 != 7 && id % 10 != 8 },
      "the promoted stage must carry BOTH the committed and the in-flight batch")
    assert(spark.table(ts).count() ==
      emb.filter(col("vec_id") % 10 === 7 || col("vec_id") % 10 === 8).count(),
      "the healed tombstone set is exactly committed ∪ in-flight")
    assert(spark.table(AnnIndex.tableFor(dir)).inputFiles.toSet == assignmentFiles,
      "the heal must be a rename, never an index rebuild")
    assert(!spark.catalog.tableExists(ts + "__old"), "orphan must be swept")
    // the degenerate only-__old state (no removeBatch crash point
    // produces it, but the sweep tolerates it): restoring the live
    // table keeps every COMMITTED tombstone — only the in-flight batch
    // is lost, and the ledger replays it
    spark.sql(s"DROP TABLE $ts") // lose the healed generation entirely
    AnnIndex.removeBatch(spark, dir, Seq(1L).toDF("vec_id")) // rebuild + re-delete id 1
    val committed = AnnIndex.topK(spark, dir, maxQueryId = 5, k = 4, nProbe = 2)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    spark.sql(s"ALTER TABLE $ts RENAME TO ${ts}__old")
    val restored = AnnIndex.topK(spark, dir, maxQueryId = 5, k = 4, nProbe = 2)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(restored == committed,
      "__old restore must preserve the committed tombstones")
    assert(afterDelete.nonEmpty && healed.nonEmpty)
  }

  test("requantizeAdvice2: fresh two-level build clean; coarse knee fires on 30x growth") {
    val dir = tempCorpus("advice2")
    AnnIndex.ensureBuilt2(spark, dir)
    val fresh0 = AnnIndex.requantizeAdvice2(spark, dir)
    assert(!fresh0.needed, s"a just-built two-level index must not advise: $fresh0")
    // n0=500 → kc = annCellsFor(annCellsFor(500)) = annCellsFor(23) = 5;
    // 29 appended replicas → n=15000 → annCellsFor(annCellsFor(15000))
    // = annCellsFor(123) = 12 > 2·5 — the coarse knee
    val emb = Fixtures.embeddings(spark, dir)
    (1 to 29).foreach(r => AnnIndex.appendBatch2(spark, dir,
      emb.withColumn("vec_id", col("vec_id") + lit(r * 100000L))))
    val grown = AnnIndex.requantizeAdvice2(spark, dir)
    assert(grown.knee && grown.needed,
      s"a corpus past the coarse knee must advise requantize2: $grown")
    AnnIndex.requantize2(spark, dir)
    val cleared = AnnIndex.requantizeAdvice2(spark, dir)
    assert(!cleared.knee,
      s"requantize2 must resize the coarse level and clear the knee: $cleared")
  }

  test("two-level delete lifecycle: tombstoned never returned, dead trigger, requantize2 compacts, crash heals") {
    val dir = tempCorpus("del2")
    AnnIndex.ensureBuilt2(spark, dir)
    val emb = Fixtures.embeddings(spark, dir)
    val before = AnnIndex.topK2(spark, dir, maxQueryId = 6, k = 4)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(before.exists(_.getAs[Long]("vec_id") % 10 == 3),
      "sanity: the deletion set must intersect the pre-delete results")
    AnnIndex.removeBatch2(spark, dir,
      emb.select(col("vec_id")).filter(col("vec_id") % 10 === 3))
    val after = AnnIndex.topK2(spark, dir, maxQueryId = 6, k = 4)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(after.forall(_.getAs[Long]("vec_id") % 10 != 3) && after != before,
      s"gen-2 tombstones must filter and visibly change results")
    // idempotent re-delete
    val tsCount = spark.table(AnnIndex.tombstone2TableFor(dir)).count()
    AnnIndex.removeBatch2(spark, dir,
      emb.select(col("vec_id")).filter(col("vec_id") % 10 === 3))
    assert(spark.table(AnnIndex.tombstone2TableFor(dir)).count() == tsCount)
    // 10% dead — below the 20% trigger; delete two more residues to trip it
    AnnIndex.removeBatch2(spark, dir,
      emb.select(col("vec_id")).filter(col("vec_id") % 10 === 4 ||
        col("vec_id") % 10 === 5))
    val advice = AnnIndex.requantizeAdvice2(spark, dir)
    assert(advice.tombstoned > 0 && advice.dead,
      s"a 30% dead fraction must advise compaction: $advice")
    AnnIndex.requantize2(spark, dir)
    val cleared = AnnIndex.requantizeAdvice2(spark, dir)
    assert(cleared.tombstoned == 0 && !cleared.dead, s"compaction must clear: $cleared")
    val surviving = emb.filter(col("vec_id") % 10 < 3 || col("vec_id") % 10 > 5)
    assert(spark.table(AnnIndex.table2For(dir)).count() == surviving.count(),
      "requantize2 must physically drop exactly the tombstoned rows")
    // the compacted index == the inline two-level pipeline over the
    // surviving corpus, probed with the FULL query set
    val indexed = AnnIndex.topK2(spark, dir, maxQueryId = 5, k = 4)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val prepS = Similarity.prepared(surviving)
    val (coarse, fine, asg) = Similarity.ivf2StructureOf(prepS, surviving.count())
    val inline = Similarity.probeIvf2(coarse, fine, asg,
        Similarity.prepared(emb).filter(col("vec_id") < 5),
        k = 4, nProbeCoarse = 2, nProbeFine = 3)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(indexed.nonEmpty && indexed == inline,
      "the compacted two-level index must equal the surviving-corpus inline pipeline")
    // crash between removeBatch2's renames: ts2 absent with the live
    // set renamed aside → the sweep RESTORES it (healTombstoneSwap's
    // cheap path, one level up from the flat case) — the compacted
    // generation keeps serving, no rebuild, no lost tombstones
    val ts = AnnIndex.tombstone2TableFor(dir)
    spark.sql(s"ALTER TABLE $ts RENAME TO ${ts}__old")
    val healed = AnnIndex.topK2(spark, dir, maxQueryId = 5, k = 4)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(healed == indexed,
      "the restored gen-2 tombstone table must keep the compacted generation serving")
    // only when NO tombstone generation survives does the sweep fall
    // back to the full source rebuild (the delete producer's ledger
    // replays) — the pre-17 blast radius, now the last resort
    spark.sql(s"DROP TABLE $ts")
    val rebuilt = AnnIndex.topK2(spark, dir, maxQueryId = 5, k = 4)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val freshInline = Similarity.topKIvf2(emb, maxQueryId = 5, k = 4)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(rebuilt == freshInline,
      "with no surviving tombstone generation the sweep rebuilds from source")
    assert(!spark.catalog.tableExists(ts + "__old"), "orphan must be swept")
  }

  test("curation -> ledger -> removeBatch: ledger-first ordering, replay idempotent, crash window heals") {
    import spark.implicits._
    val dir = tempCorpus("ledger")
    AnnIndex.ensureBuilt(spark, dir, tag = "led")
    def probe() = AnnIndex.topK(spark, dir, maxQueryId = 6, k = 4, nProbe = 2, tag = "led")
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val before = probe()
    assert(before.nonEmpty)
    // batch 1 retires ids that provably sit in the undeleted top-k, so
    // the delete VISIBLY changes results (never a vacuous pass)
    val victims = before.map(_.getAs[Long]("vec_id")).distinct.take(3)
    AnnIndex.retireBatch(spark, dir, victims.toDF("vec_id"), tag = "led")
    val after1 = probe()
    assert(after1 != before && after1.forall(r =>
      !victims.contains(r.getAs[Long]("vec_id"))),
      "retired ids must leave the serving results")
    // the ledger durably recorded exactly the batch
    val ledger = AnnIndex.deleteLedgerTableFor(dir, "led")
    assert(spark.table(ledger).collect().map(_.getLong(0)).sorted.toSeq
      == victims.sorted.toSeq)
    // replay TWICE: at-least-once delivery converges (the idempotent
    // fast path absorbs a fully-applied ledger)
    AnnIndex.replayDeleteLedger(spark, dir, "led")
    AnnIndex.replayDeleteLedger(spark, dir, "led")
    assert(probe() == after1, "ledger replay must be idempotent")
    // CRASH WINDOW: batch 2 lands in the ledger but the producer dies
    // before removeBatch (simulated by appending to the ledger
    // directly) — the index keeps serving the pre-crash state...
    val victims2 = after1.map(_.getAs[Long]("vec_id")).distinct.take(2)
    victims2.map((_, 99L)).toDF("vec_id", "batch")
      .write.mode("append").format("parquet").saveAsTable(ledger)
    assert(probe() == after1,
      "an unapplied ledger batch must not affect serving")
    // ...and the recovery path applies the stranded batch
    AnnIndex.replayDeleteLedger(spark, dir, "led")
    val after2 = probe()
    assert(after2 != after1 && after2.forall(r =>
      !(victims ++ victims2).contains(r.getAs[Long]("vec_id"))),
      "replaying the ledger must apply the batch the crash stranded")
  }

  test("gen-2 build fine-assignment join: broadcast forced below the knee, un-hinted past it") {
    import org.apache.spark.sql.execution.FormattedMode
    val e = Similarity.prepared(Fixtures.embeddings(spark, sf))
    val n = e.count()
    // kill auto-broadcast so the plan shape reflects ONLY the gate —
    // at fixture scale size estimates could auto-broadcast either way
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val below = Similarity.ivf2StructureOf(e, n)._3
        .queryExecution.explainString(FormattedMode)
      assert(below.contains("BroadcastHashJoin"),
        s"below the knee the build must FORCE the fine broadcast " +
          s"(derived relations have no stats):\n$below")
      val past = Similarity.ivf2StructureOf(e, Similarity.Ivf2FineBroadcastKneeN + 1)._3
        .queryExecution.explainString(FormattedMode)
      assert(!past.contains("BroadcastHashJoin"),
        s"past the knee the hint must be absent so Catalyst/AQE chooses:\n$past")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("retireVia evaluates the producer ONCE: a nondeterministic id plan " +
      "cannot ledger one set and tombstone another") {
    val dir = tempCorpus("nondet")
    AnnIndex.ensureBuilt(spark, dir, tag = "nd")
    val emb = Fixtures.embeddings(spark, dir)
    // a GENUINELY nondeterministic producer: every evaluation samples
    // a different ~half of the corpus (rand() would not do — Spark
    // fixes its seed at analysis, so re-execution repeats; an
    // asNondeterministic udf re-rolls per evaluation)
    val flip = udf(() => scala.util.Random.nextBoolean()).asNondeterministic()
    AnnIndex.retireBatch(spark, dir, emb.select(col("vec_id")).where(flip()),
      tag = "nd")
    val ledgered = spark.table(AnnIndex.deleteLedgerTableFor(dir, "nd"))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val tombstoned = spark.table(AnnIndex.tombstoneTableFor(dir, "nd"))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    // every ledgered id is a corpus member, so resolution drops none:
    // the tombstone set must be EXACTLY the durably recorded batch —
    // under the old evaluate-twice shape the two sets diverge with
    // near-certainty
    assert(ledgered.nonEmpty && tombstoned == ledgered,
      s"ledger (${ledgered.size}) and tombstones (${tombstoned.size}) diverged: " +
        s"the producer plan was evaluated more than once")
    // and replay converges as before
    AnnIndex.replayDeleteLedger(spark, dir, "nd")
    assert(spark.table(AnnIndex.tombstoneTableFor(dir, "nd"))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet == ledgered)
  }

  test("deletion loses no live neighbors: full-width probe over a tombstoned index == brute force over survivors") {
    val dir = tempCorpus("recall-del")
    AnnIndex.ensureBuilt(spark, dir, tag = "rd")
    val emb = Fixtures.embeddings(spark, dir)
    AnnIndex.removeBatch(spark, dir,
      emb.select(col("vec_id")).filter(col("vec_id") % 10 === 7), tag = "rd")
    val kc = AnnIndex.annCellsFor(emb.count())
    // nProbe = every cell: the probe scans the whole index minus the
    // tombstones, so the result must be EXACTLY brute force over the
    // survivors, rows and scores included (queries include retired id
    // 7 — external callers still probe) — a tombstone that clips a
    // live neighbor or leaks a dead one breaks row equality here
    val probed = AnnIndex.topK(spark, dir, maxQueryId = 8, k = 5,
        nProbe = kc, tag = "rd")
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val brute = Similarity.topKOver(
        emb.filter(col("vec_id") % 10 =!= 7), emb, maxQueryId = 8, k = 5)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(probed.nonEmpty && probed == brute,
      "full-width probe after delete must equal brute force over survivors")
    // the same guarantee one level down: every coarse cell probed and
    // the fine probe wider than any cell's fine count scans the whole
    // gen-2 index minus its tombstones
    AnnIndex.ensureBuilt2(spark, dir, tag = "rd")
    AnnIndex.removeBatch2(spark, dir,
      emb.select(col("vec_id")).filter(col("vec_id") % 10 === 7), tag = "rd")
    val kc2 = AnnIndex.storedCoarseQuantizer(spark, dir, tag = "rd").length
    val probed2 = AnnIndex.topK2(spark, dir, maxQueryId = 8, k = 5,
        nProbeCoarse = kc2, nProbeFine = 1000000, tag = "rd")
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(probed2.nonEmpty && probed2 == brute,
      "gen-2 full-width probe after delete must equal brute force over survivors")
  }

  test("explicit-id probes == prefix probes on the same ids, both generations") {
    import spark.implicits._
    AnnIndex.ensureBuilt(spark, sf)
    AnnIndex.ensureBuilt2(spark, sf)
    val ids = (0L until 5L).toDF("vec_id")
    val flatPrefix = AnnIndex.topK(spark, sf, maxQueryId = 5, k = 4, nProbe = 2)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val flatIds = AnnIndex.topKIds(spark, sf, ids, k = 4, nProbe = 2)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(flatIds.nonEmpty && flatIds == flatPrefix,
      "topKIds over the prefix ids must equal the prefix probe")
    val g2Prefix = AnnIndex.topK2(spark, sf, maxQueryId = 5, k = 4)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val g2Ids = AnnIndex.topK2Ids(spark, sf, ids, k = 4)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(g2Ids.nonEmpty && g2Ids == g2Prefix,
      "topK2Ids over the prefix ids must equal the prefix probe")
    // unknown ids probe nothing, known subset probes exactly itself
    assert(AnnIndex.topKIds(spark, sf, Seq(987654321L).toDF("vec_id"), k = 4).isEmpty)
    val sub = AnnIndex.topK2Ids(spark, sf, Seq(3L).toDF("vec_id"), k = 4)
      .orderBy(col("rn")).collect().toSeq
    assert(sub == g2Prefix.filter(_.getAs[Long]("q_id") == 3L))
  }

  test("composed serving call: explicit ids x SQ8 codes, both generations — " +
      "prefix-coherent, zero loss at rerank = 2k, candidate scan reads codes not vectors") {
    import spark.implicits._
    AnnIndex.ensureBuilt(spark, sf)
    AnnIndex.ensureBuilt2(spark, sf)
    val ids = (0L until 5L).toDF("vec_id")
    // the id path must be the prefix path's exact result on the same set
    val flatPrefix = AnnIndex.topKSq(spark, sf, maxQueryId = 5, k = 4,
        nProbe = 2, rerank = 12)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val flatIds = AnnIndex.topKIdsSq(spark, sf, ids, k = 4,
        nProbe = 2, rerank = 12)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(flatIds.nonEmpty && flatIds == flatPrefix,
      "topKIdsSq over the prefix ids must equal the prefix SQ probe")
    val g2Prefix = AnnIndex.topK2Sq(spark, sf, maxQueryId = 5, k = 4)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val g2Ids = AnnIndex.topK2IdsSq(spark, sf, ids, k = 4)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(g2Ids.nonEmpty && g2Ids == g2Prefix,
      "topK2IdsSq over the prefix ids must equal the prefix SQ probe")
    // rerank = 2k buys back full-precision results on the explicit-id
    // path too (the round-17 verdict's acceptance bar)
    val exact = AnnIndex.topKIds(spark, sf, ids, k = 4, nProbe = 2)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val sq2k = AnnIndex.topKIdsSq(spark, sf, ids, k = 4, nProbe = 2, rerank = 8)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(sq2k == exact,
      "explicit-id SQ probe at rerank = 2k must equal the full-precision explicit-id probe")
    // the byte bound survives the composition: the candidate scan's
    // ReadSchema excludes `v` on both generations
    val p1 = AnnIndex.topKIdsSq(spark, sf, ids, k = 4, nProbe = 2, rerank = 12)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p1.contains("ReadSchema: struct<vec_id:bigint,nrm:double,cell:int,codes:array<int>>"),
      "flat explicit-id candidate scan must read codes, not vectors")
    val p2 = AnnIndex.topK2IdsSq(spark, sf, ids, k = 4)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p2.contains("ReadSchema: struct<vec_id:bigint,nrm:double,ccell:int,fcell:int,codes:array<int>>"),
      "gen-2 explicit-id candidate scan must read codes, not vectors")
    // unknown ids probe nothing
    assert(AnnIndex.topKIdsSq(spark, sf, Seq(987654321L).toDF("vec_id"), k = 4).isEmpty)
  }

  test("SQ probes after a real delete: tombstones filtered on the codes path, " +
      "deletion set intersects the pre-delete SQ top-k (non-vacuous entries)") {
    val dir = tempCorpus("sqdel")
    AnnIndex.ensureBuilt(spark, dir)
    AnnIndex.ensureBuilt2(spark, dir)
    val emb = Fixtures.embeddings(spark, dir)
    // flat: residue 7 (the registry's set) must intersect the
    // pre-delete SQ top-k, or topk_sq_del would be vacuous
    val beforeFlat = AnnIndex.topKSq(spark, dir, maxQueryId = 6, k = 4,
        nProbe = 2, rerank = 12)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(beforeFlat.exists(_.getAs[Long]("vec_id") % 10 == 7),
      "sanity: residue 7 must appear in the pre-delete SQ top-4")
    AnnIndex.removeBatch(spark, dir,
      emb.select(col("vec_id")).filter(col("vec_id") % 10 === 7))
    val afterFlat = AnnIndex.topKSq(spark, dir, maxQueryId = 6, k = 4,
        nProbe = 2, rerank = 12)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(afterFlat.nonEmpty && afterFlat.forall(_.getAs[Long]("vec_id") % 10 != 7),
      "a tombstoned vector leaked into the SQ codes path")
    assert(afterFlat != beforeFlat, "deletion must visibly change the SQ results")
    // gen-2: residue 3 (the registry's set), same contract
    val before2 = AnnIndex.topK2Sq(spark, dir, maxQueryId = 6, k = 4)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(before2.exists(_.getAs[Long]("vec_id") % 10 == 3),
      "sanity: residue 3 must appear in the pre-delete gen-2 SQ top-4")
    AnnIndex.removeBatch2(spark, dir,
      emb.select(col("vec_id")).filter(col("vec_id") % 10 === 3))
    val after2 = AnnIndex.topK2Sq(spark, dir, maxQueryId = 6, k = 4)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(after2.nonEmpty && after2.forall(_.getAs[Long]("vec_id") % 10 != 3),
      "a tombstoned vector leaked into the gen-2 SQ codes path")
    assert(after2 != before2, "deletion must visibly change the gen-2 SQ results")
    // the explicit-id composition sees the same tombstones
    import spark.implicits._
    val idsAfter = AnnIndex.topKIdsSq(spark, dir,
        (0L until 6L).toDF("vec_id"), k = 4, nProbe = 2, rerank = 12)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(idsAfter == afterFlat,
      "explicit-id SQ probe must see the same tombstones as the prefix probe")
  }

  test("gen-2 PQ: pqcodes-only coarse-pruned candidate scan, full-rerank == exact probe, " +
      "appended clone served, codebook refreshes with requantize2") {
    AnnIndex.ensureBuilt2(spark, sf)
    // exact rerank over ALL candidates in the probed cells must equal
    // the full-precision probe at the same dials — the PQ stage can
    // then only reorder below a cut that admits everything
    val exact = AnnIndex.topK2(spark, sf, maxQueryId = 6, k = 4,
        nProbeCoarse = 2, nProbeFine = 3)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val pqWide = AnnIndex.topK2Pq(spark, sf, maxQueryId = 6, k = 4,
        nProbeCoarse = 2, nProbeFine = 3, rerank = 1000000)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(pqWide.nonEmpty && pqWide == exact,
      "at full rerank the gen-2 PQ probe must equal the exact gen-2 probe")
    // the sub-byte bound: candidate scan reads pqcodes — not vectors,
    // not the SQ8 codes — and stays coarse-bucket-pruned
    val p = AnnIndex.topK2Pq(spark, sf, maxQueryId = 2, k = 4, rerank = 24)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("ReadSchema: struct<vec_id:bigint,nrm:double,ccell:int,fcell:int,pqcodes:"),
      s"gen-2 PQ candidate scan must read pqcodes, not vectors:\n$p")
    // append → probe → requantize2 cycle on a private corpus: codes
    // encode with the STORED codebook, the rebuild refreshes it
    val dir = tempCorpus("pq2-cycle")
    AnnIndex.ensureBuilt2(spark, dir)
    val emb = Fixtures.embeddings(spark, dir)
    val cb0 = AnnIndex.storedPqCodebook2(spark, dir)
    assert(cb0.length == AnnIndex.PqKsub && cb0.head.length == AnnIndex.Dim)
    val clone = emb.filter(col("vec_id") === 0)
      .withColumn("vec_id", lit(424242L))
    AnnIndex.appendBatch2(spark, dir, clone)
    def cloneHit(): Boolean =
      AnnIndex.topK2Pq(spark, dir, maxQueryId = 1, k = 3, rerank = 10)
        .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("score")))
        .contains((424242L, 1.0))
    assert(cloneHit(), "an appended clone must be served by the gen-2 PQ probe")
    AnnIndex.requantize2(spark, dir)
    assert(AnnIndex.storedPqCodebook2(spark, dir).length == AnnIndex.PqKsub)
    assert(cloneHit(), "the clone must survive the generation swap re-encode")
  }

  test("gen-2 PQ compositions: explicit ids == prefix on the same set, " +
      "tombstones filtered on the packed-codes path, residue-3 non-vacuous") {
    import spark.implicits._
    AnnIndex.ensureBuilt2(spark, sf)
    val prefix = AnnIndex.topK2Pq(spark, sf, maxQueryId = 5, k = 4, rerank = 24)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val byIds = AnnIndex.topK2IdsPq(spark, sf, (0L until 5L).toDF("vec_id"),
        k = 4, rerank = 24)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(byIds.nonEmpty && byIds == prefix,
      "topK2IdsPq over the prefix ids must equal the prefix gen-2 PQ probe")
    assert(AnnIndex.topK2IdsPq(spark, sf, Seq(987654321L).toDF("vec_id"), k = 4).isEmpty)
    // delete leg on a private corpus: residue 3 must intersect the
    // pre-delete top-k (the registry entry is non-vacuous) and never
    // leak back through the packed-codes path
    val dir = tempCorpus("pq2del")
    AnnIndex.ensureBuilt2(spark, dir)
    val before = AnnIndex.topK2Pq(spark, dir, maxQueryId = 6, k = 4, rerank = 24)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(before.exists(_.getAs[Long]("vec_id") % 10 == 3),
      "sanity: residue 3 must appear in the pre-delete gen-2 PQ top-4")
    AnnIndex.removeBatch2(spark, dir,
      Fixtures.embeddings(spark, dir).select(col("vec_id"))
        .filter(col("vec_id") % 10 === 3))
    val after = AnnIndex.topK2Pq(spark, dir, maxQueryId = 6, k = 4, rerank = 24)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(after.nonEmpty && after.forall(_.getAs[Long]("vec_id") % 10 != 3),
      "a tombstoned vector leaked into the gen-2 packed-codes path")
    assert(after != before, "deletion must visibly change the gen-2 PQ results")
  }

  test("composed serving call at the PQ tier: explicit ids x stored pqcodes — " +
      "prefix-coherent, candidate scan reads pqcodes not vectors, unknown ids empty") {
    import spark.implicits._
    AnnIndex.ensureBuilt(spark, sf)
    val ids = (0L until 5L).toDF("vec_id")
    val prefix = AnnIndex.topKIdxPq(spark, sf, maxQueryId = 5, k = 4,
        nProbe = 2, rerank = 24)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val byIds = AnnIndex.topKIdsPq(spark, sf, ids, k = 4,
        nProbe = 2, rerank = 24)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(byIds.nonEmpty && byIds == prefix,
      "topKIdsPq over the prefix ids must equal the prefix PQ probe")
    // the sub-byte bound survives the composition: the candidate scan
    // reads pqcodes — not the vectors, not the SQ8 codes
    val p = AnnIndex.topKIdsPq(spark, sf, ids, k = 4, nProbe = 2, rerank = 24)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("ReadSchema: struct<vec_id:bigint,nrm:double,cell:int,pqcodes:"),
      "explicit-id PQ candidate scan must read pqcodes, not vectors")
    assert(AnnIndex.topKIdsPq(spark, sf, Seq(987654321L).toDF("vec_id"), k = 4).isEmpty)
  }

  test("PQ probe after a real delete: tombstones filtered on the pqcodes path, " +
      "deletion set intersects the pre-delete PQ top-k (non-vacuous entry)") {
    val dir = tempCorpus("pqdel")
    AnnIndex.ensureBuilt(spark, dir)
    val emb = Fixtures.embeddings(spark, dir)
    val before = AnnIndex.topKIdxPq(spark, dir, maxQueryId = 6, k = 4,
        nProbe = 2, rerank = 24)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(before.exists(_.getAs[Long]("vec_id") % 10 == 7),
      "sanity: residue 7 must appear in the pre-delete PQ top-4")
    AnnIndex.removeBatch(spark, dir,
      emb.select(col("vec_id")).filter(col("vec_id") % 10 === 7))
    val after = AnnIndex.topKIdxPq(spark, dir, maxQueryId = 6, k = 4,
        nProbe = 2, rerank = 24)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(after.nonEmpty && after.forall(_.getAs[Long]("vec_id") % 10 != 7),
      "a tombstoned vector leaked into the pqcodes path")
    assert(after != before, "deletion must visibly change the PQ results")
    // the explicit-id composition sees the same tombstones
    import spark.implicits._
    val idsAfter = AnnIndex.topKIdsPq(spark, dir,
        (0L until 6L).toDF("vec_id"), k = 4, nProbe = 2, rerank = 24)
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(idsAfter == after,
      "explicit-id PQ probe must see the same tombstones as the prefix probe")
  }

  test("pre-batch ledger schema migrates in place: old (vec_id-only) rows become batch 0, " +
      "retire still reads back the fresh batch, replay converges") {
    import spark.implicits._
    val dir = tempCorpus("ledmig")
    AnnIndex.ensureBuilt(spark, dir, tag = "mig")
    val ledger = AnnIndex.deleteLedgerTableFor(dir, "mig")
    // plant an OLD-shape ledger (the pre-read-back schema: vec_id only)
    val before = AnnIndex.topK(spark, dir, maxQueryId = 6, k = 4, tag = "mig")
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val oldVictims = before.map(_.getAs[Long]("vec_id")).distinct.take(2)
    oldVictims.toDF("vec_id")
      .write.mode("overwrite").format("parquet").saveAsTable(ledger)
    // a retire against the old-schema ledger must not throw, must
    // widen the schema, and must retire exactly its own batch
    val freshVictims = before.map(_.getAs[Long]("vec_id")).distinct
      .filterNot(oldVictims.contains).take(2)
    AnnIndex.retireBatch(spark, dir, freshVictims.toDF("vec_id"), tag = "mig")
    val led = spark.table(ledger).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("batch"))).toSeq
    assert(oldVictims.forall(v => led.contains((v, 0L))),
      s"migrated rows must carry batch 0: $led")
    assert(freshVictims.forall(v => led.contains((v, 1L))),
      s"the fresh batch must be read back as batch 1: $led")
    val after = AnnIndex.topK(spark, dir, maxQueryId = 6, k = 4, tag = "mig")
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(after.forall(r => !freshVictims.contains(r.getAs[Long]("vec_id"))))
    // replay applies the migrated batch-0 rows too and converges
    AnnIndex.replayDeleteLedger(spark, dir, "mig")
    val replayed = AnnIndex.topK(spark, dir, maxQueryId = 6, k = 4, tag = "mig")
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(replayed.forall(r =>
      !(oldVictims ++ freshVictims).contains(r.getAs[Long]("vec_id"))))
  }

  test("gen-2 ledger: retireBatch2 records then retires, replay idempotent, stranded batch applied") {
    import spark.implicits._
    val dir = tempCorpus("ledger2")
    AnnIndex.ensureBuilt2(spark, dir, tag = "led2")
    def probe() = AnnIndex.topK2(spark, dir, maxQueryId = 6, k = 4, tag = "led2")
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val before = probe()
    val victims = before.map(_.getAs[Long]("vec_id")).distinct.take(3)
    AnnIndex.retireBatch2(spark, dir, victims.toDF("vec_id"), tag = "led2")
    val after1 = probe()
    assert(after1 != before && after1.forall(r =>
      !victims.contains(r.getAs[Long]("vec_id"))))
    AnnIndex.replayDeleteLedger2(spark, dir, "led2")
    assert(probe() == after1, "gen-2 ledger replay must be idempotent")
    // stranded second batch (crash before removeBatch2) applied on replay
    val ledger = AnnIndex.deleteLedger2TableFor(dir, "led2")
    val victims2 = after1.map(_.getAs[Long]("vec_id")).distinct.take(2)
    victims2.map((_, 99L)).toDF("vec_id", "batch")
      .write.mode("append").format("parquet").saveAsTable(ledger)
    assert(probe() == after1)
    AnnIndex.replayDeleteLedger2(spark, dir, "led2")
    assert(probe().forall(r =>
      !(victims ++ victims2).contains(r.getAs[Long]("vec_id"))))
  }

  test("removeBatch's idempotent fast path genuinely skips the table swap (no rewrite, not just same rows)") {
    val dir = tempCorpus("del-noop")
    AnnIndex.ensureBuilt(spark, dir)
    val emb = Fixtures.embeddings(spark, dir)
    AnnIndex.removeBatch(spark, dir,
      emb.select(col("vec_id")).filter(col("vec_id") % 10 === 7))
    val ts = AnnIndex.tombstoneTableFor(dir)
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, ts)
    val before = loc.listFiles().map(f => f.getName -> f.lastModified()).toMap
    // a replayed (fully-covered) batch and an unknown id must both be
    // complete no-ops on disk — the row-count assertion elsewhere
    // would pass even if the swap rewrote identical rows; this pins
    // that the k-bucket rewrite + renames genuinely do not run
    AnnIndex.removeBatch(spark, dir,
      emb.select(col("vec_id")).filter(col("vec_id") % 10 === 7))
    import spark.implicits._
    AnnIndex.removeBatch(spark, dir, Seq(987654321L).toDF("vec_id"))
    val after = loc.listFiles().map(f => f.getName -> f.lastModified()).toMap
    assert(after == before, "covered re-deletes must not rewrite the tombstone table")
  }

  test("learnedPq build flag: the STORED codebook == the inline Lloyd fit, " +
      "the sampled default is untouched, and serving reads the learned book unchanged") {
    val dir = tempCorpus("learned")
    val emb = Fixtures.embeddings(spark, dir)
    // default build stores the sampled book; learned build (its own
    // tag = its own generation) stores the Lloyd fit — stored==inline
    // is the whole claim: probes read the STORED book, so pinning the
    // artifact pins the serving path with zero serving changes
    AnnIndex.ensureBuilt(spark, dir, tag = "cb-sampled")
    AnnIndex.ensureBuilt(spark, dir, tag = "cb-learned", learnedPq = true)
    val prep = Similarity.prepared(emb)
    val sampled = Similarity.sampledCentroids(prep, AnnIndex.PqKsub)
    val learned = Similarity.learnedPqCodebook(emb)
    val storedS = AnnIndex.storedPqCodebook(spark, dir, tag = "cb-sampled")
    val storedL = AnnIndex.storedPqCodebook(spark, dir, tag = "cb-learned")
    assert(storedS.map(_.toSeq).toSeq == sampled.map(_.toSeq).toSeq,
      "default build must keep storing the sampled (oracle-checked) book")
    assert(storedL.map(_.toSeq).toSeq == learned.map(_.toSeq).toSeq,
      "learnedPq build must store exactly the inline Lloyd fit")
    assert(storedL.map(_.toSeq).toSeq != storedS.map(_.toSeq).toSeq,
      "learning must genuinely move the stored book on this fixture")
    // the learned generation serves: full-width probe + full rerank
    // over learned codes is still exact (ADC only ranks candidates)
    val kc = AnnIndex.storedQuantizer(spark, dir, tag = "cb-learned").length
    val n = emb.count().toInt
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val brute = hits(Similarity.topK(emb, maxQueryId = 3, k = 5))
    val full = hits(AnnIndex.topKIdxPq(spark, dir, maxQueryId = 3, k = 5,
      nProbe = kc, rerank = n, tag = "cb-learned"))
    assert(full == brute,
      "learned-book full probe + full rerank must equal brute force")
    // the flag carries through the rebuild: a learned generation
    // stays learned after requantize (re-fit over the same corpus)
    AnnIndex.requantize(spark, dir, tag = "cb-learned", learnedPq = true)
    val storedL2 = AnnIndex.storedPqCodebook(spark, dir, tag = "cb-learned")
    assert(storedL2.map(_.toSeq).toSeq == learned.map(_.toSeq).toSeq,
      "requantize(learnedPq) over an unchanged corpus must re-fit the same book")
  }

  test("gen-2 learnedPq build flag: the stored gen-2 codebook == the inline Lloyd fit") {
    val dir = tempCorpus("learned2")
    val emb = Fixtures.embeddings(spark, dir)
    AnnIndex.ensureBuilt2(spark, dir, tag = "cb2", learnedPq = true)
    val learned = Similarity.learnedPqCodebook(emb)
    val stored = AnnIndex.storedPqCodebook2(spark, dir, tag = "cb2")
    assert(stored.map(_.toSeq).toSeq == learned.map(_.toSeq).toSeq,
      "gen-2 learnedPq build must store exactly the inline Lloyd fit")
  }

  test("ledger migration commits via rename-aside: a crash between the renames is healed, " +
      "batch-0 history survives") {
    import spark.implicits._
    val dir = tempCorpus("ledheal")
    AnnIndex.ensureBuilt(spark, dir, tag = "heal")
    val ledger = AnnIndex.deleteLedgerTableFor(dir, "heal")
    val before = AnnIndex.topK(spark, dir, maxQueryId = 6, k = 4, tag = "heal")
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    val oldVictims = before.map(_.getAs[Long]("vec_id")).distinct.take(2)
    // simulate the EXACT mid-swap crash state the old DROP-then-RENAME
    // protocol lost: the migrated stage (__mig) fully written, the old
    // ledger renamed aside (__old), the live name ABSENT
    oldVictims.toDF("vec_id").withColumn("batch", lit(0L))
      .write.mode("overwrite").format("parquet").saveAsTable(ledger + "__mig")
    oldVictims.toDF("vec_id")
      .write.mode("overwrite").format("parquet").saveAsTable(ledger + "__old")
    // the next retire must HEAL (promote __mig), see batch 0, and
    // append its own batch as 1 — NOT reset a fresh empty ledger
    val freshVictims = before.map(_.getAs[Long]("vec_id")).distinct
      .filterNot(oldVictims.contains).take(2)
    AnnIndex.retireBatch(spark, dir, freshVictims.toDF("vec_id"), tag = "heal")
    val led = spark.table(ledger).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("batch"))).toSeq
    assert(oldVictims.forall(v => led.contains((v, 0L))),
      s"healed ledger must keep the migrated batch-0 history: $led")
    assert(freshVictims.forall(v => led.contains((v, 1L))),
      s"the fresh batch must follow as batch 1, not restart at a fresh ledger: $led")
    assert(!spark.catalog.tableExists(ledger + "__mig") &&
      !spark.catalog.tableExists(ledger + "__old"),
      "the heal must clear both swap-protocol side tables")
    // replay applies the healed batch-0 rows
    AnnIndex.replayDeleteLedger(spark, dir, "heal")
    val after = AnnIndex.topK(spark, dir, maxQueryId = 6, k = 4, tag = "heal")
      .orderBy(col("q_id"), col("rn")).collect().toSeq
    assert(after.forall(r =>
      !(oldVictims ++ freshVictims).contains(r.getAs[Long]("vec_id"))))
  }

  test("nibble_pack fails loudly on an odd code count (the packed-ADC m = 2·bytes contract)") {
    import spark.implicits._
    val odd = Seq(Tuple1(Seq(1, 2, 3))).toDF("codes")
      .select(graft.functions.VectorExprs.nibblePack(col("codes")))
    val e = intercept[Exception](odd.collect())
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[IllegalArgumentException] &&
        c.getMessage.contains("even number of codes")),
      s"expected the even-m guard, got: $e")
  }

  test("nearestCellIdx (driver twin) == assignCells (codegen) row for row") {
    val emb = Fixtures.embeddings(spark, sf)
    val e = Similarity.prepared(emb)
    val cs = Similarity.sampledCentroids(e, AnnIndex.annCellsFor(emb.count()))
    val asg = Similarity.assignCells(e, cs)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = e.select(col("vec_id"), col("v")).collect()
    rows.foreach { r =>
      val got = Similarity.nearestCellIdx(r.getSeq[Double](1).toArray, cs)
      assert(got == asg(r.getLong(0)),
        s"driver/codegen assignment diverged for vec_id ${r.getLong(0)}: " +
          s"$got vs ${asg(r.getLong(0))}")
    }
  }

  test("build is write-once: a second ensureBuilt reuses the table") {
    val t = AnnIndex.ensureBuilt(spark, sf)
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, t)
    val before = loc.listFiles().map(f => f.getName -> f.lastModified()).toMap
    assert(AnnIndex.ensureBuilt(spark, sf) == t)
    val after = loc.listFiles().map(f => f.getName -> f.lastModified()).toMap
    assert(after == before, "second ensureBuilt must not rewrite the table")
  }
}
